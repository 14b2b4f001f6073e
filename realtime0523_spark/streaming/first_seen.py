"""Stateful first-seen — SURVEY §2.7 D3 (the hardest state semantics).

Reference: the cumulative "ever ordered" user set lives in a Phoenix
table; each batch does a batched IN-lookup, flags `if_first_order`,
and writes new first-timers back
(scala/…/dwd/Ods_to_DWD_order_info.scala:83-104, 219-225).

Ours: `applyInPandasWithState` — keyed user state inside the engine's
checkpointed state store. No external KV service; restart-safe. The
kept record per key is the event-time minimum seen so far (not
arrival order), so results are deterministic and replay-stable.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _first_seen_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one row per key per batch: the earliest (ts, id) ever seen
    for this key, folded across batches through the state store."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    idx = batch.sort_values(["ts", "id"]).index[0]
    cand = (int(batch.loc[idx, "ts"]), int(batch.loc[idx, "id"]))
    if not state.exists or cand < tuple(state.get):
        state.update(cand)
    seen_ts, seen_id = state.get
    yield pd.DataFrame(
        {"key": [key[0]], "first_ts": [seen_ts], "first_id": [seen_id]}
    )


def streaming_first_seen(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Per-key earliest-record tracking over a stream.

    Output: one row per key per micro-batch with the current
    first-seen (ts, id). With all data in one batch this equals the
    batch `min(struct(ts, id)) GROUP BY key` — the oracle-checkable
    contract.
    """
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col)).alias("ts"),
        F.col(id_col).alias("id"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType="key long, first_ts long, first_id long",
        stateStructType="seen_ts long, seen_id long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
