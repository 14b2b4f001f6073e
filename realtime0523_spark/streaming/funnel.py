"""Cross-batch streaming funnel — the ordered view→click→purchase
analysis (`event_funnel`) as an ONLINE stateful operator.

Semantics (identical to the batch query): per user, t1 = the earliest
stage-1 event; t_k = the earliest stage-k event STRICTLY AFTER t_{k-1}.
The hard part online is out-of-order arrival ACROSS micro-batches: a
click can arrive before the view that qualifies it, and a view
arriving later with an EARLIER timestamp can retroactively qualify a
click that previously didn't count (t1 decreasing enlarges stage 2's
qualifying set). A forward-only stage machine gets this wrong; this
operator keeps a per-user EVENT-TIME BUFFER of the not-yet-qualified
events and replays them whenever an upstream stage time decreases.

Why state stays bounded (the watermark contract): with watermark W,
no event older than W can arrive anymore, so
  - stage 1 needs no buffer at all — t1 is a running min;
  - a buffered stage-k event x can only qualify later if t_{k-1}
    drops below x, and t_{k-1} can never drop below
    min(W, current t_{k-1}) (new events are ≥ W; by induction each
    stage's time is bounded below by that same expression), so every
    buffered event ≤ min(W, t_{k-1}) is provably dead and dropped;
  - among ALREADY-qualifying stage-k events only the minimum can ever
    matter (the qualifying set only grows as t_{k-1} decreases), so
    exactly one scalar t_k is kept per stage.
Each buffer therefore holds only stage-k events inside the
out-of-orderness horizon (min(W, t_{k-1}), t_{k-1}] — the same bound
every watermarked state operator lives under.

Emission contract: one row per touched user per micro-batch with the
exact (t1..tN) given everything seen so far. Each t_k is
NON-INCREASING across emissions, so the drained update-mode stream
reduces to the final answer with a per-user min — and with all data
in one batch it equals the batch funnel exactly (the oracle gate).

Reference basis: the batch `event_funnel` decorrelation
(plans/llm_inventory.py) and the D3 keyed-state discipline of
streaming/first_seen.py; no reference-engine counterpart (beyond-
reference surface).
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

INF = 2**62  # "unset" sentinel: beats every real epoch-us forever


def fold_funnel(
    state: tuple | None,
    events_by_stage: Sequence[Sequence[int]],
    watermark_us: int,
) -> tuple:
    """Pure per-key fold (unit-testable without a stream): merge one
    batch of events into funnel state.

    state: (t1..tN, buf2..bufN) or None; events_by_stage: per-stage
    event-time lists (epoch us). Returns the new state tuple. The
    emitted row is the new (t1..tN) with INF mapped to null."""
    n = len(events_by_stage)
    if state is None:
        ts = [INF] * n
        bufs = [[] for _ in range(n - 1)]
    else:
        ts = list(state[:n])
        bufs = [list(b) if b is not None else [] for b in state[n:]]

    if events_by_stage[0]:
        ts[0] = min(ts[0], min(events_by_stage[0]))
    for k in range(1, n):
        thr = ts[k - 1]
        pool = bufs[k - 1] + list(events_by_stage[k])
        if ts[k] < INF:
            pool.append(ts[k])
        qual = [x for x in pool if x > thr]
        ts[k] = min(qual) if qual else INF
        dead_lb = min(watermark_us, thr)  # ≤ this can never qualify
        bufs[k - 1] = sorted(x for x in pool if dead_lb < x <= thr)
    return (*ts, *bufs)


def fold_funnel_windowed(
    state: tuple | None,
    events_by_stage: Sequence[Sequence[int]],
    watermark_us: int,
    gap_us: int,
) -> tuple:
    """Pure per-key fold for the CONVERSION-WINDOW funnel: stage k
    counts only if its event lands in (t_{k-1}, t_{k-1} + gap].

    The windowed semantics break the plain funnel's monotonicity —
    when a later-arriving EARLIER view drops t1, the conversion
    window slides left and a previously-qualifying click can fall
    OUT (t2 can rise or become unset again). So the state keeps, per
    stage k ≥ 2, every event still able to qualify under any future
    t1, and re-derives (t2..tN) from scratch at each emission:
      - t1 is still a running min (monotone);
      - future stage times obey t_k' ≤ t1 + (k−1)·gap (each stage is
        within gap of the previous, chained from t1, and t1 only
        decreases), so stage-k events above t1 + (k−1)·gap are dead;
      - future t1' ≥ min(W, t1) (new events are ≥ W), so stage-k
        events ≤ min(W, t1) can never sit above a future anchor.
    Each kept list therefore lives in (min(W, t1), t1 + (k−1)·gap] —
    bounded by the out-of-orderness horizon plus the conversion
    window, the watermark contract again.

    State: (t1, seq, keep2..keepN). `seq` increments every fold so
    the drained update stream reduces per user by LAST emission
    (min-reduce is unsound here — values are not monotone).
    Returns (new_state, (t1..tN) with INF for unset)."""
    n = len(events_by_stage)
    if state is None:
        t1 = INF
        seq = 0
        keeps = [[] for _ in range(n - 1)]
    else:
        t1 = state[0]
        seq = state[1]
        keeps = [list(b) if b is not None else [] for b in state[2:]]

    if events_by_stage[0]:
        t1 = min(t1, min(events_by_stage[0]))
    lo = min(watermark_us, t1)
    ts = [t1]
    for k in range(1, n):
        hi = INF if t1 >= INF else t1 + k * gap_us
        keeps[k - 1] = sorted(
            x
            for x in keeps[k - 1] + list(events_by_stage[k])
            if lo < x <= hi
        )
        prev = ts[k - 1]
        qual = [
            x for x in keeps[k - 1] if prev < INF and prev < x <= prev + gap_us
        ]
        ts.append(min(qual) if qual else INF)
    return (t1, seq + 1, *keeps), tuple(ts)


def streaming_funnel_stages(
    stream: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: Sequence[str],
    watermark: str = "1 hour",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Per-user ordered-funnel stage times over a stream (update
    mode): one row per touched user per micro-batch with the exact
    stage times (t1..tN, epoch us, null = stage not reached) given
    all events seen so far. See module docstring for the
    out-of-order buffer and the watermark bound on state.

    With `max_gap_s`, stage k counts only within the CONVERSION
    WINDOW (t_{k-1}, t_{k-1} + gap] (fold_funnel_windowed); the
    output gains a per-user `seq` column and the drained stream must
    be reduced by LAST emission (funnel_report handles both)."""
    n = len(stages)
    if n < 2:
        raise ValueError("funnel needs at least two stages")
    stage_idx = {s: i for i, s in enumerate(stages)}
    gap_us = None if max_gap_s is None else int(max_gap_s) * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        per_stage: list[list[int]] = [[] for _ in range(n)]
        for s, t in zip(batch["stage"], batch["ts"]):
            per_stage[stage_idx[s]].append(int(t))
        try:
            wm_us = max(0, int(state.getCurrentWatermarkMs())) * 1000
        except Exception:
            wm_us = 0
        prev = tuple(state.get) if state.exists else None
        row = {"user": [key[0]]}
        if gap_us is None:
            new = fold_funnel(prev, per_stage, wm_us)
            state.update(new)
            emit = new[:n]
        else:
            new, emit = fold_funnel_windowed(prev, per_stage, wm_us, gap_us)
            state.update(new)
            row["seq"] = [int(new[1])]
        for i in range(n):
            row[f"t{i + 1}"] = [None if emit[i] >= INF else int(emit[i])]
        yield pd.DataFrame(row)

    tcols = ", ".join(f"t{i + 1} long" for i in range(n))
    if gap_us is None:
        out_schema = f"user long, {tcols}"
        state_schema = tcols + ", " + ", ".join(
            f"buf{i + 1} array<long>" for i in range(1, n)
        )
    else:
        out_schema = f"user long, seq long, {tcols}"
        state_schema = "t1 long, seq long, " + ", ".join(
            f"keep{i + 1} array<long>" for i in range(1, n)
        )
    prepared = (
        stream.withWatermark(ts_col, watermark)
        .filter(F.col(type_col).isin(list(stages)))
        .select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("stage"),
            F.unix_micros(F.col(ts_col)).alias("ts"),
        )
    )
    return prepared.groupBy("user").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_report(per_user: DataFrame, stages: Sequence[str]) -> DataFrame:
    """Reduce drained update-mode funnel rows to the stage report
    (stage_idx, stage, n_users). Plain funnel: each t_k is
    non-increasing across a user's emissions, so min-ignoring-nulls
    recovers the final state. Windowed funnel (a `seq` column is
    present): stage times are NOT monotone — a sliding conversion
    window can unset them — so the LAST emission per user (max seq)
    is the final state. Count-ignoring-nulls then sizes each stage."""
    n = len(stages)
    if "seq" in per_user.columns:
        finals = per_user.groupBy("user").agg(
            *[
                F.max_by(f"t{i + 1}", "seq").alias(f"t{i + 1}")
                for i in range(n)
            ]
        )
    else:
        finals = per_user.groupBy("user").agg(
            *[F.min(f"t{i + 1}").alias(f"t{i + 1}") for i in range(n)]
        )
    counts = finals.agg(
        *[
            F.count(f"t{i + 1}").cast("long").alias(f"c{i + 1}")
            for i in range(n)
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', c{i + 1}" for i, s in enumerate(stages)
    )
    return counts.select(
        F.expr(
            f"stack({n}, {stack_args}) as (stage_idx, stage, n_users)"
        )
    )
