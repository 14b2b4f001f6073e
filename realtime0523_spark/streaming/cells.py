"""The additive-synopsis streaming pattern, generalized.

Every monitor in the stattests family reduces the corpus to a small
cell table whose values MERGE by plain addition (or, for distinct
cells, by set union — addition over 0/1 presence after a distinct):

- chi-square: (a, b) -> count
- KS: (key, value) -> (count_half1, count_half2)
- CUSUM: (key, hour) -> cents        (streaming/changepoint.py)
- rolling DAU: distinct (user, day) presence cells

So every one of them gets a streaming twin from the SAME machinery:
each micro-batch commits its partial cells (map-side combined,
idempotent by batchId — the K5 discipline), and the reader folds the
committed partials into the exact at-rest synopsis before running the
IDENTICAL finisher the batch query runs. Batch boundaries, replays,
and late events cannot change a sum (or a set union), so the drained
stream equals the batch oracle bit-for-bit — the strongest equality a
stream can state, with per-batch state zero and at-rest state
synopsis-sized.

This module is that machinery once: `streaming_cells` drains a stream
through per-batch cell commits and hands the folded synopsis to a
finisher. The CUSUM twin predates it (streaming/changepoint.py) and
keeps its specialized form; new additive twins should come through
here.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime0523_spark.streaming.runner import run_foreach_batch
from realtime0523_spark.streaming.sinks import idempotent_batch_writer


def streaming_cells(
    spark: SparkSession,
    stream: DataFrame,
    cell_fn: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
    sum_cols: list[str],
    finish_fn: Callable[[DataFrame], DataFrame],
    out_dir: str,
    checkpoint_dir: str | None = None,
    empty_schema: str | None = None,
    distinct_cells: bool = False,
) -> DataFrame:
    """Drain `stream` through per-batch commits of `cell_fn(batch)`
    partial cells, fold them by summing `sum_cols` per `key_cols`
    (or by distinct over `key_cols` when `distinct_cells` — presence
    cells merge by union), and return `finish_fn(folded_synopsis)`.

    `cell_fn` must be the SAME corpus-to-cells collapse the batch
    query uses, and `finish_fn` the same synopsis-to-answer finisher —
    the equality argument is additivity plus shared code, nothing
    else.
    """
    commit = idempotent_batch_writer(out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit(cell_fn(batch_df), batch_id)

    run_foreach_batch(
        stream,
        process,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        no_data_batches=False,
    )
    if not os.path.exists(out_dir):  # no batches arrived
        if empty_schema is None:
            raise ValueError(
                "streaming_cells: empty stream and no empty_schema"
            )
        return spark.createDataFrame([], empty_schema)
    parts = spark.read.parquet(out_dir).drop("batch_id")
    if distinct_cells:
        folded = parts.select(*key_cols).distinct()
    else:
        folded = parts.groupBy(*key_cols).agg(
            *[F.sum(c).cast("long").alias(c) for c in sum_cols]
        )
    return finish_fn(folded)
