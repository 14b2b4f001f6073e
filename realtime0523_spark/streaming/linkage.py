"""Streaming record linkage — the online form of operators/linkage.py,
and the deployment shape entity resolution actually runs in: the base
registry is AT REST, the second feed ARRIVES; every new record must be
matched as it lands, not in a nightly n²-ish batch.

Per micro-batch: the batch's records block-join the static base (the
batch side is small — Spark broadcasts it into the base scan), the
integer agreement scores decide links, and the per-nation counts
(candidates, links, true links) are committed idempotently by batchId
(K5 exactly-once). Each feed record lands in exactly one batch and
counts are additive, so the drained fold over committed partials
equals the all-at-once batch report — replays are no-ops, batch
boundaries cannot change the answer.

At 100 TB: per-batch cost is the batch's block-join fan-out (blocking
keeps it ∝ batch size, never |base|·batch); the at-rest state is
|batches|·|nations| partial rows."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime0523_spark.operators.linkage import LINK_THRESHOLD, link_candidates
from realtime0523_spark.streaming.runner import run_foreach_batch
from realtime0523_spark.streaming.sinks import idempotent_batch_writer


def _link_partials(base: DataFrame, batch: DataFrame, threshold: int) -> DataFrame:
    """Per-nation (candidates, links, true links) for one feed slice."""
    return (
        link_candidates(base, batch, threshold=threshold)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("is_link"), 1).otherwise(0))
            .cast("long")
            .alias("n_links"),
            F.sum(
                F.when(
                    F.col("is_link") & (F.col("left_key") == F.col("right_key")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_true_links"),
        )
    )


def streaming_record_linkage(
    spark: SparkSession,
    base: DataFrame,
    feed_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str | None = None,
    threshold: int = LINK_THRESHOLD,
) -> DataFrame:
    """Drain the dirty feed through per-batch blocked matching against
    the static `base`, committing per-nation partial counts; return
    the folded per-nation report as a batch DataFrame."""

    commit = idempotent_batch_writer(out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit(_link_partials(base, batch_df, threshold), batch_id)

    run_foreach_batch(
        feed_stream,
        process,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        no_data_batches=False,
    )
    if not os.path.exists(out_dir):  # no batches arrived
        return spark.createDataFrame(
            [],
            "nationkey int, n_candidates long, n_links long, "
            "n_true_links long",
        )
    partials = spark.read.parquet(out_dir).drop("batch_id")
    return partials.groupBy("nationkey").agg(
        F.sum("n_candidates").alias("n_candidates"),
        F.sum("n_links").alias("n_links"),
        F.sum("n_true_links").alias("n_true_links"),
    )
