"""Streaming synopsis maintenance — the online form of the KMV
distinct-overlap sketch (operators/kmv.py).

The warehouse question ("how much do these audiences overlap, as of
now?") is continuous; rebuilding the synopsis from history per ask is
a full-corpus scan. KMV sketches are MERGEABLE — the k smallest of a
union is computable from the k smallest of the parts — so the online
path commits one bounded partial sketch per micro-batch
(≤ |segments|·k rows regardless of batch size, K5-idempotent by
batchId) and any reader folds the committed partials into the exact
same synopsis a from-scratch build would produce. Merge is
idempotent, commutative, and associative (it is set-union followed by
k-min), so batch boundaries, replays, and late events cannot change
the sketch — the drained result equals the batch oracle exactly.

At 100 TB: per-batch work is batch-sized; the at-rest state is
|batches|·|segments|·k rows of synopsis (compactable by the same
merge at any time); the overlap report reads only synopses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime0523_spark.operators.kmv import KMV_K, kmv_overlap, kmv_sketch
from realtime0523_spark.streaming.runner import run_foreach_batch
from realtime0523_spark.streaming.sinks import idempotent_batch_writer


def merge_kmv_partials(partials: DataFrame, k: int = KMV_K) -> DataFrame:
    """Fold committed per-batch partial sketches into the global
    synopsis: per segment, the k smallest distinct hash values across
    all partials — exactly the sketch a single-pass build would
    produce (k-min of a union = k-min of concatenated k-mins)."""
    return (
        partials.groupBy("seg")
        .agg(F.slice(F.array_sort(F.collect_set("v")), 1, k).alias("vs"))
        .select("seg", F.explode("vs").alias("v"))
    )


def streaming_kmv_overlap(
    spark: SparkSession,
    stream: DataFrame,
    segment_col: str,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Drain `stream` through per-batch KMV partials with
    exactly-once commits, then fold the committed partials and return
    the all-pairs overlap report as a batch DataFrame."""

    commit = idempotent_batch_writer(out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit(kmv_sketch(batch_df, segment_col, key_col, k=k), batch_id)

    run_foreach_batch(
        stream,
        process,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        no_data_batches=False,
    )
    if not os.path.exists(out_dir):  # no batches arrived
        return spark.createDataFrame(
            [],
            "seg_a string, seg_b string, ku long, union_est double, "
            "jaccard_est double, inter_est double",
        )
    partials = spark.read.parquet(out_dir).drop("batch_id")
    return kmv_overlap(merge_kmv_partials(partials, k=k), k=k)


def streaming_dd_quantiles(
    spark: SparkSession,
    stream: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[str, int, int]],
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Online DDSketch (operators/ddsketch.py): per micro-batch, one
    bounded partial sketch — (group, bucket, n), ≤|groups|·|buckets|
    rows regardless of batch size — committed idempotently by batchId;
    the reader folds committed partials by plain addition (DDSketch
    merge IS bucket-count addition: commutative, associative, replay-
    safe) into bit-for-bit the single-pass sketch, then answers
    quantiles from the synopsis alone."""
    from realtime0523_spark.operators.ddsketch import dd_quantiles, dd_sketch

    commit = idempotent_batch_writer(out_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        commit(dd_sketch(batch_df, group_col, value_col), batch_id)

    run_foreach_batch(
        stream,
        process,
        checkpoint_dir=checkpoint_dir,
        output_mode="append",
        no_data_batches=False,
    )
    if not os.path.exists(out_dir):  # no batches arrived
        return spark.createDataFrame(
            [], "grp string, quantile string, n_rows long, est_value double"
        )
    partials = spark.read.parquet(out_dir).drop("batch_id")
    return dd_quantiles(partials, quantiles)
