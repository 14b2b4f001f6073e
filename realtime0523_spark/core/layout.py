"""Partitioned data layout: directory-partitioned, within-file-sorted
parquet — the read-path complement to bucketing (core.bucketing).

At 100 TB the two layout decisions that dominate scan cost are made at
WRITE time:

1. **Directory partitioning** on the columns queries filter by
   (dt/hour/event_type in the reference's warehouse — its ES sinks
   partition by day for the same reason, reference
   scala/…/utils/MyESUtil.scala:21-37 daily indices): a filter on the
   partition column becomes a PartitionFilter and the scan never
   opens the other directories.
2. **Within-file ordering** on the secondary filter column: parquet
   row-group min/max statistics then prune row groups inside each
   file, turning a point/range lookup into a few row groups instead
   of a full-file scan.

The classic trap is writing partitioned data WITHOUT repartitioning
first: every one of T tasks holds rows of every partition value, so
the writer emits T×|partitions| small files — at cluster scale, a
metastore/listing meltdown. `write_partitioned` repartitions on the
partition columns first (one file per partition by default), which is
also what keeps file counts independent of the writing job's
parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime0523_spark.core.bucketing import _walk_physical


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    sort_cols: str | list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write `df` as directory-partitioned parquet with a controlled
    file count and optional within-file ordering.

    `files_per_partition` > 1 spreads each partition over that many
    files (salt the repartition) when single partitions are too big
    for one task — file count stays `files × |partitions|`, still
    independent of the writing job's parallelism."""
    pc = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    if files_per_partition > 1:
        # deterministic content-hash salt: a nondeterministic salt
        # (rand/monotonic id) inside a repartition expression is
        # re-evaluated on the exchange's retry path and Spark collapses
        # the partitioning (observed: every (partition, salt) combo in
        # one task); hashing the row's own columns is replay-stable
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        out = df.withColumn("__salt", salt).repartition(
            *[F.col(c) for c in pc], F.col("__salt")
        ).drop("__salt")
    else:
        out = df.repartition(*[F.col(c) for c in pc])
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        out = out.sortWithinPartitions(*pc, *sc)
    out.write.mode(mode).partitionBy(*pc).parquet(path)


def partition_filter_count(df: DataFrame) -> int:
    """Number of partition-pruning predicates in `df`'s scan(s),
    counted by walking the physical plan tree and reading each file
    scan's `partitionFilters` — not by substring-matching the rendered
    plan, which a renderer change would silently break."""
    n = 0
    for node in _walk_physical(df._jdf.queryExecution().executedPlan()):
        if node.getClass().getSimpleName() == "FileSourceScanExec":
            n += node.partitionFilters().size()
    return n


def scan_pruned(
    spark: SparkSession,
    path: str,
    predicate: Column,
    require_pruning: bool = True,
) -> DataFrame:
    """Read a partitioned dataset with `predicate`, REFUSING (by
    default) a plan in which no part of the predicate reached the
    scan's partition filters — the loud version of the layout
    contract, like cobucketed_join's no-shuffle refusal: a filter on
    a non-partition column silently scans every directory, and at
    100 TB that is a correctness-of-cost bug, not a nuance."""
    df = spark.read.parquet(path).filter(predicate)
    if require_pruning:
        n = partition_filter_count(df)
        if n == 0:
            raise RuntimeError(
                f"scan of {path} planned ZERO partition filters for this "
                f"predicate — the filtered column is not a partition "
                f"column, so every partition directory would be read. "
                f"Re-partition the layout or pass require_pruning=False."
            )
    return df
