"""Bucketed-table support: co-located joins without a shuffle.

At 100 TB the dominant cost of the header×detail join (SURVEY §2.4 J1
batch shape) is shuffling both fact tables on the order key. Bucketing
both sides into the same number of buckets on that key at write time
makes the join a per-bucket zip — the physical plan has NO Exchange on
either side (asserted in tests/test_scale_plans.py). This is the
batch analog of the reference pre-partitioning its Kafka topics by key
("4 partitions, 4 executors", reference scala/…/app/Dau.scala:41-42),
done once at ingest instead of per query.

Uses the session catalog's parquet data-source tables — no Hive
dependency; at cluster scale the same API writes to the shared
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: str | list[str],
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the join-time
    sort of a sort-merge join."""
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).bucketBy(buckets, *bc)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def _walk_physical(jplan):
    """Yield every node of a physical plan tree. Descends through the
    AQE wrappers that hide operators from ``children()``:
    AdaptiveSparkPlanExec holds its CURRENT inner plan (initial before
    execution, re-planned after) outside the child list, and a
    materialized QueryStageExec wraps the exchange it replaced behind
    ``plan()``."""
    yield jplan
    name = jplan.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk_physical(jplan.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk_physical(jplan.plan())
        return
    it = jplan.children().iterator()
    while it.hasNext():
        yield from _walk_physical(it.next())


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan,
    counted by walking the plan TREE and class-matching
    ShuffleExchange* nodes — not by substring-matching the rendered
    plan string, where a renderer format change across Spark versions
    would silently return 0 and defeat the cobucketed_join guard
    (and where the pre-AQE initial string can disagree with the final
    plan)."""
    return sum(
        1
        for node in _walk_physical(df._jdf.queryExecution().executedPlan())
        if "ShuffleExchange" in node.getClass().getSimpleName()
    )


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    require_no_shuffle: bool = True,
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With
    `require_no_shuffle` (default) the call REFUSES a plan that
    re-shuffles either side — the loud version of the co-location
    contract: a bucket-count or key mismatch fails fast instead of
    silently re-paying the shuffle every run."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.join(right, left[left_key] == right[right_key])
    if require_no_shuffle:
        n = exchange_count(joined)
        if n:
            raise RuntimeError(
                f"join of {left_table} ⋈ {right_table} plans {n} shuffle "
                f"exchange(s) — the tables are not co-bucketed on the join "
                f"key (same bucket count, same key both sides). Rewrite "
                f"the bucketed tables or drop require_no_shuffle."
            )
    return joined
