"""Bucketed tables: shuffle-free co-located joins.

The scale notes throughout this repo say "co-locate big joins via
bucketing"; this module is that claim as working code. Writing both
sides of a recurring join bucketed (and sorted) by the join key pins
matching keys to matching files, so the join compiles to a
SortMergeJoin with NO Exchange on either side — the shuffle is paid
ONCE at write time and amortized over every subsequent join, the
standard warehouse layout for a fact table joined daily on the same
key (reference analog: the repeated order_info ⋈ order_detail join,
scala/…/dws/OrderWiderApp.scala:117-128, which re-pays its shuffle
every 5 s micro-batch).

At 100 TB: bucket count is chosen once per table (rows per bucket ≈
target task size); both sides MUST agree on it — a mismatch silently
reintroduces the shuffle. `cobucketed_join` asserts the plan is
exchange-free rather than hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist `df` as a parquet table bucketed (and by default
    sorted) by `key`. Sorting within buckets lets the join skip its
    per-task sort too."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


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
    contract, so a bucket-count mismatch fails fast instead of
    silently paying the shuffle every run."""
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
