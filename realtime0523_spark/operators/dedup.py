"""Dedup / set-membership operators — SURVEY §2.7 D1-D3.

The reference keeps dedup state in Redis sets with TTLs
(scala/…/app/Dau.scala:104-123, scala/…/dws/OrderWiderApp.scala:129-147)
and first-ever membership in a Phoenix table
(scala/…/dwd/Ods_to_DWD_order_info.scala:83-104). Batch equivalents
here; streaming equivalents (watermark-TTL'd `dropDuplicates`,
first-seen state) live in realtime0523_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dedup_first_by_key(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """Keep exactly the first row per key under a deterministic order.

    Parity: Redis `SADD` first-sighting-wins dedup (reference
    scala/…/app/Dau.scala:109-118, scala/…/dws/OrderWiderApp.scala:136-140),
    with arrival order replaced by an explicit order for determinism.
    Deterministic where `dropDuplicates` is not.
    """
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_daily_users(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """DAU: one row per (dt, user) — the deduped set the reference
    materializes to ES (scala/…/app/Dau.scala:104-153, D1/A5)."""
    return (
        events.select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("dt"),
            F.col(user_col).alias("mid"),
        )
        .distinct()
    )


def first_seen_members(facts: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Rows of `dim` that appear in `facts` (left-semi).

    Parity: the membership test against user_status0523
    (reference scala/…/dwd/Ods_to_DWD_order_info.scala:92-101).
    """
    return dim.join(facts, on=key, how="left_semi")


def never_seen_members(facts: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Rows of `dim` absent from `facts` (left-anti) — the 'first
    order ever' test, D3."""
    return dim.join(facts, on=key, how="left_anti")
