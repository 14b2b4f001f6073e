"""Join operators — SURVEY §2.4 J1-J7.

The reference hand-implements three dim-join strategies (per-record
lookup / per-partition batched IN / per-batch broadcast — documented as
方案一/二/三 at scala/…/dwd/Ods_to_DWD_order_info.scala:68-186) and a
windowed stream-stream join (scala/…/dws/OrderWiderApp.scala:117-128).
In Spark the strategy is the planner's job: we declare equi-joins,
hint `broadcast()` for dims known-small, and let AQE convert
sort-merge→broadcast / split skewed partitions at runtime. The
streaming J1 equivalent lives in realtime0523_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def order_wide_join(
    orders: DataFrame, details: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Header × detail equi-join producing the wide record (J1 batch
    shape + P8 projection). Shuffle-hash/sort-merge on the order key —
    both sides are facts; at 100 TB co-partitioning (bucketing) on the
    order key removes the shuffle entirely."""
    return orders.join(details, on=on, how=how)


def enrich_dims(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str | list[str]]],
    how: str = "left",
) -> DataFrame:
    """Chained broadcast left-joins of small dims onto a fact stream —
    J5/J7 (three-way sku→category3/trademark/spu enrichment,
    reference scala/…/dim/SkuInfoApp.scala:60-117).

    Left-join semantics keep unmatched facts with null dim fields —
    the reference's intent, minus its NPE bugs on missing dims
    (scala/…/dwd/Ods_to_DWD_order_info.scala:176-179).
    """
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), on=key, how=how)
    return out
