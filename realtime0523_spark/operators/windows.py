"""Window operators — SURVEY §2.6 O1/O2, §2.5 A3/A4, top-k.

The reference does these with `groupByKey` + in-memory list sort
(scala/…/dwd/Ods_to_DWD_order_info.scala:106-127) and Redis running
accumulators (scala/…/dws/OrderWiderApp.scala:157-199). Window
functions express the same semantics with one shuffle and no
group-materialization — each group streams through the sort, so a
skewed user with 10M orders doesn't OOM an executor the way
`groupByKey().mapValues(_.toList.sortWith…)` would.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def first_flag(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    out_col: str = "if_first_order",
) -> DataFrame:
    """'1' on the earliest row per key, '0' on the rest.

    Parity: reference scala/…/dwd/Ods_to_DWD_order_info.scala:112-126
    (sort group by create_time, keep first flagged, demote rest).
    """
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    w = W.partitionBy(*pb).orderBy(*ob)
    return df.withColumn(
        out_col,
        F.when(F.row_number().over(w) == 1, F.lit("1")).otherwise(F.lit("0")),
    )


def running_sum(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    value: Column | str,
    out_col: str,
    include_current: bool = True,
) -> DataFrame:
    """Per-key running sum in a deterministic order.

    Parity: the Redis running accumulators at reference
    scala/…/dws/OrderWiderApp.scala:157-199 (A4), minus the external
    state: the window frame IS the accumulator.
    """
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    ob = [order_by] if isinstance(order_by, str) else order_by
    v = F.col(value) if isinstance(value, str) else value
    end = 0 if include_current else -1
    w = W.partitionBy(*pb).orderBy(*ob).rowsBetween(W.unboundedPreceding, end)
    return df.withColumn(out_col, F.coalesce(F.sum(v).over(w), F.lit(0.0)))


def topk_per_group(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group by rank (deterministic iff order_by is a
    total order — pass a tiebreaker column).

    The reference's only "top-n" is debug `print(1000)`
    (scala/…/app/OrderDetailAPP.scala:62); this is the general
    operator its ADS "hot goods" query (scala/…/ads/HotwoodsCount.scala)
    implies. Scale: rank is computed per-partition after one shuffle;
    no global sort.
    """
    pb = [partition_by] if isinstance(partition_by, str) else partition_by
    w = W.partitionBy(*pb).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD-2 dimension history from a change stream: one validity row
    per change, with `valid_from` = the change timestamp, `valid_to` =
    the NEXT change's timestamp for the same key (null = current), and
    `is_current` on the open row.

    The reference's dim sink is SCD-1 (upsert-in-place,
    scala/…/utils/PhoenixUtil upsert path); SCD-2 is the
    warehouse-standard extension a dim consumer asks for next — the
    whole history is one `lead()` window per key, no joins, no state.

    Scale: a single window partitioned by the dimension key — the
    shuffle is one hash exchange on the key, and each partition sorts
    only that key's changes (skew = hottest key's change count, not
    table size).

    Pass `tiebreak_cols` (e.g. the change-log sequence id) whenever
    (key, ts) is not unique: without it, same-timestamp changes get
    nondeterministic valid_to attribution.
    """
    w = W.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    nxt = F.lead(F.col(ts_col)).over(w)
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
