"""Order-amount allocation (分摊) — SURVEY §2.10 F1.

Reference semantics (scala/…/dws/OrderWiderApp.scala:148-199): an
order's paid total `final_total_amount` is distributed across its
detail rows proportionally to `sku_num*sku_price / original_total`,
each share rounded to 2 decimals, and the LAST detail row takes the
remainder (total − Σ previous rounded shares) so shares sum exactly to
the paid total. The reference detects the last row with running sums
kept in Redis and a float-equality test (OrderWiderApp.scala:181) —
arrival-order dependent. We instead define a deterministic order
(the detail key) and formulate the whole thing as window functions:
one shuffle on the order key, no external state, linear scale-out.

Documented divergences (SURVEY §7.4): deterministic ordering replaces
arrival order; the last row uses double division (the reference's
integer-division truncation at :183 is a bug, not a semantic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2


def allocate_order_amount(
    details: DataFrame,
    order_key: str,
    detail_order_by: list[str],
    weight: Column | str,
    order_total: Column | str,
    out_col: str = "final_detail_amount",
) -> DataFrame:
    """Add `out_col`: the detail row's allocated share of `order_total`.

    `detail_order_by` must be a total order within each order group
    (pass tiebreaker columns) — the reference leaves this implicit
    (arrival order); we make it deterministic.

    Invariant (tested): per order with all details present,
    Σ out_col == round2(order_total).

    Plan shape: one hash-partition + one sort on the order key feeds
    every window here (same Window family → a single Exchange+Sort in
    the physical plan). At 100 TB this is one shuffle keyed by order —
    the natural partitioning for every downstream per-order op.
    """
    weight_c = F.col(weight) if isinstance(weight, str) else weight
    total_c = F.col(order_total) if isinstance(order_total, str) else order_total

    by_order = W.partitionBy(order_key)
    ordered = by_order.orderBy(*detail_order_by)

    # Stage the proportional share as a real column first: window
    # functions can't nest (same restriction in DuckDB), and staging
    # keeps the two engines' evaluation order identical.
    staged = (
        details.withColumn("__prop", round2(total_c * weight_c / F.sum(weight_c).over(by_order)))
        .withColumn("__rn", F.row_number().over(ordered))
        .withColumn("__n", F.count(F.lit(1)).over(by_order))
    )
    prev_sum = F.coalesce(
        F.sum("__prop").over(ordered.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0.0),
    )
    share = F.when(
        F.col("__rn") == F.col("__n"), round2(total_c - prev_sum)
    ).otherwise(F.col("__prop"))
    return staged.withColumn(out_col, share).drop("__prop", "__rn", "__n")


# The DuckDB-oracle formulation of this operator lives next to the
# query inventory (realtime0523_spark/plans/inventory.py) — it must be
# staged in two SELECT levels because window calls cannot nest.
