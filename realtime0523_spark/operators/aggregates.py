"""Aggregation operators beyond plain groupBy — SURVEY §2.5 notes.

The reference's aggregates are per-batch `reduceByKey` sums
(scala/…/ads/TradeMarkAmountApp.scala:47-56) over at most a handful of
brand keys — exactly the shape that melts down at 100 TB when a few
keys dominate (every row of a hot key lands on one reducer). The
salted two-stage aggregation here is the standard fix: spread each hot
key over N sub-keys, partially aggregate, then combine the partials —
two small shuffles instead of one skewed one. Results are identical to
the plain groupBy for algebraic aggregates (sum/count/min/max).

AQE's skew handling (spark.sql.adaptive.*) covers skewed *joins*;
skewed *aggregations* still benefit from explicit salting when a
single group exceeds what one task should hold — this operator makes
that strategy a first-class, testable primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt_from: str | Column,
    buckets: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """Skew-safe sum/count by `keys`.

    `salt_from` is any column (or expression) whose hash spreads rows
    of one group across `buckets` sub-groups — typically a high-
    cardinality id already present in the row, so the salt is
    deterministic and replay-stable (no rand()). Stage 1 aggregates
    (keys, salt) — map-side partial combine does most of the work;
    stage 2 re-aggregates the ≤ buckets partial rows per key.

    Note the double-rounding caveat: the result equals the unsalted
    groupBy exactly for counts and integer-valued sums; float sums may
    differ in the last ulp because addition order changes (same caveat
    as any shuffle-order change in Spark itself).
    """
    salt = F.pmod(
        F.hash(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
        F.lit(buckets),
    ).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_alias),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.sum(count_alias).alias(count_alias),
    )


def exact_quantiles(
    df: DataFrame,
    keys: list[str],
    value: str,
    quantiles: dict[str, float],
) -> DataFrame:
    """Exact linear-interpolation percentiles per group
    (`percentile`, not `approx_percentile` — the oracle-matchable
    form; swap to approx_percentile at scales where an exact
    per-group sort is unaffordable)."""
    return df.groupBy(*keys).agg(
        *[
            F.percentile(value, F.lit(q)).alias(name)
            for name, q in quantiles.items()
        ]
    )
