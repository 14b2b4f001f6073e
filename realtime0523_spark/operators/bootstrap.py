"""Bootstrap confidence intervals by deterministic Poisson
resampling — uncertainty quantification as one relational pass.

The classical bootstrap (resample n rows with replacement, B times)
is a driver-side loop over the corpus; the distributed form (Chamandy
et al., "Estimating Uncertainty for Massive Data Streams", Google
2012; Kleiner et al.'s BLB is the heavier cousin) observes that each
row's multiplicity in one resample is approximately Poisson(1),
independent per (row, replicate) — so every row can emit its B
weights locally and each replicate's statistic is a weighted
aggregate. No resample materialization, no driver loop: a B-fold
explode (map-side, feeding a partial agg of B·|groups| rows) and two
tiny finishing steps.

Determinism (the repo's approximate-answers/exact-oracles rule): the
per-(row, replicate) uniform is the first 12 hex chars of
md5(id:replicate) over 2^48 — bit-identical in DuckDB — and the
Poisson(1) draw is its inverse-CDF lookup against hard-coded
cumulative thresholds (capped at 7; P(X>7) < 1e-5). Metric values
ride as integer cents so weighted sums are exact and
association-order-free; the replicate means and percentile ranks
replay bit-for-bit.

At 100 TB: the explode is B× map-side fan-out into a partial-agg'd
groupBy — the shuffle carries B·|groups| partial rows, not B corpora.
The finishing window sorts B values per group (B=32: metadata)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

BOOTSTRAP_B = 32
# cumulative Poisson(1) CDF, exp(-1)*sum(1/i!), i<=k — shared literals
# with the SQL oracle (decimal repr round-trips to identical doubles)
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)
_HASH_SPACE = float(2**48)


def poisson1_weight(id_col: Column, rep: Column) -> Column:
    """Deterministic Poisson(1) multiplicity of a row in replicate
    `rep`: inverse-CDF over the 48-bit md5(id:rep) uniform."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(id_col.cast("string"), F.lit(":"), rep.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(_HASH_SPACE)
    )
    w = F.lit(len(POISSON1_CDF))  # cap
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    b: int = BOOTSTRAP_B,
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Per-group mean of `value_col` (2-dp money) with a bootstrap
    percentile interval: the lo_rank-th / hi_rank-th smallest of the b
    replicate means (1-indexed; defaults ≈ the 2.5/97.5 percentiles at
    b=32). Output: group, est_mean, ci_lo, ci_hi, n_rows."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        cents.alias("_vc"),
    )
    # point estimate from the original sample — exact integer sums
    est = base.groupBy("grp").agg(
        (F.sum("_vc").cast("double") / F.count(F.lit(1))).alias("est_mean"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    # B-fold map-side fan-out -> per-(group, replicate) weighted sums
    reps = base.select(
        "grp",
        "_id",
        "_vc",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("rep"),
    ).withColumn("w", poisson1_weight(F.col("_id"), F.col("rep")))
    rep_means = (
        reps.groupBy("grp", "rep")
        .agg(
            F.sum(F.col("w").cast("long") * F.col("_vc")).alias("swv"),
            F.sum("w").cast("long").alias("sw"),
        )
        .filter(F.col("sw") > 0)  # an empty resample contributes no mean
        .select(
            "grp",
            "rep",
            (F.col("swv").cast("double") / F.col("sw")).alias("mean_b"),
        )
    )
    # rep as tiebreaker: equal means must rank deterministically
    ranked = rep_means.withColumn(
        "rk", F.row_number().over(W.partitionBy("grp").orderBy("mean_b", "rep"))
    )
    ci = (
        ranked.filter(F.col("rk").isin(lo_rank, hi_rank))
        .groupBy("grp")
        .agg(
            F.min(F.when(F.col("rk") == lo_rank, F.col("mean_b"))).alias("ci_lo"),
            F.min(F.when(F.col("rk") == hi_rank, F.col("mean_b"))).alias("ci_hi"),
        )
    )
    return (
        est.join(ci, "grp")
        .select(
            "grp",
            (F.round(F.col("est_mean") / 100.0, 9)).alias("est_mean"),
            (F.round(F.col("ci_lo") / 100.0, 9)).alias("ci_lo"),
            (F.round(F.col("ci_hi") / 100.0, 9)).alias("ci_hi"),
            "n_rows",
        )
    )
