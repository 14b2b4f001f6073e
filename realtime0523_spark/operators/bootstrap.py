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
per-(row, replicate) uniform is a 12-hex-char (48-bit) slice of
md5(id:pair) over 2^48 — bit-identical in DuckDB — and the
Poisson(1) draw is its inverse-CDF lookup against hard-coded
cumulative thresholds (capped at 7; P(X>7) < 1e-5). One digest seeds
TWO replicates (rep = 2*pair + slice, slice 0 taking hex chars 1-12
and slice 1 chars 13-24): md5 dominates the fan-out stage's CPU, so
pairing halves the hash work for free — the two 48-bit halves of an
md5 digest are independent uniforms. Metric values ride as integer
cents so weighted sums are exact and association-order-free; the
replicate means and percentile ranks replay bit-for-bit.

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


def _pois_inverse_cdf(u: Column) -> Column:
    """Poisson(1) inverse-CDF lookup of a [0,1) uniform."""
    w = F.lit(len(POISSON1_CDF))  # cap
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def _slice_uniform(digest: Column, slice_idx: Column) -> Column:
    """48-bit uniform from hex chars [1+12*slice, 12+12*slice) of an
    md5 digest (slice 0 or 1 — two independent uniforms per digest)."""
    return (
        F.conv(
            F.substring(digest, F.lit(1) + F.lit(12) * slice_idx, F.lit(12)),
            16,
            10,
        ).cast("bigint")
        / F.lit(_HASH_SPACE)
    )


def poisson1_weight(id_col: Column, rep: Column) -> Column:
    """Deterministic Poisson(1) multiplicity of a row in replicate
    `rep`: inverse-CDF over the 48-bit uniform at slice (rep % 2) of
    md5(id:rep div 2) — one digest seeds two consecutive replicates."""
    pair = F.floor(rep / F.lit(2)).cast("long")
    digest = F.md5(
        F.concat(id_col.cast("string"), F.lit(":"), pair.cast("string"))
    )
    return _pois_inverse_cdf(_slice_uniform(digest, rep % F.lit(2)))


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
    b=32). Output: group, est_mean, ci_lo, ci_hi, n_rows.

    Tiny-group contract: empty resamples (sum of Poisson weights = 0)
    contribute no mean, so a group can have fewer than b replicate
    means — for a 1-row group ~37% of Poisson(1) replicates are empty
    and fewer than hi_rank means may exist. Both ranks are therefore
    CLAMPED to the group's actual replicate count (least(rank, cnt)),
    so ci_lo/ci_hi are always non-NULL for any non-empty group; for
    very small groups the interval degenerates toward the extreme
    replicate means rather than silently returning NULL (round-8
    advice item). The interval is statistically meaningless below
    ~30 rows per group either way — the caller owns that judgment."""
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
    # B-fold map-side fan-out -> per-(group, replicate) weighted sums.
    # Explode by digest PAIR (b/2 md5 calls per row, not b): each
    # digest's two 48-bit halves seed replicates 2*pair and 2*pair+1
    # (whole-stage codegen CSE computes the shared md5 once).
    if b % 2:
        raise ValueError(f"b must be even (one md5 seeds 2 replicates): {b}")
    pairs = base.select(
        "grp",
        "_vc",
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(b // 2 - 1))).alias("pair"),
    ).withColumn(
        "dig",
        F.md5(
            F.concat(
                F.col("_id").cast("string"),
                F.lit(":"),
                F.col("pair").cast("string"),
            )
        ),
    )
    reps = pairs.select(
        "grp",
        "_vc",
        "pair",
        F.posexplode(
            F.array(
                _pois_inverse_cdf(_slice_uniform(F.col("dig"), F.lit(0))),
                _pois_inverse_cdf(_slice_uniform(F.col("dig"), F.lit(1))),
            )
        ).alias("slice", "w"),
    ).select(
        "grp",
        "_vc",
        (F.col("pair") * 2 + F.col("slice")).alias("rep"),
        "w",
    )
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
    # rep as tiebreaker: equal means must rank deterministically.
    # cnt (non-empty replicate count) rides along so tiny groups clamp
    # their ranks instead of losing a CI bound to NULL.
    ranked = rep_means.select(
        "grp",
        "mean_b",
        F.row_number()
        .over(W.partitionBy("grp").orderBy("mean_b", "rep"))
        .alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).alias("cnt"),
    )
    lo = F.least(F.lit(lo_rank), F.col("cnt"))
    hi = F.least(F.lit(hi_rank), F.col("cnt"))
    ci = (
        ranked.filter((F.col("rk") == lo) | (F.col("rk") == hi))
        .groupBy("grp")
        .agg(
            F.min(F.when(F.col("rk") == lo, F.col("mean_b"))).alias("ci_lo"),
            F.min(F.when(F.col("rk") == hi, F.col("mean_b"))).alias("ci_hi"),
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
