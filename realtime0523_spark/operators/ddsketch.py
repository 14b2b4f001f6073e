"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee,
"DDSketch: a fast and fully-mergeable quantile sketch with
relative-error guarantees", VLDB 2019; the production quantile
sketch behind Datadog metrics).

Why this beside the exact quantile family: exact per-group quantiles
(qty_quantiles, event_value_outliers, lineitem_equidepth_hist) need
the values — at 100 TB that's a per-group sort or an NDV-sized
prefix-sum pass. A DDSketch is just BUCKET COUNTS over logarithmic
value buckets: bucket(v) = floor(log_γ v), guaranteeing every
quantile estimate within relative error α where γ = (1+α)/(1−α).
The whole sketch is

    groupBy(group, bucket).count()

— one partial-agg'd shuffle of |groups|·|buckets| rows (|buckets| ≈
log_γ(max/min) ≈ hundreds), MERGEABLE by plain addition: across
partitions (that's what the partial agg does), across time slices,
and across micro-batches (the streaming twin commits per-batch
partial sketches and folds them — bit-identical to the one-pass
sketch, the same idempotent-by-batchId discipline as the KMV and CMS
synopses).

Determinism (cross-engine exact replay): values ride as integer
cents; the bucket index divides two 9-dp-quantized logarithms
(the BM25-idf discipline — one quantized transcendental, then exact
IEEE division and floor), and the bucket's representative value
2·γ^(b+1)/(γ+1) (the minimax point of the floor-indexed range
[γ^b, γ^(b+1))) is 9-dp-quantized before the final rounding. Zeros get
a dedicated bucket below every real index (ln is undefined there;
DDSketch's standard zero-bin). Quantile rank r = floor(q·(n−1)) + 1
over the cumulative bucket counts — a window over the
|groups|·|buckets| sketch, never the data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DD_GAMMA = 1.02  # α ≈ 0.0099 relative-error guarantee
ZERO_BUCKET = -(1 << 30)


def _r9(c: Column) -> Column:
    return F.round(c, 9)


def dd_bucket(cents: Column, gamma: float = DD_GAMMA) -> Column:
    """Logarithmic bucket index of a non-negative integer-cents value:
    floor(r9(ln v) / r9(ln γ)); zero takes the dedicated zero-bin.

    Negative cents RAISE (executor-side, same discipline as
    retraction's unknown-op guard): the one-sided sketch has no bucket
    for them, and silently clamping a negative metric to estimate 0.0
    (the round-8 advice finding) would corrupt quantiles without any
    signal. Signed metrics need a two-sided sketch — not offered yet;
    callers shift-or-split instead."""
    lg = round(math.log(gamma), 9)
    bad = F.raise_error(
        F.concat(
            F.lit("dd_bucket: negative value (cents="),
            cents.cast("string"),
            F.lit("); the one-sided DDSketch accepts only >= 0"),
        )
    )
    return (
        F.when(cents < 0, bad.cast("long"))
        .when(cents == 0, F.lit(ZERO_BUCKET))
        .otherwise(
            F.floor(_r9(F.log(cents.cast("double"))) / F.lit(lg)).cast("long")
        )
    )


def dd_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    gamma: float = DD_GAMMA,
) -> DataFrame:
    """The at-rest synopsis: (group, bucket, n) counts over integer
    cents of `value_col`. One scan, one partial-agg'd shuffle."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    return (
        df.select(F.col(group_col).alias("grp"), dd_bucket(cents, gamma).alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dd_quantiles(
    sketch: DataFrame,
    quantiles: list[tuple[str, int, int]],
    gamma: float = DD_GAMMA,
) -> DataFrame:
    """Quantile estimates from a (grp, bucket, n) sketch — possibly a
    FOLD of many partial sketches (pre-aggregated here, so merged and
    one-pass inputs are indistinguishable). `quantiles` lists
    (label, num, den) with q = num/den; rank = floor(q·(n−1)) + 1,
    answered by the smallest bucket whose cumulative count reaches the
    rank; estimate = 2·γ^b/(γ+1) cents (zero-bin → 0). All windows run
    over the |groups|·|buckets| sketch."""
    folded = sketch.groupBy("grp", "bucket").agg(F.sum("n").alias("n"))
    cum = folded.withColumn(
        "cum",
        F.sum("n").over(
            W.partitionBy("grp")
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).withColumn("total", F.sum("n").over(W.partitionBy("grp")))
    # quantiles attach as an exploded LITERAL array — a pure map-side
    # fan-out (never a join operator, so the no-cartesian plan
    # invariant holds engine-wide)
    qs = F.array(
        *[
            F.struct(
                F.lit(label).alias("quantile"),
                F.lit(num).alias("num"),
                F.lit(den).alias("den"),
            )
            for label, num, den in quantiles
        ]
    )
    rank = F.expr("((total - 1) * q.num) div q.den") + 1
    hit = (
        cum.withColumn("q", F.explode(qs))
        .filter(F.col("cum") >= rank)
        .groupBy("grp", F.col("q.quantile").alias("quantile"), "total")
        .agg(F.min("bucket").alias("bucket"))
    )
    # bucket b (floor-indexed) covers [γ^b, γ^(b+1)); the minimax
    # representative of that range is 2·γ^(b+1)/(γ+1), giving the
    # paper's α = (γ−1)/(γ+1) relative-error guarantee at both ends
    est_cents = F.when(F.col("bucket") == ZERO_BUCKET, F.lit(0.0)).otherwise(
        _r9(
            F.lit(2.0)
            * F.pow(F.lit(gamma), (F.col("bucket") + 1).cast("double"))
            / F.lit(gamma + 1.0)
        )
    )
    return hit.select(
        "grp",
        "quantile",
        F.col("total").cast("long").alias("n_rows"),
        F.round(est_cents / F.lit(100.0), 9).alias("est_value"),
    )
