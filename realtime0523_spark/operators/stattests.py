"""Sequential and distributional monitoring statistics: CUSUM
changepoint alarms (Page, Biometrika 1954), the exact two-sample
Kolmogorov-Smirnov test (the nonparametric complement to the
bucketed PSI/KL monitors in llm/pipeline.py), and the chi-square
test of independence — the three screens a KPI/feature monitor runs
that the sketch family cannot answer:

- CUSUM asks WHEN a series' level shifted (the drift monitors ask
  whether two snapshots differ; CUSUM localizes the change point and
  fires online);
- KS asks whether two samples come from the same CONTINUOUS
  distribution with zero binning decisions (PSI/KL depend on a bucket
  layout; KS is the exact, assumption-free referee);
- chi-square asks whether two CATEGORICAL columns are independent
  (the feature-redundancy screen for discrete features, beside the
  Pearson matrix for numeric ones).

Scale discipline shared by all three: the corpus collapses to a
synopsis in ONE partial-agg'd pass (hourly cells, per-value cells,
contingency cells) and every window/join after runs on that synopsis.
None of these operators ever sorts or re-scans the fact table.

Exactness discipline: all series/count arithmetic is integer. CUSUM
deviations are scaled by the per-key point count (d_i = n·x_i − Σx, a
zero-sum integer sequence) so no mean is ever a float; the CUSUM
recursion collapses to the prefix-sum identity
    C⁺_i = P_i − min(0, min_{j≤i} P_j)
    C⁻_i = max(0, max_{j≤i} P_j) − P_i
(P = inclusive prefix sum of d), which any SQL engine replays with
two running windows — no recursive CTE, no per-row state. KS distances
are cross-multiplied integers |F₁n₁n₂ − F₂n₁n₂| so the max is decided
on exact integers; only the final normalization divides. Chi-square
uses the join-free identity χ² = N(Σ o²/(r·c) − 1), which absorbs
zero-observed cells exactly — margins are window sums over the cell
synopsis, every float is the identical IEEE expression in both
engines, 9-dp rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# alarm when CUSUM exceeds ALARM_TOTAL_MULT × Σx — in the scaled units
# (cents·n) that equals a cumulative excess of ALARM_TOTAL_MULT
# full-series means; integer multiplier keeps the threshold exact
ALARM_TOTAL_MULT = 1

# two-sided KS critical coefficient at alpha = 0.05 (Smirnov):
# reject when D > c(alpha) * sqrt((n1+n2)/(n1*n2))
KS_CRIT_COEFF = 1.358


def cusum_series(
    series: DataFrame,
    key_col: str = "k",
    order_col: str = "t",
    value_col: str = "x",
    alarm_total_mult: int = ALARM_TOTAL_MULT,
) -> DataFrame:
    """Two-sided CUSUM over an integer-valued series per key.

    `series` is an already-aggregated synopsis (one row per (key,
    tick)) — the operator contract is that it is metadata-sized; the
    corpus-to-series collapse is the caller's one partial-agg'd pass.
    `value_col` must be an exact integer (cents, counts).

    Deviations are target-free and exactly integer: with n points and
    total T per key, d_i = n·x_i − T (Σd = 0 by construction), i.e.
    the deviation from the per-key mean scaled by n. The classic
    reset-at-zero recursions C⁺_i = max(0, C⁺_{i−1} + d_i) and
    C⁻_i = max(0, C⁻_{i−1} − d_i) collapse to the prefix-sum/running-
    extremum identity above — two ordered windows over the synopsis,
    nothing sequential. Alarms fire when a CUSUM exceeds
    alarm_total_mult · T (= that many full-series means of cumulative
    excess, exact in the scaled units).

    Returns one row per input point: (key, order, value, cusum_up,
    cusum_dn, alarm_up, alarm_dn) with the CUSUMs in scaled units.
    """
    k, t, x = F.col(key_col), F.col(order_col), F.col(value_col)
    wk = W.partitionBy(key_col)
    d = series.select(
        k.alias("k"),
        t.alias("t"),
        x.cast("long").alias("x"),
        (F.count(F.lit(1)).over(wk) * x.cast("long")
         - F.sum(x.cast("long")).over(wk)).alias("d"),
        (F.sum(x.cast("long")).over(wk)
         * F.lit(int(alarm_total_mult))).alias("h"),
    )
    # running extrema of P need P as a realized column (windows do not
    # nest), so the prefix sum lands in its own projection first
    wop = W.partitionBy("k").orderBy("t").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    d = d.withColumn("p", F.sum("d").over(wop))
    out = d.select(
        "k",
        "t",
        "x",
        "h",
        (F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(wop)))
        .alias("cusum_up"),
        (F.greatest(F.lit(0).cast("long"), F.max("p").over(wop)) - F.col("p"))
        .alias("cusum_dn"),
    )
    return out.select(
        "k",
        "t",
        "x",
        "cusum_up",
        "cusum_dn",
        (F.col("cusum_up") > F.col("h")).alias("alarm_up"),
        (F.col("cusum_dn") > F.col("h")).alias("alarm_dn"),
    )


def cusum_summary(series: DataFrame, key_out: str = "event_type") -> DataFrame:
    """Per-key alarm report over a (k, t, x) integer series: point
    count, both max CUSUMs (scaled units), alarm counts per side, and
    the first alarming tick. Shared by the batch query and the
    streaming twin so both finish identical algebra on the identical
    synopsis (the finish_trend discipline)."""
    c = cusum_series(series)
    alarm = F.col("alarm_up") | F.col("alarm_dn")
    return c.groupBy(F.col("k").alias(key_out)).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.max("cusum_up").cast("long").alias("max_cusum_up"),
        F.max("cusum_dn").cast("long").alias("max_cusum_dn"),
        F.sum(F.when(F.col("alarm_up"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarms_up"),
        F.sum(F.when(F.col("alarm_dn"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarms_dn"),
        F.min(F.when(alarm, F.col("t"))).alias("first_alarm_hr"),
    )


def ks_2sample(cells: DataFrame) -> DataFrame:
    """Exact two-sample KS statistic per key from a per-value cell
    table (key, v, c1, c2) — c1/c2 are the two samples' counts at
    value v (zero when absent), normally collapsed by the caller's
    one partial-agg'd pass so this runs on the |key|×NDV synopsis;
    duplicate (key, v) rows are folded defensively (the ECDF steps
    once per distinct value — a property test caught the per-row
    cumulative otherwise). A key with one sample empty (a type born
    mid-month) yields NULL ks_d/ks_crit via nullif, never a
    divide-by-zero.

    D = max_v |F1(v) − F2(v)| is decided on EXACT integers by cross-
    multiplying the ECDF steps: |cum1·n2 − cum2·n1| (ties are handled
    by the per-value collapse — both ECDFs step once per distinct
    value). Only the final D and the Smirnov critical value divide.
    The cross product stays within long until both samples exceed
    ~3·10⁹ rows per key; past that, widen to decimal (documented
    contract, asserted nowhere near at fixture scale).

    Returns (key, n_a, n_b, ks_num, ks_d, ks_crit, drifted): ks_num
    exact, ks_d = ks_num/(n_a·n_b) and the alpha=0.05 critical value
    9-dp rounded.
    """
    wk = W.partitionBy("key")
    wo = wk.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    # defensive collapse: the ECDF steps once per DISTINCT value, so
    # duplicate (key, v) rows must fold before the ROWS-frame windows
    # (a property test caught the per-row cumulative otherwise); a
    # no-op partial agg when the caller already collapsed
    g = (
        cells.groupBy("key", "v")
        .agg(
            F.sum(F.col("c1").cast("long")).alias("c1"),
            F.sum(F.col("c2").cast("long")).alias("c2"),
        )
    )
    g = g.select(
        "key",
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c2").over(wo).alias("cum2"),
        F.sum("c1").over(wk).alias("n_a"),
        F.sum("c2").over(wk).alias("n_b"),
    )
    num = F.abs(F.col("cum1") * F.col("n_b") - F.col("cum2") * F.col("n_a"))
    agg = g.groupBy("key").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(num).alias("ks_num"),
    )
    # one empty sample (a type born mid-month) → no test, NULL stats
    # rather than a divide-by-zero (both engines via nullif)
    prod = F.nullif(
        F.col("n_a").cast("double") * F.col("n_b").cast("double"),
        F.lit(0.0),
    )
    d_stat = F.round(F.col("ks_num").cast("double") / prod, 9)
    crit = F.round(
        F.lit(KS_CRIT_COEFF)
        * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double") / prod
        ),
        9,
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("ks_num").cast("long").alias("ks_num"),
        d_stat.alias("ks_d"),
        crit.alias("ks_crit"),
        (d_stat > crit).alias("drifted"),
    )


def chi2_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V effect size.

    One partial-agg'd pass collapses the corpus to the |A|×|B|
    observed contingency cells, and everything after is JOIN-FREE via
    the standard algebraic identity
        Σ_{all cells} (o − e)²/e  =  N · (Σ_{observed} o²/(r·c) − 1)
    (expand (o−e)²/e with e = r·c/N and note Σo = N, Σ_{a,b} r·c =
    N²; cells with o = 0 contribute exactly their e, which the
    identity absorbs — no zero-including grid, no margin joins, no
    scalar attach). Margins arrive as two window sums OVER THE CELL
    SYNOPSIS (partition by a, then by b); the one output row is a
    plain global aggregate. Each term is (o/r)·(o/c) in double — the
    identical IEEE expression in both engines — and the 9-dp round on
    the final combination absorbs float summation order (the
    events_value_drift discipline). Cramér's V derives from the
    ROUNDED chi2 so both engines transform identical quantized
    values.

    Returns one row: (n_rows, dof, chi2, cramers_v).
    """
    return chi2_from_cells(chi2_cells(df, a_col, b_col))


def chi2_cells(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """The corpus-to-cells collapse: observed (a, b) counts — exact
    longs, additive across any slicing (the streaming twin's whole
    argument)."""
    return (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )


def chi2_from_cells(cells: DataFrame) -> DataFrame:
    """The synopsis-to-answer finisher — shared by the batch query
    and the streaming twin so both finish identical algebra."""
    w = cells.select(
        "a",
        "b",
        "o",
        F.sum("o").over(W.partitionBy("a")).alias("r"),
        F.sum("o").over(W.partitionBy("b")).alias("c"),
    )
    od = F.col("o").cast("double")
    s = w.agg(
        F.sum("o").cast("long").alias("n_rows"),
        F.count_distinct("a").alias("na"),
        F.count_distinct("b").alias("nb"),
        F.sum(
            (od / F.col("r").cast("double")) * (od / F.col("c").cast("double"))
        ).alias("s1"),
    )
    chi2 = s.select(
        "n_rows",
        ((F.col("na") - 1) * (F.col("nb") - 1)).cast("long").alias("dof"),
        F.round(
            F.col("n_rows").cast("double") * (F.col("s1") - F.lit(1.0)), 9
        ).alias("chi2"),
        F.least(F.col("na") - 1, F.col("nb") - 1).alias("mindim"),
    )
    # a degenerate table (one category on either axis) has dof 0 and
    # no effect size — NULL via nullif, never a divide-by-zero
    return chi2.select(
        "n_rows",
        "dof",
        "chi2",
        F.round(
            F.sqrt(
                F.col("chi2")
                / F.nullif(
                    F.col("n_rows").cast("double")
                    * F.col("mindim").cast("double"),
                    F.lit(0.0),
                )
            ),
            9,
        ).alias("cramers_v"),
    )


# --- shared monitor-cell collapses and the report composition ---------
# One corpus pass each, additive exact counts — the property that gives
# every monitor a streaming twin for free (streaming/cells.py and
# streaming/monitor.py commit these same cells per micro-batch).


def ks_month_half_cells(df: DataFrame) -> DataFrame:
    """Corpus-to-cells collapse for the KS monitor: per-(type, cent)
    counts of both month halves in one row — exact longs, additive
    across any slicing (the streaming twin's whole argument)."""
    return df.groupBy(
        F.col("event_type").alias("key"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    ).agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )


def value_drift_cells(df: DataFrame, n_buckets: int) -> DataFrame:
    """Corpus-to-cells collapse for the value-drift (Jeffreys) monitor:
    per-(type, DDSketch-log-bucket) counts of both month halves in one
    row — same additive-cells shape as the KS collapse. The bucket
    index is the shifted dd_bucket the batch drift query uses (zero-bin
    at 0, tail clamped into the last bucket)."""
    from realtime0523_spark.operators.ddsketch import ZERO_BUCKET, dd_bucket

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    raw = dd_bucket(cents)
    shifted = F.when(raw == F.lit(ZERO_BUCKET), F.lit(0)).otherwise(
        F.least(raw, F.lit(n_buckets - 2)) + 1
    )
    return df.groupBy(
        F.col("event_type").alias("domain"), shifted.alias("bucket")
    ).agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0))
        .cast("long")
        .alias("cnt_a"),
        F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0))
        .cast("long")
        .alias("cnt_b"),
    )


def value_drift_from_cells(cells: DataFrame, n_buckets: int) -> DataFrame:
    """Finish the Jeffreys drift report from folded half-count cells —
    the identical smoothed-KL core as the batch query (composition:
    llm/pipeline.drift_from_counts on the two unmerged profiles)."""
    from realtime0523_spark.llm.pipeline import drift_from_counts

    drift = drift_from_counts(
        cells.select("domain", "bucket", F.col("cnt_a").alias("cnt")),
        cells.select("domain", "bucket", F.col("cnt_b").alias("cnt")),
        n_buckets=n_buckets,
    )
    return drift.withColumn(
        "jeffreys", F.round(F.col("kl_ab") + F.col("kl_ba"), 9)
    )


def compose_monitor_report(
    trend: DataFrame,
    cusum: DataFrame,
    ks: DataFrame,
    drift: DataFrame,
    jeffreys_alert: float,
) -> DataFrame:
    """The per-type KPI dashboard row: join the four |types|-row
    synopsis reports broadcast and derive the composite alert count.
    Shared by the batch query and the streaming twin so both finish
    identical algebra on identical folded synopses."""
    alerts = (
        F.when(F.col("n_alarms_up") + F.col("n_alarms_dn") > 0, 1).otherwise(0)
        + F.when(F.col("ks_drifted"), 1).otherwise(0)
        + F.when(F.col("jeffreys") > F.lit(jeffreys_alert), 1).otherwise(0)
    )
    return (
        trend.join(
            F.broadcast(cusum.withColumnRenamed("event_type", "et_c")),
            F.col("et_c") == F.col("event_type"),
        )
        .join(
            F.broadcast(
                ks.select(
                    F.col("key").alias("et_k"),
                    "ks_d",
                    F.col("drifted").alias("ks_drifted"),
                )
            ),
            F.col("et_k") == F.col("event_type"),
        )
        .join(
            F.broadcast(drift.select(F.col("domain").alias("et_d"), "jeffreys")),
            F.col("et_d") == F.col("event_type"),
        )
        .select(
            "event_type",
            "n_rows",
            "slope_per_day",
            "n_alarms_up",
            "n_alarms_dn",
            "first_alarm_hr",
            "ks_d",
            "ks_drifted",
            "jeffreys",
            alerts.cast("long").alias("n_alerts"),
        )
    )
