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

from pyspark.sql import DataFrame, Window as W
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


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: str | list[str],
    probe_ts: str,
    ref_ts: str,
    ref_cols: list[str],
    ref_order: str | None = None,
) -> DataFrame:
    """Backward as-of join: each probe row is enriched with the payload
    of the latest ref row with the same key and ``ref_ts <= probe_ts``
    (left semantics — unmatched probes keep null payloads).

    The reference has no as-of operator (SURVEY §2.4 join-type note);
    this is the time-series lookup its per-record "latest dim state"
    Phoenix reads approximate (reference
    scala/…/dwd/Ods_to_DWD_order_info.scala:68-81).

    Execution is the sort-merge formulation: union both sides, one
    shuffle on the key, a single ordered window pass carries the last
    non-null ref payload forward. Linear in rows, no per-probe probing,
    no range-explosion — the shape that survives 100 TB. Ties:
    a ref at exactly probe_ts wins (sorts before the probe), and
    equal-timestamp refs are resolved by ``ref_order`` (max wins) so
    output is deterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(*[F.col(c) for c in ref_cols]).alias("__asof")
    r = ref.select(
        *keys,
        F.col(ref_ts).alias("__t"),
        F.lit(0).alias("__is_probe"),
        (F.col(ref_order) if ref_order else F.lit(0)).alias("__ro"),
        payload,
    )
    p = probe.withColumn("__t", F.col(probe_ts)).withColumn(
        "__is_probe", F.lit(1)
    )
    u = p.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*keys)
        .orderBy("__t", "__is_probe", "__ro")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__asof", ignorenulls=True).over(w))
    return matched.filter(F.col("__is_probe") == 1).select(
        *probe.columns, *[F.col(f"__m.{c}").alias(c) for c in ref_cols]
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
) -> DataFrame:
    """Event-in-interval join (start-inclusive, end-exclusive) without
    an equi-key — the range-join shape Spark's planner can only
    execute as a nested-loop/cartesian.

    Binned formulation: each event maps to ONE fixed time bin; each
    interval explodes to the (few) bins it overlaps; the join is an
    equi-join on the bin id with the exact range predicate as a
    residual filter. Each (event, interval) pair meets in exactly one
    bin — the event's — so no post-join dedup is needed.

    Scale shape: the O(n·m) nested loop becomes one shuffle on the bin
    key with per-bin fan-out bounded by bin width × interval density;
    pick ``bin_seconds`` ≈ the typical interval length so intervals
    explode to ~2 bins. This is the standard bucketed range-join
    rewrite (e.g. Flink's interval join and Databricks' range-join
    hint do the same binning internally). Plan is asserted
    nested-loop-free in tests.
    """
    b = F.lit(float(bin_seconds))
    ev = events.withColumn(
        "__bin", F.floor(F.col(ts_col).cast("double") / b).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b).cast("long"),
                F.floor(F.col(end_col).cast("double") / b).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, "__bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bin")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side by a
    content hash into `buckets` sub-keys and replicate the right side
    once per bucket, so a hot key's rows spread over `buckets` tasks
    instead of melting one. Identical results to a plain join (the
    equivalence salted_flag_agg's aggregation twin asserts for aggs
    is test-asserted here for joins).

    This is the rewrite AQE's skew-join performs at runtime when it
    detects the skew; the explicit operator is for when AQE cannot
    see it — a streaming micro-batch join, a key whose skew only
    manifests downstream, or a deliberately pinned plan. Cost model:
    right side inflates ×buckets (use for dim-vs-fact skew, keep
    `buckets` ≪ the hot key's row count); left side is one map-side
    column, no extra shuffle beyond the join's own.

    `how` is restricted to joins whose semantics survive the right-side
    replication: inner/left/left_semi/left_anti (each unmatched LEFT
    row appears exactly once regardless of salt). right/full would
    emit every unmatched RIGHT row `buckets` times — refused loudly
    rather than returning silently wrong results.
    """
    safe = {"inner", "left", "leftouter", "left_outer",
            "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join(how={how!r}): right-side replication breaks "
            f"right/full outer semantics (each unmatched right row would "
            f"emit {buckets} times); use a plain join or AQE skew "
            f"handling for those."
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(buckets))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return l.join(r, [on, "__salt"], how).drop("__salt")
