"""Query inventory: every SURVEY §2 operator as a named (PySpark
query, DuckDB oracle SQL) pair.

Each entry is one verifiable capability of the engine, expressed on
the driver's testdata tables. The Spark side uses the operator
library; the oracle side is plain ANSI SQL that DuckDB runs on the
same parquet — the driver hash-compares both at sf0.01
(CORRECTNESS_r{N}.json).

Naming contract: every computed column is aliased identically in both
formulations. Money/doubles are rounded with the shared
floor(x*100+0.5)/100 formula (see realtime0523_spark.functions.scalar)
so both engines do identical IEEE arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime0523_spark.core.catalog import Catalog
from realtime0523_spark.functions.scalar import (
    bucket_label,
    round2,
    status_decode,
)
from realtime0523_spark.operators.allocation import allocate_order_amount
from realtime0523_spark.operators.dedup import (
    dedup_first_by_key,
    distinct_daily_users,
    first_seen_members,
    never_seen_members,
)
from realtime0523_spark.operators.aggregates import exact_quantiles, salted_agg
from realtime0523_spark.operators.joins import (
    asof_join,
    enrich_dims,
    interval_join,
    order_wide_join,
    salted_join,
)
from realtime0523_spark.operators.windows import first_flag, running_sum, topk_per_group


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def _ensure_full_registry() -> None:
    # llm_inventory registers into REGISTRY but imports from this
    # module — load it lazily to avoid the cycle.
    import realtime0523_spark.plans.llm_inventory  # noqa: F401


# The driver's correctness gate checks the first 50 entries of
# ``queries()``. The window ROTATES each round so that the union of
# committed CORRECTNESS_r{N} files covers every registered query.
#
# WINDOW POLICY (round-5 verdict item, written down): slots are filled
# in this order —
#   1. queries ADDED or whose code/oracle CHANGED this round (a driver
#      row must exist for the round that shipped the change);
#   2. queries adjacent to changed operator code even when their
#      registered plan is unchanged (defense in depth);
#   3. everything else STALEST-GREEN FIRST: ascending by the round of
#      each query's newest committed CORRECTNESS row (r1 rows before
#      r3 rows before r4 rows …), with never-driver-tested queries
#      counting as infinitely stale (they outrank every dated row), so
#      no query's driver verification ages indefinitely.
#
# ROTATION SLA (round-8 verdict item, codified): with ~196 registered
# queries and 50 slots per round, a full rotation takes ceil(196/50) =
# 4 rounds. The budget contract is therefore:
#   - every registered query gets a driver CORRECTNESS row within 1
#     round of registration when the round's added/changed set leaves
#     slots, and within 2 rounds unconditionally (rule 1 may displace
#     it exactly once);
#   - no green query's newest driver row may be older than 4 rounds
#     (one full rotation) — stalest-first (rule 3) guarantees this
#     whenever the added/changed set stays under ~25/round;
#   - when added/changed exceeds the budget and displaces rotation,
#     the displaced names LEAD the next round's window (see the
#     round-8→9 spill notes below), restoring the SLA the round after.
# Changed-code always preempts staleness: a shipped change without a
# driver row is worse than a stale green, because the full-registry
# pytest oracle gate (tests/test_inventory_oracle.py) re-verifies every
# rotated-out query on every pytest run — driver staleness is rotation
# hygiene, never a correctness hole.
#
# GROWTH RULE (round-9 verdict item #8, codified): new-query additions
# per round stay ≤ 12 — the rotation headroom at the current registry
# size (50 slots − ~38 needed to hold the 4-round SLA at ~204 queries).
# If a round genuinely needs more, the SLA paragraph above must be
# re-derived in the same commit (bigger window budget or longer
# rotation), never silently violated.
# Names absent from the registry are skipped; names not listed keep
# registration order at the end.
_PRIORITY: list[str] = [
    # ---- ROUND 13 WINDOW (50 slots) ----
    # WINDOW ARITHMETIC: group 1 = 6 (3 added + 3 changed), group 3
    # = the 44 r8-stale rows (the full r8 cohort the round-12
    # window's spill note promised would lead this round — they hit
    # the 4-round SLA boundary at r13). 3 new queries this round
    # (growth rule: ≤ 12).
    # Group 1 — ADDED this round (docs_zstd_ingest: the RFC 8878
    # pure-Python zstd frame codec, llm/zstd.py; docs_lz4_ingest: the
    # LZ4 frame codec, llm/lz4.py; media_decode_jpeg_lossless: the
    # T.81 Annex-H SOF3 decoder, llm/multimodal.py — together closing
    # the zstd/lz4/lossless-JPEG seams), or CHANGED:
    # stream_brand_amount / stream_allocation_split (co-arrival
    # guard: legacy-log named error + >= prune boundary,
    # streaming/allocation.py), media_decode_jpeg_progressive
    # (AC-refinement band-overflow now raises, llm/multimodal.py;
    # also rider for decode_jpeg's shared segment walk, whose SOF
    # dispatch the round-13 SOF3/SOF1 changes touch — progressive
    # and lossless both execute the modified dispatch lines, so the
    # shared-code change holds two in-window rows; media_decode_jpeg
    # itself stays out of the window because its baseline branch is
    # untouched, and its oracle re-verified this round at sf0.01 by
    # hand AND re-verifies at sf0.001 in every pytest run). The
    # docs_gzip_ingest rider slot went to the lossless addition —
    # its parse path is untouched and its oracle re-verifies in
    # every pytest run:
    "docs_zstd_ingest", "docs_lz4_ingest",
    "media_decode_jpeg_lossless",
    "stream_brand_amount", "stream_allocation_split",
    "media_decode_jpeg_progressive",
    # Group 3 — the 44 r8-stale rows (stalest on the board,
    # alphabetical):
    "cdc_retract_agg", "cdc_retract_join", "cdc_retract_join3",
    "cdc_retract_minmax", "customers_record_linkage",
    "docs_keyphrases", "docs_kn_score", "docs_ppjoin_pairs",
    "docs_unigram_encode", "docs_unigram_vocab",
    "docs_wordpiece_merges", "emb_ann_mmr", "emb_ann_opq",
    "emb_ann_rp", "event_funnel_windowed", "event_transitions",
    "event_value_bootstrap_ci", "event_value_outliers", "events_chi2",
    "events_cusum_hourly", "events_ks_drift", "events_resample_ffill",
    "events_trend_slope", "events_trending_decayed",
    "events_zorder_pruning", "lineitem_column_stats",
    "lineitem_corr_matrix", "lineitem_equidepth_hist",
    "parts_association_rules", "parts_bfs_hops", "parts_kcore",
    "parts_triangle_stats", "purchase_attribution",
    "segment_overlap_kmv", "stream_cdc_retract_agg",
    "stream_cdc_retract_join", "stream_customers_record_linkage",
    "stream_event_funnel", "stream_event_funnel_windowed",
    "stream_events_trend_slope", "stream_purchase_attribution",
    "stream_segment_overlap_kmv", "stream_trending_anchored",
    "stream_trending_decayed",
    # ROUND-13 OPTIMIZATION-PHASE NOTE: after this window was set, the
    # optimization rounds changed code under 10 more queries NOT in
    # the window (the CC driver union-find: docs_corpus_prep,
    # docs_dedup_filter/clusters/keep_best, docs_leakage_split,
    # docs_minhash_eval, emb_semantic_dedup; the graph driver gates +
    # round restructure: parts_copurchase_rank, parts_related_rank;
    # the snapshot overlap: customers_rfm_migration — the other
    # changed graph queries parts_kcore / parts_bfs_hops /
    # parts_triangle_stats already sit in the stale cohort above).
    # The window was already at its 50-slot budget with the mandatory
    # r8-stale cohort, and the optimization driver pass verifies
    # EVERY declared query (not a 50-row window), so each of these
    # holds a fresh full-registry row regardless; they also re-verify
    # against DuckDB in every pytest run. If a future build round
    # returns to windowed verification, these 10 lead that window per
    # the changed-code-preempts-staleness rule.
    # ---- post-window: the r9 cohort (40 rows) leads the round-14
    # rotation, then r10+ keep registration order ----
    "customers_rfm_migration", "docs_quality_model_score",
    "stream_ann_index_append", "stream_ann_ivfpq_append",
]


def _ordered() -> dict[str, QuerySpec]:
    _ensure_full_registry()
    out: dict[str, QuerySpec] = {}
    for n in _PRIORITY:
        if n in REGISTRY:
            out[n] = REGISTRY[n]
    for n, spec in REGISTRY.items():
        if n not in out:
            out[n] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in _ordered().items() if s.oracle is not None}


# Shared SQL fragment: 2-dp half-up rounding identical to
# functions.scalar.round2 (Java Math.round parity).
def _r2(x: str) -> str:
    return f"floor(({x}) * 100 + 0.5) / 100"


# Deterministic total order within an order group: l_linenumber is NOT
# unique per order in the driver data, so tiebreakers are required for
# the allocation/running-sum semantics to be well-defined.
_DETAIL_ORDER = ["l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
_DETAIL_ORDER_SQL = ", ".join(_DETAIL_ORDER)


# ----------------------------------------------------------------------
# Scans / projections / predicates (SURVEY §2.3)
# ----------------------------------------------------------------------


@register(
    "router_filter",
    f"""
    SELECT event_id, event_type, user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL AND props <> '' AND props <> '{{}}'
      AND (event_type IN ('click', 'view', 'signup')
           OR (event_type = 'purchase'
               AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50))
    """,
    "P9 CDC-router predicate: envelope guard + per-type keep rules "
    "(reference scala/…/ods/KafkaToODS_M.scala:53-64). JSON field "
    "access = P2 (get_json_object).",
)
def q_router_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.filter(
        F.col("props").isNotNull()
        & (F.col("props") != "")
        & (F.col("props") != "{}")
        & (
            F.col("event_type").isin("click", "view", "signup")
            | ((F.col("event_type") == "purchase") & (k >= 50))
        )
    ).select("event_id", "event_type", "user_id", k.alias("k"))


@register(
    "router_fanout",
    """
    SELECT 'ods_' || event_type AS topic, count(*) AS n
    FROM events
    WHERE event_type IN ('click', 'view', 'signup', 'purchase', 'error')
    GROUP BY 1
    """,
    "P10 fan-out routing: records land in per-type topics "
    "(reference scala/…/ods/KafkaToODS_M.scala:65-67); batch shape = "
    "count per routed topic. Streaming fan-out in streaming.router.",
)
def q_router_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        ev.filter(F.col("event_type").isin("click", "view", "signup", "purchase", "error"))
        .groupBy(F.concat(F.lit("ods_"), F.col("event_type")).alias("topic"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "date_derive",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS dt, strftime(ts, '%H') AS hr,
           user_id
    FROM events
    """,
    "P3 date/hour derivation from event timestamp (reference "
    "scala/…/app/Dau.scala:62-75).",
)
def q_date_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        F.date_format("ts", "HH").alias("hr"),
        "user_id",
    )


@register(
    "acct_bucket",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 1000 THEN '20岁及以下'
                WHEN c_acctbal > 5000 THEN '30岁以上'
                ELSE '21岁到30岁' END AS bucket
    FROM customer
    """,
    "P5 three-way bucketing with the reference's strict-inequality "
    "boundary quirk and exact labels (reference "
    "scala/…/dim/User_info_APP.scala:54-65), applied to c_acctbal.",
)
def q_acct_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    return c.select(
        "c_custkey", bucket_label("c_acctbal", 1000.0, 5000.0).alias("bucket")
    )


@register(
    "priority_decode",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                WHEN o_orderpriority = '2-HIGH' THEN 'high'
                ELSE 'normal' END AS priority_class
    FROM orders
    """,
    "P6-shaped small-domain decode (when/otherwise chain; reference "
    "gender decode scala/…/dim/User_info_APP.scala:66-70).",
)
def q_priority_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return o.select(
        "o_orderkey",
        status_decode(
            "o_orderpriority", {"1-URGENT": "urgent", "2-HIGH": "high"}, "normal"
        ).alias("priority_class"),
    )


# ----------------------------------------------------------------------
# Windows / first-order semantics (SURVEY §2.6 O1/O2, §2.7 D3)
# ----------------------------------------------------------------------


@register(
    "first_order_flag",
    """
    SELECT o_orderkey, o_custkey,
           CASE WHEN row_number() OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
                THEN '1' ELSE '0' END AS if_first_order
    FROM orders
    """,
    "O1/O2 first-order flag: earliest order per user keeps '1', later "
    "ones demoted (reference scala/…/dwd/Ods_to_DWD_order_info.scala:106-127).",
)
def q_first_order_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return first_flag(
        o, "o_custkey", ["o_orderdate", "o_orderkey"], "if_first_order"
    ).select("o_orderkey", "o_custkey", "if_first_order")


@register(
    "running_total",
    f"""
    SELECT l_orderkey, l_linenumber,
           {_r2("sum(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY " + _DETAIL_ORDER_SQL + " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_amount
    FROM lineitem
    """,
    "A4 per-order running total (reference Redis accumulators "
    "scala/…/dws/OrderWiderApp.scala:157-199) as an ordered window sum.",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    out = running_sum(
        li, "l_orderkey", _DETAIL_ORDER, "l_extendedprice", "__run"
    )
    return out.select(
        "l_orderkey", "l_linenumber", round2(F.col("__run")).alias("running_amount")
    )


# ----------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ----------------------------------------------------------------------

_WIDE_SQL = """
    SELECT o.o_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           o.o_totalprice, strftime(o.o_orderdate, '%Y-%m-%d') AS order_dt,
           l.l_partkey, l.l_suppkey, l.l_quantity, l.l_extendedprice
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""


@register(
    "order_wide",
    _WIDE_SQL,
    "J1 (batch shape) + P8: header×detail equi-join into the wide "
    "record (reference scala/…/dws/OrderWiderApp.scala:117-128, "
    "bean/OrderWide.scala:46-95). Streaming version in "
    "streaming.order_wide.",
)
def q_order_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    wide = order_wide_join(o, li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
    return wide.select(
        "o_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_dt"),
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
    )


@register(
    "dim_enrich",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           p.p_name, p.p_brand, s.s_name, n.n_name AS supp_nation
    FROM lineitem l
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    "J5/J7 chained broadcast dim enrichment (reference 3-way sku "
    "enrich scala/…/dim/SkuInfoApp.scala:60-117; province broadcast "
    "scala/…/dwd/Ods_to_DWD_order_info.scala:160-186). Left joins keep "
    "unmatched facts (null dims) — reference intent minus its NPEs.",
)
def q_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    part = cat.table("part").withColumnRenamed("p_partkey", "l_partkey")
    supp = cat.table("supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    nation = cat.table("nation").withColumnRenamed("n_nationkey", "s_nationkey")
    out = enrich_dims(li, [(part, "l_partkey"), (supp, "l_suppkey")])
    out = enrich_dims(out, [(nation, "s_nationkey")])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "p_name",
        "p_brand",
        "s_name",
        F.col("n_name").alias("supp_nation"),
    )


@register(
    "customers_with_orders",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "D3 membership (semi-join): users who ever ordered (reference "
    "user_status0523 check scala/…/dwd/Ods_to_DWD_order_info.scala:92-101).",
)
def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders").select(F.col("o_custkey").alias("c_custkey"))
    return first_seen_members(o, cat.table("customer"), "c_custkey").select(
        "c_custkey", "c_name"
    )


@register(
    "customers_never_ordered",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_orderstatus = 'O')",
    "D3 anti-membership: first-ever-order detection "
    "(reference scala/…/dwd/Ods_to_DWD_order_info.scala:83-104); "
    "filtered to open orders so the anti-join set is non-empty on the "
    "driver data.",
)
def q_customers_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = (
        cat.table("orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return never_seen_members(o, cat.table("customer"), "c_custkey").select(
        "c_custkey", "c_name"
    )


# ----------------------------------------------------------------------
# Allocation (SURVEY §2.10 F1) and the ADS aggregates over it
# ----------------------------------------------------------------------


def _allocation_oracle() -> str:
    # Two staged SELECTs: window calls cannot nest (DuckDB and Spark
    # share this restriction; the Spark operator stages identically).
    prop = _r2("o_totalprice * l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_orderkey)")
    prev = (
        "coalesce(sum(prop_share) OVER (PARTITION BY l_orderkey ORDER BY rn "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)"
    )
    last = _r2(f"o_totalprice - {prev}")
    return f"""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CASE WHEN rn = n THEN {last} ELSE prop_share END AS final_detail_amount
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, o_totalprice,
             {prop} AS prop_share,
             row_number() OVER (PARTITION BY l_orderkey ORDER BY {_DETAIL_ORDER_SQL}) AS rn,
             count(*) OVER (PARTITION BY l_orderkey) AS n
      FROM (SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
                   l.l_extendedprice, l.l_quantity, o.o_totalprice
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey))
    """


@register(
    "allocation",
    _allocation_oracle(),
    "F1 order-amount allocation (分摊): paid total distributed over "
    "detail rows proportionally, 2-dp rounded, last row takes the "
    "remainder so shares sum exactly (reference "
    "scala/…/dws/OrderWiderApp.scala:148-199). Deterministic order = "
    "line number + tiebreakers (documented divergence from arrival order).",
)
def q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    joined = li.join(
        o.select("o_orderkey", "o_totalprice"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    out = allocate_order_amount(
        joined,
        order_key="l_orderkey",
        detail_order_by=_DETAIL_ORDER,
        weight="l_extendedprice",
        order_total="o_totalprice",
    )
    return out.select("l_orderkey", "l_linenumber", "l_partkey", "final_detail_amount")


@register(
    "stream_allocation_split",
    _allocation_oracle(),
    "F1 allocation under SPLIT ARRIVAL — the reference's Redis "
    "running-sum accumulator design (scala/…/dws/OrderWiderApp.scala:"
    "157-199, TTL 100 s at :189,191) as applyInPandasWithState keyed "
    "by order: every order's detail rows are DELIBERATELY split "
    "across three feed files (→ three micro-batches), each arriving "
    "row is allocated as it arrives from (n_seen, Σweight, Σallocated) "
    "state, the last row takes the exact remainder, and completed "
    "orders persist as TTL-bounded tombstones so a duplicate detail "
    "raises the over-delivery error (round-11). Drained output equals "
    "the batch allocation oracle row for row — the co-arrival contract "
    "the per-batch path requires is NOT needed here.",
)
def q_stream_allocation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import Window as W

    from realtime0523_spark.streaming.allocation import streaming_allocation_split
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sinks import detach_and_cleanup

    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    by_order = W.partitionBy("l_orderkey")
    # Feed prep (fixture scaffolding, not the operator): stamp the
    # per-order weight total + detail count the reference's order_info
    # row carries (original_total_amount analog), rank details in the
    # batch operator's order, and split every order's details into 3
    # contiguous chunks — chunk j of every order lands in feed file j,
    # so each multi-detail order spans >= 2 micro-batches.
    n_chunks = 3
    staged = (
        li.join(
            o.select("o_orderkey", "o_totalprice"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .withColumn("o_weight_total", F.sum("l_extendedprice").over(by_order))
        .withColumn(
            "o_detail_count", F.count(F.lit(1)).over(by_order).cast("int")
        )
        .withColumn("__rn", F.row_number().over(by_order.orderBy(*_DETAIL_ORDER)))
        .withColumn(
            "__chunk", F.expr(f"((__rn - 1) * {n_chunks}) div o_detail_count")
        )
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "o_totalprice",
            "o_weight_total", "o_detail_count", "__chunk",
            # co-timed CDC commit ts (one DB transaction per order in
            # the reference feed): drives the watermark/TTL only —
            # constant here, so nothing can evict mid-drain
            F.lit("2025-06-15 00:00:00").cast("timestamp").alias("l_commit_ts"),
        )
        .persist()
    )
    work = tempfile.mkdtemp(prefix="stream_alloc_split_")
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    t0 = time.time()
    # ONE partitioned write for all chunks (round-12: the previous
    # 3 serial coalesce(1) jobs re-scanned the staged data per chunk
    # and serialized the writes — fixture scaffolding, but ~half the
    # measured runtime). repartitionByRange(n_chunks, __chunk) puts
    # each chunk value in exactly one task, so every chunk directory
    # holds exactly ONE parquet file — the FileStreamSource
    # one-file-per-trigger contract the feed needs.
    tmp = os.path.join(work, "_tmp")
    (
        staged.repartitionByRange(n_chunks, "__chunk")
        .write.partitionBy("__chunk")
        .mode("overwrite")
        .parquet(tmp)
    )
    staged.unpersist()
    for j in range(n_chunks):
        cdir = os.path.join(tmp, f"__chunk={j}")
        parts = [f for f in os.listdir(cdir) if f.endswith(".parquet")]
        assert len(parts) == 1, parts  # one file per chunk = one batch
        dst = os.path.join(feed, f"chunk_{j}.parquet")
        os.replace(os.path.join(cdir, parts[0]), dst)
        # strictly ascending mtimes: FileStreamSource delivers oldest
        # first, so chunk order IS arrival order (rank order per order)
        os.utime(dst, (t0 + j, t0 + j))
    shutil.rmtree(tmp)
    schema = (
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, o_totalprice double, "
        "o_weight_total double, o_detail_count int, l_commit_ts timestamp"
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    # bucketed map-state keying: one python/state crossing per order
    # BUCKET per batch instead of per order — the scale shape (the
    # per-order keying is parity-tested in tests/test_streaming.py).
    # Bucket count derived from the cluster's cores (round-13 ADVICE).
    from realtime0523_spark.core.session import state_buckets

    out = run_to_memory(
        streaming_allocation_split(
            src, _DETAIL_ORDER, n_buckets=state_buckets(spark)
        ),
        output_mode="update",
    )
    return detach_and_cleanup(out, work)


@register(
    "brand_amount",
    f"""
    SELECT p.p_brand, {_r2("sum(a.final_detail_amount)")} AS amount
    FROM ({_allocation_oracle()}) a
    JOIN part p ON a.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    "A1 brand revenue — the reference's marquee ADS aggregate "
    "(scala/…/ads/TradeMarkAmountApp.scala:47-56): allocated amounts "
    "summed per brand. groupBy two natural keys, no string "
    "concat/split round-trip (P7 quirk dropped by design).",
)
def q_brand_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    part = cat.table("part")
    joined = li.join(
        o.select("o_orderkey", "o_totalprice"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    alloc = allocate_order_amount(
        joined,
        order_key="l_orderkey",
        detail_order_by=_DETAIL_ORDER,
        weight="l_extendedprice",
        order_total="o_totalprice",
    )
    enriched = alloc.join(
        F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")),
        "l_partkey",
        "left",
    )
    return enriched.groupBy("p_brand").agg(
        round2(F.sum("final_detail_amount")).alias("amount")
    )


@register(
    "hot_parts_topk",
    f"""
    SELECT p.p_partkey, p.p_name, {_r2("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY revenue DESC, p.p_partkey
    LIMIT 10
    """,
    "A2 'hot goods' top-k by revenue (reference "
    "scala/…/ads/HotwoodsCount.scala:47-56 — implemented with its "
    "evident intent; the reference's key-split and wrong-table bugs "
    "are documented divergences, SURVEY §7.4).",
)
def q_hot_parts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, part = cat.table("lineitem"), cat.table("part")
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_name")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_name")
        .agg(
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), "p_partkey").limit(10)


# ----------------------------------------------------------------------
# Dedup / DAU (SURVEY §2.7 D1/D2, §2.5 A5)
# ----------------------------------------------------------------------


@register(
    "dau",
    """
    SELECT dt, count(DISTINCT mid) AS dau
    FROM (SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id AS mid FROM events)
    GROUP BY dt
    """,
    "D1+A5 daily active users: cross-batch (dt, mid) dedup then count "
    "(reference scala/…/app/Dau.scala:104-153). Streaming version with "
    "watermark-TTL in streaming.dau.",
)
def q_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return (
        distinct_daily_users(ev)
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("dau"))
    )


@register(
    "dedup_first",
    """
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    "D2 first-sighting-wins dedup under a deterministic order "
    "(reference Redis SADD dedup scala/…/dws/OrderWiderApp.scala:129-147).",
)
def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    out = dedup_first_by_key(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return out.select(
        "user_id", "event_type", F.col("event_id").alias("first_event_id")
    )


# ----------------------------------------------------------------------
# Aggregation superset: pricing summary, rollup, per-group top-k
# (SURVEY §2.5 note: cube/rollup/distinct come free with Spark SQL)
# ----------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_r2("sum(l_quantity)")} AS sum_qty,
           {_r2("sum(l_extendedprice)")} AS sum_base_price,
           {_r2("sum(l_extendedprice * (1 - l_discount))")} AS sum_disc_price,
           {_r2("avg(l_quantity)")} AS avg_qty,
           {_r2("avg(l_extendedprice)")} AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H-Q1-shaped pricing summary: multi-aggregate groupBy "
    "(map-side partial agg + final agg, one shuffle). The A1/A2 "
    "aggregate family generalized.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round2(F.sum("l_quantity")).alias("sum_qty"),
            round2(F.sum("l_extendedprice")).alias("sum_base_price"),
            round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            round2(F.avg("l_quantity")).alias("avg_qty"),
            round2(F.avg("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_rollup",
    f"""
    SELECT n.n_name, year(o.o_orderdate) AS order_year,
           {_r2("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))
    """,
    "Rollup aggregate over nation×year — free Spark SQL superset of "
    "the reference's flat sums (SURVEY §2.5 note).",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    c, n = cat.table("customer"), cat.table("nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return joined.rollup("n_name", F.year("o_orderdate").alias("order_year")).agg(
        round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


@register(
    "top_customers_per_nation",
    f"""
    SELECT * FROM (
      SELECT n.n_name, c.c_custkey, c.c_name,
             {_r2("sum(o.o_totalprice)")} AS spend,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY {_r2("sum(o.o_totalprice)")} DESC, c.c_custkey) AS rk
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_custkey, c.c_name)
    WHERE rk <= 3
    """,
    "Top-k per group (window rank after one shuffle — no global sort; "
    "the scalable form of the reference's ADS 'hot' rankings).",
)
def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, c, n = cat.table("orders"), cat.table("customer"), cat.table("nation")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(round2(F.sum("o_totalprice")).alias("spend"))
    )
    return topk_per_group(
        spend, "n_name", [F.desc("spend"), F.col("c_custkey")], 3, rank_col="rk"
    )


@register(
    "regional_revenue",
    f"""
    SELECT n.n_name, {_r2("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    "TPC-H-Q5-shaped multi-join: 6-table star join with a region "
    "filter; dims broadcast, one fact-fact shuffle (the J5/J7 pattern "
    "at its widest).",
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    r = cat.table("region").filter(F.col("r_name") == "ASIA")
    n, c, s = cat.table("nation"), cat.table("customer"), cat.table("supplier")
    o, li = cat.table("orders"), cat.table("lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == n.n_nationkey),
        )
    )
    return joined.groupBy("n_name").agg(
        round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


@register(
    "ship_priority_topk",
    f"""
    SELECT * FROM (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             {_r2("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority)
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "TPC-H-Q3-shaped global top-N: unshipped-order revenue, ORDER BY + "
    "LIMIT. Spark plans TakeOrderedAndProject — per-partition top-N "
    "then a driver merge of N·P rows, never a global sort of the "
    "aggregate (the scalable global-rank counterpart to the "
    "per-group top-k of O3).",
)
def q_ship_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        o.filter(F.col("o_orderdate") < cutoff)
        .join(li.filter(F.col("l_shipdate") > cutoff), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "late_ship_priority_counts",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    "TPC-H-Q4-shaped decorrelated EXISTS: orders with any lineitem "
    "shipped >60 days after order date, counted by priority. The "
    "correlated subquery is a left-semi join (what Catalyst rewrites "
    "EXISTS to) — one shuffle on the order key, no row explosion "
    "however many lineitems match (the D3 semi-join shape on a "
    "non-equi residual).",
)
def q_late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ----------------------------------------------------------------------
# Streaming spine (SURVEY §2.8): Structured Streaming pipelines whose
# drained output equals a batch-SQL oracle — the strongest correctness
# statement available for a stream (same answer as the batch engine).
# ----------------------------------------------------------------------


@register(
    "stream_dau",
    """
    SELECT dt, count(DISTINCT mid) AS dau
    FROM (SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id AS mid FROM events)
    GROUP BY dt
    """,
    "Streaming D1+A5: watermarked dropDuplicates(dt, mid) + per-day "
    "counts over a file-source stream, drained to completion "
    "(reference scala/…/app/Dau.scala:104-153; watermark = the 24 h "
    "Redis TTL, T4).",
)
def q_stream_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.dau import streaming_dau
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table

    return run_to_memory(
        streaming_dau(stream_table(spark, sf_dir, "events")), output_mode="complete"
    )


@register(
    "stream_dedup_pairs",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    "Streaming D2: watermarked dropDuplicates on a key pair — the "
    "reference's Redis SADD first-sighting dedup with the 100 s TTL as "
    "a watermark (scala/…/dws/OrderWiderApp.scala:129-147). Horizon "
    "set wider than the fixture's event-time span so the drained "
    "stream equals DISTINCT; TTL-expiry re-emission semantics are "
    "exercised in tests/test_streaming.py.",
)
def q_stream_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.dedup import streaming_dedup
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    deduped = streaming_dedup(ev, ["user_id", "event_type"], "ts", ttl="3650 days")
    return run_to_memory(deduped.select("user_id", "event_type"))


@register(
    "stream_order_wide",
    _WIDE_SQL,
    "Streaming J1+P8: stream-stream inner equi-join of header×detail "
    "file streams (reference scala/…/dws/OrderWiderApp.scala:117-128), "
    "run on the WATERMARK + time-range branch: both sides carry the "
    "shared per-order CDC commit time (cdc_commit_time reconstructs "
    "the reference's co-timed-arrival data contract), so join state is "
    "bounded to the 50 s tolerance horizon and each pair is emitted "
    "exactly once — no J2 dedup pass, no unbounded state at 100×.",
)
def q_stream_order_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.order_wide import (
        cdc_commit_time,
        streaming_order_wide,
    )
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table

    # Prune BEFORE the join: join state stores each side's full input
    # row, so narrow inputs = narrow state (the dominant cost of the
    # stateful join at scale).
    o = stream_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        cdc_commit_time("o_orderkey").alias("o_commit_ts"),
    )
    d = stream_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        cdc_commit_time("l_orderkey").alias("l_commit_ts"),
    )
    wide = streaming_order_wide(
        o,
        d,
        order_ts="o_commit_ts",
        detail_ts="l_commit_ts",
        tolerance="50 seconds",
    ).select(
        "o_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_dt"),
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
    )
    # inner join: output complete after the data batches — skip the
    # trailing state-eviction batch (drain-and-stop pattern). Any
    # watermark-dropped row would mean a silently missing join pair,
    # so the drain refuses instead (completeness contract).
    return run_to_memory(wide, no_data_batches=False, forbid_watermark_drops=True)


@register(
    "stream_first_seen",
    """
    SELECT o_custkey AS key, epoch_us(o_orderdate) AS first_ts,
           o_orderkey AS first_id
    FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    "Streaming D3 first-seen: applyInPandasWithState keyed state "
    "tracking each user's earliest order (reference user_status0523 "
    "flow scala/…/dwd/Ods_to_DWD_order_info.scala:83-104,219-225). "
    "Event-time min semantics → replay-stable, batch-oracle-checkable.",
)
def q_stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.first_seen import streaming_first_seen
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table

    # bucketed map-state keying (round-13): one python/state crossing
    # per key BUCKET per batch instead of per customer — the same
    # scale shape as stream_allocation_split (the per-key keying is
    # parity-tested in tests/test_streaming.py). Bucket count derived
    # from the cluster's cores (round-13 ADVICE), env-overridable —
    # on local[32] this derives the 64 the round-13 A/B measured.
    from realtime0523_spark.core.session import state_buckets

    return run_to_memory(
        streaming_first_seen(
            stream_table(spark, sf_dir, "orders"),
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            n_buckets=state_buckets(spark),
        ),
        output_mode="update",
    )


@register(
    "stream_brand_amount",
    f"""
    SELECT p.p_brand, {_r2("sum(a.final_detail_amount)")} AS amount
    FROM ({_allocation_oracle()}) a
    JOIN part p ON a.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    "End-to-end streaming DWS→ADS: stream-stream join → per-batch F1 "
    "allocation → broadcast brand enrich → partial sums committed "
    "idempotently by batchId (K5 exactly-once) → final rollup. The "
    "reference's full OrderWiderApp→TradeMarkAmountApp chain "
    "(scala/…/dws/OrderWiderApp.scala:117-199, "
    "scala/…/ads/TradeMarkAmountApp.scala:47-88) with the same answer "
    "as the batch oracle.",
)
def q_stream_brand_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.ads import streaming_brand_amount
    from realtime0523_spark.streaming.order_wide import (
        cdc_commit_time,
        streaming_order_wide,
    )
    from realtime0523_spark.streaming.sources import stream_table

    o = stream_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        cdc_commit_time("o_orderkey").alias("o_commit_ts"),
    )
    d = stream_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        cdc_commit_time("l_orderkey").alias("l_commit_ts"),
    )
    wide = streaming_order_wide(
        o,
        d,
        order_ts="o_commit_ts",
        detail_ts="l_commit_ts",
        tolerance="50 seconds",
    ).drop("o_commit_ts")
    work = tempfile.mkdtemp(prefix="stream_brand_amount_")
    from realtime0523_spark.streaming.sinks import detach_and_cleanup

    return detach_and_cleanup(
        streaming_brand_amount(
            spark,
            wide,
            Catalog(spark, sf_dir).table("part"),
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            no_data_batches=False,  # inner join, drain-and-stop
            # event-time horizon on the co-arrival guard's key log
            # (round-12): join tolerance (50 s) + state TTL (100 s) —
            # keys last seen further back can't traverse the
            # watermarked join again, so the at-rest log stays
            # horizon-bounded instead of O(total distinct orders)
            guard_ts_col="l_commit_ts",
            guard_horizon_ms=150_000,
        ),
        work,
    )


@register(
    "stream_dwd_order",
    """
    SELECT o.o_orderkey, o.o_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_dt,
           CAST(CASE WHEN row_number() OVER (
                    PARTITION BY o.o_custkey
                    ORDER BY o.o_orderdate, o.o_orderkey) = 1
                THEN 1 ELSE 0 END AS INT) AS if_first_order,
           c.c_name, n.n_name AS nation_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    "End-to-end streaming DWD pipeline (reference "
    "scala/…/dwd/Ods_to_DWD_order_info.scala:29-245): CDC order stream "
    "→ first-order flag via user-status membership (J4 batched-IN) "
    "with same-batch correction → broadcast customer+nation enrich "
    "(J5/J7) → persist + multi-sink fan-out (T8) into the daily "
    "doc-id-idempotent index (K3) and the user-status write-back (K2) "
    "that feeds the NEXT batch's flags (D3). Single-batch drain "
    "equals the batch first-order oracle; cross-batch flag semantics "
    "are exercised in tests/test_streaming.py.",
)
def q_stream_dwd_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.dwd import streaming_dwd_order
    from realtime0523_spark.streaming.sources import stream_table

    cat = Catalog(spark, sf_dir)
    orders = stream_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    work = tempfile.mkdtemp(prefix="stream_dwd_order_")
    out = streaming_dwd_order(
        spark,
        orders,
        cat.table("customer"),
        cat.table("nation"),
        work_dir=work,
        # the whole 7-year table drains in one batch (historical
        # replay) — monthly index dirs, not 2400 daily ones
        index_granularity="month",
        no_data_batches=False,
    )
    from realtime0523_spark.streaming.sinks import detach_and_cleanup

    return detach_and_cleanup(
        out.select(
            "o_orderkey",
            "o_custkey",
            F.col("order_dt").cast("string").alias("order_dt"),
            "if_first_order",
            "c_name",
            "nation_name",
        ),
        work,
    )


# ----------------------------------------------------------------------
# Set operations & grouping-set superset (SURVEY §2.7 note: the
# reference has no union/intersect/except; §2.5 note: no cube/rollup —
# Spark SQL provides them, so the engine exposes them as first-class.)
# ----------------------------------------------------------------------


@register(
    "repeat_buyers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "INTERSECT set op: customers active in both 1995 and 1996 "
    "(free Spark superset, SURVEY §2.7 note; planned as a "
    "distinct + semi shuffle, AQE-sized).",
)
def q_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@register(
    "churned_buyers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "EXCEPT set op: customers active in 1995 but gone in 1996 "
    "(anti-join-shaped plan; free Spark superset, SURVEY §2.7 note).",
)
def q_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT DISTINCT


@register(
    "event_cube",
    f"""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt,
           count(*) AS n, {_r2("sum(value)")} AS sum_value
    FROM events
    GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "CUBE aggregate over type×day — all four grouping sets in one "
    "pass (free Spark superset of the reference's flat sums, "
    "SURVEY §2.5 note; expand + single shuffle).",
)
def q_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return ev.cube(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        round2(F.sum("value")).alias("sum_value"),
    )


_WINDOWED_COUNTS_SQL = f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, {_r2("sum(value)")} AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@register(
    "windowed_event_counts",
    _WINDOWED_COUNTS_SQL,
    "T2 event-time tumbling-window aggregation (1 h windows): "
    "count + 2-dp value sum per (window, type). Batch execution of "
    "the identical plan the streaming layer runs watermarked.",
)
def q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.windowed import streaming_windowed_counts

    ev = Catalog(spark, sf_dir).table("events")
    return streaming_windowed_counts(ev)


@register(
    "stream_windowed_counts",
    _WINDOWED_COUNTS_SQL,
    "Streaming T2/T4/T5: watermarked tumbling-window aggregation over "
    "a file-source stream, drained and compared to the batch oracle — "
    "the watermark bounds window state (the eviction the reference "
    "lacks, SURVEY §2.8 T5).",
)
def q_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.windowed import streaming_windowed_counts

    return run_to_memory(
        streaming_windowed_counts(stream_table(spark, sf_dir, "events")),
        output_mode="complete",
    )


@register(
    "stream_windowed_topk",
    f"""
    SELECT window_start, event_type, n_events, rk FROM (
      SELECT window_start, event_type, n_events,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, event_type) AS rk
      FROM (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2))
    WHERE rk <= 3
    """,
    "Streaming T2+O3: trending top-3 event types per hour window. The "
    "stream maintains watermarked per-(window, key) counts (bounded "
    "state); the rank is a batch post-pass over FINALIZED windows — "
    "rank inside a streaming plan is ill-defined until the window "
    "closes, so the split is the semantics, not a workaround.",
)
def q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.windowed import (
        streaming_windowed_counts,
        topk_per_window,
    )

    counts = run_to_memory(
        streaming_windowed_counts(stream_table(spark, sf_dir, "events")),
        output_mode="complete",
    )
    return topk_per_window(counts, 3).select(
        "window_start", "event_type", "n_events", "rk"
    )


@register(
    "stream_sliding_counts",
    f"""
    SELECT strftime(make_timestamp(CAST((floor(epoch(ts) / 900) * 900
                                         - k.k * 900) * 1000000 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, {_r2("sum(value)")} AS sum_value
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
    GROUP BY 1, 2
    """,
    "T2 SLIDING-window aggregation — the reference's only window form, "
    "window(Seconds(50), Seconds(5)) at scala/…/dws/OrderWiderApp.scala"
    ":119-120, here 1 h windows sliding every 15 min: each event lands "
    "in size/slide = 4 overlapping windows (the oracle materializes the "
    "same 4-per-event expansion on the epoch-aligned 15-min grid). "
    "Watermark still bounds state; it just holds 4x the tumbling "
    "window count.",
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.windowed import streaming_windowed_counts

    return run_to_memory(
        streaming_windowed_counts(
            stream_table(spark, sf_dir, "events"),
            window_size="1 hour",
            slide="15 minutes",
        ),
        output_mode="complete",
    )


@register(
    "sessionize",
    """
    SELECT user_id, event_id, session_id
    FROM (
      SELECT user_id, event_id,
             CAST(sum(CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (SELECT user_id, event_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events))
    """,
    "Sessionization (gap > 30 min starts a new session): lag + "
    "conditional cumsum — the batch analog of streaming "
    "session_window; generalizes the reference's per-user grouping A3.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).table("events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(W.unboundedPreceding, 0)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    return ev.select(
        "user_id",
        "event_id",
        F.sum(is_new).over(wcum).alias("session_id"),
    )


# ----------------------------------------------------------------------
# Join-type completion (full outer, as-of, range-band), set-op
# completion (UNION), SQL-frontend grouping sets, quantiles, skew-safe
# aggregation, scalar-subquery shape, window moving stats.
# ----------------------------------------------------------------------


@register(
    "active_buyers_union",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    UNION
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "UNION (distinct) set op: customers active in 1995 or 1996 — "
    "completes the set-op family with repeat_buyers/churned_buyers "
    "(SURVEY §2.7 note).",
)
def q_active_buyers_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.union(y96).distinct()


@register(
    "spend_full_outer",
    f"""
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           a.spend_95, b.spend_96
    FROM (SELECT o_custkey, {_r2("sum(o_totalprice)")} AS spend_95
          FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey) a
    FULL JOIN (SELECT o_custkey, {_r2("sum(o_totalprice)")} AS spend_96
               FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """,
    "J3 full-outer equi-join (the reference's commented-out "
    "fullOuterJoin design, scala/…/dws/OrderWiderApp.scala:63-115): "
    "per-customer 1995 vs 1996 spend with unmatched sides kept null.",
)
def q_spend_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")

    def spend(year: int, alias: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(round2(F.sum("o_totalprice")).alias(alias))
        )

    a, b = spend(1995, "spend_95"), spend(1996, "spend_96")
    return a.join(b, "o_custkey", "full_outer").select(
        F.col("o_custkey").alias("custkey"), "spend_95", "spend_96"
    )


@register(
    "grouping_sets_revenue",
    f"""
    SELECT n_name, year(o_orderdate) AS order_year,
           {_r2("sum(o_totalprice)")} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_name), (year(o_orderdate)), ())
    """,
    "Explicit GROUPING SETS through the engine's SQL frontend "
    "(spark.sql over registered catalog views) — the reference has no "
    "SQL surface at all (SURVEY §3); ours is first-class.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cat.register_views(["orders", "customer", "nation"])
    return spark.sql(
        f"""
        SELECT n_name, year(o_orderdate) AS order_year,
               {_r2("sum(o_totalprice)")} AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n_name), (year(o_orderdate)), ())
        """
    )


@register(
    "qty_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    "Exact linear-interpolation quantiles per group (integer-valued "
    "measure → bit-exact across engines). approx_percentile is the "
    "documented swap-in at scales where per-group sort is unaffordable.",
)
def q_qty_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return exact_quantiles(
        li, ["l_returnflag"], "l_quantity", {"q25": 0.25, "q50": 0.50, "q75": 0.75}
    )


@register(
    "asof_last_click",
    """
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS last_click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    "Backward as-of join: each purchase matched to the same user's "
    "latest click at-or-before it (sort-merge union+window formulation "
    "— one shuffle, linear, no per-probe lookups). DuckDB's native "
    "ASOF JOIN is the oracle. Payload = the matched timestamp, which "
    "is tie-insensitive.",
)
def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        probe_ts="ts",
        ref_ts="click_ts",
        ref_cols=["click_ts"],
        ref_order="click_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("last_click_us"),
    )


@register(
    "follow_on_clicks",
    """
    SELECT a.event_id, count(b.event_id) AS n_follow
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
      ON a.user_id = b.user_id AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 12 HOUR
    GROUP BY a.event_id
    """,
    "Range-band join: clicks within 12 h after each error, same user. "
    "The equi key keeps it a hash join with a residual band predicate "
    "— scales with key cardinality, never |L|×|R|.",
)
def q_follow_on_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    j = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("ts"))
        & (F.col("c_ts") <= F.col("ts") + F.expr("INTERVAL 12 HOURS")),
        "left",
    )
    return j.groupBy("event_id").agg(F.count("c_id").alias("n_follow"))


@register(
    "event_incident_join",
    f"""
    SELECT i.event_id AS incident_id,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           {_r2('sum(e.value)')} AS sum_value
    FROM events e
    JOIN (SELECT event_id, ts FROM events
          WHERE event_type = 'error' AND value >= 18) i
      ON e.ts >= i.ts AND e.ts < i.ts + INTERVAL 5 MINUTE
    GROUP BY i.event_id
    """,
    "KEYLESS interval join — every event against every overlapping "
    "incident window (severe errors + 5 min), no shared equi-key, the "
    "shape Spark's planner can only nested-loop. Executed as the "
    "binned rewrite (operators.interval_join): events map to one time "
    "bin, windows explode to their ~2 covered bins, equi-join on the "
    "bin + exact residual range filter — one bounded-fan-out shuffle "
    "instead of |events|×|windows|. Plan asserted nested-loop-free.",
)
def q_event_incident_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    incidents = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 18)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    joined = interval_join(
        ev.select("ts", "user_id", "value"),
        incidents,
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bin_seconds=300,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        round2(F.sum("value")).alias("sum_value"),
    )


@register(
    "salted_flag_agg",
    """
    SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity, count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "Skew-safe two-stage salted aggregation (3 giant groups spread "
    "over 16 sub-keys, partial agg, re-combine) — identical answer to "
    "the plain groupBy the oracle runs; the strategy a hot brand key "
    "needs at 100 TB (SURVEY §2.5 A1 at scale).",
)
def q_salted_flag_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        sum_cols=["l_quantity"],
        salt_from="l_orderkey",
        buckets=16,
    )


@register(
    "small_qty_revenue",
    f"""
    SELECT {_r2("sum(l.l_extendedprice) / 7.0")} AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#17' AND l.l_quantity < 0.2 * a.avg_qty
    """,
    "TPC-H-Q17-shaped scalar-subquery aggregate: per-part average "
    "quantity (decorrelated into a join — what Catalyst does to the "
    "correlated form) gating a small-quantity revenue sum.",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, part = cat.table("lineitem"), cat.table("part")
    pavg = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#17").select(
        F.col("p_partkey").alias("l_partkey")
    )
    j = (
        li.join(F.broadcast(brand_parts), "l_partkey")
        .join(pavg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(round2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))


_R9 = "floor(({x}) * 1000000000 + 0.5) / 1000000000"


@register(
    "event_value_stats",
    f"""
    SELECT event_type, count(*) AS n,
           {_R9.format(x='stddev_samp(value)')} AS sd_value,
           {_R9.format(x="covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE))")}
             AS covar_vk,
           {_R9.format(x="corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE))")}
             AS corr_vk
    FROM events GROUP BY event_type
    """,
    "Second-moment statistical aggregates per key: sample stddev, "
    "covariance, and Pearson correlation of the event value against "
    "a JSON-extracted metric. All three are one-pass mergeable "
    "co-moment aggregates (Welford/Chan partial states) — partial agg "
    "before the shuffle, |keys| rows after, the shape that holds at "
    "any corpus size. Cross-engine co-moment orders differ by "
    "≤2e-14 on this data (measured); the 9dp quantization both "
    "engines apply absorbs it.",
)
def q_event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("double")
    r9c = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)  # noqa: E731
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r9c(F.stddev_samp("value")).alias("sd_value"),
        r9c(F.covar_samp(F.col("value"), k)).alias("covar_vk"),
        r9c(F.corr(F.col("value"), k)).alias("corr_vk"),
    )


@register(
    "stream_event_value_stats",
    f"""
    SELECT event_type, count(*) AS n,
           {_R9.format(x='stddev_samp(value)')} AS sd_value,
           {_R9.format(x="covar_samp(value, CAST(json_extract_string(props, '$.k') AS DOUBLE))")}
             AS covar_vk,
           {_R9.format(x="corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE))")}
             AS corr_vk
    FROM events GROUP BY event_type
    """,
    "The co-moment aggregates maintained ON THE STREAM: stddev / "
    "covariance / correlation are declarative aggregates with "
    "mergeable partial states (Chan et al. update formulas), so the "
    "streaming engine folds each micro-batch into |keys| constant-"
    "size states — the moment analog of the CMS grid. Complete-mode "
    "drain ≡ the batch aggregation, so the oracle is "
    "event_value_stats's.",
)
def q_stream_event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    r9c = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)  # noqa: E731
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        r9c(F.stddev_samp("value")).alias("sd_value"),
        r9c(F.covar_samp(F.col("value"), k)).alias("covar_vk"),
        r9c(F.corr(F.col("value"), k)).alias("corr_vk"),
    )
    return run_to_memory(agg, output_mode="complete")


@register(
    "salted_priority_revenue",
    f"""
    SELECT o.o_orderpriority, count(*) AS n_lines,
           {_r2('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    "Skew-safe SALTED equi-join (the join-side analog of "
    "salted_flag_agg): the fact side salts into 16 sub-keys by a "
    "content hash, the other side replicates once per sub-key, so a "
    "hot order key spreads over 16 tasks instead of melting one — "
    "the rewrite AQE's skew-join applies at runtime, as an explicit "
    "operator for plans AQE cannot see (streaming micro-batches, "
    "pinned plans). The oracle is the PLAIN join: identical answers "
    "by construction is the checked contract.",
)
def q_salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    orders = cat.table("orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(li, orders, on="o_orderkey", buckets=16)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        round2(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue"),
    )


@register(
    "dormant_rich_customers",
    f"""
    SELECT c_mktsegment, count(*) AS n_dormant,
           {_r2('sum(c_acctbal)')} AS sum_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT floor(avg(c_acctbal) * 1000000000 + 0.5)
                              / 1000000000
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-06-01')
    GROUP BY c_mktsegment
    """,
    "TPC-H-Q22-shaped: a GLOBAL scalar subquery (corpus-wide average "
    "balance) gating the rows, a NOT EXISTS decorrelated to a "
    "left-anti join against the recent-orders keys, then a grouped "
    "rollup. The scalar executes as Catalyst executes every "
    "uncorrelated scalar subquery — the 1-value aggregate runs first "
    "and its result is inlined as a literal (a 1-scalar collect, not "
    "a 1-row nested-loop join); the threshold is 9dp-quantized in "
    "both engines so a ulp-level avg() difference can never flip a "
    "boundary row. The anti join hashes on the customer key; no "
    "correlated per-row probing anywhere.",
)
def q_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    cat = Catalog(spark, sf_dir)
    cust, orders = cat.table("customer"), cat.table("orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .first()[0]
    )
    thr = math.floor(avg_bal * 1e9 + 0.5) / 1e9
    rich = cust.filter(F.col("c_acctbal") > F.lit(thr))
    recent = orders.filter(F.col("o_orderdate") >= "2000-06-01").select(
        F.col("o_custkey").alias("c_custkey")
    )
    dormant = rich.join(recent, "c_custkey", "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_dormant"),
        round2(F.sum("c_acctbal")).alias("sum_acctbal"),
    )


_MOVING_ORDER = [
    "l_shipdate",
    "l_orderkey",
    "l_linenumber",
    "l_suppkey",
    "l_extendedprice",
    "l_quantity",
]
_MOVING_ORDER_SQL = ", ".join(_MOVING_ORDER)


@register(
    "qty_moving_stats",
    f"""
    SELECT l_partkey, l_orderkey, l_linenumber,
           sum(l_quantity) OVER w3 AS mov_qty_sum,
           {_r2("avg(l_quantity) OVER w3")} AS mov_qty_avg,
           l_quantity - lag(l_quantity, 1, 0.0) OVER
             (PARTITION BY l_partkey ORDER BY {_MOVING_ORDER_SQL}) AS qty_delta
    FROM lineitem
    WINDOW w3 AS (PARTITION BY l_partkey ORDER BY {_MOVING_ORDER_SQL}
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "Moving-frame window stats per part (3-row moving sum/avg over "
    "ship history + lag delta) — the frame-bounded generalization of "
    "A4's running sums; integer-valued measure keeps both engines "
    "bit-exact.",
)
def q_qty_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = Catalog(spark, sf_dir).table("lineitem")
    wo = W.partitionBy("l_partkey").orderBy(*_MOVING_ORDER)
    w3 = wo.rowsBetween(-2, 0)
    return li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w3).alias("mov_qty_sum"),
        round2(F.avg("l_quantity").over(w3)).alias("mov_qty_avg"),
        (F.col("l_quantity") - F.lag("l_quantity", 1, 0.0).over(wo)).alias(
            "qty_delta"
        ),
    )


@register(
    "nation_year_pivot",
    f"""
    SELECT n_name,
           {_r2("sum(CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END)")} AS y1995,
           {_r2("sum(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END)")} AS y1996,
           {_r2("sum(CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice END)")} AS y1997
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """,
    "PIVOT: nation × year revenue cross-tab (groupBy().pivot() — "
    "conditional aggregation in one pass, single shuffle; the explicit "
    "value list keeps the plan static, no driver-side distinct scan).",
)
def q_nation_year_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o, c, n = cat.table("orders"), cat.table("customer"), cat.table("nation")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("order_year", F.year("o_orderdate"))
    )
    pivoted = (
        joined.groupBy("n_name")
        .pivot("order_year", [1995, 1996, 1997])
        .agg(round2(F.sum("o_totalprice")))
    )
    return pivoted.select(
        "n_name",
        F.col("1995").alias("y1995"),
        F.col("1996").alias("y1996"),
        F.col("1997").alias("y1997"),
    )


@register(
    "dau_approx",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(DISTINCT user_id) AS dau_exact,
           TRUE AS approx_ok
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
    "A5 at scale: approx_count_distinct (HyperLogLog++) per day — the "
    "sketch that replaces exact distinct-count state when the key set "
    "no longer fits (mergeable across partitions, one pass, fixed "
    "memory). The sketch VALUE is engine-local (Spark's HLL++ ≠ "
    "DuckDB's), so the checkable surface is the accuracy contract: "
    "each day emits the exact count plus a flag that the sketch landed "
    "within its error bound (5% or ±3) — a wrong sketch flips the flag "
    "and fails the hash. Exact twin: the `dau` query; the bound is "
    "also asserted in tests/test_operators.py.",
)
def q_dau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    approx = F.approx_count_distinct("user_id", 0.01)
    exact = F.countDistinct("user_id")
    return (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "user_id")
        .groupBy("dt")
        .agg(approx.alias("dau_hll"), exact.alias("dau_exact"))
        .select(
            "dt",
            "dau_exact",
            (
                F.abs(F.col("dau_hll") - F.col("dau_exact"))
                <= F.greatest(F.lit(3.0), 0.05 * F.col("dau_exact"))
            ).alias("approx_ok"),
        )
    )


_SESSION_SQL = f"""
    SELECT epoch_us(min(ts)) AS session_start_us, user_id,
           count(*) AS n_events, {_r2("sum(value)")} AS sum_value
    FROM (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM (SELECT user_id, ts, value, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER
                                  (PARTITION BY user_id ORDER BY ts, event_id))
                                >= 1800
                        THEN 1 ELSE 0 END AS new_s
            FROM events))
    GROUP BY user_id, sid
"""


@register(
    "stream_session_counts",
    _SESSION_SQL,
    "Streaming session_window aggregation (30 min gap, 1 h watermark): "
    "per-(user, session) counts and value sums over a file-source "
    "stream, drained and compared to a gap-sessionization batch oracle. "
    "Session state merges and evicts as the watermark passes (bounded "
    "state; the cross-batch sessions the reference's per-batch A3 "
    "grouping cannot see).",
)
def q_stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.streaming.runner import run_to_memory
    from realtime0523_spark.streaming.sessions import streaming_session_counts
    from realtime0523_spark.streaming.sources import stream_table

    return run_to_memory(
        streaming_session_counts(stream_table(spark, sf_dir, "events")),
        output_mode="complete",
    )


@register(
    "scd2_history",
    """
    SELECT user_id, event_type, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM events
    """,
    "SCD-2 dimension history from a change stream: per-key validity "
    "ranges (valid_from/valid_to/is_current) via one lead() window — "
    "the warehouse-standard extension of the reference's SCD-1 "
    "upsert dim sink. One hash exchange on the key; per-partition "
    "sort bounded by the hottest key's change count.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.windows import scd2_history

    events = Catalog(spark, sf_dir).table("events")
    return scd2_history(
        events,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value"],
        tiebreak_cols=["event_id"],
    )


# ----------------------------------------------------------------------
# Data layout: Z-order (Morton) clustering for multi-dim pruning
# ----------------------------------------------------------------------

ZORDER_PREFIX_BITS = 8


def _morton_sql(x: str, y: str, bits: int) -> str:
    """Bit-interleave SQL twin of operators.layout.morton_interleave:
    Σ_i ((x>>i)&1)<<2i + ((y>>i)&1)<<(2i+1)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZX_SQL = "(user_id & 65535)"
_ZY_SQL = "(CAST(floor(value * 100 + 0.5) AS BIGINT) & 65535)"


@register(
    "events_zorder",
    f"""
    SELECT zbucket, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM (SELECT ({_morton_sql(_ZX_SQL, _ZY_SQL, 16)}) >> {32 - ZORDER_PREFIX_BITS}
             AS zbucket,
           {_ZX_SQL} AS x, {_ZY_SQL} AS y
          FROM events)
    GROUP BY zbucket
    """,
    "Z-order (Morton) clustering for multi-dimensional zone-map "
    "pruning — the technique behind Delta Lake's OPTIMIZE ZORDER "
    "(Morton 1966): interleave the bits of (user_id, value) into one "
    "code; range-partitioning + sorting by it gives every file a "
    "tight bounding RECTANGLE in both dimensions, so parquet min/max "
    "stats prune on either filter column, not just the sort key. The "
    "code is a pure codegen'd shift/mask expression (no UDF); the "
    "layout is repartitionByRange (sampled range exchange, never a "
    "global sort) + partition-local sort "
    "(operators/layout.zorder_repartition, plan-asserted in "
    "tests/test_scale_plans.py). This query emits the per-z-range "
    "bounding boxes — the measurable pruning-effectiveness report.",
)
def q_events_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.layout import zorder_boxes

    events = Catalog(spark, sf_dir).table("events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = (
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5))
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
    )
    return zorder_boxes(events, x, y, bits=16, prefix_bits=ZORDER_PREFIX_BITS)


_ZPRED_ROWS = [
    (0, 10, 99, 10000, 14999),       # narrow x AND y: z-layout shines
    (1, 0, 65535, 20000, 20999),     # y-only filter: x-sorted reads ALL
    (2, 5, 9, 0, 65535),             # x-only filter: both layouts prune
]
_ZPRED_VALUES = ", ".join(f"({i}, {a}, {b}, {c}, {d})" for i, a, b, c, d in _ZPRED_ROWS)


@register(
    "events_zorder_pruning",
    f"""
    WITH b AS (
      SELECT ({_morton_sql(_ZX_SQL, _ZY_SQL, 16)}) >> {32 - ZORDER_PREFIX_BITS}
               AS zbucket,
             {_ZX_SQL} >> {16 - ZORDER_PREFIX_BITS} AS xbucket,
             {_ZX_SQL} AS x, {_ZY_SQL} AS y
      FROM events),
    boxes AS (
      SELECT CASE WHEN zbucket IS NOT NULL THEN 'zorder'
                  ELSE 'xsorted' END AS layout,
             count(*) AS n_rows, min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM b GROUP BY GROUPING SETS ((zbucket), (xbucket))),
    p(pred_id, x_lo, x_hi, y_lo, y_hi) AS (VALUES {_ZPRED_VALUES})
    SELECT p.pred_id, boxes.layout,
           CAST(count(*) AS BIGINT) AS files_total,
           CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo
                          AND y_min <= y_hi AND y_max >= y_lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
           CAST(sum(CASE WHEN x_min <= x_hi AND x_max >= x_lo
                          AND y_min <= y_hi AND y_max >= y_lo
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_read
    FROM boxes CROSS JOIN p
    GROUP BY 1, 2
    """,
    "The Z-order family's MEASURED payoff: for three 2-D range "
    "predicates, how many of the 256 clustered files a zone map must "
    "read under Z-order vs a plain x-sorted layout (a file is read "
    "iff its min/max box intersects the predicate box — exactly "
    "parquet/Delta stats pruning). ONE corpus scan emits BOTH "
    "layouts' zone maps via GROUPING SETS over (zbucket)/(xbucket) — "
    "a single Expand + partial-agg'd shuffle to ≤512 box rows; "
    "predicates attach as an exploded literal array (map-side, no "
    "join operator). The y-only predicate is "
    "the story: the x-sorted layout reads every file, the z-layout "
    "reads the rectangle cover (operators/layout.py::pruning_report).",
)
def q_events_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.layout import pruning_report

    events = Catalog(spark, sf_dir).table("events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = (
        F.floor(F.col("value") * F.lit(100) + F.lit(0.5))
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
    )
    return pruning_report(
        events,
        x,
        y,
        [(a, b, c, d) for _, a, b, c, d in _ZPRED_ROWS],
        bits=16,
        prefix_bits=ZORDER_PREFIX_BITS,
    )


PAGERANK_TOPN = 50


def _pagerank_sql() -> str:
    from realtime0523_spark.operators.graph import (
        PAGERANK_DAMPING_PCT as DP,
        PAGERANK_ITERS,
        PAGERANK_SCALE as SC,
    )

    base = ((100 - DP) * SC) // 100
    parts = [
        """pedges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""",
        "pdeg AS (SELECT src, count(*) AS deg FROM pedges GROUP BY src)",
        "pnodes AS (SELECT DISTINCT src AS node FROM pedges)",
        f"r0 AS (SELECT node, CAST({SC} AS BIGINT) AS r FROM pnodes)",
    ]
    for i in range(PAGERANK_ITERS):
        parts.append(
            f"""r{i + 1} AS (
      SELECT n.node,
             CAST({base} + ({DP} * coalesce(s.m, 0)) // 100 AS BIGINT) AS r
      FROM pnodes n LEFT JOIN (
        SELECT e.dst AS node, sum(rr.r // d.deg) AS m
        FROM pedges e
        JOIN r{i} rr ON rr.node = e.src
        JOIN pdeg d ON d.src = e.src
        GROUP BY e.dst) s ON s.node = n.node)"""
        )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT node AS part_id, r AS rank_fp,
           row_number() OVER (ORDER BY r DESC, node) AS rk
    FROM r{PAGERANK_ITERS}
    ORDER BY rk LIMIT {PAGERANK_TOPN}
    """


@register(
    "parts_copurchase_rank",
    _pagerank_sql(),
    "PageRank centrality over the part co-purchase graph (distinct "
    "same-order part pairs, both directions) — the quality-weighting "
    "signal web-corpus pipelines attach to crawled pages (Common "
    "Crawl publishes exactly these rankings), here as the canonical "
    "distributed power iteration: per round one ranks-onto-edges "
    "equi-join and one partial-agg'd destination groupBy. The whole "
    "iteration runs in INTEGER FIXED POINT (bigint ranks scaled by "
    "1e12, floor division) so every engine computes identical values "
    "— no float drift, no quantization contract beyond div. Rounds "
    "localCheckpoint with eager snapshot release (O(1) memory and "
    "plan depth in iterations); the top-N is orderBy+limit → "
    "TakeOrderedAndProject, never a global sort.",
)
def q_parts_copurchase_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from realtime0523_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed_point,
    )

    li = Catalog(spark, sf_dir).table("lineitem")
    ranks = pagerank_fixed_point(copurchase_edges(li))
    top = ranks.orderBy(F.desc("rank_fp"), F.col("node")).limit(PAGERANK_TOPN)
    return top.select(
        F.col("node").alias("part_id"),
        "rank_fp",
        F.row_number()
        .over(W.orderBy(F.desc("rank_fp"), F.col("node")))
        .alias("rk"),
    )


LATE_DAYS = 60  # ship lag that counts as "kept the order waiting"


@register(
    "cheapest_supplier_per_part",
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             round(sum(l_extendedprice) / sum(l_quantity), 9) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (
      SELECT l_partkey, l_suppkey, unit_price,
             min(unit_price) OVER (PARTITION BY l_partkey) AS best_price
      FROM unit)
    SELECT b.l_partkey AS part_id, b.l_suppkey AS supp_id, s.s_name,
           b.unit_price
    FROM best b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.unit_price = b.best_price
    """,
    "TPC-H Q2's shape on the available tables: for every part, the "
    "supplier(s) achieving the minimum realized unit price — the "
    "correlated-MIN-subquery pattern, decorrelated into one "
    "partial-agg'd (part, supp) groupBy plus a per-part window min "
    "(no re-scan, no self-join); the supplier dim joins by "
    "broadcast. Ties keep every best supplier (deterministic set). "
    "Prices quantized to 9 dp before the min so the float compare "
    "is engine-portable.",
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    li, supp = cat.table("lineitem"), cat.table("supplier")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 9).alias(
            "unit_price"
        )
    )
    best = unit.withColumn(
        "best_price", F.min("unit_price").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_price") == F.col("best_price"))
    return best.join(
        F.broadcast(supp.select("s_suppkey", "s_name")),
        best.l_suppkey == F.col("s_suppkey"),
    ).select(
        F.col("l_partkey").alias("part_id"),
        F.col("l_suppkey").alias("supp_id"),
        "s_name",
        "unit_price",
    )


@register(
    "lone_late_supplier",
    f"""
    WITH ls AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate
                             + INTERVAL {LATE_DAYS} DAY
                      THEN 1 ELSE 0 END) AS was_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supps,
             sum(was_late) AS n_late
      FROM ls GROUP BY l_orderkey)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ls
    JOIN per_order p ON p.l_orderkey = ls.l_orderkey
    JOIN supplier s ON s.s_suppkey = ls.l_suppkey
    WHERE ls.was_late = 1 AND p.n_supps > 1 AND p.n_late = 1
    GROUP BY s.s_name
    """,
    "TPC-H Q21's shape (suppliers who kept waiting orders): in "
    "multi-supplier orders where EXACTLY ONE supplier shipped late "
    f"(> {LATE_DAYS} days after the order date), count offenses per "
    "supplier. The classic EXISTS/NOT-EXISTS pair decorrelates into "
    "one (order, supplier) any-late aggregate reused three ways — "
    "per-order supplier/late counts, then the lone-late filter — so "
    "lineitem scans once instead of three correlated re-scans; the "
    "supplier dim is a broadcast join.",
)
def q_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o, supp = cat.table("lineitem"), cat.table("orders"), cat.table("supplier")
    # orders is fact-sized: equi-join on the order key (AQE picks the
    # strategy; at scale this is the co-partitioned SMJ), never a
    # forced broadcast
    ls = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.date_add(F.col("o_orderdate"), LATE_DAYS),
                    1,
                ).otherwise(0)
            ).alias("was_late")
        )
    )
    per_order = ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("was_late").alias("n_late")
    )
    return (
        ls.filter(F.col("was_late") == 1)
        .join(
            per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            ls.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "warehouse_quality_report",
    """
    WITH li AS (
      SELECT 'lineitem.quantity_in_range' AS rule,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.extendedprice_positive',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN coalesce(l_extendedprice > 0, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.discount_in_unit_interval',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN coalesce(l_discount BETWEEN 0 AND 1, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders.totalprice_positive',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN coalesce(o_totalprice > 0, FALSE)
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders.orderdate_not_null',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders.pk_unique', CAST(sum(c) AS BIGINT),
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
      FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'lineitem.pk_unique', CAST(sum(c) AS BIGINT),
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
      FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber)
      UNION ALL
      SELECT 'lineitem.fk_orders', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'orders.fk_customer', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON c.c_custkey = o.o_custkey
      UNION ALL
      SELECT 'lineitem.fk_part', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        ON p.p_partkey = l.l_partkey)
    SELECT rule, n_rows, n_violations,
           round(CAST(n_violations AS DOUBLE)
                 / greatest(CAST(n_rows AS DOUBLE), 1.0), 9) AS violation_rate
    FROM li
    """,
    "Declarative data-quality gate (the Deequ / dbt-tests shape): "
    "row-level constraints evaluated in ONE aggregate pass per table "
    "(NULL predicate = violation — the three-valued-logic footgun "
    "closed), key-uniqueness as one groupBy, referential integrity "
    "as left joins against DISTINCT parent keys. The admission check "
    "a 100 TB ingest runs in front of the warehouse; cost = one scan "
    "per table + |keys|-sized reductions.",
)
def q_warehouse_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.validate import (
        fk_report,
        rule_report,
        uniqueness_report,
    )

    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    cust, part = cat.table("customer"), cat.table("part")
    return (
        rule_report(
            li,
            {
                "lineitem.quantity_in_range": F.col("l_quantity").between(1, 50),
                "lineitem.extendedprice_positive": F.col("l_extendedprice") > 0,
                "lineitem.discount_in_unit_interval": F.col("l_discount").between(0, 1),
            },
        )
        .unionAll(
            rule_report(
                o,
                {
                    "orders.totalprice_positive": F.col("o_totalprice") > 0,
                    "orders.orderdate_not_null": F.col("o_orderdate").isNotNull(),
                },
            )
        )
        .unionAll(uniqueness_report(o, ["o_orderkey"], "orders.pk_unique"))
        .unionAll(
            uniqueness_report(
                li, ["l_orderkey", "l_linenumber"], "lineitem.pk_unique"
            )
        )
        .unionAll(fk_report(li, "l_orderkey", o, "o_orderkey", "lineitem.fk_orders"))
        .unionAll(fk_report(o, "o_custkey", cust, "c_custkey", "orders.fk_customer"))
        .unionAll(fk_report(li, "l_partkey", part, "p_partkey", "lineitem.fk_part"))
    )


PPR_SEEDS = 3
PPR_TOPN = 20


def _ppr_sql() -> str:
    from realtime0523_spark.operators.graph import (
        PAGERANK_DAMPING_PCT as DP,
        PAGERANK_ITERS,
        PAGERANK_SCALE as SC,
    )

    base = ((100 - DP) * SC) // 100
    parts = [
        """pedges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""",
        "pdeg AS (SELECT src, count(*) AS deg FROM pedges GROUP BY src)",
        "pnodes AS (SELECT DISTINCT src AS node FROM pedges)",
        f"""pseeds AS (
      SELECT node FROM (
        SELECT l_partkey AS node,
               row_number() OVER (ORDER BY sum(l_quantity) DESC,
                                  l_partkey) AS rk
        FROM lineitem GROUP BY l_partkey) WHERE rk <= {PPR_SEEDS})""",
        f"""r0 AS (
      SELECT n.node,
             CAST(CASE WHEN s.node IS NOT NULL THEN {SC} ELSE 0 END
                  AS BIGINT) AS r,
             s.node IS NOT NULL AS seed
      FROM pnodes n LEFT JOIN pseeds s ON s.node = n.node)""",
    ]
    for i in range(PAGERANK_ITERS):
        parts.append(
            f"""r{i + 1} AS (
      SELECT n.node,
             CAST(CASE WHEN n.seed THEN {base} ELSE 0 END
                  + ({DP} * coalesce(s.m, 0)) // 100 AS BIGINT) AS r,
             n.seed
      FROM r{i} n LEFT JOIN (
        SELECT e.dst AS node, sum(rr.r // d.deg) AS m
        FROM pedges e
        JOIN r{i} rr ON rr.node = e.src
        JOIN pdeg d ON d.src = e.src
        GROUP BY e.dst) s ON s.node = n.node)"""
        )
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT node AS part_id, r AS rank_fp,
           row_number() OVER (ORDER BY r DESC, node) AS rk
    FROM r{PAGERANK_ITERS}
    ORDER BY rk LIMIT {PPR_TOPN}
    """


@register(
    "parts_related_rank",
    _ppr_sql(),
    f"PERSONALIZED PageRank (Haveliwala WWW 2002; the Pixie-style "
    "related-items recommender): the teleport term lands only on a "
    f"seed set (the {PPR_SEEDS} highest-volume parts), so rank "
    "becomes graph proximity TO THE SEEDS through co-purchases — "
    "'customers who bought these also bought…' at catalog scale. "
    "Identical per-round join+aggregate shape and integer fixed-point "
    "contract as parts_copurchase_rank; the seed flag rides the node "
    "set, adding zero extra joins per round.",
)
def q_parts_related_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from realtime0523_spark.operators.graph import (
        copurchase_edges,
        pagerank_fixed_point,
    )

    li = Catalog(spark, sf_dir).table("lineitem")
    seeds = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .orderBy(F.desc("q"), F.col("l_partkey"))
        .limit(PPR_SEEDS)
        .select(F.col("l_partkey").alias("node"))
    )
    ranks = pagerank_fixed_point(copurchase_edges(li), seeds=seeds)
    top = ranks.orderBy(F.desc("rank_fp"), F.col("node")).limit(PPR_TOPN)
    return top.select(
        F.col("node").alias("part_id"),
        "rank_fp",
        F.row_number()
        .over(W.orderBy(F.desc("rank_fp"), F.col("node")))
        .alias("rk"),
    )


DECAY_HALF_LIFE_S = 7 * 24 * 3600  # 7-day half-life


@register(
    "events_trending_decayed",
    f"""
    WITH ref AS (SELECT max(ts) AS t_ref FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(pow(0.5,
             CAST(epoch_us(r.t_ref) - epoch_us(ts) AS DOUBLE)
               / ({DECAY_HALF_LIFE_S} * 1000000.0))), 9) AS decayed_count,
           CAST(row_number() OVER (
             ORDER BY round(sum(pow(0.5,
               CAST(epoch_us(r.t_ref) - epoch_us(ts) AS DOUBLE)
                 / ({DECAY_HALF_LIFE_S} * 1000000.0))), 9) DESC,
               event_type) AS INT) AS rk
    FROM events CROSS JOIN ref r
    GROUP BY event_type
    """,
    "Exponentially time-decayed trending counts (7-day half-life) — "
    "the recency-weighted upgrade of the reference's hot-goods "
    "ranking: each event contributes 2^(−age/half-life), so last "
    "week's burst outranks last month's tail without any windowing "
    "cutoff. The anchor is the corpus max timestamp (one scalar to "
    "the driver — deterministic, replayable); the aggregate is one "
    "partial-agg'd groupBy, decay computed map-side. The sum is "
    "ADDITIVE given a fixed anchor, so a streaming twin folds "
    "per-batch partial sums exactly like stream_domain_drift.",
)
def q_events_trending_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).table("events")
    t_ref = ev.agg(F.max("ts")).first()[0]  # one scalar anchor
    if t_ref is None:  # empty table: contract-schema empty frame
        return spark.createDataFrame(
            [],
            "event_type string, n_events long, decayed_count double, rk int",
        )
    # EXACT integer microsecond ages (unix_micros mirrors the oracle's
    # epoch_us bigint-for-bigint — a float epoch carries ~0.2 µs
    # representation error that a boundary-sitting 9-dp round can flip)
    age_us = (
        F.unix_micros(F.lit(t_ref).cast("timestamp"))
        - F.unix_micros("ts")
    ).cast("double")
    decayed = F.round(
        F.sum(F.pow(F.lit(0.5), age_us / F.lit(DECAY_HALF_LIFE_S * 1e6))), 9
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        decayed.alias("decayed_count"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "decayed_count",
        F.row_number()
        .over(W.orderBy(F.desc("decayed_count"), F.col("event_type")))
        .cast("int")
        .alias("rk"),
    )


@register(
    "stream_trending_decayed",
    REGISTRY["events_trending_decayed"].oracle,
    "Streaming twin of events_trending_decayed: with the anchor "
    "fixed, each event's decay weight is a constant, so the decayed "
    "sum is ADDITIVE — every micro-batch folds its per-type partial "
    "(count, weight-sum) into an idempotent sink and the drained "
    "totals are summed and ranked. No state store, no recomputation; "
    "per-batch work is batch-sized. (The anchor-ADVANCING variant — "
    "per-batch anchors rescaled at the fold, for unbounded horizons "
    "— is stream_trending_anchored / streaming/decayed.py.)",
)
def q_stream_trending_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window as W

    from realtime0523_spark.streaming.runner import run_foreach_batch
    from realtime0523_spark.streaming.sinks import (
        detach_and_cleanup,
        idempotent_batch_writer,
    )
    from realtime0523_spark.streaming.sources import stream_table

    ev = Catalog(spark, sf_dir).table("events")
    t_ref = ev.agg(F.max("ts")).first()[0]
    if t_ref is None:  # empty table: contract-schema empty frame
        return spark.createDataFrame(
            [],
            "event_type string, n_events long, decayed_count double, rk int",
        )
    # exact integer microsecond ages — same contract as the batch twin
    age_us = (
        F.unix_micros(F.lit(t_ref).cast("timestamp"))
        - F.unix_micros("ts")
    ).cast("double")
    weight = F.pow(F.lit(0.5), age_us / F.lit(DECAY_HALF_LIFE_S * 1e6))
    stream = stream_table(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="stream_trending_")
    sink = idempotent_batch_writer(out_dir)

    def fold(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sink(
            batch_df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"), F.sum(weight).alias("w")
            ),
            batch_id,
        )

    run_foreach_batch(stream, fold, output_mode="append")
    totals = (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.sum("w"), 9).alias("decayed_count"),
        )
    )
    return detach_and_cleanup(
        totals.select(
            "event_type",
            "n_events",
            "decayed_count",
            F.row_number()
            .over(W.orderBy(F.desc("decayed_count"), F.col("event_type")))
            .cast("int")
            .alias("rk"),
        ),
        out_dir,
    )


@register(
    "stream_trending_anchored",
    REGISTRY["events_trending_decayed"].oracle,
    "ANCHOR-ADVANCING decayed trending (the unbounded-horizon "
    "variant stream_trending_decayed's docstring promises): each "
    "micro-batch weights its events against its OWN anchor (the "
    "batch max event time — in-batch ages are batch-spanned, so "
    "weights never underflow however long the stream runs) and "
    "records the anchor beside the partial; the reader rescales "
    "every partial to the newest anchor via the anchor-shift "
    "identity 2^(-(T'-T)/hl) — one multiply per key per partial, "
    "metadata-sized, events never re-read. With the drain in one "
    "micro-batch the anchor IS the corpus max and the computation "
    "is literally the batch expression (exact oracle row); the "
    "multi-batch rescale path is pytest-asserted across an anchor "
    "advance under both state-store providers.",
)
def q_stream_trending_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from realtime0523_spark.streaming.decayed import (
        decayed_totals,
        run_decayed_partials,
    )
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = Catalog(spark, sf_dir).table("events")
    if ev.limit(1).count() == 0:  # empty table: contract-schema frame
        return spark.createDataFrame(
            [],
            "event_type string, n_events long, decayed_count double, rk int",
        )
    out_dir = run_decayed_partials(
        stream_table(spark, sf_dir, "events"),
        "event_type",
        "ts",
        DECAY_HALF_LIFE_S,
    )
    totals = decayed_totals(spark, out_dir, "event_type", DECAY_HALF_LIFE_S)
    return detach_and_cleanup(
        totals.select(
            "event_type",
            "n_events",
            "decayed_count",
            F.row_number()
            .over(W.orderBy(F.desc("decayed_count"), F.col("event_type")))
            .cast("int")
            .alias("rk"),
        ),
        out_dir,
    )


KCORE_K = 80
KCORE_ROUNDS = 8  # fixpoint at 5-7 on the fixtures; margin asserted in tests


def _kcore_sql(k: int, rounds: int) -> str:
    """Generated fixed-round peel oracle: each round re-derives
    degrees from the remaining canonical edge table and deletes every
    node below k. An R-round peel is a deterministic function of the
    data whether or not it converged, so equality never depends on
    convergence (convergence at fixture scale is test-asserted)."""
    parts = [
        """ke0 AS MATERIALIZED (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
                      greatest(a.l_partkey, b.l_partkey) AS hi
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""kb{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS d FROM (
          SELECT lo AS node FROM ke{r}
          UNION ALL SELECT hi FROM ke{r}) GROUP BY node)
      WHERE d < {k})"""
        )
        parts.append(
            f"""ke{r + 1} AS MATERIALIZED (
      SELECT lo, hi FROM ke{r}
      WHERE lo NOT IN (SELECT node FROM kb{r})
        AND hi NOT IN (SELECT node FROM kb{r}))"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT node AS part_id, CAST(count(*) AS BIGINT) AS core_degree
    FROM (SELECT lo AS node FROM ke{rounds}
          UNION ALL SELECT hi FROM ke{rounds})
    GROUP BY node
    """
    )


@register(
    "parts_kcore",
    _kcore_sql(KCORE_K, KCORE_ROUNDS),
    f"{KCORE_K}-CORE of the part co-purchase graph by iterative "
    "peeling (Seidman 1983; Montresor et al.'s distributed peel): "
    "repeatedly delete every node whose degree in the REMAINING "
    "graph is below k — what survives is the maximal subgraph where "
    "every part keeps ≥ k co-purchase partners, the dense-community "
    "screen (link-farm cores on web graphs, co-purchase communities "
    "worth recommending inside). Per round: one partial-agg'd degree "
    "groupBy + two anti-join filters, each round's edge table "
    "checkpoint-materialized with eager release (plan depth and "
    f"memory O(1) in rounds). Both engines run EXACTLY "
    f"{KCORE_ROUNDS} peels — an R-round peel is deterministic "
    "whether or not converged, so oracle equality never depends on "
    "convergence; fixture-scale convergence is test-asserted.",
)
def q_parts_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.graph import copurchase_half_pairs, kcore

    li = Catalog(spark, sf_dir).table("lineitem")
    # raw half-pair stream (map-side pair generation — round-13);
    # kcore canonicalizes + distincts internally
    pairs = copurchase_half_pairs(li)
    return kcore(pairs, KCORE_K, rounds=KCORE_ROUNDS).select(
        F.col("node").alias("part_id"), "core_degree"
    )


TRIANGLE_TOPN = 30


@register(
    "parts_triangle_stats",
    f"""
    WITH und AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
    tdeg AS (SELECT src, count(*) AS deg FROM und GROUP BY src),
    te AS (
      SELECT u.src AS a, u.dst AS b, da.deg AS da, db.deg AS db
      FROM und u
      JOIN tdeg da ON da.src = u.src
      JOIN tdeg db ON db.src = u.dst
      WHERE da.deg < db.deg OR (da.deg = db.deg AND u.src < u.dst)),
    wedge AS (
      SELECT w1.a, w1.b, w2.b AS c
      FROM te w1 JOIN te w2 ON w2.a = w1.a
      WHERE w1.db < w2.db OR (w1.db = w2.db AND w1.b < w2.b)),
    tri AS (
      SELECT w.a, w.b, w.c
      FROM wedge w JOIN te e ON e.a = w.b AND e.b = w.c),
    per_node AS (
      SELECT node, count(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY node)
    SELECT node AS part_id, degree, n_triangles, clustering, rk FROM (
      SELECT d.src AS node, CAST(d.deg AS BIGINT) AS degree,
             CAST(coalesce(p.t, 0) AS BIGINT) AS n_triangles,
             CASE WHEN d.deg >= 2 THEN round(
               2.0 * coalesce(p.t, 0)
                 / (CAST(d.deg AS DOUBLE) * (d.deg - 1)), 9)
             ELSE 0.0 END AS clustering,
             row_number() OVER (ORDER BY coalesce(p.t, 0) DESC, d.src) AS rk
      FROM tdeg d LEFT JOIN per_node p ON p.node = d.src)
    WHERE rk <= {TRIANGLE_TOPN}
    """,
    "Per-node triangle counts + local clustering coefficient over "
    "the part co-purchase graph, via the degree-ORIENTED wedge join "
    "(Suri & Vassilvitskii WWW 2011): every edge directed from its "
    "(degree, id)-smaller endpoint, wedges enumerated only from "
    "oriented out-edges (fan-out bounded by O(√m) even on power-law "
    "hubs — the curse-of-the-last-reducer fix), closed by one "
    "(b, c) equi-join; each triangle materializes exactly once. "
    "Tight-community detection for recommendations, link-farm "
    "screening on web graphs. The derived graph (undirected edges, "
    "degrees, oriented table) is checkpoint-materialized once before "
    "the multi-branch fan-out, so the lineitem self-join runs once — "
    "single-digit shuffles end-to-end, plan-asserted.",
)
def q_parts_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from realtime0523_spark.operators.graph import (
        copurchase_half_pairs,
        triangle_counts,
    )

    li = Catalog(spark, sf_dir).table("lineitem")
    # feed the RAW half-pair stream (src < dst, cross-order duplicates
    # kept; map-side pair generation — round-13): triangle_counts
    # canonicalizes + distincts internally, so the both-directions
    # copurchase_edges distinct would be a second full shuffle of the
    # pair fan-out for the same graph
    pairs = copurchase_half_pairs(li)
    tc = triangle_counts(pairs)
    clustering = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0
            * F.col("n_triangles")
            / (F.col("degree").cast("double") * (F.col("degree") - 1)),
            9,
        ),
    ).otherwise(F.lit(0.0))
    ranked = tc.select(
        F.col("node").alias("part_id"),
        "degree",
        "n_triangles",
        clustering.alias("clustering"),
    )
    top = ranked.orderBy(
        F.desc("n_triangles"), F.col("part_id")
    ).limit(TRIANGLE_TOPN)
    return top.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.desc("n_triangles"), F.col("part_id"))),
    )


# ---------------------------------------------------------------------------
# CDC retraction aggregate — the update/delete half of the changelog the
# reference's insert-only fact routing (KafkaToODS_M.scala:53-64) drops.
# The changelog fixture is derived deterministically from orders in BOTH
# engines; the oracle aggregates a full latest-state RECOMPUTE, so the
# match proves the signed-delta algebra equals state maintenance.


def _orders_changelog(orders: DataFrame) -> DataFrame:
    """Deterministic CDC changelog derived from orders in ONE scan
    (array-of-events + explode — no 3-way self-union): every order
    inserts; o_orderkey % 7 == 3 later gets a +10%% price-correction
    update; o_orderkey % 11 == 5 is cancelled, the delete carrying the
    then-current price the way a real CDC delete carries the old row.
    Stateless — applies to the batch table and the CDC stream alike."""
    upd = F.col("o_orderkey") % 7 == 3
    dele = F.col("o_orderkey") % 11 == 5
    upd_price = round2(F.col("o_totalprice") * 1.1)
    cur_price = F.when(upd, upd_price).otherwise(F.col("o_totalprice"))
    null_d = F.lit(None).cast("double")
    events = F.array(
        F.struct(
            F.lit("insert").alias("op"),
            F.col("o_totalprice").alias("price_new"),
            null_d.alias("price_old"),
        ),
        F.when(
            upd,
            F.struct(
                F.lit("update").alias("op"),
                upd_price.alias("price_new"),
                F.col("o_totalprice").alias("price_old"),
            ),
        ),
        F.when(
            dele,
            F.struct(
                F.lit("delete").alias("op"),
                null_d.alias("price_new"),
                cur_price.alias("price_old"),
            ),
        ),
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.explode(F.filter(events, lambda x: x.isNotNull())).alias("ev"),
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "ev.op",
        "ev.price_new",
        "ev.price_old",
    )


_RETRACT_ORACLE = """
    WITH live AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 7 = 3
                  THEN floor((o_totalprice * 1.1) * 100 + 0.5) / 100
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE o_orderkey % 11 <> 5)
    SELECT o_orderpriority,
           sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) / 100.0 AS net_amount,
           CAST(count(*) AS BIGINT) AS net_rows
    FROM live
    GROUP BY o_orderpriority
    """


@register(
    "cdc_retract_agg",
    _RETRACT_ORACLE,
    "Retractable revenue aggregate over a full CDC changelog "
    "(insert/update/delete) — the capability the reference's "
    "insert-only fact routing (scala/…/ods/KafkaToODS_M.scala:53-64) "
    "forfeits: a post-ingest price correction or cancellation there "
    "skews every downstream total forever. Flink-style signed-delta "
    "algebra: each change event maps statelessly to (±cents, ±1) and "
    "one map-side-combined groupBy equals a full latest-state "
    "recompute — which is exactly what the oracle computes, so the "
    "hash match IS the equivalence proof. No per-key latest-version "
    "window, no per-key state: at 100 TB the plan is one shuffle of "
    "|groups| partial rows (operators/retraction.py).",
)
def q_cdc_retract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.retraction import retract_aggregate

    orders = Catalog(spark, sf_dir).table("orders")
    return retract_aggregate(_orders_changelog(orders), ["o_orderpriority"])


@register(
    "stream_cdc_retract_agg",
    _RETRACT_ORACLE,
    "Streaming twin of cdc_retract_agg — the online repair tier the "
    "reference lacks: per micro-batch, change events map to signed "
    "deltas and collapse to |groups| partial rows committed "
    "idempotently by batchId (K5); the final state aggregate "
    "re-aggregates committed partials. Signed-delta addition is "
    "commutative+associative, so batch boundaries, replays, and "
    "late/reordered change events cannot change the answer — drained "
    "result equals the batch oracle's latest-state recompute "
    "(streaming/retraction.py).",
)
def q_stream_cdc_retract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.retraction import (
        streaming_retract_aggregate,
    )
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    changelog = _orders_changelog(stream_table(spark, sf_dir, "orders"))
    work = tempfile.mkdtemp(prefix="stream_cdc_retract_")
    return detach_and_cleanup(
        streaming_retract_aggregate(
            spark,
            changelog,
            ["o_orderpriority"],
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


def _customers_changelog(customer: DataFrame) -> DataFrame:
    """Deterministic dim-side CDC changelog derived from customer in
    one scan (same array-of-events shape as `_orders_changelog`):
    every customer inserts with their balance; c_custkey % 5 == 2
    later gets a +50.00 balance-correction update; c_custkey % 13 == 7
    closes their account, the delete carrying the then-current
    balance. `c_nationkey` rides as the immutable per-key attribute
    the join rollup groups on."""
    upd = F.col("c_custkey") % 5 == 2
    dele = F.col("c_custkey") % 13 == 7
    upd_bal = round2(F.col("c_acctbal") + 50.0)
    cur_bal = F.when(upd, upd_bal).otherwise(F.col("c_acctbal"))
    null_d = F.lit(None).cast("double")
    events = F.array(
        F.struct(
            F.lit("insert").alias("op"),
            F.col("c_acctbal").alias("price_new"),
            null_d.alias("price_old"),
        ),
        F.when(
            upd,
            F.struct(
                F.lit("update").alias("op"),
                upd_bal.alias("price_new"),
                F.col("c_acctbal").alias("price_old"),
            ),
        ),
        F.when(
            dele,
            F.struct(
                F.lit("delete").alias("op"),
                null_d.alias("price_new"),
                cur_bal.alias("price_old"),
            ),
        ),
    )
    return customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
        F.explode(F.filter(events, lambda x: x.isNotNull())).alias("ev"),
    ).select("custkey", "nationkey", "ev.op", "ev.price_new", "ev.price_old")


_RETRACT_JOIN_ORACLE = """
    WITH live_c AS (
      SELECT c_custkey AS custkey, c_nationkey AS nationkey,
             CASE WHEN c_custkey % 5 = 2
                  THEN floor((c_acctbal + 50.0) * 100 + 0.5) / 100
                  ELSE c_acctbal END AS bal
      FROM customer
      WHERE c_custkey % 13 <> 7),
    live_o AS (
      SELECT o_custkey AS custkey,
             CASE WHEN o_orderkey % 7 = 3
                  THEN floor((o_totalprice * 1.1) * 100 + 0.5) / 100
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE o_orderkey % 11 <> 5)
    SELECT c.nationkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           sum(CAST(floor(o.price * 100 + 0.5) AS BIGINT)) / 100.0
             AS fact_amount,
           sum(CAST(floor(c.bal * 100 + 0.5) AS BIGINT)) / 100.0
             AS dim_amount
    FROM live_o o JOIN live_c c USING (custkey)
    GROUP BY c.nationkey
    """


@register(
    "cdc_retract_join",
    _RETRACT_JOIN_ORACLE,
    "Aggregates over the equi-join of TWO CDC changelogs (orders fact "
    "x customer dim, rolled up to nation) computed from per-key "
    "signed partials alone — higher-order IVM (Koch et al., "
    "DBToaster): per-pair counts and value sums factor as products "
    "of each side's per-key signed (sum, count), so a customer "
    "delete retracts ALL their live orders from the join in one "
    "algebraic step. The insert-only reference "
    "(scala/…/ods/KafkaToODS_M.scala:53-64) can never repair this. "
    "The oracle materializes both live states and actually joins "
    "them, so the hash match proves the factorization. At 100 TB: "
    "one scan + one |keys| partial-agg'd shuffle per changelog, a "
    "key-summary equi-join, one rollup — changelog rows never join "
    "changelog rows (operators/retraction.py::retract_join_aggregate).",
)
def q_cdc_retract_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.retraction import retract_join_aggregate

    cat = Catalog(spark, sf_dir)
    orders = _orders_changelog(cat.table("orders")).select(
        F.col("o_custkey").alias("custkey"), "op", "price_new", "price_old"
    )
    custs = _customers_changelog(cat.table("customer"))
    return retract_join_aggregate(
        orders, custs, ["custkey"], ["nationkey"]
    )


@register(
    "stream_cdc_retract_join",
    _RETRACT_JOIN_ORACLE,
    "Streaming twin of cdc_retract_join — BOTH changelogs arrive as "
    "streams, each draining through per-batch per-key signed-partial "
    "commits (idempotent by batchId, K5); the key-summary join runs "
    "over committed partials only. No stream-stream join state, no "
    "watermark alignment: signed-delta addition commutes across "
    "sides, batches, and replays, so drain order cannot change the "
    "answer — the drained result equals the batch oracle's full "
    "latest-state join (streaming/retraction.py::streaming_retract_join).",
)
def q_stream_cdc_retract_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.retraction import streaming_retract_join
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    orders = _orders_changelog(stream_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("custkey"), "op", "price_new", "price_old"
    )
    custs = _customers_changelog(stream_table(spark, sf_dir, "customer"))
    work = tempfile.mkdtemp(prefix="stream_cdc_join_")
    return detach_and_cleanup(
        streaming_retract_join(
            spark,
            orders,
            custs,
            ["custkey"],
            ["nationkey"],
            fact_dir=f"{work}/fact",
            dim_dir=f"{work}/dim",
            checkpoint_root=f"{work}/ckpt",
        ),
        work,
    )


def _simple_changelog(
    src: DataFrame,
    keep_cols: list[str],
    value_col: str,
    upd: Column,
    dele: Column,
    upd_value: Column,
) -> DataFrame:
    """Shared array-of-events CDC derivation (one scan, like
    `_orders_changelog`): every row inserts `value_col`; rows matching
    `upd` later get a correction to `upd_value`; rows matching `dele`
    are deleted carrying the then-current value."""
    cur = F.when(upd, upd_value).otherwise(F.col(value_col))
    null_d = F.lit(None).cast("double")
    events = F.array(
        F.struct(
            F.lit("insert").alias("op"),
            F.col(value_col).alias("price_new"),
            null_d.alias("price_old"),
        ),
        F.when(
            upd,
            F.struct(
                F.lit("update").alias("op"),
                upd_value.alias("price_new"),
                F.col(value_col).alias("price_old"),
            ),
        ),
        F.when(
            dele,
            F.struct(
                F.lit("delete").alias("op"),
                null_d.alias("price_new"),
                cur.alias("price_old"),
            ),
        ),
    )
    return src.select(
        *keep_cols,
        F.explode(F.filter(events, lambda x: x.isNotNull())).alias("ev"),
    ).select(*keep_cols, "ev.op", "ev.price_new", "ev.price_old")


_RETRACT_JOIN3_ORACLE = """
    WITH live_l AS (
      SELECT l_partkey, l_suppkey,
             CASE WHEN (l_orderkey * 7 + l_linenumber) % 9 = 4
                  THEN floor((l_extendedprice * 1.1) * 100 + 0.5) / 100
                  ELSE l_extendedprice END AS price
      FROM lineitem
      WHERE (l_orderkey * 7 + l_linenumber) % 13 <> 6),
    live_p AS (
      SELECT p_partkey, p_brand,
             CASE WHEN p_partkey % 5 = 2
                  THEN floor((p_retailprice + 50.0) * 100 + 0.5) / 100
                  ELSE p_retailprice END AS retail
      FROM part WHERE p_partkey % 11 <> 3),
    live_s AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 <> 5)
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_triples,
           sum(CAST(floor(l.price * 100 + 0.5) AS BIGINT)) / 100.0
             AS fact_amount,
           sum(CAST(floor(p.retail * 100 + 0.5) AS BIGINT)) / 100.0
             AS dim_a_amount
    FROM live_l l
    JOIN live_p p ON l.l_partkey = p.p_partkey
    JOIN live_s s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """


@register(
    "cdc_retract_join3",
    _RETRACT_JOIN3_ORACLE,
    "Three-changelog retraction join (the snowflake extension of "
    "cdc_retract_join, closing the multi-way factorization rung): a "
    "lineitem fact changelog carrying TWO foreign keys joins part and "
    "supplier dim changelogs, per-brand triple counts and value sums "
    "factoring as products of per-key signed partials — a "
    "discontinued part or a dropped supplier retracts every "
    "surviving fact triple in one algebraic step, with no "
    "row-to-row changelog join anywhere. One scan + one "
    "partial-agg'd shuffle per changelog (fact to |key pairs|, dims "
    "to |keys|), two key-summary equi-joins, one rollup; the oracle "
    "materializes all three live states and runs the real 3-way "
    "join, so the hash match proves the factorization "
    "(operators/retraction.py::retract_join3_aggregate).",
)
def q_cdc_retract_join3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.retraction import (
        retract_join3_aggregate,
    )

    cat = Catalog(spark, sf_dir)
    m = F.col("l_orderkey") * 7 + F.col("l_linenumber")
    li = _simple_changelog(
        cat.table("lineitem"),
        ["l_partkey", "l_suppkey"],
        "l_extendedprice",
        upd=m % 9 == 4,
        dele=m % 13 == 6,
        upd_value=round2(F.col("l_extendedprice") * 1.1),
    )
    pt = _simple_changelog(
        cat.table("part"),
        ["p_partkey", "p_brand"],
        "p_retailprice",
        upd=F.col("p_partkey") % 5 == 2,
        dele=F.col("p_partkey") % 11 == 3,
        upd_value=round2(F.col("p_retailprice") + 50.0),
    ).withColumnRenamed("p_partkey", "l_partkey").withColumnRenamed(
        "p_brand", "brand"
    )
    sp = _simple_changelog(
        cat.table("supplier"),
        ["s_suppkey"],
        "s_acctbal",
        upd=F.col("s_suppkey") % 4 == 1,
        dele=F.col("s_suppkey") % 7 == 5,
        upd_value=round2(F.col("s_acctbal") + 25.0),
    ).withColumnRenamed("s_suppkey", "l_suppkey")
    return retract_join3_aggregate(
        li, pt, sp, "l_partkey", "l_suppkey", ["brand"]
    )


# ---------------------------------------------------------------------------
# KMV distinct-overlap sketch — audience overlap without the distinct-
# pair join. The 48-bit md5 hash replays exactly in DuckDB, so the
# oracle re-derives the ENTIRE synopsis and estimator (the CMS
# discipline: approximate answers, exact oracles).

_KMV_K = 64
_KMV_SPACE = "281474976710656.0"  # 2^48 as a double literal
_KMV_UNION_EST = (
    f"CASE WHEN st.ku < {_KMV_K} THEN CAST(st.ku AS DOUBLE) "
    f"ELSE CAST(st.ku - 1 AS DOUBLE) / (CAST(st.hk AS DOUBLE) / {_KMV_SPACE}) END"
)

_KMV_ORACLE = f"""
    WITH hv AS (
      SELECT DISTINCT event_type AS seg,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS v
      FROM events),
    rk AS (SELECT seg, v, row_number() OVER (PARTITION BY seg ORDER BY v) AS rn
           FROM hv),
    sk AS (SELECT seg, v FROM rk WHERE rn <= {_KMV_K}),
    segs AS (SELECT DISTINCT seg FROM sk),
    pr AS (SELECT a.seg AS seg_a, b.seg AS seg_b
           FROM segs a JOIN segs b ON a.seg < b.seg),
    u0 AS (SELECT DISTINCT p.seg_a, p.seg_b, s.v
           FROM pr p JOIN sk s ON s.seg = p.seg_a OR s.seg = p.seg_b),
    ur AS (SELECT seg_a, seg_b, v,
                  row_number() OVER (PARTITION BY seg_a, seg_b ORDER BY v) AS rn
           FROM u0),
    L AS (SELECT seg_a, seg_b, v FROM ur WHERE rn <= {_KMV_K}),
    st AS (SELECT seg_a, seg_b, count(*) AS ku, max(v) AS hk
           FROM L GROUP BY 1, 2),
    nc AS (SELECT l.seg_a, l.seg_b, count(*) AS n_common
           FROM L l
           JOIN sk sa ON sa.seg = l.seg_a AND sa.v = l.v
           JOIN sk sb ON sb.seg = l.seg_b AND sb.v = l.v
           GROUP BY 1, 2)
    SELECT st.seg_a, st.seg_b, CAST(st.ku AS BIGINT) AS ku,
           round({_KMV_UNION_EST}, 6) AS union_est,
           round(CAST(COALESCE(nc.n_common, 0) AS DOUBLE)
                 / CAST(st.ku AS DOUBLE), 9) AS jaccard_est,
           round((CAST(COALESCE(nc.n_common, 0) AS DOUBLE)
                 / CAST(st.ku AS DOUBLE)) * ({_KMV_UNION_EST}), 6) AS inter_est
    FROM st LEFT JOIN nc
      ON nc.seg_a = st.seg_a AND nc.seg_b = st.seg_b
    """


@register(
    "segment_overlap_kmv",
    _KMV_ORACLE,
    "Audience overlap between every event-type segment pair from KMV "
    "synopses (Beyer et al. SIGMOD 2007): k smallest distinct 48-bit "
    "md5 hashes per segment, built in one Arrow pass with HARD-bounded "
    "per-partition state (≤|segments|·k values regardless of input "
    "size) + one shuffle of P·|segments|·k partial rows; union/Jaccard/"
    "intersection estimated from the merged k-min, with exact fallback "
    "when a segment is exhaustive. The distinct-pair join this "
    "replaces shuffles every (segment,user) pair at 100 TB; the "
    "synopsis is metadata-sized, mergeable across days, and the "
    "oracle replays it EXACTLY (operators/kmv.py).",
)
def q_segment_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.kmv import kmv_overlap, kmv_sketch

    ev = Catalog(spark, sf_dir).table("events")
    return kmv_overlap(kmv_sketch(ev, "event_type", "user_id", k=_KMV_K), k=_KMV_K)


@register(
    "cdc_retract_minmax",
    """
    WITH live AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 7 = 3
                  THEN floor((o_totalprice * 1.1) * 100 + 0.5) / 100
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE o_orderkey % 11 <> 5)
    SELECT o_orderpriority,
           min(CAST(floor(price * 100 + 0.5) AS BIGINT)) / 100.0 AS min_price,
           max(CAST(floor(price * 100 + 0.5) AS BIGINT)) / 100.0 AS max_price,
           CAST(count(*) AS BIGINT) AS net_rows
    FROM live
    GROUP BY o_orderpriority
    """,
    "Retractable MIN/MAX over the CDC changelog — the aggregate a "
    "signed scalar CANNOT maintain (a deleted maximum's replacement "
    "is unknowable from an accumulator). The standard IVM design "
    "(Flink's retractable min/max): a SUPPORT TABLE of per-"
    "(group, value) live multiplicities — each change event "
    "contributes ≤2 (value, ±1) entries in the same single scan, one "
    "(group,value) groupBy builds the table, extremes over "
    "multiplicity>0 finish it. State is bounded by LIVE distinct "
    "values per group (retired values cancel to 0), the minimum any "
    "exact retractable extreme can hold. Oracle = full latest-state "
    "recompute (operators/retraction.py::retract_minmax).",
)
def q_cdc_retract_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.retraction import retract_minmax

    orders = Catalog(spark, sf_dir).table("orders")
    return retract_minmax(_orders_changelog(orders), ["o_orderpriority"])


@register(
    "stream_segment_overlap_kmv",
    _KMV_ORACLE,
    "Streaming twin of segment_overlap_kmv — continuous audience-"
    "overlap maintenance: each micro-batch commits one BOUNDED "
    "partial synopsis (≤|segments|·k rows whatever the batch size, "
    "K5-idempotent by batchId); the report folds committed partials "
    "by the KMV merge (set-union then k-min — idempotent, "
    "commutative, associative), so batch boundaries, replays, and "
    "reordered events cannot change the sketch and the drained "
    "result equals the batch oracle EXACTLY. At-rest state is "
    "synopsis-sized and compactable by the same merge "
    "(streaming/synopsis.py).",
)
def q_stream_segment_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.synopsis import streaming_kmv_overlap

    events = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_kmv_")
    return detach_and_cleanup(
        streaming_kmv_overlap(
            spark,
            events,
            "event_type",
            "user_id",
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            k=_KMV_K,
        ),
        work,
    )


# ---------------------------------------------------------------------------
# Bootstrap CI — deterministic Poisson resampling (Chamandy et al.).

_POIS = (
    "CASE WHEN u < 0.36787944117144233 THEN 0 "
    "WHEN u < 0.7357588823428847 THEN 1 "
    "WHEN u < 0.9196986029286058 THEN 2 "
    "WHEN u < 0.9810118431238462 THEN 3 "
    "WHEN u < 0.9963401531726563 THEN 4 "
    "WHEN u < 0.9994058151824183 THEN 5 "
    "WHEN u < 0.9999167588507119 THEN 6 ELSE 7 END"
)


@register(
    "event_value_bootstrap_ci",
    f"""
    WITH base AS (
      SELECT event_type AS grp, event_id AS id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    est AS (SELECT grp, CAST(sum(vc) AS DOUBLE) / count(*) AS est_mean,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM base GROUP BY grp),
    reps AS (SELECT b.grp, b.vc, 2 * r.pair + s.sl AS rep,
                    CAST(('0x' || substr(md5(CAST(b.id AS VARCHAR) || ':'
                        || CAST(r.pair AS VARCHAR)), 1 + 12 * s.sl, 12))
                        AS BIGINT)
                      / 281474976710656.0 AS u
             FROM base b
             CROSS JOIN (SELECT unnest(range(0, 16)) AS pair) r
             CROSS JOIN (SELECT unnest(range(0, 2)) AS sl) s),
    wt AS (SELECT grp, rep, vc, {_POIS} AS w FROM reps),
    rm AS (SELECT grp, rep, CAST(sum(w * vc) AS DOUBLE) / sum(w) AS mean_b
           FROM wt GROUP BY grp, rep HAVING sum(w) > 0),
    rk AS (SELECT grp, mean_b,
                  row_number() OVER (PARTITION BY grp
                                     ORDER BY mean_b, rep) AS rk,
                  count(*) OVER (PARTITION BY grp) AS cnt
           FROM rm),
    ci AS (SELECT grp,
                  min(CASE WHEN rk = least(2, cnt) THEN mean_b END) AS ci_lo,
                  min(CASE WHEN rk = least(31, cnt) THEN mean_b END) AS ci_hi
           FROM rk WHERE rk IN (least(2, cnt), least(31, cnt)) GROUP BY grp)
    SELECT e.grp, round(e.est_mean / 100.0, 9) AS est_mean,
           round(ci.ci_lo / 100.0, 9) AS ci_lo,
           round(ci.ci_hi / 100.0, 9) AS ci_hi, e.n_rows
    FROM est e JOIN ci USING (grp)
    """,
    "Bootstrap percentile CI of the mean event value per type, by "
    "deterministic Poisson(1) resampling (Chamandy et al. 2012): "
    "each row emits its B=32 replicate multiplicities locally "
    "(inverse-CDF over a 48-bit slice of md5(id:pair), each digest's "
    "two halves seeding two replicates — half the hash work, exactly "
    "SQL-replayable), so the whole uncertainty estimate is a B-fold "
    "map-side fan-out into ONE partial-agg'd shuffle of B·|groups| "
    "rows plus a 32-value-per-group finishing window — no resample "
    "materialization, no driver loop. Values ride as integer cents "
    "so weighted sums are association-order-free "
    "(operators/bootstrap.py).",
)
def q_event_value_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.bootstrap import bootstrap_mean_ci

    ev = Catalog(spark, sf_dir).table("events")
    return bootstrap_mean_ci(ev, "event_type", "event_id", "value")


_LINKAGE_ORACLE = """
    WITH twin AS (
      SELECT c_custkey AS rec_key,
             'CUST ' || substr(c_name, 10, 9) AS name,
             c_nationkey AS nationkey,
             CASE WHEN c_custkey % 16 = 9
                  THEN (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 2
                        + 17) / 100.0
                  WHEN c_custkey % 8 = 1
                  THEN (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 1)
                       / 100.0
                  ELSE c_acctbal END AS acctbal,
             c_mktsegment AS mktsegment
      FROM customer WHERE c_custkey % 4 = 1),
    base AS (
      SELECT c_custkey AS rec_key, c_name AS name,
             c_nationkey AS nationkey, c_acctbal AS acctbal,
             c_mktsegment AS mktsegment
      FROM customer),
    pairs AS (
      SELECT a.rec_key AS lk, b.rec_key AS rk, a.nationkey,
             (CASE WHEN regexp_extract(a.name, '(\\d+)\\s*$', 1)
                        = regexp_extract(b.name, '(\\d+)\\s*$', 1)
                   THEN 24 ELSE 0 END)
             + (CASE WHEN abs(CAST(floor(a.acctbal * 100 + 0.5) AS BIGINT)
                              - CAST(floor(b.acctbal * 100 + 0.5) AS BIGINT))
                          <= 2 THEN 16 ELSE 0 END)
             - (CASE WHEN a.mktsegment <> b.mktsegment THEN 8 ELSE 0 END)
               AS score
      FROM base a JOIN twin b
        ON a.nationkey = b.nationkey
       AND right(regexp_extract(a.name, '(\\d+)\\s*$', 1), 4)
           = right(regexp_extract(b.name, '(\\d+)\\s*$', 1), 4))
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN score >= 32 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_links,
           CAST(sum(CASE WHEN score >= 32 AND lk = rk THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true_links
    FROM pairs
    GROUP BY nationkey
    """


@register(
    "customers_record_linkage",
    _LINKAGE_ORACLE,
    "Record linkage (entity resolution, Fellegi–Sunter 1969) between "
    "the customer table and a deterministic dirty twin feed "
    "(surface-mangled names, one-cent balance typos, and a "
    "scrambled-balance tier the matcher MUST miss): BLOCKING on "
    "(nation, last-4 of the name's digit tail) turns the n² record "
    "cross-join into an equi-join whose cost is the sum of block-size "
    "products — the same bucket-join discipline as the MinHash dedup "
    "family, applied to structured records; then integer log-odds "
    "agreement weights (full name tail 24, balance-within-2-cents 16, "
    "segment-mismatch −8, threshold 32 — name alone does not clear "
    "it) score each candidate in pure codegen arithmetic. "
    "Ground-truth origin keys ride out-of-band, so the per-nation "
    "report (candidates, links, true links) measures precision AND "
    "the scrambled tier's false negatives honestly; integer weights "
    "make every decision SQL-replayable (operators/linkage.py).",
)
def q_customers_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.linkage import (
        dirty_twin,
        link_candidates,
    )

    cust = Catalog(spark, sf_dir).table("customer")
    base = cust.select(
        F.col("c_custkey").alias("rec_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    twin = dirty_twin(cust).withColumnRenamed("origin_key", "rec_key")
    return (
        link_candidates(base, twin)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("is_link"), 1).otherwise(0))
            .cast("long")
            .alias("n_links"),
            F.sum(
                F.when(
                    F.col("is_link")
                    & (F.col("left_key") == F.col("right_key")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_true_links"),
        )
    )


@register(
    "stream_customers_record_linkage",
    _LINKAGE_ORACLE,
    "Streaming twin of customers_record_linkage — the deployment "
    "shape entity resolution actually runs in: the base registry is "
    "at rest, the dirty feed ARRIVES, and every new record is "
    "block-matched as it lands (per-batch cost ∝ batch-side blocking "
    "fan-out, never |base|·batch). Per-nation partial counts commit "
    "idempotently by batchId; counts are additive and each feed "
    "record lands in exactly one batch, so the drained fold equals "
    "the all-at-once batch report — the oracle is the same full "
    "latest-state match (streaming/linkage.py).",
)
def q_stream_customers_record_linkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from realtime0523_spark.operators.linkage import dirty_twin
    from realtime0523_spark.streaming.linkage import streaming_record_linkage
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    cat = Catalog(spark, sf_dir)
    base = cat.table("customer").select(
        F.col("c_custkey").alias("rec_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    feed = dirty_twin(stream_table(spark, sf_dir, "customer")).withColumnRenamed(
        "origin_key", "rec_key"
    )
    work = tempfile.mkdtemp(prefix="stream_linkage_")
    return detach_and_cleanup(
        streaming_record_linkage(
            spark,
            base,
            feed,
            out_dir=f"{work}/links",
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


def _ddsketch_sql() -> str:
    import math

    from realtime0523_spark.operators.ddsketch import DD_GAMMA, ZERO_BUCKET

    lg = round(math.log(DD_GAMMA), 9)
    g1 = DD_GAMMA + 1.0
    return f"""
    WITH base AS (
      SELECT event_type AS grp,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    sk AS (
      SELECT grp,
             -- mirror dd_bucket's negative-raise (round-9 advice): the
             -- one-sided sketch has no bucket for a negative metric,
             -- and impl and oracle must share the full input domain
             CASE WHEN vc < 0 THEN CAST(error('dd_bucket: negative cents '
                                             || vc) AS BIGINT)
                  WHEN vc = 0 THEN {ZERO_BUCKET}
                  ELSE CAST(floor(round(ln(CAST(vc AS DOUBLE)), 9) / {lg!r})
                       AS BIGINT) END AS bucket,
             count(*) AS n
      FROM base GROUP BY 1, 2),
    c AS (
      SELECT grp, bucket, n,
             sum(n) OVER (PARTITION BY grp ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY grp) AS total
      FROM sk),
    q(quantile, num, den) AS (VALUES ('p50', 1, 2), ('p95', 19, 20),
                                     ('p99', 99, 100)),
    hit AS (
      SELECT grp, quantile, total, min(bucket) AS bucket
      FROM c CROSS JOIN q
      WHERE cum >= ((total - 1) * num) // den + 1
      GROUP BY 1, 2, 3)
    SELECT grp, quantile, CAST(total AS BIGINT) AS n_rows,
           round(CASE WHEN bucket = {ZERO_BUCKET} THEN 0.0
                      ELSE round(2.0 * pow({DD_GAMMA!r},
                                           CAST(bucket + 1 AS DOUBLE)) / {g1!r},
                                 9) END / 100.0, 9) AS est_value
    FROM hit
    """


@register(
    "event_value_ddsketch",
    _ddsketch_sql(),
    "DDSketch relative-error quantiles (Masson et al. VLDB 2019 — "
    "the production metrics sketch): per event type, p50/p95/p99 "
    "within ~1% relative error from BUCKET COUNTS alone — the sketch "
    "is groupBy(group, floor(log_γ cents)).count(), ONE partial-"
    "agg'd shuffle of |groups|·|buckets| rows, and it MERGES by "
    "plain addition (across partitions, time slices, micro-batches). "
    "This is the quantile the exact family cannot give at 100 TB "
    "without a per-group sort. Bucket index divides two 9-dp-"
    "quantized logarithms (the BM25-idf discipline) so the oracle "
    "replays the ENTIRE sketch and estimator exactly; the accuracy "
    "contract (rel err ≤ (γ−1)/(γ+1)) is test-asserted against exact "
    "quantiles (operators/ddsketch.py).",
)
def q_event_value_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.ddsketch import dd_quantiles, dd_sketch

    ev = Catalog(spark, sf_dir).table("events")
    return dd_quantiles(
        dd_sketch(ev, "event_type", "value"),
        [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)],
    )


@register(
    "stream_event_value_ddsketch",
    _ddsketch_sql(),
    "Streaming twin of event_value_ddsketch — continuous latency/"
    "value percentiles, the monitoring staple: each micro-batch "
    "commits one bounded partial sketch (≤|groups|·|buckets| rows "
    "whatever the batch size, idempotent by batchId); the reader "
    "folds partials by plain addition — DDSketch merge IS bucket-"
    "count addition, so batch boundaries, replays, and late events "
    "cannot change the sketch — and the drained quantiles equal the "
    "batch oracle bit-for-bit (streaming/synopsis.py).",
)
def q_stream_event_value_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.synopsis import streaming_dd_quantiles

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_ddsketch_")
    return detach_and_cleanup(
        streaming_dd_quantiles(
            spark,
            ev,
            "event_type",
            "value",
            [("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)],
            out_dir=f"{work}/sketch",
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


VALUE_DRIFT_BUCKETS = 640  # log-bucket universe (zero-bin at 0)


def _value_drift_sql() -> str:
    import math

    from realtime0523_spark.operators.ddsketch import DD_GAMMA

    B = VALUE_DRIFT_BUCKETS
    lg = round(math.log(DD_GAMMA), 9)
    pa = f"(CAST(coalesce(n_a, 0) + 1 AS DOUBLE) / CAST(coalesce(t_a, 0) + {B} AS DOUBLE))"
    pb = f"(CAST(coalesce(n_b, 0) + 1 AS DOUBLE) / CAST(coalesce(t_b, 0) + {B} AS DOUBLE))"
    r9s = lambda x: f"round({x}, 9)"  # noqa: E731
    lna, lnb = r9s(f"ln({pa})"), r9s(f"ln({pb})")
    return f"""
    WITH base AS (
      SELECT event_type AS domain,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
             CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS half
      FROM events),
    bk AS (
      SELECT domain, half,
             -- negative-raise mirror of dd_bucket (round-9 advice)
             CASE WHEN vc < 0 THEN CAST(error('dd_bucket: negative cents '
                                              || vc) AS BIGINT)
                  WHEN vc = 0 THEN 0
                  ELSE 1 + least(CAST(floor(round(ln(CAST(vc AS DOUBLE)), 9)
                                             / {lg!r}) AS BIGINT), {B - 2})
             END AS bucket
      FROM base),
    csa AS (SELECT domain, bucket, count(*) AS n_a FROM bk
            WHERE half = 0 GROUP BY 1, 2),
    csb AS (SELECT domain, bucket, count(*) AS n_b FROM bk
            WHERE half = 1 GROUP BY 1, 2),
    ta AS (SELECT domain, sum(n_a) AS t_a FROM csa GROUP BY domain),
    tb AS (SELECT domain, sum(n_b) AS t_b FROM csb GROUP BY domain),
    grid AS (SELECT domain, bucket
             FROM (SELECT domain FROM ta UNION SELECT domain FROM tb)
             CROSS JOIN range(0, {B}) r(bucket)),
    g AS (SELECT gr.domain,
                 coalesce(a.n_a, 0) AS n_a, coalesce(b.n_b, 0) AS n_b,
                 coalesce(ta.t_a, 0) AS t_a, coalesce(tb.t_b, 0) AS t_b
          FROM grid gr
          LEFT JOIN csa a ON a.domain = gr.domain AND a.bucket = gr.bucket
          LEFT JOIN csb b ON b.domain = gr.domain AND b.bucket = gr.bucket
          LEFT JOIN ta ON ta.domain = gr.domain
          LEFT JOIN tb ON tb.domain = gr.domain),
    kl AS (SELECT domain,
                  CAST(max(t_a) AS BIGINT) AS n_terms_a,
                  CAST(max(t_b) AS BIGINT) AS n_terms_b,
                  {r9s(f'sum({pa} * ({lna} - {lnb}))')} AS kl_ab,
                  {r9s(f'sum({pb} * ({lnb} - {lna}))')} AS kl_ba
           FROM g GROUP BY domain)
    SELECT domain, n_terms_a, n_terms_b, kl_ab, kl_ba,
           round(kl_ab + kl_ba, 9) AS jeffreys
    FROM kl
    """


@register(
    "events_value_drift",
    _value_drift_sql(),
    "VALUE-distribution drift per event type between the month's two "
    "halves — the PSI-style alarm a metric monitor fires when a KPI's "
    "distribution (not just its mean) shifts: values land in DDSketch "
    "log buckets (≈1% relative width, zero-bin at 0), and the two "
    "profiles feed the SAME smoothed-KL core as the corpus drift "
    "monitor (llm/pipeline.py::drift_from_counts) — composition, not "
    "reimplementation. Emits both KL directions plus their sum "
    "(Jeffreys divergence, the symmetric PSI analog). Two "
    "partial-agg'd bucket-count shuffles; everything after runs on "
    "|types|×buckets meta-sized rows.",
)
def q_events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.stattests import (
        value_drift_cells,
        value_drift_from_cells,
    )

    ev = Catalog(spark, sf_dir).table("events")
    return value_drift_from_cells(
        value_drift_cells(ev, VALUE_DRIFT_BUCKETS), VALUE_DRIFT_BUCKETS
    )


@register(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    p AS (SELECT prev_type AS src, event_type AS dst, count(*) AS n_trans
          FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT src, dst, CAST(n_trans AS BIGINT) AS n_trans,
           floor((CAST(n_trans AS DOUBLE)
                  / sum(n_trans) OVER (PARTITION BY src))
                 * 1000000000 + 0.5) / 1000000000 AS p_trans
    FROM p
    """,
    "Markov transition matrix over per-user event paths (the "
    "product-analytics path-analysis staple): one user-keyed lag "
    "window pairs each event with its predecessor (deterministic "
    "(ts, event_id) order), a partial-agg'd groupBy collapses to "
    "|types|^2 transition counts, and the row-normalized transition "
    "probability is a window over that metadata-sized matrix. At "
    "100 TB the only data-sized cost is the one sessionize-shaped "
    "user shuffle; everything after is |types|^2.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).table("events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    p = F.col("n_trans").cast("double") / F.sum("n_trans").over(
        W.partitionBy("src")
    )
    return counts.select(
        "src",
        "dst",
        F.col("n_trans").cast("long").alias("n_trans"),
        (F.floor(p * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias("p_trans"),
    )


@register(
    "event_value_outliers",
    """
    WITH c AS (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
               FROM events),
    med AS (SELECT event_type, quantile_cont(vc, 0.5) AS medc
            FROM c GROUP BY 1),
    dev AS (SELECT c.event_type, c.vc, m.medc, abs(c.vc - m.medc) AS ad
            FROM c JOIN med m USING (event_type)),
    mad AS (SELECT event_type, medc, quantile_cont(ad, 0.5) AS madc
            FROM dev GROUP BY 1, 2)
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN d.ad > 3 * m.madc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           m.medc / 100.0 AS med_value,
           m.madc / 100.0 AS mad_value
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.medc, m.madc
    """,
    "Robust per-group outlier screen (median/MAD — the estimator a "
    "mean/stddev z-score can't give you under the very outliers it "
    "hunts): per event type, events whose |value − median| exceeds "
    "3×MAD. ALL arithmetic in integer cents — interpolated medians "
    "land on exact .5/.25 multiples, so the cross-engine quantile "
    "comparison is bit-exact rather than FP-lucky. Three passes "
    "(median, MAD, flag), each a map + broadcast join of a "
    "|types|-sized stat table; the documented 100 TB swap-in is "
    "approx_percentile per pass, same shape.",
)
def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    med = c.groupBy("event_type").agg(
        F.percentile("vc", F.lit(0.5)).alias("medc")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("vc") - F.col("medc"))
    )
    mad = dev.groupBy("event_type", "medc").agg(
        F.percentile("ad", F.lit(0.5)).alias("madc")
    )
    return (
        dev.join(
            F.broadcast(mad.select("event_type", "madc")), "event_type"
        )
        .groupBy("event_type", "medc", "madc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("madc"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_outliers",
            (F.col("medc") / F.lit(100.0)).alias("med_value"),
            (F.col("madc") / F.lit(100.0)).alias("mad_value"),
        )
    )


_TREND_ORACLE = """
    WITH b AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      FROM events),
    s AS (SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(x) AS DOUBLE) AS sx,
                 CAST(sum(y) AS DOUBLE) AS sy,
                 CAST(sum(x * y) AS DOUBLE) AS sxy,
                 CAST(sum(x * x) AS DOUBLE) AS sxx
          FROM b GROUP BY event_type)
    SELECT event_type, n_rows,
           round(((n_rows * sxy - sx * sy)
                  / nullif(n_rows * sxx - sx * sx, 0.0)) / 100.0, 9)
             AS slope_per_day,
           round(((sy - ((n_rows * sxy - sx * sy)
                         / nullif(n_rows * sxx - sx * sx, 0.0)) * sx)
                  / n_rows) / 100.0, 9) AS intercept
    FROM s
    """


@register(
    "events_trend_slope",
    _TREND_ORACLE,
    "Per-type OLS daily trend of event value (the metric-monitoring "
    "staple: is this KPI drifting, and how fast): closed-form slope "
    "and intercept from the five classical sums (n, Σx, Σy, Σxy, "
    "Σx²) — ONE map + one partial-agg'd shuffle of |types| rows, no "
    "window, no second pass, embarrassingly scalable. x rides as "
    "integer days since the corpus epoch and y as integer cents, so "
    "the sums are exact longs and the only floating point is the "
    "final per-group combination — identical IEEE expressions on "
    "both engines. A zero-variance group (single day) yields NULL "
    "slope via nullif, not a crash.",
)
def q_events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    b = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n = F.col("n_rows").cast("double")
    den = F.nullif(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0))
    slope_c = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    return s.select(
        "event_type",
        "n_rows",
        F.round(slope_c / F.lit(100.0), 9).alias("slope_per_day"),
        F.round(
            ((F.col("sy") - slope_c * F.col("sx")) / n) / F.lit(100.0), 9
        ).alias("intercept"),
    )


@register(
    "stream_events_trend_slope",
    _TREND_ORACLE,
    "Streaming twin of events_trend_slope — the continuously-updated "
    "KPI slope a metric monitor actually wants: the five OLS sums are "
    "associative exact longs, so each micro-batch commits |types| "
    "partial rows (map-side combined, idempotent by batchId) and the "
    "drained fold finishes the identical IEEE slope/intercept "
    "combination on identical integer sums — bit-for-bit the batch "
    "answer, immune to batch boundaries, replays, and late events "
    "(streaming/regression.py).",
)
def q_stream_events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.regression import streaming_trend_slope
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast(
        "long"
    )
    y = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    work = tempfile.mkdtemp(prefix="stream_trend_")
    return detach_and_cleanup(
        streaming_trend_slope(
            spark,
            ev,
            "event_type",
            x,
            y,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


_CORR_COLS = [
    ("l_quantity", "q"),
    ("l_extendedprice", "p"),
    ("l_discount", "d"),
    ("l_tax", "t"),
]
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_matrix_sql() -> str:
    scaled = ", ".join(
        f"CAST(floor({col} * 100 + 0.5) AS BIGINT) AS {al}"
        for col, al in _CORR_COLS
    )
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for _, al in _CORR_COLS:
        sums.append(f"CAST(sum(CAST({al} AS HUGEINT)) AS DOUBLE) AS s_{al}")
    for (_, a) in _CORR_COLS:
        sums.append(
            f"CAST(sum(CAST({a} AS HUGEINT) * {a}) AS DOUBLE) AS s_{a}{a}"
        )
    for (_, a), (_, b) in _CORR_PAIRS:
        sums.append(
            f"CAST(sum(CAST({a} AS HUGEINT) * {b}) AS DOUBLE) AS s_{a}{b}"
        )
    rows = []
    for (ca, a), (cb, b) in _CORR_PAIRS:
        num = f"(CAST(n AS DOUBLE) * s_{a}{b} - s_{a} * s_{b})"
        den = (
            f"sqrt((CAST(n AS DOUBLE) * s_{a}{a} - s_{a} * s_{a})"
            f" * (CAST(n AS DOUBLE) * s_{b}{b} - s_{b} * s_{b}))"
        )
        rows.append(
            f"SELECT '{ca}' AS col_x, '{cb}' AS col_y, n AS n_rows, "
            f"round({num} / nullif({den}, 0.0), 9) AS corr FROM s"
        )
    return (
        f"WITH b AS (SELECT {scaled} FROM lineitem), "
        f"s AS (SELECT {', '.join(sums)} FROM b) "
        + " UNION ALL ".join(rows)
    )


@register(
    "lineitem_corr_matrix",
    _corr_matrix_sql(),
    "Pearson correlation matrix across the four lineitem measures "
    "(quantity, extendedprice, discount, tax) — the feature-"
    "redundancy screen every profiling pass wants next to the "
    "per-column stats. ONE scan, ONE partial-agg'd reduce to a "
    "single 15-value row (n + 4 sums + 4 sum-of-squares + 6 cross "
    "sums), then the 6 pairwise correlations unpivot from that row "
    "with a stack projection — never a branch per pair, never a "
    "second pass (the lineitem_column_stats discipline applied to "
    "co-moments). Inputs ride as integer cents so every sum is "
    "EXACT (decimal(38) on Spark, HUGEINT in the oracle — the int64 "
    "overflow at petabyte row counts is designed out); the only "
    "floating point is the final closed-form combination, the "
    "identical IEEE expression in both engines, rounded to 9 dp. "
    "Pearson r is scale-invariant so the cents scaling is exact-"
    "equivalent. A zero-variance column yields NULL via nullif, "
    "not a crash.",
)
def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    b = li.select(
        *[
            F.floor(F.col(col) * 100 + F.lit(0.5))
            .cast("decimal(20,0)")
            .alias(al)
            for col, al in _CORR_COLS
        ]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for _, al in _CORR_COLS:
        aggs.append(F.sum(F.col(al)).cast("double").alias(f"s_{al}"))
        aggs.append(
            F.sum(F.col(al) * F.col(al)).cast("double").alias(f"s_{al}{al}")
        )
    for (_, a), (_, bb) in _CORR_PAIRS:
        aggs.append(
            F.sum(F.col(a) * F.col(bb)).cast("double").alias(f"s_{a}{bb}")
        )
    one = b.agg(*aggs)
    nd = F.col("n").cast("double")
    corr_cols = []
    for (_, a), (_, bb) in _CORR_PAIRS:
        num = nd * F.col(f"s_{a}{bb}") - F.col(f"s_{a}") * F.col(f"s_{bb}")
        den = F.sqrt(
            (nd * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (nd * F.col(f"s_{bb}{bb}") - F.col(f"s_{bb}") * F.col(f"s_{bb}"))
        )
        corr_cols.append(
            F.round(num / F.nullif(den, F.lit(0.0)), 9).alias(f"c_{a}{bb}")
        )
    scored = one.select(F.col("n").alias("n_rows"), *corr_cols)
    stack_args = ", ".join(
        f"'{ca}', '{cb}', c_{a}{b}" for (ca, a), (cb, b) in _CORR_PAIRS
    )
    return scored.select(
        F.expr(
            f"stack({len(_CORR_PAIRS)}, {stack_args}) as (col_x, col_y, corr)"
        ),
        "n_rows",
    ).select("col_x", "col_y", "n_rows", "corr")


_RESAMPLE_START = "2024-01-01 00:00:00"
_RESAMPLE_END = "2024-01-30 23:00:00"

_RESAMPLE_ORACLE = f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT t.event_type, gs.hour
      FROM (SELECT DISTINCT event_type FROM h) t,
           (SELECT unnest(generate_series(
                     TIMESTAMP '{_RESAMPLE_START}',
                     TIMESTAMP '{_RESAMPLE_END}',
                     INTERVAL 1 HOUR)) AS hour) gs),
    j AS (
      SELECT g.event_type, g.hour,
             coalesce(h.n_events, 0) AS n_events,
             round(CAST(h.cents AS DOUBLE)
                   / CAST(h.n_events AS DOUBLE) / 100.0, 9) AS avg_value
      FROM g LEFT JOIN h USING (event_type, hour))
    SELECT event_type, hour, n_events, avg_value,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_avg
    FROM j
    """


@register(
    "events_resample_ffill",
    _RESAMPLE_ORACLE,
    "Calendar-aligned hourly resample of the event stream with "
    "forward-filled gaps — the time-series regularization every "
    "downstream model and dashboard needs (a missing hour must be an "
    "explicit zero-count row carrying the last observed average, not "
    "an absent row silently skipped). The corpus collapses to "
    "|types|x|hours| aggregate rows in ONE partial-agg'd pass and is "
    "checkpoint-materialized before its two-way reuse (type list + "
    "join probe — the triangle lesson); the dense hour grid is "
    "GENERATED per type by exploding a sequence() literal — never a "
    "cross join (nested-loop is banned repo-wide) and never a scan "
    "of anything corpus-sized. The forward-fill window runs on the "
    "metadata-sized grid (720 rows per type regardless of corpus "
    "size), partitioned by type — no single-task stage. Averages "
    "ride as exact integer cents until the final 9-dp division; "
    "hours before a type's first observation keep NULL filled_avg "
    "(there is nothing to carry), matching IGNORE NULLS semantics "
    "in both engines.",
)
def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from realtime0523_spark.llm.clusters import _ckpt_tools

    ev = Catalog(spark, sf_dir).table("events")
    ckpt, release = _ckpt_tools(ev)
    hourly, _ = ckpt(
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    grid = (
        hourly.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(_RESAMPLE_START).cast("timestamp"),
                    F.lit(_RESAMPLE_END).cast("timestamp"),
                    F.expr("interval 1 hour"),
                )
            ).alias("hour"),
        )
    )
    j = grid.join(hourly, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(
            F.col("cents").cast("double")
            / F.col("n_events").cast("double")
            / F.lit(100.0),
            9,
        ).alias("avg_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "hour",
        "n_events",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
    )


ASSOC_MIN_SUPPORT = 2
ASSOC_TOP_N = 100

_ASSOC_ORACLE = f"""
    WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
               FROM lineitem),
    supp AS (SELECT it, CAST(count(*) AS BIGINT) AS supp
             FROM b GROUP BY it),
    freq AS (SELECT * FROM supp WHERE supp >= {ASSOC_MIN_SUPPORT}),
    n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
    bf AS (SELECT b.* FROM b WHERE b.it IN (SELECT it FROM freq)),
    pairs AS (
      SELECT a.it AS ia, c.it AS ib,
             CAST(count(*) AS BIGINT) AS support_pairs
      FROM bf a JOIN bf c USING (bk) WHERE a.it < c.it
      GROUP BY 1, 2 HAVING count(*) >= {ASSOC_MIN_SUPPORT}),
    rules AS (
      SELECT ia AS antecedent, ib AS consequent, support_pairs FROM pairs
      UNION ALL
      SELECT ib AS antecedent, ia AS consequent, support_pairs FROM pairs)
    SELECT r.antecedent, r.consequent, r.support_pairs,
           round(CAST(r.support_pairs AS DOUBLE)
                 / CAST(fa.supp AS DOUBLE), 9) AS confidence,
           round((CAST(r.support_pairs AS DOUBLE)
                  * CAST(n.n_baskets AS DOUBLE))
                 / (CAST(fa.supp AS DOUBLE) * CAST(fb.supp AS DOUBLE)),
                 9) AS lift
    FROM rules r
    JOIN freq fa ON fa.it = r.antecedent
    JOIN freq fb ON fb.it = r.consequent
    CROSS JOIN n
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {ASSOC_TOP_N}
    """


@register(
    "parts_association_rules",
    _ASSOC_ORACLE,
    "Market-basket association rules over order baskets (Agrawal & "
    "Srikant apriori support/confidence; lift per Brin et al.) — "
    "'what sells together beyond chance', the cross-sell primitive "
    "the reference's hot-goods SPU sums only hint at. The distinct "
    "basket table materializes ONCE and feeds both the support "
    "aggregate and the pair join (the triangle lesson); items below "
    f"min_support={ASSOC_MIN_SUPPORT} are semi-joined out BEFORE the "
    "quadratic step (apriori pruning), so the per-basket fan-out "
    "runs on frequent sub-baskets only and is bounded by basket "
    "size squared — never |items|². Supports re-attach by broadcast "
    "hash equi-joins; the scalar basket count is a 1-row collect off "
    "the checkpointed basket table (the BM25 legality class — a lazy "
    "1-row join constant-folds to the banned nested loop). Counts are "
    "exact longs; confidence and lift are the identical IEEE "
    "division in both engines, 9-dp rounded, and the top-"
    f"{ASSOC_TOP_N} ranking is totally ordered (lift desc, "
    "antecedent, consequent) so the limit boundary is deterministic "
    "(operators/association.py).",
)
def q_parts_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.association import association_rules

    li = Catalog(spark, sf_dir).table("lineitem")
    return association_rules(
        li.select(
            F.col("l_orderkey").alias("basket_id"),
            F.col("l_partkey").alias("item"),
        ),
        min_support=ASSOC_MIN_SUPPORT,
        top_n=ASSOC_TOP_N,
    )


BFS_ROUNDS = 3
BFS_SEED_BRAND = "Brand#13"


def _bfs_sql(rounds: int, brand: str) -> str:
    ctes = [
        """und AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
             greatest(a.l_partkey, b.l_partkey) AS hi
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey)""",
        """e AS (SELECT lo AS src, hi AS dst FROM und
         UNION ALL SELECT hi AS src, lo AS dst FROM und)""",
        f"""d0 AS (SELECT DISTINCT p_partkey AS node,
                CAST(0 AS BIGINT) AS hop
         FROM part WHERE p_brand = '{brand}')""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
      SELECT node, MIN(hop) AS hop FROM (
        SELECT node, hop FROM d{r - 1}
        UNION ALL
        SELECT e.dst AS node, d.hop + 1 AS hop
        FROM d{r - 1} d JOIN e ON e.src = d.node
        WHERE d.hop = {r - 1}) GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node AS part_id, hop FROM d{rounds}"
    )


@register(
    "parts_bfs_hops",
    _bfs_sql(BFS_ROUNDS, BFS_SEED_BRAND),
    f"Multi-source BFS hop distances from the {BFS_SEED_BRAND} seed "
    "set over the part co-purchase graph — the graph-proximity "
    "label (seed-distance features for crawl prioritization, "
    "recommendation radius, influence neighborhoods); GraphX's "
    "Pregel ShortestPaths reduces to the same per-superstep "
    "join+min-agg. The directed edge table materializes ONCE "
    "(localCheckpoint — the triangle lesson), then EXACTLY "
    f"{BFS_ROUNDS} frontier expansions: each round joins ONLY the "
    "newly-discovered frontier against the edges (per-round cost is "
    "|frontier|-proportional, the textbook BFS bound) into one "
    "partial-agg'd min groupBy, checkpointed with eager release of "
    "the superseded snapshot — plan depth and memory O(1) in "
    "rounds. A fixed-round BFS is a deterministic function of the "
    "data whether or not the graph is exhausted, so the oracle "
    "replays the identical rounds as generated CTEs (the kcore "
    "discipline); hops are exact integers, no floating point "
    "anywhere (operators/graph.py::bfs_hops).",
)
def q_parts_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.graph import bfs_hops, copurchase_half_pairs

    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    part = cat.table("part")
    # raw half-pair stream (map-side pair generation — round-13);
    # bfs_hops canonicalizes + distincts internally
    pairs = copurchase_half_pairs(li)
    seeds = part.filter(F.col("p_brand") == BFS_SEED_BRAND).select("p_partkey")
    return bfs_hops(pairs, seeds, BFS_ROUNDS).select(
        F.col("node").alias("part_id"), F.col("hop").cast("long").alias("hop")
    )


from realtime0523_spark.operators.stattests import (  # noqa: E402
    ALARM_TOTAL_MULT,
    KS_CRIT_COEFF,
)

_CUSUM_ORACLE = f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, hr, cents,
             CAST(count(*) OVER wk AS BIGINT) * cents
               - CAST(sum(cents) OVER wk AS BIGINT) AS d,
             CAST(sum(cents) OVER wk AS BIGINT) * {ALARM_TOTAL_MULT} AS hth
      FROM h WINDOW wk AS (PARTITION BY event_type)),
    p AS (
      SELECT event_type, hr, hth, sum(d) OVER wo AS p
      FROM s WINDOW wo AS (PARTITION BY event_type ORDER BY hr
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)),
    c AS (
      SELECT event_type, hr, hth,
             p - least(CAST(0 AS BIGINT), min(p) OVER wo) AS cusum_up,
             greatest(CAST(0 AS BIGINT), max(p) OVER wo) - p AS cusum_dn
      FROM p WINDOW wo AS (PARTITION BY event_type ORDER BY hr
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(max(cusum_up) AS BIGINT) AS max_cusum_up,
           CAST(max(cusum_dn) AS BIGINT) AS max_cusum_dn,
           CAST(count(*) FILTER (WHERE cusum_up > hth)
                AS BIGINT) AS n_alarms_up,
           CAST(count(*) FILTER (WHERE cusum_dn > hth)
                AS BIGINT) AS n_alarms_dn,
           min(hr) FILTER (WHERE cusum_up > hth OR cusum_dn > hth)
             AS first_alarm_hr
    FROM c GROUP BY event_type
    """


@register(
    "events_cusum_hourly",
    _CUSUM_ORACLE,
    "CUSUM changepoint alarms over each event type's hourly revenue "
    "series (Page 1954) — the monitor that answers WHEN a KPI's level "
    "shifted, where the drift family only answers whether two "
    "snapshots differ. The corpus collapses to |types|x|hours| cells "
    "in ONE partial-agg'd pass; everything after runs on that "
    "synopsis. Deviations are target-free exact integers (d_i = "
    "n*x_i - total, zero-sum by construction — no float mean "
    "anywhere), and the reset-at-zero CUSUM recursion collapses to "
    "the prefix-sum/running-extremum identity C+ = P - min(0, "
    "running_min P), C- = max(0, running_max P) - P — two ordered "
    "windows over the synopsis, no recursion, no per-row state, "
    "replayed verbatim by the oracle. Alarms fire when a CUSUM "
    f"exceeds {ALARM_TOTAL_MULT}x the series total (= that many "
    "full-series means of cumulative excess, an exact integer "
    "threshold). Emits per type: point count, both max CUSUMs "
    "(scaled units), alarm counts both sides, first alarm hour "
    "(operators/stattests.py::cusum_series).",
)
def q_events_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.stattests import cusum_summary
    from realtime0523_spark.streaming.changepoint import hourly_cents_partials

    ev = Catalog(spark, sf_dir).table("events")
    return cusum_summary(hourly_cents_partials(ev))


def _ks_cells(df: DataFrame) -> DataFrame:
    """Shared corpus-to-cells collapse for the KS monitor (moved to
    operators/stattests.py so the streaming monitor composes it)."""
    from realtime0523_spark.operators.stattests import ks_month_half_cells

    return ks_month_half_cells(df)


_KS_ORACLE = f"""
    WITH c AS (
      SELECT event_type AS key,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CAST(count(*) FILTER (WHERE day(ts) <= 15)
                  AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE day(ts) > 15)
                  AS BIGINT) AS c2
      FROM events GROUP BY 1, 2),
    g AS (
      SELECT key,
             sum(c1) OVER wo AS cum1, sum(c2) OVER wo AS cum2,
             sum(c1) OVER wk AS n_a, sum(c2) OVER wk AS n_b
      FROM c WINDOW
        wo AS (PARTITION BY key ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wk AS (PARTITION BY key)),
    a AS (
      SELECT key, max(n_a) AS n_a, max(n_b) AS n_b,
             max(abs(cum1 * n_b - cum2 * n_a)) AS ks_num
      FROM g GROUP BY key),
    f AS (
      SELECT key, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(ks_num AS BIGINT) AS ks_num,
             round(CAST(ks_num AS DOUBLE)
                   / nullif(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE),
                            0.0), 9)
               AS ks_d,
             round({KS_CRIT_COEFF!r} * sqrt(
                     (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                     / nullif(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE),
                              0.0)), 9)
               AS ks_crit
      FROM a)
    SELECT key, n_a, n_b, ks_num, ks_d, ks_crit,
           (ks_d > ks_crit) AS drifted
    FROM f
    """


@register(
    "events_ks_drift",
    _KS_ORACLE,
    "Exact two-sample Kolmogorov-Smirnov test per event type between "
    "the month's two halves — the assumption-free, binning-free "
    "referee beside the bucketed PSI/KL monitors (events_value_drift "
    "depends on a bucket layout; KS is exact on the raw values). One "
    "partial-agg'd pass collapses the corpus to per-(type, cent) "
    "cells with both halves' counts in one row; the ECDF windows run "
    "on that NDV-sized synopsis (per-type NDV is bounded by value "
    "granularity — for unbounded-precision values at 100 TB the "
    "DDSketch drift monitor is the scale path and this is the exact "
    "complement). D is decided on EXACT cross-multiplied integers "
    "|cum1*n2 - cum2*n1| — no float comparison picks the max; only "
    "the final normalization and the Smirnov alpha=0.05 critical "
    "value divide, both 9-dp rounded so the drifted verdict compares "
    "identical quantized values in both engines "
    "(operators/stattests.py::ks_2sample).",
)
def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.stattests import ks_2sample

    return ks_2sample(_ks_cells(Catalog(spark, sf_dir).table("events")))


_CHI2_ORACLE = """
    WITH cells AS (
      SELECT event_type AS a, CAST(hour(ts) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT a, b, o,
             sum(o) OVER (PARTITION BY a) AS r,
             sum(o) OVER (PARTITION BY b) AS c
      FROM cells),
    s AS (
      SELECT CAST(sum(o) AS BIGINT) AS n_rows,
             count(DISTINCT a) AS na, count(DISTINCT b) AS nb,
             sum((CAST(o AS DOUBLE) / CAST(r AS DOUBLE))
                 * (CAST(o AS DOUBLE) / CAST(c AS DOUBLE))) AS s1
      FROM w),
    f AS (
      SELECT n_rows,
             CAST((na - 1) * (nb - 1) AS BIGINT) AS dof,
             round(CAST(n_rows AS DOUBLE) * (s1 - 1.0), 9) AS chi2,
             least(na - 1, nb - 1) AS mindim
      FROM s)
    SELECT n_rows, dof, chi2,
           round(sqrt(chi2 / nullif(CAST(n_rows AS DOUBLE)
                                    * CAST(mindim AS DOUBLE), 0.0)), 9)
             AS cramers_v
    FROM f
    """


@register(
    "events_chi2",
    _CHI2_ORACLE,
    "Chi-square test of independence between event type and "
    "hour-of-day, with Cramer's V effect size — the categorical "
    "dependence screen beside the Pearson matrix for numeric "
    "features (is traffic mix time-of-day dependent?). ONE "
    "partial-agg'd pass collapses the corpus to the |types|x24 "
    "contingency cells, and everything after is JOIN-FREE via the "
    "identity chi2 = N*(sum over observed cells of o^2/(r*c) - 1), "
    "which absorbs zero-observed cells exactly (each contributes its "
    "expected count) — no grid, no margin joins, no scalar attach "
    "(a literal-key 1-row join constant-folds to the banned nested "
    "loop; this needs none). Margins are two window sums over the "
    "cell synopsis; each term is the identical IEEE (o/r)*(o/c) in "
    "both engines, 9-dp rounded at the final combination, and "
    "Cramer's V derives from the ROUNDED chi2 so both engines "
    "transform identical quantized values "
    "(operators/stattests.py::chi2_independence).",
)
def q_events_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.stattests import chi2_independence

    ev = Catalog(spark, sf_dir).table("events")
    return chi2_independence(
        ev.select("event_type", F.hour("ts").cast("long").alias("hr")),
        "event_type",
        "hr",
    )


@register(
    "stream_events_cusum",
    _CUSUM_ORACLE,
    "Streaming twin of events_cusum_hourly — the online changepoint "
    "monitor in its deployment shape. Hourly cell sums are ADDITIVE, "
    "so each micro-batch commits |types|x|batch-hours| partial cells "
    "(map-side combined, idempotent by batchId); the reader folds "
    "committed partials into the exact hourly synopsis and runs THE "
    "SAME prefix-sum CUSUM + summary code as the batch query "
    "(operators/stattests.cusum_summary) — batch boundaries, "
    "replays, and late events cannot change the answer, so the "
    "drained stream matches the batch oracle bit-for-bit. Per-batch "
    "state is zero; at-rest state is the cell synopsis "
    "(streaming/changepoint.py).",
)
def q_stream_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.changepoint import streaming_cusum
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_cusum_")
    return detach_and_cleanup(
        streaming_cusum(
            spark,
            ev,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


RFM_BUCKETS = 5

_RFM_SEG_SQL = """CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN f_score >= 4 THEN 'loyal'
             WHEN m_score >= 4 THEN 'big_spender'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             WHEN r_score <= 2 THEN 'at_risk'
             ELSE 'regular' END"""

def _rfm_scores_ctes(px: str, where: str) -> str:
    """The per-customer RFM score CTE set, prefixed so two snapshots
    compose in one statement (the migration oracle)."""
    return f"""
    {px}cust AS (
      SELECT o_custkey AS ck,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                    (SELECT CAST(max(o_orderdate) AS DATE) FROM orders
                     WHERE {where}))
                  AS BIGINT) AS r_days,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS mon
      FROM orders WHERE {where} GROUP BY 1),
    {px}nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {px}cust),
    {px}b AS (
      SELECT ck, mon,
             ((row_number() OVER (ORDER BY r_days, ck) - 1)
              * {RFM_BUCKETS}) // {px}nn.n AS rb,
             ((row_number() OVER (ORDER BY freq, ck) - 1)
              * {RFM_BUCKETS}) // {px}nn.n AS fb,
             ((row_number() OVER (ORDER BY mon, ck) - 1)
              * {RFM_BUCKETS}) // {px}nn.n AS mb
      FROM {px}cust CROSS JOIN {px}nn),
    {px}s AS (
      SELECT ck, mon,
             CAST({RFM_BUCKETS} - rb AS BIGINT) AS r_score,
             CAST(fb + 1 AS BIGINT) AS f_score,
             CAST(mb + 1 AS BIGINT) AS m_score
      FROM {px}b)"""


_RFM_ORACLE = f"""
    WITH {_rfm_scores_ctes("", "1 = 1")}
    SELECT r_score, f_score, m_score,
           {_RFM_SEG_SQL} AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(mon) AS BIGINT) AS total_cents
    FROM s GROUP BY 1, 2, 3, 4
    """


def _customer_metrics(orders: DataFrame) -> DataFrame:
    """Collapse orders to the |customers| metric table (ck, last_day,
    freq, mon) — all three metrics fold by (max, sum, sum), which is
    what gives RFM a streaming twin through the additive-cells
    machinery."""
    return orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("mon"),
    )


def _rfm_scores(orders: DataFrame) -> DataFrame:
    """Per-customer RFM quintile scores + segment label — the shared
    scorer behind customers_rfm, the migration matrix, and the
    streaming twin. Exact rank-bucket quintiles via prefix_sums
    (never ntile)."""
    return _rfm_scores_from_metrics(_customer_metrics(orders))


def _rfm_scores_driver(
    cust: DataFrame, anchor, n: int
) -> DataFrame:
    """Driver-side numpy scorer for a MEASURED-small metric table
    (round-14, VERDICT r13 item #3 — the connected-components §8
    precedent: decide with small rows). The distributed scorer pays
    three sampled range exchanges + three localCheckpoint pins + three
    offset collects (~18 jobs per snapshot of pure scheduling fixed
    cost at fixture scale; at 100 TB each job is a barrier); below the
    gate the identical integer arithmetic runs as numpy passes over
    one Arrow collect. Exactness carries over verbatim: cum_before
    under a unique total order (metric, ck) IS the 0-based lexsort
    rank, bucket = (rank * 5) // n in int64, segment the same CASE
    ladder — bit-identical scores (pinned by the driver≡distributed
    parity test in tests/test_operators.py)."""
    import numpy as np
    import pandas as pd

    spark = cust.sparkSession
    pdf = cust.toPandas()
    ck = pdf["ck"].to_numpy(np.int64)
    last = pd.to_datetime(pdf["last_day"]).to_numpy().astype("datetime64[D]")
    r_days = (np.datetime64(anchor, "D") - last).astype(np.int64)
    freq = pdf["freq"].to_numpy(np.int64)
    mon = pdf["mon"].to_numpy(np.int64)

    def bucket(v: "np.ndarray") -> "np.ndarray":
        # rank under the unique total order (v, ck) == exclusive
        # prefix count of ones == prefix_sums' cum_before
        order = np.lexsort((ck, v))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n, dtype=np.int64)
        return (rank * RFM_BUCKETS) // n

    r_score = RFM_BUCKETS - bucket(r_days)
    f_score = bucket(freq) + 1
    m_score = bucket(mon) + 1
    seg = np.select(
        [
            (r_score >= 4) & (f_score >= 4) & (m_score >= 4),
            f_score >= 4,
            m_score >= 4,
            (r_score <= 2) & (f_score <= 2),
            r_score <= 2,
        ],
        ["champion", "loyal", "big_spender", "hibernating", "at_risk"],
        default="regular",
    )
    out = pd.DataFrame(
        {
            "ck": ck,
            "mon": mon,
            "r_score": r_score,
            "f_score": f_score,
            "m_score": m_score,
            "segment": seg,
        }
    )
    return spark.createDataFrame(
        out,
        "ck long, mon long, r_score long, f_score long, m_score long, "
        "segment string",
    )


def _rfm_scores_from_metrics(cust: DataFrame) -> DataFrame:
    """Score a (ck, last_day, freq, mon) metric table: the recency
    anchor is the snapshot max last_day (1-row exact collect, which
    now also measures |customers| for the driver-path gate); the rest
    is the exact rank-bucket quintile machinery — as numpy over one
    Arrow collect when the measured count fits under
    SPARK_GRAFT_RFM_DRIVER_ROWS (default 2M — a bounded
    broadcast-build-side-sized driver hold, the CC gate stance),
    distributed sampled-range prefix sums above it."""
    import os

    from realtime0523_spark.operators.histogram import prefix_sums

    head = cust.agg(
        F.max("last_day").alias("a"), F.count(F.lit(1)).alias("n")
    ).first()
    anchor, n = head["a"], int(head["n"])
    gate = int(os.environ.get("SPARK_GRAFT_RFM_DRIVER_ROWS", "2000000"))
    if 0 < n <= gate:
        return _rfm_scores_driver(cust, anchor, n)
    cust = cust.select(
        "ck",
        F.datediff(F.lit(anchor), F.col("last_day")).cast("long").alias("r_days"),
        "freq",
        "mon",
    ).withColumn("one", F.lit(1).cast("long"))

    d, n = prefix_sums(cust, [F.col("r_days"), F.col("ck")], "one", "cum_r")
    d, _ = prefix_sums(d, [F.col("freq"), F.col("ck")], "one", "cum_f")
    d, _ = prefix_sums(d, [F.col("mon"), F.col("ck")], "one", "cum_m")
    s = d.select(
        "ck",
        "mon",
        (F.lit(RFM_BUCKETS) - F.expr(f"(cum_r * {RFM_BUCKETS}) div {n}"))
        .cast("long")
        .alias("r_score"),
        (F.expr(f"(cum_f * {RFM_BUCKETS}) div {n}") + 1)
        .cast("long")
        .alias("f_score"),
        (F.expr(f"(cum_m * {RFM_BUCKETS}) div {n}") + 1)
        .cast("long")
        .alias("m_score"),
    )
    return s.withColumn("segment", F.expr(_RFM_SEG_SQL))


@register(
    "customers_rfm",
    _RFM_ORACLE,
    "RFM customer segmentation (Hughes 1994) — recency / frequency / "
    "monetary quintile scores per customer, aggregated to labeled "
    "segment cells (champion / loyal / big_spender / at_risk / "
    "hibernating / regular): the customer-value report every CRM "
    "and retention campaign starts from. One partial-agg'd pass "
    "collapses orders to the |customers| metric table; each "
    "dimension's EXACT quintile assignment reuses the equi-depth "
    "machinery (operators/histogram.prefix_sums): sampled RANGE "
    "exchange + partition-local running counts + broadcast offsets "
    "— bucket = (rows_before * 5) div n in pure integer arithmetic, "
    "NO ntile-over-global-sort anywhere (the single-task stage that "
    "cannot run at 100 TB; the oracle's row_number replays the "
    "identical total order (metric, custkey)). The recency anchor "
    "is the corpus max order date (1-row exact collect, the BM25 "
    "legality class); money rides as integer cents. Ties land in "
    "the same bucket only when (metric, custkey) order says so — "
    "fully deterministic in both engines.",
)
def q_customers_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).table("orders")
    return _rfm_report(_rfm_scores(orders))


def _rfm_report(scores: DataFrame) -> DataFrame:
    """Aggregate per-customer scores to the labeled segment-cell
    report — shared by the batch query and the streaming twin."""
    return scores.groupBy(
        "r_score", "f_score", "m_score", "segment"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("mon").cast("long").alias("total_cents"),
    ).select(
        "r_score", "f_score", "m_score", "segment",
        "n_customers", "total_cents",
    )


@register(
    "stream_customers_rfm",
    _RFM_ORACLE,
    "Streaming twin of customers_rfm — continuously-updated customer "
    "segmentation: each micro-batch commits per-(customer, day) "
    "partial cells (count + cent sum; bounded by customers TOUCHED "
    "in the batch, map-side combined, idempotent by batchId), the "
    "reader folds cells by (sum, sum) and collapses to customer "
    "metrics by (max day, sum, sum) — every fold a commutative "
    "monoid, so batch boundaries, replays, and late orders cannot "
    "change any score — then the IDENTICAL exact rank-bucket "
    "quintile scorer and segment report run on the folded metrics "
    "(shared _rfm_scores_from_metrics/_rfm_report code). Drained "
    "equals batch bit-for-bit; at-rest state is the "
    "|customers × active-days| cell synopsis (the rolling-DAU class).",
)
def q_stream_customers_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.cells import streaming_cells
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    orders = stream_table(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix="stream_rfm_")

    def cell_fn(b: DataFrame) -> DataFrame:
        return b.groupBy(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").cast("date").alias("d"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("mon"),
        )

    def finish(cells: DataFrame) -> DataFrame:
        metrics = cells.groupBy("ck").agg(
            F.max("d").alias("last_day"),
            F.sum("freq").cast("long").alias("freq"),
            F.sum("mon").cast("long").alias("mon"),
        )
        return _rfm_report(_rfm_scores_from_metrics(metrics))

    return detach_and_cleanup(
        streaming_cells(
            spark,
            orders,
            cell_fn,
            key_cols=["ck", "d"],
            sum_cols=["freq", "mon"],
            finish_fn=finish,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            empty_schema=(
                "r_score long, f_score long, m_score long, segment string, "
                "n_customers long, total_cents long"
            ),
        ),
        work,
    )


RFM_MIGRATION_CUTOFF = "2000-12-31 23:59:59"

_RFM_MIGRATION_ORACLE = f"""
    WITH {_rfm_scores_ctes("a_", f"o_orderdate <= TIMESTAMP '{RFM_MIGRATION_CUTOFF}'")},
    {_rfm_scores_ctes("b_", "1 = 1")},
    seg_a AS (SELECT ck, {_RFM_SEG_SQL} AS seg FROM a_s),
    seg_b AS (SELECT ck, {_RFM_SEG_SQL} AS seg FROM b_s),
    mig AS (
      SELECT coalesce(a.seg, 'new') AS segment_from,
             b.seg AS segment_to,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM seg_b b LEFT JOIN seg_a a USING (ck)
      GROUP BY 1, 2)
    SELECT segment_from, segment_to, n_customers,
           round(CAST(n_customers AS DOUBLE)
                 / CAST(sum(n_customers) OVER (PARTITION BY segment_from)
                        AS DOUBLE), 9) AS share_of_from
    FROM mig
    """


@register(
    "customers_rfm_migration",
    _RFM_MIGRATION_ORACLE,
    "RFM segment MIGRATION matrix between two order snapshots (as of "
    f"{RFM_MIGRATION_CUTOFF[:10]} vs today) — the CRM movement "
    "report: who fell from champion to at_risk, which at_risk "
    "customers a win-back campaign actually recovered, how many "
    "customers are new since the cutoff ('new' pseudo-segment). "
    "Composition of the shared _rfm_scores scorer run on each "
    "snapshot (each with its OWN max-date anchor and its own exact "
    "rank quintiles — scores are cohort-relative by design, so the "
    "matrix measures RELATIVE standing shifts, documented); the two "
    "|customers| score tables join on the customer key and collapse "
    "to the <=36-cell matrix, with each cell's share-of-origin from "
    "a window over that meta-sized matrix. Snapshot B is a superset "
    "of A, so a LEFT join from B covers every customer; counts are "
    "exact longs, shares one 9-dp division.",
)
def q_customers_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = Catalog(spark, sf_dir).table("orders")
    # the two snapshot scorers are independent and each internally
    # eager (anchor collect + three prefix_sums pins); overlapping
    # them from a 2-thread pool (guide §2.6) lets snapshot B's range
    # exchanges back-fill the executors snapshot A's stage tails
    # leave idle — identical results, the scorers share no state
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_a = pool.submit(
            lambda: _rfm_scores(
                orders.filter(
                    F.col("o_orderdate")
                    <= F.lit(RFM_MIGRATION_CUTOFF).cast("timestamp")
                )
            ).select("ck", F.col("segment").alias("seg_a"))
        )
        f_b = pool.submit(
            lambda: _rfm_scores(orders).select(
                "ck", F.col("segment").alias("seg_b")
            )
        )
        a, b = f_a.result(), f_b.result()
    mig = (
        b.join(a, "ck", "left")
        .select(
            F.coalesce("seg_a", F.lit("new")).alias("segment_from"),
            F.col("seg_b").alias("segment_to"),
        )
        .groupBy("segment_from", "segment_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w = W.partitionBy("segment_from")
    return mig.select(
        "segment_from",
        "segment_to",
        "n_customers",
        F.round(
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(w).cast("double"),
            9,
        ).alias("share_of_from"),
    )


ROLLING_DAU_DAYS = 7

def _rolling_dau_from_cells(cells: DataFrame) -> DataFrame:
    """Synopsis-to-answer finisher for the rolling-DAU pair — shared
    by the batch query and the streaming twin. Checkpoints the cell
    set before its two-way reuse (max-day collect + fan-out)."""
    from realtime0523_spark.llm.clusters import _ckpt_tools

    ckpt, _release = _ckpt_tools(cells)
    cells, _ = ckpt(cells)
    mx = cells.agg(F.max("d").alias("mx")).first()["mx"]
    ex = (
        cells.select(
            "user_id",
            "d",
            F.explode(
                F.sequence(F.lit(0), F.lit(ROLLING_DAU_DAYS - 1))
            ).alias("i"),
        )
        .select(
            "user_id", "d", F.date_add(F.col("d"), F.col("i")).alias("day")
        )
        .filter(F.col("day") <= F.lit(mx))
    )
    return ex.groupBy("day").agg(
        F.count_distinct(
            F.when(F.col("d") == F.col("day"), F.col("user_id"))
        )
        .cast("long")
        .alias("dau"),
        F.count_distinct("user_id").cast("long").alias("rolling_7d_dau"),
    )


_ROLLING_DAU_ORACLE = f"""
    WITH cells AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    mx AS (SELECT max(d) AS mx FROM cells),
    ex AS (
      SELECT c.user_id, c.d, c.d + CAST(i.i AS INTEGER) AS wday
      FROM cells c,
           (SELECT unnest(range(0, {ROLLING_DAU_DAYS})) AS i) i
      WHERE c.d + CAST(i.i AS INTEGER) <= (SELECT mx FROM mx))
    SELECT wday AS day,
           CAST(count(DISTINCT CASE WHEN d = wday THEN user_id END)
                AS BIGINT) AS dau,
           CAST(count(DISTINCT user_id) AS BIGINT) AS rolling_7d_dau
    FROM ex GROUP BY wday
    """


@register(
    "events_rolling_dau",
    _ROLLING_DAU_ORACLE,
    f"Exact {ROLLING_DAU_DAYS}-day rolling distinct active users per "
    "day, beside the plain DAU — the stickiness denominator "
    "(DAU/WAU) every engagement dashboard tracks. EXACT rolling "
    "distinct is the shape naive SQL gets wrong at scale (a range "
    "self-join of the activity table, or one COUNT DISTINCT subquery "
    "per day): here the corpus collapses ONCE to distinct (user, "
    "day) cells, and each cell map-side fans out to the at-most-"
    f"{ROLLING_DAU_DAYS} window-end days it contributes to (explode "
    "of a literal sequence — bounded fan-out, no join, no grid); one "
    "partial-agg'd count_distinct per window-end day finishes both "
    "metrics in the same pass (dau via the day==window-end filter). "
    "Window ends past the last observed day are clipped against the "
    "corpus max day (1-row exact collect, the BM25 legality class). "
    "At 100 TB the cell table is |users|x|days| — the fan-out "
    "multiplies the SYNOPSIS, never the corpus.",
)
def q_events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    return _rolling_dau_from_cells(
        ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    )


@register(
    "stream_events_ks",
    _KS_ORACLE,
    "Streaming twin of events_ks_drift through the generalized "
    "additive-synopsis machinery (streaming/cells.py): per-(type, "
    "cent) half-counts are exact additive longs, so each micro-batch "
    "commits its partial cells (map-side combined, idempotent by "
    "batchId), the reader folds them into the exact at-rest cell "
    "synopsis, and the SAME ks_2sample finisher decides D on the "
    "identical cross-multiplied integers — drained equals batch "
    "bit-for-bit; per-batch state zero, at-rest state NDV-bounded.",
)
def q_stream_events_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.operators.stattests import ks_2sample
    from realtime0523_spark.streaming.cells import streaming_cells
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_ks_")
    return detach_and_cleanup(
        streaming_cells(
            spark,
            ev,
            _ks_cells,
            key_cols=["key", "v"],
            sum_cols=["c1", "c2"],
            finish_fn=ks_2sample,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            empty_schema=(
                "key string, n_a long, n_b long, ks_num long, "
                "ks_d double, ks_crit double, drifted boolean"
            ),
        ),
        work,
    )


@register(
    "stream_events_chi2",
    _CHI2_ORACLE,
    "Streaming twin of events_chi2 through the same additive-"
    "synopsis machinery (streaming/cells.py): contingency cell "
    "counts merge by addition, so per-batch partial cells fold into "
    "the exact at-rest |types|x24 table and the SAME join-free "
    "chi2_from_cells identity finishes — drained equals batch "
    "bit-for-bit; the continuously-updated independence screen.",
)
def q_stream_events_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.operators.stattests import (
        chi2_cells,
        chi2_from_cells,
    )
    from realtime0523_spark.streaming.cells import streaming_cells
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_chi2_")
    return detach_and_cleanup(
        streaming_cells(
            spark,
            ev,
            lambda b: chi2_cells(
                b.select("event_type", F.hour("ts").cast("long").alias("hr")),
                "event_type",
                "hr",
            ),
            key_cols=["a", "b"],
            sum_cols=["o"],
            finish_fn=chi2_from_cells,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            empty_schema=(
                "n_rows long, dof long, chi2 double, cramers_v double"
            ),
        ),
        work,
    )


@register(
    "stream_events_rolling_dau",
    _ROLLING_DAU_ORACLE,
    "Streaming twin of events_rolling_dau: presence cells merge by "
    "SET UNION (the distinct_cells mode of streaming/cells.py — "
    "commit each batch's distinct (user, day) cells, re-distinct at "
    "read; re-delivery and overlap are absorbed by idempotence of "
    "union, the docs-novelty discipline), then the SAME "
    "bounded-fan-out finisher computes both engagement metrics — "
    "drained equals batch bit-for-bit; the continuously-updated "
    "DAU/WAU stickiness pair.",
)
def q_stream_events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.cells import streaming_cells
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_rdau_")
    return detach_and_cleanup(
        streaming_cells(
            spark,
            ev,
            lambda b: b.select(
                "user_id", F.col("ts").cast("date").alias("d")
            ).distinct(),
            key_cols=["user_id", "d"],
            sum_cols=[],
            finish_fn=_rolling_dau_from_cells,
            out_dir=f"{work}/partials",
            checkpoint_dir=f"{work}/ckpt",
            empty_schema="day date, dau long, rolling_7d_dau long",
            distinct_cells=True,
        ),
        work,
    )


JEFFREYS_ALERT = 0.25


def _monitor_report_sql() -> str:
    return f"""
    WITH mr_t AS (SELECT * FROM ({_TREND_ORACLE})),
    mr_c AS (SELECT * FROM ({_CUSUM_ORACLE})),
    mr_k AS (SELECT * FROM ({_KS_ORACLE})),
    mr_d AS (SELECT * FROM ({_value_drift_sql()}))
    SELECT t.event_type, t.n_rows, t.slope_per_day,
           c.n_alarms_up, c.n_alarms_dn, c.first_alarm_hr,
           k.ks_d, k.drifted AS ks_drifted, d.jeffreys,
           CAST((CASE WHEN c.n_alarms_up + c.n_alarms_dn > 0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN k.drifted THEN 1 ELSE 0 END)
              + (CASE WHEN d.jeffreys > {JEFFREYS_ALERT!r}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts
    FROM mr_t t
    JOIN mr_c c ON c.event_type = t.event_type
    JOIN mr_k k ON k.key = t.event_type
    JOIN mr_d d ON d.domain = t.event_type
    """


@register(
    "events_monitor_report",
    _monitor_report_sql(),
    "The per-type KPI monitoring dashboard row — composition, not "
    "reimplementation (the warehouse_quality_report discipline): OLS "
    "trend slope, CUSUM changepoint alarms, exact KS drift verdict, "
    "and the Jeffreys (PSI-style) distribution divergence, one row "
    "per event type with a composite alert count (CUSUM fired / KS "
    "rejected / Jeffreys above the "
    f"{JEFFREYS_ALERT} convention threshold — each alert compares "
    "the same 9-dp-quantized values in both engines). Four "
    "independent one-pass corpus collapses (each registered and "
    "oracle-checked on its own), then every join is a broadcast of "
    "|types|-row synopses. The answer a data-quality on-call "
    "actually reads.",
)
def q_events_monitor_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtime0523_spark.operators.stattests import (
        compose_monitor_report,
        ks_2sample,
    )

    return compose_monitor_report(
        q_events_trend_slope(spark, sf_dir),
        q_events_cusum_hourly(spark, sf_dir),
        ks_2sample(_ks_cells(Catalog(spark, sf_dir).table("events"))),
        q_events_value_drift(spark, sf_dir),
        JEFFREYS_ALERT,
    )


@register(
    "stream_events_monitor_report",
    _monitor_report_sql(),
    "Streaming twin of events_monitor_report — the on-call dashboard "
    "maintained ONLINE with one reader: a single foreachBatch scans "
    "each micro-batch once (persisted, T8) and commits all FOUR "
    "monitor synopses (OLS sums, hourly CUSUM cells, KS half-count "
    "cells, Jeffreys log-bucket half-count cells) idempotently by "
    "batchId — not four readers re-scanning the topic. All four cell "
    "families are additive exact integers, so the folded partials "
    "feed the IDENTICAL batch finishers and the IDENTICAL "
    "compose_monitor_report join — drained equals batch bit-for-bit "
    "(streaming/monitor.py).",
)
def q_stream_events_monitor_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.monitor import streaming_monitor_report
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_monitor_")
    return detach_and_cleanup(
        streaming_monitor_report(
            spark,
            ev,
            work_dir=work,
            n_drift_buckets=VALUE_DRIFT_BUCKETS,
            jeffreys_alert=JEFFREYS_ALERT,
            checkpoint_dir=f"{work}/ckpt",
        ),
        work,
    )


_FUNNEL_LATENCY_ORACLE = """
    WITH fs1 AS (SELECT user_id, min(ts) AS t1 FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
    fs2 AS (SELECT e.user_id, fs1.t1, min(e.ts) AS t2
            FROM events e JOIN fs1 ON fs1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > fs1.t1
            GROUP BY e.user_id, fs1.t1),
    fs3 AS (SELECT e.user_id, fs2.t2, min(e.ts) AS t3
            FROM events e JOIN fs2 ON fs2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fs2.t2
            GROUP BY e.user_id, fs2.t2),
    d AS (
      SELECT 'view->click' AS transition,
             epoch_us(t2) - epoch_us(t1) AS d_us FROM fs2
      UNION ALL
      SELECT 'click->purchase', epoch_us(t3) - epoch_us(t2) FROM fs3)
    SELECT transition,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(d_us) AS BIGINT) AS min_us,
           CAST(max(d_us) AS BIGINT) AS max_us,
           quantile_cont(d_us, 0.5) AS q50_us,
           quantile_cont(d_us, 0.75) AS q75_us,
           CAST(sum(d_us) // count(*) AS BIGINT) AS avg_us
    FROM d GROUP BY transition
    """


@register(
    "event_funnel_latency",
    _FUNNEL_LATENCY_ORACLE,
    "Time-to-convert distribution per funnel transition (view->click, "
    "click->purchase) — the question the stage counts alone never "
    "answer: not just HOW MANY users advance but HOW LONG they take "
    "(the p75 is the re-engagement SLA every growth team tunes "
    "against). Same decorrelated stage chain as event_funnel (one "
    "user-keyed min-aggregate per stage, every shuffle on the same "
    "user key, prior stage time carried through the group key); "
    "latencies are EXACT integer microsecond deltas, min/max/count "
    "exact longs, the mean an exact integer FLOOR DIVISION of the "
    "exact sum (a 9-dp round of a ~2e11 double diverges across "
    "engines — BigDecimal vs double rounding; the sf0.1 sweep "
    "caught it), and the quantiles exact linear interpolation at "
    "binary-exact fractions (0.5, 0.75 — the qty_quantiles "
    "discipline, so the interpolated values bit-match "
    "quantile_cont).",
)
def q_event_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).table("events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    d = s2.select(
        F.lit("view->click").alias("transition"),
        (F.unix_micros("t2") - F.unix_micros("t1")).alias("d_us"),
    ).unionAll(
        s3.select(
            F.lit("click->purchase").alias("transition"),
            (F.unix_micros("t3") - F.unix_micros("t2")).alias("d_us"),
        )
    )
    return funnel_latency_stats(d)


def funnel_latency_stats(d: DataFrame) -> DataFrame:
    """Per-transition latency report over a (transition, d_us) delta
    table — shared by the batch query and the streaming twin so both
    finish identical algebra on identical exact deltas."""
    stats = d.groupBy("transition").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("d_us").cast("long").alias("min_us"),
        F.max("d_us").cast("long").alias("max_us"),
        F.sum("d_us").alias("sum_us"),
    )
    q = exact_quantiles(d, ["transition"], "d_us", {"q50_us": 0.5, "q75_us": 0.75})
    return (
        stats.join(F.broadcast(q), "transition")
        .select(
            "transition",
            "n_users",
            "min_us",
            "max_us",
            "q50_us",
            "q75_us",
            # EXACT integer mean (floor division of the exact sum):
            # a 9-dp round of a ~2e11-microsecond double diverges
            # across engines (BigDecimal vs double rounding) — the
            # sf0.1 sweep caught it; sub-microsecond precision is
            # noise here anyway
            F.expr("sum_us div n_users").cast("long").alias("avg_us"),
        )
    )


@register(
    "stream_manifest_topic_counts",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, max(ts) AS max_ts
    FROM events GROUP BY 1
    """,
    "The round-11 MANIFEST BUS as a registered, oracle-backed path "
    "(streaming/topology.py::topic_append_writer/topic_stream — the "
    "inter-stage transport the live topology runs on, here proven "
    "end-to-end against DuckDB): the event stream is committed to a "
    "manifest topic (part files at natural write parallelism, ONE "
    "atomically-renamed manifest per batch — no coalesce(1) "
    "single-writer), read back THROUGH the manifest stream (text "
    "stream over manifests, executor-side Arrow expansion of the "
    "listed parquet files, timestamps localized to UTC), and "
    "aggregated. count proves no row is lost or duplicated across "
    "the commit/expand hop; max(ts) proves microsecond-exact "
    "timestamp fidelity through the parquet->Arrow->pandas->Spark "
    "crossing. At 100 TB the bus is Kafka or a table format whose "
    "snapshot commit is exactly this manifest shape.",
)
def q_stream_manifest_topic_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from realtime0523_spark.streaming.runner import (
        run_foreach_batch,
        run_to_memory,
    )
    from realtime0523_spark.streaming.sinks import detach_and_cleanup
    from realtime0523_spark.streaming.sources import stream_table
    from realtime0523_spark.streaming.topology import (
        topic_append_writer,
        topic_stream,
    )

    work = tempfile.mkdtemp(prefix="stream_manifest_")
    topic = f"{work}/topic"
    ev = stream_table(spark, sf_dir, "events").select("event_type", "ts")
    run_foreach_batch(
        ev,
        topic_append_writer(topic),
        checkpoint_dir=f"{work}/ckpt_w",
        output_mode="append",
    )
    back = topic_stream(spark, topic, "event_type string, ts timestamp")
    counts = back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("ts").alias("max_ts"),
    )
    out = run_to_memory(counts, output_mode="complete")
    return detach_and_cleanup(out, work)
