"""Five-layer CONCURRENT streaming topology — the reference's defining
architecture run as one live pipeline.

Reference: the gmall realtime warehouse is not five isolated jobs but a
layered topology running concurrently, chained by Kafka topics
(SURVEY §3): ODS router (scala/…/ods/KafkaToODS_M.scala) → DIM upserts
(scala/…/dim/SkuInfoApp.scala et al.) → DWD enrich
(scala/…/dwd/Ods_to_DWD_order_info.scala, dwd/OrderDetailApp.scala) →
DWS order-wide join + allocation (scala/…/dws/OrderWiderApp.scala) →
ADS aggregates (scala/…/ads/TradeMarkAmountApp.scala), every stage on a
5 s micro-batch cadence. The test suite proves each stage individually;
this module runs all five AS ONE LIVE TOPOLOGY — five Structured
Streaming queries in one session, directories standing in for the
inter-stage Kafka topics, each stage independently stoppable and
restartable from its checkpoint mid-run.

Inter-stage bus (`topic_append_writer` / `topic_stream`): each
micro-batch's parquet part files are written at natural parallelism,
then ONE manifest file listing them is atomically renamed into place;
downstream stages stream the MANIFESTS and expand them to rows on the
executors — so a reader can never observe half a batch (the
visibility guarantee a Kafka transaction gives the reference) and no
stage funnels its output through a single partition (the round-10
`coalesce(1)` stand-in is gone). Replayed batches (restart recovery)
are no-ops by manifest, the K5 idempotence contract. On a cluster the
bus is Kafka (streaming/sinks.kafka_sink — same per-record fan-out)
or a transactional table format, whose snapshot commit is exactly
this manifest shape; everything in this module (stage shapes,
watermarked join, per-batch dim snapshot, idempotent commits,
manifest visibility) is the 100 TB design.

Dim store (`versioned_dim_upsert`): the K2 SCD-1 upsert re-done for
CONCURRENT readers. `sinks.upsert_parquet_dim`'s rmtree+rename swap has
a window where the directory is absent — fine for single-threaded
stage tests, fatal in a live topology where the ADS stage snapshots the
dim mid-upsert. Here every merge commits a NEW immutable version
directory plus a marker; readers pick the highest committed version
(the reference's Phoenix gives the same read-your-committed-writes
behavior; a Delta/Iceberg MERGE is the cluster equivalent).

Event-time contract: the CDC envelope `ts` (epoch ms) is the
create_time both sides of a header/detail pair share in the
reference's feed — DWD stamps it as the event-time column, so the DWS
watermarked time-range join (tolerance 50 s, the reference's window
span) keeps every pair while bounding state, across ANY batch
boundary placement. Monotonically non-decreasing feed `ts` (what a CDC
log delivers) keeps late-arriving waves inside the watermark horizon.

ALLOCATION MODES (round-10: the co-arrival contract is now both
GUARDED and ESCAPABLE):

- Default (``split_arrival=False``): the F1 exact-sum allocation at
  ADS normalizes by the weight sum of the order's details PRESENT IN
  THE BATCH — so all of an order's detail rows must reach ODS in ONE
  input file (→ one batch end-to-end: the header may arrive in any
  batch, since the join emits every pair of an order together once
  the last side lands, and the manifest topic commits are atomically
  visible). This is the reference's own data contract — an order
  and its details are written in one DB transaction and arrive as one
  CDC batch (the same co-arrival assumption OrderWiderApp's 50 s
  window join + Redis allocation encode). The contract is now a
  RUNTIME GUARD, not just a docstring: the ADS stage commits each
  batch's order-key set (synopsis-sized) and RAISES when an order key
  reappears in a later batch — a violating feed fails loudly instead
  of silently double-counting o_totalprice.
- ``split_arrival=True``: the ADS stage runs the reference's Redis
  running-sum design instead (streaming/allocation.py —
  applyInPandasWithState, 100 s event-time TTL,
  OrderWiderApp.scala:157-199): each detail is allocated as it
  arrives, the order's last detail takes the exact remainder, and a
  feed that splits one order's details across CDC files is computed
  CORRECTLY. Requires the order_info CDC payload to carry
  original-total metadata (o_weight_total = Σ detail weights,
  o_detail_count), exactly as the reference's order_info carries
  original_total_amount.

DAU STAGE (round-10): the reference runs Dau concurrently with the
warehouse apps on a FASTER 3 s trigger against the start-log topic
(scala/…/app/Dau.scala:42, local[4] Seconds(3)); the topology runs it
as a sixth concurrent stage over its own `in_start` directory feed —
watermarked (dt, mid) dropDuplicates (D1; the Redis SADD+TTL analog,
streaming/dau.py) with each batch's NEW members committed
idempotently, at 3/5 of the warehouse cadence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2
from realtime0523_spark.operators.allocation import allocate_order_amount
from realtime0523_spark.streaming.compaction import (
    committed_relation,
    maybe_compact,
)
from realtime0523_spark.streaming.router import route_cdc
from realtime0523_spark.streaming.runner import _stream_shuffle, watermark_drops
from realtime0523_spark.streaming.sinks import idempotent_batch_writer
from realtime0523_spark.streaming.sources import cdc_json_stream

TRIGGER_SECONDS = 5.0  # the reference cadence (Seconds(5) in every app)
# Dau runs on a faster trigger than the warehouse apps
# (scala/…/app/Dau.scala:42 — Seconds(3) vs Seconds(5) everywhere else)
DAU_TRIGGER_RATIO = 3.0 / 5.0
JOIN_TOLERANCE = "50 seconds"  # OrderWiderApp's window span

# ODS topic record: the routed envelope with the payload re-serialized
# (what the reference produces to each ods_* topic).
ODS_RECORD_SCHEMA = "table string, type string, value string, ts long"

DWD_ORDER_INFO_SCHEMA = (
    "o_orderkey long, o_custkey long, o_totalprice double, "
    "order_dt string, o_commit_ts timestamp"
)
# split-arrival mode: the header additionally carries the reference's
# original-total metadata (original_total_amount analog) the running-
# sum allocation needs per row
DWD_ORDER_INFO_SCHEMA_SPLIT = (
    DWD_ORDER_INFO_SCHEMA + ", o_weight_total double, o_detail_count int"
)
DWD_ORDER_DETAIL_SCHEMA = (
    "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
    "l_quantity double, l_extendedprice double, l_commit_ts timestamp"
)
DWS_WIDE_SCHEMA = (
    "o_orderkey long, o_custkey long, o_totalprice double, order_dt string, "
    "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
    "l_quantity double, l_extendedprice double, l_commit_ts timestamp"
)
DWS_WIDE_SCHEMA_SPLIT = (
    DWS_WIDE_SCHEMA + ", o_weight_total double, o_detail_count int"
)
START_LOG_SCHEMA = "mid string, ts long"

_DETAIL_ORDER = [
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_extendedprice",
    "l_quantity",
]


def topic_append_writer(out_dir: str):
    """foreachBatch writer emulating a transactional Kafka topic on a
    directory — MANIFEST COMMIT (round-11, replaces the single-file
    `coalesce(1)` stand-in): the batch's parquet part files are
    written under `_data/batch_<id>/` at the plan's NATURAL write
    parallelism, then ONE manifest file listing them is atomically
    renamed into place. Readers (`topic_stream`) consume manifests,
    never directory listings of data files — a batch is either fully
    visible (its manifest committed) or not at all, the visibility
    guarantee a Kafka transaction gives the reference
    (scala/…/utils/KafkaStreamSink.scala:25), with no single-output-
    partition bottleneck. Replayed batches are no-ops by manifest
    (K5); a crash between the data write and the manifest rename is
    healed on replay (the data write is mode=overwrite, the rename IS
    the commit). Underscore-prefixed names keep the data dir and
    scratch invisible to Spark's file listing, so the manifest stream
    over `out_dir` sees only committed manifests."""
    os.makedirs(out_dir, exist_ok=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        manifest = os.path.join(out_dir, f"manifest_{batch_id:09d}.txt")
        if os.path.exists(manifest):  # replayed batch → already committed
            return
        if batch_df.isEmpty():
            return
        data_dir = os.path.join(out_dir, "_data", f"batch_{batch_id:09d}")
        batch_df.write.mode("overwrite").parquet(data_dir)
        parts = sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        if not parts:
            raise RuntimeError(
                f"topic_append_writer: non-empty batch {batch_id} "
                f"produced no part files under {data_dir}"
            )
        tmp = os.path.join(out_dir, f"_tmp_manifest_{batch_id:09d}")
        with open(tmp, "w") as fh:
            fh.write("\n".join(parts) + "\n")
        os.replace(tmp, manifest)

    return write


def topic_stream(
    spark: SparkSession,
    out_dir: str,
    schema: str,
    parallelism: int | None = None,
) -> DataFrame:
    """Streaming reader for a manifest-committed topic: a text file
    stream over the manifest files (each atomically published, so a
    batch is never half-visible), expanded to typed data rows by
    reading the listed parquet files inside an Arrow-batched kernel on
    the executors. Only manifest LINES shuffle — `parallelism`
    (default: the session's shuffle-partition setting) spreads the
    file reads across tasks, because a manifest is a tiny text file
    that would otherwise land in a single input split however large
    the data behind it. Globs work (the DWD stage reads
    `ods_order_{info,detail}` as one stream).

    Timestamp columns are tz-localized to UTC inside the kernel:
    Spark-written parquet holds UTC instants (INT96/micros), and a
    naive datetime yielded back through Arrow would be re-interpreted
    in the session timezone.

    This is the sandbox bus: on a cluster the topic is Kafka
    (streaming/sinks.kafka_sink) or a transactional table format —
    whose commit protocol is exactly this manifest shape (Delta/
    Iceberg snapshot = an atomically published file list)."""
    paths = spark.readStream.text(out_dir).repartition(
        parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    )

    def expand(pdfs):
        import pyarrow.parquet as pq

        for pdf in pdfs:
            for p in pdf["value"].tolist():
                if not p:
                    continue
                out = pq.read_table(p).to_pandas()
                for c in out.columns:
                    if (
                        out[c].dtype.kind == "M"
                        and getattr(out[c].dtype, "tz", None) is None
                    ):
                        out[c] = out[c].dt.tz_localize("UTC")
                yield out

    return paths.mapInPandas(expand, schema=schema)


def versioned_dim_upsert(
    spark: SparkSession,
    batch_df: DataFrame,
    store_dir: str,
    key_cols: list[str],
    version_col: str,
    commit_id: int,
) -> None:
    """Concurrent-reader-safe SCD-1 merge (K2): latest `version_col`
    wins per key; each merge commits a NEW immutable `v_<commit_id>`
    directory + marker. Readers (`latest_dim_version`) always see a
    fully-committed snapshot — no absent-directory window."""
    final = os.path.join(store_dir, f"v_{commit_id:09d}")
    marker = os.path.join(store_dir, f"_ready_{commit_id:09d}")
    if os.path.exists(marker):  # replayed batch → already committed
        return
    if os.path.exists(final):
        # crashed between os.replace and the marker write: the atomic
        # rename IS the commit (same rule as idempotent_batch_writer);
        # re-running the merge would hit ENOTEMPTY on the existing
        # directory and crash-loop the stage on every restart. Heal
        # the marker and treat the batch as committed.
        open(marker, "w").close()
        return
    existing = latest_dim_version(spark, store_dir)
    # deterministic tiebreakers (round-9 advice): an update whose
    # envelope ts EQUALS the stored row's ts must win consistently —
    # prefer the incoming batch side; and two same-key same-ts updates
    # INSIDE one batch resolve by a content hash (arbitrary but
    # run-stable — never partition-order roulette)
    incoming = batch_df.withColumn("__src", F.lit(1))
    merged = (
        existing.withColumn("__src", F.lit(0)).unionByName(
            incoming, allowMissingColumns=True
        )
        if existing is not None
        else incoming
    )
    payload_cols = [
        c for c in merged.columns if c not in (*key_cols, version_col, "__src")
    ]
    order_cols = [F.desc(version_col), F.desc("__src")]
    if payload_cols:  # xxhash64() with zero children fails analysis; a
        # payload-less dim's ties are identical rows anyway
        order_cols.append(F.desc(F.xxhash64(*payload_cols)))
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    tmp = os.path.join(store_dir, f"_tmp_{commit_id:09d}")
    latest.write.mode("overwrite").parquet(tmp)
    os.replace(tmp, final)
    open(marker, "w").close()


def latest_dim_version(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Highest committed snapshot of a versioned dim store, or None."""
    if not os.path.isdir(store_dir):
        return None
    ready = sorted(
        f.removeprefix("_ready_")
        for f in os.listdir(store_dir)
        if f.startswith("_ready_")
    )
    if not ready:
        return None
    return spark.read.parquet(os.path.join(store_dir, f"v_{ready[-1]}"))


def _parse_payload(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P1/P2 permissive payload parse: JSON → map<string,string>, then
    explicit casts (absent keys → null, the reference's fastjson
    leniency)."""
    m = F.from_json(F.col("value"), "map<string,string>")
    return df.select(
        *[m.getItem(k).cast(t).alias(k) for k, t in casts.items()],
        F.col("ts"),
    )


class FiveLayerTopology:
    """The five concurrently-running stages, directory-chained.

    Lifecycle: `start()` → feed CDC JSON into `in_dir` → `drain()`
    (topological processAllAvailable — deterministic test barrier; a
    production deployment just lets the triggers run) → `ads_result()`.
    Any stage can be stopped and restarted mid-run via
    `stop_stage`/`start_stage`; its checkpoint resumes it and the
    idempotent topic commits make replays no-ops.
    """

    STAGES = ("ods", "dim", "dwd", "dws", "ads", "dau")

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        trigger_seconds: float = TRIGGER_SECONDS,
        split_arrival: bool = False,
        compact_every: int = 32,
    ) -> None:
        self.spark = spark
        self.root = root
        self.trigger = trigger_seconds
        self.split_arrival = split_arrival
        # ADS/DAU partials fold into a base snapshot on this cadence
        # (shared protocol, streaming/compaction.py) — an always-on
        # topology would otherwise re-read every committed partial per
        # report, O(batches²) I/O over an unbounded run
        self.compact_every = compact_every
        self.in_dir = os.path.join(root, "in")
        self.in_start_dir = os.path.join(root, "in_start")  # start-log topic
        self.ods_dirs = {
            t: os.path.join(root, "ods", f"ods_{t}")
            for t in ("order_info", "order_detail", "sku_info")
        }
        self.dwd_info_dir = os.path.join(root, "dwd_order_info")
        self.dwd_detail_dir = os.path.join(root, "dwd_order_detail")
        self.dws_dir = os.path.join(root, "dws_order_wide")
        self.dim_store = os.path.join(root, "dim_sku")
        self.ads_dir = os.path.join(root, "ads_partials")
        self.ads_base_dir = self.ads_dir + "_base"
        self.ads_keys_dir = os.path.join(root, "ads_seen_keys")
        self.dau_dir = os.path.join(root, "dau_members")
        self.dau_base_dir = self.dau_dir + "_base"
        for d in (
            [self.in_dir, self.in_start_dir, self.dwd_info_dir,
             self.dwd_detail_dir, self.dws_dir, self.dim_store,
             self.ads_dir, self.ads_keys_dir, self.dau_dir]
            + list(self.ods_dirs.values())
        ):
            os.makedirs(d, exist_ok=True)
        self._queries: dict = {}
        self._conf_cm = None

    # ---- stage definitions -------------------------------------------

    def _start_ods(self):
        """ODS router: CDC envelope in, per-table topic fan-out (P9/P10;
        KafkaToODS_M.scala:45-71). One persist, three filtered commits
        (T8 — each topic write reuses the cached routed batch)."""
        writers = {t: topic_append_writer(d) for t, d in self.ods_dirs.items()}

        def process(batch_df: DataFrame, batch_id: int) -> None:
            routed = route_cdc(batch_df).select(
                "topic", "table", "type",
                F.to_json(F.col("data")).alias("value"), "ts",
            )
            routed.persist()
            try:
                for t, w in writers.items():
                    w(routed.filter(F.col("topic") == f"ods_{t}")
                           .drop("topic"), batch_id)
            finally:
                routed.unpersist()

        return self._foreach_batch_query(
            "ods", cdc_json_stream(self.spark, self.in_dir), process
        )

    def _start_dim(self):
        """DIM upsert (K2; dim/SkuInfoApp.scala): sku CDC → versioned
        SCD-1 store, latest envelope ts wins per key."""
        src = topic_stream(
            self.spark, self.ods_dirs["sku_info"], ODS_RECORD_SCHEMA
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            parsed = _parse_payload(
                batch_df,
                {"p_partkey": "long", "p_brand": "string", "p_name": "string"},
            )
            versioned_dim_upsert(
                self.spark, parsed, self.dim_store,
                key_cols=["p_partkey"], version_col="ts", commit_id=batch_id,
            )

        return self._foreach_batch_query("dim", src, process)

    def _start_dwd(self):
        """DWD typed enrich (P1-P4; dwd/Ods_to_DWD_order_info.scala +
        dwd/OrderDetailApp.scala as one fan-out): parse both fact
        topics, stamp the shared CDC create-time as the event-time
        column, emit typed header/detail topics."""
        src = topic_stream(
            self.spark,
            os.path.join(self.root, "ods", "ods_order_{info,detail}"),
            ODS_RECORD_SCHEMA,
        )
        info_w = topic_append_writer(self.dwd_info_dir)
        detail_w = topic_append_writer(self.dwd_detail_dir)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                info_casts = {
                    "o_orderkey": "long",
                    "o_custkey": "long",
                    "o_totalprice": "double",
                }
                split_cols = []
                if self.split_arrival:
                    # original_total_amount analog: order_info carries
                    # the detail-weight total + count at creation
                    info_casts |= {
                        "o_weight_total": "double",
                        "o_detail_count": "int",
                    }
                    split_cols = ["o_weight_total", "o_detail_count"]
                info = _parse_payload(
                    batch_df.filter(F.col("table") == "order_info"),
                    info_casts,
                ).select(
                    "o_orderkey", "o_custkey", "o_totalprice",
                    F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
                     .alias("order_dt"),
                    F.timestamp_millis(F.col("ts")).alias("o_commit_ts"),
                    *split_cols,
                )
                detail = _parse_payload(
                    batch_df.filter(F.col("table") == "order_detail"),
                    {
                        "l_orderkey": "long",
                        "l_linenumber": "int",
                        "l_partkey": "long",
                        "l_suppkey": "long",
                        "l_quantity": "double",
                        "l_extendedprice": "double",
                    },
                ).select(
                    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                    "l_quantity", "l_extendedprice",
                    F.timestamp_millis(F.col("ts")).alias("l_commit_ts"),
                )
                info_w(info, batch_id)
                detail_w(detail, batch_id)
            finally:
                batch_df.unpersist()

        return self._foreach_batch_query("dwd", src, process)

    def _start_dws(self):
        """DWS order-wide: watermarked stream-stream time-range join
        (J1; OrderWiderApp.scala:117-199), state bounded to the 50 s
        tolerance, every header×detail pair emitted exactly once."""
        from realtime0523_spark.streaming.order_wide import streaming_order_wide

        info_schema = (
            DWD_ORDER_INFO_SCHEMA_SPLIT
            if self.split_arrival
            else DWD_ORDER_INFO_SCHEMA
        )
        o = topic_stream(self.spark, self.dwd_info_dir, info_schema)
        d = topic_stream(
            self.spark, self.dwd_detail_dir, DWD_ORDER_DETAIL_SCHEMA
        )
        extra = (
            ["o_weight_total", "o_detail_count"]
            if self.split_arrival
            else []
        )
        # l_commit_ts rides on the DWS topic in BOTH modes: split mode
        # feeds it to the running-sum allocation's watermark, per-batch
        # mode to the co-arrival guard's event-time horizon (round-12)
        wide = streaming_order_wide(
            o, d,
            order_ts="o_commit_ts",
            detail_ts="l_commit_ts",
            tolerance=JOIN_TOLERANCE,
        ).select(
            "o_orderkey", "o_custkey", "o_totalprice", "order_dt",
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_commit_ts", *extra,
        )
        writer = topic_append_writer(self.dws_dir)
        return self._foreach_batch_query("dws", wide, writer)

    def _require_dim(self) -> DataFrame:
        dim = latest_dim_version(self.spark, self.dim_store)
        if dim is None:
            raise RuntimeError(
                "ADS batch arrived before any committed dim snapshot — "
                "the topology contract (reference parity) is dims "
                "bootstrapped before facts flow; refusing to commit "
                "brand-less partials silently."
            )
        return dim

    # ---- partials compaction (round-11): the fold each family's
    # reader applies is distributive (a sum per brand; a set union of
    # member cells), so base ∪ fresh re-folded equals folding all
    # history — the shared-protocol legality condition ---------------

    @staticmethod
    def _ads_fold(df: DataFrame) -> DataFrame:
        from realtime0523_spark.streaming.ads import fold_brand_partials

        return fold_brand_partials(df)

    @staticmethod
    def _dau_fold(df: DataFrame) -> DataFrame:
        return df.select("dt", "mid").distinct()

    def _maybe_compact(self, partial_dir: str, base_dir: str, fold) -> None:
        # gc_grace: ads_result()/dau_result() may run CONCURRENTLY with
        # a live stage's compaction — one superseded generation is kept
        # so an in-flight reader's resolved snapshot stays scannable
        # (round-11 review; see compaction.compact_to_base)
        maybe_compact(
            self.spark, partial_dir, base_dir, fold, self.compact_every,
            gc_grace=True,
        )

    def _commit_brand_partial(
        self, alloc: DataFrame, batch_id: int, commit
    ) -> None:
        brand = F.broadcast(
            self._require_dim().select(
                F.col("p_partkey").alias("l_partkey"), "p_brand"
            )
        )
        partial = (
            alloc.join(brand, "l_partkey", "left")
            .groupBy("p_brand")
            .agg(F.sum("final_detail_amount").alias("partial_amount"))
        )
        commit(partial, batch_id)
        self._maybe_compact(self.ads_dir, self.ads_base_dir, self._ads_fold)

    def _start_ads(self):
        """ADS brand revenue (F1+J5+K5; ads/TradeMarkAmountApp.scala):
        brand enrich against the CURRENT committed dim snapshot (the
        reference's per-batch dim read), partial sums committed
        idempotently. Two allocation modes (module docstring):

        - default: per-batch exact-sum allocation, REQUIRING the
          co-arrival contract — now enforced at runtime: each batch's
          order-key set is committed (synopsis-sized, idempotent) and
          a key reappearing in a later batch RAISES, because the
          per-batch allocation would absorb the full o_totalprice in
          EACH fragment (silent double-count);
        - split_arrival: the reference's cross-batch running-sum
          state (streaming/allocation.py, bucketed keying) allocates
          each detail as it arrives — split feeds are CORRECT, no
          co-arrival needed."""
        commit = idempotent_batch_writer(self.ads_dir)

        if self.split_arrival:
            from realtime0523_spark.streaming.allocation import (
                streaming_allocation_split,
            )

            src = topic_stream(
                self.spark, self.dws_dir, DWS_WIDE_SCHEMA_SPLIT
            )
            alloc_stream = streaming_allocation_split(
                src, _DETAIL_ORDER, ts_col="l_commit_ts", n_buckets=32
            )

            def process_split(batch_df: DataFrame, batch_id: int) -> None:
                if batch_df.isEmpty():
                    return
                self._commit_brand_partial(batch_df, batch_id, commit)

            return self._foreach_batch_query(
                "ads", alloc_stream, process_split, output_mode="update"
            )

        src = topic_stream(self.spark, self.dws_dir, DWS_WIDE_SCHEMA)
        # CO-ARRIVAL GUARD (round-9 advice): the per-batch allocation
        # silently double-counts a split order, so a reappearing order
        # key is a loud contract failure (shared helper — the
        # registered streaming ADS query enforces the same contract).
        from realtime0523_spark.streaming.allocation import co_arrival_guard

        guard = co_arrival_guard(
            self.spark,
            self.ads_keys_dir,
            checkpoint_dir=os.path.join(self.root, "ckpt", "ads"),
            # event-time horizon (round-12): join tolerance (50 s) +
            # allocation state TTL (100 s) — a key last seen further
            # back in event time can't traverse the DWS watermarked
            # join again, so its log record is safely pruned at
            # compaction and the always-on key log stays
            # horizon-bounded instead of O(total distinct orders)
            horizon_ms=150_000,
            ts_col="l_commit_ts",
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            keys = batch_df.select("l_orderkey", "l_commit_ts")
            guard(keys, batch_id)
            alloc = allocate_order_amount(
                batch_df,
                order_key="l_orderkey",
                detail_order_by=_DETAIL_ORDER,
                weight="l_extendedprice",
                order_total="o_totalprice",
            )
            self._commit_brand_partial(alloc, batch_id, commit)

        return self._foreach_batch_query("ads", src, process)

    def _start_dau(self):
        """Sixth concurrent stage — the reference's Dau app at its
        faster cadence (scala/…/app/Dau.scala:42 Seconds(3);
        :104-123 Redis SADD + 24 h TTL): watermarked (dt, mid)
        dropDuplicates over the start-log feed, each batch's NEW
        members committed idempotently. The final count is a groupBy
        over committed members — associative, so batch boundaries,
        replays, and the mid-run restart cannot change it."""
        src = (
            self.spark.readStream.schema(START_LOG_SCHEMA)
            .json(self.in_start_dir)
            .select(
                F.col("mid"), F.timestamp_millis(F.col("ts")).alias("event_ts")
            )
            .withWatermark("event_ts", "24 hours")
            .select(
                F.date_format("event_ts", "yyyy-MM-dd").alias("dt"),
                "mid",
                "event_ts",
            )
            # WithinWatermark, not plain dropDuplicates: a subset
            # without the event-time column never evicts its state
            # (the 24 h TTL claim would be false and the always-on
            # stage would grow unboundedly — round-10 review finding).
            # At-most-once per (dt, mid) still holds because the
            # watermark delay equals the TTL: by the time a key's
            # state evicts (watermark > first_ts + 24 h), every
            # same-day event is below the watermark and drops as late
            # — post-TTL revisits are silently dropped, never
            # re-counted (requires TTL ≥ the day bucket width, which
            # streaming_dau validates)
            .dropDuplicatesWithinWatermark(["dt", "mid"])
            .select("dt", "mid")
        )
        commit = idempotent_batch_writer(self.dau_dir)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            commit(batch_df, batch_id)
            self._maybe_compact(self.dau_dir, self.dau_base_dir, self._dau_fold)

        return self._foreach_batch_query(
            "dau", src, process, trigger_ratio=DAU_TRIGGER_RATIO
        )

    # ---- lifecycle ----------------------------------------------------

    def _foreach_batch_query(
        self,
        name: str,
        stream: DataFrame,
        fn,
        trigger_ratio: float = 1.0,
        output_mode: str = "append",
    ):
        """Stages declare their own output mode (a stateful stage whose
        emissions are per-arrival passes 'update') — the helper never
        infers it from the stage name."""
        ckpt = os.path.join(self.root, "ckpt", name)
        return (
            stream.writeStream.foreachBatch(fn)
            .queryName(f"topology_{name}")
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{self.trigger * trigger_ratio} seconds")
            .start()
        )

    def start(self) -> "FiveLayerTopology":
        """Apply the streaming session confs (shuffle sizing, state
        provider selection — same knobs as runner._stream_shuffle) and
        start all five stages concurrently."""
        self._conf_cm = _stream_shuffle(self.spark, no_data_batches=True)
        self._conf_cm.__enter__()
        for name in self.STAGES:
            self.start_stage(name)
        return self

    def start_stage(self, name: str) -> None:
        if name in self._queries:
            raise ValueError(f"stage {name} already running")
        self._queries[name] = getattr(self, f"_start_{name}")()

    def stop_stage(self, name: str) -> None:
        q = self._queries.pop(name)
        try:
            # completeness is a loud contract (same discipline as
            # runner.run_to_memory's forbid_watermark_drops): the F1
            # allocation downstream assumes every header×detail pair
            # joined, so a DWS watermark drop must never pass silently.
            if name == "dws":
                dropped = watermark_drops(q)
                if dropped:
                    raise RuntimeError(
                        f"DWS join dropped {dropped} row(s) at the "
                        f"watermark — the topology's co-timed CDC feed "
                        f"contract (monotone envelope ts, shared "
                        f"header/detail create-time) was violated; the "
                        f"ADS totals would be silently short."
                    )
        finally:
            q.stop()

    def drain(self) -> None:
        """Deterministic barrier: processAllAvailable per stage in
        topological order (each stage's commits are visible files
        before the next stage's drain is asked). Stopped stages are
        skipped — their data waits in the upstream topic dirs."""
        for name in self.STAGES:
            q = self._queries.get(name)
            if q is not None:
                q.processAllAvailable()

    def stop(self) -> None:
        """Stop every stage and restore the session confs. A stage's
        contract failure (e.g. the DWS watermark-drop check) is
        re-raised AFTER all queries are stopped and the conf context
        is exited — a raised check must never leak a running query or
        leave the session's shuffle/state-store overrides behind."""
        first_err: Exception | None = None
        for name in list(self._queries):
            try:
                self.stop_stage(name)
            except Exception as e:  # noqa: BLE001 — collected, re-raised below
                if first_err is None:
                    first_err = e
        if self._conf_cm is not None:
            self._conf_cm.__exit__(None, None, None)
            self._conf_cm = None
        if first_err is not None:
            raise first_err

    # ---- results ------------------------------------------------------

    def ads_result(self) -> DataFrame:
        """Final brand totals: re-aggregation of the committed partials
        (associative — batch boundaries can't change it). Reads base ∪
        fresh via the compaction protocol, so the per-report cost is
        bounded by 1 + compact_every files whatever the horizon."""
        partials = committed_relation(self.spark, self.ads_dir, self.ads_base_dir)
        if partials is None:
            return self.spark.createDataFrame([], "p_brand string, amount double")
        return partials.groupBy("p_brand").agg(
            round2(F.sum("partial_amount")).alias("amount")
        )

    def dau_result(self) -> DataFrame:
        """Per-day distinct device counts from the committed member
        rows (each (dt, mid) committed at most once by the streaming
        dedup + idempotent batch writer; the distinct fold makes the
        compacted read idempotent to that same contract)."""
        members = committed_relation(self.spark, self.dau_dir, self.dau_base_dir)
        if members is None:
            return self.spark.createDataFrame([], "dt string, dau long")
        return self._dau_fold(members).groupBy("dt").agg(
            F.count(F.lit(1)).alias("dau")
        )
