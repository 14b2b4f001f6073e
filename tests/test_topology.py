"""Five-layer CONCURRENT topology e2e — the round-8 verdict's capstone:
the suite proves every stage individually; this runs ODS → DIM → DWD →
DWS → ADS as one live topology (five queries in one session, directory
topics), with a mid-run restart of a middle stage, and asserts the
final ADS table equals the batch allocation+brand oracle on the same
data under BOTH state-store providers."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2
from realtime0523_spark.operators.allocation import allocate_order_amount
from realtime0523_spark.streaming.topology import (
    FiveLayerTopology,
    latest_dim_version,
)

TS0 = 1_750_000_000_000  # 2025-06-15, epoch ms — far from the epoch-0 watermark


# The hdfs-provider run uses the reference's real 5 s cadence
# (Seconds(5) in every gmall app); the rocksdb run drops to 0.5 s to
# bound suite wall-clock — trigger cadence is pacing, never semantics
# (every stage is either stateless-per-batch with idempotent commits or
# a watermarked join whose output is batch-boundary-free), so one
# full-cadence run plus one fast run covers both axes.
@pytest.fixture(
    params=[("hdfs", 5.0), ("rocksdb", 0.5)],
    ids=["hdfs-state-5s", "rocksdb-state-0.5s"],
)
def provider_and_trigger(request, monkeypatch):
    provider, trigger = request.param
    if provider == "rocksdb":
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "rocksdb")
    else:
        monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
    return provider, trigger


def _env(table: str, type_: str, data: dict, ts: int) -> str:
    return json.dumps(
        {"table": table, "type": type_,
         "data": {k: str(v) for k, v in data.items()}, "ts": ts}
    )


def _write_wave(in_dir: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(in_dir, f"_w_{name}.json")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, os.path.join(in_dir, f"{name}.json"))


def _brand(pk: int) -> str:
    return f"Brand#{chr(65 + pk % 3)}"


def _order_lines(orderkey: int, totalprice: float, details: list[tuple], ts: int):
    """Header + detail CDC rows sharing one create-time ts (the
    reference's co-timed header/detail contract)."""
    out = [_env("order_info", "insert",
                {"o_orderkey": orderkey, "o_custkey": 7000 + orderkey,
                 "o_totalprice": totalprice}, ts)]
    for ln, (pk, qty, price) in enumerate(details, start=1):
        out.append(_env("order_detail", "insert",
                        {"l_orderkey": orderkey, "l_linenumber": ln,
                         "l_partkey": pk, "l_suppkey": 10 + ln,
                         "l_quantity": qty, "l_extendedprice": price}, ts))
    return out


def _header_line_split(orderkey: int, totalprice: float, details: list[tuple],
                       ts: int) -> str:
    """Split-arrival header: carries the reference's original-total
    metadata (o_weight_total/o_detail_count — the original_total_amount
    analog order_info gets at creation)."""
    return _env("order_info", "insert",
                {"o_orderkey": orderkey, "o_custkey": 7000 + orderkey,
                 "o_totalprice": totalprice,
                 "o_weight_total": round(sum(p for _, _, p in details), 2),
                 "o_detail_count": len(details)}, ts)


def _detail_lines(orderkey: int, details: list[tuple], ts: int,
                  lines: slice) -> list[str]:
    out = []
    for ln, (pk, qty, price) in list(enumerate(details, start=1))[lines]:
        out.append(_env("order_detail", "insert",
                        {"l_orderkey": orderkey, "l_linenumber": ln,
                         "l_partkey": pk, "l_suppkey": 10 + ln,
                         "l_quantity": qty, "l_extendedprice": price}, ts))
    return out


def _start_log(mid: str, ts: int) -> str:
    return json.dumps({"mid": mid, "ts": ts})


WAVE1 = {  # orderkey -> (totalprice, [(partkey, qty, extendedprice), ...])
    101: (100.00, [(1, 2.0, 30.00), (2, 1.0, 50.00)]),
    102: (250.50, [(3, 4.0, 80.25), (4, 1.0, 99.99), (5, 2.0, 20.01)]),
    103: (77.77, [(6, 3.0, 77.77)]),
    104: (1000.00, [(1, 1.0, 333.33), (1, 1.0, 333.33), (2, 1.0, 333.34)]),
}
WAVE2 = {
    201: (500.00, [(2, 1.0, 100.00), (3, 1.0, 100.00), (4, 1.0, 100.00),
                   (5, 1.0, 100.00), (6, 1.0, 100.00)]),
    202: (19.99, [(1, 1.0, 19.99)]),
    203: (640.00, [(4, 8.0, 320.00), (5, 8.0, 320.00)]),
    204: (33.33, [(6, 1.0, 11.11), (3, 2.0, 22.22)]),
}


def _expected_brand_totals(spark, waves: list[dict]):
    """The batch oracle: the SAME allocation formulation over all fact
    rows at once, joined to the final dim — streaming must match it
    regardless of batch boundaries, concurrency, or the restart."""
    heads, dets = [], []
    for wave in waves:
        for ok, (total, details) in wave.items():
            heads.append((ok, total))
            for ln, (pk, qty, price) in enumerate(details, start=1):
                dets.append((ok, ln, pk, 10 + ln, qty, price))
    h = spark.createDataFrame(heads, "o_orderkey long, o_totalprice double")
    d = spark.createDataFrame(
        dets,
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double",
    )
    wide = h.join(d, h.o_orderkey == d.l_orderkey)
    alloc = allocate_order_amount(
        wide,
        order_key="l_orderkey",
        detail_order_by=["l_linenumber", "l_partkey", "l_suppkey",
                         "l_extendedprice", "l_quantity"],
        weight="l_extendedprice",
        order_total="o_totalprice",
    )
    brands = spark.createDataFrame(
        [(pk, _brand(pk)) for pk in range(1, 7)], "l_partkey long, p_brand string"
    )
    return (
        alloc.join(F.broadcast(brands), "l_partkey", "left")
        .groupBy("p_brand")
        .agg(round2(F.sum("final_detail_amount")).alias("amount"))
    )


def test_versioned_dim_upsert_heals_crash_between_rename_and_marker(
    spark, tmp_path
):
    """Crash window regression (round-9 review finding): if the
    process dies after the atomic os.replace but before the marker
    write, the replayed batch must treat the existing version dir as
    committed (heal the marker) instead of re-merging into ENOTEMPTY
    and crash-looping the DIM stage."""
    import pyspark.sql.functions as SF

    from realtime0523_spark.streaming.topology import (
        latest_dim_version,
        versioned_dim_upsert,
    )

    store = str(tmp_path / "dim")
    os.makedirs(store)
    batch = spark.createDataFrame(
        [(1, "Brand#A", "sku1", 100)], "p_partkey long, p_brand string, p_name string, ts long"
    )
    versioned_dim_upsert(spark, batch, store, ["p_partkey"], "ts", commit_id=0)
    # simulate the crash: version dir exists, marker lost
    os.remove(os.path.join(store, "_ready_000000000"))
    assert latest_dim_version(spark, store) is None  # reader sees no commit
    versioned_dim_upsert(spark, batch, store, ["p_partkey"], "ts", commit_id=0)
    healed = latest_dim_version(spark, store)
    assert healed is not None and healed.count() == 1
    assert healed.filter(SF.col("p_partkey") == 1).collect()[0]["p_name"] == "sku1"


def test_five_layer_topology_live_with_midrun_restart(
    spark, provider_and_trigger, tmp_path
):
    _provider, trigger = provider_and_trigger
    # compact_every=2 exercises the round-11 ADS/DAU partials
    # compaction inside the live topology (production default is 32)
    topo = FiveLayerTopology(
        spark, str(tmp_path / "topo"), trigger_seconds=trigger, compact_every=2
    )
    topo.start()
    try:
        # ---- wave 0: dim bootstrap + router junk -----------------------
        dim_lines = [
            _env("sku_info", "insert",
                 {"p_partkey": pk, "p_brand": _brand(pk), "p_name": f"sku{pk}"},
                 TS0 - 10_000 + pk)
            for pk in range(1, 7)
        ]
        junk = [
            _env("order_info", "update", {"o_orderkey": 999}, TS0),  # fact non-insert
            _env("order_info", "insert", {}, TS0),                   # empty payload
            _env("not_a_table", "insert", {"x": 1}, TS0),            # unrouted table
        ]
        _write_wave(topo.in_dir, "wave0", dim_lines + junk)
        topo.drain()
        dim = latest_dim_version(spark, topo.dim_store)
        assert dim is not None and dim.count() == 6
        # the router dropped all three junk rows: no fact topic commits yet
        assert not [f for f in os.listdir(topo.ods_dirs["order_info"])
                    if f.startswith("manifest_")]

        # ---- wave 1: facts flow through all five live stages; the DAU
        # stage (sixth, 3/5 cadence) consumes its own start-log topic
        # concurrently, with an in-wave duplicate mid ------------------
        lines = []
        for i, (ok, (total, details)) in enumerate(sorted(WAVE1.items())):
            lines += _order_lines(ok, total, details, TS0 + i * 1000)
        _write_wave(topo.in_dir, "wave1", lines)
        _write_wave(topo.in_start_dir, "start1",
                    [_start_log("m1", TS0), _start_log("m2", TS0 + 500),
                     _start_log("m1", TS0 + 900)])
        topo.drain()
        got1 = sorted(map(tuple, topo.ads_result().collect()))
        want1 = sorted(map(tuple, _expected_brand_totals(spark, [WAVE1]).collect()))
        assert got1 == want1 and len(got1) == 3
        assert sorted(map(tuple, topo.dau_result().collect())) == [
            ("2025-06-15", 2)
        ]

        # ---- mid-run restart of a MIDDLE stage (dwd) AND the dau
        # stage: both must resume from their checkpoints ---------------
        topo.stop_stage("dau")
        topo.stop_stage("dwd")
        lines = [
            # SCD-1 update: sku 1 renamed (brand unchanged → totals stable)
            _env("sku_info", "update",
                 {"p_partkey": 1, "p_brand": _brand(1), "p_name": "sku1-renamed"},
                 TS0 + 3_599_000),
        ]
        for i, (ok, (total, details)) in enumerate(sorted(WAVE2.items())):
            lines += _order_lines(ok, total, details, TS0 + 3_600_000 + i * 1000)
        _write_wave(topo.in_dir, "wave2", lines)
        topo.drain()  # ODS routes + DIM upserts; facts WAIT in the ods topics
        # DWD is genuinely in the path: ADS unchanged while it is down,
        # but the dim stage (independent branch) has committed the update
        assert sorted(map(tuple, topo.ads_result().collect())) == got1
        dim2 = latest_dim_version(spark, topo.dim_store)
        assert dim2.filter(F.col("p_partkey") == 1).collect()[0]["p_name"] == (
            "sku1-renamed"
        )

        # start-log wave 2 lands while the dau stage is DOWN: a
        # cross-wave duplicate (m2) plus a fresh mid (m3)
        _write_wave(topo.in_start_dir, "start2",
                    [_start_log("m2", TS0 + 3_600_000),
                     _start_log("m3", TS0 + 3_601_000)])
        topo.drain()
        assert sorted(map(tuple, topo.dau_result().collect())) == [
            ("2025-06-15", 2)  # unchanged while the stage is down
        ]

        topo.start_stage("dwd")  # resumes from its checkpoint
        topo.start_stage("dau")  # dedup state resumes: m2 stays deduped
        topo.drain()
        got = sorted(map(tuple, topo.ads_result().collect()))
        want = sorted(
            map(tuple, _expected_brand_totals(spark, [WAVE1, WAVE2]).collect())
        )
        assert got == want and len(got) == 3
        # DAU across both incarnations: {m1, m2, m3} on the single day
        # — the cross-wave duplicate absorbed by the restored state
        assert sorted(map(tuple, topo.dau_result().collect())) == [
            ("2025-06-15", 3)
        ]

        # the DWD stage processed batches across TWO query incarnations
        manifests = [f for f in os.listdir(topo.dwd_info_dir)
                     if f.startswith("manifest_")]
        assert len(manifests) >= 2
        # manifest commit (round-11): batches may span MULTIPLE part
        # files — the listed files exist and no reader-visible data
        # files sit outside the manifest protocol
        listed = []
        for m in manifests:
            with open(os.path.join(topo.dwd_info_dir, m)) as fh:
                listed += [ln for ln in fh.read().splitlines() if ln]
        assert listed and all(os.path.exists(p) for p in listed)

        # round-11: the ADS and DAU partials COMPACTED on the 2-batch
        # cadence with grace-mode GC (concurrent readers keep one
        # superseded generation) — the per-report READ stays flat:
        # the newest base + fewer fresh partials than the threshold;
        # at-rest files are bounded by two generations, never O(batches)
        from realtime0523_spark.streaming.compaction import (
            base_watermark,
            partial_ids,
        )

        for pdir, bdir in ((topo.ads_dir, topo.ads_base_dir),
                           (topo.dau_dir, topo.dau_base_dir)):
            bases = [f for f in os.listdir(bdir) if f.startswith("v_")]
            assert 1 <= len(bases) <= 2
            wm = base_watermark(bdir)
            assert wm >= 0
            fresh = [i for i in partial_ids(pdir) if i > wm]
            assert len(fresh) < 2  # read set: newest base + <threshold
            assert len(partial_ids(pdir)) <= 2 * 2  # two generations max
    finally:
        topo.stop()


SPLIT_WAVE = {  # orderkey -> (totalprice, [(partkey, qty, extendedprice), ...])
    301: (100.00, [(1, 1.0, 30.00), (2, 1.0, 30.00), (3, 1.0, 30.00)]),
    302: (250.50, [(3, 4.0, 80.25), (4, 1.0, 99.99), (5, 2.0, 20.01)]),
    303: (77.77, [(6, 3.0, 77.77)]),
    304: (19.99, [(1, 1.0, 3.33), (2, 1.0, 3.33), (4, 1.0, 3.34),
                  (5, 1.0, 6.66)]),
}


def _dim_wave():
    return [
        _env("sku_info", "insert",
             {"p_partkey": pk, "p_brand": _brand(pk), "p_name": f"sku{pk}"},
             TS0 - 10_000 + pk)
        for pk in range(1, 7)
    ]


def test_topology_split_arrival_allocation_correct(spark, tmp_path):
    """split_arrival=True: every order's detail rows are DELIBERATELY
    split across two CDC input files (headers + first detail, then the
    rest) — the cross-batch running-sum ADS stage must still equal the
    batch allocation+brand oracle exactly (the feed shape the default
    per-batch mode refuses)."""
    topo = FiveLayerTopology(
        spark, str(tmp_path / "topo"), trigger_seconds=0.5, split_arrival=True
    )
    topo.start()
    try:
        _write_wave(topo.in_dir, "wave0", _dim_wave())
        topo.drain()
        # wave 1: headers (with original-total metadata) + FIRST detail
        lines = []
        for i, (ok, (total, details)) in enumerate(sorted(SPLIT_WAVE.items())):
            ts = TS0 + i * 1000
            lines.append(_header_line_split(ok, total, details, ts))
            lines += _detail_lines(ok, details, ts, slice(0, 1))
        _write_wave(topo.in_dir, "wave1", lines)
        topo.drain()
        # wave 2: the remaining details, co-timed with their order
        lines = []
        for i, (ok, (total, details)) in enumerate(sorted(SPLIT_WAVE.items())):
            lines += _detail_lines(ok, details, TS0 + i * 1000, slice(1, None))
        _write_wave(topo.in_dir, "wave2", lines)
        topo.drain()
        got = sorted(map(tuple, topo.ads_result().collect()))
        want = sorted(
            map(tuple, _expected_brand_totals(spark, [SPLIT_WAVE]).collect())
        )
        assert got == want
    finally:
        topo.stop()


def test_topology_default_mode_guard_refuses_split_feed(spark, tmp_path):
    """Default (per-batch) mode must RAISE on a split-arrival feed —
    the round-9 advice item: the co-arrival contract is a runtime
    guard now, not a docstring. Without the guard the totals would be
    silently inflated (each fragment absorbs the full o_totalprice)."""
    topo = FiveLayerTopology(spark, str(tmp_path / "topo"), trigger_seconds=0.5)
    topo.start()
    try:
        _write_wave(topo.in_dir, "wave0", _dim_wave())
        topo.drain()
        ok, (total, details) = 301, SPLIT_WAVE[301]
        lines = [_env("order_info", "insert",
                      {"o_orderkey": ok, "o_custkey": 7301,
                       "o_totalprice": total}, TS0)]
        lines += _detail_lines(ok, details, TS0, slice(0, 1))
        _write_wave(topo.in_dir, "wave1", lines)
        topo.drain()
        _write_wave(topo.in_dir, "wave2",
                    _detail_lines(ok, details, TS0, slice(1, None)))
        with pytest.raises(Exception, match="co-arrival contract violated"):
            topo.drain()
            topo.stop_stage("ads")
    finally:
        try:
            topo.stop()
        except Exception:
            pass  # the guard failure is the asserted behavior


def test_topic_manifest_commit_multifile_roundtrip(spark, tmp_path):
    """Round-11 manifest commit: a multi-partition batch commits as
    SEVERAL part files published by ONE atomically-renamed manifest
    (no coalesce(1) single-writer bottleneck); the manifest stream
    delivers exactly the committed rows — timestamps preserved under
    a non-UTC session TZ (the kernel localizes parquet's UTC instants)
    — replays are no-ops, an unpublished data dir (crash before the
    manifest rename) is invisible, and a reader running CONCURRENTLY
    with the writer picks up each batch only once its manifest lands."""
    from realtime0523_spark.streaming.runner import _stream_shuffle
    from realtime0523_spark.streaming.topology import (
        topic_append_writer,
        topic_stream,
    )

    out = str(tmp_path / "topic")
    w = topic_append_writer(out)
    df = spark.range(0, 100, 1, 8).selectExpr(
        "id AS k", "timestamp_millis(1750000000000 + id * 1000) AS ts"
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        w(df, 0)
        manifest = os.path.join(out, "manifest_000000000.txt")
        listed = [ln for ln in open(manifest).read().splitlines() if ln]
        assert len(listed) == 8  # natural parallelism, not coalesce(1)
        assert all(os.path.exists(p) for p in listed)
        first_stat = os.stat(manifest).st_mtime_ns
        w(df, 0)  # replay → no-op by manifest
        assert os.stat(manifest).st_mtime_ns == first_stat
        # crash shape: data written but manifest never published → the
        # batch is invisible to readers
        df.limit(3).write.mode("overwrite").parquet(
            os.path.join(out, "_data", "batch_000000007")
        )
        with _stream_shuffle(spark, no_data_batches=True):
            q = (
                topic_stream(spark, out, "k long, ts timestamp")
                .writeStream.format("memory")
                .queryName("topic_rt")
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
                assert spark.table("topic_rt").count() == 100
                # concurrent append: a second batch committed while the
                # reader runs becomes visible at its manifest, atomically
                w(df.selectExpr("k + 1000 AS k", "ts"), 1)
                q.processAllAvailable()
                got = spark.table("topic_rt")
                assert got.count() == 200
                want = sorted(
                    map(tuple, df.union(
                        df.selectExpr("k + 1000 AS k", "ts")).collect())
                )
                assert sorted(map(tuple, got.collect())) == want
            finally:
                q.stop()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
