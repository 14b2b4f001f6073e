"""Round-13 investigation, part 2: reproduce the bench's chunk-of-16
protocol against single-query sessions on the SAME host state, for the
four perf-weak dedup/prep rows plus JVM-heavy controls — the round-12
verdict's unexplained 2-5x gap (`docs_minhash_lsh` 2.71 s single vs
13.14 s chunked, same HEAD).

Modes (argv[1]):
  single <name>   — bench estimator (sf0.001 warm-up + 2 measured
                    passes, per-query min) for ONE query in THIS fresh
                    JVM; prints JSON.
  chunk <names..> — bench's _run_chunk for the list, in THIS JVM, but
                    instrumented: per-query timings from BOTH passes,
                    python-worker process count + total worker RSS
                    after each query.
  --drive         — orchestrate: single sessions for the probe set,
                    then a 16-query chunk in a fresh subprocess.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = [
    "docs_minhash_lsh",
    "docs_leakage_split",
    "docs_incremental_dedup",
    "docs_corpus_prep",
    "parts_triangle_stats",  # JVM control
    "brand_amount",  # cheap control
]
# the exact registry-order 16-query chunk that contains docs_minhash_lsh
# is rebuilt by --drive from REGISTRY order, mirroring bench.py


def _workers() -> tuple[int, int]:
    count, rss_kb = 0, 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read()
            if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                continue
            with open(f"/proc/{pid}/status") as fh:
                for ln in fh:
                    if ln.startswith("VmRSS:"):
                        rss_kb += int(ln.split()[1])
                        break
            count += 1
        except OSError:
            continue
    return count, rss_kb


def single(name: str, sf_dir: str) -> None:
    from realtime0523_spark.core.session import get_spark
    from realtime0523_spark.plans.inventory import REGISTRY

    import bench

    spark = get_spark("single")
    spec = REGISTRY[name]
    try:
        spec.fn(spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    bench._release_query_state(spark)
    best = None
    for _ in range(2):
        t0 = time.time()
        spec.fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        bench._release_query_state(spark)
    print(json.dumps({"mode": "single", "query": name, "sec": round(best, 3)}))


def chunk(names: list[str], sf_dir: str) -> None:
    from realtime0523_spark.core.session import get_spark
    from realtime0523_spark.plans.inventory import REGISTRY

    import bench

    spark = get_spark("chunk")
    specs = [(n, REGISTRY[n]) for n in names]
    for name, spec in specs:
        try:
            spec.fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        bench._release_query_state(spark)
    rows = []
    for p in range(2):
        for name, spec in specs:
            t0 = time.time()
            spec.fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            bench._release_query_state(spark)
            wc, rss = _workers()
            rows.append(
                {"q": name, "pass": p, "sec": dt, "workers": wc,
                 "worker_rss_mb": rss // 1024}
            )
            print(json.dumps(rows[-1]), flush=True)
    best: dict[str, float] = {}
    for r in rows:
        best[r["q"]] = min(best.get(r["q"], 1e9), r["sec"])
    print(json.dumps({"mode": "chunk", "best": best}))


def drive() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    me = os.path.abspath(__file__)
    for name in PROBE:
        r = subprocess.run(
            [sys.executable, me, "single", name, sf_dir],
            capture_output=True, text=True, timeout=900,
        )
        for ln in (r.stdout or "").splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
    # the registry-order chunk containing docs_minhash_lsh, like bench.py
    from realtime0523_spark.plans.inventory import REGISTRY

    all_names = list(REGISTRY)
    idx = all_names.index("docs_minhash_lsh")
    start = (idx // 16) * 16
    names = all_names[start : start + 16]
    print(json.dumps({"chunk_names": names}), flush=True)
    r = subprocess.run(
        [sys.executable, me, "chunk", *names, sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    for ln in (r.stdout or "").splitlines():
        if ln.startswith("{"):
            print(ln, flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "single":
        single(sys.argv[2], sys.argv[3])
    elif sys.argv[1] == "chunk":
        chunk(sys.argv[2:-1], sys.argv[-1])
    else:
        drive()
