"""Round-13 investigation tool for the Arrow/Python-path tax (round-12
verdict item #2): JVM-heavy queries reproduce their baselines exactly
while pandas_udf-heavy queries measure 2.6-5.2x in chunked sessions.

Runs ONE config variant per fresh subprocess/JVM (same regime as
bench.py --chunk) and prints a JSON line of fine-grained timings:

- per-iteration Arrow pandas_udf pass times (iter0 = includes Python
  worker spawn; steady-state = later iterations) — separates worker
  spawn cost from per-batch transfer cost;
- mapInPandas first-vs-repeat (the kernel shape the dedup family uses);
- tiny-job scheduling latency (30 x 32-task no-op jobs);
- raw os.fork+exit latency and /proc loadavg, as host-mode controls;
- count of live pyspark.daemon / worker processes after the Arrow
  stages (did worker reuse hold?).

Variants (select with argv[1]):
  base        — the engine's get_spark defaults
  noreuse     — spark.python.worker.reuse=false
  smallbatch  — arrow.maxRecordsPerBatch=2000
  bigbatch    — arrow.maxRecordsPerBatch=100000
  smallheap   — driver-memory 8g (full 64g heap vs GC/THP interaction)
  nolocal     — spark.locality.wait=0

Usage: python tools/arrow_tax_probe.py <variant>
       python tools/arrow_tax_probe.py --sweep   (all variants, each in
                                                  a fresh subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "noreuse": {"spark.python.worker.reuse": "false"},
    "smallbatch": {"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"},
    "bigbatch": {"spark.sql.execution.arrow.maxRecordsPerBatch": "100000"},
    "smallheap": {},  # handled via env below (driver memory is pre-JVM)
    "nolocal": {"spark.locality.wait": "0"},
}


def _worker_process_count() -> dict[str, int]:
    daemons = workers = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().replace(b"\x00", b" ").decode(errors="replace")
        except OSError:
            continue
        if "pyspark.daemon" in cmd:
            daemons += 1
        if "pyspark.worker" in cmd:
            workers += 1
    return {"daemons": daemons, "workers": workers}


def _fork_latency(n: int = 50) -> float:
    t0 = time.time()
    for _ in range(n):
        pid = os.fork()
        if pid == 0:
            os._exit(0)
        os.waitpid(pid, 0)
    return round(time.time() - t0, 4)


def run_variant(variant: str) -> None:
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from realtime0523_spark.core.session import get_spark

    out: dict = {"variant": variant, "load_before": os.getloadavg()[0]}
    out["fork_s_before"] = _fork_latency()

    t0 = time.time()
    spark = get_spark(
        f"tax-probe-{variant}", extra_conf=VARIANTS.get(variant, {})
    )
    out["session_start_s"] = round(time.time() - t0, 3)

    df = spark.range(0, 2_000_000, 1, 32)

    # --- JVM control: shuffle agg (should never show the tax) ---
    df.withColumn("k", F.col("id") % 1000).groupBy("k").count().count()
    t0 = time.time()
    for _ in range(3):
        df.withColumn("k", F.col("id") % 1000).groupBy("k").count().count()
    out["shuffle_s"] = round(time.time() - t0, 3)

    # --- Arrow scalar pandas_udf: per-iteration times ---
    @pandas_udf("double", PandasUDFType.SCALAR)
    def _scale(x):
        return x * 1.5

    arrow_iters = []
    for _ in range(5):
        t0 = time.time()
        df.select(F.sum(_scale(F.col("id").cast("double")))).collect()
        arrow_iters.append(round(time.time() - t0, 3))
    out["arrow_iters"] = arrow_iters  # iter0 includes worker spawn
    out["procs_after_arrow"] = _worker_process_count()

    # --- mapInPandas (the dedup-family kernel shape) ---
    def _ident(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    mip_iters = []
    for _ in range(4):
        t0 = time.time()
        df.mapInPandas(_ident, schema="n long").agg(F.sum("n")).collect()
        mip_iters.append(round(time.time() - t0, 3))
    out["mapinpandas_iters"] = mip_iters

    # --- tiny-job scheduling latency (JVM-only control #2) ---
    spark.range(0, 32, 1, 32).count()
    t0 = time.time()
    for _ in range(30):
        spark.range(0, 32, 1, 32).count()
    out["sched_s"] = round(time.time() - t0, 3)

    out["fork_s_after"] = _fork_latency()
    out["load_after"] = os.getloadavg()[0]
    spark.stop()
    print(json.dumps(out))


def sweep() -> None:
    for variant in VARIANTS:
        env = dict(os.environ)
        if variant == "smallheap":
            env["SPARK_GRAFT_DRIVER_MEM"] = "8g"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), variant],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        line = (r.stdout or "").strip().splitlines()
        print(line[-1] if line else json.dumps({"variant": variant, "error": r.returncode}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        sweep()
    else:
        run_variant(sys.argv[1] if len(sys.argv) > 1 else "base")
