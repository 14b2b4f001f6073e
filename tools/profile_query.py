"""Per-query job/stage profile for optimization work (guide §1).

Usage: python tools/profile_query.py QUERY [SF_DIR] [N_PASSES]

Runs one registered query in a fresh engine session exactly the way
bench.py's chunk child does (sf0.001 warm-up, then timed passes with
the bench's own state release between passes), and prints per pass:

    wall seconds, #jobs, #stages, #tasks

On this host each Spark job carries a ~165 ms scheduling fixed cost
(BASELINE.md host-regime note), so "how many jobs does this query
launch" is a first-class optimization metric: a query whose wall time
is dominated by njobs * 0.165 is scheduling-bound, not compute-bound,
and the fix is fewer actions/checkpoints/batches, not faster kernels.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _release_query_state  # noqa: E402
from realtime0523_spark.core.session import get_spark  # noqa: E402
from realtime0523_spark.plans.inventory import REGISTRY  # noqa: E402


def _counts(sc) -> tuple[int, int, int]:
    """(jobs, stages, tasks) seen by the status tracker so far."""
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(None)
    stages = 0
    tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        stages += len(info.stageIds)
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                tasks += sinfo.numTasks
    return len(job_ids), stages, tasks


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spec = REGISTRY[name]
    spark = get_spark("profile")
    sc = spark.sparkContext
    try:
        spec.fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001 — warm-up is best-effort, like bench
        print(f"warm-up failed: {exc}", file=sys.stderr)
    _release_query_state(spark)
    for p in range(n_passes):
        j0, s0, t0 = _counts(sc)
        w0 = time.time()
        spec.fn(spark, sf_dir).count()
        wall = time.time() - w0
        j1, s1, t1 = _counts(sc)
        print(
            f"pass {p}: {wall:7.3f}s  jobs={j1 - j0:4d}  "
            f"stages={s1 - s0:4d}  tasks={t1 - t0:6d}",
            flush=True,
        )
        _release_query_state(spark)
    spark.stop()


if __name__ == "__main__":
    main()
