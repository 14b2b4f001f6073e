"""Measure count()-forced vs noop-sink timing per query (guide §1.4).

The bench forces each query with .count(); the optimizer may prune
columns (or whole subtrees) whose values don't affect the row count,
under-timing queries whose final projection is expensive — the noop
sink computes EVERY column of every row. This tool quantifies the gap
so the round can decide whether switching the bench's timed action
(VERDICT r13 item #9, a paired change with a BASELINE re-record) is
warranted.

Usage:
    python tools/noop_vs_count.py QUERY [QUERY...]
    python tools/noop_vs_count.py --top N     # N most expensive rows
                                              # from BENCH_LOCAL (plus
                                              # a pruning-risk sample)

One fresh session; per query: warm-up at sf0.001 (both actions), then
two measured passes of each action at $SPARK_GRAFT_SF_DIR with
per-action MIN (the bench's estimator). Prints one JSON line:
{name: {"count_s": .., "noop_s": .., "ratio": noop/count}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _release_query_state  # noqa: E402
from realtime0523_spark.core.session import get_spark  # noqa: E402
from realtime0523_spark.plans.inventory import REGISTRY  # noqa: E402


def _force_count(df) -> None:
    df.count()


def _force_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--top":
        import re

        n = int(args[1])
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sidecars = sorted(
            f for f in os.listdir(root)
            if re.fullmatch(r"BENCH_LOCAL_r\d+\.json", f)
        )
        with open(os.path.join(root, sidecars[-1])) as fh:
            q = json.load(fh)["queries"]
        names = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])[:n]]
    else:
        names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("noop-vs-count")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        for force in (_force_count, _force_noop):
            try:
                force(spec.fn(spark, "/root/testdata/sf0.001"))
            except Exception:
                pass
            _release_query_state(spark)
        res = {}
        for label, force in (("count_s", _force_count), ("noop_s", _force_noop)):
            best = None
            for _ in range(2):
                t0 = time.time()
                force(spec.fn(spark, sf_dir))
                dt = round(time.time() - t0, 3)
                best = dt if best is None or dt < best else best
                _release_query_state(spark)
            res[label] = best
        res["ratio"] = round(res["noop_s"] / res["count_s"], 3)
        out[name] = res
        print(f"  {name}: count {res['count_s']}s  noop {res['noop_s']}s  ratio {res['ratio']}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
