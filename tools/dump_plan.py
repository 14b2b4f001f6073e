"""Dump `.explain("formatted")` for registered queries to files.

Usage: python tools/dump_plan.py OUT_DIR SUFFIX QUERY [QUERY...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query, executed against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 — the bench scale, so
the recorded shape is the one the bench measures). For iterative
operators (pagerank/kcore/BFS/label-prop) building the frame executes
the rounds; the captured plan is the returned frame over the final
checkpoint, which is exactly what the bench's timed action re-executes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _release_query_state  # noqa: E402
from realtime0523_spark.core.session import get_spark  # noqa: E402
from realtime0523_spark.plans.inventory import REGISTRY  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
        _release_query_state(spark)
    spark.stop()


if __name__ == "__main__":
    main()
