"""Round-13 BASELINE re-record helper: take per-query minima across
one or more bench sidecar JSONs (all produced by bench.py's chunked
fresh-JVM pipeline — the SAME protocol the driver's BENCH_r{N} gate
runs) and rewrite BASELINE.md's results table in place.

Usage: python tools/baseline_rerecord.py SIDECAR.json [SIDECAR2.json ...]

The table is the block of `| q | s | q | s |` rows after the line
containing '| Query | sec | Query | sec |'. Every registered query
gets a row; per-query value = min across the given sidecars, rounded
to 2 dp. Prints the total and per-sidecar totals for the wave note.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime0523_spark.plans.inventory import REGISTRY


def main() -> None:
    sidecars = [json.load(open(p)) for p in sys.argv[1:]]
    if not sidecars:
        raise SystemExit("usage: baseline_rerecord.py SIDECAR.json ...")
    best: dict[str, float] = {}
    for sc in sidecars:
        for q, s in sc["queries"].items():
            best[q] = min(best.get(q, float("inf")), s)
    names = sorted(REGISTRY)
    missing = [n for n in names if n not in best]
    if missing:
        raise SystemExit(f"sidecars missing queries: {missing}")
    rows = []
    half = (len(names) + 1) // 2
    for i in range(half):
        left = names[i]
        right = names[half + i] if half + i < len(names) else None
        lcell = f"| {left} | {best[left]:.2f} "
        rcell = f"| {right} | {best[right]:.2f} |" if right else "| — | — |"
        rows.append(lcell + rcell)
    table = "\n".join(rows)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md")
    text = open(path).read()
    header = "| Query | sec | Query | sec |\n|---|---|---|---|\n"
    start = text.index(header)
    body_start = start + len(header)
    # the old table runs to the first non-table line
    end = body_start
    for line in text[body_start:].splitlines(keepends=True):
        if line.startswith("|"):
            end += len(line)
        else:
            break
    open(path, "w").write(text[:start] + header + table + "\n" + text[end:])
    total = sum(best.values())
    print(f"rows: {len(names)}  total(sum of minima): {total:.1f}s")
    for p, sc in zip(sys.argv[1:], sidecars):
        print(f"  {os.path.basename(p)}: total {sc['value']}s  "
              f"probe_before {sc.get('spark_probe_before')}  "
              f"probe_after {sc.get('spark_probe_after')}")


if __name__ == "__main__":
    main()
