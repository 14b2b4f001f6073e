"""Host-factor-normalized per-query gate comparison (round-14,
VERDICT r13 item #4: "the normalizer exists but nothing consumes it").

Compares a bench sidecar (BENCH_LOCAL_r{N}.json) against the unified
BASELINE.md results table, normalizing each query's ratio by the
sidecar's own `host_factor` probe stamp BEFORE flagging it against the
2x gate:

    flagged  iff  now_s > threshold * baseline_s * max(1.0, factor_q)

where factor_q is the host_factor metric the query's shape is most
sensitive to (BASELINE.md "Host-regime mechanism"):

- ``sched``  — many-short-jobs shapes: per-job ~165 ms scheduling
  fixed cost dominates at fixture scale. The dedup/ANN families,
  connected-components consumers, iterative graph queries, bootstrap
  resamples, prefix-sum scorers, and every streaming drain (one job
  per micro-batch plus feed prep).
- ``arrow``  — Python-kernel-dominated single-pass shapes: codec /
  multimodal decodes, tokenizer/encoder kernels, signature passes.
- ``shuffle`` — join/window-heavy JVM shapes: the TPC-H-style
  rollups, salted joins, retraction folds, windows.

The factor is FLOORED at 1.0: a host faster than the reference must
never hide a code regression — normalization can only excuse rows on
a demonstrably degraded host, and only by the probe's own measured
ratio for the matching shape.

Usage:
    python tools/perf_normalize.py BENCH_LOCAL_r14.json [--threshold 2.0]

Prints one line per flagged query (raw ratio, factor applied,
normalized ratio) and a summary; exit code 0 always (a reporting
tool, not a gate).
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shape classes by family prefix/substring, most-specific first.
# Anything unmatched defaults to "sched" when its baseline is under
# 1 s (sub-second rows are fixed-cost-dominated by construction) and
# "shuffle" otherwise (the JVM-heavy default — the least excusable
# class, so misclassification errs toward flagging).
_ARROW = (
    "media_", "docs_gzip", "docs_warc", "docs_zstd", "docs_lz4",
    "stream_warc", "docs_bpe", "docs_unigram", "docs_wordpiece",
    "docs_fingerprint", "docs_lang", "docs_chunk", "emb_sq_codes",
    "emb_pq_codes", "emb_rp_sketch",
)
_SCHED = (
    "docs_dedup", "docs_minhash", "docs_incremental", "docs_segment",
    "docs_leakage", "docs_corpus_prep", "docs_novelty", "emb_ann",
    "emb_semantic", "emb_dedup", "emb_cosine", "emb_hard",
    "parts_", "stream_", "customers_rfm", "event_value_bootstrap",
    "docs_dsir", "docs_curriculum", "docs_training_order",
    "lineitem_equidepth",
)


def classify(name: str, baseline_s: float) -> str:
    for p in _ARROW:
        if name.startswith(p):
            return "arrow_s"
    for p in _SCHED:
        if name.startswith(p):
            return "sched_s"
    return "sched_s" if baseline_s < 1.0 else "shuffle_s"


def read_baseline_table(path: str) -> dict[str, float]:
    """Parse the two-column '| name | sec | name | sec |' results
    table out of BASELINE.md."""
    rows: dict[str, float] = {}
    pat = re.compile(r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*")
    with open(path) as fh:
        in_results = False
        for line in fh:
            if line.startswith("## Measured results"):
                in_results = True
            if not in_results or not line.startswith("|"):
                continue
            for m in pat.finditer(line):
                rows[m.group(1)] = float(m.group(2))
    return rows


def main() -> None:
    sidecar_path = sys.argv[1]
    threshold = 2.0
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])
    with open(sidecar_path) as fh:
        side = json.load(fh)
    baseline = read_baseline_table(os.path.join(ROOT, "BASELINE.md"))
    hf = side.get("host_factor") or {}
    print(
        f"host_factor: {hf}  (floored at 1.0 per metric for gating)"
    )
    # Per-chunk sched probes (round-14): localize MID-RUN regime
    # drift. A query's chunk factor is its chunk's sched probe over
    # the run's best chunk — relative, so no absolute reference is
    # needed; applied only to sched-class rows (the shape the drift
    # mechanism hits hardest).
    chunk_rel: dict[str, float] = {}
    probes = [
        p for p in (side.get("chunk_probes") or [])
        if isinstance(p.get("sched_s"), (int, float))
    ]
    if probes:
        best = min(p["sched_s"] for p in probes)
        vals = sorted(round(p["sched_s"] / best, 2) for p in probes)
        print(f"chunk sched_s rel-to-best: {vals}")
        for p in probes:
            for q in p["queries"]:
                chunk_rel[q] = max(1.0, p["sched_s"] / best)
    flagged_raw, flagged_norm = [], []
    for name, now in sorted(side["queries"].items()):
        base = baseline.get(name)
        if not base:
            continue
        raw = now / base
        metric = classify(name, base)
        factor = max(1.0, float(hf.get(metric, 1.0)))
        if metric == "sched_s":
            factor *= chunk_rel.get(name, 1.0)
        norm = now / (base * factor)
        if raw > threshold:
            flagged_raw.append((name, raw, metric, factor, norm))
        if norm > threshold:
            flagged_norm.append((name, raw, metric, factor, norm))
    for name, raw, metric, factor, norm in flagged_raw:
        verdict = "STILL OVER" if norm > threshold else "excused by probe"
        print(
            f"  {name}: raw {raw:.2f}x  [{metric} factor {factor:.2f}] "
            f"-> normalized {norm:.2f}x  ({verdict})"
        )
    print(
        f"rows over {threshold}x raw: {len(flagged_raw)}; "
        f"after host-factor normalization: {len(flagged_norm)}"
    )


if __name__ == "__main__":
    main()
