"""KMV (k-minimum-values) distinct sketch and set-overlap estimation
(Bar-Yossef et al. RANDOM 2002; Beyer et al. SIGMOD 2007 "On synopses
for distinct value estimation under multiset operations").

The audience-overlap question — |A∩B| and Jaccard between user
segments — normally needs a distinct-pair join: at 100 TB that is a
shuffle of every (segment, user) pair and a join whose output is the
overlap itself. The KMV synopsis answers it from k values per
segment: hash users uniformly, keep the k smallest DISTINCT hash
values per segment; then for any pair, the k smallest of the merged
sketches (L) is a uniform sample of A∪B, |L ∩ S_A ∩ S_B|/k estimates
the Jaccard, and (k−1)/h_(k) estimates |A∪B| (h_(k) = largest kept
hash, normalized). Segments with fewer than k distinct members carry
their EXACT membership — the estimator degrades to exact counting.

Determinism: the hash is the first 12 hex chars of md5 (48 bits) —
identical builtins exist in DuckDB, so unlike HLL the oracle replays
the whole sketch EXACTLY (the same discipline as the CMS family in
operators/sketches.py). 48-bit ints normalize to doubles exactly
(division by 2^48 is a power-of-two scale), so the estimator
arithmetic is bit-identical across engines.

Scale shape: one Arrow pass builds bounded per-partition partials
(≤ |segments|·k values per partition, whatever the input size — the
property a groupBy/collect_set formulation does NOT have), then one
shuffle of P·|segments|·k partial rows finalizes. Sketches merge by
concat+sort+slice, so per-segment synopses are maintainable
incrementally and across days without re-scanning history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMV_K = 64
HASH_BITS = 48
HASH_SPACE = float(2**HASH_BITS)


def kmv_hash(key: Column) -> Column:
    """48-bit uniform hash: first 12 hex chars of md5, as bigint.
    DuckDB twin: CAST(('0x' || substr(md5(key), 1, 12)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("bigint")


def kmv_sketch(
    df: DataFrame, segment_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-segment KMV synopsis: (segment, v) rows, the k smallest
    distinct 48-bit hashes of `key_col` in each segment.

    Phase 1 (`mapInPandas`): per-partition partial sketches with
    HARD-BOUNDED state — a ≤k sorted unique array per segment per
    partition, folded batch-by-batch, so memory never depends on the
    partition's row count or distinct count. The global k-min is a
    subset of the union of per-partition k-mins, so no information is
    lost. Phase 2: one groupBy over the ≤ P·|segments|·k partial rows
    (collect_set here is bounded by construction, not by hope).
    """
    import numpy as np

    hashed = df.select(
        F.col(segment_col).cast("string").alias("seg"),
        kmv_hash(F.col(key_col).cast("string")).alias("v"),
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, object] = {}
        for pdf in batches:
            for seg, grp in pdf.groupby("seg"):
                v = grp["v"].to_numpy(dtype="int64")
                prev = acc.get(seg)
                merged = np.concatenate([prev, v]) if prev is not None else v
                acc[seg] = np.unique(merged)[:k]  # unique() sorts
        if acc:
            yield pd.DataFrame(
                {
                    "seg": np.repeat(
                        list(acc), [len(a) for a in acc.values()]
                    ),
                    "v": np.concatenate(list(acc.values()))
                    if acc
                    else np.array([], dtype="int64"),
                }
            )

    partials = hashed.mapInPandas(partial, "seg string, v long")
    return (
        partials.groupBy("seg")
        .agg(F.slice(F.array_sort(F.collect_set("v")), 1, k).alias("vs"))
        .select("seg", F.explode("vs").alias("v"))
    )


def kmv_overlap(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """All-pairs segment overlap from the (seg, v) sketch table:
    for each unordered pair, the merged-sketch union estimate,
    Jaccard estimate, and intersection estimate (Beyer et al. §4).
    The sketch table is ≤ |segments|·k rows, so every join below is a
    broadcast of a metadata-sized synopsis — the corpus is gone.

    When the merged sketch holds fewer than k values both segments
    were exhaustive, and the "estimates" are exact counts.
    """
    # The sketch fans out to four branches below (segments, union
    # candidates, and both intersection probes). Materialize it ONCE —
    # the triangle_counts lesson (operators/graph.py): an
    # unmaterialized multi-branch reuse re-runs the whole upstream
    # build per branch. The sketch is ≤ |segments|·k rows, so the
    # eager local checkpoint is metadata-sized.
    sketch = sketch.localCheckpoint(eager=True)
    spark = sketch.sparkSession
    # The segment list is metadata-sized BY CONTRACT (a synopsis per
    # segment); enumerate the unordered pairs driver-side rather than
    # planning a cartesian/nested-loop join the scale gate forbids.
    seg_names = sorted(r["seg"] for r in sketch.select("seg").distinct().collect())
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(seg_names) for b in seg_names[i + 1 :]],
        "seg_a string, seg_b string",
    )
    # merged union candidates via two equi-joins (broadcast hash, no
    # OR-condition nested loop), deduped by hash value
    ua = pairs.join(sketch.withColumnRenamed("seg", "seg_a"), "seg_a")
    ub = pairs.join(sketch.withColumnRenamed("seg", "seg_b"), "seg_b")
    u0 = (
        ua.select("seg_a", "seg_b", "v")
        .union(ub.select("seg_a", "seg_b", "v"))
        .distinct()
    )
    from pyspark.sql import Window as W

    ur = u0.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("seg_a", "seg_b").orderBy("v")
        ),
    )
    L = ur.filter(F.col("rn") <= k)
    stats = L.groupBy("seg_a", "seg_b").agg(
        F.count(F.lit(1)).alias("ku"), F.max("v").alias("hk")
    )
    sa = sketch.select(F.col("seg").alias("seg_a"), F.col("v").alias("v"))
    sb = sketch.select(F.col("seg").alias("seg_b"), F.col("v").alias("v"))
    inter = (
        L.join(sa, ["seg_a", "v"])
        .join(sb, ["seg_b", "v"])
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exhaustive = F.col("ku") < F.lit(k)
    union_est = F.when(exhaustive, F.col("ku").cast("double")).otherwise(
        (F.col("ku") - F.lit(1)).cast("double")
        / (F.col("hk").cast("double") / F.lit(HASH_SPACE))
    )
    jaccard = F.col("n_common").cast("double") / F.col("ku").cast("double")
    return (
        stats.join(inter, ["seg_a", "seg_b"], "left")
        .na.fill({"n_common": 0})
        .select(
            "seg_a",
            "seg_b",
            F.col("ku").cast("long").alias("ku"),
            F.round(union_est, 6).alias("union_est"),
            F.round(jaccard, 9).alias("jaccard_est"),
            F.round(jaccard * union_est, 6).alias("inter_est"),
        )
    )
