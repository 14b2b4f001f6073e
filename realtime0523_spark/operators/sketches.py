"""Count-min sketch: bounded-memory frequency estimation and heavy
hitters (Cormode & Muthukrishnan, "An improved data stream summary:
the count-min sketch and its applications", J. Algorithms 2005).

Why a sketch when groupBy counts exactly: an exact per-key count table
is |vocab|-sized — for token/n-gram streams at 100 TB that is billions
of rows shuffled and held. The CMS state is a fixed depth×width grid
(e.g. 4×512 = 2 048 longs) REGARDLESS of vocabulary size, built with
one map-side-combined shuffle of at most depth×width×partitions rows,
and it merges by cell-wise addition — the shape that survives any
corpus size, and the same reason Spark itself ships
`count_min_sketch` for runtime filters.

Determinism: the d-th hash row is the d-th 8-hex-char slice of ONE
md5 digest per key (one hash call for all rows; slices are
independent 32-bit hashes by md5 avalanche) — identical arithmetic
exists in DuckDB, so unlike HLL (whose accuracy contract is the
checked surface, dau_approx) the CMS twins carry EXACT oracles.

Guarantee: estimate ≥ true count always (only hash collisions inflate,
never deflate); estimate ≤ true + εN with probability 1-δ for
width=⌈e/ε⌉, depth=⌈ln 1/δ⌉ — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(key: Column, d: int, width: int = CMS_WIDTH) -> Column:
    """Row-d bucket of a key: the d-th 8-hex-char slice of ONE md5
    digest, mod width. All depth rows share a single md5 call per key
    (digest slices are independent 32-bit hashes by md5 avalanche —
    the standard fewer-hashes construction, cf. Kirsch & Mitzenmacher
    2006), which quarters the per-token hash cost of the build scan."""
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1 + 8 * d, 8), 16, 10).cast("bigint"),
        F.lit(width),
    )


def _bucket_entries(key: Column, depth: int, width: int) -> Column:
    """array<struct<d,bucket>> — all depth rows for one key, so the
    sketch builds in ONE scan (no per-depth re-read of the input) and
    ONE digest (see cms_bucket). md5's 32 hex chars bound depth at 4."""
    if depth > 4:
        raise ValueError(f"depth {depth} > 4: one md5 digest yields 4 slices")
    digest = F.md5(key)
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.conv(F.substring(digest, 1 + 8 * d, 8), 16, 10).cast(
                        "bigint"
                    ),
                    F.lit(width),
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(d, bucket, cnt) sketch cells from one scan of `df`.

    Partial aggregation collapses each input partition to ≤ depth×width
    cells before the single shuffle; the result is the fixed-size grid
    (missing cells ≡ 0). Two sketches over disjoint data merge by
    summing cnt per (d, bucket) — a plain unionByName + re-groupBy."""
    entries = _bucket_entries(F.col(key_col), depth, width)
    return (
        df.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each row of `keys`: est = min over
    the depth rows of the key's cell counts (missing cell → 0).

    The sketch is grid-sized, so it broadcasts; the probe is a
    broadcast join + per-key min — map-shaped over any number of
    probe keys."""
    entries = _bucket_entries(F.col(key_col), depth, width)
    probes = keys.select(key_col, F.explode(entries).alias("e")).select(
        key_col, F.col("e.d").alias("d"), F.col("e.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_topk(
    df: DataFrame,
    key_col: str,
    k: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Heavy hitters by CMS estimate: build the sketch from the stream,
    probe it for the distinct keys, rank by (est DESC, key).

    The candidate set here is the distinct keys (exact-vocab probe —
    fine when the vocabulary is queryable); in a true streaming
    deployment the candidate set is whatever key sample is at hand and
    the sketch still answers in O(depth) per key from its fixed grid.
    Estimates are deterministic (md5 hashing), so the ranking carries
    an exact SQL oracle.

    Pass `sketch` to probe a grid built elsewhere — e.g. maintained
    incrementally by a streaming aggregation, or merged from several
    partial grids (build-anywhere / probe-anywhere is the point of a
    mergeable sketch)."""
    if sketch is None:
        sketch = cms_build(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    est = cms_estimate(keys, sketch, key_col, depth, width)
    # TakeOrdered prunes |vocab| → k distributed; the rank window then
    # only ever sees k rows (never a global sort of the vocabulary)
    return est.orderBy(F.desc("est"), F.col(key_col)).limit(k).withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("est"), F.col(key_col)))
    )
