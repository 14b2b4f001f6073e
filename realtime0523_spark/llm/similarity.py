"""Embedding similarity search: brute-force cosine top-k (baseline)
and sign-LSH bucketed ANN (scale path).

Vectors are `array<float>` columns; all arithmetic is done in double
via JVM higher-order functions (`zip_with` + `aggregate`) — no Python
in the hot path, and the sequential left-fold matches DuckDB's
evaluation bitwise, enabling exact oracles on floats.

Scale: brute force is O(n·q) dot products — fine for reranking a
candidate set; the LSH path buckets vectors by hyperplane sign bits
(linear scan) and only scores within buckets. At 100 TB: broadcast
the (small) query set, never shuffle the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime0523_spark.operators.windows import topk_per_group


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Brute-force exact top-k neighbors per query vector (self-match
    excluded when ids collide). Queries are broadcast; the corpus is
    scanned once — no shuffle of the big side."""
    j = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = j.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return topk_per_group(
        scored, query_id_col, [F.desc("score"), F.col(id_col)], k, rank_col="rk"
    )


# --- sign-LSH (random hyperplanes with a deterministic portable PRNG) --

LSH_BITS = 4
LSH_TABLES = 8


def _plane_component(bit: int, dim: int) -> float:
    """Deterministic hyperplane component in [-0.5, 0.5): an LCG on
    (bit, dim) — reproducible anywhere, including plain SQL."""
    v = (1103515245 * (bit * 9973 + dim) + 12345) % 2147483648
    return v / 2147483648.0 - 0.5


def lsh_bucket(vec: Column, dims: int, bits: int = LSH_BITS, table: int = 0) -> Column:
    """Bucket id = sign bits of `bits` hyperplane projections; each
    hash table uses a disjoint hyperplane family."""
    total = F.lit(0).cast("bigint")
    for i in range(bits):
        plane = F.array(
            *[F.lit(_plane_component(table * bits + i, d)) for d in range(dims)]
        )
        proj = _dot(vec, plane)
        total = total + F.when(proj > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0))
    return total


def _lsh_table_entries(
    df: DataFrame, vec_col: str, dims: int, bits: int, tables: int
) -> DataFrame:
    """(row, table, bucket) entries for all hash tables in one pass —
    explode of a per-row bucket array, so candidate generation is a
    single equi-join on (table, bucket) regardless of L.

    All `tables*bits` projections are one Arrow-batched numpy matmul
    (a Pandas UDF): higher-order array functions are interpreted
    per-element in Spark, and profiling showed the 32-plane fold
    dominating the ANN path. Bucket ids are sign bits, so the
    float-backend difference vs the JVM fold is immaterial (ANN output
    is approximate by contract; recall is asserted in tests)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    planes = np.array(
        [
            [_plane_component(b, d) for d in range(dims)]
            for b in range(tables * bits)
        ]
    )  # (tables*bits, dims); row t*bits+i = bit i of table t
    weights = 1 << np.arange(bits)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf can't resolve the local pd import; the
    # returnType alone selects scalar eval.
    @F.pandas_udf(ArrayType(LongType()))
    def bucket_ids(v):
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dims)
        proj = mat @ planes.T  # (n, tables*bits)
        bits_m = (proj > 0).reshape(len(v), tables, bits)
        ids = (bits_m * weights).sum(axis=2).astype(np.int64)  # (n, tables)
        return pd.Series(list(ids))

    return df.select("*", F.posexplode(bucket_ids(F.col(vec_col))).alias("__t", "__bucket"))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 5,
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Multi-table sign-LSH approximate top-k.

    Candidates = corpus vectors sharing ANY of `tables` hash-table
    buckets with the query (per-bit collision prob p=1-θ/π ⇒ recall
    ≈ 1-(1-p^bits)^tables); exact cosine re-rank within candidates.
    More tables → higher recall, more candidates; more bits → smaller
    buckets. All candidate generation is one equi-join on
    (table, bucket) — never a cross join."""
    c = _lsh_table_entries(corpus, vec_col, dims, bits, tables)
    q = _lsh_table_entries(queries, query_vec_col, dims, bits, tables).select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.col("__t").alias("__qt"),
        F.col("__bucket").alias("__qbucket"),
    )
    cand = (
        c.join(
            F.broadcast(q),
            (F.col("__t") == F.col("__qt"))
            & (F.col("__bucket") == F.col("__qbucket"))
            & (F.col(id_col) != F.col(query_id_col)),
        )
        .select(query_id_col, id_col, vec_col, query_vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return topk_per_group(
        scored, query_id_col, [F.desc("score"), F.col(id_col)], k, rank_col="rk"
    )


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key
    (coarse cluster/IVF cell): equi-join on the block, exact cosine,
    keep pairs >= threshold. Blocking turns n² into Σ block²."""
    a = emb.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = emb.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "blk", "id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos_sim")
    )
    return scored.filter(F.col("cos_sim") >= threshold)
