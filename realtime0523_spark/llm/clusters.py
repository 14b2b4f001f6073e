"""Dedup clustering: connected components over near-dup pairs and
cluster-representative selection (the "which copy do we keep" step).

Pair generators (llm.dedup: exact, MinHash-LSH, SimHash; llm.similarity:
embedding near-dup) emit EDGES — (doc_a, doc_b) with doc_a < doc_b. A
training-data dedup must then group transitively-connected docs into
clusters and keep one representative per cluster; this module is that
step, as pure DataFrame iterations.

Algorithm: iterative min-label propagation. label(v) starts as v; each
round every node takes the min of its own label and its neighbors'
labels; fixpoint = every node holds the min doc_id of its component.
Rounds needed = graph diameter, and near-dup graphs are unions of
near-cliques (diameter 2-3 in practice), so 3-5 rounds close them.

Scale notes (100 TB):
- Each round is one equi-join (edges ⋈ labels on the neighbor id) plus
  one partial-agg'd groupBy min — both shuffle on doc_id, and AQE
  coalesces as components collapse.
- Lineage is truncated every round with localCheckpoint(): iterative
  plans otherwise grow exponentially and re-execute prior rounds.
- Convergence is detected by sum(label): labels only ever decrease, so
  an unchanged sum IS the fixpoint — one scalar aggregate per round,
  no driver-side diffing of label tables.
- For adversarial long-chain graphs (diameter ~ n), the documented
  upgrade is alternating large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), which converges in O(log n) rounds with the same
  join+min building blocks. Near-dup dedup does not need it; the
  `max_iter` guard raises rather than silently emitting a
  not-yet-converged labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc that appears in `pairs`,
    where cluster_id is the minimum doc_id of the doc's connected
    component. Docs with no near-dup edge are singletons by definition
    and are NOT emitted (callers treat absence as "own cluster") —
    this keeps the output proportional to the duplicate density, not
    the corpus.
    """
    sc = pairs.sparkSession.sparkContext

    def _ids() -> set:
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def _release(ids: set) -> None:
        # Superseded localCheckpoints stay pinned in the block manager
        # until the ContextCleaner happens to GC them — at 100 TB each
        # is a full labels-table snapshot, so an N-round propagation
        # would hold N snapshots of executor memory. Release eagerly;
        # the next checkpoint is already materialized, so nothing can
        # recompute through a released one.
        live = sc._jsc.getPersistentRDDs()
        for i in ids:
            rdd = live.get(i)
            if rdd is not None:
                rdd.unpersist(False)

    def _ckpt(df):
        before = _ids()
        out = df.localCheckpoint()  # eager: materializes now
        return out, _ids() - before

    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges, edge_ids = _ckpt(
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    )

    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    prev_sum = labels.agg(F.sum("label")).first()[0]
    if prev_sum is None:  # no edges at all
        _release(edge_ids)
        return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))

    def propagate(lbl):
        nbr_min = (
            edges.join(lbl.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        return lbl.join(nbr_min, "u", "left").select(
            "u",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )

    label_ids: set = set()
    for _ in range(max_iter):
        # two hops per convergence check: the check (sum) is a whole
        # Spark job whose fixed latency — not the tiny shuffle —
        # dominates a round, so pay it every OTHER hop; each hop still
        # checkpoints so no join input is ever evaluated twice. At
        # worst one wasted hop after the fixpoint.
        labels, ids1 = _ckpt(propagate(labels))
        _release(label_ids)
        labels, label_ids = _ckpt(propagate(labels))
        _release(ids1)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixpoint
            # edges are no longer needed; the final labels checkpoint
            # backs the returned DataFrame and is the ONE block that
            # must stay until the caller consumes it.
            _release(edge_ids)
            return labels.select(
                F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        f"the pair graph has diameter > {max_iter} (pathological chain) — "
        f"raise max_iter or switch to large-star/small-star contraction."
    )


def keep_best(
    docs: DataFrame,
    components: DataFrame,
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per cluster: the representative to keep (highest quality, ties
    to the smallest doc_id) and the member count. The other members are
    the dedup's drop set.

    One broadcast-able join (components ≪ corpus: only docs with a
    near-dup edge appear) + one groupBy cluster. The max_by tiebreak
    is encoded in a single struct-max: max of (quality, -doc_id)
    lexicographic == highest quality then smallest id — no window, no
    second shuffle.
    """
    member = docs.select(F.col(id_col).alias("doc_id"), F.col(quality_col)).join(
        F.broadcast(components), "doc_id"
    )
    best = F.max(
        F.struct(F.col(quality_col).alias("q"), (-F.col("doc_id")).alias("neg_id"))
    )
    return member.groupBy("cluster_id").agg(
        (-best.getField("neg_id")).alias("kept_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def dedup_filter(
    docs: DataFrame,
    components: DataFrame,
    quality_col: str = "quality_score",
    id_col: str = "doc_id",
) -> DataFrame:
    """The dedup itself: `docs` minus every non-representative cluster
    member. Singletons (no edge, hence no components row) pass through
    untouched; each cluster keeps exactly its `keep_best` row.

    Anti-join against the (small) drop set — at 100 TB the corpus is
    never shuffled: both the membership probe and the drop-set lookup
    broadcast the duplicate-density-sized side.
    """
    kept = keep_best(docs, components, quality_col, id_col)
    drop = components.join(
        F.broadcast(kept),
        (components.cluster_id == kept.cluster_id)
        & (components.doc_id == kept.kept_doc_id),
        "left_anti",
    ).select("doc_id")
    return docs.join(
        F.broadcast(drop), docs[id_col] == drop.doc_id, "left_anti"
    )
