"""Graph centrality over DataFrame edge tables.

PageRank is the quality-weighting signal web-corpus pipelines attach
to crawled documents (Common Crawl publishes harmonic-centrality /
PageRank rankings for exactly this use; CCNet-era filtering keys on
them). The reference engine has no graph operator; this is part of
the beyond-reference surface for training-data curation, expressed as
the canonical distributed power iteration: per-round one equi-join of
ranks onto edges and one partial-agg'd groupBy on the destination —
the shapes that hold at any scale (GraphX's Pregel PageRank reduces
to the same join+agg per superstep).

Exactness contract (what makes the operator ORACLE-replayable): the
iteration runs in INTEGER FIXED POINT. Ranks are BIGINTs scaled by
`scale`; each round computes

    contrib(e: u→v) = rank_fp(u) div out_deg(u)
    rank_fp'(v)     = ((100 - damping_pct) * scale) div 100
                      + (damping_pct * Σ contrib) div 100

with integer (floor) division throughout. Every engine computes the
identical BIGINTs — no float summation order to drift, no rounding
contract to document beyond "div means floor division". The quantized
mass lost to flooring is ≤ 1/scale per edge per round (≈ 1e-12
relative at the default scale) — far below any ranking-relevant
difference, and deterministic.

Overflow envelope: Σ ranks ≈ N·scale must stay below 2^63/100.
scale=1e12 holds to ~90 M nodes; a billion-node web graph uses
scale=1e6 (micro-rank units) with head-room to 10^11 nodes. The
operator asserts the envelope from the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime0523_spark.llm.clusters import _ckpt_tools

PAGERANK_SCALE = 10**12
PAGERANK_DAMPING_PCT = 85
PAGERANK_ITERS = 5


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct both-direction part pairs sharing an order — the
    co-occurrence graph (src, dst). The per-order self-join fans out
    by order size squared; order sizes are bounded (TPC-H ≤ 7 items,
    real carts similar), so the explode is a constant factor, and the
    join is an equi-join on the order key, never cartesian."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = PAGERANK_ITERS,
    damping_pct: int = PAGERANK_DAMPING_PCT,
    scale: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an (src, dst) edge table in
    exact integer fixed point (see module docstring). Returns
    (node, rank_fp) for every node that appears in the edge table.

    With `seeds` (a 1-column `node` frame), this is PERSONALIZED
    PageRank (Haveliwala, WWW 2002): the teleport term lands only on
    the seed set — rank becomes proximity TO THE SEEDS through the
    graph, the related-items / recommendation primitive (Pixie-style
    item-item recs run exactly this on the co-occurrence graph).
    Seeds init at `scale` and receive the (1−d) teleport mass each
    round; every other node starts at 0 and accrues only flowed mass.

    Every node needs an out-edge (true for symmetric co-occurrence
    graphs); a directed graph with dangling nodes must add self-loops
    or sink-redistribution edges first — the operator raises rather
    than silently leaking their mass.

    Scale shape per round: ranks equi-join edges on src (at rest,
    pre-partition both by the join key and the join is co-located),
    one partial-agg'd sum groupBy on dst, one left join back to the
    node set. Rounds localCheckpoint alternately with eager release
    of the superseded snapshot (the clusters.py discipline), so plan
    depth and executor memory stay O(1) in n_iter. The seed flag
    rides the node set, so personalization adds zero extra joins."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    ckpt, release = _ckpt_tools(edges)
    # materialize the graph ONCE: edges, degrees, and the node set are
    # read in every round (and by the guards below) — without this the
    # whole upstream edge derivation (e.g. the lineitem self-join)
    # recomputes per iteration. Measured 8× on the co-purchase query.
    edges, e_ids = ckpt(edges.select("src", "dst"))
    deg, d_ids = ckpt(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    )
    nodes, n_ids = ckpt(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    graph_ids = e_ids | d_ids | n_ids
    try:
        dangling = (
            nodes.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .limit(1)
            .count()
        )
        if dangling:
            raise ValueError(
                "pagerank_fixed_point: graph has dangling nodes (no "
                "out-edges); add self-loops or redistribution edges — "
                "silent mass leak refused."
            )
        n_nodes = nodes.count()
        if scale is None:
            # auto: the largest power of 10 that keeps total mass × 100
            # inside int64, capped at the default so small graphs keep
            # the canonical (oracle-replayed) resolution; a billion-node
            # web graph lands at micro-rank units automatically
            safe = (2**63 // 100) // max(n_nodes, 1)
            auto = 10 ** max(0, len(str(safe)) - 1)
            scale = min(PAGERANK_SCALE, auto)
            if scale < 10**6:
                raise ValueError(
                    f"auto fixed-point scale degraded below 1e6 "
                    f"({n_nodes} nodes) — rank resolution too coarse; "
                    f"partition the graph or pass `scale` explicitly."
                )
        elif n_nodes * scale >= 2**63 // 100:
            raise ValueError(
                f"fixed-point overflow envelope exceeded: {n_nodes} nodes "
                f"at scale={scale}; lower `scale` (total mass × 100 must "
                f"fit in int64)."
            )
    except Exception:
        release(graph_ids)
        raise
    base = ((100 - damping_pct) * scale) // 100

    if seeds is None:
        nodes = nodes.withColumn("__seed", F.lit(True))
    else:
        nodes = nodes.join(
            seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
            .withColumn("__seed", F.lit(True)),
            "node",
            "left",
        ).withColumn("__seed", F.coalesce("__seed", F.lit(False)))
        nodes, s_ids = ckpt(nodes)
        graph_ids |= s_ids
    base_col = F.when(F.col("__seed"), F.lit(base)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node",
        F.when(F.col("__seed"), F.lit(scale))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank_fp"),
    )
    held: set = set()
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div out_deg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        nxt = nodes.join(sums, "node", "left").select(
            "node",
            (
                base_col
                + F.expr(f"({damping_pct} * coalesce(m, 0L)) div 100")
            ).cast("long").alias("rank_fp"),
        )
        ranks, ids = ckpt(nxt)
        release(held)
        held = ids
    release(graph_ids)
    return ranks


def kcore(
    edges: DataFrame, k: int, rounds: int | None = None
) -> DataFrame:
    """k-CORE decomposition by iterative peeling (Seidman, "Network
    structure and minimum degree", Social Networks 1983; the
    distributed peel is Montresor et al.'s): repeatedly delete every
    node whose degree in the REMAINING graph is < k; what survives is
    the maximal subgraph where every node keeps ≥ k neighbors — the
    dense-community screen (spam/link-farm cores on web graphs,
    bot-ring detection, co-purchase communities worth recommending
    inside).

    Input is canonicalized exactly like triangle_counts (least,
    greatest + distinct), so any edge-list convention works. Returns
    (node, core_degree) for surviving nodes — core_degree is the
    node's degree INSIDE the k-core.

    `rounds=None` peels to the fixpoint (capped at 64 — a peel that
    deep means adversarial chain structure; raise explicitly).
    `rounds=R` runs EXACTLY R peels whether or not converged — the
    R-round peel is a deterministic function of the data, which is
    what the generated SQL oracle replays (convergence at fixture
    scale is test-asserted separately, so equality never depends on
    convergence).

    Scale shape per round: one partial-agg'd degree groupBy over the
    canonical edge table + two semi-join filters (broadcast when the
    removed set is small, AQE otherwise) — all shuffles on the node
    key. Each round's edge table is checkpoint-materialized with
    eager release of the previous snapshot (the pagerank/_ckpt_tools
    discipline), so plan depth and memory stay O(1) in rounds."""
    if k < 1:
        raise ValueError(f"kcore: k must be ≥ 1, got {k}")
    ckpt, release = _ckpt_tools(edges)
    cur, held = ckpt(
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.explode(F.array("lo", "hi")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    max_rounds = 64 if rounds is None else rounds
    try:
        for _ in range(max_rounds):
            deg = degrees(cur)
            bad = deg.filter(F.col("deg") < k).select("node")
            if rounds is None and bad.limit(1).count() == 0:
                break
            nxt = (
                cur.join(
                    bad.withColumnRenamed("node", "lo"), "lo", "left_anti"
                ).join(
                    bad.withColumnRenamed("node", "hi"), "hi", "left_anti"
                )
            )
            nxt, ids = ckpt(nxt.select("lo", "hi"))
            release(held)
            cur, held = nxt, ids
        else:
            if rounds is None:
                raise RuntimeError(
                    "kcore: no fixpoint within 64 peel rounds — "
                    "pathological chain structure; pass `rounds` "
                    "explicitly."
                )
        out, _ = ckpt(
            degrees(cur).select(
                "node", F.col("deg").cast("long").alias("core_degree")
            )
        )
    finally:
        release(held)
    return out


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as a
    both-directions (src, dst) edge table — the clustering-structure
    signal (tight co-purchase communities, link-farm detection on web
    graphs), computed with the degree-ORIENTED wedge join of Suri &
    Vassilvitskii ("Counting Triangles and the Curse of the Last
    Reducer", WWW 2011): direct every edge from the (degree, id)-
    smaller endpoint, enumerate wedges only from each node's ORIENTED
    out-edges, and close them against the oriented edge set. Each
    triangle materializes exactly once, and the per-node wedge fan-out
    is bounded by the oriented out-degree ≤ O(√m) even on power-law
    graphs — the whole point of the orientation (a naive wedge join
    explodes on hub nodes).

    The derived graph is materialized ONCE (the pagerank_fixed_point
    `_ckpt_tools` discipline above): the undirected edge set feeds
    degrees and orientation, degrees are read three times, and the
    oriented table fans out into both wedge sides and the closure —
    without checkpoints the whole upstream edge derivation (e.g. the
    lineitem self-join in `copurchase_edges`) would recompute per
    branch. Measured 4×+ on the co-purchase query. Single-digit
    shuffles end-to-end: canonicalize+distinct, degrees, the two
    orientation joins, the wedge self-join on the apex, the closure
    equi-join on (b, c), the per-node count.

    Input robustness: edges are canonicalized to (lo, hi) = (least,
    greatest) before the distinct, so a one-directional edge list
    yields the same undirected graph as a both-directions one — it
    cannot silently undercount degrees or triangles — and only |E|/2
    canonical rows are ever shuffled or materialized.

    Returns (node, degree, n_triangles) for every node, including
    zeros. The result is node-sized and returned materialized."""
    ckpt, release = _ckpt_tools(edges)
    # canonicalize to lo < hi: ONE distinct over HALF the undirected
    # edge volume (vs distinct-ing both directions), and a one-
    # directional input canonicalizes to the same set — the symmetry
    # guard costs nothing. Degrees and orientation both derive from
    # the canonical table, so only |E|/2 rows are ever materialized.
    canon, c_ids = ckpt(
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    try:
        deg, d_ids = ckpt(
            canon.select(
                F.explode(F.array("lo", "hi")).alias("src")
            ).groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        )
    except Exception:
        release(c_ids)
        raise
    nodes = deg.select(F.col("src").alias("node"), "deg")
    # orient: direct each canonical edge from its (deg, id)-smaller
    # endpoint — lo wins ties by id, so lo leads iff deg_lo <= deg_hi
    try:
        lo_leads = F.col("deg_lo") <= F.col("deg_hi")
        e, e_ids = ckpt(
            canon.join(
                deg.select(F.col("src").alias("lo"), F.col("deg").alias("deg_lo")),
                "lo",
            )
            .join(
                deg.select(F.col("src").alias("hi"), F.col("deg").alias("deg_hi")),
                "hi",
            )
            .select(
                F.when(lo_leads, F.col("lo")).otherwise(F.col("hi")).alias("a"),
                F.when(lo_leads, F.col("hi")).otherwise(F.col("lo")).alias("b"),
                F.when(lo_leads, F.col("deg_lo")).otherwise(F.col("deg_hi")).alias("da"),
                F.when(lo_leads, F.col("deg_hi")).otherwise(F.col("deg_lo")).alias("db"),
            )
        )
    except Exception:
        release(c_ids | d_ids)
        raise
    release(c_ids)  # deg and e are materialized; nothing recomputes through canon
    w1 = e.select(F.col("a"), F.col("b"), F.col("db").alias("ord_b"))
    w2 = e.select(
        F.col("a"), F.col("b").alias("c"), F.col("db").alias("ord_c")
    )
    wedges = w1.join(w2, "a").filter(
        (F.col("ord_b") < F.col("ord_c"))
        | ((F.col("ord_b") == F.col("ord_c")) & (F.col("b") < F.col("c")))
    )
    closing = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    per_node = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    try:
        out, _ = ckpt(
            nodes.join(per_node, "node", "left").select(
                "node",
                F.col("deg").alias("degree"),
                F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            )
        )
    finally:
        release(d_ids | e_ids)
    return out


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Multi-source breadth-first hop distances over an undirected
    graph — "how many co-purchase hops from the seed set is every
    item?", the graph-proximity feature (seed-distance labeling for
    crawl frontier prioritization, recommendation radius, influence
    neighborhoods). GraphX's Pregel ShortestPaths reduces to the same
    per-superstep join+min-agg; this is that shape on DataFrames.

    Input is canonicalized exactly like kcore/triangle_counts (least,
    greatest + distinct, then both directions), so any edge-list
    convention works. `seeds` is a 1-column node frame; seeds absent
    from the graph still appear at hop 0. Runs EXACTLY `rounds`
    frontier expansions — like the R-round kcore peel, a fixed-round
    BFS is a deterministic function of the data, which is what the
    generated SQL oracle replays round by round; nodes unreached
    within `rounds` are absent (hop > R is unknowable from R rounds).

    Scale shape: the directed edge table materializes ONCE
    (localCheckpoint — the triangle lesson; never recompute the
    upstream self-join per round). Each round joins ONLY THE NEW
    FRONTIER (nodes first discovered last round) against the edges —
    per-round cost is |frontier|-proportional, the textbook BFS
    bound, not |reached|. One equi-join + one partial-agg'd min
    groupBy per round, checkpointed with eager release of the
    superseded distance snapshot: plan depth and executor memory stay
    O(1) in rounds.

    Returns (node, hop) for every node reached within `rounds`.
    """
    if rounds < 0:
        raise ValueError(f"bfs_hops: rounds must be ≥ 0, got {rounds}")
    ckpt, release = _ckpt_tools(edges)
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    e, e_ids = ckpt(
        und.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).unionByName(
            und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        )
    )
    dist, held = ckpt(
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("long"))
    )
    try:
        for r in range(1, rounds + 1):
            frontier = dist.filter(F.col("hop") == r - 1)
            reached = frontier.join(
                e, frontier["node"] == e["src"]
            ).select(F.col("dst").alias("node"), F.lit(r).cast("long").alias("hop"))
            nxt = (
                dist.unionByName(reached)
                .groupBy("node")
                .agg(F.min("hop").alias("hop"))
            )
            nxt, ids = ckpt(nxt)
            release(held)
            dist, held = nxt, ids
    finally:
        release(e_ids)
    return dist
