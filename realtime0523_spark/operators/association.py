"""Association-rule mining over basket tables (Agrawal & Srikant,
VLDB 1994 — the apriori support/confidence frame; lift per Brin et
al., SIGMOD 1997).

The market-basket staple the reference's hot-goods ranking
(TradeStatApp-style SPU sums) only hints at: not "what sells" but
"what sells TOGETHER, beyond chance" — the recommendation /
cross-sell primitive. The reference engine has no rule miner; this is
beyond-reference surface expressed in the shapes that survive 100 TB:

- The basket table (one distinct (basket, item) stream) materializes
  ONCE (localCheckpoint) and feeds both the item-support aggregate
  and the pair join — the triangle lesson: never recompute a
  corpus-sized derivation per branch.
- APRIORI PRUNING before the quadratic step: items below min_support
  are semi-joined out of the baskets BEFORE the pair self-join, so
  the fan-out runs on the frequent-item sub-baskets only. The pair
  join itself is an equi-join on the basket key — cost bounded by
  Σ per-basket frequent-item-count², never |items|².
- Supports (|items| rows) re-attach by BROADCAST hash equi-joins.
  The scalar basket count is a 1-row collect off the checkpointed
  basket table — the BM25 legality class for scalar attaches; a lazy
  1-row join (literal-key or cross) constant-folds to the banned
  BroadcastNestedLoopJoin.

Exactness: supports and pair counts are exact longs; confidence and
lift are the only floating point, computed by the identical IEEE
expression in both engines and rounded to 9 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime0523_spark.llm.clusters import _ckpt_tools


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 2,
    top_n: int = 100,
) -> DataFrame:
    """Mine directed pair rules antecedent→consequent from a
    (basket, item) table.

    Returns (antecedent, consequent, support_pairs, confidence,
    lift) for the `top_n` rules by lift (ties broken by antecedent,
    consequent — fully deterministic), where both the pair and the
    antecedent item occur in ≥ `min_support` distinct baskets.

    confidence = |baskets(a,b)| / |baskets(a)|
    lift       = confidence / (|baskets(b)| / N)
    """
    ckpt, release = _ckpt_tools(baskets)

    b, b_ids = ckpt(
        baskets.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
        ).distinct()
    )
    try:
        supp = b.groupBy("it").agg(F.count(F.lit(1)).alias("supp"))
        freq = supp.filter(F.col("supp") >= min_support)
        # scalar basket count: a 1-row exact-integer collect off the
        # checkpointed basket table (a lazy 1-row join would
        # constant-fold to the banned BroadcastNestedLoopJoin)
        n_baskets = int(b.select("bk").distinct().count())

        # apriori: drop infrequent items BEFORE the quadratic step
        bf = b.join(freq.select("it"), "it", "left_semi")
        lhs = bf.select("bk", F.col("it").alias("ia"))
        rhs = bf.select("bk", F.col("it").alias("ib"))
        pairs = (
            lhs.join(rhs, "bk")
            .filter(F.col("ia") < F.col("ib"))
            .groupBy("ia", "ib")
            .agg(F.count(F.lit(1)).alias("support_pairs"))
            .filter(F.col("support_pairs") >= min_support)
        )
        # both rule directions from each unordered frequent pair
        rules = pairs.select(
            F.col("ia").alias("antecedent"),
            F.col("ib").alias("consequent"),
            "support_pairs",
        ).unionByName(
            pairs.select(
                F.col("ib").alias("antecedent"),
                F.col("ia").alias("consequent"),
                "support_pairs",
            )
        )
        sa = freq.select(F.col("it").alias("antecedent"), F.col("supp").alias("supp_a"))
        sb = freq.select(F.col("it").alias("consequent"), F.col("supp").alias("supp_b"))
        out = (
            rules.join(F.broadcast(sa), "antecedent")
            .join(F.broadcast(sb), "consequent")
            .select(
                "antecedent",
                "consequent",
                "support_pairs",
                F.round(
                    F.col("support_pairs").cast("double")
                    / F.col("supp_a").cast("double"),
                    9,
                ).alias("confidence"),
                F.round(
                    (
                        F.col("support_pairs").cast("double")
                        * F.lit(float(n_baskets))
                    )
                    / (
                        F.col("supp_a").cast("double")
                        * F.col("supp_b").cast("double")
                    ),
                    9,
                ).alias("lift"),
            )
            .orderBy(F.desc("lift"), "antecedent", "consequent")
            .limit(top_n)
        )
        # materialize the result before releasing the basket snapshot
        # its plan reads through; the final checkpoint stays live (the
        # pagerank lifecycle — only SUPERSEDED snapshots are released)
        out, _ = ckpt(out)
        release(b_ids)
        return out
    except Exception:
        release(b_ids)
        raise
