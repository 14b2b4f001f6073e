"""CDC retraction aggregates — the update/delete half the reference's
insert-only fact path drops.

Reference: scala/…/ods/KafkaToODS_M.scala:53-64 routes fact tables
ONLY on type=='insert'; an order whose amount is corrected (update) or
cancelled (delete) after ingestion permanently skews every downstream
revenue total, and the reference has no mechanism to repair it.

Ours: Flink-style retraction algebra expressed relationally. Each
changelog row becomes a SIGNED delta —

    insert → (+new_cents, +1)
    update → (+new_cents − old_cents, 0)
    delete → (−old_cents, −1)

— and any distributive aggregate (sum, count) over the LATEST state
equals the plain sum of deltas over the FULL changelog. No per-key
"latest version wins" window, no per-key state: the delta map is
stateless and the aggregate is one map-side-combined groupBy. Money
rides as integer cents (bigint) so delta sums are exact and
order-independent — change events may arrive late or reordered
without changing the answer.

At 100 TB: the usual latest-row formulation shuffles the whole
changelog by primary key and window-sorts it; this plan shuffles
|groups| partial rows and nothing else. Groups whose live row count
returns to zero are dropped (the relational analog of Flink emitting
a retraction for the group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHANGELOG_OPS = ("insert", "update", "delete")


def _cents(col: Column) -> Column:
    """Exact integer cents of a 2-dp money double (half-up, the shared
    round2 formula's integer core)."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def signed_deltas(
    changelog: DataFrame,
    op_col: str = "op",
    new_col: str = "price_new",
    old_col: str = "price_old",
) -> DataFrame:
    """Map each change event to its signed contribution:
    ``delta_cents`` (money, integer cents) and ``delta_rows`` (live row
    count). Unknown ops raise at execution time — a changelog with an
    op outside {insert, update, delete} is corrupt, not ignorable.
    Stateless; works on batch and streaming frames alike."""
    op = F.col(op_col)
    new_c = _cents(F.col(new_col))
    old_c = _cents(F.col(old_col))
    bad = F.raise_error(
        F.concat(F.lit("unknown changelog op: "), F.coalesce(op, F.lit("NULL")))
    )
    delta_cents = (
        F.when(op == "insert", new_c)
        .when(op == "update", new_c - old_c)
        .when(op == "delete", -old_c)
        .otherwise(bad.cast("long"))
    )
    delta_rows = (
        F.when(op == "insert", F.lit(1))
        .when(op == "update", F.lit(0))
        .when(op == "delete", F.lit(-1))
        .otherwise(bad.cast("int"))
    )
    return changelog.withColumn("delta_cents", delta_cents).withColumn(
        "delta_rows", delta_rows
    )


def retract_partials(
    changelog: DataFrame,
    group_cols: list[str],
    op_col: str = "op",
    new_col: str = "price_new",
    old_col: str = "price_old",
) -> DataFrame:
    """Per-group signed partial sums — the associative intermediate
    both the batch aggregate and the streaming per-batch commit share.
    Output: group_cols + (delta_cents, delta_rows), one row per group
    touched by the changelog slice."""
    d = signed_deltas(changelog, op_col=op_col, new_col=new_col, old_col=old_col)
    return d.groupBy(*group_cols).agg(
        F.sum("delta_cents").alias("delta_cents"),
        F.sum("delta_rows").cast("long").alias("delta_rows"),
    )


def finish_retract_aggregate(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold (possibly multi-slice) partials into the final state
    aggregate: net_amount (2-dp money) + net_rows per group; groups
    whose live row count is zero are dropped."""
    return (
        partials.groupBy(*group_cols)
        .agg(
            F.sum("delta_cents").alias("_cents"),
            F.sum("delta_rows").alias("net_rows"),
        )
        .filter(F.col("net_rows") > 0)
        .select(
            *group_cols,
            (F.col("_cents") / F.lit(100.0)).alias("net_amount"),
            "net_rows",
        )
    )


def retract_aggregate(
    changelog: DataFrame,
    group_cols: list[str],
    op_col: str = "op",
    new_col: str = "price_new",
    old_col: str = "price_old",
) -> DataFrame:
    """One-pass retractable sum+count over a CDC changelog: equals the
    aggregate a full latest-state recompute would produce (the oracle
    checks exactly that), at the cost of one partial-agg'd shuffle."""
    return finish_retract_aggregate(
        retract_partials(
            changelog, group_cols, op_col=op_col, new_col=new_col, old_col=old_col
        ),
        group_cols,
    )


def finish_retract_join(
    fact_partials: DataFrame,
    dim_partials: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
) -> DataFrame:
    """Fold per-key signed partials from BOTH sides of a changelog
    equi-join into aggregates over the live join result. Inputs are
    (possibly multi-slice) `retract_partials` outputs: fact keyed by
    `key_cols`, dim keyed by `key_cols + group_cols`. Output:
    group_cols + (n_pairs, fact_amount, dim_amount)."""
    f = (
        fact_partials.groupBy(*key_cols)
        .agg(
            F.sum("delta_cents").alias("f_cents"),
            F.sum("delta_rows").alias("f_rows"),
        )
        .filter(F.col("f_rows") > 0)
    )
    d = (
        dim_partials.groupBy(*key_cols, *group_cols)
        .agg(
            F.sum("delta_cents").alias("d_cents"),
            F.sum("delta_rows").alias("d_rows"),
        )
        .filter(F.col("d_rows") > 0)
    )
    return (
        f.join(d, key_cols)
        .groupBy(*group_cols)
        .agg(
            F.sum(F.col("f_rows") * F.col("d_rows")).alias("n_pairs"),
            (F.sum(F.col("f_cents") * F.col("d_rows")) / F.lit(100.0)).alias(
                "fact_amount"
            ),
            (F.sum(F.col("d_cents") * F.col("f_rows")) / F.lit(100.0)).alias(
                "dim_amount"
            ),
        )
    )


def retract_join_aggregate(
    fact_changelog: DataFrame,
    dim_changelog: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    fact_value_cols: tuple[str, str] = ("price_new", "price_old"),
    dim_value_cols: tuple[str, str] = ("price_new", "price_old"),
    op_col: str = "op",
) -> DataFrame:
    """Aggregates over the equi-join of TWO CDC changelogs — without
    materializing either side's latest state and without ever joining
    changelog rows to changelog rows.

    The identity (higher-order incremental view maintenance — Koch et
    al.'s DBToaster line of work): for live multisets F_k (fact rows
    with key k) and D_k (dim rows), any distributive aggregate of the
    join factors through per-key signed partials —

        |F_k ⋈ D_k|      = cnt(F_k) · cnt(D_k)
        Σ_pairs fact_val = sum(F_k) · cnt(D_k)
        Σ_pairs dim_val  = sum(D_k) · cnt(F_k)

    — and cnt/sum are plain sums of signed deltas over each FULL
    changelog (retract_partials). Deleting a dim row retracts every
    joined fact row at once: the case an insert-only pipeline
    (reference: scala/…/ods/KafkaToODS_M.scala:53-64) can never
    repair, and the reason Flink keeps both-sides join state. Here
    that \"state\" is the |keys|-sized partial table.

    Shape at 100 TB: one scan + one partial-agg'd shuffle per
    changelog (to |keys| rows), one equi-join of the two key
    summaries, one rollup — the changelogs themselves never meet.
    `group_cols` must be dim attributes that are immutable per key
    (they ride in the dim partial's grouping); money rides as integer
    cents so the products and sums are exact and order-independent.
    """
    fp = retract_partials(
        fact_changelog,
        key_cols,
        op_col=op_col,
        new_col=fact_value_cols[0],
        old_col=fact_value_cols[1],
    )
    dp = retract_partials(
        dim_changelog,
        list(key_cols) + list(group_cols),
        op_col=op_col,
        new_col=dim_value_cols[0],
        old_col=dim_value_cols[1],
    )
    return finish_retract_join(fp, dp, key_cols, group_cols)


def retract_join3_aggregate(
    fact_changelog: DataFrame,
    dim_a: DataFrame,
    dim_b: DataFrame,
    key_a: str,
    key_b: str,
    group_cols: list[str],
    fact_value_cols: tuple[str, str] = ("price_new", "price_old"),
    dim_a_value_cols: tuple[str, str] = ("price_new", "price_old"),
    dim_b_value_cols: tuple[str, str] = ("price_new", "price_old"),
    op_col: str = "op",
) -> DataFrame:
    """Three-changelog factorization — the snowflake extension of
    `retract_join_aggregate`: a fact changelog carrying TWO foreign
    keys joined to two dim changelogs. The same per-key-partials
    identity holds with one more factor —

        |F_{k1,k2} ⋈ A_{k1} ⋈ B_{k2}| = cntF(k1,k2)·cntA(k1)·cntB(k2)
        Σ_triples fact_val            = sumF(k1,k2)·cntA(k1)·cntB(k2)
        Σ_triples dimA_val            = sumA(k1)·cntF(k1,k2)·cntB(k2)

    — so deleting one part (dim A) or one supplier (dim B) retracts
    every surviving fact triple algebraically; no changelog ever
    joins another row-to-row. Shape: one scan + one partial-agg'd
    shuffle per changelog (fact to |key pairs|, dims to |keys|), two
    key-summary equi-joins, one rollup. `group_cols` are immutable
    dim-A attributes. Output: group_cols + (n_triples, fact_amount,
    dim_a_amount)."""
    fp = (
        retract_partials(
            fact_changelog,
            [key_a, key_b],
            op_col=op_col,
            new_col=fact_value_cols[0],
            old_col=fact_value_cols[1],
        )
        .withColumnRenamed("delta_cents", "f_cents")
        .withColumnRenamed("delta_rows", "f_rows")
        .filter(F.col("f_rows") > 0)
    )
    da = (
        retract_partials(
            dim_a,
            [key_a] + list(group_cols),
            op_col=op_col,
            new_col=dim_a_value_cols[0],
            old_col=dim_a_value_cols[1],
        )
        .withColumnRenamed("delta_cents", "a_cents")
        .withColumnRenamed("delta_rows", "a_rows")
        .filter(F.col("a_rows") > 0)
    )
    db = (
        retract_partials(
            dim_b,
            [key_b],
            op_col=op_col,
            new_col=dim_b_value_cols[0],
            old_col=dim_b_value_cols[1],
        )
        .withColumnRenamed("delta_cents", "b_cents")
        .withColumnRenamed("delta_rows", "b_rows")
        .filter(F.col("b_rows") > 0)
    )
    return (
        fp.join(da, key_a)
        .join(db, key_b)
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.col("f_rows") * F.col("a_rows") * F.col("b_rows")
            ).alias("n_triples"),
            (
                F.sum(F.col("f_cents") * F.col("a_rows") * F.col("b_rows"))
                / F.lit(100.0)
            ).alias("fact_amount"),
            (
                F.sum(F.col("a_cents") * F.col("f_rows") * F.col("b_rows"))
                / F.lit(100.0)
            ).alias("dim_a_amount"),
        )
    )


def retract_minmax(
    changelog: DataFrame,
    group_cols: list[str],
    op_col: str = "op",
    new_col: str = "price_new",
    old_col: str = "price_old",
) -> DataFrame:
    """Retractable MIN/MAX — the aggregate signed deltas canNOT carry.

    A deleted maximum invalidates the old max and the replacement is
    unknowable from a scalar accumulator; the standard IVM answer
    (Flink's retractable min/max state) is a SUPPORT TABLE: per
    (group, value) live multiplicities. A value's multiplicity is the
    signed count of changelog events that introduce (+: insert new,
    update new) or retire (−: delete old, update old) it; min/max =
    extremes over values with multiplicity > 0.

    Shape: each change event contributes ≤2 (value, ±1) entries via a
    2-element array explode — still one scan; then one groupBy on
    (group, value) and one |live-values| aggregate down to |groups|.
    The support table is bounded by the LIVE distinct-value count per
    group (not changelog length — retired values cancel to 0 and are
    filtered), which is the minimum any exact retractable min/max can
    hold. Groups whose live count hits zero disappear.
    """
    op = F.col(op_col)
    bad = F.raise_error(
        F.concat(F.lit("unknown changelog op: "), F.coalesce(op, F.lit("NULL")))
    )
    entry = lambda val, mult: F.struct(  # noqa: E731
        _cents(val).alias("vc"), mult.cast("int").alias("mult")
    )
    null_entry = F.lit(None).cast("struct<vc:bigint,mult:int>")
    contributions = (
        F.when(
            op == "insert",
            F.array(entry(F.col(new_col), F.lit(1)), null_entry),
        )
        .when(
            op == "update",
            F.array(
                entry(F.col(new_col), F.lit(1)),
                entry(F.col(old_col), F.lit(-1)),
            ),
        )
        .when(
            op == "delete",
            F.array(entry(F.col(old_col), F.lit(-1)), null_entry),
        )
        .otherwise(bad.cast("array<struct<vc:bigint,mult:int>>"))
    )
    support = (
        changelog.select(
            *group_cols,
            F.explode(F.filter(contributions, lambda x: x.isNotNull())).alias("e"),
        )
        .groupBy(*group_cols, F.col("e.vc").alias("vc"))
        .agg(F.sum("e.mult").alias("mult"))
        .filter(F.col("mult") > 0)
    )
    return support.groupBy(*group_cols).agg(
        (F.min("vc") / F.lit(100.0)).alias("min_price"),
        (F.max("vc") / F.lit(100.0)).alias("max_price"),
        F.sum("mult").cast("long").alias("net_rows"),
    )
