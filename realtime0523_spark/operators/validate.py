"""Declarative data-quality validation — the Deequ/dbt-tests shape:
constraint rules evaluated in ONE aggregate pass per table, plus join
checks (uniqueness, referential integrity) that are each one
partial-agg'd groupBy or anti-join.

A 100 TB ingest runs these as the admission gate in front of the
warehouse (reject/quarantine on violation-rate thresholds); the whole
report is a handful of |rules|-row frames unioned together, so the
cost is the table scans themselves — each table is read exactly once
for its row rules.

Output contract (every check): (rule, n_rows, n_violations,
violation_rate) — engine-portable, exact, SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(rule: str, n_rows: Column, n_viol: Column):
    return [
        F.lit(rule).alias("rule"),
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        F.round(
            n_viol.cast("double")
            / F.greatest(n_rows.cast("double"), F.lit(1.0)),
            9,
        ).alias("violation_rate"),
    ]


def rule_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints in ONE aggregate pass over
    `df`: each rule is a boolean Column that should hold for every
    row; a NULL predicate result counts as a violation (unknown is
    not proof of validity — the SQL-three-valued-logic footgun Deequ
    also closes). Returns one report row per rule."""
    if not rules:
        raise ValueError("rule_report needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, cond in enumerate(rules.values()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    out = None
    for i, name in enumerate(rules):
        part = row.select(*_report(name, F.col("__n"), F.col(f"__v{i}")))
        out = part if out is None else out.unionAll(part)
    return out


def uniqueness_report(df: DataFrame, cols: list[str], rule: str) -> DataFrame:
    """Key-uniqueness check: n_violations = rows carrying a key that
    appears more than once (every copy counts, the Deequ convention).
    One partial-agg'd groupBy on the key."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    agg = per_key.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias("__v"),
    )
    return agg.select(*_report(rule, F.col("__n"), F.col("__v")))


def fk_report(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose key has no match
    in the parent. One aggregate over a left join against the parent's
    DISTINCT keys (broadcast when small; the distinct key set is the
    |parent-keys| reduction, never the parent's payload)."""
    pk = parent.select(F.col(parent_key).alias("__pk")).distinct()
    joined = child.select(F.col(child_key).alias("__ck")).join(
        pk, F.col("__ck") == F.col("__pk"), "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0)).alias("__v"),
    )
    return agg.select(*_report(rule, F.col("__n"), F.col("__v")))
