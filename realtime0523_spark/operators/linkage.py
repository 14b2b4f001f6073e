"""Record linkage (entity resolution): blocking + Fellegi–Sunter
field-agreement scoring — the classic data-integration staple
(Fellegi & Sunter 1969; Christen's "Data Matching" survey) that a
training-data pipeline needs whenever two feeds describe the same
real-world entities without a shared key.

The naive match is the n² record cross-join — unrunnable at scale.
The standard architecture, expressed Spark-first:

1. BLOCKING: each record maps to a cheap composite block key (here
   nation + the last 4 digits of the name's numeric tail); candidate
   pairs come from an EQUI-JOIN on the block key, so cost is
   Σ|block_A|·|block_B| — governed by the blocking choice, never n².
   This is the same bucket-join-not-all-pairs discipline as the
   MinHash/LSH dedup family (llm/dedup.py), applied to structured
   records.
2. SCORING: per candidate pair, integer log-odds-style agreement
   weights over fields of different reliability (full name tail,
   balance-within-tolerance, market segment). Pure codegen'd per-row
   arithmetic — no UDF.
3. DECISION: threshold on the summed weight → links. Name agreement
   alone (24) does NOT clear the 32 threshold: corroboration from the
   balance field is required, so records whose balance was corrupted
   beyond tolerance become measurable FALSE NEGATIVES.

Weights are fixed small integers so the score — and therefore every
link/no-link decision — replays bit-for-bit in any SQL engine; a
production system would learn them by EM, the plumbing is identical.

Evaluation needs labeled duplicates, so `dirty_twin` manufactures a
deterministic corrupted copy of a slice of the input (surface-mangled
name, one-cent balance typos, and a harder scrambled-balance tier)
whose origin key is carried OUT-OF-BAND as ground truth: the matcher
never sees it, the report joins on it to count true links.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINK_THRESHOLD = 32


def dirty_twin(customer: DataFrame) -> DataFrame:
    """Deterministic 'second feed': every c_custkey % 4 == 1 customer
    reappears with a mangled name surface form ('CUST <digits>'
    instead of 'Customer#000000...'). Balance corruption tiers:
    custkey % 16 == 9 → scrambled beyond recognition (cents*2+17,
    defeating the balance feature → a measurable missed link);
    else custkey % 8 == 1 → off by one cent (the typo a payment feed
    introduces, still within matcher tolerance). `origin_key` is
    ground truth, not a feature."""
    base = customer.filter(F.col("c_custkey") % 4 == 1)
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    bal = (
        F.when(F.col("c_custkey") % 16 == 9, (cents * 2 + 17) / F.lit(100.0))
        .when(F.col("c_custkey") % 8 == 1, (cents + 1) / F.lit(100.0))
        .otherwise(F.col("c_acctbal"))
    )
    return base.select(
        F.col("c_custkey").alias("origin_key"),
        F.concat(F.lit("CUST "), F.substring(F.col("c_name"), 10, 9)).alias(
            "name"
        ),
        F.col("c_nationkey").alias("nationkey"),
        bal.alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


def _name_tail(name_col: Column) -> Column:
    """The normalized comparable core of a name: its trailing digit
    run (both 'Customer#000000123' and 'CUST 000000123' yield
    '000000123'). regexp_extract is codegen'd — no UDF."""
    return F.regexp_extract(name_col, r"(\d+)\s*$", 1)


def link_candidates(
    left: DataFrame,
    right: DataFrame,
    threshold: int = LINK_THRESHOLD,
) -> DataFrame:
    """Blocked candidate generation + agreement scoring between two
    feeds with columns (rec_key, name, nationkey, acctbal,
    mktsegment). Block key: (nationkey, last 4 digits of the name
    tail) — true duplicates share it by construction; unrelated
    records collide only on a 4-digit suffix within one nation, so
    blocks stay tiny. Output: one candidate pair per row with its
    score and link decision."""
    lb = left.withColumn("block", F.substring(_name_tail(F.col("name")), -4, 4))
    rb = right.withColumn("block", F.substring(_name_tail(F.col("name")), -4, 4))
    pairs = lb.alias("a").join(rb.alias("b"), ["nationkey", "block"])
    name_agree = _name_tail(F.col("a.name")) == _name_tail(F.col("b.name"))
    bal_close = (
        F.abs(
            F.floor(F.col("a.acctbal") * 100 + F.lit(0.5))
            - F.floor(F.col("b.acctbal") * 100 + F.lit(0.5))
        )
        <= 2
    )
    seg_differ = F.col("a.mktsegment") != F.col("b.mktsegment")
    score = (
        F.when(name_agree, 24).otherwise(0)
        + F.when(bal_close, 16).otherwise(0)
        - F.when(seg_differ, 8).otherwise(0)
    )
    return pairs.select(
        F.col("a.rec_key").alias("left_key"),
        F.col("b.rec_key").alias("right_key"),
        F.col("nationkey"),
        score.cast("int").alias("score"),
        (score >= F.lit(threshold)).alias("is_link"),
    )
