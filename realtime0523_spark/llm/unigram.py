"""Unigram-LM tokenizer training — the SentencePiece algorithm
(Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates", ACL 2018; Kudo & Richardson,
EMNLP 2018) in its deterministic hard-EM (Viterbi) form, beside the
BPE trainer in llm/bpe.py.

Algorithm (fixed schedule, shared bit-for-bit with the generated
DuckDB oracle in plans/llm_inventory.py):
1. SEED: all word substrings of length ≤ UNIGRAM_MAXLEN counted with
   word-frequency weights; the seed vocabulary is every single
   character plus the top UNIGRAM_SEED_MULTI multi-character
   substrings by (count desc, piece asc).
2. E-STEP (hard EM): each distinct corpus word is segmented by
   VITERBI decoding under the current piece costs — dynamic
   programming over word positions, dp[i] = min_j dp[j] + cost(w[j:i])
   with piece length ≤ UNIGRAM_MAXLEN; piece counts are the segment
   occurrences weighted by word frequency. (Full EM uses
   forward-backward expected counts; the Viterbi E-step is the
   standard deterministic variant — documented deviation, exactly
   replayable in SQL.)
3. M-STEP: cost(piece) = −ln((n + 1) / (total + |vocab|)) — add-1
   smoothing over the CURRENT vocabulary (the DSIR-precedent
   smoothing; every piece keeps a finite cost), quantized to INTEGER
   NANO-NATS: floor(x · 1e9 + 0.5). All Viterbi arithmetic
   downstream is BIGINT addition — no float summation order anywhere.
4. PRUNE: keep every single character plus the top
   UNIGRAM_KEEP_MULTI multi-character pieces by (count desc, piece
   asc). (SentencePiece prunes by likelihood-loss contribution; the
   count-based rule is the deterministic simplification, documented.)
Schedule: seed costs → E → prune → M → E → final M. Both engines
replay the identical rounds; ties everywhere break on the fixed
(count desc, piece asc) / (cost-sum, split-position) orders.

Determinism contract for the DP tie-break (mirrored by the SQL
oracle's integer key encoding (dp[j]+cost)*4096 + j): when two
segmentations of a prefix cost the same, the SMALLEST split position
j wins (equivalently: the longest last piece). Words must be shorter
than 4096 characters for that encoding — the trainer raises loudly
on longer "words" (real pipelines pre-filter such garbage tokens).

Scale shape (same story as BPE): the corpus is touched exactly once
(the word-frequency groupBy); every E-step is an Arrow-batched
segmentation pass over the |distinct words| table with the
piece-cost table broadcast in the UDF closure (piece tables are
vocabulary-sized — thousands to a million rows — trivially
broadcastable); the M-step is one partial-agg'd groupBy over the
exploded segment units; pruning is a vocabulary-sized sort. Training
cost scales with vocabulary, never corpus size.
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime0523_spark.llm.bpe import word_counts

UNIGRAM_MAXLEN = 4
UNIGRAM_SEED_MULTI = 120
UNIGRAM_KEEP_MULTI = 60
_MAX_WORD = 4096  # SQL argmin key encodes split position in 12 bits


def cost_ns(n: int, total: int, vsize: int) -> int:
    """Add-1-smoothed piece cost in integer nano-nats:
    floor(−ln((n+1)/(total+vsize)) · 1e9 + 0.5). The one
    transcendental, quantized once per piece per round (the BM25-idf
    precedent); every downstream comparison is exact BIGINT math."""
    return int(math.floor(-math.log((n + 1) / (total + vsize)) * 1e9 + 0.5))


def substring_counts(words: DataFrame, maxlen: int = UNIGRAM_MAXLEN) -> DataFrame:
    """(piece, n): every substring of length 1..maxlen of every
    distinct word, weighted by word frequency, counted per occurrence
    position — one |vocab|-row explode, JVM-side."""
    subs = F.expr(
        f"flatten(transform(sequence(0, length(w) - 1), j -> "
        f"transform(sequence(1, least({maxlen}, length(w) - j)), "
        f"l -> substr(w, j + 1, l))))"
    )
    return (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )


def viterbi_segment(word: str, costs: dict, maxlen: int = UNIGRAM_MAXLEN) -> list[str]:
    """Min-cost segmentation of one word under integer piece costs;
    ties prefer the smallest split position (longest last piece) —
    the exact tie-break the SQL oracle's key encoding replays."""
    n = len(word)
    dp: list[int | None] = [0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        best: tuple[int, int] | None = None
        for j in range(max(0, i - maxlen), i):
            if dp[j] is None:
                continue
            c = costs.get(word[j:i])
            if c is None:
                continue
            cand = (dp[j] + c, j)
            if best is None or cand < best:
                best = cand
        if best is None:
            raise ValueError(
                f"unigram: word {word!r} not segmentable — the vocabulary "
                f"must contain every corpus character"
            )
        dp[i], back[i] = best
    out: list[str] = []
    pos = n
    while pos > 0:
        j = back[pos]
        out.append(word[j:pos])
        pos = j
    out.reverse()
    return out


def segment_words(
    words: DataFrame, costs: dict, maxlen: int = UNIGRAM_MAXLEN
) -> DataFrame:
    """(w, freq, units): Viterbi-segment the distinct-word table —
    the Arrow E-step pass. `costs` rides the UDF closure (broadcast
    with the task binary; vocabulary-sized by contract)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(col: pd.Series) -> pd.Series:
        return col.map(lambda w: viterbi_segment(w, costs, maxlen))

    return words.select("w", "freq", seg(F.col("w")).alias("units"))


def _estep_counts(words: DataFrame, costs: dict, maxlen: int) -> dict:
    """Hard-EM piece counts: one segmentation pass + one partial-agg'd
    groupBy; the collected result is vocabulary-sized by contract."""
    seg = segment_words(words, costs, maxlen)
    rows = (
        seg.select(F.explode("units").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
        .collect()
    )
    return {r["piece"]: int(r["n"]) for r in rows}


def _mstep(counts: dict, vocab: Sequence[str]) -> dict:
    total = sum(counts.get(p, 0) for p in vocab)
    return {p: cost_ns(counts.get(p, 0), total, len(vocab)) for p in vocab}


def _prune(counts: dict, vocab: Sequence[str], keep_multi: int) -> list[str]:
    chars = [p for p in vocab if len(p) == 1]
    multi = sorted(
        (p for p in vocab if len(p) > 1),
        key=lambda p: (-counts.get(p, 0), p),
    )[:keep_multi]
    return sorted(chars + multi)


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    maxlen: int = UNIGRAM_MAXLEN,
    seed_multi: int = UNIGRAM_SEED_MULTI,
    keep_multi: int = UNIGRAM_KEEP_MULTI,
) -> list[tuple[str, int, int]]:
    """Run the fixed seed → E → prune → M → E → M schedule; returns
    the final vocabulary as [(piece, count, cost_ns)] sorted by
    piece. The corpus is scanned once; each E-step runs over the
    |distinct words| table."""
    words = word_counts(docs, text_col).localCheckpoint(eager=True)
    too_long = words.filter(F.length("w") >= _MAX_WORD).limit(1).count()
    if too_long:
        raise ValueError(
            f"unigram: corpus contains a word ≥ {_MAX_WORD} chars — the "
            f"oracle's DP key encoding (and any sane tokenizer) refuses; "
            f"pre-filter garbage tokens first"
        )
    sub = substring_counts(words, maxlen)
    chars = [
        (r["piece"], int(r["n"]))
        for r in sub.filter(F.length("piece") == 1).collect()
    ]
    multi = [
        (r["piece"], int(r["n"]))
        for r in sub.filter(F.length("piece") >= 2)
        .orderBy(F.desc("n"), "piece")
        .limit(seed_multi)
        .collect()
    ]
    seed_counts = dict(chars + multi)
    vocab0 = sorted(seed_counts)
    c0 = _mstep(seed_counts, vocab0)

    n1 = _estep_counts(words, c0, maxlen)
    vocab1 = _prune(n1, vocab0, keep_multi)
    c1 = _mstep(n1, vocab1)

    n2 = _estep_counts(words, c1, maxlen)
    c2 = _mstep(n2, vocab1)
    return [(p, n2.get(p, 0), c2[p]) for p in vocab1]


def unigram_encode_counts(
    docs: DataFrame,
    vocab: list[tuple[str, int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    maxlen: int = UNIGRAM_MAXLEN,
) -> DataFrame:
    """Encode the corpus with a trained vocabulary: (doc, n_tokens,
    n_units) — the token-budget artifact, same shape as
    bpe_encode_counts. Segmentation runs ONCE per distinct word; the
    corpus then makes one explode → word equi-join (vocab side
    broadcastable) → one partial-agg'd per-doc groupBy."""
    from realtime0523_spark.llm.text import tokens

    costs = {p: c for p, _, c in vocab}
    words = word_counts(docs, text_col)
    wmap = segment_words(words, costs, maxlen).select(
        "w", F.size("units").alias("__nu")
    )
    t = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    return (
        t.join(wmap, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nu").alias("n_units"),
        )
    )
