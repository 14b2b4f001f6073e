"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Every operator has an exact
DuckDB-SQL twin in plans/inventory.py; arithmetic sticks to integer /
rational ops (no transcendentals) so both engines agree bitwise.

Scale: all of these are embarrassingly parallel per-row transforms —
no shuffle, no state; at 100 TB they pipeline inside the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2  # noqa: F401  (re-export convenience)

# Whitespace tokenization — the lowest-common-denominator tokenizer;
# the BPE-ish variant is `word_shingles` over these tokens.
TOKEN_PATTERN = r"\s+"

# Stopword regexes per language for the n-gram/stopword-hit language
# heuristic. \x{...} escapes work in both Java regex and RE2.
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to|in|is|it|you|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|zu|den)\b",
    "fr": r"\b(le|la|les|et|est|un|une|des|du|que)\b",
    "es": r"\b(el|los|las|de|y|es|un|una|que|en)\b",
    "zh": r"[\x{4e00}-\x{9fff}]",
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]  # deterministic argmax tie-break


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, TOKEN_PATTERN), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def lang_hits(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    return {lang: F.regexp_count(c, F.lit(pat)) for lang, pat in LANG_PATTERNS.items()}


def lang_guess(text: Column | str) -> Column:
    """Argmax of stopword hits, ties broken by LANG_PRIORITY order;
    'und' (unknown) when no pattern hits at all."""
    hits = lang_hits(text)
    best = None
    for lang in LANG_PRIORITY:
        cond = hits[lang] > 0
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            # strictly-greater for later-priority langs, >= for earlier
            if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: length, token stats, punctuation
    and stopword ratios, and a [0,1] linear score (no transcendentals —
    oracle-parity-safe)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_chars = F.length(c)
    n_tok = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    avg_tok_len = tok_chars.cast("double") / n_tok.cast("double")
    punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))
    punct_ratio = punct.cast("double") / n_chars.cast("double")
    stop_hits = F.regexp_count(c, F.lit(LANG_PATTERNS["en"]))
    stop_ratio = stop_hits.cast("double") / n_tok.cast("double")
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.lit(0.05) * avg_tok_len + stop_ratio - punct_ratio,
        ),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": avg_tok_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def normalize_text(text: Column | str) -> Column:
    """lower → non-alphanumeric runs → single space → trim. The
    canonical form used by the fingerprint and exact dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def doc_fingerprint(text: Column | str) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex).
    Rolling-hash-equivalent for whole-document identity."""
    return F.md5(normalize_text(text))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (the MinHash/Jaccard shingle set).
    Documents with fewer than n tokens yield an empty set.

    The token array is let-bound via a 1-element `transform` so the
    split+filter tokenization runs ONCE per row: Catalyst does no
    common-subexpression elimination across higher-order-function
    lambda bodies, so referencing `tokens(text)` directly inside the
    per-index lambda re-tokenizes per shingle (measured 5× slower on
    the 54-token document corpus)."""

    def build(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return F.transform(F.array(tokens(text)), build)[0]
