from realtime0523_spark.llm.text import (
    tokens,
    token_count,
    lang_guess,
    quality_features,
    doc_fingerprint,
    word_shingles,
    word_ngrams,
    ngram_repetition,
)
from realtime0523_spark.llm.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from realtime0523_spark.llm.clusters import (
    connected_components,
    keep_best,
    dedup_filter,
)
from realtime0523_spark.llm.similarity import (
    cosine,
    cosine_topk,
    lsh_bucket,
    ann_topk_lsh,
    embedding_dedup_pairs,
)
from realtime0523_spark.llm.pipeline import (
    train_split,
    stratified_sample,
    contamination_check,
    pii_redact,
    pack_sequences,
    domain_mix,
)
from realtime0523_spark.llm.multimodal import (
    attach_media,
    media_features,
    decode_image_stub,
)

__all__ = [
    "tokens",
    "token_count",
    "lang_guess",
    "quality_features",
    "doc_fingerprint",
    "word_shingles",
    "word_ngrams",
    "ngram_repetition",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "connected_components",
    "keep_best",
    "dedup_filter",
    "cosine",
    "cosine_topk",
    "lsh_bucket",
    "ann_topk_lsh",
    "embedding_dedup_pairs",
    "train_split",
    "stratified_sample",
    "contamination_check",
    "pii_redact",
    "pack_sequences",
    "domain_mix",
    "attach_media",
    "media_features",
    "decode_image_stub",
]
