from realtime0523_spark.llm.text import (
    tokens,
    token_count,
    lang_guess,
    quality_features,
    doc_fingerprint,
    word_shingles,
)
from realtime0523_spark.llm.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from realtime0523_spark.llm.similarity import (
    cosine,
    cosine_topk,
    lsh_bucket,
    ann_topk_lsh,
    embedding_dedup_pairs,
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
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "cosine",
    "cosine_topk",
    "lsh_bucket",
    "ann_topk_lsh",
    "embedding_dedup_pairs",
    "attach_media",
    "media_features",
    "decode_image_stub",
]
