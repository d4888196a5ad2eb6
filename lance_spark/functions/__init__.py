from lance_spark.functions.text import (
    tokenize,
    hash64,
    token_count,
    stopword_ratio,
    punct_ratio,
    quality_score,
    lang_id,
    fingerprint,
    contains_tokens,
)
from lance_spark.functions.vector import cosine_sim, l2_distance, dot_product

__all__ = [
    "tokenize",
    "hash64",
    "token_count",
    "stopword_ratio",
    "punct_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "contains_tokens",
    "cosine_sim",
    "l2_distance",
    "dot_product",
]
