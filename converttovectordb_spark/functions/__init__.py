"""Column-expression library: vector math + text analysis.

Everything here is built from native ``pyspark.sql.functions`` so the
expressions stay inside whole-stage codegen — no Python in the hot path.
"""

from converttovectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from converttovectordb_spark.functions.text import (
    char_ngrams,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "tokens",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
]
