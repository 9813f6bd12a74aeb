"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

All pure Catalyst expressions over the documents table — these are the
per-document map-side operators of a training-data pipeline; none of
them shuffle except the final per-group aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from converttovectordb_spark.functions.text import (
    char_ngrams,
    distinct_token_count,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)

#: Marker words for the heuristic language ID. The synthetic corpus is
#: English-ish word salad, so the heuristic keys on function words; on
#: real corpora swap in per-language stopword lists.
_LANG_RULES: list[tuple[str, list[str]]] = [
    ("de", ["der", "die", "und", "das", "ist"]),
    ("fr", ["le", "la", "et", "les", "est"]),
    ("es", ["el", "los", "las", "una", "por"]),
    ("en", ["the", "a", "of", "to", "and"]),
]


def lang_id_expr(text_col):
    """Predicted language: the rule language with the most marker-word
    hits (ties → earlier rule wins); no hits → 'und' (undetermined).

    Marker hits are counted as whole-token matches on the lowercased
    whitespace tokenization — expressible identically in ANSI SQL.
    """
    from converttovectordb_spark.functions.text import ASCII_WS

    toks = F.filter(F.split(F.lower(text_col), ASCII_WS), lambda t: t != "")
    scores = []
    for lang, markers in _LANG_RULES:
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))))
        )
    best = F.lit("und")
    best_score = F.lit(0)
    # Process in rule order with strict `>` to replace: the winner is the
    # FIRST rule in _LANG_RULES achieving the maximal score (earlier rule
    # wins ties), 'und' when no marker hits at all.
    for lang, score in scores:
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best


def lang_id_report(docs: DataFrame, *, text_col: str = "text", label_col: str = "lang") -> DataFrame:
    """Confusion counts: labeled lang × predicted lang."""
    return (
        docs.select(
            F.col(label_col).alias("lang"),
            lang_id_expr(F.col(text_col)).alias("predicted"),
        )
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def token_stats(docs: DataFrame, *, text_col: str = "text", group_col: str = "lang") -> DataFrame:
    """Per-group token statistics: doc count, avg tokens, avg distinct-
    token ratio, avg chars per token."""
    per_doc = docs.select(
        F.col(group_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        distinct_token_count(F.col(text_col)).alias("n_distinct"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.avg(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("n_distinct").cast("double") / F.col("n_tokens")
            )
        ).alias("avg_ttr"),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias(
            "chars_per_token"
        ),
    )


def quality_report(docs: DataFrame, *, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group quality metrics: avg quality score, avg punct ratio,
    avg stopword ratio, count of low-quality docs (< 0.5).

    The base signals (punct/stopword ratios) are materialized in their
    own projection and the composite score is assembled from the
    COLUMNS above it — inlining `quality_score` here would re-tokenize
    the text once per reference (the composite uses the stopword ratio
    twice), and there is no subexpression elimination across lambda
    expressions. Same decomposition as `quality_score`, same values."""
    base = docs.select(
        F.col(group_col),
        F.length(F.col(text_col)).alias("_len"),
        punct_ratio(F.col(text_col)).alias("p"),
        stopword_ratio(F.col(text_col)).alias("s"),
    )
    length_ok = F.when(
        (F.col("_len") >= 50) & (F.col("_len") <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    sw_band = F.when(
        (F.col("s") >= 0.05) & (F.col("s") <= 0.6), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    per_doc = base.select(
        F.col(group_col),
        (
            F.lit(0.4) * length_ok
            + F.lit(0.3) * (F.lit(1.0) - F.col("p"))
            + F.lit(0.3) * sw_band
        ).alias("q"),
        "p",
        "s",
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("q").alias("avg_quality"),
        F.avg("p").alias("avg_punct_ratio"),
        F.avg("s").alias("avg_stopword_ratio"),
        F.sum(F.when(F.col("q") < 0.5, 1).otherwise(0)).alias("n_low_quality"),
    )


def fingerprint_expr(text_col, *, ngram: int = 16, keep: int = 4):
    """Document fingerprint: the ``keep`` lexicographically-smallest
    md5 hashes over character n-grams (a winnowing-style min-hash
    sketch), concatenated with '|'.

    Two documents sharing large substrings share fingerprint components;
    identical docs get identical fingerprints. md5-based so an ANSI-SQL
    oracle reproduces it bit-for-bit.
    """
    grams = char_ngrams(text_col, ngram)
    hashes = F.array_sort(F.transform(grams, lambda g: F.md5(g)))
    return F.concat_ws("|", F.slice(hashes, 1, keep))


def doc_fingerprints(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col),
        fingerprint_expr(F.col(text_col)).alias("fingerprint"),
    )
