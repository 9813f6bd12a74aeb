"""Text-analysis column expressions for LLM-corpus processing.

All native Catalyst expressions (split / filter / transform / regexp) —
no Python UDFs — so they vectorize in whole-stage codegen and scale
linearly with the corpus. Every function documents its exact semantics
because the DuckDB oracle re-implements them in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny multilingual stopword marker sets for the n-gram/stopword
#: language-ID heuristic. Deterministic and oracle-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "y", "es", "de"],
    "zh": ["de5", "shi4", "he2"],  # romanized markers for synthetic data
}

ENGLISH_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
]


#: ASCII whitespace, written out explicitly: Java's `\s` includes \x0B
#: where RE2's (the DuckDB oracle's engine) does not, so `\s` would
#: silently tokenize differently across engines on vertical-tab input.
#: One explicit class keeps every engine on the same contract.
ASCII_WS = "[ \\t\\n\\x0B\\f\\r]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization: split on runs of ASCII whitespace, drop
    empties (see ASCII_WS for why not `\\s`)."""
    return F.filter(F.split(text, ASCII_WS), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens (bigint)."""
    return F.size(tokens(text)).cast("bigint")


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("bigint")


def word_shingles_of(toks: Column, n: int) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. Callers that shingle long texts must project ``tokens()``
    into a column FIRST and pass it here: codegen does not CSE inside
    higher-order-function lambdas, so referencing the tokenize
    expression directly re-runs the regex split once per shingle
    position — a measured ~5x wall-clock blowup on the substring-dedup
    path (same pitfall `_exploded_shingles` documents)."""
    # Guard: F.sequence(0, negative) would generate a DESCENDING range,
    # so short texts must short-circuit to an empty array.
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as 'w1 w2 ... wn' strings (distinct not applied).

    Built from tokens via transform-over-index so it stays JVM-side:
    positions 0..len-n, each joined with single spaces. NOTE the
    embedded ``tokens()`` re-evaluates per position inside the lambda —
    fine for one-shot short-text use; hot paths should materialize the
    token array and use `word_shingles_of`.
    """
    return word_shingles_of(tokens(text), n)


def char_ngrams(text: Column, n: int = 8) -> Column:
    """Character n-grams (all positions, length-n substrings)."""
    return F.when(
        F.length(text) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (n - 1)),
            lambda i: F.substring(text, i.cast("int"), n),
        )
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ] — a crude
    punctuation/noise signal for quality filtering."""
    cleaned = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(cleaned).cast("double") / F.length(text).cast("double")
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) English stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or ENGLISH_STOPWORDS)])
    toks = tokens(F.lower(text))
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_sw.cast("double") / F.size(toks).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    length band (50..5000 chars), low punct ratio, mid stopword ratio.

    Weights: 0.4·length_ok + 0.3·(1-punct_ratio) + 0.3·stopword_band.
    """
    length_ok = F.when(
        (F.length(text) >= 50) & (F.length(text) <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_band = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * sw_band
    )
