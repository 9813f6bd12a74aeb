"""Property tests: the native-expression text functions must agree
with transparent pure-Python models on arbitrary unicode input (the
same re-derivation discipline as the chunker's hypothesis suite)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from converttovectordb_spark.functions.text import (
    token_count,
    tokens,
    word_shingles,
)

# The engine contract is Java-regex \s (and RE2's on the DuckDB oracle
# side): ASCII whitespace only. Python's \s additionally matches
# \x1c-\x1f and unicode spaces — the property model must follow the
# ENGINES, not Python (hypothesis found the divergence on '\x1f').
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(s: str) -> list[str]:
    return [t for t in _WS.split(s) if t != ""]


texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_tokens_and_counts_match_python(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, s string")
    got = {
        r.i: (r.t, r.n)
        for r in df.select(
            "i", tokens(F.col("s")).alias("t"), token_count(F.col("s")).alias("n")
        ).collect()
    }
    for i, x in enumerate(xs):
        expect = _py_tokens(x)
        assert got[i][0] == expect, (x, got[i][0], expect)
        assert got[i][1] == len(expect)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_word_shingles_match_python(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, s string")
    got = {
        r.i: r.sh
        for r in df.select("i", word_shingles(F.col("s"), 3).alias("sh")).collect()
    }
    for i, x in enumerate(xs):
        t = _py_tokens(x)
        expect = (
            [" ".join(t[j : j + 3]) for j in range(len(t) - 2)]
            if len(t) >= 3
            else []
        )
        assert got[i] == expect, (x, got[i], expect)


def test_bm25_matches_hand_computation(spark):
    """Exact BM25 arithmetic on a 3-doc corpus, checked against the
    textbook formula computed in plain Python."""
    from converttovectordb_spark.operators.search import bm25_scores

    corpus = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "cherry cherry cherry durian",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.bm25
        for r in bm25_scores(df, ["apple", "cherry"]).collect()
    }

    k1, b = 1.2, 0.75
    n_docs = len(corpus)
    toks = {k: v.split() for k, v in corpus.items()}
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df_t = {
        term: sum(1 for t in toks.values() if term in t)
        for term in ["apple", "cherry"]
    }

    def score(doc):
        t = toks[doc]
        s = 0.0
        for term in ["apple", "cherry"]:
            tf = t.count(term)
            if tf == 0:
                continue
            idf = math.log((n_docs - df_t[term] + 0.5) / (df_t[term] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        return s

    assert set(got) == {1, 2, 3}
    for doc in got:
        assert math.isclose(got[doc], score(doc), rel_tol=1e-12), doc
