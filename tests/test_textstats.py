"""Text-analysis function/operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.functions.text import (
    char_ngrams,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)
from converttovectordb_spark.operators.textstats import (
    doc_fingerprints,
    lang_id_expr,
    token_stats,
)


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame(
        [("a b  c   d",), ("",), ("one",)], ["text"]
    )
    out = df.select(
        token_count(F.col("text")).alias("n"),
        word_shingles(F.col("text"), 3).alias("sh"),
        char_ngrams(F.col("text"), 8).alias("cg"),
    ).collect()
    assert out[0].n == 4
    assert out[0].sh == ["a b c", "b c d"]
    assert out[1].n == 0 and out[1].sh == []  # empty → no negative ranges
    assert out[2].n == 1 and out[2].sh == []  # fewer tokens than n
    assert out[2].cg == []  # text shorter than ngram size


def test_ratios_and_quality(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("!!! ??? ###",), ("",)], ["text"]
    )
    rows = df.select(
        punct_ratio(F.col("text")).alias("p"),
        stopword_ratio(F.col("text")).alias("s"),
        quality_score(F.col("text")).alias("q"),
    ).collect()
    assert rows[0].p == 0.0
    assert rows[0].s == pytest.approx(3 / 6)  # the, on, the
    assert rows[1].p > 0.5 and rows[1].s == 0.0
    assert rows[2].p == 0.0 and rows[2].s == 0.0
    assert rows[1].q < rows[0].q


def test_lang_id_rules(spark):
    df = spark.createDataFrame(
        [
            ("der hund und die katze ist da",),
            ("the cat and a dog of mine",),
            ("xyzzy qwerty",),
            ("le chat et la maison est les",),
        ],
        ["text"],
    )
    got = [r.p for r in df.select(lang_id_expr(F.col("text")).alias("p")).collect()]
    assert got == ["de", "en", "und", "fr"]


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "a wholly different document body right here")],
        ["doc_id", "text"],
    )
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprints(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert len(fp[1].split("|")) == 4


def test_token_stats_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "a a a a", "en"), (3, "x y", "de")],
        ["doc_id", "text", "lang"],
    )
    rows = {r.lang: r for r in token_stats(df).collect()}
    assert rows["en"].n_docs == 2
    assert rows["en"].avg_tokens == pytest.approx(3.5)
    # ttr: (3/3 + 1/4)/2
    assert rows["en"].avg_ttr == pytest.approx((1.0 + 0.25) / 2)
    assert rows["de"].n_docs == 1


def test_pii_patterns_count_and_redact(spark):
    """The pii_redact patterns must both COUNT and REDACT planted PII
    (the synthetic corpus contains none, so the oracle alone only
    proves regex-dialect parity — this pins actual matches)."""
    from pyspark.sql import functions as F

    from converttovectordb_spark.queries import _PII_EMAIL, _PII_IPV4

    df = spark.createDataFrame(
        [
            (1, "contact alice.smith+x@example.co.uk or 10.0.0.1 now"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org, ip 192.168.254.254."),
        ],
        ["doc_id", "text"],
    )
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL), F.lit(0))).alias("e"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_IPV4), F.lit(0))).alias("i"),
            red.alias("r"),
        ).collect()
    }
    assert (rows[1].e, rows[1].i) == (1, 1)
    assert rows[1].r == "contact <EMAIL> or <IP> now"
    assert (rows[2].e, rows[2].i) == (0, 0)
    assert (rows[3].e, rows[3].i) == (2, 1)
    assert rows[3].r == "two mails <EMAIL> <EMAIL>, ip <IP>."
