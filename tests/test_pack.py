"""Sequence packing (operators/pack.py): the two-phase distributed
prefix sum must be exactly the naive single-window formulation — and
must NOT plan a global single-partition window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from converttovectordb_spark.operators.pack import pack_bins, pack_offsets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks long")


def _naive(df):
    w = Window.orderBy(F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return df.withColumn(
        "start", F.coalesce(F.sum("toks").over(w), F.lit(0)).cast("bigint")
    )


@pytest.mark.parametrize("n_buckets", [1, 3, 32])
def test_offsets_match_naive_window(spark, n_buckets):
    rows = [(i * 7 % 101, (i * 13) % 40) for i in range(101)]  # sparse ids
    df = _docs(spark, rows)
    got = {
        r["doc_id"]: r["start"]
        for r in pack_offsets(df, n_buckets=n_buckets).collect()
    }
    want = {r["doc_id"]: r["start"] for r in _naive(df).collect()}
    assert got == want


def test_offsets_empty_and_single_row(spark):
    assert pack_offsets(_docs(spark, [])).count() == 0
    one = pack_offsets(_docs(spark, [(5, 9)])).collect()
    assert one[0]["start"] == 0


def test_bins_semantics(spark):
    # tokens: 600, 600, 600 with ctx 1024 → starts 0, 600, 1200 →
    # bins 0, 0, 1; doc 1 straddles the boundary but belongs to bin 0
    df = _docs(spark, [(0, 600), (1, 600), (2, 600)])
    got = {
        r["bin"]: (r["n_docs"], r["bin_tokens"], r["first_doc"])
        for r in pack_bins(df, 1024).collect()
    }
    assert got == {0: (2, 1200, 0), 1: (1, 600, 2)}
    with pytest.raises(ValueError, match="ctx"):
        pack_bins(df, 0)


def test_offsets_property_random_corpora(spark):
    """Property: for ARBITRARY (sparse, unordered, negative-id) corpora
    and any bucket count, the two-phase scan equals the transparent
    pure-Python prefix sum. Hypothesis-style but with explicit seeds —
    a Spark job per example is too slow for @given's default budget."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = rng.randint(1, 60)
        ids = rng.sample(range(-1000, 1000), n)
        rows = [(i, rng.randint(0, 99)) for i in ids]
        df = _docs(spark, rows)
        want, acc = {}, 0
        for i, t in sorted(rows):
            want[i] = acc
            acc += t
        for nb in (1, rng.randint(2, 9), 64):
            got = {
                r["doc_id"]: r["start"]
                for r in pack_offsets(df, n_buckets=nb).collect()
            }
            assert got == want, (seed, nb)


def test_no_global_window_in_plan(spark):
    """The scale contract: every window is partitioned by the range
    bucket — a global (empty-partition) window would collapse 100 TB
    into one task."""
    df = _docs(spark, [(i, i % 10) for i in range(100)])
    plan = (
        pack_offsets(df, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "_bucket" in m.group(0) or "windowspec" not in m.group(0)
    # stronger: the WindowExec single-partition warning pattern is an
    # empty partitionBy — assert every windowspecdefinition carries a
    # partition key
    assert "Window" in plan
    assert not re.search(r"Window \[[^\]]+\], \[\]", plan), plan


def test_release_pins_frees_pack_offsets_persist(spark):
    """pack_offsets persists its input as part of its plan (the 3-action
    prefix sum); a long-lived caller must be able to release it via
    pins.release_pins() so repeated calls do not grow the persisted-RDD
    set for the life of the session (r15 advisory)."""
    from converttovectordb_spark import pins

    sc = spark.sparkContext
    pins.release_pins()  # start from a clean registry
    base = sc._jsc.sc().getPersistentRDDs().size()
    for _ in range(3):
        df = _docs(spark, [(i, i % 7) for i in range(50)])
        pack_offsets(df, n_buckets=4).count()  # materialize
        assert sc._jsc.sc().getPersistentRDDs().size() > base
        released = pins.release_pins()
        assert released >= 1
        assert sc._jsc.sc().getPersistentRDDs().size() == base
