"""Accuracy contracts for the sketch-based query twins.

r13: the queries now GRADE themselves — their hashed output carries
exact anchors plus per-sketch in-bound booleans (ε·N rank contract for
percentile_approx, 3σ·rsd for HLL++), and the DuckDB oracle asserts
the contract (PARITY upgraded from rows-only to value-bounded). These
tests pin the same property in-process, plus the anchor columns.
"""

from __future__ import annotations

from converttovectordb_spark.queries import (
    q_doc_stats_approx,
    q_value_percentiles,
    q_value_percentiles_approx,
)

SF_DIR = "/root/testdata/sf0.001"


def test_percentile_sketch_in_documented_bound(spark):
    exact = {
        r.event_type: r for r in q_value_percentiles(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r
        for r in q_value_percentiles_approx(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        assert a.n_events == e.n_events  # plain count stays exact
        # the query's own bound check: rank of the sketch's answer
        # within ε·n of the target, HLL within 3σ — any False here
        # also hash-fails the driver gate
        assert a.p25_in_bound and a.p50_in_bound and a.p75_in_bound, et
        assert a.users_in_bound, et


def test_hll_distinct_in_documented_bound(spark):
    row = q_doc_stats_approx(spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert row.total_docs == docs.count()
    assert row.docs_in_bound
    assert row.sources_in_bound
    assert row.langs_in_bound
    # anchor sanity: avg_chars is the exact aggregate, not a sketch
    from pyspark.sql import functions as F

    exact_avg = docs.agg(F.avg(F.length("text"))).first()[0]
    assert abs(row.avg_chars - exact_avg) < 1e-5
