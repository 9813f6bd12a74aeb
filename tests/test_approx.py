"""Accuracy contracts for the sketch-based query twins.

These queries have no DuckDB oracle (Spark's percentile_approx / HLL++
are implementation-defined sketches), so their correctness gate lives
here: each approximate aggregate must land within its declared error
bound of the exact twin on the same data.
"""

from __future__ import annotations

from converttovectordb_spark.queries import (
    q_doc_stats_approx,
    q_value_percentiles,
    q_value_percentiles_approx,
)

SF_DIR = "/root/testdata/sf0.001"


def test_percentile_sketch_matches_exact_within_tolerance(spark):
    exact = {r.event_type: r for r in q_value_percentiles(spark, SF_DIR).collect()}
    approx = {
        r.event_type: r for r in q_value_percentiles_approx(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        assert a.n_events == e.n_events  # plain count stays exact
        spread = e.max_value - e.min_value or 1.0
        for p in ("p25", "p50", "p75"):
            # accuracy=10000 → sketch error ≤ n/10000 ranks; at this SF
            # that is ~exact, allow 2% of the value spread
            assert abs(getattr(a, p) - getattr(e, p)) <= 0.02 * spread, (et, p)


def test_hll_distinct_within_rsd(spark):
    row = q_doc_stats_approx(spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    true_docs = docs.select("doc_id").distinct().count()
    true_sources = docs.select("source").distinct().count()
    true_langs = docs.select("lang").distinct().count()
    assert row.total_docs == docs.count()
    # rsd=0.02 → generous 3-sigma window of 6%
    assert abs(row.approx_docs - true_docs) <= max(2, 0.06 * true_docs)
    assert abs(row.approx_sources - true_sources) <= max(2, 0.06 * true_sources)
    assert abs(row.approx_langs - true_langs) <= max(2, 0.06 * true_langs)
