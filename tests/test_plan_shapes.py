"""Plan-shape regression tests: the physical plans the scale design
depends on must not silently degrade (a broadcast flipping to a
sort-merge join, or a pruned scan flipping to a full scan, is a scale
bug even when results stay correct)."""

from __future__ import annotations

from converttovectordb_spark.plans import physical_plan
from converttovectordb_spark.queries import (
    q_contamination_screen,
    q_nation_trade_flow,
    q_region_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


def test_nation_trade_flow_broadcasts_all_dims(spark):
    plan = physical_plan(q_nation_trade_flow(spark, SF_DIR))
    assert "SortMergeJoin" not in plan  # fact table never shuffles for dims
    assert plan.count("BroadcastHashJoin") == 5


def test_region_revenue_broadcasts_all_dims(spark):
    plan = physical_plan(q_region_revenue(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 4


def test_contamination_screen_broadcasts_benchmark(spark):
    plan = physical_plan(q_contamination_screen(spark, SF_DIR))
    # the benchmark shingle set is the broadcast side; the corpus is
    # never shuffled on text
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_gopher_quality_is_two_projections_no_agg(spark):
    from converttovectordb_spark.queries import q_gopher_quality

    plan = physical_plan(q_gopher_quality(spark, SF_DIR))
    # pure map-side signals: no aggregation, no join, and the only
    # exchange is the small-file spread repartition (never a hash
    # partitioning keyed on data)
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert "hashpartitioning" not in plan


def test_hybrid_rrf_arms_are_topk_not_global_sort(spark):
    from converttovectordb_spark.queries import q_hybrid_rrf

    plan = physical_plan(q_hybrid_rrf(spark, SF_DIR))
    # each arm reduces via TakeOrderedAndProject before the rank
    # window; a global Sort of either corpus would be a scale bug.
    # (The final FULL OUTER fusion of the two ≤50-row rank lists is a
    # SortMergeJoin by necessity — Spark cannot broadcast full outer —
    # and is trivially small by construction.)
    assert plan.count("TakeOrderedAndProject") >= 2


def test_tfidf_df_join_broadcasts_nothing_quadratic(spark):
    from converttovectordb_spark.queries import q_tfidf_topterms

    plan = physical_plan(q_tfidf_topterms(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the single-row corpus count joins as a broadcast nested loop
    assert "BroadcastNestedLoopJoin" in plan


def test_vector_topk_probe_is_broadcast_not_literal(spark):
    from converttovectordb_spark.queries import q_vector_topk

    plan = physical_plan(q_vector_topk(spark, SF_DIR))
    # probe rides as a broadcast row; corpus reduces via top-k, not sort
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
