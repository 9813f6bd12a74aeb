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
