"""As-of join and band join operator tests."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from converttovectordb_spark.operators.joins import asof_join, band_join


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(20)), (3, 200, _ts(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(15), 2.0), (200, _ts(9), 9.0)],
        ["user_id", "ts", "value"],
    )
    out = asof_join(
        left, right, on="user_id", right_payload=["ts", "value"], prefix="r_"
    )
    rows = {r["event_id"]: r for r in out.collect()}
    # equal timestamps match (inclusive)
    assert rows[1]["r_value"] == 1.0
    # latest prior wins
    assert rows[2]["r_value"] == 2.0
    # no prior right row -> null payload, left row kept
    assert rows[3]["r_value"] is None and rows[3]["r_ts"] is None


def test_asof_dedupes_right_per_timestamp(spark):
    left = spark.createDataFrame([(1, 7, _ts(30))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(7, _ts(30), 1.0), (7, _ts(30), 5.0)], ["user_id", "ts", "value"]
    )
    out = asof_join(
        left, right, on="user_id", right_payload=["ts", "value"], prefix="r_"
    )
    rows = out.collect()
    # one output row; the kept right row is last by payload order (value desc)
    assert len(rows) == 1 and rows[0]["r_value"] == 5.0


def test_band_join_half_open_intervals(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 25.0), (4, 99.0)], ["id", "v"]
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 20.0), ("high", 20.0, 50.0)], ["band", "lo", "hi"]
    )
    out = band_join(df, bands, value_col="v")
    got = {r["id"]: r["band"] for r in out.collect()}
    # 20.0 falls in [20, 50), not [0, 20); 99.0 matches no band (inner join)
    assert got == {1: "low", 2: "high", 3: "high"}
