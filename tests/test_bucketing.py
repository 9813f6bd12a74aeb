"""Bucketed co-located join: the join on the bucket key must compile
WITHOUT a shuffle exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from converttovectordb_spark.plans import physical_plan, write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 1000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    )
    write_bucketed(left, "t_bleft", key="k", buckets=4)
    write_bucketed(right, "t_bright", key="k", buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
        # sanity: the same join over non-bucketed inputs DOES shuffle
        plain = left.join(right, "k")
        assert "Exchange" in physical_plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
