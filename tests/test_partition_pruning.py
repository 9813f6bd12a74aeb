"""Partition-layout tests: cluster-partitioned corpus reads must prune
at the source — the IVF search path's scale mechanism."""

from __future__ import annotations

from pyspark.sql import functions as F

from converttovectordb_spark.plans import physical_plan


def test_cluster_partitioned_scan_prunes(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_corpus")
    # the IVF layout: coarse cluster id as the physical partition key
    emb.write.partitionBy("label").mode("overwrite").parquet(path)

    corpus = spark.read.parquet(path)
    probed = corpus.filter(F.col("label").isin([1, 3]))
    plan = physical_plan(probed)
    # the filter must land in PartitionFilters (directory pruning),
    # not as a post-scan row filter
    assert "PartitionFilters: [" in plan
    assert "label" in plan.split("PartitionFilters:")[1].split("]")[0]

    full = corpus.count()
    pruned = probed.count()
    assert 0 < pruned < full
