"""Bucketed-table layout: the co-located join strategy for repeated
large-×-large joins.

A join between two tables bucketed (and sorted) on the join key with
the same bucket count needs NO exchange at query time — each task
sort-merges bucket i of both sides. At 100 TB this converts the
biggest repeated shuffle (e.g. orders ⋈ lineitem on orderkey, or
doc-id joins across derived corpora) into a scan-side property paid
once at write time.

The reference has no partitioned storage at all (SURVEY §4.1 — one
JSON file); this module is the Spark-native replacement for "physical
layout as an optimization".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed table. Joins and
    aggregations on ``key`` between tables written with the same
    ``buckets`` count skip their Exchange."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").format("parquet").saveAsTable(table)


def physical_plan(df: DataFrame) -> str:
    """The executed/physical plan as a string (for shuffle assertions)."""
    return df._jdf.queryExecution().executedPlan().toString()
