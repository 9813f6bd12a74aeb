"""SparkSession factory for the engine.

Defaults are tuned for correctness-vs-oracle (UTC timestamps, ANSI off to
match DuckDB's permissive arithmetic only where needed) and for scale
(AQE on, skew-join handling on, Arrow on for every pandas interchange).

On a real cluster the same builder is used — only ``master`` and the
shuffle-partition count change (shuffle partitions ≈ 2-3× total cores;
AQE coalesces them down at runtime, so over-provisioning is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "converttovectordb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Env knobs (driver contract): ``SPARK_GRAFT_CPUS`` sets local
    parallelism; defaults to ``local[*]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Oracle parity: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Scale posture: adaptive execution re-plans shuffles at runtime,
        # coalesces small partitions, and splits skewed ones.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas_udf / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scans: pushdown + vectorized reader are defaults, keep
        # them pinned so .explain shows PushedFilters at every scan.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_local_tests(spark: SparkSession) -> SparkSession:
    """Small-data settings for unit tests: fewer shuffle partitions."""
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    return spark
