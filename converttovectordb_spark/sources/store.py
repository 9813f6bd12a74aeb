"""Parquet-backed document store — the engine's persistent table.

Replaces the reference's whole-file JSON persistence
(mock_vector_db_api.py:54-148: every 100-row append rewrites the entire
growing table — the O(N²) ingest bottleneck visible in its logs as
0.03 s→0.34 s+ per batch). Here appends are new immutable parquet
files: O(batch), columnar, splittable, schema-enforced.

Validation semantics kept from the reference (minus its pop-the-wrong-
row bug at mock_vector_db_api.py:205-210, documented divergence):
rows must carry non-null `content` and `embedding` to be accepted on
append (:181-190); loads drop rows with null embeddings (:107-115).

Scale posture: the store is partitioned by `extension` (low-cardinality,
query-aligned — stats and per-filetype pipelines prune partitions), and
a higher-cardinality layout (e.g. IVF cluster id) can be layered per
table for similarity-search partition pruning.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DocumentStore:
    """A directory of partitioned parquet holding the documents table."""

    def __init__(self, spark: SparkSession, path: str, partition_by: tuple[str, ...] = ()):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by

    # -- write path ------------------------------------------------------
    def append(self, docs: DataFrame, *, validate: bool = True) -> int:
        """Append a batch; returns the REAL number of rows written.
        Invalid rows (null content/embedding) are dropped, mirroring
        reference ingest validation (mock_vector_db_api.py:181-190).

        The count rides the write job itself as a `df.observe` metric
        (CollectMetrics) — no second pass over the data."""
        from pyspark.sql import Observation

        if validate:
            docs = docs.filter(
                F.col("content").isNotNull() & F.col("embedding").isNotNull()
            )
        obs = Observation()
        docs = docs.observe(obs, F.count(F.lit(1)).alias("rows_written"))
        writer = docs.write.mode("append")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)
        return int(obs.get["rows_written"])

    def overwrite(self, docs: DataFrame) -> None:
        writer = docs.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)

    def clear(self, *, backup: bool = True) -> None:
        """Drop the table; optional timestamped backup directory mirrors
        the reference's pre-clear .bak behavior
        (mock_vector_db_api.py:395-403)."""
        if not os.path.exists(self.path):
            return
        if backup:
            shutil.move(self.path, f"{self.path}.bak.{int(time.time())}")
        else:
            shutil.rmtree(self.path)

    # -- read path -------------------------------------------------------
    def load(self, *, require_embedding: bool = True) -> DataFrame:
        """Load the table; rows without embeddings are dropped as in the
        reference's load (mock_vector_db_api.py:107-115)."""
        df = self.spark.read.parquet(self.path)
        if require_embedding:
            df = df.filter(F.col("embedding").isNotNull())
        return df

    def exists(self) -> bool:
        return os.path.exists(self.path)
