"""The engine facade — the reference's CLI verbs as one Python API.

Reference surface (run_vector_db.py subcommands + HTTP endpoints):
  convert → ingest(repo_path)     clone/scan → chunk → embed → store
  query   → search(text, top_k)   encode → brute-force cosine top-k
  stats   → stats()               A1-A5 aggregate suite
  clear   → clear()               drop table (with backup)
  health  → health()

One SparkSession, one DataFrame lineage per verb — the reference's
process/HTTP boundaries (subprocess Popen + Flask) collapse into Spark
stages.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from converttovectordb_spark.embeddings import (
    DEFAULT_DIM,
    embed_column,
    hash_embedder,
)
from converttovectordb_spark.operators.search import (
    DEFAULT_SCORE_THRESHOLD,
    knn_topk,
    validate_top_k,
)
from converttovectordb_spark.operators.stats import (
    avg_chunks_per_file,
    corpus_stats,
    docs_by_extension,
    health as _health,
)
from converttovectordb_spark.sources.chunker import explode_chunks
from converttovectordb_spark.sources.repo_scan import (
    clone_repository,
    scan_repo_files,
)
from converttovectordb_spark.sources.store import DocumentStore


class VectorEngine:
    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        *,
        embedder: Callable | None = None,
        dim: int = DEFAULT_DIM,
        chunk_size: int = 1000,
        overlap: int = 200,
    ):
        self.spark = spark
        self.store = DocumentStore(spark, store_path, partition_by=("extension",))
        self.embedder = embedder or hash_embedder(dim)
        self.dim = dim
        self.chunk_size = chunk_size
        self.overlap = overlap

    # -- ingest ----------------------------------------------------------
    def ingest(self, repo_path: str, *, repo_url: str | None = None) -> DataFrame:
        """scan → chunk → embed → append. Returns the written batch."""
        if repo_url:
            clone_repository(repo_url, repo_path)
        files = scan_repo_files(self.spark, repo_path)
        chunks = explode_chunks(
            files, chunk_size=self.chunk_size, overlap=self.overlap
        )
        docs = embed_column(
            chunks, "content", "embedding", self.embedder, self.dim
        ).withColumn("timestamp", F.lit(time.time()))
        batch = docs.select(
            "path",
            "extension",
            "chunk_index",
            "total_chunks",
            "content",
            "embedding",
            "timestamp",
        )
        self.store.append(batch)
        return batch

    # -- query -----------------------------------------------------------
    def search(self, query_text: str, top_k: int = 5) -> DataFrame:
        """Encode the query driver-side (one string), then the
        broadcast-scan top-k with threshold-after-limit semantics."""
        qv = self.embedder([query_text])
        qv = np.asarray(qv, dtype=np.float64).reshape(-1).tolist()
        return knn_topk(
            self.store.load(),
            qv,
            validate_top_k(top_k),
            id_cols=["path", "chunk_index"],
            score_threshold=DEFAULT_SCORE_THRESHOLD,
            expected_dim=self.dim,  # engine knows its dim → zero-job Q5 guard
        )

    def search_vector(self, query_vector: list[float], top_k: int = 5) -> DataFrame:
        return knn_topk(
            self.store.load(),
            query_vector,
            validate_top_k(top_k),
            id_cols=["path", "chunk_index"],
            expected_dim=self.dim,
        )

    # -- stats / admin ---------------------------------------------------
    def stats(self) -> dict:
        docs = self.store.load(require_embedding=False)
        base = corpus_stats(docs).collect()[0].asDict()
        by_ext = {
            r["extension"]: r["n_docs"] for r in docs_by_extension(docs).collect()
        }
        avg_chunks = avg_chunks_per_file(docs).collect()[0][0]
        base["documents_by_extension"] = by_ext
        base["avg_chunks_per_file"] = avg_chunks
        return base

    def health(self) -> dict:
        if not self.store.exists():
            return {"status": "healthy", "documents_count": 0, "embeddings_count": 0}
        return _health(self.store.load(require_embedding=False))

    def clear(self, *, backup: bool = True) -> None:
        self.store.clear(backup=backup)
