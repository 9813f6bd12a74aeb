"""Corpus statistics — the reference's `/stats` aggregate suite.

Reference (mock_vector_db_api.py:314-379) computes in one Python loop:
  A1 total row count                     (:366)
  A2 count grouped by extension, missing → 'unknown'   (:334,340-342)
  A3 exact distinct count of non-empty paths           (:335,344-347)
  A4 sum of content sizes, reported in KB              (:336,349-351,369)
  A5 avg chunks per file: per-path last total_chunks, then mean
     (:337,353-360,370)

Spark-first: A1/A3/A4 collapse into ONE hash-aggregate pass; A2 is one
groupBy; A5 is a two-level aggregate (groupBy path → avg). Catalyst
prunes the embedding column out of all of them automatically — the
reference reads every full row. At 100 TB these are map-side partial
aggregates + a single tiny shuffle of the partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(docs: DataFrame) -> DataFrame:
    """A1+A3+A4 (+avg content length) in a single aggregate pass over the
    engine's documents table (path/extension/content/total_chunks)."""
    return docs.agg(
        F.count(F.lit(1)).alias("total_documents"),
        F.countDistinct(
            F.when(F.col("path") != "", F.col("path"))
        ).alias("unique_files"),
        (F.sum(F.length("content")) / F.lit(1024.0)).alias(
            "total_content_kb"
        ),
        F.avg(F.length("content")).alias("avg_content_chars"),
    )


def docs_by_extension(docs: DataFrame) -> DataFrame:
    """A2: per-extension counts with the reference's 'unknown' default
    for missing extensions (mock_vector_db_api.py:341)."""
    return (
        docs.groupBy(
            F.coalesce(F.col("extension"), F.lit("unknown")).alias("extension")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def avg_chunks_per_file(docs: DataFrame) -> DataFrame:
    """A5: per-path total_chunks (constant per path — max==last), then
    mean across paths."""
    per_file = docs.groupBy("path").agg(
        F.max("total_chunks").alias("chunks")
    )
    return per_file.agg(F.avg("chunks").alias("avg_chunks_per_file"))


def corpus_stats_full(docs: DataFrame) -> DataFrame:
    """A1+A3+A4+avg-chars+A5 in ONE action (one two-level aggregate).

    A5 already forces a per-path groupBy; every global stat is
    recoverable from those per-path partials, so the whole /stats
    suite rides the SAME shuffle instead of three separate jobs
    (reference computes all of it in one Python loop,
    mock_vector_db_api.py:314-379 — one pass there, one job here):
      total_documents   = sum of per-path row counts
      unique_files      = count of non-empty path groups (path='' and
                          NULL-path groups excluded, matching
                          countDistinct(when(path != '', path)))
      total_content_kb  = sum of per-path content-length sums / 1024
      avg_content_chars = global length sum / global row count
      avg_chunks_per_file = avg of per-path max(total_chunks), every
                          path group included — identical to
                          `avg_chunks_per_file` on its own.
    At 100 TB: map-side partial agg on path, one small shuffle, then a
    single-row reduce — no extra scan per statistic."""
    per_file = docs.groupBy("path").agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.length("content")).alias("_n_content"),
        F.sum(F.length("content")).alias("_len"),
        F.max("total_chunks").alias("_chunks"),
    )
    return per_file.agg(
        # coalesce: sum over zero groups is NULL, but the empty-db stats
        # shape must degrade to 0 like the reference's Python loop (and
        # the pre-fusion single-level count() did).
        F.coalesce(F.sum("_n"), F.lit(0)).alias("total_documents"),
        F.count(F.when(F.col("path") != "", F.lit(1))).alias("unique_files"),
        F.coalesce(F.sum("_len") / F.lit(1024.0), F.lit(0.0)).alias(
            "total_content_kb"
        ),
        # divide by non-null-content rows, matching avg(length(content))
        (F.sum("_len") / F.sum("_n_content")).alias("avg_content_chars"),
        F.avg("_chunks").alias("avg_chunks_per_file"),
    )


def health(docs: DataFrame) -> dict:
    """A6 analog: basic liveness counters."""
    row = docs.agg(
        F.count(F.lit(1)).alias("documents_count"),
        F.count(F.col("embedding")).alias("embeddings_count"),
    ).collect()[0]
    return {
        "status": "healthy",
        "documents_count": row["documents_count"],
        "embeddings_count": row["embeddings_count"],
    }
