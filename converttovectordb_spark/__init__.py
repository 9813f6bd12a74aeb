"""converttovectordb_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system ``mynk322/convertToVectorDB`` (a repo→vector-database
pipeline with brute-force cosine top-k search), rebuilt idiomatically on
Spark DataFrames / Parquet / Arrow, and extended with the LLM-data-pipeline
operators a 100 TB training-data corpus needs (dedup, similarity search,
text analysis, multimodal plumbing).

Public surface:
    session     — SparkSession factory tuned for this engine
    schema      — canonical schemas (documents store, scan records)
    functions   — column-expression library (vector math, text analysis)
    sources     — repo file scan, chunker, parquet-backed document store
    operators   — search / stats / dedup / relational ops
    embeddings  — injectable embedder + Arrow-batched inference
    streaming   — structured-streaming ingest & windowed aggregation
"""

from converttovectordb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
