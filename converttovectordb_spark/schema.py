"""Canonical schemas for the engine.

The document-store schema mirrors the reference's stored row shape
(reference: repo_to_vector.py:351-359 builds rows with path/extension/
chunk_index/total_chunks/content/embedding/timestamp) but as a typed,
columnar Parquet schema instead of schema-on-write JSON.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Default embedding dimensionality of the reference's model
#: (all-MiniLM-L6-v2 → 384; reference repo_to_vector.py:28, README.md:75).
#: The engine treats dimension as data-driven, this is only the default.
DEFAULT_EMBEDDING_DIM = 384

#: The engine's core table: one row per (file, chunk).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("extension", StringType(), True),
        StructField("chunk_index", IntegerType(), False),
        StructField("total_chunks", IntegerType(), False),
        StructField("content", StringType(), False),
        StructField("embedding", ArrayType(FloatType(), False), True),
        StructField("timestamp", DoubleType(), True),
    ]
)

#: Pre-chunking scan record (reference repo_to_vector.py:230-235).
REPO_FILES_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("content", StringType(), True),
        StructField("extension", StringType(), True),
        StructField("size", LongType(), False),
    ]
)

#: Multimodal asset record: opaque binary payload + typed metadata.
#: Decode/feature-extraction runs as Arrow-batched UDFs over `payload`
#: (see operators/multimodal.py); the engine never interprets the bytes
#: in the relational layer.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", StringType(), True),  # BinaryType in real use
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

#: Default ingest parameters (reference repo_to_vector.py:29,256,67-71,207).
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 200
DEFAULT_MAX_FILE_MB = 10
DEFAULT_ALLOWED_EXTENSIONS = frozenset(
    {
        ".py", ".js", ".ts", ".jsx", ".tsx", ".java", ".c", ".cpp", ".h",
        ".hpp", ".cs", ".go", ".rs", ".rb", ".php", ".swift", ".kt",
        ".scala", ".md", ".txt", ".json", ".yaml", ".yml", ".toml",
        ".sh", ".sql",
    }
)
