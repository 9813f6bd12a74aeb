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


class DimensionMismatch(ValueError):
    """A pushed embedding's length differs from the store dimension —
    separated from plain ValueError so the REST door can count it as
    its own rejection class (the reference fails loudly on shape
    mismatch; silently-accepted wrong-dim rows would score NULL at
    query time and vanish from results)."""


def normalize_push_row(
    doc: dict,
    *,
    dim: int | None,
    now: float,
    default_chunk_index: int = 0,
) -> tuple:
    """One pushed document dict → a DOCUMENTS_SCHEMA tuple. The single
    normalization rule shared by the REST /add_documents door and the
    CLI `push` verb (extension derived via os.path.splitext like the
    repo scan; embedding float-cast and dimension-guarded; content
    must be a real string — `null` is a producer bug, not the text
    "None"). Raises ValueError (or DimensionMismatch) with a short
    reason; the callers wrap it in their own policy (the REST door
    counts rejects per class, the CLI fails loudly with a line
    number)."""
    import os as _os

    if not isinstance(doc, dict):
        raise ValueError("each row must be a JSON object")
    content = doc.get("content")
    if not isinstance(content, str):
        raise ValueError("'content' must be a string")
    path = doc.get("path") or doc.get("file_path") or ""
    if not isinstance(path, str):
        raise ValueError("'path' must be a string")
    ext = doc.get("extension")
    if ext is None:
        ext = _os.path.splitext(_os.path.basename(path))[1] or None
    elif not isinstance(ext, str):
        # a non-string would pass per-row normalization and then blow
        # up in createDataFrame OUTSIDE the caller's per-doc error
        # handling, failing the whole batch instead of this one row
        raise ValueError("'extension' must be a string")
    emb = doc.get("embedding")
    if emb is not None:
        try:
            emb = [float(x) for x in emb]
        except (TypeError, ValueError):
            raise ValueError("'embedding' must be a numeric array")
        if dim is not None and len(emb) != dim:
            raise DimensionMismatch(
                f"embedding dimension {len(emb)} != store dimension {dim}"
            )
    try:
        chunk_index = int(doc.get("chunk_index", default_chunk_index))
        total_chunks = int(doc.get("total_chunks", 1))
    except (TypeError, ValueError):
        raise ValueError("'chunk_index'/'total_chunks' must be integers")
    try:
        ts = float(doc.get("timestamp", now))
    except (TypeError, ValueError):
        raise ValueError("'timestamp' must be a number")
    return (path, ext, chunk_index, total_chunks, content, emb, ts)
