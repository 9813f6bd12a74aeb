"""Overlap text chunker — reference operator T1.

Behavioral contract (reference repo_to_vector.py:256-306, re-derived,
not copied):
  * empty text → no chunks; text of length <= chunk_size → one chunk,
    the text itself, unmodified (:271-272).
  * otherwise windows of at most ``chunk_size`` chars; when the window
    does not reach end-of-text, the cut point snaps to:
      - one past the LAST newline inside [start, end) — but only if
        that newline lies strictly after start + chunk_size//2 (:282-284);
      - else one past the last space inside [start+chunk_size//2, end)
        if any (:286-289).
  * the next window starts at ``end - overlap`` unless that would not
    advance past ``start``, in which case it starts at ``end`` (:298).

The function is pure Python (it is inherently sequential per document)
and is applied distributedly as an Arrow-batched UDF + ``posexplode``:
one input row fans out to N chunk rows, and the chunk index / total
count come from the array position and size — no window function, no
shuffle (reference operator T2 for free).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from converttovectordb_spark.schema import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
)


def chunk_string(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> list[str]:
    """Chunk one document. Pure function; see module docstring for the
    exact cut-point rules."""
    if not text:
        return []
    n = len(text)
    if n <= chunk_size:
        return [text]

    half = chunk_size // 2
    out: list[str] = []
    start = 0
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            nl = text.rfind("\n", start, end)
            if nl > start + half:
                end = nl + 1
            else:
                sp = text.rfind(" ", start + half, end)
                if sp != -1:
                    end = sp + 1
        out.append(text[start:end])
        nxt = end - overlap
        start = nxt if nxt > start else end
    return out


def chunk_fixed_expr(
    text: Column,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> Column:
    """Fixed-stride overlap chunker as a NATIVE Catalyst expression
    (sequence → transform → substr): windows of ``chunk_size`` chars
    starting every ``chunk_size - overlap`` chars; empty text → no
    chunks. No boundary snapping (that variant needs per-char scanning
    — see chunk_string); in exchange this one stays in whole-stage
    codegen and is ANSI-SQL-expressible for the oracle.
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    starts = F.sequence(F.lit(1), F.length(text), F.lit(stride))
    return F.when(
        F.length(text) <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(starts, lambda i: F.substr(text, i, F.lit(chunk_size)))
    )


def chunk_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
):
    """Arrow-batched chunker UDF: string → array<string>."""

    @pandas_udf("array<string>")
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: chunk_string(t if isinstance(t, str) else "", chunk_size, overlap)
        )

    return _chunk


def explode_chunks(
    files: DataFrame,
    *,
    content_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """files(path, content, …) → one row per chunk with chunk_index /
    total_chunks / content columns (reference T1+T2 as one flatMap)."""
    chunked = files.withColumn(
        "_chunks", chunk_udf(chunk_size, overlap)(F.col(content_col))
    )
    return (
        chunked.withColumn("total_chunks", F.size("_chunks").cast("int"))
        .select(
            *[c for c in files.columns if c != content_col],
            "total_chunks",
            F.posexplode("_chunks").alias("chunk_index", "content"),
        )
        .withColumn("chunk_index", F.col("chunk_index").cast("int"))
    )
