"""Repository file scan as a DataFrame source — reference operator S2.

Filter contract (reference repo_to_vector.py:166-254, re-derived):
  * any path component starting with '.' is skipped (hidden dirs are
    pruned during the walk, hidden files at the path check, :188,:195);
  * extension must be in the allowlist (:200-204);
  * files larger than 10 MB are skipped (:207-211);
  * bytes are decoded utf-8 with errors ignored (:218);
  * files whose decoded content is whitespace-only are skipped (:222-225).

Spark-first shape: ``spark.read.format("binaryFile")`` gives a
distributed, splittable listing + read with **pushdown-able** path and
length predicates (PushedFilters on path/length reach the file index),
then decode + trim filters run as native expressions. The reference's
os.walk is a single-threaded driver loop; here listing and reading
parallelize across executors, which is the difference between 0.25 s
for 715 files and hours at 100 TB.

Git clone (reference S1, repo_to_vector.py:122-164) stays a driver-side
pre-step by design — cloning is not a data-parallel operation.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from converttovectordb_spark.schema import (
    DEFAULT_ALLOWED_EXTENSIONS,
    DEFAULT_MAX_FILE_MB,
)


def clone_repository(repo_url: str, target_dir: str) -> str:
    """Idempotent driver-side clone (reference S1 semantics: reuse the
    directory if it already is a git repo)."""
    if os.path.isdir(os.path.join(target_dir, ".git")):
        return target_dir
    os.makedirs(os.path.dirname(target_dir) or ".", exist_ok=True)
    subprocess.run(
        ["git", "clone", "--depth", "1", repo_url, target_dir],
        check=True,
        capture_output=True,
    )
    return target_dir


def _relative_path(path_col, repo_path: str):
    """Strip the ``file:<repo_path>/`` prefix LITERALLY (by length after
    URI-decoding), never via regex — a repo path containing regex
    metacharacters ('+', '(') or URI-encoding characters (space → %20)
    must still strip cleanly. binaryFile emits URI-style paths, so
    decode %XX escapes first, then substring past the known prefix.
    (url_decode is form-decoding — '+' would become a space — so literal
    '+' is pre-escaped to %2B before decoding.)"""
    decoded = F.url_decode(
        F.regexp_replace(
            F.regexp_replace(path_col, r"^file:", ""), r"\+", "%2B"
        )
    )
    prefix_len = len(repo_path) + 2  # +1 for '/', +1 for 1-based substring
    return F.when(
        F.substring(decoded, 1, len(repo_path) + 1) == repo_path + "/",
        F.substring(decoded, prefix_len, 1_000_000),
    ).otherwise(decoded)


def count_repo_files(spark: SparkSession, repo_path: str) -> int:
    """Total files under the tree — a metadata-only listing (column
    pruning keeps `content` unread; binaryFile answers from file status).

    Used for the A9 ``files_skipped`` metric: the scan itself prunes
    hidden/over-size/wrong-extension files at the file index — by design
    those files are never *opened* — so the skip count comes from this
    cheap listing, not from forcing the ingest scan to read them.

    Note: Hadoop's file index already drops dot-/underscore-prefixed
    names during LISTING, so hidden files are never enumerated and
    therefore never counted as skipped (divergence from the reference's
    os.walk counters, which sees and skips them; documented per SURVEY
    §7 — at scale you want them invisible to the listing, not listed
    then skipped).
    """
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(repo_path.rstrip("/"))
        .select("path")
        .count()
    )


def _is_hidden(path_col):
    """True when any path component starts with '.'."""
    return F.exists(
        F.split(path_col, "/"), lambda part: part.startswith(".")
    )


def scan_repo_files(
    spark: SparkSession,
    repo_path: str,
    *,
    allowed_extensions: frozenset[str] = DEFAULT_ALLOWED_EXTENSIONS,
    max_file_mb: int = DEFAULT_MAX_FILE_MB,
) -> DataFrame:
    """Distributed filtered scan → DataFrame(path, content, extension, size).

    `path` is repo-relative (reference uses os.path.relpath, :214).
    The size/extension filters are expressed on binaryFile's metadata
    columns so they prune before content bytes are materialized.
    """
    repo_path = repo_path.rstrip("/")
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(repo_path)
    )
    rel = _relative_path(F.col("path"), repo_path)
    ext = F.when(
        rel.rlike(r"\.[^/.]+$"),
        F.concat(F.lit("."), F.regexp_extract(rel, r"\.([^/.]+)$", 1)),
    ).otherwise(F.lit(""))
    decoded = (
        raw.select(
            rel.alias("path"),
            F.col("length").alias("size"),
            F.col("content").alias("raw"),
        )
        .filter(~_is_hidden(F.col("path")))
        .withColumn("extension", ext)
        .filter(
            F.col("extension").isin(*sorted(allowed_extensions))
        )
        .filter(F.col("size") <= max_file_mb * 1024 * 1024)
        # utf-8 with errors ignored ≈ decode + strip replacement chars.
        .withColumn(
            "content",
            F.regexp_replace(F.decode(F.col("raw"), "UTF-8"), "�", ""),
        )
        # Whitespace-ONLY files are skipped (reference :222-225 uses
        # str.strip() — note Spark's trim() strips spaces only, so a
        # regex covering \n\t etc. is required here).
        .filter(~F.col("content").rlike(r"^\s*$"))
        .select(
            "path",
            "content",
            "extension",
            F.length("content").cast("bigint").alias("size"),
        )
    )
    return decoded
