"""Ingest path (scan → chunk → embed → store) + engine facade tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.embeddings import hash_embed_one, hash_embedder
from converttovectordb_spark.engine import VectorEngine
from converttovectordb_spark.sources.repo_scan import scan_repo_files
from converttovectordb_spark.sources.store import DocumentStore


@pytest.fixture()
def repo_tree(tmp_path):
    (tmp_path / "src" / ".hidden").mkdir(parents=True)
    (tmp_path / "docs").mkdir()
    (tmp_path / "src" / "main.py").write_text("def main():\n    pass\n" * 80)
    (tmp_path / "src" / "util.py").write_text("x = 1\n")
    (tmp_path / "docs" / "readme.md").write_text("# docs\nvector search\n")
    (tmp_path / "src" / ".hidden" / "s.py").write_text("hidden\n")
    (tmp_path / "logo.png").write_bytes(b"\x89PNG\x00binary")
    (tmp_path / "blank.txt").write_text("  \n\t\n")
    return str(tmp_path)


def test_scan_filters(spark, repo_tree):
    got = sorted(
        r.path for r in scan_repo_files(spark, repo_tree).select("path").collect()
    )
    # hidden dir, .png (extension not allowed), whitespace-only file: out
    assert got == ["docs/readme.md", "src/main.py", "src/util.py"]


def test_scan_size_filter(spark, tmp_path):
    (tmp_path / "big.py").write_text("x" * (11 * 1024 * 1024))
    (tmp_path / "ok.py").write_text("y = 2\n")
    got = [r.path for r in scan_repo_files(spark, str(tmp_path)).collect()]
    assert got == ["ok.py"]


def test_hash_embedder_deterministic():
    a = hash_embed_one("hello", 16)
    b = hash_embed_one("hello", 16)
    c = hash_embed_one("world", 16)
    assert a == b
    assert a != c
    # unit norm
    assert sum(x * x for x in a) == pytest.approx(1.0)


def test_store_append_load_validation(spark, tmp_path):
    store = DocumentStore(spark, str(tmp_path / "docs"))
    df = spark.createDataFrame(
        [
            ("a.py", ".py", 0, 1, "content", [0.1, 0.2], 1.0),
            ("b.py", ".py", 0, 1, None, [0.1, 0.2], 1.0),     # invalid
            ("c.py", ".py", 0, 1, "content", None, 1.0),       # invalid
        ],
        "path string, extension string, chunk_index int, total_chunks int,"
        " content string, embedding array<double>, timestamp double",
    )
    store.append(df)
    assert store.load().count() == 1  # validation dropped 2 rows


def test_engine_end_to_end(spark, repo_tree, tmp_path):
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(32),
        dim=32, chunk_size=500, overlap=100,
    )
    eng.ingest(repo_tree)
    docs = eng.store.load()
    assert docs.count() > 0
    assert docs.filter(F.col("path").contains(".hidden")).count() == 0

    # search returns the most similar chunk for its own content
    sample = docs.select("content").limit(1).collect()[0].content
    res = eng.search(sample, top_k=3).collect()
    assert 0 < len(res) <= 3
    assert res[0].score == pytest.approx(1.0)  # self-similarity
    assert "embedding" not in res[0].asDict()  # reference T5: dropped
    # scores non-increasing
    scores = [r.score for r in res]
    assert scores == sorted(scores, reverse=True)

    stats = eng.stats()
    assert stats["total_documents"] == docs.count()
    assert stats["unique_files"] == 3
    assert ".py" in stats["documents_by_extension"]

    health = eng.health()
    assert health["documents_count"] == health["embeddings_count"]

    eng.clear(backup=False)
    assert not eng.store.exists()
    assert eng.health()["documents_count"] == 0
