"""Hybrid (BM25 + cosine, RRF-fused) retrieval through the engine
facade: keyword hits must surface even when the embedding arm smooths
them away, and the fusion must stay deterministic and bounded."""

from __future__ import annotations

from converttovectordb_spark.embeddings import hash_embedder
from converttovectordb_spark.engine import VectorEngine


def _engine(spark, tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    (repo / "zeph.py").write_text(
        "def zephyrblue_handler():\n    # zephyrblue zephyrblue marker\n"
        + "    return 42\n" * 20
    )
    (repo / "other.py").write_text(
        "def unrelated():\n    return 'plain text with common words'\n" * 20
    )
    eng = VectorEngine(
        spark,
        str(tmp_path / "store"),
        embedder=hash_embedder(16),
        dim=16,
        chunk_size=400,
        overlap=50,
    )
    eng.ingest(str(repo))
    return eng


def test_hybrid_finds_exact_keyword(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    rows = eng.search_hybrid("zephyrblue", top_k=3).collect()
    assert 0 < len(rows) <= 3
    # the keyword-bearing chunk must win the fusion
    assert "zephyrblue" in rows[0].content
    # rrf scores are descending and positive
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True) and scores[-1] > 0


def test_hybrid_is_deterministic(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    a = [(r.path, r.chunk_index, r.rrf) for r in eng.search_hybrid("return value", top_k=5).collect()]
    b = [(r.path, r.chunk_index, r.rrf) for r in eng.search_hybrid("return value", top_k=5).collect()]
    assert a == b and len(a) > 0


def test_hybrid_unknown_terms_fall_back_to_semantic(spark, tmp_path):
    eng = _engine(spark, tmp_path)
    # no document contains this token: the BM25 arm is empty, so the
    # fusion must degrade to the semantic ranking instead of erroring
    # or returning nothing
    rows = eng.search_hybrid("qqqxyzzyunknown", top_k=3).collect()
    assert len(rows) > 0
    assert all(r.lex_rank is None and r.sem_rank is not None for r in rows)


def test_hybrid_empty_store_returns_empty(spark, tmp_path):
    eng = VectorEngine(
        spark, str(tmp_path / "nostore"), embedder=hash_embedder(16), dim=16
    )
    assert eng.search_hybrid("anything").count() == 0


def test_hybrid_schema_same_for_empty_and_populated_store(spark, tmp_path):
    """Round-2 advisory: callers that branch on columns or union
    results must never see a store-state-dependent schema."""
    empty_eng = VectorEngine(
        spark, str(tmp_path / "nostore"), embedder=hash_embedder(16), dim=16
    )
    full_eng = _engine(spark, tmp_path)
    empty_cols = set(empty_eng.search_hybrid("x").columns)
    full_cols = set(full_eng.search_hybrid("x").columns)
    assert empty_cols == full_cols
    assert {"sem_rank", "lex_rank", "rrf"} <= empty_cols
    # unionByName across the two states must be legal
    empty_eng.search_hybrid("x").unionByName(
        full_eng.search_hybrid("x")
    ).collect()
