"""Time travel through every public surface (VERDICT r4 ask #9).

`TransactionalDocumentStore.load(at_version=N)` existed since round 3
but was only reachable store-level; these tests pin the engine, CLI,
and REST paths to it: a pre-upsert snapshot must be readable after the
upsert replaced the row.
"""

from __future__ import annotations

import json

import pytest

from converttovectordb_spark.embeddings import hash_embedder
from converttovectordb_spark.engine import VectorEngine
from converttovectordb_spark.schema import DOCUMENTS_SCHEMA

DIM = 8


def _unit(i: int) -> list[float]:
    v = [0.0] * DIM
    v[i % DIM] = 1.0
    return v


def _doc_df(spark, content: str, emb: list[float]):
    return spark.createDataFrame(
        [("a.py", ".py", 0, 1, content, emb, 1.0)], schema=DOCUMENTS_SCHEMA
    )


@pytest.fixture()
def versioned_engine(spark, tmp_path):
    """v0: content 'old'; v1: upsert replaces it with 'new'."""
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM),
        dim=DIM, transactional=True,
    )
    eng.store.append(_doc_df(spark, "old content", _unit(0)))
    eng.store.upsert(
        _doc_df(spark, "new content", _unit(1)), key_cols=("path",)
    )
    return eng


def test_engine_search_vector_at_version(versioned_engine):
    eng = versioned_engine
    latest = eng.search_vector(_unit(1), 5).collect()
    assert [r.content for r in latest] == ["new content"]

    snap = eng.search_vector(_unit(0), 5, at_version=0).collect()
    assert [r.content for r in snap] == ["old content"]

    hist = eng.history()
    assert [h["version"] for h in hist] == [0, 1]
    json.dumps(hist)  # CLI/REST serialize it verbatim — must be JSON-safe


def test_engine_at_version_requires_transactional(spark, tmp_path):
    eng = VectorEngine(
        spark, str(tmp_path / "plain"), embedder=hash_embedder(DIM), dim=DIM
    )
    eng.store.append(_doc_df(spark, "x", _unit(0)))
    with pytest.raises(ValueError, match="transactional"):
        eng.load_corpus(at_version=0)
    assert eng.history() == []


def test_rest_query_version_and_history(versioned_engine):
    import urllib.request

    from converttovectordb_spark.server import VectorDBServer

    srv = VectorDBServer(versioned_engine, port=0).start()
    try:
        host, port = srv.address

        def call(method, path, body=None):
            req = urllib.request.Request(
                f"http://{host}:{port}{path}", method=method
            )
            data = None
            if body is not None:
                data = json.dumps(body).encode()
                req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req, data=data, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        status, out = call(
            "POST", "/query", {"query_embedding": _unit(0), "version": 0}
        )
        assert status == 200
        assert [r["content"] for r in out["results"]] == ["old content"]
        assert out["total_documents_searched"] == 1

        status, out = call("POST", "/query", {"query_embedding": _unit(1)})
        assert status == 200
        assert [r["content"] for r in out["results"]] == ["new content"]

        status, out = call(
            "POST", "/query", {"query_embedding": _unit(0), "version": "x"}
        )
        assert status == 400 and "version" in out["error"]

        status, out = call("GET", "/history")
        assert status == 200
        assert [c["version"] for c in out["commits"]] == [0, 1]
    finally:
        srv.stop()


def test_snapshot_diff(spark, tmp_path):
    """snapshot_diff: added / removed / changed / unchanged identity
    counts between two committed versions, and the CLI `diff` verb."""
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM),
        dim=DIM, transactional=True,
    )

    def df(rows):
        return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)

    # v0: a + b
    eng.store.append(
        df([
            ("a.py", ".py", 0, 1, "alpha", _unit(0), 1.0),
            ("b.py", ".py", 0, 1, "beta", _unit(1), 1.0),
        ])
    )
    # v1: upsert replaces a's content (changed), b untouched
    eng.store.upsert(
        df([("a.py", ".py", 0, 1, "alpha v2", _unit(2), 2.0)]),
        key_cols=("path",),
    )
    # v2: plain append adds c (added)
    eng.store.append(df([("c.py", ".py", 0, 1, "gamma", _unit(3), 3.0)]))

    d01 = eng.snapshot_diff(0, 1)
    assert (d01["added"], d01["removed"], d01["changed"], d01["unchanged"]) \
        == (0, 0, 1, 1)
    d02 = eng.snapshot_diff(0)  # to current
    assert d02["to_version"] == 2
    assert (d02["added"], d02["removed"], d02["changed"], d02["unchanged"]) \
        == (1, 0, 1, 1)
    # reverse direction: c disappears
    d20 = eng.snapshot_diff(2, 0)
    assert (d20["added"], d20["removed"], d20["changed"]) == (0, 1, 1)
    # identical snapshots: all unchanged
    d22 = eng.snapshot_diff(2, 2)
    assert (d22["added"], d22["removed"], d22["changed"], d22["unchanged"]) \
        == (0, 0, 0, 3)

    # plain store: loud error through the CLI envelope
    from converttovectordb_spark.__main__ import main

    rc = main(
        ["diff", "--from-version", "0", "--store",
         str(tmp_path / "plain"), "--dim", str(DIM)]
    )
    assert rc == 1


def test_cli_diff_verb(spark, tmp_path, capsys):
    from converttovectordb_spark.__main__ import main

    repo = tmp_path / "repo"
    repo.mkdir()
    (repo / "a.py").write_text("def alpha():\n    return 'one'\n")
    store = str(tmp_path / "store")
    base = ["--store", store, "--dim", "16", "--transactional"]
    assert main(["ingest", "--repo", str(repo)] + base) == 0
    (repo / "b.py").write_text("def beta():\n    return 'two'\n")
    assert main(["ingest", "--repo", str(repo)] + base) == 0
    capsys.readouterr()
    assert main(["diff", "--from-version", "0"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # second ingest re-added a.py's identical chunk (same content →
    # newest-per-rid keeps one, unchanged) and added b.py's
    assert out["added"] >= 1 and out["removed"] == 0
    assert out["changed"] == 0


def test_cli_search_at_version_and_history(spark, tmp_path, capsys):
    from converttovectordb_spark.__main__ import main

    repo = tmp_path / "repo"
    repo.mkdir()
    old_body = "def alpha():\n    return 'one'\n"
    (repo / "a.py").write_text(old_body)
    store = str(tmp_path / "store")
    base = ["--store", store, "--dim", "16", "--transactional"]

    assert main(["ingest", "--repo", str(repo)] + base) == 0
    new_body = "def alpha():\n    return 'two'\n"
    (repo / "a.py").write_text(new_body)
    assert main(["ingest", "--repo", str(repo), "--replace"] + base) == 0
    capsys.readouterr()

    # hash embedder: querying with the EXACT chunk text scores 1.0, so
    # the old body is only findable in the v0 snapshot
    assert main(["search", "--query", old_body, "--at-version", "0"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["content"] for r in out["results"]] == [old_body]

    assert main(["search", "--query", old_body] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"] == []  # replaced row scores below threshold

    assert main(["search", "--query", new_body] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["content"] for r in out["results"]] == [new_body]

    assert main(["history"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [c["version"] for c in out["commits"]] == [0, 1]


def test_cli_compact_and_vacuum(spark, tmp_path, capsys):
    from converttovectordb_spark.__main__ import main

    repo = tmp_path / "repo"
    repo.mkdir()
    (repo / "a.py").write_text("def f():\n    return 1\n")
    store = str(tmp_path / "store")
    base = ["--store", store, "--dim", "16", "--transactional"]

    assert main(["ingest", "--repo", str(repo)] + base) == 0
    assert main(["ingest", "--repo", str(repo), "--replace"] + base) == 0
    capsys.readouterr()

    assert main(["compact"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_compacted"] >= 1

    assert main(["vacuum"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dirs_removed"] >= 1

    # store still serves the compacted snapshot
    assert main(["health"] + base) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["documents_count"] >= 1

    # plain store → clear error, non-zero exit
    plain = ["--store", str(tmp_path / "plain"), "--dim", "16"]
    (tmp_path / "repo2").mkdir()
    (tmp_path / "repo2" / "b.py").write_text("x = 1\n")
    assert main(["ingest", "--repo", str(tmp_path / "repo2")] + plain) == 0
    capsys.readouterr()
    assert main(["compact"] + plain) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "transactional" in out["error"]
