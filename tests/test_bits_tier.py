"""The bits-resident serving tier (packed sign bits + payload in
driver memory, full-precision sidecar on disk) must be semantically
identical to `DriverMatrixIndex.query(hamming_shortlist=...)` — the
graded `hamming_prefilter_knn` composition — at every shortlist, and
the server must admit it only between the float-matrix and distributed
budgets."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.operators.serving import (
    BITS_ADMISSION_MULTIPLE,
    BitsMatrixIndex,
    DriverMatrixIndex,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())
    )


@pytest.fixture(scope="module")
def both_tiers(spark, tmp_path_factory):
    df = _corpus(spark)
    bits = BitsMatrixIndex.from_dataframe(
        df, str(tmp_path_factory.mktemp("bits"))
    )
    matrix = DriverMatrixIndex.from_dataframe(df)
    yield bits, matrix, df
    bits.close()


def test_bits_matches_matrix_hamming_dial(both_tiers):
    bits, matrix, df = both_tiers
    probes = [r["embedding"] for r in df.orderBy("vec_id").limit(4).collect()]
    for shortlist in (5, 12, 40):
        for probe in probes:
            got = bits.query(
                probe,
                5,
                score_threshold=-2.0,
                id_cols=["vec_id"],
                hamming_shortlist=shortlist,
            )
            want = matrix.query(
                probe,
                5,
                score_threshold=-2.0,
                id_cols=["vec_id"],
                hamming_shortlist=shortlist,
            )
            assert got == want


def test_bits_batch_equals_single(both_tiers):
    bits, _matrix, df = both_tiers
    probes = [r["embedding"] for r in df.orderBy("vec_id").limit(3).collect()]
    batch = bits.query_batch(
        probes, 4, score_threshold=-2.0, id_cols=["vec_id"],
        hamming_shortlist=16,
    )
    singles = [
        bits.query(
            p, 4, score_threshold=-2.0, id_cols=["vec_id"],
            hamming_shortlist=16,
        )
        for p in probes
    ]
    assert batch == singles


def test_bits_default_shortlist_is_4k(both_tiers):
    bits, matrix, df = both_tiers
    probe = df.select("embedding").first()[0]
    got = bits.query(probe, 5, score_threshold=-2.0, id_cols=["vec_id"])
    want = matrix.query(
        probe, 5, score_threshold=-2.0, id_cols=["vec_id"],
        hamming_shortlist=20,
    )
    assert got == want


def test_bits_reference_semantics(spark, tmp_path):
    """Q1 zero-norm → 0.0, Q3 ascending-id tie-break, Q4 threshold
    AFTER limit, Q5 dimension guard — the shared selection rules, on
    the bits tier."""
    rows = [
        ("b", 1, [1.0, 0.0]),
        ("a", 2, [1.0, 0.0]),
        ("a", 1, [1.0, 0.0]),
        ("c", 1, [-1.0, 1.0]),
        ("d", 1, [0.0, 0.0]),  # zero norm → score 0.0 (Q1)
    ]
    df = spark.createDataFrame(
        rows, "path string, chunk_index int, embedding array<double>"
    )
    idx = BitsMatrixIndex.from_dataframe(df, str(tmp_path))
    try:
        got = idx.query(
            [1.0, 0.0], 4, id_cols=["path", "chunk_index"],
            hamming_shortlist=5,
        )
        # the sub-threshold rows are dropped AFTER the limit (Q4);
        # exact ties order ascending by (path, chunk_index) (Q3)
        assert [(r["path"], r["chunk_index"]) for r in got] == [
            ("a", 1), ("a", 2), ("b", 1),
        ]
        with pytest.raises(ValueError, match="query dimension 3"):
            idx.query([1.0, 0.0, 0.0], 2, id_cols=["path"])
        with pytest.raises(ValueError, match="non-finite"):
            idx.query([float("nan"), 0.0], 2, id_cols=["path"])
        with pytest.raises(ValueError, match="must be >= top_k"):
            idx.query([1.0, 0.0], 5, hamming_shortlist=2)
        # zero-norm query → every score 0.0 < threshold → empty
        assert idx.query([0.0, 0.0], 3, id_cols=["path"]) == []
    finally:
        idx.close()


def test_bits_admission_budgets(spark, tmp_path):
    from converttovectordb_spark.operators.serving import (
        bits_resident_cells,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(64)],
        "vec_id bigint, embedding array<double>",
    )
    # admission is BITS-bound (r14 verdict #1): resident = packed words
    # (word-padded) + row ids + distance scratch, priced in bit-cells
    # against max_cells × 64. 64 rows × 2 dims → 1 word + 2 overhead
    # items per row = 64 × 3 × 64 = 12288 bit-cells.
    need = bits_resident_cells(64, 2)
    assert need == 64 * 3 * 64
    assert (
        BitsMatrixIndex.from_dataframe(
            df, str(tmp_path), max_cells=need // BITS_ADMISSION_MULTIPLE - 1
        )
        is None
    )
    idx = BitsMatrixIndex.from_dataframe(
        df, str(tmp_path), max_cells=need // BITS_ADMISSION_MULTIPLE
    )
    assert idx is not None and idx.n == 64
    idx.close()
    # NO payload gate: a megabyte-wide content column is sidecar-only
    # (served from the bounded rerank fetch), so it cannot change
    # admission — this is what "bits-bound" means
    wide = df.withColumn("content", F.repeat(F.lit("x"), 1000))
    idx2 = BitsMatrixIndex.from_dataframe(
        wide, str(tmp_path), max_cells=need // BITS_ADMISSION_MULTIPLE
    )
    assert idx2 is not None and idx2.n == 64
    got = idx2.query(
        [1.0, 1.0], 1, score_threshold=-2.0, id_cols=["vec_id"],
        hamming_shortlist=2,
    )
    assert got and got[0]["content"] == "x" * 1000
    idx2.close()
    assert BITS_ADMISSION_MULTIPLE == 64


def test_bits_empty_corpus(spark, tmp_path):
    df = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    idx = BitsMatrixIndex.from_dataframe(df, str(tmp_path))
    assert idx.n == 0
    assert idx.query([1.0, 0.0], 3) == []
    assert idx.query_batch([[1.0, 0.0]], 3) == [[]]


def test_bits_rerank_is_exact_full_precision(spark, tmp_path):
    """The shortlist rerank must use the FULL-precision embeddings
    from the sidecar, not the quantized bits: two vectors with the
    same sign pattern but different magnitudes along a second axis
    rank by exact cosine."""
    rows = [
        (1, [1.0, 0.9]),
        (2, [1.0, 0.1]),  # same signs as vec 1, different cosine
        (3, [-1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    idx = BitsMatrixIndex.from_dataframe(df, str(tmp_path))
    try:
        got = idx.query(
            [1.0, 0.05], 1, id_cols=["vec_id"], hamming_shortlist=2
        )
        assert [r["vec_id"] for r in got] == [2]
        q = np.array([1.0, 0.05])
        v = np.array([1.0, 0.1])
        want = float(
            np.dot(q, v) / (math.sqrt(q @ q) * math.sqrt(v @ v))
        )
        assert got[0]["score"] == pytest.approx(want, abs=1e-12)
    finally:
        idx.close()


# ---------------------------------------------------------------------------
# endpoint admission + parity
# ---------------------------------------------------------------------------

import json
import urllib.error
import urllib.request

from converttovectordb_spark.embeddings import hash_embedder
from converttovectordb_spark.engine import VectorEngine
from converttovectordb_spark.server import VectorDBServer

DIM = 8


def _unit(i: int) -> list[float]:
    v = [0.0] * DIM
    v[i % DIM] = 1.0
    return v


def _call(srv, method, path, body=None):
    host, port = srv.address
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", method=method
    )
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, data=data, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _seed(srv, n=6):
    docs = [
        {
            "path": f"src/f{i}.py",
            "content": f"document number {i}",
            "embedding": [x + 0.01 * i for x in _unit(i)],
            "chunk_index": 0,
            "total_chunks": 1,
        }
        for i in range(n)
    ]
    return _call(srv, "POST", "/add_documents", {"documents": docs})


def test_server_bits_tier_admission_and_parity(spark, tmp_path):
    """A corpus past the float-cell budget but within 64× of it serves
    hamming-dialed queries from the bits tier, matching the matrix
    tier's answer for the same dial exactly; undialed queries stay on
    the distributed exact path."""
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    # 6 docs × 8 dims = 48 float cells > 20 (matrix rejected); bits
    # resident = 6 × (1 word + 2 overhead) × 64 = 1152 bit-cells
    # <= 20 × 64 = 1280 (bits admitted)
    srv = VectorDBServer(eng, port=0, matrix_max_cells=20).start()
    srv_matrix = VectorDBServer(eng, port=0).start()
    try:
        _seed(srv, n=6)
        probe = [x + 0.2 for x in _unit(2)]
        body = {
            "query_embedding": probe,
            "top_k": 3,
            "hamming_shortlist": 4,
        }
        st, dialed = _call(srv, "POST", "/query", body)
        assert st == 200
        assert srv.api._bits is not None and srv.api._matrix is None
        st2, want = _call(srv_matrix, "POST", "/query", body)
        assert st2 == 200
        assert srv_matrix.api._matrix is not None
        assert dialed["results"] == want["results"]
        assert dialed["total_documents_searched"] == 6
        # undialed queries on the same server serve the distributed
        # exact path (the bits tier is dial-only)
        st3, exact = _call(
            srv, "POST", "/query", {"query_embedding": probe, "top_k": 3}
        )
        assert st3 == 200
        st4, exact_want = _call(
            srv_matrix, "POST", "/query",
            {"query_embedding": probe, "top_k": 3},
        )
        got = [(r["path"], round(r["score"], 9)) for r in exact["results"]]
        want_rows = [
            (r["path"], round(r["score"], 9)) for r in exact_want["results"]
        ]
        assert got == want_rows
        # batch door: one sidecar fetch, same per-query answers
        probes = [probe, _unit(1), [0.3] * DIM]
        stb, batch = _call(
            srv, "POST", "/query_batch",
            {"query_embeddings": probes, "top_k": 3, "hamming_shortlist": 4},
        )
        assert stb == 200
        for i, p in enumerate(probes):
            _, single = _call(
                srv, "POST", "/query",
                {"query_embedding": p, "top_k": 3, "hamming_shortlist": 4},
            )
            assert batch["results"][i] == single["results"]
    finally:
        srv.stop()
        srv_matrix.stop()


def test_server_bits_tier_rejections_and_invalidation(spark, tmp_path):
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    srv = VectorDBServer(eng, port=0, matrix_max_cells=1).start()
    try:
        _seed(srv, n=6)
        probe = _unit(0)
        # a 1-cell budget rejects the bits tier too (64 bit-cells <
        # the 1152 resident) → 400, never a silent undialled answer
        st, out = _call(
            srv, "POST", "/query",
            {"query_embedding": probe, "top_k": 3, "hamming_shortlist": 4},
        )
        assert st == 400 and "bits tier" in out["error"]
        # both dials at once → 400 (mutual exclusion)
        st2, out2 = _call(
            srv, "POST", "/query",
            {
                "query_embedding": probe,
                "top_k": 3,
                "hamming_shortlist": 4,
                "mrl_dim": 2,
            },
        )
        assert st2 == 400 and "mutually exclusive" in out2["error"]
        st3, out3 = _call(
            srv, "POST", "/query",
            {"query_embedding": probe, "hamming_shortlist": "four"},
        )
        assert st3 == 400
    finally:
        srv.stop()


def test_server_bits_sidecar_invalidated_on_write(spark, tmp_path):
    import os

    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    # float: 48 > 45 (6 docs) and 112 > 45 (14 docs) — matrix rejected
    # both; bits: 1152 and 2688 bit-cells <= 45 × 64 = 2880 — admitted
    srv = VectorDBServer(eng, port=0, matrix_max_cells=45).start()
    try:
        _seed(srv, n=6)
        probe = _unit(0)
        _call(
            srv, "POST", "/query",
            {"query_embedding": probe, "top_k": 2, "hamming_shortlist": 3},
        )
        bits = srv.api._bits
        assert bits is not None and os.path.isdir(bits.sidecar_path)
        side = bits.sidecar_path
        # a write through the API invalidates the cache AND removes
        # the on-disk sidecar; the next dialed query refills and sees
        # the new rows (appends: 6 + 8 docs, still within 2×64 cells)
        _seed(srv, n=8)
        st, out = _call(
            srv, "POST", "/query",
            {
                "query_embedding": [x + 0.07 for x in _unit(7)],
                "top_k": 1,
                "hamming_shortlist": 3,
            },
        )
        assert st == 200
        assert not os.path.isdir(side)
        assert out["total_documents_searched"] == 14
        assert out["results"][0]["path"] == "src/f7.py"
    finally:
        srv.stop()


def test_bits_fetch_budget_guards_corpus_sized_rerank(
    spark, tmp_path, monkeypatch
):
    """A shortlist that resolves to more candidates than the bounded-
    fetch budget must raise (→ the server's 400), never Arrow-collect
    the full-precision corpus the tier exists to keep on disk."""
    import converttovectordb_spark.operators.serving as serving

    # distinct sign pattern per row (the bits of i), so the keep-ties
    # shortlist rule resolves to ~the requested width, not the corpus
    rows = [
        (
            i,
            [1.0 if (i >> b) & 1 else -1.0 for b in range(8)],
        )
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    idx = BitsMatrixIndex.from_dataframe(df, str(tmp_path))
    try:
        monkeypatch.setattr(serving, "BITS_FETCH_MAX_ROWS", 10)
        probe = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
        with pytest.raises(ValueError, match="bounded-fetch budget"):
            idx.query(probe, 5, hamming_shortlist=40)
        # within budget still serves
        assert idx.query(
            probe, 2, score_threshold=-2.0, id_cols=["vec_id"],
            hamming_shortlist=3,
        )
    finally:
        idx.close()


def test_bits_close_deferred_under_live_reader(spark, tmp_path):
    """Invalidation must not delete the sidecar under an in-flight
    query: close() defers removal to the last finisher, and new
    entries after the mark raise the retryable invalidation error."""
    import os

    from converttovectordb_spark.operators.serving import (
        BitsTierInvalidated,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0, float(i % 3)]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    idx = BitsMatrixIndex.from_dataframe(df, str(tmp_path))
    side = idx.sidecar_path
    idx._enter_serving()  # a reader is mid-request
    idx.close()
    assert os.path.isdir(side)  # NOT deleted under the reader
    with pytest.raises(BitsTierInvalidated):
        idx.query([1.0, 0.0, 0.0, 1.0], 2, hamming_shortlist=3)
    idx._exit_serving()  # last reader finishes → removal happens
    assert not os.path.isdir(side)
    idx.close()  # idempotent


def test_server_bits_fill_failure_negative_cached(spark, tmp_path):
    """A corrupt store (inconsistent embedding dimensions) 400s with
    the fill reason — and the reason is negative-cached, so repeat
    dialed requests do not re-pay a corpus pass to fail again."""
    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    srv = VectorDBServer(eng, port=0, matrix_max_cells=1).start()
    try:
        _seed(srv, n=6)
        # corrupt one row's dimension OUT-OF-BAND (the API door would
        # reject it): append a short-dim row directly to the store
        from pyspark.sql import functions as F

        eng.store.append(
            eng.store.load().limit(1).select(
                "path", "extension", "chunk_index", "total_chunks",
                "content",
                F.slice("embedding", 1, 4).alias("embedding"),
                "timestamp",
            )
        )
        for _ in range(2):
            st, out = _call(
                srv, "POST", "/query",
                {
                    "query_embedding": _unit(0),
                    "top_k": 2,
                    "hamming_shortlist": 3,
                },
            )
            assert st == 400
            assert "cache fill failed" in out["error"]
            assert "inconsistent dimensions" in out["error"]
    finally:
        srv.stop()


def test_server_restart_loads_persisted_bits_artifact(
    spark, tmp_path, monkeypatch
):
    """r14 verdict #1(b): the packed words + row ids + sidecar persist
    under the store's `_bits` root across server lifetimes — stop
    KEEPS the artifact, and a fresh server against the unchanged store
    serves dialed queries from `load_current` with ZERO corpus jobs
    (asserted by making the build path explode)."""
    import os

    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    srv = VectorDBServer(eng, port=0, matrix_max_cells=20).start()
    _seed(srv, n=6)
    body = {
        "query_embedding": _unit(0), "top_k": 2, "hamming_shortlist": 3,
    }
    st, first = _call(srv, "POST", "/query", body)
    assert st == 200
    side = srv.api._bits.sidecar_path
    assert side is not None and os.path.isdir(side)
    assert side.startswith(eng.bits_artifact_path)
    srv.stop()
    # stop released, did NOT remove — the artifact is the next
    # process's zero-corpus-jobs load
    assert os.path.isdir(side)

    import converttovectordb_spark.operators.serving as serving

    def _no_build(*a, **k):  # any corpus pass on reopen is the bug
        raise AssertionError(
            "restart must load the persisted bits artifact, not refill"
        )

    monkeypatch.setattr(
        serving.BitsMatrixIndex, "build_current", _no_build
    )
    srv2 = VectorDBServer(eng, port=0, matrix_max_cells=20).start()
    try:
        st2, again = _call(srv2, "POST", "/query", body)
        assert st2 == 200
        assert again["results"] == first["results"]
        assert srv2.api._bits.store_token is not None
    finally:
        srv2.stop()
    monkeypatch.undo()
    # ...and a WRITE invalidates the persisted artifact like any other
    # cache: the next dialed query refills against the new store state
    srv3 = VectorDBServer(eng, port=0, matrix_max_cells=45).start()
    try:
        _seed(srv3, n=8)
        st3, out3 = _call(srv3, "POST", "/query", body)
        assert st3 == 200
        assert out3["total_documents_searched"] == 14
        assert not os.path.isdir(side)  # stale version dir swept
    finally:
        srv3.stop()


def test_bits_fsck_covers_artifact(spark, tmp_path):
    """The persisted bits artifact sits under the same fsck lifecycle
    as the other four artifacts: clean tree → no findings; orphan
    version dirs and corrupt packed arrays are found and healed by
    removal (the artifact is a derivable cache); a store write makes
    it stale (info finding, heal = remove)."""
    import os
    import shutil

    from converttovectordb_spark.fsck import fsck
    from converttovectordb_spark.operators.serving import (
        BITS_WORDS_FILE,
        BitsMatrixIndex,
    )
    from converttovectordb_spark.sources.sigstore import token_digest

    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    docs = spark.createDataFrame(
        [
            (f"f{i}.py", ".py", 1, 0, f"doc {i}", _unit(i), 0.0)
            for i in range(6)
        ],
        "path string, extension string, total_chunks int, "
        "chunk_index int, content string, embedding array<float>, "
        "timestamp double",
    )
    eng.store.append(docs)
    root = eng.bits_artifact_path
    idx = BitsMatrixIndex.build_current(
        eng.store.load(), root,
        store_token=token_digest(eng.store.state_token()),
    )
    assert idx is not None and idx.n == 6
    assert [f["artifact"] for f in fsck(eng)] == []
    # orphan version dir (crashed build debris)
    os.makedirs(os.path.join(root, "v-deadbeef"))
    found = [f for f in fsck(eng) if f["artifact"] == "bits"]
    assert [f["check"] for f in found] == ["orphan_versions"]
    fsck(eng, heal=True)
    assert not os.path.isdir(os.path.join(root, "v-deadbeef"))
    # corrupt packed words → error, heal removes the whole artifact
    words_path = os.path.join(idx.artifact_path, BITS_WORDS_FILE)
    with open(words_path, "wb") as fh:
        fh.write(b"garbage")
    found = [f for f in fsck(eng) if f["artifact"] == "bits"]
    assert found and found[0]["check"] == "corrupt_artifact"
    assert found[0]["severity"] == "error"
    fsck(eng, heal=True)
    assert BitsMatrixIndex.load_current(spark, root) is None
    # rebuild, then write to the store → stale (info), healed by removal
    idx2 = BitsMatrixIndex.build_current(
        eng.store.load(), root,
        store_token=token_digest(eng.store.state_token()),
    )
    assert idx2 is not None
    eng.store.append(docs.limit(1))
    found = [f for f in fsck(eng) if f["artifact"] == "bits"]
    assert [f["check"] for f in found] == ["stale"]
    assert found[0]["severity"] == "info"
    fsck(eng, heal=True)
    assert BitsMatrixIndex.load_current(spark, root) is None
    shutil.rmtree(root, ignore_errors=True)


def test_engine_build_bits_artifact_explicit_fill(spark, tmp_path):
    """`engine.build_bits_artifact()` (CLI `build-bits`) prebuilds the
    persisted artifact so a server's FIRST dialed request loads
    instead of filling — the explicit-fill half of the r14 verdict-#1
    lifecycle. Over-budget and absent-store cases raise."""
    import pytest as _pytest

    eng = VectorEngine(
        spark, str(tmp_path / "store"), embedder=hash_embedder(DIM), dim=DIM
    )
    with _pytest.raises(ValueError, match="no store"):
        eng.build_bits_artifact()
    docs = spark.createDataFrame(
        [
            (f"f{i}.py", ".py", 1, 0, f"doc {i}", _unit(i), 0.0)
            for i in range(6)
        ],
        "path string, extension string, total_chunks int, "
        "chunk_index int, content string, embedding array<float>, "
        "timestamp double",
    )
    eng.store.append(docs)
    with _pytest.raises(ValueError, match="admission budget"):
        eng.build_bits_artifact(max_cells=1)
    out = eng.build_bits_artifact(max_cells=20)
    assert out["rows"] == 6 and out["dim"] == DIM
    assert out["resident_bytes"] == 6 * (8 + 8)  # 1 word + 1 id per row
    assert out["store_token"] is not None

    import converttovectordb_spark.operators.serving as serving

    # a server against the same store must LOAD, never fill
    orig = serving.BitsMatrixIndex.build_current

    def _no_build(*a, **k):
        raise AssertionError("explicit prebuild must make the server load")

    serving.BitsMatrixIndex.build_current = _no_build
    try:
        srv = VectorDBServer(eng, port=0, matrix_max_cells=20).start()
        try:
            st, got = _call(
                srv, "POST", "/query",
                {
                    "query_embedding": _unit(0),
                    "top_k": 2,
                    "hamming_shortlist": 3,
                },
            )
            assert st == 200 and got["total_documents_searched"] == 6
        finally:
            srv.stop()
    finally:
        serving.BitsMatrixIndex.build_current = orig


def test_bits_release_under_live_reader_keeps_artifact(spark, tmp_path):
    """r15 review F1: release() while a query is in flight must KEEP
    the persisted files when the reader drains — before the fix the
    retire path ran close-style removal and deleted the artifact the
    release promised the next process."""
    import os

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    idx = BitsMatrixIndex.build_current(
        df, str(tmp_path / "root"), store_token="t"
    )
    idx._enter_serving()  # a dialed request is mid-flight
    idx.release()  # server stop with an unchanged store
    assert os.path.isdir(idx.artifact_path)
    idx._exit_serving()  # reader drains
    assert os.path.isdir(idx.artifact_path)  # KEPT — the whole point
    assert (
        BitsMatrixIndex.load_current(spark, str(tmp_path / "root"))
        is not None
    )


def test_bits_shared_dir_close_waits_for_all_owners(spark, tmp_path):
    """r15 review F2: two in-process index objects can own ONE version
    dir (deferred-close old index + a fresh load of the same CURRENT);
    close() on either must not delete files under the other's
    in-flight reader — the per-process dir refcount makes the LAST
    owner out perform the removal."""
    import os

    root = str(tmp_path / "root")
    df = spark.createDataFrame(
        [(i, [float(i), -1.0]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    a = BitsMatrixIndex.build_current(df, root, store_token="t")
    b = BitsMatrixIndex.load_current(spark, root)
    assert b is not None and b.artifact_path == a.artifact_path
    a._enter_serving()  # a reader is mid-fetch on A
    b.close()  # B decides the dir is stale
    assert os.path.isdir(a.artifact_path)  # NOT deleted under A
    # A can still serve its in-flight work
    assert a._sidecar().count() == 8
    a._exit_serving()
    a.close()  # last owner out → removal happens
    assert not os.path.isdir(a.artifact_path)


def test_bits_load_current_reapplies_admission_budget(spark, tmp_path):
    """r15 review F4: a prebuilt artifact must not bypass a smaller
    consumer's admission budget — load_current(max_cells=...) refuses
    from the meta alone, leaving the artifact intact for
    bigger-budget consumers."""
    import os

    root = str(tmp_path / "root")
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(64)],
        "vec_id bigint, embedding array<double>",
    )
    idx = BitsMatrixIndex.build_current(df, root, store_token="t")
    assert idx is not None
    idx.release()
    assert BitsMatrixIndex.load_current(spark, root, max_cells=1) is None
    assert os.path.isdir(os.path.join(root))  # artifact untouched
    again = BitsMatrixIndex.load_current(spark, root)
    assert again is not None and again.n == 64
    again.release()
