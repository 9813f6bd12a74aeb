"""Adaptive nprobe from persisted recall curves.

The index's one magic knob becomes a stated contract: build time
measures recall@k vs nprobe on a held-out sample and persists the
curve; ``nprobe_for_recall(target)`` resolves the measured minimal
nprobe; ``VectorEngine.search_indexed(target_recall=...)`` consumes
it, with an explicit nprobe always winning.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from converttovectordb_spark.plans.ivf_index import (
    RECALL_CURVE_FILE,
    build_ivf_index,
    measure_recall_curve,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return build_ivf_index(
        emb,
        str(tmp_path_factory.mktemp("rc") / "ivf"),
        cluster_col="label",
    )


def test_curve_is_persisted_monotone_and_ends_exact(index):
    payload = measure_recall_curve(index, top_k=3, sample=12)
    assert os.path.exists(os.path.join(index.path, RECALL_CURVE_FILE))
    assert index.recall_curve() == payload
    curve = payload["curve"]
    nprobes = [c["nprobe"] for c in curve]
    recalls = [c["recall"] for c in curve]
    assert nprobes == sorted(nprobes) and len(set(nprobes)) == len(nprobes)
    # monotone non-decreasing: probing more clusters only adds
    # candidates, and a true top-k member always survives re-scoring
    assert all(a <= b for a, b in zip(recalls, recalls[1:])), curve
    # the endpoint probes every cluster — an exact scan, recall 1.0,
    # so every target is resolvable
    assert nprobes[-1] == index.centroids().count()
    assert recalls[-1] == 1.0
    # determinism: the hash-ordered sample gives the same curve again
    assert measure_recall_curve(index, top_k=3, sample=12) == payload


def test_nprobe_for_recall_resolves_minimal_measured(index):
    curve = index.recall_curve()["curve"]
    # target 1.0 → the first measured point that reaches 1.0
    want = min(c["nprobe"] for c in curve if c["recall"] >= 1.0)
    assert index.nprobe_for_recall(1.0) == want
    # a target just above a mid-curve point resolves to the NEXT point
    rising = [
        (a, b) for a, b in zip(curve, curve[1:]) if b["recall"] > a["recall"]
    ]
    assert rising, f"flat curve cannot exercise resolution: {curve}"
    lo, hi = rising[0]
    target = (lo["recall"] + hi["recall"]) / 2
    got = index.nprobe_for_recall(target)
    assert got == min(
        c["nprobe"] for c in curve if c["recall"] >= target
    )
    assert got > lo["nprobe"]


def test_nprobe_for_recall_validation_and_fallback(spark, index, tmp_path):
    with pytest.raises(ValueError, match="target_recall"):
        index.nprobe_for_recall(0.0)
    with pytest.raises(ValueError, match="target_recall"):
        index.nprobe_for_recall(1.5)
    # unreachable target on a hand-truncated curve → largest measured
    from converttovectordb_spark.plans.ivf_index import IVFIndex

    stub_dir = str(tmp_path / "stub")
    os.makedirs(stub_dir)
    stub = IVFIndex(spark, stub_dir)
    with open(os.path.join(stub_dir, RECALL_CURVE_FILE), "w") as fh:
        json.dump(
            {"top_k": 3, "sample": 8, "curve": [
                {"nprobe": 1, "recall": 0.4},
                {"nprobe": 2, "recall": 0.7},
            ]},
            fh,
        )
    assert stub.nprobe_for_recall(0.9) == 2
    # no curve at all → loud error, never a guess
    bare = IVFIndex(spark, str(tmp_path / "bare"))
    with pytest.raises(ValueError, match="no recall curve"):
        bare.nprobe_for_recall(0.9)


def _mini_repo(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    texts = {
        "a.py": "def alpha():\n    return 'spark shuffles data'\n" * 4,
        "b.py": "def beta():\n    return 'watermarks bound state'\n" * 4,
        "c.md": "cosine similarity ranks embedding vectors closely",
        "d.md": "streaming epochs commit through manifest txn ids",
    }
    for name, t in texts.items():
        (repo / name).write_text(t)
    return str(repo)


def test_engine_target_recall_resolution_and_explicit_wins(
    spark, tmp_path
):
    from converttovectordb_spark.engine import VectorEngine

    eng = VectorEngine(
        spark, str(tmp_path / "store"), dim=16, chunk_size=200, overlap=40
    )
    eng.ingest(_mini_repo(tmp_path))
    index = eng.build_index(num_clusters=2, recall_sample=4)
    assert index.recall_curve() is not None

    resolved = index.nprobe_for_recall(1.0)
    via_target = eng.search_indexed(
        "embedding vectors", top_k=3, target_recall=1.0
    ).collect()
    via_explicit = eng.search_indexed(
        "embedding vectors", top_k=3, nprobe=resolved
    ).collect()
    assert [tuple(r) for r in via_target] == [
        tuple(r) for r in via_explicit
    ]

    # explicit nprobe WINS: the curve is never consulted when nprobe
    # is given (pinned by making consultation an error)
    def boom(_):
        raise AssertionError("curve consulted despite explicit nprobe")

    index.nprobe_for_recall = boom
    rows = eng.search_indexed(
        "embedding vectors", top_k=3, nprobe=1, target_recall=1.0
    ).collect()
    assert rows is not None

    # neither given → historical default (nprobe=2) still works
    assert (
        eng.search_indexed("embedding vectors", top_k=3).collect()
        is not None
    )
