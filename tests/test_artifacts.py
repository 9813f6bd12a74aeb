"""Artifact cache mechanics: content keys, atomic publish, and failed
builds leaving NO `.build-*` debris (r6 VERDICT ask #5)."""

from __future__ import annotations

import os

import pytest

from converttovectordb_spark.queries import (
    _artifact_build,
    _content_key,
)


def test_failed_artifact_build_leaves_no_debris(tmp_path):
    final = str(tmp_path / "cache" / "thing_abc123")
    os.makedirs(os.path.dirname(final))

    with pytest.raises(RuntimeError):
        with _artifact_build(final) as build_dir:
            os.makedirs(build_dir)
            with open(os.path.join(build_dir, "partial"), "w") as fh:
                fh.write("half-written")
            raise RuntimeError("builder crashed")

    # neither the final dir nor any .build-* scratch survives
    assert not os.path.exists(final)
    leftovers = [
        n for n in os.listdir(os.path.dirname(final)) if ".build-" in n
    ]
    assert leftovers == []


def test_successful_artifact_build_publishes_atomically(tmp_path):
    final = str(tmp_path / "cache" / "thing_def456")
    os.makedirs(os.path.dirname(final))

    with _artifact_build(final) as build_dir:
        os.makedirs(build_dir)
        with open(os.path.join(build_dir, "data"), "w") as fh:
            fh.write("done")
        # while building, the final dir must not exist yet
        assert not os.path.exists(final)

    assert os.path.isfile(os.path.join(final, "data"))
    leftovers = [
        n for n in os.listdir(os.path.dirname(final)) if ".build-" in n
    ]
    assert leftovers == []


def test_content_key_tracks_bytes_and_params(tmp_path):
    src = tmp_path / "src.parquet"
    src.write_bytes(b"aaaa")
    k1 = _content_key([str(src)], "p=1")
    assert len(k1) == 16 and all(c in "0123456789abcdef" for c in k1)
    # same bytes + params → same key (cache hit)
    assert _content_key([str(src)], "p=1") == k1
    # different params or different bytes → different key
    assert _content_key([str(src)], "p=2") != k1
    src.write_bytes(b"bbbb")
    assert _content_key([str(src)], "p=1") != k1
