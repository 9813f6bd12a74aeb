"""Multimodal operator plumbing tests (stubbed decode, real Spark shapes)."""

from __future__ import annotations

import pytest

from converttovectordb_spark.operators.multimodal import (
    extract_image_features,
    fake_decode,
    media_stats,
    real_decode,
    sample_frames,
)


def _media(spark):
    return spark.createDataFrame(
        [
            (1, "a.jpg", "image", bytearray(b"imgbytes-1"), 640, 480, None),
            (2, "b.jpg", "image", bytearray(b"imgbytes-2"), 320, 240, None),
            (3, "c.mp4", "video", bytearray(b"vidbytes-3"), 1920, 1080, 5500),
        ],
        "asset_id long, path string, media_type string, payload binary,"
        " width int, height int, duration_ms long",
    )


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"x")


def test_fake_decode_deterministic():
    a = fake_decode(b"payload")
    b = fake_decode(b"payload")
    assert (a == b).all() and a.shape == (8, 8, 3)


def test_extract_image_features(spark):
    out = extract_image_features(_media(spark).filter("media_type = 'image'"))
    rows = {r.asset_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.width == 8 and r.height == 8  # fake decoder's shape
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram
    # determinism across runs
    again = {r.asset_id: list(r.feature) for r in out.collect()}
    assert again[1] == list(rows[1].feature)


def test_sample_frames_bounded(spark):
    out = sample_frames(
        _media(spark).filter("media_type = 'video'"), every_ms=1000
    ).collect()
    # 5500ms at 1000ms cadence → 5 frames
    assert [r.frame_index for r in out] == list(range(5))
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000, 3000, 4000]
    assert len({r.frame_hash for r in out}) == 5  # per-ts distinct hashes


def test_media_stats_prunes_payload(spark):
    rows = {r.media_type: r for r in media_stats(_media(spark)).collect()}
    assert rows["image"].n_assets == 2
    assert rows["video"].avg_duration_ms == 5500.0
