"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

Design: the relational layer never interprets media bytes. Decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` operators so each Python worker processes whole record
batches; payloads stay columnar end-to-end and the operators scale by
partition like any other map.

The actual codecs (PIL/torchvision/ffmpeg) are NOT present in this
container, so the decode step is an injectable function with two
implementations: ``fake_decode`` (deterministic, md5-seeded — used by
tests and the default) and a clearly-marked NotImplementedError stub
where a real codec would plug in. The Spark-side plumbing — schemas,
batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of image feature extraction.
IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, n_bytes long, "
    "feature array<float>"
)

#: Output schema of video frame sampling.
FRAME_SAMPLE_SCHEMA = (
    "asset_id long, frame_index int, frame_ts_ms long, frame_hash string"
)


def real_decode(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """Decode an image payload to an HxWxC array.

    STUB: the image libraries (PIL / cv2) are not available in this
    environment. Plug a real decoder in via the ``decode=`` parameter of
    the operators below.
    """
    raise NotImplementedError(
        "no image codec in this environment; inject decode=..."
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: derives a small fake 'image'
    (8x8x3 uint8) from the md5 of the payload. Exercises the exact same
    batch shapes and dtypes a real decoder would produce."""
    h = hashlib.md5(payload or b"").digest()
    rng = np.frombuffer((h * 12)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def extract_image_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    decode: Callable[[bytes], np.ndarray] = fake_decode,
    feature_dim: int = 16,
) -> DataFrame:
    """binary payload → (width, height, n_bytes, feature vector) via
    Arrow-batched mapInPandas. The 'feature' is a channel-histogram —
    with a real decoder this is where the vision model forward pass
    would run (same batch shape)."""

    cols = [id_col, payload_col]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                img = decode(data)
                hist, _ = np.histogram(
                    img, bins=feature_dim, range=(0, 255)
                )
                denom = max(1, int(hist.sum()))
                out.append(
                    {
                        "asset_id": int(aid),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "n_bytes": len(data),
                        "feature": (hist / denom).astype(np.float32),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    every_ms: int = 1000,
    max_frames: int = 32,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame timestamp.
    The frame extraction itself is the injectable/stubbed step; the
    fan-out plumbing (bounded explode per asset) is the Spark part that
    matters at scale — max_frames caps worst-case row amplification."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, dur in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                data = bytes(payload) if payload is not None else b""
                dur = int(dur) if pd.notna(dur) else 0
                n = min(max_frames, max(0, dur // every_ms))
                for i in range(n):
                    ts = i * every_ms
                    # Deterministic stand-in for "decode frame at ts".
                    fh = hashlib.md5(data + ts.to_bytes(8, "little")).hexdigest()
                    rows.append(
                        {
                            "asset_id": int(aid),
                            "frame_index": i,
                            "frame_ts_ms": ts,
                            "frame_hash": fh,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_index", "frame_ts_ms", "frame_hash"],
            )

    return df.select(id_col, payload_col, duration_col).mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def media_stats(df: DataFrame, *, type_col: str = "media_type") -> DataFrame:
    """Per-media-type profile over the metadata columns only — never
    touches payload bytes (column pruning keeps the scan cheap)."""
    return df.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
