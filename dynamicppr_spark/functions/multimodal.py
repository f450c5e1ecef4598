"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features derived from the bytes, or
NotImplementedError for real decode) — but the Spark-side plumbing is
real and tested: schema, batch iteration, partitioning, UDF signatures
all match what a production decode (PIL/librosa/ffmpeg) would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_SCHEMA = "media_id bigint, kind string, feature array<float>, n_bytes bigint"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_sha string"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads) for tests/bench."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                64 + (i % 4) * 32 if kind == "image" else None,
                64 + (i % 3) * 32 if kind == "image" else None,
                1000 * (1 + i % 5) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_real(kind: str, payload: bytes):
    raise NotImplementedError(
        "real decode needs PIL/librosa/ffmpeg — not present in this "
        "container; the deterministic fake below exercises the same "
        "Spark plumbing (schema, batching, partitioning)"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for an image/audio embedding: bytes of the
    sha256 digest scaled to [0,1) — stable across runs and engines."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:dim], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [ _fake_feature(p, dim) for p in pdf["payload"] ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    frame with a deterministic content hash (real decode stubbed)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_sha = [], [], []
            vids = pdf[pdf["kind"] == "video"]
            for _, row in vids.iterrows():
                n_frames = max(1, int(row["duration_ms"]) // every_ms)
                for f in range(n_frames):
                    out_id.append(row["media_id"])
                    out_idx.append(f)
                    out_sha.append(
                        hashlib.sha256(
                            row["payload"] + f.to_bytes(4, "little")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_sha": out_sha}
            )

    return media.repartition(8, "media_id").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )
