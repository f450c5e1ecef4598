"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic sha256-derived features, or NotImplementedError for real
decode) — but the Spark-side plumbing is real and tested: schema, batch
iteration, partitioning, UDF signatures all match what a production decode
(PIL/librosa/ffmpeg) would use. Kernels are batch-vectorized (np.repeat
for row expansion, no iterrows); the only per-element Python is the hash
call standing in for the per-item decode a real codec would also need.

``media_from_documents`` derives the media table deterministically from
the driver-provided ``documents`` parquet (payload = utf-8 bytes of the
text), which makes the whole pipeline DuckDB-oracle-checkable:
n_bytes == octet_length(encode(text)) and the first feature byte ==
first byte of sha256(text).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "duration_ms int"
)
FEATURE_SCHEMA = (
    "media_id bigint, kind string, feature array<float>, n_bytes bigint, "
    "f0_byte int"
)
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_sha string"

_KINDS = ["image", "audio", "video"]


def media_from_documents(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic media table over ``documents``: payload = utf-8 text
    bytes, kind cycles image/audio/video by doc_id, typed metadata derived
    from doc_id. Exercises binary columns + metadata exactly like a real
    media ingest, with an exact SQL mirror."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    is_image = F.pmod(F.col("doc_id"), F.lit(3)) == 0
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(is_image, (64 + F.pmod(F.col("doc_id"), F.lit(4)) * 32).cast("int")).alias("width"),
        F.when(is_image, (64 + F.pmod(F.col("doc_id"), F.lit(3)) * 32).cast("int")).alias("height"),
        F.when(~is_image, (1000 * (1 + F.pmod(F.col("doc_id"), F.lit(5)))).cast("int")).alias("duration_ms"),
    )


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (random binary payloads) for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = _KINDS[i % 3]
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


def _fake_features(payloads: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for image/audio embeddings: bytes of each
    sha256 digest scaled to [0,1) — stable across runs and engines. The
    hash call is per item (as real decode would be); everything around it
    is batch numpy."""
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        out[i] = np.frombuffer(
            hashlib.sha256(p).digest()[:dim], dtype=np.uint8
        )
    return out / np.float32(255.0)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    Adds ``f0_byte`` (the first digest byte, an exact integer) so the
    pipeline has a rounding-free cross-engine check column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            feats = _fake_features(payloads, dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": list(feats),
                    "n_bytes": pdf["payload"].map(len),
                    "f0_byte": np.round(feats[:, 0] * 255).astype(np.int32)
                    if len(pdf)
                    else np.empty(0, np.int32),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    frame with a deterministic content hash (real decode stubbed).

    Row expansion is vectorized: np.repeat over the media ids/payloads and
    concatenated aranges for the frame indices — no iterrows."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if not len(vids):
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "frame_sha": []}
                ).astype({"media_id": "int64", "frame_idx": "int32", "frame_sha": "object"})
                continue
            n_frames = np.maximum(
                1, vids["duration_ms"].to_numpy(dtype=np.int64) // every_ms
            )
            media_ids = np.repeat(vids["media_id"].to_numpy(np.int64), n_frames)
            payloads = np.repeat(vids["payload"].to_numpy(), n_frames)
            frame_idx = np.concatenate(
                [np.arange(k, dtype=np.int32) for k in n_frames]
            )
            shas = [
                hashlib.sha256(p + int(f).to_bytes(4, "little")).hexdigest()
                for p, f in zip(payloads, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": frame_idx,
                    "frame_sha": shas,
                }
            )

    return media.repartition(8, "media_id").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )
