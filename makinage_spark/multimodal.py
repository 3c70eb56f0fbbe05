"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (north-star extension, BASELINE.json).

Design. A multimodal asset is a row ``(asset_id, media_type, payload: binary,
meta: struct)``. All Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the actual codec step (image
decode, audio resample, video frame extraction) is stubbed because the codec
libraries (Pillow/ffmpeg/librosa) are not in this container. Two stub modes:

- ``fake=True`` (default in tests) — a deterministic pure-Python transform of
  the payload bytes stands in for the codec, so batch shapes, schemas and
  partition behavior are exercised end-to-end with verifiable outputs.
- ``fake=False`` — raises ``NotImplementedError`` at the decode call site,
  marking exactly where a real codec plugs in.

Scale notes: payloads stay columnar (Arrow binary) through ``mapInPandas``;
batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB payloads set it low (e.g. 64) to cap executor memory. Decode is a
narrow stage: no shuffle, scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal asset schema.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image/jpeg, audio/wav, video/mp4
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, media_type string, width int, height int, feature array<float>"
)

FRAME_SCHEMA = "asset_id long, frame_idx int, frame_payload binary"


def _fake_decode(payload: bytes, out_dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a codec: md5-seeded feature vector."""
    h = hashlib.md5(bytes(payload)).digest()
    return np.frombuffer(h[: out_dim * 2], dtype=np.uint16).astype(np.float32) / 65535.0


def decode_features(fake: bool = True, out_dim: int = 8):
    """Operator: decode each asset payload and emit a feature vector
    (``mapInPandas`` — Arrow batches of binary payloads in, typed rows out).
    Plug a real model/codec by replacing the per-batch body."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires codec libs not present in "
                    "this container; use fake=True for plumbing tests"
                )
            feats = [
                _fake_decode(p, out_dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["meta"].map(lambda m: m["width"] if m else None),
                    "height": pdf["meta"].map(lambda m: m["height"] if m else None),
                    "feature": feats,
                }
            )

    def _op(df: DataFrame) -> DataFrame:
        return df.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)

    return _op


def sample_frames(every_n: int = 10, max_frames: int = 4, fake: bool = True):
    """Operator: video frame sampling — 1→N expansion per asset (the UDTF
    shape). The fake path slices the payload deterministically so tests can
    assert frame counts and byte provenance."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_payload": []}
            for _, r in pdf.iterrows():
                if not fake:
                    raise NotImplementedError("real frame extraction needs ffmpeg")
                payload = bytes(r["payload"] or b"")
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for i in range(n):
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(payload[i * every_n : (i + 1) * every_n])
            yield pd.DataFrame(rows)

    def _op(df: DataFrame) -> DataFrame:
        return df.mapInPandas(_frames, schema=FRAME_SCHEMA)

    return _op


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = bytes(rng.integers(0, 256, size=128, dtype=np.uint8).tolist())
        media = ["image/jpeg", "audio/wav", "video/mp4"][i % 3]
        rows.append(
            (i, media, payload, (64 + i % 32, 48 + i % 24, 1000 * (i % 7), "fake"))
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)
