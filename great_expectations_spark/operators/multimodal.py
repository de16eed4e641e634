"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct; all
per-item processing runs as Arrow-batched ``mapInPandas`` (one Python
process per task, whole record batches across the boundary — never per-row
Python).

The actual codecs (Pillow/ffmpeg/soundfile) are NOT installed in this
sandbox, so the decode kernels are **stubbed**: ``codec="fake"`` (default)
produces deterministic, content-derived features so the full Spark plumbing
— schema, partitioning, UDF signature, Arrow batch shape — is real and
testable; ``codec="real"`` raises ``NotImplementedError`` at the exact
point a production deployment would call the library.

Schema convention::

    media_id: long, media: binary,
    meta: struct<format:string, width:int, height:int,
                 sample_rate:int, n_frames:int>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
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

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("decode_ok", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm feature vector derived from the bytes —
    the stand-in for a real image/audio encoder. sha256-seeded so it is
    stable across Python processes (no PYTHONHASHSEED dependence)."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    digest = hashlib.sha256(bytes(payload)).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def decode_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    dim: int = 64,
    codec: str = "fake",
    batch_hint: int | None = None,
) -> DataFrame:
    """binary → feature vector via Arrow ``mapInPandas``.

    The iterator signature processes whole Arrow batches; per-batch numpy
    work is vectorized where the codec allows. ``codec='real'`` marks where
    Pillow/torchvision decoding belongs (not installed here).
    """
    if codec not in ("fake", "real"):
        raise ValueError("codec must be 'fake' or 'real'")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real image decode requires Pillow; install and decode "
                    "pdf[media_col] bytes here"
                )
            feats = [
                _fake_features(b, dim) for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "features": feats,
                    "decode_ok": [
                        1 if b is not None else 0 for b in pdf[media_col]
                    ],
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "media_id",
    codec: str = "fake",
) -> DataFrame:
    """Resize plumbing: fake codec emits a deterministic byte payload of the
    target dimensions (3 bytes/pixel, content-hash filled) so downstream
    size/shape logic is exercised for real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_bytes = width * height * 3
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real resize requires Pillow; Image.open(bytes).resize()"
                )
            out_bytes = []
            for b in pdf[media_col]:
                if b is None:
                    out_bytes.append(None)
                    continue
                seed = hashlib.sha256(bytes(b)).digest()
                reps = n_bytes // len(seed) + 1
                out_bytes.append((seed * reps)[:n_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media": out_bytes,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, media_col).mapInPandas(kernel, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    media_col: str = "media",
    id_col: str = "media_id",
    codec: str = "fake",
) -> DataFrame:
    """Video frame sampling: 1 input row → ``n_frames`` output rows
    (mapInPandas naturally expresses the 1→N fan-out). Fake codec slices the
    payload into equal chunks standing in for decoded frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/av bindings"
                )
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                b = bytes(b)
                chunk = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(b[i * chunk : (i + 1) * chunk] or b[-chunk:])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, media_col).mapInPandas(kernel, schema=FRAME_SCHEMA)


def synthesize_media_table(
    spark, n_rows: int = 64, payload_bytes: int = 256, seed: int = 42
) -> DataFrame:
    """Deterministic fake media table for tests/benches (binary payloads
    derived from the row id via JVM-side expressions)."""
    df = spark.range(n_rows)
    payload = F.repeat(
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(seed))), 256),
        payload_bytes // 64 + 1,
    ).substr(1, payload_bytes)
    return df.select(
        F.col("id").alias("media_id"),
        F.encode(payload, "utf-8").alias("media"),
        F.struct(
            F.lit("fake").alias("format"),
            F.lit(64).cast("int").alias("width"),
            F.lit(48).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.lit(8).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
