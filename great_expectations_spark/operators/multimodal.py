"""Multimodal (image/audio/video) column plumbing + pure-numpy codecs.

Media travel as opaque ``binary`` columns plus a typed metadata struct; all
per-item processing runs as Arrow-batched ``mapInPandas`` (one Python
process per task, whole record batches across the boundary — never per-row
Python).

Two codec tiers (round 3 de-stubbed the ``real`` tier):

- ``codec="real"`` — actual decoding for the uncompressed formats a
  pure-numpy implementation can handle offline: **PPM (P6)** and **BMP
  (24-bit BI_RGB)** images, **WAV (PCM16)** audio, and a concatenated-P6
  stream as the trivial video container. No Pillow/ffmpeg required; the
  byte-layout parsing is numpy ``frombuffer`` + header arithmetic.
  Compressed formats (JPEG/PNG/MP3/H.264) still raise ``ValueError`` at
  the sniffing step — decoding those genuinely needs the external libs.
- ``codec="fake"`` (default for the feature kernels) — deterministic,
  content-derived stand-ins for the ML-model stages (an image *encoder*
  producing embeddings is a model, not a codec) so the full Spark plumbing
  — schema, partitioning, UDF signature, Arrow batch shape — is exercised
  without model weights.

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
    DoubleType,
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


# ---------------------------------------------------------------------------
# pure-numpy codecs (PPM P6 / BMP 24-bit / WAV PCM16 / concatenated-P6 video)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes, offset: int = 0) -> tuple[np.ndarray, int]:
    """Parse one P6 image starting at ``offset``; returns (pixels, next
    offset) so concatenated-P6 streams (the video container) parse by
    repeated calls. Header = magic + whitespace-separated w, h, maxval
    (``#`` comments allowed), one whitespace byte, then w*h*3 raw bytes."""
    buf = memoryview(payload)
    if bytes(buf[offset : offset + 2]) != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and bytes(buf[pos : pos + 1]).isspace():
            pos += 1
        if pos < len(buf) and buf[pos] == 0x23:  # '#' comment to EOL
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and bytes(buf[pos : pos + 1]).isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(bytes(buf[start:pos])))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    n = w * h * 3
    if len(buf) < pos + n:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(buf[pos : pos + n], dtype=np.uint8).reshape(h, w, 3)
    return arr, pos + n


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BI_RGB, bottom-up,
    rows padded to 4 bytes, pixels stored BGR per the format)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = a[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_data = rows.tobytes()
    import struct

    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (top-down output; handles
    both bottom-up and top-down storage via the header's height sign).
    Truncated headers raise ValueError (struct.error is converted so every
    kernel's except-ValueError row-level handling holds)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    except struct.error as e:
        raise ValueError(f"truncated BMP header: {e}") from None
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed (BI_RGB) BMP supported")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up storage → top-down output
    return np.ascontiguousarray(img)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) or (n, channels) → PCM16 WAV (RIFF little-endian)."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                      byte_rate, ch * 2, 16)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV → ((n, channels) int16 samples, sample_rate). Walks RIFF
    chunks, so extra chunks (LIST/fact) between fmt and data are fine."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_ch, rate, bits, data = 12, None, None, None, None
    try:
        while pos + 8 <= len(payload):
            cid, size = struct.unpack_from("<4sI", payload, pos)
            pos += 8
            if cid == b"fmt ":
                audio_fmt, n_ch, rate = struct.unpack_from("<HHI", payload, pos)
                bits = struct.unpack_from("<H", payload, pos + 14)[0]
                if audio_fmt != 1 or bits != 16:
                    raise ValueError("only PCM16 WAV supported")
            elif cid == b"data":
                data = payload[pos : pos + size]
            pos += size + (size % 2)  # chunks are word-aligned
    except struct.error as e:
        # truncated chunk header/body — same ValueError contract as images
        raise ValueError(f"truncated WAV chunk: {e}") from None
    if data is None or n_ch is None:
        raise ValueError("WAV missing fmt/data chunk")
    # a corrupt fmt chunk can declare 0 channels / 0 rate while still
    # passing the PCM16 check — guard BEFORE the modulo so the error stays
    # inside the ValueError contract (kernels flag the row, never die)
    if n_ch == 0 or rate == 0:
        raise ValueError("WAV fmt declares zero channels or sample rate")
    if len(data) % (2 * n_ch):
        raise ValueError("WAV data chunk not a whole number of frames")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, n_ch), int(rate)


def _sniff_and_decode_image(payload: bytes) -> np.ndarray:
    head = bytes(payload[:2])
    if head == b"P6":
        return decode_ppm(bytes(payload))[0]
    if head == b"BM":
        return decode_bmp(bytes(payload))
    raise ValueError(
        "unsupported image format (real codec handles PPM P6 and 24-bit "
        "BMP; compressed formats need Pillow)"
    )


def _resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[yi][:, xi]


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
            feats: list[np.ndarray] = []
            oks: list[int] = []
            for b in pdf[media_col]:
                if b is None:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    oks.append(0)
                elif codec == "real":
                    # real decode (PPM/BMP) → simple per-channel stats
                    # vector [w, h, mean_r, mean_g, mean_b, std_r, std_g,
                    # std_b, …0-pad]; the model-embedding stage a production
                    # pipeline would run here is a model, not a codec
                    try:
                        img = _sniff_and_decode_image(bytes(b))
                    except ValueError:
                        feats.append(np.zeros(dim, dtype=np.float32))
                        oks.append(0)
                        continue
                    f = np.zeros(dim, dtype=np.float32)
                    stats = np.concatenate(
                        [
                            [img.shape[1], img.shape[0]],
                            img.mean(axis=(0, 1)),
                            img.std(axis=(0, 1)),
                        ]
                    ).astype(np.float32)
                    f[: min(dim, stats.size)] = stats[:dim]
                    feats.append(f)
                    oks.append(1)
                else:
                    feats.append(_fake_features(b, dim))
                    oks.append(1)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "features": feats,
                    "decode_ok": oks,
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
            out_bytes = []
            for b in pdf[media_col]:
                if b is None:
                    out_bytes.append(None)
                    continue
                if codec == "real":
                    # decode (PPM/BMP) → nearest-neighbor resample →
                    # re-encode in the SAME container; an undecodable
                    # payload yields a null row (the row is the violation,
                    # not the job — same convention as decode_image_stats)
                    raw = bytes(b)
                    try:
                        img = _sniff_and_decode_image(raw)
                    except ValueError:
                        out_bytes.append(None)
                        continue
                    resized = _resize_nearest(img, width, height)
                    enc = encode_ppm if raw[:2] == b"P6" else encode_bmp
                    out_bytes.append(enc(resized))
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
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                b = bytes(b)
                if codec == "real":
                    # trivial video container: a stream of concatenated P6
                    # frames; parse them all, pick n_frames evenly spaced,
                    # emit each as a standalone P6 payload. A corrupt
                    # stream keeps the frames parsed before the corruption
                    # (possibly none → the row emits no frames) instead of
                    # killing the job
                    all_frames, off = [], 0
                    try:
                        while off < len(b):
                            img, off = decode_ppm(b, off)
                            all_frames.append(img)
                    except ValueError:
                        pass
                    if not all_frames:
                        continue
                    take = np.unique(
                        np.linspace(
                            0, len(all_frames) - 1, min(n_frames, len(all_frames))
                        ).round().astype(int)
                    )
                    for i, fi in enumerate(take):
                        ids.append(int(mid))
                        idxs.append(i)
                        frames.append(encode_ppm(all_frames[fi]))
                    continue
                chunk = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(b[i * chunk : (i + 1) * chunk] or b[-chunk:])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, media_col).mapInPandas(kernel, schema=FRAME_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("decode_ok", IntegerType()),
    ]
)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_abs", DoubleType()),
        StructField("decode_ok", IntegerType()),
    ]
)


def decode_image_stats(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """REAL decode (PPM P6 / 24-bit BMP, pure numpy) → typed metadata:
    (media_id, width, height, mean_pixel, decode_ok). Arrow ``mapInPandas``;
    undecodable payloads yield decode_ok=0 with null stats rather than
    failing the batch — the validation-engine convention (the row is the
    violation, not the job)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [],
                    "mean_pixel": [], "decode_ok": []}
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                rows["media_id"].append(int(mid))
                try:
                    img = _sniff_and_decode_image(bytes(b))
                    rows["width"].append(int(img.shape[1]))
                    rows["height"].append(int(img.shape[0]))
                    rows["mean_pixel"].append(float(img.mean()))
                    rows["decode_ok"].append(1)
                except (ValueError, TypeError):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["mean_pixel"].append(None)
                    rows["decode_ok"].append(0)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(
        kernel, schema=IMAGE_STATS_SCHEMA
    )


def decode_audio_stats(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """REAL decode (PCM16 WAV, pure numpy) → (media_id, sample_rate,
    n_samples, n_channels, mean_abs, decode_ok)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "sample_rate": [], "n_samples": [],
                    "n_channels": [], "mean_abs": [], "decode_ok": []}
            for mid, b in zip(pdf[id_col], pdf[media_col]):
                rows["media_id"].append(int(mid))
                try:
                    samples, rate = decode_wav(bytes(b))
                    rows["sample_rate"].append(int(rate))
                    rows["n_samples"].append(int(samples.shape[0]))
                    rows["n_channels"].append(int(samples.shape[1]))
                    rows["mean_abs"].append(
                        float(np.abs(samples.astype(np.float64)).mean())
                    )
                    rows["decode_ok"].append(1)
                except (ValueError, TypeError):
                    rows["sample_rate"].append(None)
                    rows["n_samples"].append(None)
                    rows["n_channels"].append(None)
                    rows["mean_abs"].append(None)
                    rows["decode_ok"].append(0)
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(
        kernel, schema=AUDIO_STATS_SCHEMA
    )


def synthesize_real_image_table(
    ids: DataFrame, id_col: str = "media_id", fmt: str = "ppm"
) -> DataFrame:
    """Deterministic REAL-codec image table from an id column: image i is
    (8 + i%5) × (6 + i%3) pixels, every channel filled with i%256 — closed
    forms a SQL oracle can recompute (mean_pixel == i%256 exactly). Encoded
    with the actual PPM/BMP encoder so decode round-trips are honest."""
    enc = {"ppm": encode_ppm, "bmp": encode_bmp}[fmt]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media": []}
            for mid in pdf[id_col]:
                i = int(mid)
                w, h, fill = 8 + i % 5, 6 + i % 3, i % 256
                arr = np.full((h, w, 3), fill, dtype=np.uint8)
                out["media_id"].append(i)
                out["media"].append(enc(arr))
            yield pd.DataFrame(out)

    schema = StructType(
        [StructField("media_id", LongType()), StructField("media", BinaryType())]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        kernel, schema=schema
    )


def synthesize_real_audio_table(
    ids: DataFrame, id_col: str = "media_id", sample_rate: int = 16000
) -> DataFrame:
    """Deterministic PCM16 WAV table: clip i has (100 + i%50) mono samples,
    all equal to (i%1000 − 500) — mean_abs == |i%1000 − 500| exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media": []}
            for mid in pdf[id_col]:
                i = int(mid)
                n, amp = 100 + i % 50, (i % 1000) - 500
                samples = np.full(n, amp, dtype=np.int16)
                out["media_id"].append(i)
                out["media"].append(encode_wav(samples, sample_rate))
            yield pd.DataFrame(out)

    schema = StructType(
        [StructField("media_id", LongType()), StructField("media", BinaryType())]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        kernel, schema=schema
    )


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
