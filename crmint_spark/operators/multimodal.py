"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched pandas UDFs.

The Spark-side architecture here is real and tested: schema contract,
partition sizing, ``mapInPandas`` batch shape, and metadata extraction.
Codec status (honest split):

- **REAL decode kernels** for the formats expressible with stdlib +
  numpy alone: binary **PPM (P6)** images, **PNG** (full zlib inflate +
  scanline unfilter decode AND filter-0 encode — stdlib zlib, no
  libpng), and **PCM WAV** audio (stdlib ``wave``: RMS /
  zero-crossings / duration features). These run end-to-end in this
  container and are value-tested against numpy ground truth.
- **STUBBED kernels** for compressed formats (JPEG/MP4/MP3) whose
  decoders (libjpeg/ffmpeg) are not present in this container:
  ``decode_stub=True`` produces deterministic fake features (byte-hash
  driven) and ``decode_stub=False`` raises NotImplementedError where
  the real library call would go. Payloads are format-sniffed, so a
  mixed corpus decodes what it can and stubs the rest.

At 100 TB: binary payloads dominate partition size, so repartition by
``maxRecordsPerBatch``-aligned counts and keep metadata in separate
(pruned) columns so metadata-only queries never touch the bytes.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", LongType()),  # images/video
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: bytes -> FEATURE_DIM floats.
    Replaces the real decode+embed kernel for compressed formats."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


# --- REAL codecs (stdlib + numpy only) -------------------------------------


def decode_ppm(b: bytes) -> "np.ndarray | None":
    """Binary PPM (P6, maxval 255) -> HxWx3 uint8 array, or None if the
    payload is not P6. Header = 'P6' + whitespace-separated width,
    height, maxval (with '#' comments), then raw RGB bytes."""
    if not b or not b.startswith(b"P6"):
        return None
    tokens: list[int] = []
    i = 2
    n = len(b)
    while len(tokens) < 3 and i < n:
        c = b[i : i + 1]
        if c == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not b[j : j + 1].isspace():
                j += 1
            tokens.append(int(b[i:j]))
            i = j
    if len(tokens) < 3 or tokens[2] != 255:
        return None
    i += 1  # single whitespace after maxval
    w, h = tokens[0], tokens[1]
    raw = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return raw.reshape(h, w, 3)


def encode_ppm(arr: "np.ndarray") -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resample via numpy index gather (no loops)."""
    h, w, _ = arr.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]


def _ppm_feature(arr: "np.ndarray") -> list[float]:
    h, w, _ = arr.shape
    f = arr.reshape(-1, 3).astype(np.float64)
    lum = f @ np.array([0.299, 0.587, 0.114])
    return [
        float(w),
        float(h),
        round(float(f[:, 0].mean()), 6),
        round(float(f[:, 1].mean()), 6),
        round(float(f[:, 2].mean()), 6),
        round(float(lum.mean()), 6),
        round(float(lum.std()), 6),
        round(w / h, 6),
    ][:FEATURE_DIM]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype -> channels (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(b: bytes) -> "np.ndarray | None":
    """PNG -> HxWx3 uint8 RGB array, or None if the payload is not a
    decodable PNG. Pure stdlib-zlib + numpy: IDAT chunks inflate to
    filtered scanlines; filters 0/2 (None/Up) and 1 (Sub, via int32
    cumsum mod 256) unfilter vectorized, 3/4 (Average/Paeth) per-pixel.
    Supports bit depth 8, colortypes gray/RGB/gray-alpha/RGBA,
    non-interlaced (the overwhelming majority of real PNGs); alpha is
    dropped, gray broadcast to RGB."""
    import zlib

    if not b or not b.startswith(_PNG_SIG):
        return None
    i, n = len(_PNG_SIG), len(b)
    w = h = None
    ctype = None
    idat = bytearray()
    while i + 8 <= n:
        ln = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        i += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            if ln < 13:
                return None
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, _comp, _filt, interlace = data[8:13]
            if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
                return None
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if not w or not h or ctype is None or not idat:
        return None
    ch = _PNG_CHANNELS[ctype]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except Exception:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f, line = int(rows[r, 0]), rows[r, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per byte-lane cumulative sum mod 256
            cur = (
                np.cumsum(line.reshape(w, ch), axis=0) % 256
            ).reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.int32)
            for j in range(stride):
                left = cur[j - ch] if j >= ch else 0
                cur[j] = (line[j] + ((left + prev[j]) >> 1)) % 256
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            for j in range(stride):
                a = cur[j - ch] if j >= ch else 0
                c_ = prev[j - ch] if j >= ch else 0
                p = a + prev[j] - c_
                pa, pb, pc = abs(p - a), abs(p - prev[j]), abs(p - c_)
                pred = a if (pa <= pb and pa <= pc) else (
                    prev[j] if pb <= pc else c_
                )
                cur[j] = (line[j] + pred) % 256
        else:
            return None
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:
        return px[:, :, :3]
    return px


def encode_png(arr: "np.ndarray") -> bytes:
    """HxWx3 uint8 RGB -> PNG bytes (filter 0 scanlines, one zlib
    stream, stdlib-only)."""
    import struct
    import zlib

    h, w, _ = arr.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    lines = np.concatenate(
        [
            np.zeros((h, 1), dtype=np.uint8),
            arr.astype(np.uint8).reshape(h, w * 3),
        ],
        axis=1,
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(b: bytes) -> "tuple[np.ndarray, int] | None":
    """PCM WAV -> (float samples in [-1, 1] mono-mixed, sample_rate),
    or None if not a RIFF/WAVE payload (stdlib ``wave``)."""
    import wave

    if not b or not b.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(b)) as f:
            sw = f.getsampwidth()
            nch = f.getnchannels()
            raw = f.readframes(f.getnframes())
            rate = f.getframerate()
    except Exception:
        return None
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def _wav_feature(x: "np.ndarray", rate: int) -> list[float]:
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return [
        float(len(x)),
        float(rate),
        round(len(x) / rate, 6),
        round(float(np.sqrt((x**2).mean())), 6),
        round(zc / max(len(x) - 1, 1), 6),
        round(float(np.abs(x).max(initial=0.0)), 6),
        round(float(np.abs(x).mean()), 6),
        1.0,
    ][:FEATURE_DIM]


def real_feature(payload: bytes) -> "list[float] | None":
    """Format-sniffed REAL feature extraction; None when the payload is
    a compressed format this container cannot decode."""
    img = decode_ppm(payload)
    if img is None:
        img = decode_png(payload)
    if img is not None:
        return _ppm_feature(img)
    wav = decode_wav(payload)
    if wav is not None:
        return _wav_feature(*wav)
    return None


def extract_features(
    media: DataFrame, decode_stub: bool = True, batch_rows: int = 64
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow ships (media_id, kind, content) batches to Python; each batch
    yields one feature frame. Column pruning upstream means metadata-only
    plans never pay this path.
    """

    def _one(b) -> list[float]:
        payload = bytes(b) if b is not None else b""
        real = real_feature(payload)
        if real is not None:
            return real  # PPM / PCM-WAV: genuinely decoded
        if not decode_stub:
            raise NotImplementedError(
                "compressed media decode (JPEG/MP4/MP3) requires "
                "libjpeg/ffmpeg, not present in this container"
            )
        return _fake_feature(payload)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(_one),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: PPM payloads are REALLY decoded, nearest-neighbor
    resampled with numpy, and re-encoded inside the batch loop;
    compressed formats pass bytes through unchanged (stub) with the
    target dims recorded in metadata."""

    def _resize_bytes(b):
        payload = bytes(b) if b is not None else b""
        img = decode_ppm(payload)
        if img is not None:
            return encode_ppm(resize_nearest(img, width, height))
        img = decode_png(payload)
        if img is not None:
            return encode_png(resize_nearest(img, width, height))
        return payload  # compressed format: stub passthrough

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = out["content"].map(_resize_bytes)
            out["width"] = width
            out["height"] = height
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (metadata math JVM-side; frame decode stubbed)."""
    video = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull()
    )
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
