"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched pandas UDFs.

The Spark-side architecture here is real and tested: schema contract,
partition sizing, ``mapInPandas`` batch shape, and metadata extraction.
The actual codec work (JPEG decode, resampling, frame sampling) needs
image/audio libraries not present in this container, so the decode
kernels are STUBBED: ``decode_stub=True`` produces deterministic fake
features (byte-hash driven), and ``decode_stub=False`` raises
NotImplementedError where a real libjpeg/ffmpeg call would go.

At 100 TB: binary payloads dominate partition size, so repartition by
``maxRecordsPerBatch``-aligned counts and keep metadata in separate
(pruned) columns so metadata-only queries never touch the bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    Replaces the real decode+embed kernel in this container."""
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame, decode_stub: bool = True, batch_rows: int = 64
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow ships (media_id, kind, content) batches to Python; each batch
    yields one feature frame. Column pruning upstream means metadata-only
    plans never pay this path.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs "
                    "(libjpeg/ffmpeg) not present in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(
                        lambda b: _fake_feature(bytes(b) if b is not None else b"")
                    ),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes bytes through the stubbed kernel,
    recording the target dims in metadata. Real implementation would
    decode -> resample -> re-encode inside the same batch loop."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
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
