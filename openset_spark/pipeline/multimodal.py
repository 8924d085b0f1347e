"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata structs; per-item decode/feature work runs in Arrow-batched
``mapInPandas`` so a 100 TB media table streams through Python in
columnar batches (never row-at-a-time).

The decode kernels themselves are STUBBED (image/audio libs are not
in this container): ``deterministic=True`` yields a seeded fake
feature vector so the full Spark plumbing — schema, batching,
partitioning — is real and testable; ``deterministic=False`` raises
NotImplementedError where a real decoder (PIL/ffmpeg) would slot in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    # Deterministic stand-in for a decoded feature vector: bytes -> a
    # repeatable pseudo-embedding. Replace with a real decoder at
    # deployment; the Spark-side contract is identical.
    h = 1469598103934665603
    out = []
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        out.append(((h >> 16) % 100000) / 100000.0)
    return out


def extract_features(
    media: DataFrame, dim: int = 16, deterministic: bool = True
) -> DataFrame:
    """media frame -> (media_id, kind, n_bytes, feature) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "feature": payloads.map(
                        lambda p: _fake_feature(bytes(p or b""), dim)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (JVM sequence — the expensive decode happens later in
    extract_features over the exploded plan)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),  # row-major RGB
    ]
)


def decode_images(
    media: DataFrame, deterministic: bool = True
) -> DataFrame:
    """image rows -> decoded (media_id, width, height, channels,
    pixels) via mapInPandas. Stubbed decode: ``deterministic=True``
    synthesizes a payload-derived pixel buffer at the metadata's
    declared dimensions; a real deployment swaps in PIL here with the
    identical schema/batch contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image decode requires PIL; not in container"
                )
            pdf = pdf[pdf["kind"] == "image"]
            w = pdf["width"].fillna(1).astype(int)
            h = pdf["height"].fillna(1).astype(int)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "channels": 3,
                    "pixels": [
                        bytes((bytes(p or b"\x00") * (ww * hh * 3))[: ww * hh * 3])
                        for p, ww, hh in zip(pdf["payload"], w, h)
                    ],
                }
            )

    return media.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def resize_images(
    decoded: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """decoded images -> nearest-neighbor resize to (out_w, out_h),
    same schema. The sampling itself is trivially expressible in
    Python over the Arrow batch; at scale the win is that resize runs
    fused in the same stage as decode (no shuffle between them)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"]):
                src = bytes(px)
                buf = bytearray()
                for y in range(out_h):
                    sy = min(int(y * h / out_h), h - 1)
                    for x in range(out_w):
                        sx = min(int(x * w / out_w), w - 1)
                        o = (sy * w + sx) * 3
                        buf += src[o : o + 3]
                out_px.append(bytes(buf))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "channels": pdf["channels"],
                    "pixels": out_px,
                }
            )

    return decoded.mapInPandas(run, DECODED_IMAGE_SCHEMA)
