"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` kernels. The actual codec step is STUBBED here
(no image/audio libraries in this container): `decode_image_batch` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder produces (width, height, n_channels, mean_luma) from the payload
bytes — the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, n_bytes int"
)
FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, "
    "width int, height int, n_channels int, mean_luma double"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap a text table as an opaque-binary media table (the schema shape a
    real image/audio ingest would produce)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length("text").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real decoder: derives plausible
    dimensions from a content hash. Replace with PIL/ffmpeg at deploy."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_channels = 1 + h[2] % 3
    mean_luma = round(h[3] / 255.0, 6)
    return width, height, n_channels, mean_luma


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage (Arrow batches of
    binary payloads; one Python worker call per batch, never per row)."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg — not in this container"
                )
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pdf[["media_id", "media_type", "n_bytes"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["n_channels"] = [f[2] for f in feats]
            out["mean_luma"] = [f[3] for f in feats]
            yield out

    return media.mapInPandas(decode_batch, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: emit up to max_frames byte-offset "frames"
    per video payload (a real implementation would seek keyframes; the
    offsets/explode shape is what matters for the Spark plan)."""
    frames = F.slice(
        F.sequence(F.lit(0), (F.col("n_bytes") / every_n_bytes).cast("int")),
        1,
        max_frames,
    )
    return (
        media.where(F.col("media_type") == "video/mp4")
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "chunk"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("chunk") * every_n_bytes).alias("byte_offset"),
        )
    )
