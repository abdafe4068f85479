"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` kernels. The real-codec path (`fake=False`)
carries a dependency-free pure-Python decoder for uncompressed 24-bit BMP
and binary PPM (P6) — actual header parse + pixel scan + BT.601 luma — and
raises NotImplementedError for formats that need PIL/ffmpeg (not in this
container). The default `fake=True` path derives deterministic pseudo
features from a content hash so the Spark-side plumbing (schema, batching,
partitioning, UDF signatures) stays testable on arbitrary payloads
(tests/test_multimodal.py covers both paths).
"""

from __future__ import annotations

import hashlib
import struct
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


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Real decode of an uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER):
    header parse + full pixel scan. Rows are 4-byte padded, pixels BGR.
    Returns (width, height, n_channels, mean_luma) with mean_luma the
    BT.601 luma (0.299R + 0.587G + 0.114B) averaged over all pixels,
    normalized to [0, 1] and rounded to 6 places."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    total = 0
    for r in range(height):
        # slice both ends: an open-ended slice would copy the whole
        # remaining payload per row (O(height x file_size) memcpy)
        start = pix_off + r * row_stride
        row = payload[start : start + width * 3]
        # BGR byte triples; 1000x-scaled integer luma keeps the sum exact
        for c in range(width):
            b, g, rr = row[3 * c], row[3 * c + 1], row[3 * c + 2]
            total += 299 * rr + 587 * g + 114 * b
    n_px = width * height
    return width, height, 3, round(total / (n_px * 1000 * 255.0), 6)


def decode_ppm(payload: bytes) -> tuple[int, int, int, float]:
    """Real decode of a binary PPM (P6): ASCII header (width height maxval,
    `#` comments allowed) then raw RGB triples."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: P6, width, height, maxval, then ONE whitespace
    # byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    raster = payload[pos : pos + width * height * 3]
    total = 0
    for i in range(0, width * height * 3, 3):
        total += 299 * raster[i] + 587 * raster[i + 1] + 114 * raster[i + 2]
    n_px = width * height
    return width, height, 3, round(total / (n_px * 1000 * 255.0), 6)


def decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Dispatch on magic bytes; NotImplementedError for formats that need
    real codec libraries (PNG/JPEG/WAV/MP4 → PIL/ffmpeg at deploy)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "real decode for this format needs PIL/ffmpeg — not in this container"
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage (Arrow batches of
    binary payloads; one Python worker call per batch, never per row).
    fake=False runs the real pure-Python BMP/PPM decoder (NotImplementedError
    surfaces per-task for unsupported formats, exactly as a missing codec
    would in production)."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            else:
                feats = [decode_image(bytes(p)) for p in pdf["payload"]]
            out = pdf[["media_id", "media_type", "n_bytes"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["n_channels"] = [f[2] for f in feats]
            out["mean_luma"] = [f[3] for f in feats]
            yield out

    return media.mapInPandas(decode_batch, schema=FEATURE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, n_samples long, "
    "duration_s double, rms double"
)


def decode_wav(payload: bytes) -> tuple[int, int, int, float, float]:
    """Real decode of a PCM WAV (RIFF) payload: proper chunk walk (fmt /
    data, skipping LIST etc.), then RMS over the 16-bit interleaved samples.
    Returns (n_channels, sample_rate, n_samples_per_channel, duration_s,
    rms) with rms normalized to [0, 1] and rounded to 6 places."""
    import math

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (format={audio_format}, bits={bits})"
        )
    n_frames = len(data) // (2 * n_channels)
    total = 0
    for (s,) in struct.iter_unpack("<h", data[: n_frames * n_channels * 2]):
        total += s * s
    n = n_frames * n_channels
    rms = math.sqrt(total / n) / 32768.0 if n else 0.0
    return (
        n_channels,
        sample_rate,
        n_frames,
        round(n_frames / sample_rate, 6),
        round(rms, 6),
    )


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature extraction as a mapInPandas stage: real PCM WAV parse
    (fake=False) or the deterministic hash-derived stand-in (fake=True)."""

    def batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    h = hashlib.md5(bytes(p)).digest()
                    ch, sr = 1 + h[0] % 2, 8000 * (1 + h[1] % 6)
                    ns = 100 + h[2] * 37
                    rows.append(
                        (mid, ch, sr, ns, round(ns / sr, 6), round(h[3] / 255.0, 6))
                    )
                else:
                    rows.append((mid, *decode_wav(bytes(p))))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_channels",
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "rms",
                ],
            )

    return media.mapInPandas(batch, schema=AUDIO_SCHEMA)


def _read_pixels(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """(width, height, row-major RGB triples) for BMP/PPM payloads."""
    if payload[:2] == b"BM":
        (pix_off,) = struct.unpack_from("<I", payload, 10)
        (_hs, width, height) = struct.unpack_from("<Iii", payload, 14)
        (_pl, bpp) = struct.unpack_from("<HH", payload, 26)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP")
        # negative biHeight means top-down row order (BMP spec); positive is
        # the usual bottom-up layout. Branch on the sign so a top-down image
        # resizes right-side-up instead of silently flipped.
        top_down = height < 0
        height = abs(height)
        stride = (width * 3 + 3) & ~3
        px = []
        for r in range(height):
            src_row = r if top_down else (height - 1 - r)
            start = pix_off + src_row * stride
            row = payload[start : start + width * 3]
            px.extend(
                (row[3 * c + 2], row[3 * c + 1], row[3 * c])
                for c in range(width)
            )
        return width, height, px
    if payload[:2] == b"P6":
        w, h, _ch, _l = decode_ppm(payload)  # header validation
        # re-parse the header offset the same way decode_ppm does
        pos, fields = 2, []
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1
        raster = payload[pos : pos + w * h * 3]
        px = [
            (raster[i], raster[i + 1], raster[i + 2])
            for i in range(0, w * h * 3, 3)
        ]
        return w, h, px
    raise NotImplementedError("resize supports BMP/PPM in this container")


def resize_image(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize for BMP/PPM payloads, re-encoded as a
    binary PPM (P6) — the canonical uncompressed interchange so downstream
    stages need one reader. Deterministic: sample index = floor(i * in/out)."""
    in_w, in_h, px = _read_pixels(payload)
    out = bytearray(f"P6\n{out_w} {out_h}\n255\n".encode())
    for r in range(out_h):
        sr = r * in_h // out_h
        base = sr * in_w
        for c in range(out_w):
            out += bytes(px[base + (c * in_w // out_w)])
    return bytes(out)


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, n_bytes int"
)


def resize_media(media: DataFrame, out_w: int = 64, out_h: int = 64, fake: bool = True) -> DataFrame:
    """Resize as a mapInPandas stage. fake=True emits a deterministic
    truncated-payload stand-in (so the plumbing runs on arbitrary payloads);
    fake=False runs the real BMP/PPM nearest-neighbor resampler."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                payloads = [
                    bytes(p)[: out_w * out_h] for p in pdf["payload"]
                ]
            else:
                payloads = [
                    resize_image(bytes(p), out_w, out_h)
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": out_w,
                    "height": out_h,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(resize_batch, schema=RESIZED_SCHEMA)


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
