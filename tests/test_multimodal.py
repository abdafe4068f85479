"""Multimodal plumbing tests: binary payload schema, Arrow-batched decode
stub, frame sampling shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prove_spark.operators.multimodal import (
    decode_media,
    documents_as_media,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return documents_as_media(docs).persist()


def test_media_schema_and_payload(media):
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.n_bytes == len(row.payload)
    assert media.select("media_type").distinct().count() == 3


def test_decode_fake_is_deterministic(media):
    a = decode_media(media).orderBy("media_id").toPandas()
    b = decode_media(media).orderBy("media_id").toPandas()
    assert a.equals(b)
    assert (a.width.between(64, 255)).all()
    assert (a.n_channels.isin([1, 2, 3])).all()
    assert set(a.columns) == {
        "media_id", "media_type", "n_bytes", "width", "height", "n_channels", "mean_luma",
    }


def test_decode_real_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media, fake=False).count()


def test_sample_frames_bounded(media):
    frames = sample_frames(media).toPandas()
    assert (frames.groupby("media_id").size() <= 8).all()
    assert (frames.byte_offset % 64 == 0).all()
    only_videos = media.where(F.col("media_type") == "video/mp4").count()
    assert frames.media_id.nunique() == only_videos


# ---------------------------------------------------------------------------
# real-decode path: pure-Python BMP / PPM codecs (no PIL in this container)
# ---------------------------------------------------------------------------
def _make_bmp(width: int, height: int, px) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP. px(r, c) -> (R, G, B),
    with r=0 the TOP row (the encoder writes rows bottom-up as BMP does)."""
    import struct

    stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for r in reversed(range(height)):  # bottom-up storage
        row = bytearray()
        for c in range(width):
            rr, g, b = px(r, c)
            row += bytes((b, g, rr))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        raster += row
    pix_off = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_off + len(raster), 0, 0, pix_off
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + dib + bytes(raster)


def _make_ppm(width: int, height: int, px) -> bytes:
    raster = bytearray()
    for r in range(height):
        for c in range(width):
            raster += bytes(px(r, c))
    return (
        b"P6\n# comment\n" + f"{width} {height}\n255\n".encode() + bytes(raster)
    )


def test_decode_bmp_real_pixels():
    from prove_spark.operators.multimodal import decode_bmp

    # 3x2 image: all-white top row, all-black bottom row → mean luma 0.5
    w, h, ch, luma = decode_bmp(
        _make_bmp(3, 2, lambda r, c: (255, 255, 255) if r == 0 else (0, 0, 0))
    )
    assert (w, h, ch) == (3, 2, 3)
    assert luma == 0.5
    # pure red: BT.601 luma = 0.299 exactly
    _, _, _, red = decode_bmp(_make_bmp(5, 3, lambda r, c: (255, 0, 0)))
    assert red == 0.299


def test_decode_ppm_real_pixels():
    from prove_spark.operators.multimodal import decode_ppm

    w, h, ch, luma = decode_ppm(_make_ppm(4, 4, lambda r, c: (0, 255, 0)))
    assert (w, h, ch) == (4, 4, 3)
    assert luma == 0.587  # pure green


def test_bmp_and_ppm_agree_on_same_pixels():
    from prove_spark.operators.multimodal import decode_image

    px = lambda r, c: ((r * 40) % 256, (c * 90) % 256, (r + c) % 256)  # noqa: E731
    assert decode_image(_make_bmp(7, 5, px)) == decode_image(_make_ppm(7, 5, px))


def test_decode_media_real_path_on_spark(spark):
    """fake=False end to end: BMP/PPM payloads through the mapInPandas stage."""
    import pandas as pd

    payloads = [
        (1, _make_bmp(3, 2, lambda r, c: (255, 255, 255) if r == 0 else (0, 0, 0)), "image/bmp"),
        (2, _make_ppm(4, 4, lambda r, c: (0, 255, 0)), "image/ppm"),
    ]
    pdf = pd.DataFrame(payloads, columns=["media_id", "payload", "media_type"])
    pdf["n_bytes"] = pdf["payload"].map(len)
    media = spark.createDataFrame(pdf)
    got = decode_media(media, fake=False).orderBy("media_id").toPandas()
    assert list(got.width) == [3, 4]
    assert list(got.height) == [2, 4]
    assert list(got.mean_luma) == [0.5, 0.587]


def test_decode_media_real_path_unsupported_format_raises(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [(1, b"\x89PNG\r\n\x1a\nxxxx", "image/png", 12)],
        columns=["media_id", "payload", "media_type", "n_bytes"],
    )
    media = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        decode_media(media, fake=False).collect()


def _make_bmp_topdown(width: int, height: int, px) -> bytes:
    """Same contract as _make_bmp but stores rows TOP-DOWN with the
    negative biHeight the BMP spec uses to flag that order."""
    import struct

    stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for r in range(height):  # natural (top-down) storage
        row = bytearray()
        for c in range(width):
            rr, g, b = px(r, c)
            row += bytes((b, g, rr))
        row += b"\x00" * (stride - len(row))
        raster += row
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(raster), 0, 0, pix_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + dib + bytes(raster)


def test_topdown_bmp_not_flipped():
    """A negative-biHeight (top-down) BMP must decode AND resize to the
    same image as its bottom-up twin — previously _read_pixels assumed
    bottom-up order and silently emitted a vertically flipped resize."""
    from prove_spark.operators.multimodal import (
        decode_bmp,
        resize_image,
    )
    from prove_spark.operators.multimodal import _read_pixels

    def px(r, c):  # top row red, bottom row blue — orientation-sensitive
        return (255, 0, 0) if r == 0 else (0, 0, 255)

    up = _make_bmp(3, 2, px)
    down = _make_bmp_topdown(3, 2, px)
    assert decode_bmp(up) == decode_bmp(down)  # luma is order-insensitive
    assert _read_pixels(up) == _read_pixels(down)  # pixels must match too
    assert resize_image(up, 3, 2) == resize_image(down, 3, 2)


def test_resize_image_real_nearest_neighbor():
    from prove_spark.operators.multimodal import decode_ppm, resize_image

    # 4x4 quadrant image: TL red, TR green, BL blue, BR white
    def px(r, c):
        if r < 2 and c < 2:
            return (255, 0, 0)
        if r < 2:
            return (0, 255, 0)
        if c < 2:
            return (0, 0, 255)
        return (255, 255, 255)

    for src in (_make_bmp(4, 4, px), _make_ppm(4, 4, px)):
        out = resize_image(src, 2, 2)
        w, h, ch, _ = decode_ppm(out)
        assert (w, h, ch) == (2, 2, 3)
        raster = out[out.index(b"255\n") + 4 :]
        pixels = [tuple(raster[i : i + 3]) for i in range(0, 12, 3)]
        # nearest-neighbor picks the top-left sample of each quadrant
        assert pixels == [
            (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
        ]


def test_resize_media_roundtrip_on_spark(spark):
    import pandas as pd

    from prove_spark.operators.multimodal import decode_media, resize_media

    pdf = pd.DataFrame(
        [
            (1, _make_bmp(8, 6, lambda r, c: (255, 0, 0)), "image/bmp"),
            (2, _make_ppm(5, 5, lambda r, c: (0, 255, 0)), "image/ppm"),
        ],
        columns=["media_id", "payload", "media_type"],
    )
    pdf["n_bytes"] = pdf["payload"].map(len)
    media = spark.createDataFrame(pdf)
    resized = resize_media(media, out_w=3, out_h=2, fake=False)
    # decode the RESIZED payloads with the real decoder: dims + luma survive
    feats = (
        decode_media(
            resized.select(
                "media_id",
                "payload",
                F.lit("image/ppm").alias("media_type"),
                "n_bytes",
            ),
            fake=False,
        )
        .orderBy("media_id")
        .toPandas()
    )
    assert list(feats.width) == [3, 3]
    assert list(feats.height) == [2, 2]
    assert list(feats.mean_luma) == [0.299, 0.587]  # pure red / pure green


def _make_wav(n_channels=1, sample_rate=8000, frames=(), extra_chunk=False) -> bytes:
    import struct

    data = b"".join(
        struct.pack("<h", s) for fr in frames for s in (fr,) * n_channels
    )
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # decoder must skip unknown chunks
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_real_pcm():
    from prove_spark.operators.multimodal import decode_wav

    # constant full-scale-half samples -> rms = 16384/32768 = 0.5
    ch, sr, ns, dur, rms = decode_wav(
        _make_wav(2, 16000, (16384,) * 800, extra_chunk=True)
    )
    assert (ch, sr, ns) == (2, 16000, 800)
    assert dur == 0.05
    assert rms == 0.5
    silent = decode_wav(_make_wav(1, 8000, (0,) * 10))
    assert silent[4] == 0.0


def test_audio_features_real_path_on_spark(spark):
    import pandas as pd

    from prove_spark.operators.multimodal import audio_features

    pdf = pd.DataFrame(
        [
            (1, _make_wav(1, 8000, (16384,) * 400), "audio/wav"),
            (2, _make_wav(2, 16000, (0,) * 160), "audio/wav"),
        ],
        columns=["media_id", "payload", "media_type"],
    )
    pdf["n_bytes"] = pdf["payload"].map(len)
    got = (
        audio_features(spark.createDataFrame(pdf), fake=False)
        .orderBy("media_id")
        .toPandas()
    )
    assert list(got.n_channels) == [1, 2]
    assert list(got.sample_rate) == [8000, 16000]
    assert list(got.duration_s) == [0.05, 0.01]
    assert list(got.rms) == [0.5, 0.0]
