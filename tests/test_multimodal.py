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
