"""Pins for pipeline/checkpoint.py:compact_buckets — content preservation,
untouched-bucket byte-stability (file name + mtime), exactly-one-file
output, and idempotency. Fragmentation is staged deliberately: a
many-partition write scatters each bucket across tasks, while one bucket
is pre-written compact to prove the selective rewrite leaves it alone."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from prove_spark.pipeline.checkpoint import bucket_file_counts, compact_buckets
from prove_spark.sources.tables import TableIO


N_BUCKETS = 4


@pytest.fixture()
def fragmented_wh(spark, tmp_path):
    wh = str(tmp_path / "wh")
    rows = spark.range(400).select(
        F.col("id"),
        (F.col("id") % N_BUCKETS).cast("int").alias("bucket"),
        F.concat(F.lit("payload "), F.col("id")).alias("text"),
    )
    # bucket 0 written compact first (one task), the rest fragmented across
    # 8 tasks each -> up to 8 files per bucket (no overwrite-mode conf
    # needed: the first write targets an empty dir and overwrite_buckets
    # sets dynamic mode per-write)
    rows.where("bucket = 0").repartition(1).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{wh}/events")
    rows.where("bucket != 0").repartition(8).write.mode("append").partitionBy(
        "bucket"
    ).parquet(f"{wh}/events")
    return wh


def _files(wh, bucket):
    return sorted(glob.glob(f"{wh}/events/bucket={bucket}/*.parquet"))


def test_compacts_only_fragmented_buckets(spark, fragmented_wh):
    wh = fragmented_wh
    io = TableIO(spark, wh, use_iceberg=False)
    before_counts = bucket_file_counts(io, "events")
    assert before_counts[0] == 1 and all(
        before_counts[b] > 1 for b in range(1, N_BUCKETS)
    )
    before_rows = sorted(
        (r.id, r.bucket, r.text) for r in io.read("events").collect()
    )
    untouched = [(f, os.path.getmtime(f)) for f in _files(wh, 0)]

    done = compact_buckets(spark, wh, "events")
    assert done == list(range(1, N_BUCKETS))

    after_counts = bucket_file_counts(io, "events")
    assert all(after_counts[b] == 1 for b in range(N_BUCKETS))
    after_rows = sorted(
        (r.id, r.bucket, r.text) for r in io.read("events").collect()
    )
    assert after_rows == before_rows  # content preserved exactly
    # the already-compact bucket's file is byte-untouched (same name+mtime)
    assert [(f, os.path.getmtime(f)) for f in _files(wh, 0)] == untouched


def test_second_pass_is_a_noop(spark, fragmented_wh):
    wh = fragmented_wh
    compact_buckets(spark, wh, "events")
    stamped = {
        b: [(f, os.path.getmtime(f)) for f in _files(wh, b)]
        for b in range(N_BUCKETS)
    }
    assert compact_buckets(spark, wh, "events") == []
    assert stamped == {
        b: [(f, os.path.getmtime(f)) for f in _files(wh, b)]
        for b in range(N_BUCKETS)
    }


def test_iceberg_mode_points_at_native_rewrite(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), use_iceberg=True)
    with pytest.raises(NotImplementedError, match="rewrite_data_files"):
        bucket_file_counts(io, "events")
