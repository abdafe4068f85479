"""Partition pruning: a date-partitioned table layout must prune at the
scan (PartitionFilters reach the file index; untouched partitions are never
read) — the Iceberg-partition-spec stand-in for ts-day partitioning of the
transcripts table at 10^12-turn scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def day_partitioned(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_by_day"))
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out)
    )
    return out


def test_day_filter_prunes_partitions(spark, day_partitioned):
    df = spark.read.parquet(day_partitioned).where(F.col("day") == "2024-01-03")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    # pruning actually limits the files read: one day's rows only
    # (partition values are type-inferred back to DATE on read)
    got_days = {str(r.day) for r in df.select("day").distinct().collect()}
    assert got_days == {"2024-01-03"}
    all_days = (
        spark.read.parquet(day_partitioned).select("day").distinct().count()
    )
    assert all_days > 1  # the layout really has multiple partitions


def test_bucket_layout_prunes_for_resume(spark, tmp_path):
    """The checkpoint layout's bucket partitioning prunes single-bucket
    reads — what makes per-bucket resume IO-proportional to the remainder."""
    from prove_spark.sources.tables import TableIO, with_bucket

    io = TableIO(spark, str(tmp_path / "wh"))
    df = with_bucket(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"), "user_id", 8
    )
    io.overwrite_buckets(df, "ev", "bucket")
    one = io.read("ev").where(F.col("bucket") == 3)
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert {r.bucket for r in one.select("bucket").distinct().collect()} == {3}
