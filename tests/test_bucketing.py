"""Bucketed co-located join: same-bucketed tables must join with no shuffle
on either side — the layout strategy for repeatedly-joined fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prove_spark.sources.tables import save_bucketed


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    yield "bktest"
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_bucketed_join_is_shuffle_free(spark, bucket_db):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = events.select("event_id", "user_id", "value")
    right = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    save_bucketed(left, "ev_left", "user_id", 8, database=bucket_db)
    save_bucketed(right, "ev_right", "user_id", 8, database=bucket_db)

    a = spark.table(f"{bucket_db}.ev_left")
    b = spark.table(f"{bucket_db}.ev_right")
    # disable broadcast so the join strategy is actually exercised
    joined = a.hint("merge").join(b, "user_id")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"

    # and it computes the right thing
    got = joined.agg(F.count("*")).first()[0]
    want = left.join(right, "user_id").count()
    assert got == want


def test_mismatched_buckets_do_shuffle(spark, bucket_db):
    """Sanity inverse: a bucketed table joined to an unbucketed DataFrame
    must still exchange the unbucketed side."""
    a = spark.table(f"{bucket_db}.ev_left")
    plain = spark.read.parquet("/root/testdata/sf0.001/events.parquet").groupBy(
        "user_id"
    ).agg(F.sum("value").alias("s"))
    joined = a.hint("merge").join(plain, "user_id")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" in plan
