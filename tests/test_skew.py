"""Skew helpers: salted join/agg equivalence and salt determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from prove_spark.operators.skew import salted_agg, salted_join, with_salt


def _skewed(spark):
    """90% of rows share one hot key."""
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("k1", 2), ("k2", 3)], "k string, dim int"
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("dim").alias("s")
    )
    salted = salted_join(big, small, "k", n_salts=8, big_salt_from=["id"]).groupBy(
        "k"
    ).agg(F.count("*").alias("n"), F.sum("dim").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in salted_agg(
            df, "k", [("count", None, "n"), ("sum", "v", "s")], salt_from=["id"]
        ).collect()
    }
    assert plain == salted


def test_salt_is_deterministic_across_runs(spark):
    """Resume contract: re-deriving salts must give identical assignments."""
    df = _skewed(spark)
    a = {r.id: r._salt for r in with_salt(df, ["id"], 8).collect()}
    b = {r.id: r._salt for r in with_salt(df, ["id"], 8).collect()}
    assert a == b
    assert set(a.values()) == set(range(8))  # all salt buckets used
