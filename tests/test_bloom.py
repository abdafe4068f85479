"""Pins for the bloom-filter semi-join pushdown (plans/advanced.py):
bloom_prefilter must pass a SUPERSET of true matches (no false negatives —
the correctness half) while actually shedding non-members (the pruning half,
deterministic because the bit positions come from the portable hash, not an
RNG), and the composed bloom_semi_join must equal the plain semi join
bit-for-bit. The oracle lane covers the real tables; this pins the
properties on crafted key sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from prove_spark.plans.advanced import bloom_prefilter


def _dfs(spark, probe_keys, build_keys):
    probe = spark.createDataFrame([(k,) for k in probe_keys], "pk long")
    build = spark.createDataFrame([(k,) for k in build_keys], "bk long")
    return probe, build


def test_no_false_negatives(spark):
    # every true member must survive the prefilter
    probe, build = _dfs(spark, range(0, 2000), range(0, 2000, 4))
    pre = set(
        r.pk for r in bloom_prefilter(probe, "pk", build, "bk").collect()
    )
    assert set(range(0, 2000, 4)) <= pre


def test_pruning_is_live(spark):
    # with 500 build keys in 8192 bits the fill ratio is ~12%, so most of
    # the 1500 non-members must be rejected (deterministic: fixed hash)
    probe, build = _dfs(spark, range(0, 2000), range(0, 2000, 4))
    n_pre = bloom_prefilter(probe, "pk", build, "bk").count()
    assert 500 <= n_pre < 800, n_pre


def test_composed_join_equals_plain_semi(spark):
    probe, build = _dfs(spark, range(0, 3000, 3), range(0, 3000, 7))
    pre = bloom_prefilter(probe, "pk", build, "bk")
    got = sorted(
        r.pk
        for r in pre.join(
            build, pre.pk == build.bk, "left_semi"
        ).collect()
    )
    want = sorted(k for k in range(0, 3000, 3) if k % 7 == 0)
    assert got == want


def test_empty_build_side_rejects_everything(spark):
    probe, build = _dfs(spark, range(100), [])
    assert bloom_prefilter(probe, "pk", build, "bk").count() == 0
