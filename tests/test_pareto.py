"""Crafted-fixture pins for the distributed 2-D skyline (pareto_2d): strict
dominance, equal-price / equal-size ties, exact-duplicate pairs, and the
degenerate one-distinct-value bucket range — plus a brute-force cross-check
on a deterministic pseudo-random cloud so the staircase formulation is
pinned against the quadratic definition it replaces (the DuckDB oracle lane
covers the real tables; this covers the corners the synthetic tables may
never hit)."""

from __future__ import annotations

from prove_spark.plans.advanced import pareto_2d


def _frontier(spark, rows):
    df = spark.createDataFrame(rows, "id long, x double, y int")
    got = pareto_2d(df, "x", "y").collect()
    return sorted((r.id, r.x, r.y) for r in got)


def _brute(rows):
    out = []
    for i, xi, yi in rows:
        dominated = any(
            (xu <= xi and yu >= yi and (xu < xi or yu > yi))
            for _, xu, yu in rows
        )
        if not dominated:
            out.append((i, xi, yi))
    return sorted(out)


def test_strict_dominance_chain(spark):
    # staircase: (1.0, 5) dominates (2.0, 5) [same y, worse x] and
    # (1.5, 4); (3.0, 9) survives on y
    rows = [(1, 1.0, 5), (2, 2.0, 5), (3, 1.5, 4), (4, 3.0, 9)]
    assert _frontier(spark, rows) == [(1, 1.0, 5), (4, 3.0, 9)]


def test_equal_pair_ties_all_kept(spark):
    # exact (x, y) duplicates are mutually non-dominating: both kept
    rows = [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)]
    assert _frontier(spark, rows) == [(1, 1.0, 5), (2, 1.0, 5)]


def test_same_price_bigger_size_dominates(spark):
    # equal x, strictly larger y dominates
    rows = [(1, 1.0, 5), (2, 1.0, 7)]
    assert _frontier(spark, rows) == [(2, 1.0, 7)]


def test_single_distinct_value_degenerate_range(spark):
    # lo == hi would make width_bucket ill-defined; the guard routes all
    # rows to bucket 1 and the skyline is the max-y tie set
    rows = [(1, 2.0, 3), (2, 2.0, 9), (3, 2.0, 9)]
    assert _frontier(spark, rows) == [(2, 2.0, 9), (3, 2.0, 9)]


def test_matches_bruteforce_on_hash_cloud(spark):
    # deterministic pseudo-random cloud (integer hash mix, no RNG state):
    # enough points to cross several width_bucket ranges and exercise the
    # cross-bucket carry against the in-bucket prefix max
    rows = [
        (
            i,
            float((i * 2654435761) % 1000) / 10.0,
            ((i * 40503) ^ (i >> 3)) % 97,
        )
        for i in range(400)
    ]
    assert _frontier(spark, rows) == _brute(rows)
