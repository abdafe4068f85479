"""Crafted-graph pins for the Bellman-Ford weighted-shortest-path core
(registry._wsp_distance) — the discrimination the dense synthetic entity
graph cannot exercise: a cheap multi-hop path beating an expensive direct
edge, multi-round convergence, unreachable nodes absent, and the integer
inverse-support cost mapping itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from prove_spark.plans.registry import _wsp_cost, _wsp_distance


def _edges(spark, rows):
    # (src, dst, w) directed; tests pass both directions explicitly
    return spark.createDataFrame(rows, "src string, dst string, w int")


def _dist(spark, rows, iters=8, n_seeds=1):
    caches: list = []
    got = _wsp_distance(_edges(spark, rows), iters, n_seeds, caches).collect()
    return {r.entity: r.dist for r in got}


def test_cheap_detour_beats_expensive_direct(spark):
    # seed = highest-degree vertex 'a' (degree 3); direct a->d costs 9,
    # the a->b->c->d detour costs 3
    rows = [
        ("a", "d", 9), ("d", "a", 9),
        ("a", "b", 1), ("b", "a", 1),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "d", 1), ("d", "c", 1),
        ("a", "x", 1), ("x", "a", 1),
    ]
    d = _dist(spark, rows)
    assert d == {"a": 0, "b": 1, "c": 2, "d": 3, "x": 1}


def test_unreachable_component_absent(spark):
    rows = [
        ("a", "b", 2), ("b", "a", 2), ("a", "c", 5), ("c", "a", 5),
        ("y", "z", 1), ("z", "y", 1),
    ]
    d = _dist(spark, rows)
    assert d == {"a": 0, "b": 2, "c": 5}


def test_needs_multiple_rounds_to_converge(spark):
    # a chain of length 5: round t can only reach t hops out
    chain = []
    names = ["a", "n1", "n2", "n3", "n4", "n5"]
    for u, v in zip(names, names[1:]):
        chain += [(u, v, 1), (v, u, 1)]
    # make 'a' the top-degree seed
    chain += [("a", "x", 7), ("x", "a", 7)]
    partial = _dist(spark, chain, iters=2)
    full = _dist(spark, chain, iters=8)
    assert "n5" not in partial and partial["n2"] == 2
    assert full["n5"] == 5 and full["x"] == 7


def test_inverse_support_cost_mapping(spark):
    df = spark.range(1).select(
        *[
            _wsp_cost(F.lit(c)).alias(f"c{c}")
            for c in (1, 2, 3, 10)
        ]
    ).collect()[0]
    assert (df.c1, df.c2, df.c3, df.c10) == (3, 2, 1, 1)
