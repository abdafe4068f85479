"""Crafted-partition pins for the modularity core
(registry._modularity_contributions) — the discrimination the dense
synthetic entity graph cannot exercise (LPA collapses it to one community,
where q = 1 − 1 = 0 exactly): a good two-community split scores positive,
the same graph under a deliberately bad split scores lower, and the
single-community identity q = 0 holds by construction."""

from __future__ import annotations

import math

from prove_spark.plans.registry import _modularity_contributions


# two triangles bridged by one edge: the textbook two-community graph
_EDGES = [
    ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
    ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
    ("a3", "b1"),
]
_NODES = ["a1", "a2", "a3", "b1", "b2", "b3"]


def _q(spark, assign):
    comm = spark.createDataFrame(
        [(v, assign[v]) for v in _NODES], "entity string, community string"
    )
    und = spark.createDataFrame(_EDGES, "a string, b string")
    rows = _modularity_contributions(comm, und).collect()
    return {r.community: r for r in rows}


def test_good_split_scores_positive(spark):
    good = _q(spark, {v: v[0] for v in _NODES})  # A-triangle vs B-triangle
    # m=7; community A: in=3, deg_sum=7 → q = 3/7 - (7/14)^2 = 3/7 - 1/4
    expected = 3 / 7 - (7 / 14) ** 2
    assert math.isclose(good["a"].q_contrib, expected, rel_tol=1e-12)
    assert good["a"].in_edges == 3 and good["a"].deg_sum == 7
    assert good["a"].q_contrib > 0 and good["b"].q_contrib > 0


def test_bad_split_scores_lower_than_good(spark):
    good = _q(spark, {v: v[0] for v in _NODES})
    # split that cuts both triangles in half
    bad = _q(
        spark,
        {"a1": "x", "b1": "x", "a2": "y", "a3": "y", "b2": "y", "b3": "y"},
    )
    q_good = sum(r.q_contrib for r in good.values())
    q_bad = sum(r.q_contrib for r in bad.values())
    assert q_good > q_bad


def test_single_community_is_exactly_zero(spark):
    one = _q(spark, {v: "all" for v in _NODES})
    assert one["all"].q_contrib == 0.0
    assert one["all"].in_edges == 7 and one["all"].deg_sum == 14
