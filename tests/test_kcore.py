"""Coreness via h-index iteration (registry._coreness / kg_coreness):
crafted graphs with known k-core structure, a seeded random graph checked
against an independent pure-python peeling implementation, and the
fixpoint pin that justifies the fixed round count (the DuckDB oracle lane
in test_entry_queries.py separately pins the unrolled-CTE equality)."""

from __future__ import annotations

import collections
import itertools
import random

import pytest

from prove_spark.plans.registry import _coreness


def _exact_coreness(edges: set[tuple[str, str]]) -> dict[str, int]:
    """Independent ground truth: classic minimum-degree peeling."""
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    remaining = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    core: dict[str, int] = {}
    k = 0
    while alive:
        k += 1
        changed = True
        while changed:
            changed = False
            for v in list(alive):
                if remaining[v] < k:
                    core[v] = k - 1
                    alive.discard(v)
                    for u in adj[v]:
                        if u in alive:
                            remaining[u] -= 1
                    changed = True
    return core


def _run(spark, edges: set[tuple[str, str]], iters: int = 16):
    und = spark.createDataFrame(sorted(edges), "a string, b string")
    caches: list = []
    rows = _coreness(und, iters, cache_registry=caches).collect()
    for df in caches:
        try:
            df.unpersist()
        except Exception:
            pass
    return {r.entity: (r.degree, r.coreness) for r in rows}


def _norm(edges) -> set[tuple[str, str]]:
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def test_clique_with_tail(spark):
    clique = _norm(itertools.combinations(["c0", "c1", "c2", "c3", "c4"], 2))
    tail = {("c0", "t1"), ("t1", "t2"), ("t2", "t3")}
    got = _run(spark, clique | tail)
    for v in ("c0", "c1", "c2", "c3", "c4"):
        assert got[v][1] == 4
    for v in ("t1", "t2", "t3"):
        assert got[v][1] == 1
    assert got["c0"][0] == 5  # degree includes the tail edge


def test_bridged_triangles_and_star(spark):
    tris = _norm([("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
                  ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
                  ("a1", "b1")])
    star = _norm([("hub", f"leaf{i}") for i in range(6)])
    got = _run(spark, tris | star)
    assert all(got[v][1] == 2 for v in ("a1", "a2", "a3", "b1", "b2", "b3"))
    assert got["hub"][1] == 1 and got["hub"][0] == 6
    assert all(got[f"leaf{i}"][1] == 1 for i in range(6))


def test_random_graph_matches_peeling(spark):
    rng = random.Random(20260818)
    nodes = [f"n{i:02d}" for i in range(24)]
    edges = {
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.18
    }
    # plant a dense pocket so coreness values actually spread
    edges |= _norm(itertools.combinations(nodes[:7], 2))
    truth = _exact_coreness(edges)
    got = _run(spark, edges, iters=24)
    assert {v: c for v, (_d, c) in got.items()} == truth
    assert len(set(truth.values())) >= 3, "fixture regressed: coreness uniform"


def test_fixpoint_reached_on_testdata(spark):
    """KCORE_ITERS covers the testdata graph with slack: one more round
    changes nothing (the h-operator is monotone non-increasing, so reaching
    the fixpoint at ITERS proves every later round is a no-op)."""
    from prove_spark.plans.kg_oracle import KCORE_ITERS
    from prove_spark.plans.registry import _kg_build, _kg_undirected_edges

    caches: list = []
    und = (
        _kg_undirected_edges(_kg_build(spark, "/root/testdata/sf0.001"))
        .persist()
    )
    caches.append(und)
    und.count()
    at = {
        (r.entity, r.coreness)
        for r in _coreness(und, KCORE_ITERS, cache_registry=caches).collect()
    }
    plus = {
        (r.entity, r.coreness)
        for r in _coreness(und, KCORE_ITERS + 1, cache_registry=caches).collect()
    }
    for df in caches:
        try:
            df.unpersist()
        except Exception:
            pass
    assert at == plus
    assert len(at) > 0
