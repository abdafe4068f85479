"""Semantic pins for the label-propagation core beyond the generic oracle
lane (which runs the full KG query vs the unrolled DuckDB CTE chain at
sf0.001, where the dense KG collapses to ONE community — correct but
structurally trivial): a crafted two-clique-plus-bridge graph with an
isolated node, checked exactly against an independent pure-Python
simulator of the same deterministic synchronous rule."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest

from prove_spark.plans.registry import _label_propagation


def _simulate(edges: list[tuple[str, str]], nodes: list[str], iters: int):
    nbrs: dict[str, list[str]] = {v: [] for v in nodes}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lbl = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            if not nbrs[v]:
                new[v] = lbl[v]
                continue
            counts = Counter(lbl[u] for u in nbrs[v])
            best = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best)
        lbl = new
    return lbl


CLIQUE_A = ["a1", "a2", "a3", "a4"]
CLIQUE_B = ["b1", "b2", "b3", "b4"]
EDGES = (
    [(x, y) for i, x in enumerate(CLIQUE_A) for y in CLIQUE_A[i + 1:]]
    + [(x, y) for i, x in enumerate(CLIQUE_B) for y in CLIQUE_B[i + 1:]]
    + [("a1", "b1")]  # bridge
)
NODES = CLIQUE_A + CLIQUE_B + ["z"]  # z isolated


@pytest.fixture(scope="module")
def lpa_result(spark):
    und = spark.createDataFrame(
        pd.DataFrame(
            [(min(a, b), max(a, b)) for a, b in EDGES], columns=["a", "b"]
        )
    )
    nodes = spark.createDataFrame(pd.DataFrame({"entity": NODES}))
    caches: list = []  # local registry: no leak into the module-global one
    out = {
        r.entity: (r.community, r.community_size)
        for r in _label_propagation(nodes, und, 4, cache_registry=caches).collect()
    }
    for df in caches:
        df.unpersist()
    return out


def test_matches_independent_simulator(lpa_result):
    want = _simulate(EDGES, NODES, 4)
    sizes = Counter(want.values())
    for v in NODES:
        assert lpa_result[v] == (want[v], sizes[want[v]]), v


def test_community_structure_is_nontrivial(lpa_result):
    comm = {v: lpa_result[v][0] for v in NODES}
    # each clique agrees internally, the cliques differ, the isolate stands
    # alone with its own label and size 1
    assert len({comm[v] for v in CLIQUE_A}) == 1
    assert len({comm[v] for v in CLIQUE_B}) == 1
    assert comm["a1"] != comm["b1"]
    assert comm["z"] == "z" and lpa_result["z"][1] == 1
