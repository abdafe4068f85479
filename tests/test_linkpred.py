"""Common-neighbor link prediction (registry._link_prediction /
kg_link_prediction): crafted graphs with known common-neighbor structure
checked against an independent pure-python enumerator, the non-adjacency
contract, the hub-cap exclusion contract (capped CN is a lower bound), and
the exact Jaccard arithmetic (the DuckDB oracle lane in
test_entry_queries.py separately pins the SQL twin)."""

from __future__ import annotations

import collections
import itertools

from prove_spark.plans.registry import _link_prediction


def _exact(edges: set[tuple[str, str]], hub_cap: int, min_cn: int):
    """Independent ground truth: per non-adjacent pair, count common
    neighbors whose TRUE degree is <= hub_cap; Jaccard uses true degrees."""
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        cn = sum(1 for z in adj[a] & adj[b] if len(adj[z]) <= hub_cap)
        if cn >= min_cn:
            da, db = len(adj[a]), len(adj[b])
            out[(a, b)] = (cn, da, db, cn / (da + db - cn))
    return out


def _run(spark, edges: set[tuple[str, str]], hub_cap: int = 64, min_cn: int = 1):
    und = spark.createDataFrame(sorted(edges), "a string, b string")
    caches: list = []
    rows = _link_prediction(und, hub_cap, min_cn, cache_registry=caches).collect()
    for df in caches:
        try:
            df.unpersist()
        except Exception:
            pass
    return {
        (r.entity_a, r.entity_b): (
            r.common_neighbors,
            r.degree_a,
            r.degree_b,
            r.jaccard,
        )
        for r in rows
    }


def _norm(edges) -> set[tuple[str, str]]:
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def test_square_diagonals(spark):
    """4-cycle a-b-c-d-a: the two diagonals are the only non-adjacent pairs,
    each with cn=2 and Jaccard 2/(2+2-2) = 1.0; adjacent pairs never emit."""
    edges = _norm([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = _run(spark, edges)
    assert got == {
        ("a", "c"): (2, 2, 2, 1.0),
        ("b", "d"): (2, 2, 2, 1.0),
    }
    assert got == _exact(edges, 64, 1)


def test_min_cn_threshold(spark):
    """Path a-b-c has exactly one wedge (a, c) with cn=1: emitted at
    min_cn=1, filtered at min_cn=2."""
    edges = _norm([("a", "b"), ("b", "c")])
    assert _run(spark, edges, min_cn=1) == {("a", "c"): (1, 1, 1, 1.0)}
    assert _run(spark, edges, min_cn=2) == {}


def test_hub_cap_excludes_center(spark):
    """Star with 5 leaves: at cap >= 5 every leaf pair gets cn=1 through
    the hub; at cap 4 the hub is no longer a wedge center and the output is
    empty — the capped CN is a lower bound, exactly as documented."""
    edges = _norm([("hub", f"x{i}") for i in range(5)])
    full = _run(spark, edges, hub_cap=5, min_cn=1)
    assert len(full) == 10  # C(5,2) leaf pairs
    assert all(v == (1, 1, 1, 1.0) for v in full.values())
    assert _run(spark, edges, hub_cap=4, min_cn=1) == {}
    assert full == _exact(edges, 5, 1)


def test_seeded_random_graph_matches_bruteforce(spark):
    """Seeded pseudo-random graph (deterministic LCG edge choice, no RNG
    import) vs the independent enumerator, with a binding hub cap so the
    cap lane is live on an irregular graph too."""
    nodes = [f"n{i:02d}" for i in range(18)]
    edges = set()
    state = 7
    for a, b in itertools.combinations(nodes, 2):
        state = (state * 1103515245 + 12345) % (2**31)
        if state % 5 == 0:  # ~20% edge density
            edges.add((a, b))
    for cap, mc in ((64, 1), (4, 1), (5, 2)):
        assert _run(spark, edges, hub_cap=cap, min_cn=mc) == _exact(
            edges, cap, mc
        ), (cap, mc)
