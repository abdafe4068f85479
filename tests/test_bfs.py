"""Multi-source BFS hop distance (registry._bfs_distance / kg_bfs_distance):
crafted graphs with known distance structure checked against an independent
pure-python BFS, the deterministic seed-selection contract, the
unreached-nodes-absent contract, and the fixpoint pin that justifies the
fixed round count (the DuckDB oracle lane in test_entry_queries.py
separately pins the unrolled-CTE equality)."""

from __future__ import annotations

import collections
import itertools

from prove_spark.plans.registry import _bfs_distance


def _exact_bfs(edges: set[tuple[str, str]], n_seeds: int) -> dict[str, int]:
    """Independent ground truth: pick the n_seeds highest-degree nodes
    (ties → min id), then plain queue BFS from the seed set."""
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = sorted(adj, key=lambda v: (-len(adj[v]), v))[:n_seeds]
    dist = {s: 0 for s in seeds}
    queue = collections.deque(seeds)
    while queue:
        v = queue.popleft()
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                queue.append(u)
    return dist


def _run(spark, edges: set[tuple[str, str]], iters: int = 8, n_seeds: int = 3):
    und = spark.createDataFrame(sorted(edges), "a string, b string")
    caches: list = []
    rows = _bfs_distance(und, iters, n_seeds, cache_registry=caches).collect()
    for df in caches:
        try:
            df.unpersist()
        except Exception:
            pass
    return {r.entity: r.hop for r in rows}


def _norm(edges) -> set[tuple[str, str]]:
    return {(min(a, b), max(a, b)) for a, b in edges if a != b}


def test_path_graph_hops(spark):
    """A path p0—p1—…—p7: interior nodes have degree 2, endpoints 1, so the
    3 seeds are the (degree 2, min id) nodes p1, p2, p3 — distances fan out
    from that prefix and the far endpoint sits 4 hops out."""
    edges = _norm([(f"p{i}", f"p{i + 1}") for i in range(7)])
    got = _run(spark, edges)
    assert got == _exact_bfs(edges, 3)
    assert got["p7"] == 4 and got["p0"] == 1
    assert sorted(v for v, h in got.items() if h == 0) == ["p1", "p2", "p3"]


def test_unreached_component_absent(spark):
    """Two components: a 5-clique plus tail (holds every seed) and a far
    triangle — triangle nodes must be ABSENT, not hop-0/NULL."""
    clique = _norm(itertools.combinations(["c0", "c1", "c2", "c3", "c4"], 2))
    tail = {("c4", "t1"), ("t1", "t2")}
    island = _norm([("x1", "x2"), ("x2", "x3"), ("x1", "x3")])
    edges = clique | tail | island
    got = _run(spark, edges)
    assert got == _exact_bfs(edges, 3)
    assert not {"x1", "x2", "x3"} & set(got)
    assert got["t2"] == 2  # via c4 → t1 → t2


def test_seed_tie_break_is_min_id(spark):
    """A 6-node cycle is degree-regular — the seed set must be exactly the
    3 smallest ids (the deterministic tie-break both engines share)."""
    edges = _norm(
        [(f"v{i}", f"v{(i + 1) % 6}") for i in range(6)]
    )
    got = _run(spark, edges)
    assert got == _exact_bfs(edges, 3)
    assert sorted(v for v, h in got.items() if h == 0) == ["v0", "v1", "v2"]


def test_star_single_seed(spark):
    """n_seeds=1 on a star: hub is the unique top-degree seed; every leaf
    lands at hop 1."""
    edges = _norm([("hub", f"leaf{i}") for i in range(5)])
    got = _run(spark, edges, n_seeds=1)
    assert got == _exact_bfs(edges, 1)
    assert got["hub"] == 0
    assert all(got[f"leaf{i}"] == 1 for i in range(5))


def test_fixpoint_reached_on_testdata(spark):
    """BFS_ITERS covers the testdata graph with slack: one more round adds
    nothing (once a frontier is empty every later round is a no-op)."""
    from prove_spark.plans.kg_oracle import BFS_ITERS, BFS_SEEDS
    from prove_spark.plans.registry import _kg_build, _kg_undirected_edges

    caches: list = []
    und = (
        _kg_undirected_edges(_kg_build(spark, "/root/testdata/sf0.001"))
        .persist()
    )
    caches.append(und)
    und.count()
    at = {
        (r.entity, r.hop)
        for r in _bfs_distance(
            und, BFS_ITERS, BFS_SEEDS, cache_registry=caches
        ).collect()
    }
    plus = {
        (r.entity, r.hop)
        for r in _bfs_distance(
            und, BFS_ITERS + 1, BFS_SEEDS, cache_registry=caches
        ).collect()
    }
    for df in caches:
        try:
            df.unpersist()
        except Exception:
            pass
    assert at == plus
    assert len(at) > 0
    assert sum(1 for _v, h in at if h == 0) == BFS_SEEDS
