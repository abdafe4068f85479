"""Connected-components canonicalization vs union-find oracle."""

from __future__ import annotations

from prove_spark.oracle import canonical_map
from prove_spark.pipeline.canonicalize import canonical_map_df


def test_distributed_cc_matches_union_find(spark):
    """The iterative-join CC (scale path for non-collectable edge sets) must
    agree with the union-find oracle."""
    got = {
        r.qid: r.canonical_qid
        for r in canonical_map_df(spark, distributed=True).collect()
    }
    want = canonical_map()
    assert got == want


def test_local_union_find_matches_oracle(spark):
    got = {r.qid: r.canonical_qid for r in canonical_map_df(spark).collect()}
    want = canonical_map()
    assert got == want


def test_cc_folds_duplicates_and_chain(spark):
    got = {r.qid: r.canonical_qid for r in canonical_map_df(spark).collect()}
    assert got["Q205"] == "Q5"  # label-equality edge
    assert got["Q209"] == "Q9"
    assert got["Q309"] == "Q9"  # 3-chain via seed edge Q209-Q309
    assert got["Q1"] == "Q1"  # singletons untouched


def test_cc_long_chain_converges_in_log_rounds(spark):
    """Large-star/small-star is O(log d): a 64-node path graph must converge
    well within max_cc_iterations=20 (min-label propagation would need 63
    rounds and silently return a half-merged component)."""
    import pandas as pd

    from prove_spark.pipeline.canonicalize import connected_components

    n = 64
    qids = [f"Q{i}" for i in range(1, n + 1)]
    verts = spark.createDataFrame(pd.DataFrame({"qid": qids}))
    edges = spark.createDataFrame(
        pd.DataFrame(
            [(f"Q{i}", f"Q{i + 1}") for i in range(1, n)], columns=["src", "dst"]
        )
    )
    got = {r.qid: r.canonical_qid for r in connected_components(verts, edges).collect()}
    assert got == {q: "Q1" for q in qids}


def test_cc_star_forest_mixed_components(spark):
    """Multiple components of different shapes resolve to their min QIDs."""
    import pandas as pd

    from prove_spark.pipeline.canonicalize import connected_components

    verts = spark.createDataFrame(
        pd.DataFrame({"qid": [f"Q{i}" for i in [1, 2, 3, 10, 11, 12, 99]]})
    )
    edges = spark.createDataFrame(
        pd.DataFrame(
            [("Q2", "Q3"), ("Q1", "Q3"), ("Q12", "Q10"), ("Q11", "Q12")],
            columns=["src", "dst"],
        )
    )
    got = {r.qid: r.canonical_qid for r in connected_components(verts, edges).collect()}
    assert got == {
        "Q1": "Q1", "Q2": "Q1", "Q3": "Q1",
        "Q10": "Q10", "Q11": "Q10", "Q12": "Q10",
        "Q99": "Q99",
    }


def test_connected_components_long_chain_and_cycle(spark):
    """The long-keyed CC core (r4: shared by entity canonicalization and
    LSH near-dup cluster resolution): chain + cycle + singleton edge all
    resolve to the component minimum."""
    import pandas as pd

    from prove_spark.pipeline.canonicalize import connected_components_long

    edges = pd.DataFrame(
        # chain 10-20-30-40, cycle 5-6-7-5, pair 100-99
        [(10, 20), (20, 30), (30, 40), (5, 6), (6, 7), (7, 5), (100, 99)],
        columns=["u", "v"],
    )
    got = {
        r.u: r.root
        for r in connected_components_long(spark.createDataFrame(edges)).collect()
    }
    assert got == {
        10: 10, 20: 10, 30: 10, 40: 10,
        5: 5, 6: 5, 7: 5,
        99: 99, 100: 99,
    }
