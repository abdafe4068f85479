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
