"""Connected-components canonicalization vs union-find oracle."""

from __future__ import annotations

from prove_spark.oracle import canonical_map
from prove_spark.pipeline.canonicalize import canonical_map_df


def test_cc_matches_union_find(spark):
    got = {
        r.qid: r.canonical_qid for r in canonical_map_df(spark).collect()
    }
    want = canonical_map()
    assert got == want


def test_cc_folds_duplicates_and_chain(spark):
    got = {r.qid: r.canonical_qid for r in canonical_map_df(spark).collect()}
    assert got["Q205"] == "Q5"  # label-equality edge
    assert got["Q209"] == "Q9"
    assert got["Q309"] == "Q9"  # 3-chain via seed edge Q209-Q309
    assert got["Q1"] == "Q1"  # singletons untouched
