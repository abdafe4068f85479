"""Crafted-sequence pins for the Markov transition-matrix core
(registry._transition_matrix) — the multi-destination discrimination the
synthetic corpus's cyclic tool pattern cannot exercise: row-stochastic
probabilities over several destinations, empty-tool turns transparently
skipped (transitions bridge them), and per-conversation isolation (no
transition across conversation boundaries)."""

from __future__ import annotations

from prove_spark.plans.registry import _transition_matrix


def _m(spark, rows):
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    got = _transition_matrix(tr).collect()
    return {(r.tool, r.next_tool): (r.n_transitions, r.prob) for r in got}


def test_row_stochastic_multi_destination(spark):
    rows = [
        ("c1", 0, "a"), ("c1", 1, "b"),
        ("c1", 2, "a"), ("c1", 3, "b"),
        ("c1", 4, "a"), ("c1", 5, "c"),
        ("c1", 6, "a"),
    ]
    m = _m(spark, rows)
    assert m[("a", "b")] == (2, 2 / 3)
    assert m[("a", "c")] == (1, 1 / 3)
    assert m[("b", "a")] == (2, 1.0)
    assert m[("c", "a")] == (1, 1.0)


def test_empty_tool_turns_are_bridged(spark):
    # '' turns are not states: a -> '' -> b counts as a -> b
    rows = [("c1", 0, "a"), ("c1", 1, ""), ("c1", 2, "b")]
    m = _m(spark, rows)
    assert m == {("a", "b"): (1, 1.0)}


def test_no_transition_across_conversations(spark):
    rows = [("c1", 0, "a"), ("c2", 0, "b"), ("c2", 1, "c")]
    m = _m(spark, rows)
    assert m == {("b", "c"): (1, 1.0)}
