"""Pins for plans/disambig.py:alias_mentions_anchored beyond the generic
oracle lane: the word-boundary contract on crafted edge docs, the
anchor-prefilter superset property the verification step relies on, and the
plan shape (the whole point is eliminating the dictionary crossJoin)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from prove_spark.dictionaries import ALIASES
from prove_spark.plans.disambig import (
    ALIAS_ANCHORED_SQL,
    alias_mentions_anchored,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    alias, _qid = ALIASES[0]  # a real dictionary surface form
    first = alias.split(" ")[0]
    docs = pd.DataFrame(
        [
            [1, f"met {alias} today", "en", "s", 1],        # interior match
            [2, alias, "en", "s", 1],                        # whole text
            [3, f"{alias} leads", "en", "s", 1],             # at start
            [4, f"about {alias}", "en", "s", 1],             # at end
            [5, f"x{alias} nope", "en", "s", 1],             # left-glued: no
            [6, f"met {alias}x here", "en", "s", 1],         # right-glued: no
            [7, f"just {first} alone", "en", "s", 1],        # anchor only: no
            [8, "nothing relevant", "en", "s", 1],
        ],
        columns=DOC_COLS,
    )
    d = tmp_path_factory.mktemp("alias_sf")
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    return str(d), alias


def test_word_boundary_contract_on_crafted_docs(spark, crafted_dir):
    d, alias = crafted_dir
    got = {r.alias: r.n_docs for r in alias_mentions_anchored(spark, d).collect()}
    # multi-word aliases sharing the anchor word may also legitimately match
    # nothing here; the pinned alias must count docs 1-4 only
    assert got.get(alias) == 4


def test_matches_duckdb_oracle_on_crafted_docs(spark, crafted_dir):
    d, _ = crafted_dir
    got = (
        alias_mentions_anchored(spark, d)
        .toPandas()
        .sort_values("alias")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(ALIAS_ANCHORED_SQL)
        .df()
        .sort_values("alias")
        .reset_index(drop=True)
    )
    assert list(got.alias) == list(want.alias)
    assert list(got.n_docs) == list(want.n_docs)


def test_anchor_prefilter_is_superset_of_matches():
    # the verification step only sees (doc, alias) pairs whose anchor token
    # is present; a word-boundary phrase match must imply that, or matches
    # would be silently dropped
    texts = [
        "claude shannon wrote",
        "x ylanguage models y",
        " doubled  spaces  here ",
        "",
        "punct, glued.words here",
    ] + [f"met {a} today" for a, _ in ALIASES]
    for text in texts:
        tokens = set(text.split(" "))
        for alias, _ in ALIASES:
            if f" {alias} " in f" {text} ":
                assert alias.split(" ")[0] in tokens, (alias, text)


def test_plan_has_no_crossjoin(spark, crafted_dir):
    d, _ = crafted_dir
    plan = (
        alias_mentions_anchored(spark, d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # anchor -> alias dim join
