"""Physical-plan regression guards for the KG pipeline's scale properties.

These pin the properties that made the scaling gate pass — they are about
the PLAN, not the output, so output-equality tests cannot catch their
regressions:
  * exactly two fact-side hash exchanges (base sentences for the slide
    window; the claim-scale repartition into the verbalized cache) — a
    third one means some stage stopped reusing hash(conv_id);
  * the top-k window is preceded by a partial WindowGroupLimit, so the
    evidence exchange carries ≤ k rows per claim per map partition;
  * no cartesian products anywhere;
  * no per-row Python in the default (jvm) engine's plan.
"""

from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def kg_plan(spark):
    from prove_spark.datagen import transcripts_df
    from prove_spark.pipeline.run import build_triples

    # small broadcast threshold = the 100 TB regime (nothing fact-sized can
    # broadcast), eager_cache off for a fully lazy, inspectable plan.
    # clearCache: plan assertions need a cache-free session — leaked
    # deferred-unpersist caches from other modules substitute
    # InMemoryRelation into structurally-matching subtrees (see the
    # measured case in tests/test_plans.py::_cache_free_session)
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(1024 * 1024))
    try:
        tr = transcripts_df(spark, "/root/testdata/sf0.001")
        df = build_triples(spark, tr, eager_cache=False)
        yield df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def _fact_exchanges(plan: str) -> list[str]:
    # hash exchanges excluding broadcast ones and the (dimension-sized)
    # alias-resolution aggregations
    out = []
    for line in plan.splitlines():
        m = re.search(r"Exchange hashpartitioning\(([^)]*)\)", line)
        if m and "alias" not in m.group(1):
            out.append(m.group(1))
    return out


def test_exchange_budget(kg_plan):
    ex = _fact_exchanges(kg_plan)
    keys = {tuple(k.split(", ")[:-1]) for k in ex}  # drop partition count
    # Allowed: the ONE sentence-scale exchange (evidence pool, conv_id for
    # the slide window — its output partitioning is reused by the pair
    # join, top-k window, verdict agg and rejoin) plus claim-scale conv_id
    # exchanges (the repartition into the verbalized cache, and the
    # re-exchanges above InMemoryTableScan, whose partitioning AQE hides).
    assert len(keys) <= 3, f"unexpected fact-side exchanges: {sorted(keys)}"
    # The regression this guards: the evidence/pair side being re-shuffled
    # on (conv_id, claim_id) after the window — 583 MB of extra exchange at
    # rep=64 when the pool was a partitioning-destroying union. Every
    # exchange must be conv_id-only.
    for k in keys:
        assert not any("claim_id" in c for c in k), (
            f"pairs re-shuffled on a claim-level key: {k}"
        )


def test_window_has_group_limit(kg_plan):
    # rank<=k must plan as WindowGroupLimit (rows cut during the window
    # sort, never materializing all pairs through row_number). When an
    # exchange feeds the window Spark splits this into partial+final; in
    # the current co-partitioned plan there is no such exchange, so a
    # single instance is the optimal shape.
    assert kg_plan.count("WindowGroupLimit") >= 1


def test_no_cartesian_or_python_in_jvm_plan(kg_plan):
    assert "CartesianProduct" not in kg_plan
    assert "BatchEvalPython" not in kg_plan  # per-row Python UDF operator


def test_verdict_agg_needs_no_resort(kg_plan):
    """The verdict SortAggregate must consume the window's (conv_id,
    claim_id) order directly — no Sort node keyed on the agg's group
    prefix between the rejoin and the aggregate."""
    # the only full-width sorts allowed are the window's own and the SMJ
    # key sorts; a 9-column sort (the old grouping) would show subj_qid in
    # its sort keys
    for line in kg_plan.splitlines():
        if re.search(r"\+- Sort \[.*subj_qid", line):
            pytest.fail(f"evidence re-sort reappeared: {line.strip()[:120]}")
