"""Golden equivalence: Spark pipeline vs pandas oracle (SURVEY.md §5 item 1).

The north-star gate is P/R ≥ 0.95 on the SUPPORTS (subj,pred,obj) set; by
construction we assert exact row-level equality, which is strictly stronger.
"""

from __future__ import annotations

import pandas as pd

from prove_spark.oracle import precision_recall
from prove_spark.pipeline.run import build_triples, entity_rollup


def _spark_triples(spark, spark_transcripts) -> pd.DataFrame:
    return build_triples(spark, spark_transcripts).toPandas()


def test_golden_exact_match(spark, spark_transcripts, golden_triples):
    got = _spark_triples(spark, spark_transcripts)
    assert len(got) == len(golden_triples)
    a = got.sort_values("claim_id").reset_index(drop=True)[
        golden_triples.columns.tolist()
    ]
    merged = a.merge(
        golden_triples, on="claim_id", suffixes=("_s", "_o"), how="outer", indicator=True
    )
    assert (merged["_merge"] == "both").all()
    for col in ["subj", "pred", "obj", "conv_id", "turn_idx", "verdict", "malon"]:
        assert (merged[f"{col}_s"] == merged[f"{col}_o"]).all(), col
    # scores are dyadic-rational sums → must be bit-exact
    assert (merged["score_s"] == merged["score_o"]).all()


def test_precision_recall_gate(spark, spark_transcripts, golden_triples):
    got = _spark_triples(spark, spark_transcripts)
    p, r = precision_recall(got, golden_triples)
    assert p >= 0.95 and r >= 0.95
    assert p == 1.0 and r == 1.0


def test_verdict_mix_is_nontrivial(golden_triples):
    counts = golden_triples.verdict.value_counts()
    assert set(counts.index) == {"SUPPORTS", "REFUTES", "NOT ENOUGH INFO"}
    assert (counts > 20).all()


def test_entity_rollup_prove_score(spark, spark_transcripts, golden_triples):
    got = entity_rollup(build_triples(spark, spark_transcripts)).toPandas()
    g = golden_triples.groupby("subj").verdict.value_counts().unstack(fill_value=0)
    for _, row in got.iterrows():
        assert row.n_supports == g.loc[row.subj].get("SUPPORTS", 0)
        assert row.n_refutes == g.loc[row.subj].get("REFUTES", 0)
        assert row.n_nei == g.loc[row.subj].get("NOT ENOUGH INFO", 0)
        total = row.n_supports + row.n_refutes + row.n_nei
        assert abs(row.prove_score - (row.n_supports - row.n_refutes) / total) < 1e-12


def test_entities_table(spark, spark_transcripts, golden_triples):
    """build_entities: canonical-only ids, stats consistent with the golden
    triple set, every canonical id self-canonical."""
    from prove_spark.oracle import canonical_map
    from prove_spark.pipeline.run import build_entities

    triples = build_triples(spark, spark_transcripts)
    ents = build_entities(spark, triples).toPandas().set_index("canonical_qid")
    canon = canonical_map()
    # every canonical_qid is a root of the union-find
    assert all(canon[q] == q for q in ents.index)
    # subject-claim counts agree with the golden triples
    g = golden_triples.groupby("subj").size()
    for q, row in ents.iterrows():
        assert row.n_subj_claims == g.get(q, 0)
    # members fold back to their root
    for q, row in ents.iterrows():
        assert all(canon[m] == q for m in row.member_qids)
