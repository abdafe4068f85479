"""Degenerate-corpus probes: empty and single-document tables must flow
through the fan-out-heavy queries (shingle explode, LSH self-join, CC
iteration, sampling) and the KG pipeline without crashing — a 100 TB job
WILL see empty partitions, empty buckets after filters, and singleton
groups, and an operator that divides by a group size or assumes >=1 edge
dies there, not in the happy path."""

from __future__ import annotations

import pandas as pd
import pytest

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    spark.createDataFrame([], schema=DOC_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    return str(d)


@pytest.fixture(scope="module")
def single_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("single_sf")
    pdf = pd.DataFrame(
        [[7, "one tiny doc. it has two sentences.", "en", "src3", 36]],
        columns=DOC_COLS,
    )
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    return str(d)


DOC_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "lsh_candidate_pairs",
    "dedup_lsh_clusters",
    "simhash_fingerprints",
    "lang_id_heuristic",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "multimodal_bytes",
    # r4 hygiene lane (TEXTOPS_QUERIES covers sweep-capped entries too):
    "repetition_flags",
    "decontaminate_overlap",
    "corpus_filter_pipeline",
]


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_queries_survive_empty_corpus(spark, empty_dir, name):
    from prove_spark.plans.textops import TEXTOPS_QUERIES

    fn, _ = TEXTOPS_QUERIES[name]
    assert fn(spark, empty_dir).count() == 0


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_queries_survive_single_doc(spark, single_dir, name):
    from prove_spark.plans.textops import TEXTOPS_QUERIES

    fn, _ = TEXTOPS_QUERIES[name]
    fn(spark, single_dir).count()  # no pairs/clusters required, just no crash


def test_single_doc_pipeline_verdict_is_low_quality(spark, single_dir):
    # 7 words < PIPE_MIN_WORDS and not eval/near-dup/repetitive → the
    # when-chain must claim it at the quality gate, not fall through
    from prove_spark.plans.textops import corpus_filter_pipeline

    rows = corpus_filter_pipeline(spark, single_dir).collect()
    assert len(rows) == 1
    assert rows[0].drop_reason == "low_quality"
    assert rows[0].kept is False


def test_semdedup_survives_degenerate_embeddings(spark, tmp_path):
    from prove_spark.plans.mlops import semdedup_keep

    empty = f"{tmp_path}/e"
    spark.createDataFrame(
        [], schema="vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{empty}/embeddings.parquet")
    assert semdedup_keep(spark, empty).count() == 0

    single = f"{tmp_path}/s"
    spark.createDataFrame(
        [(3, [0.5, 0.25], 1)],
        schema="vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{single}/embeddings.parquet")
    rows = semdedup_keep(spark, single).collect()
    assert len(rows) == 1
    assert (rows[0].vec_id, rows[0].n_smaller_neardups, rows[0].keep) == (
        3,
        0,
        True,
    )


def test_dedup_clusters_single_doc_is_its_own_rep(spark, single_dir):
    from prove_spark.plans.registry import ALL_QUERIES

    fn, _ = ALL_QUERIES["dedup_lsh_clusters"]
    rows = fn(spark, single_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id, r.cluster_rep, r.cluster_size, r.is_rep) == (7, 7, 1, True)


def test_stratified_sample_empty(spark, empty_dir):
    from prove_spark.plans.textops import stratified_sample

    assert stratified_sample(spark, empty_dir).count() == 0


def test_kg_pipeline_survives_empty_corpus(spark, empty_dir):
    from prove_spark.datagen import transcripts_df
    from prove_spark.pipeline.run import build_triples

    assert build_triples(spark, transcripts_df(spark, empty_dir)).count() == 0


def test_connected_components_long_empty_edges(spark):
    from prove_spark.pipeline.canonicalize import connected_components_long

    empty = spark.createDataFrame([], schema="u long, v long")
    assert connected_components_long(empty).count() == 0


def test_stratified_sample_digitless_source_drops_identically(spark, tmp_path):
    """ANSI mode crash class: cast('' AS INT) throws in Spark 4 and DuckDB;
    both sides use try_cast so a digit-less source is silently dropped by
    NULL-comparison semantics — identically (engine/oracle parity pin)."""
    import duckdb

    from prove_spark.plans.textops import (
        STRATIFIED_SAMPLE_SQL,
        stratified_sample,
    )

    pdf = pd.DataFrame(
        [[i, "t", "en", s, 1] for i, s in enumerate(["web", "src3", "src7", ""])],
        columns=DOC_COLS,
    )
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/documents.parquet")
    got = sorted(r.doc_id for r in stratified_sample(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(con.execute(STRATIFIED_SAMPLE_SQL).df()["doc_id"].tolist())
    assert got == want
