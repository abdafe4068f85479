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


def test_redact_pii_on_crafted_pii(spark, tmp_path):
    """The synthetic corpus is PII-free (the sf-table oracle rows are
    identity maps), so the redaction behavior itself is pinned here on
    crafted emails/URLs/long numbers — including the ordering contract
    (emails before URLs before numbers) and DuckDB parity on the same
    fixture."""
    import duckdb

    from prove_spark.plans.compare import compare
    from prove_spark.plans.textops import REDACT_SQL, redact_pii

    pdf = pd.DataFrame(
        [
            [1, "mail bob.smith+x@corp-mail.io now", "en", "s1", 33],
            [2, "see https://a.io/p?q=1 and http://b.co/x", "en", "s1", 40],
            [3, "call 5551234567 or 12345678901234", "en", "s2", 33],
            [4, "mixed a@b.io https://c.de/y 9876543 end", "en", "s2", 40],
            [5, "clean text no pii at all", "en", "s3", 24],
        ],
        columns=DOC_COLS,
    )
    d = f"{tmp_path}/pii_sf"
    spark.createDataFrame(pdf, schema=DOC_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: r for r in redact_pii(spark, d).collect()}
    assert got[1].n_emails == 1 and got[1].text_redacted == "mail <EMAIL> now"
    assert got[2].n_urls == 2 and got[2].text_redacted == "see <URL> and <URL>"
    assert got[3].n_longnums == 2 and got[3].text_redacted == "call <NUM> or <NUM>"
    # ordering: the email host survives (not eaten by the URL rule), the
    # URL's digits survive (not eaten by the number rule)
    assert got[4].text_redacted == "mixed <EMAIL> <URL> <NUM> end"
    assert (got[5].n_emails, got[5].n_urls, got[5].n_longnums) == (0, 0, 0)
    # identity contract on clean text: redaction must not touch it
    assert got[5].text_redacted == "clean text no pii at all"

    con = duckdb.connect()
    # Spark wrote a directory; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    assert not compare(
        redact_pii(spark, d).toPandas(), con.execute(REDACT_SQL).df()
    )


def test_dup_span_fraction_ground_truth(spark, tmp_path):
    """Hand-computable span dedup: two docs sharing one exact 16-word block
    (and nothing else) each report exactly that block as duplicated; a
    short unique doc reports zero."""
    from prove_spark.plans.textops import dup_span_fraction

    block = " ".join(f"w{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_b = " ".join(f"b{i}" for i in range(16))
    pdf = pd.DataFrame(
        [
            [1, f"{block} {uniq_a}", "en", "s1", 0],
            [2, f"{block} {uniq_b}", "en", "s1", 0],
            [3, "totally unique tiny doc", "en", "s2", 0],
        ],
        columns=DOC_COLS,
    )
    d = f"{tmp_path}/span_sf"
    spark.createDataFrame(pdf, schema=DOC_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: r for r in dup_span_fraction(spark, d).collect()}
    assert (got[1].n_spans, got[1].n_dup_spans, got[1].dup_frac) == (2, 1, 0.5)
    assert (got[2].n_spans, got[2].n_dup_spans, got[2].dup_frac) == (2, 1, 0.5)
    assert (got[3].n_spans, got[3].n_dup_spans, got[3].dup_frac) == (1, 0, 0.0)


def test_bm25_hand_computed(spark, tmp_path):
    """BM25 on a 3-doc fixture checked against a pure-python mirror of the
    exact op tree (rational idf, k1=1.2, b=0.75); a doc containing no query
    term must be absent from the output."""
    from prove_spark.plans.textops import BM25_QUERY, bm25_rank

    texts = {
        1: "spark join spark scan table",          # 2x spark, 1x join
        2: "join vector join join scan",           # 3x join, 1x vector
        3: "table scan row batch window",          # no query term
        4: "spark",                                # dl=1 extreme
    }
    pdf = pd.DataFrame(
        [[i, t, "en", "s", len(t)] for i, t in sorted(texts.items())],
        columns=DOC_COLS,
    )
    d = f"{tmp_path}/bm25_sf"
    spark.createDataFrame(pdf, schema=DOC_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )
    # python mirror with the identical parenthesization
    words = {i: t.split(" ") for i, t in texts.items()}
    dl = {i: len(ws) for i, ws in words.items()}
    n_docs = len(texts)
    avgdl = sum(dl.values()) / n_docs
    tf = {
        (i, q): ws.count(q)
        for i, ws in words.items()
        for q in BM25_QUERY
        if q in ws
    }
    df = {q: sum(1 for (_i, qq) in tf if qq == q) for q in BM25_QUERY}
    expected = {}
    for (i, q), t in tf.items():
        idf = ((n_docs - df[q]) + 0.5) / (df[q] + 0.5)
        score = idf * ((t * 2.2) / (t + 1.2 * (0.25 + 0.75 * (dl[i] / avgdl))))
        expected[i] = expected.get(i, 0.0) + score
    got = {r.doc_id: r for r in bm25_rank(spark, d).collect()}
    assert set(got) == set(expected) == {1, 2, 4}
    for i, s in expected.items():
        assert got[i].bm25 == pytest.approx(s, abs=1e-9)
    assert got[1].n_terms_matched == 2 and got[1].n_occurrences == 3
    assert got[2].n_terms_matched == 2 and got[2].n_occurrences == 4
    assert got[4].n_terms_matched == 1 and got[4].n_occurrences == 1
