"""Shared pytest fixtures: one SparkSession per test session (startup ~15s)."""

from __future__ import annotations

import duckdb
import pytest

from prove_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("prove-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_pdf():
    return duckdb.sql(
        f"select doc_id, text from '{SF_DIR}/documents.parquet' order by doc_id"
    ).df()


@pytest.fixture(scope="session")
def transcripts_pdf(docs_pdf):
    from prove_spark.datagen import build_transcripts_pdf

    return build_transcripts_pdf(docs_pdf)


@pytest.fixture(scope="session")
def golden_triples(transcripts_pdf):
    from prove_spark.oracle import run_oracle

    return run_oracle(transcripts_pdf)


@pytest.fixture(scope="session")
def spark_transcripts(spark):
    from prove_spark.datagen import transcripts_df

    return transcripts_df(spark, SF_DIR)
