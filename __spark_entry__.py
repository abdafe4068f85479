"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG-construction pipeline at sf0.001.
queries()     — every implemented operator (SURVEY.md §2 + training-data ops).
oracle_sql()  — DuckDB-equivalent ANSI SQL for EVERY registered query,
                including the KG lane (plans/kg_oracle.py re-derives
                transcripts → triples inside DuckDB); the pytest golden
                suite (pandas oracle) additionally pins the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts (derived from sf0.001 documents) → verified
    canonical (subj, pred, obj) triples with verdicts and scores."""
    from prove_spark.plans.registry import kg_triples

    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from prove_spark.plans.registry import ALL_QUERIES

    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from prove_spark.plans.registry import ALL_QUERIES

    return {
        name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None
    }


def unregistered() -> frozenset[str]:
    """Queries implemented + unit-tested but intentionally left out of the
    50-row driver sweep (derivable from registered rows) — exposed so sweep
    reports can show the exclusions instead of them being silent."""
    from prove_spark.plans.registry import _UNREGISTERED

    return frozenset(_UNREGISTERED)
