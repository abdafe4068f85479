"""Session-scoped cache for static dimension DataFrames.

The alias dictionary, predicate table, and canonical-entity map are literal
broadcast dimensions (reference: pickle entity cache utils/wikidata_utils.py:
21-63 and in-memory label dicts refs_html_collection.py:197-202). Building
them costs a driver-side createDataFrame (pandas→Arrow→JVM + analysis) every
time a pipeline plan is constructed — pure serial time that repeat runs and
multi-query sessions should not pay twice. Keyed by applicationId so a fresh
SparkSession (new JVM) rebuilds them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}


def session_dim(
    spark: SparkSession, key: str, builder: Callable[[SparkSession], DataFrame]
) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    cache_key = (app_id, key)
    df = _CACHE.get(cache_key)
    if df is None:
        # purge entries from other (stopped) sessions so the cache stays
        # bounded across session restarts within one process
        for k in [k for k in _CACHE if k[0] != app_id]:
            del _CACHE[k]
        df = builder(spark)
        _CACHE[cache_key] = df
    return df
