"""DuckDB KG-lane oracles vs the Spark pipeline (the driver's own check,
run locally at sf0.001): rows + dtype classes + exact values must match for
the flagship and its rollup/entities derivatives."""

from __future__ import annotations

import pytest

from prove_spark.plans.compare import check_query
from prove_spark.plans.registry import ALL_QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["kg_triples", "kg_entity_rollup", "kg_entities"]
)
def test_kg_oracle_matches_spark(spark, name):
    fn, sql = ALL_QUERIES[name]
    assert sql is not None, "KG lane must be SQL-oracled"
    assert check_query(spark, SF, fn, sql) == []


def test_registry_within_sweep_cap():
    """The driver records at most 50 sweep rows; every registered query must
    get one, and every one must carry an oracle."""
    assert len(ALL_QUERIES) <= 50
    assert all(sql is not None for _fn, sql in ALL_QUERIES.values())
    assert list(ALL_QUERIES)[0] == "kg_triples"  # flagship leads the sweep


def test_driver_sortable_catches_unhashable_columns():
    """The r2 driver crash class: MapType → dict cells and ArrayType →
    ndarray/list cells survive a rows-only count check but crash the
    driver's raw-value sort canonicalization. The local gate must flag
    them — and must pass clean frames, including all-null object columns
    (NaN-valued nulls from pandas merges)."""
    import numpy as np
    import pandas as pd

    from prove_spark.plans.compare import driver_sortable

    assert driver_sortable(pd.DataFrame({"a": [1, 2], "b": ["x", None]})) == []
    assert driver_sortable(pd.DataFrame({"a": [np.nan, np.nan]})) == []
    # multi-column frames (every real query output) go through pandas
    # lexsort/factorize, which hashes cell values — dict/ndarray cells throw
    assert driver_sortable(
        pd.DataFrame({"a": [{"k": 1}, {"k": 2}], "b": [1, 2]})
    ) != []
    assert driver_sortable(
        pd.DataFrame({"a": [np.array([1]), np.array([2])], "b": [1, 2]})
    ) != []
