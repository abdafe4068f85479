"""Pins for plans/dqops.py beyond the generic oracle lane (which checks the
report against DuckDB on the clean sf corpora, where only the
childless-orders expectation fires): a crafted warehouse seeds exactly one
violation of every kind and the report must count each precisely."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from prove_spark.plans.dqops import DQ_REPORT_SQL, dq_report


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dq_sf")
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 2, 3, 4, 5],  # dup pk: one surplus row
            "o_custkey": pd.array([10, 10, 11, 99, None, 10], dtype="Int64"),
            # orphan fk (99) + null custkey
            "o_orderstatus": ["F"] * 6,
            "o_totalprice": [100.0, 50.0, 60.0, -5.0, 70.0, 80.0],  # one neg
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    customer = pd.DataFrame(
        {"c_custkey": [10, 11], "c_name": ["a", "b"], "c_nationkey": [0, 1]}
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 777],  # 777 orphaned; orders 4,5 childless
            "l_partkey": [1, 1, 1, 1],
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
            "l_discount": [0.1, 1.5, 0.0, 0.2],  # one out of [0,1]
        }
    )
    for name, df in [
        ("orders", orders),
        ("customer", customer),
        ("lineitem", lineitem),
    ]:
        spark.createDataFrame(df).write.parquet(f"{d}/{name}.parquet")
    return str(d)


EXPECTED = {
    # expectation -> (n_checked, n_violations)
    "pk_unique_o_orderkey": (6, 1),
    "o_totalprice_nonnegative": (6, 1),
    "o_custkey_not_null": (6, 1),
    "l_discount_in_unit_interval": (4, 1),
    "fk_orders_customer": (6, 2),  # the 99 orphan AND the null custkey row
    "fk_lineitem_orders": (4, 1),
    "orders_have_lineitems": (6, 2),  # orders 4 and 5
}


def test_every_expectation_counts_its_seeded_violations(spark, dirty_dir):
    got = {
        r.expectation: (r.n_checked, r.n_violations, r.passed)
        for r in dq_report(spark, dirty_dir).collect()
    }
    assert set(got) == set(EXPECTED)
    for name, (n, v) in EXPECTED.items():
        assert got[name] == (n, v, 0 if v else 1), name


def test_dirty_report_matches_duckdb(spark, dirty_dir):
    got = (
        dq_report(spark, dirty_dir)
        .toPandas()
        .sort_values("expectation")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{dirty_dir}/{t}.parquet/*.parquet')"
        )
    want = (
        con.execute(DQ_REPORT_SQL)
        .df()
        .sort_values("expectation")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert (got.values == want.values).all()
