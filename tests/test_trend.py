"""Crafted pins for the per-user OLS trend (advanced.user_value_trend):
degenerate designs (single point, zero time variance) must yield NULL
slope/intercept, and a hand-checkable two-point user must recover the
exact line — lanes the synthetic corpus never exercises (every user there
has many spread-out events)."""

from __future__ import annotations

import datetime as dt

import pytest

from prove_spark.plans.advanced import user_value_trend

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


@pytest.fixture(scope="module")
def trend_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("trend_sf")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user 1: one point → n=1, den=0 → NULL lane
        (1, t0, 1, "a", 5.0, "{}"),
        # user 2: three points at the SAME second → zero x variance
        (2, t0, 2, "a", 1.0, "{}"),
        (3, t0, 2, "a", 2.0, "{}"),
        (4, t0, 2, "a", 3.0, "{}"),
        # user 3: exact line y = 4 + 2x over x ∈ {0, 10}
        (5, t0, 3, "a", 4.0, "{}"),
        (6, t0 + dt.timedelta(seconds=10), 3, "a", 24.0, "{}"),
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        f"{d}/events.parquet"
    )
    return str(d)


def test_degenerate_designs_yield_null(spark, trend_dir):
    out = {r.user_id: r for r in user_value_trend(spark, trend_dir).collect()}
    assert out[1].slope is None and out[1].intercept is None
    assert out[2].slope is None and out[2].intercept is None
    assert out[1].n_events == 1 and out[2].n_events == 3


def test_two_point_line_recovered_exactly(spark, trend_dir):
    out = {r.user_id: r for r in user_value_trend(spark, trend_dir).collect()}
    assert out[3].slope == 2.0
    assert out[3].intercept == 4.0
