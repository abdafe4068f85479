"""Crafted-fixture discrimination pins for the r5 eval/analytics operators
(the kg_coreness posture: the synthetic corpus exercises the plumbing and the
oracle equality; these fixtures pin that each statistic actually DISCRIMINATES
— perfect/zero AUC, a known changepoint, in/out-of-window attribution, a
degenerate z-test, mutual-NN reciprocity)."""

from __future__ import annotations

import pandas as pd
import pytest

from prove_spark.plans.advanced import (
    ATTRIB_WINDOW_S,
    attribution_last_touch,
    basket_pairs,
)
from prove_spark.plans.dqops import (
    ab_test_zscores,
    changepoint_cusum,
    hot_key_report,
    roc_auc_score,
)
from prove_spark.plans.simops import mutual_nn_pairs

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events_dir(spark, tmp_path_factory, rows, name):
    d = tmp_path_factory.mktemp(name)
    pdf = pd.DataFrame(rows, columns=EVENT_COLS)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
    return str(d)


def _ev(i, ts, uid, etype, value):
    return [i, ts, uid, etype, value, "{}"]


# ---------------------------------------------------------------- ROC-AUC
def test_auc_perfect_separation(spark, tmp_path_factory):
    # every error scores HIGHER than every non-error -> AUC = 1.0 exactly
    rows = [_ev(i, "2024-01-01", 1, "error", 200.0 + i) for i in range(5)]
    rows += [_ev(10 + i, "2024-01-01", 1, "view", 10.0 + i) for i in range(5)]
    d = _events_dir(spark, tmp_path_factory, rows, "auc_hi")
    out = roc_auc_score(spark, d).collect()[0]
    assert out.n_pos == 5 and out.n_neg == 5
    assert out.auc == 1.0


def test_auc_reversed_and_tied(spark, tmp_path_factory):
    # errors all BELOW -> 0.0; all values identical -> mid-ranks give 0.5
    rows = [_ev(i, "2024-01-01", 1, "error", 1.0 + i) for i in range(4)]
    rows += [_ev(10 + i, "2024-01-01", 1, "view", 100.0 + i) for i in range(4)]
    d = _events_dir(spark, tmp_path_factory, rows, "auc_lo")
    assert roc_auc_score(spark, d).collect()[0].auc == 0.0

    rows = [_ev(i, "2024-01-01", 1, "error", 7.0) for i in range(3)]
    rows += [_ev(10 + i, "2024-01-01", 1, "view", 7.0) for i in range(3)]
    d = _events_dir(spark, tmp_path_factory, rows, "auc_tie")
    assert roc_auc_score(spark, d).collect()[0].auc == 0.5


def test_auc_single_class_is_null(spark, tmp_path_factory):
    # no negatives at all -> AUC undefined -> NULL (not NaN) so the
    # DuckDB-oracle value hash agrees on the degenerate lane
    rows = [_ev(i, "2024-01-01", 1, "error", 10.0 + i) for i in range(4)]
    d = _events_dir(spark, tmp_path_factory, rows, "auc_one_class")
    out = roc_auc_score(spark, d).collect()[0]
    assert out.n_neg == 0 and out.auc is None


def test_neyman_zero_weight_is_null(spark, tmp_path_factory):
    # every stratum constant-valued -> every sd = 0 -> total weight 0 ->
    # quota undefined -> NULL alloc (not the NaN->0 Spark default) on the
    # same rows the DuckDB oracle NULLs
    from prove_spark.plans.textops import neyman_allocation

    rows = [_ev(i, "2024-01-01", 1, "view", 5.0) for i in range(3)]
    rows += [_ev(10 + i, "2024-01-01", 1, "click", 9.0) for i in range(3)]
    d = _events_dir(spark, tmp_path_factory, rows, "neyman_flat")
    out = neyman_allocation(spark, d).collect()
    assert len(out) == 2
    assert all(r.alloc is None for r in out)


# ------------------------------------------------------------------ CUSUM
def test_cusum_finds_the_kink(spark, tmp_path_factory):
    # 1 event/day for 10 days, then 10/day for 10 days: the scaled CUSUM
    # statistic |D*S_t - T*t| peaks exactly at the rate change (day 9,
    # t=10, S=10: |20*10 - 110*10| = 900) and returns to 0 at the end.
    rows, eid = [], 0
    for day in range(10):
        rows.append(_ev(eid, f"2024-01-{day + 1:02d}", 1, "x", 1.0))
        eid += 1
    for day in range(10, 20):
        for _ in range(10):
            rows.append(_ev(eid, f"2024-01-{day + 1:02d}", 1, "x", 1.0))
            eid += 1
    d = _events_dir(spark, tmp_path_factory, rows, "cusum")
    out = changepoint_cusum(spark, d).collect()[0]
    assert out.day_index == 10 and out.cum_before == 10
    assert out.cusum_stat == 900
    assert out.total_events == 110 and out.n_days == 20


# ------------------------------------------------------------ attribution
def test_attribution_window_and_none_lanes(spark, tmp_path_factory):
    # u1: view 1h before purchase -> credited 'view'
    # u2: purchase with no prior touch -> 'none'
    # u3: click OUTSIDE the 7-day lookback -> 'none'
    rows = [
        _ev(1, "2024-02-01 10:00:00", 1, "view", 1.0),
        _ev(2, "2024-02-01 11:00:00", 1, "purchase", 1.0),
        _ev(3, "2024-02-01 09:00:00", 2, "purchase", 1.0),
        _ev(4, "2024-01-01 00:00:00", 3, "click", 1.0),
        _ev(5, "2024-02-01 00:00:00", 3, "purchase", 1.0),
    ]
    assert ATTRIB_WINDOW_S < 31 * 86400  # fixture's stale touch is outside
    d = _events_dir(spark, tmp_path_factory, rows, "attrib")
    got = {
        r.channel: r.n_purchases
        for r in attribution_last_touch(spark, d).collect()
    }
    assert got == {"view": 1, "none": 2}


# ---------------------------------------------------------------- A/B test
def test_ab_test_direction_and_degenerate_null(spark, tmp_path_factory):
    # B (odd user ids) always succeeds, A never -> z > 0 and large;
    # second metric: both always succeed -> pooled p = 1 -> NULL z.
    rows = []
    for i in range(20):
        rows.append(_ev(i, "2024-03-01", i % 2, "signup",
                        150.0 if i % 2 else 50.0))
    for i in range(20, 30):
        rows.append(_ev(i, "2024-03-01", i % 2, "view", 150.0))
    d = _events_dir(spark, tmp_path_factory, rows, "abtest")
    got = {r.event_type: r for r in ab_test_zscores(spark, d).collect()}
    assert got["signup"].z_score is not None and got["signup"].z_score > 3
    assert got["signup"].p_a == 0.0 and got["signup"].p_b == 1.0
    assert got["view"].z_score is None


# ------------------------------------------------------------ basket pairs
def test_basket_pairs_lift(spark, tmp_path_factory):
    # parts 1+2 co-occur in both their baskets (lift = N/(2*2) = 1 with
    # N=4... craft: 4 baskets; {1,2} twice, {3} alone twice with part 4
    # rider so 3 never meets 1 -> pair (1,2): supp=2, lift = 2*4/(2*2)=2.
    li_cols = ["l_orderkey", "l_partkey"]
    rows = [[1, 1], [1, 2], [2, 1], [2, 2], [3, 3], [3, 4], [4, 3], [4, 4]]
    d = str(tmp_path_factory.mktemp("baskets"))
    pdf = pd.DataFrame(rows, columns=li_cols)
    spark.createDataFrame(pdf).write.parquet(f"{d}/lineitem.parquet")
    got = {(r.part_a, r.part_b): r for r in basket_pairs(spark, d).collect()}
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)].supp_ab == 2 and got[(1, 2)].lift == 2.0
    assert got[(1, 2)].confidence == 1.0


# ------------------------------------------------------------- mutual NN
def test_mutual_nn_reciprocity(spark):
    # contract: every emitted pair is each side's SINGLE best in-bucket
    # match — mutual pairs are a subset of one-way bests, and each vector
    # appears in at most one mutual pair
    out = mutual_nn_pairs(spark, "/root/testdata/sf0.001").collect()
    assert out, "synthetic embeddings must produce mutual pairs"
    seen = set()
    for r in out:
        assert r.vec_a < r.vec_b
        assert r.vec_a not in seen and r.vec_b not in seen
        seen.add(r.vec_a)
        seen.add(r.vec_b)


# -------------------------------------------------------- count-min sketch
def test_cms_one_sided_and_live(spark):
    # CMS guarantee: est >= exact ALWAYS; and the width-16 sketch must
    # actually collide on the 31-token vocabulary (a dead error lane would
    # mean the sketch read back exact and measured nothing)
    from prove_spark.plans.textops import cms_token_counts

    out = cms_token_counts(spark, "/root/testdata/sf0.001").collect()
    assert out
    assert all(r.overestimate >= 0 for r in out)
    assert all(r.est_cnt == r.exact_cnt + r.overestimate for r in out)
    assert any(r.overestimate > 0 for r in out)


# -------------------------------------------------- packed-vector edge lanes
def test_packed_ann_drops_empty_and_skips_null_elements(
    spark, tmp_path_factory
):
    # the packed zip_with fold must keep the exploded oracle's edge
    # semantics: an EMPTY embedding vanishes (UNNEST yields no rows there),
    # a NULL element folds as 0 (SQL SUM skips NULLs)
    import pandas as pd

    from prove_spark.plans.textops import ann_topk_cosine

    d = str(tmp_path_factory.mktemp("packed_edge"))
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.0, 1.0], 0),
        (5, [1.0, 1.0], 0),
        (6, [], 0),
        (7, [1.0, None], 0),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    out = ann_topk_cosine(spark, d).collect()
    got = {(r.query_id, r.neighbor_id): r.cosine for r in out}
    assert 6 not in {k[1] for k in got}  # empty vector dropped
    assert got[(0, 7)] == 1.0  # [1.0, NULL] folds as [1, 0]
    assert got[(1, 7)] == 0.0


# ----------------------------------------------------------- hot-key skew
def test_hot_key_report_skew_ratio(spark, tmp_path_factory):
    # events: one hot user with 10 rows + 10 singleton users
    # -> skew = max*n_keys/n_rows = 10*11/20 = 5.5
    rows = [_ev(i, "2024-01-01", 99, "view", 1.0) for i in range(10)]
    rows += [_ev(100 + i, "2024-01-01", i, "view", 1.0) for i in range(10)]
    d = _events_dir(spark, tmp_path_factory, rows, "hotkey")
    li = pd.DataFrame([[1, 1], [1, 2]], columns=["l_orderkey", "l_partkey"])
    spark.createDataFrame(li).write.parquet(f"{d}/lineitem.parquet")
    docs = pd.DataFrame(
        [[1, "t", "en", "s", 1]],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    got = {r.table_name: r for r in hot_key_report(spark, d).collect()}
    assert got["events"].n_rows == 20 and got["events"].n_keys == 11
    assert got["events"].max_key_rows == 10
    assert got["events"].skew_ratio == 5.5
    assert got["lineitem"].skew_ratio == 1.0
