"""CDC merge-apply (plans/advanced.py:cdc_apply_changes): every MERGE lane
pinned on a crafted snapshot + changelog (the DuckDB oracle lane in
test_entry_queries.py separately pins hash-exact equality on testdata)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from prove_spark.plans.advanced import cdc_apply_changes

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write(spark, d, customers, events):
    cust = pd.DataFrame(
        customers, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    spark.createDataFrame(cust).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    if events:
        ev = pd.DataFrame(
            events,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        spark.createDataFrame(ev).write.mode("overwrite").parquet(f"{d}/events.parquet")
    else:
        spark.createDataFrame(
            [],
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")


def test_every_merge_lane(spark, tmp_path):
    # snapshot keeps keys with c_custkey % 3 != 0 → key 9 is held out
    customers = [
        [1, "alice", 0, 10.0, "A"],   # untouched carry-over
        [2, "bob", 0, 20.0, "A"],     # matched update (last op U)
        [4, "carol", 0, 40.0, "A"],   # matched delete (last op D)
        [5, "dave", 0, 50.0, "A"],    # matched insert-op (treated as upsert)
        [9, "heldout", 0, 90.0, "A"], # %3==0 → NOT in snapshot at all
    ]
    events = [
        # key 2: U then U — last wins (value 22.0), n_changes 2
        [100, T0, 2, "click", 21.0, "{}"],
        [101, T0 + dt.timedelta(minutes=1), 2, "view", 22.0, "{}"],
        # key 4: U then D — deleted
        [102, T0, 4, "purchase", 41.0, "{}"],
        [103, T0 + dt.timedelta(minutes=1), 4, "error", 0.0, "{}"],
        # key 5: signup (I) upserts value over the snapshot balance
        [104, T0, 5, "signup", 55.0, "{}"],
        # key 7: unmatched insert (not in snapshot) → placeholder name
        [105, T0, 7, "signup", 77.0, "{}"],
        # key 8: unmatched delete → stays absent
        [106, T0, 8, "error", 0.0, "{}"],
        # key 2 tie-break: same ts as event 101 but LOWER event_id → loses
        [99, T0 + dt.timedelta(minutes=1), 2, "purchase", 999.0, "{}"],
    ]
    _write(spark, tmp_path, customers, events)
    rows = cdc_apply_changes(spark, str(tmp_path)).collect()
    got = {r.key: (r.name, r.balance, r.last_op, r.n_changes) for r in rows}
    assert len(got) == len(rows), "duplicate keys emitted"
    assert got == {
        1: ("alice", 10.0, "K", 0),
        2: ("bob", 22.0, "U", 3),          # event 101 wins the (ts, id) tie
        5: ("dave", 55.0, "I", 1),
        7: ("cdc-insert", 77.0, "I", 1),
    }
    assert 4 not in got and 8 not in got and 9 not in got


def test_idempotent_on_empty_changelog(spark, tmp_path):
    customers = [[1, "alice", 0, 10.0, "A"], [2, "bob", 0, 20.0, "A"]]
    _write(spark, tmp_path, customers, [])
    rows = cdc_apply_changes(spark, str(tmp_path)).collect()
    assert {(r.key, r.balance, r.last_op) for r in rows} == {
        (1, 10.0, "K"),
        (2, 20.0, "K"),
    }
