"""Pins for bench.py's pre-registered drift-sentinel exclusion rule — pure
arithmetic, no Spark. The fixture readings are the actual r5 rehearsal run
(/tmp/bench_r5_full.json, 2026-08-18): ambient arrived mid-run, the probe
tagged exactly the three ambient-window pairs, and the original
keep-everything-on-overflow cliff kept a 0.706 contaminated pair in the
median. The revised rule must stay outcome-blind (severity = probe walls
only) and monotone (more tags never means fewer exclusions)."""

from __future__ import annotations

import bench

# r5 rehearsal sentinel walls: 1 pre-run reading + 2 per pair (7 pairs).
R5_WALLS = [
    1.937, 2.299, 2.249, 1.961, 2.012, 2.26, 2.225, 1.995,
    2.019, 2.261, 2.633, 2.165, 2.038, 2.229, 2.595,
]


def _pair_readings(walls):
    return [(walls[2 * i], walls[2 * i + 1], walls[2 * i + 2])
            for i in range((len(walls) - 1) // 2)]


def test_r5_rehearsal_scenario_excludes_worst_two_of_three_tags():
    base, tagged, excluded, overload = bench.sentinel_rule(
        R5_WALLS, _pair_readings(R5_WALLS), 7
    )
    assert base == 1.937
    # threshold 1.25 x 1.937 = 2.421 tags exactly the ambient-window pairs
    assert tagged == [4, 5, 6]
    assert overload is True  # 3 tags > cap 2 — still reported honestly
    # severity ranking: pairs 4 and 5 share the 2.633 reading (> pair 6's
    # 2.595), tie broken by index — outcome-blind, deterministic
    assert excluded == [4, 5]


def test_quiet_run_tags_nothing():
    walls = [2.0, 2.1, 2.05, 2.2, 2.15, 2.0, 2.08][: 2 * 3 + 1]
    base, tagged, excluded, overload = bench.sentinel_rule(
        walls, _pair_readings(walls), 3
    )
    assert tagged == [] and excluded == [] and overload is False


def test_single_drift_pair_excluded_without_overload():
    walls = [2.0, 2.0, 2.0, 2.0, 3.5, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0,
             2.0, 2.0, 2.0, 2.0]
    base, tagged, excluded, overload = bench.sentinel_rule(
        walls, _pair_readings(walls), 7
    )
    # the 3.5 reading is shared by pairs 1 (after) and 2 (before)
    assert tagged == [1, 2]
    assert excluded == [1, 2]
    assert overload is False


def test_monotone_more_contamination_never_fewer_exclusions():
    # every pair contaminated: cap still excludes the worst 2, flags overload
    walls = [2.0] + [4.0 + i * 0.1 for i in range(14)]
    base, tagged, excluded, overload = bench.sentinel_rule(
        walls, _pair_readings(walls), 7
    )
    assert tagged == list(range(7))
    assert len(excluded) == 2 and overload is True
    # severities rise with index, so the worst (last) two pairs go
    assert excluded == [5, 6]


def test_none_readings_are_skipped():
    walls = [2.0, None, 2.0, 2.0, 2.0, 2.0, 2.0]
    base, tagged, excluded, overload = bench.sentinel_rule(
        walls, _pair_readings(walls), 3
    )
    assert base == 2.0 and tagged == [] and excluded == []
