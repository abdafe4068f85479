#!/usr/bin/env python
"""Attribute the r2->r3 kg_pipeline driver-bench delta (5.88 s -> 7.27 s at
rep=16 / local[32]) to its candidate causes by isolated, interleaved
measurement. Each variant toggles exactly one r3 harness/plan change:

  cur    r3 bench of record: 8 MB splits + UI/REST attribution + merge hint
  nosplit  cur minus the 8 MB input splits (Spark default 128 MB)
  noui     cur minus the UI + REST attribution
  nohint   cur minus the forced sort-merge pair join (AQE picks; at bench
           scale that is a broadcast of the claims side)
  r2conf   the r2 harness exactly: no splits conf, no UI, hint present
           (the hint is an r3 PLAN change; r2conf+nohint = full r2 harness)
  r2all    r2 harness AND no hint — the closest reconstruction of the r2
           measurement path on r3 code

Variants are interleaved round-robin so multi-minute machine-drift episodes
hit all variants equally; each cell is min-of-3 timed runs in its own
subprocess (fresh JVM). Results print as one JSON line per completed round
plus a final summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUNDS = int(os.environ.get("ATTR_ROUNDS", "2"))
REP = int(os.environ.get("ATTR_REPLICATE", "16"))
CORES = int(os.environ.get("ATTR_CORES", "32"))
N_TIMED = int(os.environ.get("ATTR_RUNS", "3"))

VARIANTS = {
    "cur": {},
    "nosplit": {"SPARK_GRAFT_SPLIT_MB": "0"},
    "noui": {"SPARK_GRAFT_BENCH_UI": "0"},
    "nohint": {"SPARK_GRAFT_PAIR_HINT": "none"},
    "r2conf": {"SPARK_GRAFT_SPLIT_MB": "0", "SPARK_GRAFT_BENCH_UI": "0"},
    "r2all": {
        "SPARK_GRAFT_SPLIT_MB": "0",
        "SPARK_GRAFT_BENCH_UI": "0",
        "SPARK_GRAFT_PAIR_HINT": "none",
    },
}


def run_variant(name: str, overrides: dict) -> dict | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(overrides)
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "bench.py"),
                "--kg",
                str(CORES),
                str(REP),
                str(N_TIMED),
                "jvm",
            ],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
            check=True,
            timeout=900,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(f"{name}: FAILED {e}", file=sys.stderr)
        if hasattr(e, "stderr") and e.stderr:
            print(e.stderr[-500:], file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return None


def main() -> None:
    results: dict[str, list[dict]] = {v: [] for v in VARIANTS}
    for rnd in range(ROUNDS):
        for name, overrides in VARIANTS.items():
            r = run_variant(name, overrides)
            if r:
                results[name].append(r)
                print(
                    json.dumps(
                        {
                            "round": rnd,
                            "variant": name,
                            "wall_sec": r["wall_sec"],
                            "all_runs_sec": r["all_runs_sec"],
                            "executor_totals_per_run": r.get(
                                "executor_totals_per_run"
                            ),
                        }
                    ),
                    flush=True,
                )
    summary = {}
    for name, rs in results.items():
        if rs:
            walls = [r["wall_sec"] for r in rs]
            summary[name] = {
                "best_wall_sec": min(walls),
                "walls": walls,
                "turns_per_sec_best": max(r["turns_per_sec"] for r in rs),
            }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
