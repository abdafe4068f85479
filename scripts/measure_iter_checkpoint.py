#!/usr/bin/env python
"""Measure the iterative-lineage cost and the truncate_round fix.

Iterative queries (kmeans/_train_centroids, kg_pagerank) feed round t's
output into round t+1; without a lineage cut the logical plan doubles per
round and DRIVER-side analysis dominates wall even on tiny data.
plans/iterstate.py truncates each round's few-hundred-row state with
localCheckpoint(eager=True) behind SPARK_GRAFT_ITER_CHECKPOINT (default 1).

This script produces the evidence that sized that default: the same query
at several round counts with the flag off/on, each configuration in its own
subprocess (fresh JVM — JIT state is not shared), reporting total wall
(build + action) and the optimized-plan size. Results live in BASELINE.md
("iterative lineage truncation" section).

Usage: python scripts/measure_iter_checkpoint.py            # grid + table
       python scripts/measure_iter_checkpoint.py --one kmeans 12 1  # child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(case: str, iters: int, flag: int) -> None:
    os.environ["SPARK_GRAFT_ITER_CHECKPOINT"] = str(flag)
    os.environ[
        "SPARK_GRAFT_KMEANS_ITERS"
        if case == "kmeans"
        else "SPARK_GRAFT_PAGERANK_ITERS"
    ] = str(iters)
    from prove_spark.session import get_spark

    spark = get_spark(
        f"iter-measure-{case}", master="local[8]", shuffle_partitions=8
    )
    from prove_spark.plans.registry import ALL_QUERIES

    fn = ALL_QUERIES[
        "kmeans_centroids" if case == "kmeans" else "kg_pagerank"
    ][0]
    t0 = time.time()
    df = fn(spark, SF_DIR)
    t_build = time.time() - t0
    plan_chars = len(df._jdf.queryExecution().optimizedPlan().toString())
    t1 = time.time()
    n = df.count()
    print(
        json.dumps(
            {
                "case": case,
                "iters": iters,
                "flag": flag,
                "rows": n,
                "build_s": round(t_build, 2),
                "action_s": round(time.time() - t1, 2),
                "total_s": round(time.time() - t0, 2),
                "plan_chars": plan_chars,
            }
        )
    )


def main() -> None:
    grid = [("kmeans", 4), ("kmeans", 12), ("kmeans", 20), ("pagerank", 6)]
    results = []
    for case, iters in grid:
        for flag in (0, 1):
            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            try:
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--one",
                        case,
                        str(iters),
                        str(flag),
                    ],
                    capture_output=True,
                    text=True,
                    timeout=1800,
                    env=env,
                    cwd=REPO,
                )
            except subprocess.TimeoutExpired:
                results.append(
                    {"case": case, "iters": iters, "flag": flag, "timeout": True}
                )
                continue
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    results.append(json.loads(line))
                    break
            else:
                results.append(
                    {
                        "case": case,
                        "iters": iters,
                        "flag": flag,
                        "error": out.stderr[-300:],
                    }
                )
    print("| case | rounds | truncate | total s | build s | plan chars |")
    print("|---|---|---|---|---|---|")
    for r in results:
        if "total_s" in r:
            print(
                f"| {r['case']} | {r['iters']} | {'ON' if r['flag'] else 'off'}"
                f" | {r['total_s']} | {r['build_s']} | {r['plan_chars']} |"
            )
        else:
            print(
                f"| {r['case']} | {r['iters']} |"
                f" {'ON' if r['flag'] else 'off'} | FAILED/TIMEOUT | | |"
            )
    print(json.dumps(results))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
