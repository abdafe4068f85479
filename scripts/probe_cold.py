#!/usr/bin/env python
"""Cold-pass anatomy probe (guide §1): for each headline query in a fresh
bench-identical session, split the first-invocation wall into
  build   — Python-side DataFrame construction (plan build, py4j)
  compile — Janino whole-stage-codegen compilation (CodegenMetrics delta)
  exec    — everything else (JIT, scheduling, actual compute)
and report the Catalyst phase timings (analysis/optimization/planning) of
the executed query. Run AFTER the suite is quiet; readings are per-session
cold, so each invocation of this script is one sample.
"""
from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "region_revenue",
    "topk_per_group",
    "pivot_event_counts",
    "dedup_ngram_jaccard",
    "lsh_candidate_pairs",
    "simhash_fingerprints",
    "ann_topk_cosine",
    "latest_event_per_user",
    "sessionize_events",
]


def main() -> None:
    from prove_spark.plans.registry import ALL_QUERIES, UNREGISTERED_QUERIES
    from prove_spark.session import get_spark

    registry = {**UNREGISTERED_QUERIES, **ALL_QUERIES}
    spark = get_spark("probe-cold", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    cm = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics

    def compile_ms() -> float:
        return cm.METRIC_COMPILATION_TIME().getSnapshot().getValues(), cm.METRIC_COMPILATION_TIME().getCount()

    rows = []
    for name in HEADLINE:
        fn, _sql = registry[name]
        n0 = cm.METRIC_COMPILATION_TIME().getCount()
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        df.count()
        t2 = time.time()
        n1 = cm.METRIC_COMPILATION_TIME().getCount()
        # sum of the newest (n1-n0) compile durations (histogram keeps last
        # 1028 values; fine at this volume)
        vals = list(cm.METRIC_COMPILATION_TIME().getSnapshot().getValues())
        new = vals[-(n1 - n0):] if n1 > n0 else []
        rows.append(
            {
                "query": name,
                "wall": round(t2 - t0, 3),
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "codegen_n": n1 - n0,
                "codegen_ms": int(sum(new)),
            }
        )
    total_compile = cm.METRIC_COMPILATION_TIME().getCount()
    print(json.dumps({"rows": rows, "total_codegen_units": total_compile}))
    for r in rows:
        print(
            f"{r['query']:>24} wall={r['wall']:6.3f} build={r['build']:6.3f} "
            f"exec={r['exec']:6.3f} codegen_n={r['codegen_n']:>3} "
            f"codegen_ms={r['codegen_ms']:>5}"
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
