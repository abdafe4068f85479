#!/usr/bin/env python
"""Round-6 optimization measurement harness.

`bench.py` is FROZEN for measurement (the driver times the round with the
round-start copy); this file holds the extra instrumentation the
optimization loop needs (guide §1):

  --headline [q ...]   bench-identical headline session (local[$CPUS],
                       shuffle=$CPUS, nation-count warmup): cold pass then
                       WARM_RUNS warm passes per query; one JSON line.
  --noop [q ...]       same session, but each query materialized via the
                       noop sink (computes every column, guide §1.4) instead
                       of count(); cold + warm.
  --plans OUTDIR       write `.explain("formatted")` of each headline query
                       (and any extra names given) to OUTDIR/<name>.txt.
  --kg-stages [rep]    one build_triples run with the UI on; prints the
                       per-stage executor metrics (where kg_pipeline time
                       actually goes).

Usage examples:
  python bench_extra.py --headline
  python bench_extra.py --plans plans/r06 --suffix _before
  python bench_extra.py --kg-stages 16
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WARM_RUNS = int(os.environ.get("SPARK_GRAFT_WARM_RUNS", "3"))

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


def _registry():
    from prove_spark.plans.registry import ALL_QUERIES, UNREGISTERED_QUERIES

    return {**UNREGISTERED_QUERIES, **ALL_QUERIES}


def _session():
    from prove_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    return spark


def run_headline(names: list[str], noop: bool = False) -> None:
    registry = _registry()
    spark = _session()

    def execute(fn):
        df = fn(spark, SF_DIR)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        fn, _sql = registry[name]
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.time()
        execute(fn)
        cold[name] = round(time.time() - t0, 3)
    for name in names:
        fn, _sql = registry[name]
        runs = []
        for i in range(WARM_RUNS):
            spark.sparkContext.setJobDescription(f"warm{i}:{name}")
            t0 = time.time()
            execute(fn)
            runs.append(time.time() - t0)
        warm[name] = round(min(runs), 3)
    spark.stop()
    print(
        json.dumps(
            {
                "mode": "noop" if noop else "count",
                "cold_total": round(sum(cold.values()), 3),
                "warm_total": round(sum(warm.values()), 3),
                "cold": cold,
                "warm": warm,
            }
        )
    )


def write_plans(outdir: str, names: list[str], suffix: str) -> None:
    registry = _registry()
    spark = _session()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn, _sql = registry[name]
        df = fn(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}{suffix}.txt")
    spark.stop()


def query_stages(name: str) -> None:
    """One warm run of a headline query with the UI on: per-stage executor
    metrics (where the wall actually goes)."""
    import urllib.request

    from prove_spark.session import get_spark

    registry = _registry()
    spark = get_spark(
        "q-stages",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4097",
            "spark.ui.retainedStages": "100000",
        },
    )
    fn, _sql = registry[name]
    fn(spark, SF_DIR).count()  # warm
    fn(spark, SF_DIR).count()

    def stages():
        url = (
            "http://localhost:4097/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages?status=complete"
        )
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.loads(r.read())

    time.sleep(1)
    pre_ids = {s["stageId"] for s in stages()}
    t0 = time.time()
    fn(spark, SF_DIR).count()
    wall = time.time() - t0
    time.sleep(1)
    rows = [s for s in stages() if s["stageId"] not in pre_ids]
    rows.sort(key=lambda s: -s["executorRunTime"])
    print(f"{name}: wall={wall:.3f}s stages={len(rows)}")
    for s in rows:
        print(
            f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
            f"run={s['executorRunTime'] / 1e3:7.2f}s "
            f"cpu={s['executorCpuTime'] / 1e9:7.2f}s "
            f"shufR={s.get('shuffleReadBytes', 0) / 1e6:7.1f}MB "
            f"shufW={s.get('shuffleWriteBytes', 0) / 1e6:7.1f}MB "
            f"in={s.get('inputBytes', 0) / 1e6:7.1f}MB"
        )
    spark.stop()


def kg_stages(replicate: int) -> None:
    import urllib.request

    from prove_spark.config import DEFAULT_CONFIG
    from prove_spark.datagen import transcripts_df
    from prove_spark.pipeline.run import build_triples
    from prove_spark.session import get_spark

    import tempfile

    spark = get_spark(
        "kg-stages",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4099",
            "spark.ui.retainedStages": "100000",
        },
    )
    tdir = tempfile.mkdtemp(prefix=f"kgstages_{replicate}_")
    transcripts_df(spark, SF_DIR, replicate=replicate).write.mode(
        "overwrite"
    ).parquet(tdir)
    tr = spark.read.parquet(tdir)
    n_turns = tr.count()
    # warmup (small) then one timed run, mirroring bench.kg_measure
    warm = transcripts_df(spark, SF_DIR, replicate=max(1, replicate // 8))
    build_triples(spark, warm, DEFAULT_CONFIG).count()
    spark.catalog.clearCache()

    def stages():
        url = (
            "http://localhost:4099/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages?status=complete"
        )
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.loads(r.read())

    def jobs():
        url = (
            "http://localhost:4099/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/jobs"
        )
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.loads(r.read())

    pre_ids = {s["stageId"] for s in stages()}
    pre_jobs = {j["jobId"] for j in jobs()}
    t0 = time.time()
    n = build_triples(spark, tr, DEFAULT_CONFIG).count()
    wall = time.time() - t0
    stage_to_job = {}
    for j in jobs():
        if j["jobId"] in pre_jobs:
            continue
        for sid in j["stageIds"]:
            stage_to_job[sid] = j["jobId"]
    rows = [s for s in stages() if s["stageId"] not in pre_ids]
    rows.sort(key=lambda s: -s["executorRunTime"])
    print(f"wall={wall:.2f}s turns={n_turns} triples={n} stages={len(rows)}")
    for s in rows:
        print(
            f"  job {stage_to_job.get(s['stageId'], '?'):>3} "
            f"stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
            f"run={s['executorRunTime'] / 1e3:7.2f}s "
            f"cpu={s['executorCpuTime'] / 1e9:7.2f}s "
            f"gc={s.get('jvmGcTime', 0) / 1e3:5.2f}s "
            f"shufR={s.get('shuffleReadBytes', 0) / 1e6:8.1f}MB "
            f"shufW={s.get('shuffleWriteBytes', 0) / 1e6:8.1f}MB "
            f"in={s.get('inputBytes', 0) / 1e6:8.1f}MB  {s['name'].splitlines()[0][:70]}"
        )
    import shutil

    shutil.rmtree(tdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or args[0] == "--headline":
        run_headline(args[1:] or HEADLINE)
    elif args[0] == "--noop":
        run_headline(args[1:] or HEADLINE, noop=True)
    elif args[0] == "--plans":
        outdir = args[1]
        suffix = ""
        rest = args[2:]
        if "--suffix" in rest:
            i = rest.index("--suffix")
            suffix = rest[i + 1]
            rest = rest[:i] + rest[i + 2 :]
        write_plans(outdir, rest or HEADLINE, suffix)
    elif args[0] == "--stages":
        query_stages(args[1])
    elif args[0] == "--kg-stages":
        kg_stages(int(args[1]) if len(args) > 1 else 16)
    else:
        raise SystemExit(f"unknown mode {args[0]}")
