#!/usr/bin/env python
"""Per-stage attribution of the 2->8-core scaling residue.

Runs the KG pipeline once per core count (own subprocess JVM, taskset-
pinned, UI on) and prints each completed stage's executor run/CPU/GC totals
plus shuffle/input volumes. Stages of the same deterministic plan are
aligned by submission order, so the table directly names the stage whose
CPU grows with core count — the non-scaling residue the efficiency gate
pays for. (Wall-clock ratios per stage are NOT meaningful at different
parallelism; CPU totals are: the same job should burn the same CPU.)

Usage: python scripts/attr_scaling_stages.py [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage_dump(cores: int, replicate: int) -> list[dict]:
    code = f"""
import json, tempfile, urllib.request
from prove_spark.session import get_spark
from prove_spark.datagen import transcripts_df
from prove_spark.pipeline.run import build_triples

SF = "{os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")}"
spark = get_spark("attr-stages-{cores}", master="local[{cores}]",
                  shuffle_partitions={2 * cores},
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false",
                              "spark.sql.files.maxPartitionBytes": str(8*1024*1024),
                              "spark.ui.enabled": "true",
                              "spark.ui.port": "{4160 + cores}",
                              "spark.ui.retainedStages": "100000"}})
tdir = tempfile.mkdtemp()
transcripts_df(spark, SF, replicate={replicate}).write.mode("overwrite").parquet(tdir)
tr = spark.read.parquet(tdir)
build_triples(spark, transcripts_df(spark, SF, replicate={max(1, replicate // 8)})).count()
spark.catalog.clearCache()
import atexit, shutil
atexit.register(shutil.rmtree, tdir, True)
url = ("http://localhost:{4160 + cores}/api/v1/applications/"
       + spark.sparkContext.applicationId + "/stages?status=complete")
pre = {{s["stageId"] for s in json.loads(urllib.request.urlopen(url).read())}}
build_triples(spark, tr).count()
stages = [s for s in json.loads(urllib.request.urlopen(url).read())
          if s["stageId"] not in pre]
stages.sort(key=lambda s: s["stageId"])
out = [{{"run_s": round(s["executorRunTime"]/1e3, 2),
        "cpu_s": round(s["executorCpuTime"]/1e9, 2),
        "gc_s": round(s.get("jvmGcTime", 0)/1e3, 2),
        "in_mb": round(s.get("inputBytes", 0)/1e6, 1),
        "sh_r_mb": round(s.get("shuffleReadBytes", 0)/1e6, 1),
        "sh_w_mb": round(s.get("shuffleWriteBytes", 0)/1e6, 1),
        "tasks": s["numCompleteTasks"]}} for s in stages]
print("STAGES " + json.dumps(out))
spark.stop()
"""
    import shutil

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    pin = (
        ["taskset", "-c", f"0-{cores - 1}"]
        if shutil.which("taskset")
        else []
    )
    out = subprocess.run(
        pin + [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1200,
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("STAGES "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-800:])


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hi = stage_dump(8, rep)
    lo = stage_dump(2, rep)
    print(f"{'stage':>5} {'cpu2':>7} {'cpu8':>7} {'infl':>6} {'gc2':>6} "
          f"{'gc8':>6} {'in_mb':>8} {'sh_r':>8} {'tasks2/8':>9}")
    for i, (l, h) in enumerate(zip(lo, hi)):
        infl = h["cpu_s"] / l["cpu_s"] if l["cpu_s"] else float("nan")
        print(f"{i:>5} {l['cpu_s']:>7.1f} {h['cpu_s']:>7.1f} {infl:>6.2f} "
              f"{l['gc_s']:>6.1f} {h['gc_s']:>6.1f} {l['in_mb']:>8.1f} "
              f"{l['sh_r_mb']:>8.1f} {l['tasks']:>4}/{h['tasks']}")
    if len(lo) != len(hi):
        print(f"WARNING: stage counts differ ({len(lo)} vs {len(hi)}) — "
              "per-row alignment past the shorter list is meaningless; "
              "the TOTALS below still sum EACH side fully")
    # totals over the FULL per-side lists — unmatched trailing stages (AQE
    # reuse differences) are the likeliest home of non-scaling residue and
    # must not silently drop out of the inflation ratio
    tot2 = sum(s["cpu_s"] for s in lo)
    tot8 = sum(s["cpu_s"] for s in hi)
    print(f"TOTAL cpu2={tot2:.1f}s cpu8={tot8:.1f}s inflation={tot8/tot2:.3f}")


if __name__ == "__main__":
    main()
