"""The spark-submit entrypoint (prove_spark/job.py) end-to-end: parquet and
JSONL transcript inputs must produce identical triples, and the JSONL path
must quarantine malformed lines instead of dropping or crashing on them."""

from __future__ import annotations

import glob
import os

from prove_spark.datagen import transcripts_df
from prove_spark.job import main
from prove_spark.sources.jsonl import write_transcripts_jsonl
from prove_spark.sources.tables import TableIO

TRIPLE_KEY_COLS = ["conv_id", "claim_id", "subj", "pred", "obj"]


def _triples(spark, warehouse):
    df = TableIO(spark, warehouse).read("triples")
    cols = [c for c in TRIPLE_KEY_COLS if c in df.columns]
    assert cols, f"unexpected triples schema: {df.columns}"
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_job_parquet_and_jsonl_inputs_agree(spark, tmp_path):
    src = transcripts_df(spark, "/root/testdata/sf0.001")

    pq_in = str(tmp_path / "in_parquet")
    src.write.mode("overwrite").parquet(pq_in)
    jl_in = str(tmp_path / "in_jsonl")
    write_transcripts_jsonl(src, jl_in)
    # a malformed line in the feed must quarantine, not poison the run
    with open(os.path.join(jl_in, "part-badline.json"), "w") as f:
        f.write("{not json at all\n")

    wh_pq = str(tmp_path / "wh_parquet")
    wh_jl = str(tmp_path / "wh_jsonl")
    assert main(["--input", pq_in, "--warehouse", wh_pq, "--bucket-groups", "2"]) == 0
    assert (
        main(
            [
                "--input",
                jl_in,
                "--input-format",
                "jsonl",
                "--warehouse",
                wh_jl,
                "--bucket-groups",
                "2",
            ]
        )
        == 0
    )

    t_pq = _triples(spark, wh_pq)
    t_jl = _triples(spark, wh_jl)
    assert len(t_pq) > 0
    assert t_jl == t_pq  # identical triple sets from both ingest formats

    quarantined = []
    for path in glob.glob(os.path.join(wh_jl, "quarantine", "part-*")):
        with open(path) as f:
            quarantined += [ln for ln in f.read().splitlines() if ln]
    assert quarantined == ["{not json at all"]
