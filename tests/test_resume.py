"""Resume test (SURVEY.md §5 item 4): kill after k commit groups, rerun,
output table identical to an uninterrupted run."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from prove_spark.pipeline.checkpoint import (
    completed_buckets,
    input_fingerprint,
    run_checkpointed,
    stage_metrics,
)
from prove_spark.sources.tables import TableIO


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.drop(columns=["bucket"])
        .sort_values(["claim_id"])
        .reset_index(drop=True)
    )


def test_resume_after_failure(spark, spark_transcripts, tmp_path):
    full_wh = str(tmp_path / "full")
    resume_wh = str(tmp_path / "resumed")

    full = run_checkpointed(spark, spark_transcripts, full_wh).toPandas()

    with pytest.raises(RuntimeError, match="simulated failure"):
        run_checkpointed(
            spark, spark_transcripts, resume_wh, fail_after_groups=2
        )
    io = TableIO(spark, resume_wh)
    fp = input_fingerprint(spark_transcripts)
    done_before = completed_buckets(io, fp)
    assert 0 < len(done_before) < 32  # partial progress was checkpointed

    resumed = run_checkpointed(spark, spark_transcripts, resume_wh).toPandas()
    assert _canon(resumed).equals(_canon(full))

    # lineage: every bucket has metrics, all pinned to the input fingerprint
    m = stage_metrics(io).toPandas()
    assert set(m.bucket) == set(range(32))
    assert (m.input_fingerprint == fp).all()
    assert m.n_rows.sum() == len(full)


def test_resume_noop_when_complete(spark, spark_transcripts, tmp_path):
    wh = str(tmp_path / "wh")
    first = run_checkpointed(spark, spark_transcripts, wh).toPandas()
    io = TableIO(spark, wh)
    n_manifest_rows = io.read("manifest").count()
    again = run_checkpointed(spark, spark_transcripts, wh).toPandas()
    assert _canon(again).equals(_canon(first))
    # no new manifest rows: everything was skipped
    assert io.read("manifest").count() == n_manifest_rows


def test_fingerprint_changes_with_input(spark, spark_transcripts):
    fp1 = input_fingerprint(spark_transcripts)
    fp2 = input_fingerprint(
        spark_transcripts.withColumn(
            "text", F.concat(F.col("text"), F.lit(" x"))
        )
    )
    assert fp1 != fp2


def test_changed_input_wipes_stale_buckets(spark, spark_transcripts, tmp_path):
    """Rerunning a warehouse against DIFFERENT input must not mix snapshots:
    buckets that produced rows under the old input but none under the new
    one have to disappear (code-review finding: dynamic partition overwrite
    only replaces buckets present in the new output)."""
    wh = str(tmp_path / "wh_changed")
    run_checkpointed(spark, spark_transcripts, wh)
    io = TableIO(spark, wh)
    old_buckets = {r.bucket for r in io.read("triples").select("bucket").distinct().collect()}
    assert old_buckets  # baseline produced data

    # new input: a single conversation → most buckets now empty
    one_conv = spark_transcripts.where(
        F.col("conv_id") == spark_transcripts.select("conv_id").first().conv_id
    )
    out = run_checkpointed(spark, one_conv, wh).toPandas()
    new_buckets = {r.bucket for r in io.read("triples").select("bucket").distinct().collect()}
    assert len(new_buckets) <= 1  # ONLY the new input's bucket survives
    # manifest holds only the new fingerprint
    fps = {r.input_fingerprint for r in io.read("manifest").select("input_fingerprint").distinct().collect()}
    assert fps == {input_fingerprint(one_conv)}
    # and the triples are exactly the single conversation's
    assert set(out.conv_id.unique()) == {one_conv.first().conv_id}
