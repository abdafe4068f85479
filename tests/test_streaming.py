"""Structured Streaming smoke: file-source transcript stream → watermarked
windowed aggregation → memory sink, driven to completion synchronously."""

from __future__ import annotations

import os

from prove_spark.streaming.ingest import read_transcript_stream, windowed_turn_counts


def test_windowed_stream_counts(spark, spark_transcripts, tmp_path):
    src = str(tmp_path / "stream_src")
    spark_transcripts.write.mode("overwrite").parquet(src)
    # remove _SUCCESS etc. not needed; file source reads parquet parts

    stream = read_transcript_stream(spark, src)
    agg = windowed_turn_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turn_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT SUM(n_turns) AS total FROM turn_counts"
        ).first()
        assert got.total == spark_transcripts.count()
        roles = {
            r.role for r in spark.sql("SELECT DISTINCT role FROM turn_counts").collect()
        }
        assert roles == {"user", "assistant", "tool"}
    finally:
        q.stop()
