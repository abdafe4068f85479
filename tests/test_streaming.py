"""Structured Streaming smoke: file-source transcript stream → watermarked
windowed aggregation → memory sink, driven to completion synchronously."""

from __future__ import annotations

import os

import pytest

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


def test_stateful_conversation_assembly(spark, tmp_path):
    """applyInPandasWithState: turns buffered across micro-batches; a
    conversation is emitted (in stable turn_idx order) once event time
    passes its inactivity gap."""
    import pandas as pd

    from prove_spark.streaming.ingest import (
        assemble_conversations_stateful,
        read_transcript_stream,
    )

    src = tmp_path / "stream_src2"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(conv, idxs, t0):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": pd.array(idxs, dtype="int32"),
                "role": "user",
                "text": [f"{conv} turn {i}." for i in idxs],
                "tool": "",
                "ts": pd.Series(
                    [t0 + pd.Timedelta(seconds=i) for i in idxs],
                    dtype="datetime64[us]",
                ),
            }
        )

    # batch 1: conversation A, turns out of order
    rows("conv-A", [2, 0, 1], base).to_parquet(src / "f1.parquet")
    stream = read_transcript_stream(spark, str(src))
    out = assemble_conversations_stateful(stream, gap_ms=60_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("assembled")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM assembled").count() == 0  # A still open
        # batch 2: a much-later conversation advances the watermark past A's gap
        rows("conv-Z", [0], base + pd.Timedelta(minutes=30)).to_parquet(
            src / "f2.parquet"
        )
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM assembled").collect()
        assert len(got) == 1
        r = got[0]
        assert r.conv_id == "conv-A" and r.n_turns == 3 and r.max_turn_idx == 2
        assert r.assembled_text == "conv-A turn 0. conv-A turn 1. conv-A turn 2."
        assert r.complete
    finally:
        q.stop()


def test_session_window_stream(spark, tmp_path):
    """session_window: two turns 10 s apart merge into one session (end =
    last event + gap); a turn 20 min later starts a new one. The first
    session emits only after the watermark passes its close."""
    import pandas as pd

    from prove_spark.streaming.ingest import (
        read_transcript_stream,
        session_turn_stats,
    )

    src = tmp_path / "sw_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(conv, offsets_s, t0):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": pd.array(range(len(offsets_s)), dtype="int32"),
                "role": "user",
                "text": "x",
                "tool": "",
                "ts": pd.Series(
                    [t0 + pd.Timedelta(seconds=s) for s in offsets_s],
                    dtype="datetime64[us]",
                ),
            }
        )

    # conv-A: turns at 0s and 10s (one session) + one at 20min (a second)
    rows("conv-A", [0, 10, 1200], base).to_parquet(src / "f1.parquet")
    stream = read_transcript_stream(spark, str(src))
    q = (
        session_turn_stats(stream, gap="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2's 40-min row advances the watermark to 30 min, past both
        # conv-A session closes (5m10s and 25m); conv-Z's own session stays
        # open (its close 45m is ahead of the watermark)
        rows("conv-Z", [0], base + pd.Timedelta(minutes=40)).to_parquet(
            src / "f2.parquet"
        )
        q.processAllAvailable()
        got = sorted(
            spark.sql(
                "SELECT conv_id, n_turns, session_start, session_end FROM sessions"
            ).collect(),
            key=lambda r: r.session_start,
        )
        assert [(r.conv_id, r.n_turns) for r in got] == [
            ("conv-A", 2),
            ("conv-A", 1),
        ]
        # session end = last event + gap: 10s+5min, then a lone-turn 5min
        assert (got[0].session_end - got[0].session_start).total_seconds() == 310.0
        assert (got[1].session_end - got[1].session_start).total_seconds() == 300.0
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replayed rows inside the horizon are
    dropped with bounded state; a second micro-batch replaying batch 1's
    keys (still within the watermark) adds nothing."""
    import pandas as pd

    from prove_spark.streaming.ingest import dedup_stream, read_transcript_stream

    src = tmp_path / "dd_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")

    def rows(pairs, t0):
        return pd.DataFrame(
            {
                "conv_id": [c for c, _ in pairs],
                "turn_idx": pd.array([i for _, i in pairs], dtype="int32"),
                "role": "user",
                "text": "x",
                "tool": "",
                "ts": pd.Series([t0] * len(pairs), dtype="datetime64[us]"),
            }
        )

    # batch 1 contains an in-batch duplicate; batch 2 replays batch 1 plus
    # one genuinely new key, seconds later (well inside the 10 min horizon)
    rows([("c1", 0), ("c1", 0), ("c1", 1)], base).to_parquet(src / "f1.parquet")
    stream = read_transcript_stream(spark, str(src))
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) c FROM dd_out").first().c == 2
        rows(
            [("c1", 0), ("c1", 1), ("c2", 0)], base + pd.Timedelta(seconds=5)
        ).to_parquet(src / "f2.parquet")
        q.processAllAvailable()
        got = sorted(
            (r.conv_id, r.turn_idx)
            for r in spark.sql("SELECT conv_id, turn_idx FROM dd_out").collect()
        )
        assert got == [("c1", 0), ("c1", 1), ("c2", 0)]
    finally:
        q.stop()


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static left join: matched conv gets dim columns, unregistered
    conv flows through with NULLs; a dim update is picked up by restarting
    the query from its checkpoint with a re-read dim (the documented refresh
    contract — a parquet dim's file listing is pinned at DataFrame creation);
    the plan broadcasts the dim. Colliding dim columns are rejected eagerly."""
    import pandas as pd
    import pytest

    from prove_spark.streaming.ingest import (
        enrich_turns_with_conv_meta,
        read_transcript_stream,
    )

    src = tmp_path / "enrich_src"
    dim_dir = tmp_path / "conv_dim"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")

    def turns(convs_idxs):
        return pd.DataFrame(
            {
                "conv_id": [c for c, _ in convs_idxs],
                "turn_idx": pd.array([i for _, i in convs_idxs], dtype="int32"),
                "role": "user",
                "text": "x",
                "tool": "",
                "ts": pd.Series([base] * len(convs_idxs), dtype="datetime64[us]"),
            }
        )

    turns([("conv-A", 0), ("conv-B", 0)]).to_parquet(src / "b1.parquet")
    dim_pdf = pd.DataFrame({"conv_id": ["conv-A"], "source": ["web"]})
    spark.createDataFrame(dim_pdf).write.mode("overwrite").parquet(str(dim_dir))

    ckpt = str(tmp_path / "enrich_ckpt")
    sink = str(tmp_path / "enrich_sink")

    def start_query():
        conv_dim = spark.read.parquet(str(dim_dir))
        enriched = enrich_turns_with_conv_meta(
            read_transcript_stream(spark, str(src)), conv_dim
        )
        return (
            enriched.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def sink_rows():
        return {
            (r.conv_id, r.turn_idx, r.source)
            for r in spark.read.parquet(sink)
            .select("conv_id", "turn_idx", "source")
            .collect()
        }

    q = start_query()
    try:
        q.processAllAvailable()
        assert sink_rows() == {("conv-A", 0, "web"), ("conv-B", 0, None)}
        # the executed micro-batch plan must broadcast the static side
        plan = q._jsq.explainInternal(False)
        assert "broadcasthashjoin" in plan.lower().replace(" ", "")
    finally:
        q.stop()

    # dim refresh = restart from the checkpoint with a re-read dim: offsets
    # resume (batch 1's files are NOT reprocessed — no duplicate rows), the
    # new batch sees the updated dim, already-emitted rows stay immutable
    spark.createDataFrame(
        pd.DataFrame({"conv_id": ["conv-A", "conv-B"], "source": ["web", "api"]})
    ).write.mode("overwrite").parquet(str(dim_dir))
    turns([("conv-B", 1)]).to_parquet(src / "b2.parquet")
    q = start_query()
    try:
        q.processAllAvailable()
        assert sink_rows() == {
            ("conv-A", 0, "web"),
            ("conv-B", 0, None),  # immutable — NOT retro-enriched or replayed
            ("conv-B", 1, "api"),  # post-restart batch sees the updated dim
        }
    finally:
        q.stop()

    # colliding non-key columns are rejected before the query starts
    bad_dim = spark.read.parquet(str(dim_dir)).withColumnRenamed("source", "text")
    with pytest.raises(ValueError, match="collide"):
        enrich_turns_with_conv_meta(read_transcript_stream(spark, str(src)), bad_dim)


def test_stream_triples_foreach_batch_matches_batch_and_replays_idempotent(
    spark, spark_transcripts, tmp_path, golden_triples
):
    """End-to-end incremental KG construction: the foreachBatch bridge over
    a 2-micro-batch file stream must produce EXACTLY the batch pipeline's
    triples (contract: conversations arrive batch-complete — each source
    file holds whole conversations; cross-batch assembly is the stateful
    operator's job), and a full replay against the same output path (fresh
    checkpoint, same batch ids) must overwrite its own partitions instead
    of duplicating — the at-least-once → exactly-once idempotency claim."""
    from pyspark.sql import functions as F

    from prove_spark.pipeline.run import build_triples
    from prove_spark.streaming.ingest import stream_triples_foreach_batch

    src = str(tmp_path / "src")
    out = str(tmp_path / "triples_out")
    # two source files, each holding only COMPLETE conversations
    for bucket in (0, 1):
        (
            spark_transcripts.where(F.abs(F.hash("conv_id")) % 2 == bucket)
            .repartition(1)
            .write.mode("append")
            .parquet(src)
        )

    def run(checkpoint: str):
        stream = (
            spark.readStream.schema(spark_transcripts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_triples_foreach_batch(spark, stream, out)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(str(tmp_path / "cp1"))
    got = spark.read.parquet(out)
    assert {r.batch_id for r in got.select("batch_id").distinct().collect()} == {0, 1}

    batch = build_triples(spark, spark_transcripts)
    key = ["claim_id", "subj", "pred", "obj", "verdict"]
    stream_rows = sorted(map(tuple, got.select(*key).collect()))
    batch_rows = sorted(map(tuple, batch.select(*key).collect()))
    assert stream_rows == batch_rows and len(batch_rows) == len(golden_triples)

    # replay: fresh checkpoint re-delivers batches 0 and 1 against the same
    # sink — dynamic partition overwrite must land on identical state
    run(str(tmp_path / "cp2"))
    again = sorted(
        map(tuple, spark.read.parquet(out).select(*key).collect())
    )
    assert again == stream_rows


def test_stream_stream_join_matches_batch(spark, spark_transcripts, tmp_path):
    """Watermarked stream-stream join: turns x tool outputs within 10 min in
    the same conversation must yield exactly the static join's pairs (no
    row is late beyond the watermark when the source replays files)."""
    from pyspark.sql import functions as F

    from prove_spark.streaming.ingest import (
        TRANSCRIPT_STRUCT,
        join_turn_tool_streams,
    )

    src = str(tmp_path / "src")
    spark_transcripts.write.mode("overwrite").parquet(src)

    def reader():
        return (
            spark.readStream.schema(TRANSCRIPT_STRUCT)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

    turns_s = reader().where(F.col("role") != "tool")
    tools_s = reader().where(F.col("role") == "tool")
    q = (
        join_turn_tool_streams(turns_s, tools_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_tool_pairs")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in spark.sql(
                "SELECT conv_id, turn_idx, tool, lag_us FROM turn_tool_pairs"
            ).collect()
        }
    finally:
        q.stop()

    static = spark.read.parquet(src)
    t = static.where(F.col("role") != "tool").alias("t")
    o = static.where(F.col("role") == "tool").alias("o")
    expected = {
        tuple(r)
        for r in t.join(
            o,
            (F.col("t.conv_id") == F.col("o.conv_id"))
            & (F.col("o.ts") >= F.col("t.ts"))
            & (F.col("o.ts") <= F.col("t.ts") + F.expr("INTERVAL 10 minutes")),
        )
        .select(
            F.col("t.conv_id"),
            F.col("t.turn_idx"),
            F.col("o.tool"),
            (F.unix_micros(F.col("o.ts")) - F.unix_micros(F.col("t.ts"))).alias(
                "lag_us"
            ),
        )
        .collect()
    }
    assert got == expected and len(expected) > 0


def test_transform_with_state_progress(spark, spark_transcripts, tmp_path):
    """transformWithStateInPandas EXECUTION: the typed ValueState must
    accumulate across micro-batches — a conversation split over two source
    files ends at its full turn count with n_batches = 2, and the LAST
    update row per conversation matches the batch ground truth.

    The TWS Python state client needs `google.protobuf`, which this sandbox
    doesn't ship as an installed distribution — but a validated pure-Python
    runtime located on the host (prove_spark/streaming/protobuf_runtime.py)
    wires it via env vars, which must be set BEFORE the JVM starts so the
    streaming workers inherit them: the execution therefore runs in a fresh
    subprocess (tests/tws_exec_probe.py) instead of the shared session.
    Skips ONLY when no usable protobuf runtime exists anywhere on the host —
    a provably environmental gate, not a missing-coverage one."""
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from prove_spark.streaming.ingest import (
        TRANSCRIPT_STRUCT,
        conversation_progress_tws,
    )
    from prove_spark.streaming.protobuf_runtime import protobuf_runtime_env

    src = str(tmp_path / "src")
    # split every conversation across two files: turn parity decides the
    # file, so most convs appear in BOTH micro-batches
    for parity in (0, 1):
        (
            spark_transcripts.where(F.col("turn_idx") % 2 == parity)
            .repartition(1)
            .write.mode("append")
            .parquet(src)
        )
    stream = (
        spark.readStream.schema(TRANSCRIPT_STRUCT)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # the plan + output contract build in-process regardless of the runtime
    progress = conversation_progress_tws(stream)
    assert progress.schema["n_turns_total"].dataType.typeName() == "long"

    pb_env = protobuf_runtime_env()
    if pb_env is None:
        pytest.skip(
            "no usable google.protobuf runtime on this host "
            "(TWS state client needs it; see protobuf_runtime.py)"
        )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [pb_env.get("PYTHONPATH"), repo, env.get("PYTHONPATH")]
    env.update(pb_env)
    env["PYTHONPATH"] = os.pathsep.join(p for p in parts if p)
    probe = os.path.join(repo, "tests", "tws_exec_probe.py")
    out = subprocess.run(
        [sys.executable, probe, src, str(tmp_path / "cp")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TWS_OK" in out.stdout, out.stdout[-500:]



def test_stream_foreach_batch_iceberg_sink_branch(
    spark, spark_transcripts, monkeypatch
):
    """Fake-driven EXECUTION of the foreachBatch → Iceberg sink branch
    (mirror of tests/test_iceberg_branch.py for the streaming path): the
    batch pipeline runs for REAL on a micro-batch, and the write seam is
    recorded — first batch creates the batch_id-partitioned table, a
    REPLAYED batch issues overwritePartitions (Iceberg dynamic REPLACE
    PARTITIONS — the at-least-once → exactly-once upgrade), and an empty
    micro-batch writes nothing."""
    # patch the CONCRETE class — `pyspark.sql.DataFrame` is the abstract
    # base in Spark 4; classic-session frames override writeTo on the
    # classic subclass, so a base-class patch never fires
    from pyspark.sql.classic.dataframe import DataFrame

    from prove_spark.sources.tables import TableIO
    from prove_spark.streaming.ingest import triples_batch_writer
    from tests.test_iceberg_branch import FakeSpark, FakeWriterV2

    writes: list = []
    monkeypatch.setattr(
        DataFrame, "writeTo", lambda self, ident: FakeWriterV2(writes, ident)
    )
    catalog_spark = FakeSpark(tables=set())
    io = TableIO(catalog_spark, "/tmp/wh", use_iceberg=True)
    process = triples_batch_writer(spark, io=io)

    batch = spark_transcripts.limit(40)
    process(batch, 3)
    assert len(writes) == 1
    ident, chain = writes[0]
    assert ident == "prove.stream_triples"
    assert chain[0] == "using(iceberg)" and chain[-1] == "create"
    assert any("partitionedBy" in c and "batch_id" in c for c in chain)

    # table now exists in the catalog → the replayed batch REPLACES its
    # own batch_id partition instead of appending duplicates
    catalog_spark.catalog.tables.add("prove.stream_triples")
    writes.clear()
    process(batch, 3)
    assert writes == [("prove.stream_triples", ["overwritePartitions"])]

    # an empty micro-batch never reaches the sink
    writes.clear()
    process(spark_transcripts.limit(0), 4)
    assert writes == []


def test_triples_batch_writer_requires_exactly_one_sink(spark):
    from prove_spark.streaming.ingest import triples_batch_writer

    with pytest.raises(ValueError):
        triples_batch_writer(spark)
    with pytest.raises(ValueError):
        triples_batch_writer(spark, out_path="/tmp/x", io=object())
