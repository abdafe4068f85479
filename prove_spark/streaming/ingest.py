"""Structured Streaming ingest path (optional; the reference has no true
streaming — its service loop is a Mongo poll, ProVe_main_service.py:293-327).

For continuous transcript arrival we expose the same sentence/claim kernels
over a readStream source with event-time watermarking. The batch pipeline
stays the primary path (BASELINE.json is batch); this module exists so a
Kafka/files feed can reuse stage kernels unchanged via foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_STRUCT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet (swap for Kafka in prod)."""
    return (
        spark.readStream.schema(TRANSCRIPT_STRUCT)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_turn_counts(stream: DataFrame) -> DataFrame:
    """Watermarked per-hour turn counts by role (late data ≤ 10 min)."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )


ASSEMBLED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), False),
        T.StructField("assembled_text", T.StringType(), True),
        T.StructField("complete", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType()), True),
        T.StructField("texts", T.ArrayType(T.StringType()), True),
        T.StructField("last_ts_ms", T.LongType(), True),
    ]
)


def assemble_conversations_stateful(
    stream: DataFrame, gap_ms: int = 60_000
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per
    conv_id, buffer turns across micro-batches; when no new turn arrives for
    gap_ms of event time (state timeout), emit the conversation assembled in
    stable turn_idx order — the streaming twin of the batch W4 turn-assembly
    invariant. State is bounded: (turn_idx, text) pairs per open conversation
    only; closed conversations leave the store via the timeout path."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            turn_idxs, texts, _ = state.get
            order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(turn_idxs)],
                    "max_turn_idx": [max(turn_idxs)],
                    "assembled_text": [" ".join(texts[i] for i in order)],
                    "complete": [True],
                }
            )
            state.remove()
            return
        turn_idxs: list[int] = []
        texts: list[str] = []
        last_ms = 0
        if state.exists:
            turn_idxs, texts, last_ms = state.get
            turn_idxs, texts = list(turn_idxs), list(texts)
        for pdf in pdfs:
            for t_idx, txt, ts in zip(pdf["turn_idx"], pdf["text"], pdf["ts"]):
                turn_idxs.append(int(t_idx))
                # NULL text == empty turn (matches batch extract_sentences;
                # str(None) would inject a literal "None" token)
                texts.append("" if txt is None else str(txt))
                t = pd.Timestamp(ts)
                if not pd.isna(t):  # NaT must not poison the event clock
                    last_ms = max(last_ms, int(t.value // 1_000_000))
        state.update((turn_idxs, texts, last_ms))
        # timeout must be ahead of the current watermark or Spark kills the
        # query (INVALID_TIMEOUT_TIMESTAMP) — a conversation whose rows all
        # carry NULL ts would otherwise set a 1970-epoch timeout
        base_ms = max(last_ms, state.getCurrentWatermarkMs())
        state.setTimeoutTimestamp(base_ms + gap_ms)
        return
        yield  # generator contract

    return (
        stream.withWatermark("ts", "1 minute")
        .groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_turn_stats(stream: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Event-time SESSION windows per conv_id — the streaming twin of the
    batch sessionize_events query: rows whose event times fall within `gap`
    of each other merge into one variable-length window. State is bounded:
    a session is final (and its state evicted) once the watermark passes its
    close, which is also why the sink must be append-mode — sessions only
    emit on finalization, never partially."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "conv_id",
            "n_turns",
        )
    )


def enrich_turns_with_conv_meta(
    stream: DataFrame, conv_dim: DataFrame
) -> DataFrame:
    """Stream-static broadcast enrichment — join each streamed turn against a
    static conversation-metadata dimension (source/channel/tenant) on conv_id.

    Stream-static equi-joins are STATELESS in Spark: no watermark, no state
    store — each micro-batch executes a fresh batch join. The static side is
    explicitly broadcast: the stream never shuffles, each executor probes a
    local hash map — the only stream-static shape that holds at 100 TB/day
    ingest (a shuffled join would re-exchange every micro-batch). Left join:
    a turn whose conversation is not yet registered in the dim flows through
    with NULL metadata rather than being silently dropped.

    Dim-refresh contract: for a plain parquet-backed dimension the file
    listing is PINNED when the DataFrame is created — an out-of-band
    overwrite makes running batches fail with FILE_NOT_EXIST, it does not
    refresh them. Pick up dim updates by restarting the query from its
    checkpoint with a re-read dim (offsets resume; already-emitted rows are
    immutable) or by backing the dim with a catalog table format that
    re-snapshots per batch (Delta/Iceberg)."""
    dupes = set(conv_dim.columns) & set(stream.columns) - {"conv_id"}
    if dupes:
        raise ValueError(f"conv_dim columns collide with stream: {sorted(dupes)}")
    return stream.join(F.broadcast(conv_dim), "conv_id", "left")


def dedup_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup — the training-ingest primitive for replayed /
    at-least-once feeds: duplicates within the watermark horizon are dropped
    with BOUNDED state. `dropDuplicatesWithinWatermark` (Spark 3.5+) evicts
    a key's state once the watermark passes its event time — a plain
    streaming dropDuplicates keeps every key forever, which on an unbounded
    transcript feed is an OOM with a delay. Exactly-once-per-key holds only
    within the horizon: a duplicate arriving later than the watermark delay
    is a late row the sink's idempotent write (batch_id partition overwrite,
    see stream_triples_foreach_batch) must absorb instead.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


PROGRESS_SCHEMA = (
    "conv_id string, n_turns_total long, max_turn_idx int, n_batches int"
)


def conversation_progress_tws(stream: DataFrame) -> DataFrame:
    """Per-conversation running progress via `transformWithStateInPandas` —
    the Spark 4 arbitrary-state API that supersedes applyInPandasWithState
    (which `assemble_conversations_stateful` keeps for the
    emit-on-completion shape): a typed ValueState per conv_id accumulates
    turn count / max turn index across micro-batches and emits an updated
    progress row per batch the conversation appears in.

    Why this API at scale: state lives in the per-partition state store
    keyed by conv_id (RocksDB-backed in prod — state size is bounded by
    live conversations, not stream history), the processor declares its
    state SCHEMA so the store is typed and evolvable, and TTL support
    (`getValueState(ttlDurationMs=...)`) gives declarative state expiry
    where the old API needed manual timeout bookkeeping.

    Runtime note: the TWS Python state client speaks protobuf to the JVM
    state server and needs a state-store provider with column-family
    support (RocksDBStateStoreProvider — HDFSBackedStateStore raises
    STATE_STORE_MULTIPLE_COLUMN_FAMILIES). This container ships no
    installed `google.protobuf`, but streaming/protobuf_runtime.py locates
    and validates a pure-Python runtime on the host and the execution test
    RUNS against it in a fresh subprocess (tests/tws_exec_probe.py),
    asserting cross-micro-batch state accumulation against batch ground
    truth."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProgressProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "progress", "n_turns long, max_idx int, n_batches int"
            )

        def handleInputRows(self, key, rows, timer_values):
            n, mx = 0, -1
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, int(pdf["turn_idx"].max()))
            prev = self._state.get() if self._state.exists() else (0, -1, 0)
            cur = (prev[0] + n, max(prev[1], mx), prev[2] + 1)
            self._state.update(cur)
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns_total": [cur[0]],
                    "max_turn_idx": [cur[1]],
                    "n_batches": [cur[2]],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=ProgressProcessor(),
        outputStructType=PROGRESS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def join_turn_tool_streams(
    turns: DataFrame, tools: DataFrame, within: str = "10 minutes"
) -> DataFrame:
    """Stream-stream inner join: pair each assistant/user turn with the tool
    output that lands in the same conversation within `within` of it — the
    continuous analog of the batch turn-assembly correlation.

    Scale/state story: BOTH sides carry watermarks and the join condition
    bounds event time on both ends, which is exactly what lets Spark evict
    state — each side's state store holds at most `within` worth of rows
    per conv_id partition, no matter how long the streams run. Without the
    time bound the state grows forever (Spark would reject the unbounded
    stream-stream join in append mode for that reason)."""
    t = turns.withWatermark("ts", within).alias("t")
    o = tools.withWatermark("ts", within).alias("o")
    return t.join(
        o,
        (F.col("t.conv_id") == F.col("o.conv_id"))
        & (F.col("o.ts") >= F.col("t.ts"))
        & (F.col("o.ts") <= F.col("t.ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.ts").alias("turn_ts"),
        F.col("o.tool").alias("tool"),
        F.col("o.ts").alias("tool_ts"),
        (F.unix_micros(F.col("o.ts")) - F.unix_micros(F.col("t.ts"))).alias(
            "lag_us"
        ),
    )


def triples_batch_writer(
    spark: SparkSession,
    out_path: str | None = None,
    io=None,
    table: str = "stream_triples",
):
    """The foreachBatch callback for the KG bridge: full batch pipeline per
    micro-batch, written idempotently keyed on batch_id.

    foreachBatch alone is only at-least-once (a crash between the write and
    the checkpoint commit replays the batch), so a replayed batch must
    replace exactly its own batch_id partition instead of appending
    duplicates. Two sinks, same semantics:

    * ``io`` (a sources.tables.TableIO) — the lakehouse path:
      ``overwrite_buckets(..., "batch_id")`` = Iceberg
      ``overwritePartitions()`` on a batch_id-partitioned table (atomic
      dynamic REPLACE PARTITIONS snapshot commit) or the parquet fallback's
      dynamic partition overwrite. The Iceberg branch is fake-driven-
      executed in tests/test_streaming.py (same posture as
      tests/test_iceberg_branch.py for the batch path).
    * ``out_path`` — raw parquet dir with dynamic partition overwrite
      (the e2e replay-idempotency test drives this for real).
    """
    from ..pipeline.run import build_triples

    if (io is None) == (out_path is None):
        raise ValueError("exactly one of out_path / io must be given")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = build_triples(
            spark, batch_df, persist_sentences=False
        ).withColumn("batch_id", F.lit(batch_id))
        if io is not None:
            io.overwrite_buckets(triples, table, "batch_id")
            return
        (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return process


def stream_triples_foreach_batch(
    spark: SparkSession,
    stream: DataFrame,
    out_path: str | None = None,
    io=None,
    table: str = "stream_triples",
):
    """Micro-batch bridge: run the full batch KG pipeline per micro-batch,
    writing idempotently via triples_batch_writer (see its docstring for
    the replay semantics of the parquet and Iceberg sinks)."""
    process = triples_batch_writer(spark, out_path=out_path, io=io, table=table)
    return stream.writeStream.foreachBatch(process).outputMode("append")
