"""Per-partition checkpointed lineage + metrics + resume.

The reference restarts whole entities via a Mongo status collection and a
retry counter (ProVe_main_service.py:240-271, utils/mongo_handler.py:280-349).
Our batch equivalent (BASELINE.json: "resumable from checkpoint with
per-partition lineage + metrics"):

- The triple output is laid out by a STABLE bucket id
  (pmod(xxhash64(conv_id), n_buckets)) — independent of cluster size, so a
  resume on different parallelism reuses completed work.
- After each bucket group commits, a manifest row (bucket, n_rows,
  n_convs, wall_sec, input_fingerprint, completed_ts) is appended to the
  `manifest` table — that is the lineage + metrics record.
- Resume = anti-join: buckets in the manifest (for the same input
  fingerprint) are skipped; remaining buckets are recomputed and written
  with idempotent per-bucket dynamic-partition overwrite, so a crash
  mid-bucket can only produce a bucket that is later fully replaced.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.tables import TableIO, with_bucket

MANIFEST_SCHEMA = (
    "bucket int, n_rows long, n_convs long, wall_sec double, "
    "input_fingerprint string, completed_ts timestamp"
)


def input_fingerprint(transcripts: DataFrame) -> str:
    """Order-insensitive content fingerprint of the input slice (cheap agg).

    Pins a manifest to its exact input: resume against changed input recomputes
    everything rather than mixing snapshots.
    """
    row = transcripts.select(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "text")).alias("h"),
        F.count("*").alias("n"),
    ).first()
    return f"{row.h}:{row.n}"


def completed_buckets(io: TableIO, fingerprint: str) -> set[int]:
    if not io.exists("manifest"):
        return set()
    rows = (
        io.read("manifest")
        .where(F.col("input_fingerprint") == fingerprint)
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r.bucket for r in rows}


def run_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    config: PipelineConfig = DEFAULT_CONFIG,
    bucket_groups: int = 4,
    fail_after_groups: int | None = None,
) -> DataFrame:
    """Build triples with per-bucket-group checkpointing; returns the final
    triples table reader.

    bucket_groups: how many commit units the n_buckets are folded into (each
    commit = one Spark job over a subset of conversations + one manifest
    append). fail_after_groups: test hook — raise after k commits to simulate
    a mid-run crash.
    """
    from .run import build_triples

    io = TableIO(spark, warehouse)
    fp = input_fingerprint(transcripts)
    # Changed input ⇒ fresh run: dynamic partition overwrite only replaces
    # buckets PRESENT in the new output, so a bucket that produced rows under
    # the old input but none under the new one would otherwise survive and
    # mix snapshots. Wipe both tables when any manifest row carries a
    # different fingerprint.
    if io.exists("manifest"):
        other = (
            io.read("manifest")
            .where(F.col("input_fingerprint") != fp)
            .limit(1)
            .count()
        )
        if other:
            io.drop("triples")
            io.drop("manifest")
    elif io.exists("triples"):
        # Orphaned data: a crash between overwrite_buckets and the manifest
        # append leaves triples with no manifest. Nothing proves those files
        # came from THIS input, and with no manifest rows every bucket reads
        # as not-done — so the fingerprint-mismatch wipe above can never
        # fire. Wipe unconditionally; the rerun recomputes everything.
        io.drop("triples")
    done = completed_buckets(io, fp)

    bucketed = with_bucket(transcripts, "conv_id", config.n_buckets)
    groups = [
        [b for b in range(config.n_buckets) if b % bucket_groups == g]
        for g in range(bucket_groups)
    ]
    committed = 0
    for group in groups:
        todo = [b for b in group if b not in done]
        if not todo:
            continue
        t0 = time.time()
        slice_df = bucketed.where(F.col("bucket").isin(todo))
        caches: list = []
        triples = build_triples(
            spark, slice_df.drop("bucket"), config, cache_registry=caches
        )
        out = with_bucket(triples, "conv_id", config.n_buckets)
        io.overwrite_buckets(out, "triples", "bucket")
        for df in caches:  # drop this group's cached intermediates
            df.unpersist()
        _append_bucket_manifest(spark, io, todo, time.time() - t0, fp)
        committed += 1
        if fail_after_groups is not None and committed >= fail_after_groups:
            raise RuntimeError(f"simulated failure after {committed} commits")
    return _read_triples_or_empty(spark, io)


def _empty_triples_schema() -> str:
    """Empty-but-typed triples frame schema: a run (or delta) whose output
    is zero rows writes no parquet files at all, and a raw read would die on
    schema inference. Derived from the pipeline's own TRIPLES_DDL (plus the
    bucket partition column this module appends) so the fallback cannot
    drift from the real output contract."""
    from .run import TRIPLES_DDL

    return TRIPLES_DDL + ", bucket int"


def _read_triples_or_empty(spark: SparkSession, io: TableIO) -> DataFrame:
    if not io.exists("triples"):
        return spark.createDataFrame([], schema=_empty_triples_schema())
    return io.read("triples")


def _append_bucket_manifest(
    spark: SparkSession, io: TableIO, buckets: list[int], wall: float, fp: str
) -> None:
    """Append one lineage row per bucket, with stats read back from the
    files just WRITTEN (recomputing the output frame would re-run the whole
    pipeline for the group). Buckets whose write produced zero rows — or a
    table whose every file was just deleted — still get rows, with zero
    stats."""
    stats = (
        (
            io.read("triples")
            .where(F.col("bucket").isin(buckets))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("conv_id").alias("n_convs"),
            )
            .collect()
        )
        if io.exists("triples")
        else []
    )
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    by_bucket = {int(s.bucket): s for s in stats}
    manifest = spark.createDataFrame(
        [
            (
                b,
                int(by_bucket[b].n_rows) if b in by_bucket else 0,
                int(by_bucket[b].n_convs) if b in by_bucket else 0,
                wall,
                fp,
                now,
            )
            for b in buckets  # empty buckets still get lineage rows
        ],
        schema=MANIFEST_SCHEMA,
    )
    io.append(manifest, "manifest")


def incremental_update(
    spark: SparkSession,
    transcripts_now: DataFrame,
    changed_conv_ids: DataFrame,
    warehouse: str,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Targeted refresh of an existing triples table: recompute ONLY the
    buckets containing changed conversations, leaving every other bucket's
    files untouched. The incremental-maintenance counterpart to
    [run_checkpointed]'s full build (whose fingerprint check treats ANY
    input change as a fresh run) — when a day's delta lands in a 100 TB
    corpus, cost is proportional to the delta's bucket footprint, not the
    corpus.

    `changed_conv_ids` (one `conv_id` column) must list ADDED, UPDATED and
    DELETED conversations — a deletion is only reflected by recomputing its
    bucket from `transcripts_now` (which no longer contains it). The bucket
    id is the same stable pmod(xxhash64(conv_id)) the full build lays files
    out by, so at scale the `transcripts_now` read prunes to the touched
    partitions when the transcript lake shares that layout.

    Correctness details: a touched bucket whose recompute yields zero rows
    is explicitly deleted (dynamic partition overwrite only replaces
    partitions present in the NEW output — stale files would survive
    otherwise); manifest rows are appended for every touched bucket with
    the new input fingerprint, so per-bucket lineage records when each
    bucket was last written. After an incremental update the manifest
    intentionally carries mixed fingerprints — a subsequent
    run_checkpointed sees that as changed input and does a full rebuild,
    never mixing snapshots silently."""
    from .run import build_triples

    io = TableIO(spark, warehouse)
    if not io.exists("triples") or not io.exists("manifest"):
        raise ValueError(
            "incremental_update needs an existing triples+manifest table; "
            "run run_checkpointed first"
        )
    # touched bucket ids: manifest-scale (<= n_buckets ints) — safe collect
    touched = sorted(
        r.bucket
        for r in with_bucket(changed_conv_ids, "conv_id", config.n_buckets)
        .select("bucket")
        .distinct()
        .collect()
    )
    if not touched:
        return io.read("triples")
    fp = input_fingerprint(transcripts_now)
    t0 = time.time()
    bucketed = with_bucket(transcripts_now, "conv_id", config.n_buckets)
    caches: list = []
    triples = build_triples(
        spark,
        bucketed.where(F.col("bucket").isin(touched)).drop("bucket"),
        config,
        cache_registry=caches,
    )
    out = with_bucket(triples, "conv_id", config.n_buckets).persist()
    io.overwrite_buckets(out, "triples", "bucket")
    # buckets the NEW output produced rows for (bucket-scale collect) — this
    # must come from `out`, NOT a read-back of the table: a touched bucket
    # that went empty still has its stale partition on disk at this point
    # (dynamic overwrite never saw it) and a read-back would count it as
    # written, which is exactly the stale state the delete exists to fix
    written = {
        int(r.bucket) for r in out.select("bucket").distinct().collect()
    }
    out.unpersist()
    io.delete_buckets("triples", [b for b in touched if b not in written])
    for df in caches:
        df.unpersist()
    # the stats read-back and the final read both guard on io.exists: a
    # delta that empties EVERY remaining bucket leaves a triples dir with
    # no parquet files (only _SUCCESS), which a raw read cannot infer a
    # schema from — same fallback run_checkpointed uses
    _append_bucket_manifest(spark, io, touched, time.time() - t0, fp)
    return _read_triples_or_empty(spark, io)


def stage_metrics(io: TableIO) -> DataFrame:
    """Lineage/metrics read path (A7-shaped parser-stats analog)."""
    return io.read("manifest").orderBy("bucket", "completed_ts")


def bucket_file_counts(io: TableIO, table: str) -> dict[int, int]:
    """Visible parquet files per bucket partition, via the Hadoop FS API
    (s3a/hdfs/file all behave identically — see TableIO). Bucket-scale
    listing (<= n_buckets dirs), same driver-side bound as the manifest."""
    if io.use_iceberg:
        raise NotImplementedError(
            "Iceberg tables carry their own file inventory and rewrite "
            "action (metadata `files` table + rewrite_data_files); this "
            "listing is the parquet-layout path"
        )
    if not io.exists(table):
        # fresh warehouse / wrong name: an empty inventory (so compaction
        # is a clean no-op) beats an opaque Py4J FileNotFoundException
        return {}
    fs, root = io._fs(io.path(table))
    counts: dict[int, int] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("bucket=")):
            continue
        n = sum(
            1
            for f in fs.listStatus(st.getPath())
            if f.getPath().getName().endswith(".parquet")
        )
        counts[int(name.split("=", 1)[1])] = n
    return counts


def compact_buckets(
    spark: SparkSession,
    warehouse: str,
    table: str = "triples",
    max_files_per_bucket: int = 1,
) -> list[int]:
    """Small-file compaction for the bucket-partitioned layout — the
    maintenance pass a long-lived table needs after many [incremental_update]
    deltas (each touched-bucket rewrite is one file, but repeated partial
    builds and resumes accumulate fragments). Rewrites ONLY buckets whose
    visible file count exceeds the bound, via the same idempotent dynamic
    partition overwrite the resume path uses; every other bucket's files
    stay byte-untouched (pinned in tests). Returns the compacted bucket ids.

    Scale shape: detection is a bucket-scale FS listing (no data read);
    the rewrite reads only the fragmented buckets (partition-pruned scan)
    and `repartition(k, "bucket")` hash-routes each bucket to exactly one
    task, so dynamic partitioning emits exactly one file per bucket.
    Iceberg mode is a documented non-goal here: Iceberg ships its own
    `rewrite_data_files` maintenance action — use that."""
    io = TableIO(spark, warehouse)
    counts = bucket_file_counts(io, table)
    fragmented = sorted(
        b for b, n in counts.items() if n > max_files_per_bucket
    )
    if not fragmented:
        return []
    df = io.read(table).where(F.col("bucket").isin(fragmented))
    out = df.repartition(len(fragmented), "bucket")
    io.overwrite_buckets(out, table, "bucket")
    return fragmented
