"""Subprocess probe for the transformWithStateInPandas EXECUTION test.

Runs in its own interpreter because the TWS protobuf runtime is wired via
environment variables (PYTHONPATH +
TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK — see
prove_spark/streaming/protobuf_runtime.py) that must be set before the JVM
starts: Spark's Python workers inherit the JVM's environment, and the
shared pytest session's JVM is already up without them.

argv: <src_parquet_dir> <checkpoint_dir>
The src dir holds the transcripts split into two files by turn parity (the
parent test writes them), so `maxFilesPerTrigger=1` yields two micro-batches
and most conversations accumulate state across both. Asserts the LAST
update row per conversation equals the batch ground truth, prints TWS_OK.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from prove_spark.streaming.ingest import (
    TRANSCRIPT_STRUCT,
    conversation_progress_tws,
)


def main(src: str, cp: str) -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        # TWS state schemas need per-family column families — only the
        # RocksDB provider supports them (HDFSBackedStateStore raises
        # STATE_STORE_MULTIPLE_COLUMN_FAMILIES)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .appName("tws-exec-probe")
        .getOrCreate()
    )
    stream = (
        spark.readStream.schema(TRANSCRIPT_STRUCT)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        conversation_progress_tws(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", cp)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM conv_progress").collect()
    finally:
        q.stop()

    # final state per conversation = the row with the highest n_batches
    final: dict = {}
    for r in rows:
        if r.conv_id not in final or r.n_batches > final[r.conv_id].n_batches:
            final[r.conv_id] = r
    truth = {
        r.conv_id: r
        for r in spark.read.parquet(src)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_idx"),
            F.countDistinct(F.col("turn_idx") % 2).alias("n_parities"),
        )
        .collect()
    }
    assert set(final) == set(truth), (len(final), len(truth))
    multi_batch = 0
    for cid, r in final.items():
        t = truth[cid]
        assert r.n_turns_total == t.n_turns, cid
        assert r.max_turn_idx == t.max_idx, cid
        assert r.n_batches == t.n_parities, cid
        multi_batch += int(r.n_batches > 1)
    # the state-accumulation claim needs conversations that actually spanned
    # both micro-batches
    assert multi_batch > 0
    print(f"TWS_OK convs={len(final)} multi_batch={multi_batch}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
