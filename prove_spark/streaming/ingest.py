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


def stream_triples_foreach_batch(
    spark: SparkSession, stream: DataFrame, out_path: str
):
    """Micro-batch bridge: run the full batch KG pipeline per micro-batch.

    foreachBatch gives exactly-once parquet appends keyed by batch id and
    lets the streaming path reuse every batch stage without reimplementation.
    """
    from ..pipeline.run import build_triples

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples = build_triples(spark, batch_df, persist_sentences=False)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return stream.writeStream.foreachBatch(process).outputMode("append")
