"""Lakehouse table layer: Iceberg when available, parquet fallback.

The production design (BASELINE.json) materializes `triples` / `entities` /
`run_status` / `stage_metrics` as Iceberg v2 tables and resumes from
snapshot-pinned manifests. The Iceberg runtime jar is not in this sandbox,
so TableIO transparently degrades to directory-per-table parquet with the
same write semantics we rely on for resume: idempotent per-bucket overwrite
(dynamic partition overwrite ≈ Iceberg REPLACE PARTITIONS).

Replaces the reference's MongoDB sinks (utils/mongo_handler.py:134-349) and
SQLite read path (functions.py:45-103).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Minimal catalog: name → path under a warehouse root."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.use_iceberg = iceberg_available(spark)
        os.makedirs(warehouse, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

    def overwrite_buckets(self, df: DataFrame, table: str, bucket_col: str = "bucket") -> None:
        """Idempotent per-bucket replace: dynamic partition overwrite keyed by
        the bucket column — re-running a bucket replaces exactly its files
        (the parquet stand-in for Iceberg REPLACE PARTITIONS)."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(bucket_col)
            .parquet(self.path(table))
        )


def with_bucket(df: DataFrame, col: str = "conv_id", n_buckets: int = 32) -> DataFrame:
    """Stable bucket id for checkpointing/layout: xxhash64-based, NOT Spark's
    partition id (which changes with parallelism — resume must not)."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    )
