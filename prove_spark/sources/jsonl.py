"""JSONL transcript ingestion: schema-enforced, splittable, with a corrupt-
record error lane.

Real transcript feeds (agent logs, chat exports) arrive as JSON Lines, so
the engine needs a first-class JSONL path next to parquet/Iceberg
(sources/tables.py) and CSV (sources/popularity.py). At 100 TB the
non-negotiables are:

* **Explicit schema.** Schema inference is a full extra pass over the
  corpus; the transcript schema is a contract (BASELINE.json input_hint),
  not something to rediscover per run.
* **Line-splittable scan.** The file is read with ``spark.read.text`` —
  newline-delimited, so a single 1 TB file still fans out across executors
  (a multiline JSON array would be ONE task) — and parsed with the
  ``from_json`` JVM expression. This also sidesteps Spark's
  QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on raw-JSON scans, whose
  documented workaround (``df.cache()``) is exactly what you cannot do to
  a 100 TB ingest scan.
* **Malformed lines must neither poison the pipeline nor vanish.**
  PERMISSIVE parsing routes unparseable lines AND type-mismatched fields to
  a corrupt lane (the ingest analogue of the pipeline's F11 error tagging —
  reference ProVe tags per-row fetch/parse errors rather than dropping them:
  html_fetching.py, refs_html_to_evidences.py). Both lanes are plain
  filters over one shared text scan — one *plan*, so consuming a single
  lane costs a single pass; materializing BOTH lanes should go through
  ``stage_transcripts_jsonl`` (one lane-partitioned staging write, one
  parse pass) rather than two separate write actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..datagen import TRANSCRIPT_SCHEMA

CORRUPT_COL = "_corrupt_record"


def _parsed_schema() -> StructType:
    base = StructType.fromDDL(TRANSCRIPT_SCHEMA)
    return StructType(base.fields + [StructField(CORRUPT_COL, StringType())])


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL transcript feed → ``(good, corrupt)`` lanes.

    ``good`` carries the transcript contract columns
    (conv_id, turn_idx, role, text, tool, ts) for every line that parsed
    cleanly; ``corrupt`` carries the raw offending line (``raw_line``) for
    quarantine/replay. Three failure classes quarantine: broken JSON, rows
    whose fields failed the declared types, and structurally-valid JSON
    missing the record's key fields (NULL conv_id or turn_idx — ``{}`` is
    valid JSON but not a transcript turn). Blank lines are dropped (they
    are framing, not records). Both lanes are lazy filters over the same
    single-column text scan; note each lane you *materialize* is its own
    action over that scan — to write both, use ``stage_transcripts_jsonl``.
    """
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        "value",
        F.from_json(
            "value",
            _parsed_schema(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r"),
    ).select("value", "r.*")
    bad = (
        F.col(CORRUPT_COL).isNotNull()
        | F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
    )
    good = parsed.filter(~bad).drop(CORRUPT_COL, "value")
    corrupt = parsed.filter(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.col("value")).alias("raw_line")
    )
    return good, corrupt


def stage_transcripts_jsonl(
    spark: SparkSession, path: str, staging_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Materialize BOTH lanes of a JSONL feed in ONE pass over the raw text.

    ``read_transcripts_jsonl`` returns two lazy filters over a shared plan —
    cheap until you *write* both lanes, at which point each write action
    re-scans the feed and re-runs ``from_json`` (two full parse passes at
    ingest scale). This helper instead writes a single lane-partitioned
    parquet staging table (``lane=good`` / ``lane=corrupt``), so the raw
    text is scanned and parsed exactly once; the returned frames are
    partition-pruned columnar reads of that staging table.

    Returns ``(good, corrupt)`` with the same column contracts as
    ``read_transcripts_jsonl``.
    """
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        "value",
        F.from_json(
            "value",
            _parsed_schema(),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r"),
    ).select("value", "r.*")
    bad = (
        F.col(CORRUPT_COL).isNotNull()
        | F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
    )
    lanes = parsed.select(
        F.when(bad, F.lit("corrupt")).otherwise(F.lit("good")).alias("lane"),
        # corrupt rows keep the raw line for replay; good rows carry NULL so
        # the staging table doesn't duplicate every payload
        F.when(bad, F.coalesce(F.col(CORRUPT_COL), F.col("value")))
        .alias("raw_line"),
        *[f.name for f in StructType.fromDDL(TRANSCRIPT_SCHEMA).fields],
    )
    lanes.write.mode("overwrite").partitionBy("lane").parquet(staging_dir)
    # explicit schema on read-back: a feed where one lane is empty writes no
    # files for it, and an all-empty feed writes none at all — inference
    # would die while a declared schema just yields an empty typed frame
    staged_schema = StructType(
        [StructField("raw_line", StringType())]
        + StructType.fromDDL(TRANSCRIPT_SCHEMA).fields
        + [StructField("lane", StringType())]
    )
    staged = spark.read.schema(staged_schema).parquet(staging_dir)
    good = staged.filter(F.col("lane") == "good").drop("lane", "raw_line")
    corrupt = staged.filter(F.col("lane") == "corrupt").select("raw_line")
    return good, corrupt


def write_transcripts_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write transcripts as JSONL (one object per line, ISO-8601 timestamps).

    The output round-trips bit-exactly through ``read_transcripts_jsonl``
    (per-turn text equality under stable (conv_id, turn_idx) ordering —
    the input_hint invariant), which the tests pin.
    """
    df.write.mode(mode).json(path)
