"""External popularity (sitelink-count) CSV source — S9/J8 as a real operator.

The reference ranks ambiguous entity candidates by sitelink counts read from
an external CSV (functions.py:642-647, 661-669). This module materializes
the deterministic SITELINKS dim as that CSV (once per process) and reads it
back through the real `spark.read.csv` path with an explicit schema — so the
external-format scan, header handling, and typed parse are exercised by a
registered query, not only by unit tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..dictionaries import SITELINKS

_CSV_PATH: str | None = None


def popularity_csv_path() -> str:
    """Write the sitelinks CSV once per process; deterministic content."""
    global _CSV_PATH
    if _CSV_PATH is None or not os.path.exists(_CSV_PATH):
        d = tempfile.mkdtemp(prefix="prove_spark_sitelinks_")
        path = os.path.join(d, "sitelinks.csv")
        with open(path, "w") as f:
            f.write("qid,n_connected_site\n")
            for qid, n in SITELINKS:
                f.write(f"{qid},{n}\n")
        _CSV_PATH = path
    return _CSV_PATH


def read_popularity(spark: SparkSession) -> DataFrame:
    """The external CSV scan: explicit schema (no inference job), header row.
    Dimension-sized by contract — callers broadcast it into joins."""
    return spark.read.csv(
        popularity_csv_path(),
        header=True,
        schema="qid string, n_connected_site int",
    )
