"""S9/J8: external CSV scan + join (reference: sitelink-count CSV join,
functions.py:642-647, 661-665) and the table IO layer's format handling."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_csv_scan_and_join(spark):
    """Write a sitelink-count-shaped CSV, read with explicit schema, and
    left-join it to a qid frame — the reference's N_connected_site sort."""
    d = tempfile.mkdtemp(prefix="csv_src_")
    path = os.path.join(d, "sitelinks.csv")
    with open(path, "w") as f:
        f.write("qid,n_connected_site\n")
        for i in range(1, 21):
            f.write(f"Q{i},{(i * 7) % 13}\n")

    sites = spark.read.csv(path, header=True, schema="qid string, n_connected_site int")
    qids = spark.range(1, 31).select(
        F.concat(F.lit("Q"), F.col("id").cast("string")).alias("qid")
    )
    joined = (
        qids.join(sites, "qid", "left")
        .orderBy(F.desc_nulls_last("n_connected_site"), F.asc("qid"))
        .collect()
    )
    assert len(joined) == 30
    # highest sitelink count first (i*7 % 13 == 12 only for i=11 in 1..20)
    assert joined[0].qid == "Q11" and joined[0].n_connected_site == 12
    # qids without CSV rows survive the left join with NULL count
    assert sum(1 for r in joined if r.n_connected_site is None) == 10


def test_csv_malformed_rows_are_null(spark):
    """PERMISSIVE mode: a malformed numeric lands as NULL, row not dropped."""
    d = tempfile.mkdtemp(prefix="csv_bad_")
    path = os.path.join(d, "bad.csv")
    with open(path, "w") as f:
        f.write("qid,n_connected_site\nQ1,5\nQ2,notanumber\n")
    df = spark.read.csv(path, header=True, schema="qid string, n_connected_site int")
    rows = {r.qid: r.n_connected_site for r in df.collect()}
    assert rows == {"Q1": 5, "Q2": None}
