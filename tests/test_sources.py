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


def test_jsonl_round_trip(spark, tmp_path):
    """JSONL write → read preserves every transcript column bit-exactly
    (per-turn text equality under stable (conv_id, turn_idx) ordering — the
    input-contract invariant), including sub-second timestamps and NULL
    tool fields (omitted on write, restored as NULL on read)."""
    from prove_spark.datagen import transcripts_df
    from prove_spark.sources.jsonl import read_transcripts_jsonl, write_transcripts_jsonl

    src = transcripts_df(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "feed")
    write_transcripts_jsonl(src, out)
    good, corrupt = read_transcripts_jsonl(spark, out)

    assert corrupt.count() == 0
    key = lambda r: (r.conv_id, r.turn_idx)
    orig = sorted(src.collect(), key=key)
    back = sorted(good.collect(), key=key)
    assert good.columns == src.columns
    assert len(back) == len(orig) > 0
    assert back == orig  # full-row equality: role/text/tool/ts all exact


def test_jsonl_corrupt_lane(spark, tmp_path):
    """Broken JSON and type-mismatched fields both land in the corrupt lane
    with the raw line preserved verbatim; clean rows are unaffected; blank
    lines are framing, not records."""
    from prove_spark.sources.jsonl import read_transcripts_jsonl

    p = tmp_path / "feed.jsonl"
    bad_type = (
        '{"conv_id":"c2","turn_idx":"notanint","role":"user",'
        '"text":"x","tool":null,"ts":"2026-01-01T00:01:00.000Z"}'
    )
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2026-01-01T00:00:00.000Z"}\n'
        '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"yo",'
        '"tool":"search","ts":"2026-01-01T00:00:05.000Z"}\n'
        "{broken json!!\n"
        "\n"
        "{}\n"
        "null\n"
        + bad_type
        + "\n"
    )
    good, corrupt = read_transcripts_jsonl(spark, str(p))

    rows = {(r.conv_id, r.turn_idx): r for r in good.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1)}
    assert rows[("c1", 1)].tool == "search"
    assert rows[("c1", 0)].tool is None

    # broken JSON, type-mismatch, valid-but-keyless JSON ({}), and scalar
    # JSON (null) all quarantine with the raw line preserved
    raw = sorted(r.raw_line for r in corrupt.collect())
    assert raw == sorted(["{broken json!!", bad_type, "{}", "null"])


def test_jsonl_fuzz_parse_or_quarantine(spark, tmp_path):
    """Fuzz the JSONL reader: every non-blank line must land in EXACTLY one
    lane (parse or quarantine) — never crash, never silently drop. Seeded."""
    import json
    import random

    from prove_spark.sources.jsonl import read_transcripts_jsonl

    rng = random.Random(20260817)
    frag = [
        '{"conv_id":', '"c1"', "}", "{", "[1,2]", "null", '"turn_idx":',
        '"üñï"', "\\", '"', ",", ":", "123", "-", "tool",
        '{"a":{"b":[', "日本語", "NaN", "true",
    ]
    lines, n_valid = [], 0
    for i in range(400):
        kind = rng.random()
        if kind < 0.35:  # valid row
            lines.append(
                json.dumps(
                    {
                        "conv_id": f"c{rng.randrange(20)}",
                        "turn_idx": rng.randrange(50),
                        "role": rng.choice(["user", "assistant"]),
                        "text": rng.choice(["hi", "x y z", "ü", ""]),
                        "tool": rng.choice([None, "search"]),
                        "ts": "2026-01-01T00:00:00.000Z",
                    }
                )
            )
            n_valid += 1
        elif kind < 0.45:
            lines.append("")  # blank framing line — dropped by contract
        else:  # garbage of random fragments
            lines.append("".join(rng.choice(frag) for _ in range(rng.randrange(1, 8))))
    p = tmp_path / "fuzz.jsonl"
    p.write_text("\n".join(lines) + "\n")

    good, corrupt = read_transcripts_jsonl(spark, str(p))
    n_good, n_corrupt = good.count(), corrupt.count()
    n_nonblank = sum(1 for ln in lines if ln.strip())
    assert n_good + n_corrupt == n_nonblank  # exactly one lane per line
    assert n_good >= n_valid  # every valid row parses (garbage may too, e.g. "null")


def test_jsonl_staged_single_pass_parity(spark, tmp_path):
    """stage_transcripts_jsonl (ONE lane-partitioned staging write, one
    from_json pass) returns the same lanes as the lazy two-filter reader,
    and both lanes read back from pruned parquet partitions."""
    from prove_spark.sources.jsonl import (
        read_transcripts_jsonl,
        stage_transcripts_jsonl,
    )

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2026-01-01T00:00:00.000Z"}\n'
        "{broken json!!\n"
        '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"yo",'
        '"tool":"search","ts":"2026-01-01T00:00:05.000Z"}\n'
        "{}\n"
    )
    lazy_good, lazy_corrupt = read_transcripts_jsonl(spark, str(p))
    good, corrupt = stage_transcripts_jsonl(
        spark, str(p), str(tmp_path / "staging")
    )
    assert good.columns == lazy_good.columns
    key = lambda r: (r.conv_id, r.turn_idx)
    assert sorted(good.collect(), key=key) == sorted(
        lazy_good.collect(), key=key
    )
    assert sorted(r.raw_line for r in corrupt.collect()) == sorted(
        r.raw_line for r in lazy_corrupt.collect()
    )
    # the staged reads are partition-pruned scans of the staging table, not
    # re-reads of the raw feed
    files = good.inputFiles()
    assert files and all("/staging/" in f for f in files)
    assert all("feed.jsonl" not in f for f in files)


def test_jsonl_staged_one_lane_empty(spark, tmp_path):
    """A feed with no corrupt lines writes no lane=corrupt partition; the
    explicit read schema still yields a typed empty frame (and vice versa
    for an all-corrupt feed)."""
    from prove_spark.sources.jsonl import stage_transcripts_jsonl

    clean = tmp_path / "clean.jsonl"
    clean.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2026-01-01T00:00:00.000Z"}\n'
    )
    good, corrupt = stage_transcripts_jsonl(
        spark, str(clean), str(tmp_path / "s1")
    )
    assert good.count() == 1 and corrupt.count() == 0
    assert corrupt.columns == ["raw_line"]

    dirty = tmp_path / "dirty.jsonl"
    dirty.write_text("{nope\n{}\n")
    good, corrupt = stage_transcripts_jsonl(
        spark, str(dirty), str(tmp_path / "s2")
    )
    assert good.count() == 0 and corrupt.count() == 2
    assert good.columns == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
