"""Semantic pins for plans/shardops.py beyond the generic oracle lane
(tests/test_entry_queries.py covers the DuckDB compare at sf0.001):
contiguity/coverage invariants of the epoch shuffle, manifest consistency
with the assignment it summarizes, and checksum sensitivity — properties a
row-count/hash compare alone does not articulate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from prove_spark.plans.shardops import (
    EPOCH_SHUFFLE_SQL,
    N_SHARDS,
    SHARD_MANIFEST_SQL,
    epoch_shuffle,
    shard_manifest,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("shard_sf")
    docs = pd.DataFrame(
        [[i, f"word{i} common text body {i % 7}", "en", f"src{i % 3}", 20]
         for i in range(97)],  # prime count: no accidental shard alignment
        columns=DOC_COLS,
    )
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _duck(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).df()


def test_epoch_shuffle_positions_contiguous_and_cover_corpus(spark, shard_dir):
    got = epoch_shuffle(spark, shard_dir).toPandas()
    assert len(got) == 97
    assert sorted(got.doc_id) == list(range(97))  # every doc exactly once
    assert got.shard.between(0, N_SHARDS - 1).all()
    for _, grp in got.groupby("shard"):
        # positions are a contiguous 1..n ranking inside each shard
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))


def test_epoch_shuffle_is_deterministic_and_nontrivial(spark, shard_dir):
    a = epoch_shuffle(spark, shard_dir).toPandas().sort_values("doc_id")
    b = epoch_shuffle(spark, shard_dir).toPandas().sort_values("doc_id")
    assert (a.values == b.values).all()  # retry-identical
    # the order must be a shuffle, not the identity: within some shard the
    # hash ranking disagrees with doc_id order
    by_pos = a.sort_values(["shard", "pos"])
    assert any(
        list(grp.doc_id) != sorted(grp.doc_id)
        for _, grp in by_pos.groupby("shard")
    )


def test_epoch_shuffle_duckdb_oracle(spark, shard_dir):
    got = (
        epoch_shuffle(spark, shard_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        _duck(shard_dir, EPOCH_SHUFFLE_SQL)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got.values == want.values).all()


def test_shard_manifest_consistent_with_assignment(spark, shard_dir):
    man = shard_manifest(spark, shard_dir).toPandas().set_index("shard")
    assign = epoch_shuffle(spark, shard_dir).toPandas()
    counts = assign.groupby("shard").size()
    assert man.n_docs.sort_index().equals(counts.sort_index())
    assert int(man.n_docs.sum()) == 97


def test_shard_manifest_duckdb_oracle(spark, shard_dir):
    got = (
        shard_manifest(spark, shard_dir)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    want = (
        _duck(shard_dir, SHARD_MANIFEST_SQL)
        .sort_values("shard")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert (got.values == want.values).all()  # incl. bit-exact checksum


def test_write_shards_files_are_ordered_and_deterministic(spark, shard_dir, tmp_path):
    import glob

    from prove_spark.plans.shardops import write_shards

    write_shards(spark, shard_dir, f"{tmp_path}/epoch0")
    assign = (
        epoch_shuffle(spark, shard_dir)
        .toPandas()
        .set_index("doc_id")
    )
    seen = 0
    for k in range(N_SHARDS):
        files = glob.glob(f"{tmp_path}/epoch0/shard={k}/*.parquet")
        if not files:
            continue
        # hashpartitioning puts a whole shard in ONE task -> one file
        assert len(files) == 1
        df = pd.read_parquet(files[0])  # file row order == written order
        assert list(df.pos) == sorted(df.pos) == list(range(1, len(df) + 1))
        assert (assign.loc[df.doc_id, "shard"] == k).all()
        assert (assign.loc[df.doc_id, "pos"].values == df.pos.values).all()
        seen += len(df)
    assert seen == 97
    # re-export is row-identical (deterministic hash order): the property
    # that makes the manifest checksum usable after a copy
    write_shards(spark, shard_dir, f"{tmp_path}/epoch0b")
    for k in range(N_SHARDS):
        a = glob.glob(f"{tmp_path}/epoch0/shard={k}/*.parquet")
        b = glob.glob(f"{tmp_path}/epoch0b/shard={k}/*.parquet")
        assert len(a) == len(b)
        if a:
            assert pd.read_parquet(a[0]).equals(pd.read_parquet(b[0]))


def test_write_shards_plan_single_exchange_no_extra_sort(spark, shard_dir):
    import re

    from prove_spark.plans.shardops import _assigned, _t

    a = _assigned(_t(spark, shard_dir, "documents"), "text")
    plan = (
        a.sortWithinPartitions("shard", "h", "doc_id")
        .drop("h")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the explicit sort shares the window's keys, so it is elided: exactly
    # ONE Sort (the window's own) and ONE exchange in the whole export plan
    assert len(re.findall(r"(?m)^\s*[*+:\- ]*Sort \[", plan)) == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_checksum_detects_single_doc_change(spark, tmp_path):
    base = pd.DataFrame(
        [[i, f"text {i}", "en", "src0", 6] for i in range(20)],
        columns=DOC_COLS,
    )
    spark.createDataFrame(base).write.parquet(f"{tmp_path}/a/documents.parquet")
    mut = base.copy()
    mut.loc[mut.doc_id == 7, "text"] = "text 7 corrupted"
    spark.createDataFrame(mut).write.parquet(f"{tmp_path}/b/documents.parquet")
    a = shard_manifest(spark, f"{tmp_path}/a").toPandas().set_index("shard")
    b = shard_manifest(spark, f"{tmp_path}/b").toPandas().set_index("shard")
    # doc 7's shard is keyed on doc_id (unchanged) so counts agree everywhere,
    # but exactly that shard's checksum must move
    assert a.n_docs.sort_index().equals(b.n_docs.sort_index())
    diff = a.xor_checksum.sort_index().ne(b.xor_checksum.sort_index())
    assert diff.sum() == 1
