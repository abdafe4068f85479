"""Prefix-filter similarity join (plans/simops.py): crafted recall
fixtures, a seeded randomized brute-force equivalence check, and the
pruning pin that proves the prefix filter actually cuts candidates (the
DuckDB oracle lane in test_entry_queries.py separately pins hash-exact
equality vs the brute-force SQL at sf0.001)."""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from prove_spark.plans.simops import (
    THETA_DEN,
    THETA_NUM,
    _prefix_candidates,
    _prefix_relation,
    _release_caches,
    jaccard_prefix_join,
)

SF_DIR = "/root/testdata/sf0.001"
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _shingle_set(text: str) -> set[str]:
    ws = text.split(" ")
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def _true_pairs(texts: dict[int, str]) -> dict[tuple[int, int], tuple[int, int, int]]:
    """Brute-force ground truth: (doc_a, doc_b) -> (na, nb, inter) for every
    pair with exact Jaccard >= THETA_NUM/THETA_DEN."""
    out = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = _shingle_set(texts[a]), _shingle_set(texts[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter * THETA_DEN >= THETA_NUM * len(sa | sb):
            out[(a, b)] = (len(sa), len(sb), inter)
    return out


def _run(spark, tmp_path, texts: dict[int, str]):
    docs = pd.DataFrame(
        [[i, t, "en", "src", len(t)] for i, t in sorted(texts.items())],
        columns=DOC_COLS,
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    rows = jaccard_prefix_join(spark, str(tmp_path)).collect()
    got = {(r.doc_a, r.doc_b): (r.na, r.nb, r.inter) for r in rows}
    assert len(got) == len(rows), "duplicate pairs emitted"
    _release_caches()
    return got


def test_crafted_near_dups(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = {
        0: base,
        1: base,  # exact dup -> jaccard 1
        2: base.replace("today", "tomorrow"),  # near dup (tail edit)
        3: "completely different words about spark shuffles and parquet scans",
        4: "a b",  # too short for any shingle
    }
    truth = _true_pairs(texts)
    got = _run(spark, tmp_path, texts)
    assert got == truth
    assert (0, 1) in got  # the exact dup must be found
    assert all(3 not in pair and 4 not in pair for pair in got)


def test_randomized_matches_bruteforce(spark, tmp_path):
    """Seeded fuzz: word-soup docs from a small vocabulary plus mutated
    copies — the adversarial regime for prefix filtering (many shared hot
    shingles, ties everywhere in the frequency order). The Spark result
    must equal the pure-python brute force exactly."""
    rng = random.Random(20260818)
    vocab = [f"w{i}" for i in range(12)]
    texts: dict[int, str] = {}
    for i in range(30):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(rng.randint(16, 40)))
    # copies: exact dups (jaccard 1) and one-word mutations (straddle θ)
    for j in range(10):
        src = texts[j].split(" ")
        if j % 2 == 0:
            k = rng.randrange(len(src))
            src[k] = rng.choice(vocab)
        texts[30 + j] = " ".join(src)
    truth = _true_pairs(texts)
    got = _run(spark, tmp_path, texts)
    assert got == truth
    assert len(truth) >= 5, "fixture regressed: too few true pairs to be meaningful"


def test_prefix_prunes_candidates(spark):
    """The point of the operator: candidates << inverted-index pairs, while
    the final result is a subset of the candidates (soundness is pinned by
    the brute-force oracle lane; this pins the efficiency claim)."""
    sh, prefix = _prefix_relation(spark, SF_DIR)
    cand = _prefix_candidates(prefix)
    cand_pairs = {(r.doc_a, r.doc_b) for r in cand.select("doc_a", "doc_b").collect()}
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    n_inverted = (
        a.join(b, (F.col("s") == F.col("s_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    result_pairs = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_join(spark, SF_DIR).select("doc_a", "doc_b").collect()
    }
    _release_caches()
    assert result_pairs <= cand_pairs
    assert len(cand_pairs) * 20 < n_inverted, (
        f"prefix filter stopped pruning: {len(cand_pairs)} candidates vs "
        f"{n_inverted} inverted-index pairs"
    )


def test_empty_and_degenerate(spark, tmp_path):
    got = _run(spark, tmp_path, {0: "a b", 1: "c"})
    assert got == {}
