"""Semantic pins for plans/lmops.py beyond the generic oracle lane
(tests/test_entry_queries.py covers the DuckDB compare at sf0.001): the JL
projection is checked against an independent numpy evaluation of the same
deterministic sign matrix, and the bigram LM score against a hand-computed
fixture — both on crafted tables, since the sf corpora only exercise the
aggregate shape, not the arithmetic."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from prove_spark.plans.lmops import (
    _JL_SALT,
    BIGRAM_LM_SQL,
    D_PROJ,
    JL_PROJECT_SQL,
    bigram_lm_score,
    jl_project_embeddings,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def lm_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lm_sf")
    docs = pd.DataFrame(
        [
            [1, "a b a b", "en", "src1", 7],
            [2, "a b", "en", "src1", 3],
            [3, "x", "en", "src2", 1],  # single word: no transitions
            [4, "a c", "en", "src2", 3],
        ],
        columns=DOC_COLS,
    )
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    rng = np.random.default_rng(42)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [rng.normal(size=12).astype(np.float32) for _ in range(5)],
            "label": np.arange(5, dtype=np.int32) % 2,
        }
    )
    spark.createDataFrame(emb).write.parquet(f"{d}/embeddings.parquet")
    return str(d), emb


def _np_sign_matrix(d_in: int) -> np.ndarray:
    # independent evaluation of the portable-hash sign rule:
    # CONV(SUBSTR(MD5('jl|i|j'), 1, 15), 16, 10) % 6 -> {+1, -1, 0}
    import hashlib

    s = np.zeros((d_in, D_PROJ), dtype=np.int64)
    for i in range(d_in):
        for j in range(D_PROJ):
            h = int(
                hashlib.md5(f"{_JL_SALT}{i}|{j}".encode()).hexdigest()[:15], 16
            )
            m = h % 6
            s[i, j] = 1 if m == 0 else (-1 if m == 1 else 0)
    return s


def test_sign_matrix_is_sparse_balanced_and_nondegenerate():
    # the {+1,0,-1} ~ {1/6,1/6,2/3} Achlioptas mix should roughly hold on a
    # realistic input width; a degenerate all-zero column would silently
    # produce y = 0 for that output dim
    s = _np_sign_matrix(384)
    nz = np.count_nonzero(s, axis=0)
    assert (nz > 0).all(), "every output dim must receive some inputs"
    frac_nz = np.count_nonzero(s) / s.size
    assert 0.2 < frac_nz < 0.5  # expected 1/3
    # regression pin for the linear-mix defect this hash replaced: a
    # (a*i + b*j) % 6 rule is periodic in j, so distinct output dims were
    # bit-identical copies (rank-2 "projection"); every column pair must
    # now differ
    for a in range(D_PROJ):
        for b in range(a + 1, D_PROJ):
            assert (s[:, a] != s[:, b]).any(), f"columns {a},{b} identical"


def test_jl_projection_matches_numpy(spark, lm_dir):
    d, emb = lm_dir
    got = (
        jl_project_embeddings(spark, d)
        .toPandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    s = _np_sign_matrix(12)
    for _, row in got.iterrows():
        x = emb.loc[emb.vec_id == row.vec_id, "embedding"].iloc[0].astype(np.float64)
        # same reduction discipline: exact sum of the double products
        # (DECIMAL partials in-engine; math.fsum-free because the products
        # are summed exactly there — numpy's pairwise sum over <=12 terms
        # matches to quantization, so pin at the 1e-12 grid)
        expect = float(np.sum(x * s[:, int(row.j)]))
        assert abs(row.y - expect) < 1e-9
    # only dims with at least one non-zero sign appear
    assert set(got.j.unique()) == {
        j for j in range(D_PROJ) if np.count_nonzero(s[:, j]) > 0
    }


def test_jl_projection_duckdb_oracle_on_fixture(spark, lm_dir):
    d, _ = lm_dir
    got = (
        jl_project_embeddings(spark, d)
        .toPandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = (
        con.execute(JL_PROJECT_SQL)
        .df()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.vec_id.values == want.vec_id.values).all()
    assert (got.j.values == want.j.values).all()
    assert (got.y.values == want.y.values).all()  # bit-identical


def test_bigram_lm_score_hand_computed(spark, lm_dir):
    d, _ = lm_dir
    got = {
        r.doc_id: r
        for r in bigram_lm_score(spark, d).collect()
    }
    # corpus bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,b), doc4 (a,c)
    # cb: (a,b)=3 (b,a)=1 (a,c)=1; ctx: a=4, b=1; V = |{a,b,x,c}| = 4
    # p(a,b) = 4/8 = .5; p(b,a) = 2/5 = .4; p(a,c) = 2/8 = .25
    assert set(got) == {1, 2, 4}  # doc 3 has no transitions
    assert got[1].n_bigrams == 3
    assert abs(got[1].lm_score - (0.5 + 0.4 + 0.5) / 3) < 1e-12
    assert got[2].n_bigrams == 1
    assert abs(got[2].lm_score - 0.5) < 1e-12
    assert abs(got[4].lm_score - 0.25) < 1e-12


def test_bigram_lm_duckdb_oracle_on_fixture(spark, lm_dir):
    d, _ = lm_dir
    got = (
        bigram_lm_score(spark, d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = con.execute(BIGRAM_LM_SQL).df().sort_values("doc_id").reset_index(drop=True)
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.n_bigrams.values == want.n_bigrams.values).all()
    assert (got.lm_score.values == want.lm_score.values).all()  # bit-identical


# ---------------------------------------------------------------- BPE
BPE_TEXTS = [
    # self-adjacent run: 'aaa' = (a,a) twice per word, merges left-to-right
    # to [aa, a] (NOT [a, aa] or [aa, aa])
    [1, "aaa aaa aaa xy xy xy", "en", "s", 20],
    # back-to-back occurrences of the merged pair: 'abab' -> [ab, ab],
    # which then feeds a multi-char (ab, ab) merge in a later round
    [2, "abab abab", "en", "s", 9],
    # tie at equal count: (c,d) and (c,e) both 4 -> lexicographic min wins
    [3, "cd cd cd cd ce ce ce ce", "en", "s", 23],
]


def _py_bpe(word_counts: dict, rounds: int) -> list[tuple]:
    """Independent list-based BPE reference (no string-replace tricks):
    count all adjacent pairs weighted by word frequency, pick (count DESC,
    a ASC, b ASC), merge left-to-right non-overlapping."""
    vocab = {}
    for w, n in word_counts.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + n
    merges = []
    for t in range(1, rounds + 1):
        pairs: dict = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append(
            (t, a, b, a + b, cnt, len(pairs), sum(pairs.values()))
        )
        new: dict = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + n
        vocab = new
    return merges


@pytest.fixture(scope="module")
def bpe_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_sf")
    docs = pd.DataFrame(BPE_TEXTS, columns=DOC_COLS)
    spark.createDataFrame(docs).write.parquet(f"{d}/documents.parquet")
    return str(d)


def test_bpe_merges_vs_python_reference(spark, bpe_dir):
    from collections import Counter

    from prove_spark.plans.lmops import BPE_ROUNDS, bpe_merges

    got = (
        bpe_merges(spark, bpe_dir)
        .toPandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    words = Counter(" ".join(r[1] for r in BPE_TEXTS).split())
    want = _py_bpe(dict(words), BPE_ROUNDS)
    assert len(want) >= 5, "fixture must sustain several merge rounds"
    assert len(got) == len(want)
    for row, w in zip(got.itertuples(index=False), want):
        assert (
            row.round,
            row.sym_a,
            row.sym_b,
            row.merged,
            row.pair_count,
            row.n_distinct_pairs,
            row.total_pairs,
        ) == w
    # the crafted edges actually fired: a self-adjacent (a, a) merge and a
    # later multi-char merge both appear
    assert ("a", "a") in {(w[1], w[2]) for w in want}
    assert any(len(w[1]) > 1 or len(w[2]) > 1 for w in want)


def test_bpe_merges_duckdb_oracle_on_fixture(spark, bpe_dir):
    from prove_spark.plans.lmops import BPE_SQL, bpe_merges

    got = (
        bpe_merges(spark, bpe_dir)
        .toPandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{bpe_dir}/documents.parquet/*.parquet')"
    )
    want = con.execute(BPE_SQL).df().sort_values("round").reset_index(drop=True)
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_curriculum_bins_quartiles_and_oracle(spark, lm_dir):
    from prove_spark.plans.lmops import CURRICULUM_SQL, curriculum_bins

    d, _ = lm_dir
    got = (
        curriculum_bins(spark, d)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 3 (single word) has no score -> excluded; bins within a source
    # follow ascending score order
    assert set(got.doc_id) == {1, 2, 4}
    assert got.bin.between(1, 4).all()
    by_src = got.sort_values(["source", "lm_score", "doc_id"])
    for _, grp in by_src.groupby("source"):
        assert list(grp.bin) == sorted(grp.bin)  # monotone in score order
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(CURRICULUM_SQL).df().sort_values("doc_id").reset_index(drop=True)
    )
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.bin.values == want.bin.values).all()
    assert (got.lm_score.values == want.lm_score.values).all()


def test_lm_score_survives_empty_and_singleton(spark, tmp_path):
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame([], schema=schema).write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    assert bigram_lm_score(spark, str(tmp_path)).count() == 0


def test_chunk_documents_coverage_overlap_and_tail(spark, tmp_path):
    """The chunking invariants on a crafted corpus: (1) every token of every
    doc appears in >= 1 chunk and the chunk set reconstructs the doc
    exactly; (2) neighboring chunks overlap by W - S tokens; (3) a tail
    chunk carrying new tokens is emitted short, but a tail FULLY CONTAINED
    in the previous window is dropped (no duplicate passages); (4) a doc
    that fits one window — even one longer than S — yields exactly one
    chunk equal to the doc."""
    from prove_spark.plans.lmops import CHUNK_S, CHUNK_W, chunk_documents

    long_doc = " ".join(f"w{i}" for i in range(150))  # tail 145.. contained
    new_tail_doc = " ".join(f"t{i}" for i in range(70))  # tail 65-70 is new
    short_doc = "a b c"
    fits_one = " ".join(f"f{i}" for i in range(50))  # S < 50 <= W: one chunk
    docs = pd.DataFrame(
        [
            [1, long_doc, "en", "s", len(long_doc)],
            [2, short_doc, "en", "s", 5],
            [3, fits_one, "en", "s", len(fits_one)],
            [4, new_tail_doc, "en", "s", len(new_tail_doc)],
        ],
        columns=DOC_COLS,
    )
    spark.createDataFrame(docs).write.parquet(f"{tmp_path}/documents.parquet")
    got = (
        chunk_documents(spark, str(tmp_path))
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    one = got[got.doc_id == 2]
    assert len(one) == 1 and one.chunk_text.iloc[0] == short_doc
    assert one.n_tokens.iloc[0] == 3

    # (4): 50 tokens > S but <= W — the grid start at 49 is a pure suffix of
    # chunk 0 and must be dropped
    fits = got[got.doc_id == 3]
    assert len(fits) == 1 and fits.chunk_text.iloc[0] == fits_one

    # (3): 70 tokens — tokens 65-70 are NOT in chunk 0 (1..64), so the short
    # tail chunk at start 49 survives
    nt = got[got.doc_id == 4].reset_index(drop=True)
    assert len(nt) == 2
    assert nt.chunk_text.iloc[1] == " ".join(new_tail_doc.split(" ")[CHUNK_S:])
    assert nt.n_tokens.iloc[1] == 70 - CHUNK_S

    g = got[got.doc_id == 1].reset_index(drop=True)
    words = long_doc.split(" ")
    # starts 1, 49, 97 emitted; 145 dropped (chunk at 97 covers 97..150)
    assert len(g) == 3
    for k, row in g.iterrows():
        expect = words[k * CHUNK_S : k * CHUNK_S + CHUNK_W]
        assert row.chunk_text == " ".join(expect)
        assert row.n_tokens == len(expect)
    # reconstruction: stride prefixes of all but the last chunk + the whole
    # last chunk tile the doc exactly (coverage invariant (1))
    flat = [w for c in g.chunk_text[:-1] for w in c.split(" ")[:CHUNK_S]]
    flat += g.chunk_text.iloc[len(g) - 1].split(" ")
    assert flat == words
    # (2) neighbor overlap: last W-S tokens of chunk k == first W-S of k+1
    for k in range(len(g) - 1):
        a = g.chunk_text.iloc[k].split(" ")
        b = g.chunk_text.iloc[k + 1].split(" ")
        assert a[CHUNK_S:] == b[: CHUNK_W - CHUNK_S]
