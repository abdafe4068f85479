"""JVM expression kernels vs Python kernels: property equivalence.

The pipeline's default engine evaluates the deterministic model stand-ins as
built-in Spark expressions (functions/jvm_kernels.py); the Arrow engine and
the pandas oracle use functions/text.py. These tests pin the two
implementations bit-identical on an adversarial string corpus (unicode
punctuation, empty strings, negations, regex metacharacters, long repeats) —
any regex-dialect or rounding divergence fails here before it can skew P/R.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from prove_spark.functions import jvm_kernels as J
from prove_spark.functions import text as K

CORPUS = [
    "",
    " ",
    "plain words here.",
    "Alpha Corp acquired Beta Labs.",
    "alpha corp does not own beta labs.",
    "indeed alpha corp owns beta labs.",
    "（extra） fullwidth parens",
    "quotes ``like this'' and -- dashes ––—",
    "-LRB-bracketed-RRB- fever style",
    "MiXeD CaSe With  Multiple   Spaces",
    "tabs\tand\nnewlines\r\nhere.",
    "numbers 123 mixed a1b2c3",
    "dots... ellipsis!? bang?! mix. end",
    "a" * 500,
    "word " * 200,
    "no punctuation at all",
    "!!!???...",
    "ünïcödé wörds señor",
    "日本語のテキスト。英語 mixed.",
    "trailing space ",
    " leading space",
    "\tleading tab sentence.",
    "trailing newline sentence.\n",
    "mid. \t tab-separated. next.",
    "never say never again.",
    "it is not so.",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(pd.DataFrame({"s": CORPUS, "t": CORPUS[::-1]}))


def test_normalize_expr_matches_kernel(spark, corpus_df):
    got = [
        r.n for r in corpus_df.select(J.normalize_expr(F.col("s")).alias("n")).collect()
    ]
    want = [K.normalize_text(s) for s in CORPUS]
    assert got == want


def test_token_set_expr_matches_kernel(spark, corpus_df):
    got = [
        sorted(r.ts)
        for r in corpus_df.select(J.token_set_expr(F.col("s")).alias("ts")).collect()
    ]
    want = [sorted(K.token_set(s)) for s in CORPUS]
    assert got == want


def test_similarity_expr_matches_kernel(spark, corpus_df):
    got = [
        r.sim
        for r in corpus_df.select(
            J.similarity_expr(F.col("s"), F.col("t")).alias("sim")
        ).collect()
    ]
    want = [K.similarity(a, b) for a, b in zip(CORPUS, CORPUS[::-1])]
    assert got == want  # bit-exact, no tolerance


def test_nli_expr_matches_kernel(spark):
    cases = [
        ("alpha corp", "beta labs", "alpha corp owns beta labs", s)
        for s in CORPUS
    ] + [
        ("alpha corp", "beta labs", "alpha corp owns beta labs",
         "alpha corp does not own beta labs."),
        ("alpha corp", "beta labs", "alpha corp owns beta labs",
         "indeed alpha corp owns beta labs."),
    ]
    pdf = pd.DataFrame(cases, columns=["subj", "obj", "verb", "sent"])
    df = spark.createDataFrame(pdf)
    got = [
        tuple(r.p)
        for r in df.select(
            J.nli_expr(
                F.col("subj"), F.col("obj"), F.col("verb"), F.col("sent")
            ).alias("p")
        ).collect()
    ]
    want = [K.nli_probs(*c) for c in cases]
    assert got == want


def test_sentences_expr_matches_kernel(spark, corpus_df):
    got = [
        list(r.arr)
        for r in corpus_df.select(
            J.sentences_expr(F.col("s"), 16384).alias("arr")
        ).collect()
    ]
    want = [K.split_sentences(s) for s in CORPUS]
    assert got == want


def test_detect_claim_exprs_match_kernel(spark):
    from prove_spark.dictionaries import ALIASES, PREDICATES

    aliases = sorted({a for a, _ in ALIASES})
    patterns = sorted({p for _, p, _, _ in PREDICATES})
    sents = CORPUS + [
        f"{aliases[0]} {patterns[0]} {aliases[-1]}.",
        f"indeed {aliases[0]} {patterns[0]} {aliases[-1]}.",
        f"{aliases[0]} never {patterns[0]} {aliases[-1]}.",
        f"{aliases[0]} does not {patterns[0]} {aliases[-1]}.",
        f"{aliases[2]} {patterns[1]} {aliases[3]}",
    ]
    df = spark.createDataFrame(pd.DataFrame({"sentence": sents}))
    ok, s, p, o = J.detect_claim_exprs(F.col("sentence"), aliases, patterns)
    rows = df.select(
        ok.alias("ok"), s.alias("s"), p.alias("p"), o.alias("o")
    ).collect()
    got = [(r.s, r.p, r.o) if r.ok else None for r in rows]
    want = [K.detect_claim(x, aliases, patterns) for x in sents]
    assert got == want


def test_claim_prefilter_is_superset_of_matches(spark):
    """The cheap pattern prefilter (claim_prefilter_expr) may only ever DROP
    sentences the full claim regex would reject — never a true match, even
    with exotic whitespace between pattern words (normalize collapses \\s+
    to single spaces before the full regex runs)."""
    from prove_spark.dictionaries import ALIASES, PREDICATES

    aliases = sorted({a for a, _ in ALIASES})
    patterns = sorted({p for _, p, _, _ in PREDICATES})
    sents = CORPUS + [
        f"{aliases[0]} {patterns[0]} {aliases[-1]}.",
        f"{aliases[0]} works\tat {aliases[-1]}.",  # tab inside the pattern
        f"{aliases[0]} Works  At {aliases[-1]}.",  # case + double space
        f"indeed {aliases[0]} {patterns[0]} {aliases[-1]}.",
        f"{aliases[0]} does not {patterns[0]} {aliases[-1]}.",
        "filler with no predicate pattern at all.",
    ]
    df = spark.createDataFrame(pd.DataFrame({"sentence": sents}))
    pre = J.claim_prefilter_expr(F.col("sentence"), patterns)
    kept = {r.sentence for r in df.where(pre).collect()}
    for x in sents:
        if K.detect_claim(x, aliases, patterns) is not None:
            assert x in kept, f"prefilter dropped a true claim: {x!r}"
    # and it does drop pattern-free fillers (the point of the prefilter)
    assert "filler with no predicate pattern at all." not in kept
