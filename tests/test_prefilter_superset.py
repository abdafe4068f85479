"""Property tests of the claim-detect prefilter's superset guarantee.

The scaling win (VERDICT r3: the prefilter removed the dominant, worst-
scaling regex stage's CPU) rests on one claim: the cheap prefilter over the
RAW lowercased sentence can NEVER drop a sentence the full claim regex
would match after normalize_text. These tests fuzz that implication with
adversarial whitespace (tabs, newlines, NBSP, ideographic space),
metacharacter junk, fullwidth-normalized punctuation, and case variation —
in BOTH regex dialects (Python re twin and java.util.regex via a Spark
expression) — plus the dialect-parity property the r3 ADVICE flagged: both
engines' prefilters must keep exactly the same sentences, including ones
separated by Unicode whitespace that Java's bare \\s would miss.
"""

from __future__ import annotations

import random
import re

import pandas as pd
import pytest

from prove_spark.dictionaries import ALIASES, PREDICATES
from prove_spark.functions import jvm_kernels as J
from prove_spark.functions import text as K

ALIAS_LIST = sorted({a for a, _ in ALIASES})
PATTERN_LIST = sorted({p for _, p, _, _ in PREDICATES})

NBSP = " "
THIN = " "
IDEO = "　"
NEL = "\x85"

# whitespace candidates: ASCII + the Unicode spaces Python \s matches
WS = [" ", "\t", "\n", "  ", " \t ", NBSP, THIN, IDEO, "\r\n", NEL]
JUNK = [
    "",
    "(",
    ")",
    "[x]",
    "a+b",
    "***",
    "“",  # left curly quote (normalized)
    "（",  # fullwidth paren (normalized)
    "–",  # en dash (normalized)
    "``",
    "x.y?",
    "\\d",
]


def _fuzz_sentences(seed: int, n: int = 400) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ws = lambda: rng.choice(WS)  # noqa: E731
        kind = rng.random()
        subj = rng.choice(ALIAS_LIST)
        pat = rng.choice(PATTERN_LIST)
        obj = rng.choice(ALIAS_LIST)
        if kind < 0.5:
            # claim-shaped, pattern words separated by adversarial whitespace
            pat_ws = ws().join(pat.split(" "))
            prefix = rng.choice(["", "", "indeed "])
            neg = rng.choice(["", "", "does not ", "never "])
            s = f"{prefix}{subj}{ws()}{neg}{pat_ws}{ws()}{obj}" + rng.choice(
                [".", "!", "?", ""]
            )
        elif kind < 0.75:
            # junk around a pattern fragment (prefilter may keep; regex won't)
            s = (
                rng.choice(JUNK)
                + ws()
                + ws().join(pat.split(" ")[: rng.randint(1, 3)])
                + ws()
                + rng.choice(JUNK)
            )
        else:
            # pure junk / metacharacters / fullwidth
            s = ws().join(rng.choices(JUNK + ALIAS_LIST, k=rng.randint(1, 6)))
        if rng.random() < 0.3:
            s = s.upper()
        out.append(s)
    # engineered hard cases
    out += [
        f"alan turing was{NBSP}born{NBSP}in london",  # NBSP between pattern words
        f"grace hopper studied{IDEO}at yale",  # ideographic space
        "ada lovelace was\tborn\nin london.",  # mixed ASCII ws
        "（ada lovelace） was born in london!",  # fullwidth wrap
        "ALAN TURING IS A MEMBER OF BELL LABS",  # case
        "x was born iny",  # pattern not on word boundary (prefilter may keep)
        "wasborn in london",  # broken pattern head
    ]
    return out


def _py_prefilter() -> re.Pattern:
    return re.compile(J.claim_prefilter_pattern(PATTERN_LIST))


def _py_claim_matches(s: str) -> bool:
    return (
        K.claim_regex(ALIAS_LIST, PATTERN_LIST).match(K.normalize_text(s))
        is not None
    )


@pytest.mark.parametrize("seed", [11, 2024, 777])
def test_python_prefilter_is_superset_of_claim_regex(seed):
    pre = _py_prefilter()
    for s in _fuzz_sentences(seed):
        if _py_claim_matches(s):
            assert pre.search(s.lower()) is not None, repr(s)


def test_jvm_prefilter_is_superset_and_dialect_parity(spark):
    """One Spark pass over all fuzz sentences: (a) every sentence the JVM
    claim regex accepts post-normalize passed the JVM prefilter; (b) the
    JVM prefilter decision equals the Python twin's on every sentence —
    including the NBSP/ideographic-space cases that a bare Java \\s drops."""
    from pyspark.sql import functions as F

    sents = []
    for seed in (11, 2024, 777):
        sents.extend(_fuzz_sentences(seed))
    sdf = spark.createDataFrame(pd.DataFrame({"sentence": sents}))
    accepted, _s, _p, _o = J.detect_claim_exprs(
        F.col("sentence"), ALIAS_LIST, PATTERN_LIST
    )
    # the claim pattern is ^...$-anchored, so rlike's find == full match
    full_match = J.normalize_expr(F.col("sentence")).rlike(
        J.claim_pattern(ALIAS_LIST, PATTERN_LIST)
    )
    got = sdf.select(
        "sentence",
        J.claim_prefilter_expr(F.col("sentence"), PATTERN_LIST).alias("pre"),
        full_match.alias("regex_hit"),
        accepted.alias("accepted"),
    ).toPandas()
    pre_py = _py_prefilter()
    for row in got.itertuples(index=False):
        # (a) superset: regex hit (even a rejected negation/'indeed' form,
        # since the prefilter runs before the full regex) implies prefiltered
        if row.regex_hit or row.accepted:
            assert row.pre, repr(row.sentence)
        # (b) dialect parity of the prefilter itself
        assert row.pre == (
            pre_py.search(row.sentence.lower()) is not None
        ), repr(row.sentence)


def test_prefilter_keeps_nbsp_separated_pattern_in_both_dialects(spark):
    """Regression pin for the ADVICE finding: U+00A0 between pattern words
    must be kept by BOTH dialects' prefilters (Java's bare \\s is ASCII-only
    and would have dropped it before the explicit whitespace class)."""
    from pyspark.sql import functions as F

    s = f"turing was{NBSP}born{NBSP}in london"
    assert _py_prefilter().search(s) is not None
    row = (
        spark.range(1)
        .select(J.claim_prefilter_expr(F.lit(s), PATTERN_LIST).alias("pre"))
        .collect()[0]
    )
    assert row.pre is True
