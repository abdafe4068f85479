"""Bit-exactness of the batch-vectorized Arrow kernels vs their per-row
twins in functions/text.py (which the pandas oracle runs). Any divergence
here would silently split the arrow engine from the oracle; the pipeline
fuzz/golden suites pin the same property end-to-end, these pin it at the
kernel level with adversarial inputs (unicode punctuation, empty strings,
token-free strings, negations, repeated values exercising the per-batch
memoization, null sentinels)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from prove_spark.dictionaries import ALIASES, PREDICATES
from prove_spark.functions import arrow_kernels as AK
from prove_spark.functions import text as K

ALIAS_LIST = sorted({a for a, _ in ALIASES})
PATTERN_LIST = sorted({p for _, p, _, _ in PREDICATES})

RAW = [
    "Alan Turing was born in London.",
    "（ada lovelace）  created   the\tfirst program!",
    "x -- y ``quoted'' -LRB-z-RRB-",
    "",
    "   ",
    "!!!",
    "ünïcödé 日本語 text",
    "not never both",
    "indeed grace hopper studied at yale.",
    "a. turing is a member of the royal society",
    "the same sentence",
    "the same sentence",  # dup → memoization path
]


def _rand_strings(seed: int, n: int = 300) -> list[str]:
    rng = random.Random(seed)
    vocab = ALIAS_LIST + PATTERN_LIST + RAW + ["not", "never", "(", "“", "--"]
    return [
        " ".join(rng.choices(vocab, k=rng.randint(0, 6))) for _ in range(n)
    ]


def test_normalize_batch_matches_per_row():
    s = pd.Series(RAW + _rand_strings(1))
    got = AK.normalize_batch(s)
    want = s.map(K.normalize_text)
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_verbalize_batch_matches_per_row():
    rng = random.Random(2)
    subj = pd.Series(rng.choices(ALIAS_LIST + RAW, k=200))
    pred = pd.Series(rng.choices(PATTERN_LIST, k=200))
    obj = pd.Series(rng.choices(ALIAS_LIST + RAW, k=200))
    got = AK.verbalize_batch(subj, pred, obj)
    want = pd.Series(
        [
            K.verbalize_triple(a, b, c)
            for a, b, c in zip(subj, pred, obj)
        ]
    )
    pd.testing.assert_series_equal(got, want, check_names=False)


@pytest.mark.parametrize("seed", [3, 44])
def test_similarity_batch_matches_per_row(seed):
    rng = random.Random(seed)
    verbs = [
        K.verbalize_triple(
            rng.choice(ALIAS_LIST),
            rng.choice(PATTERN_LIST),
            rng.choice(ALIAS_LIST),
        )
        for _ in range(40)
    ] + ["", "   ", "!!!"]
    sents = _rand_strings(seed) + RAW
    v = pd.Series(rng.choices(verbs, k=500))
    s = pd.Series(rng.choices(sents, k=500))
    got = AK.similarity_batch(v, s)
    want = pd.Series([K.similarity(a, b) for a, b in zip(v, s)])
    # bit-exact, not approx: both sides run the same quantize arithmetic
    assert (got == want).all()


@pytest.mark.parametrize("seed", [5, 66])
def test_nli_batch_matches_per_row(seed):
    rng = random.Random(seed)
    subs = ALIAS_LIST[:10] + ["", "zzz unknown"]
    objs = ALIAS_LIST[10:20] + [""]
    n = 400
    subj = pd.Series(rng.choices(subs, k=n))
    obj = pd.Series(rng.choices(objs, k=n))
    verb = pd.Series(
        [
            K.verbalize_triple(a, rng.choice(PATTERN_LIST), b)
            for a, b in zip(subj, obj)
        ]
    )
    # sentences engineered to hit all three branches: full-claim echo
    # (support), subj+obj+negation (refute), junk (NEI)
    sents = []
    for i in range(n):
        r = rng.random()
        if r < 0.3:
            sents.append("indeed " + verb[i] + ".")
        elif r < 0.6:
            sents.append(f"{subj[i]} never {obj[i]} maybe")
        else:
            sents.append(rng.choice(RAW))
    sent = pd.Series(sents)
    got = AK.nli_batch(subj, obj, verb, sent)
    want = [list(K.nli_probs(a, b, c, d)) for a, b, c, d in zip(subj, obj, verb, sent)]
    assert list(got) == want


def test_nli_batch_null_sentence_is_empty_set():
    got = AK.nli_batch(
        pd.Series(["alan turing"]),
        pd.Series(["london"]),
        pd.Series(["alan turing was born in london"]),
        pd.Series([None]),
    )
    # empty evidence set: no subset holds → NEI (the pipeline's when()
    # wrapper nulls these rows out anyway; the kernel must not crash)
    assert list(got[0]) == list(K.PROBS_NEI)


def test_detect_claims_batch_matches_per_row():
    sents = (
        RAW
        + _rand_strings(7)
        + [
            f"{a} {p} {b}."
            for a, p, b in zip(
                ALIAS_LIST[:15], PATTERN_LIST, ALIAS_LIST[15:30]
            )
        ]
        + [
            "indeed alan turing was born in london.",
            "alan turing never was born in london",
            "alan turing does not links to bell labs",
            "ALAN TURING WAS BORN IN LONDON",
        ]
    )
    s = pd.Series(sents)
    g = AK.detect_claims_batch(s, ALIAS_LIST, PATTERN_LIST)
    for i, sent in enumerate(sents):
        hit = K.detect_claim(sent, ALIAS_LIST, PATTERN_LIST)
        assert bool(g["ok"].iloc[i]) == (hit is not None), repr(sent)
        if hit is not None:
            assert (
                g["subj_alias"].iloc[i],
                g["pattern"].iloc[i],
                g["obj_alias"].iloc[i],
            ) == hit, repr(sent)


def test_bytes_tokenizer_matches_token_set():
    """_tok (C-level bytes translate+split) must produce exactly the token
    runs of K.token_set (regex [a-z0-9]+ over lower()) on adversarial
    unicode: non-ASCII chars are separators in both, case folds first."""
    import random

    import prove_spark.functions.arrow_kernels as AK
    import prove_spark.functions.text as K

    rng = random.Random(20260822)
    alphabet = (
        "abcXYZ019 \t\n.,;:-_()ÀàÉéßΩ中文🙂 　'" + '"`'
    )
    cases = [
        "", " ", "a", "Alan Turing was born in London.",
        "café résumé", "ΣΙΣΥΦΟΣ sisyphos", "naïve—dash",
        "x" * 300, "0a1b2c", " not　never ",
    ] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(500)
    ]
    AK._worker_state()
    for s in cases:
        got = {t.decode("ascii") for t in AK._tok(s)}
        want = set(K.token_set(s))
        assert got == want, repr(s)
