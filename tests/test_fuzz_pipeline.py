"""Fuzz: randomized adversarial transcripts → Spark (both engines) must
match the pandas oracle EXACTLY. Catches kernel-divergence edges (unicode
normalization, regex dialects, rounding, ordering) that the structured
datagen never produces. Seeded — failures reproduce."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from prove_spark.datagen import TRANSCRIPT_SCHEMA
from prove_spark.dictionaries import ALIASES, PREDICATES
from prove_spark.oracle import run_oracle
from prove_spark.pipeline.run import build_triples

WORDS = [
    "alpha", "beta", "Gamma", "DELTA", "ep5ilon", "zeta!", "eta?", "the",
    "a", "not", "never", "indeed", "（odd）", "–dash–", "``q''", "-LRB-x-RRB-",
    "ünïcödé", "日本語", "", "  ", "o'neil", "a.b", "x,y", "1234",
]
PUNCT = [".", "!", "?", ".", ".", ""]


def _fuzz_transcripts(seed: int, n_convs: int = 60) -> pd.DataFrame:
    rng = random.Random(seed)
    aliases = sorted({a for a, _ in ALIASES})
    patterns = sorted({p for _, p, _, _ in PREDICATES})
    rows = []
    for c in range(n_convs):
        conv_id = f"fz-{seed}-{c:04d}"
        n_turns = rng.randint(1, 6)
        for t in range(n_turns):
            n_sents = rng.randint(0, 4)
            sents = []
            for _ in range(n_sents):
                kind = rng.random()
                if kind < 0.35:
                    # claim-shaped (may be negated / 'indeed' prefixed)
                    prefix = rng.choice(["", "", "", "indeed "])
                    neg = rng.choice(["", "", "does not ", "never "])
                    s = (
                        f"{prefix}{rng.choice(aliases)} {neg}"
                        f"{rng.choice(patterns)} {rng.choice(aliases)}"
                        f"{rng.choice(PUNCT)}"
                    )
                elif kind < 0.5:
                    # evidence-shaped garble
                    s = " ".join(rng.choices(WORDS, k=rng.randint(1, 8))) + "."
                else:
                    s = " ".join(
                        rng.choices(WORDS + aliases, k=rng.randint(0, 12))
                    ) + rng.choice(PUNCT)
                sents.append(s)
            rows.append(
                (
                    conv_id,
                    t,
                    rng.choice(["user", "assistant", "tool"]),
                    " ".join(sents),
                    "",
                    pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=c * 100 + t),
                )
            )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)


COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "claim_id", "verdict", "malon", "score"]


@pytest.mark.parametrize("seed", [7, 1337, 99991])
def test_fuzz_jvm_engine_matches_oracle(spark, seed):
    pdf = _fuzz_transcripts(seed)
    golden = run_oracle(pdf)[COLS].reset_index(drop=True)
    got = (
        build_triples(spark, spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
        .toPandas()[COLS]
        .sort_values("claim_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)


def test_fuzz_arrow_engine_matches_oracle(spark):
    from dataclasses import replace

    from prove_spark.config import DEFAULT_CONFIG

    pdf = _fuzz_transcripts(4242)
    golden = run_oracle(pdf)[COLS].reset_index(drop=True)
    got = (
        build_triples(
            spark,
            spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA),
            replace(DEFAULT_CONFIG, engine="arrow"),
        )
        .toPandas()[COLS]
        .sort_values("claim_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden, check_dtype=False)
