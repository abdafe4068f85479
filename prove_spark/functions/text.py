"""Deterministic text kernels shared by the Spark pipeline and the pandas oracle.

Each function here is pure Python/pandas and is called BOTH from the oracle
(single-threaded) and from inside Arrow-batched `mapInPandas` stages — that
shared code path is what guarantees exact Spark↔oracle agreement on the
string-heavy operators (sentence split, normalization, mention regex,
similarity, NLI stand-in), with no regex-dialect mismatches.

Reference semantics re-created (not copied):
- sentence split + slide-2:      refs_html_to_evidences.py:25-38
- unicode/`<unk>` normalization: utils/verbalisation_module.py:148-296
- FEVER-style cleanup:           utils/sentence_retrieval_module.py:26-34
- template verbalizer contract:  utils/verbalisation_module.py:108-134
- retrieval scorer stand-in:     utils/sentence_retrieval_module.py (M2)
- NLI stand-in label algebra:    utils/textual_entailment_module.py (M3)
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

TOKEN_RE = re.compile(r"[a-z0-9]+")
SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

# Fullwidth/CJK punctuation normalization — same character classes the
# reference's verbaliser normalizes (utils/verbalisation_module.py:153-158).
_NORMALIZE_MAP = {
    "（": "(",
    "）": ")",
    "〈": "<",
    "〉": ">",
    "／": "/",
    "“": '"',
    "”": '"',
    "‘": "'",
    "’": "'",
    "–": "-",
    "—": "-",
}
_NORMALIZE_RE = re.compile("|".join(map(re.escape, _NORMALIZE_MAP)))

# Similarity scores are quantized to this dyadic grid so that float sums are
# exactly associative (sums of <=64 grid values are exact in binary64) —
# weighted-sum verdicts then match the oracle bit-for-bit regardless of
# Spark's aggregation order.
_QUANT = float(1 << 20)

SUPPORTS = "SUPPORTS"
REFUTES = "REFUTES"
NEI = "NOT ENOUGH INFO"

# Dyadic-rational probability templates (order: SUPPORTS, REFUTES, NEI).
PROBS_SUPPORT = (0.875, 0.0625, 0.0625)
PROBS_REFUTE = (0.0625, 0.875, 0.0625)
PROBS_NEI = (0.125, 0.125, 0.75)


def normalize_text(text: str) -> str:
    """C6/C7: unicode punctuation fold + whitespace collapse + lowercase."""
    text = _NORMALIZE_RE.sub(lambda m: _NORMALIZE_MAP[m.group(0)], text)
    text = re.sub(r"-lrb-|\(", " ( ", text, flags=re.I)
    text = re.sub(r"-rrb-|\)", " ) ", text, flags=re.I)
    text = text.replace("--", "-").replace("``", '"').replace("''", '"')
    return re.sub(r"\s+", " ", text).strip().lower()


def tokens(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


@lru_cache(maxsize=1 << 17)
def token_set(text: str) -> frozenset[str]:
    """Memoized token set — the scoring kernels see the same claim/sentence
    strings many times per Arrow batch (each claim pairs with every sentence
    of its conversation), so caching the tokenization cuts the dominant
    Python cost ~10x. Bounded per worker process; values are immutable."""
    return frozenset(TOKEN_RE.findall(text.lower()))


def split_sentences(text: str) -> list[str]:
    """C2: deterministic sentence tokenizer (split after .!? + whitespace)."""
    parts = [s.strip() for s in SENT_SPLIT_RE.split(text)]
    return [s for s in parts if s]


def slide_sentences(sents: list[str], window: int = 2, join: str = " ") -> list[str]:
    """C3: sliding window join of adjacent sentences (window=2 by default)."""
    if len(sents) < window:
        return []
    return [join.join(sents[i : i + window]) for i in range(len(sents) - window + 1)]


def verbalize_triple(subj_label: str, property_label: str, object_label: str) -> str:
    """M1 stand-in: template verbalizer.

    Honors the reference's graph2text input contract
    (`translate Graph to English: <H> s <R> p <T> o`,
    utils/verbalisation_module.py:119) but renders deterministically as the
    triple string `"{s} {p} {o}"` (utils/objects.py:105-110, functions.py:137)
    so the pipeline needs no 850MB checkpoint in this sandbox. Swap in a real
    T5 `mapInPandas` kernel with the same signature for production.
    """
    return normalize_text(f"{subj_label} {property_label} {object_label}")


def quantize(x: float) -> float:
    """Snap a score to the dyadic grid (see _QUANT note above).

    Half-UP via floor(x*Q + 0.5) — not Python round() (banker's) — so the
    JVM expression path (functions/jvm_kernels.py) computes bit-identical
    values with FLOOR: both sides do the same binary64 multiply/add/floor.
    """
    return math.floor(x * _QUANT + 0.5) / _QUANT


def similarity(claim_verbalized: str, sentence: str) -> float:
    """M2 stand-in: token-Jaccard lexical overlap, quantized.

    Deterministic replacement for the BERT sentence-retrieval scorer
    (utils/sentence_retrieval_module.py:49-66); same downstream top-k
    semantics (W1).
    """
    a, b = token_set(claim_verbalized), token_set(sentence)
    if not a or not b:
        return 0.0
    return quantize(len(a & b) / len(a | b))


def nli_probs(
    subj_label: str, object_label: str, claim_verbalized: str, sentence: str
) -> tuple[float, float, float]:
    """M3 stand-in: deterministic 3-class entailment distribution.

    Rule algebra mirrors the FEVER-style classifier's *output contract*
    (utils/textual_entailment_module.py:62-94): a sentence naming both the
    subject and object plus an explicit negation refutes; a sentence
    containing the full verbalized claim supports; anything else is NEI.
    """
    s_tok = token_set(sentence)
    if (
        token_set(subj_label) <= s_tok
        and token_set(object_label) <= s_tok
        and ("not" in s_tok or "never" in s_tok)
    ):
        return PROBS_REFUTE
    if token_set(claim_verbalized) <= s_tok:
        return PROBS_SUPPORT
    return PROBS_NEI


@lru_cache(maxsize=4)
def _claim_regex(alias_alt: tuple[str, ...], pattern_alt: tuple[str, ...]) -> re.Pattern:
    def alt(items: tuple[str, ...]) -> str:
        # longest-first so multiword aliases win over their suffixes
        return "|".join(re.escape(x) for x in sorted(items, key=len, reverse=True))

    return re.compile(
        rf"^(?:indeed )?({alt(alias_alt)}) (?:does not |never )?({alt(pattern_alt)}) ({alt(alias_alt)})[.!?]?$"
    )


def claim_regex(aliases: list[str], patterns: list[str]) -> re.Pattern:
    return _claim_regex(tuple(sorted(set(aliases))), tuple(sorted(set(patterns))))


def detect_claim(
    sentence: str, aliases: list[str], patterns: list[str]
) -> tuple[str, str, str] | None:
    """Mention/claim detection kernel: (subj_alias, pred_pattern, obj_alias).

    Negated or 'indeed'-prefixed sentences are evidence, not claims — only a
    bare `<alias> <pattern> <alias>.` sentence yields a candidate claim.
    """
    m = claim_regex(aliases, patterns).match(normalize_text(sentence))
    if m is None:
        return None
    matched = m.group(0)
    if matched.startswith("indeed ") or " does not " in matched or " never " in matched:
        return None
    return (m.group(1), m.group(2), m.group(3))
