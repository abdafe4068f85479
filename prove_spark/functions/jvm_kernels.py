"""JVM column-expression twins of the deterministic text kernels.

The sandbox stand-ins for the reference's three models (M1 verbalizer,
M2 retrieval scorer, M3 NLI — utils/verbalisation_module.py,
utils/sentence_retrieval_module.py, utils/textual_entailment_module.py) are
deterministic string/set algebra. Expressed as built-in Spark expressions
they run inside whole-stage codegen with ZERO JVM↔Python Arrow round trips —
measured ~1.7 s per no-op mapInPandas pass over 3 M rows on local[32], i.e.
the Arrow boundary, not the kernel math, dominated the pipeline. Production
NN models cannot be expressed this way and keep the mapInPandas path
(stages.py, config.engine = "arrow"); both engines are golden-tested equal.

Bit-exactness with functions/text.py (shared by the pandas oracle):
- token sets: findall([a-z0-9]+) == split("[^a-z0-9]+") minus empties
- Jaccard: integer sizes → binary64 divide, identical on both runtimes
- quantize: floor(x*2^20 + 0.5)/2^20 — FLOOR matches math.floor exactly
- normalize: same regex chain; Java \\s is ASCII-only vs Python's unicode
  \\s (documented divergence; transcript text is ASCII + the normalized
  fullwidth chars, and the golden suite pins equality end-to-end)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import (
    _NORMALIZE_MAP,
    _QUANT,
    PROBS_NEI,
    PROBS_REFUTE,
    PROBS_SUPPORT,
    claim_regex,
)

_SRC = "".join(_NORMALIZE_MAP.keys())
_DST = "".join(_NORMALIZE_MAP.values())


# Guard for the normalize fast path (r6): ONE regex pass deciding whether
# any step of the 8-step chain below can change the string. It matches iff
# the input contains a translate-source char, a parenthesis, an -lrb-/-rrb-
# token (any case), a '--' / '``' / "''" pair, a non-space ASCII-\s char
# (tab, \n, \x0B, \f, \r — Java's \s set), or a double space. For a string
# matching NONE of these, steps 1-6 are identity and step 7 replaces single
# spaces with single spaces — so normalize(c) == lower(trim(c)) exactly.
# Typical transcript sentences are clean, so the common row pays 1 regex
# pass + lower/trim instead of 7 regex passes + translate (measured: the
# normalize chain dominated the claim-detection stage at bench scale).
_NORM_GUARD = (
    "[" + _SRC + "()\\t\\n\\x0B\\f\\r]|--|''|``|  |(?i:-lrb-|-rrb-)"
)


def normalize_expr(c: Column) -> Column:
    """C6/C7 normalize_text as a codegen'd expression chain (with a guarded
    identity fast path — see _NORM_GUARD; the full chain is bit-identical
    on strings the guard matches, and provably equal to lower(trim(c)) on
    strings it does not)."""
    full = F.translate(c, _SRC, _DST)
    full = F.regexp_replace(full, r"(?i)-lrb-|\(", " ( ")
    full = F.regexp_replace(full, r"(?i)-rrb-|\)", " ) ")
    full = F.regexp_replace(full, "--", "-")
    full = F.regexp_replace(full, "``", '"')
    full = F.regexp_replace(full, "''", '"')
    full = F.regexp_replace(full, r"\s+", " ")
    return F.when(c.rlike(_NORM_GUARD), F.lower(F.trim(full))).otherwise(
        F.lower(F.trim(c))
    )


def token_set_expr(c: Column) -> Column:
    """tokens() as a distinct array (order irrelevant for set algebra)."""
    return F.array_distinct(
        F.array_remove(F.split(F.lower(c), "[^a-z0-9]+"), "")
    )


def similarity_from_tokens(a: Column, b: Column) -> Column:
    """M2 stand-in on PRE-TOKENIZED sets: quantized Jaccard. Tokenize once
    per claim / per sentence (linear), never per pair (quadratic) — per-pair
    work is pure set algebra on small arrays.

    r6: |a ∪ b| is derived arithmetically as |a| + |b| − |a ∩ b| (exact for
    the distinct arrays token_set_expr produces; the integer identity holds
    before the double casts, so the quantized ratio is bit-identical) —
    ONE hash-set build per pair instead of two. This expression runs once
    per claim×sentence pair, the widest row set in the KG pipeline."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    q = F.floor(inter / union * F.lit(_QUANT) + F.lit(0.5)) / F.lit(_QUANT)
    return F.when((F.size(a) == 0) | (F.size(b) == 0), F.lit(0.0)).otherwise(q)


def similarity_expr(verb: Column, sent: Column) -> Column:
    """M2 stand-in: quantized token-Jaccard (text.py:similarity twin)."""
    return similarity_from_tokens(token_set_expr(verb), token_set_expr(sent))


def _const_probs(p: tuple[float, ...]) -> Column:
    return F.array(*[F.lit(float(v)) for v in p])


def nli_from_tokens(
    subj_tok: Column, obj_tok: Column, verb_tok: Column, s_tok: Column
) -> Column:
    """M3 stand-in on PRE-TOKENIZED sets (text.py:nli_probs label algebra)."""

    def subset(x: Column) -> Column:
        return F.size(F.array_except(x, s_tok)) == 0

    refute = (
        subset(subj_tok)
        & subset(obj_tok)
        & (F.array_contains(s_tok, "not") | F.array_contains(s_tok, "never"))
    )
    support = subset(verb_tok)
    return (
        F.when(refute, _const_probs(PROBS_REFUTE))
        .when(support, _const_probs(PROBS_SUPPORT))
        .otherwise(_const_probs(PROBS_NEI))
    )


def nli_expr(subj: Column, obj: Column, verb: Column, sent: Column) -> Column:
    """M3 stand-in: 3-class distribution (text.py:nli_probs twin)."""
    return nli_from_tokens(
        token_set_expr(subj),
        token_set_expr(obj),
        token_set_expr(verb),
        token_set_expr(sent),
    )


# --------------------------------------------------------------------------
# SQL-string twins (r6): the SAME expressions as the Column builders above,
# rendered as Spark SQL text and parsed server-side in one py4j call per
# projection. Rationale: building these trees through the Column API costs
# one py4j round trip per operator (~1 ms each under load) — profiling showed
# ~2,400 round trips (≈1-3 s of pure driver time) per build_triples plan
# construction, INSIDE the timed region of the kg bench. The strings below
# are kept structurally parallel to the Column twins; goldens + the DuckDB
# oracle pin value equality.
# --------------------------------------------------------------------------
def token_set_sql(c: str) -> str:
    """SQL twin of token_set_expr (no backslashes — literal-safe)."""
    return f"array_distinct(array_remove(split(lower({c}), '[^a-z0-9]+'), ''))"


def similarity_from_tokens_sql(a: str, b: str) -> str:
    """SQL twin of similarity_from_tokens (same ops, same order; float
    literals carry the D suffix — bare decimals parse as DECIMAL in Spark
    SQL and would change the arithmetic)."""
    inter = f"CAST(size(array_intersect({a}, {b})) AS DOUBLE)"
    union = f"(CAST(size({a}) + size({b}) AS DOUBLE) - {inter})"
    q = (
        f"(CAST(FLOOR({inter} / {union} * {_QUANT!r}D + 0.5D) AS DOUBLE)"
        f" / {_QUANT!r}D)"
    )
    return (
        f"CASE WHEN size({a}) = 0 OR size({b}) = 0 THEN 0.0D ELSE {q} END"
    )


def _probs_sql(p: tuple[float, ...]) -> str:
    return "ARRAY(" + ", ".join(f"{float(v)!r}D" for v in p) + ")"


def nli_from_tokens_sql(subj: str, obj: str, verb: str, s: str) -> str:
    """SQL twin of nli_from_tokens."""
    refute = (
        f"(size(array_except({subj}, {s})) = 0"
        f" AND size(array_except({obj}, {s})) = 0"
        f" AND (array_contains({s}, 'not') OR array_contains({s}, 'never')))"
    )
    support = f"(size(array_except({verb}, {s})) = 0)"
    return (
        f"CASE WHEN {refute} THEN {_probs_sql(PROBS_REFUTE)}"
        f" WHEN {support} THEN {_probs_sql(PROBS_SUPPORT)}"
        f" ELSE {_probs_sql(PROBS_NEI)} END"
    )


def verbalize_expr(subj: Column, pred: Column, obj: Column) -> Column:
    """M1 stand-in: template verbalizer (text.py:verbalize_triple twin)."""
    return normalize_expr(F.concat_ws(" ", subj, pred, obj))


def sentences_expr(text: Column, max_chars: int) -> Column:
    """C2 split_sentences as an array expression (split → trim → drop empty).
    posexplode at the call site yields the same (k, sentence) pairs as the
    Python kernel's enumerate()."""
    arr = F.split(F.substring(text, 1, max_chars), r"(?<=[.!?])\s+")
    # regexp both-ends trim, NOT F.trim: trim strips spaces only, while the
    # Python kernel's str.strip() removes tabs/newlines too. (Also note
    # transform(arr, F.trim) would call trim(element, INDEX) — the two-arg
    # trim-chars form — silently trimming digits; keep the lambda.)
    return F.filter(
        F.transform(
            arr, lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")
        ),
        lambda s: s != F.lit(""),
    )


def claim_pattern(aliases: list[str], patterns: list[str]) -> str:
    """The exact mention-detection regex the Python kernel compiles — the
    alternation uses only escapes valid in both re and java.util.regex."""
    return claim_regex(aliases, patterns).pattern


# Whitespace class equal to PYTHON's str-mode \s, spelled explicitly so it
# means the same thing under java.util.regex (whose bare \s is ASCII-only)
# and under Python re. Used between prefilter pattern words so both engines'
# prefilters keep exactly the same sentences — with a dialect-dependent \s a
# predicate phrase separated by e.g. U+00A0 would be kept by the Python
# engine and dropped by the JVM one (latent engine-parity divergence; the
# normalize stage itself retains the documented ASCII-\s contract).
_PY_WS_CLASS = (
    "[ \\t\\n\\x0B\\f\\r\\x1C-\\x1F\\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)


def claim_prefilter_pattern(patterns: list[str]) -> str:
    """Cheap candidate prefilter: a sentence can only match the (expensive,
    ~90-alternation) claim regex if it contains one of the predicate surface
    patterns. Pattern-word sequences are invariant under normalize_text
    except for whitespace collapse, so matching the RAW lowercased sentence
    with a whitespace run between pattern words is a strict superset of the
    post-normalize match — the prefilter can never drop a true claim. The
    whitespace run uses _PY_WS_CLASS (Python's \\s set, a superset of Java's
    ASCII \\s) so both regex dialects keep identical sentence sets.

    Why it exists: the full claim regex was the pipeline's dominant CPU
    (measured 57–82 executor-cpu-s of ~170 at rep=64) AND its worst scaler
    (1.43x CPU inflation 2→8 cores); running it on the ~30% of sentences
    that contain a predicate pattern removes most of that work.
    """
    import re as _re

    alts = sorted({p for p in patterns}, key=len, reverse=True)
    ws = _PY_WS_CLASS + "+"
    # Substitute each space (re.escape may render it bare or as '\ ' —
    # it is special under re.VERBOSE) with the whitespace-run class in ONE
    # left-to-right pass. Chained str.replace calls would re-scan the
    # already-inserted class, whose own literal space char they then
    # corrupt into nested garbage (caught by test_prefilter_superset).
    # The lambda replacement keeps re.sub from interpreting the class's
    # backslash escapes as group references.
    return "|".join(
        _re.sub(r"\\? ", lambda _m: ws, _re.escape(p)) for p in alts
    )


def claim_prefilter_expr(sentence: Column, patterns: list[str]) -> Column:
    return F.lower(sentence).rlike(claim_prefilter_pattern(patterns))


def detect_claim_exprs(
    sentence: Column, aliases: list[str], patterns: list[str]
) -> tuple[Column, Column, Column, Column]:
    """(matched_and_accepted, subj_alias, pattern, obj_alias) — twin of
    text.py:detect_claim including the negation/'indeed' rejection."""
    pat = claim_pattern(aliases, patterns)
    norm = normalize_expr(sentence)
    full = F.regexp_extract(norm, pat, 0)
    accepted = (
        (full != "")
        & ~full.startswith("indeed ")
        & ~full.contains(" does not ")
        & ~full.contains(" never ")
    )
    return (
        accepted,
        F.regexp_extract(norm, pat, 1),
        F.regexp_extract(norm, pat, 2),
        F.regexp_extract(norm, pat, 3),
    )
