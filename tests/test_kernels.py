"""Unit tests for the shared deterministic text kernels."""

from __future__ import annotations

from prove_spark.functions import text as K


def test_split_sentences():
    assert K.split_sentences("a b. c d! e?  f") == ["a b.", "c d!", "e?", "f"]
    assert K.split_sentences("") == []
    assert K.split_sentences("no terminator") == ["no terminator"]


def test_slide_sentences():
    assert K.slide_sentences(["a.", "b.", "c."]) == ["a. b.", "b. c."]
    assert K.slide_sentences(["a."]) == []


def test_normalize_text():
    assert K.normalize_text("A（B）  C") == "a ( b ) c"
    assert K.normalize_text("x -- y ``q''") == 'x - y "q"'


def test_similarity_quantized_and_bounded():
    s = K.similarity("alan turing employer mit", "indeed alan turing employer mit.")
    assert 0 < s <= 1
    assert s == round(s * (1 << 20)) / (1 << 20)
    assert K.similarity("", "x") == 0.0
    assert K.similarity("a b", "a b") == 1.0


def test_nli_probs_rules():
    assert (
        K.nli_probs("alan turing", "mit", "alan turing employer mit", "indeed alan turing employer mit.")
        == K.PROBS_SUPPORT
    )
    assert (
        K.nli_probs("alan turing", "mit", "alan turing employer mit", "alan turing does not work at mit.")
        == K.PROBS_REFUTE
    )
    assert (
        K.nli_probs("alan turing", "mit", "alan turing employer mit", "the weather is nice.")
        == K.PROBS_NEI
    )


def test_detect_claim():
    aliases = ["alan turing", "turing", "mit"]
    patterns = ["works at", "studied at"]
    assert K.detect_claim("Turing works at MIT.", aliases, patterns) == (
        "turing",
        "works at",
        "mit",
    )
    # longest-first: multiword alias wins
    assert K.detect_claim("alan turing works at mit.", aliases, patterns) == (
        "alan turing",
        "works at",
        "mit",
    )
    # negation and 'indeed' sentences are evidence, not claims
    assert K.detect_claim("turing does not works at mit.", aliases, patterns) is None
    assert K.detect_claim("indeed turing works at mit.", aliases, patterns) is None
    assert K.detect_claim("something else entirely.", aliases, patterns) is None


def test_verbalize_triple():
    assert K.verbalize_triple("Alan Turing", "employer", "MIT") == "alan turing employer mit"
