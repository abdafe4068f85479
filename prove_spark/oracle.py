"""Single-threaded pandas oracle for the KG-construction pipeline.

This is the golden re-implementation of the reference operator DAG
(SURVEY.md §3.1: ProVe_main_process.py:18-61) over transcripts: it defines
the exact (subj, pred, obj, verdict, score) set the Spark pipeline must
reproduce (P/R ≥ 0.95 — by construction we target exact equality). It shares
every text kernel with the Spark stages (functions/text.py), so divergence
can only come from relational/aggregation logic — which the golden test
pins down.

ID scheme (deterministic, resume-safe — no uuid4):
  sent_id  = turn_idx * SENT_ID_STRIDE + 2 * k          (k-th sentence of the turn)
  slide id = sent_id + 1                      (window starting at that sentence)
  claim_id = f"{conv_id}:{sent_id}"
"""

from __future__ import annotations

import pandas as pd

from .config import DEFAULT_CONFIG, SENT_ID_STRIDE, PipelineConfig
from .dictionaries import (
    ALIASES,
    BAD_DATATYPES,
    BLACKLIST_PIDS,
    ENTITIES,
    PREDICATES,
    SAME_AS_SEED,
    qid_num,
)
from .functions.text import (
    NEI,
    REFUTES,
    SUPPORTS,
    detect_claim,
    nli_probs,
    similarity,
    split_sentences,
    verbalize_triple,
)

_LABEL_BY_QID = dict(ENTITIES)
_PRED_BY_PATTERN = {p: (pid, label, dt) for pid, p, label, dt in PREDICATES}


def _linked_qid(alias: str) -> str:
    """Popularity-ranked disambiguation (reference functions.py:642-669):
    highest sitelink count wins, numeric QID breaks ties."""
    from .dictionaries import popularity_key

    cands = [q for a, q in ALIASES if a == alias]
    return min(cands, key=popularity_key)


def canonical_map() -> dict[str, str]:
    """Union-find over label-equality + seed same-as edges (min-QID root)."""
    parent: dict[str, str] = {q: q for q, _ in ENTITIES}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if qid_num(ra) > qid_num(rb):
            ra, rb = rb, ra
        parent[rb] = ra

    by_label: dict[str, list[str]] = {}
    for q, label in ENTITIES:
        by_label.setdefault(label, []).append(q)
    for group in by_label.values():
        for other in group[1:]:
            union(group[0], other)
    for a, b in SAME_AS_SEED:
        union(a, b)
    return {q: find(q) for q, _ in ENTITIES}


def conv_sentences_ordered(
    conv_pdf: pd.DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> list[tuple[int, str]]:
    """Stable (turn_idx, k) ordering → [(sent_id, sentence), ...] base sents.
    Mirrors extract_sentences exactly: NULL text = no sentences, turn text
    truncated to max_turn_chars (spill control)."""
    out: list[tuple[int, str]] = []
    for turn_idx, text in (
        conv_pdf.sort_values("turn_idx")[["turn_idx", "text"]].itertuples(index=False)
    ):
        text = "" if pd.isna(text) else str(text)  # None and NaN alike
        for k, sent in enumerate(
            split_sentences(text[: config.max_turn_chars])
        ):
            out.append((int(turn_idx) * SENT_ID_STRIDE + 2 * k, sent))
    return out


def run_oracle(
    transcripts: pd.DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """transcripts → triples(subj, pred, obj, conv_id, turn_idx, verdict, score)."""
    alias_list = sorted({a for a, _ in ALIASES})
    pattern_list = sorted({p for _, p, _, _ in PREDICATES})
    canon = canonical_map()

    rows: list[dict] = []
    for conv_id, conv_pdf in transcripts.groupby("conv_id"):
        base = conv_sentences_ordered(conv_pdf, config)
        # evidence pool: base sentences + slide-2 windows (C3)
        evidence: list[tuple[int, str]] = list(base)
        for i in range(len(base) - config.slide_window + 1):
            sid = base[i][0] + 1
            joined = config.slide_join.join(
                s for _, s in base[i : i + config.slide_window]
            )
            evidence.append((sid, joined))

        for sent_id, sentence in base:
            hit = detect_claim(sentence, alias_list, pattern_list)
            if hit is None:
                continue
            subj_alias, pattern, obj_alias = hit
            pid, plabel, datatype = _PRED_BY_PATTERN[pattern]
            # filters F2/F3 (bad datatype, blacklisted property)
            if datatype in BAD_DATATYPES or pid in BLACKLIST_PIDS:
                continue
            subj_q = _linked_qid(subj_alias)
            obj_q = _linked_qid(obj_alias)
            s_label = _LABEL_BY_QID[subj_q]
            o_label = _LABEL_BY_QID[obj_q]
            verb = verbalize_triple(s_label, plabel, o_label)

            scored = sorted(
                (
                    (similarity(verb, ev_sent), sid, ev_sent)
                    for sid, ev_sent in evidence
                ),
                key=lambda t: (-t[0], t[1]),
            )[: config.top_k_evidence]
            kept = [t for t in scored if t[0] > config.similarity_threshold]

            if not kept:
                weighted = list(config.default_probs)
                result_sentence = None
            else:
                weighted = [0.0, 0.0, 0.0]
                labels = []
                for sim, sid, ev_sent in kept:
                    probs = nli_probs(s_label, o_label, verb, ev_sent)
                    labels.append(config.classes[probs.index(max(probs))])
                    for i in range(3):
                        weighted[i] += probs[i] * sim
                # A4 second half — reference get_final_verdict
                # (claim_entailment.py:126-146): the FIRST SUPPORTS sentence
                # if any; else the first sentence of the modal label, where
                # pandas mode()[0] breaks count ties to the lexicographically
                # smallest label. "First" = the kept ordering (sim desc,
                # sent_id asc).
                if SUPPORTS in labels:
                    sel = SUPPORTS
                else:
                    counts = {lab: labels.count(lab) for lab in set(labels)}
                    mx = max(counts.values())
                    sel = min(lab for lab, n in counts.items() if n == mx)
                result_sentence = next(
                    ev for (s, sid, ev), lab in zip(kept, labels) if lab == sel
                )
            verdict = config.classes[weighted.index(max(weighted))]
            # MALON label (A3): any-SUPPORTS > any-REFUTES > NEI
            if kept:
                malon = (
                    SUPPORTS
                    if SUPPORTS in labels
                    else (REFUTES if REFUTES in labels else NEI)
                )
            else:
                malon = NEI
            rows.append(
                {
                    "subj": canon[subj_q],
                    "pred": pid,
                    "obj": canon[obj_q],
                    "conv_id": conv_id,
                    "turn_idx": sent_id // SENT_ID_STRIDE,
                    "claim_id": f"{conv_id}:{sent_id}",
                    "verdict": verdict,
                    "malon": malon,
                    "score": weighted[config.classes.index(verdict)],
                    "result_sentence": result_sentence,
                    # C18: full per-class weighted distribution
                    # (claim_entailment.py:212-223) as three fixed-order
                    # double columns — the canonical hashable rendering the
                    # Spark pipeline emits (a dict column breaks pandas
                    # sort/hash canonicalization downstream)
                    "w_supports": weighted[0],
                    "w_refutes": weighted[1],
                    "w_nei": weighted[2],
                }
            )
    out = pd.DataFrame(
        rows,
        columns=[
            "subj",
            "pred",
            "obj",
            "conv_id",
            "turn_idx",
            "claim_id",
            "verdict",
            "malon",
            "score",
            "result_sentence",
            "w_supports",
            "w_refutes",
            "w_nei",
        ],
    )
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out.sort_values("claim_id").reset_index(drop=True)


def precision_recall(
    got: pd.DataFrame, golden: pd.DataFrame, verdict: str = SUPPORTS
) -> tuple[float, float]:
    """P/R on the distinct (subj,pred,obj) set with the given verdict."""
    g = {
        t
        for t in golden.loc[golden.verdict == verdict, ["subj", "pred", "obj"]]
        .itertuples(index=False)
    }
    h = {
        t
        for t in got.loc[got.verdict == verdict, ["subj", "pred", "obj"]]
        .itertuples(index=False)
    }
    if not h or not g:
        return (0.0, 0.0)
    inter = len(g & h)
    return (inter / len(h), inter / len(g))
