"""DuckDB oracle SQL for the KG-construction lane.

The KG queries derive their input transcripts deterministically from the
`documents` table (datagen.py), and every kernel in the pipeline is
regex/set algebra (functions/text.py) — all expressible in DuckDB SQL. This
module GENERATES one long CTE chain that re-derives, entirely inside DuckDB:

  documents → conversation sentences (datagen._conv_sentences)
            → turn packing (datagen.build_transcripts_pdf)
            → pipeline sentence re-split (stages.extract_sentences, C2)
            → slide-2 evidence pool (C3) → claim detection (mention regex)
            → linking + filters (J7, F2/F3) → verbalize (M1)
            → pair + Jaccard similarity + top-k (J9/M2/W1)
            → NLI lanes (M3) → verdict algebra (A2/A3/A4/C18)
            → canonical rekey (connected components, materialized literal map)

so the driver's Spark-vs-DuckDB hash compare covers the flagship end to end.
Dictionary literals (aliases, predicates, popularity resolution, canonical
map) are inlined as VALUES/constant lists from the single source of truth in
dictionaries.py — the same literals the Spark dims broadcast.

Exactness notes (the discipline that keeps value hashes identical):
- similarity is quantized to the 2^-20 dyadic grid (functions/text.py), so
  double sums are order-independent and bit-equal across runtimes;
- the multiply/add/floor order in the SQL matches jvm_kernels.similarity
  exactly: floor((inter/union) * 2^20 + 0.5) / 2^20;
- DuckDB's RE2 has no lookbehind, so the sentence split `(?<=[.!?])\\s+`
  (Java regex in stages) is re-expressed as replace-punct-ws-with-\\x01 then
  split — equivalent because the whitespace is consumed either way;
- token sets are order-insensitive (only intersect/size/containment used).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, SENT_ID_STRIDE
from ..dictionaries import (
    ALIASES,
    BAD_DATATYPES,
    BLACKLIST_PIDS,
    ENTITIES,
    HOT_QIDS,
    PREDICATES,
    resolve_alias_map,
)
from ..functions.jvm_kernels import claim_pattern
from ..functions.text import _NORMALIZE_MAP, _QUANT


def _q(s: str) -> str:
    """SQL single-quoted literal."""
    return "'" + s.replace("'", "''") + "'"


def _values(rows: list[tuple], types: list[str] | None = None) -> str:
    def cell(v, i):
        lit = _q(v) if isinstance(v, str) else str(v)
        return f"CAST({lit} AS {types[i]})" if types else lit

    return ", ".join(
        "(" + ", ".join(cell(v, i) for i, v in enumerate(r)) + ")" for r in rows
    )


def _norm_sql(e: str) -> str:
    """normalize_text (C6/C7) as a DuckDB expression over expression `e` —
    same operation order as functions/text.py:normalize_text and
    jvm_kernels.normalize_expr."""
    src = _q("".join(_NORMALIZE_MAP.keys()))
    dst = _q("".join(_NORMALIZE_MAP.values()))
    e = f"translate({e}, {src}, {dst})"
    e = f"regexp_replace({e}, '-lrb-|\\(', ' ( ', 'gi')"
    e = f"regexp_replace({e}, '-rrb-|\\)', ' ) ', 'gi')"
    e = f"replace({e}, '--', '-')"
    e = f"replace({e}, '``', '\"')"
    e = f"replace({e}, {_q(chr(39) * 2)}, '\"')"
    e = f"regexp_replace({e}, '\\s+', ' ', 'g')"
    return f"lower(trim({e}))"


def _tok_sql(e: str) -> str:
    """token_set / token_set_expr twin: distinct [a-z0-9]+ runs."""
    return f"list_distinct(regexp_extract_all(lower({e}), '[a-z0-9]+'))"


def _sim_sql(a: str, b: str) -> str:
    """jvm_kernels.similarity_from_tokens twin — identical binary64 op order."""
    inter = f"len(list_intersect({a}, {b}))"
    return (
        f"CASE WHEN len({a}) = 0 OR len({b}) = 0 THEN 0.0 "
        f"ELSE floor(CAST({inter} AS DOUBLE) "
        f"/ CAST(len({a}) + len({b}) - {inter} AS DOUBLE) "
        f"* {_QUANT!r} + 0.5) / {_QUANT!r} END"
    )


def _pack_rows() -> list[tuple[int, int, int]]:
    """(doc_id%3, sentence_index%6) → turn offset within the 3-turn block.

    Re-derives datagen.build_transcripts_pdf's greedy packing (turn t takes
    (doc_id+t)%3+1 sentences; a block of 3 turns consumes exactly 6
    sentences, so the mapping is periodic with period 6)."""
    rows = []
    for d in range(3):
        within = 0
        for t_off in range(3):
            for _ in range((d + t_off) % 3 + 1):
                rows.append((d, within, t_off))
                within += 1
        assert within == 6
    return rows


def _kg_ctes() -> str:
    cfg = DEFAULT_CONFIG
    classes = list(cfg.classes)
    resolved = resolve_alias_map()
    label_by_qid = dict(ENTITIES)

    ent_qids = "[" + ", ".join(_q(q) for q, _ in ENTITIES) + "]"
    hot_qids = "[" + ", ".join(_q(q) for q in HOT_QIDS) + "]"
    n_ent = len(ENTITIES)

    aliases_by_qid: dict[str, list[str]] = {}
    for a, qq in ALIASES:
        aliases_by_qid.setdefault(qq, []).append(a)
    apick_rows = []
    for qq, als in aliases_by_qid.items():
        als = sorted(als)
        for k, a in enumerate(als):
            apick_rows.append((qq, k, a, len(als)))

    preds_rows = [
        (i, pid, pat, plabel, dt)
        for i, (pid, pat, plabel, dt) in enumerate(PREDICATES)
    ]
    resolved_rows = [
        (alias, qid, label_by_qid[qid]) for alias, qid in sorted(resolved.items())
    ]
    from ..oracle import canonical_map

    canon_rows = sorted(canonical_map().items())

    pat = _q(claim_pattern(
        sorted({a for a, _ in ALIASES}), sorted({p for _, p, _, _ in PREDICATES})
    ))
    bad_dt = ", ".join(_q(d) for d in BAD_DATATYPES)
    bad_pid = ", ".join(_q(p) for p in BLACKLIST_PIDS)
    d0, d1, d2 = cfg.default_probs
    # NLI probability templates (order: SUPPORTS, REFUTES, NEI)
    from ..functions.text import PROBS_NEI, PROBS_REFUTE, PROBS_SUPPORT

    def lane_probs(i: int) -> str:
        return (
            f"CASE lane WHEN 0 THEN {PROBS_SUPPORT[i]!r} "
            f"WHEN 1 THEN {PROBS_REFUTE[i]!r} ELSE {PROBS_NEI[i]!r} END"
        )

    norm_sentence = _norm_sql("sentence")
    split_expr = (
        "list_filter(list_transform("
        "string_split(regexp_replace(substr(turn_text, 1, "
        f"{cfg.max_turn_chars}), '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)), "
        "s -> regexp_replace(s, '^\\s+|\\s+$', '', 'g')), s -> s <> '')"
    )

    return f"""
WITH docs AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
),
consts AS (SELECT {ent_qids} AS ent_q, {hot_qids} AS hot_q),
apick(qid, k, alias, cnt) AS (VALUES {_values(apick_rows)}),
preds(idx, pid, pattern, plabel, datatype) AS (VALUES {_values(preds_rows)}),
resolved(alias, qid, label) AS (VALUES {_values(resolved_rows)}),
canon(qid, canonical_qid) AS (VALUES {_values(canon_rows)}),
pack(d, within, t_off) AS (VALUES {_values(_pack_rows())}),
words AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
  FROM docs
),
fillers AS (
  SELECT doc_id, fi,
         CASE WHEN doc_id % 7 = 0 AND fi = 0
              THEN substr(f, 1, length(f) - 1) || '（extra）.'
              ELSE f END AS sentence
  FROM (
    SELECT doc_id, unnest(fl) AS f, generate_subscripts(fl, 1) - 1 AS fi
    FROM (
      SELECT doc_id,
             [array_to_string(ws[i + 1 : i + 10], ' ') || '.'
              for i in range(0, greatest(len(ws), 1), 10)] AS fl
      FROM words) t
  ) t2
),
claims_j AS (
  SELECT doc_id, unnest(range(0, 1 + doc_id % 3)) AS j FROM docs
),
claims_idx AS (
  SELECT cj.doc_id, cj.j,
    CASE WHEN (cj.doc_id * 7 + cj.j * 13) % 20 < 10
         THEN c.hot_q[(cj.doc_id * 7 + cj.j * 13) % 20 % {len(HOT_QIDS)} + 1]
         ELSE c.ent_q[(cj.doc_id * 7 + cj.j * 13) % {n_ent} + 1]
    END AS subj_qid,
    (cj.doc_id * 11 + cj.j * 5) % {len(PREDICATES)} AS pred_idx,
    c.ent_q[(cj.doc_id * 3 + cj.j * 17 + 1) % {n_ent} + 1] AS obj1,
    c.ent_q[(cj.doc_id * 3 + cj.j * 17 + 2) % {n_ent} + 1] AS obj2
  FROM claims_j cj CROSS JOIN consts c
),
claims_gen AS (
  SELECT ci.doc_id, ci.j,
         asub.alias AS subj_alias, aobj.alias AS obj_alias,
         p.pattern, p.plabel,
         rs.label AS s_label, ro.label AS o_label,
         (ci.doc_id + 2 * ci.j) % 4 AS mode
  FROM (
    SELECT doc_id, j, subj_qid, pred_idx,
           CASE WHEN obj1 = subj_qid THEN obj2 ELSE obj1 END AS obj_qid
    FROM claims_idx) ci
  JOIN preds p ON p.idx = ci.pred_idx
  JOIN apick asub ON asub.qid = ci.subj_qid
                 AND asub.k = (ci.doc_id + ci.j) % asub.cnt
  JOIN apick aobj ON aobj.qid = ci.obj_qid
                 AND aobj.k = (ci.doc_id + 2 * ci.j) % aobj.cnt
  JOIN resolved rs ON rs.alias = asub.alias
  JOIN resolved ro ON ro.alias = aobj.alias
),
conv_rows AS (
  SELECT doc_id, fi // 2 AS r, (fi % 2) * 2 AS slot, sentence FROM fillers
  UNION ALL
  SELECT doc_id, j AS r, 1 AS slot,
         subj_alias || ' ' || pattern || ' ' || obj_alias || '.' AS sentence
  FROM claims_gen
  UNION ALL
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY j) - 1 AS r,
         3 AS slot,
         CASE WHEN mode IN (0, 1)
              THEN 'indeed ' || s_label || ' ' || plabel || ' ' || o_label || '.'
              ELSE s_label || ' does not ' || pattern || ' ' || o_label || '.'
         END AS sentence
  FROM claims_gen WHERE mode <> 3
),
conv_sents AS (
  SELECT doc_id, sentence,
         row_number() OVER (PARTITION BY doc_id ORDER BY r, slot) - 1 AS i
  FROM conv_rows
),
turns AS (
  SELECT doc_id, turn_idx,
         printf('conv-%06d', doc_id) AS conv_id,
         string_agg(sentence, ' ' ORDER BY i) AS turn_text
  FROM (
    SELECT cs.doc_id, cs.sentence, cs.i,
           (cs.i // 6) * 3 + p.t_off AS turn_idx
    FROM conv_sents cs
    JOIN pack p ON p.d = cs.doc_id % 3 AND p.within = cs.i % 6) placed
  GROUP BY doc_id, turn_idx
),
base AS (
  SELECT conv_id,
         CAST(turn_idx AS BIGINT) * {SENT_ID_STRIDE}
           + 2 * (generate_subscripts(sents, 1) - 1) AS sent_id,
         unnest(sents) AS sentence
  FROM (SELECT conv_id, turn_idx, {split_expr} AS sents FROM turns) t
),
pool AS (
  SELECT conv_id, sent_id, sentence FROM base
  UNION ALL
  SELECT conv_id, sent_id + 1 AS sent_id,
         sentence || {_q(cfg.slide_join)}
           || lead(sentence) OVER (PARTITION BY conv_id ORDER BY sent_id)
           AS sentence
  FROM base
  QUALIFY lead(sentence) OVER (PARTITION BY conv_id ORDER BY sent_id)
          IS NOT NULL
),
pool_tok AS (
  SELECT conv_id, sent_id AS ev_sent_id, sentence AS ev_sentence,
         {_tok_sql("sentence")} AS ev_tokens
  FROM pool
),
det0 AS (
  SELECT conv_id, sent_id, norm, regexp_extract(norm, {pat}, 0) AS m0
  FROM (SELECT conv_id, sent_id, {norm_sentence} AS norm FROM base) t
),
claims_det AS (
  SELECT conv_id, sent_id,
         regexp_extract(norm, {pat}, 1) AS subj_alias,
         regexp_extract(norm, {pat}, 2) AS pattern,
         regexp_extract(norm, {pat}, 3) AS obj_alias
  FROM det0
  WHERE m0 <> '' AND NOT starts_with(m0, 'indeed ')
    AND NOT contains(m0, ' does not ') AND NOT contains(m0, ' never ')
),
linked AS (
  SELECT c.conv_id, c.sent_id,
         c.conv_id || ':' || CAST(c.sent_id AS VARCHAR) AS claim_id,
         p.pid AS property_id,
         rs.qid AS subj_qid, ro.qid AS obj_qid,
         {_tok_sql("rs.label")} AS subj_tokens,
         {_tok_sql("ro.label")} AS obj_tokens,
         {_tok_sql(_norm_sql("rs.label || ' ' || p.plabel || ' ' || ro.label"))}
           AS verb_tokens
  FROM claims_det c
  JOIN preds p ON p.pattern = c.pattern
  JOIN resolved rs ON rs.alias = c.subj_alias
  JOIN resolved ro ON ro.alias = c.obj_alias
  WHERE p.datatype NOT IN ({bad_dt}) AND p.pid NOT IN ({bad_pid})
),
topk AS (
  SELECT * FROM (
    SELECT l.claim_id, l.conv_id, l.subj_tokens, l.obj_tokens, l.verb_tokens,
           pt.ev_sent_id, pt.ev_sentence, pt.ev_tokens,
           {_sim_sql("l.verb_tokens", "pt.ev_tokens")} AS sim
    FROM linked l JOIN pool_tok pt USING (conv_id)) pairs
  QUALIFY row_number() OVER (
    PARTITION BY claim_id ORDER BY sim DESC, ev_sent_id ASC
  ) <= {cfg.top_k_evidence}
),
kept AS (
  SELECT *,
    CASE WHEN list_has_all(ev_tokens, subj_tokens)
              AND list_has_all(ev_tokens, obj_tokens)
              AND (list_contains(ev_tokens, 'not')
                   OR list_contains(ev_tokens, 'never')) THEN 1
         WHEN list_has_all(ev_tokens, verb_tokens) THEN 0
         ELSE 2 END AS lane
  FROM topk WHERE sim > {cfg.similarity_threshold!r}
),
kept_ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY claim_id, lane ORDER BY sim DESC, ev_sent_id ASC
  ) AS lrn
  FROM kept
),
claim_agg AS (
  SELECT claim_id,
         sum({lane_probs(0)} * sim) AS s0,
         sum({lane_probs(1)} * sim) AS s1,
         sum({lane_probs(2)} * sim) AS s2,
         count(*) FILTER (WHERE lane = 0) AS c0,
         count(*) FILTER (WHERE lane = 1) AS c1,
         count(*) FILTER (WHERE lane = 2) AS c2,
         max(CASE WHEN lane = 0 AND lrn = 1 THEN ev_sentence END) AS fs0,
         max(CASE WHEN lane = 1 AND lrn = 1 THEN ev_sentence END) AS fs1,
         max(CASE WHEN lane = 2 AND lrn = 1 THEN ev_sentence END) AS fs2
  FROM kept_ranked GROUP BY claim_id
),
verdicts AS (
  SELECT l.conv_id, l.claim_id, l.sent_id, l.subj_qid, l.property_id,
         l.obj_qid,
         coalesce(a.s0, {d0!r}) AS w0,
         coalesce(a.s1, {d1!r}) AS w1,
         coalesce(a.s2, {d2!r}) AS w2,
         coalesce(a.c0, 0) AS c0, coalesce(a.c1, 0) AS c1,
         coalesce(a.c2, 0) AS c2,
         a.fs0, a.fs1, a.fs2
  FROM linked l LEFT JOIN claim_agg a USING (claim_id)
),
triples AS (
  SELECT cs.canonical_qid AS subj,
         v.property_id AS pred,
         co.canonical_qid AS obj,
         v.conv_id,
         CAST(v.sent_id // {SENT_ID_STRIDE} AS INTEGER) AS turn_idx,
         v.claim_id,
         CASE WHEN w0 >= w1 AND w0 >= w2 THEN {_q(classes[0])}
              WHEN w1 >= w2 THEN {_q(classes[1])}
              ELSE {_q(classes[2])} END AS verdict,
         CASE WHEN c0 > 0 THEN {_q(classes[0])}
              WHEN c1 > 0 THEN {_q(classes[1])}
              ELSE {_q(classes[2])} END AS malon,
         CASE WHEN w0 >= w1 AND w0 >= w2 THEN w0
              WHEN w1 >= w2 THEN w1 ELSE w2 END AS score,
         CASE WHEN c0 > 0 THEN fs0
              WHEN c1 > c2 THEN fs1 ELSE fs2 END AS result_sentence,
         w0 AS w_supports, w1 AS w_refutes, w2 AS w_nei
  FROM verdicts v
  JOIN canon cs ON cs.qid = v.subj_qid
  JOIN canon co ON co.qid = v.obj_qid
)"""


def kg_triples_sql() -> str:
    """Flagship oracle: the full (subj, pred, obj, …) triple set."""
    return (
        _kg_ctes()
        + """
SELECT subj, pred, obj, conv_id, turn_idx, claim_id, verdict, malon, score,
       result_sentence, w_supports, w_refutes, w_nei
FROM triples"""
    )


def _rollup_select() -> str:
    cfg = DEFAULT_CONFIG
    c = list(cfg.classes)
    return f"""
SELECT subj,
       count(*) FILTER (WHERE verdict = {_q(c[0])}) AS n_supports,
       count(*) FILTER (WHERE verdict = {_q(c[1])}) AS n_refutes,
       count(*) FILTER (WHERE verdict = {_q(c[2])}) AS n_nei,
       count(*) FILTER (WHERE verdict = {_q(cfg.error_class)}) AS n_errors,
       (count(*) FILTER (WHERE verdict = {_q(c[0])})
        - count(*) FILTER (WHERE verdict = {_q(c[1])}))
       / count(*) AS prove_score
FROM triples GROUP BY subj"""


def kg_entity_rollup_sql() -> str:
    """A6 rollup oracle: per-entity verdict pivot + proveScore."""
    return _kg_ctes() + _rollup_select()


def kg_top_supported_sql() -> str:
    """Flagship read query oracle: top-10 entities by supported-claim count.
    Deterministic despite the LIMIT — subj is unique per rollup row, so
    (n_supports DESC, subj ASC) is a total order."""
    return (
        "SELECT * FROM ("
        + kg_entity_rollup_sql()
        + ") ORDER BY n_supports DESC, subj ASC LIMIT 10"
    )


# measurement knob ONLY (scripts/measure_iter_checkpoint.py); contract is 6
PAGERANK_ITERS = max(
    1, int(__import__("os").environ.get("SPARK_GRAFT_PAGERANK_ITERS", "6"))
)
PAGERANK_DAMPING = "CAST(0.85 AS DOUBLE)"
PAGERANK_TELEPORT = "CAST(0.15 AS DOUBLE)"


def _pr_qz(e: str) -> str:
    """Quantize a double to the 1e-12 grid with HALF_UP (FLOOR(x*Q+0.5)/Q —
    identical in Spark and DuckDB; Python/banker's round() would diverge)."""
    return f"FLOOR(({e}) * 1e12 + CAST(0.5 AS DOUBLE)) / 1e12"


def kg_pagerank_sql() -> str:
    """PageRank oracle over the constructed triple graph: the Spark side's
    six iterative join+aggregate rounds unrolled as a CTE chain (pr_r0 …
    pr_r6). Same simplified-PageRank variant as the Spark plan (no dangling-
    mass redistribution — scores are a ranking signal, not a distribution),
    same arithmetic discipline: contributions rank/outdeg are IEEE double
    divisions (bit-identical across engines), per-node sums go through
    DECIMAL(28,14) (exact, order-independent), and each iteration's rank is
    quantized to the 1e-12 grid so the hash compare sees identical doubles.
    All numeric literals are CAST to DOUBLE — a bare 0.85 is a DECIMAL
    literal in DuckDB and would route the multiply through decimal rules."""
    sql = (
        _kg_ctes()
        + f""",
pr_edges AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples WHERE subj <> obj),
pr_nodes AS (SELECT subj AS entity FROM triples UNION SELECT obj AS entity FROM triples),
pr_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM pr_nodes),
pr_out AS (SELECT src, COUNT(*) AS odeg FROM pr_edges GROUP BY src),
pr_r0 AS (
  SELECT entity, {_pr_qz('CAST(1.0 AS DOUBLE) / n_nodes')} AS pr
  FROM pr_nodes CROSS JOIN pr_n)"""
    )
    for t in range(1, PAGERANK_ITERS + 1):
        sql += f""",
pr_c{t} AS (
  SELECT e.dst, SUM(CAST(p.pr / o.odeg AS DECIMAL(28,14))) AS s
  FROM pr_edges e JOIN pr_out o USING (src) JOIN pr_r{t - 1} p ON p.entity = e.src
  GROUP BY e.dst),
pr_r{t} AS (
  SELECT n.entity,
         {_pr_qz(f"{PAGERANK_TELEPORT} / pn.n_nodes"
                 f" + {PAGERANK_DAMPING} * COALESCE(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE))")} AS pr
  FROM pr_nodes n CROSS JOIN pr_n pn LEFT JOIN pr_c{t} c ON c.dst = n.entity)"""
    sql += f"""
SELECT r.entity, r.pr AS pagerank, CAST(COALESCE(o.odeg, 0) AS BIGINT) AS out_degree
FROM pr_r{PAGERANK_ITERS} r LEFT JOIN pr_out o ON o.src = r.entity"""
    return sql


HITS_ITERS = 6


def kg_hits_sql() -> str:
    """HITS (Kleinberg 1999) oracle over the constructed triple graph: the
    Spark side's HITS_ITERS mutual-recursion rounds unrolled as a CTE chain
    (hub_{t-1} → auth_t → hub_t). L1 normalization by the exact DECIMAL
    total deliberately replaces the textbook L2 norm — sqrt() is a libm
    call and NOT bit-identical across engines, while sum-normalization is
    one correctly-rounded IEEE division of two exactly-computed values
    (same reason kg_link_prediction scores Jaccard, not Adamic-Adar).
    Arithmetic discipline mirrors kg_pagerank: per-node sums through
    DECIMAL(28,14), every iteration's scores quantized to the 1e-12 grid."""
    sql = (
        _kg_ctes()
        + """,
ht_edges AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM triples WHERE subj <> obj),
ht_nodes AS MATERIALIZED (SELECT subj AS entity FROM triples UNION SELECT obj AS entity FROM triples),
ht_h0 AS MATERIALIZED (SELECT entity, CAST(1.0 AS DOUBLE) AS hub FROM ht_nodes)"""
    )
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # half-round references its raw-sum CTE twice (total + per-node join)
    # — inlined, the documents→triples chain re-expands ~2^(2·ITERS) times
    # and the planner exhausts file handles before it exhausts memory
    for t in range(1, HITS_ITERS + 1):
        sql += f""",
ht_ar{t} AS MATERIALIZED (
  SELECT e.dst, SUM(CAST(h.hub AS DECIMAL(28,14))) AS s
  FROM ht_edges e JOIN ht_h{t - 1} h ON h.entity = e.src GROUP BY e.dst),
ht_a{t} AS MATERIALIZED (
  SELECT n.entity,
         {_pr_qz('COALESCE(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE))'
                 f' / CAST(x.tot AS DOUBLE)')} AS auth
  FROM ht_nodes n
  CROSS JOIN (SELECT SUM(s) AS tot FROM ht_ar{t}) x
  LEFT JOIN ht_ar{t} c ON c.dst = n.entity),
ht_hr{t} AS MATERIALIZED (
  SELECT e.src, SUM(CAST(a.auth AS DECIMAL(28,14))) AS s
  FROM ht_edges e JOIN ht_a{t} a ON a.entity = e.dst GROUP BY e.src),
ht_h{t} AS MATERIALIZED (
  SELECT n.entity,
         {_pr_qz('COALESCE(CAST(c.s AS DOUBLE), CAST(0.0 AS DOUBLE))'
                 f' / CAST(x.tot AS DOUBLE)')} AS hub
  FROM ht_nodes n
  CROSS JOIN (SELECT SUM(s) AS tot FROM ht_hr{t}) x
  LEFT JOIN ht_hr{t} c ON c.src = n.entity)"""
    sql += f"""
SELECT a.entity, a.auth AS authority, h.hub AS hub_score,
       CAST(COALESCE(i.ideg, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(o.odeg, 0) AS BIGINT) AS out_degree
FROM ht_a{HITS_ITERS} a
JOIN ht_h{HITS_ITERS} h ON h.entity = a.entity
LEFT JOIN (SELECT dst, COUNT(*) AS ideg FROM ht_edges GROUP BY dst) i
  ON i.dst = a.entity
LEFT JOIN (SELECT src, COUNT(*) AS odeg FROM ht_edges GROUP BY src) o
  ON o.src = a.entity"""
    return sql


def _und_cte(p: str) -> str:
    """The `{p}_und` CTE: canonical undirected (a < b) distinct edge set of
    the entity graph — the SQL twin of registry._kg_undirected_edges, defined
    ONCE here so the four graph oracles (lp/kc/bfs/cc) cannot drift from the
    Spark-side derivation or from each other."""
    return f"""{p}_und AS MATERIALIZED (
  SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
  FROM triples WHERE subj <> obj)"""


def kg_triangles_sql() -> str:
    """Triangle-participation oracle over the KG entity graph: undirected
    distinct edge set, edges oriented from the (degree, id)-smaller endpoint
    so each triangle is enumerated exactly once as a wedge at its minimum
    vertex plus a closure lookup (the Spark plan's orientation trick,
    mirrored literally). Integer-only arithmetic — no float parity concerns."""
    return (
        _kg_ctes()
        + """,
tri_und AS (
  SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
  FROM triples WHERE subj <> obj),
tri_deg AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM tri_und UNION ALL SELECT b AS v FROM tri_und
  ) GROUP BY v),
tri_or AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.a ELSE e.b END AS src,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND e.a < e.b)
              THEN e.b ELSE e.a END AS dst
  FROM tri_und e JOIN tri_deg da ON da.v = e.a JOIN tri_deg db ON db.v = e.b),
tri_tris AS (
  SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
  FROM tri_or o1
  JOIN tri_or o2 ON o2.src = o1.src AND o1.dst < o2.dst
  JOIN tri_und c ON c.a = o1.dst AND c.b = o2.dst),
tri_counts AS (
  SELECT v, COUNT(*) AS n FROM (
    SELECT x AS v FROM tri_tris
    UNION ALL SELECT y AS v FROM tri_tris
    UNION ALL SELECT z AS v FROM tri_tris
  ) GROUP BY v)
SELECT d.v AS entity, CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_triangles
FROM tri_deg d LEFT JOIN tri_counts c ON c.v = d.v"""
    )


LPA_ITERS = 4


def kg_label_propagation_sql() -> str:
    """Synchronous label-propagation oracle over the KG entity graph: the
    Spark side's fixed-round loop unrolled as a CTE chain. Deterministic
    variant — every round each node adopts its neighbors' most frequent
    label with ties broken by MIN label (plain async LPA is order-dependent
    and un-oracle-able); isolated nodes keep their own label. String/int
    arithmetic only — no float parity concerns."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references lp_r{t-1} TWICE (candidate counting + the carry-
    # forward left join), so an un-hinted chain re-evaluates the entire KG
    # build 2^t times — measured 530 s at sf0.01 vs ~2 s materialized.
    # (kg_pagerank's chain references each round once, hence linear and
    # unhinted.) Oracle-side only; the Spark plan truncates round lineage
    # for the same reason (plans/iterstate.py).
    sql = (
        _kg_ctes()
        + f""",
{_und_cte("lp")},
lp_nbr AS MATERIALIZED (SELECT a AS src, b AS dst FROM lp_und
           UNION ALL SELECT b AS src, a AS dst FROM lp_und),
lp_nodes AS MATERIALIZED (SELECT subj AS entity FROM triples
             UNION SELECT obj AS entity FROM triples),
lp_r0 AS MATERIALIZED (SELECT entity, entity AS lbl FROM lp_nodes)"""
    )
    for t in range(1, LPA_ITERS + 1):
        sql += f""",
lp_c{t} AS (
  SELECT n.src AS v, p.lbl, COUNT(*) AS c
  FROM lp_nbr n JOIN lp_r{t - 1} p ON p.entity = n.dst
  GROUP BY n.src, p.lbl),
lp_p{t} AS (
  SELECT v, lbl FROM (
    SELECT v, lbl,
           ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS rn
    FROM lp_c{t})
  WHERE rn = 1),
lp_r{t} AS MATERIALIZED (
  SELECT r.entity, COALESCE(p.lbl, r.lbl) AS lbl
  FROM lp_r{t - 1} r LEFT JOIN lp_p{t} p ON p.v = r.entity)"""
    sql += f""",
lp_sizes AS (SELECT lbl, COUNT(*) AS n FROM lp_r{LPA_ITERS} GROUP BY lbl)
SELECT r.entity, r.lbl AS community, CAST(s.n AS BIGINT) AS community_size
FROM lp_r{LPA_ITERS} r JOIN lp_sizes s ON s.lbl = r.lbl"""
    return sql


def kg_entities_sql() -> str:
    """Entities-dimension oracle (build_entities twin)."""
    ent_rows = ENTITIES
    return (
        _kg_ctes()
        + f""",
ent_labels(qid, label) AS (VALUES {_values(ent_rows)}),
dim AS (
  SELECT c.canonical_qid,
         arg_min(e.label, CAST(substr(c.qid, 2) AS BIGINT)) AS label,
         array_to_string(list_sort(list(DISTINCT c.qid)), ',') AS member_qids
  FROM canon c JOIN ent_labels e USING (qid)
  GROUP BY c.canonical_qid
),
subj_stats AS (
  SELECT subj AS canonical_qid, count(*) AS n_subj_claims,
         sum(CASE WHEN verdict = {_q(DEFAULT_CONFIG.classes[0])}
                  THEN 1 ELSE 0 END) AS n_subj_supports
  FROM triples GROUP BY subj
),
obj_stats AS (
  SELECT obj AS canonical_qid, count(*) AS n_obj_claims
  FROM triples GROUP BY obj
)
SELECT d.canonical_qid, d.label, d.member_qids,
       CAST(coalesce(s.n_subj_claims, 0) AS BIGINT) AS n_subj_claims,
       CAST(coalesce(s.n_subj_supports, 0) AS BIGINT) AS n_subj_supports,
       CAST(coalesce(o.n_obj_claims, 0) AS BIGINT) AS n_obj_claims
FROM dim d
LEFT JOIN subj_stats s USING (canonical_qid)
LEFT JOIN obj_stats o USING (canonical_qid)"""
    )


KCORE_ITERS = 16  # testdata fixpoint at 11 rounds (probed); extra rounds are
# no-ops because the h-operator is monotone non-increasing and fixpoint-stable


def kg_coreness_sql() -> str:
    """Coreness oracle over the KG entity graph: the Spark side's fixed-round
    h-index iteration (Lü et al. 2016 — c(v) initialized to degree, each
    round replaced by the H-index of the neighbors' current values; the
    unique fixpoint is the exact k-core number) unrolled as a CTE chain.
    H-index via the sorted-rank trick: with neighbor values x ranked
    descending by r, H = MAX(LEAST(x, r)). Integer-only — no float parity
    concerns. Defined on the edge-induced node set (self-loops dropped with
    the undirected edge derivation, so isolated nodes don't appear)."""
    sql = (
        _kg_ctes()
        + f""",
{_und_cte("kc")},
kc_nbr AS MATERIALIZED (SELECT a AS src, b AS dst FROM kc_und
           UNION ALL SELECT b AS src, a AS dst FROM kc_und),
kc_deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS deg FROM kc_nbr GROUP BY src),
kc_c0 AS MATERIALIZED (SELECT v, deg AS c FROM kc_deg)"""
    )
    for t in range(1, KCORE_ITERS + 1):
        sql += f""",
kc_c{t} AS MATERIALIZED (
  SELECT v, MAX(LEAST(x, r)) AS c FROM (
    SELECT n.src AS v, p.c AS x,
           ROW_NUMBER() OVER (PARTITION BY n.src ORDER BY p.c DESC) AS r
    FROM kc_nbr n JOIN kc_c{t - 1} p ON p.v = n.dst)
  GROUP BY v)"""
    sql += f"""
SELECT d.v AS entity, CAST(d.deg AS BIGINT) AS degree,
       CAST(c.c AS BIGINT) AS coreness
FROM kc_deg d JOIN kc_c{KCORE_ITERS} c ON c.v = d.v"""
    return sql


BFS_ITERS = 8  # dense synthetic entity graph reaches fixpoint in ~2-3 hops;
# extra rounds are no-ops (empty frontier → empty new set → reached unchanged)
BFS_SEEDS = 3


def kg_bfs_distance_sql() -> str:
    """Multi-source BFS hop-distance oracle over the KG entity graph: the
    Spark side's fixed-round frontier loop unrolled as a CTE chain. Seeds =
    the BFS_SEEDS highest-degree entities (ties broken by MIN entity id) —
    a deterministic stand-in for the external seed list a production
    reachability job would take. Integer/string arithmetic only — no float
    parity concerns. Unreached nodes are absent from the output (same
    edge-induced domain posture as kg_coreness)."""
    # MATERIALIZED is load-bearing on the per-round reached set: each round
    # references bfs_r{t-1} twice (the NOT EXISTS + the carry-forward UNION),
    # so an un-hinted chain re-evaluates the entire KG build 2^t times (the
    # measured LPA blow-up, kg_label_propagation_sql). The frontier is
    # referenced once but derives from the twice-referenced new set.
    sql = (
        _kg_ctes()
        + f""",
{_und_cte("bfs")},
bfs_nbr AS MATERIALIZED (SELECT a AS src, b AS dst FROM bfs_und
            UNION ALL SELECT b AS src, a AS dst FROM bfs_und),
bfs_deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS deg FROM bfs_nbr GROUP BY src),
bfs_seeds AS MATERIALIZED (
  SELECT v FROM bfs_deg ORDER BY deg DESC, v ASC LIMIT {BFS_SEEDS}),
bfs_r0 AS MATERIALIZED (SELECT v, 0 AS hop FROM bfs_seeds),
bfs_f0 AS MATERIALIZED (SELECT v FROM bfs_seeds)"""
    )
    for t in range(1, BFS_ITERS + 1):
        sql += f""",
bfs_n{t} AS MATERIALIZED (
  SELECT c.v, {t} AS hop FROM (
    SELECT DISTINCT n.src AS v
    FROM bfs_nbr n JOIN bfs_f{t - 1} f ON f.v = n.dst) c
  WHERE NOT EXISTS (SELECT 1 FROM bfs_r{t - 1} r WHERE r.v = c.v)),
bfs_r{t} AS MATERIALIZED (
  SELECT v, hop FROM bfs_r{t - 1} UNION ALL SELECT v, hop FROM bfs_n{t}),
bfs_f{t} AS (SELECT v FROM bfs_n{t})"""
    sql += f"""
SELECT v AS entity, CAST(hop AS BIGINT) AS hop FROM bfs_r{BFS_ITERS}"""
    return sql


def kg_modularity_sql() -> str:
    """Per-community Newman modularity oracle: the LPA oracle reused
    VERBATIM as a wrapped CTE (single source — the community assignment
    cannot drift from kg_label_propagation's), the undirected edge set
    re-derived through a second wrapped _kg_ctes chain (MATERIALIZED
    internally, so the double expansion costs two linear passes, not an
    exponential blow-up), then q_c = in_c/m − (deg_c/(2m))² as the same
    fixed 4-op IEEE tree the Spark side evaluates over exactly-computed
    integers."""
    und = (
        _kg_ctes()
        + """
SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
FROM triples WHERE subj <> obj"""
    )
    return f"""
WITH md_lpa AS MATERIALIZED (
  SELECT entity, community FROM ({kg_label_propagation_sql()})),
md_base AS MATERIALIZED ({und}),
md_m AS (SELECT COUNT(*) AS m FROM md_base),
md_nbr AS (SELECT a AS v FROM md_base UNION ALL SELECT b AS v FROM md_base),
md_deg AS (SELECT v, COUNT(*) AS deg FROM md_nbr GROUP BY v),
md_in AS (
  SELECT ca.community AS community, COUNT(*) AS in_edges
  FROM md_base e
  JOIN md_lpa ca ON ca.entity = e.a
  JOIN md_lpa cb ON cb.entity = e.b
  WHERE ca.community = cb.community
  GROUP BY 1),
md_grp AS (
  SELECT l.community, COUNT(*) AS n_members,
         SUM(COALESCE(d.deg, 0)) AS deg_sum
  FROM md_lpa l LEFT JOIN md_deg d ON d.v = l.entity
  GROUP BY 1)
SELECT g.community,
       CAST(g.n_members AS BIGINT) AS n_members,
       CAST(COALESCE(i.in_edges, 0) AS BIGINT) AS in_edges,
       CAST(g.deg_sum AS BIGINT) AS deg_sum,
       (COALESCE(i.in_edges, 0) / m.m)
         - ((g.deg_sum / (2 * m.m)) * (g.deg_sum / (2 * m.m)))
         AS q_contrib
FROM md_grp g
LEFT JOIN md_in i ON i.community = g.community
CROSS JOIN md_m m"""


WSP_ITERS = 8  # Bellman-Ford relaxation rounds; the dense synthetic entity
# graph converges in ~2-3 (extra rounds are no-op relaxations), same
# fixed-round posture as BFS_ITERS
WSP_SEEDS = 3


def _wsp_cost_sql(cnt: str) -> str:
    """Integer inverse-support edge cost: strongly-supported edges are
    cheap (cost 1 at >=3 supporting facts), weak ones expensive — the SQL
    twin of registry._wsp_cost. Pure integer CASE, no float."""
    return (
        f"CASE WHEN {cnt} >= 3 THEN 1 WHEN {cnt} = 2 THEN 2 ELSE 3 END"
    )


def kg_weighted_paths_sql() -> str:
    """Weighted shortest-path oracle over the KG entity graph: the Spark
    side's fixed-round Bellman-Ford relaxation unrolled as a CTE chain.
    Edge costs are integer inverse-support (see _wsp_cost_sql) over the
    UNDEDUPED fact multiplicity — computed BEFORE the distinct step the
    other graph oracles apply, because multiplicity IS the weight signal.
    Seeds = the WSP_SEEDS highest-degree entities (ties: min entity id),
    the kg_bfs_distance posture. Integer-only — no float parity concerns.
    Unreached nodes are absent (edge-induced domain)."""
    sql = (
        _kg_ctes()
        + f""",
wsp_cnt AS MATERIALIZED (
  SELECT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b,
         COUNT(*) AS cnt
  FROM triples WHERE subj <> obj GROUP BY 1, 2),
wsp_edges AS MATERIALIZED (
  SELECT a AS src, b AS dst, {_wsp_cost_sql('cnt')} AS w FROM wsp_cnt
  UNION ALL
  SELECT b AS src, a AS dst, {_wsp_cost_sql('cnt')} AS w FROM wsp_cnt),
wsp_deg AS MATERIALIZED (
  SELECT src AS v, COUNT(*) AS deg FROM wsp_edges GROUP BY src),
wsp_seeds AS MATERIALIZED (
  SELECT v FROM wsp_deg ORDER BY deg DESC, v ASC LIMIT {WSP_SEEDS}),
wsp_d0 AS MATERIALIZED (SELECT v, 0 AS dist FROM wsp_seeds)"""
    )
    for t in range(1, WSP_ITERS + 1):
        sql += f""",
wsp_c{t} AS (
  SELECT e.dst AS v, d.dist + e.w AS dist
  FROM wsp_d{t - 1} d JOIN wsp_edges e ON e.src = d.v
  UNION ALL
  SELECT v, dist FROM wsp_d{t - 1}),
wsp_d{t} AS MATERIALIZED (
  SELECT v, MIN(dist) AS dist FROM wsp_c{t} GROUP BY v)"""
    sql += f"""
SELECT v AS entity, CAST(dist AS BIGINT) AS dist FROM wsp_d{WSP_ITERS}"""
    return sql


RW_STEPS = 4  # walk length (steps beyond the start node)
RW_WALKS = 2  # walks started per node


def kg_random_walks_sql() -> str:
    """Deterministic random-walk corpus oracle over the KG entity graph
    (the DeepWalk/node2vec sampling step): the Spark side's fixed-step
    transition loop unrolled as a CTE chain. The "random" next hop from the
    walk's current node is the neighbor minimizing (portable_hash('rw|' ||
    start || '|' || walk || '|' || step || '|' || neighbor), neighbor) —
    pairwise-independent per (walk, step) like a seeded RNG draw, but a
    pure expression both engines evaluate bit-identically (the JL-matrix
    idiom, plans/lmops.py). Integer/string only — no float parity
    concerns. Edge-induced node domain (kg_coreness posture); the dense
    synthetic graph has no dead ends, and a dead-end walk would simply end
    early on BOTH sides (inner join against the neighbor relation)."""
    from .textops import PORTABLE_HASH_SQL  # single source of the hash twin

    sql = (
        _kg_ctes()
        + f""",
{_und_cte("rw")},
rw_nbr AS MATERIALIZED (SELECT a AS src, b AS dst FROM rw_und
            UNION ALL SELECT b AS src, a AS dst FROM rw_und),
rw_s0 AS MATERIALIZED (
  SELECT n.u AS start, ww.w, n.u AS cur
  FROM (SELECT DISTINCT src AS u FROM rw_nbr) n,
       UNNEST(generate_series(0, {RW_WALKS - 1})) AS ww(w))"""
    )
    for t in range(1, RW_STEPS + 1):
        h = PORTABLE_HASH_SQL.format(
            x=f"CONCAT('rw|', s.start, '|', s.w, '|', {t}, '|', n.dst)"
        )
        sql += f""",
rw_c{t} AS (
  SELECT s.start, s.w, n.dst, {h} AS h
  FROM rw_s{t - 1} s JOIN rw_nbr n ON n.src = s.cur),
rw_s{t} AS MATERIALIZED (
  SELECT start, w, dst AS cur FROM rw_c{t}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY start, w ORDER BY h, dst) = 1)"""
    sql += "\n" + "\nUNION ALL\n".join(
        f"""SELECT start AS start_entity, CAST(w AS INT) AS walk_id,
       CAST({t} AS INT) AS step, cur AS node FROM rw_s{t}"""
        for t in range(0, RW_STEPS + 1)
    )
    return sql


def kg_connected_components_sql() -> str:
    """Connected-components oracle over the KG entity graph: exact
    min-reachable-label fixpoint via a recursive CTE (the DEDUP_CLUSTERS_SQL
    pattern, textops.py), so — unlike the fixed-round unrolled oracles — it
    has NO round-count coupling to the Spark side: the alternating-star
    iteration (run to its own set-equality fixpoint) and the recursive label
    propagation agree by construction at ANY component diameter. Working ids
    are the numeric QIDs (regexp_extract '(\\d+)'), the exact rule entity
    canonicalization applies (canonicalize._qnum), so the representative is
    the component's min-numeric-QID member. The `r.lbl < e.dst` prune is
    sound for the final MIN (a dropped label l >= dst is dominated by dst's
    own smaller seed label); UNION (not ALL) bounds the recursion to the
    finite (node, label) pair set. Edge-induced node domain (self-loops
    dropped with the undirected derivation — kg_coreness posture)."""
    base = _kg_ctes()
    assert base.startswith("\nWITH ")
    sql = base.replace("\nWITH ", "\nWITH RECURSIVE ", 1)
    return (
        sql
        + f",\n{_und_cte('cc')}"
        + r""",
cc_edges AS MATERIALIZED (
  SELECT CAST(regexp_extract(a, '(\d+)', 1) AS BIGINT) AS src,
         CAST(regexp_extract(b, '(\d+)', 1) AS BIGINT) AS dst FROM cc_und
  UNION ALL
  SELECT CAST(regexp_extract(b, '(\d+)', 1) AS BIGINT) AS src,
         CAST(regexp_extract(a, '(\d+)', 1) AS BIGINT) AS dst FROM cc_und),
cc_nodes AS MATERIALIZED (SELECT DISTINCT src AS u FROM cc_edges),
cc_reach(u, lbl) AS (
  SELECT u, u FROM cc_nodes
  UNION
  SELECT e.dst, r.lbl FROM cc_reach r JOIN cc_edges e ON e.src = r.u
  WHERE r.lbl < e.dst),
cc_comp AS (SELECT u, MIN(lbl) AS root FROM cc_reach GROUP BY u)
SELECT 'Q' || CAST(u AS VARCHAR) AS entity,
       'Q' || CAST(root AS VARCHAR) AS component_rep,
       CAST(COUNT(*) OVER (PARTITION BY root) AS BIGINT) AS component_size,
       u = root AS is_rep
FROM cc_comp"""
    )


def kg_temporal_facts_sql() -> str:
    """Temporal fact-scoping oracle: every verified triple joined back to
    its source turn's timestamp via the (conv_id, turn_idx) provenance it
    carries, then rolled up per distinct (subj, pred, obj) fact — mention
    counts, conversation coverage, support counts, first/last observation
    and the observation span in exact epoch seconds (integer subtraction;
    no day-truncation semantics to diverge on)."""
    cfg = DEFAULT_CONFIG
    support = _q(list(cfg.classes)[0])
    return (
        _kg_ctes()
        + f""",
tf_ts AS (
  SELECT conv_id, turn_idx,
         TIMESTAMP '2026-01-01 00:00:00'
           + to_seconds(CAST((doc_id % 1000000) * 1000 + turn_idx * 7
                             AS BIGINT)) AS ts
  FROM turns)
SELECT t.subj, t.pred, t.obj,
       CAST(COUNT(*) AS BIGINT) AS n_mentions,
       CAST(COUNT(DISTINCT t.conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) FILTER (WHERE t.verdict = {support}) AS BIGINT)
         AS n_supports,
       MIN(ts.ts) AS first_seen,
       MAX(ts.ts) AS last_seen,
       CAST(epoch(MAX(ts.ts)) - epoch(MIN(ts.ts)) AS BIGINT) AS span_seconds
FROM triples t
JOIN tf_ts ts ON ts.conv_id = t.conv_id AND ts.turn_idx = t.turn_idx
GROUP BY 1, 2, 3"""
    )


def nli_training_export_sql() -> str:
    """Training-pair export oracle: the verified triples projected into the
    (premise = selected evidence sentence, structured hypothesis fields,
    label = verdict) rows an NLI fine-tune consumes (reference anchor:
    finetune.py trains on exactly this shape), with a DETERMINISTIC
    80/10/10 split by portable md5 hash of the claim id — reproducible on
    any cluster size / retry / engine, never rand()."""
    from .textops import PORTABLE_HASH_SQL  # single source of the hash twin

    h = PORTABLE_HASH_SQL.format(x="CONCAT('split|', claim_id)")
    return (
        _kg_ctes()
        + f"""
SELECT claim_id, conv_id,
       result_sentence AS premise,
       subj, pred, obj,
       verdict AS label,
       CASE WHEN h10 < 8 THEN 'train' WHEN h10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT *, {h} % 10 AS h10
  FROM triples)"""
    )


# The `tts` CTE: the north-rule input table re-derived in SQL — the `turns`
# CTE gives conv_id/turn_idx/turn_text, and role/tool/ts are the same pure
# arithmetic datagen applies — role = ROLES[turn_idx % 3], tool =
# TOOLS[(doc_id + turn_idx) % 4] for tool turns else '', ts = epoch +
# (doc_id % 1e6)·1000 + turn_idx·7 seconds (datagen.py:124-127).
_TTS_CTE = """,
tts AS (
  SELECT conv_id, turn_idx, turn_text,
         CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
              ELSE 'tool' END AS role,
         CASE WHEN turn_idx % 3 = 2
              THEN CASE (doc_id + turn_idx) % 4
                   WHEN 0 THEN 'search' WHEN 1 THEN 'browser'
                   WHEN 2 THEN 'python' ELSE '' END
              ELSE '' END AS tool,
         TIMESTAMP '2026-01-01 00:00:00'
           + to_seconds(CAST((doc_id % 1000000) * 1000 + turn_idx * 7
                             AS BIGINT)) AS ts
  FROM turns)"""


def transcript_turn_stats_sql() -> str:
    """Per-role rollup oracle over the north-rule input table itself
    (conv_id, turn_idx, role, text, tool, ts — the shared _TTS_CTE).
    Integer/string/timestamp arithmetic plus ONE final IEEE division."""
    return (
        _kg_ctes()
        + _TTS_CTE
        + """
SELECT role,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(SUM(length(turn_text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(turn_text)) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_calls,
       CAST(COUNT(DISTINCT NULLIF(tool, '')) AS BIGINT) AS n_distinct_tools,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM tts GROUP BY role"""
    )


def conv_tool_chain_sql() -> str:
    """ORDERED string aggregation oracle: per conversation, the '>'-joined
    tool invocation sequence in turn order (string_agg ... ORDER BY — the
    SQL-native ordered aggregate), plus call counts. Exercises the
    order-sensitive aggregation contract that every other agg in the suite
    is deliberately insensitive to."""
    return (
        _kg_ctes()
        + _TTS_CTE
        + """
SELECT conv_id,
       string_agg(tool, '>' ORDER BY turn_idx) AS tool_chain,
       CAST(COUNT(*) AS BIGINT) AS n_tool_calls,
       CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_distinct_tools
FROM tts WHERE tool <> '' GROUP BY conv_id"""
    )


def sft_pairs_sql() -> str:
    """SFT training-pair oracle: every (user turn → immediately following
    assistant turn) adjacency in the north-rule input table, projected as
    (prompt, response) with the same deterministic portable-hash 80/10/10
    split the NLI export uses. LEAD over (conv_id, turn_idx) is the SQL
    twin of the Spark window; the nidx = turn_idx + 1 adjacency guard makes
    the contract correct on gappy turn sequences, not just dense ones."""
    from .textops import PORTABLE_HASH_SQL  # single source of the hash twin

    h = PORTABLE_HASH_SQL.format(
        x="CONCAT('sft|', conv_id, '|', CAST(turn_idx AS VARCHAR))"
    )
    return (
        _kg_ctes()
        + _TTS_CTE
        + f""",
sft_led AS (
  SELECT conv_id, turn_idx, role, turn_text,
         LEAD(role) OVER w AS nrole,
         LEAD(turn_text) OVER w AS ntext,
         LEAD(turn_idx) OVER w AS nidx
  FROM tts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id,
       CAST(turn_idx AS BIGINT) AS prompt_turn_idx,
       turn_text AS prompt,
       ntext AS response,
       CASE WHEN h10 < 8 THEN 'train' WHEN h10 = 8 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT *, {h} % 10 AS h10
      FROM sft_led
      WHERE role = 'user' AND nrole = 'assistant'
        AND nidx = turn_idx + 1)"""
    )


# Context-assembly token budget: the longest turn SUFFIX of each
# conversation whose whitespace-token total stays <= this many tokens is
# kept (the newest-first truncation every chat LM serving/training stack
# applies). Module constant, not config, so the oracle literal cannot
# drift from the Spark plan. 48 discriminates on the synthetic turns
# (turns run ~1-31 tokens, median 15; conversations median 79 tokens over
# ~5 turns — so roughly half the conversations get truncated).
CONTEXT_BUDGET = 48


DPO_BATCH = 8  # in-batch negative-sampling batch size


def dpo_pairs_sql() -> str:
    """DPO preference-pair oracle: the SFT pair relation (reused VERBATIM
    as a wrapped CTE — single source with sft_pairs_sql, so the pair
    derivation cannot drift) plus a deterministic in-batch negative: pairs
    are hash-bucketed into batches of ~DPO_BATCH, and each pair's
    `rejected` is the NEXT pair's chosen response in the hash-shuffled
    bucket ring (cyclic LEAD → FIRST_VALUE). Rows whose sampled negative
    equals the chosen response (singleton buckets, duplicate responses)
    are dropped on BOTH sides. Integer/string only."""
    from .textops import PORTABLE_HASH_SQL  # single source of the hash twin

    h = PORTABLE_HASH_SQL.format(
        x="CONCAT('dpo|', conv_id, '|', CAST(prompt_turn_idx AS VARCHAR))"
    )
    return f"""
WITH sftp AS MATERIALIZED ({sft_pairs_sql()}),
dpo_n AS (SELECT COUNT(*) AS n_pairs FROM sftp),
dpo_h AS (
  SELECT s.*, {h} AS h,
         {h} % GREATEST((n.n_pairs + {DPO_BATCH - 1}) // {DPO_BATCH}, 1)
           AS bucket
  FROM sftp s CROSS JOIN dpo_n n),
dpo_r AS (
  SELECT conv_id, prompt_turn_idx, prompt, response AS chosen, split,
         COALESCE(
           LEAD(response) OVER w,
           FIRST_VALUE(response) OVER (
             PARTITION BY bucket ORDER BY h, conv_id, prompt_turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ) AS rejected
  FROM dpo_h
  WINDOW w AS (PARTITION BY bucket ORDER BY h, conv_id, prompt_turn_idx))
SELECT * FROM dpo_r WHERE rejected <> chosen"""


def tool_transitions_sql() -> str:
    """Markov tool-transition oracle: LEAD over the tool-filtered turn
    sequence of the shared tts CTE, combinable pair counts, row-stochastic
    probability = one IEEE division of exact counts."""
    return (
        _kg_ctes()
        + _TTS_CTE
        + """,
mk_p AS (
  SELECT tool, LEAD(tool) OVER (
           PARTITION BY conv_id ORDER BY turn_idx) AS next_tool
  FROM tts WHERE tool <> ''),
mk_c AS (
  SELECT tool, next_tool, COUNT(*) AS n_transitions
  FROM mk_p WHERE next_tool IS NOT NULL GROUP BY 1, 2),
mk_t AS (SELECT tool, SUM(n_transitions) AS n_total FROM mk_c GROUP BY 1)
SELECT c.tool, c.next_tool,
       CAST(c.n_transitions AS BIGINT) AS n_transitions,
       CAST(c.n_transitions AS DOUBLE) / t.n_total AS prob
FROM mk_c c JOIN mk_t t ON t.tool = c.tool"""
    )


def context_tail_sql() -> str:
    """Context-window truncation oracle: per-turn whitespace token counts,
    suffix-cumulative sum via SUM OVER (ORDER BY turn_idx DESC ROWS
    UNBOUNDED PRECEDING), keep rows with suffix_tokens <= CONTEXT_BUDGET.
    Integers/strings only — no float discipline needed."""
    return (
        _kg_ctes()
        + _TTS_CTE
        + f""",
ctx_tok AS (
  SELECT conv_id, turn_idx, role,
         len(string_split(turn_text, ' ')) AS n_tokens
  FROM tts),
ctx_suf AS (
  SELECT conv_id, turn_idx, role, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS suffix_tokens
  FROM ctx_tok)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(suffix_tokens AS BIGINT) AS suffix_tokens
FROM ctx_suf WHERE suffix_tokens <= {CONTEXT_BUDGET}"""
    )


# Wedge centers above this degree are excluded from common-neighbor
# enumeration (a degree-d center emits d² wedge pairs — the classic hub
# blow-up; the cap makes the capped CN a documented LOWER BOUND through
# hot entities). 64 does not bind on the synthetic graph (max degree ~40);
# cap behavior is pinned on crafted graphs in tests/test_linkpred.py.
LINKPRED_HUB_CAP = 64
LINKPRED_MIN_CN = 2


def kg_link_prediction_sql() -> str:
    """Link-prediction oracle over the KG entity graph: common-neighbor
    counts via wedge enumeration at hub-capped centers, restricted to
    NON-adjacent pairs, with neighbor-set Jaccard = cn/(deg_a+deg_b-cn).
    Integer arithmetic except the single final IEEE division (correctly
    rounded per IEEE 754 in both engines, unlike ln())."""
    return (
        _kg_ctes()
        + f""",
lp_und AS (
  SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
  FROM triples WHERE subj <> obj),
lp_nbr AS (SELECT a AS src, b AS dst FROM lp_und
           UNION ALL SELECT b AS src, a AS dst FROM lp_und),
lp_deg AS (SELECT src AS v, COUNT(*) AS deg FROM lp_nbr GROUP BY src),
lp_centers AS (
  SELECT n.src, n.dst FROM lp_nbr n
  JOIN lp_deg d ON d.v = n.src
  WHERE d.deg <= {LINKPRED_HUB_CAP}),
lp_cn AS (
  SELECT o1.dst AS a, o2.dst AS b, COUNT(*) AS cn
  FROM lp_centers o1
  JOIN lp_centers o2 ON o2.src = o1.src AND o1.dst < o2.dst
  GROUP BY 1, 2
  HAVING COUNT(*) >= {LINKPRED_MIN_CN}),
lp_new AS (
  SELECT c.a, c.b, c.cn FROM lp_cn c
  WHERE NOT EXISTS (SELECT 1 FROM lp_und e WHERE e.a = c.a AND e.b = c.b))
SELECT p.a AS entity_a, p.b AS entity_b,
       CAST(p.cn AS BIGINT) AS common_neighbors,
       CAST(da.deg AS BIGINT) AS degree_a,
       CAST(db.deg AS BIGINT) AS degree_b,
       CAST(p.cn AS DOUBLE) / (da.deg + db.deg - p.cn) AS jaccard
FROM lp_new p
JOIN lp_deg da ON da.v = p.a
JOIN lp_deg db ON db.v = p.b"""
    )


def kg_assortativity_sql() -> str:
    """Degree-assortativity oracle over the KG entity graph: Pearson
    correlation of endpoint degrees across the symmetrized edge list
    (Newman 2002). Because each undirected edge contributes BOTH ordered
    pairs, the x- and y-marginals coincide, so the textbook formula
    collapses to r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — sqrt() drops out
    entirely (the jaccard-not-Adamic-Adar rule: no libm call to diverge
    on). Sums are CAST to BIGINT before the product arithmetic so DuckDB's
    HUGEINT aggregates take the same BIGINT ops Spark's longs do; the
    single final division is one correctly-rounded IEEE op. A regular
    graph (all degrees equal) makes the denominator 0 → NULL on both
    engines."""
    return (
        _kg_ctes()
        + """,
as_und AS (
  SELECT DISTINCT LEAST(subj, obj) AS a, GREATEST(subj, obj) AS b
  FROM triples WHERE subj <> obj),
as_nbr AS (SELECT a AS src, b AS dst FROM as_und
           UNION ALL SELECT b AS src, a AS dst FROM as_und),
as_deg AS (SELECT src AS v, COUNT(*) AS deg FROM as_nbr GROUP BY src),
as_s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx.deg) AS BIGINT) AS sx,
         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx
  FROM as_nbr p
  JOIN as_deg dx ON dx.v = p.src
  JOIN as_deg dy ON dy.v = p.dst)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM as_und) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM as_deg) AS n_nodes,
       n AS n_pairs,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sx AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS assortativity
FROM as_s"""
    )


CALIBRATION_BINS = 10


def kg_calibration_sql() -> str:
    """Verdict-calibration oracle: the NLI scorer's predicted support
    probability (w_supports) binned into CALIBRATION_BINS fixed-width bins
    over [0, 1] (explicit FLOOR formula — the drift_report width_bucket
    rule), each bin reporting how often 'supports' verdicts ACTUALLY won
    vs the mean predicted probability (the reliability-diagram table).
    mean_pred goes through DECIMAL(28,14) partial sums (order-independent,
    the kg_pagerank discipline); support_rate and the gap are fixed IEEE
    trees over exactly-computed inputs."""
    cfg = DEFAULT_CONFIG
    support = _q(list(cfg.classes)[0])
    return (
        _kg_ctes()
        + f"""
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_claims,
       CAST(COUNT(*) FILTER (WHERE verdict = {support}) AS BIGINT)
         AS n_supported,
       CAST(COUNT(*) FILTER (WHERE verdict = {support}) AS DOUBLE)
         / COUNT(*) AS support_rate,
       CAST(SUM(CAST(w_supports AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)
         AS mean_pred,
       ABS(CAST(COUNT(*) FILTER (WHERE verdict = {support}) AS DOUBLE)
             / COUNT(*)
           - CAST(SUM(CAST(w_supports AS DECIMAL(28,14))) AS DOUBLE)
             / COUNT(*)) AS calibration_gap
FROM (
  SELECT verdict, w_supports,
         CAST(LEAST(FLOOR(w_supports * {float(CALIBRATION_BINS)}) + 1,
                    {CALIBRATION_BINS}) AS INT) AS bin
  FROM triples)
GROUP BY bin"""
    )


TOOL_COOCCUR_MIN_SUPP = 2


def tool_cooccurrence_sql() -> str:
    """Order-free tool co-occurrence oracle: the basket_pairs shape over
    the shared tts CTE (conversations as baskets, tools as items) — distinct
    (conv, tool) relation, a < b self-join pairs, support threshold,
    confidence and lift as single IEEE divisions of exact-integer
    products."""
    return (
        _kg_ctes()
        + _TTS_CTE
        + f""",
tc_i AS (
  SELECT DISTINCT conv_id AS k, tool FROM tts WHERE tool <> ''),
tc_n AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_convs FROM tc_i),
tc_s AS (SELECT tool, COUNT(*) AS s FROM tc_i GROUP BY 1),
tc_p AS (
  SELECT a.tool AS ta, b.tool AS tb, COUNT(*) AS supp_ab
  FROM tc_i a JOIN tc_i b ON b.k = a.k AND a.tool < b.tool
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TOOL_COOCCUR_MIN_SUPP})
SELECT p.ta AS tool_a, p.tb AS tool_b,
       CAST(p.supp_ab AS BIGINT) AS supp_ab,
       CAST(sa.s AS BIGINT) AS supp_a,
       CAST(sb.s AS BIGINT) AS supp_b,
       CAST(p.supp_ab AS DOUBLE) / CAST(sa.s AS DOUBLE) AS confidence,
       CAST(p.supp_ab * n.n_convs AS DOUBLE)
         / CAST(sa.s * sb.s AS DOUBLE) AS lift
FROM tc_p p
JOIN tc_s sa ON sa.tool = p.ta
JOIN tc_s sb ON sb.tool = p.tb
CROSS JOIN tc_n n"""
    )
