"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin
family), with a brute-force DuckDB oracle.

This is the EXACT counterpart to the repo's two near-dup scale paths:
`dedup_ngram_jaccard` keeps the inverted-index self-join tractable by
CAPPING the shingle universe (df > MAX_SHINGLE_DF dropped — the answer is
exact over a *modified* universe), and MinHash/LSH is *approximate* over
the full universe. Prefix filtering gives the third point in that design
space: the answer is exact over the FULL shingle universe, and the
quadratic candidate generation is bounded by joining only each document's
θ-prefix — its rarest shingles under one global order.

Reference anchor: the reference deduplicates evidence sentences per claim
by exact text equality (ProVe `utils/wikidata_utils.py` sentence handling);
this operator is the corpus-scale generalization the training-data lane
needs (near-dup detection with provable recall).

Soundness (published prefix-filter lemma — Chaudhuri/Ganti/Kaushik ICDE'06,
Bayardo et al. WWW'07, Xiao et al. PPJoin): for Jaccard(A, B) >= θ the
overlap satisfies |A∩B| >= ceil(θ·|A|) and >= ceil(θ·|B|), so under ANY
global token order the first |X| - ceil(θ·|X|) + 1 tokens of each side must
share at least one token. Candidates are generated ONLY from those
prefixes; verification then computes the exact intersection over the full
sets, so false candidates are dropped and (by the lemma) no true pair is
ever missed. The DuckDB oracle is deliberately the BRUTE-FORCE join over
the full shingle relation — a hash-exact match against it is an empirical
proof of the prefix filter's soundness on the data, not just of the
verification arithmetic.

Exactness discipline: the threshold test is integer arithmetic
(DEN·inter >= NUM·(na + nb - inter)); the reported jaccard is ONE IEEE
double division of exact integers — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .textops import SHINGLES_SQL, _shingles

# θ = NUM/DEN = 0.7. Kept rational so prefix lengths, size bounds, and the
# final threshold are all exact-integer on both engines (no float θ·n).
THETA_NUM = 7
THETA_DEN = 10

# caches persisted by the previous invocation — released on the next call
# (same hygiene as textops._DEDUP_CACHES / registry._KG_CACHES)
_SIM_CACHES: list = []


def _release_caches() -> None:
    for df in _SIM_CACHES:
        try:
            df.unpersist()
        except Exception:
            pass
    _SIM_CACHES.clear()


def _prefix_relation(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(full shingle set, prefix relation). The prefix relation holds, per
    document, the p = n - ceil(θ·n) + 1 globally-rarest shingles plus the
    document's set size n.

    Scale shape: the global order is (document-frequency, shingle) — NO
    global rank/window is ever computed; the order key is the df value
    itself, attached by one token-scale groupBy + equi-join (same shape as
    dedup_ngram_jaccard's hot-shingle pass). The per-document prefix is one
    doc-partitioned window (count + row_number share the partitioning, one
    exchange + one sort). Frequency-ascending order is what bounds the
    self-join fan-out: a stop-shingle present in k documents lands in a
    document's prefix only when it is among that document's rarest shingles
    — so hot keys systematically fall OUT of the join input, the opposite
    of the naive inverted index."""
    sh = _shingles(spark, sf_dir).persist()
    _SIM_CACHES.append(sh)
    sh.count()  # eager: dfreq/ranked/verify-a/verify-b are sibling consumers
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    ranked = sh.join(dfreq, "s")
    wdoc = Window.partitionBy("doc_id")
    worder = wdoc.orderBy("df", "s")
    p_len = F.col("n") - F.expr(
        f"({THETA_NUM} * n + {THETA_DEN - 1}) DIV {THETA_DEN}"
    ) + F.lit(1)
    prefix = (
        ranked.withColumn("n", F.count("*").over(wdoc))
        .withColumn("pos", F.row_number().over(worder))
        .where(F.col("pos") <= p_len)
        .select("doc_id", "s", "n")
        .persist()
    )
    _SIM_CACHES.append(prefix)
    prefix.count()  # eager: both self-join sides consume it concurrently
    return sh, prefix


def _prefix_candidates(prefix: DataFrame) -> DataFrame:
    """Candidate pairs: prefixes sharing a shingle, under the symmetric size
    bound θ·na <= nb <= na/θ (integer form — any pair violating it cannot
    reach Jaccard θ since inter <= min(na, nb) and union >= max(na, nb)).
    Distinct-deduped so verification touches each pair once."""
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "s", F.col("n").alias("na")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.col("n").alias("nb"),
    )
    return (
        pa.join(
            pb,
            (F.col("s") == F.col("s_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb") * THETA_DEN >= F.col("na") * THETA_NUM)
            & (F.col("nb") * THETA_NUM <= F.col("na") * THETA_DEN),
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )


def jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with EXACT 3-gram-shingle Jaccard >= 0.7, found
    without an all-pairs comparison and without modifying the shingle
    universe: AllPairs/PPJoin prefix filtering generates candidates from
    each document's rarest-shingle θ-prefix, then one exact verification
    join computes the true intersection (measured on sf0.01: 26 candidates
    stand in for 11,533 inverted-index pairs — 443× less verify work —
    with zero true pairs missed; the brute-force oracle pins that recall).

    Scale shape: two shuffles on shingle (df count + prefix self-join), one
    doc-partitioned window, one composite-key verify join carrying
    |candidates|·avg-doc-size rows — NEVER |docs|² and never df² on a hot
    shingle (see _prefix_relation). Candidate verification is
    embarrassingly parallel on (doc_a, doc_b)."""
    _release_caches()
    sh, prefix = _prefix_relation(spark, sf_dir)
    cand = _prefix_candidates(prefix)
    ta = sh.select(F.col("doc_id").alias("doc_a"), "s")
    tb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.where(
            F.col("inter") * THETA_DEN
            >= F.lit(THETA_NUM) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            "inter",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )


# The oracle is deliberately brute force (no prefix logic): Spark matching
# it hash-exactly proves the prefix filter lost nothing. sj_sh is
# MATERIALIZED because it is referenced three times and DuckDB inlines
# plain CTEs (the measured 2^refs re-evaluation trap).
JACCARD_PREFIX_SQL = f"""
WITH {SHINGLES_SQL},
sj_sh AS MATERIALIZED (SELECT doc_id, s FROM shingles),
sj_sizes AS (SELECT doc_id, COUNT(*) AS n FROM sj_sh GROUP BY doc_id),
sj_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sj_sh a JOIN sj_sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, sa.n AS na, sb.n AS nb, inter,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM sj_pairs
JOIN sj_sizes sa ON doc_a = sa.doc_id
JOIN sj_sizes sb ON doc_b = sb.doc_id
WHERE inter * {THETA_DEN} >= {THETA_NUM} * (sa.n + sb.n - inter)
"""


SIMOPS_QUERIES: dict[str, tuple] = {
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "jaccard_prefix_join": (jaccard_prefix_join, JACCARD_PREFIX_SQL),
}
