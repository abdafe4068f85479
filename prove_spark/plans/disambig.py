"""Popularity-ranked entity disambiguation (reference functions.py:642-669).

The reference resolves an ambiguous entity mention by ranking its candidate
QIDs on sitelink counts from an external CSV (N_connected_site desc) and
taking the top candidate. Here that is a first-class registered query over
the `documents` table:

  mentions  = documents containing an alias (broadcast nested-loop against
              the dim-sized alias list — map-only, no shuffle of documents)
  candidates = alias → QID (1:N for ambiguous aliases)
  popularity = external sitelinks CSV (sources/popularity.py)
  resolve    = top-1 candidate per alias by (sitelinks desc, numeric QID asc)

The DuckDB oracle inlines the same dictionary literals as VALUES CTEs, so
both engines derive from the single source of truth in dictionaries.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..dictionaries import ALIASES, SITELINKS
from .relational import _t


def _aliases_df(spark):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(ALIASES, columns=["alias", "qid"]))


def alias_resolve_popularity(spark, sf_dir):
    """Per alias observed in the corpus: the popularity-resolved QID plus
    mention stats. The candidate ranking is a tiny dim-side window; the only
    documents-side work is a broadcast substring scan (map-only)."""
    from ..sources.popularity import read_popularity

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aliases = _aliases_df(spark)
    pop = read_popularity(spark)

    # rank candidates per alias: sitelinks desc, numeric QID asc (the
    # reference's N_connected_site sort, functions.py:661-669)
    ranked = (
        aliases.join(F.broadcast(pop), "qid", "left")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("alias").orderBy(
                    F.desc_nulls_last("n_connected_site"),
                    F.asc(F.regexp_extract("qid", r"(\d+)", 1).cast("long")),
                )
            ),
        )
    )
    resolved = ranked.where(F.col("rn") == 1).select(
        "alias",
        F.col("qid").alias("resolved_qid"),
        F.col("n_connected_site").alias("sitelinks"),
    )
    n_cands = aliases.groupBy("alias").agg(F.count("*").alias("n_candidates"))

    # mention counting: broadcast the alias list; documents never shuffle.
    # SCALE NOTE: this is O(docs × aliases) substring work — fine for a
    # literal-sized alias dim, but a production alias dictionary (10^6
    # surface forms) needs a single-pass multi-pattern matcher instead:
    # either the pipeline's combined-regex approach (one compiled
    # alternation per task, functions/jvm_kernels.py:claim_pattern) or an
    # Aho-Corasick automaton in an Arrow-batched kernel (build once per
    # executor from the broadcast dim, stream the corpus through it).
    mentions = (
        docs.crossJoin(F.broadcast(aliases.select("alias").distinct()))
        .where(F.contains(F.col("text"), F.col("alias")))
        .groupBy("alias")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )
    # resolved is the base (EVERY alias gets its popularity winner, so the
    # ambiguous-alias override is part of the checked output); mention counts
    # default to 0 for aliases absent from the corpus
    return (
        resolved.join(n_cands, "alias")
        .join(mentions, "alias", "left")
        .select(
            "alias",
            "resolved_qid",
            "sitelinks",
            "n_candidates",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
        )
    )


ALIAS_RESOLVE_SQL = f"""
WITH aliases(alias, qid) AS (
  SELECT * FROM (VALUES {", ".join(f"('{a}', '{q}')" for a, q in ALIASES)})
),
pop(qid, n_connected_site) AS (
  SELECT * FROM (VALUES {", ".join(f"('{q}', {n})" for q, n in SITELINKS)})
),
ranked AS (
  SELECT a.alias, a.qid, p.n_connected_site,
         ROW_NUMBER() OVER (
           PARTITION BY a.alias
           ORDER BY p.n_connected_site DESC NULLS LAST,
                    CAST(regexp_extract(a.qid, '(\\d+)', 1) AS BIGINT) ASC
         ) AS rn
  FROM aliases a LEFT JOIN pop p USING (qid)
),
resolved AS (
  SELECT alias, qid AS resolved_qid, n_connected_site AS sitelinks
  FROM ranked WHERE rn = 1
),
n_cands AS (SELECT alias, COUNT(*) AS n_candidates FROM aliases GROUP BY alias),
mentions AS (
  SELECT al.alias, COUNT(DISTINCT d.doc_id) AS n_docs
  FROM documents d JOIN (SELECT DISTINCT alias FROM aliases) al
    ON position(al.alias IN d.text) > 0
  GROUP BY al.alias
)
SELECT r.alias, r.resolved_qid, r.sitelinks, c.n_candidates,
       COALESCE(m.n_docs, 0) AS n_docs
FROM resolved r JOIN n_cands c USING (alias) LEFT JOIN mentions m USING (alias)
"""


def alias_mentions_anchored(spark, sf_dir):
    """Word-boundary alias mention counting WITHOUT the dictionary
    crossJoin — the scale path the crossJoin version's SCALE NOTE promises.
    Contract: an alias matches a document iff it appears as a contiguous
    whitespace-delimited token phrase (padded-contains on ' text ' /
    ' alias ' — full word boundary on both ends), the standard
    entity-mention semantic; the substring contract stays with
    [alias_resolve_popularity].

    Scale shape: per document, map-only work — tokenize, hash-set intersect
    the distinct tokens with the broadcast ANCHOR set (each alias's first
    word), explode only the matching anchors (usually zero), broadcast-join
    anchor → candidate aliases, and verify the full phrase with the text
    still in hand. No crossJoin, no corpus shuffle, no per-alias pass: the
    ONLY exchange is the final alias-keyed count. The anchor filter is a
    strict superset of true matches (a word-boundary phrase match implies
    its first word is a complete token — pinned in tests), so verification
    never misses. At 10^6 surface forms the literal anchor array becomes an
    equi-join of exploded tokens against the anchor dim (same candidate
    set, anchor side still broadcast); the per-doc verify is unchanged."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    anchors = sorted({a.split(" ")[0] for a, _ in ALIASES})
    alias_dim = (
        _aliases_df(spark)
        .select("alias")
        .distinct()
        .withColumn("anchor", F.split("alias", " ").getItem(0))
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.array_intersect(
                    F.array_distinct(F.split("text", " ")),
                    F.array(*[F.lit(a) for a in anchors]),
                )
            ).alias("anchor"),
        )
        .join(F.broadcast(alias_dim), "anchor")
        .where(
            F.contains(
                F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("alias"), F.lit(" ")),
            )
        )
        .groupBy("alias")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


ALIAS_ANCHORED_SQL = f"""
WITH aliases(alias, qid) AS (
  SELECT * FROM (VALUES {", ".join(f"('{a}', '{q}')" for a, q in ALIASES)})
),
al AS (SELECT DISTINCT alias FROM aliases)
SELECT al.alias, COUNT(DISTINCT d.doc_id) AS n_docs
FROM documents d
JOIN al ON position(' ' || al.alias || ' ' IN ' ' || d.text || ' ') > 0
GROUP BY al.alias
"""


DISAMBIG_QUERIES: dict[str, tuple] = {
    "alias_resolve_popularity": (alias_resolve_popularity, ALIAS_RESOLVE_SQL),
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "alias_mentions_anchored": (alias_mentions_anchored, ALIAS_ANCHORED_SQL),
}
