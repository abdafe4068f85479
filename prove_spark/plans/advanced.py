"""Advanced composed operators: as-of join, distinct aggregates, array-HOF
sliding windows — operators Spark lacks natively, expressed as compositions
per the preference order (built-in ops > pandas UDF > mapPartitions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def asof_join_latest_order(spark, sf_dir):
    """As-of join: for each event, the customer's latest order at or before
    the event time. Spark has no native ASOF JOIN — composed as bounded
    equi-join + ranking window (the broadcast/bucket-friendly formulation;
    per-group pd.merge_asof in applyInPandas is the fallback for dense
    right sides)."""
    e = _t(spark, sf_dir, "events").withColumn(
        "custkey", (F.col("user_id") % 150 + 1).cast("long")
    )
    o = _t(spark, sf_dir, "orders")
    joined = e.join(
        o,
        (e.custkey == o.o_custkey) & (o.o_orderdate <= e.ts),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


ASOF_SQL = """
SELECT event_id, custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT e.event_id, e.custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM (SELECT event_id, ts, user_id % 150 + 1 AS custkey FROM events) e
  JOIN orders o ON e.custkey = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def distinct_user_stats(spark, sf_dir):
    """Exact distinct aggregation (count-distinct expands to a two-phase
    aggregate; the approx_count_distinct variant is the scale path)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def slide2_word_pairs(spark, sf_dir):
    """C3 sliding window as a pure array HOF (transform+sequence) — zero
    shuffles, whole-stage-codegen'd; the oracle builds the same pairs with a
    lead window, proving the HOF formulation equivalent."""
    d = _t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )
    return d.select(
        "doc_id", F.posexplode(pairs).alias("p0", "pair")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "pair")


SLIDE2_SQL = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
         UNNEST(generate_series(1, len(string_split(text, ' ')))) AS p
  FROM documents
)
SELECT doc_id, p, pair FROM (
  SELECT doc_id, p,
    w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY p) AS pair
  FROM words
) WHERE pair IS NOT NULL
"""


ADVANCED_QUERIES: dict[str, tuple] = {
    "asof_join_latest_order": (asof_join_latest_order, ASOF_SQL),
    "distinct_user_stats": (distinct_user_stats, DISTINCT_SQL),
    "slide2_word_pairs": (slide2_word_pairs, SLIDE2_SQL),
}
