"""Data-quality expectation checking (Deequ/dbt-test-style): declared
constraints evaluated in bulk, emitting one report row per expectation
with checked/violation counts — the validation gate a production table
passes before downstream jobs consume it.

Reference anchor: the reference hard-codes its data hygiene as scattered
inline guards (`wikidata_parser.py` value-shape checks, `functions.py`
status filtering); this is the declarative, aggregate-audited equivalent.

Scale shape: every expectation is either a map-side-combinable aggregate
over one table (uniqueness via groupBy-HAVING fused into a count, domain
checks as conditional counts fused into ONE pass per table) or a
broadcast/shuffle anti-join for referential integrity — nothing row-level
leaves the executors; the report is expectation-count rows. Counts are all
BIGINT (cross-engine exact); `passed` is 0/1 BIGINT, not BOOLEAN, to keep
the compared frame integer-typed in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# shared table loader (single source: one place to change if the
# path layout or a catalog integration ever changes)
from .relational import _t  # noqa: E402


def _report_row(expectation: str, table: str, checked, violations):
    return F.struct(
        F.lit(expectation).alias("expectation"),
        F.lit(table).alias("table_name"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
        (violations == 0).cast("long").alias("passed"),
    )


def dq_report(spark, sf_dir):
    """Evaluate the expectation suite over the orders/customer/lineitem
    tables; one row per expectation. Single-table expectations share one
    aggregation pass per table (the conditional-count fusion); referential
    expectations are anti-join counts."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")

    # ONE pass over orders: row count, duplicate-pk surplus, domain checks
    o = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_pk"),
        F.count(F.when(F.col("o_totalprice") < 0, 1)).alias("neg_price"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
    )
    li = lineitem.agg(
        F.count("*").alias("n"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_discount"),
    )
    # referential: orphaned FKs + childless parents, kept as 1-row
    # aggregate relations (no driver-side actions — the whole report is
    # ONE declarative plan; the 1-row crossJoins are the waived
    # scalar-rides-as-broadcast shape)
    orphan_cust = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "left_anti"
    ).agg(F.count("*").alias("v_oc"))
    orphan_line = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("v_ol"))
    unfilled = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti"
    ).agg(F.count("*").alias("v_uf"))

    rows = (
        o.crossJoin(li.select(F.col("n").alias("li_n"), "bad_discount"))
        .crossJoin(F.broadcast(orphan_cust))
        .crossJoin(F.broadcast(orphan_line))
        .crossJoin(F.broadcast(unfilled))
    ).select(
        F.explode(
            F.array(
                _report_row(
                    "pk_unique_o_orderkey", "orders",
                    F.col("n"), F.col("dup_pk"),
                ),
                _report_row(
                    "o_totalprice_nonnegative", "orders",
                    F.col("n"), F.col("neg_price"),
                ),
                _report_row(
                    "o_custkey_not_null", "orders",
                    F.col("n"), F.col("null_cust"),
                ),
                _report_row(
                    "l_discount_in_unit_interval", "lineitem",
                    F.col("li_n"), F.col("bad_discount"),
                ),
                _report_row(
                    "fk_orders_customer", "orders",
                    F.col("n"), F.col("v_oc"),
                ),
                _report_row(
                    "fk_lineitem_orders", "lineitem",
                    F.col("li_n"), F.col("v_ol"),
                ),
                _report_row(
                    "orders_have_lineitems", "orders",
                    F.col("n"), F.col("v_uf"),
                ),
            )
        ).alias("r")
    )
    return rows.select("r.*")


# MATERIALIZED on the multiply-referenced per-table aggregates: DuckDB
# inlines plain CTEs, so `o` (5 refs) / `li` (3 refs) would re-scan their
# tables once per reference (linear waste here, not the LPA exponential
# case — but the same trap; see kg_oracle.kg_label_propagation_sql)
DQ_REPORT_SQL = """
WITH o AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
         CAST(COUNT(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) AS neg_price,
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_cust
  FROM orders),
li AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
              AS BIGINT) AS bad_discount
  FROM lineitem),
orphan_cust AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders od
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = od.o_custkey)),
orphan_line AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders od WHERE od.o_orderkey = l.l_orderkey)),
unfilled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders od
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = od.o_orderkey))
SELECT expectation, table_name, n_checked, n_violations,
       CAST(n_violations = 0 AS BIGINT) AS passed
FROM (
  SELECT 'pk_unique_o_orderkey' AS expectation, 'orders' AS table_name,
         o.n AS n_checked, o.dup_pk AS n_violations FROM o
  UNION ALL
  SELECT 'o_totalprice_nonnegative', 'orders', o.n, o.neg_price FROM o
  UNION ALL
  SELECT 'o_custkey_not_null', 'orders', o.n, o.null_cust FROM o
  UNION ALL
  SELECT 'l_discount_in_unit_interval', 'lineitem', li.n, li.bad_discount FROM li
  UNION ALL
  SELECT 'fk_orders_customer', 'orders', o.n, orphan_cust.v
  FROM o, orphan_cust
  UNION ALL
  SELECT 'fk_lineitem_orders', 'lineitem', li.n, orphan_line.v
  FROM li, orphan_line
  UNION ALL
  SELECT 'orders_have_lineitems', 'orders', o.n, unfilled.v
  FROM o, unfilled
)
"""


DQOPS_QUERIES: dict[str, tuple] = {
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "dq_report": (dq_report, DQ_REPORT_SQL),
}
