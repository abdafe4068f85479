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
from pyspark.sql.window import Window


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


DRIFT_BINS = 10


def drift_report(spark, sf_dir):
    """Distribution-drift report — the ML-monitoring screen a feature/
    training pipeline runs between a BASELINE window and the CURRENT
    window (PSI-family; the per-bin statistic here is the chi-square term
    (obs − exp)²/exp rather than PSI's (p−q)·ln(p/q) because ln() is libm
    and not bit-portable — the repo's token_pmi/jaccard-not-Adamic-Adar
    rule): events are split at the midpoint of the corpus time range,
    values binned into DRIFT_BINS equal-width bins over the global value
    range, and each (event_type, bin) cell reports baseline/current
    counts, the expected current count under the baseline distribution,
    and its chi-square contribution. Bins unseen in the baseline get a
    NULL term and an is_new_bin flag (exp = 0 — the division is undefined
    and the right answer is a flag, not infinity) on BOTH engines.

    Scale shape: the (lo, hi, split) frame is ONE 1-row broadcast from a
    global min/max agg; binning is map-only width_bucket; the cell rollup
    is ONE combinable pivot-style conditional-count agg; per-type totals
    are a dimension-sized broadcast join. All counts exact integers; the
    expected count and chi-square term are a fixed 4-op IEEE tree."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("s"),
        F.col("value").alias("v"),
    )
    frame = e.agg(
        F.min("s").alias("s_lo"),
        F.max("s").alias("s_hi"),
        F.min("v").alias("v_lo"),
        F.max("v").alias("v_hi"),
    )  # 1 row
    # bin formula written out explicitly (NOT width_bucket: its internal
    # FP expression is engine-specific, so a value within 1 ulp of a bin
    # boundary could land differently; this fixed tree is evaluated
    # identically by both engines). LEAST clamp folds v == v_hi into the
    # top bin.
    binx = (
        F.floor(
            (F.col("v") - F.col("v_lo"))
            / (F.col("v_hi") - F.col("v_lo"))
            * F.lit(float(DRIFT_BINS))
        )
        + 1
    )
    binned = e.join(F.broadcast(frame)).select(
        "event_type",
        # midpoint split: baseline = strictly-before-midpoint
        (
            F.col("s")
            < (F.col("s_lo") + (F.col("s_hi") - F.col("s_lo")) / 2)
        ).alias("is_base"),
        F.when(F.col("v_lo") == F.col("v_hi"), F.lit(1))
        .otherwise(F.least(binx, F.lit(DRIFT_BINS)))
        .cast("int")
        .alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0))
        .cast("long")
        .alias("base_n"),
        F.sum(F.when(F.col("is_base"), 0).otherwise(1))
        .cast("long")
        .alias("cur_n"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("base_n").cast("long").alias("base_tot"),
        F.sum("cur_n").cast("long").alias("cur_tot"),
    )
    j = cells.join(F.broadcast(tots), "event_type")
    exp = (F.col("base_n") / F.col("base_tot")) * F.col("cur_tot")
    return j.select(
        "event_type",
        F.col("bin").cast("int").alias("bin"),
        "base_n",
        "cur_n",
        F.when(F.col("base_n") > 0, exp).alias("expected_n"),
        F.when(
            F.col("base_n") > 0,
            ((F.col("cur_n") - exp) * (F.col("cur_n") - exp)) / exp,
        ).alias("chi2_term"),
        (F.col("base_n") == 0).alias("is_new_bin"),
    )


DRIFT_SQL = f"""
WITH dr_e AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s, value AS v
  FROM events),
dr_f AS (
  SELECT MIN(s) AS s_lo, MAX(s) AS s_hi, MIN(v) AS v_lo, MAX(v) AS v_hi
  FROM dr_e),
dr_b AS (
  SELECT event_type,
         s < (s_lo + (s_hi - s_lo) / 2) AS is_base,
         CASE WHEN v_lo = v_hi THEN 1
              ELSE LEAST(FLOOR((v - v_lo) / (v_hi - v_lo)
                               * {float(DRIFT_BINS)}) + 1,
                         {DRIFT_BINS}) END AS bin
  FROM dr_e CROSS JOIN dr_f),
dr_c AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
         CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
  FROM dr_b GROUP BY 1, 2),
dr_t AS (
  SELECT event_type,
         CAST(SUM(base_n) AS BIGINT) AS base_tot,
         CAST(SUM(cur_n) AS BIGINT) AS cur_tot
  FROM dr_c GROUP BY 1)
SELECT c.event_type, CAST(c.bin AS INT) AS bin, c.base_n, c.cur_n,
       CASE WHEN c.base_n > 0
            THEN (c.base_n / t.base_tot) * t.cur_tot END AS expected_n,
       CASE WHEN c.base_n > 0
            THEN ((c.cur_n - (c.base_n / t.base_tot) * t.cur_tot)
                  * (c.cur_n - (c.base_n / t.base_tot) * t.cur_tot))
                 / ((c.base_n / t.base_tot) * t.cur_tot)
       END AS chi2_term,
       c.base_n = 0 AS is_new_bin
FROM dr_c c JOIN dr_t t ON t.event_type = c.event_type
"""


AUC_GRID = 100  # score quantization grid (cents): bounds the rank domain


def roc_auc_score(spark, sf_dir):
    """Classifier-evaluation ROC-AUC via the Mann-Whitney rank-sum identity
    — the model-eval op an ML-data pipeline runs on every scored snapshot
    (here: does `value` separate error events from the rest?). AUC =
    (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg) with mid-rank tie handling,
    computed WITHOUT a row-scale sort: scores are quantized to the 1/AUC_GRID
    grid (documented contract — AUC of the quantized score, exact under
    mid-ranks; the production pattern for AUC at corpus scale, since exact
    continuous AUC needs a global sort of every row), so the rank domain is
    the bounded distinct-grid-value dimension, not the corpus.

    Scale shape: ONE combinable groupBy collapses the corpus to per-grid-value
    (count, positive-count) cells; the only window is a prefix sum over that
    bounded score dimension (the [cumulative_unique_users] day-dimension
    waiver); the final reduce is a 1-row aggregate. Integer-only until the
    single final IEEE division: mid-ranks enter doubled (2·rank is integer),
    so s2 = Σ_pos (2·min_rank + c − 1) stays BIGINT-exact."""
    e = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * AUC_GRID + F.lit(0.5))
        .cast("long")
        .alias("sc"),
        (F.col("event_type") == "error").alias("pos"),
    )
    byv = e.groupBy("sc").agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("cp"),
    )
    w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
    pre = byv.withColumn(
        "before", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    stats = pre.agg(
        F.sum(
            F.col("cp")
            * (2 * (F.col("before") + 1) + F.col("c") - 1)
        ).alias("s2"),
        F.sum("cp").alias("npos"),
        F.sum(F.col("c") - F.col("cp")).alias("nneg"),
    )
    # single-class guard (no positives or no negatives → AUC undefined):
    # an unguarded 0/0 is NaN in Spark but NULL in DuckDB — NULL on both
    return stats.select(
        F.col("npos").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        F.when(
            (F.col("npos") > 0) & (F.col("nneg") > 0),
            (F.col("s2") - F.col("npos") * (F.col("npos") + 1)).cast(
                "double"
            )
            / (2 * F.col("npos") * F.col("nneg")).cast("double"),
        ).alias("auc"),
    )


ROC_AUC_SQL = f"""
WITH auc_e AS (
  SELECT CAST(FLOOR(value * {AUC_GRID} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sc,
         event_type = 'error' AS pos
  FROM events),
auc_v AS (
  SELECT sc, COUNT(*) AS c,
         SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cp
  FROM auc_e GROUP BY 1),
auc_p AS (
  SELECT sc, c, cp,
         COALESCE(SUM(c) OVER (ORDER BY sc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM auc_v),
auc_s AS (
  SELECT SUM(cp * (2 * (before + 1) + c - 1)) AS s2,
         SUM(cp) AS npos, SUM(c - cp) AS nneg
  FROM auc_p)
SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
       CASE WHEN npos > 0 AND nneg > 0
            THEN CAST(s2 - npos * (npos + 1) AS DOUBLE)
                 / CAST(2 * npos * nneg AS DOUBLE) END AS auc
FROM auc_s
"""


def changepoint_cusum(spark, sf_dir):
    """Changepoint detection per event stream via the CUSUM statistic — the
    monitoring twin of [drift_report] (that one compares two fixed windows;
    this one FINDS the split point): for each event_type's daily count
    series, the day t maximizing |D·S_t − T·t| (the scaled deviation of the
    cumulative count S_t from the uniform-rate line; scaling by D and T
    instead of dividing keeps every statistic a BIGINT — no float enters the
    query at all, the [user_value_trend] rebased-integer discipline).

    Scale shape: ONE combinable groupBy collapses the corpus to per-(type,
    day) counts; both windows (cumulative sum + argmax pick) share one
    partitioning over the type-day relation (time-bounded dimension, the
    [cumulative_unique_users] waiver); per-type totals ride the same
    partitioning via an aggregate window, no second shuffle. Ties on the
    max statistic break to the earliest day."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
        )
        .cast("long")
        .alias("day"),
    )
    daily = e.groupBy("event_type", "day").agg(F.count("*").alias("cnt"))
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    cum = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("s_t"),
        F.row_number().over(wo).alias("t"),
        F.sum("cnt").over(wp).alias("tot"),
        F.count("*").over(wp).alias("n_days"),
    )
    stat = cum.withColumn(
        "stat",
        F.abs(F.col("n_days") * F.col("s_t") - F.col("tot") * F.col("t")),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.desc("stat"), F.asc("day")
    )
    return (
        stat.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("t").cast("long").alias("day_index"),
            F.col("s_t").cast("long").alias("cum_before"),
            F.col("stat").cast("long").alias("cusum_stat"),
            F.col("tot").cast("long").alias("total_events"),
            F.col("n_days").cast("long").alias("n_days"),
        )
    )


CUSUM_SQL = """
WITH cs_e AS (
  SELECT event_type,
         CAST(FLOOR(FLOOR(epoch(ts)) / 86400) AS BIGINT) AS day
  FROM events),
cs_d AS (
  SELECT event_type, day, COUNT(*) AS cnt FROM cs_e GROUP BY 1, 2),
cs_c AS (
  SELECT event_type, day, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS s_t,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM cs_d),
cs_s AS (
  SELECT *, ABS(n_days * s_t - tot * t) AS stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY ABS(n_days * s_t - tot * t) DESC, day ASC) AS rn
  FROM cs_c)
SELECT event_type, day AS change_day, CAST(t AS BIGINT) AS day_index,
       CAST(s_t AS BIGINT) AS cum_before, CAST(stat AS BIGINT) AS cusum_stat,
       CAST(tot AS BIGINT) AS total_events, CAST(n_days AS BIGINT) AS n_days
FROM cs_s WHERE rn = 1
"""


AB_SUCCESS_THRESHOLD = 100.0  # fixed success cut on the value metric


def ab_test_zscores(spark, sf_dir):
    """Two-proportion z-test per metric — the experimentation-platform
    readout (the eval family's hypothesis-TEST member beside
    [roc_auc_score]'s ranking eval and [drift_report]'s distribution
    screen): users split into control/treatment by id parity (the
    deterministic stand-in for an assignment table), success = value ≥
    threshold, and per event_type the pooled two-proportion z-score
    z = (p_b − p_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)).

    Scale shape: ONE combinable conditional-count groupBy collapses the
    corpus to per-type (n, successes) × 2 cells; the test statistic is a
    fixed IEEE tree over those exact integers — each division/multiply/
    sqrt is a correctly-rounded op on identical inputs in both engines
    (sqrt is fine, ln is not — the repo-wide libm rule). Degenerate pooled
    rates (p̂ = 0 or 1 → zero standard error) yield NULL on both engines."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2 == 1).alias("is_b"),
        (F.col("value") >= AB_SUCCESS_THRESHOLD).alias("succ"),
    )
    g = e.groupBy("event_type").agg(
        F.count(F.when(~F.col("is_b"), True)).alias("n_a"),
        F.count(F.when(F.col("is_b"), True)).alias("n_b"),
        F.count(F.when(~F.col("is_b") & F.col("succ"), True)).alias("s_a"),
        F.count(F.when(F.col("is_b") & F.col("succ"), True)).alias("s_b"),
    )
    p_a = F.col("s_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("s_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("s_a") + F.col("s_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return g.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_a").cast("long").alias("conv_a"),
        F.col("s_b").cast("long").alias("conv_b"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.when(se > 0, (p_b - p_a) / se).alias("z_score"),
    )


AB_TEST_SQL = f"""
WITH ab_e AS (
  SELECT event_type, user_id % 2 = 1 AS is_b,
         value >= {AB_SUCCESS_THRESHOLD} AS succ
  FROM events),
ab_g AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE NOT is_b) AS n_a,
         COUNT(*) FILTER (WHERE is_b) AS n_b,
         COUNT(*) FILTER (WHERE NOT is_b AND succ) AS s_a,
         COUNT(*) FILTER (WHERE is_b AND succ) AS s_b
  FROM ab_e GROUP BY 1),
ab_z AS (
  SELECT *,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
         CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
  FROM ab_g)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(s_a AS BIGINT) AS conv_a, CAST(s_b AS BIGINT) AS conv_b,
       p_a, p_b,
       CASE WHEN SQRT(pp * (CAST(1.0 AS DOUBLE) - pp)
                      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                         + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) > 0
            THEN (p_b - p_a)
                 / SQRT(pp * (CAST(1.0 AS DOUBLE) - pp)
                        * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                           + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))
       END AS z_score
FROM ab_z
"""


def hot_key_report(spark, sf_dir):
    """Join/agg key-skew diagnostic — the operational screen behind every
    salting decision this repo makes ([salted_event_counts]'s reason to
    exist, made measurable): for each audited (table, key), the key-count
    distribution's size, max, and skew ratio max/avg (how many times hotter
    the hottest key runs than a uniform spread — the number that predicts
    straggler tasks at shuffle time).

    Scale shape: each audited key costs ONE combinable groupBy (the
    key-count relation) + a 1-row rollup; the report is one row per audited
    key via unionAll. Integer counts; skew_ratio = max·n_keys/n_rows as a
    single IEEE division of BIGINT-exact products."""
    audits = [
        ("events", "user_id"),
        ("lineitem", "l_orderkey"),
        ("documents", "source"),
    ]
    rows = None
    for tbl, key in audits:
        kc = (
            _t(spark, sf_dir, tbl)
            .groupBy(F.col(key).cast("string").alias("k"))
            .agg(F.count("*").alias("c"))
        )
        r = kc.agg(
            F.lit(tbl).alias("table_name"),
            F.lit(key).alias("key_name"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_key_rows"),
            (
                (F.max("c") * F.count("*")).cast("double")
                / F.sum("c").cast("double")
            ).alias("skew_ratio"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows


HOT_KEY_SQL = """
WITH hk_e AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events),
hk_l AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
hk_d AS (
  SELECT CAST(source AS VARCHAR) AS k FROM documents),
hk_ec AS (SELECT k, COUNT(*) AS c FROM hk_e GROUP BY 1),
hk_lc AS (SELECT k, COUNT(*) AS c FROM hk_l GROUP BY 1),
hk_dc AS (SELECT k, COUNT(*) AS c FROM hk_d GROUP BY 1)
SELECT 'events' AS table_name, 'user_id' AS key_name,
       CAST(SUM(c) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(c) AS BIGINT) AS max_key_rows,
       CAST(MAX(c) * COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS skew_ratio
FROM hk_ec
UNION ALL
SELECT 'lineitem', 'l_orderkey',
       CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(MAX(c) AS BIGINT),
       CAST(MAX(c) * COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
FROM hk_lc
UNION ALL
SELECT 'documents', 'source',
       CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(MAX(c) AS BIGINT),
       CAST(MAX(c) * COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
FROM hk_dc
"""


DQOPS_QUERIES: dict[str, tuple] = {
    # sweep-capped (registry._UNREGISTERED) but oracle-checked in pytest:
    "dq_report": (dq_report, DQ_REPORT_SQL),
    "drift_report": (drift_report, DRIFT_SQL),
    "roc_auc_score": (roc_auc_score, ROC_AUC_SQL),
    "changepoint_cusum": (changepoint_cusum, CUSUM_SQL),
    "ab_test_zscores": (ab_test_zscores, AB_TEST_SQL),
    "hot_key_report": (hot_key_report, HOT_KEY_SQL),
}
