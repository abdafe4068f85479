"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Runs a queries() callable and its oracle SQL on the same sf dir, compares
row count, sorted column names, and order-insensitive values (exact for
ints/strings; doubles must match to 1e-12 — our queries are designed to be
bit-identical via the decimal-cast pattern).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(series: pd.Series) -> str:
    """Coarse dtype class for parity checking: the driver hashes value
    representations, so an int64 Spark column vs a float64 oracle column
    (DuckDB HUGEINT) hash-mismatches even when every value is equal, and a
    Spark DECIMAL surfaces as pandas object-of-Decimal vs the oracle's
    float64. Map dtypes to {int, float, bool, datetime, str, other} and
    treat any class difference as a failure."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind in "mM":
        return "datetime"
    if kind == "O":
        import decimal

        for v in series:
            # skip NaN-valued nulls too: pandas merges on nullable string
            # columns surface missing values as float NaN inside an object
            # column, which is neither None nor str and would misclassify
            # the whole column as 'other'
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, str):
                return "str"
            return "other"
        return "str"  # all-null object column: assume string-ish
    return "other"


def driver_sortable(pdf: pd.DataFrame) -> list[str]:
    """Replicate the DRIVER's canonicalization: sort_values over the RAW
    columns (no astype(str) rescue). Unhashable cell types — dicts from
    MapType, lists from ArrayType — crash pandas factorize there, so any
    query emitting them fails the driver even when values are correct.
    This check makes that failure reproducible locally."""
    try:
        pdf.sort_values(sorted(pdf.columns), kind="mergesort")
    except TypeError as e:
        return [
            "driver canonicalization would crash on raw values "
            f"(unhashable column type?): {e}"
        ]
    return []


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    problems: list[str] = driver_sortable(spark_pdf)
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
        )
        return problems
    # dtype-class parity BEFORE value comparison: values can be numerically
    # equal while the driver's representation hash still rejects them
    for c in sorted(spark_pdf.columns):
        sc, oc = _dtype_class(spark_pdf[c]), _dtype_class(oracle_pdf[c])
        if sc != oc:
            problems.append(
                f"col {c}: dtype class {sc} (spark {spark_pdf[c].dtype}) != "
                f"{oc} (oracle {oracle_pdf[c].dtype}) — cast both sides "
                "(ints stay BIGINT, decimals surface as DOUBLE)"
            )
        elif sc == "decimal":
            problems.append(
                f"col {c}: both sides are object-of-Decimal — violates the "
                "float discipline (cast SUM(decimal) to DOUBLE on both sides)"
            )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            bad = ~(
                (av == bv)
                | (av.isna() & bv.isna())
                | ((av - bv).abs() <= 1e-12 * (1 + bv.abs()))
            )
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            problems.append(
                f"col {c}: {n_bad} value mismatches (first: {a[c][i]!r} vs {b[c][i]!r})"
            )
    return problems


def check_query(spark, sf_dir: str, fn, sql: str | None) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        # rows-only gate (mirrors the driver's weaker check for non-SQL-
        # expressible queries): must produce a non-degenerate frame AND
        # survive the driver's raw-value sort (unhashable output types
        # crashed the r2 driver harness despite passing a rows-only check)
        problems = driver_sortable(spark_pdf)
        if len(spark_pdf.columns) == 0:
            problems.append("rows-only query returned zero columns")
        if len(spark_pdf) == 0:
            problems.append("rows-only query returned zero rows")
        return problems
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    return compare(spark_pdf, oracle_pdf)
