"""Skew-handling helpers: salted aggregation and salted join.

AQE's skew-join splitting only rescues sort-merge shuffle joins; it does not
help skewed groupBy reducers or applyInPandas groups. These helpers implement
the classic two-phase pattern explicitly (BASELINE.json requires explicit
skew handling):

  salted agg : groupBy(key, salt) partial → groupBy(key) final
  salted join: explode the small side K ways, salt the big side with
               pmod(hash(...), K) → even reducer load for hot keys
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG

DEFAULT_SALT = DEFAULT_CONFIG.salt_buckets


def with_salt(df: DataFrame, cols: list[str] | str, n: int = DEFAULT_SALT, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row-level salt from a stable disambiguator column set
    (never rand(): resume/retry must re-derive identical salts)."""
    if isinstance(cols, str):
        cols = [cols]
    return df.withColumn(salt_col, F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n)))


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: list[tuple[str, str, str]],
    salt_from: list[str] | None = None,
    n_salts: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation for additive aggs on skewed keys.

    aggs: list of (fn, col, alias) with fn in {"count", "sum"}; the partial
    phase spreads each hot key over n_salts reducers, the final phase
    combines n_salts tiny partials. (Spark's hash aggregate already does
    map-side partials; the salt ensures the REDUCE side is also spread when
    one key dominates a partition.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    if salt_from is None:
        # hash() rejects MAP columns at ANY nesting depth (undefined
        # hashcode) — a map inside a struct/array field still throws; any
        # map-free column set is an equally good deterministic disambiguator
        def has_map(dt: T.DataType) -> bool:
            if isinstance(dt, T.MapType):
                return True
            if isinstance(dt, T.StructType):
                return any(has_map(f.dataType) for f in dt.fields)
            if isinstance(dt, T.ArrayType):
                return has_map(dt.elementType)
            return False

        salt_from = [
            f.name for f in df.schema.fields if not has_map(f.dataType)
        ]
    salted = with_salt(df, salt_from, n_salts)
    partial_exprs = []
    final_exprs = []
    for fn, col, alias in aggs:
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{alias}"))
            final_exprs.append(F.sum(f"_p_{alias}").alias(alias))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{alias}"))
            final_exprs.append(F.sum(f"_p_{alias}").alias(alias))
        else:
            raise ValueError(f"salted_agg supports count/sum, got {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_count_pivot(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: list[str],
    aliases: list[str],
    n_salts: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe pivot-count (A6/A10): conditional sums via salted_agg."""
    flagged = df
    aggs = []
    for v, alias in zip(pivot_values, aliases):
        flag = f"_is_{alias}"
        flagged = flagged.withColumn(
            flag, F.when(F.col(pivot_col) == v, F.lit(1)).otherwise(F.lit(0))
        )
        aggs.append(("sum", flag, alias))
    return salted_agg(flagged, key, aggs, n_salts=n_salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALT,
    how: str = "inner",
    big_salt_from: list[str] | None = None,
) -> DataFrame:
    """Replicate-small / salt-big equi join for skewed keys.

    The small side is exploded n_salts× (cheap — it's small by contract);
    the big side gets a deterministic salt, so each hot key's rows land on
    n_salts distinct reducers instead of one.

    Only inner/left are supported: right/full would emit n_salts copies of
    every unmatched small-side row (it was exploded before the join).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): the small "
            "side is replicated n_salts times, so right/full joins would "
            "duplicate unmatched small-side rows"
        )
    salted_big = with_salt(big, big_salt_from or big.columns, n_salts)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_big.join(exploded_small, [key, "_salt"], how)
    return joined.drop("_salt")
