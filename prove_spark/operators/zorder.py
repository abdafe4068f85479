"""Z-order (Morton-curve) data layout for multi-dimension file skipping.

The 100 TB problem this solves: parquet/Iceberg readers prune files and row
groups by per-column min/max statistics, but a table can only be SORTED on
one leading key — a layout linearly sorted on user_id answers user_id range
scans with a handful of files yet touches EVERY file for a ts range scan.
Interleaving the bits of both keys (the Morton / Z space-filling curve, the
same layout `OPTIMIZE ... ZORDER BY` builds in Delta/Iceberg) keeps rows
that are close in EITHER dimension close on the curve, so each output
file's min/max box covers a small rectangle of the (x, y) plane and a range
predicate on either column prunes most files.

Everything is integer shift/mask arithmetic on JVM expressions — whole-stage
codegen, no UDFs — and the identical arithmetic runs in DuckDB as the oracle
(`ZORDER_EVENTS_SQL` in plans/advanced.py).

Reference parity note: the reference engine has no layout optimizer (it
scans Mongo collections, e.g. functions.py:109-768); this operator belongs
to the training-data-pipeline surface where scan pruning IS the workload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bit-spread masks: 0x5555... pattern family interleaves 16 bits into the
# even positions of a 32-bit lane in 4 shift-or-mask steps (vs 16 per-bit
# extracts) — the classic "magic numbers" Morton encoding
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

ZBITS = 16  # bits kept per dimension; z-value fits in 32 bits (BIGINT-safe)
_DIM_MASK = (1 << ZBITS) - 1


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of `col` onto the even bit positions (bit i of
    the input lands on bit 2i). Pure shift/and/or — codegen-friendly."""
    x = col.cast("bigint").bitwiseAND(F.lit(_DIM_MASK))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_value(x: Column, y: Column) -> Column:
    """Morton z-value of two non-negative integer columns (low 16 bits
    each): x's bits on even positions, y's on odd. Monotone in the curve
    order — rows sorted by this column ARE z-order clustered."""
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def write_zordered(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    n_files: int,
) -> None:
    """Materialize `df` z-order clustered on (x, y) into ~n_files parquet
    files: range-partition on the z-value (contiguous curve segments per
    file — this is what makes each file's min/max box tight), sort within
    partitions so row groups inside a file are tight too, and drop the
    helper column before writing. repartitionByRange samples the z-value
    distribution, so skewed keys still yield balanced files."""
    zcol = "__zval"
    (
        df.withColumn(zcol, z_value(x, y))
        .repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
