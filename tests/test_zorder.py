"""Z-order layout tests: Morton bit-algebra vs a pure-Python reference, and
the actual file-skipping benefit (per-file min/max bounding boxes prune range
predicates on BOTH dimensions, where a linear sort prunes only its leading
key). The cross-engine oracle for the zorder_events query runs in
tests/test_entry_queries.py's unregistered lane."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from prove_spark.operators.zorder import ZBITS, write_zordered, z_value


def _py_morton(x: int, y: int) -> int:
    z = 0
    for i in range(ZBITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


EDGE = [0, 1, 2, 3, 255, 256, 4095, 32768, 65534, 65535]


def test_z_value_matches_bitwise_reference(spark):
    pairs = [(x, y) for x in EDGE for y in EDGE]
    # values above 16 bits must be masked, not overflow the curve
    pairs += [(65536 + 7, 3), (9, (1 << 40) + 11)]
    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", z_value(F.col("x"), F.col("y")).alias("z")
    )
    for x, y, z in df.collect():
        assert z == _py_morton(x & 0xFFFF, y & 0xFFFF), (x, y)


def test_z_value_is_monotone_in_quadrants(spark):
    # every z-value of the low quadrant [0,2^15) x [0,2^15) sorts before any
    # z-value with either coordinate's top bit set — the property that makes
    # contiguous curve segments map to tight min/max boxes
    lo = _py_morton(32767, 32767)
    assert lo < _py_morton(32768, 0) and lo < _py_morton(0, 32768)


@pytest.fixture(scope="module")
def grid_df(spark):
    # 20k rows, x uniform, y decorrelated from x (Weyl-style multiplier) so a
    # linear x-sort carries NO y-locality — the honest worst case for the
    # single-key layout zorder is meant to beat
    return spark.range(20_000).select(
        (F.col("id") % 4096).alias("x"),
        ((F.col("id") * 48271) % 4096).alias("y"),
        F.col("id").alias("payload"),
    )


def _file_boxes(path: str, cols=("x", "y")) -> list[dict]:
    boxes = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        box = {}
        for c in cols:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            box[c] = (min(mins), max(maxs))
        boxes.append(box)
    return boxes


def _files_overlapping(boxes, col, lo, hi) -> int:
    return sum(1 for b in boxes if b[col][0] <= hi and b[col][1] >= lo)


def test_zordered_layout_prunes_both_dimensions(spark, grid_df, tmp_path):
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "linear_x")
    write_zordered(grid_df, F.col("x"), F.col("y"), zpath, n_files=16)
    # comparison layout: classic single-key range sort on x
    grid_df.repartitionByRange(16, F.col("x")).sortWithinPartitions(
        "x"
    ).write.mode("overwrite").parquet(xpath)

    zboxes = [b for b in _file_boxes(zpath) if b]
    xboxes = [b for b in _file_boxes(xpath) if b]
    assert len(zboxes) >= 8  # range partitioner may merge a few tiny splits

    # a narrow band on EITHER dimension touches a minority of z-files
    for col in ("x", "y"):
        hit = _files_overlapping(zboxes, col, 0, 255)  # 1/16 of the domain
        assert hit <= len(zboxes) // 2, (col, hit, len(zboxes), zboxes)

    # the linear layout answers x well but cannot prune y at all
    assert _files_overlapping(xboxes, "x", 0, 255) <= len(xboxes) // 2
    assert _files_overlapping(xboxes, "y", 0, 255) == len(xboxes)

    # layout is a permutation, not a transformation: same rows back
    assert (
        spark.read.parquet(zpath).agg(F.sum("payload")).first()[0]
        == grid_df.agg(F.sum("payload")).first()[0]
    )
