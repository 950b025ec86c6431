"""Z-order layout: the file-skipping payoff measured against real parquet
footer statistics, plus key-construction unit checks."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoop_invertedindexer_spark.operators.layout import (
    interleave_bits,
    linear_write,
    zorder_write,
)


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] of col overlaps [lo,hi], total files)."""
    files = glob.glob(f"{path}/*.parquet")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmin = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        fmax = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if fmin <= hi and fmax >= lo:
            hit += 1
    return hit, len(files)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # x=0b011, y=0b101 -> z bits: y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    z = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
    ).first().z
    assert z == 0b100111


def test_zorder_skips_files_on_both_dims_linear_only_one(spark, tmp_path):
    rows = [(x, y) for x in range(100) for y in range(100)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_write(df, ["x", "y"], zpath, n_files=16, bits=8)
    linear_write(df, "x", lpath, n_files=16)

    # a 10%-band predicate on y: the x-sorted layout can't skip anything,
    # the z-order layout touches a bounded fraction of files. The bound
    # is 3/4 (not the typical ~1/4-1/2 observed) because range-partition
    # boundary sampling varies run to run.
    z_hit, z_total = _files_overlapping(zpath, "y", 40, 49)
    l_hit, l_total = _files_overlapping(lpath, "y", 40, 49)
    assert l_hit == l_total  # baseline: every file overlaps
    assert z_hit <= z_total * 3 // 4, (z_hit, z_total)

    # and the z layout still skips on x too (locality on BOTH dims)
    zx_hit, _ = _files_overlapping(zpath, "x", 40, 49)
    assert zx_hit <= z_total * 3 // 4, (zx_hit, z_total)


def test_zorder_layout_preserves_rows_exactly(spark, tmp_path):
    df = spark.createDataFrame(
        [(x, x * 7 % 50, f"r{x}") for x in range(500)], "x long, y long, s string"
    )
    path = str(tmp_path / "z")
    zorder_write(df, ["x", "y"], path, n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert set(back.columns) == {"x", "y", "s"}
    assert {r.s for r in back.select("s").collect()} == {f"r{x}" for x in range(500)}


def test_interleave_bits_rejects_long_overflow(spark):
    import pytest

    from pyspark.sql import functions as F

    cols = [F.col(c) for c in ("a", "b", "c", "d")]
    with pytest.raises(ValueError, match="z-bits > 63"):
        interleave_bits(cols, bits=16)  # 64 bits would hit the sign bit
