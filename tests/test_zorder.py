"""Z-order layout (functions/zorder.py): bit-exactness of the Morton
interleave against a plain-Python reference, the range guard, and the
property the layout exists for — multi-dimension file pruning measured
from REAL parquet footer statistics (the same min/max stats a 100 TB
scan's file pruning reads)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tax_compliance_engine_spark.functions import zorder


def _py_z(x: int, y: int) -> int:
    z = 0
    for i in range(32):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    pts = [
        (0, 0),
        (1, 0),
        (0, 1),
        (255, 255),
        (12345, 54321),
        (2**31 - 1, 0),
        (0, 2**31 - 1),
        (2**31 - 1, 2**31 - 1),
        (0x55555555, 0x2AAAAAAA),
    ]
    df = spark.createDataFrame(
        [Row(x=x, y=y) for x, y in pts], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder.z_value(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_z(x, y), (x, y)


def test_z_value_rejects_out_of_range(spark):
    df = spark.createDataFrame([Row(x=-1, y=0)], "x long, y long")
    with pytest.raises(Exception, match="out of \\[0, 2\\^31\\)"):
        df.select(zorder.z_value(F.col("x"), F.col("y"))).collect()
    df2 = spark.createDataFrame([Row(x=0, y=1 << 31)], "x long, y long")
    with pytest.raises(Exception, match="out of \\[0, 2\\^31\\)"):
        df2.select(zorder.z_value(F.col("x"), F.col("y"))).collect()


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> int:
    """How many parquet files COULD contain rows with col in [lo, hi),
    judged exactly the way scan-time file pruning judges it: the footer
    min/max statistics."""
    n = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                c = grp.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        assert mins, f"no stats for {col} in {f}"
        if min(mins) < hi and max(maxs) >= lo:
            n += 1
    return n


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    # 128x128 grid of points; 16 files per layout
    side, n_files = 128, 16
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    x_path = str(tmp_path / "by_x")
    z_path = str(tmp_path / "by_z")
    (
        grid.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(x_path)
    )
    zorder.zorder_write(grid, z_path, "x", "y", n_files=n_files)
    assert len(glob.glob(os.path.join(z_path, "*.parquet"))) == n_files

    # a narrow band on y: the dimension the x-sort does NOT cluster.
    # x-sorted layout: every file spans all y values -> zero pruning.
    y_band = (10, 26)
    x_layout_hits = _files_overlapping(x_path, "y", *y_band)
    z_layout_hits = _files_overlapping(z_path, "y", *y_band)
    assert x_layout_hits == n_files
    assert z_layout_hits <= n_files // 2, (
        f"z-order should prune most files for a y-band, "
        f"hit {z_layout_hits}/{n_files}"
    )

    # and the z layout still prunes on x too (no dimension sacrificed)
    x_band = (100, 116)
    assert _files_overlapping(z_path, "x", *x_band) <= n_files // 2

    # layouts hold identical data
    a = {(r.x, r.y) for r in spark.read.parquet(x_path).collect()}
    b = {(r.x, r.y) for r in spark.read.parquet(z_path).collect()}
    assert a == b and len(a) == side * side
