"""Z-order layout: footer-stat skipping beats linear sort on the
non-leading dimension, and the spread/interleave math is exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myhadoop_spark.operators.layout import (
    _spread16, files_pruned, layout_stats, write_linear, write_zordered,
    zorder_key)

N_FILES = 16
N_ROWS = 40_000


@pytest.fixture(scope="module")
def grid(spark):
    # two independent uniform dimensions — the shape where linear
    # sort's second column is unprunable
    return (spark.range(N_ROWS)
            .withColumn("x", (F.col("id") * 7919 % 10_000).cast("long"))
            .withColumn("y", (F.col("id") * 104_729 % 10_000).cast("long"))
            .select("id", "x", "y"))


def _pure_spread16(v: int) -> int:
    out = 0
    for i in range(16):
        out |= ((v >> i) & 1) << (2 * i)
    return out


def test_spread16_matches_bit_model(spark):
    vals = [0, 1, 2, 3, 0x5555, 0xAAAA, 0xFFFF, 12345]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = [r.s for r in df.select(_spread16(F.col("v")).alias("s"))
           .orderBy("v").collect()]
    assert got == [_pure_spread16(v) for v in sorted(vals)]


def test_zkey_is_morton_interleave(spark):
    df = spark.createDataFrame([(0, 0), (10_000, 10_000)], "x LONG, y LONG")
    keys = sorted(r["__zkey"] for r in zorder_key(df, ["x", "y"]).collect())
    # corners of the space map to curve endpoints
    assert keys[0] == 0
    assert keys[1] == (1 << 32) - 1


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lin")
    write_zordered(grid, zpath, ["x", "y"], N_FILES)
    write_linear(grid, lpath, ["x", "y"], N_FILES)
    zstats = layout_stats(zpath, ["x", "y"])
    lstats = layout_stats(lpath, ["x", "y"])
    assert len(zstats) == N_FILES and len(lstats) == N_FILES

    # 10%-of-range box on each dimension separately
    box_x = {"x": (4000, 5000)}
    box_y = {"y": (4000, 5000)}
    # leading dimension: linear is optimal; z-order must still prune a
    # meaningful share (16 files ~ a 4x4 grid; a 10% x-slice intersects
    # one column of cells plus boundary-straddling files)
    assert files_pruned(lstats, box_x) >= N_FILES - 3
    assert files_pruned(zstats, box_x) >= N_FILES // 4
    # non-leading dimension: linear prunes NOTHING, z-order must
    assert files_pruned(lstats, box_y) == 0
    assert files_pruned(zstats, box_y) >= N_FILES // 4

    # layout is lossless
    assert (spark.read.parquet(zpath).count()
            == spark.read.parquet(lpath).count() == N_ROWS)
    assert (spark.read.parquet(zpath).agg(F.sum("id")).first()[0]
            == grid.agg(F.sum("id")).first()[0])


def test_zorder_requires_two_columns(spark, grid):
    with pytest.raises(ValueError):
        zorder_key(grid, ["x"])
