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


@pytest.fixture(scope="module", autouse=True)
def exact_range_boundaries(spark):
    """Pin row→file packing: repartitionByRange picks boundaries by
    RESERVOIR SAMPLING (seeded per RDD id), so file contents — and the
    file-count pruning assertions below — varied run to run. Raising
    the per-partition sample size above the fixture row count makes the
    'sample' the whole input, so boundaries are exact quantiles and the
    layouts are deterministic. Production writers keep the default
    sampling (boundary jitter is harmless at scale); the pruning
    comparison needs determinism."""
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key, None)
    spark.conf.set(key, str(N_ROWS))
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


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


def _pure_xy2d(x: int, y: int, bits: int = 16) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_bit_model(spark):
    """Engine hilbert_index ≡ the textbook xy2d walk, including corners
    and asymmetric points (the rotate/reflect branches)."""
    from myhadoop_spark.operators.layout import hilbert_index

    pts = [(0, 0), (0xFFFF, 0), (0, 0xFFFF), (0xFFFF, 0xFFFF),
           (1, 0), (0, 1), (12345, 54321), (0x8000, 0x7FFF),
           (0x5555, 0xAAAA), (40000, 1), (2, 65535)]
    df = spark.createDataFrame(pts, "x LONG, y LONG")
    got = {(r["x"], r["y"]): r["d"] for r in df.select(
        "x", "y", hilbert_index(F.col("x"), F.col("y")).alias("d"))
        .collect()}
    for x, y in pts:
        assert got[(x, y)] == _pure_xy2d(x, y), (x, y)


def test_hilbert_consecutive_cells_are_adjacent(spark):
    """The locality property Morton lacks: consecutive curve positions
    are always grid neighbors (|dx|+|dy| == 1). Checked on a full
    16x16 grid via a 4-bit walk of the 16-bit index (cells scaled up
    by 2^12 so the low bits of the full-resolution walk are exercised
    uniformly)."""
    from myhadoop_spark.operators.layout import hilbert_index

    side = 16
    scale = (1 << 16) // side
    cells = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(
        [(x * scale, y * scale) for x, y in cells], "x LONG, y LONG")
    rows = df.select("x", "y", hilbert_index(F.col("x"), F.col("y"))
                     .alias("d")).collect()
    order = sorted(rows, key=lambda r: r["d"])
    for a, b in zip(order, order[1:]):
        dx = abs(a["x"] - b["x"]) // scale
        dy = abs(a["y"] - b["y"]) // scale
        assert dx + dy == 1, (a, b)


def test_hilbert_prunes_both_dimensions_and_matches_morton(spark, grid,
                                                           tmp_path):
    from myhadoop_spark.operators.layout import write_hilbert

    hpath = str(tmp_path / "hil")
    zpath = str(tmp_path / "z2")
    write_hilbert(grid, hpath, ["x", "y"], N_FILES)
    write_zordered(grid, zpath, ["x", "y"], N_FILES)
    hstats = layout_stats(hpath, ["x", "y"])
    zstats = layout_stats(zpath, ["x", "y"])
    assert len(hstats) == N_FILES
    for box in ({"x": (4000, 5000)}, {"y": (4000, 5000)},
                {"x": (4000, 5000), "y": (4000, 5000)}):
        hp = files_pruned(hstats, box)
        zp = files_pruned(zstats, box)
        # both dimensions must prune, and Hilbert must not lose to
        # Morton by more than one file on any box (its locality is
        # equal-or-better; exact counts depend on range boundaries)
        assert hp > 0, (box, hstats)
        assert hp >= zp - 1, (box, hp, zp)


def _pure_spread3(v: int) -> int:
    out = 0
    for i in range(21):
        out |= ((v >> i) & 1) << (3 * i)
    return out


def test_spread16_3d_matches_bit_model(spark):
    from myhadoop_spark.operators.layout import _spread16_3d

    vals = [0, 1, 2, 3, 0x5555, 0xAAAA, 0xFFFF, 12345, 0x1FFFFF]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = [r.s for r in df.select(_spread16_3d(F.col("v")).alias("s"))
           .orderBy("v").collect()]
    assert got == [_pure_spread3(v) for v in sorted(vals)]


def test_zorder3_prunes_third_dimension(spark, tmp_path):
    """The dimension a 2-col layout cannot prune: a box on z must skip
    files under the 3-way interleave, where linear (x, y, z) sort
    cannot skip any."""
    from myhadoop_spark.operators.layout import write_zordered3

    df = (spark.range(N_ROWS)
          .withColumn("x", (F.col("id") * 7919 % 10_000).cast("long"))
          .withColumn("y", (F.col("id") * 104_729 % 10_000).cast("long"))
          .withColumn("z", (F.col("id") * 31_337 % 10_000).cast("long"))
          .select("id", "x", "y", "z"))
    zpath = str(tmp_path / "z3")
    lpath = str(tmp_path / "lin3")
    write_zordered3(df, zpath, ["x", "y", "z"], N_FILES)
    write_linear(df, lpath, ["x", "y", "z"], N_FILES)
    zstats = layout_stats(zpath, ["x", "y", "z"])
    lstats = layout_stats(lpath, ["x", "y", "z"])
    box_z = {"z": (4000, 5000)}
    assert files_pruned(zstats, box_z) > 0, zstats
    assert files_pruned(lstats, box_z) == 0, lstats
    # and it still prunes x and y
    assert files_pruned(zstats, {"x": (4000, 5000)}) > 0
    assert files_pruned(zstats, {"y": (4000, 5000)}) > 0
