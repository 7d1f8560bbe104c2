"""Z-order data layout: multi-dimensional clustering for file skipping.

At 100 TB the cheapest query is the one that never reads the file:
engines skip a parquet file when the predicate excludes the file's
column min/max range.  A linear sort gives perfect skipping on the
leading column and none on the others; Morton (Z-order) interleaving
gives bounded min/max extents on EVERY indexed column, so box
predicates on any dimension prune files (the layout behind Delta
``OPTIMIZE ZORDER BY`` and ClickHouse/Databricks clustering — here as
a plain-Spark composition: rank-code → bit-interleave → range-
partition → sort-within-partition → parquet).

Everything is built-in expressions inside whole-stage codegen: the
bit spreading is the classic shift-mask ladder (5 ops per column), no
UDFs, no driver loops.  The only driver action is one tiny min/max agg
per indexed column (the same stats collection Delta OPTIMIZE does).

``layout_stats``/``files_pruned`` read parquet footers via pyarrow to
measure the result: per-file normalized extent per column, and how
many files a box predicate may skip — asserted in
tests/test_layout.py against a linear-sorted baseline.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-column resolution: 2^16 rank buckets


def _spread16(x: Column) -> Column:
    """Insert a zero bit between each of the low 16 bits of ``x``
    (Morton bit spreading, shift-mask ladder)."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add ``__zkey``: the Morton interleave of min/max-normalized
    rank codes of two numeric columns.

    Min/max linear coding assumes roughly uniform value spread (true
    of the fixture tables); for heavy skew substitute approxQuantile
    edges for the linear code — the interleave is unchanged.
    """
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns; "
                         "chain keys or extend the spread table for more")
    codes = _rank_codes(df, cols)  # one tiny driver-side stats action
    zkey = _spread16(codes[0]).bitwiseOR(F.shiftleft(_spread16(codes[1]), 1))
    return df.withColumn("__zkey", zkey)


def _spread16_3d(x: Column) -> Column:
    """Insert TWO zero bits between each of the low 16 bits of ``x``
    (3-way Morton spreading — the canonical 64-bit shift-mask ladder,
    valid for codes up to 21 bits)."""
    x = x.bitwiseAND(F.lit(0x1FFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 32)).bitwiseAND(F.lit(0x1F00000000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x1F0000FF0000FF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x1249249249249249))
    return x


def zorder3_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add ``__zkey``: the 3-way Morton interleave of three columns'
    rank codes (48-bit key) — box predicates on ANY of the three
    dimensions prune files. Beyond 3 columns per-dimension resolution
    drops fast (64/k bits each); prefer partitioning on the extra
    column instead."""
    if len(cols) != 3:
        raise ValueError("zorder3_key interleaves exactly 3 columns")
    c0, c1, c2 = _rank_codes(df, cols)
    zkey = (_spread16_3d(c0)
            .bitwiseOR(F.shiftleft(_spread16_3d(c1), 1))
            .bitwiseOR(F.shiftleft(_spread16_3d(c2), 2)))
    return df.withColumn("__zkey", zkey)


def write_zordered3(df: DataFrame, path: str, cols: list[str],
                    n_files: int) -> None:
    """Cluster into ``n_files`` parquet files along the 3-column
    Z-curve (same mechanics as write_zordered)."""
    (zorder3_key(df, cols)
     .repartitionByRange(n_files, "__zkey")
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))


def _rank_codes(df: DataFrame, cols: list[str]) -> list[Column]:
    """Min/max-normalized BITS-bit rank codes for each column (shared by
    the Morton and Hilbert keys). One tiny driver stats action."""
    stats = df.agg(*[f(c) for c in cols for f in (F.min, F.max)]).first()
    lo = {c: stats[2 * i] for i, c in enumerate(cols)}
    hi = {c: stats[2 * i + 1] for i, c in enumerate(cols)}
    codes = []
    for c in cols:
        span = float(hi[c] - lo[c]) or 1.0
        codes.append(F.floor(
            (F.col(c).cast("double") - F.lit(float(lo[c])))
            / F.lit(span) * F.lit((1 << BITS) - 1)).cast("long"))
    return codes


def hilbert_index(x: Column, y: Column, bits: int = BITS) -> Column:
    """Hilbert curve distance d for cell (x, y) on a 2^bits × 2^bits
    grid — the classic xy2d bit walk (quadrant digit + rotate/reflect
    per level), expressed as ONE JVM-side higher-order fold over the
    per-level quadrant sizes with a (x, y, d) struct accumulator. No
    UDF, no Python, no driver loop; per ROADMAP's r2 negative result,
    a fold stays inside codegen limits where an unrolled 16-level
    expression tree would not.

    Hilbert vs Morton: both bound per-file extents on every indexed
    dimension; Hilbert additionally never jumps across the space
    between consecutive cells (Morton's Z jumps at power-of-two
    boundaries), so curve-contiguous files get strictly tighter
    worst-case extents — measurably fewer files read for small box
    predicates (tests/test_layout.py::test_hilbert_at_least_matches_
    morton_pruning)."""
    sizes = F.array(*[F.lit(1 << i).cast("long")
                      for i in range(bits - 1, -1, -1)])
    init = F.struct(x.cast("long").alias("x"), y.cast("long").alias("y"),
                    F.lit(0).cast("long").alias("d"))

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc.getField("x"), acc.getField("y"), acc.getField("d")
        rx = F.when(ax.bitwiseAND(s) > 0, F.lit(1).cast("long")
                    ).otherwise(F.lit(0).cast("long"))
        ry = F.when(ay.bitwiseAND(s) > 0, F.lit(1).cast("long")
                    ).otherwise(F.lit(0).cast("long"))
        d2 = ad + s * s * (rx * 3).bitwiseXOR(ry)
        # rotate/reflect the lower quadrant: only when ry == 0;
        # reflect (s-1-v) only when additionally rx == 1, then swap
        fx = F.when(rx == 1, s - 1 - ax).otherwise(ax)
        fy = F.when(rx == 1, s - 1 - ay).otherwise(ay)
        nx = F.when(ry == 0, fy).otherwise(ax)
        ny = F.when(ry == 0, fx).otherwise(ay)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(sizes, init, step).getField("d")


def hilbert_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add ``__hkey``: Hilbert curve distance of the two columns' rank
    codes — drop-in alternative to zorder_key with better locality."""
    if len(cols) != 2:
        raise ValueError("hilbert_key indexes exactly 2 columns")
    cx, cy = _rank_codes(df, cols)
    return df.withColumn("__hkey", hilbert_index(cx, cy))


def write_hilbert(df: DataFrame, path: str, cols: list[str],
                  n_files: int) -> None:
    """Cluster ``df`` into ``n_files`` parquet files along the Hilbert
    curve of ``cols`` (same mechanics as write_zordered)."""
    (hilbert_key(df, cols)
     .repartitionByRange(n_files, "__hkey")
     .sortWithinPartitions("__hkey")
     .drop("__hkey")
     .write.mode("overwrite").parquet(path))


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int) -> None:
    """Cluster ``df`` into ``n_files`` parquet files along the Z-curve
    of ``cols``.  Range partitioning keeps files curve-contiguous
    (equal-size via range-boundary sampling, the same mechanics as a
    global sort); the within-file sort tightens row-group stats too."""
    (zorder_key(df, cols)
     .repartitionByRange(n_files, "__zkey")
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))


def write_linear(df: DataFrame, path: str, cols: list[str],
                 n_files: int) -> None:
    """Baseline: plain lexicographic global sort on ``cols``."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in cols])
     .sortWithinPartitions(*cols)
     .write.mode("overwrite").parquet(path))


def layout_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] of each indexed column, from parquet footers
    only (no data pages read) — exactly the stats a scan planner uses."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row = {"file": f.name}
        for c in cols:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            row[c] = (min(mins), max(maxs))
        out.append(row)
    return out


def files_pruned(stats: list[dict], box: dict) -> int:
    """How many files a planner skips for an AND-of-ranges predicate
    ``{col: (lo, hi)}`` using footer stats alone."""
    pruned = 0
    for row in stats:
        for c, (lo, hi) in box.items():
            fmin, fmax = row[c]
            if fmax < lo or fmin > hi:
                pruned += 1
                break
    return pruned
