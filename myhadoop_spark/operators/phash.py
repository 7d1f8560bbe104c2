"""Perceptual hashes for media near-duplicate detection — aHash and
dHash over a decoded grayscale pixel grid (the standard public
algorithms: average hash thresholds each cell against the grid mean;
difference hash compares horizontally adjacent cells), packed into a
64-bit fingerprint that feeds the existing Hamming-ball join
(operators/simhash_join.py — pigeonhole blocks, exact recall).

The pipeline a multimodal training corpus needs:

    payload (binary) → decode_image_grid (sources/multimodal.py,
    Arrow mapInPandas; real PPM/BMP parse or deterministic fake)
    → ahash64/dhash64 (THIS module — pure JVM integer expressions,
    no UDF) → hamming_pairs / hamming_probe (self and cross-set
    near-dup) → connected components → keep-one.

Packing note: bit 63 cannot be a positive LongType literal, so the
mask table carries −2^63 for j = 63 — summing it yields the exact
two's-complement signed value, and XOR/bit_count/pigeonhole blocks
are sign-agnostic. The DuckDB oracles pack the same way
(queries/media.py), so fingerprints match bitwise cross-engine.

Everything is integer arithmetic end to end: grayscale luma uses the
(299·R + 587·G + 114·B) div 1000 integer form and the aHash mean
threshold compares pix·N > Σpix instead of dividing — no float ever
enters a fingerprint, which is what makes the differential bitwise.

Reference analog: none — §2.3 extension surface (multimodal family,
VERDICT r11 #3). Public algorithm descriptions: aHash/dHash as
popularized by the pHash/imagehash family of tools.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

from myhadoop_spark.operators.hof import let


def _mask(j: int) -> int:
    """Signed-long mask for bit j (two's complement for j = 63)."""
    if not 0 <= j <= 63:
        raise ValueError(f"bit index out of range: {j}")
    return (1 << j) if j < 63 else -(1 << 63)


def dhash64(grid: Column, *, rows: int = 8, cols: int = 9) -> Column:
    """64-bit difference hash of a row-major ``rows`` × ``cols``
    grayscale grid (array<int>): bit r·(cols−1)+c is set iff
    grid[r][c] > grid[r][c+1]. The canonical shape is 8 × 9 (64
    comparisons); any rows × cols with rows·(cols−1) = 64 works.

    The grid is LET-BOUND (operators/hof.py): the 64 comparisons read
    it 128 times in one interpreted projection, so a caller passing a
    grid EXPRESSION (planted-grid differentials, a decode struct
    field) would otherwise re-evaluate it per reference — measured
    18.4 s -> sub-second on the 256-row media_neardup gate row."""
    if rows * (cols - 1) != 64:
        raise ValueError(
            f"dhash64 needs rows*(cols-1) == 64, got {rows}x{cols}")

    def _bits(g: Column) -> Column:
        terms = []
        for r in range(rows):
            for c in range(cols - 1):
                j = r * (cols - 1) + c
                terms.append(
                    F.when(F.get(g, r * cols + c)
                           > F.get(g, r * cols + c + 1),
                           F.lit(_mask(j)).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
        return reduce(add, terms)

    return let(grid, _bits)


def ahash64(grid: Column, *, rows: int = 8, cols: int = 8) -> Column:
    """64-bit average hash of a row-major ``rows`` × ``cols``
    grayscale grid (array<int>, rows·cols = 64): bit i is set iff
    grid[i]·64 > Σgrid (strictly above the mean — the comparison is
    pure integer, so the threshold is exact on every engine).

    Grid AND sum are let-bound: the 64 bit terms each compare against
    Σgrid, and an unbound ``tot`` would re-run the aggregate fold per
    bit (64 folds per row) on top of re-evaluating a non-attribute
    grid per reference."""
    if rows * cols != 64:
        raise ValueError(
            f"ahash64 needs rows*cols == 64, got {rows}x{cols}")

    def _bits(g: Column) -> Column:
        tot0 = F.aggregate(g, F.lit(0).cast("long"),
                           lambda acc, x: acc + x.cast("long"))
        return let(tot0, lambda tot: reduce(add, [
            F.when(F.get(g, j).cast("long") * 64 > tot,
                   F.lit(_mask(j)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for j in range(64)
        ]))

    return let(grid, _bits)


def drop_last_column(grid: Column, *, cols: int = 9) -> Column:
    """Row-major grid with its last column removed — turns the 8 × 9
    dHash grid into the 8 × 8 aHash grid without a second decode."""
    return F.filter(grid, lambda x, i: (i % cols) != (cols - 1))
