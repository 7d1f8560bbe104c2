"""Audio fingerprinting for media near-duplicate detection — the
Haitsma–Kalker robust hash (Haitsma & Kalker 2002, "A Highly Robust
Audio Fingerprinting System") over a decoded frames × bands
band-energy grid, packed into a 64-bit fingerprint that feeds the
existing Hamming-ball join (operators/simhash_join.py — pigeonhole
blocks, exact recall).

The pipeline a multimodal training corpus needs:

    payload (binary) → decode_audio_grid (sources/multimodal.py,
    Arrow mapInPandas; real 16-bit PCM WAV parse or deterministic
    fake) → hk64 (THIS module — pure JVM integer expressions, no
    UDF) → hamming_pairs / hamming_probe → connected components →
    keep-one. The image twin is operators/phash.py.

Bit definition (the published sign-of-energy-double-difference):
with E(n, m) the energy of time frame n, frequency band m,

    bit(n, m) = 1  iff  (E(n+1, m) − E(n+1, m+1))
                      − (E(n, m)   − E(n, m+1))  >  0

so a ``frames`` × ``bands`` grid yields (frames−1)·(bands−1) bits —
the canonical 9 × 9 grid packs exactly 64. Energies are integers
(band_energies floors |X|² sums), so every comparison is exact
integer arithmetic: no float ever enters a fingerprint, and the
DuckDB oracle (queries/audio.py) packs the same signed-64 mask table
(bit 63 = −2^63, the phash.py precedent), making the differential
bitwise cross-engine.

Locality (what makes the planted fixtures provable): one grid cell
(r, c) appears only in bits (n, m) with n ∈ {r−1, r}, m ∈ {c−1, c} —
≤ 4 bit flips per perturbed cell; a pure DC offset to one time frame
moves only band 0 of that frame (the DC bin), hence ≤ 2 bits.

Reference analog: none — §2.3 extension surface (multimodal family).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

from myhadoop_spark.operators.hof import let
from myhadoop_spark.operators.phash import _mask


def hk64(energies: Column, *, frames: int = 9, bands: int = 9) -> Column:
    """64-bit Haitsma–Kalker fingerprint of a row-major ``frames`` ×
    ``bands`` band-energy grid (array<long>): bit n·(bands−1)+m is set
    iff the time-difference of the band-difference is positive (see
    module docstring). Requires (frames−1)·(bands−1) = 64; the
    canonical shape is 9 × 9.

    The grid is LET-BOUND (operators/hof.py): the 64 double
    differences read it 256 times inside one interpreted projection,
    so a caller passing a grid EXPRESSION would otherwise re-evaluate
    it per reference (the dhash64 lesson, r13 let-binding class)."""
    if (frames - 1) * (bands - 1) != 64:
        raise ValueError(
            f"hk64 needs (frames-1)*(bands-1) == 64, got {frames}x{bands}")

    def _bits(g: Column) -> Column:
        def e(n: int, m: int) -> Column:
            return F.get(g, n * bands + m).cast("long")

        terms = []
        for n in range(frames - 1):
            for m in range(bands - 1):
                j = n * (bands - 1) + m
                diff = ((e(n + 1, m) - e(n + 1, m + 1))
                        - (e(n, m) - e(n, m + 1)))
                terms.append(
                    F.when(diff > 0, F.lit(_mask(j)).cast("long"))
                    .otherwise(F.lit(0).cast("long")))
        return reduce(add, terms)

    return let(energies, _bits)
