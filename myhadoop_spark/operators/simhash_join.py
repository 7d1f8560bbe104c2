"""SimHash Hamming-ball join — the join face of the simhash family
(Manku, Jain & Das Sarma, WWW 2007: the Google near-duplicate
detector): find every pair of documents whose simhash fingerprints
differ in at most ``max_hamming`` bits.

Exact-recall candidate generation by pigeonhole: split the ``bits``
fingerprint into ``max_hamming + 1`` contiguous blocks — a pair
within Hamming distance k differs in ≤ k bits, so at least one block
is UNTOUCHED and the pair collides on that block's equi-join. No
Hamming pair can be missed; the verify (bit_count of xor, JVM
integer ops) removes false candidates.

Scale shape: one narrow block projection + explode (blocks per doc =
k + 1), one hash equi-join on (block index, block value), a
candidate-sized verify — never all-pairs. The inherent hot spot is a
block VALUE shared by m documents (boilerplate fingerprints): that
bucket contributes m²/2 candidates, the same failure mode the LSH
signature index guards with stop-signatures. Because recall here is
EXACT, over-hot buckets cannot be silently skipped — pass
``max_bucket`` to fail LOUDLY instead (the caller then either raises
max_hamming granularity, pre-dedups exact duplicates, or accepts the
cost), or leave it None where the corpus is known well-spread.

Reference analog: none — §2.3 extension surface (dedup family,
beside queries/dedup.py::simhash, whose fingerprints this consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_bounds(bits: int, blocks: int) -> list[tuple[int, int]]:
    """(shift, width) per block; the first ``bits % blocks`` blocks
    get the extra bit."""
    base, rem = divmod(bits, blocks)
    out, shift = [], 0
    for i in range(blocks):
        w = base + (1 if i < rem else 0)
        out.append((shift, w))
        shift += w
    return out


def _blocks(sh: DataFrame, id_col: str, sim_col: str,
            bounds: list[tuple[int, int]]) -> DataFrame:
    block_arr = F.array(*[
        F.struct(F.lit(i).alias("bi"),
                 F.shiftright(F.col(sim_col), s)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
        for i, (s, w) in enumerate(bounds)])
    return (sh.select(F.col(id_col).alias("_id"), F.col(sim_col),
                      F.explode(block_arr).alias("_b"))
            .select("_id", sim_col, F.col("_b.bi").alias("bi"),
                    F.col("_b.bv").alias("bv")))


def hamming_probe(probe: DataFrame, seen: DataFrame, *,
                  bits: int = 32, max_hamming: int = 2,
                  id_col: str = "doc_id",
                  sim_col: str = "simhash") -> DataFrame:
    """(id): the ``probe`` rows whose fingerprint lies within
    ``max_hamming`` of ANY ``seen`` fingerprint — the cross-set face
    (ingest-time suppression against an already-accepted corpus).
    Same pigeonhole blocks, so recall is exact; the seen side is
    data-sized and joins hash-partitioned."""
    if not 1 <= int(max_hamming) < int(bits):
        raise ValueError(f"max_hamming must be in [1, bits), got "
                         f"{max_hamming}")
    bounds = _block_bounds(int(bits), int(max_hamming) + 1)
    p = _blocks(probe, id_col, sim_col, bounds).withColumnRenamed(
        sim_col, "_sp")
    s = (_blocks(seen, id_col, sim_col, bounds)
         .select("bi", "bv", F.col(sim_col).alias("_ss")))
    ham = F.bit_count(F.col("_sp").bitwiseXOR(F.col("_ss")))
    return (p.join(s, ["bi", "bv"])
            .filter(ham <= F.lit(int(max_hamming)))
            .select(F.col("_id").alias(id_col))
            .distinct())


def hamming_pairs(sh: DataFrame, *, bits: int = 32,
                  max_hamming: int = 2, id_col: str = "doc_id",
                  sim_col: str = "simhash",
                  max_bucket: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming): every pair with
    bit_count(xor) <= max_hamming, id_a < id_b. ``sh`` carries one
    non-negative ``bits``-bit fingerprint per id."""
    if not 1 <= int(max_hamming) < int(bits):
        raise ValueError(f"max_hamming must be in [1, bits), got "
                         f"{max_hamming}")
    blocks = int(max_hamming) + 1
    bounds = _block_bounds(int(bits), blocks)
    b = _blocks(sh, id_col, sim_col, bounds)
    if max_bucket is not None:
        hot = (b.groupBy("bi", "bv")
               .agg(F.count(F.lit(1)).alias("n"))
               .agg(F.max("n")).head()[0])
        if hot is not None and hot > int(max_bucket):
            raise RuntimeError(
                f"hamming_pairs: a fingerprint block bucket holds "
                f"{hot} docs (> max_bucket={max_bucket}) — its "
                f"candidates are quadratic. Pre-dedup exact "
                "duplicates or accept the cost with max_bucket=None")
    left = b.select(F.col("_id").alias("id_a"),
                    F.col(sim_col).alias("_sa"), "bi", "bv")
    right = b.select(F.col("_id").alias("id_b"),
                     F.col(sim_col).alias("_sb"), "bi", "bv")
    # r13 (optimization): verify BEFORE dedup — bit_count(xor) is
    # cheaper than the dedup's hash-exchange of the candidate multiset
    # (pairs recur once per agreeing block, ≤ max_hamming+1 copies,
    # each carrying both fingerprints), and a deterministic filter on
    # retained columns commutes with distinct, so only the qualifying
    # pairs reach the exchange. Output bitwise unchanged.
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (left.join(right, ["bi", "bv"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= F.lit(int(max_hamming)))
            .select("id_a", "id_b", "hamming")
            .distinct())
