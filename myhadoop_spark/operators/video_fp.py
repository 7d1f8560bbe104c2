"""Video near-duplicate detection — positional frame-fingerprint
matching over sampled frames: two videos are near-dups when at least
``min_shared`` of their aligned sample positions carry perceptual
hashes within ``max_hamming`` bits (the re-encode / light-edit case a
training-corpus video dedup needs; temporal-shift matching is a
different operator by design).

The pipeline:

    payload (binary) → decode_video_grids (sources/multimodal.py,
    Arrow mapInPandas; real animated-GIF parse or deterministic
    fake; one row per sampled frame) → dhash64 per frame
    (operators/phash.py) → frame_match_pairs (THIS module) →
    connected components → keep-one.

Scale shape: the pigeonhole Hamming blocks (operators/simhash_join.py
discipline — exact recall: a pair within k bits agrees on one of
k+1 blocks) are joined with ``frame_idx`` IN the equi-join key, so
candidates only form between same-position frames — strictly tighter
buckets than the frame-agnostic join, and the per-pair aggregation is
a partial-aggregable count. Never all-pairs; the optional
``max_bucket`` guard fails loudly on degenerate hot fingerprints
(black frames, test cards) exactly like hamming_pairs.

Reference analog: none — §2.3 extension surface (multimodal family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.operators.simhash_join import _block_bounds


def frame_match_pairs(frames: DataFrame, *, bits: int = 64,
                      max_hamming: int = 2, min_shared: int = 2,
                      id_col: str = "media_id",
                      frame_col: str = "frame_idx",
                      sim_col: str = "fhash",
                      max_bucket: int | None = None) -> DataFrame:
    """(id_a, id_b, shared_frames): video pairs with ≥ ``min_shared``
    aligned sample positions whose frame fingerprints lie within
    ``max_hamming`` bits, id_a < id_b. ``frames`` carries one
    ``bits``-bit fingerprint per (video id, sample position)."""
    if not 1 <= int(max_hamming) < int(bits):
        raise ValueError(f"max_hamming must be in [1, bits), got "
                         f"{max_hamming}")
    if int(min_shared) < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    bounds = _block_bounds(int(bits), int(max_hamming) + 1)
    # simhash_join._blocks drops extra columns, so the explode is
    # rebuilt here with frame_idx carried through
    block_arr = F.array(*[
        F.struct(F.lit(i).alias("bi"),
                 F.shiftright(F.col(sim_col), s)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
        for i, (s, w) in enumerate(bounds)])
    b = (frames.select(F.col(id_col).alias("_id"),
                       F.col(frame_col).alias("_f"),
                       F.col(sim_col),
                       F.explode(block_arr).alias("_b"))
         .select("_id", "_f", sim_col,
                 F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv")))
    if max_bucket is not None:
        hot = (b.groupBy("_f", "bi", "bv")
               .agg(F.count(F.lit(1)).alias("n"))
               .agg(F.max("n")).head()[0])
        if hot is not None and hot > int(max_bucket):
            raise RuntimeError(
                f"frame_match_pairs: a (frame, block) bucket holds "
                f"{hot} videos (> max_bucket={max_bucket}) — its "
                "candidates are quadratic. Pre-dedup exact-duplicate "
                "frames or accept the cost with max_bucket=None")
    left = b.select(F.col("_id").alias("id_a"), F.col("_f"),
                    F.col(sim_col).alias("_sa"), "bi", "bv")
    right = b.select(F.col("_id").alias("id_b"),
                     F.col("_f").alias("_f2"),
                     F.col(sim_col).alias("_sb"), "bi", "bv")
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    matched = (left.join(right,
                         (left["_f"] == right["_f2"])
                         & (left["bi"] == right["bi"])
                         & (left["bv"] == right["bv"]))
               .filter(F.col("id_a") < F.col("id_b"))
               .select("id_a", "id_b", "_f", "_sa", "_sb")
               .distinct()                  # one row per matched block
               .filter(ham <= F.lit(int(max_hamming)))
               .select("id_a", "id_b", "_f")
               .distinct())                 # one row per matched position
    return (matched.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared_frames"))
            .filter(F.col("shared_frames") >= F.lit(int(min_shared))))


def frame_match_probe(probe: DataFrame, seen: DataFrame, *,
                      bits: int = 64, max_hamming: int = 2,
                      min_shared: int = 2,
                      id_col: str = "media_id",
                      frame_col: str = "frame_idx",
                      sim_col: str = "fhash") -> DataFrame:
    """(id): the ``probe`` videos that share ≥ ``min_shared`` aligned
    sample positions (within ``max_hamming`` bits per position) with
    ANY single ``seen`` video — the cross-set face (ingest-time
    suppression of re-uploads against an already-accepted corpus).
    Same pigeonhole blocks with frame_idx in the key, so recall is
    exact; the seen side is data-sized and joins hash-partitioned
    (the hamming_probe discipline)."""
    if not 1 <= int(max_hamming) < int(bits):
        raise ValueError(f"max_hamming must be in [1, bits), got "
                         f"{max_hamming}")
    if int(min_shared) < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    bounds = _block_bounds(int(bits), int(max_hamming) + 1)

    def blocks(df: DataFrame, tag: str) -> DataFrame:
        block_arr = F.array(*[
            F.struct(F.lit(i).alias("bi"),
                     F.shiftright(F.col(sim_col), s)
                     .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
            for i, (s, w) in enumerate(bounds)])
        return (df.select(F.col(id_col).alias(f"_id{tag}"),
                          F.col(frame_col).alias(f"_f{tag}"),
                          F.col(sim_col).alias(f"_s{tag}"),
                          F.explode(block_arr).alias("_b"))
                .select(f"_id{tag}", f"_f{tag}", f"_s{tag}",
                        F.col("_b.bi").alias("bi"),
                        F.col("_b.bv").alias("bv")))

    p, s = blocks(probe, "p"), blocks(seen, "s")
    ham = F.bit_count(F.col("_sp").bitwiseXOR(F.col("_ss")))
    matched = (p.join(s, (p["_fp"] == s["_fs"])
                      & (p["bi"] == s["bi"]) & (p["bv"] == s["bv"]))
               .select("_idp", "_ids", "_fp", "_sp", "_ss")
               .distinct()                  # one row per matched block
               .filter(ham <= F.lit(int(max_hamming)))
               .select("_idp", "_ids", "_fp")
               .distinct())                 # one row per matched position
    return (matched.groupBy("_idp", "_ids")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= F.lit(int(min_shared)))
            .select(F.col("_idp").alias(id_col))
            .distinct())
