"""Bloom-filter membership for incremental corpus dedup.

The recurring production shape: a pipeline has already ingested N
billion documents and a new batch arrives. An exact anti-join against
the seen-set re-shuffles the accumulated corpus (or at least its
content hashes) on every ingest. A Bloom filter summarizes the
seen-set into m bits that BROADCAST to every executor: the new batch is
then filtered with a narrow, shuffle-free membership test, and only the
(tiny) "probably seen" remainder needs the exact join — false positives
are possible and bounded, false negatives are impossible, so nothing
new is ever dropped as a dup.

Representation: the filter is a DataFrame of (word_idx BIGINT,
word BIGINT) — 32 bits per row (32, not 64: DuckDB BIGINT left-shift
raises on 1<<63 rather than wrapping, so 32-bit words keep every value
positive and bit-identical across engines), only words with at least
one set bit present. That keeps it a first-class, joinable, checkpointable dataset
(streaming ingest can maintain it incrementally by unioning new words
and re-OR-ing), instead of opaque driver state.

Hashing is double hashing h_i = (h1 + i*h2) mod m (Kirsch &
Mitzenmacher 2006: two base hashes give k independent-enough probes),
with h1/h2 taken from disjoint md5 substrings — deterministic and
engine-portable, so the SAME filter (bit for bit) is constructible in
the DuckDB oracle and membership answers are exactly reproducible.

Sizing (document before deploying): for n items and target FP rate p,
m = -n ln p / (ln 2)^2 and k = (m/n) ln 2. The defaults (m = 2^20,
k = 5) are fixture-scale; at n = 10^10 seen documents and p = 1%,
m ~ 9.6e10 bits = 12 GB — too big for one broadcast. `bloom_probe_
sharded` (r5) is that case's code path: the filter range-shards on
word_idx into B broadcastable pieces; each shard pass probes ONLY the
positions whose word_idx falls in its range against that shard's
broadcast, reduces to a per-id partial verdict ("every probed bit in
THIS shard is set"), and materializes it so exactly one shard
broadcast is live at a time (peak executor memory = filter/B); the
final verdict is the AND of the partials — grouping the k bit tests
by shard is associative, so the sharded answer is bit-identical to
the single-filter one (tests/test_bloom.py proves it on the fixture).
Word-idx range sharding also means a parquet-stored filter reads each
shard via predicate pushdown — no full-filter scan per pass. All
arithmetic stays JVM-side codegen: no UDF, no driver state, no
collect.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myhadoop_spark.materialize import materialize

M_BITS = 1 << 20  # filter size in bits (power of two keeps mod cheap)
K_HASHES = 5


def bloom_positions(col: Column, m_bits: int = M_BITS,
                    k: int = K_HASHES) -> Column:
    """array<bigint> of the k bit positions for a value. h1/h2 are
    60-bit BIGINTs from disjoint md5 hex ranges (no overflow; h2 forced
    odd so successive probes cycle the full power-of-two table)."""
    md5 = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(md5, 1, 15), 16, 10).cast("long") % F.lit(m_bits)
    h2 = (F.conv(F.substring(md5, 17, 15), 16, 10).cast("long")
          % F.lit(m_bits)).bitwiseOR(F.lit(1))
    # unrolled (k is a compile-time constant): inside a transform lambda
    # h1/h2 would re-derive the md5 per probe; as plain array-constructor
    # children they are common subexpressions, evaluated once per row
    return F.array(*[(h1 + F.lit(i).cast("long") * h2) % F.lit(m_bits)
                     for i in range(k)])


def _word_layout(pos_col: str) -> list[Column]:
    return [
        F.shiftright(F.col(pos_col), 5).alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} % 32 AS INT))")
        .alias("bit"),
    ]


def bloom_build(df: DataFrame, col: str, m_bits: int = M_BITS,
                k: int = K_HASHES) -> DataFrame:
    """Aggregate df[col] into a Bloom filter: (word_idx, word) rows.
    One explode (k rows per item) + one 32k-key groupBy whose partial
    aggregation ORs bits map-side — the shuffle carries at most
    partitions x m/32 words, independent of item count."""
    return (df.select(F.explode(bloom_positions(F.col(col), m_bits, k))
                      .alias("pos"))
            .select(*_word_layout("pos"))
            .groupBy("word_idx")
            .agg(F.bit_or("bit").alias("word")))


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame, *,
                id_cols: list[str] | None = None, m_bits: int = M_BITS,
                k: int = K_HASHES,
                hit_col: str = "bloom_hit") -> DataFrame:
    """Per-row membership test: hit iff ALL k probed bits are set.
    The filter side is broadcast — the probe is shuffle-free on the
    batch side regardless of batch size."""
    ids = id_cols if id_cols is not None else [c for c in df.columns]
    probes = (df.select(*ids, F.explode(bloom_positions(F.col(col), m_bits, k))
                        .alias("pos"))
              .select(*ids, *_word_layout("pos")))
    return (probes.join(F.broadcast(bloom), "word_idx", "left")
            .withColumn("_set",
                        (F.coalesce(F.col("word"), F.lit(0))
                         .bitwiseAND(F.col("bit")) != 0))
            .groupBy(*ids)
            .agg(F.every("_set").alias(hit_col)))


def bloom_probe_sharded(df: DataFrame, col: str, bloom: DataFrame, *,
                        n_shards: int, id_cols: list[str] | None = None,
                        m_bits: int = M_BITS, k: int = K_HASHES,
                        hit_col: str = "bloom_hit") -> DataFrame:
    """`bloom_probe` for filters too large to broadcast whole: B range
    shards of the word table, one broadcast alive at a time, verdicts
    AND-combined — bit-identical to the single-filter probe.

    Mechanics: the per-row bit positions are computed once
    (localCheckpoint — the probe table feeds every shard pass), each
    pass handles the ~1/B of positions in its word_idx range, and the
    per-id partial ("every probed bit in this shard set") is
    materialized so the shard broadcast can be released before the
    next pass starts. An id with no position in a shard is simply
    absent from that partial — vacuously true under the final AND.
    The driver loop is B iterations of bounded work (B ~ 32 for the
    12 GB case in the module docstring)."""
    ids = id_cols if id_cols is not None else [c for c in df.columns]
    n_words = m_bits // 32
    per_shard = -(-n_words // n_shards)  # ceil: last shard may be short
    probes = (df.select(*ids,
                        F.explode(bloom_positions(F.col(col), m_bits, k))
                        .alias("pos"))
              .select(*ids, *_word_layout("pos"))
              .transform(materialize))
    parts = []
    for s in range(n_shards):
        lo, hi = s * per_shard, (s + 1) * per_shard
        in_range = (F.col("word_idx") >= lo) & (F.col("word_idx") < hi)
        part = (probes.filter(in_range)
                .join(F.broadcast(bloom.filter(in_range)), "word_idx",
                      "left")
                .withColumn("_set",
                            (F.coalesce(F.col("word"), F.lit(0))
                             .bitwiseAND(F.col("bit")) != 0))
                .groupBy(*ids)
                .agg(F.every("_set").alias("_part_hit"))
                # eager: run this shard's pass NOW so its broadcast is
                # droppable before the next shard's starts — the whole
                # point of sharding
                .transform(materialize))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*ids).agg(F.every("_part_hit").alias(hit_col))
