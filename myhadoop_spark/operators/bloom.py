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
m ~ 9.6e10 bits = 12 GB — too big for one broadcast, so shard the
filter on a hash prefix into ~32 broadcastable pieces and probe each
batch partition against its shard (the word_idx layout already supports
range-sharding). All arithmetic stays JVM-side codegen: no UDF, no
driver state, no collect.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
