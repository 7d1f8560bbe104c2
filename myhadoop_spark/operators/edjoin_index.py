"""Persistent partition-pruned q-gram prefix index for the streaming
entity catalog's cross probe (the r11 queue item: the stream's probe
ran Ed-Join's candidate stage over batch-reps ∪ the WHOLE catalog
every batch — re-exploding and re-ranking the catalog's grams each
time and reading all of it; the lsh_index probe discipline is the
template this module applies to the edit-distance family).

Correctness foundation — the FROZEN gram order: Ed-Join's prefix
filter (operators/edjoin.py, Xiao et al. 2008) is exact-recall under
ANY total order of grams, provided BOTH sides of a join select their
prefixes under the SAME order (frequency-ascending is only the best
PRUNING heuristic, not a correctness requirement). The index
therefore freezes the order at first build — the (gram, df) table of
the founding catalog — and every later append and every probe ranks
by (frozen_df, gram, pos), where grams unseen at freeze time get
df = 0 (treated rarest: conservative — pruning quality can drift as
the corpus drifts, exactness cannot; `rebuild` is the re-freeze
face, the ivf_index retrain precedent).

Index layout (one directory, partition-pruned reads):

    <path>/gram_df/                   frozen (gram, df) — written once
    <path>/prefix/batch_id=N/tier=T/bucket=B/
        (gram, len, entity, nm) prefix rows appended per batch

    tier ∈ {long, mid, short}, mirroring the one-shot operator's
    exact-recall tier partition (q-gram prefixes for len ≥ q(d+1);
    char prefixes for d+1 ≤ len ≤ q(d+1)+d−1; the content-blind
    bounded class len ≤ 2d as plain (entity, nm, len) rows);
    bucket = crc32(gram) % n_buckets for long/mid (0 for short).

A probe reads ONLY the buckets its own prefix grams hash to (plus
the bounded short tier): Spark's partition pruning turns the filter
`bucket IN (...)` into a directory prune, so per-batch catalog bytes
read scale with the BATCH's gram set, not the catalog
(edjoin_index_study.tsv rehearses the fraction).

Replay safety: appends go under prefix/batch_id=N and are
dynamically overwritten on replay — idempotent like every versioned
state face here.

Reference analog: none — §2.3 extension surface (streaming entity
resolution, VERDICT r11 COVERAGE row follow-on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def _grams(df: DataFrame, q: int) -> DataFrame:
    """(entity, nm, len, pos, gram): positional q-grams."""
    return df.select(
        "entity", "nm", "len",
        F.posexplode(F.expr(
            f"transform(sequence(1, len - {q - 1}), "
            f"p -> substring(nm, p, {q}))")).alias("pos", "gram"))


def _ranked_prefix(ex: DataFrame, order: DataFrame,
                   pref_len) -> DataFrame:
    """Prefix rows under the frozen order: rank grams per entity by
    (frozen df — 0 when unseen at freeze, gram, pos), keep the first
    ``pref_len`` (a literal or a per-row Column)."""
    w = Window.partitionBy("entity").orderBy(
        F.col("_fdf").asc(), F.col("gram").asc(), F.col("pos").asc())
    return (ex.join(F.broadcast(order), "gram", "left")
            .withColumn("_fdf", F.coalesce("df", F.lit(0).cast("long")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= pref_len)
            .select("entity", "nm", "len", "gram"))


def prefix_rows(names: DataFrame, order: DataFrame, *,
                max_dist: int, q: int,
                n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(tier, bucket, gram, len, entity, nm) for a (entity, nm)
    table — the rows the index stores and the rows a probe computes
    for its own side (both sides MUST use the same frozen
    ``order``)."""
    d, pref_len = int(max_dist), q * int(max_dist) + 1
    base = (names.select("entity", "nm")
            .filter(F.col("nm").isNotNull())
            .withColumn("len", F.length("nm")))
    longs = base.filter(F.col("len") >= q * (d + 1))
    long_rows = (_ranked_prefix(_grams(longs, q), order, pref_len)
                 .withColumn("tier", F.lit("long")))
    mid_top = q * (d + 1) + d - 1
    mids = base.filter((F.col("len") >= d + 1)
                       & (F.col("len") <= mid_top))
    mid_rows = (_ranked_prefix(_grams(mids, 1), order, d + 1)
                .withColumn("tier", F.lit("mid")))
    shorts = (base.filter(F.col("len") <= 2 * d)
              .select("entity", "nm", "len",
                      F.lit(None).cast("string").alias("gram"),
                      F.lit("short").alias("tier")))
    out = long_rows.unionByName(mid_rows).unionByName(shorts)
    return out.withColumn(
        "bucket",
        F.when(F.col("tier") == "short", F.lit(0))
        .otherwise(F.crc32(F.col("gram")) % int(n_buckets))
        .cast("int"))


def freeze_order(names: DataFrame, *, q: int) -> DataFrame:
    """The frozen (gram, df) order table: q-gram AND 1-gram document
    frequencies of the founding catalog (1-grams serve the mid
    tier); disjoint key spaces unless q = 1, where the union is the
    plain df."""
    base = (names.select("entity", "nm")
            .filter(F.col("nm").isNotNull())
            .withColumn("len", F.length("nm")))
    qg = _grams(base.filter(F.col("len") >= q), q)
    # len >= 1 guard: sequence(1, 0) runs BACKWARDS in Spark and
    # would pollute the order with phantom empty grams
    cg = _grams(base.filter(F.col("len") >= 1), 1)
    return (qg.select("gram").unionAll(cg.select("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("df")))


def probe(batch_names: DataFrame, index: DataFrame,
          order: DataFrame, *, max_dist: int, q: int,
          n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(entity AS probe_id, catalog entity, dist): every (batch name,
    catalog name) pair within ``max_dist`` edits — exact recall, the
    cross-set face of edit_distance_pairs' tier structure.
    ``batch_names`` is (entity, nm) where entity is the probe-side
    id; ``index`` is the stored prefix table (bucket-filtered read —
    pass the pruned frame); ``order`` the frozen order."""
    d = int(max_dist)
    b = prefix_rows(batch_names, order, max_dist=d, q=q,
                    n_buckets=n_buckets)
    bl = b.select(F.col("entity").alias("_pid"),
                  F.col("nm").alias("_pnm"),
                  F.col("len").alias("_plen"), "tier", "bucket",
                  "gram")
    il = index.select(F.col("entity").alias("_cid"),
                      F.col("nm").alias("_cnm"),
                      F.col("len").alias("_clen"), "tier", "bucket",
                      "gram")
    ldiff = F.abs(F.col("_plen") - F.col("_clen")) <= d
    # long x long on shared q-gram prefixes
    c_long = (bl.filter(F.col("tier") == "long")
              .join(il.filter(F.col("tier") == "long"),
                    ["tier", "bucket", "gram"])
              .filter(ldiff))
    # mid x mid on shared char prefixes (min length < q(d+1) holds by
    # tier construction on at least one side; the length filter plus
    # the tier bounds reproduce the one-shot mid tier exactly)
    c_mid = (bl.filter(F.col("tier") == "mid")
             .join(il.filter(F.col("tier") == "mid"),
                   ["tier", "bucket", "gram"])
             .filter(ldiff))
    # but a mid probe can also pair with a LONG catalog string whose
    # length ≤ mid_top — those catalog strings carry mid-tier char
    # rows too ONLY when their len ≤ mid_top; the one-shot mid tier
    # explodes chars for every string in [d+1, mid_top], long or not,
    # and prefix_rows mirrors that bound, so c_mid already covers it.
    # content-blind bounded class: either side ≤ d pairs with
    # anything within ±d length (the other side is then ≤ 2d and
    # present in the short tier on both sides)
    bs = bl.filter(F.col("tier") == "short").select(
        "_pid", "_pnm", "_plen").distinct()
    is_ = il.filter(F.col("tier") == "short").select(
        "_cid", "_cnm", "_clen").distinct()
    c_tiny = (bs.crossJoin(F.broadcast(is_))
              .filter((F.abs(F.col("_plen") - F.col("_clen")) <= d)
                      & ((F.col("_plen") <= d)
                         | (F.col("_clen") <= d))))
    cand = (c_long.select("_pid", "_pnm", "_cid", "_cnm")
            .unionByName(c_mid.select("_pid", "_pnm", "_cid", "_cnm"))
            .unionByName(c_tiny.select("_pid", "_pnm", "_cid",
                                       "_cnm"))
            .distinct())
    return (cand.withColumn("dist",
                            F.levenshtein("_pnm", "_cnm", d))
            .filter(F.col("dist") >= 0)
            .select(F.col("_pid").alias("probe_id"),
                    F.col("_cid").alias("entity"), "dist"))


def read_pruned(spark: SparkSession, path: str,
                buckets: list[int],
                max_batch: int | None = None) -> DataFrame:
    """The stored prefix table restricted to ``buckets`` plus the
    short tier — a partition-pruned read (bucket, tier, and batch_id
    are partition columns). ``max_batch`` restricts the read to
    COMMITTED batches (``batch_id <= max_batch``): a crash between
    the prefix write for batch N and the meta.json commit leaves an
    orphan ``batch_id=N`` dir, and a replay of batch N must never
    probe its own failed-attempt rows (it would match itself at
    dist 0 and the catalog would permanently omit those entities).
    Pass the meta's ``last_batch``; ``None`` reads everything (only
    safe outside the replay path, e.g. offline inspection)."""
    idx = spark.read.parquet(f"{path}/prefix")
    if max_batch is not None:
        idx = idx.filter(F.col("batch_id") <= int(max_batch))
    short_only = F.col("tier") == "short"
    if not buckets:
        # a batch whose every name is in the content-blind class
        # probes only the bounded short tier
        return idx.filter(short_only)
    return idx.filter(F.col("bucket").isin([int(x) for x in buckets])
                      | short_only)
