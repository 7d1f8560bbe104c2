"""Semantic invariants for the dedup tier beyond oracle equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark import registry
from myhadoop_spark.catalog import load
from tests.conftest import SF_SMOKE


def test_dedup_exact_restores_original(spark):
    docs = load(spark, SF_SMOKE, "documents")
    deduped = registry.get("dedup_exact").fn(spark, SF_SMOKE)
    assert deduped.count() == docs.count()
    assert deduped.select("doc_id").distinct().count() == docs.count()


def test_dedup_content_covers_all_docs(spark):
    docs = load(spark, SF_SMOKE, "documents")
    out = registry.get("dedup_exact").fn(spark, SF_SMOKE)
    # doubled input → every content group has an even copy count ≥ 2
    assert out.filter((F.col("n_copies") % 2 != 0) | (F.col("n_copies") < 2)).count() == 0
    # one surviving row per distinct doc, each tagged with its group size
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 2 * docs.count()
    # the keep-one representative is a member of its own group
    assert out.filter(F.col("keep_id") > F.col("doc_id")).count() == 0


def test_minhash_pairs_are_true_near_dups(spark):
    """Every emitted pair must genuinely meet the Jaccard threshold
    (the verify stage guarantees no LSH false positives survive)."""
    pairs = registry.get("dedup_minhash").fn(spark, SF_SMOKE)
    assert pairs.filter(F.col("jaccard") < 0.5).count() == 0
    # and pairs are canonical (doc1 < doc2), no self-pairs
    assert pairs.filter(F.col("doc1") >= F.col("doc2")).count() == 0


def test_simhash_is_32bit(spark):
    out = registry.get("simhash").fn(spark, SF_SMOKE)
    bad = out.filter((F.col("simhash") < 0) | (F.col("simhash") > (1 << 32) - 1))
    assert bad.count() == 0


def test_ngram_salted_candidates_equal_direct_join(spark):
    """The salted (source, hash(doc_id)%B) candidate join must produce
    EXACTLY the pair set of a direct source-blocked self-join — salting
    is a physical-parallelism rewrite, never a semantic one. (Guards
    the replicate-left/bucket-right wiring: a bug that bucketed BOTH
    sides would silently drop cross-bucket pairs.)"""
    from pyspark.sql import functions as F

    from myhadoop_spark.catalog import load

    docs = load(spark, SF_SMOKE, "documents").filter(F.length("text") >= 3)
    sizes = docs.select("doc_id", "source", F.length("text").alias("n"))
    ratio = (F.least("n1", "n2").cast("double")
             / F.greatest("n1", "n2").cast("double"))
    a = sizes.select(F.col("doc_id").alias("doc1"), "source",
                     F.col("n").alias("n1"))
    b = sizes.select(F.col("doc_id").alias("doc2"),
                     F.col("source").alias("source2"),
                     F.col("n").alias("n2"))
    direct = {(r["doc1"], r["doc2"]) for r in
              a.join(b, (F.col("source") == F.col("source2"))
                     & (F.col("doc1") < F.col("doc2")))
              .filter(ratio >= 0.75).select("doc1", "doc2").collect()}

    n_buckets = 16
    buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    a_rep = a.crossJoin(F.broadcast(buckets))
    b_bk = b.withColumn("bucket2", F.pmod(F.hash("doc2"), F.lit(n_buckets)))
    salted = {(r["doc1"], r["doc2"]) for r in
              a_rep.join(b_bk, (F.col("source") == F.col("source2"))
                         & (F.col("bucket") == F.col("bucket2"))
                         & (F.col("doc1") < F.col("doc2")))
              .filter(ratio >= 0.75).select("doc1", "doc2").collect()}
    assert direct == salted and len(direct) > 0


def test_minhash_candidate_dedup_plans_without_pair_exchange(spark):
    """r14 (optimization): under the broadcast budget the band
    self-join's pair dedup runs IN-STAGE — the stream side is
    hash-partitioned by doc1, the band table broadcasts as the build
    side, and HashPartitioning(doc1) satisfies the distinct's
    clustering, so no exchange keyed on the candidate pair may appear
    (the candidate multiset never crosses the network)."""
    import contextlib
    import io
    import re

    from myhadoop_spark.queries.dedup import (_hashed_token_sets,
                                              minhash_pairs)

    sets = _hashed_token_sets(spark, SF_SMOKE).localCheckpoint()
    out = minhash_pairs(spark, sets)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert not re.search(r"hashpartitioning\(doc1", plan), plan
