"""End-to-end curation pipeline v2 — the r4 operator family composed
into the modern training-data flow:

    scrub PII → bootstrap + apply the quality classifier → drop
    exact-substring duplicates (keep the smaller doc_id) → excise
    verbatim benchmark spans (decontamination surgery) → verifiable
    sharded export.

This is the "a user of the reference could run their whole curation
flow here" demonstration piece: each stage is the operator the repo
ships (operators/scrub.py, classifier.py, substring.py, export.py).
The plan stays Spark-shaped end to end: scrub is a narrow regexp
chain, classifier scoring is a broadcast join, substring dedup is the
banded window-hash join, and the export is one partitionBy-shard
shuffle.

Materialization discipline (r5): the per-stage funnel counts are
actions, and Catalyst shares no work across actions — the r4 shape ran
classifier training and the substring join up to five times on one
uncached lazy chain. The four expensive frontiers (post-scrub,
post-classifier, post-dedup, post-surgery) are persisted MEMORY_AND_DISK and
unpersisted after the export, so each stage executes exactly once;
tests/test_pipeline2.py pins the source-scan multiplicity with a
counting wrapper. (The zero-cache alternative — collecting counts via
observe() metrics on the single export action — drops the funnel
detail on failure paths; explicit persists are the 100 TB-honest
trade, spilling to disk where the corpus outgrows executor memory.)

corpus_prep (queries/pipeline.py) remains the oracle-gated composed
query; this v2 face is pytest-verified (tests/test_pipeline2.py) since
the classifier/k-means stages have no SQL twin in the gate.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.operators.bloom import bloom_probe, bloom_probe_sharded
from myhadoop_spark.operators.classifier import (
    score_documents,
    tokens,
    train_token_weights,
)
from myhadoop_spark.operators.export import export_shards
from myhadoop_spark.operators.scrub import scrub_text
from myhadoop_spark.operators.substring import (
    remove_overlap_spans,
    substring_pairs,
)


def _quality_label(docs: DataFrame) -> DataFrame:
    """The doc_metrics heuristic (queries/text.py) as the classifier's
    bootstrap teacher, same constants."""
    toks = tokens()
    n = F.size(toks).cast("double")
    stop = F.size(F.filter(
        toks, lambda t: t.isin("the", "a", "of", "and", "to", "in")))
    q = (F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
         + F.lit(0.3) * (F.size(F.array_distinct(toks)).cast("double") / n)
         + F.lit(0.3) * (F.lit(1.0) - stop.cast("double") / n))
    return docs.filter(F.size(toks) > 0).withColumn("label", q >= F.lit(0.78))


def curate(spark: SparkSession, sf_dir: str, out_path: str,
           *, train_frac_mod: int = 2, n_shards: int = 8,
           wide_hash: bool = False,
           seen_filter: DataFrame | None = None,
           n_filter_shards: int = 1,
           lm_max_ppl: float | None = None,
           compression_band: tuple[float, float] | None = None,
           dsir_budget: int | None = None,
           url_meta: DataFrame | None = None,
           url_blocklist: DataFrame | None = None,
           url_keywords: tuple = (),
           url_threshold: int | None = None,
           url_missing: str = "keep",
           line_clean_args: dict | None = None,
           line_dedup_lines: bool = False,
           fuzzy_bench_decontam: bool = False) -> dict:
    """Run the full flow; returns {stage: row_count} + the export
    manifest under 'manifest'. Deterministic end to end: hash-based
    classifier split, content-hash shards, id-ordered dedup keeps.

    Scale knobs (r6 — the 100 TB parameter surface, each verified
    output-equal to the default path in tests/test_pipeline2.py):

    * ``wide_hash=True`` threads the ~62-bit window-hash banding into
      BOTH substring stages (dedup + decontamination surgery) — the
      posture for corpora where 31-bit band collisions would inflate
      the verify joins (operators/substring.py wide_hash);
    * ``seen_filter`` arms an incremental-ingest stage: a Bloom word
      table (operators/bloom.py, built over SCRUBBED text with the
      default m_bits/k) drops documents already absorbed by a prior
      snapshot right after the scrub — the batch twin of the
      streaming bloom_ingest face, so re-crawled corpora don't pay
      classification/dedup for content the corpus already holds;
    * ``n_filter_shards > 1`` probes that filter through the
      range-sharded path (one broadcast alive at a time, verdicts
      AND-combined, bit-identical) for filters beyond one broadcast;
    * ``lm_max_ppl`` arms the second quality gate (r6): a bigram LM
      trained on the benchmark reference split (the same trusted
      doc_id%20 slice decontamination protects) scores the
      classifier-kept docs, and those with perplexity above the
      threshold drop (operators/lm_filter.py — the KenLM-shaped
      CCNet/DCLM stage). Docs too short to score (< 2 tokens) pass
      through: no evidence is not negative evidence;
    * ``compression_band=(lo, hi)`` arms the cheap Gopher-family
      repetition/noise gate (operators/compression.py) right after
      the scrub: documents whose deflate ratio falls outside the
      band drop BEFORE the classifier spends training and scoring on
      boilerplate; empty docs pass (the length gates own empties);
    * ``dsir_budget=k`` arms the FINAL selection stage (r8): DSIR
      importance resampling (operators/dsir.py) keeps the k surviving
      documents whose hashed-n-gram distribution looks most like the
      trusted doc_id%20 reference slice — the "make the export look
      like the target" step, applied LAST so the budget is spent on
      documents that already cleared scrub/quality/dedup/decontam.

    r12 stages (VERDICT r11 #4 — the r10/r11 curation families in
    RefinedWeb order, each default-off; when disabled the plan is
    bit-identical to the r11 pipeline):

    * ``url_meta=(doc_id, canon_url, domain)`` arms RefinedWeb §3.1
      URL filtering as stage ZERO (the URL is the cheapest quality
      signal — blocked documents never even reach the scrub):
      ``url_blocklist`` domains drop via the broadcast anti join and
      ``url_keywords``/``url_threshold`` score the canonical URL
      (operators/url_filter.py, the curate_mix stage-one machinery).
      ``url_missing`` decides documents ABSENT from url_meta (a crawl
      metadata coverage gap): ``"keep"`` (default — only an explicit
      rule drop deletes a document; metadata-less docs pass),
      ``"drop"`` (metadata is a pass requirement — the strict crawl
      posture), or ``"error"`` (coverage is a contract; any gap is a
      loud failure);
    * ``line_clean_args={...}`` arms C4/RefinedWeb line-wise cleaning
      (operators/line_filter.py clean_lines kwargs; lines split on
      newlines) after the cheap gates and BEFORE classifier training,
      so the classifier learns from the text it will score — the
      curate_lines composition order;
    * ``line_dedup_lines=True`` arms CCNet corpus-wide keep-first
      line dedup right after the clean (operators/line_dedup.py —
      the survivor rides the partial agg, hot lines never funnel);
    * ``fuzzy_bench_decontam=True`` arms MinHash-LSH benchmark
      near-dup DROPS (queries/fuzzy_decontam.py) between the
      substring dedup and the verbatim surgery: paraphrase-level
      bench leakage drops whole documents, then the surgery excises
      any verbatim spans from what survives.

    Reference-slice invariant (the compression-gate precedent): the
    decontam benchmark and LM reference stay the doc_id%20 slice of
    the SCRUBBED corpus, captured before every optional gate — a
    line-cleaned document is matched against the bench windows of
    its PRE-cleaning text, so arming a gate can never shrink the
    protected reference. The URL gate honors this too (r13): the
    reference slice is captured from the PRE-URL-filter corpus, so a
    bench document blocked on its crawl metadata still has verbatim /
    near-dup copies of it excised from what ships.
    """
    if (url_blocklist is not None or url_keywords) and url_meta is None:
        raise ValueError("url_blocklist/url_keywords given without "
                         "url_meta (doc_id, canon_url, domain)")
    if url_missing not in ("keep", "drop", "error"):
        raise ValueError(f"url_missing must be 'keep', 'drop', or "
                         f"'error', got {url_missing!r}")
    raw = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    stats = {"raw": raw.count()}

    # stage 0 (r12): RefinedWeb URL filtering — drop documents on
    # their crawl metadata BEFORE any content processing
    ref_override = None
    if url_meta is not None:
        from myhadoop_spark.operators.url_filter import url_filter

        # the protected bench/LM reference slice is captured BEFORE
        # the URL gate (scrubbed inside _curate) — the one stage-zero
        # exception to "blocked docs never reach the scrub": the
        # reference is 1/20 of the corpus and pays one narrow regexp
        # pass so decontamination never loses a protected document
        ref_override = raw.filter(F.col("doc_id") % 20 == 0)
        survivors = url_filter(
            url_meta, blocked_domains=url_blocklist,
            keywords=tuple(url_keywords), threshold=url_threshold,
            keep_score=False).select("doc_id")
        if url_missing == "error":
            gap = (raw.select("doc_id")
                   .join(url_meta.select("doc_id"), "doc_id",
                         "left_anti").count())
            if gap:
                raise ValueError(
                    f"url_meta is missing {gap} corpus doc_ids "
                    "(url_missing='error'); fix the crawl metadata or "
                    "choose url_missing='keep'/'drop'")
            raw = raw.join(survivors, "doc_id")
        elif url_missing == "drop":
            # strict posture: no metadata row = no pass (inner join)
            raw = raw.join(survivors, "doc_id")
        else:
            # default: only an EXPLICIT rule drop deletes a document —
            # a metadata coverage gap must not silently delete corpus
            dropped = (url_meta.select("doc_id")
                       .join(survivors, "doc_id", "left_anti"))
            raw = raw.join(dropped, "doc_id", "left_anti")
        stats["after_url_filter"] = raw.count()

    frontiers: list[DataFrame] = []
    try:
        return _curate(spark, raw, stats, out_path, train_frac_mod,
                       n_shards, frontiers, wide_hash, seen_filter,
                       n_filter_shards, lm_max_ppl, compression_band,
                       dsir_budget, line_clean_args, line_dedup_lines,
                       fuzzy_bench_decontam, ref_override)
    finally:
        # release the cached frontiers on every exit path — a failed
        # stage must not leave corpus-sized blocks pinned for the rest
        # of the session
        for frontier in frontiers:
            frontier.unpersist()


def _curate(spark: SparkSession, raw: DataFrame, stats: dict,
            out_path: str, train_frac_mod: int, n_shards: int,
            frontiers: list[DataFrame], wide_hash: bool,
            seen_filter: DataFrame | None, n_filter_shards: int,
            lm_max_ppl: float | None = None,
            compression_band: tuple[float, float] | None = None,
            dsir_budget: int | None = None,
            line_clean_args: dict | None = None,
            line_dedup_lines: bool = False,
            fuzzy_bench_decontam: bool = False,
            ref_override: DataFrame | None = None) -> dict:
    def _persist(df: DataFrame) -> DataFrame:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        frontiers.append(df)
        return df

    # 1. PII scrub — narrow codegen regexp chain. Persisted too: clean
    #    is referenced ~7x downstream (training's two aggregations,
    #    scoring's two passes, the kept join, the bench side twice) —
    #    caching it makes the source scan once instead of per-reference
    scrubbed = raw.withColumn("text", scrub_text("text"))

    # 1b. optional seen-corpus gate BEFORE the cached frontier fills:
    #     documents whose scrubbed text the prior-snapshot Bloom filter
    #     recognizes never enter the pipeline (no false negatives — a
    #     genuinely new doc can only be lost at the filter's sized-for
    #     false-positive rate, the documented Bloom trade)
    if seen_filter is not None:
        if n_filter_shards > 1:
            hits = bloom_probe_sharded(scrubbed.select("doc_id", "text"),
                                       "text", seen_filter,
                                       n_shards=n_filter_shards,
                                       id_cols=["doc_id"])
        else:
            hits = bloom_probe(scrubbed.select("doc_id", "text"),
                               "text", seen_filter, id_cols=["doc_id"])
        scrubbed = scrubbed.join(
            hits.filter(~F.col("bloom_hit")).select("doc_id"), "doc_id")

    clean = _persist(scrubbed)
    if seen_filter is not None:
        stats["after_seen_filter"] = clean.count()

    # the decontam benchmark and LM reference are the doc_id%20 split
    # of the SCRUBBED corpus (the documented invariant) — captured
    # BEFORE any optional gate below so arming a gate can never shrink
    # the reference and let a verbatim benchmark copy ship unexcised.
    # When the URL gate ran (ref_override), the slice comes from the
    # PRE-URL corpus: URL-blocked bench docs stay protected (r13)
    if ref_override is not None:
        reference = _persist(
            ref_override.withColumn("text", scrub_text("text")))
    else:
        reference = clean

    # 1c. optional compression-band gate: the Gopher repetition/noise
    #     heuristic — one narrow Arrow pass, dropped docs never reach
    #     classifier training or any dedup join
    if compression_band is not None:
        from myhadoop_spark.operators.compression import (
            filter_by_compression,
        )

        lo, hi = compression_band
        clean = _persist(filter_by_compression(clean, min_ratio=lo,
                                               max_ratio=hi))
        stats["after_compression_gate"] = clean.count()

    # 1d. optional C4/RefinedWeb line-wise cleaning (r12): per-line +
    #     doc-level rules in one narrow HOF pass; survivors carry the
    #     rebuilt text so the classifier trains on what it will score
    if line_clean_args is not None:
        from myhadoop_spark.operators.line_filter import (
            clean_lines,
            split_lines,
        )

        clean = _persist(
            clean_lines(clean, lines_col=split_lines("text"),
                        **line_clean_args)
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text", "n_lines", "n_kept"))
        stats["after_line_clean"] = clean.count()

    # 1e. optional CCNet corpus-wide line dedup (r12): keep-first
    #     survivor carried through the partial min(struct) agg — one
    #     shuffle on the line key, hot lines never funnel one task
    if line_dedup_lines:
        from myhadoop_spark.operators.line_dedup import line_dedup
        from myhadoop_spark.operators.line_filter import split_lines

        clean = _persist(
            line_dedup(clean, lines_col=split_lines("text"),
                       min_kept_lines=1)
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text", "n_lines", "n_kept"))
        stats["after_line_dedup"] = clean.count()

    # 2. classifier-filtered quality: train on the deterministic even
    #    split of the scrubbed corpus, keep pred-positive docs.
    #    PERSIST the frontier: the count below materializes it, so
    #    training runs exactly once and every later stage reads the
    #    cached rows instead of re-running the classifier
    labeled = _quality_label(clean)
    weights = train_token_weights(
        labeled.filter(F.col("doc_id") % train_frac_mod == 0))
    kept = _persist(score_documents(labeled, weights)
                    .filter("pred").select("doc_id")
                    .join(clean, "doc_id"))
    stats["after_quality"] = kept.count()

    # 2b. optional LM perplexity gate: the second, distributional
    #     quality signal (the classifier is lexical/integer-exact; the
    #     LM catches fluency outliers). Reference = the trusted bench
    #     split; left_anti keeps unscored short docs
    if lm_max_ppl is not None:
        from myhadoop_spark.operators.lm_filter import (
            score_perplexity,
            train_bigram_lm,
        )

        lm = train_bigram_lm(
            reference.filter(F.col("doc_id") % 20 == 0).select("text"))
        too_perplexing = (score_perplexity(kept, lm, broadcast_lm=True)
                          .filter(F.col("ppl") > lm_max_ppl)
                          .select("doc_id"))
        kept = _persist(kept.join(too_perplexing, "doc_id", "left_anti"))
        stats["after_lm_gate"] = kept.count()

    # 3. exact-substring dedup: drop the LARGER doc_id of each verified
    #    pair (transitively safe: every dropped doc has a kept or
    #    earlier-dropped twin with the shared run)
    drop = (substring_pairs(kept.select("doc_id", "text"),
                            wide_hash=wide_hash)
            .select(F.col("doc_b").alias("doc_id")).distinct())
    deduped = _persist(kept.join(drop, "doc_id", "left_anti"))
    stats["after_dedup"] = deduped.count()

    # 3b. optional fuzzy benchmark decontamination (r12): MinHash-LSH
    #     near-dups of the protected bench slice drop as WHOLE docs
    #     (paraphrase-level leakage) before the verbatim-span surgery;
    #     bench members themselves are exempt — stage 4 excludes them
    #     from the export anyway, and self-hits would be vacuous
    if fuzzy_bench_decontam:
        from myhadoop_spark.queries.dedup import _hashed_token_sets
        from myhadoop_spark.queries.fuzzy_decontam import (
            fuzzy_contaminated,
        )

        bench_f = reference.filter(F.col("doc_id") % 20 == 0).select(
            "doc_id", "text")
        corpus_f = deduped.filter(F.col("doc_id") % 20 != 0).select(
            "doc_id", "text")
        hits = (fuzzy_contaminated(
            spark,
            _hashed_token_sets(spark, "", docs=corpus_f),
            _hashed_token_sets(spark, "", docs=bench_f))
            .select("doc_id").distinct())
        deduped = _persist(deduped.join(hits, "doc_id", "left_anti"))
        stats["after_fuzzy_decontam"] = deduped.count()

    # 4. benchmark decontamination SURGERY: cut verbatim eval-set runs
    #    out of surviving documents (span removal, not doc drops) —
    #    benchmark = the deterministic doc_id%20 split of the SCRUBBED
    #    corpus (the curation_gate decontam convention): both sides of
    #    the window join must see identical token streams, or a
    #    verbatim benchmark copy whose span contained a scrubbed
    #    pattern (email/phone) would no longer match the bench windows
    #    and that contamination would be missed. Docs emptied by the
    #    cut (pure benchmark copies) drop out of the export
    bench = reference.filter(F.col("doc_id") % 20 == 0).select("doc_id",
                                                               "text")
    surgically = _persist(remove_overlap_spans(
        deduped.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text"),
        bench,
        # passes=2 closes the seam case: cutting a middle run can butt
        # two fragments into a NEW verbatim benchmark run
        passes=2, wide_hash=wide_hash))
    stats["tokens_excised"] = (
        surgically.agg(F.sum("n_tokens_removed")).collect()[0][0] or 0)
    final = (surgically.filter(F.length("text") > 0)
             .join(deduped.select("doc_id", "lang", "source"), "doc_id"))
    stats["after_decontam"] = final.count()

    # 4b. optional DSIR budget selection (r8): importance-resample the
    #     survivors toward the trusted reference slice — LAST, so the
    #     budget buys documents that already cleared every gate. The
    #     target is the same doc_id%20 slice the LM gate trusts and
    #     decontamination protects (the CCNet stance: one curated
    #     reference drives both filtering and selection).
    if dsir_budget is not None:
        from myhadoop_spark.operators.dsir import dsir_select

        final = _persist(final)
        target = (reference.filter(F.col("doc_id") % 20 == 0)
                  .select("doc_id", "text"))
        chosen = dsir_select(target, final.select("doc_id", "text"),
                             k=dsir_budget).select("doc_id")
        final = final.join(chosen, "doc_id")
        stats["after_dsir"] = final.count()

    # 5. verifiable sharded export
    stats["manifest"] = export_shards(final, out_path, key="doc_id",
                                      n_shards=n_shards)
    return stats


def curate_chunks(spark: SparkSession, sf_dir: str, out_path: str, *,
                  chunk_tokens: int = 32, overlap: int = 8,
                  n_shards: int = 8) -> dict:
    """Chunk-granular curation (r6) — the RAG-pipeline composition the
    document-level flow can't express: dedup/decontam/export operate on
    CHUNKS while every row keeps its document lineage (doc_id,
    chunk_id, start_token), so an embedding index built downstream can
    always cite back into the source document.

        scrub PII (doc level, BEFORE chunking — a redaction must not
        straddle a chunk boundary) → chunk_documents (deterministic
        overlapping token windows, operators/chunking.py) → exact
        chunk dedup (one representative per distinct chunk text — the
        min (doc_id, chunk_id), boilerplate/overlap windows collapse
        here) → chunk-level decontamination (DROP chunks sharing a
        token-shingle with the benchmark split: at chunk granularity
        dropping IS the surgery — the unit is already small) →
        verifiable sharded export keyed by chunk_uid.

    The dedup stage has a DuckDB differential twin (registered ungated
    query ``chunk_dedup``, queries/dedup_ext.py); the funnel/export
    contracts are pinned in tests/test_pipeline2.py. Scale shape:
    chunking is a shuffle-free narrow projection; dedup shuffles on
    text hash once; decontam joins against a broadcast bench shingle
    set; export is the one partitionBy-shard shuffle."""
    from pyspark.sql import Window

    from myhadoop_spark.operators.chunking import chunk_documents
    from myhadoop_spark.operators.decontam import contamination_pairs

    raw = load(spark, sf_dir, "documents").select("doc_id", "text",
                                                  "lang", "source")
    stats = {"raw_docs": raw.count()}
    frontiers: list[DataFrame] = []
    try:
        clean = raw.withColumn("text", scrub_text("text"))
        chunks = (chunk_documents(clean.select("doc_id", "text"),
                                  chunk_tokens=chunk_tokens,
                                  overlap=overlap)
                  .withColumn("chunk_uid",
                              F.concat_ws(":", "doc_id", "chunk_id"))
                  .persist(StorageLevel.MEMORY_AND_DISK))
        frontiers.append(chunks)
        stats["chunks"] = chunks.count()

        # exact chunk dedup: min-(doc_id, chunk_id) representative per
        # distinct chunk text (deterministic; one hash shuffle on text)
        w = Window.partitionBy("text").orderBy("doc_id", "chunk_id")
        deduped = (chunks.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn")
                   .persist(StorageLevel.MEMORY_AND_DISK))
        frontiers.append(deduped)
        stats["after_chunk_dedup"] = deduped.count()

        # chunk-level decontam: the bench split is DOCUMENT-level (the
        # curation_gate convention, doc_id % 20 == 0 of the scrubbed
        # corpus); any surviving chunk sharing a shingle with it drops.
        # Chunks FROM bench documents are excluded from the export too.
        bench = clean.filter(F.col("doc_id") % 20 == 0).select(
            "doc_id", "text")
        candidates = deduped.filter(F.col("doc_id") % 20 != 0)
        hits = contamination_pairs(
            candidates.select(F.col("chunk_uid").alias("doc_id"), "text"),
            bench).select(F.col("corpus_id").alias("chunk_uid")).distinct()
        final = (candidates.join(hits, "chunk_uid", "left_anti")
                 .join(raw.select("doc_id", "lang", "source"), "doc_id"))
        stats["after_decontam"] = final.count()

        stats["manifest"] = export_shards(final, out_path,
                                          key="chunk_uid",
                                          n_shards=n_shards)
        return stats
    finally:
        for frontier in frontiers:
            frontier.unpersist()
