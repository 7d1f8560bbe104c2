"""Curation pipeline v2 (queries/pipeline2.py): the composed
scrub → classify → substring-dedup → export flow runs end to end,
conserves what it should, and its export verifies."""

from __future__ import annotations

from pyspark.sql import functions as F

from myhadoop_spark.operators.export import verify_export
from myhadoop_spark.queries.pipeline2 import curate
from tests.conftest import SF_SMOKE

import pytest

# r14 (VERDICT r13 item 1): heavy parity/property battery — the
# slow tier; see pytest.ini. Run with -m "slow or not slow".
pytestmark = pytest.mark.slow


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate(spark, SF_SMOKE, out)
    # monotone funnel, nothing fabricated
    assert stats["raw"] == 500
    assert 0 < stats["after_quality"] <= stats["raw"]
    assert 0 < stats["after_dedup"] <= stats["after_quality"]
    assert 0 < stats["after_decontam"] <= stats["after_dedup"]
    assert stats["tokens_excised"] >= 0
    # the exported table matches the manifest bit for bit
    assert stats["manifest"]["total_rows"] == stats["after_decontam"]
    statuses = {r.status for r in verify_export(spark, out).collect()}
    assert statuses == {"ok"}
    # no PII markers survive the scrub (the audit regexes fire on raw)
    exported = spark.read.parquet(out)
    assert exported.filter(F.col("text").rlike(r"@|https?://")).count() == 0


def test_pipeline_is_deterministic(spark, tmp_path):
    s1 = curate(spark, SF_SMOKE, str(tmp_path / "a"))
    s2 = curate(spark, SF_SMOKE, str(tmp_path / "b"))
    assert s1 == s2


def test_scale_knobs_equal_default_path(spark, tmp_path):
    """The 100 TB parameter surface must not change results: wide_hash
    banding, a (vacuous) seen-filter, and a 4-way sharded probe produce
    the same funnel and a bit-identical export as the default run."""
    from myhadoop_spark.operators.bloom import bloom_build

    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    empty_filter = bloom_build(
        spark.createDataFrame([], "text string"), "text")
    knobs = curate(spark, SF_SMOKE, str(tmp_path / "k"),
                   wide_hash=True, seen_filter=empty_filter,
                   n_filter_shards=4)
    assert knobs.pop("after_seen_filter") == base["raw"]
    assert knobs == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "k"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_seen_filter_drops_prior_snapshot(spark, tmp_path):
    """A filter built from a prior snapshot's SCRUBBED text must keep
    every one of those documents out of the pipeline (no false
    negatives) while passing the overwhelming share of new ones."""
    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.bloom import bloom_build
    from myhadoop_spark.operators.scrub import scrub_text

    docs = load(spark, SF_SMOKE, "documents")
    prior = (docs.filter(F.col("doc_id") % 5 == 0)
             .withColumn("text", scrub_text("text")))
    seen = bloom_build(prior.select("text"), "text").localCheckpoint()
    stats = curate(spark, SF_SMOKE, str(tmp_path / "inc"),
                   seen_filter=seen, n_filter_shards=2)
    exported = spark.read.parquet(str(tmp_path / "inc"))
    # Bloom has no false negatives: no prior doc re-enters (exact text
    # duplicates of a prior doc under another id are also legitimately
    # dropped, so assert on the prior ids themselves)
    assert exported.filter(F.col("doc_id") % 5 == 0).count() == 0
    n_prior = docs.filter(F.col("doc_id") % 5 == 0).count()
    survivors = stats["after_seen_filter"]
    # ≥95% of genuinely-new docs pass (sized false-positive rate)
    assert survivors >= (stats["raw"] - n_prior) * 0.95
    assert stats["manifest"]["total_rows"] == stats["after_decontam"]


def test_chunk_curation_end_to_end(spark, tmp_path):
    """Chunk-granular curation: the funnel conserves what it should,
    lineage survives to the export, the bench split is fully excluded,
    and the manifest verifies at chunk granularity."""
    from myhadoop_spark.queries.pipeline2 import curate_chunks

    out = str(tmp_path / "chunked")
    stats = curate_chunks(spark, SF_SMOKE, out)
    assert stats["raw_docs"] == 500
    assert stats["chunks"] > stats["raw_docs"]  # docs split into >1 chunk
    assert 0 < stats["after_chunk_dedup"] <= stats["chunks"]
    assert 0 < stats["after_decontam"] <= stats["after_chunk_dedup"]
    assert stats["manifest"]["total_rows"] == stats["after_decontam"]
    statuses = {r.status for r in verify_export(spark, out).collect()}
    assert statuses == {"ok"}

    exported = spark.read.parquet(out)
    # doc-level lineage on every chunk row
    for col in ("doc_id", "chunk_id", "start_token", "n_tokens",
                "chunk_uid", "lang", "source"):
        assert col in exported.columns, col
    # bench documents (doc_id % 20 == 0) never export
    assert exported.filter(F.col("doc_id") % 20 == 0).count() == 0
    # dedup kept exactly one row per distinct chunk text
    assert (exported.groupBy("text").count()
            .filter(F.col("count") > 1).count() == 0)
    # lineage is consistent: chunk_uid round-trips to (doc_id, chunk_id)
    assert exported.filter(
        F.col("chunk_uid") != F.concat_ws(":", "doc_id", "chunk_id")
    ).count() == 0


def test_chunk_curation_is_deterministic(spark, tmp_path):
    from myhadoop_spark.queries.pipeline2 import curate_chunks

    s1 = curate_chunks(spark, SF_SMOKE, str(tmp_path / "c1"))
    s2 = curate_chunks(spark, SF_SMOKE, str(tmp_path / "c2"))
    assert s1 == s2


def test_pipeline_executes_each_stage_once(spark, tmp_path, monkeypatch):
    """The funnel counts are separate actions; without the persisted
    frontiers the whole lineage (classifier training included)
    re-executed per action — up to 5 source scans per document. Pin
    the source-scan multiplicity with a counting mapInPandas wrapper
    around the catalog load: every lineage re-execution re-reads the
    source, so cumulative wrapped rows / corpus rows = how many times
    the un-persisted prefix ran."""
    import myhadoop_spark.queries.pipeline2 as p2

    acc = spark.sparkContext.accumulator(0)
    real_load = p2.load

    def counting_load(spark_, sf_dir, table):
        df = real_load(spark_, sf_dir, table)

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(count_rows, df.schema)

    monkeypatch.setattr(p2, "load", counting_load)
    stats = curate(spark, SF_SMOKE, str(tmp_path / "counted"))
    multiplicity = acc.value / stats["raw"]
    # budget: 1 scan for raw.count + 1 filling the persisted `clean`
    # frontier (every later reference — training's two aggregations,
    # scoring's two passes, the bench side — reads the cache) = 2x,
    # measured; the r4 uncached chain measured 8x. Margin +1 for
    # plan-shape drift; the assert catches the regression class
    # (re-running training per funnel count), not exact plan trivia.
    assert multiplicity <= 3, multiplicity


def test_lm_gate_knob(spark, tmp_path):
    """lm_max_ppl=inf must be output-identical to the default run
    (short unscored docs pass through); a finite threshold shrinks the
    funnel monotonically and every exported doc scores at or below it."""
    import math

    from pyspark.sql import functions as F

    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.lm_filter import (
        score_perplexity,
        train_bigram_lm,
    )
    from myhadoop_spark.operators.scrub import scrub_text

    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    loose = curate(spark, SF_SMOKE, str(tmp_path / "l"),
                   lm_max_ppl=math.inf)
    assert loose.pop("after_lm_gate") == base["after_quality"]
    assert loose == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "l"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # a real threshold: pick the reference-split median so the gate
    # verifiably bites, then check every exported doc clears it
    clean = (load(spark, SF_SMOKE, "documents")
             .select("doc_id", F.col("text")).withColumn(
                 "text", scrub_text("text")))
    lm = train_bigram_lm(clean.filter(F.col("doc_id") % 20 == 0)
                         .select("text"))
    ppls = sorted(r.ppl for r in score_perplexity(
        clean, lm, broadcast_lm=True).collect())
    cut = ppls[len(ppls) // 2]
    tight = curate(spark, SF_SMOKE, str(tmp_path / "t"), lm_max_ppl=cut)
    assert tight["after_lm_gate"] < tight["after_quality"]
    assert tight["after_decontam"] <= tight["after_lm_gate"]
    exported = spark.read.parquet(str(tmp_path / "t"))
    scored = score_perplexity(
        exported.select("doc_id", "text"), lm, broadcast_lm=True)
    # exported docs were re-cut by decontamination surgery, so re-score
    # the PRE-surgery text: every exported id must have passed the gate
    gate_pass = {r.doc_id for r in score_perplexity(
        clean, lm, broadcast_lm=True)
        .filter(F.col("ppl") <= cut).collect()}
    short = {r.doc_id for r in clean.collect()
             if len([w for w in r.text.split() if w]) < 2}
    for r in exported.select("doc_id").collect():
        assert r.doc_id in gate_pass or r.doc_id in short

def test_compression_gate_knob(spark, tmp_path):
    """compression_band=(0, inf) must be output-identical to the
    default run (empties pass; every ratio is in-band); a real band
    shrinks the funnel monotonically and every exported doc's deflate
    ratio verifiably sits inside it."""
    import math

    from myhadoop_spark.operators.compression import compression_signals

    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    loose = curate(spark, SF_SMOKE, str(tmp_path / "l"),
                   compression_band=(0.0, math.inf))
    assert loose.pop("after_compression_gate") == base["raw"]
    assert loose == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "l"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    band = (0.3, 0.8)
    tight = curate(spark, SF_SMOKE, str(tmp_path / "t"),
                   compression_band=band)
    assert tight["after_compression_gate"] <= tight["raw"]
    assert tight["after_quality"] <= tight["after_compression_gate"]
    # the gate judged the PRE-surgery scrubbed text (decontam surgery
    # later rewrites documents and shifts their ratios — the same
    # re-scoring discipline as the lm test above), so verify the band
    # against the scrubbed originals of the exported ids
    from myhadoop_spark.catalog import load as _load
    from myhadoop_spark.operators.scrub import scrub_text

    exported_ids = spark.read.parquet(str(tmp_path / "t")).select("doc_id")
    gated_text = (_load(spark, SF_SMOKE, "documents")
                  .join(exported_ids, "doc_id")
                  .select("doc_id", scrub_text("text").alias("text")))
    sig = compression_signals(gated_text).collect()
    assert sig, "tight band emptied the export — band not exercised"
    assert all(r.n_bytes == 0
               or band[0] <= r.compression_ratio <= band[1]
               for r in sig)

    # the decontam benchmark must be the doc_id%20 split of the FULL
    # scrubbed corpus — arming the gate must not shrink it (a dropped
    # benchmark doc's verbatim copies would otherwise ship unexcised):
    # no exported doc may contain a verbatim window of ANY benchmark
    # doc, including benchmark docs the gate dropped from the corpus
    from myhadoop_spark.operators.substring import substring_decontam

    bench_all = (_load(spark, SF_SMOKE, "documents")
                 .filter("doc_id % 20 = 0")
                 .select("doc_id", scrub_text("text").alias("text")))
    exported = spark.read.parquet(str(tmp_path / "t")).select(
        "doc_id", "text")
    leaks = substring_decontam(exported, bench_all)
    assert leaks.count() == 0, leaks.limit(5).collect()


def test_dsir_budget_knob(spark, tmp_path):
    """dsir_budget=k exports exactly k target-like survivors (a strict
    subset of the unarmed export), and the selection is deterministic."""
    base = curate(spark, SF_SMOKE, str(tmp_path / "base"))
    k = max(base["after_decontam"] // 2, 1)
    s1 = curate(spark, SF_SMOKE, str(tmp_path / "a"), dsir_budget=k)
    assert s1["after_dsir"] == k
    assert s1["manifest"]["total_rows"] == k
    chosen = {r.doc_id for r in
              spark.read.parquet(str(tmp_path / "a")).collect()}
    everyone = {r.doc_id for r in
                spark.read.parquet(str(tmp_path / "base")).collect()}
    assert chosen < everyone  # strict subset of the unarmed export
    s2 = curate(spark, SF_SMOKE, str(tmp_path / "b"), dsir_budget=k)
    chosen2 = {r.doc_id for r in
               spark.read.parquet(str(tmp_path / "b")).collect()}
    assert chosen2 == chosen
    assert s1["after_decontam"] == base["after_decontam"]  # gates equal


# ----------------------------------------------------------- r12 knobs


def _url_meta(spark, with_spam=True):
    """Deterministic crawl metadata for every fixture doc_id."""
    from myhadoop_spark.catalog import load

    ids = load(spark, SF_SMOKE, "documents").select("doc_id")
    dom = F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string"),
                   F.lit(".com"))
    mark = (F.when((F.col("doc_id") % 11 == 0) & F.lit(with_spam),
                   F.lit("spam-")).otherwise(F.lit("")))
    return ids.select(
        "doc_id", dom.alias("domain"),
        F.concat(F.lit("http://"), dom, F.lit("/"), mark,
                 F.lit("p"), F.col("doc_id").cast("string"))
        .alias("canon_url"))


def test_url_filter_knob(spark, tmp_path):
    """A vacuous url_meta (no blocklist, no keywords) is
    output-identical to the default run; a biting blocklist+keyword
    config drops exactly the predicted ids before any content work."""
    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    loose = curate(spark, SF_SMOKE, str(tmp_path / "l"),
                   url_meta=_url_meta(spark))
    assert loose.pop("after_url_filter") == base["raw"]
    assert loose == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "l"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    blocked = spark.createDataFrame([("d0.com",), ("d3.com",)],
                                    "domain string")
    tight = curate(spark, SF_SMOKE, str(tmp_path / "t"),
                   url_meta=_url_meta(spark), url_blocklist=blocked,
                   url_keywords=(("spam-", 5),), url_threshold=5)
    from myhadoop_spark.catalog import load

    want = {r.doc_id for r in
            load(spark, SF_SMOKE, "documents").select("doc_id").collect()
            if r.doc_id % 7 not in (0, 3) and r.doc_id % 11 != 0}
    assert tight["after_url_filter"] == len(want)
    exported = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "t")).select("doc_id").collect()}
    assert exported <= want

    # guard: blocklist without metadata is a loud error
    import pytest as _pytest
    with _pytest.raises(ValueError, match="url_meta"):
        curate(spark, SF_SMOKE, str(tmp_path / "x"),
               url_blocklist=blocked)


_VACUOUS_CLEAN = dict(min_words_per_line=1,
                      require_terminal_punct=False,
                      line_drop_substrings=(), doc_drop_substrings=(),
                      min_kept_lines=1)


def test_line_clean_knob(spark, tmp_path):
    """Vacuous line rules (every non-empty doc keeps its single
    fixture line verbatim) are export-identical to the default run; a
    min-words rule at the corpus median verifiably bites and every
    exported doc clears it."""
    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.scrub import scrub_text

    clean = (load(spark, SF_SMOKE, "documents")
             .select("doc_id", scrub_text("text").alias("text")))
    wcs = sorted(len([w for w in r.text.split() if w])
                 for r in clean.collect())
    n_nonempty = sum(1 for w in wcs if w >= 1)

    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    loose = curate(spark, SF_SMOKE, str(tmp_path / "l"),
                   line_clean_args=dict(_VACUOUS_CLEAN))
    assert loose.pop("after_line_clean") == n_nonempty
    assert loose == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "l"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    cut = wcs[len(wcs) // 2]  # median word count: the rule must bite
    tight_args = dict(_VACUOUS_CLEAN, min_words_per_line=cut)
    tight = curate(spark, SF_SMOKE, str(tmp_path / "t"),
                   line_clean_args=tight_args)
    assert tight["after_line_clean"] < base["raw"]
    assert tight["after_quality"] <= tight["after_line_clean"]
    exported_ids = spark.read.parquet(str(tmp_path / "t")).select("doc_id")
    short = (clean.join(exported_ids, "doc_id")
             .filter(F.size(F.split("text", r"\s+")) < cut))
    # exported docs were cleaned BEFORE surgery; verify on pre-surgery
    # text: every exported id passed the word-count rule
    passed = {r.doc_id for r in clean.collect()
              if len([w for w in r.text.split() if w]) >= cut}
    assert {r.doc_id for r in exported_ids.collect()} <= passed


def test_line_dedup_knob(spark, tmp_path):
    """Every fixture text is distinct (single-line docs), so
    corpus-wide keep-first line dedup is output-identical to the
    default run — and the stage count proves it looked."""
    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.scrub import scrub_text

    clean = (load(spark, SF_SMOKE, "documents")
             .select("doc_id", scrub_text("text").alias("text")))
    n_nonempty = clean.filter(F.length("text") > 0).count()
    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    armed = curate(spark, SF_SMOKE, str(tmp_path / "a"),
                   line_dedup_lines=True)
    assert armed.pop("after_line_dedup") == n_nonempty
    assert armed == base
    a = spark.read.parquet(str(tmp_path / "d"))
    b = spark.read.parquet(str(tmp_path / "a"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fuzzy_decontam_knob(spark, tmp_path):
    """Arming the MinHash bench near-dup drop removes EXACTLY the
    independently recomputed hit set from the export (hit-ness is a
    per-document property of (doc, bench), so it commutes with the
    other per-doc stages)."""
    from myhadoop_spark.catalog import load
    from myhadoop_spark.operators.scrub import scrub_text
    from myhadoop_spark.queries.dedup import _hashed_token_sets
    from myhadoop_spark.queries.fuzzy_decontam import fuzzy_contaminated

    base = curate(spark, SF_SMOKE, str(tmp_path / "d"))
    armed = curate(spark, SF_SMOKE, str(tmp_path / "a"),
                   fuzzy_bench_decontam=True)
    assert armed["after_fuzzy_decontam"] <= armed["after_dedup"]
    assert armed["after_dedup"] == base["after_dedup"]

    clean = (load(spark, SF_SMOKE, "documents")
             .select("doc_id", scrub_text("text").alias("text")))
    hits = {r.doc_id for r in fuzzy_contaminated(
        spark,
        _hashed_token_sets(spark, "",
                           docs=clean.filter("doc_id % 20 != 0")),
        _hashed_token_sets(spark, "",
                           docs=clean.filter("doc_id % 20 = 0")))
        .select("doc_id").distinct().collect()}
    base_ids = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "d")).select("doc_id").collect()}
    armed_ids = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "a")).select("doc_id").collect()}
    assert armed_ids == base_ids - hits


def test_all_r12_stages_end_to_end(spark, tmp_path):
    """One run arming URL filtering, line cleaning, line dedup, AND
    fuzzy bench decontam together (RefinedWeb order): the funnel is
    monotone through every stage and the export verifies."""
    blocked = spark.createDataFrame([("d0.com",)], "domain string")
    out = str(tmp_path / "all")
    stats = curate(spark, SF_SMOKE, out,
                   url_meta=_url_meta(spark), url_blocklist=blocked,
                   url_keywords=(("spam-", 3),), url_threshold=3,
                   line_clean_args=dict(_VACUOUS_CLEAN,
                                        min_words_per_line=2),
                   line_dedup_lines=True,
                   fuzzy_bench_decontam=True)
    order = ["raw", "after_url_filter", "after_line_clean",
             "after_line_dedup", "after_quality", "after_dedup",
             "after_fuzzy_decontam", "after_decontam"]
    counts = [stats[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert stats["manifest"]["total_rows"] == stats["after_decontam"]
    statuses = {r.status for r in verify_export(spark, out).collect()}
    assert statuses == {"ok"} or stats["after_decontam"] == 0


def test_url_gate_protects_bench_reference(spark, tmp_path):
    """ADVICE r12 (medium): the protected doc_id%20 bench/LM reference
    is captured from the PRE-URL corpus. Blocking every bench doc's
    domain removes them from the corpus FLOW but decontamination must
    still excise their verbatim spans from what ships — before the
    r13 fix the reference slice went empty and tokens_excised was 0."""
    from myhadoop_spark.catalog import load

    ids = load(spark, SF_SMOKE, "documents").select("doc_id")
    n_bench = ids.filter(F.col("doc_id") % 20 == 0).count()
    dom = (F.when(F.col("doc_id") % 20 == 0, F.lit("bench.com"))
           .otherwise(F.lit("ok.com")))
    meta = ids.select(
        "doc_id", dom.alias("domain"),
        F.concat(F.lit("http://"), dom, F.lit("/p"),
                 F.col("doc_id").cast("string")).alias("canon_url"))
    blocked = spark.createDataFrame([("bench.com",)], "domain string")
    s = curate(spark, SF_SMOKE, str(tmp_path / "o"), url_meta=meta,
               url_blocklist=blocked)
    assert s["after_url_filter"] == s["raw"] - n_bench
    # the reference survived the URL drop: bench spans still excised
    assert s["tokens_excised"] > 0


def test_url_missing_knob(spark, tmp_path):
    """ADVICE r12 (low): documents absent from url_meta. Default
    'keep' passes them through (only an explicit rule drop deletes),
    'drop' requires metadata (the old inner-join posture), 'error'
    makes a coverage gap a loud failure."""
    from myhadoop_spark.catalog import load

    ids = load(spark, SF_SMOKE, "documents").select("doc_id")
    n_raw = ids.count()
    covered = ids.filter(F.col("doc_id") % 2 == 0)
    n_cov = covered.count()
    meta = covered.select(
        "doc_id", F.lit("ok.com").alias("domain"),
        F.concat(F.lit("http://ok.com/p"),
                 F.col("doc_id").cast("string")).alias("canon_url"))

    keep = curate(spark, SF_SMOKE, str(tmp_path / "k"), url_meta=meta)
    assert keep["after_url_filter"] == n_raw          # gap passes

    drop = curate(spark, SF_SMOKE, str(tmp_path / "d"), url_meta=meta,
                  url_missing="drop")
    assert drop["after_url_filter"] == n_cov          # gap drops

    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing"):
        curate(spark, SF_SMOKE, str(tmp_path / "e"), url_meta=meta,
               url_missing="error")
    with _pytest.raises(ValueError, match="url_missing"):
        curate(spark, SF_SMOKE, str(tmp_path / "x"), url_meta=meta,
               url_missing="banana")
