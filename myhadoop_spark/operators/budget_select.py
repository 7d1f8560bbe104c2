"""Budgeted quality selection — the FineWeb-Edu-shaped curation
stage: given per-document integer quality scores and token counts,
keep the HIGHEST-scoring documents (ties to the smallest id) until a
global token budget fills. The greedy score-order prefix is the
published recipe for "train on the best N tokens".

Semantics (deterministic, engine-exact): order documents by
(score DESC, id ASC); keep a document while the total tokens BEFORE
it in that order are under the budget — so a budget ≥ the corpus
keeps everything, a zero budget keeps nothing, and the one straddling
document is included iff its predecessors leave room (the unimax
rule).

Physical plan (the scale path — the domain_cap banded idiom
re-applied to a VALUE order): fixed-width score bands are monotone in
the (−score) order, so per-band token sums (one partial-agg shuffle
of ≤ bands + 1 rows) prefix-summed over that BOUNDED table decide
whole bands at once:

    _boff + _bsum ≤ budget   →  keep the ENTIRE band, no sort;
    _boff ≥ budget           →  drop the band before any shuffle;
    the ONE straddling band  →  a cumulative window over just its
                                rows finds the cut.

So the only sort the plan performs is the boundary band (~n/bands
rows under dispersed scores). All sums are integer, hence
bitwise-equal to the window spec under any banding (pinned in
tests/test_budget_select.py). Score min/max and the budget ride as
1-row broadcast stats tables (never collected).

Degeneracy (measured, scripts/budget_select_study.py): value bands
cannot split a POINT MASS — if one score value holds most of the
corpus and the budget lands inside it, the boundary band is that tie
and its sort is tie-sized. No fixed-width banding of any salted key
fixes this (a salt multiplies the range as much as the spread). When
tie order may be arbitrary, quantize the scores into a `lang`-like
label and select within the boundary label with the hash-prefix
operator (operators/unimax.py), whose hash bands split ties by
construction.

Reference analog: none — §2.3 extension surface (curation family,
beside operators/unimax.py and url_dedup.py::domain_cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fraction_budget(doc_tokens: DataFrame, num: int, den: int,
                    *, tokens_col: str = "n_tokens") -> DataFrame:
    """1-row (budget) table: floor(total_tokens * num / den),
    computed in-plan — an exact integer rational of the corpus size,
    never a driver-side float."""
    if int(den) < 1 or int(num) < 0:
        raise ValueError(f"budget fraction must be a non-negative "
                         f"rational, got {num}/{den}")
    return doc_tokens.agg(F.expr(
        f"CAST((sum({tokens_col}) * {int(num)}) div {int(den)} "
        f"AS BIGINT)").alias("budget"))


def _with_budget(doc_scores: DataFrame,
                 budget: int | DataFrame) -> DataFrame:
    if isinstance(budget, DataFrame):
        # enforce the 1-row contract IN-PLAN (a driver-side count of a
        # fraction_budget table would scan the corpus twice): aggregate
        # to one row and fail loudly at execution time on 0 or >1 rows
        # — a multi-row budget must never silently duplicate every
        # document through the crossJoin. assert_true is folded into
        # the budget value so column pruning cannot drop it.
        checked = (budget.agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("budget").cast("long").alias("_b"))
            .select(F.when(
                F.assert_true(
                    F.col("_n") == F.lit(1),
                    F.lit("budget must be a 1-row (budget) table; "
                          "got a different row count")).isNull(),
                F.col("_b")).alias("budget")))
        return doc_scores.crossJoin(F.broadcast(checked))
    if int(budget) < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    return doc_scores.withColumn("budget",
                                 F.lit(int(budget)).cast("long"))


def budget_select_window(doc_scores: DataFrame,
                         budget: int | DataFrame, *,
                         id_col: str = "doc_id") -> DataFrame:
    """Spec twin: ONE global cumulative window ordered by
    (score DESC, id) — a single-reducer total sort, kept as the
    bitwise parity pin and the oracle's formulation. Do not call on
    corpus-scale data."""
    w = (Window.orderBy(F.col("score").desc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    return (_with_budget(doc_scores, budget)
            .withColumn("_before",
                        F.coalesce(F.sum("n_tokens").over(w),
                                   F.lit(0).cast("long")))
            .filter(F.col("_before") < F.col("budget"))
            .select(id_col, "score", "n_tokens"))


def budget_select(doc_scores: DataFrame, budget: int | DataFrame, *,
                  bands: int = 32, id_col: str = "doc_id") -> DataFrame:
    """The banded scale path — see module docstring. ``doc_scores``
    carries (id, score BIGINT, n_tokens BIGINT); ``budget`` is an int
    or a 1-row (budget) table (fraction_budget). Returns the kept
    (id, score, n_tokens)."""
    if bands < 1:
        raise ValueError("bands must be >= 1")
    stats = doc_scores.agg(F.min("score").cast("long").alias("_smin"),
                           F.max("score").cast("long").alias("_smax"))
    dt = (_with_budget(doc_scores, budget)
          .crossJoin(F.broadcast(stats))
          .withColumn("_ns", -F.col("score").cast("long"))
          # integer band width/index: _ns + _smax ∈ [0, _smax − _smin],
          # width = (range div bands) + 1 ⇒ ≤ bands + 1 bands, and the
          # band index is monotone in _ns (hence in score-desc order)
          .withColumn("_wint",
                      F.expr(f"((_smax - _smin) div {int(bands)}) + 1"))
          .withColumn("_band", F.expr("(_ns + _smax) div _wint"))
          .drop("_smin", "_smax", "_wint"))
    # bounded: ≤ bands + 1 rows; the window below runs over this
    # table, not the corpus (partitioned on the constant budget column
    # only to keep WindowExec's single-partition warning out of logs)
    wb = (Window.partitionBy("budget").orderBy("_band")
          .rowsBetween(Window.unboundedPreceding, -1))
    band_offsets = (dt.groupBy("_band", "budget")
                    .agg(F.sum("n_tokens").alias("_bsum"))
                    .withColumn("_boff",
                                F.coalesce(F.sum("_bsum").over(wb),
                                           F.lit(0).cast("long")))
                    .filter(F.col("_boff") < F.col("budget"))
                    .withColumn("_whole",
                                F.col("_boff") + F.col("_bsum")
                                <= F.col("budget"))
                    .select("_band", "_boff", "_whole"))
    surviving = dt.join(F.broadcast(band_offsets), "_band")
    whole = surviving.filter(F.col("_whole"))
    # exactly one band can straddle the budget (prefix sums are
    # monotone) — only ITS rows pay the sort
    ww = (Window.partitionBy("_band")
          .orderBy("_ns", id_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    boundary = (surviving.filter(~F.col("_whole"))
                .withColumn("_before",
                            F.col("_boff")
                            + F.coalesce(F.sum("n_tokens").over(ww),
                                         F.lit(0).cast("long")))
                .filter(F.col("_before") < F.col("budget"))
                .drop("_before"))
    return whole.unionByName(boundary).select(id_col, "score",
                                              "n_tokens")


def quantized_budget_select(doc_scores: DataFrame,
                            budget: int | DataFrame, *, q: int,
                            bands: int = 32,
                            id_col: str = "doc_id") -> DataFrame:
    """The point-mass remedy (see the module docstring's degeneracy
    note), now first-class: scores are QUANTIZED into coarse labels
    (label = (−score) div q, so label order refines score-desc
    order), whole labels above the budget boundary keep without any
    sort, and the ONE boundary label — which may be a massive tie —
    selects its remainder by the unimax HASH prefix (md5-rank order),
    whose hash-range bands split ties by construction.

    Semantics change vs ``budget_select`` (documented, deliberate):
    within the boundary label, selection order is (md5 rank, id) —
    "a fair random draw among the tied quality level" (the
    FineWeb-Edu integer-score shape) — instead of (score, id). Above
    the boundary, every document keeps regardless, so the coarser q
    is, the more the draw decides. All arithmetic is integer/md5 —
    bitwise against the single-window spec (the oracle's
    formulation). Returns (id, score, n_tokens)."""
    from myhadoop_spark.operators.unimax import unimax_select

    if int(q) < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    if int(bands) < 1:
        raise ValueError("bands must be >= 1")
    # shift (−score) non-negative BEFORE the div: truncating and
    # flooring integer division disagree below zero and engines
    # differ — a non-negative numerator sidesteps the whole question
    stats = doc_scores.agg(F.max("score").cast("long").alias("_smax"))
    d = (_with_budget(doc_scores, budget)
         .crossJoin(F.broadcast(stats))
         .withColumn("_lab", F.expr(f"(_smax - score) div {int(q)}"))
         .drop("_smax"))
    # label offsets: bounded by (score range / q) — q is CHOSEN to
    # make labels few (the quantization contract)
    wl = (Window.partitionBy("budget").orderBy("_lab")
          .rowsBetween(Window.unboundedPreceding, -1))
    offs = (d.groupBy("_lab", "budget")
            .agg(F.sum("n_tokens").alias("_lsum"))
            .withColumn("_loff",
                        F.coalesce(F.sum("_lsum").over(wl),
                                   F.lit(0).cast("long")))
            .filter(F.col("_loff") < F.col("budget"))
            .withColumn("_whole",
                        F.col("_loff") + F.col("_lsum")
                        <= F.col("budget"))
            .select("_lab", "_loff", "_whole"))
    surviving = d.join(F.broadcast(offs), "_lab")
    whole = (surviving.filter(F.col("_whole"))
             .select(id_col, "score", "n_tokens"))
    # the single boundary label selects its remainder by hash prefix —
    # the unimax selection with one "language" (= the label), whose
    # banding bounds the tie's max single-task sort at ~n/bands
    bdocs = surviving.filter(~F.col("_whole"))
    alloc = (bdocs.groupBy(F.col("_lab").alias("lang"))
             .agg((F.first("budget") - F.first("_loff"))
                  .cast("long").alias("alloc")))
    sel = unimax_select(
        bdocs.select(F.col("_lab").alias("lang"),
                     F.col(id_col).alias("doc_id"), "n_tokens"),
        alloc, bands=bands)
    boundary = (sel.select(F.col("doc_id").alias(id_col), "n_tokens")
                .join(bdocs.select(id_col, "score"), id_col)
                .select(id_col, "score", "n_tokens"))
    return whole.unionByName(boundary)
