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
        return doc_scores.crossJoin(F.broadcast(budget))
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
