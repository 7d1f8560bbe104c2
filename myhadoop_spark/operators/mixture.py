"""Mixture sampling — hit per-source token-composition targets.

Training corpora are mixed to target ratios (so much web, so much code,
so much reference text) by TOKENS, not documents. Given target weights
per source, this operator computes per-source acceptance rates against
the actual token inventory and takes a deterministic hash-based sample
whose token composition matches the targets.

Distributed shape: one tiny aggregation (per-source token totals —
rows bounded by the number of sources, the one sanctioned driver-side
collect) followed by a narrow filter; no shuffle of the data itself,
repartition-invariant by construction (acceptance depends only on
doc_id hash). Down-sampling only: a source whose inventory cannot fill
its target share caps the feasible budget (reported, never silently
upsampled — repeating documents is an epoch decision for the trainer,
not a sampling-time side effect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000  # acceptance-hash resolution


def plan_mixture(df: DataFrame, weights: dict[str, float],
                 source_col: str = "source", tokens_col: str = "tokens",
                 token_budget: int | None = None) -> dict[str, dict]:
    """Per-source sampling plan: actual token inventory, target share,
    and acceptance rate. The feasible budget is min_s(T_s / w_s) —
    the largest total for which every source can fill its share without
    upsampling — optionally capped by token_budget."""
    if not weights:
        raise ValueError("weights must be non-empty")
    bad = [s for s, w in weights.items() if w <= 0]
    if bad:
        raise ValueError(f"non-positive weights for {bad}")
    total_w = sum(weights.values())
    norm = {s: w / total_w for s, w in weights.items()}
    inv = {r[source_col]: r["t"] for r in
           (df.filter(F.col(source_col).isin(list(weights)))
            .groupBy(source_col)
            .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
            .collect())}
    missing = sorted(set(weights) - set(inv))
    if missing:
        raise ValueError(f"sources absent from the data: {missing}")
    feasible = min(inv[s] / norm[s] for s in norm)
    budget = min(feasible, token_budget) if token_budget else feasible
    return {
        s: {"tokens": inv[s], "target_share": norm[s],
            "target_tokens": norm[s] * budget,
            "rate": min(1.0, (norm[s] * budget) / inv[s])}
        for s in norm
    }


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", tokens_col: str = "tokens",
                   id_col: str = "doc_id",
                   token_budget: int | None = None) -> DataFrame:
    """Deterministic token-weighted mixture sample. Rows from sources not
    in `weights` are dropped; within each source, a document is kept iff
    its id-hash falls under the source's acceptance rate — stable across
    reruns and repartitioning, and nested samples for nested budgets
    (a smaller budget's sample is a subset of a larger one's)."""
    plan = plan_mixture(df, weights, source_col, tokens_col, token_budget)
    rate = F.lit(None).cast("double")
    for s, p in plan.items():
        rate = F.when(F.col(source_col) == s, F.lit(p["rate"])).otherwise(rate)
    # pmod, NOT abs-then-%: abs(Integer.MIN_VALUE) overflows negative,
    # which would make u negative and keep those docs unconditionally
    u = F.pmod(F.hash(F.col(id_col).cast("string"), F.lit("mixture")),
               F.lit(_DENOM)) / _DENOM
    return (df.filter(F.col(source_col).isin(list(weights)))
            .withColumn("_rate", rate)
            .filter(u < F.col("_rate"))
            .drop("_rate"))


def achieved_mixture(df: DataFrame, source_col: str = "source",
                     tokens_col: str = "tokens") -> dict[str, float]:
    """Realized token shares of a (sampled) corpus — the verification
    counterpart of plan_mixture."""
    rows = (df.groupBy(source_col)
            .agg(F.sum(F.col(tokens_col).cast("long")).alias("t"))
            .collect())
    total = sum(r["t"] for r in rows) or 1
    return {r[source_col]: r["t"] / total for r in rows}
