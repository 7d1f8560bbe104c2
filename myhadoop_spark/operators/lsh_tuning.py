"""MinHash-LSH band tuning — choose (bands, rows) from a TARGET
Jaccard threshold instead of hand-picking.

With b bands of r rows (b·r = n minhashes), a pair of Jaccard
similarity s collides in some band with probability

    P(s) = 1 − (1 − s^r)^b        (the S-curve)

The classic rule of thumb puts the curve's inflection near
(1/b)^(1/r); this module instead picks the (b, r) divisor pair that
minimizes the exact expected error MASS around the caller's
threshold t:

    err(b, r) = ∫₀ᵗ P(s) ds  +  ∫ₜ¹ (1 − P(s)) ds
                (false-positive mass)  (false-negative mass)

computed in closed-enough form by deterministic composite Simpson
integration (pure driver-side arithmetic — no data touched, no
randomness). Weights let a caller trade precision against recall
(``fn_weight > 1`` punishes missed near-dups harder — usually right
for dedup, where a false positive only costs a verify).

The shipped gate query (queries/dedup.py) keeps its fixed
16 = 4×4 configuration for cross-round comparability; this tuner is
the front door for NEW corpora/thresholds, and the property tests pin
its agreement with the S-curve math (monotonicity, the 4×4 optimum at
its own implied threshold band, and the textbook 0.5 → r≈4 regime for
16 hashes).

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3;
Leskovec/Rajaraman/Ullman, *Mining of Massive Datasets* §3.4 S-curve
analysis).
"""

from __future__ import annotations


def collision_probability(s: float, b: int, r: int) -> float:
    """P(some band collides) for a pair with Jaccard s."""
    return 1.0 - (1.0 - s ** r) ** b


def _simpson(f, lo: float, hi: float, n: int = 200) -> float:
    """Deterministic composite Simpson integral (n even)."""
    if hi <= lo:
        return 0.0
    h = (hi - lo) / n
    acc = f(lo) + f(hi)
    for i in range(1, n):
        acc += f(lo + i * h) * (4 if i % 2 else 2)
    return acc * h / 3.0


def error_mass(threshold: float, b: int, r: int, *,
               fn_weight: float = 1.0) -> float:
    """Expected mis-classification mass of the (b, r) S-curve around
    the threshold: false-positive mass below t plus (weighted)
    false-negative mass above t."""
    fp = _simpson(lambda s: collision_probability(s, b, r),
                  0.0, threshold)
    fn = _simpson(lambda s: 1.0 - collision_probability(s, b, r),
                  threshold, 1.0)
    return fp + fn_weight * fn


def choose_bands(n_hashes: int, threshold: float, *,
                 fn_weight: float = 1.0) -> tuple[int, int]:
    """The (bands, rows) divisor pair of ``n_hashes`` minimizing
    ``error_mass`` at the target threshold. Deterministic; ties break
    toward more bands (higher recall)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    pairs = [(b, n_hashes // b) for b in range(1, n_hashes + 1)
             if n_hashes % b == 0]
    return min(pairs, key=lambda br: (error_mass(threshold, *br,
                                                 fn_weight=fn_weight),
                                      -br[0]))


def implied_threshold(b: int, r: int) -> float:
    """The S-curve's 50%-collision similarity for (b, r) — where
    (1/b)^(1/r) approximates; solved exactly: s where P(s) = 1/2."""
    # (1 - s^r)^b = 1/2  =>  s = (1 - 2^(-1/b))^(1/r)
    return (1.0 - 2.0 ** (-1.0 / b)) ** (1.0 / r)
