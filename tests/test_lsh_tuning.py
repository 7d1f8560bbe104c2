"""LSH band tuning (operators/lsh_tuning.py): S-curve math pinned —
textbook regimes, monotonicity, the shipped 4×4 config recovered at
its own implied threshold, and agreement with a brute numeric
optimum."""

from __future__ import annotations

import pytest

from myhadoop_spark.operators.lsh_tuning import (
    choose_bands,
    collision_probability,
    error_mass,
    implied_threshold,
)


def test_s_curve_basics():
    assert collision_probability(0.0, 4, 4) == 0.0
    assert collision_probability(1.0, 4, 4) == 1.0
    # monotone in s
    ps = [collision_probability(s / 20, 4, 4) for s in range(21)]
    assert ps == sorted(ps)
    # P at the implied threshold is exactly 1/2
    t = implied_threshold(4, 4)
    assert abs(collision_probability(t, 4, 4) - 0.5) < 1e-12


def test_textbook_regimes():
    # low threshold → many bands / short rows (catch weak similarity);
    # high threshold → few bands / long rows (only near-identical)
    b_low, r_low = choose_bands(16, 0.2)
    b_high, r_high = choose_bands(16, 0.9)
    assert b_low > b_high and r_low < r_high
    assert b_low * r_low == 16 and b_high * r_high == 16
    # the shipped 4x4 gate config is optimal at its own implied
    # threshold — the tuner and the hand-pick agree where they should
    t44 = implied_threshold(4, 4)
    assert choose_bands(16, t44) == (4, 4)


def test_matches_brute_numeric_optimum():
    for n, t in [(16, 0.5), (64, 0.7), (128, 0.85), (24, 0.4)]:
        got = choose_bands(n, t)
        pairs = [(b, n // b) for b in range(1, n + 1) if n % b == 0]
        best = min(pairs, key=lambda br: error_mass(t, *br))
        assert error_mass(t, *got) <= error_mass(t, *best) + 1e-12
        assert got[0] * got[1] == n


def test_fn_weight_shifts_toward_recall():
    """Punishing false negatives harder can only move the choice
    toward MORE bands (never fewer)."""
    for n, t in [(64, 0.7), (128, 0.8)]:
        b1, _ = choose_bands(n, t, fn_weight=1.0)
        b5, _ = choose_bands(n, t, fn_weight=5.0)
        assert b5 >= b1


def test_bad_threshold_raises():
    with pytest.raises(ValueError):
        choose_bands(16, 0.0)
    with pytest.raises(ValueError):
        choose_bands(16, 1.0)
