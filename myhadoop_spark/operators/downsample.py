"""LTTB time-series downsampling — Largest-Triangle-Three-Buckets
(Steinarsson 2013), the standard visually-faithful downsampler
(TimescaleDB ships it as `lttb()`): reduce a (ts, value) series to
n_out points that preserve the visual shape — first and last points
kept, and from each of n_out−2 interior buckets the point forming the
largest triangle with the PREVIOUSLY SELECTED point and the next
bucket's centroid.

That previous-selection dependency makes LTTB genuinely sequential
per series — not a window expression — so this is a grouped
``applyInPandas`` (Arrow-batched, one Python call per key), the
sanctioned escape hatch for per-group iterative logic. Scale shape:
each KEY's series must fit one worker (the standard LTTB deployment:
you downsample the ROLLUP, not raw events — compose with
operators/continuous_agg.query_rollup / gapfill, tested), while the
keys themselves distribute; there is exactly one shuffle, on the
series key.

Determinism: pure function of the sorted series (ties broken toward
the earlier point by strict ``>`` comparison); mirrored by an
independently-written reference in tests/test_downsample.py. No SQL
twin — sequential, the documented no-oracle class.

Reference analog: none — §2.3 extension surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _lttb_series(ts: list, vals: list[float], n_out: int):
    """Core LTTB over one already-sorted series; returns index list."""
    n = len(ts)
    if n_out >= n:
        return list(range(n))
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    picked = [0]
    every = (n - 2) / (n_out - 2)
    a = 0
    for i in range(n_out - 2):
        lo = int(i * every) + 1
        hi = min(int((i + 1) * every) + 1, n - 1)
        nxt_lo, nxt_hi = hi, min(int((i + 2) * every) + 1, n)
        if nxt_hi <= nxt_lo:
            nxt_lo, nxt_hi = n - 1, n
        avg_t = sum(float(ts[j]) for j in range(nxt_lo, nxt_hi)) \
            / (nxt_hi - nxt_lo)
        avg_v = sum(vals[j] for j in range(nxt_lo, nxt_hi)) \
            / (nxt_hi - nxt_lo)
        at, av = float(ts[a]), vals[a]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs((at - avg_t) * (vals[j] - av)
                       - (at - float(ts[j])) * (avg_v - av))
            if area > best_area:
                best, best_area = j, area
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def lttb(series: DataFrame, *, n_out: int, key_col: str = "key",
         ts_col: str = "ts", val_col: str = "value") -> DataFrame:
    """Per-key LTTB: every key's series reduced to min(n_out, len)
    points, ordered by ts. Input rows beyond (key, ts, value) are
    dropped; duplicate timestamps are kept as distinct points in ts
    order (tie-broken by value for determinism). ``ts`` may be numeric
    or a timestamp (coerced to epoch-nanos internally; output keeps
    the original type)."""
    import pandas as pd

    schema = series.select(key_col, ts_col, val_col).schema

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, val_col], kind="mergesort")
        ts = pdf[ts_col]
        # timestamp ts columns (what query_rollup emits) coerce to
        # epoch-nanos for the area arithmetic; the RETURNED rows keep
        # their original dtype untouched
        if pd.api.types.is_datetime64_any_dtype(ts):
            ts = ts.astype("int64")
        idx = _lttb_series(list(ts),
                           [float(v) for v in pdf[val_col]], n_out)
        return pdf.iloc[idx]

    return (series.select(key_col, ts_col, val_col)
            .groupBy(key_col).applyInPandas(_one, schema))
