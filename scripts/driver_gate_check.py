"""Emulate the driver's correctness gate locally.

Runs every registered query on Spark AND its DuckDB oracle, then
canonicalizes BOTH through pandas the way the driver does (columns
sorted by name, rows sorted by all columns, value-hash compare) — this
catches the failure classes the tuple-based local harness cannot:
unhashable array cells, dtype mismatches (int64 vs float64), and
rendering drift.

Usage: python scripts/driver_gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.oracle import duck_connection
from myhadoop_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize timestamp resolution (Spark→ns, DuckDB→us); the real
        # driver's canonicalizer is unit-insensitive too (r1 evidence:
        # sessionize/asof hash-matched with timestamp columns)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("driver-gate-check")
    con = duck_connection(sf_dir)
    failures = []
    for name in registry.names():
        q = registry.get(name)
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} SPARK-ERROR {exc}")
            continue
        if q.oracle is None:
            print(f"{name:24s} rows-only    rows={len(sdf)}  "
                  f"{time.time() - t0:5.1f}s")
            continue
        try:
            ddf = con.execute(q.oracle).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ORACLE-ERROR {exc}")
            continue
        try:
            s, d = canon(sdf), canon(ddf)
            rows = len(s) == len(d)
            schema = list(s.columns) == list(d.columns)
            hs = pd.util.hash_pandas_object(s, index=False).sum()
            hd = pd.util.hash_pandas_object(d, index=False).sum()
            ok = rows and schema and hs == hd
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} CANON-ERROR  {exc}")
            continue
        status = "pass" if ok else "FAIL"
        if not ok:
            failures.append(name)
        detail = ""
        if not rows:
            detail = f"rows spark={len(s)} oracle={len(d)}"
        elif not schema:
            detail = f"cols spark={list(s.columns)} oracle={list(d.columns)}"
        elif not ok:
            neq = (s != d) & ~(s.isna() & d.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            detail = f"value drift in {bad_cols[:4]}"
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                detail += f" [{c}: {s[c][i]!r} vs {d[c][i]!r}]"
        print(f"{name:24s} {status}  rows={len(sdf)}  "
              f"{time.time() - t0:5.1f}s  {detail}")
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
