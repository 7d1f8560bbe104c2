"""Measure the DuckDB-oracle wall time for every query at a given SF —
the local baseline (BASELINE.md B2) the engine's bench must stay within
2× of (and ideally beat). Writes BASELINE_LOCAL.json at the repo root.

Usage: python scripts/baseline.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.oracle import duck_connection


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    con = duck_connection(sf_dir)
    con.execute("SET threads TO 32")
    out: dict[str, float] = {}
    for name, sql in registry.all_oracles().items():
        times = []
        for _ in range(reps):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        out[name] = round(statistics.median(times), 4)
        print(f"{name}: {out[name]}s")
    result = {"engine": "duckdb", "threads": 32, "sf_dir": sf_dir,
              "reps": reps, "total": round(sum(out.values()), 4),
              "queries": out}
    Path("BASELINE_LOCAL.json").write_text(json.dumps(result, indent=1))
    print(json.dumps({"total": result["total"]}))


if __name__ == "__main__":
    main()
