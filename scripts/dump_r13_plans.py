"""Dump plans/r13/<query>_after.txt evidence files: the query's
explain('formatted') at sf0.1 INCLUDING the subplan of every frame the
query materializes via localCheckpoint along the way (materialization
truncates the final frame's visible plan to the post-checkpoint tail,
so the computation's plan shape lives in the captured subplans).

Usage: python scripts/dump_r13_plans.py <query> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from myhadoop_spark import registry
from myhadoop_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r13"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    try:  # Spark 4: concrete instances are the classic subclass
        import pyspark.sql.classic.dataframe as dfmod
    except ImportError:  # pragma: no cover — Spark 3 layout
        import pyspark.sql.dataframe as dfmod

    spark = get_spark("dump_r13_plans")
    for name in sys.argv[1:]:
        plans: list[str] = []
        orig = dfmod.DataFrame.localCheckpoint

        def capture(self, *a, **k):
            plans.append(_explain(self))
            return orig(self, *a, **k)

        dfmod.DataFrame.localCheckpoint = capture
        try:
            df = registry.get(name).fn(spark, SF_DIR)
        finally:
            dfmod.DataFrame.localCheckpoint = orig
        parts = [f"# {name} — explain('formatted') at sf0.1, after r13 "
                 "optimization\n# (materialized-intermediate subplans "
                 "captured at each localCheckpoint, then the final frame)\n"]
        for i, p in enumerate(plans):
            parts.append(f"\n## materialized intermediate {i + 1}\n{p}")
        parts.append(f"\n## final frame\n{_explain(df)}")
        out = OUT / f"{name}_after.txt"
        out.write_text("".join(parts))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
