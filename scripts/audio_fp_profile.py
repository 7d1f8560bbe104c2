"""audio_fp phase profile (r14, VERDICT r13 item 7).

The most expensive new gate row (3.01 s driver / ~2.3 s this session)
is a 48-row fixture query: cost must be floors, not compute. Split the
invocation into its phases and time each on a warm session:

  build    — construct the 48-row payload frame (no action)
  decode   — decode_audio_grid through mapInPandas, noop-sunk
  hk64     — decode + fingerprint projection, noop-sunk
  full     — the registered query (materialize + orderBy) collected

Also A/B the range-split count (8 vs 2 vs 32) for the decode phase —
the media_phash precedent says Python worker spin-up dominates tiny
fixtures; worker reuse should amortize it on warm reps.

Run: python scripts/audio_fp_profile.py   (prints a phase table)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from myhadoop_spark import registry
from myhadoop_spark.session import get_spark


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from myhadoop_spark.operators.audio_fp import hk64
    from myhadoop_spark.queries.audio import N_AFP
    from myhadoop_spark.sources.multimodal import decode_audio_grid

    spark = get_spark("audio_fp_profile")
    sf = "/root/testdata/sf0.1"

    def mdf(splits: int):
        return spark.range(0, N_AFP, 1, splits).select(
            F.col("id").alias("media_id"),
            F.repeat(F.sha2((F.col("id") / 3).cast("long").cast("string"),
                            256), 4).cast("binary").alias("payload"))

    # warm the session + python workers once
    _noop(decode_audio_grid(mdf(8), frames=9, bands=9, fake=True))

    for rep in range(3):
        rows = []
        for splits in (2, 8, 32):
            g = decode_audio_grid(mdf(splits), frames=9, bands=9, fake=True)
            rows.append((f"decode[{splits} splits]", _noop(g)))
        g8 = decode_audio_grid(mdf(8), frames=9, bands=9, fake=True)
        rows.append(("decode+hk64", _noop(
            g8.select("media_id",
                      hk64(F.col("energies"), frames=9, bands=9)
                      .alias("afp")))))
        t0 = time.time()
        registry.get("audio_fp").fn(spark, sf).collect()
        rows.append(("full query (materialize+sort+collect)",
                     time.time() - t0))
        print(f"--- rep {rep} ---")
        for name, t in rows:
            print(f"{name:42s} {t:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
