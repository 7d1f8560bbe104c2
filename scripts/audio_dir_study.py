"""Directory-scale REAL-decode audio rehearsal (r13 — the audio twin
of media_dir_study.py).

End to end over actual files on disk — the production ingest shape,
not in-memory payloads: write a deterministic 16-bit PCM WAV corpus
(sources/audiogen.py, near-dup structure planted as a per-frame DC
offset, provably <= 2 Haitsma–Kalker bits), ingest via
``read_media_dir`` (binaryFile), decode with
``decode_audio_grid(fake=False)`` (pure-Python RIFF parse + rfft band
energies), hk64, pigeonhole Hamming-ball join, CC keep-one — and
record file/byte counts, per-stage wall, and candidate-pair counts per
corpus size into audio_dir_study.tsv.

The scale claims this pins:
  * the binaryFile scan parallelizes by BYTES (maxPartitionBytes), so
    decode tasks stay balanced as the directory grows;
  * candidate pairs grow linearly with planted groups (banded join),
    never quadratically;
  * recovered near-dup groups == planted groups at every size (the
    decode->fingerprint->join->CC chain loses nothing on real files).

Usage: python scripts/audio_dir_study.py [out_tsv]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from myhadoop_spark.operators.audio_fp import hk64  # noqa: E402
from myhadoop_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from myhadoop_spark.operators.simhash_join import hamming_pairs  # noqa: E402
from myhadoop_spark.session import get_spark  # noqa: E402
from myhadoop_spark.sources.audiogen import write_audio_corpus  # noqa: E402
from myhadoop_spark.sources.multimodal import (  # noqa: E402
    decode_audio_grid,
    read_media_dir,
)

SIZES = (64, 256, 1024)
VARIANTS = 4


def run_size(spark, n_groups: int, rows: list) -> None:
    tmp = Path(tempfile.mkdtemp(prefix=f"audio_dir_{n_groups}_"))
    try:
        t0 = time.time()
        stats = write_audio_corpus(tmp, n_groups=n_groups,
                                   variants=VARIANTS)
        t_gen = time.time() - t0

        t0 = time.time()
        media = read_media_dir(spark, str(tmp), glob="*.wav",
                               kind="audio")
        hashed = (decode_audio_grid(media, fake=False)
                  .select("media_id",
                          hk64(F.col("energies")).alias("afp"))
                  .localCheckpoint())      # decode once; join reuses
        n_hashed = hashed.count()
        t_decode = time.time() - t0

        t0 = time.time()
        pairs = hamming_pairs(hashed, bits=64, max_hamming=4,
                              id_col="media_id", sim_col="afp")
        n_pairs = pairs.count()
        t_pairs = time.time() - t0

        t0 = time.time()
        comp = connected_components(
            pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst")))
        n_components = comp.select("component").distinct().count()
        t_cc = time.time() - t0

        rows.append({
            "n_groups": n_groups,
            "files": stats["files"],
            "bytes": stats["bytes"],
            "hashed": n_hashed,
            "pairs": n_pairs,
            "components": n_components,
            "gen_s": round(t_gen, 2),
            "decode_s": round(t_decode, 2),
            "pairs_s": round(t_pairs, 2),
            "cc_s": round(t_cc, 2),
        })
        print(rows[-1], flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    out_tsv = sys.argv[1] if len(sys.argv) > 1 else "audio_dir_study.tsv"
    spark = get_spark("audio-dir-study", cpus=32)
    rows: list = []
    for n in SIZES:
        run_size(spark, n, rows)
    cols = list(rows[0].keys())
    with open(out_tsv, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r[c]) for c in cols) + "\n")
    print(f"wrote {out_tsv}")


if __name__ == "__main__":
    main()
