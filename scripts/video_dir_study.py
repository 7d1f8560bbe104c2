"""Directory-scale REAL-decode video rehearsal (r13 — the video twin
of media_dir_study.py / audio_dir_study.py).

End to end over actual files on disk — the production ingest shape:
write a deterministic animated-GIF corpus (sources/videogen.py, real
LZW compression, near-dup structure planted as one perturbed grid box
in ONE frame per variant), ingest via ``read_media_dir`` (binaryFile),
decode with ``decode_video_grids(fake=False)`` (pure-Python GIF/LZW
parse, one row per sampled frame), dhash64 per frame, the positional
frame-match join (min_shared of max_hamming-close aligned positions),
CC keep-one — and record file/byte counts, per-stage wall, and matched
pair counts per corpus size into video_dir_study.tsv.

The scale claims this pins:
  * the row-expanding decode (frames per payload) stays executor-side
    and bounded by max_frames;
  * matched pairs grow linearly with planted groups (pigeonhole
    blocks with frame_idx in the join key), never quadratically;
  * recovered near-dup groups == planted groups at every size.

Usage: python scripts/video_dir_study.py [out_tsv]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from myhadoop_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from myhadoop_spark.operators.phash import dhash64  # noqa: E402
from myhadoop_spark.operators.video_fp import (  # noqa: E402
    frame_match_pairs,
)
from myhadoop_spark.session import get_spark  # noqa: E402
from myhadoop_spark.sources.multimodal import (  # noqa: E402
    decode_video_grids,
    read_media_dir,
)
from myhadoop_spark.sources.videogen import (  # noqa: E402
    write_video_corpus,
)

SIZES = (64, 256, 1024)
VARIANTS = 4


def run_size(spark, n_groups: int, rows: list) -> None:
    tmp = Path(tempfile.mkdtemp(prefix=f"video_dir_{n_groups}_"))
    try:
        t0 = time.time()
        stats = write_video_corpus(tmp, n_groups=n_groups,
                                   variants=VARIANTS)
        t_gen = time.time() - t0

        t0 = time.time()
        media = read_media_dir(spark, str(tmp), glob="*.gif",
                               kind="video")
        hashed = (decode_video_grids(media, fake=False)
                  .select("media_id", "frame_idx",
                          dhash64(F.col("grid")).alias("fhash"))
                  .localCheckpoint())      # decode once; join reuses
        n_frames = hashed.count()
        t_decode = time.time() - t0

        t0 = time.time()
        pairs = frame_match_pairs(hashed, bits=64, max_hamming=2,
                                  min_shared=3)
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
            "frame_rows": n_frames,
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
    out_tsv = sys.argv[1] if len(sys.argv) > 1 else "video_dir_study.tsv"
    spark = get_spark("video-dir-study", cpus=32)
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
