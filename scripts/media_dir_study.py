"""Directory-scale REAL-decode media rehearsal (VERDICT r12 #4).

End to end over actual files on disk — the production ingest shape,
not in-memory payloads: write a deterministic PNG/BMP/PPM corpus
(sources/imagegen.py, near-dup structure planted at the grid level),
ingest via ``read_media_dir`` (binaryFile), decode with
``decode_image_grid(fake=False)`` (pure-Python PPM/BMP/PNG parse),
dhash64, pigeonhole Hamming-ball join, CC keep-one — and record
file/byte counts, per-stage wall, and candidate-pair counts per corpus
size into media_dir_study.tsv.

The scale claims this pins:
  * the binaryFile scan parallelizes by BYTES (maxPartitionBytes), so
    decode tasks stay balanced as the directory grows;
  * candidate pairs grow linearly with planted groups (banded join),
    never quadratically;
  * recovered near-dup groups == planted groups at every size (the
    decode->hash->join->CC chain loses nothing on real files).

Usage: python scripts/media_dir_study.py [out_tsv]
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
from myhadoop_spark.operators.simhash_join import hamming_pairs  # noqa: E402
from myhadoop_spark.session import get_spark  # noqa: E402
from myhadoop_spark.sources.imagegen import (  # noqa: E402
    write_image_corpus,
    write_jpeg_corpus,
)
from myhadoop_spark.sources.multimodal import (  # noqa: E402
    decode_image_grid,
    read_media_dir,
)

SIZES = (64, 256, 1024)
JPEG_SIZES = (64, 256, 1024)
VARIANTS = 4

# codec -> corpus writer: "lossless" mixes PNG/BMP/PPM (byte-exact
# pixels through decode); "jpeg" writes baseline JPEGs of SMOOTH
# bases — the near-dup recovery must survive a genuinely lossy
# round trip, and the decode wall honestly carries the per-bit
# Python Huffman loop (the production plug-in is libjpeg-turbo)
_WRITERS = {"lossless": write_image_corpus, "jpeg": write_jpeg_corpus}


def run_size(spark, n_groups: int, rows: list,
             codec: str = "lossless") -> None:
    tmp = Path(tempfile.mkdtemp(prefix=f"media_dir_{n_groups}_"))
    try:
        t0 = time.time()
        stats = _WRITERS[codec](tmp, n_groups=n_groups,
                                variants=VARIANTS)
        t_gen = time.time() - t0

        t0 = time.time()
        media = read_media_dir(spark, str(tmp))
        hashed = (decode_image_grid(media, fake=False)
                  .select("media_id",
                          dhash64(F.col("grid")).alias("dhash"))
                  .localCheckpoint())      # decode once; join reuses
        n_hashed = hashed.count()
        t_decode = time.time() - t0

        t0 = time.time()
        pairs = hamming_pairs(hashed, bits=64, max_hamming=2,
                              id_col="media_id", sim_col="dhash")
        n_pairs = pairs.count()
        t_pairs = time.time() - t0

        t0 = time.time()
        comp = connected_components(
            pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst")))
        n_components = comp.select("component").distinct().count()
        t_cc = time.time() - t0

        rows.append({
            "codec": codec,
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
    out_tsv = sys.argv[1] if len(sys.argv) > 1 else "media_dir_study.tsv"
    spark = get_spark("media-dir-study", cpus=32)
    rows: list = []
    for n in SIZES:
        run_size(spark, n, rows, codec="lossless")
    for n in JPEG_SIZES:
        run_size(spark, n, rows, codec="jpeg")
    cols = list(rows[0].keys())
    with open(out_tsv, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r[c]) for c in cols) + "\n")
    print(f"wrote {out_tsv}")


if __name__ == "__main__":
    main()
