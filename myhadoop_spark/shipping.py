"""Ship the myhadoop_spark package to Spark Python workers.

The DataFrame-path queries are pure JVM and need nothing. But the
Python-path operators (the MapReduce-compat RDD API, mapInPandas media
decode) pickle module-level functions/classes by reference, so executor
Python workers must be able to ``import myhadoop_spark``. Locally that
works only when the driver's cwd happens to be the repo root; on a real
cluster it never works by accident. ``ensure_shipped`` zips the package
once per session and registers it via ``sparkContext.addPyFile`` — the
standard mechanism for distributing Python deps to executors.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_PKG_ROOT = Path(__file__).resolve().parent
_SENTINEL = "_myhadoop_spark_shipped"
_STAGING: Path | None = None  # per-process private staging dir (0700)


def _staging_dir() -> Path:
    """Private per-process staging dir. A fixed path in the shared system
    temp dir would let another local user pre-create/replace the zip
    (code injection into executors via addPyFile); mkdtemp gives a fresh
    0700 directory owned by us, cached for the process lifetime."""
    global _STAGING
    if _STAGING is None or not _STAGING.exists():
        _STAGING = Path(tempfile.mkdtemp(prefix="myhadoop_spark_pkg_"))
        # remove on interpreter exit — one leaked dir per process
        # otherwise (pytest runs, bench reps, gate checks all add up)
        atexit.register(shutil.rmtree, str(_STAGING), ignore_errors=True)
    return _STAGING


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SENTINEL, False):
        return
    zip_path = _staging_dir() / "myhadoop_spark_pkg.zip"
    # rebuild if missing or stale vs any source file
    srcs = sorted(_PKG_ROOT.rglob("*.py"))
    newest = max(p.stat().st_mtime for p in srcs)
    if not zip_path.exists() or zip_path.stat().st_mtime < newest:
        tmp = zip_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in srcs:
                zf.write(p, f"myhadoop_spark/{p.relative_to(_PKG_ROOT)}")
        tmp.replace(zip_path)
    sc.addPyFile(str(zip_path))
    setattr(sc, _SENTINEL, True)
