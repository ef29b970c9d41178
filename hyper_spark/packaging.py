"""Cluster packaging: make ``hyper_spark`` importable on executors.

On a real cluster the supported path is
``spark-submit --py-files hyper_spark.zip job.py`` (see Makefile ``dist``
target). For driver-spawned sessions (notebooks, tests, bench) where the
package directory only exists on the driver, ``distribute(spark)`` zips
the package and ships it via ``SparkContext.addPyFile`` — without this,
executor-side unpickling of the pandas-UDF stages raises
``ModuleNotFoundError: hyper_spark`` (observed, not hypothetical).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

__all__ = ["build_zip", "distribute"]

_PKG_ROOT = Path(__file__).resolve().parent


def build_zip(dest: str | None = None) -> str:
    """Zip the hyper_spark package (sources + data files) for --py-files."""
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "hyper_spark.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(_PKG_ROOT.rglob("*")):
            if path.suffix in {".py", ".json"} and "__pycache__" not in path.parts:
                zf.write(path, Path("hyper_spark") / path.relative_to(_PKG_ROOT))
    return dest


def distribute(spark: SparkSession, dest: str | None = None) -> str:
    """Ship the package to executors of an already-running session."""
    zip_path = build_zip(dest)
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
