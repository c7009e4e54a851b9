"""Package shipping: make ``pdxbldgimport_spark`` importable on Spark
Python workers regardless of the driver's cwd.

This is the local-mode equivalent of ``spark-submit --py-files
engine.zip`` (north_rule): the package is zipped once per process and
registered via ``SparkContext.addPyFile``, so pickled UDF closures
resolve on executors. Idempotent per (session, zip).
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from .session import session_token

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_PKG_DIR)
_ZIP_PATH: str | None = None
_SHIPPED: set = set()


def ensure_repo_on_path() -> None:
    if _REPO_DIR not in sys.path:
        sys.path.insert(0, _REPO_DIR)


def package_zip() -> str:
    """Zip the package once per process (deterministic layout)."""
    global _ZIP_PATH
    if _ZIP_PATH and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    fd, path = tempfile.mkstemp(prefix="pdxbldgimport_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, _REPO_DIR)
                zf.write(full, rel)
    _ZIP_PATH = path
    return path


def ship(spark) -> None:
    """Register the package zip with the session's SparkContext."""
    key = session_token(spark)
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(package_zip())
    _SHIPPED.add(key)
