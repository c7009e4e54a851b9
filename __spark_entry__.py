"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship cell-bucketed PIP join at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
(SURVEY.md §2) with DuckDB oracles over the same parquet tables.

The package ships itself to Spark's Python workers via ``addPyFile``
(the spark-submit --py-files pattern), so the driver may import this
module from any cwd.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession

from pdxbldgimport_spark import registry as Q
from pdxbldgimport_spark.shipping import ship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: assign each geocoded page
    to its containing footprint polygon (cell-bucketed PIP join)."""
    ship(spark)
    return Q.QUERIES["pip_assign"](spark, "/root/testdata/sf0.001")


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
