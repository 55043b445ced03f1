"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are re-exported from the engine's query
registry (dask_spark/queries.py) — one entry per SURVEY.md §2 operator.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dask_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 via the dask_spark API) on sf0.001."""
    fn, _ = REGISTRY["groupby_agg"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in REGISTRY.items() if sql is not None
    }
