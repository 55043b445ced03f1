"""``dask.dataframe``-shaped namespace (reference: dask/dataframe/
__init__.py public surface): lets reference users keep their import
line — ``import dask_spark.dataframe as dd`` — and call the same
module-level constructors and tools they call on dask today. Pure
re-exports; every function is the engine's own operator."""

from __future__ import annotations

from dask_spark.frame import (  # noqa: F401
    DaskFrame as DataFrame,
    Series,
    concat,
    sql,
    to_datetime,
    to_numeric,
    to_timedelta,
)
from dask_spark.operators.joins import merge, merge_asof  # noqa: F401
from dask_spark.sources import (  # noqa: F401
    from_dict,
    from_pandas,
    read_avro,
    read_csv,
    read_fwf,
    read_hdf,
    read_json,
    read_orc,
    read_parquet,
    read_sql_table,
)

__all__ = [
    "DataFrame", "Series", "concat", "sql", "to_datetime", "to_numeric",
    "to_timedelta", "merge", "merge_asof", "from_dict", "from_pandas",
    "read_avro", "read_csv", "read_fwf", "read_hdf", "read_json",
    "read_orc", "read_parquet", "read_sql_table",
]
