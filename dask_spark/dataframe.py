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
from dask_spark.operators.groupby import Aggregation  # noqa: F401
from dask_spark.operators.joins import merge, merge_asof  # noqa: F401
from dask_spark.sources import (  # noqa: F401
    from_delayed,
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

def get_dummies(frame, column, prefix=None, values=None,
                max_categories: int = 1024):
    """Module-level get_dummies (reference dask.dataframe.get_dummies)."""
    return frame.get_dummies(column, prefix, values, max_categories)


def pivot_table(frame, index, columns, values, aggfunc: str = "mean"):
    """Module-level pivot_table (reference dask.dataframe.pivot_table)."""
    return frame.pivot_table(index=index, columns=columns, values=values,
                             aggfunc=aggfunc)


def melt(frame, id_vars, value_vars, var_name: str = "variable",
         value_name: str = "value"):
    """Module-level melt (reference dask.dataframe.melt)."""
    return frame.melt(id_vars=id_vars, value_vars=value_vars,
                      var_name=var_name, value_name=value_name)


def isna(obj):
    """Module-level isna (reference dask.dataframe.isna)."""
    return obj.isna()


__all__ = [
    "DataFrame", "Series", "Aggregation", "concat", "sql", "to_datetime", "to_numeric",
    "to_timedelta", "merge", "merge_asof", "from_delayed", "from_dict", "from_pandas",
    "read_avro", "read_csv", "read_fwf", "read_hdf", "read_json",
    "read_orc", "read_parquet", "read_sql_table", "get_dummies", "pivot_table", "melt", "isna",
]
