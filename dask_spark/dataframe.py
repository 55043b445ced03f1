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
                max_categories: int = 1024, **kw):
    """Module-level get_dummies (reference dask.dataframe.get_dummies);
    full pandas kwarg depth passes through (prefix_sep/dummy_na/
    drop_first/dtype/columns)."""
    return frame.get_dummies(column, prefix, values, max_categories, **kw)


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


from dask_spark.delayed import compute  # noqa: F401,E402
from dask_spark.sources import (  # noqa: F401,E402
    from_array,
    from_dask_array,
    from_map,
    read_sql,
    read_sql_query,
    timeseries,
)

# dask's Index is a positional-label Series; the engine has no implicit
# row order, so the Series type IS the closest collection (documented
# import-parity alias, like Scalar below)
Index = Series


class Scalar:  # noqa: D401 - import-parity shim
    """dask.dataframe.Scalar parity: the engine returns plain Python
    scalars from reductions (compute() on a 1×1 frame), so this class
    exists for isinstance-style imports only."""


class _Demo:
    """dask.dataframe.demo namespace (make_timeseries)."""

    @staticmethod
    def make_timeseries(start="2026-01-01", end="2026-01-02",
                        freq_seconds: int = 1, seed: int = 42):
        return timeseries(start, end, freq_seconds, seed)


demo = _Demo()


def map_partitions(func, frame, **kw):
    """Module-level map_partitions (reference dask.dataframe
    map_partitions)."""
    return frame.map_partitions(func, **kw)


def map_overlap(func, frame, before: int, after: int, **kw):
    """Module-level map_overlap (reference dask.dataframe
    map_overlap)."""
    return frame.map_overlap(func, before=before, after=after, **kw)


def repartition(frame, npartitions: int):
    return frame.repartition(npartitions)


def to_parquet(frame, path, **kw):
    return frame.to_parquet(path, **kw)


def to_csv(frame, path, **kw):
    return frame.to_csv(path, **kw)


def to_json(frame, path, **kw):
    return frame.to_json(path, **kw)


def to_orc(frame, path, **kw):
    return frame.to_orc(path, **kw)


def to_records(frame):
    return frame.to_records()


def to_bag(frame, format: str = "tuple"):
    return frame.to_bag(format)


def to_sql(frame, table: str, url: str, **kw):
    return frame.to_sql(table, url, **kw)


__all__ = [
    "DataFrame", "Series", "Index", "Scalar", "Aggregation", "concat",
    "compute", "sql", "to_datetime", "to_numeric",
    "to_timedelta", "merge", "merge_asof", "from_array", "from_dask_array",
    "from_delayed", "from_dict", "from_map", "from_pandas",
    "read_avro", "read_csv", "read_fwf", "read_hdf", "read_json",
    "read_orc", "read_parquet", "read_sql", "read_sql_query",
    "read_sql_table", "get_dummies", "pivot_table", "melt", "isna",
    "demo", "map_partitions", "map_overlap", "repartition",
    "to_parquet", "to_csv", "to_json", "to_orc", "to_records", "to_bag",
    "to_sql",
]


def read_table(path: str, sep: str = "\t", **options):
    """reference dask/dataframe read_table — delimited read with a
    tab default; the same splittable CSV reader underneath."""
    from dask_spark.sources import read_csv

    return read_csv(path, sep=sep, **options)


def to_hdf(frame, path_or_buf: str, key: str, mode: str = "a"):
    """reference dask/dataframe to_hdf. h5py/pytables are absent in
    this environment; with pandas' HDF support present this computes
    and writes driver-side (HDF5 is not a parallel-writable format —
    dask also serializes writes per key)."""
    pdf = frame.compute()
    try:
        pdf.to_hdf(path_or_buf, key=key, mode=mode)
    except ImportError as e:
        raise ImportError(
            "to_hdf needs the pytables package (pandas HDF backend)"
        ) from e
    return path_or_buf


def get_collection_type(obj):
    """reference dask/dataframe/dispatch.py get_collection_type —
    the frame/series classes for a pandas-like object."""
    import pandas as pd

    from dask_spark.frame import DaskFrame, Series

    if isinstance(obj, pd.Series):
        return Series
    return DaskFrame


from dask_spark.utils import Dispatch  # noqa: E402

#: reference dask/dataframe/dispatch.py — extension registries. The
#: only backend here is the Spark engine; the registries exist so
#: ported registration code imports and no-ops cleanly.
dispatch = Dispatch(name="dataframe_dispatch")


class _DataFrameBackends:
    def __repr__(self):
        return "<dask_spark.dataframe.backends: spark>"


backends = _DataFrameBackends()


def from_graph(*args, **kwargs):
    """reference dask/dataframe from_graph — raw HighLevelGraph
    construction has no Spark analog; build from sources or
    from_delayed instead."""
    raise NotImplementedError(
        "from_graph consumes a dask task graph; this engine plans "
        "through Catalyst — use read_*/from_pandas/from_delayed"
    )


# reference dask/dataframe/__init__.py exports the test helper too
from dask_spark.testing import assert_eq  # noqa: E402,F401
