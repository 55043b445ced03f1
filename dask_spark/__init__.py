"""dask_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of dask/dask (reference snapshot at
/root/reference), re-expressed Spark-first — the logical plan lives in
Catalyst; Python only at Arrow-batched escape hatches.

Public surface mirrors ``dask.dataframe``::

    import dask_spark as ds
    df = ds.read_parquet(".../lineitem.parquet")
    out = df[df.l_shipdate <= "1998-09-02"].groupby(
        ["l_returnflag", "l_linestatus"]).agg({"l_quantity": "sum"})
    out.compute()          # pandas (like dask .compute())
"""

from dask_spark.frame import (DaskFrame, Series, concat, sql,
                              to_datetime, to_numeric, to_timedelta)
from dask_spark.operators.groupby import Aggregation
from dask_spark.session import get_spark
from dask_spark.array import DArray
from dask_spark.bag import Bag
from dask_spark.sources import (
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
    read_text,
    read_sql_table,
    timeseries,
)

from dask_spark.delayed import Delayed, compute, delayed
from dask_spark.random import RandomState, default_rng
from dask_spark.array import solve_triangular
from dask_spark.ndarray import (NDArray, apply_gufunc, bincount, digitize,
                                einsum, histogram2d)
from dask_spark.plans.progress import ProgressBar

from dask_spark import datasets, diagnostics, testing, utils
from dask_spark.utils import sizeof, tokenize
from dask_spark.base import (
    Expr,
    HLGExpr,
    LLGExpr,
    SingletonExpr,
    annotate,
    annotations,
    config,
    get,
    get_annotations,
    is_dask_collection,
    istask,
    optimize,
    persist,
    visualize,
)
from dask_spark.testing import assert_eq

__version__ = "0.5.0"

__all__ = [
    "Aggregation",
    "DaskFrame",
    "Series",
    "concat",
    "to_datetime",
    "to_numeric",
    "to_timedelta",
    "sql",
    "testing",
    "get_spark",
    "read_parquet",
    "read_text",
    "read_avro",
    "read_hdf",
    "Bag",
    "DArray",
    "read_csv",
    "read_fwf",
    "read_json",
    "read_orc",
    "read_sql_table",
    "from_pandas",
    "from_dict",
    "from_delayed",
    "timeseries",
    "NDArray",
    "bincount",
    "digitize",
    "histogram2d",
    "assert_eq",
]
