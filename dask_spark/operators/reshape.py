"""Reshape ops (reference: dask/dataframe/reshape.py — pivot_table,
melt, get_dummies; explode from dask_expr._collection).

pivot_table: Spark's groupBy().pivot(values=...) does a single shuffle
when the pivot values are supplied; we pre-compute distinct values only
when the caller omits them (dask requires known categoricals for the
same reason — unknown pivot columns break laziness)."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

_PIVOT_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "first": lambda c: F.first(c, ignorenulls=True),
}


def pivot_table(frame, index, columns: str, values: str, aggfunc: str = "mean",
                pivot_values: Sequence[str] | None = None):
    from dask_spark.frame import DaskFrame

    index = [index] if isinstance(index, str) else list(index)
    sdf = frame._sdf
    gb = sdf.groupBy(*index)
    piv = gb.pivot(columns, list(pivot_values)) if pivot_values else gb.pivot(columns)
    return DaskFrame(piv.agg(_PIVOT_AGGS[aggfunc](values)))


def melt(frame, id_vars, value_vars, var_name: str = "variable",
         value_name: str = "value"):
    from dask_spark.frame import DaskFrame

    id_vars = [id_vars] if isinstance(id_vars, str) else list(id_vars)
    value_vars = [value_vars] if isinstance(value_vars, str) else list(value_vars)
    sdf = frame._sdf
    structs = [
        F.struct(
            F.lit(c).alias(var_name), F.col(c).cast("double").alias(value_name)
        )
        for c in value_vars
    ]
    out = sdf.select(
        *id_vars, F.explode(F.array(*structs)).alias("__m")
    ).select(*id_vars, f"__m.{var_name}", f"__m.{value_name}")
    return DaskFrame(out)


def explode(frame, column: str):
    """pandas/dask semantics: a row with an empty/null list is KEPT
    with a null value (explode_outer), not dropped."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    others = [c for c in sdf.columns if c != column]
    return DaskFrame(
        sdf.select(*others, F.explode_outer(F.col(column)).alias(column))
    )


def _distinct_guarded(sdf, column: str, max_categories: int, op: str):
    """Collect the distinct category set with a hard cap: an
    accidentally high-cardinality column must fail fast with a clear
    error instead of OOMing the driver. The probe reads max+1 rows, so
    the failure costs one truncated job, not a full distinct."""
    rows = sdf.select(column).distinct().limit(max_categories + 1).collect()
    if len(rows) > max_categories:
        raise ValueError(
            f"{op}({column!r}): more than max_categories="
            f"{max_categories} distinct values — pass values= explicitly "
            "or raise max_categories if this column is truly categorical"
        )
    return sorted(r[0] for r in rows if r[0] is not None)


def get_dummies(frame, column: str | Sequence[str] | None = None,
                prefix: str | None = None,
                values: Sequence[str] | None = None,
                max_categories: int = 1024, prefix_sep: str = "_",
                dummy_na: bool = False, drop_first: bool = False,
                dtype: str = "int", columns: Sequence[str] | None = None):
    """One-hot encode. Like dask (reference: dask_expr/_dummies.py
    get_dummies requires known categories), the category set must be
    supplied or is computed with one small distinct job — never
    per-row Python. Auto-discovery is capped at ``max_categories``.

    pandas/dask kwarg depth: ``prefix_sep`` joins prefix and value;
    ``dummy_na`` adds a <prefix><sep>nan indicator for nulls (without
    it null rows are all-zero, the pandas contract); ``drop_first``
    drops the first (sorted) category per column (k-1 encoding);
    ``dtype`` sets the indicator column type (pandas defaults bool,
    dask keeps uint8-era ints — "int" here, pass "boolean" for
    pandas-2 parity); ``columns`` one-hot-encodes several columns in
    one projection (each with its own prefix defaulting to the column
    name)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    todo = list(columns) if columns is not None else [column]
    if any(c is None for c in todo):
        raise ValueError("get_dummies needs column or columns")
    if values is not None and columns is not None:
        # a single category set cannot apply to several columns;
        # silently re-running the distinct scan would defeat the
        # point of passing values= — make the conflict loud
        raise ValueError(
            "get_dummies: values= applies to the single-column form; "
            "with columns= the category set is discovered per column"
        )
    cols = []
    for col in todo:
        vals = values
        if vals is None:
            vals = _distinct_guarded(sdf, col, max_categories,
                                     "get_dummies")
        vals = sorted(vals)
        if drop_first:
            vals = vals[1:]
        pfx = prefix if (prefix is not None and columns is None) else col
        for v in vals:
            cols.append(
                F.when(F.col(col) == v, 1).otherwise(0)
                .cast(dtype).alias(f"{pfx}{prefix_sep}{v}")
            )
        if dummy_na:
            cols.append(
                F.when(F.col(col).isNull(), 1).otherwise(0)
                .cast(dtype).alias(f"{pfx}{prefix_sep}nan")
            )
    return DaskFrame(sdf.select(*sdf.columns, *cols))


def categorize(frame, column: str, out: str | None = None,
               max_categories: int = 65536):
    """Dictionary-encode a string column (reference: dask categorize /
    categorical accessor — dask computes the category set with one
    pass, then encodes). Codes are the 0-based rank in the sorted
    distinct values (deterministic across engines/partitionings); the
    tiny code table is broadcast back onto the rows. Cardinality above
    ``max_categories`` fails fast (the code table must stay
    broadcast-small)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    over = (
        sdf.select(column).distinct().limit(max_categories + 1).count()
    )
    if over > max_categories:
        raise ValueError(
            f"categorize({column!r}): more than max_categories="
            f"{max_categories} distinct values — not a categorical column"
        )
    cats = (
        sdf.select(column).distinct()
        .withColumn(
            "__code",
            F.row_number().over(Window.orderBy(F.col(column).asc())) - 1,
        )
    )
    out = out or f"{column}_code"
    return DaskFrame(
        sdf.join(F.broadcast(cats), on=column, how="left").withColumnRenamed(
            "__code", out
        )
    )
