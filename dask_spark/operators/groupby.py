"""GroupBy: PySpark re-expression of dask's groupby
(reference: dask/dataframe/dask_expr/_groupby.py, dask/dataframe/groupby.py).

dask implements grouped aggregation as apply-concat-apply (partial
per-partition agg → shuffle → final agg). Spark's hash aggregate does the
identical partial/final split natively with whole-stage codegen, so every
method here lowers to ``groupBy().agg`` — no Python in the hot path.
``apply`` (arbitrary pandas fn per group) is the one escape hatch and maps
to Arrow-batched ``applyInPandas``; ``transform`` and cumulatives map to
window functions to avoid a second shuffle."""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, Window

_AGGS: dict[str, Callable[[str], Column]] = {
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": lambda c: F.count(c),
    "size": lambda c: F.count(F.lit(1)),
    "std": lambda c: F.stddev_samp(c),
    "var": lambda c: F.var_samp(c),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "nunique": lambda c: F.countDistinct(c),
    "nunique_approx": lambda c: F.approx_count_distinct(c),
    "median": lambda c: F.percentile_approx(c, 0.5),
    "list": lambda c: F.collect_list(c),
    "collect_list": lambda c: F.collect_list(c),
    "collect_set": lambda c: F.collect_set(c),
    "any": lambda c: F.max(F.col(c).cast("boolean")),
    "all": lambda c: F.min(F.col(c).cast("boolean")),
}


class GroupBy:
    def __init__(self, frame, keys: Sequence[str]):
        self._frame = frame
        self._keys = list(keys)

    # ---- declarative aggregation -------------------------------------
    def agg(self, spec: Mapping[str, object] | None = None, **named) -> "DaskFrame":
        """``agg({"x": "sum"})``, ``agg({"x": ["sum", "mean"]})`` or
        named form ``agg(total=("x", "sum"))``. Output columns are
        ``<col>_<fn>`` for the dict form (flat names — the driver's
        oracle compare needs stable flat names), or the given name."""
        from dask_spark.frame import DaskFrame

        exprs: list[Column] = []
        if spec:
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, str) else fns:
                    exprs.append(_AGGS[fn](col).alias(f"{col}_{fn}"))
        for out_name, (col, fn) in named.items():
            exprs.append(_AGGS[fn](col).alias(out_name))
        if not exprs:
            raise ValueError("no aggregations given")
        return DaskFrame(self._frame._sdf.groupBy(*self._keys).agg(*exprs))

    def _simple(self, fn: str, cols: Sequence[str] | None = None) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        if cols is None:
            cols = [
                c
                for c in self._frame._numeric_cols()
                if c not in self._keys
            ]
        exprs = [_AGGS[fn](c).alias(c) for c in cols]
        return DaskFrame(self._frame._sdf.groupBy(*self._keys).agg(*exprs))

    def sum(self, cols=None):
        return self._simple("sum", cols)

    def mean(self, cols=None):
        return self._simple("mean", cols)

    def min(self, cols=None):
        return self._simple("min", cols)

    def max(self, cols=None):
        return self._simple("max", cols)

    def count(self, cols=None):
        return self._simple("count", cols)

    def std(self, cols=None):
        return self._simple("std", cols)

    def var(self, cols=None):
        return self._simple("var", cols)

    def first(self, cols=None):
        return self._simple("first", cols)

    def last(self, cols=None):
        return self._simple("last", cols)

    def nunique(self, cols=None):
        return self._simple("nunique", cols)

    def size(self) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.count(F.lit(1)).alias("size")
            )
        )

    def quantile(self, col: str, q: float = 0.5) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.percentile_approx(col, q).alias(f"{col}_q")
            )
        )

    def idxmin(self, value_col: str, id_col: str) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.min_by(id_col, value_col).alias(f"idxmin_{value_col}")
            )
        )

    def idxmax(self, value_col: str, id_col: str) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.max_by(id_col, value_col).alias(f"idxmax_{value_col}")
            )
        )

    def topk(self, n: int, by: str, ascending: bool = False,
             tie_break: str | None = None) -> "DaskFrame":
        """Top-n rows per group by ``by`` (dask idiom:
        groupby().apply(nlargest) — here a rank window, no Python).
        One shuffle on the group keys; ``tie_break`` column makes the
        cut deterministic."""
        from dask_spark.frame import DaskFrame

        order = [F.col(by).asc() if ascending else F.col(by).desc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        w = Window.partitionBy(*self._keys).orderBy(*order)
        return DaskFrame(
            self._frame._sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )

    # ---- python escape hatch -----------------------------------------
    def apply(self, fn: Callable, schema: str) -> "DaskFrame":
        """Arbitrary pandas fn per group → ``applyInPandas`` (Arrow).
        One shuffle on the group keys; groups must fit in executor
        memory — same contract as dask's groupby.apply."""
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).applyInPandas(fn, schema=schema)
        )

    # ---- window-backed (no second shuffle) ----------------------------
    def transform(self, fn: str, col: str, out: str | None = None) -> "DaskFrame":
        """Group-aggregate broadcast back onto rows — window function
        instead of agg+join (one shuffle, not two)."""
        from dask_spark.frame import DaskFrame

        w = Window.partitionBy(*self._keys)
        return DaskFrame(
            self._frame._sdf.withColumn(out or f"{col}_{fn}", _AGGS[fn](col).over(w))
        )

    def cumsum(self, col: str, order_by: str, out: str | None = None) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        w = (
            Window.partitionBy(*self._keys)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return DaskFrame(
            self._frame._sdf.withColumn(out or f"{col}_cumsum", F.sum(col).over(w))
        )

    def cumcount(self, order_by: str, out: str = "cumcount") -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        w = Window.partitionBy(*self._keys).orderBy(order_by)
        return DaskFrame(
            self._frame._sdf.withColumn(out, F.row_number().over(w) - F.lit(1))
        )
