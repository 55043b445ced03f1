"""Rolling / resample / shift (reference: dask/dataframe/rolling.py
map_overlap machinery, dask/dataframe/tseries/resample.py).

dask implements rolling with map_overlap (ship `window` tail rows to the
next partition). Spark window frames (rowsBetween / rangeBetween) express
the same semantics declaratively with a single sort-shuffle and no
overlap bookkeeping. resample lowers to date_trunc + groupBy (partial
agg, one shuffle)."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, Window

_ROLL_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
}

_FREQ_SECONDS = {"s": 1, "min": 60, "t": 60, "h": 3600, "d": 86400, "w": 604800}


def _freq_to_seconds(rule: str) -> int:
    import re

    m = re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", rule.strip())
    if not m:
        raise ValueError(f"bad frequency {rule!r}")
    n = int(m.group(1) or 1)
    unit = m.group(2).lower()
    return n * _FREQ_SECONDS[unit]


class Rolling:
    """``frame.rolling(5, on="ts", by="user_id").mean("value")``.
    int window → rowsBetween(-(n-1), 0); str window ("7d") →
    rangeBetween on epoch seconds."""

    def __init__(self, frame, window, on: str, by=None, min_periods: int | None = None):
        self._frame = frame
        self._window = window
        self._on = on
        self._by = [] if by is None else ([by] if isinstance(by, str) else list(by))
        self._min_periods = min_periods

    def _win(self):
        if isinstance(self._window, int):
            w = Window.partitionBy(*self._by).orderBy(F.col(self._on))
            return w.rowsBetween(-(self._window - 1), 0), None
        secs = _freq_to_seconds(self._window)
        w = Window.partitionBy(*self._by).orderBy(
            F.col(self._on).cast("timestamp").cast("long")
        )
        return w.rangeBetween(-(secs - 1), 0), secs

    def agg(self, spec: dict[str, str]) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        w, _ = self._win()
        sdf = self._frame._sdf
        for col, fn in spec.items():
            expr = _ROLL_AGGS[fn](col).over(w)
            if self._min_periods:
                cnt = F.count(col).over(w)
                expr = F.when(cnt >= self._min_periods, expr)
            sdf = sdf.withColumn(f"{col}_roll_{fn}", expr)
        return DaskFrame(sdf)

    def sum(self, col: str):
        return self.agg({col: "sum"})

    def mean(self, col: str):
        return self.agg({col: "mean"})

    def min(self, col: str):
        return self.agg({col: "min"})

    def max(self, col: str):
        return self.agg({col: "max"})

    def count(self, col: str):
        return self.agg({col: "count"})

    def std(self, col: str):
        return self.agg({col: "std"})


class Resampler:
    """``frame.resample("1h", on="ts").agg({"value": "mean"})`` →
    date_trunc-style bucketing + groupBy. Bucket start is emitted as
    column ``<on>_bucket`` (timestamp)."""

    def __init__(self, frame, rule: str, on: str):
        self._frame = frame
        self._rule = rule
        self._on = on

    def _bucket(self) -> Column:
        secs = _freq_to_seconds(self._rule)
        epoch = F.col(self._on).cast("timestamp").cast("long")
        return F.timestamp_seconds((epoch - epoch % secs))

    def agg(self, spec: dict[str, object]) -> "DaskFrame":
        from dask_spark.frame import DaskFrame
        from dask_spark.operators.groupby import _AGGS

        exprs = []
        for col, fns in spec.items():
            for fn in [fns] if isinstance(fns, str) else fns:
                exprs.append(_AGGS[fn](col).alias(f"{col}_{fn}"))
        out = (
            self._frame._sdf.groupBy(self._bucket().alias(f"{self._on}_bucket"))
            .agg(*exprs)
        )
        return DaskFrame(out)

    def mean(self, col: str):
        return self.agg({col: "mean"})

    def sum(self, col: str):
        return self.agg({col: "sum"})

    def count(self, col: str):
        return self.agg({col: "count"})


def _by_list(by) -> list[str]:
    return [] if by is None else ([by] if isinstance(by, str) else list(by))


def shift(frame, col: str, periods: int = 1, order_by: str | None = None,
          by: Sequence[str] | None = None, out: str | None = None):
    """reference: dask shift via map_overlap → lag/lead window."""
    from dask_spark.frame import DaskFrame

    by = _by_list(by)
    w = Window.partitionBy(*by).orderBy(order_by or col)
    fn = F.lag(col, periods) if periods >= 0 else F.lead(col, -periods)
    return DaskFrame(frame._sdf.withColumn(out or f"{col}_shift", fn.over(w)))


def diff(frame, col: str, periods: int = 1, order_by: str | None = None,
         by: Sequence[str] | None = None, out: str | None = None):
    from dask_spark.frame import DaskFrame

    by = _by_list(by)
    w = Window.partitionBy(*by).orderBy(order_by or col)
    return DaskFrame(
        frame._sdf.withColumn(
            out or f"{col}_diff", F.col(col) - F.lag(col, periods).over(w)
        )
    )


def cumulative(frame, col: str, fn: str = "sum", order_by: str | None = None,
               by: Sequence[str] | None = None, out: str | None = None):
    """cumsum/cummax/cummin/cumcount (reference: dask_expr cumulative
    ops) as running window aggregates."""
    from dask_spark.frame import DaskFrame

    by = _by_list(by)
    w = (
        Window.partitionBy(*by)
        .orderBy(order_by or col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fns = {"sum": F.sum, "max": F.max, "min": F.min, "count": F.count}
    if fn == "prod":
        # running product via exp∘cumsum∘log (window applies to the sum)
        expr = F.exp(F.sum(F.log(col)).over(w))
    else:
        expr = fns[fn](col).over(w)
    return DaskFrame(frame._sdf.withColumn(out or f"{col}_cum{fn}", expr))
