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

# pandas min_count=0 identities: an all-null (== all-missing) group
# sums to 0 and multiplies to 1 like pandas/dask, where bare Spark
# SUM/PRODUCT return NULL (r14 fuzz_parity find). Applied by
# _agg_final at AGGREGATE call sites; transform() applies the same
# identity AFTER .over(w) (the coalesce can't ride inside the window
# call), with null-key rows re-nulled by _shape_preserving.
# Identities are LAZY (F.lit needs a live SparkContext at call time).
_AGG_IDENTITY: dict[str, Callable[[], Column]] = {
    "sum": lambda: F.lit(0),
    "prod": lambda: F.lit(1.0),
}


def _skipnan(frame, col: str):
    """pandas skipna for FLOAT agg inputs: NaN is missing whether it
    arrived at a boundary or was created mid-plan (sqrt(-1), 0/0) —
    Spark would otherwise poison sums and sort NaN greatest in
    min/max. Ints pass through (nanvl would coerce them to double)."""
    t = dict(frame._sdf.dtypes).get(col)
    if t in ("float", "double"):
        return F.nanvl(F.col(col), F.lit(None).cast(t))
    return F.col(col)


def _agg_final(fn: str, col) -> Column:
    e = _AGGS[fn](col)
    ident = _AGG_IDENTITY.get(fn)
    return F.coalesce(e, ident()) if ident is not None else e


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


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
    "prod": lambda c: F.product(c),
    "median": lambda c: F.percentile_approx(c, 0.5),
    "list": lambda c: F.collect_list(c),
    "collect_list": lambda c: F.collect_list(c),
    "collect_set": lambda c: F.collect_set(c),
    "any": lambda c: F.max(_c(c).cast("boolean")),
    "all": lambda c: F.min(_c(c).cast("boolean")),
}


class Aggregation:
    """Custom decomposable aggregation (reference:
    dask/dataframe/groupby.py:197 ``class Aggregation(name, chunk, agg,
    finalize)`` — dask's escape hatch for weighted means and other
    user-defined reducers).

    dask runs ``chunk`` per partition, ``agg`` across the partials and
    ``finalize`` on the merged result. Spark's hash aggregate already
    executes every built-in aggregate as partial+merge with whole-stage
    codegen, so the Spark-native (fast-path) form declares the
    decomposition as Columns and stays fully JVM-side::

        wavg = Aggregation(
            "wavg",
            partials=lambda v, w: {"s": F.sum(F.col(v) * F.col(w)),
                                   "w": F.sum(w)},
            finalize=lambda p: p["s"] / p["w"],
        )
        df.groupby("g").agg(price_wavg=(("price", "qty"), wavg))

    ``partials(*cols) -> {name: aggregate Column}`` covers dask's
    chunk+agg (Catalyst splits each into partial/merge automatically);
    ``finalize({name: Column}) -> Column`` is a post-aggregation
    projection.

    For logic that genuinely can't be expressed as aggregate Columns,
    pass pandas callables instead (``chunk``/``agg``/``finalize``): the
    group is Arrow-shipped whole to ``applyInPandas``, ``chunk`` sees
    each requested column as a full pandas Series, and ``agg``/
    ``finalize`` post-process its result. (dask needs the three-way
    split because a group spans partitions; under ``applyInPandas`` the
    shuffle co-locates the group, so one chunk suffices.) ``dtype`` is
    the Spark type of the result (default ``double``)."""

    def __init__(self, name: str, chunk: Callable | None = None,
                 agg: Callable | None = None,
                 finalize: Callable | None = None, *,
                 partials: Callable | None = None, dtype: str = "double"):
        self.name = name
        self.dtype = dtype
        if partials is not None:
            self.mode = "column"
            self.partials = partials
            self.finalize = finalize
        else:
            if chunk is None:
                raise ValueError("Aggregation needs either partials= or chunk=")
            self.mode = "pandas"
            self.chunk = chunk
            self.agg_fn = agg
            self.finalize = finalize


class GroupBy:
    def __init__(self, frame, keys: Sequence[str], dropna: bool = True):
        self._keys = list(keys)
        self._raw = frame
        self._dropna = bool(dropna) and bool(self._keys)
        if self._dropna:
            # pandas/dask groupby(dropna=True) default: rows with a
            # null in ANY group key never form a group. Spark's
            # groupBy keeps the null group, so GROUP-PRODUCING ops
            # (agg/apply/topk/head/rolling/...) run over this
            # prefiltered frame (pushdown-friendly: it lands in the
            # scan as IsNotNull). SHAPE-PRESERVING ops (transform,
            # cumulatives, shift/diff, ffill/bfill, ngroup/cumcount)
            # instead keep every row and null the RESULT for null-key
            # rows — pandas' contract — via _shape_preserving.
            cond = None
            for k in self._keys:
                c = F.col(k).isNotNull()
                cond = c if cond is None else cond & c
            from dask_spark.frame import DaskFrame

            frame = DaskFrame(frame._sdf.filter(cond))
        self._frame = frame

    def _null_key(self):
        cond = None
        for k in self._keys:
            c = F.col(k).isNull()
            cond = c if cond is None else cond | c
        return cond

    def _shape_preserving(self, mask_cols, build):
        """Run a row-count-preserving group op over the UNFILTERED
        frame, then null out ``mask_cols`` on null-key rows (pandas
        dropna=True keeps the rows; their results are NaN). Null-key
        rows form their own Spark window partition during the build,
        so non-null groups are unaffected."""
        out = build(self._raw)
        if not self._dropna:
            return out
        from dask_spark.frame import DaskFrame

        sdf = out._sdf
        cond = self._null_key()
        for c in mask_cols:
            sdf = sdf.withColumn(
                c, F.when(cond, F.lit(None)).otherwise(F.col(c))
            )
        return DaskFrame(sdf)

    # ---- declarative aggregation -------------------------------------
    def agg(self, spec: Mapping[str, object] | None = None,
            split_out: int | None = None, **named) -> "DaskFrame":
        """``agg({"x": "sum"})``, ``agg({"x": ["sum", "mean"]})`` or
        named form ``agg(total=("x", "sum"))``. Output columns are
        ``<col>_<fn>`` for the dict form (flat names — the driver's
        oracle compare needs stable flat names), or the given name.
        ``fn`` may be an :class:`Aggregation`; the named form also
        accepts a tuple of input columns for multi-column custom aggs:
        ``agg(wavg=(("price", "qty"), wavg_agg))``.

        ``split_out`` (reference: dask groupby split_out — number of
        output partitions for high-cardinality group keys): the agg
        output normally lands on AQE-coalesced shuffle partitions;
        split_out forces an exact count via a key-hash repartition of
        the (already aggregated, small) result."""
        from dask_spark.frame import DaskFrame

        items: list[tuple[str, tuple, object]] = []  # (out, cols, fn)
        if isinstance(spec, (str, Aggregation)) or (
            isinstance(spec, (list, tuple))
            and all(isinstance(f, (str, Aggregation)) for f in spec)
        ):
            # dask's "apply to every numeric column" forms:
            # agg("sum") / agg(["sum", "mean"])
            num = [c for c in self._frame._numeric_cols()
                   if c not in self._keys]
            fns = [spec] if isinstance(spec, (str, Aggregation)) else list(spec)
            spec = {c: (fns[0] if len(fns) == 1 else fns) for c in num}
        if spec:
            for col, fns in spec.items():
                for fn in [fns] if isinstance(fns, (str, Aggregation)) else fns:
                    suffix = fn.name if isinstance(fn, Aggregation) else fn
                    items.append((f"{col}_{suffix}", (col,), fn))
        for out_name, (col, fn) in named.items():
            cols = (col,) if isinstance(col, str) else tuple(col)
            items.append((out_name, cols, fn))
        if not items:
            raise ValueError("no aggregations given")

        if any(isinstance(fn, Aggregation) and fn.mode == "pandas"
               for _, _, fn in items):
            return self._agg_pandas(items)

        exprs: list[Column] = []
        finals: list[Column] = []
        for out, cols, fn in items:
            if isinstance(fn, Aggregation):
                named_partials = {}
                for pname, pexpr in fn.partials(*cols).items():
                    alias = f"__{out}__{pname}"
                    exprs.append(pexpr.alias(alias))
                    named_partials[pname] = F.col(alias)
                fin = (fn.finalize(named_partials) if fn.finalize
                       else next(iter(named_partials.values())))
                finals.append(fin.alias(out))
            else:
                exprs.append(
                    _agg_final(fn, _skipnan(self._frame, cols[0]))
                    .alias(out)
                )
                finals.append(F.col(out))
        out_sdf = self._frame._sdf.groupBy(*self._keys).agg(*exprs)
        out_sdf = out_sdf.select(*self._keys, *finals)
        if split_out is not None:
            out_sdf = out_sdf.repartition(split_out, *[F.col(k) for k in self._keys])
        elif getattr(self, "_sort_output", False):
            # groupby(sort=True): pandas sorts the output by the group
            # keys; the agg result is key-cardinality-sized, so the
            # sort is cheap relative to the aggregation exchange.
            # split_out supersedes sort — an explicit output
            # partitioning request would be destroyed by a global sort.
            out_sdf = out_sdf.orderBy(*self._keys)
        return DaskFrame(out_sdf)

    def _agg_pandas(self, items) -> "DaskFrame":
        """applyInPandas fallback when any Aggregation carries pandas
        callables. One shuffle on the keys; each group must fit in
        executor memory (dask's groupby.apply contract). Built-in
        string fns in the same call are evaluated in pandas too so the
        whole spec stays a single pass."""
        import pandas as pd

        from dask_spark.frame import DaskFrame

        keys = self._keys
        key_types = dict(self._frame._sdf.select(*keys).dtypes)
        out_types = {
            out: (fn.dtype if isinstance(fn, Aggregation) else
                  ("bigint" if fn in ("count", "size", "nunique") else "double"))
            for out, _, fn in items
        }
        schema = ", ".join(
            [f"{k} {key_types[k]}" for k in keys]
            + [f"{out} {t}" for out, t in out_types.items()]
        )
        spec = [(out, cols, fn) for out, cols, fn in items]

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            row = {k: [pdf[k].iloc[0]] for k in keys}
            for out, cols, fn in spec:
                if isinstance(fn, Aggregation):
                    val = fn.chunk(*[pdf[c] for c in cols])
                    if fn.agg_fn is not None:
                        val = fn.agg_fn(val)
                    if fn.finalize is not None:
                        val = fn.finalize(val)
                elif fn == "size":
                    val = len(pdf)  # pandas .size is an attribute
                else:
                    val = getattr(pdf[cols[0]], fn)()
                row[out] = [val]
            return pd.DataFrame(row)

        return DaskFrame(
            self._frame._sdf.groupBy(*keys).applyInPandas(
                lambda _, pdf: run(pdf), schema=schema
            )
        )

    def _simple(self, fn: str, cols: Sequence[str] | None = None) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        if cols is None:
            cols = [
                c
                for c in self._frame._numeric_cols()
                if c not in self._keys
            ]
        exprs = [
            _agg_final(fn, _skipnan(self._frame, c)).alias(c) for c in cols
        ]
        out = self._frame._sdf.groupBy(*self._keys).agg(*exprs)
        if getattr(self, "_sort_output", False):
            out = out.orderBy(*self._keys)
        return DaskFrame(out)

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
        groupby().apply(nlargest) — here rank windows, no Python).
        ``tie_break`` column makes the cut deterministic.

        Scale shape: a single ``row_number() OVER (PARTITION BY key)``
        ships EVERY row of a group into one task — a skewed group kills
        the stage. Two-phase instead: phase 1 ranks within
        (input-partition, key) — the exchange hashes on BOTH, so it is
        skew-free by construction — and keeps ≤ n rows per (partition,
        key); phase 2 ranks the survivors (≤ n·P rows per group) per
        key. Ties at the phase-1 cut follow the same total order as
        phase 2, so the kept set is identical to the one-window answer
        whenever the order is total (unique ``by``, or ``tie_break``);
        under genuinely tied orders the choice among ties is arbitrary
        in BOTH formulations."""
        from dask_spark.frame import DaskFrame

        order = [F.col(by).asc() if ascending else F.col(by).desc()]
        if tie_break:
            order.append(F.col(tie_break).asc())
        pre = Window.partitionBy(
            F.spark_partition_id(), *self._keys
        ).orderBy(*order)
        pruned = (
            self._frame._sdf.withColumn("__prn", F.row_number().over(pre))
            .filter(F.col("__prn") <= n)
            .drop("__prn")
        )
        w = Window.partitionBy(*self._keys).orderBy(*order)
        return DaskFrame(
            pruned.withColumn("__rn", F.row_number().over(w))
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
        instead of agg+join (one shuffle, not two). Shape-preserving:
        null-key rows stay, with null results (pandas dropna)."""
        from dask_spark.frame import DaskFrame

        name = out or f"{col}_{fn}"
        w = Window.partitionBy(*self._keys)
        ident = _AGG_IDENTITY.get(fn)

        def build(f):
            e = _AGGS[fn](_skipnan(self._frame, col)).over(w)
            # min_count=0 identities applied OUTSIDE the window (a
            # coalesce wrapper can't be .over()'d): pandas
            # transform('sum') of an all-missing group is 0.0, prod
            # 1.0. Null-key rows get re-nulled by _shape_preserving
            # afterward, so dropna behavior is unaffected (r15 ADVICE).
            if ident is not None:
                e = F.coalesce(e, ident())
            return DaskFrame(f._sdf.withColumn(name, e))

        return self._shape_preserving([name], build)

    def cumsum(self, col: str, order_by: str, out: str | None = None) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        name = out or f"{col}_cumsum"
        w = (
            Window.partitionBy(*self._keys)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

        def build(f):
            # pandas skipna (r15): NaN/NULL reads NaN at its own row,
            # the running sum carries past it unpoisoned
            from dask_spark.operators.window import _cum_missing

            src, missing = _cum_missing(f._sdf, col, "sum")
            e = F.sum(src).over(w)
            if missing is not None:
                e = F.when(~missing, e)
            return DaskFrame(f._sdf.withColumn(name, e))

        return self._shape_preserving([name], build)

    def aggregate(self, *a, **kw):
        """Alias of agg (reference _groupby.py aggregate)."""
        return self.agg(*a, **kw)

    def compute(self, *a, **kw):
        """Eager collect of the grouped frame (reference: GroupBy
        delegates compute to the underlying collection)."""
        return self._frame.compute(*a, **kw)

    def prod(self, cols=None):
        return self._simple("prod", cols)

    def median(self, col: str) -> "DaskFrame":
        """Approximate per-group median (reference _groupby.py median —
        dask's is approximate too via quantile machinery)."""
        return self.quantile(col, 0.5)

    def corr(self, c1: str, c2: str) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.corr(c1, c2).alias("corr")
            )
        )

    def cov(self, c1: str, c2: str) -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.covar_samp(c1, c2).alias("cov")
            )
        )

    def unique(self, col: str) -> "DaskFrame":
        """Sorted distinct values per group (reference _groupby.py
        unique) — collect_set + array_sort, one shuffle."""
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys).agg(
                F.array_sort(F.collect_set(col)).alias(col)
            )
        )

    def value_counts(self, col: str) -> "DaskFrame":
        """Per-group value counts (reference _groupby.py value_counts)."""
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            self._frame._sdf.groupBy(*self._keys, col).agg(
                F.count(F.lit(1)).alias("count")
            )
        )

    def get_group(self, key) -> "DaskFrame":
        """Rows of one group (reference _groupby.py get_group)."""
        from dask_spark.frame import DaskFrame

        keys = key if isinstance(key, (list, tuple)) else [key]
        if len(keys) != len(self._keys):
            raise ValueError("key arity must match the groupby keys")
        cond = None
        for k, v in zip(self._keys, keys):
            c = F.col(k) == F.lit(v)
            cond = c if cond is None else cond & c
        return DaskFrame(self._frame._sdf.filter(cond))

    def head(self, n: int, order_by: str) -> "DaskFrame":
        """First n rows per group in ``order_by`` order (reference
        _groupby.py head) — rank window, one shuffle."""
        return self.topk(n, by=order_by, ascending=True)

    def tail(self, n: int, order_by: str) -> "DaskFrame":
        return self.topk(n, by=order_by, ascending=False)

    def rolling(self, window, on: str, min_periods: int | None = None):
        """Per-group rolling (reference: dask_expr/_groupby.py:2141
        GroupBy.rolling) — the keyed rolling window partitioned by the
        group keys; row- and range-based windows both supported."""
        return self._frame.rolling(window, on=on, by=list(self._keys),
                                   min_periods=min_periods)

    def ffill(self, cols, order_by: str) -> "DaskFrame":
        """Per-group forward fill (reference: dask_expr/_groupby.py:1784
        GroupBy.ffill) — delegates to the frame-level windowed fill
        with the group keys; one sort-shuffle on the keys."""
        cols = [cols] if isinstance(cols, str) else list(cols)
        return self._shape_preserving(
            cols, lambda f: f.ffill(cols, order_by, by=list(self._keys))
        )

    def bfill(self, cols, order_by: str) -> "DaskFrame":
        """Per-group backward fill (_groupby.py GroupBy.bfill)."""
        cols = [cols] if isinstance(cols, str) else list(cols)
        return self._shape_preserving(
            cols, lambda f: f.bfill(cols, order_by, by=list(self._keys))
        )

    def shift(self, col: str, periods: int = 1, order_by: str | None = None,
              out: str | None = None) -> "DaskFrame":
        """Per-group shift (_groupby.py:2081 GroupBy.shift)."""
        name = out or f"{col}_shift"
        return self._shape_preserving([name], lambda f: f.shift(
            col, periods, order_by=order_by, by=list(self._keys), out=name
        ))

    def diff(self, col: str, periods: int = 1, order_by: str | None = None,
             out: str | None = None) -> "DaskFrame":
        """Per-group diff (_groupby.py GroupBy.diff)."""
        name = out or f"{col}_diff"
        return self._shape_preserving([name], lambda f: f.diff(
            col, periods, order_by=order_by, by=list(self._keys), out=name
        ))

    def cumprod(self, col: str, order_by: str,
                out: str | None = None) -> "DaskFrame":
        """Per-group cumulative product (_groupby.py cumprod)."""
        name = out or f"{col}_cumprod"
        return self._shape_preserving([name], lambda f: f.cumprod(
            col, order_by, by=list(self._keys), out=name
        ))

    def cumcount(self, order_by: str, out: str = "cumcount") -> "DaskFrame":
        from dask_spark.frame import DaskFrame

        w = Window.partitionBy(*self._keys).orderBy(order_by)
        return self._shape_preserving([out], lambda f: DaskFrame(
            f._sdf.withColumn(out, F.row_number().over(w) - F.lit(1))
        ))

    def nth(self, n: int, order_by: str | Sequence[str]) -> "DaskFrame":
        """The n-th row of each group in ``order_by`` order (reference:
        dask/dataframe/groupby.py GroupBy.nth); negative ``n`` counts
        from the end. One rank window — a single shuffle on the group
        keys, no Python. Groups shorter than ``|n|+1`` simply emit
        nothing, matching pandas."""
        from dask_spark.frame import DaskFrame

        order_by = [order_by] if isinstance(order_by, str) else list(order_by)
        if n >= 0:
            order = [F.col(c).asc() for c in order_by]
            k = n + 1
        else:
            order = [F.col(c).desc() for c in order_by]
            k = -n
        w = Window.partitionBy(*self._keys).orderBy(*order)
        return DaskFrame(
            self._frame._sdf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == k)
            .drop("__rn")
        )

    def ngroup(self, out: str = "ngroup") -> "DaskFrame":
        """Number each GROUP 0..G-1 in sorted key order (reference:
        dask/dataframe/groupby.py GroupBy.ngroup, pandas sort=True
        semantics) and broadcast the number onto every row.

        The global rank runs on the DISTINCT key set only — G rows,
        dask's-divisions scale, one brief single-partition window —
        never on the data itself; the data pays one join that AQE
        turns into a broadcast when G is small."""
        from dask_spark.frame import DaskFrame

        keys = list(self._keys)
        # distinct keys from the FILTERED frame (a null key must not
        # occupy a group number — pandas skips it from the count);
        # rows come from the raw frame via a null-safe LEFT join:
        # under dropna null-key rows survive with a null ngroup
        # (pandas NaN), under dropna=False they match dk's null entry
        # (a null-UNSAFE equi-join would silently drop them)
        dk = self._frame._sdf.select(*keys).distinct()
        # nulls LAST: with dropna=False pandas numbers the NaN group
        # after every real group (Spark asc() is nulls-first, which
        # would shift every non-null group's number by one)
        w = Window.orderBy(*[F.col(k).asc_nulls_last() for k in keys])
        ranked = dk.withColumn(out, F.dense_rank().over(w) - F.lit(1))
        ranked = ranked.select(
            *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)], out
        )
        raw = self._raw._sdf
        cond = None
        for i, k in enumerate(keys):
            c = raw[k].eqNullSafe(ranked[f"__k{i}"])
            cond = c if cond is None else cond & c
        return DaskFrame(
            raw.join(ranked, cond, "left")
            .drop(*[f"__k{i}" for i in range(len(keys))])
        )


def grouping_agg(frame, keys: Sequence[str], spec: Mapping[str, object],
                 mode: str = "rollup", grouping_flags: bool = True):
    """OLAP subtotal aggregation — ``mode="rollup"`` (hierarchical
    subtotals: (a,b), (a), ()) or ``mode="cube"`` (every key subset)
    → DaskFrame(keys..., [<key>_grouping flags,] <col>_<fn>...).
    The reporting shape dask lacks but any analytics engine needs;
    Catalyst's Expand operator computes ALL grouping sets in ONE scan
    + one shuffle (it replicates each input row per set map-side —
    sets× the exchange, never sets× the scan).

    Subtotal rows carry NULL group keys (the SQL convention);
    ``grouping_flags`` adds an int ``<key>_grouping`` per key (1 on
    subtotal rows — SQL GROUPING()) so real-null keys stay
    distinguishable from subtotals. Spec is the dict form of
    GroupBy.agg: {"col": "fn"} or {"col": [fns...]}, same
    ``<col>_<fn>`` output names."""
    from dask_spark.frame import DaskFrame

    if mode not in ("rollup", "cube"):
        raise ValueError("mode must be rollup|cube")
    ks = list(keys)
    if not ks:
        raise ValueError("grouping_agg needs at least one key")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    exprs = []
    for col, fns in spec.items():
        for fn in [fns] if isinstance(fns, str) else fns:
            exprs.append(_AGGS[fn](col).alias(f"{col}_{fn}"))
    if not exprs:
        raise ValueError("no aggregations given")
    grouped = (sdf.rollup(*ks) if mode == "rollup" else sdf.cube(*ks))
    cols = [*ks]
    if grouping_flags:
        exprs = [
            *[F.grouping(k).cast("int").alias(f"{k}_grouping")
              for k in ks],
            *exprs,
        ]
    out = grouped.agg(*exprs)
    return DaskFrame(out.select(*cols, *[e for e in out.columns
                                         if e not in ks]))


_MERGEABLE = ("sum", "count", "min", "max")


def aggregate_partials(frame, keys: Sequence[str],
                       spec: Mapping[str, Sequence[str]]):
    """Partial-aggregate a raw frame for incremental maintenance:
    DaskFrame(keys..., <col>_<fn>...) with fns limited to the
    DECOMPOSABLE set (sum/count/min/max — the algebra a mergeable
    state needs; mean/var derive from sum+count downstream)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    aggs = []
    for col, fns in spec.items():
        for fn in [fns] if isinstance(fns, str) else fns:
            if fn not in _MERGEABLE:
                raise ValueError(
                    f"aggregate_partials: {fn!r} is not mergeable "
                    f"(use {_MERGEABLE})"
                )
            aggs.append(_AGGS[fn](col).alias(f"{col}_{fn}"))
    return DaskFrame(sdf.groupBy(*keys).agg(*aggs))


def merge_partials(state, batch_partials, keys: Sequence[str]):
    """Merge a NEW batch's partial aggregates into a persisted state
    table → the same schema — incremental materialized-aggregate
    maintenance (the warehouse pattern: never rescan history, merge
    the delta; what dask recomputes from scratch every time).

    FULL OUTER join on the keys (new keys append, old keys update),
    then per column: ``*_sum``/``*_count`` add with null→0 coalesce,
    ``*_min``/``*_max`` combine null-safely via least/greatest —
    every combine is the aggregate's own merge function, so
    merge(agg(A), agg(B)) == agg(A ∪ B) EXACTLY for integer-exact
    columns (and to reassociation for float sums — keep money in
    micro-unit int64, the repo-wide rule). The exchange is
    state-keys-bounded, never history-bounded."""
    from dask_spark.frame import DaskFrame

    s = state._sdf if isinstance(state, DaskFrame) else state
    b = (batch_partials._sdf if isinstance(batch_partials, DaskFrame)
         else batch_partials)
    ks = list(keys)
    val_cols = [c for c in s.columns if c not in ks]
    if set(s.columns) != set(b.columns):
        raise ValueError(
            "merge_partials: state and batch schemas differ: "
            f"{sorted(s.columns)} vs {sorted(b.columns)}"
        )
    a = s.select(*ks, *[F.col(c).alias(f"__a_{c}") for c in val_cols])
    c2 = b.select(*ks, *[F.col(c).alias(f"__b_{c}") for c in val_cols])
    j = a.join(c2, ks, "full_outer")
    outs = []
    for c in val_cols:
        fn = c.rsplit("_", 1)[-1]
        x, y = F.col(f"__a_{c}"), F.col(f"__b_{c}")
        if fn in ("sum", "count"):
            zero = F.lit(0).cast("bigint")
            # both-null stays null (an all-null-values group recomputes
            # to a null sum — the merge must agree with the recompute)
            merged = F.when(
                x.isNull() & y.isNull(), F.lit(None)
            ).otherwise(F.coalesce(x, zero) + F.coalesce(y, zero))
        elif fn == "min":
            merged = F.least(x, y)  # least/greatest skip nulls
        elif fn == "max":
            merged = F.greatest(x, y)
        else:
            raise ValueError(f"merge_partials: unmergeable column {c!r}")
        outs.append(merged.alias(c))
    return DaskFrame(j.select(*ks, *outs))


def skew_safe_nunique(frame, key_col: str, value_col: str,
                      buckets: int = 32):
    """EXACT per-key distinct count that survives a skewed key →
    DaskFrame(key, nunique): values pre-bucket by a hash salt, the
    first aggregate counts distincts per (key, salt-bucket) — value
    buckets are DISJOINT, so the per-bucket distinct counts SUM to
    the true distinct count — and the second collapses buckets.

    Why: a plain groupBy(key).countDistinct(value) must co-locate
    EVERY (key, value) pair of a hot key in one task (Spark's
    distinct-aggregate expands then reshuffles on the full pair); the
    salted form splits a 5-billion-row key across ``buckets`` tasks
    while staying exact — the classic two-level skew mitigation, here
    as a first-class operator the optimizer can't derive itself."""
    from dask_spark.frame import DaskFrame

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    base = sdf.filter(
        F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
    )
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(int(buckets)))
    per_bucket = (
        base.groupBy(F.col(key_col).alias("key"), salt.alias("__b"))
        .agg(F.countDistinct(F.col(value_col)).alias("__d"))
    )
    out = per_bucket.groupBy("key").agg(
        F.sum("__d").cast("bigint").alias("nunique")
    )
    return DaskFrame(out)
