"""dask.array parity (reference: dask/array/core.py Array) — a 2-D
array abstraction over a column of fixed-dim vectors (n_rows × dim).

Row axis (axis=0) is partitioned across the cluster; the vector axis
(axis=1) lives inside each row. Elementwise ops and axis-1 reductions
are JVM array expressions; axis-0 reductions lower to
posexplode + groupBy(dim) (map-side partial aggregation); matmul
against a small literal matrix broadcasts it into the plan — the same
chunked-vs-broadcast split dask uses for (tall, skinny) @ (small)."""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

from dask_spark.frame import DaskFrame


class DArray:
    def __init__(self, sdf, col: str = "embedding", id_col: str | None = None,
                 nparts: int | None = None):
        self._sdf = sdf
        self._col = col
        self._id = id_col
        self._nparts = nparts  # known partition count (set by rechunk)

    @classmethod
    def from_frame(cls, frame: DaskFrame, col: str, id_col: str | None = None) -> "DArray":
        return cls(frame._sdf, col, id_col)

    def _keep(self):
        return [self._id] if self._id else []

    # ---- slicing (reference: dask/array/slicing.py) --------------------
    def __getitem__(self, key) -> "DArray":
        """``x[rows]`` / ``x[rows, dims]`` with python slice semantics
        (reference: dask/array/slicing.py slice_array).

        Row axis: positional selection over ``id_col`` order via the
        scale-safe global index (range partition + per-partition
        row_number + driver offsets — operators/sort.py), then a plain
        filter on the index: start/stop/step never collapse to one
        partition. Dim axis: contiguous slices lower to ``F.slice``
        (JVM codegen); stepped slices / int lists to an element gather
        ``F.array(getItem(i)…)``; an int dim returns the scalar column.
        Negative indices are unsupported (length is not known without a
        count — dask raises similarly for unknown chunks)."""
        rows, dims = key if isinstance(key, tuple) else (key, slice(None))
        sdf = self._sdf
        if isinstance(rows, slice):
            if not (rows.start is None and rows.stop is None and rows.step is None):
                if self._id is None:
                    raise ValueError("row slicing requires id_col (positional order)")
                start = rows.start or 0
                step = rows.step or 1
                if start < 0 or (rows.stop is not None and rows.stop < 0) or step <= 0:
                    raise ValueError("negative row slicing unsupported (unknown length)")
                from dask_spark.operators.sort import with_global_index

                idx = with_global_index(sdf, self._id, "__row")
                cond = F.col("__row") >= start
                if rows.stop is not None:
                    cond = cond & (F.col("__row") < rows.stop)
                if step != 1:
                    cond = cond & ((F.col("__row") - start) % step == 0)
                sdf = idx.filter(cond).drop("__row")
        elif isinstance(rows, (list, tuple)):
            # fancy row indexing (reference: dask/array/slicing.py
            # take): positions over id order via the global index, one
            # isin filter — the position list is driver data like
            # dask's index arrays
            if self._id is None:
                raise ValueError("fancy row indexing requires id_col")
            if any(isinstance(i, bool) or getattr(i, "dtype", None) is not None
                   and getattr(i, "dtype", None).kind == "b" for i in rows):
                # True/False would silently read as rows 1/0 — numpy
                # boolean masks don't port to positions; dask raises
                # IndexError on bool lists of the wrong length too
                raise TypeError(
                    "boolean list row selection is not positional — use "
                    "a Column predicate mask (x[mask_column]) instead"
                )
            if any(int(i) < 0 for i in rows):
                raise ValueError("negative row indices unsupported")
            from dask_spark.operators.sort import with_global_index

            idx = with_global_index(sdf, self._id, "__row")
            sdf = idx.filter(
                F.col("__row").isin([int(i) for i in rows])
            ).drop("__row")
        elif isinstance(rows, Column):
            # boolean-mask rows (dask x[mask]): any predicate Column
            # over this array's frame — a plain pushdown-able filter
            sdf = sdf.filter(rows)
        elif hasattr(rows, "_expr"):  # Series boolean mask
            sdf = sdf.filter(rows._expr)
        else:
            raise TypeError(f"unsupported row selector {rows!r}")

        col = F.col(self._col)
        if isinstance(dims, int):
            if dims < 0:
                raise ValueError("negative dim index unsupported")
            sel = col.getItem(dims).alias(self._col)
        elif isinstance(dims, slice):
            if dims.start is None and dims.stop is None and dims.step is None:
                sel = col.alias(self._col)
            else:
                d0 = dims.start or 0
                dstep = dims.step or 1
                if d0 < 0 or (dims.stop is not None and dims.stop < 0) or dstep <= 0:
                    raise ValueError("negative dim slicing unsupported")
                if dstep == 1:
                    length = (
                        F.lit(dims.stop - d0)
                        if dims.stop is not None
                        else F.size(col) - d0
                    )
                    sel = F.slice(col, d0 + 1, length).alias(self._col)
                else:
                    if dims.stop is None:
                        raise ValueError("stepped dim slice needs an explicit stop")
                    sel = F.array(
                        *[col.getItem(i) for i in range(d0, dims.stop, dstep)]
                    ).alias(self._col)
        elif isinstance(dims, (list, tuple)):
            sel = F.array(*[col.getItem(int(i)) for i in dims]).alias(self._col)
        else:
            raise TypeError(f"unsupported dim selector {dims!r}")
        return DArray(sdf.select(*self._keep(), sel), self._col, self._id)

    # ---- partitioning (reference: dask/array/rechunk.py) ---------------
    def rechunk(self, npartitions: int) -> "DArray":
        """Row-axis rechunk: dask rewrites the chunk graph; here the
        row axis IS the partitioning, so this is a repartition (a
        shuffle-free coalesce when shrinking, a no-op when the count
        already matches)."""
        cur = self.npartitions
        if npartitions == cur:
            return self
        sdf = (
            self._sdf.coalesce(npartitions)
            if npartitions < cur
            else self._sdf.repartition(npartitions)
        )
        return DArray(sdf, self._col, self._id, nparts=npartitions)

    @property
    def npartitions(self) -> int:
        # rdd-free (Spark Connect-safe): a rechunk target when known,
        # else ONE cached tiny job counting distinct partition ids.
        # Empty partitions are invisible to the job, so this is a lower
        # bound — rechunk's coalesce-vs-repartition choice degrades to
        # an extra shuffle on undercount, never a wrong answer.
        if self._nparts is None:
            self._nparts = (
                self._sdf.select(F.spark_partition_id().alias("p"))
                .distinct().count()
            )
        return self._nparts

    def _unary(self, build) -> "DArray":
        out = self._sdf.select(
            *self._keep(), build(F.col(self._col)).alias(self._col)
        )
        return DArray(out, self._col, self._id)

    # ---- elementwise (axis-preserving) --------------------------------
    def map(self, fn) -> "DArray":
        """Elementwise fn over every entry (dask ufunc): ``fn`` is a
        Column builder applied via transform."""
        return self._unary(lambda c: F.transform(c, fn))

    def __add__(self, o):
        return self._binop(o, lambda x, y: x + y)

    def __sub__(self, o):
        return self._binop(o, lambda x, y: x - y)

    def __mul__(self, o):
        return self._binop(o, lambda x, y: x * y)

    def _binop(self, o, fn) -> "DArray":
        if isinstance(o, (int, float)):
            return self.map(lambda x: fn(x, F.lit(float(o))))
        if isinstance(o, DArray):  # row-aligned requires same source
            if o._sdf is not self._sdf:
                raise ValueError(
                    "binary op on DArrays from different lineages: the "
                    "operand would resolve by column name in the wrong "
                    "plan — join on the id column first (align())"
                )
            if o._col == self._col:
                # same plan, same column: fn(x, x) elementwise is valid
                return self._unary(lambda c: F.zip_with(c, c, fn))
            return self._unary(
                lambda c: F.zip_with(c, F.col(o._col), fn)
            )
        raise TypeError(f"unsupported operand {o!r}")

    # ---- axis=1 reductions (per row, JVM) -----------------------------
    def sum(self, axis: int = 1):
        if axis == 1:
            return self._reduce_rows(
                lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x), "sum"
            )
        return self._axis0("sum", F.sum)

    def mean(self, axis: int = 1, _name: str = "mean"):
        if axis == 1:
            # empty-row guard: numpy mean([]) is nan; without it the
            # 0/0 division errors under ANSI (Spark 4 default)
            return self._reduce_rows(
                lambda c: F.when(
                    F.size(c) > 0,
                    F.aggregate(c, F.lit(0.0), lambda a, x: a + x)
                    / F.size(c),
                ),
                _name,
            )
        return self._axis0("mean", F.avg)

    def max(self, axis: int = 1):
        if axis == 1:
            return self._reduce_rows(F.array_max, "max")
        return self._axis0("max", F.max)

    def min(self, axis: int = 1):
        if axis == 1:
            return self._reduce_rows(F.array_min, "min")
        return self._axis0("min", F.min)

    def std(self, axis: int = 0):
        if axis != 0:
            raise NotImplementedError("per-row std: compose mean/map")
        return self._axis0("std", F.stddev_pop)

    def argmax(self, axis: int = 1) -> DaskFrame:
        from dask_spark.functions.vector import argmax

        return self._reduce_rows(argmax, "argmax")

    def norm(self, ord: int | float | str = 2) -> DaskFrame:
        """Per-row vector norm (reference: dask/array/linalg.py norm):
        ord 2 (default), 1 (sum |x|), inf (max |x|), or any p > 0."""
        from dask_spark.functions.vector import norm

        if ord == 2:
            return self._reduce_rows(norm, "norm")
        if ord == 1:
            return self._reduce_rows(
                lambda c: F.aggregate(
                    c, F.lit(0.0), lambda a, x: a + F.abs(x)
                ),
                "norm",
            )
        if ord in ("inf", float("inf")):
            return self._reduce_rows(
                lambda c: F.array_max(F.transform(c, F.abs)), "norm"
            )
        p = float(ord)
        if p <= 0:
            raise ValueError("ord must be positive, 'inf', 1 or 2")
        return self._reduce_rows(
            lambda c: F.pow(
                F.aggregate(
                    c, F.lit(0.0), lambda a, x: a + F.pow(F.abs(x), p)
                ),
                1.0 / p,
            ),
            "norm",
        )

    def _reduce_rows(self, build, name: str) -> DaskFrame:
        return DaskFrame(
            self._sdf.select(
                *self._keep(), build(F.col(self._col)).alias(name)
            )
        )

    # ---- axis=0 reductions (across rows, distributed) -----------------
    def _axis0(self, name: str, agg) -> list:
        per_dim = (
            self._sdf.select(F.posexplode(F.col(self._col)).alias("dim", "x"))
            .groupBy("dim")
            .agg(agg("x").alias("v"))
            .orderBy("dim")
            .collect()
        )
        return [r.v for r in per_dim]

    def percentile(self, q: float, axis: int = 0,
                   exact: bool = True) -> list:
        """Per-component percentile across rows (reference:
        dask/array/percentile.py percentile — dask's is approximate
        from per-chunk percentiles; here ``exact=True`` uses Spark's
        exact distributed percentile, ``exact=False`` the
        percentile_approx sketch, both one posexplode + groupBy(dim)
        shuffle of scalars, never vectors)."""
        if axis != 0:
            raise ValueError("percentile supports axis=0 (per-dim); "
                             "use median() for per-row")
        fn = (lambda c: F.percentile(c, F.lit(q))) if exact else (
            lambda c: F.percentile_approx(c, F.lit(q))
        )
        return self._axis0(f"p{q}", fn)

    def gram(self):
        """Returns ``(G, col_sums, n)`` where G = XᵀX as a small d×d
        numpy array (reference: dask.array's ``X.T @ X`` blockwise
        contraction, array/routines.py matmul): per-partition Gram
        blocks + column sums, summed on the driver — the tsqr
        accumulation pattern. Shuffle-free: d²+d doubles per partition
        travel to the driver, the n×d data never moves. The sums/n
        ride along so cov() needs no second pass."""
        import numpy as np
        import pandas as pd

        col = self._col

        def local_g(it):
            acc, sums, n = None, None, 0
            for c in it:
                if not len(c):
                    continue
                X = np.array(c[col].tolist(), dtype="float64")
                g = X.T @ X
                acc = g if acc is None else acc + g
                sums = X.sum(0) if sums is None else sums + X.sum(0)
                n += len(X)
            if acc is not None:
                yield pd.DataFrame(
                    {
                        "__i": list(range(len(acc))) + [-1],
                        "__g": list(acc) + [sums],
                        "__n": [n] * (len(acc) + 1),
                    }
                )

        rows = self._sdf.select(col).mapInPandas(
            local_g, schema="__i int, __g array<double>, __n long"
        ).collect()
        if not rows:
            raise ValueError("gram of an empty array")
        d = max(r["__i"] for r in rows) + 1
        G = np.zeros((d, d))
        sums = np.zeros(d)
        n = 0
        for r in rows:
            if r["__i"] == -1:
                sums += np.array(list(r["__g"]))
                n += r["__n"]
            else:
                G[r["__i"]] += np.array(list(r["__g"]))
        return G, sums, n

    def cov(self, ddof: int = 1):
        """d×d covariance of the components across rows (reference:
        dask.array cov/corrcoef path) — one Gram pass:
        (XᵀX − n·μμᵀ)/(n − ddof)."""
        import numpy as np

        G, sums, n = self.gram()
        if n - ddof <= 0:
            raise ValueError("need more rows than ddof")
        mu = sums / n
        return (G - n * np.outer(mu, mu)) / (n - ddof)

    def corrcoef(self):
        """Pearson correlation matrix from cov() (dask.array.corrcoef)."""
        import numpy as np

        c = self.cov(ddof=0)
        sd = np.sqrt(np.diag(c))
        sd[sd == 0] = 1.0
        return c / np.outer(sd, sd)

    # ---- linalg-ish ---------------------------------------------------
    def dot(self, vector: Sequence[float]) -> DaskFrame:
        """(n × d) @ (d,) → n scalars; the vector is a plan literal."""
        from dask_spark.functions.vector import dot as vdot

        q = F.array(*[F.lit(float(x)) for x in vector])
        return self._reduce_rows(lambda c: vdot(c, q), "dot")

    def matmul(self, matrix: Sequence[Sequence[float]]) -> "DArray":
        """(n × d) @ (d × k) for a SMALL literal k-column matrix —
        broadcast into the expression, map-only (dask: blockwise with a
        broadcast operand). Columns of the result = dots against each
        matrix column."""
        from dask_spark.functions.vector import dot as vdot

        cols = list(zip(*matrix))  # k columns of length d
        out = self._sdf.select(
            *self._keep(),
            F.array(
                *[
                    vdot(F.col(self._col),
                         F.array(*[F.lit(float(x)) for x in col]))
                    for col in cols
                ]
            ).alias(self._col),
        )
        return DArray(out, self._col, self._id)

    def map_blocks(self, fn, with_info: bool = False) -> "DArray":
        """Arbitrary per-block ndarray transform (reference:
        dask/array/core.py:551 map_blocks; dask ships each chunk to
        ``fn`` with optional block_info). The Spark block is the row
        partition: one whole-partition Arrow batch per task, map-only,
        no shuffle. ``fn(X)`` (or ``fn(X, info)`` when ``with_info`` —
        info carries the partition id and row count, dask's block_info
        analog) takes the (rows × d) float64 ndarray and must return an
        ndarray with the SAME row count (row-aligned, like dask
        map_blocks with unchanged chunks); the column count may
        change."""
        import numpy as np
        import pandas as pd

        if self._id is None:
            raise ValueError("map_blocks requires id_col (row alignment)")
        idc, col = self._id, self._col
        id_type = dict(self._sdf.dtypes)[idc]
        base = self._sdf.select(idc, col)
        if with_info:
            base = base.withColumn("__bpid", F.spark_partition_id())

        def run(it):
            chunks = [c for c in it if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            X = np.array(pdf[col].tolist(), dtype="float64")
            if with_info:
                info = {"partition": int(pdf["__bpid"].iloc[0]),
                        "rows": len(pdf)}
                out = np.asarray(fn(X, info), dtype="float64")
            else:
                out = np.asarray(fn(X), dtype="float64")
            if out.shape[0] != len(pdf):
                raise ValueError(
                    f"map_blocks fn changed the row count "
                    f"({len(pdf)} -> {out.shape[0]}); blocks must stay "
                    "row-aligned"
                )
            yield pd.DataFrame({idc: pdf[idc], col: list(out)})

        return DArray(
            base.mapInPandas(run, schema=f"{idc} {id_type}, {col} array<double>"),
            col, idc,
        )

    # ---- small dask.array-surface parity -------------------------------
    @property
    def ndim(self) -> int:
        return 2

    @property
    def shape(self):
        """(rows, dim) — rows is a count job; dim from one row."""
        first = self._sdf.select(F.size(F.col(self._col))).first()
        d = int(first[0]) if first else 0
        return (self._sdf.count(), d)

    @property
    def size(self) -> int:
        n, d = self.shape
        return n * d

    @property
    def dtype(self) -> str:
        inner = dict(self._sdf.dtypes)[self._col]
        return inner.removeprefix("array<").removesuffix(">")

    @property
    def nbytes(self) -> int:
        from dask_spark.plans import estimated_size_bytes

        return estimated_size_bytes(DaskFrame(self._sdf))

    def astype(self, dtype: str) -> "DArray":
        return self._unary(lambda c: c.cast(f"array<{dtype}>"))

    def clip(self, lo, hi) -> "DArray":
        return self.map(lambda x: F.least(F.greatest(x, F.lit(lo)), F.lit(hi)))

    def round(self, n: int = 0) -> "DArray":
        return self.map(lambda x: F.round(x, n))

    def prod(self, axis: int = 1) -> DaskFrame:
        if axis != 1:
            raise ValueError("prod supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: F.aggregate(c, F.lit(1.0), lambda a, x: a * x), "prod"
        )

    def var(self, axis: int = 0):
        """Per-dimension sample variance (axis=0, like std)."""
        if axis != 0:
            raise ValueError("var supports axis=0")
        return self._axis0("var", F.var_samp)

    def argmin(self, axis: int = 1) -> DaskFrame:
        from dask_spark.functions.vector import argmin as _argmin

        if axis != 1:
            raise ValueError("argmin supports axis=1")
        return self._reduce_rows(_argmin, "argmin")

    def topk(self, k: int, axis: int = 1) -> "DArray":
        """k largest entries per row, descending (dask argtopk/topk
        family) — in-row sort_array + slice, map-only."""
        if axis != 1:
            raise ValueError("topk supports axis=1 (per-row)")
        return self._unary(
            lambda c: F.slice(F.sort_array(c, asc=False), 1, k)
        )

    # ---- cheap 2-D twins of dask.array routines (array/routines.py,
    # array/reductions.py) — all in-row expressions, map-only ----------
    def any(self, axis: int = 1) -> DaskFrame:
        if axis != 1:
            raise ValueError("any supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: F.exists(c, lambda x: x != 0), "any"
        )

    def all(self, axis: int = 1) -> DaskFrame:
        if axis != 1:
            raise ValueError("all supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: ~F.exists(c, lambda x: x == 0), "all"
        )

    def ptp(self, axis: int = 1) -> DaskFrame:
        """Peak-to-peak (max - min) per row (array/reductions.py ptp)."""
        if axis != 1:
            raise ValueError("ptp supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: F.array_max(c) - F.array_min(c), "ptp"
        )

    def average(self, weights: Sequence[float] | None = None) -> DaskFrame:
        """Weighted per-row mean vs a literal weight vector
        (array/routines.py:2561 average); weights=None is the plain
        mean, numpy's default (delegates — one guarded reduction, not
        two copies)."""
        if weights is None:
            return self.mean(axis=1, _name="average")
        from dask_spark.functions.vector import dot as vdot

        w = [float(x) for x in weights]
        total = sum(w)
        if total == 0:
            raise ValueError("weights sum to zero")
        q = F.array(*[F.lit(x) for x in w])
        return self._reduce_rows(
            lambda c: vdot(c, q) / F.lit(total), "average"
        )

    def diff(self, n: int = 1, axis: int = 1) -> "DArray":
        """n-th discrete difference along the row (array/routines.py
        diff): result dim shrinks by n."""
        if axis != 1:
            raise ValueError("diff supports axis=1 (per-row)")
        out = self
        for _ in range(n):
            out = out._unary(
                lambda c: F.zip_with(
                    F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0))),
                    F.slice(c, 1, F.greatest(F.size(c) - 1, F.lit(0))),
                    lambda a, b: a - b,
                )
            )
        return out

    def roll(self, shift: int, axis: int = 1) -> "DArray":
        """Circular shift along the row (array/routines.py roll)."""
        if axis != 1:
            raise ValueError("roll supports axis=1 (per-row)")

        def build(c):
            k = F.pmod(F.lit(-shift), F.size(c)) + 1  # 1-based split point
            rolled = F.concat(
                F.slice(c, k, F.size(c) - k + 1), F.slice(c, 1, k - 1)
            )
            # pmod(x, 0) is null — keep empty rows empty, not null
            return F.when(F.size(c) == 0, c).otherwise(rolled)

        return self._unary(build)

    def count_nonzero(self, axis: int = 1) -> DaskFrame:
        if axis != 1:
            raise ValueError("count_nonzero supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: F.size(F.filter(c, lambda x: x != 0)), "count_nonzero"
        )

    def unique(self, return_counts: bool = False,
               return_index: bool = False, return_inverse: bool = False):
        """Sorted distinct values across the whole array
        (array/routines.py:1769 unique) — explode + distinct (or a
        count aggregate for return_counts), a scalar shuffle; values
        (not vectors) travel. return_index/return_inverse need a flat
        POSITIONAL order across rows, which this engine deliberately
        does not define — raise with guidance (compose with the id
        column and a join instead)."""
        if return_index or return_inverse:
            raise NotImplementedError(
                "unique(return_index/return_inverse) needs a flat "
                "positional order; join on the id column instead"
            )
        import numpy as np

        if return_counts:
            rows = (
                self._sdf.select(F.explode(F.col(self._col)).alias("x"))
                .groupBy("x").agg(F.count(F.lit(1)).alias("n"))
                .orderBy("x")
                .collect()
            )
            return (
                np.array([r["x"] for r in rows]),
                np.array([r["n"] for r in rows], dtype="int64"),
            )
        rows = (
            self._sdf.select(F.explode(F.col(self._col)).alias("x"))
            .distinct()
            .orderBy("x")
            .collect()
        )
        return [r["x"] for r in rows]

    def median(self, axis: int = 1) -> DaskFrame:
        """Per-row exact median: in-row sort + middle (mean of the two
        middles for even dim)."""
        if axis != 1:
            raise ValueError("median supports axis=1 (per-row); use "
                             "percentile(0.5) for axis=0")

        def build(c):
            s = F.array_sort(c)
            n = F.size(s)
            lo = F.try_element_at(s, ((n + 1) / 2).cast("int"))
            hi = F.try_element_at(s, (n / 2 + 1).cast("int"))
            return (lo + hi) / 2

        return self._reduce_rows(build, "median")

    def nansum(self, axis: int = 1) -> DaskFrame:
        """NaN/null-ignoring per-row sum (array/reductions.py nansum)."""
        if axis != 1:
            raise ValueError("nansum supports axis=1 (per-row)")
        return self._reduce_rows(
            lambda c: F.aggregate(
                F.filter(c, lambda x: ~F.isnan(x) & x.isNotNull()),
                F.lit(0.0), lambda a, x: a + x,
            ),
            "nansum",
        )

    def nanmean(self, axis: int = 1) -> DaskFrame:
        if axis != 1:
            raise ValueError("nanmean supports axis=1 (per-row)")

        def build(c):
            kept = F.filter(c, lambda x: ~F.isnan(x) & x.isNotNull())
            mean = F.aggregate(
                kept, F.lit(0.0), lambda a, x: a + x
            ) / F.size(kept)
            # all-NaN row: numpy returns NaN, not null / divide-by-zero
            return F.when(F.size(kept) == 0, F.lit(float("nan"))).otherwise(mean)

        return self._reduce_rows(build, "nanmean")

    def isin(self, values: Sequence) -> "DArray":
        """Per-element membership mask (array/routines.py isin)."""
        vals = list(values)
        return self._unary(
            lambda c: F.transform(
                c, lambda x: x.isin(*vals) if vals else F.lit(False)
            )
        )

    def to_dask_dataframe(self) -> DaskFrame:
        return self.to_frame()

    def reshape(self, *inner_shape) -> "object":
        """View the (n, dim) array as an (n, *inner_shape) NDArray —
        the bridge into the N-D world (dask reshape keeping axis 0:
        the row extent is unchanged, trailing dims restructure). The
        product of ``inner_shape`` must equal the vector dim (checked
        lazily at evaluation, like dask with unknown chunk sizes)."""
        from dask_spark.ndarray import NDArray

        if len(inner_shape) == 1 and isinstance(inner_shape[0], (tuple, list)):
            inner_shape = tuple(inner_shape[0])
        return NDArray(
            self._sdf.select(
                *([self._id] if self._id else []),
                F.col(self._col).cast("array<double>").alias("block"),
            ),
            tuple(int(s) for s in inner_shape),
            "block",
            self._id,
        )

    def cumsum(self, axis: int = 1) -> "DArray":
        """Per-row prefix sums along the dim axis (reference:
        dask/array/reductions.py cumsum). An in-row array scan via
        ``F.aggregate`` — map-only; d is accessor-scale so the O(d)
        interpreted fold per row is fine. axis=0 (down the rows) is
        intentionally unsupported: it would need a global-order prefix
        carry per dimension — use to_frame + the keyless cumulative
        machinery per column instead."""
        if axis != 1:
            raise ValueError("cumsum supports axis=1 (per-row) only")
        return self._unary(
            lambda c: F.aggregate(
                c,
                F.array().cast("array<double>"),
                lambda acc, x: F.concat(
                    acc,
                    F.array(
                        F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x
                    ),
                ),
            )
        )

    def cumprod(self, axis: int = 1) -> "DArray":
        """Per-row prefix products along the dim axis."""
        if axis != 1:
            raise ValueError("cumprod supports axis=1 (per-row) only")
        return self._unary(
            lambda c: F.aggregate(
                c,
                F.array().cast("array<double>"),
                lambda acc, x: F.concat(
                    acc,
                    F.array(
                        F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(1.0)) * x
                    ),
                ),
            )
        )

    def fft(self, out_re: str = "fft_re", out_im: str = "fft_im") -> DaskFrame:
        """1-D DFT along the dim axis, one transform per row
        (reference: dask/array/fft.py fft — dask requires the FFT axis
        to be one chunk; here the dim axis is always in-row, so the
        transform is embarrassingly parallel: Arrow batch → numpy
        fft → re/im columns, map-only, no shuffle). Spark has no
        complex type, so the result is a frame (id, re[], im[])."""
        import numpy as np
        import pandas as pd

        if self._id is None:
            raise ValueError("fft requires id_col (row identity)")
        idc, col = self._id, self._col
        id_type = dict(self._sdf.dtypes)[idc]

        def run(it):
            for pdf in it:
                if not len(pdf):
                    continue
                X = np.array(pdf[col].tolist(), dtype="float64")
                C = np.fft.fft(X, axis=1)
                yield pd.DataFrame(
                    {idc: pdf[idc], out_re: list(C.real), out_im: list(C.imag)}
                )

        out = self._sdf.select(idc, col).mapInPandas(
            run,
            schema=f"{idc} {id_type}, {out_re} array<double>, "
                   f"{out_im} array<double>",
        )
        return DaskFrame(out)

    def _matmul_np(self, M) -> "DArray":
        """(n × d) @ literal (d × k) via ONE Arrow-batched numpy matmul
        per batch — the batched twin of :meth:`matmul` for dense
        matrices where k×d per-element Column expressions would be
        interpreted-HOF slow (same lesson as the LSH signature batch)."""
        import numpy as np
        import pandas as pd

        idc, col = self._id, self._col
        if idc is None:
            raise ValueError("_matmul_np requires id_col")
        Mat = np.asarray(M, dtype="float64")
        id_type = dict(self._sdf.dtypes)[idc]
        schema = f"{idc} {id_type}, {col} array<double>"

        def run(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf[col].tolist(), dtype="float64")
                yield pd.DataFrame({idc: pdf[idc], col: list(X @ Mat)})

        return DArray(
            self._sdf.select(idc, col).mapInPandas(run, schema=schema),
            col, idc,
        )

    # ---- linalg: tall-skinny QR / SVD ---------------------------------
    def qr(self):
        """QR dispatch (reference: dask/array/linalg.py qr — tsqr for
        tall-skinny, sfqr for short-fat). Tall (rows ≥ dim): the
        distributed TSQR tree, Q a row-aligned DArray. Short-fat
        (rows < dim): the matrix is n×d with FEW rows by definition —
        driver numpy QR over the collected rows (dask's sfqr likewise
        requires the row axis in one chunk), returning (Q, R) as
        ndarrays with the same sign fix."""
        import numpy as np

        row = self._sdf.select(self._col).first()
        if row is None:
            raise ValueError("qr of an empty array")
        d = len(row[0])
        n = self._sdf.count()
        if n >= d:
            return self.tsqr()
        A = self._collect_matrix()
        Q, R = np.linalg.qr(A)
        s = np.sign(np.diag(R))
        s[s == 0] = 1.0
        return Q * s, R * s[:, None]

    def tsqr(self):
        """Direct tall-and-skinny QR (reference: dask/array/linalg.py:60
        tsqr; Benson/Gleich/Demmel's communication-avoiding TSQR —
        dask builds the same two-level tree over chunks).

        Spark shape: (1) each row partition computes a LOCAL
        ``numpy.linalg.qr`` inside ``mapInPandas`` (whole-partition
        Arrow batch) and emits only its small R block — k_i × d rows;
        (2) the stacked R blocks (Σk_i × d ≪ n — the ONLY driver data)
        get one driver-side QR → final R and per-partition Q2 slices;
        (3) a second map-only pass re-derives each partition's local Q
        and multiplies by its broadcast Q2 slice. The input plan is
        pinned so both passes see identical partitions. Sign-fixed
        (non-negative R diagonal) at both levels, so the result is
        deterministic for a fixed partitioning.

        Returns ``(Q, R)``: Q a DArray row-aligned with the input
        (orthonormal columns), R a d×d numpy upper-triangular."""
        return self._tsqr(None)

    def svd(self):
        """Tall-skinny SVD via tsqr (reference: dask/array/linalg.py
        svd): X = QR, R = U_r Σ Vᵀ (driver SVD of the small R), then
        U = Q·U_r fused into tsqr's second pass — still two distributed
        map passes total. Returns (U DArray, s ndarray, Vt ndarray)."""
        import numpy as np

        out = {}

        def post(Rf):
            U_r, s, Vt = np.linalg.svd(Rf)
            out["s"], out["Vt"] = s, Vt
            return U_r

        U = self._tsqr(post)[0]
        return U, out["s"], out["Vt"]

    def lstsq(self, b, b_col: str):
        """Least squares min‖Ax − b‖ via tsqr (reference:
        dask/array/linalg.py lstsq — dask solves R x = Qᵀb the same
        way): Q,R = tsqr(A); Qᵀb is a per-row scale (JVM transform)
        plus ONE axis-0 sum (d scalars to the driver); the d×d
        triangular solve is driver-side numpy. ``b`` is a DaskFrame
        carrying (id_col, b_col) aligned with this array's id_col.
        Returns the coefficient ndarray (length d)."""
        import numpy as np

        if self._id is None:
            raise ValueError("lstsq requires id_col alignment")
        Q, R = self.tsqr()
        joined = Q._sdf.join(
            b._sdf.select(F.col(self._id), F.col(b_col)), on=self._id
        )
        scaled = joined.select(
            F.transform(
                F.col(self._col), lambda q: q * F.col(b_col).cast("double")
            ).alias("qb")
        )
        c = (
            scaled.select(F.posexplode("qb").alias("dim", "x"))
            .groupBy("dim").agg(F.sum("x").alias("v"))
            .orderBy("dim").collect()
        )
        return np.linalg.solve(R, np.array([r["v"] for r in c]))

    def solve(self, b, b_col: str):
        """Solve ``A x = b`` (reference: dask/array/linalg.py:1208
        solve — dask runs LU over blocks; for the tall/square rows×dim
        model the TSQR route is the stable Spark-first equivalent):
        Q,R = tsqr(A), x = R⁻¹(Qᵀb). For a square nonsingular A this is
        the exact solution; for tall A it coincides with the
        least-squares solution (same normal equations) — both from two
        distributed map passes plus a d×d driver triangular solve."""
        return self.lstsq(b, b_col)

    def inv(self):
        """Inverse of a square A, returned TRANSPOSED as a row-aligned
        DArray (row i = column i of A⁻¹) so the result stays
        distributed (reference: dask/array/linalg.py:1268 inv = solve
        vs identity). Via tsqr: A = QR ⇒ A⁻¹ = R⁻¹Qᵀ ⇒ A⁻¹ᵀ = Q·R⁻ᵀ —
        one broadcast d×d back-multiply on Q's map pass; only R (d×d)
        ever sits on the driver. Callers needing the materialized
        matrix collect d rows."""
        import numpy as np

        Q, R = self.tsqr()
        d = R.shape[0]
        if abs(np.linalg.det(R)) < 1e-300:
            raise np.linalg.LinAlgError("matrix is singular")
        rinv_t = np.linalg.inv(R).T
        return Q.matmul(rinv_t)

    def cholesky(self, of: str = "gram"):
        """Cholesky factor, driver-side d×d ndarray (reference:
        dask/array/linalg.py:1295 cholesky).

        ``of='gram'`` (default): L with L@Lᵀ = AᵀA — the square SPD
        matrix a tall distributed pipeline actually produces (normal
        equations, covariance up to centering). Free by construction:
        tsqr's sign-fixed R has a non-negative diagonal, so L = Rᵀ IS
        the (unique) Cholesky factor of RᵀR = AᵀA; cost is the tsqr
        R pass only (no Q rebuild).

        ``of='self'``: A itself is the d×d SPD matrix (n == d rows,
        e.g. a collected covariance); factorized on the driver — d is
        small by the same contract that bounds tsqr (d ≤ ~300 at 1000
        executors)."""
        import numpy as np

        if of == "gram":
            # R-only tsqr: reuse the partial-R tree without the Q pass
            R = self._tsqr_r_only()
            if R.shape[0] != R.shape[1]:
                # fewer rows than dims: the gram is rank-deficient and
                # has no Cholesky factor (numpy raises LinAlgError too)
                raise ValueError(
                    f"cholesky of a rank-deficient gram: need >= dim "
                    f"rows, R is {R.shape}"
                )
            return R.T
        if of != "self":
            raise ValueError("of must be 'gram'|'self'")
        rows = sorted(
            self._sdf.select(self._id, self._col).collect(),
            key=lambda r: r[self._id],
        )
        A = np.array([list(r[self._col]) for r in rows], dtype="float64")
        if A.shape[0] != A.shape[1]:
            raise ValueError(f"cholesky(of='self') needs square, got {A.shape}")
        return np.linalg.cholesky(A)

    def _collect_matrix(self):
        """Rows in id order as a driver ndarray — the small-matrix
        escape hatch every d×d driver op shares (same d ≤ ~300
        contract as tsqr's R)."""
        import numpy as np

        if self._id is None:
            raise ValueError("driver matrix ops require id_col order")
        rows = sorted(
            self._sdf.select(self._id, self._col).collect(),
            key=lambda r: r[self._id],
        )
        return np.array([list(r[self._col]) for r in rows], dtype="float64")

    def lu(self):
        """LU with partial pivoting of a SQUARE matrix, a = p @ l @ u
        (reference: dask/array/linalg.py:978 lu — dask runs a blocked
        right-looking LU over square chunks; in the rows×dim model a
        square A is d×d DRIVER data by the same contract that bounds
        tsqr's R, so the factorization is a driver op like solve/inv's
        final stage). Returns (p, l, u) ndarrays: p a permutation,
        l unit-lower-triangular, u upper-triangular."""
        import numpy as np

        A = self._collect_matrix()
        d, d2 = A.shape
        if d != d2:
            raise ValueError(f"lu needs a square matrix, got {A.shape}")
        U = A.copy()
        L = np.eye(d)
        piv = np.arange(d)
        for k in range(d):
            p = int(np.argmax(np.abs(U[k:, k]))) + k
            if U[p, k] == 0.0:
                raise np.linalg.LinAlgError("matrix is singular")
            if p != k:
                U[[k, p], k:] = U[[p, k], k:]
                L[[k, p], :k] = L[[p, k], :k]
                piv[[k, p]] = piv[[p, k]]
            for i in range(k + 1, d):
                L[i, k] = U[i, k] / U[k, k]
                U[i, k:] -= L[i, k] * U[k, k:]
                U[i, k] = 0.0
        P = np.zeros((d, d))
        P[piv, np.arange(d)] = 1.0
        return P, L, U

    def svd_compressed(self, k: int, n_power_iter: int = 0,
                       n_oversamples: int = 10, seed: int = 7):
        """Randomized truncated SVD (reference: dask/array/linalg.py:746
        svd_compressed; Halko/Martinsson/Tropp). Spark shape, per
        pass all map-only or tsqr:

        1. Ω: a driver (d, k+p) Gaussian literal (seeded, broadcast).
        2. Y = A@Ω — one map-only literal matmul.
        3. optional power iterations Y ← A(AᵀY): AᵀY is a cross-gram
           (per-partition numpy blocks, d(k+p) doubles to the driver),
           the back-multiply another literal matmul.
        4. Q, R = tsqr(Y) (two map passes, R driver-side).
        5. B = QᵀA — one cross-gram, (k+p)×d on the driver.
        6. driver SVD of B; U = Q@Ũ[:, :k] — one literal matmul.

        Returns (U DArray row-aligned, s (k,), Vt (k, d))."""
        import numpy as np

        row = self._sdf.select(self._col).first()
        if row is None:
            raise ValueError("svd_compressed of an empty array")
        d = len(row[0])
        m = min(k + n_oversamples, d)
        rng = np.random.default_rng(seed)
        omega = rng.standard_normal((d, m))
        Y = self.matmul(omega)
        for _ in range(n_power_iter):
            AtY = _cross_gram(self, Y)          # d × m
            Y = self.matmul(AtY)
        Q, _ = Y.tsqr()
        B = _cross_gram(Q, self)                # m × d
        Ub, s, Vt = np.linalg.svd(B, full_matrices=False)
        U = Q.matmul(Ub[:, :k])
        return U, s[:k], Vt[:k]

    def _tsqr_r_only(self):
        """The R half of tsqr without materializing Q: per-partition
        local QR emits d×d R blocks, one driver QR of the stacked
        blocks. Same communication shape (#partitions × d² floats)."""
        import numpy as np
        import pandas as pd

        col = self._col

        def local_r(it):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            chunks = [c for c in it if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            X = np.array(pdf[col].tolist(), dtype="float64")
            R = np.linalg.qr(X, mode="r")
            yield pd.DataFrame(
                {"__p": pid, "__i": range(len(R)), "__r": list(R)}
            )

        rows = self._sdf.select(col).mapInPandas(
            local_r, schema="__p int, __i int, __r array<double>"
        ).collect()
        if not rows:
            raise ValueError("cholesky of an empty array")
        # stack in explicit (partition, row) order so the driver QR
        # never depends on collect order
        rows = sorted(rows, key=lambda r: (r["__p"], r["__i"]))
        stacked = np.array([list(r["__r"]) for r in rows], dtype="float64")
        R = np.linalg.qr(stacked, mode="r")
        s = np.sign(np.diag(R))
        s[s == 0] = 1.0
        return R * s[:, None]

    def _tsqr(self, post):
        import numpy as np
        import pandas as pd

        if self._id is None:
            raise ValueError("tsqr requires id_col")
        idc, col = self._id, self._col
        # localCheckpoint, not persist: the Q pass joins driver-computed
        # Q2 slices back by PHYSICAL partition id, so both passes must
        # see identical partitions. Checkpointing truncates lineage —
        # the second pass reads materialized blocks and can never
        # re-execute an upstream shuffle with fresh range sampling;
        # block loss surfaces as an error, never a silently different
        # partitioning.
        sdf = (
            self._sdf.select(idc, col)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint()
        )

        def _fix(Q, R):
            k = min(R.shape)
            s = np.sign(np.diag(R)[:k])
            s[s == 0] = 1.0
            return Q * s, R * s[:, None]

        def local_r(it):
            chunks = [c for c in it if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            X = np.array(pdf[col].tolist(), dtype="float64")
            R = np.linalg.qr(X, mode="r")
            _, R = _fix(np.empty((0, R.shape[0])), R)
            yield pd.DataFrame(
                {"__pid": pdf["__pid"].iloc[0], "__i": range(len(R)),
                 "__r": list(R)}
            )

        r_rows = sorted(
            sdf.mapInPandas(
                local_r, schema="__pid int, __i int, __r array<double>"
            ).collect(),
            key=lambda r: (r["__pid"], r["__i"]),
        )
        if not r_rows:
            raise ValueError("tsqr of an empty array")
        pids, sizes, blocks = [], [], {}
        for r in r_rows:
            blocks.setdefault(r["__pid"], []).append(list(r["__r"]))
        stacked = []
        for pid in sorted(blocks):
            pids.append(pid)
            sizes.append(len(blocks[pid]))
            stacked.extend(blocks[pid])
        stacked = np.array(stacked, dtype="float64")
        d = stacked.shape[1]
        if stacked.shape[0] < d:
            raise ValueError(f"tsqr needs >= {d} rows, got {stacked.shape[0]}")
        Q2, Rf = np.linalg.qr(stacked, mode="reduced")
        Q2, Rf = _fix(Q2, Rf)
        right = np.eye(d) if post is None else post(Rf)
        q2_slices, off = {}, 0
        for pid, k in zip(pids, sizes):
            q2_slices[pid] = Q2[off:off + k] @ right
            off += k
        bc = sdf.sparkSession.sparkContext.broadcast(q2_slices)
        id_type = dict(sdf.dtypes)[idc]

        def local_q(it):
            chunks = [c for c in it if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            X = np.array(pdf[col].tolist(), dtype="float64")
            Qi, Ri = np.linalg.qr(X, mode="reduced")
            Qi, _ = _fix(Qi, Ri)
            Qout = Qi @ bc.value[int(pdf["__pid"].iloc[0])]
            yield pd.DataFrame({idc: pdf[idc], col: list(Qout)})

        q_sdf = sdf.mapInPandas(
            local_q, schema=f"{idc} {id_type}, {col} array<double>"
        )
        return DArray(q_sdf, col, idc), Rf

    # ---- materialization ----------------------------------------------
    def to_frame(self) -> DaskFrame:
        return DaskFrame(self._sdf)

    def to_series(self, name: str | None = None):
        """1-column view of per-row arrays as a Series (bridge to the
        frame API — reference: dask Array.to_dask_dataframe).
        ``name`` renames the output column (it is not a selector)."""
        out = name or self._col
        return DaskFrame(
            self._sdf.select(*self._keep(), F.col(self._col).alias(out))
        )[out]

    def compute(self):
        import numpy as np

        rows = self._sdf.select(*self._keep(), self._col).collect()
        return np.array([list(r[self._col]) for r in rows])


def _cross_gram(left: "DArray", right: "DArray"):
    """LᵀR for two row-aligned DArrays: rows join on id, each
    partition contributes ONE numpy L_pᵀR_p block, blocks sum on the
    driver — the tsqr accumulation pattern (shuffle is the id join
    only; dₗ·dᵣ doubles per partition travel, the n×d data never
    re-shuffles beyond the join)."""
    import numpy as np
    import pandas as pd

    if left._id is None or right._id is None:
        raise ValueError("cross gram requires id_col alignment")
    joined = left._sdf.select(
        F.col(left._id).alias("__id"), F.col(left._col).alias("__l")
    ).join(
        right._sdf.select(
            F.col(right._id).alias("__id"), F.col(right._col).alias("__r")
        ),
        on="__id",
    )
    # Gram blocks are formed per LOGICAL GROUP (xxhash64(id) % 256),
    # never per physical partition: block membership is a pure row
    # function, so every double in the driver block-sum is bit-stable
    # across runs, AQE decisions, and cluster sizes. (Earlier shapes
    # keyed blocks on TaskContext.partitionId — the runtime may
    # coalesce the exchange read into fewer tasks run-to-run, which
    # re-splits the BLAS sums and drifted svd_compressed by 1 ulp for
    # the same seed. Rows sort by id inside the group: shuffle fetch
    # order is nondeterministic, the gemm sum is order-sensitive.)
    bucketed = joined.withColumn(
        "__b", F.pmod(F.xxhash64(F.col("__id")), F.lit(256)).cast("int")
    )

    def per_group(pdf):
        pdf = pdf.sort_values("__id", ignore_index=True)
        L = np.array(pdf["__l"].tolist(), dtype="float64")
        R = np.array(pdf["__r"].tolist(), dtype="float64")
        acc = L.T @ R
        return pd.DataFrame(
            {"__p": int(pdf["__b"].iloc[0]),
             "__i": list(range(len(acc))), "__g": list(acc)}
        )

    rows = bucketed.groupBy("__b").applyInPandas(
        per_group, schema="__p int, __i int, __g array<double>"
    ).collect()
    if not rows:
        raise ValueError("cross gram of an empty array")
    # fold in explicit (partition, row) order — collect USUALLY returns
    # partition order, but the block sum must not depend on it (the
    # driver += is the other order-sensitive sum in this pattern)
    rows = sorted(rows, key=lambda r: (r["__p"], r["__i"]))
    dl = max(r["__i"] for r in rows) + 1
    dr = len(rows[0]["__g"])
    G = np.zeros((dl, dr))
    for r in rows:
        G[r["__i"]] += np.array(list(r["__g"]))
    return G


def solve_triangular(a, b, lower: bool = False):
    """Solve a triangular system a x = b (reference:
    dask/array/linalg.py:1114 solve_triangular — dask substitutes
    block-wise; the d×d triangular factor here is driver data by the
    tsqr-R contract, so this is forward/back substitution in numpy).
    ``a`` may be a DArray (collected in id order) or an ndarray; ``b``
    an ndarray vector/matrix. Returns the ndarray solution."""
    import numpy as np

    A = a._collect_matrix() if isinstance(a, DArray) else (
        np.asarray(a, dtype="float64"))
    B = np.asarray(b, dtype="float64")
    d = A.shape[0]
    if A.shape != (d, d):
        raise ValueError(f"triangular factor must be square, got {A.shape}")
    vec = B.ndim == 1
    X = np.zeros((d, 1 if vec else B.shape[1]))
    Bm = B.reshape(d, -1)
    order = range(d) if lower else range(d - 1, -1, -1)
    for i in order:
        if A[i, i] == 0.0:
            raise np.linalg.LinAlgError("singular triangular factor")
        known = A[i, :i] @ X[:i] if lower else A[i, i + 1:] @ X[i + 1:]
        X[i] = (Bm[i] - known) / A[i, i]
    return X.ravel() if vec else X


# ---- constructors / combinators (reference: dask/array/creation.py,
# dask/array/core.py stack/concatenate, dask/array/random.py) ------------


def stack(frame: DaskFrame, cols: Sequence[str], out: str = "stacked",
          id_col: str | None = None) -> DArray:
    """``da.stack([s1, s2, …], axis=1)`` — k scalar columns become one
    (n × k) DArray. Pure projection (F.array), map-only."""
    keep = [id_col] if id_col else []
    sdf = frame._sdf.select(
        *keep, F.array(*[F.col(c).cast("double") for c in cols]).alias(out)
    )
    return DArray(sdf, out, id_col)


def concatenate(arrays: Sequence[DArray], axis: int = 0) -> DArray:
    """``da.concatenate``. axis=0: row union (no shuffle — pure union of
    partition sets). axis=1: per-row vector concat, aligned by id_col
    (one equi-join shuffle per operand; at scale pre-bucket on id)."""
    first = arrays[0]
    if axis == 0:
        sdf = first._sdf.select(*first._keep(), first._col)
        for a in arrays[1:]:
            sdf = sdf.unionByName(
                a._sdf.select(
                    *([a._id] if a._id else []), F.col(a._col).alias(first._col)
                )
            )
        return DArray(sdf, first._col, first._id)
    if axis == 1:
        if any(a._id is None for a in arrays):
            raise ValueError("axis=1 concatenate requires id_col alignment")
        # full outer join: misaligned ids must ERROR (dask concatenate
        # requires aligned shapes), not silently shrink the result the
        # way an inner join would
        sdf = first._sdf.select(first._id, F.col(first._col).alias("__c0"))
        for i, a in enumerate(arrays[1:], start=1):
            sdf = sdf.join(
                a._sdf.select(F.col(a._id).alias(first._id),
                              F.col(a._col).alias(f"__c{i}")),
                on=first._id, how="full_outer",
            )
        parts = [F.col(f"__c{i}") for i in range(len(arrays))]
        aligned = F.when(
            sum((p.isNull().cast("int") for p in parts), F.lit(0)) > 0,
            F.raise_error(F.lit(
                "axis=1 concatenate: operands are misaligned on id_col "
                "(a row id is missing from at least one operand)"
            )).cast("array<double>"),
        ).otherwise(F.concat(*parts))
        sdf = sdf.select(first._id, aligned.alias(first._col))
        return DArray(sdf, first._col, first._id)
    raise ValueError(f"axis must be 0 or 1, got {axis}")


_M31 = (1 << 31) - 1


def _counter_uniform(id_col, j: int, k: int, seed: int):
    """Counter-based uniform in (0,1): a 31-bit xor-shift/multiply mix
    of (row, dim, stream, seed). Stateless — any engine (or SQL
    dialect) reproduces it bit-for-bit (random.counter_uniform_sql
    emits the DuckDB twin), and the output is partitioning-invariant
    (dask rechunk-invariance for random arrays). The xor rounds are
    the point: a pure LCG mix is AFFINE in the counter, so any two
    streams are affinely correlated (measured corr(u1,u2)=0.76 —
    enough to visibly bias Box–Muller); the xor-shift rounds break
    affinity (corr < 0.001). ANSI-safe: every product stays < 2^63
    for row ids up to ~2^42."""
    add = (j * 12345 + k * 1013904223 + (seed & _M31) * 2654435761) & _M31
    x = (
        id_col.bitwiseAND(F.lit(_M31)) * F.lit(1103515245)
        + F.shiftright(id_col, 31) * F.lit(98765431)
        + F.lit(add)
    ).bitwiseAND(F.lit(_M31))
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = (x * F.lit(69069)).bitwiseAND(F.lit(_M31))
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = (x * F.lit(1103515245)).bitwiseAND(F.lit(_M31))
    x = x.bitwiseXOR(F.shiftright(x, 16))
    return (x.cast("double") + F.lit(0.5)) / F.lit(float(_M31 + 1))


def random_normal(spark, n: int, dim: int, seed: int = 0,
                  npartitions: int | None = None) -> DArray:
    """``da.random.normal(size=(n, dim))`` twin: Box–Muller over two
    counter-based uniforms per element, generated map-only on
    ``spark.range`` — no RNG state, no shuffle, deterministic for a
    given (seed, n, dim) at ANY partitioning. For statistical-quality
    randomness swap the LCG mix for a counter-based Philox in an Arrow
    pandas UDF; the plumbing (range → map-only array column) is
    identical."""
    import math

    rng = spark.range(
        0, n, 1, npartitions or spark.sparkContext.defaultParallelism
    )
    idc = F.col("id")
    comps = []
    for j in range(dim):
        u1 = _counter_uniform(idc, j, 0, seed)
        u2 = _counter_uniform(idc, j, 1, seed)
        comps.append(
            F.sqrt(F.lit(-2.0) * F.log(u1))
            * F.cos(F.lit(2.0 * math.pi) * u2)
        )
    sdf = rng.select(F.col("id").alias("row_id"), F.array(*comps).alias("values"))
    return DArray(sdf, "values", "row_id")


def from_array(x, id_col: str = "row_id", col: str = "x",
               npartitions: int | None = None) -> DArray:
    """dask.array.from_array analog: a local 2-D ndarray/list-of-rows →
    distributed DArray (rows partitioned, dim in-row). Driver-side
    source like dask's — for cluster-scale data use DArray.from_frame
    over a parquet-backed vector column instead."""
    import pandas as pd

    from dask_spark.sources import from_pandas

    pdf = pd.DataFrame({id_col: range(len(x)), col: [list(map(float, r)) for r in x]})
    f = from_pandas(pdf, npartitions)
    return DArray(f._sdf, col, id_col)


# ---- creation functions (reference: dask/array/creation.py) -----------
def _creation_spark():
    from dask_spark.session import get_spark

    return get_spark()


def _shape_2d(shape):
    """(n,) → (n, 1); (n, d) passes; longer shapes → (n, prod) with the
    inner tuple returned for NDArray wrapping."""
    if isinstance(shape, int):
        shape = (shape,)
    shape = tuple(int(s) for s in shape)
    n = shape[0]
    inner = shape[1:]
    dim = math.prod(inner) if inner else 1
    return n, dim, (inner if len(inner) > 1 else None)


def _wrap(sdf, inner):
    arr = DArray(sdf, "values", "row_id")
    if inner is None:
        return arr
    from dask_spark.ndarray import NDArray

    return NDArray.from_darray(arr, math.prod(inner)).reshape(inner)


def arange(start, stop=None, step=1, npartitions: int | None = None):
    """da.arange (reference: dask/array/creation.py arange) — a 1-D
    column-vector DArray straight off ``spark.range``: map-only,
    partitioned like any range."""
    if stop is None:
        start, stop = 0, start
    spark = _creation_spark()
    n = max(0, -(-(int(stop) - int(start)) // int(step)))
    rng = spark.range(0, n, 1,
                      npartitions or spark.sparkContext.defaultParallelism)
    sdf = rng.select(
        F.col("id").alias("row_id"),
        F.array(
            (F.lit(float(start)) + F.col("id") * F.lit(float(step)))
        ).alias("values"),
    )
    return DArray(sdf, "values", "row_id")


def linspace(start: float, stop: float, num: int = 50,
             endpoint: bool = True, npartitions: int | None = None):
    """da.linspace (creation.py linspace)."""
    spark = _creation_spark()
    denom = (num - 1) if endpoint else num
    step = (float(stop) - float(start)) / max(denom, 1)
    rng = spark.range(0, num, 1,
                      npartitions or spark.sparkContext.defaultParallelism)
    sdf = rng.select(
        F.col("id").alias("row_id"),
        F.array(F.lit(float(start)) + F.col("id") * F.lit(step))
        .alias("values"),
    )
    return DArray(sdf, "values", "row_id")


def full(shape, fill_value: float, npartitions: int | None = None):
    """da.full (creation.py full): constant blocks are one
    array_repeat literal per row — nothing materializes driver-side."""
    spark = _creation_spark()
    n, dim, inner = _shape_2d(shape)
    rng = spark.range(0, n, 1,
                      npartitions or spark.sparkContext.defaultParallelism)
    sdf = rng.select(
        F.col("id").alias("row_id"),
        F.array_repeat(F.lit(float(fill_value)), dim).alias("values"),
    )
    return _wrap(sdf, inner)


def ones(shape, npartitions: int | None = None):
    return full(shape, 1.0, npartitions)


def zeros(shape, npartitions: int | None = None):
    return full(shape, 0.0, npartitions)


empty = zeros  # no uninitialized memory in a declarative plan


def eye(N: int, M: int | None = None, k: int = 0,
        npartitions: int | None = None):
    """da.eye (creation.py eye): row i holds 1.0 at column i+k —
    a map-only comparison inside transform."""
    spark = _creation_spark()
    M = N if M is None else int(M)
    rng = spark.range(0, N, 1,
                      npartitions or spark.sparkContext.defaultParallelism)
    sdf = rng.select(
        F.col("id").alias("row_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda j: F.when(j == F.col("id") + F.lit(int(k)),
                             1.0).otherwise(0.0),
        ).alias("values"),
    )
    return DArray(sdf, "values", "row_id")


def _like_shape(a):
    if hasattr(a, "inner_shape"):  # NDArray
        return (a._sdf.count(), *a.inner_shape)
    row = a._sdf.select(a._col).first()
    d = len(row[0]) if row is not None and row[0] is not None else 1
    return (a._sdf.count(), d)


def ones_like(a):
    return ones(_like_shape(a))


def zeros_like(a):
    return zeros(_like_shape(a))


def full_like(a, fill_value: float):
    return full(_like_shape(a), fill_value)


# ---- numpy-ufunc family (module level, reference dask/array/ufunc.py) --
from dask_spark.ufunc import *  # noqa: F401,F403,E402

# ---- module-level routines (reference dask/array/routines.py) ----------
from dask_spark.routines import *  # noqa: F401,F403,E402


# ---- namespace shims (reference dask/array/__init__.py tail) -----------

class PerformanceWarning(UserWarning):
    """reference dask/array/core.py PerformanceWarning — emitted when
    an operation falls off the fast path (e.g. a Python-kernel
    escape hatch on a hot loop)."""


#: reference dask.array.Array — the chunked-array class. The N-D
#: NDArray is the general analog here (DArray is the 2-D fast path).
from dask_spark.ndarray import NDArray as Array  # noqa: E402


def asarray(x, npartitions: int | None = None):
    """reference dask/array/core.py asarray: passthrough for existing
    collections, driver numpy/list distributes over axis 0."""
    if hasattr(x, "_col") or hasattr(x, "_expr"):
        return x
    from dask_spark.routines import _nd_from_numpy

    return _nd_from_numpy(x, npartitions)


def asanyarray(x, npartitions: int | None = None):
    return asarray(x, npartitions)


def result_type(*args):
    """reference dask.array.result_type — numpy's promotion rules
    (every block column here is float64, so this mainly serves
    ported code)."""
    import numpy as np

    clean = [
        np.float64 if (hasattr(a, "_col") or hasattr(a, "_expr")) else a
        for a in args
    ]
    return np.result_type(*clean)


def register_chunk_type(type_):
    """reference dask/array/dispatch.py register_chunk_type — a no-op
    here: the only chunk representation is the Arrow/numpy block."""
    return type_


def unify_chunks(*args):
    """reference dask/array/core.py unify_chunks — partition layout
    is Catalyst/AQE's job here, so operands pass through unchanged.
    Accepts dask's (array, index, array, index, ...) calling
    convention and returns ({}, [arrays])."""
    arrays = [a for a in args if not isinstance(a, str)]
    return {}, arrays


def optimize(*args, **kwargs):
    """reference dask/base.py optimize — Catalyst optimizes every
    plan at execution; identity at this layer."""
    return args if len(args) != 1 else args[0]


def histogram(frame, col: str, bins: int = 10, range=None,
              weights: str | None = None, density: bool = False):
    """Module-level histogram (reference dask/array/routines.py
    histogram, incl. weights=/density=) — one map-side-combined
    groupBy."""
    from dask_spark.operators.reductions import histogram as _h

    return _h(frame, col, bins, range, weights=weights, density=density)


def as_gufunc(signature: str, vectorize: bool = False, output_sizes=None):
    """reference dask/array/gufunc.py as_gufunc — decorator form of
    apply_gufunc."""
    from dask_spark.ndarray import apply_gufunc

    def deco(fn):
        def wrapped(*args):
            return apply_gufunc(
                fn, signature, *args,
                output_sizes=output_sizes, vectorize=vectorize,
            )

        wrapped.__name__ = getattr(fn, "__name__", "gufunc")
        return wrapped

    return deco


def gufunc(fn, signature: str, vectorize: bool = False, output_sizes=None):
    """reference dask/array/gufunc.py gufunc — wraps fn into a
    callable applying apply_gufunc."""
    return as_gufunc(signature, vectorize, output_sizes)(fn)


def _lazy_submodules():
    return {"fft", "linalg", "ma", "random"}


def __getattr__(name):  # PEP 562: da.linalg / da.ma / da.random
    if name in _lazy_submodules():
        import importlib

        return importlib.import_module(f"dask_spark.{name}")
    raise AttributeError(f"module 'dask_spark.array' has no attribute {name!r}")


# ---- final re-exports / stack wrappers ---------------------------------
from dask_spark.ndarray import (  # noqa: E402,F401
    apply_gufunc, bincount, digitize, einsum, histogram2d,
)
from dask_spark.testing import assert_eq  # noqa: E402,F401


def array(x, npartitions: int | None = None):
    """reference dask.array.array == asarray with copy semantics
    (every collection here is immutable/lazy, so identical)."""
    return asarray(x, npartitions)


def vstack(arrays):
    """reference dask/array/core.py vstack — concatenate along the
    distributed rows axis (a unionByName, no shuffle)."""
    from dask_spark.ndarray import concatenate as _cat

    return _cat(list(arrays), axis=0)


def hstack(arrays):
    """reference hstack — concatenate along the first inner axis."""
    from dask_spark.ndarray import concatenate as _cat

    arrays = list(arrays)
    ax = 1 if len(arrays[0].inner_shape) >= 1 else 0
    return _cat(arrays, axis=ax)


def dstack(arrays):
    """reference dstack — concatenate along the third axis (inner
    axis 2), expanding 2-D operands like numpy."""
    from dask_spark.ndarray import concatenate as _cat

    arrays = [
        a if len(a.inner_shape) >= 2 else a.reshape(*a.inner_shape, 1)
        for a in arrays
    ]
    return _cat(arrays, axis=2)


def overlap(x, depth: int, boundary=None):
    """reference dask/array/overlap.py overlap — the halo exchange
    alone; here it is fused with the kernel in map_overlap (the halo
    is one range shuffle), so this returns a callable-ready handle."""
    def run(fn):
        return x.map_overlap(fn, depth=depth, boundary=boundary)

    return run


def ravel_multi_index(multi_index, dims):
    """reference routines.py ravel_multi_index. Series inputs lower
    to closed-form stride arithmetic (one JVM expression); plain
    sequences go to numpy."""
    import numpy as np

    from dask_spark.frame import Series

    if not any(isinstance(ix, Series) for ix in multi_index):
        return np.ravel_multi_index(multi_index, dims)
    strides = []
    acc = 1
    for d in reversed(dims):
        strides.append(acc)
        acc *= int(d)
    strides = list(reversed(strides))
    expr = None
    base = next(ix for ix in multi_index if isinstance(ix, Series))
    for ix, st in zip(multi_index, strides):
        e = (ix._expr if isinstance(ix, Series) else F.lit(int(ix))).cast("long") * st
        expr = e if expr is None else expr + e
    return Series(base._frame, expr, "flat_idx")


def unravel_index(indices, dims):
    """reference routines.py unravel_index — the inverse div/mod
    chain; Series in, tuple of Series out."""
    import numpy as np

    from dask_spark.frame import Series

    if not isinstance(indices, Series):
        return np.unravel_index(indices, dims)
    out = []
    acc = 1
    strides = []
    for d in reversed(dims):
        strides.append(acc)
        acc *= int(d)
    strides = list(reversed(strides))
    for d, st in zip(dims, strides):
        out.append(Series(
            indices._frame,
            (indices._expr.cast("long") / st).cast("long") % int(d),
            f"idx_{len(out)}",
        ))
    return tuple(out)


def from_delayed(value, shape, npartitions: int | None = None):
    """reference dask/array/core.py from_delayed — materialize a
    Delayed's result (driver numpy) and distribute it."""
    v = value.compute() if hasattr(value, "compute") else value
    return asarray(v, npartitions)


# lib/backends: numpy passthrough shims (reference dask.array.lib
# re-exports numpy.lib views; backends registers alternative chunk
# types, which don't exist here)
import numpy.lib as lib  # noqa: E402,F401


class _Backends:
    """reference dask/array/backends.py — a registry of chunk-type
    backends; the only backend here is Arrow/numpy blocks."""

    def __repr__(self):
        return "<dask_spark.array.backends: arrow/numpy>"


backends = _Backends()


# ---- numpy constant/dtype re-exports (reference dask.array exposes
# numpy's scalars and constants at top level for ported code) -----------
from numpy import (  # noqa: E402,F401
    complex64, complex128, e, euler_gamma, float32, float64, inf,
    int8, int16, int32, int64, nan, newaxis, pi,
    uint8, uint16, uint32, uint64,
)
from dask_spark.ndarray import coarsen  # noqa: E402,F401


def array_expr_enabled() -> bool:
    """reference dask/array/__init__.py array_expr_enabled — the
    expression backend toggle; this engine always plans through
    Catalyst expressions, so it is always-on by construction."""
    return True


# numpy interop (reference dask Array.__array_ufunc__): np.sin(arr)
# routes to the JVM ufunc twin
from dask_spark.ufunc import array_ufunc_dispatch as _array_ufunc  # noqa: E402

DArray.__array_ufunc__ = _array_ufunc


def _array_function(self, func, types, args, kwargs):
    from dask_spark.routines import array_function_dispatch

    return array_function_dispatch(self, func, types, args, kwargs)


DArray.__array_function__ = _array_function


# ---- module-level method twins (reference dask/array/__init__.py:490-
# 560 re-exports every reduction/structural op as a function, so
# ``da.sum(x)`` and ``x.sum()`` build the same graph; here both build
# the same Catalyst plan). The twin resolves the method on the
# collection it is handed — DArray (2-D vector world) and NDArray each
# carry the subset that makes sense for their layout, and a missing
# method raises a typed error instead of numpy-coercing the input. ----

def _method_twin(name: str):
    def twin(a, *args, **kwargs):
        f = getattr(a, name, None)
        if f is None or not callable(f):
            raise TypeError(
                f"dask_spark.array.{name}: {type(a).__name__} has no "
                f"{name}; see the DArray/NDArray split in SURVEY §2.9"
            )
        return f(*args, **kwargs)

    twin.__name__ = name
    twin.__qualname__ = name
    twin.__doc__ = (
        f"Module-level twin of the ``{name}`` collection method "
        f"(reference dask/array/__init__.py re-export)."
    )
    return twin


_TWIN_NAMES = (
    "sum", "mean", "max", "min", "prod", "std", "var", "all", "any",
    "argmax", "argmin", "cumsum", "cumprod", "transpose", "reshape",
    "ravel", "squeeze", "swapaxes", "roll", "flip", "pad", "tril",
    "triu", "rechunk", "map_blocks", "map_overlap", "topk", "median",
    "percentile", "dot", "matmul", "tensordot", "unique", "diagonal",
    "expand_dims", "diff", "isin", "round", "ptp", "average", "cov",
    "corrcoef", "nansum", "nanmean",
)


def ndim(a) -> int:
    """reference dask.array ndim — shape-only probe, no job."""
    if hasattr(a, "ndim"):
        return a.ndim
    import numpy as np

    return np.ndim(a)


def shape(a):
    if hasattr(a, "shape"):
        return a.shape
    import numpy as np

    return np.shape(a)


# dask.config.get("array.query-planning") toggle twin: this engine
# always plans through Catalyst expressions, so the flag is pinned on.
ARRAY_EXPR_ENABLED = True


def __getattr__(name: str):
    """Module-level twins served lazily (reference dask/array/
    __init__.py:490-560 re-exports every reduction/structural op as a
    function, so ``da.sum(x)`` and ``x.sum()`` build the same plan).
    Served through ``__getattr__`` rather than module globals so the
    twins never shadow the builtins (``sum``/``any``/``max``/…) that
    this module's own code uses."""
    if name in _TWIN_NAMES:
        return _method_twin(name)
    if name in ("fft", "linalg", "ma", "random"):
        import importlib

        return importlib.import_module(f"dask_spark.{name}")
    if name == "bool":  # dask exports numpy's scalar under the py name
        from numpy import bool_

        return bool_
    if name == "compute":
        from dask_spark.delayed import compute as _compute

        return _compute
    raise AttributeError(f"module dask_spark.array has no attribute {name}")


def __dir__():
    return sorted(
        set(globals())
        | set(_TWIN_NAMES)
        | {"fft", "linalg", "ma", "random", "bool", "compute"}
    )
