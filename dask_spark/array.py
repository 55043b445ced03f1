"""dask.array parity (reference: dask/array/core.py Array) — a 2-D
array abstraction over a column of fixed-dim vectors (n_rows × dim).

Row axis (axis=0) is partitioned across the cluster; the vector axis
(axis=1) lives inside each row. Elementwise ops and axis-1 reductions
are JVM array expressions; axis-0 reductions lower to
posexplode + groupBy(dim) (map-side partial aggregation); matmul
against a small literal matrix broadcasts it into the plan — the same
chunked-vs-broadcast split dask uses for (tall, skinny) @ (small)."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


class DArray:
    def __init__(self, sdf, col: str = "embedding", id_col: str | None = None):
        self._sdf = sdf
        self._col = col
        self._id = id_col

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
        row axis IS the partitioning, so this is a repartition (or a
        shuffle-free coalesce when shrinking)."""
        cur = self._sdf.rdd.getNumPartitions()
        sdf = (
            self._sdf.coalesce(npartitions)
            if npartitions < cur
            else self._sdf.repartition(npartitions)
        )
        return DArray(sdf, self._col, self._id)

    @property
    def npartitions(self) -> int:
        return self._sdf.rdd.getNumPartitions()

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

    def mean(self, axis: int = 1):
        if axis == 1:
            return self._reduce_rows(
                lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x)
                / F.size(c),
                "mean",
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

    def norm(self) -> DaskFrame:
        from dask_spark.functions.vector import norm

        return self._reduce_rows(norm, "norm")

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

    # ---- materialization ----------------------------------------------
    def to_frame(self) -> DaskFrame:
        return DaskFrame(self._sdf)

    def to_series(self, name: str | None = None):
        """1-column view of per-row arrays as a Series (bridge to the
        frame API — reference: dask Array.to_dask_dataframe)."""
        return DaskFrame(self._sdf)[name or self._col]

    def compute(self):
        import numpy as np

        rows = self._sdf.select(*self._keep(), self._col).collect()
        return np.array([list(r[self._col]) for r in rows])


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
        sdf = first._sdf.select(first._id, F.col(first._col).alias("__c0"))
        for i, a in enumerate(arrays[1:], start=1):
            sdf = sdf.join(
                a._sdf.select(F.col(a._id).alias(first._id),
                              F.col(a._col).alias(f"__c{i}")),
                on=first._id,
            )
        sdf = sdf.select(
            first._id,
            F.concat(*[F.col(f"__c{i}") for i in range(len(arrays))]).alias(first._col),
        )
        return DArray(sdf, first._col, first._id)
    raise ValueError(f"axis must be 0 or 1, got {axis}")


_M31 = (1 << 31) - 1


def _counter_uniform(id_col, j: int, k: int, seed: int):
    """Counter-based uniform in (0,1): two LCG mixing rounds of
    (row, dim, stream, seed) mod 2^31-1. Stateless — any engine (or
    SQL dialect) reproduces it bit-for-bit, and the output is
    partitioning-invariant (dask rechunk-invariance for random arrays).
    ANSI-safe: every product stays < 2^63."""
    h1 = F.pmod(
        id_col * F.lit(1103515245) + F.lit(j * 12345 + k * 1013904223 + seed),
        F.lit(_M31),
    )
    h2 = F.pmod(h1 * F.lit(69069) + F.lit(1), F.lit(_M31))
    return (h2.cast("double") + F.lit(0.5)) / F.lit(float(_M31))


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
