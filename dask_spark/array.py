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

    def compute(self):
        import numpy as np

        rows = self._sdf.select(*self._keep(), self._col).collect()
        return np.array([list(r[self._col]) for r in rows])
