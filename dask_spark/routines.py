"""Module-level ``dask.array`` routines (reference: dask/array/
routines.py, slicing.py, creation.py — dask re-exports these at the
``dask.array`` top level).

Spark-first translations, grouped by execution shape:

- **selection / search** (where, select, piecewise, compress, take,
  argtopk, searchsorted, nonzero...): pure JVM Column expressions —
  ``when`` chains, in-row ``array_sort``/``filter``/``transform``
  lambdas — map-only, no shuffle, no Python at run time;
- **structural** (flip/rot90/moveaxis/repeat/tile/broadcast_to...):
  compositions of the NDArray driver-side permutation planner — each
  is one numpy index computation at plan time and ONE gather
  expression at run time;
- **reductions** (nan* family, gradient, push...): the existing
  DArray/NDArray reduction machinery over null/NaN-filtered blocks.

Dispatch is duck-typed like dask_spark.ufunc (no package imports at
module load, so ``dask_spark.array`` can star-import this without an
import cycle)."""

from __future__ import annotations

import math
from typing import Callable, Sequence

import pyspark.sql.functions as F

from dask_spark.ufunc import (
    _apply1, _is_arr, _is_series, _np, _floor_d,
)

__all__ = [
    "where", "isclose", "allclose", "isnull", "notnull", "around",
    "clip", "select", "piecewise", "choose", "compress", "extract",
    "argtopk", "searchsorted", "take", "union1d", "nonzero",
    "argwhere", "flatnonzero", "count_nonzero",
]


def _series_like(s, expr, name=None):
    return type(s)(s._frame, expr, name or s._name)


def _is_nd(a) -> bool:
    return hasattr(a, "inner_shape")


# ---- selection ---------------------------------------------------------

def where(cond, x=None, y=None):
    """np.where(cond, x, y) (reference dask/array/routines.py where).

    Series operands (same parent frame) lower to one ``CASE WHEN``;
    array operands take scalar branches (``F.when`` inside the block
    ``transform``). The one-argument form ``where(cond)`` is
    ``nonzero(cond)``, like numpy."""
    if x is None and y is None:
        return nonzero(cond)
    if x is None or y is None:  # numpy: both or neither
        raise ValueError("where: either both or neither of x and y")
    if _is_series(cond):
        xe = x._expr if _is_series(x) else F.lit(x)
        ye = y._expr if _is_series(y) else F.lit(y)
        return _series_like(
            cond, F.when(cond._expr.cast("boolean"), xe).otherwise(ye)
        )
    if _is_arr(cond):
        if _is_arr(x) or _is_arr(y):
            raise NotImplementedError(
                "array-valued branches need shared lineage — compose "
                "with zip_with via arr.map, or use Series operands"
            )
        return cond.map(
            lambda c: F.when(c.cast("boolean"), F.lit(float(x)))
            .otherwise(F.lit(float(y)))
        )
    np = _np()
    return np.where(cond, x, y)


def isclose(a, b, rtol: float = 1e-5, atol: float = 1e-8):
    """Elementwise |a-b| <= atol + rtol*|b| (reference routines.py
    isclose) — a predicate ufunc, boolean on Series, 0/1 doubles on
    arrays."""
    from dask_spark.ufunc import _apply2

    return _apply2(
        a, b,
        lambda x, y: F.abs(x - y) <= F.lit(atol) + F.lit(rtol) * F.abs(y),
        "isclose", pred=True,
    )


def allclose(a, b, rtol: float = 1e-5, atol: float = 1e-8) -> bool:
    """Eager driver boolean like dask's allclose().compute() — one
    scalar aggregate over the isclose mask."""
    m = isclose(a, b, rtol, atol)
    if _is_series(m):
        row = m._frame._sdf.select(
            F.min(m._expr.cast("int")).alias("v")
        ).first()
        return bool(row["v"] is None or row["v"] == 1)
    if _is_arr(m):
        row = m._sdf.select(
            F.min(F.array_min(F.col(m._col))).alias("v")
        ).first()
        return bool(row["v"] is None or row["v"] == 1.0)
    return bool(_np().allclose(a, b, rtol=rtol, atol=atol))


def isnull(a):
    """Missing-ness: NULL or NaN (reference dask.array isnull —
    pandas semantics, where NaN is the missing marker)."""
    return _apply1(
        a, lambda c: c.isNull() | F.isnan(c), "isnan", pred=True
    )


def notnull(a):
    return _apply1(
        a, lambda c: c.isNotNull() & ~F.isnan(c), "isnan", pred=True
    )


def around(a, decimals: int = 0):
    """np.around (reference routines.py around/round_)."""
    return _apply1(a, lambda c: F.round(c, decimals), "around")


def clip(a, a_min, a_max):
    """np.clip — delegates to the collection's own clip."""
    if hasattr(a, "clip"):
        return a.clip(a_min, a_max)
    return _np().clip(a, a_min, a_max)


def select(condlist, choicelist, default=0.0):
    """np.select over Series conditions (reference routines.py
    select): first matching condition wins — one CASE WHEN chain."""
    if not condlist or len(condlist) != len(choicelist):
        raise ValueError("condlist and choicelist must match, non-empty")
    s0 = condlist[0]
    if not _is_series(s0):
        return _np().select(condlist, choicelist, default)
    expr = None
    for cond, choice in zip(condlist, choicelist):
        ce = choice._expr if _is_series(choice) else F.lit(choice)
        expr = (F.when(cond._expr.cast("boolean"), ce) if expr is None
                else expr.when(cond._expr.cast("boolean"), ce))
    de = default._expr if _is_series(default) else F.lit(default)
    return _series_like(s0, expr.otherwise(de))


def piecewise(x, condlist, funclist):
    """np.piecewise (reference routines.py piecewise): funclist
    entries are scalars or callables taking/returning Series — all
    lowered into one CASE WHEN chain over x."""
    if not _is_series(x):
        return _np().piecewise(x, condlist, funclist)
    choices = [f(x) if callable(f) else f for f in funclist[: len(condlist)]]
    default = (
        (funclist[-1](x) if callable(funclist[-1]) else funclist[-1])
        if len(funclist) == len(condlist) + 1
        else 0.0
    )
    return select(condlist, choices, default)


def choose(a, choices):
    """np.choose: per-row integer selector into ``choices`` (scalars
    or same-frame Series) — one CASE WHEN chain on the selector."""
    if not _is_series(a):
        return _np().choose(a, choices)
    expr = None
    for i, ch in enumerate(choices):
        ce = ch._expr if _is_series(ch) else F.lit(ch)
        cond = a._expr.cast("bigint") == i
        expr = F.when(cond, ce) if expr is None else expr.when(cond, ce)
    return _series_like(a, expr)


def compress(condition, a):
    """np.compress: keep rows where the boolean Series is true
    (reference routines.py compress) — one pushdown-able filter."""
    if _is_series(condition) and _is_series(a):
        kept = a._frame[condition]
        return getattr(kept, a._name)
    return _np().compress(condition, a)


def extract(condition, a):
    """np.extract == compress for 1-D (reference routines.py)."""
    return compress(condition, a)


# ---- search / indices --------------------------------------------------

def argtopk(a, k: int):
    """Indices of the k largest per row (reference dask/array/
    reductions.py argtopk): in-row struct sort + slice — one JVM
    expression, no shuffle. Ties break on the lower index, and
    indices come back value-descending like dask's argtopk."""
    if not _is_arr(a):
        raise TypeError("argtopk needs a DArray/NDArray")

    def build(c):
        structs = F.transform(
            c, lambda x, i: F.struct(x.alias("v"), i.alias("i"))
        )
        ordered = F.array_sort(
            structs,
            lambda l, r: F.when(l["v"] > r["v"], F.lit(-1))
            .when(l["v"] < r["v"], F.lit(1))
            .otherwise(l["i"] - r["i"]),
        )
        return F.transform(
            F.slice(ordered, 1, k), lambda s: s["i"].cast("double")
        )

    if _is_nd(a):
        if len(a.inner_shape) != 1:
            raise ValueError("argtopk: 1-D inner blocks only")
        m = a._materialize()
        return m._with_block(build(F.col(m._col)), (k,))
    return a._unary(build)


def searchsorted(sorted_seq: Sequence[float], v, side: str = "left"):
    """np.searchsorted with a driver-sized sorted needle list
    (reference routines.py searchsorted): insertion position as a
    count over the literal array — O(len(seq)) JVM ops per value,
    map-only."""
    if not (_is_arr(v) or _is_series(v)):
        return _np().searchsorted(sorted_seq, v, side=side)
    lits = F.array(*[F.lit(float(x)) for x in sorted_seq])
    if side == "left":
        build = lambda c: F.size(F.filter(lits, lambda e: e < c)).cast("double")  # noqa: E731
    elif side == "right":
        build = lambda c: F.size(F.filter(lits, lambda e: e <= c)).cast("double")  # noqa: E731
    else:
        raise ValueError(f"side must be left|right, got {side!r}")
    return _apply1(v, build, "searchsorted")


def take(a, indices: Sequence[int], axis: int = 0):
    """np.take (reference dask/array/slicing.py take).

    axis 0: a broadcast join against the literal index list —
    preserves ``indices`` order and duplicates, needs the id column.
    Inner axes: folded into the driver-side gather permutation (one
    numpy ``take`` at plan time)."""
    np = _np()
    if _is_nd(a):
        if axis < 0:  # normalize: ndim includes the row axis
            axis = a.ndim + axis
        if axis == 0:
            return _take_rows(a, indices)
        t = np.take(a._index_tensor(), np.asarray(indices), axis=axis - 1)
        return a._gather(t.ravel(), t.shape)
    if _is_arr(a):  # DArray
        if axis in (1, -1, None):
            idx = F.array(*[F.lit(int(i)) for i in indices])
            return a._unary(
                lambda c: F.transform(idx, lambda i: F.element_at(c, i + 1))
            )
        return _take_rows(a, indices)
    return np.take(a, indices, axis=axis)


def _take_rows(a, indices: Sequence[int]):
    if a._id is None:
        raise ValueError("axis-0 take needs an id column (row identity)")
    spark = a._sdf.sparkSession
    pos = spark.createDataFrame(
        [(int(ix), p) for p, ix in enumerate(indices)], f"{a._id} long, __pos int"
    )
    m = a._materialize() if _is_nd(a) else a
    out = (
        m._sdf.join(F.broadcast(pos), on=m._id, how="inner")
        .orderBy("__pos")
        .drop("__pos")
    )
    if _is_nd(a):
        return type(a)(out, m.inner_shape, m._col, m._id)
    return type(a)(out, m._col, m._id)


def union1d(a, b):
    """Sorted distinct union of two Series (reference routines.py
    union1d) — one distinct shuffle, like dask's union1d rechunk."""
    if not (_is_series(a) and _is_series(b)):
        return _np().union1d(a, b)
    sa = a._frame._sdf.select(a._expr.alias("v"))
    sb = b._frame._sdf.select(b._expr.alias("v"))
    from dask_spark.frame import DaskFrame

    return DaskFrame(sa.union(sb).distinct().orderBy("v"))


def nonzero(a):
    """Coordinates of nonzero entries (reference routines.py
    nonzero): posexplode + filter — the output is a (row, position)
    frame, dask's tuple-of-index-arrays in long form."""
    if _is_series(a):
        f = a._frame[a != 0]
        return f
    if not _is_arr(a):
        return _np().nonzero(a)
    m = a._materialize() if _is_nd(a) else a
    sdf = m._sdf.select(
        *([m._id] if m._id else []),
        F.posexplode(F.col(m._col)).alias("pos", "val"),
    ).filter("val != 0.0").drop("val")
    from dask_spark.frame import DaskFrame

    return DaskFrame(sdf)


def argwhere(a):
    """np.argwhere — same long-form coordinates as nonzero."""
    return nonzero(a)


def flatnonzero(a):
    """Flat indices of nonzero entries; needs dense 0..n-1 ids so the
    flat index ``id * inner_size + pos`` is well-defined."""
    if not _is_arr(a):
        return _np().flatnonzero(a)
    m = a._materialize() if _is_nd(a) else a
    if m._id is None:
        raise ValueError("flatnonzero needs an id column (dense row ids)")
    d = (
        m.inner_size if _is_nd(m)
        else None
    )
    if d is None:
        row = m._sdf.select(F.size(F.col(m._col)).alias("d")).first()
        d = int(row["d"]) if row else 0
    sdf = (
        m._sdf.select(
            m._id, F.posexplode(F.col(m._col)).alias("pos", "val")
        )
        .filter("val != 0.0")
        .select(
            (F.col(m._id).cast("long") * d + F.col("pos")).alias("flat_idx")
        )
    )
    from dask_spark.frame import DaskFrame

    return DaskFrame(sdf)


def count_nonzero(a, axis=None):
    """np.count_nonzero — delegates to the method when present."""
    if hasattr(a, "count_nonzero"):
        return a.count_nonzero() if axis is None else a.count_nonzero(axis)
    if _is_series(a):
        from dask_spark.frame import DaskFrame

        return DaskFrame(
            a._frame._sdf.select(
                F.sum((a._expr != 0).cast("long")).alias("count_nonzero")
            )
        )
    return _np().count_nonzero(a, axis=axis)


# ---- structural (NDArray permutation compositions) ---------------------

def _need_nd(a, fn: str):
    if not _is_nd(a):
        raise TypeError(f"{fn} needs an NDArray (N-D inner layout)")


def fliplr(a):
    """np.fliplr — flip axis 1 (the first inner axis; axis 0 is the
    distributed rows axis). One driver-side perm composition."""
    _need_nd(a, "fliplr")
    return a.flip(1)


def flipud(a):
    """np.flipud flips the distributed rows axis: remap the dense id
    to (max_id - id) — one bounded driver scalar (the max) and a
    map-only projection; row order follows the id everywhere else."""
    _need_nd(a, "flipud")
    if a._id is None:
        raise ValueError("flipud needs an id column (dense row ids)")
    m = a._materialize()
    top = m._sdf.select(F.max(F.col(m._id)).alias("m")).first()["m"]
    if top is None:
        return m
    sdf = m._sdf.select(
        (F.lit(int(top)) - F.col(m._id)).alias(m._id), m._col
    )
    return type(a)(sdf, m.inner_shape, m._col, m._id)


def rot90(a, k: int = 1, axes=(1, 2)):
    """np.rot90 over two INNER axes: one composed gather (numpy plans
    the rotation on the index tensor at build time)."""
    _need_nd(a, "rot90")
    np = _np()
    if 0 in axes:
        raise ValueError("cannot rotate through the distributed row axis")
    t = np.rot90(a._index_tensor(), k=k, axes=(axes[0] - 1, axes[1] - 1))
    return a._gather(t.ravel(), t.shape)


def moveaxis(a, source: int, destination: int):
    """np.moveaxis over inner axes — a transpose permutation."""
    _need_nd(a, "moveaxis")
    m = len(a.inner_shape)
    src = source - 1 if source > 0 else source + m
    dst = destination - 1 if destination > 0 else destination + m
    if source == 0 or destination == 0:
        raise ValueError("cannot move the distributed row axis")
    order = [i for i in range(m) if i != src]
    order.insert(dst, src)
    return a.transpose(order)


def rollaxis(a, axis: int, start: int = 1):
    """np.rollaxis (legacy numpy) — lowered to moveaxis semantics
    over the INNER axes. numpy's default start=0 would move the axis
    to the distributed row position, which no structural op can do —
    the default here is start=1 (front of the inner axes) and
    start=0 raises instead of silently permuting the wrong axis."""
    _need_nd(a, "rollaxis")
    if axis == 0 or start == 0:
        raise ValueError(
            "cannot roll through the distributed row axis (position 0); "
            "inner positions start at 1"
        )
    m = len(a.inner_shape)
    ax = axis - 1
    st = start - 1
    order = list(range(m))
    order.remove(ax)
    if st > ax:
        st -= 1
    order.insert(st, ax)
    return a.transpose(order)


def atleast_1d(a):
    return a


def atleast_2d(a):
    if _is_series(a):
        raise TypeError(
            "atleast_2d on a Series: wrap the column as a DArray/"
            "NDArray first (from_vectors) — the (1, n) transpose numpy "
            "produces would put all rows in one block"
        )
    return a


def atleast_3d(a):
    """(n, d) -> (n, d, 1), appending a unit inner axis like numpy."""
    if _is_nd(a):
        if len(a.inner_shape) >= 2:
            return a
        return a.reshape(*a.inner_shape, 1)
    if _is_arr(a):  # DArray
        from dask_spark.ndarray import NDArray

        row = a._sdf.select(a._col).first()
        d = len(row[0]) if row is not None else 1
        return NDArray.from_darray(a, d).reshape(d, 1)
    return _np().atleast_3d(a)


def broadcast_to(a, shape: Sequence[int]):
    """np.broadcast_to over INNER axes: a stride-0 gather — numpy
    broadcasts the index tensor, the JVM re-reads the same source
    element (no data duplication until a consumer materializes).
    The rows extent (shape[0]) must already match."""
    _need_nd(a, "broadcast_to")
    np = _np()
    inner = tuple(int(s) for s in shape[1:])
    t = np.broadcast_to(a._index_tensor(), inner)
    return a._gather(np.ascontiguousarray(t).ravel(), inner)


def broadcast_arrays(*arrays):
    """Pairwise inner broadcast to the common shape."""
    np = _np()
    shapes = [a.inner_shape for a in arrays]
    common = np.broadcast_shapes(*shapes)
    return [broadcast_to(a, (None, *common)) for a in arrays]


def repeat(a, repeats: int, axis: int):
    """np.repeat. Inner axes: one gather (numpy plans np.repeat on
    the index tensor). Axis 0: posexplode of array_repeat — row ids
    become (id*k + copy) so the result keeps dense identity."""
    np = _np()
    if _is_nd(a) and axis != 0:
        t = np.repeat(a._index_tensor(), repeats, axis=axis - 1)
        return a._gather(t.ravel(), t.shape)
    if _is_arr(a) and not _is_nd(a) and axis != 0:
        # DArray inner repeat: the same gather, planned flat
        d_row = a._sdf.select(F.size(F.col(a._col)).alias("d")).first()
        d = int(d_row["d"]) if d_row else 0
        idx = np.repeat(np.arange(d), repeats) + 1
        lit = F.lit(idx.astype("int32"))
        return a._unary(
            lambda c: F.transform(lit, lambda i: F.element_at(c, i))
        )
    if (_is_nd(a) or _is_arr(a)) and axis == 0:
        m = a._materialize() if _is_nd(a) else a
        if m._id is None:
            raise ValueError("axis-0 repeat needs an id column")
        sdf = m._sdf.select(
            m._id, m._col,
            F.posexplode(
                F.array_repeat(F.lit(0), repeats)
            ).alias("__copy", "__z"),
        ).select(
            (F.col(m._id).cast("long") * repeats + F.col("__copy")).alias(m._id),
            m._col,
        )
        if _is_nd(a):
            return type(a)(sdf, m.inner_shape, m._col, m._id)
        return type(a)(sdf, m._col, m._id)
    return np.repeat(a, repeats, axis=axis)


def tile(a, reps):
    """np.tile over inner axes: one gather via the tiled index
    tensor."""
    _need_nd(a, "tile")
    np = _np()
    if isinstance(reps, int):
        reps = (reps,)
    t = np.tile(a._index_tensor(), reps)
    return a._gather(t.ravel(), t.shape)


def append(a, b, axis: int = 0):
    """np.append == concatenate along axis."""
    from dask_spark.ndarray import concatenate as nd_concat

    return nd_concat([a, b], axis=axis)


def delete(a, obj, axis: int):
    """np.delete. Inner axes: one gather. Axis 0: an anti-filter on
    the id (row identity is preserved, not renumbered — same as
    dropping rows from a frame)."""
    np = _np()
    if _is_nd(a) and axis != 0:
        t = np.delete(a._index_tensor(), obj, axis=axis - 1)
        return a._gather(t.ravel(), t.shape)
    if (_is_nd(a) or _is_arr(a)) and axis == 0:
        m = a._materialize() if _is_nd(a) else a
        if m._id is None:
            raise ValueError("axis-0 delete needs an id column")
        ids = [int(x) for x in (obj if hasattr(obj, "__iter__") else [obj])]
        sdf = m._sdf.filter(~F.col(m._id).isin(ids))
        if _is_nd(a):
            return type(a)(sdf, m.inner_shape, m._col, m._id)
        return type(a)(sdf, m._col, m._id)
    return np.delete(a, obj, axis=axis)


def insert(a, index: int, value: float, axis: int):
    """np.insert of a CONSTANT along an inner axis: the pad-style
    sentinel gather (the index tensor carries -1 where the constant
    goes — still one map-only projection)."""
    _need_nd(a, "insert")
    np = _np()
    if axis == 0:
        raise ValueError("axis-0 insert: union a new row instead")
    m = a._materialize()
    t = np.insert(m._index_tensor(), index, -1, axis=axis - 1)
    flat = t.ravel()
    idx = F.lit(np.where(flat >= 0, flat + 1, -1).astype("int32"))
    b = F.col(m._col)
    return m._with_block(
        F.transform(
            idx,
            lambda i: F.when(i > 0, F.element_at(b, i)).otherwise(
                F.lit(float(value))
            ),
        ),
        t.shape,
    )


def diag(a, k: int = 0):
    """Diagonal of a 2-D-inner NDArray with offset (reference
    routines.py diag) — one gather."""
    _need_nd(a, "diag")
    np = _np()
    if len(a.inner_shape) != 2:
        raise ValueError("diag needs 2-D inner blocks")
    t = np.diagonal(a._index_tensor(), offset=k)
    return a._gather(t.ravel(), t.shape)


def trace(a, offset: int = 0):
    """np.trace = diagonal(offset).sum over the inner axis — one
    scalar per row."""
    from dask_spark.frame import DaskFrame

    d = diag(a, offset).sum(axis=1)._materialize()
    return DaskFrame(
        d._sdf.select(
            *d._keep(), F.element_at(F.col(d._col), 1).alias("trace")
        )
    )


def tri(N: int, M: int | None = None, k: int = 0, npartitions: int | None = None):
    """Distributed np.tri: N rows, row i holds 1.0 where j <= i+k —
    built directly from spark.range, one map-only projection (same
    creation shape as eye/identity)."""
    from dask_spark.session import get_spark
    from dask_spark.ndarray import NDArray

    M = N if M is None else M
    spark = get_spark()
    rng = spark.range(0, N, 1, npartitions or spark.sparkContext.defaultParallelism)
    sdf = rng.select(
        F.col("id").alias("row_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda j: F.when(
                j.cast("long") <= F.col("id") + F.lit(k), F.lit(1.0)
            ).otherwise(F.lit(0.0)),
        ).alias("block"),
    )
    return NDArray(sdf, (M,), "block", "row_id")


def tril_indices(n: int, k: int = 0, m: int | None = None):
    """Index tuples are O(n*m) driver data in numpy and dask alike —
    returned as numpy (dask materializes them from numpy too)."""
    return _np().tril_indices(n, k, m)


def triu_indices(n: int, k: int = 0, m: int | None = None):
    return _np().triu_indices(n, k, m)


def tril_indices_from(a, k: int = 0):
    _need_nd(a, "tril_indices_from")
    if len(a.inner_shape) != 2:
        raise ValueError("needs 2-D inner blocks")
    return _np().tril_indices(a.inner_shape[0], k, a.inner_shape[1])


def triu_indices_from(a, k: int = 0):
    _need_nd(a, "triu_indices_from")
    if len(a.inner_shape) != 2:
        raise ValueError("needs 2-D inner blocks")
    return _np().triu_indices(a.inner_shape[0], k, a.inner_shape[1])


def _nd_from_numpy(arr, npartitions: int | None = None):
    """Driver numpy -> NDArray: axis 0 distributes, trailing axes
    become the inner block (the from_array bridge for array-shaped
    results)."""
    import pandas as pd

    from dask_spark.ndarray import NDArray
    from dask_spark.sources import from_pandas

    np = _np()
    arr = np.asarray(arr, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    flat = arr.reshape(arr.shape[0], -1)
    f = from_pandas(
        pd.DataFrame({"row_id": range(arr.shape[0]),
                      "block": [list(r) for r in flat]}),
        npartitions,
    )
    return NDArray(f._sdf, arr.shape[1:], "block", "row_id")


def meshgrid(*xi, indexing: str = "xy"):
    """np.meshgrid over driver-sized coordinate vectors — the grids
    distribute over axis 0 like any other creation (coordinate
    vectors are plan literals in dask too)."""
    np = _np()
    grids = np.meshgrid(*[np.asarray(x, dtype="float64") for x in xi],
                        indexing=indexing)
    return [_nd_from_numpy(g) for g in grids]


def indices(dimensions: Sequence[int]):
    """np.indices — the index grids, leading axis distributed."""
    return _nd_from_numpy(_np().indices(dimensions).astype("float64"))


def fromfunction(func, shape: Sequence[int], npartitions: int | None = None):
    """Distributed np.fromfunction (reference dask/array/creation.py
    fromfunction): rows come from spark.range, each Arrow batch
    evaluates ``func`` vectorized over (row_index, *inner_indices) —
    the function runs in numpy over whole blocks, never per element."""
    import pandas as pd

    from dask_spark.session import get_spark
    from dask_spark.ndarray import NDArray

    np = _np()
    shape = tuple(int(s) for s in shape)
    one_d = len(shape) == 1  # np.fromfunction(f, (n,)) calls f(i) only
    inner = shape[1:] or (1,)
    inds = np.indices(inner).astype("float64")
    spark = get_spark()
    rng = spark.range(0, shape[0], 1,
                      npartitions or spark.sparkContext.defaultParallelism)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy(dtype="float64")
            lead = ids.reshape((-1,) + (1,) * len(inner))
            args = [np.broadcast_to(lead, (len(ids), *inner))]
            if not one_d:
                args += [np.broadcast_to(ix[None], (len(ids), *inner))
                         for ix in inds]
            out = np.asarray(func(*args), dtype="float64")
            yield pd.DataFrame({
                "row_id": pdf["id"],
                "block": list(out.reshape(len(ids), -1)),
            })

    sdf = rng.mapInPandas(run, "row_id long, block array<double>")
    return NDArray(sdf, inner if shape[1:] else (1,), "block", "row_id")


def block(arrays):
    """np.block for one or two nesting levels: inner lists
    concatenate along the LAST axis, the outer level along axis 0 —
    each level is the existing NDArray concatenate (axis 0 = union,
    inner = one id-equijoin + gather)."""
    from dask_spark.ndarray import concatenate as nd_concat

    if not isinstance(arrays, (list, tuple)):
        return arrays
    if any(isinstance(x, (list, tuple)) for x in arrays):
        rows = [block(x) for x in arrays]
        return nd_concat(rows, axis=0)
    last = len(arrays[0].inner_shape)  # last axis index in full shape
    return nd_concat(list(arrays), axis=last)


def reshape_blockwise(a, shape):
    """dask's reshape_blockwise == our inner reshape (blocks never
    split across rows here)."""
    _need_nd(a, "reshape_blockwise")
    return a.reshape(*shape[1:])


def shuffle(a, indexer: Sequence[Sequence[int]], axis: int):
    """dask.array.shuffle (reference dask/array/_shuffle.py): regroup
    slices along an axis. Lowered to take() with the flattened
    indexer — inner axes are one gather, axis 0 one broadcast join."""
    flat = [int(i) for grp in indexer for i in (grp if hasattr(grp, "__iter__") else [grp])]
    return take(a, flat, axis=axis)


def empty_like(a):
    """Contents are unspecified in numpy; zeros keep it deterministic
    here (same choice dask users observe with zeros-backed meta)."""
    from dask_spark.array import zeros_like

    return zeros_like(a)


__all__ += [
    "fliplr", "flipud", "rot90", "moveaxis", "rollaxis",
    "atleast_1d", "atleast_2d", "atleast_3d", "broadcast_to",
    "broadcast_arrays", "repeat", "tile", "append", "delete", "insert",
    "diag", "trace", "tri", "tril_indices", "triu_indices",
    "tril_indices_from", "triu_indices_from", "meshgrid", "indices",
    "fromfunction", "block", "reshape_blockwise", "shuffle",
    "empty_like",
]


# ---- nan-aware reductions / calculus ----------------------------------

def _kept(c):
    return F.filter(c, lambda x: ~F.isnan(x) & x.isNotNull())


def _as_rowvec(a, fn: str):
    """DArray as-is; 1-D-inner NDArray through to_darray."""
    if _is_nd(a):
        if len(a.inner_shape) != 1:
            raise ValueError(f"{fn}: ravel the inner axes first")
        return a.to_darray()
    if not _is_arr(a):
        raise TypeError(f"{fn} needs a DArray/NDArray")
    return a


def nanmax(a, axis: int = 1):
    """Per-row max ignoring NaN/null (reference dask/array/
    reductions.py nanmax); all-NaN rows give NaN like numpy. axis=0
    delegates to the null-skipping distributed agg."""
    v = _as_rowvec(a, "nanmax")
    if axis == 0:
        return v._axis0("nanmax", lambda cn: F.max(_nanif(cn)))
    return v._reduce_rows(
        lambda c: F.coalesce(F.array_max(_kept(c)), F.lit(float("nan"))),
        "nanmax",
    )


def nanmin(a, axis: int = 1):
    v = _as_rowvec(a, "nanmin")
    if axis == 0:
        return v._axis0("nanmin", lambda cn: F.min(_nanif(cn)))
    return v._reduce_rows(
        lambda c: F.coalesce(F.array_min(_kept(c)), F.lit(float("nan"))),
        "nanmin",
    )


def _nanif(cn):
    c = F.col(cn) if isinstance(cn, str) else cn
    return F.when(~F.isnan(c), c)


def nanprod(a, axis: int = 1):
    """All-NaN rows give 1.0, numpy's empty-product convention."""
    v = _as_rowvec(a, "nanprod")
    if axis != 1:
        raise ValueError("nanprod supports axis=1 (per-row)")
    return v._reduce_rows(
        lambda c: F.aggregate(_kept(c), F.lit(1.0), lambda acc, x: acc * x),
        "nanprod",
    )


def nanvar(a, axis: int = 1, ddof: int = 0):
    v = _as_rowvec(a, "nanvar")
    if axis != 1:
        raise ValueError("nanvar supports axis=1 (per-row)")

    def build(c):
        k = _kept(c)
        n = F.size(k)
        mean = F.aggregate(k, F.lit(0.0), lambda acc, x: acc + x) / n
        ss = F.aggregate(k, F.lit(0.0),
                         lambda acc, x: acc + (x - mean) * (x - mean))
        return F.when(n <= ddof, F.lit(float("nan"))).otherwise(
            ss / (n - F.lit(ddof))
        )

    return v._reduce_rows(build, "nanvar")


def nanstd(a, axis: int = 1, ddof: int = 0):
    v = nanvar(a, axis, ddof)
    s = v._sdf.select(
        *([c for c in v._sdf.columns if c != "nanvar"]),
        F.sqrt(F.col("nanvar")).alias("nanstd"),
    )
    from dask_spark.frame import DaskFrame

    return DaskFrame(s)


def _nanarg(a, name: str, biggest: bool):
    v = _as_rowvec(a, name)

    def build(c):
        structs = F.filter(
            F.transform(c, lambda x, i: F.struct(x.alias("v"), i.alias("i"))),
            lambda s: ~F.isnan(s["v"]) & s["v"].isNotNull(),
        )
        sign = -1 if biggest else 1
        ordered = F.array_sort(
            structs,
            lambda l, r: F.when(l["v"] > r["v"], F.lit(sign))
            .when(l["v"] < r["v"], F.lit(-sign))
            .otherwise(l["i"] - r["i"]),
        )
        return F.try_element_at(ordered, F.lit(1))["i"].cast("double")

    return v._reduce_rows(build, name)


def nanargmax(a, axis: int = 1):
    """Index of the per-row max ignoring NaN; ties -> lower index."""
    return _nanarg(a, "nanargmax", biggest=True)


def nanargmin(a, axis: int = 1):
    return _nanarg(a, "nanargmin", biggest=False)


def nanmedian(a, axis: int = 1):
    v = _as_rowvec(a, "nanmedian")

    def build(c):
        s = F.array_sort(_kept(c))
        n = F.size(s)
        lo = F.try_element_at(s, ((n + 1) / 2).cast("int"))
        hi = F.try_element_at(s, (n / 2 + 1).cast("int"))
        return F.when(n == 0, F.lit(float("nan"))).otherwise((lo + hi) / 2)

    return v._reduce_rows(build, "nanmedian")


def nancumsum(a, axis: int = 1):
    """NaN treated as 0, numpy's nancumsum contract — one map after
    the existing in-row scan."""
    v = _as_rowvec(a, "nancumsum")
    z = v._unary(lambda c: F.transform(
        c, lambda x: F.when(F.isnan(x) | x.isNull(), F.lit(0.0)).otherwise(x)
    ))
    return z.cumsum(axis=axis)


def nancumprod(a, axis: int = 1):
    v = _as_rowvec(a, "nancumprod")
    z = v._unary(lambda c: F.transform(
        c, lambda x: F.when(F.isnan(x) | x.isNull(), F.lit(1.0)).otherwise(x)
    ))
    return z.cumprod(axis=axis)


def nanpercentile(a, q: float, axis: int = 0, exact: bool = True):
    """Per-dim percentile across rows skipping NaN — NaN maps to null
    so Spark's percentile agg skips it (one scalar shuffle, same plan
    as percentile)."""
    v = _as_rowvec(a, "nanpercentile")
    if axis != 0:
        raise ValueError("nanpercentile supports axis=0")
    p = (lambda cn: F.percentile(_nanif(cn), F.lit(q / 100.0))) if exact else (
        lambda cn: F.percentile_approx(_nanif(cn), F.lit(q / 100.0))
    )
    return v._axis0(f"np{q}", p)


def nanquantile(a, q: float, axis: int = 0, exact: bool = True):
    return nanpercentile(a, q * 100.0, axis, exact)


def quantile(a, q: float, axis: int = 0, exact: bool = True):
    """np.quantile == percentile(q*100) (reference reductions.py)."""
    v = _as_rowvec(a, "quantile")
    return v.percentile(q, axis=axis, exact=exact)


def moment(a, order: int, axis: int = 0):
    """Central moment across rows (reference dask/array/reductions.py
    moment) — delegates to the one-scan stats kernel."""
    from dask_spark.functions.stats import moment as _m

    return _m(_as_rowvec(a, "moment"), order, axis=axis)


def push(a, axis: int = 1):
    """Forward-fill NaN along an axis (reference dask/array/
    _slicing?  dask.array.push <- bottleneck push). Inner axis: one
    in-row scan (aggregate). axis 0 on a Series: the keyless
    fill_directional machinery."""
    if _is_series(a):
        raise TypeError(
            "push on a Series: use frame.ffill()/fill_directional with "
            "an explicit order column"
        )
    v = _as_rowvec(a, "push")
    if axis != 1:
        raise ValueError(
            "push supports axis=1 (in-row); axis-0 fill is frame.ffill"
        )

    def build(c):
        return F.aggregate(
            c,
            F.array().cast("array<double>"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.when(~F.isnan(x) & x.isNotNull(), x).otherwise(
                        F.coalesce(F.try_element_at(acc, F.lit(-1)), x)
                    )
                ),
            ),
        )

    return v._unary(build)


def ediff1d(a):
    """np.ediff1d: consecutive differences of the flattened array
    (reference routines.py ediff1d). Lowered to posexplode into a
    global (flat position, value) order + the keyless distributed
    diff (range-bucket halo, never a single-partition window);
    returns the (flat_idx, diff) frame."""
    v = _as_rowvec(a, "ediff1d")
    if v._id is None:
        raise ValueError("ediff1d needs an id column (dense row ids)")
    row = v._sdf.select(F.size(F.col(v._col)).alias("d")).first()
    d = int(row["d"]) if row else 0
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.window import diff as w_diff

    flat = DaskFrame(
        v._sdf.select(
            v._id, F.posexplode(F.col(v._col)).alias("pos", "val")
        ).select(
            (F.col(v._id).cast("long") * d + F.col("pos")).alias("flat_idx"),
            "val",
        )
    )
    out = w_diff(flat, "val", 1, order_by="flat_idx", out="diff")
    return DaskFrame(
        out._sdf.filter(F.col("flat_idx") > 0).select("flat_idx", "diff")
    )


def gradient(a, axis: int):
    """np.gradient along one axis (reference routines.py gradient).

    Inner axes: transpose the target axis to the end (a plan-time
    perm), then central/one-sided differences as ONE in-row
    expression over the contiguous last axis, and transpose back —
    map-only. Axis 0: the map_overlap stencil (depth-1 halo shuffle);
    np.gradient inside the kernel is one-sided exactly at the true
    global edges because the boundary buckets have no halo."""
    np = _np()
    if _is_nd(a) and axis == 0:
        # the 1-row shape probe (and a degenerate 1-row array) can't
        # difference; real halo buckets always carry >= 2 rows
        return a.map_overlap(
            lambda b: np.gradient(b, axis=0) if b.shape[0] > 1
            else np.zeros_like(b),
            depth=1,
        )
    v = a
    moved = False
    if _is_nd(a):
        m = len(a.inner_shape)
        if axis - 1 != m - 1:
            v = moveaxis(a, axis, m)
            moved = True
        d = v.inner_shape[-1]
        v = v._materialize()
        col = v._col
    elif _is_arr(a):
        if axis not in (1, -1):
            raise ValueError(
                "DArray gradient is in-row (axis 1); for the "
                "across-rows gradient convert to NDArray "
                "(from_darray) and use axis 0's map_overlap stencil"
            )
        row = a._sdf.select(F.size(F.col(a._col)).alias("d")).first()
        d = int(row["d"]) if row else 0
        col = a._col
    else:
        raise TypeError("gradient needs a DArray/NDArray")

    def build(c):
        def el(i):  # 1-based
            return F.element_at(c, i.cast("int"))

        return F.transform(c, lambda x, i: (
            F.when(i % d == 0, el(i + 2) - el(i + 1))
            .when(i % d == d - 1, el(i + 1) - el(i))
            .otherwise((el(i + 2) - el(i)) / 2)
        ))

    if _is_nd(v):  # NDArray._unary is per-element; build needs the block
        out = v._with_block(build(F.col(v._col)))
    else:
        out = v._unary(build)
    if moved:  # moveaxis put `axis` last; move it back
        return moveaxis(out, len(a.inner_shape), axis)
    return out


def outer(a, b: Sequence[float]):
    """np.outer of a distributed column vector with a driver-sized
    literal vector (reference routines.py outer): one transform over
    the literal — map-only, the literal rides the plan like dask's
    small-operand broadcasting."""
    if not _is_series(a):
        return _np().outer(a, b)
    from dask_spark.array import DArray

    lit = F.array(*[F.lit(float(x)) for x in b])
    sdf = a._frame._sdf.select(
        F.transform(lit, lambda e: a._expr * e).alias("outer")
    )
    return DArray(sdf, "outer")


def vdot(a, b: Sequence[float]):
    """Flattened dot product against a literal vector: per-row dot,
    one global sum — a scalar aggregate, no vector shuffle."""
    v = _as_rowvec(a, "vdot")
    per_row = v.dot(list(b))
    name = [c for c in per_row._sdf.columns if c != v._id][-1]
    from dask_spark.frame import DaskFrame

    return DaskFrame(per_row._sdf.select(F.sum(F.col(name)).alias("vdot")))


def apply_along_axis(func1d, axis: int, a):
    """np.apply_along_axis over an INNER axis (reference
    dask/array/routines.py apply_along_axis) — the Arrow map_blocks
    kernel runs numpy's own apply_along_axis per whole-partition
    tensor. axis 0 would span rows across partitions; use the
    reduction machinery instead."""
    _need_nd(a, "apply_along_axis")
    if axis == 0:
        raise ValueError("axis 0 spans partitions: use reductions/map_overlap")
    np = _np()
    return a.map_blocks(lambda b: np.apply_along_axis(func1d, axis, b))


def apply_over_axes(func, a, axes):
    """np.apply_over_axes over INNER axes via the same kernel."""
    _need_nd(a, "apply_over_axes")
    axes = [axes] if isinstance(axes, int) else list(axes)
    if 0 in axes:
        raise ValueError("axis 0 spans partitions: use reductions/map_overlap")
    np = _np()
    return a.map_blocks(lambda b: np.apply_over_axes(func, b, axes))


def histogramdd(frame, cols: Sequence[str], bins: int,
                ranges: Sequence[tuple], weights: str | None = None,
                density: bool = False):
    """D-dimensional histogram (reference dask/array/routines.py
    histogramdd, incl. weights=/density=): fixed-width bucket
    arithmetic map-side, one groupBy over <= bins**D keys — the same
    shape as histogram2d generalized. numpy's closed-last-bin edge
    rule applies per dimension; density divides by total·cell-volume
    via an unpartitioned window over the tiny post-agg frame."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    keys = []
    volume = 1.0
    for c, (lo, hi) in zip(cols, ranges):
        w = (float(hi) - float(lo)) / bins
        volume *= w
        b = F.when(F.col(c) == float(hi), bins - 1).otherwise(
            F.floor((F.col(c) - float(lo)) / w).cast("int")
        )
        sdf = sdf.filter(
            (F.col(c) >= float(lo)) & (F.col(c) <= float(hi))
        )
        keys.append(b.alias(f"b_{c}"))
    if weights:
        keys.append(F.col(weights).alias("__w"))
    out = (
        sdf.select(*keys)
        .groupBy(*[f"b_{c}" for c in cols])
        .agg(
            (F.sum(F.col("__w").cast("double")) if weights
             else F.count(F.lit(1))).alias("count")
        )
    )
    if density:
        # bins^d rows is bounded, but keep every density normalization
        # on the scalar-agg + broadcast pattern (no unpartitioned
        # windows anywhere — the plan audit asserts this invariant).
        tot = out.agg(F.sum("count").alias("__total"))
        out = (
            out.crossJoin(F.broadcast(tot))
            .withColumn(
                "count", F.col("count") / (F.col("__total") * F.lit(volume))
            )
            .drop("__total")
        )
    return DaskFrame(out)


def reduction(x, chunk, aggregate, axis: int = 0):
    """dask.array.reduction's two-stage shape (reference
    dask/array/reductions.py reduction): ``chunk`` runs vectorized
    per whole-partition block (Arrow), producing one partial per
    partition; ``aggregate`` combines the <= npartitions partials on
    the driver — the same tree-reduce layout dask builds, with Spark
    partitions as the chunks. Returns the aggregated numpy result."""
    np = _np()
    if not _is_arr(x):
        raise TypeError("reduction needs a DArray/NDArray")
    m = x._materialize() if _is_nd(x) else x
    inner = m.inner_shape if _is_nd(x) else None
    col = m._col

    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            raw = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[col]]
            )
            if inner is not None:
                raw = raw.reshape(len(pdf), *inner)
            part = np.asarray(chunk(raw), dtype="float64")
            yield pd.DataFrame({"part": [list(part.ravel())],
                                "shape": [list(part.shape)]})

    parts = m._sdf.select(col).mapInPandas(
        run, "part array<double>, shape array<int>"
    ).collect()
    partials = [
        np.asarray(r["part"], dtype="float64").reshape(r["shape"])
        for r in parts
    ]
    return aggregate(partials)


def elemwise(op, *args):
    """dask.array.elemwise (reference dask/array/core.py elemwise):
    apply an elementwise op across operands. Column-builder ops stay
    JVM; arbitrary Python callables take the Arrow map_blocks path."""
    if not args:
        raise ValueError("elemwise needs at least one operand")
    a, rest = args[0], args[1:]
    if not (_is_arr(a) or _is_series(a)):
        return op(*args)
    if len(rest) == 0:
        try:  # Column builder first; numpy callable as fallback
            return a.map(op) if _is_arr(a) else _series_like(a, op(a._expr))
        except Exception:
            if _is_arr(a):
                return a.map_blocks(op)
            raise
    if len(rest) == 1 and isinstance(rest[0], (int, float)):
        if hasattr(a, "_binop"):
            return a._binop(rest[0], op)
        return a._bin(rest[0], op)
    raise NotImplementedError(
        "elemwise across multiple distributed operands: align them on "
        "one frame/lineage and compose Column expressions"
    )


def blockwise(func, out_ind, a, a_ind, **kwargs):
    """Restricted dask.blockwise (reference dask/blockwise.py): the
    single-source identity-index form lowers to map_blocks; general
    multi-source index contractions are Catalyst's job here (joins /
    matmul / tensordot already cover the common contractions)."""
    if _is_arr(a) and tuple(out_ind) == tuple(a_ind):
        return a.map_blocks(func)
    raise NotImplementedError(
        "general blockwise index contractions: use matmul/tensordot/"
        "einsum or join on an id column"
    )


atop = blockwise  # dask's historical alias


__all__ += [
    "nanmax", "nanmin", "nanprod", "nanvar", "nanstd", "nanargmax",
    "nanargmin", "nanmedian", "nancumsum", "nancumprod",
    "nanpercentile", "nanquantile", "quantile", "moment", "push",
    "ediff1d", "gradient", "outer", "vdot", "apply_along_axis",
    "apply_over_axes", "histogramdd", "reduction", "elemwise",
    "blockwise", "atop",
]


# ---- array IO / namespace shims ---------------------------------------

def store(source, target: str, mode: str = "overwrite"):
    """dask.array.store's role — persist blocks to stable storage
    (reference dask/array/core.py store writes chunk-parallel into an
    array-like; the Spark-native sink is a parquet table, written
    executor-parallel by the normal writer)."""
    if _is_nd(source):
        frame = source.to_frame()
    elif _is_arr(source):
        frame = source.to_frame()
    elif hasattr(source, "to_parquet"):
        frame = source
    else:
        raise TypeError("store needs a DArray/NDArray/DaskFrame source")
    frame.to_parquet(target, mode=mode)
    return target


def to_npy_stack(dirname: str, x, axis: int = 0):
    """One ``.npy`` file per Spark partition (reference:
    dask/array/core.py to_npy_stack writes one file per chunk plus an
    info header). Files are written EXECUTOR-side inside the Arrow
    pass — on a cluster ``dirname`` must be a shared filesystem,
    exactly dask's contract. A ``meta.json`` header records the inner
    shape and the per-file row counts."""
    import json
    import os

    import pandas as pd

    np = _np()
    if axis != 0:
        raise ValueError("npy stacks are partitioned along axis 0")
    m = x._materialize() if _is_nd(x) else x
    col = m._col
    if _is_nd(x):
        inner = m.inner_shape
    else:  # DArray: record the vector width so the read side can
        # restore (rows, d) instead of guessing (rows, 1)
        row = m._sdf.select(F.size(F.col(col)).alias("d")).first()
        inner = (int(row["d"]),) if row else (1,)
    os.makedirs(dirname, exist_ok=True)

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = []
        for pdf in batches:
            if len(pdf):
                chunks.append(np.asarray(
                    [np.asarray(v, dtype="float64") for v in pdf[col]]
                ))
        if not chunks:
            return
        arr = np.concatenate(chunks).reshape(-1, *inner)
        path = os.path.join(dirname, f"{pid}.npy")
        np.save(path, arr)
        yield pd.DataFrame({"file": [path], "rows": [len(arr)]})

    # numeric partition order: a lexicographic sort would interleave
    # '10.npy' before '2.npy' and scramble row ids at 10+ partitions
    files = sorted(
        ((r["file"], r["rows"])
         for r in m._sdf.select(col).mapInPandas(
             run, "file string, rows long"
         ).collect()),
        key=lambda fr: int(os.path.splitext(os.path.basename(fr[0]))[0]),
    )
    with open(os.path.join(dirname, "meta.json"), "w") as fh:
        json.dump({
            "inner_shape": list(inner),
            "files": [f for f, _ in files],
            "rows": [int(r) for _, r in files],
        }, fh)
    return dirname


def from_npy_stack(dirname: str, npartitions: int | None = None):
    """Lazy-parallel read of a npy stack: the file LIST is the plan
    input; each executor loads only its files inside the Arrow pass
    (reference dask/array/core.py from_npy_stack — one task per
    file)."""
    import json
    import os

    import pandas as pd

    from dask_spark.ndarray import NDArray
    from dask_spark.session import get_spark

    np = _np()
    with open(os.path.join(dirname, "meta.json")) as fh:
        meta = json.load(fh)
    files = meta["files"]
    rows = meta["rows"]
    starts = [0]
    for r in rows[:-1]:
        starts.append(starts[-1] + r)
    inner = tuple(meta["inner_shape"] or (1,))
    spark = get_spark()
    fdf = spark.createDataFrame(
        list(zip(files, starts)), "file string, start long"
    ).repartition(npartitions or min(len(files), 32), "file")

    def run(batches):
        for pdf in batches:
            for file, start in zip(pdf["file"], pdf["start"]):
                arr = np.load(file).reshape(-1, int(_np().prod(inner)))
                yield pd.DataFrame({
                    "row_id": range(int(start), int(start) + len(arr)),
                    "block": list(arr),
                })

    sdf = fdf.mapInPandas(run, "row_id long, block array<double>")
    return NDArray(sdf, inner, "block", "row_id")


def _gated_io(libname: str, hint: str):
    def missing(*a, **k):
        raise ImportError(
            f"{libname} is not installed in this environment; {hint}"
        )

    return missing


def to_zarr(x, url: str, component: str | None = None):
    """Zarr sink (reference dask/array/core.py to_zarr). The zarr
    library is absent here; with it installed this computes the array
    and writes one zarr store (driver-side write — the chunk-parallel
    writer needs zarr's region API)."""
    try:
        import zarr  # noqa: F401
    except ImportError:
        _gated_io("zarr", "to_zarr/from_zarr need the zarr package")()
    arr = x.compute() if hasattr(x, "compute") else x
    zarr.save(url, arr)
    return url


def from_zarr(url: str, component: str | None = None):
    try:
        import zarr  # noqa: F401
    except ImportError:
        _gated_io("zarr", "to_zarr/from_zarr need the zarr package")()
    return _nd_from_numpy(_np().asarray(zarr.load(url)))


def to_tiledb(x, uri: str):
    try:
        import tiledb  # noqa: F401
    except ImportError:
        _gated_io("tiledb", "to_tiledb/from_tiledb need tiledb")()
    arr = x.compute() if hasattr(x, "compute") else x
    tiledb.from_numpy(uri, arr)
    return uri


def from_tiledb(uri: str):
    try:
        import tiledb  # noqa: F401
    except ImportError:
        _gated_io("tiledb", "to_tiledb/from_tiledb need tiledb")()
    with tiledb.open(uri) as a:
        return _nd_from_numpy(_np().asarray(a[:]))


def to_hdf5(filename: str, datapath: str, x):
    try:
        import h5py  # noqa: F401
    except ImportError:
        _gated_io("h5py", "to_hdf5 needs h5py")()
    arr = x.compute() if hasattr(x, "compute") else x
    with h5py.File(filename, "a") as fh:
        fh.create_dataset(datapath, data=arr)
    return filename


__all__ += [
    "store", "to_npy_stack", "from_npy_stack", "to_zarr", "from_zarr",
    "to_tiledb", "from_tiledb", "to_hdf5",
]


def array_function_dispatch(self, func, types, args, kwargs):
    """``__array_function__`` body shared by the collections
    (reference: dask Array.__array_function__ — numpy routines like
    ``np.where``/``np.take``/``np.concatenate`` route to the lazy
    twins instead of materializing). Resolution order: this module's
    routines, then the ufunc family, then the dask_spark.array
    namespace (stack wrappers, creation twins). Unknown names return
    NotImplemented for numpy's standard TypeError."""
    name = getattr(func, "__name__", None)
    if not name:
        return NotImplemented
    target = globals().get(name)
    if target is None:
        import dask_spark.array as _da

        target = getattr(_da, name, None)
    if target is None or not callable(target):
        return NotImplemented
    try:
        return target(*args, **kwargs)
    except TypeError:
        return NotImplemented


__all__ += ["array_function_dispatch"]
