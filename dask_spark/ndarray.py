"""N-D dask.array analog (reference: dask/array/core.py Array,
routines.py, slicing.py, rechunk.py, reshape.py) over Spark rows.

Layout: axis 0 is the DISTRIBUTED rows axis (Spark partitions are the
dask chunks along axis 0); every trailing axis lives INSIDE the row,
stored flattened row-major in one ``array<double>`` column. The
python-side ``inner_shape`` tuple carries the trailing extents, so a
logical ``(n, 8, 8)`` tensor is n rows of 64-long arrays.

The core trick: because ``inner_shape`` is static, every structural
inner-axis op — transpose, slicing, flip, roll, diag, tril/triu,
reshape, squeeze — reduces to a GATHER through a permutation that
numpy computes ON THE DRIVER at plan-build time (``np.arange(size)
.reshape(shape)`` + the numpy op + ``ravel()``). At run time the JVM
evaluates one ``transform(lit(idx), i -> element_at(block, i))`` per
row: no Python, no shuffle, no per-op UDF — dask's blockwise graph
node becomes a Catalyst projection. Reductions along an inner axis
use closed-form stride arithmetic inside ``aggregate``; reductions
along axis 0 lower to posexplode + groupBy(position) exactly like
DArray (only ``size`` scalars per row cross the wire).

At 100 TB: axis 0 scales with the cluster (rechunk =
repartitionByRange on the row index); inner blocks are one row's
payload and must fit in a task — same contract as a dask chunk. The
Arrow kernel path is memory-safe for wide blocks: Spark 4 bounds
Arrow batches by BYTES (spark.sql.execution.arrow.maxBytesPerBatch,
64 MB default), so a 4096-double inner never inflates a batch past
the cap regardless of the 10k-record default."""

from __future__ import annotations

import math
from typing import Callable, Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame

try:  # numpy is a hard dep of pyspark itself, but keep the gate cheap
    import numpy as np
except ImportError:  # pragma: no cover
    np = None


def _require_np():
    if np is None:  # pragma: no cover
        raise ImportError("ndarray ops require numpy")
    return np


# Inner sizes at or below this stay pure-JVM Column expressions (no
# Python workers — right for vector-sized blocks like embeddings);
# bigger blocks switch to vectorized Arrow/numpy kernels: interpreted
# higher-order functions cost ~100ns/element while numpy does the same
# gather/reduce in ~1ns, and mapInPandas is also a projection barrier,
# so a computed block column can never be re-inlined (CollapseProject
# duplicating a block PRODUCER into every element read of a consumer
# turns O(size) into O(size²) per row — measured: a 4096-wide computed
# block made transpose().sum() hang vs 0.7s on a stored column).
EXPR_FUSION_LIMIT = 512

# Hard ceiling on one row's payload: inner axes are SINGLE-CHUNK by
# layout (a block must fit a task — the same contract as a dask
# chunk, reference dask/array/rechunk.py:270 rechunks any axis, this
# engine only axis 0). 256 MiB of doubles per row is already ~2× a
# dask default chunk; beyond it, switch to the chunked-inner layout
# (dask_spark.chunked.ChunkedNDArray): (row_id, chunk_id, tile) rows
# whose cross-axis structural ops cost one full-tensor shuffle — the
# reason it is opt-in rather than the default. The error below
# documents the boundary instead of letting an executor OOM discover
# it.
INNER_BLOCK_LIMIT_BYTES = 256 * 1024 * 1024


def _collect_block(pos_col: str, val_col: str):
    """Rebuild a block array from (position, value) rows INSIDE an
    aggregate (sorted in-agg, never on the driver) — shared by every
    axis-0 family member (_reduce_rows, cumsum, coarsen)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(pos_col, val_col))),
        lambda s: s[val_col],
    )


class NDArray:
    """Lazy N-D array: ``shape = (nrows, *inner_shape)``.

    ``perm`` is the driver-side fusion state: a flat index array
    mapping the LOGICAL layout to the stored source block. Structural
    ops only compose ``perm`` in numpy (zero plan growth); the single
    gather expression is emitted when a consumer actually needs the
    block, and reductions/matmul skip even that by indirecting their
    element reads through the perm literal — so
    ``transpose()[...]:...].sum(k)`` is ONE O(inner_size) pass per row
    no matter how many structural ops are chained (naively chaining
    gather expressions lets CollapseProject inline the producer into
    every consumer lambda — measured O(size²) per row at inner size
    4096). This is dask's blockwise slice fusion, resolved at plan
    time on the driver."""

    def __init__(self, sdf, inner_shape: Sequence[int], col: str = "block",
                 id_col: str | None = None, perm=None):
        self._sdf = sdf
        self._col = col
        self._id = id_col
        self.inner_shape = tuple(int(s) for s in inner_shape)
        if any(s <= 0 for s in self.inner_shape):
            raise ValueError(f"bad inner shape {self.inner_shape}")
        inner_bytes = 8 * math.prod(self.inner_shape)
        if inner_bytes > INNER_BLOCK_LIMIT_BYTES:
            raise ValueError(
                f"inner block of {self.inner_shape} is {inner_bytes >> 20}"
                f" MiB/row — beyond the single-chunk inner-axis layout "
                f"(limit {INNER_BLOCK_LIMIT_BYTES >> 20} MiB; a block "
                f"must fit one task). Put the largest axis at position "
                f"0 (the distributed axis), e.g. transpose the logical "
                f"layout before construction; or use the chunked-inner "
                f"layout (dask_spark.chunked.ChunkedNDArray), which "
                f"splits the first inner axis into per-task tiles at "
                f"the cost of one shuffle per cross-axis structural op."
            )
        self._perm = (
            None
            if perm is None
            else _require_np().asarray(perm, dtype="int64").ravel()
        )

    # ---- constructors -------------------------------------------------
    @classmethod
    def from_vectors(cls, frame: DaskFrame, col: str, dim: int,
                     id_col: str | None = None) -> "NDArray":
        """(n, dim) from a vector column — the DArray layout."""
        sdf = frame._sdf.select(
            *([id_col] if id_col else []),
            F.col(col).cast("array<double>").alias("block"),
        )
        return cls(sdf, (dim,), "block", id_col)

    @classmethod
    def from_darray(cls, arr, dim: int) -> "NDArray":
        return cls(
            arr._sdf.select(
                *([arr._id] if arr._id else []),
                F.col(arr._col).cast("array<double>").alias("block"),
            ),
            (dim,), "block", arr._id,
        )

    def to_darray(self):
        from dask_spark.array import DArray

        if len(self.inner_shape) != 1:
            raise ValueError(f"to_darray needs 1-D inner, got {self.inner_shape}")
        m = self._materialize()
        return DArray(m._sdf, m._col, m._id)

    def to_frame(self) -> DaskFrame:
        return DaskFrame(self._materialize()._sdf)

    # ---- metadata -----------------------------------------------------
    @property
    def inner_size(self) -> int:
        return math.prod(self.inner_shape)

    @property
    def ndim(self) -> int:
        return 1 + len(self.inner_shape)

    @property
    def shape(self):
        """(nrows, *inner). The row count is a COUNT job (dask shows
        NaN for unknown chunks; we answer exactly on demand)."""
        return (self._sdf.count(), *self.inner_shape)

    def _keep(self):
        return [self._id] if self._id else []

    def _with_block(self, expr, inner_shape=None) -> "NDArray":
        return NDArray(
            self._sdf.select(*self._keep(), expr.alias(self._col)),
            self.inner_shape if inner_shape is None else inner_shape,
            self._col, self._id,
        )

    # ---- the driver-computed gather ----------------------------------
    def _gather(self, flat_idx, inner_shape) -> "NDArray":
        """Compose the structural op into ``perm`` — pure numpy on the
        driver, NO expression is added (see class docstring)."""
        np = _require_np()
        flat_idx = np.asarray(flat_idx, dtype="int64").ravel()
        perm = flat_idx if self._perm is None else self._perm[flat_idx]
        return NDArray(
            self._sdf, tuple(inner_shape), self._col, self._id, perm=perm
        )

    def _materialize(self) -> "NDArray":
        """Emit the ONE pending gather. Small inner: a JVM transform
        over an np-array literal (a single Literal node evaluated once
        — a python list would become CreateArray with len(idx) literal
        children built per row, measured 2× slower at inner size
        4096). Large inner: the Arrow/numpy kernel path (see
        EXPR_FUSION_LIMIT)."""
        if self._perm is None:
            return self
        if self.inner_size > EXPR_FUSION_LIMIT:
            return self._np_apply(lambda blk: blk)
        idx = F.lit((self._perm + 1).astype("int32"))
        b = F.col(self._col)
        return self._with_block(F.transform(idx, lambda i: F.element_at(b, i)))

    def _np_apply(self, fn: Callable, out_inner=None) -> "NDArray":
        """Vectorized Arrow kernel: apply the pending perm (one numpy
        take) then ``fn`` over the whole-partition (rows, *inner)
        tensor. The mapInPandas boundary doubles as a projection
        barrier, so upstream computed columns evaluate exactly once."""
        np = _require_np()
        perm, inner = self._perm, self.inner_shape
        col, keep = self._col, self._keep()
        out_schema = ", ".join(
            [*(f"{k} {dict(self._sdf.dtypes)[k]}" for k in keep),
             f"{col} array<double>"]
        )

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                raw = np.asarray(
                    [np.asarray(v, dtype="float64") for v in pdf[col]]
                ).reshape(len(pdf), -1)
                if perm is not None:
                    raw = raw[:, perm]
                res = np.asarray(
                    fn(raw.reshape(len(pdf), *inner)), dtype="float64"
                )
                pdf = pdf.copy()
                pdf[col] = list(res.reshape(len(pdf), -1))
                yield pdf

        if out_inner is None:
            probe = np.zeros((1, *inner))
            out_inner = np.asarray(fn(probe)).shape[1:]
        return NDArray(
            self._sdf.mapInPandas(run, out_schema),
            tuple(int(s) for s in out_inner) or (1,),
            col, self._id,
        )

    def _src(self):
        """Element accessor for fused consumers: 0-based LOGICAL flat
        position Column -> value Column, indirected through the perm
        literal when a gather is pending."""
        b = F.col(self._col)
        if self._perm is None:
            return lambda pos: F.element_at(b, (pos + 1).cast("int"))
        plit = F.lit((self._perm + 1).astype("int32"))
        return lambda pos: F.element_at(
            b, F.element_at(plit, (pos + 1).cast("int"))
        )

    def _index_tensor(self):
        np = _require_np()
        return np.arange(self.inner_size, dtype="int64").reshape(self.inner_shape)

    # ---- structural ops (reference: dask/array/routines.py,
    # slicing.py, reshape.py — each is one gather here) -----------------
    def reshape(self, *shape) -> "NDArray":
        """Inner-axes reshape (row-major): pure metadata — the flat
        layout is unchanged, no expression is added. Reshaping ACROSS
        axis 0 (changing the row extent) would be a global re-blocking
        shuffle; like dask with unknown chunks, we refuse."""
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        shape = tuple(int(s) for s in shape)
        if math.prod(shape) != self.inner_size:
            raise ValueError(f"cannot reshape inner {self.inner_shape} -> {shape}")
        return NDArray(self._sdf, shape, self._col, self._id, perm=self._perm)

    def ravel(self) -> "NDArray":
        return self.reshape(self.inner_size)

    def transpose(self, axes: Sequence[int] | None = None) -> "NDArray":
        """Permute INNER axes (axis 0 stays the distributed axis —
        transposing the row axis into a row would need the full global
        re-blocking dask also treats as a rechunk+shuffle)."""
        m = len(self.inner_shape)
        axes = tuple(range(m - 1, -1, -1)) if axes is None else tuple(axes)
        if sorted(axes) != list(range(m)):
            raise ValueError(f"bad axes {axes} for inner ndim {m}")
        t = self._index_tensor().transpose(axes)
        return self._gather(t.ravel(), t.shape)

    def swapaxes(self, a1: int, a2: int) -> "NDArray":
        m = len(self.inner_shape)
        axes = list(range(m))
        axes[a1 - 1], axes[a2 - 1] = axes[a2 - 1], axes[a1 - 1]
        if a1 == 0 or a2 == 0:
            raise ValueError("cannot swap the distributed row axis")
        return self.transpose(axes)

    def squeeze(self) -> "NDArray":
        shape = tuple(s for s in self.inner_shape if s != 1) or (1,)
        return self.reshape(shape)

    def expand_dims(self, axis: int) -> "NDArray":
        if axis == 0:
            raise ValueError("cannot expand before the distributed row axis")
        shape = list(self.inner_shape)
        shape.insert(axis - 1, 1)
        return self.reshape(shape)

    def flip(self, axis: int) -> "NDArray":
        np = _require_np()
        if axis == 0:
            raise ValueError("flip along rows: sort descending by the id instead")
        t = np.flip(self._index_tensor(), axis=axis - 1)
        return self._gather(t.ravel(), self.inner_shape)

    def roll(self, shift: int, axis: int) -> "NDArray":
        np = _require_np()
        if axis == 0:
            raise ValueError("roll along rows is a global index shift — use shift()")
        t = np.roll(self._index_tensor(), shift, axis=axis - 1)
        return self._gather(t.ravel(), self.inner_shape)

    def diagonal(self) -> "NDArray":
        np = _require_np()
        if len(self.inner_shape) != 2:
            raise ValueError("diagonal needs 2-D inner blocks")
        t = np.diagonal(self._index_tensor())
        return self._gather(t.ravel(), t.shape)

    def _masked(self, mask) -> "NDArray":
        """Zero-out via a literal 0/1 mask (tril/triu shape)."""
        np = _require_np()
        self = self._materialize()
        m = F.lit(np.asarray(mask, dtype="float64").ravel())
        b = F.col(self._col)
        return self._with_block(F.zip_with(b, m, lambda x, k: x * k))

    def tril(self, k: int = 0) -> "NDArray":
        np = _require_np()
        if len(self.inner_shape) != 2:
            raise ValueError("tril needs 2-D inner blocks")
        return self._masked(np.tri(*self.inner_shape, k=k))

    def triu(self, k: int = 0) -> "NDArray":
        np = _require_np()
        if len(self.inner_shape) != 2:
            raise ValueError("triu needs 2-D inner blocks")
        return self._masked(1 - np.tri(*self.inner_shape, k=k - 1))

    def pad(self, pad_width, value: float = 0.0) -> "NDArray":
        """np.pad constant mode over INNER axes (reference:
        dask/array/creation.py pad). ``pad_width``: dict {axis:
        (before, after)} or one (before, after) for the last axis.
        Planned as a single gather whose index tensor carries a
        sentinel at pad positions — the JVM emits the constant there,
        still one map-only projection (any pending structural perm
        composes in first)."""
        np = _require_np()
        if isinstance(pad_width, tuple):
            pad_width = {len(self.inner_shape): pad_width}
        if 0 in pad_width:
            raise ValueError("cannot pad the distributed row axis")
        widths = [
            tuple(int(x) for x in pad_width.get(a, (0, 0)))
            for a in range(1, len(self.inner_shape) + 1)
        ]
        t = self._index_tensor()
        t = np.pad(t, widths, constant_values=-1)
        if t.size > EXPR_FUSION_LIMIT:
            return self._np_apply(
                lambda blk: np.pad(
                    blk, [(0, 0), *widths], constant_values=value
                )
            )
        flat = t.ravel()
        if self._perm is not None:
            src = np.where(flat >= 0, self._perm[np.maximum(flat, 0)], -1)
        else:
            src = flat
        idx = F.lit(np.where(src >= 0, src + 1, -1).astype("int32"))
        b = F.col(self._col)
        out = self._with_block(
            F.transform(
                idx,
                lambda i: F.when(i > 0, F.element_at(b, i)).otherwise(
                    F.lit(float(value))
                ),
            ),
            t.shape,
        )
        return out

    def __getitem__(self, key) -> "NDArray":
        """Per-axis basic+fancy indexing. Axis 0 selectors delegate to
        the DArray row machinery (global index over id order — scale
        safe); inner-axis selectors compose into ONE numpy-planned
        gather."""
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) > self.ndim:
            raise IndexError(f"too many indices for ndim {self.ndim}")
        rows = key[0] if key else slice(None)
        inner = key[1:]

        sdf = self._sdf
        if not (isinstance(rows, slice) and rows == slice(None)):
            from dask_spark.array import DArray

            d = DArray(sdf, self._col, self._id)[rows, :]
            sdf = d._sdf
        # ORTHOGONAL per-axis selection (dask refuses numpy's broadcast
        # of multiple fancy indices too): numpy applies each selector
        # to the index tensor one axis at a time, int axes are dropped
        # from the output shape after the gather
        np = _require_np()
        t = self._index_tensor()
        drop = []
        for ax, k in enumerate(inner):
            if isinstance(k, int):
                t = np.take(t, [k], axis=ax)
                drop.append(ax)
            elif isinstance(k, (list, tuple)):
                t = np.take(t, [int(i) for i in k], axis=ax)
            elif isinstance(k, slice):
                t = t[(slice(None),) * ax + (k,)]
            else:
                raise TypeError(f"unsupported inner selector {k!r}")
        shape = tuple(s for i, s in enumerate(t.shape) if i not in drop) or (1,)
        picked = NDArray(
            sdf, self.inner_shape, self._col, self._id, perm=self._perm
        )
        if t.size == self.inner_size and (t.ravel() == np.arange(t.size)).all():
            return NDArray(sdf, shape, self._col, self._id, perm=self._perm)
        return picked._gather(t.ravel(), shape)

    # ---- elementwise --------------------------------------------------
    def _unary(self, fn: Callable) -> "NDArray":
        self = self._materialize()
        b = F.col(self._col)
        return self._with_block(F.transform(b, lambda x: fn(x)))

    def __add__(self, o):
        return self._bin(o, lambda x, y: x + y)

    def __sub__(self, o):
        return self._bin(o, lambda x, y: x - y)

    def __mul__(self, o):
        return self._bin(o, lambda x, y: x * y)

    def __truediv__(self, o):
        return self._bin(o, lambda x, y: x / y)

    def _bin(self, o, fn) -> "NDArray":
        """Scalar, a numpy literal broadcastable to ``inner_shape``
        (dask broadcasts small operands the same way: they ride the
        graph as literals, never shuffle), or another NDArray of the
        same shape — self-combinations (x + x.flip(1)) zip in place;
        distinct sources align on the id column with ONE equi-join
        (dask's blockwise alignment; r15 array-fuzz find)."""
        if isinstance(o, (int, float)):
            return self._unary(lambda x: fn(x, F.lit(float(o))))
        if isinstance(o, NDArray):
            if o.inner_shape != self.inner_shape:
                raise ValueError(
                    f"operand inner shapes differ: {self.inner_shape} "
                    f"vs {o.inner_shape}"
                )
            a, b = self._materialize(), o._materialize()
            if o is self:
                c = F.col(a._col)
                return a._with_block(F.zip_with(c, c, fn))
            if not (a._id and b._id):
                raise ValueError(
                    "array-array elementwise ops need id-aligned "
                    "operands (construct both with an id column)"
                )
            rs = b._sdf.select(F.col(b._id).alias("__oid"),
                               F.col(b._col).alias("__ob"))
            j = a._sdf.join(rs, F.col(a._id) == F.col("__oid"), "inner")
            out = j.select(
                F.col(a._id),
                F.zip_with(F.col(a._col), F.col("__ob"), fn)
                .alias(a._col),
            )
            return NDArray(out, a.inner_shape, a._col, a._id)
        np = _require_np()
        self = self._materialize()
        arr = np.broadcast_to(np.asarray(o, dtype="float64"), self.inner_shape)
        lit = F.lit(arr.ravel().copy())
        b = F.col(self._col)
        return self._with_block(F.zip_with(b, lit, fn))

    def map(self, fn: Callable) -> "NDArray":
        return self._unary(fn)

    # ---- reductions ---------------------------------------------------
    def _axis_strides(self, axis: int):
        s = self.inner_shape
        ai = axis - 1
        rem = math.prod(s[ai + 1:]) if ai + 1 < len(s) else 1
        return ai, rem

    def sum(self, axis: int):
        return self._reduce(axis, "sum")

    def mean(self, axis: int):
        return self._reduce(axis, "mean")

    def max(self, axis: int):
        return self._reduce(axis, "max")

    def min(self, axis: int):
        return self._reduce(axis, "min")

    def prod(self, axis: int):
        return self._reduce(axis, "prod")

    def var(self, axis: int, ddof: int = 0):
        """numpy-default population variance (ddof=0); the inner-axis
        form folds (Σx, Σx²) in one pass — var = Σx²/k − (Σx/k)²,
        rescaled for ddof."""
        return self._reduce(axis, "var", ddof=ddof)

    def std(self, axis: int, ddof: int = 0):
        out = self.var(axis, ddof=ddof)
        b = F.col(out._col)
        return out._with_block(F.transform(b, lambda x: F.sqrt(x)))

    def argmax(self, axis: int):
        """Index of the max along an INNER axis (first hit, numpy
        tie rule). Axis-0 argmax would be a per-position global argmax
        over row ids — use explode()+groupBy(max_by) instead."""
        return self._reduce(axis, "argmax")

    def argmin(self, axis: int):
        return self._reduce(axis, "argmin")

    def _reduce(self, axis: int, how: str, ddof: int = 0):
        """axis>=1: closed-form stride walk inside ``aggregate`` — the
        output cell ``o`` splits as (hi, lo) around the reduced axis,
        so its source run is ``base + j*rem`` (no index tables needed,
        any inner rank). axis==0: posexplode + groupBy(position) —
        ``inner_size`` scalars per row is all that shuffles, partials
        combine map-side; the single result row is rebuilt with an
        in-agg sort, never on the driver."""
        if axis < 0:  # numpy negative-axis convention (ndim incl. rows)
            axis = self.ndim + axis
        if axis == 0:
            return self._materialize()._reduce_rows(how, ddof)
        ai, rem = self._axis_strides(axis)
        if self.inner_size > EXPR_FUSION_LIMIT:
            if how == "var":
                return self._np_apply(lambda blk: blk.var(axis=ai + 1, ddof=ddof))
            return self._np_apply(
                lambda blk: getattr(blk, how)(axis=ai + 1)
            )
        k = self.inner_shape[ai]
        out_shape = tuple(s for i, s in enumerate(self.inner_shape) if i != ai) or (1,)
        out_size = math.prod(out_shape)
        src = self._src()  # fused: reads through the pending perm

        def cell(o):
            base = (o / F.lit(rem)).cast("long") * F.lit(k * rem) + o % F.lit(rem)
            run = F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda j: src(base + j * F.lit(rem)),
            )
            if how == "sum":
                return F.aggregate(run, F.lit(0.0), lambda a, x: a + x)
            if how == "mean":
                return F.aggregate(run, F.lit(0.0), lambda a, x: a + x) / k
            if how == "max":
                return F.array_max(run)
            if how == "min":
                return F.array_min(run)
            if how == "prod":
                return F.aggregate(run, F.lit(1.0), lambda a, x: a * x)
            if how == "var":
                s1 = F.aggregate(run, F.lit(0.0), lambda a, x: a + x)
                s2 = F.aggregate(run, F.lit(0.0), lambda a, x: a + x * x)
                if k - ddof == 0:
                    # axis extent == ddof: numpy yields NaN (0/0);
                    # NULL is the engine analog — a literal 0 divisor
                    # would raise ANSI DIVIDE_BY_ZERO at runtime
                    return F.lit(None).cast("double")
                return (s2 - s1 * s1 / k) / (k - ddof)
            if how in ("argmax", "argmin"):
                best = F.array_max(run) if how == "argmax" else F.array_min(run)
                return (F.array_position(run, best) - 1).cast("double")
            raise ValueError(how)

        return self._with_block(
            F.transform(F.sequence(F.lit(0), F.lit(out_size - 1)), cell), out_shape
        )

    def _reduce_rows(self, how: str, ddof: int = 0) -> "NDArray":
        if how in ("argmax", "argmin"):
            raise ValueError(
                "axis-0 argmax/argmin: use explode() + groupBy(pos) "
                "with max_by(id, val) — row ids, not positions"
            )
        if how == "var" and ddof not in (0, 1):
            raise ValueError(
                "axis-0 var supports ddof 0 (var_pop) or 1 (var_samp) "
                f"only, got ddof={ddof}"
            )
        agg = {
            "sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min,
            "prod": F.product,
            "var": F.var_samp if ddof else F.var_pop,
        }[how]
        ex = self._sdf.select(
            F.posexplode(F.col(self._col)).alias("__p", "__v")
        )
        per = ex.groupBy("__p").agg(agg("__v").alias("__a"))
        one = per.agg(_collect_block("__p", "__a").alias(self._col))
        return NDArray(one, self.inner_shape, self._col, None)

    def cumsum(self, axis: int) -> "NDArray":
        """Cumulative sum (reference: dask/array/reductions.py cumsum).
        Inner axes: the vectorized Arrow kernel (an in-row scan).
        Axis 0: a running sum per position across rows — posexplode →
        per-position window ordered by id → regroup: inner_size
        INDEPENDENT scans run in parallel (partitioned by position,
        never a single-partition window), two shuffles of inner_size
        scalars per row."""
        np = _require_np()
        if axis < 0:
            axis = self.ndim + axis
        if axis == 0:
            if self._id is None:
                raise ValueError("axis-0 cumsum needs id_col (row order)")
            from pyspark.sql import Window

            m = self._materialize()
            ex = m._sdf.select(
                m._id, F.posexplode(F.col(m._col)).alias("__p", "__v")
            )
            w = (
                Window.partitionBy("__p")
                .orderBy(m._id)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            cs = ex.withColumn("__c", F.sum("__v").over(w))
            rows = cs.groupBy(m._id).agg(
                _collect_block("__p", "__c").alias(m._col)
            )
            return NDArray(rows, self.inner_shape, m._col, m._id)
        ai, _ = self._axis_strides(axis)
        return self._np_apply(lambda blk: np.cumsum(blk, axis=ai + 1))

    def cumprod(self, axis: int) -> "NDArray":
        """Cumulative product along an INNER axis (Arrow kernel)."""
        np = _require_np()
        if axis < 0:
            axis = self.ndim + axis
        if axis == 0:
            raise ValueError(
                "axis-0 cumprod: compose log → cumsum(0) → exp for "
                "positive data, or explode + product window"
            )
        ai, _ = self._axis_strides(axis)
        return self._np_apply(lambda blk: np.cumprod(blk, axis=ai + 1))

    # ---- contractions -------------------------------------------------
    def matmul(self, mat, out_perm=None, out_shape=None) -> "NDArray":
        """(n, …, a, b) @ literal (b, c) → (n, …, a, c). The matrix is
        a plan literal (broadcast), each output cell is one fused
        multiply-accumulate run — dask's (tall, small) blockwise
        matmul without a graph.

        ``out_perm`` (driver int array) emits output cells DIRECTLY in
        a permuted order: cell slot t computes matmul-output index
        out_perm[t]. This is how einsum applies its final transpose —
        a structural gather stacked ON TOP of the computed matmul
        block would let CollapseProject re-inline the whole matmul
        array into every element read (measured 10.7s → 0.5s on the
        arr_einsum bench query at sf0.1)."""
        np = _require_np()
        M = np.asarray(mat, dtype="float64")
        if M.ndim != 2 or len(self.inner_shape) < 1:
            raise ValueError("matmul: literal operand must be 2-D")
        *lead, a_or_b = [*self.inner_shape]
        if len(self.inner_shape) == 1:
            a, b = 1, self.inner_shape[0]
        else:
            a, b = self.inner_shape[-2], self.inner_shape[-1]
            lead = list(self.inner_shape[:-2])
        if b != M.shape[0]:
            raise ValueError(f"matmul shape mismatch {self.inner_shape} @ {M.shape}")
        c = M.shape[1]
        nlead = math.prod(lead) if lead else 1
        out_size = nlead * a * c
        if out_perm is not None:
            out_perm = np.asarray(out_perm, dtype="int64").ravel()
        shape = out_shape if out_shape is not None else (
            (*lead, a, c) if len(self.inner_shape) > 1 else (c,)
        )
        if max(self.inner_size, out_size) > EXPR_FUSION_LIMIT:
            if out_perm is None:
                return self._np_apply(lambda blk: blk @ M,
                                      out_inner=tuple(shape))
            return self._np_apply(
                lambda blk: (blk @ M).reshape(len(blk), -1)[:, out_perm],
                out_inner=tuple(shape),
            )
        mlit = F.lit(M.ravel().copy())
        src = self._src()  # fused: reads through the pending perm

        def cell(o):
            li = (o / F.lit(a * c)).cast("long")
            i = ((o % F.lit(a * c)) / F.lit(c)).cast("long")
            j = o % F.lit(c)
            base = li * F.lit(a * b) + i * F.lit(b)
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(b - 1)),
                F.lit(0.0),
                lambda acc, kk: acc
                + src(base + kk)
                * F.element_at(mlit, (kk * F.lit(c) + j + 1).cast("int")),
            )

        idx = (F.sequence(F.lit(0), F.lit(out_size - 1))
               if out_perm is None else F.lit(out_perm.copy()))
        return self._with_block(F.transform(idx, cell), shape)

    def tensordot(self, other, axes: int = 1, out_perm=None,
                  out_shape=None) -> "NDArray":
        """Contract the LAST ``axes`` inner dims against a literal
        tensor's first ``axes`` dims (reference: routines.py tensordot)
        — planned as move-contracted-axes-last (already last) +
        flatten + matmul, all one projection. ``out_perm``/``out_shape``
        pass through to matmul so a consumer's output transpose emits
        in place (see matmul's CollapseProject note)."""
        np = _require_np()
        T = np.asarray(other, dtype="float64")
        ck = self.inner_shape[len(self.inner_shape) - axes:]
        if tuple(T.shape[:axes]) != ck:
            raise ValueError(f"tensordot mismatch {ck} vs {T.shape[:axes]}")
        keep = self.inner_shape[: len(self.inner_shape) - axes]
        k = math.prod(ck)
        flat = self.reshape(*(keep or (1,)), k)
        out = out_shape if out_shape is not None else (
            (*keep, *T.shape[axes:]) or (1,)
        )
        res = flat.matmul(
            T.reshape(k, math.prod(T.shape[axes:]) or 1),
            out_perm=out_perm, out_shape=tuple(out),
        )
        return res

    # ---- partitioning (reference: dask/array/rechunk.py) --------------
    def rechunk(self, npartitions: int) -> "NDArray":
        """Axis-0 rechunk = range repartition on the id (order-
        preserving blocks, like dask rechunk keeping a sorted index);
        inner axes are single-chunk by layout — rechunking them is a
        no-op, exactly as dask treats an axis whose chunk already
        spans it."""
        if self._id is None:
            sdf = self._sdf.repartition(npartitions)
        else:
            sdf = self._sdf.repartitionByRange(npartitions, F.col(self._id))
        return NDArray(sdf, self.inner_shape, self._col, self._id,
                       perm=self._perm)

    # ---- python boundary ---------------------------------------------
    def map_blocks(self, fn: Callable) -> "NDArray":
        """fn(numpy (rows, *inner_shape)) -> same-leading-extent array;
        whole-partition Arrow batches (reference: array/core.py
        map_blocks). The one legitimate Python escape hatch — a pending
        structural perm is folded into the same kernel (one numpy take,
        never a separate plan stage)."""
        return self._np_apply(fn)

    def map_overlap(self, fn: Callable, depth: int,
                    npartitions: int = 32, boundary=None) -> "NDArray":
        """Axis-0 stencil (reference: dask/array/overlap.py
        map_overlap): ship ``depth`` neighboring rows into each range
        bucket, apply ``fn`` over the (core+halo, *inner) tensor,
        trim — delegates to the frame-level halo machinery (one range
        shuffle of ~(1+ε)×N rows at any scale). ``depth`` is in id
        units, so it matches row counts when ids are dense. ``fn``
        must be row-aligned (same leading extent in as out), numpy
        (rows, *inner) -> (rows, *out_inner).

        ``boundary`` (reference dask/array/overlap.py:180,204,234 +
        coerce_boundary:807, default "none"):
        - None / "none": true edges — the first/last bucket sees a
          smaller halo (dask's default);
        - "periodic": the array wraps (last rows pad the front);
        - "reflect": edge rows mirror outward, edge included;
        - "nearest": the edge row repeats ``depth`` times;
        - a number: constant-value pad rows.
        Spark shape: the pad is 2·depth SYNTHESIZED rows built by
        remapping the edge rows' ids outside [0, n) and unioned in
        before the range shuffle — a filter-pushdown scan of the edge
        slivers, never a driver collect of data rows; fn's outputs for
        pad rows are trimmed by an id-range filter afterward, so the
        result stays row-aligned with the original array."""
        if self._id is None:
            raise ValueError("map_overlap needs id_col (row order)")
        np = _require_np()
        m = self._materialize()
        inner, col, id_ = m.inner_shape, m._col, m._id
        id_dt = dict(m._sdf.dtypes)[id_]

        probe = np.zeros((1, *inner))
        out_inner = tuple(
            int(s) for s in np.asarray(fn(probe)).shape[1:]
        ) or (1,)

        def run(pdf):
            blk = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[col]]
            ).reshape(len(pdf), *inner)
            res = np.asarray(fn(blk), dtype="float64").reshape(len(pdf), -1)
            out = pdf.copy()
            out[col] = list(res)
            return out

        base = m._sdf.select(id_, col)
        n_keep = None
        if boundary is not None and boundary != "none":
            d = int(depth)
            n = base.count()  # ids are dense 0..n-1 (one tiny job)
            if d > n:
                raise ValueError("depth exceeds array length")
            idc = F.col(id_)
            if boundary == "periodic":
                pre = base.filter(idc >= n - d).withColumn(
                    id_, (idc - F.lit(n)).cast(id_dt))
                post = base.filter(idc < d).withColumn(
                    id_, (idc + F.lit(n)).cast(id_dt))
            elif boundary == "reflect":
                pre = base.filter(idc < d).withColumn(
                    id_, (F.lit(-1) - idc).cast(id_dt))
                post = base.filter(idc >= n - d).withColumn(
                    id_, (F.lit(2 * n - 1) - idc).cast(id_dt))
            elif boundary == "nearest":
                ks = F.explode(
                    F.sequence(F.lit(1), F.lit(d))
                ).alias("__k")
                pre = base.filter(idc == 0).select(ks, id_, col).select(
                    (idc - F.col("__k")).cast(id_dt).alias(id_), col)
                post = base.filter(idc == n - 1).select(
                    ks, id_, col
                ).select(
                    (idc + F.col("__k")).cast(id_dt).alias(id_), col)
            elif isinstance(boundary, (int, float)):
                spark = base.sparkSession
                width = int(np.prod(inner)) if inner else 1
                cvec = F.array_repeat(
                    F.lit(float(boundary)), width
                ).cast(dict(base.dtypes)[col])
                pre = spark.range(-d, 0).select(
                    F.col("id").cast(id_dt).alias(id_), cvec.alias(col))
                post = spark.range(n, n + d).select(
                    F.col("id").cast(id_dt).alias(id_), cvec.alias(col))
            else:
                raise ValueError(
                    f"unknown boundary {boundary!r}: use 'none', "
                    "'periodic', 'reflect', 'nearest', or a constant"
                )
            base = base.unionByName(pre).unionByName(post)
            n_keep = n

        from dask_spark.operators.window import map_overlap as frame_mo

        out = frame_mo(
            DaskFrame(base),
            run,
            schema=f"{id_} {id_dt}, {col} array<double>",
            on=id_,
            before=depth,
            after=depth,
            npartitions=npartitions,
        )
        osdf = out._sdf
        if n_keep is not None:
            osdf = osdf.filter(
                (F.col(id_) >= 0) & (F.col(id_) < n_keep)
            )
        return NDArray(osdf, out_inner, col, id_)

    def explode(self, pos_col: str = "pos", val_col: str = "val") -> DaskFrame:
        """(id?, pos, value) long form — the hash-checkable shape for
        oracle comparison and the bridge into DataFrame land."""
        self = self._materialize()
        return DaskFrame(
            self._sdf.select(
                *self._keep(),
                F.posexplode(F.col(self._col)).alias(pos_col, val_col),
            )
        )

    def compute(self):
        """Materialize to one numpy array (id-ordered when available) —
        driver-sized data only, like dask .compute(). A pending perm is
        applied in numpy on the collected rows (cheaper than shipping
        the gather into the plan for a driver-bound result)."""
        np = _require_np()
        sdf = self._sdf
        if self._id:
            sdf = sdf.orderBy(self._id)
        rows = [r[self._col] for r in sdf.select(self._col).collect()]
        if not rows:  # empty result: collect gives a 1-D empty array
            return np.empty((0, *self.inner_shape), dtype="float64")
        arr = np.asarray(rows, dtype="float64")
        if self._perm is not None:
            arr = arr[:, self._perm]
        return arr.reshape(-1, *self.inner_shape)

    # ---- dask.array.Array method/property tail (reference
    # dask/array/core.py Array) — delegates onto the machinery above
    # and the module-level routines ------------------------------------
    @property
    def T(self) -> "NDArray":
        """Inner-axes reverse transpose (the distributed row axis
        stays put, like every structural op here)."""
        return self.transpose()

    @property
    def A(self) -> "NDArray":
        return self

    @property
    def itemsize(self) -> int:
        return 8  # float64 blocks throughout

    @property
    def name(self) -> str:
        from dask_spark.utils import tokenize

        return f"ndarray-{tokenize(DaskFrame(self._sdf))[:12]}"

    @property
    def npartitions(self) -> int:
        from dask_spark.operators.sort import num_partitions

        return num_partitions(self._sdf)

    @property
    def numblocks(self):
        return (self.npartitions, *([1] * len(self.inner_shape)))

    @property
    def chunks(self):
        """dask chunks tuple; row-chunk extents are unknown (nan,
        like dask) until compute_chunk_sizes() resolves them."""
        rows = getattr(self, "_chunk_rows", None)
        if rows is None:
            rows = (float("nan"),) * self.npartitions
        return (tuple(rows), *((s,) for s in self.inner_shape))

    @property
    def chunksize(self):
        return (float("nan"), *self.inner_shape)

    def compute_chunk_sizes(self) -> "NDArray":
        """reference core.py compute_chunk_sizes — resolves the
        unknown row extents: one per-partition count job whose result
        is CACHED so ``.chunks`` reports concrete numbers afterwards
        (dask's contract; discarding the count would leave NaN)."""
        rows = (
            self._sdf.groupBy(F.spark_partition_id().alias("__p"))
            .count().orderBy("__p").collect()
        )
        self._chunk_rows = tuple(int(r["count"]) for r in rows) or (0,)
        return self

    @property
    def partitions(self):
        """Indexable per-partition view (reference Array.partitions/
        .blocks): ``arr.partitions[i]`` is the i-th row chunk as an
        NDArray — one partition-id filter, map-only."""
        def pick(i):
            if isinstance(i, slice):
                ids = list(range(*i.indices(self.npartitions)))
            else:
                ids = [int(i)]
            sdf = self._sdf.withColumn(
                "__pid", F.spark_partition_id()
            ).filter(F.col("__pid").isin(ids)).drop("__pid")
            return NDArray(sdf, self.inner_shape, self._col, self._id,
                           perm=self._perm)

        from dask_spark.utils import IndexCallable

        return IndexCallable(pick)

    blocks = partitions

    @property
    def vindex(self):
        """POINTWISE fancy indexing (reference Array.vindex — dask's
        vindex zips integer arrays coordinate-wise, unlike
        __getitem__'s orthogonal outer product). Supported form: a
        full slice on the rows axis + equal-length integer lists on
        every inner axis — one driver-planned gather of the zipped
        coordinates. Other forms raise rather than silently fall back
        to outer-product semantics."""
        np = _require_np()

        def pick(key):
            if not isinstance(key, tuple):
                key = (key,)
            if len(key) != self.ndim or not (
                isinstance(key[0], slice) and key[0] == slice(None)
            ):
                raise NotImplementedError(
                    "vindex needs [:, idx_list, ...] — a full rows "
                    "slice plus integer lists for every inner axis"
                )
            coords = [np.asarray(k, dtype="int64") for k in key[1:]]
            if any(c.ndim != 1 for c in coords) or len(
                {len(c) for c in coords}
            ) != 1:
                raise NotImplementedError(
                    "vindex inner selectors must be equal-length 1-D "
                    "integer lists"
                )
            flat = np.ravel_multi_index(coords, self.inner_shape)
            return self._gather(flat, (len(flat),))

        from dask_spark.utils import IndexCallable

        return IndexCallable(pick)

    def copy(self) -> "NDArray":
        return NDArray(self._sdf, self.inner_shape, self._col, self._id,
                       perm=self._perm)

    def view(self, dtype=None) -> "NDArray":
        """Blocks are always float64; dtype reinterpretation has no
        Spark analog, so view is identity (dask's no-op case)."""
        if dtype not in (None, "float64", float):
            raise ValueError("view: float64 blocks only")
        return self.copy()

    def conj(self) -> "NDArray":
        # numpy/dask: conj is a METHOD, real/imag are PROPERTIES
        return self._unary(lambda x: x + F.lit(0.0))

    @property
    def real(self) -> "NDArray":
        return self.copy()

    @property
    def imag(self) -> "NDArray":
        return self._unary(
            lambda x: F.when(x.isNull(), x).otherwise(F.lit(0.0))
        )

    def atleast_nd(self, n: int) -> "NDArray":
        out = self
        while out.ndim < n:
            out = out.reshape(*out.inner_shape, 1)
        return out

    def argtopk(self, k: int):
        from dask_spark.routines import argtopk as _argtopk

        return _argtopk(self, k)

    def choose(self, choices):
        from dask_spark.routines import choose as _choose

        return _choose(self, choices)

    def nonzero(self):
        from dask_spark.routines import nonzero as _nonzero

        return _nonzero(self)

    def repeat(self, repeats: int, axis: int) -> "NDArray":
        from dask_spark.routines import repeat as _repeat

        return _repeat(self, repeats, axis)

    def trace(self, offset: int = 0):
        from dask_spark.routines import trace as _trace

        return _trace(self, offset)

    def shuffle(self, indexer, axis: int) -> "NDArray":
        from dask_spark.routines import shuffle as _shuffle

        return _shuffle(self, indexer, axis)

    def moment(self, order: int, axis: int = 0):
        from dask_spark.routines import moment as _moment

        return _moment(self.to_darray() if len(self.inner_shape) == 1
                       else self, order, axis)

    def store(self, target: str, mode: str = "overwrite"):
        from dask_spark.routines import store as _store

        return _store(self, target, mode)

    def to_zarr(self, url: str):
        from dask_spark.routines import to_zarr as _tz

        return _tz(self, url)

    def to_tiledb(self, uri: str):
        from dask_spark.routines import to_tiledb as _tt

        return _tt(self, uri)

    def to_hdf5(self, filename: str, datapath: str):
        from dask_spark.routines import to_hdf5 as _th

        return _th(filename, datapath, self)

    def to_delayed(self):
        """One Delayed per row chunk (reference Array.to_delayed) —
        each computes just its partition."""
        from dask_spark.delayed import delayed

        parts = self.partitions
        return [
            delayed(lambda i=i: parts[i].compute())()
            for i in range(self.npartitions)
        ]

    def to_backend(self, backend: str | None = None) -> "NDArray":
        if backend not in (None, "spark", "numpy"):
            raise ValueError(f"unknown backend {backend!r}")
        return self

    def format_index(self) -> str:
        return f"shape=({self._sdf.count()}, {', '.join(map(str, self.inner_shape))})"

    def to_svg(self, size: int = 200) -> str:
        """Chunk-grid sketch (reference array/svg.py): the row axis
        split into npartitions bands, inner axes one block."""
        n = max(self.npartitions, 1)
        h = size // n
        rects = "\n".join(
            f'<rect x="0" y="{i * h}" width="{size}" height="{h}" '
            f'style="fill:#ECB172;stroke:#8F4F06;"/>'
            for i in range(n)
        )
        return (
            f'<svg width="{size + 2}" height="{size + 2}" '
            f'xmlns="http://www.w3.org/2000/svg">\n{rects}\n</svg>'
        )


def concatenate(arrays: Sequence[NDArray], axis: int = 0) -> NDArray:
    """np.concatenate (reference: dask/array/core.py concatenate).
    axis 0 = unionByName of materialized blocks (row-id spaces are the
    caller's concern, as with dask's unknown divisions); inner axes =
    ONE id-equijoin per extra operand + a single numpy-planned gather
    over the concatenated flat blocks — no Python at runtime."""
    if not arrays:
        raise ValueError("concatenate needs at least one array")
    np = _require_np()
    ms = [a._materialize() for a in arrays]
    a0 = ms[0]
    if axis == 0:
        if any(m.inner_shape != a0.inner_shape for m in ms):
            raise ValueError("axis-0 concatenate needs identical inner shapes")
        sdf = ms[0]._sdf.select(*a0._keep(), a0._col)
        for m in ms[1:]:
            sdf = sdf.unionByName(m._sdf.select(*m._keep(), m._col))
        return NDArray(sdf, a0.inner_shape, a0._col, a0._id)
    ai = axis - 1
    for m in ms:
        if m._id is None:
            raise ValueError("inner-axis concatenate joins by id_col")
        if (
            m.inner_shape[:ai] != a0.inner_shape[:ai]
            or m.inner_shape[ai + 1:] != a0.inner_shape[ai + 1:]
        ):
            raise ValueError("non-concat axes must match")
    joined = ms[0]._sdf.select(a0._id, F.col(a0._col).alias("__b0"))
    for i, m in enumerate(ms[1:], 1):
        joined = joined.join(
            m._sdf.select(
                F.col(m._id).alias(a0._id), F.col(m._col).alias(f"__b{i}")
            ),
            a0._id,
        )
    combined = F.concat(*[F.col(f"__b{i}") for i in range(len(ms))])
    sdf = joined.select(a0._id, combined.alias(a0._col))
    # numpy plans the interleave over the concatenated flat layout
    offs, tensors = 0, []
    for m in ms:
        tensors.append(
            np.arange(m.inner_size, dtype="int64").reshape(m.inner_shape) + offs
        )
        offs += m.inner_size
    cat = np.concatenate(tensors, axis=ai)
    return NDArray(
        sdf, cat.shape, a0._col, a0._id, perm=cat.ravel()
    )


def coarsen(reduction: str, x: NDArray, axes: dict, trim_excess: bool = False
            ) -> NDArray:
    """Block-reduction downsampling (reference: dask/array/routines.py
    :2363 coarsen): shrink axis ``a`` by factor ``f`` applying
    ``reduction`` ("sum"/"mean"/"max"/"min") over each f-block.

    Inner axes: a row-major split reshape (pure metadata — axis s
    splits contiguously into (s/f, f)) + the stride-walk reduce, so
    any number of inner coarsens stay ONE map-only pass. Axis 0: rows
    group as id//f — posexplode + groupBy((id//f), position), one
    shuffle of inner_size scalars per row, result rebuilt in-agg."""
    np = _require_np()
    how = reduction
    if how not in ("sum", "mean", "max", "min"):
        raise ValueError(f"unsupported reduction {how!r}")
    # inner axes first, one at a time (each reduce removes its split
    # axis, so recompute positions as we go)
    inner_axes = sorted(a for a in axes if a != 0)
    for a in inner_axes:
        f = int(axes[a])
        s = list(x.inner_shape)
        ai = a - 1
        if s[ai] % f:
            if not trim_excess:
                raise ValueError(
                    f"axis {a} extent {s[ai]} not divisible by {f} "
                    "(pass trim_excess=True)"
                )
            keep = (s[ai] // f) * f
            x = x[(slice(None),) * (a) + (slice(0, keep),)]
            s = list(x.inner_shape)
        split = s[:ai] + [s[ai] // f, f] + s[ai + 1:]
        x = x.reshape(*split)._reduce(a + 1, how)
    if 0 in axes:
        f = int(axes[0])
        m = x._materialize()
        if m._id is None:
            raise ValueError("axis-0 coarsen needs id_col")
        gid = (F.col(m._id) / F.lit(f)).cast("long").alias("__g")
        ex = m._sdf.select(
            gid, F.posexplode(F.col(m._col)).alias("__p", "__v")
        )
        agg = {"sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min}[how]
        per = ex.groupBy("__g", "__p").agg(agg("__v").alias("__a"))
        rows = per.groupBy("__g").agg(
            _collect_block("__p", "__a").alias(m._col)
        ).withColumnRenamed("__g", m._id)
        x = NDArray(rows, x.inner_shape, m._col, m._id)
    return x


def stack(arrays: Sequence[NDArray], axis: int = 1) -> NDArray:
    """np.stack along a NEW inner axis (reference: dask/array/core.py
    stack) = expand_dims + concatenate. axis >= 1 (the distributed row
    axis cannot become an inner axis without a global re-block)."""
    if axis == 0:
        raise ValueError("cannot stack along the distributed row axis")
    return concatenate([a.expand_dims(axis) for a in arrays], axis=axis)


def vstack(arrays: Sequence[NDArray]) -> NDArray:
    """np.vstack = concatenate along the distributed row axis
    (reference: routines.py:131)."""
    return concatenate(arrays, axis=0)


def hstack(arrays: Sequence[NDArray]) -> NDArray:
    """np.hstack = concatenate along the first inner axis
    (reference: routines.py:142)."""
    return concatenate(arrays, axis=1)


def dstack(arrays: Sequence[NDArray]) -> NDArray:
    """np.dstack = concatenate along the second inner axis, expanding
    1-D-inner operands first (reference: routines.py dstack)."""
    arrays = [
        a.expand_dims(2) if len(a.inner_shape) == 1 else a for a in arrays
    ]
    return concatenate(arrays, axis=2)


# ---- routines over scalar columns (reference: dask/array/routines.py)


def digitize(frame: DaskFrame, col: str, bins: Sequence[float],
             right: bool = False, out: str = "bucket") -> DaskFrame:
    """np.digitize: index of the bin each value falls in — the bin
    edges are literals, the lookup is a monotone sum of comparisons
    (map-only, codegen; O(#bins) per row like numpy's searchsorted
    over a handful of edges)."""
    c = F.col(col)
    expr = F.lit(0)
    for b in bins:
        hit = (c <= F.lit(float(b))) if right else (c < F.lit(float(b)))
        expr = expr + F.when(~hit, 1).otherwise(0)
    return DaskFrame(frame._sdf.withColumn(out, expr.cast("int")))


def bincount(frame: DaskFrame, col: str, weights: str | None = None,
             minlength: int = 0) -> DaskFrame:
    """np.bincount over a non-negative int column → (bin, count|weight
    sum). One small-key shuffle with map-side partials; missing bins
    below minlength are filled via a range frame (divisions-scale)."""
    sdf = frame._sdf
    agg = (
        F.sum(F.col(weights)).alias("count")
        if weights
        else F.count(F.lit(1)).cast("double").alias("count")
    )
    counts = sdf.groupBy(F.col(col).cast("long").alias("bin")).agg(agg)
    if minlength:
        spark = sdf.sparkSession
        full = spark.range(minlength).select(F.col("id").alias("bin"))
        counts = (
            full.join(counts, "bin", "full_outer")
            .select("bin", F.coalesce("count", F.lit(0.0)).alias("count"))
        )
    return DaskFrame(counts)


def histogram2d(frame: DaskFrame, xcol: str, ycol: str, bins: int,
                range_: tuple[tuple[float, float], tuple[float, float]],
                weights: str | None = None,
                density: bool = False) -> DaskFrame:
    """np.histogram2d with explicit ranges: fixed-width bucket ids are
    pure arithmetic (map-only), then ONE groupBy over at most bins²
    keys — numpy's last-bin-closed edge convention preserved.
    ``weights``/``density`` follow numpy (density divides by
    total·cell-area; the total comes from an unpartitioned window over
    the ≤ bins² post-agg rows)."""
    (x0, x1), (y0, y1) = range_

    def bucket(c, lo, hi):
        raw = F.floor((F.col(c) - F.lit(lo)) / F.lit((hi - lo) / bins))
        return (
            F.when(F.col(c) == F.lit(hi), F.lit(bins - 1))
            .otherwise(raw)
            .cast("int")
        )

    sdf = (
        frame._sdf
        .filter(
            (F.col(xcol) >= x0) & (F.col(xcol) <= x1)
            & (F.col(ycol) >= y0) & (F.col(ycol) <= y1)
        )
        .select(
            bucket(xcol, x0, x1).alias("bx"),
            bucket(ycol, y0, y1).alias("by"),
            *([F.col(weights).alias("__w")] if weights else []),
        )
        .groupBy("bx", "by")
        .agg(
            (F.sum(F.col("__w").cast("double")) if weights
             else F.count(F.lit(1))).alias("n")
        )
    )
    if density:
        # scalar-agg + broadcast, not an unpartitioned window (plan
        # audit invariant: no partitionless windows anywhere)
        area = ((x1 - x0) / bins) * ((y1 - y0) / bins)
        tot = sdf.agg(F.sum("n").alias("__total"))
        sdf = (
            sdf.crossJoin(F.broadcast(tot))
            .withColumn("n", F.col("n") / (F.col("__total") * F.lit(area)))
            .drop("__total")
        )
    return DaskFrame(sdf)


# ---- einsum (reference: dask/array/einsumfuncs.py:202) ----------------
def _dedup_labels(labels: str) -> str:
    out = []
    for c in labels:
        if c not in out:
            out.append(c)
    return "".join(out)


def _einsum_single(labels: str, out: str, x: NDArray) -> NDArray:
    """One-operand einsum over the inner axes: repeated labels become
    a diagonal GATHER (np.einsum applied to the flat INDEX tensor — a
    pure view op composed into the perm, zero plan growth), dropped
    labels become inner-axis sums, and the final label order is one
    transpose. The distributed row label (labels[0]) must lead the
    output — contracting it is an axis-0 reduction the caller should
    spell as .sum(axis=0)."""
    np = _require_np()
    r = labels[0]
    if labels.count(r) != 1 or r in labels[1:]:
        raise NotImplementedError(
            f"label '{r}' indexes the distributed row axis and cannot "
            "repeat (a row-axis diagonal would be a global shuffle)"
        )
    if not out or out[0] != r:
        raise NotImplementedError(
            f"output must keep the distributed row label '{r}' first "
            "(contracting rows in-subscript is an axis-0 reduction — "
            "compose .sum(axis=0) after the inner einsum)"
        )
    if r in out[1:]:
        raise ValueError(f"duplicate output label '{r}'")
    inner = labels[1:]
    if len(inner) != len(x.inner_shape):
        raise ValueError(
            f"subscripts '{labels}' rank {len(labels)} vs array rank "
            f"{1 + len(x.inner_shape)}"
        )
    for c in out[1:]:
        if c not in inner:
            raise ValueError(f"output label '{c}' not in input")
    distinct = _dedup_labels(inner)
    if inner != distinct:
        # diagonal/reorder gather via the index tensor
        idx = np.einsum(f"{inner}->{distinct}", x._index_tensor())
        x = x._gather(idx.ravel(), idx.shape)
    remaining = list(distinct)
    # sum dropped labels, highest axis first so positions stay valid
    for c in sorted(
        (c for c in distinct if c not in out),
        key=lambda c: -remaining.index(c),
    ):
        x = x.sum(axis=remaining.index(c) + 1)
        remaining.remove(c)
    if not remaining:
        return x  # scalar-per-row: inner shape (1,)
    target = [remaining.index(c) for c in out[1:]]
    if target != list(range(len(remaining))):
        x = x.transpose(target)
    return x


def einsum(subscripts: str, x: NDArray, y=None) -> NDArray:
    """np.einsum over an NDArray, optionally contracted with a LITERAL
    second operand (reference: dask/array/einsumfuncs.py:202 — dask
    lowers to per-block np.einsum over a blockwise graph; here the
    subscripts lower to the existing gather/sum/transpose/tensordot
    kernels, so the whole contraction is one Catalyst projection).

    Supported: any single-operand form that keeps the distributed row
    label first ('nij->nji', 'nii->ni', 'nij->n', …), and two-operand
    forms where the second operand is a driver literal ('nij,jk->nik',
    'ni,ij->nj', 'nij,ij->n', outer products). Shared non-contracted
    labels (batched elementwise) and a distributed second operand are
    not expressible as one tensordot — both raise."""
    np = _require_np()
    subscripts = subscripts.replace(" ", "")
    if "->" in subscripts:
        lhs, out = subscripts.split("->")
    else:
        lhs = subscripts
        once = [c for c in sorted(set(lhs.replace(",", "")))
                if lhs.replace(",", "").count(c) == 1]
        out = "".join(once)
    terms = lhs.split(",")
    if y is None:
        if len(terms) != 1:
            raise ValueError("one subscript term per operand")
        return _einsum_single(terms[0], out, x)
    if len(terms) != 2:
        raise ValueError("one subscript term per operand")
    if isinstance(y, NDArray):
        raise NotImplementedError(
            "einsum with two distributed operands: only a literal "
            "second operand is plannable as one projection (matmul/"
            "tensordot contract against plan literals); align the "
            "second operand to rows and use the binary ops instead"
        )
    lx, ly = terms
    r = lx[0]
    if r in ly:
        raise NotImplementedError(
            f"label '{r}' indexes the distributed row axis; a literal "
            "operand cannot align to it"
        )
    if not out or out[0] != r:
        raise NotImplementedError(
            f"output must keep the distributed row label '{r}' first"
        )
    y = np.asarray(y, dtype="float64")
    dx = _dedup_labels(lx[1:])
    dy = _dedup_labels(ly)
    shared_kept = [c for c in dy if c in dx and c in out]
    if shared_kept:
        raise NotImplementedError(
            f"batched shared labels {shared_kept} (elementwise over a "
            "kept axis) are not one tensordot; expand the literal "
            "into a diagonal matrix or use the elementwise ops"
        )
    contracted = "".join(c for c in dx if c in dy and c not in out)
    kept_x = "".join(c for c in dx if c in out)
    free_y = "".join(c for c in dy if c in out)
    # x pre-pass: diagonals, x-only sums, order (r, kept_x, contracted)
    x2 = _einsum_single(lx, r + kept_x + contracted, x)
    # y pre-pass in numpy: diagonals, y-only sums, contracted first
    y2 = np.einsum(f"{ly}->{contracted + free_y}", y)
    # the output-order transpose is folded INTO the contraction via
    # out_perm: a gather stacked on the computed contraction block
    # would let CollapseProject re-inline the whole matmul per element
    current = kept_x + free_y
    dims_cur = (*x2.inner_shape[:len(kept_x)],
                *y2.shape[len(contracted):])
    target = [current.index(c) for c in out[1:]]
    perm = None
    shape = dims_cur or (1,)
    if current and target != list(range(len(current))):
        t = np.arange(int(np.prod(dims_cur))).reshape(dims_cur)
        t = t.transpose(target)
        perm, shape = t.ravel(), t.shape
    if contracted:
        return x2.tensordot(y2, axes=len(contracted), out_perm=perm,
                            out_shape=shape)
    return _einsum_outer(x2, y2, out_perm=perm, out_shape=shape)


def _einsum_outer(x: NDArray, y, out_perm=None, out_shape=None) -> NDArray:
    """Outer product against a literal: flatten both, matmul with the
    literal as a (1, k) row, reshape back (out_perm/out_shape pass
    through like tensordot's)."""
    np = _require_np()
    y = np.asarray(y, dtype="float64")
    keep = x.inner_shape
    if out_shape is None:
        out_shape = (*keep, *y.shape) if y.ndim else keep
    flat = x.reshape(*keep, 1) if y.size else x
    return flat.matmul(y.reshape(1, y.size), out_perm=out_perm,
                       out_shape=tuple(out_shape))


# ---- apply_gufunc (reference: dask/array/gufunc.py:172) ---------------
def _parse_gufunc_signature(signature: str):
    import re

    sig = signature.replace(" ", "")
    if "->" not in sig:
        raise ValueError(f"signature needs '->': {signature!r}")
    ins, outs = sig.split("->")
    term = re.compile(r"\(([^)]*)\)")

    def terms(s):
        return [tuple(t.split(",")) if t else () for t in term.findall(s)]

    return terms(ins), terms(outs)


def apply_gufunc(func, signature: str, *args, output_sizes=None,
                 vectorize: bool = False):
    """Apply a generalized ufunc over NDArray/literal operands
    (reference: dask/array/gufunc.py:172 apply_gufunc — dask wraps
    per-chunk np.apply_gufunc over a blockwise graph; here the loop
    dimension IS the distributed rows axis, the core dimensions are
    the inner axes, and the whole application is ONE Arrow-batched
    mapInPandas pass).

    ``func`` receives numpy arrays shaped (batch, *core_dims) for each
    distributed operand and the bare core shape for literal operands —
    it must vectorize over the leading loop axis in ufunc style (pass
    ``vectorize=True`` to wrap it in np.vectorize with the same
    signature instead). Multiple outputs (tuple signature) come back
    as a tuple of NDArrays; scalar outputs '()' become scalar-per-row
    arrays of inner shape (1,). Output labels not bound by any input
    need ``output_sizes={label: size}`` (the reference's keyword)."""
    np = _require_np()
    in_specs, out_specs = _parse_gufunc_signature(signature)
    if len(in_specs) != len(args):
        raise ValueError(
            f"{len(in_specs)} signature terms vs {len(args)} operands"
        )
    dist = [(i, a) for i, a in enumerate(args) if isinstance(a, NDArray)]
    if not dist:
        raise ValueError("at least one operand must be an NDArray")
    # bind core-dim sizes
    dims: dict[str, int] = dict(output_sizes or {})
    for spec, a in zip(in_specs, args):
        shape = (a.inner_shape if isinstance(a, NDArray)
                 else np.asarray(a).shape)
        if len(shape) != len(spec) and not (
            spec == () and shape in ((), (1,))
        ):
            raise ValueError(
                f"operand rank {len(shape)} vs core spec {spec}"
            )
        for label, size in zip(spec, shape):
            if label.isdigit():
                if int(label) != size:
                    raise ValueError(f"fixed dim {label} vs size {size}")
                continue
            if dims.setdefault(label, size) != size:
                raise ValueError(
                    f"dim '{label}': {dims[label]} vs {size}"
                )
    out_shapes = []
    for spec in out_specs:
        shp = []
        for label in spec:
            if label.isdigit():
                shp.append(int(label))
            elif label in dims:
                shp.append(dims[label])
            else:
                raise ValueError(
                    f"output dim '{label}' unbound — pass output_sizes"
                )
        out_shapes.append(tuple(shp) or (1,))
    # align the distributed operands on the first one's id column
    first = dist[0][1]._materialize()
    id_col = first._id
    if len(dist) > 1 and any(d._id is None for _, d in dist):
        raise ValueError("multiple distributed operands need id_col "
                         "alignment")
    sdf = first._sdf.select(
        *( [F.col(id_col).alias("__id")] if id_col else
           [F.monotonically_increasing_id().alias("__id")] ),
        F.col(first._col).alias("__a0"),
    )
    shapes = {0: dist[0][1].inner_shape}
    for pos, (i, a) in enumerate(dist[1:], start=1):
        m = a._materialize()
        sdf = sdf.join(
            m._sdf.select(F.col(m._id).alias("__id"),
                          F.col(m._col).alias(f"__a{pos}")),
            on="__id",
        )
        shapes[pos] = a.inner_shape
    dist_pos = {i: pos for pos, (i, _) in enumerate(dist)}
    lits = {i: np.asarray(a, dtype="float64")
            for i, a in enumerate(args) if not isinstance(a, NDArray)}
    f = (np.vectorize(func, signature=signature.replace(" ", ""))
         if vectorize else func)
    n_args = len(args)  # the closure must not capture args itself —
    # NDArray operands hold the SparkSession and cannot pickle
    n_out = len(out_specs)
    out_cols = [f"__o{i}" for i in range(n_out)]
    schema = ", ".join(["__id " + dict(sdf.dtypes)["__id"],
                        *(f"{c} array<double>" for c in out_cols)])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ops = []
            B = len(pdf)
            for i in range(n_args):
                if i in dist_pos:
                    pos = dist_pos[i]
                    X = np.array(pdf[f"__a{pos}"].tolist(),
                                 dtype="float64")
                    ops.append(X.reshape(B, *shapes[pos]))
                else:
                    ops.append(lits[i])
            res = f(*ops)
            if n_out == 1:
                res = (res,)
            data = {"__id": pdf["__id"]}
            for c, r, shp in zip(out_cols, res, out_shapes):
                r = np.asarray(r, dtype="float64").reshape(B, -1)
                data[c] = list(r)
            yield pd.DataFrame(data)

    out_sdf = sdf.mapInPandas(run, schema)
    outs = tuple(
        NDArray(out_sdf.select(F.col("__id"),
                               F.col(c).alias("block")),
                shp, "block", "__id")
        for c, shp in zip(out_cols, out_shapes)
    )
    return outs[0] if n_out == 1 else outs


# numpy interop (reference dask/array/core.py Array.__array_ufunc__)
from dask_spark.ufunc import array_ufunc_dispatch as _array_ufunc  # noqa: E402

NDArray.__array_ufunc__ = _array_ufunc


def _array_function(self, func, types, args, kwargs):
    from dask_spark.routines import array_function_dispatch

    return array_function_dispatch(self, func, types, args, kwargs)


NDArray.__array_function__ = _array_function
