"""Masked arrays (reference: dask/array/ma.py, 228 lines — thin
wrappers over numpy.ma applied per chunk).

Spark-first representation: the mask IS a NULL element inside the
block array — Spark's null semantics give masked-value propagation
for free (x + 1 stays null, comparisons stay null), the column type
never changes, and no second mask column rides every shuffle. The
trade-off vs numpy.ma: the masked-out DATA value is not retained
(``getdata`` is ``filled``), which dask users rarely rely on — dask
itself warns that masked support is partial.

Reductions over masked arrays must SKIP nulls rather than poison the
aggregate, so this module carries its own null-skipping fold lowering
(filter → aggregate, still one JVM expression per row; axis-0 via the
posexplode + groupBy(position) family with Spark aggregates that skip
nulls natively)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column

from dask_spark.ndarray import NDArray, _collect_block


def _elem(x: NDArray, fn) -> NDArray:
    m = x._materialize()
    return NDArray(
        m._sdf.select(
            *m._keep(), F.transform(F.col(m._col), fn).alias(m._col)
        ),
        m.inner_shape, m._col, m._id,
    )


# ---- mask constructors (reference: ma.py:51-104) ----------------------
def masked_where(cond, a: NDArray) -> NDArray:
    """Mask elements where ``cond(element) is true`` — ``cond`` is a
    Column-builder lambda (the expression equivalent of the
    reference's boolean condition array)."""
    return _elem(a, lambda e: F.when(cond(e), F.lit(None)).otherwise(e))


def masked_equal(a: NDArray, value: float) -> NDArray:
    return masked_where(lambda e: e == F.lit(float(value)), a)


def masked_greater(a: NDArray, value: float) -> NDArray:
    return masked_where(lambda e: e > F.lit(float(value)), a)


def masked_less(a: NDArray, value: float) -> NDArray:
    return masked_where(lambda e: e < F.lit(float(value)), a)


def masked_inside(a: NDArray, v1: float, v2: float) -> NDArray:
    lo, hi = sorted((float(v1), float(v2)))
    return masked_where(lambda e: (e >= F.lit(lo)) & (e <= F.lit(hi)), a)


def masked_outside(a: NDArray, v1: float, v2: float) -> NDArray:
    lo, hi = sorted((float(v1), float(v2)))
    return masked_where(lambda e: (e < F.lit(lo)) | (e > F.lit(hi)), a)


def masked_invalid(a: NDArray) -> NDArray:
    return masked_where(lambda e: e.isNaN() | (e == F.lit(float("inf")))
                        | (e == F.lit(float("-inf"))), a)


def masked_values(a: NDArray, value: float, rtol: float = 1e-5,
                  atol: float = 1e-8) -> NDArray:
    v = float(value)
    tol = atol + rtol * abs(v)
    return masked_where(lambda e: F.abs(e - F.lit(v)) <= F.lit(tol), a)


# ---- mask accessors (reference: ma.py:25,110,116,104) -----------------
def filled(a: NDArray, fill_value: float = 0.0) -> NDArray:
    return _elem(a, lambda e: F.coalesce(e, F.lit(float(fill_value))))


def getdata(a: NDArray) -> NDArray:
    """The null-mask representation does not retain masked-out data —
    getdata degrades to filled(0.0), matching numpy's fill-with-
    default reading for this storage. Documented divergence."""
    return filled(a, 0.0)


def getmaskarray(a: NDArray) -> NDArray:
    """1.0 where masked, 0.0 where valid."""
    return _elem(a, lambda e: F.when(e.isNull(), 1.0).otherwise(0.0))


def fix_invalid(a: NDArray, fill_value: float = 0.0) -> NDArray:
    return filled(masked_invalid(a), fill_value)


# ---- null-skipping reductions (reference: ma.py:176-196) --------------
def _flat_fold(a: NDArray, agg) -> NDArray:
    """Per-row fold over the VALID elements of the flattened inner
    block (axis=None per-row semantics): filter nulls, then one JVM
    aggregate — scalar-per-row output, inner shape (1,)."""
    m = a._materialize()
    valid = F.filter(F.col(m._col), lambda e: e.isNotNull())
    return NDArray(
        m._sdf.select(*m._keep(), F.array(agg(valid)).alias(m._col)),
        (1,), m._col, m._id,
    )


def count(a: NDArray) -> NDArray:
    """Unmasked elements per row (reference: ma.py:185 count)."""
    return _flat_fold(a, lambda v: F.size(v).cast("double"))


def sum(a: NDArray) -> NDArray:  # noqa: A001 - numpy.ma surface name
    # a fully-masked row sums to NULL (numpy.ma returns `masked`, not 0)
    return _flat_fold(
        a,
        lambda v: F.when(
            F.size(v) > 0,
            F.aggregate(v, F.lit(0.0), lambda acc, e: acc + e),
        ),
    )


def mean(a: NDArray) -> NDArray:
    return _flat_fold(
        a,
        lambda v: F.when(F.size(v) > 0,
                         F.aggregate(v, F.lit(0.0),
                                     lambda acc, e: acc + e) / F.size(v)),
    )


def max(a: NDArray) -> NDArray:  # noqa: A001
    return _flat_fold(a, lambda v: F.array_max(v))


def min(a: NDArray) -> NDArray:  # noqa: A001
    return _flat_fold(a, lambda v: F.array_min(v))


def average(a: NDArray, weights=None) -> NDArray:
    """Weighted per-row average over valid elements (reference:
    ma.py:176 average): weights a literal list aligned to the
    flattened inner block; masked elements drop BOTH their value and
    their weight, like numpy.ma.average."""
    if weights is None:
        return mean(a)
    m = a._materialize()
    w = list(weights)
    if len(w) != m.inner_size:
        raise ValueError(
            f"weights length {len(w)} vs inner size {m.inner_size}"
        )
    wlit = F.array(*[F.lit(float(x)) for x in w])
    pairs = F.filter(
        F.zip_with(F.col(m._col), wlit,
                   lambda e, wt: F.struct(e.alias("e"), wt.alias("w"))),
        lambda p: p["e"].isNotNull(),
    )
    num = F.aggregate(pairs, F.lit(0.0),
                      lambda acc, p: acc + p["e"] * p["w"])
    den = F.aggregate(pairs, F.lit(0.0), lambda acc, p: acc + p["w"])
    return NDArray(
        m._sdf.select(
            *m._keep(),
            F.array(F.when(den != 0, num / den)).alias(m._col),
        ),
        (1,), m._col, m._id,
    )


def sum_axis0(a: NDArray) -> NDArray:
    """Column-wise null-skipping sum across rows: posexplode +
    groupBy(position) with F.sum, which skips nulls natively — the
    ma twin of NDArray._reduce_rows."""
    m = a._materialize()
    ex = m._sdf.select(F.posexplode(F.col(m._col)).alias("__p", "__v"))
    per = ex.groupBy("__p").agg(F.sum("__v").alias("__a"))
    one = per.agg(_collect_block("__p", "__a").alias(m._col))
    return NDArray(one, m.inner_shape, m._col, None)


def count_axis0(a: NDArray) -> NDArray:
    m = a._materialize()
    ex = m._sdf.select(F.posexplode(F.col(m._col)).alias("__p", "__v"))
    per = ex.groupBy("__p").agg(
        F.count("__v").cast("double").alias("__a")  # count skips nulls
    )
    one = per.agg(_collect_block("__p", "__a").alias(m._col))
    return NDArray(one, m.inner_shape, m._col, None)
