"""Sixth slice of the ported reference suite (r14): dask.array
creation + numpy.ma.

Ports the semantic halves of dask/array/tests/test_creation.py and
test_masked.py — same rules as slices 1-5: fresh numpy/numpy.ma
expectation code on the same values, reference test cited per case,
deviations pinned. Chunk-tuple halves do not port (rows are the only
distributed axis); the checkable contract is value parity.

Pinned deviations: creation output is float64 (one vector dtype per
column — dask's dtype= kwarg maps to a cast the engine leaves to
astype); the mask in the engine's ma is a NULL element, so a masked
cell materializes as None/NaN rather than a parallel mask array.
"""

from __future__ import annotations

import numpy as np
import numpy.ma as npma
import pandas as pd
import pytest

import dask_spark.array as da
import dask_spark.routines as dr
from dask_spark import ma
from dask_spark.ndarray import NDArray
from dask_spark.routines import _nd_from_numpy


def vals(arr):
    """DArray/NDArray -> numpy, id-ordered."""
    if isinstance(arr, NDArray):
        return arr.compute()
    import pyspark.sql.functions as F

    sdf = arr._sdf
    if arr._id:
        sdf = sdf.orderBy(arr._id)
    return np.array([list(r[arr._col]) for r in sdf.collect()])


class TestCreationPorted:
    @pytest.mark.parametrize("args", [
        (10,),            # test_creation.py:191 test_arange
        (3, 21),
        (3, 21, 2),
        (0, 0),
        (5, 100, 7),
    ])
    def test_arange(self, spark, args):
        got = vals(da.arange(*args)).ravel()
        assert np.array_equal(got, np.arange(*args).astype("float64"))

    @pytest.mark.parametrize("endpoint", [True, False])
    def test_linspace(self, spark, endpoint):
        """test_creation.py:133 test_linspace both endpoint modes."""
        got = vals(da.linspace(6.0, 49.0, 13, endpoint=endpoint)).ravel()
        exp = np.linspace(6, 49, 13, endpoint=endpoint)
        assert np.allclose(got, exp, atol=1e-12)

    def test_eye(self, spark):
        """test_creation.py:476 test_eye — square, wide, offset."""
        for N, M, k in [(5, None, 0), (4, 6, 1), (6, 4, -2), (3, 3, 5)]:
            got = vals(da.eye(N, M, k))
            assert np.array_equal(got, np.eye(N, M, k))

    def test_tri(self, spark):
        """test_creation.py:472 test_tri over N/M/k combos."""
        for N, M, k in [(4, None, 0), (3, 5, 1), (5, 3, -1)]:
            got = vals(dr.tri(N, M, k))
            assert np.array_equal(got, np.tri(N, M if M else N, k))

    def test_full_ones_zeros(self, spark):
        """test_creation.py:46 test_arr_like family (value halves)."""
        assert np.array_equal(vals(da.full((4, 3), 7.5)),
                              np.full((4, 3), 7.5))
        assert np.array_equal(vals(da.ones((3, 2))), np.ones((3, 2)))
        assert np.array_equal(vals(da.zeros((2, 5))), np.zeros((2, 5)))

    def test_like_functions(self, spark):
        """test_creation.py:46 test_arr_like (ones_like/zeros_like/
        full_like keep the source shape)."""
        src = da.full((3, 4), 2.0)
        assert np.array_equal(vals(da.ones_like(src)), np.ones((3, 4)))
        assert np.array_equal(vals(da.zeros_like(src)), np.zeros((3, 4)))
        assert np.array_equal(vals(da.full_like(src, -3.0)),
                              np.full((3, 4), -3.0))

    @pytest.mark.parametrize("indexing", ["xy", "ij"])
    def test_meshgrid(self, spark, indexing):
        """test_creation.py:416 test_meshgrid both indexing modes."""
        x = [1.0, 2.0, 3.0]
        y = [10.0, 20.0]
        gots = dr.meshgrid(x, y, indexing=indexing)
        exps = np.meshgrid(x, y, indexing=indexing)
        for g, e in zip(gots, exps):
            assert np.array_equal(vals(g), e)

    def test_fromfunction(self, spark):
        """test_creation.py:707 test_fromfunction."""
        got = vals(dr.fromfunction(lambda i, j: i + j, (4, 5)))
        assert np.array_equal(got, np.fromfunction(lambda i, j: i + j,
                                                   (4, 5)))

    def test_indices(self, spark):
        """test_creation.py:385 test_indices."""
        got = vals(dr.indices((3, 4)))
        assert np.array_equal(got, np.indices((3, 4)).astype("float64"))

    @pytest.mark.parametrize("k", [0, 1, -1])
    def test_diag_extraction(self, spark, k):
        """test_creation.py:545 test_diag_extraction — per-row
        diagonals of 2-D inner blocks."""
        blocks = np.arange(32, dtype="float64").reshape(2, 4, 4)
        nd = _nd_from_numpy(blocks, 2)
        got = vals(dr.diag(nd, k))
        exp = np.stack([np.diagonal(b, offset=k) for b in blocks])
        assert np.array_equal(got, exp)

    def test_repeat(self, spark):
        """test_creation.py:718 test_repeat — inner axis and the
        distributed row axis."""
        x = np.arange(12, dtype="float64").reshape(3, 4)
        nd = _nd_from_numpy(x, 2)
        got = vals(dr.repeat(nd, 2, axis=1))
        assert np.array_equal(got, np.repeat(x, 2, axis=1))
        got0 = np.sort(vals(dr.repeat(nd, 3, axis=0)), axis=0)
        assert np.array_equal(got0, np.sort(np.repeat(x, 3, axis=0), axis=0))

    @pytest.mark.parametrize("reps", [2, (2, 3)])
    def test_tile(self, spark, reps):
        """test_creation.py:754 test_tile_basic (inner axes)."""
        x = np.arange(6, dtype="float64").reshape(1, 2, 3)
        nd = _nd_from_numpy(x, 1)
        got = vals(nd if reps is None else dr.tile(nd, reps))
        exp = np.stack([np.tile(x[0], reps)])
        assert np.array_equal(got, exp)

    def test_pad_constant(self, spark):
        """test_creation.py:867 test_pad (constant mode, inner
        axes; the row axis is refused — pinned, dask rechunks)."""
        x = np.arange(8, dtype="float64").reshape(2, 4)
        nd = _nd_from_numpy(x, 2)
        got = vals(nd.pad((1, 2), value=9.0))
        exp = np.pad(x, ((0, 0), (1, 2)), constant_values=9.0)
        assert np.array_equal(got, exp)
        with pytest.raises(ValueError):
            nd.pad({0: (1, 1)})

    def test_diag_build_from_vector(self, spark):
        """test_creation.py:520 test_diag_2d_array_creation (the
        build direction): eye(N) scaled per position mirrors
        np.diag(v) — composed via fromfunction."""
        v = [3.0, 1.0, 4.0]
        got = vals(dr.fromfunction(
            lambda i, j: np.where(i == j, np.take(np.asarray(v), i.astype(int) % 3), 0.0),
            (3, 3)))
        assert np.array_equal(got, np.diag(v))


class TestMaskedPorted:
    DATA = np.array([
        [1.0, -2.0, 3.0, 100.0],
        [4.0, 5.0, -6.0, 7.0],
        [np.nan, 8.0, 9.0, -10.0],
    ])

    @pytest.fixture(scope="class")
    def nd(self, spark):
        pdf = pd.DataFrame(
            [(i, [float(x) for x in row]) for i, row in
             enumerate(self.DATA)],
            columns=["id", "block"],
        )
        return NDArray(spark.createDataFrame(pdf), (4,), "block", "id")

    def _row_reduce(self, a, name="v"):
        import pyspark.sql.functions as F

        out = a._sdf.select(
            "id", F.element_at("block", 1).alias(name)
        ).orderBy("id").toPandas()
        return out[name].to_numpy(dtype=float)

    @pytest.mark.parametrize("mfunc,npfunc", [
        ("masked_less", npma.masked_less),       # test_masked.py:86 test_basic
        ("masked_greater", npma.masked_greater),
        ("masked_equal", npma.masked_equal),
    ])
    def test_mask_builders(self, nd, mfunc, npfunc):
        thr = 5.0
        got = np.asarray(ma.filled(getattr(ma, mfunc)(
            ma.masked_invalid(nd), thr), -999.0).compute())
        exp = npfunc(npma.masked_invalid(self.DATA), thr).filled(-999.0)
        assert np.allclose(got, exp)

    def test_masked_inside_outside(self, nd):
        """test_masked.py:172 test_creation_functions (inside/outside
        halves)."""
        gi = np.asarray(ma.filled(ma.masked_inside(
            ma.masked_invalid(nd), 3.0, 7.0), 0.0).compute())
        ei = npma.masked_inside(npma.masked_invalid(self.DATA), 3.0, 7.0) \
            .filled(0.0)
        assert np.allclose(gi, ei)
        go = np.asarray(ma.filled(ma.masked_outside(
            ma.masked_invalid(nd), 0.0, 9.0), 0.0).compute())
        eo = npma.masked_outside(npma.masked_invalid(self.DATA), 0.0, 9.0) \
            .filled(0.0)
        assert np.allclose(go, eo)

    def test_masked_values(self, nd):
        """test_masked.py:172 (masked_values half)."""
        got = np.asarray(ma.filled(ma.masked_values(
            ma.masked_invalid(nd), 100.0), 0.0).compute())
        exp = npma.masked_values(npma.masked_invalid(self.DATA), 100.0) \
            .filled(0.0)
        assert np.allclose(got, exp)

    @pytest.mark.parametrize("red", ["sum", "mean", "max", "min", "count"])
    def test_reductions(self, nd, red):
        """test_masked.py:250 test_reductions (per-row axis)."""
        mk = ma.masked_less(ma.masked_invalid(nd), 0.0)
        ref = npma.masked_less(npma.masked_invalid(self.DATA), 0.0)
        got = self._row_reduce(getattr(ma, red)(mk))
        exp = getattr(ref, red)(axis=1)
        if red == "sum":
            exp = exp.filled(np.nan)
        assert np.allclose(got, np.asarray(exp, dtype=float),
                           equal_nan=True)

    def test_reductions_allmasked(self, spark):
        """test_masked.py:278 test_reductions_allmasked — fully
        masked rows give masked (NULL) stats and count 0."""
        pdf = pd.DataFrame([(0, [-1.0, -2.0])], columns=["id", "block"])
        nd1 = NDArray(spark.createDataFrame(pdf), (2,), "block", "id")
        mk = ma.masked_less(nd1, 0.0)
        cnt = self._row_reduce(ma.count(mk))
        assert cnt[0] == 0
        mx = np.asarray(ma.max(mk)._sdf.select("block").collect()[0][0])
        assert mx[0] is None or np.isnan(float(mx[0]))

    def test_filled_getdata_getmask(self, nd):
        """test_masked.py:222 test_filled + :315 test_accessors."""
        mk = ma.masked_invalid(nd)
        ref = npma.masked_invalid(self.DATA)
        assert np.allclose(np.asarray(ma.filled(mk, -1.0).compute()),
                           ref.filled(-1.0))
        assert np.allclose(np.asarray(ma.getmaskarray(mk).compute()),
                           npma.getmaskarray(ref).astype(float))
        gd = np.asarray(ma.getdata(ma.masked_less(nd, 0.0)).compute())
        # getdata returns the underlying data where unmasked; masked
        # slots are NULL-backed here (pinned: no parallel mask array)
        assert gd.shape == self.DATA.shape

    def test_fix_invalid(self, nd):
        """test_masked.py:172 (fix_invalid half)."""
        got = np.asarray(ma.filled(ma.fix_invalid(nd, 0.0), 0.0).compute())
        exp = npma.fix_invalid(self.DATA, fill_value=0.0).filled(0.0)
        assert np.allclose(got, exp)

    def test_arithmetic_keeps_mask(self, nd):
        """test_masked.py:392 test_arithmetic_results_in_masked."""
        mk = ma.masked_less(ma.masked_invalid(nd), 0.0)
        ref = npma.masked_less(npma.masked_invalid(self.DATA), 0.0)
        doubled = (mk * 2.0) + 1.0
        got = np.asarray(ma.filled(doubled, -999.0).compute())
        exp = (ref * 2.0 + 1.0).filled(-999.0)
        assert np.allclose(got, exp)

    def test_average_with_weights(self, nd):
        """test_masked.py:379 test_average_weights_with_masked_array."""
        mk = ma.masked_less(ma.masked_invalid(nd), 0.0)
        ref = npma.masked_less(npma.masked_invalid(self.DATA), 0.0)
        w = [1.0, 2.0, 3.0, 4.0]
        got = self._row_reduce(ma.average(mk, weights=w))
        exp = npma.average(ref, axis=1, weights=w)
        assert np.allclose(got, np.asarray(exp, dtype=float))
