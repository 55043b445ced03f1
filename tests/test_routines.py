"""Module-level routines parity vs numpy (reference: dask/array/
routines.py and dask/array/tests/test_routines.py — dask re-exports
each routine at the ``dask.array`` top level and pins it elementwise
or structurally against numpy). Selection/search routines are JVM
Column expressions; structural ones compose the NDArray driver-side
permutation planner; nan-reductions ride the existing block
machinery."""

from __future__ import annotations

import math
import warnings

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
import dask_spark.array as da

warnings.filterwarnings("ignore", category=RuntimeWarning)

REF3 = np.arange(24, dtype="float64").reshape(2, 3, 4)


@pytest.fixture(scope="module")
def nd(spark):
    return ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": [0, 1],
            "vec": [list(REF3[0].ravel()), list(REF3[1].ravel())],
        })),
        "vec", 12, "rid",
    ).reshape(3, 4)


@pytest.fixture(scope="module")
def nan_arr(spark):
    vals = [[1.0, float("nan"), 3.0],
            [float("nan")] * 3,
            [2.0, -1.0, 0.5]]
    f = ds.from_pandas(pd.DataFrame({"rid": [0, 1, 2], "vec": vals}))
    return da.DArray(f._sdf, "vec", "rid"), np.array(vals)


def _series_vals(s):
    return [r[0] for r in s._frame._sdf.select(s._expr.alias("v")).collect()]


# ---- selection ---------------------------------------------------------

def test_where_select_piecewise_choose(spark):
    f = ds.from_pandas(pd.DataFrame({"x": [1.0, -2.0, 0.0, 5.0],
                                     "y": [10.0, 20.0, 30.0, 40.0]}))
    w = da.where(da.greater(f.x, 0), f.y, -1.0)
    assert _series_vals(w) == [10.0, -1.0, -1.0, 40.0]
    sel = da.select([da.less(f.x, 0), da.greater(f.x, 1)], [f.y, 99.0], 0.0)
    assert _series_vals(sel) == [0.0, 20.0, 0.0, 99.0]
    pw = da.piecewise(f.x, [da.less(f.x, 0)],
                      [lambda s: da.multiply(s, -1.0), 7.0])
    assert _series_vals(pw) == [7.0, 2.0, 7.0, 7.0]
    i = ds.from_pandas(pd.DataFrame({"i": [0, 2, 1]}))
    ch = da.choose(i.i, [10.0, 20.0, 30.0])
    assert _series_vals(ch) == [10.0, 30.0, 20.0]


def test_isclose_allclose(spark):
    g = ds.from_pandas(pd.DataFrame({"a": [1.0, 2.0], "b": [1.0 + 1e-9, 2.1]}))
    assert _series_vals(da.isclose(g.a, g.b)) == [True, False]
    assert da.allclose(g.a, g.a) is True
    assert da.allclose(g.a, g.b) is False


def test_isnull_notnull(spark):
    f = ds.from_pandas(pd.DataFrame({"x": [1.0, None, 3.0]}))
    assert _series_vals(da.isnull(f.x)) == [False, True, False]
    assert _series_vals(da.notnull(f.x)) == [True, False, True]


def test_compress_extract(spark):
    f = ds.from_pandas(pd.DataFrame({"x": [1.0, -2.0, 5.0]}))
    kept = da.compress(da.greater(f.x, 0), f.x)
    assert sorted(_series_vals(kept)) == [1.0, 5.0]
    assert sorted(_series_vals(da.extract(da.less(f.x, 0), f.x))) == [-2.0]


# ---- search / index ----------------------------------------------------

def test_argtopk(spark):
    f = ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[3.0, 1.0, 4.0, 1.0, 5.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    assert da.argtopk(arr, 3)._sdf.first()["vec"] == [4.0, 2.0, 0.0]


def test_searchsorted_sides(spark):
    vals = [1.0, -2.0, 0.0, 5.0, 2.0, 4.0]
    f = ds.from_pandas(pd.DataFrame({"x": vals}))
    bins = [0.0, 2.0, 4.0]
    for side in ("left", "right"):
        got = _series_vals(da.searchsorted(bins, f.x, side=side))
        exp = list(np.searchsorted(bins, vals, side=side).astype(float))
        assert got == exp, (side, got, exp)


def test_take(spark, nd):
    got = da.take(nd, [2, 1], axis=2).compute()
    assert np.array_equal(got, np.take(REF3, [2, 1], axis=2))
    f = ds.from_pandas(pd.DataFrame({"rid": [0, 1, 2], "vec": [[1.0], [2.0], [3.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    rows = da.take(arr, [2, 0, 2], axis=0)._sdf.collect()
    assert [r["vec"][0] for r in rows] == [3.0, 1.0, 3.0]


def test_nonzero_flatnonzero(spark):
    f = ds.from_pandas(pd.DataFrame({"rid": [0, 1], "vec": [[0.0, 7.0], [1.0, 0.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    nz = da.nonzero(arr).compute()
    assert sorted(zip(nz["rid"], nz["pos"])) == [(0, 1), (1, 0)]
    assert sorted(da.flatnonzero(arr).compute()["flat_idx"]) == [1, 2]


def test_union1d(spark):
    a = ds.from_pandas(pd.DataFrame({"x": [3.0, 1.0]}))
    b = ds.from_pandas(pd.DataFrame({"y": [1.0, 2.0]}))
    assert list(da.union1d(a.x, b.y).compute()["v"]) == [1.0, 2.0, 3.0]


# ---- structural --------------------------------------------------------

@pytest.mark.parametrize("name,fn,exp_fn", [
    ("fliplr", lambda a: da.fliplr(a), lambda r: np.flip(r, axis=1)),
    ("rot90", lambda a: da.rot90(a, 1, axes=(1, 2)),
     lambda r: np.rot90(r, 1, axes=(1, 2))),
    ("moveaxis", lambda a: da.moveaxis(a, 1, 2),
     lambda r: np.moveaxis(r, 1, 2)),
    ("rollaxis", lambda a: da.rollaxis(a, 2, 1),
     lambda r: np.rollaxis(r, 2, 1)),
    ("tile", lambda a: da.tile(a, 2), lambda r: np.tile(r, 2)),
    ("repeat", lambda a: da.repeat(a, 2, axis=1),
     lambda r: np.repeat(r, 2, axis=1)),
    ("delete", lambda a: da.delete(a, 1, axis=2),
     lambda r: np.delete(r, 1, axis=2)),
    ("insert", lambda a: da.insert(a, 1, 9.5, axis=2),
     lambda r: np.insert(r, 1, 9.5, axis=2)),
])
def test_structural_parity(spark, nd, name, fn, exp_fn):
    assert np.array_equal(fn(nd).compute(), exp_fn(REF3)), name


def test_flipud_diag_trace(spark, nd):
    assert np.array_equal(da.flipud(nd).compute(), REF3[::-1])
    assert np.array_equal(
        da.diag(nd, 1).compute(),
        np.stack([np.diagonal(r, offset=1) for r in REF3]),
    )
    tr = sorted(r[1] for r in da.trace(nd)._sdf.collect())
    assert tr == sorted(float(np.trace(r)) for r in REF3)


def test_broadcast_repeat0(spark, nd):
    b = da.broadcast_to(nd.reshape(1, 3, 4), (2, 2, 3, 4)).compute()
    assert np.array_equal(b, np.broadcast_to(REF3[:, None], (2, 2, 3, 4)))
    r0 = da.repeat(nd, 2, axis=0).compute()
    assert np.array_equal(r0, np.repeat(REF3, 2, axis=0))
    ba = da.broadcast_arrays(nd.reshape(1, 3, 4), nd.reshape(3, 1, 4))
    assert ba[0].inner_shape == (3, 3, 4) and ba[1].inner_shape == (3, 3, 4)


def test_tri_fromfunction_meshgrid(spark):
    assert np.array_equal(
        da.tri(4, 5, k=1).compute().reshape(4, 5), np.tri(4, 5, k=1)
    )
    ff = da.fromfunction(lambda i, j, k: i * 100 + j * 10 + k, (3, 2, 2))
    assert np.array_equal(
        ff.compute(), np.fromfunction(lambda i, j, k: i * 100 + j * 10 + k,
                                      (3, 2, 2))
    )
    gx, gy = da.meshgrid([1.0, 2.0, 3.0], [10.0, 20.0])
    ngx, ngy = np.meshgrid([1.0, 2.0, 3.0], [10.0, 20.0])
    assert np.array_equal(gx.compute().reshape(ngx.shape), ngx)
    assert np.array_equal(gy.compute().reshape(ngy.shape), ngy)


def test_block_append_shuffle(spark, nd):
    assert np.array_equal(da.block([nd, nd]).compute(), np.block([REF3, REF3]))
    assert da.append(nd, nd, axis=0).compute().shape == (4, 3, 4)
    sh = da.shuffle(nd, [[2, 0], [1]], axis=2).compute()
    assert np.array_equal(sh, REF3[:, :, [2, 0, 1]])


def test_atleast_and_indices(spark, nd):
    assert da.atleast_3d(nd.reshape(12)).compute().shape == (2, 12, 1)
    assert da.atleast_1d(nd) is nd
    idx = da.indices((2, 3)).compute()
    assert np.array_equal(idx, np.indices((2, 3)).astype("float64"))
    r, c = da.tril_indices_from(nd, k=0)
    nr, nc = np.tril_indices(3, 0, 4)
    assert np.array_equal(r, nr) and np.array_equal(c, nc)


# ---- nan reductions / calculus ----------------------------------------

def _rowvals(f, name):
    return [r[name] for r in f._sdf.orderBy("rid").collect()]


def _nan_eq(got, exp):
    return all(
        (g is None or math.isnan(g)) and math.isnan(e)
        if (g is None or (isinstance(g, float) and math.isnan(g))
            or math.isnan(e))
        else abs(g - e) < 1e-12
        for g, e in zip(got, exp)
    )


def test_nan_family(spark, nan_arr):
    arr, npa = nan_arr
    assert _nan_eq(_rowvals(da.nanmax(arr), "nanmax"), np.nanmax(npa, axis=1))
    assert _nan_eq(_rowvals(da.nanmin(arr), "nanmin"), np.nanmin(npa, axis=1))
    assert np.allclose(_rowvals(da.nanprod(arr), "nanprod"),
                       np.nanprod(npa, axis=1))
    assert _nan_eq(_rowvals(da.nanvar(arr), "nanvar"), np.nanvar(npa, axis=1))
    assert _nan_eq(_rowvals(da.nanstd(arr, ddof=1), "nanstd"),
                   np.nanstd(npa, axis=1, ddof=1))
    assert _nan_eq(_rowvals(da.nanmedian(arr), "nanmedian"),
                   np.nanmedian(npa, axis=1))
    am = _rowvals(da.nanargmax(arr), "nanargmax")
    assert am[0] == 2.0 and am[1] is None and am[2] == 0.0
    nc = [r["vec"] for r in da.nancumsum(arr)._sdf.orderBy("rid").collect()]
    assert np.allclose(nc, np.nancumsum(npa, axis=1))
    p = da.nanpercentile(arr, 50.0)
    assert np.allclose(p, np.nanpercentile(npa, 50.0, axis=0))


def test_push_ediff1d(spark):
    pf = ds.from_pandas(pd.DataFrame({
        "rid": [0], "vec": [[float("nan"), 1.0, float("nan"), 2.0]]
    }))
    got = da.push(da.DArray(pf._sdf, "vec", "rid"))._sdf.first()["vec"]
    assert (got[0] is None or math.isnan(got[0]))
    assert got[1:] == [1.0, 1.0, 2.0]
    ef = ds.from_pandas(pd.DataFrame({"rid": [0, 1],
                                      "vec": [[1.0, 4.0], [9.0, 16.0]]}))
    ed = da.ediff1d(da.DArray(ef._sdf, "vec", "rid")).compute()
    assert list(ed.sort_values("flat_idx")["diff"]) == [3.0, 5.0, 7.0]


def test_gradient_all_axes(spark):
    ref = REF3 ** 1.5
    nd2 = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": [0, 1],
            "vec": [list(ref[0].ravel()), list(ref[1].ravel())],
        })), "vec", 12, "rid",
    ).reshape(3, 4)
    for ax in (0, 1, 2):
        got = da.gradient(nd2, ax).compute()
        assert np.allclose(got, np.gradient(ref, axis=ax)), ax


def test_outer_vdot(spark):
    f = ds.from_pandas(pd.DataFrame({"x": [1.0, 2.0]}))
    o = da.outer(f.x, [10.0, 20.0])._sdf.collect()
    assert sorted(r["outer"] for r in o) == [[10.0, 20.0], [20.0, 40.0]]
    ef = ds.from_pandas(pd.DataFrame({"rid": [0, 1],
                                      "vec": [[1.0, 4.0], [9.0, 16.0]]}))
    vd = da.vdot(da.DArray(ef._sdf, "vec", "rid"), [1.0, 1.0])
    assert vd._sdf.first()["vdot"] == 30.0


def test_apply_along_axis_reduction(spark, nd):
    aa = da.apply_along_axis(lambda v: v.sum(), 2, nd).compute()
    assert np.allclose(aa.reshape(2, 3), REF3.sum(axis=2))
    res = da.reduction(
        nd, chunk=lambda b: b.sum(axis=0),
        aggregate=lambda parts: np.sum(parts, axis=0),
    )
    assert np.allclose(res, REF3.sum(axis=0))


def test_histogramdd(spark, tables):
    li = tables["lineitem"]
    h = da.histogramdd(
        li, ["l_quantity", "l_discount", "l_tax"], 4,
        [(0.0, 50.0), (0.0, 0.1), (0.0, 0.08)],
    ).compute()
    assert h["count"].sum() == len(li.compute())


def test_elemwise_and_blockwise(spark):
    f = ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[1.0, 2.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    import pyspark.sql.functions as F

    doubled = da.elemwise(lambda c: c * 2, arr)
    assert doubled._sdf.first()["vec"] == [2.0, 4.0]
    bw = da.blockwise(lambda b: b + 1, "ij", arr, "ij")
    assert bw._sdf.first()["vec"] == [2.0, 3.0]
    with pytest.raises(NotImplementedError):
        da.blockwise(lambda b: b, "ik", arr, "ij")


def test_guards(spark, nd):
    with pytest.raises(ValueError):
        da.rot90(nd, axes=(0, 1))
    with pytest.raises(ValueError):
        da.moveaxis(nd, 0, 1)
    with pytest.raises(ValueError):
        da.apply_along_axis(lambda v: v, 0, nd)
    with pytest.raises(TypeError):
        da.argtopk(object(), 3)


# ---- namespace shims / IO ----------------------------------------------

def test_npy_stack_roundtrip(spark, tmp_path):
    import dask_spark.routines as R

    ref = np.arange(24, dtype="float64").reshape(6, 4)
    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": range(6), "vec": [list(r) for r in ref],
        }), npartitions=3),
        "vec", 4, "rid",
    )
    d = str(tmp_path / "stack")
    R.to_npy_stack(d, nd)
    back = R.from_npy_stack(d).compute().reshape(-1, 4)
    assert sorted(map(tuple, back.tolist())) == sorted(map(tuple, ref.tolist()))


def test_gated_io_raise(spark):
    import dask_spark.routines as R

    nd = da.asarray(np.ones((2, 2)))
    for fn in (lambda: R.to_zarr(nd, "/tmp/x.zarr"),
               lambda: R.from_zarr("/tmp/x.zarr"),
               lambda: R.to_tiledb(nd, "/tmp/x.tdb"),
               lambda: R.to_hdf5("/tmp/x.h5", "/d", nd)):
        with pytest.raises(ImportError):
            fn()


def test_store_parquet(spark, tmp_path):
    import dask_spark.routines as R

    nd = da.asarray(np.arange(4.0).reshape(2, 2))
    out = R.store(nd, str(tmp_path / "t"))
    got = ds.read_parquet(out).compute()
    assert len(got) == 2


def test_asarray_stacks_shims(spark):
    a = da.asarray(np.arange(6.0).reshape(3, 2))
    b = da.asarray(np.arange(6.0, 12.0).reshape(3, 2))
    assert da.vstack([a, b]).compute().shape == (6, 2)
    assert da.dstack([a, b]).compute().shape == (3, 2, 2)
    h = da.hstack([a, b]).compute().reshape(3, 4)
    exp = np.hstack([np.arange(6.0).reshape(3, 2),
                     np.arange(6.0, 12.0).reshape(3, 2)])
    assert sorted(map(tuple, h.tolist())) == sorted(map(tuple, exp.tolist()))
    assert da.result_type(a, 1.0) == np.float64
    assert da.asarray(a) is a
    assert isinstance(da.unify_chunks(a, "ij", b, "ij")[1], list)
    assert da.register_chunk_type(float) is float
    assert issubclass(da.PerformanceWarning, UserWarning)
    assert da.linalg.norm is not None and da.ma is not None


def test_ravel_unravel_series(spark):
    f = ds.from_pandas(pd.DataFrame({"i": [0, 1, 2], "j": [1, 0, 2]}))
    fl = da.ravel_multi_index((f.i, f.j), (3, 3))
    assert _series_vals(fl) == [1, 3, 8]
    ii, jj = da.unravel_index(fl, (3, 3))
    assert _series_vals(ii) == [0, 1, 2]
    assert _series_vals(jj) == [1, 0, 2]


def test_as_gufunc(spark):
    @da.as_gufunc("(i)->()")
    def rowsum(v):
        return v.sum(axis=-1)

    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({"rid": [0, 1], "vec": [[1.0, 2.0], [3.0, 4.0]]})),
        "vec", 2, "rid",
    )
    vals = sorted(r[1][0] for r in rowsum(nd)._sdf.collect())
    assert vals == [3.0, 7.0]


# ---- dask.array.fft submodule ------------------------------------------

def test_fft_submodule_roundtrips(spark):
    import dask_spark.fft as dfft

    ref = np.random.RandomState(0).randn(3, 8)
    arr = da.DArray(
        ds.from_pandas(pd.DataFrame({
            "rid": range(3), "vec": [list(r) for r in ref],
        }))._sdf, "vec", "rid",
    )
    c = dfft.fft(arr)
    rows = c._sdf.orderBy("rid").collect()
    C = np.array([r["re"] for r in rows]) + 1j * np.array([r["im"] for r in rows])
    assert np.allclose(C, np.fft.fft(ref, axis=1))
    back = dfft.ifft(c)._sdf.orderBy("rid").collect()
    assert np.allclose(np.array([r["re"] for r in back]), ref, atol=1e-12)
    r = dfft.rfft(arr)
    rr = r._sdf.orderBy("rid").collect()
    R = np.array([x["re"] for x in rr]) + 1j * np.array([x["im"] for x in rr])
    assert np.allclose(R, np.fft.rfft(ref, axis=1))
    ir = dfft.irfft(r)._sdf.orderBy("rid").collect()
    assert np.allclose(
        np.array([x["values"] for x in ir]),
        np.fft.irfft(np.fft.rfft(ref, axis=1), axis=1),
    )


def test_fftfreq_shift(spark):
    import dask_spark.fft as dfft

    fr = dfft.fftfreq(8, d=0.5).compute().sort_values("row_id")
    assert np.allclose(fr["freq"], np.fft.fftfreq(8, d=0.5))
    rfr = dfft.rfftfreq(9, d=2.0).compute().sort_values("row_id")
    assert np.allclose(rfr["freq"], np.fft.rfftfreq(9, d=2.0))
    # freq creation is pure JVM: no numpy kernel, no exchange
    p = dfft.fftfreq(8)._sdf._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in p and "MapInPandas" not in p

    ref = np.arange(24.0).reshape(3, 8)
    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": range(3), "vec": [list(r) for r in ref],
        })), "vec", 8, "rid",
    )
    assert np.array_equal(
        dfft.fftshift(nd, axes=1).compute(), np.fft.fftshift(ref, axes=1)
    )
    assert np.array_equal(
        dfft.ifftshift(dfft.fftshift(nd, axes=1), axes=1).compute(), ref
    )
    assert da.fft is dfft  # lazy submodule wiring


def test_round6_review_fixes(spark):
    """Edge paths surfaced by self-review: one-arg where == nonzero,
    plain-sequence searchsorted falls to numpy, DArray inner
    repeat."""
    f = ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[0.0, 3.0, 0.0, 7.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    nz = da.where(arr)
    assert sorted(nz.compute()["pos"]) == [1, 3]
    assert list(da.searchsorted([1.0, 5.0], [0.0, 2.0, 9.0])) == [0, 1, 2]
    rp = da.repeat(arr, 2, axis=1)._sdf.first()["vec"]
    assert rp == [0.0, 0.0, 3.0, 3.0, 0.0, 0.0, 7.0, 7.0]


def test_review_round2_fixes(spark, nd):
    """Second review pass: rollaxis start=0 guard, 1-D fromfunction,
    take with negative axis, DArray gradient axis guard, fft_wrap
    honoring its callable, config.set context restore."""
    # rollaxis: start=0 (the numpy default, = roll to the distributed
    # position) must raise, not silently permute inner axes
    with pytest.raises(ValueError):
        da.rollaxis(nd, 2, 0)
    # 1-D fromfunction calls func with ONE argument
    ff = da.fromfunction(lambda i: i * 3.0, (5,)).compute()
    assert np.array_equal(ff.ravel(), np.arange(5.0) * 3)
    # negative inner axis on take
    got = da.take(nd, [1, 0], axis=-1).compute()
    assert np.array_equal(got, np.take(REF3, [1, 0], axis=-1))
    # DArray gradient ignores axis no more
    f = ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[1.0, 2.0, 4.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    with pytest.raises(ValueError):
        da.gradient(arr, 0)
    # fft_wrap uses the callable it was given
    import dask_spark.fft as dfft

    calls = []

    def my_fft(X, axis=1, n=None):
        calls.append(len(X))
        return np.fft.fft(X, axis=axis)

    w = dfft.fft_wrap(my_fft, kind="fft")
    out = w(arr)
    rows = out._sdf.collect()
    assert calls and len(rows) == 1
    C = np.array(rows[0]["re"]) + 1j * np.array(rows[0]["im"])
    assert np.allclose(C, np.fft.fft([1.0, 2.0, 4.0]))
    # config.set as a context manager restores on exit
    import dask_spark as _ds

    _ds.config.set({"review.key": 1})
    with _ds.config.set({"review.key": 2}):
        assert _ds.config.get("review.key") == 2
    assert _ds.config.get("review.key") == 1


def test_npy_stack_darray_and_many_partitions(spark, tmp_path):
    """Review fixes: DArray stacks record the vector width, and
    partition files sort numerically (12 partitions would interleave
    lexicographically)."""
    import dask_spark.routines as R

    ref = np.arange(48, dtype="float64").reshape(24, 2)
    arr = da.DArray(
        ds.from_pandas(pd.DataFrame({
            "rid": range(24), "vec": [list(r) for r in ref],
        }), npartitions=12)._sdf, "vec", "rid",
    )
    d = str(tmp_path / "dstack")
    R.to_npy_stack(d, arr)
    back = R.from_npy_stack(d)
    got = back.compute().reshape(-1, 2)
    assert got.shape == (24, 2)
    assert sorted(map(tuple, got.tolist())) == sorted(map(tuple, ref.tolist()))
    # row ids are unique and dense after the numeric-sorted reload
    ids = sorted(r["row_id"] for r in back._sdf.select("row_id").collect())
    assert ids == list(range(24))


def test_numpy_function_interop(spark, nd):
    """np.<routine>(collection) dispatches through
    __array_function__ to the lazy twins (reference dask
    Array.__array_function__)."""
    assert np.array_equal(
        np.take(nd, [2, 1], axis=2).compute(),
        np.take(REF3, [2, 1], axis=2),
    )
    assert np.array_equal(
        np.moveaxis(nd, 1, 2).compute(), np.moveaxis(REF3, 1, 2)
    )
    assert np.array_equal(
        np.rot90(nd, 1, axes=(1, 2)).compute(),
        np.rot90(REF3, 1, axes=(1, 2)),
    )
    f = ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[3.0, 1.0, 4.0]]}))
    arr = da.DArray(f._sdf, "vec", "rid")
    assert np.take(arr, [2, 0], axis=1)._sdf.first()["vec"] == [4.0, 3.0]


def test_numpy_function_interop_series(spark):
    """Series also speaks __array_function__: np.where and
    np.searchsorted route to the Column twins."""
    f = ds.from_pandas(pd.DataFrame({"x": [1.0, -2.0, 5.0]}))
    w = np.where(da.greater(f.x, 0), f.x, -1.0)
    assert _series_vals(w) == [1.0, -1.0, 5.0]
    ss = np.searchsorted([0.0, 2.0], f.x)
    assert _series_vals(ss) == [1.0, 0.0, 2.0]


def test_review_round3_fixes(spark, nd):
    """Second review pass: clone keeps pending perms and handles the
    chunked layout, vindex is pointwise, frame.isin skips
    non-atomic columns, where with one branch raises, chunk sizes
    resolve, frame.index guidance survives __getattr__."""
    from dask_spark import graph_manipulation as gm
    from dask_spark.chunked import ChunkedNDArray

    # clone of an array with a PENDING transpose must keep the perm
    t = nd.transpose((1, 0))  # inner-axes swap (axis 0 stays rows)
    c = gm.clone(t)
    assert np.array_equal(c.compute(), t.compute())
    assert np.array_equal(t.compute(), REF3.transpose(0, 2, 1))
    # clone of the chunked layout round-trips
    ch = ChunkedNDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": [0], "vec": [list(range(8))],
        })), "vec", (4, 2), 2, "rid",
    )
    cc = gm.clone(ch)
    assert np.array_equal(cc.compute(), ch.compute())

    # vindex: pointwise, not outer-product
    got = nd.vindex[:, [0, 1], [0, 1]].compute()
    exp = REF3[:, [0, 1], [0, 1]]
    assert np.array_equal(got, exp), (got.shape, exp.shape)
    with pytest.raises(NotImplementedError):
        nd.vindex[[0], [0], [0]]

    # frame.isin with an array column: False, not AnalysisException
    f = ds.from_pandas(pd.DataFrame({
        "id": [1, 2], "toks": [["a", "b"], ["c"]],
    }))
    iv = f.isin([1, "a"]).compute()
    assert list(iv["toks"]) == [False, False]
    assert sorted(iv["id"]) == [False, True]

    with pytest.raises(ValueError):
        da.where(da.greater(f.id, 0), 5)

    # chunk sizes resolve after compute_chunk_sizes
    r = nd.compute_chunk_sizes()
    assert sum(r.chunks[0]) == 2 and not any(
        x != x for x in r.chunks[0]  # no NaN
    )

    # frame.index without set_index: TypeError with guidance
    with pytest.raises(TypeError):
        f.index


def test_histogram_weights_density(spark):
    """numpy parity for histogram(weights=), histogram(density=), and
    the two combined (reference array/routines.py:861)."""
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.reductions import histogram

    rng = np.random.RandomState(3)
    x = rng.uniform(0, 10, 500)
    w = rng.uniform(0.1, 2.0, 500)
    f = ds.from_pandas(pd.DataFrame({"x": x, "w": w}))

    def got(**kw):
        out = histogram(f, "x", bins=8, range=(0.0, 10.0), **kw).compute()
        full = np.zeros(8)
        for _, r in out.iterrows():
            full[int(r.bucket)] = r.n
        return full

    base, _ = np.histogram(x, bins=8, range=(0, 10))
    np.testing.assert_allclose(got(), base)
    ww, _ = np.histogram(x, bins=8, range=(0, 10), weights=w)
    np.testing.assert_allclose(got(weights="w"), ww, rtol=1e-12)
    dd, _ = np.histogram(x, bins=8, range=(0, 10), density=True)
    np.testing.assert_allclose(got(density=True), dd, rtol=1e-12)
    both, _ = np.histogram(x, bins=8, range=(0, 10), weights=w,
                           density=True)
    np.testing.assert_allclose(got(weights="w", density=True), both,
                               rtol=1e-12)


def test_histogram2d_dd_weights_density(spark):
    """numpy parity for the weights=/density= kwargs on histogram2d
    and histogramdd (reference routines.py:1070/1182)."""
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.ndarray import histogram2d
    from dask_spark.routines import histogramdd

    rng = np.random.RandomState(7)
    x = rng.uniform(0, 4, 400)
    y = rng.uniform(-1, 1, 400)
    w = rng.uniform(0.5, 1.5, 400)
    f = ds.from_pandas(pd.DataFrame({"x": x, "y": y, "w": w}))

    def grid2d(out):
        g = np.zeros((4, 4))
        for _, r in out.iterrows():
            g[int(r.bx), int(r.by)] = r.n
        return g

    ww, _, _ = np.histogram2d(x, y, bins=4, range=((0, 4), (-1, 1)),
                              weights=w)
    got = grid2d(histogram2d(f, "x", "y", 4, ((0, 4), (-1, 1)),
                             weights="w").compute())
    np.testing.assert_allclose(got, ww, rtol=1e-12)
    dd, _, _ = np.histogram2d(x, y, bins=4, range=((0, 4), (-1, 1)),
                              density=True)
    got = grid2d(histogram2d(f, "x", "y", 4, ((0, 4), (-1, 1)),
                             density=True).compute())
    np.testing.assert_allclose(got, dd, rtol=1e-12)

    wdd, _ = np.histogramdd(np.stack([x, y], axis=1), bins=4,
                            range=((0, 4), (-1, 1)), weights=w,
                            density=True)
    out = histogramdd(f, ["x", "y"], 4, [(0, 4), (-1, 1)],
                      weights="w", density=True).compute()
    g = np.zeros((4, 4))
    for _, r in out.iterrows():
        g[int(r.b_x), int(r.b_y)] = r["count"]
    np.testing.assert_allclose(g, wdd, rtol=1e-12)


def test_unique_return_counts_and_plain_average(spark):
    """numpy kwarg depth: unique(return_counts=True) returns sorted
    (values, counts); average() without weights is the plain per-row
    mean; positional return_index/inverse raise with guidance."""
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    import dask_spark.array as da

    f = ds.from_pandas(pd.DataFrame(
        {"rid": [0, 1], "vec": [[1.0, 2.0, 2.0], [3.0, 1.0, 3.0]]}))
    x = da.DArray(f._sdf, "vec", "rid")
    v, c = x.unique(return_counts=True)
    assert v.tolist() == [1.0, 2.0, 3.0]
    assert c.tolist() == [2, 2, 2]
    got = x.average().compute().sort_values("rid")
    assert np.allclose(got.average.tolist(), [5.0 / 3, 7.0 / 3])
    with pytest.raises(NotImplementedError):
        x.unique(return_index=True)
