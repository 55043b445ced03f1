"""Module-level ufunc family parity vs numpy (reference:
dask/array/ufunc.py — dask re-exports each numpy ufunc at the
``dask.array`` top level and tests them elementwise against numpy in
dask/array/tests/test_ufunc.py). Here every ufunc is a JVM Column
expression; parity is checked on DArray blocks, NDArray blocks, and
Series columns against the numpy result on the same values."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
import dask_spark.array as da
from dask_spark import ufunc as uf

# value grid chosen to exercise signs, zero, fractions, magnitudes
BASE = np.array([-2.7, -1.0, -0.5, 0.25, 1.0, 3.9], dtype="float64")
POS = np.abs(BASE) + 0.1  # strictly positive, for log/sqrt domains
UNIT = np.array([-0.9, -0.5, 0.0, 0.3, 0.7, 0.99])  # (-1, 1) domain


def _series(spark, vals, name="x"):
    f = ds.from_pandas(pd.DataFrame({name: vals}))
    return getattr(f, name)


def _series_vals(s):
    return np.array(
        [r[0] for r in s._frame._sdf.select(s._expr.alias("v")).collect()],
        dtype="float64",
    )


def _darray(spark, vals):
    pdf = pd.DataFrame({"rid": [0, 1], "vec": [list(vals), list(vals[::-1])]})
    f = ds.from_pandas(pdf)
    return da.DArray(f._sdf, "vec", "rid")


def _darray_vals(a):
    rows = a._sdf.orderBy("rid").collect()
    return np.array([r["vec"] for r in rows], dtype="float64")


# (name, domain) — domain picks input values keeping the fn finite
UNARY_CASES = [
    ("abs", BASE), ("absolute", BASE), ("fabs", BASE),
    ("arccos", UNIT), ("arcsin", UNIT), ("arctan", BASE),
    ("arccosh", POS + 1.0), ("arcsinh", BASE), ("arctanh", UNIT),
    ("cbrt", BASE), ("ceil", BASE), ("floor", BASE), ("trunc", BASE),
    ("fix", BASE), ("rint", BASE), ("conj", BASE), ("real", BASE),
    ("positive", BASE), ("negative", BASE), ("cos", BASE), ("cosh", BASE),
    ("sin", BASE), ("sinh", BASE), ("tan", BASE), ("tanh", BASE),
    ("deg2rad", BASE), ("radians", BASE), ("degrees", BASE),
    ("rad2deg", BASE), ("exp", BASE), ("exp2", BASE), ("expm1", BASE),
    ("log", POS), ("log1p", POS), ("log2", POS), ("log10", POS),
    ("reciprocal", BASE), ("sign", BASE), ("sqrt", POS),
    ("square", BASE), ("sinc", BASE), ("angle", BASE), ("imag", BASE),
    ("nan_to_num", BASE),
]

BINARY_CASES = [
    ("add", BASE, POS), ("subtract", BASE, POS), ("multiply", BASE, POS),
    ("divide", BASE, POS), ("true_divide", BASE, POS),
    ("arctan2", BASE, POS), ("copysign", POS, BASE),
    ("power", POS, BASE), ("float_power", POS, BASE),
    ("floor_divide", BASE, POS), ("fmod", BASE, POS),
    ("mod", BASE, POS), ("remainder", BASE, POS),
    ("fmax", BASE, POS), ("fmin", BASE, POS),
    ("maximum", BASE, POS), ("minimum", BASE, POS),
    ("hypot", BASE, POS), ("ldexp", BASE, np.array([1., 2, 0, -1, 3, 5])),
    ("logaddexp", BASE, POS), ("logaddexp2", BASE, POS),
    ("nextafter", BASE, None),  # scalar-other only, Arrow path
]

PRED_CASES = [
    ("isnan", BASE), ("isinf", BASE), ("isfinite", BASE),
    ("isneginf", BASE), ("isposinf", BASE), ("signbit", BASE),
    ("logical_not", BASE), ("iscomplex", BASE), ("isreal", BASE),
]


@pytest.mark.parametrize("name,vals", UNARY_CASES)
def test_unary_series_parity(spark, name, vals):
    s = _series(spark, vals)
    got = _series_vals(getattr(da, name)(s))
    exp = getattr(np, name)(vals)
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize(
    "name,vals", [("sin", BASE), ("floor", BASE), ("exp2", BASE),
                  ("sqrt", POS), ("rint", BASE), ("sinc", BASE)]
)
def test_unary_darray_parity(spark, name, vals):
    a = _darray(spark, vals)
    got = _darray_vals(getattr(da, name)(a))
    exp = np.stack([getattr(np, name)(vals), getattr(np, name)(vals[::-1])])
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,x,y", BINARY_CASES)
def test_binary_series_parity(spark, name, x, y):
    sx = _series(spark, x)
    if name == "nextafter":
        a = _darray(spark, x)
        got = _darray_vals(da.nextafter(a, 0.0))
        exp = np.stack([np.nextafter(x, 0.0), np.nextafter(x[::-1], 0.0)])
        np.testing.assert_array_equal(got, exp)
        return
    f = ds.from_pandas(pd.DataFrame({"x": x, "y": y}))
    got = _series_vals(getattr(da, name)(f.x, f.y))
    exp = (
        np.ldexp(x, y.astype("int64")) if name == "ldexp"
        else getattr(np, name)(x, y)
    )
    np.testing.assert_allclose(got, exp, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,vals", PRED_CASES)
def test_pred_series_bool_array_double(spark, name, vals):
    # Series keeps boolean; array targets cast to 0.0/1.0 doubles
    s = _series(spark, vals)
    got = [
        r[0]
        for r in getattr(da, name)(s)
        ._frame._sdf.select(getattr(da, name)(s)._expr.alias("v"))
        .collect()
    ]
    exp = getattr(np, name)(vals) if hasattr(np, name) else None
    if exp is not None:
        assert got == list(exp)
    a = _darray(spark, vals)
    blocks = _darray_vals(getattr(da, name)(a))
    assert set(np.unique(blocks)) <= {0.0, 1.0}
    if exp is not None:
        np.testing.assert_array_equal(blocks[0], exp.astype("float64"))


def test_binary_scalar_and_reflected(spark):
    x = BASE
    s = _series(spark, x)
    np.testing.assert_allclose(_series_vals(da.add(s, 2.0)), x + 2.0)
    np.testing.assert_allclose(_series_vals(da.subtract(10.0, s)), 10.0 - x)
    a = _darray(spark, x)
    np.testing.assert_allclose(
        _darray_vals(da.multiply(a, 3.0))[0], x * 3.0
    )


def test_mod_sign_semantics(spark):
    # numpy mod follows the divisor, fmod the dividend
    f = ds.from_pandas(pd.DataFrame({"x": [5.5, -5.5], "y": [2.0, 2.0]}))
    assert list(_series_vals(da.mod(f.x, f.y))) == [1.5, 0.5]
    assert list(_series_vals(da.fmod(f.x, f.y))) == [1.5, -1.5]
    f2 = ds.from_pandas(pd.DataFrame({"x": [5.5, -5.5], "y": [-2.0, -2.0]}))
    assert list(_series_vals(da.mod(f2.x, f2.y))) == [-0.5, -1.5]


def test_ansi_safe_floor_huge(spark):
    # Spark 4 ANSI floor() returns BIGINT and would overflow at 1e308;
    # the double-arithmetic path must not
    f = ds.from_pandas(pd.DataFrame({"x": [1e308, -1e308, 2.5]}))
    assert list(_series_vals(da.floor(f.x))) == [1e308, -1e308, 2.0]
    assert list(_series_vals(da.ceil(f.x))) == [1e308, -1e308, 3.0]


def test_modf_frexp_tuples(spark):
    vals = np.array([1e308, -2.5, 2.5, 0.0, 0.7])
    f = ds.from_pandas(pd.DataFrame({"x": vals}))
    fr, ip = da.modf(f.x)
    nfr, nip = np.modf(vals)
    np.testing.assert_allclose(_series_vals(fr), nfr)
    np.testing.assert_allclose(_series_vals(ip), nip)
    m, e = da.frexp(f.x)
    nm, ne = np.frexp(vals)
    np.testing.assert_allclose(_series_vals(m), nm)
    np.testing.assert_allclose(_series_vals(e), ne)
    fd, md = da.divmod(f.x, 2.0)
    nfd, nmd = np.divmod(vals, 2.0)
    np.testing.assert_allclose(_series_vals(fd), nfd)
    np.testing.assert_allclose(_series_vals(md), nmd)


def test_i0_tolerance(spark):
    # A&S 9.8.x polynomial: |err| < 2e-7 vs numpy's Chebyshev series
    vals = np.array([0.0, 0.1, 1.0, 3.0, 3.75, 5.0, 10.0, 20.0])
    f = ds.from_pandas(pd.DataFrame({"x": vals}))
    np.testing.assert_allclose(_series_vals(da.i0(f.x)), np.i0(vals), rtol=3e-7)


def test_bitwise_family(spark):
    f = ds.from_pandas(pd.DataFrame({"a": [12, 7, 0], "b": [10, 3, 5]}))
    assert list(_series_vals(da.bitwise_and(f.a, f.b))) == [8.0, 3.0, 0.0]
    assert list(_series_vals(da.bitwise_or(f.a, f.b))) == [14.0, 7.0, 5.0]
    assert list(_series_vals(da.bitwise_xor(f.a, f.b))) == [6.0, 4.0, 5.0]
    assert list(_series_vals(da.invert(f.a))) == [-13.0, -8.0, -1.0]
    assert list(_series_vals(da.left_shift(f.a, f.b))) == [
        12.0 * 1024, 7.0 * 8, 0.0
    ]
    assert list(_series_vals(da.right_shift(f.a, 2))) == [3.0, 1.0, 0.0]
    # arithmetic (sign-preserving) right shift, like numpy
    g = ds.from_pandas(pd.DataFrame({"a": [-5]}))
    assert list(_series_vals(da.right_shift(g.a, 1))) == [-3.0]


def test_logical_family(spark):
    f = ds.from_pandas(pd.DataFrame({"a": [0.0, 1.5, 0.0], "b": [2.0, 0.0, 0.0]}))
    got_and = [r[0] for r in da.logical_and(f.a, f.b)._frame._sdf.select(
        da.logical_and(f.a, f.b)._expr.alias("v")).collect()]
    assert got_and == [False, False, False]
    got_or = [r[0] for r in da.logical_or(f.a, f.b)._frame._sdf.select(
        da.logical_or(f.a, f.b)._expr.alias("v")).collect()]
    assert got_or == [True, True, False]
    got_xor = [r[0] for r in da.logical_xor(f.a, f.b)._frame._sdf.select(
        da.logical_xor(f.a, f.b)._expr.alias("v")).collect()]
    assert got_xor == [True, True, False]


def test_nan_propagation_maximum(spark):
    # real runtime NaN via sqrt(-1); numpy maximum/minimum propagate it
    f = ds.from_pandas(pd.DataFrame({"x": [-1.0, 4.0], "y": [3.0, 3.0]}))
    nanified = da.sqrt(f.x)
    mx = _series_vals(da.maximum(nanified, f.y))
    mn = _series_vals(da.minimum(nanified, f.y))
    assert math.isnan(mx[0]) and mx[1] == 3.0
    assert math.isnan(mn[0]) and mn[1] == 2.0
    fmx = _series_vals(da.fmax(nanified, f.y))
    fmn = _series_vals(da.fmin(nanified, f.y))
    assert fmx[0] == 3.0 and fmx[1] == 3.0
    assert fmn[0] == 3.0 and fmn[1] == 2.0


def test_spacing_and_frompyfunc(spark):
    vals = np.array([1.0, 2.0, 1e10, 0.5, -3.0, 7.25])
    a = _darray(spark, vals)
    got = _darray_vals(da.spacing(a))
    np.testing.assert_array_equal(got[0], np.spacing(vals))
    doubler = da.frompyfunc(lambda t: t * 2 + 1)
    np.testing.assert_allclose(_darray_vals(doubler(a))[0], vals * 2 + 1)
    assert doubler(3.0) == 7.0
    with pytest.raises(NotImplementedError):
        da.frompyfunc(lambda a, b: a + b, 2, 1)


def test_ndarray_ufunc(spark):
    vals = np.arange(12, dtype="float64").reshape(3, 4) / 7.0
    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": range(3), "vec": [list(r) for r in vals]
        })), "vec", 4, "rid",
    )
    out = da.sin(nd)
    rows = out._materialize()._sdf.orderBy("rid").collect()
    got = np.array([r["block"] for r in rows])
    np.testing.assert_allclose(got, np.sin(vals), rtol=1e-12)
    # binary with numpy broadcast literal
    out2 = da.add(nd, np.array([1.0, 2.0, 3.0, 4.0]))
    rows2 = out2._materialize()._sdf.orderBy("rid").collect()
    np.testing.assert_allclose(
        np.array([r["block"] for r in rows2]), vals + np.array([1., 2, 3, 4])
    )


def test_scalar_fallthrough():
    assert da.sin(0.5) == np.sin(0.5)
    assert da.hypot(3.0, 4.0) == 5.0
    assert uf.floor_divide(7.0, 2.0) == 3.0


def test_numpy_ufunc_interop(spark):
    """np.<ufunc>(collection) dispatches through __array_ufunc__ to
    the JVM twin (reference: dask collections implement
    __array_ufunc__ so numpy calls stay lazy)."""
    f = ds.from_pandas(pd.DataFrame({"x": [0.5, -1.0]}))
    s = np.sin(f.x)
    assert np.allclose(_series_vals(s), np.sin([0.5, -1.0]))
    h = np.hypot(f.x, 2.0)
    assert np.allclose(_series_vals(h), np.hypot([0.5, -1.0], 2.0))
    r = np.add(3.0, f.x)  # reflected operand order
    assert np.allclose(_series_vals(r), [3.5, 2.0])
    arr = _darray(spark, BASE)
    assert np.allclose(_darray_vals(np.sqrt(np.abs(arr)))[0], np.sqrt(np.abs(BASE)))
    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({"rid": [0], "vec": [[1.0, 4.0]]})),
        "vec", 2, "rid",
    )
    assert np.allclose(np.exp(nd).compute().ravel(), np.exp([1.0, 4.0]))
    # unsupported method -> numpy's standard error, not a crash
    with pytest.raises(TypeError):
        np.add.reduce(f.x)
