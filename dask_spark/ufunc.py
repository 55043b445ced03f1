"""Module-level numpy-ufunc family (reference: dask/array/ufunc.py —
dask re-exports ~100 ufuncs at ``dask.array`` top level, each
``da.sin(x)`` equivalent to numpy's but lazy over chunks).

Spark-first translation: every ufunc is a **Column-expression
builder** pushed through the collection's own elementwise machinery —
``DArray.map`` / ``NDArray.map`` (a ``transform`` lambda over the
block column, pure JVM, map-only) or a ``Series`` expression rebind.
Nothing here touches Python at run time except the two bit-level
ufuncs numpy alone defines (``nextafter``/``spacing``) and
``frompyfunc``, which honestly route through the Arrow
``map_blocks`` path.

Dispatch is duck-typed (no imports from array/ndarray/frame, so this
module can be star-imported into ``dask_spark.array`` without an
import cycle):

- array-likes (``DArray``/``NDArray``) expose ``map`` + ``_col``;
  predicates cast to double there to keep the all-double block
  invariant (numpy's bool-array algebra — ``mask + mask`` — already
  works on 0.0/1.0 doubles);
- ``Series`` exposes ``_expr``/``_frame``; predicates stay boolean
  (pandas bool dtype) so ``df[da.greater(s, 0)]`` filters;
- plain scalars / numpy arrays fall through to numpy itself.

ANSI note: Spark 4 runs ANSI mode, where ``floor``/``ceil`` return
BIGINT and overflow on huge doubles. The floor/ceil/trunc family here
is computed in pure double arithmetic (``x - x % 1`` with a 2^52
integrality fast path), so ``da.floor(1e308)`` matches numpy instead
of raising.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

__all__ = []  # populated at the bottom

_INF = float("inf")
_MAXD = 1.7976931348623157e308
_TWO52 = 2.0 ** 52


# ---- dispatch helpers --------------------------------------------------

def _is_arr(a) -> bool:
    return hasattr(a, "map") and hasattr(a, "_col")


def _is_series(a) -> bool:
    return hasattr(a, "_expr") and hasattr(a, "_frame")


def _np():
    import numpy as np

    return np


def _apply1(a, build, np_name: str, pred: bool = False):
    if _is_arr(a):
        if pred:
            return a.map(lambda x: build(x).cast("double"))
        return a.map(build)
    if _is_series(a):
        return type(a)(a._frame, build(a._expr), a._name)
    return getattr(_np(), np_name)(a)


def _apply2(a, b, build, np_name: str, pred: bool = False):
    # predicates cast to double only on array targets (all-double block
    # invariant); Series keeps pandas-style boolean
    def _pick(target, bld):
        if pred and _is_arr(target):
            return lambda x, y: bld(x, y).cast("double")
        return bld

    if _is_arr(a) or _is_series(a):
        fn = _pick(a, build)
        if hasattr(a, "_binop"):  # DArray
            return a._binop(b, fn)
        return a._bin(b, fn)  # NDArray / Series
    if _is_arr(b) or _is_series(b):
        fn = _pick(b, lambda x, y: build(y, x))
        if hasattr(b, "_binop"):
            return b._binop(a, fn)
        return b._bin(a, fn)
    return getattr(_np(), np_name)(a, b)


# ---- ANSI-safe double-arithmetic floor/ceil/trunc ----------------------

def _trunc_d(c):
    # toward zero; Spark's % follows the dividend sign so x - x%1 is
    # exactly trunc for finite x; >=2^52 doubles are already integral
    # (covers inf), and NaN propagates through the otherwise branch
    return F.when(F.abs(c) >= F.lit(_TWO52), c).otherwise(c - c % F.lit(1.0))


def _floor_d(c):
    t = _trunc_d(c)
    return F.when(F.abs(c) >= F.lit(_TWO52), c).otherwise(
        t - F.when((c < 0) & (c % F.lit(1.0) != 0), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def _ceil_d(c):
    t = _trunc_d(c)
    return F.when(F.abs(c) >= F.lit(_TWO52), c).otherwise(
        t + F.when((c > 0) & (c % F.lit(1.0) != 0), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def _i0_build(c):
    # Abramowitz & Stegun 9.8.1 / 9.8.2 polynomial approximations
    # (|err| < 2e-7) — numpy uses a longer Chebyshev series; parity is
    # tolerance-level, documented in tests.
    ax = F.abs(c)
    t2 = (ax / F.lit(3.75)) * (ax / F.lit(3.75))
    small = (
        F.lit(1.0)
        + t2 * (F.lit(3.5156229) + t2 * (F.lit(3.0899424) + t2 * (
            F.lit(1.2067492) + t2 * (F.lit(0.2659732) + t2 * (
                F.lit(0.0360768) + t2 * F.lit(0.0045813))))))
    )
    it = F.lit(3.75) / ax
    big = (F.exp(ax) / F.sqrt(ax)) * (
        F.lit(0.39894228) + it * (F.lit(0.01328592) + it * (
            F.lit(0.00225319) + it * (F.lit(-0.00157565) + it * (
                F.lit(0.00916281) + it * (F.lit(-0.02057706) + it * (
                    F.lit(0.02635537) + it * (F.lit(-0.01647633)
                                              + it * F.lit(0.00392377))))))))
    )
    return F.when(ax <= F.lit(3.75), small).otherwise(big)


def _logaddexp_build(x, y):
    g, l = F.greatest(x, y), F.least(x, y)
    return F.when(
        (x == F.lit(-_INF)) & (y == F.lit(-_INF)), F.lit(-_INF)
    ).otherwise(g + F.log1p(F.exp(l - g)))


def _logaddexp2_build(x, y):
    g, l = F.greatest(x, y), F.least(x, y)
    ln2 = F.lit(math.log(2.0))
    return F.when(
        (x == F.lit(-_INF)) & (y == F.lit(-_INF)), F.lit(-_INF)
    ).otherwise(g + F.log1p(F.exp((l - g) * ln2)) / ln2)


def _nan_guard2(build):
    # numpy maximum/minimum propagate NaN from either side; Spark's
    # greatest/least order NaN as largest, which only matches one of
    # the two — make both explicit.
    def b(x, y):
        return F.when(F.isnan(x), x).when(F.isnan(y), y).otherwise(build(x, y))

    return b


def _copysign_build(x, y):
    # sign of y including -0.0 (1/-0.0 = -inf < 0)
    return F.when(F.lit(1.0) / y < 0, -F.abs(x)).otherwise(F.abs(x))


def _long2(build):
    def b(x, y):
        return build(x.cast("long"), y.cast("long")).cast("double")

    return b


# ---- the tables --------------------------------------------------------
# name -> Column builder. Predicates listed separately (bool vs double).

_UNARY = {
    "abs": F.abs,
    "absolute": F.abs,
    "fabs": F.abs,
    "arccos": F.acos,
    "arccosh": F.acosh,
    "arcsin": F.asin,
    "arcsinh": F.asinh,
    "arctan": F.atan,
    "arctanh": F.atanh,
    "cbrt": F.cbrt,
    "ceil": _ceil_d,
    "conj": lambda c: c + F.lit(0.0),
    "cos": F.cos,
    "cosh": F.cosh,
    "deg2rad": F.radians,
    "radians": F.radians,
    "degrees": F.degrees,
    "rad2deg": F.degrees,
    "exp": F.exp,
    "exp2": lambda c: F.pow(F.lit(2.0), c),
    "expm1": F.expm1,
    "fix": _trunc_d,
    "trunc": _trunc_d,
    "floor": _floor_d,
    "i0": _i0_build,
    "imag": lambda c: F.when(c.isNull(), c).otherwise(F.lit(0.0)),
    "log": F.log,
    "log1p": F.log1p,
    "log2": F.log2,
    "log10": F.log10,
    "nan_to_num": lambda c: (
        F.when(F.isnan(c), F.lit(0.0))
        .when(c == F.lit(_INF), F.lit(_MAXD))
        .when(c == F.lit(-_INF), F.lit(-_MAXD))
        .otherwise(c)
    ),
    "negative": lambda c: -c,
    "positive": lambda c: c + F.lit(0.0),
    "real": lambda c: c + F.lit(0.0),
    "reciprocal": lambda c: F.lit(1.0) / c,
    "rint": F.rint,
    "sign": F.signum,
    "sin": F.sin,
    "sinc": lambda c: F.when(c == F.lit(0.0), F.lit(1.0)).otherwise(
        F.sin(c * F.lit(math.pi)) / (c * F.lit(math.pi))
    ),
    "sinh": F.sinh,
    "sqrt": F.sqrt,
    "square": lambda c: c * c,
    "tan": F.tan,
    "tanh": F.tanh,
    "angle": lambda c: F.when(c < 0, F.lit(math.pi)).otherwise(F.lit(0.0)),
    "invert": lambda c: F.bitwise_not(c.cast("long")).cast("double"),
    "bitwise_not": lambda c: F.bitwise_not(c.cast("long")).cast("double"),
}

_UNARY_PRED = {
    "isnan": F.isnan,
    "isinf": lambda c: F.abs(c) == F.lit(_INF),
    "isfinite": lambda c: ~(F.isnan(c) | (F.abs(c) == F.lit(_INF))),
    "isneginf": lambda c: c == F.lit(-_INF),
    "isposinf": lambda c: c == F.lit(_INF),
    "iscomplex": lambda c: c.isNull() & c.isNotNull(),  # always false
    "isreal": lambda c: c.isNull() | c.isNotNull(),  # always true
    "signbit": lambda c: F.lit(1.0) / c < 0,  # catches -0.0
    "logical_not": lambda c: ~c.cast("boolean"),
}

_BINARY = {
    "add": lambda x, y: x + y,
    "subtract": lambda x, y: x - y,
    "multiply": lambda x, y: x * y,
    "divide": lambda x, y: x / y,
    "true_divide": lambda x, y: x / y,
    "arctan2": F.atan2,
    "copysign": _copysign_build,
    "float_power": F.pow,
    "power": F.pow,
    "floor_divide": lambda x, y: _floor_d(x / y),
    "fmod": lambda x, y: x % y,  # Spark % follows the dividend = C fmod
    "mod": lambda x, y: x - _floor_d(x / y) * y,  # numpy: divisor sign
    "remainder": lambda x, y: x - _floor_d(x / y) * y,
    "fmax": lambda x, y: (
        F.when(F.isnan(x), y).when(F.isnan(y), x).otherwise(F.greatest(x, y))
    ),
    "fmin": lambda x, y: (
        F.when(F.isnan(x), y).when(F.isnan(y), x).otherwise(F.least(x, y))
    ),
    "maximum": _nan_guard2(F.greatest),
    "minimum": _nan_guard2(F.least),
    "hypot": F.hypot,
    "ldexp": lambda x, y: x * F.pow(F.lit(2.0), y),
    "logaddexp": _logaddexp_build,
    "logaddexp2": _logaddexp2_build,
    "bitwise_and": _long2(lambda x, y: x.bitwiseAND(y)),
    "bitwise_or": _long2(lambda x, y: x.bitwiseOR(y)),
    "bitwise_xor": _long2(lambda x, y: x.bitwiseXOR(y)),
    "left_shift": _long2(
        lambda x, y: x * F.pow(F.lit(2.0), y.cast("double")).cast("long")
    ),
    "right_shift": lambda x, y: _floor_d(
        x.cast("double") / F.pow(F.lit(2.0), y.cast("double"))
    ),
}

_BINARY_PRED = {
    "equal": lambda x, y: x == y,
    "not_equal": lambda x, y: x != y,
    "greater": lambda x, y: x > y,
    "greater_equal": lambda x, y: x >= y,
    "less": lambda x, y: x < y,
    "less_equal": lambda x, y: x <= y,
    "logical_and": lambda x, y: x.cast("boolean") & y.cast("boolean"),
    "logical_or": lambda x, y: x.cast("boolean") | y.cast("boolean"),
    "logical_xor": lambda x, y: x.cast("boolean") != y.cast("boolean"),
}


def _make_unary(name, build, pred):
    def f(a):
        return _apply1(a, build, name, pred)

    f.__name__ = name
    f.__qualname__ = name
    f.__doc__ = (
        f"Elementwise numpy.{name} (reference dask/array/ufunc.py) as a "
        f"JVM Column expression — map-only, no Python at run time."
    )
    return f


def _make_binary(name, build, pred):
    def f(a, b):
        return _apply2(a, b, build, name, pred)

    f.__name__ = name
    f.__qualname__ = name
    f.__doc__ = (
        f"Elementwise numpy.{name} (reference dask/array/ufunc.py) as a "
        f"JVM Column expression — map-only, no Python at run time."
    )
    return f


for _n, _b in _UNARY.items():
    globals()[_n] = _make_unary(_n, _b, pred=False)
    __all__.append(_n)
for _n, _b in _UNARY_PRED.items():
    globals()[_n] = _make_unary(_n, _b, pred=True)
    __all__.append(_n)
for _n, _b in _BINARY.items():
    globals()[_n] = _make_binary(_n, _b, pred=False)
    __all__.append(_n)
for _n, _b in _BINARY_PRED.items():
    globals()[_n] = _make_binary(_n, _b, pred=True)
    __all__.append(_n)


# ---- tuple-returning ufuncs -------------------------------------------

def modf(a):
    """numpy.modf: (fractional, integral) parts, both carrying x's
    sign (reference dask/array/ufunc.py modf)."""
    frac = _apply1(a, lambda c: c - _trunc_d(c), "modf")
    intp = _apply1(a, _trunc_d, "modf")
    if _is_arr(a) or _is_series(a):
        return frac, intp
    return _np().modf(a)


def frexp(a):
    """numpy.frexp: x = m * 2**e with 0.5 <= |m| < 1 (reference
    dask/array/ufunc.py frexp). 0/inf/nan get exponent 0."""
    if not (_is_arr(a) or _is_series(a)):
        return _np().frexp(a)

    def e_build(c):
        return (
            F.when(
                (c == 0) | F.isnan(c) | (F.abs(c) == F.lit(_INF)), F.lit(0.0)
            ).otherwise(_floor_d(F.log2(F.abs(c))) + F.lit(1.0))
        )

    def m_build(c):
        # split 2**e into two factors: 2**1024 itself overflows double
        # (frexp(1e308) has e=1024), and 2**-1024 is subnormal
        e = e_build(c)
        h = _trunc_d(e / F.lit(2.0))
        return c / F.pow(F.lit(2.0), h) / F.pow(F.lit(2.0), e - h)

    return _apply1(a, m_build, "frexp"), _apply1(a, e_build, "frexp")


def divmod(a, b):  # noqa: A001 - matching the numpy/dask export name
    """numpy.divmod = (floor_divide, mod) (reference ufunc.py)."""
    if _is_arr(a) or _is_series(a) or _is_arr(b) or _is_series(b):
        return floor_divide(a, b), mod(a, b)  # noqa: F821 (generated)
    return _np().divmod(a, b)


# ---- bit-level ufuncs: the honest Arrow path ---------------------------

def nextafter(a, b):
    """numpy.nextafter(x, toward) — bit-level, no closed Column form;
    routes through the Arrow ``map_blocks`` kernel (reference
    dask/array/ufunc.py nextafter). ``b`` must be a scalar here."""
    if _is_arr(a):
        if not isinstance(b, (int, float)):
            raise NotImplementedError("nextafter: scalar 'toward' only")
        np = _np()
        return a.map_blocks(lambda X: np.nextafter(X, b))
    return _np().nextafter(a, b)


def spacing(a):
    """numpy.spacing — bit-level ULP distance; Arrow ``map_blocks``
    kernel (reference dask/array/ufunc.py spacing)."""
    if _is_arr(a):
        np = _np()
        return a.map_blocks(np.spacing)
    return _np().spacing(a)


def frompyfunc(fn, nin: int = 1, nout: int = 1):
    """numpy.frompyfunc analog (reference dask/array/ufunc.py
    frompyfunc): wraps an arbitrary scalar Python function as an
    array-level callable. This is the documented slow path — the
    wrapped function runs in the Arrow ``map_blocks`` kernel via
    ``np.vectorize``, not in the JVM."""
    if (nin, nout) != (1, 1):
        raise NotImplementedError("frompyfunc supports nin=1, nout=1")

    def wrapped(a):
        np = _np()
        v = np.vectorize(fn, otypes=["float64"])
        if _is_arr(a):
            return a.map_blocks(v)
        return v(a)

    wrapped.__name__ = getattr(fn, "__name__", "frompyfunc")
    return wrapped


__all__ += ["modf", "frexp", "divmod", "nextafter", "spacing", "frompyfunc"]


def array_ufunc_dispatch(self, ufunc, method, *inputs, **kwargs):
    """``__array_ufunc__`` body shared by Series/DArray/NDArray
    (reference: dask collections implement __array_ufunc__ so
    ``np.sin(x)`` builds the lazy graph instead of materializing —
    dask/array/core.py Array.__array_ufunc__). numpy calls this when
    any operand is one of our collections; we route to the
    Column-builder twin of the same name. Unsupported ufuncs/methods
    return NotImplemented so numpy raises its standard TypeError."""
    if method != "__call__" or kwargs.get("out") is not None:
        return NotImplemented
    fn = globals().get(ufunc.__name__)
    if fn is None or not callable(fn):
        return NotImplemented
    try:
        return fn(*inputs)
    except TypeError:
        return NotImplemented
