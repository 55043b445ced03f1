"""dask.array.stats parity (reference: dask/array/stats.py — ttest
family, skew, kurtosis, moment) for the 2-D DArray: every statistic is
computed per dimension (axis=0, across rows) from ONE distributed
raw-moment pass — posexplode + groupBy(dim) with avg(x^j) aggregates,
map-side partials, only d×5 scalars reach the driver.

The reference delegates p-values to scipy's distributions; scipy is
optional here the same way PyTables is for read_hdf — statistics and
degrees of freedom are always returned (exact, engine-computed), and
``pvalue`` is None unless scipy is importable.

Degenerate-input semantics follow scipy: zero-variance dims yield nan
skew/kurtosis; a zero-denominator t is ±inf by the sign of the mean
difference (nan when the difference is zero too)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

_NAN = float("nan")


def _dim_stats(arr):
    """Per-dim (n, mean, m2, m3, m4): one scan, raw moments combined
    into central moments on the driver (fine at double precision for
    the standardized ratios these feed; a two-pass demeaned variant
    would be the call for ill-conditioned data). m2 is clamped at 0 —
    catastrophic cancellation on near-constant dims can produce a tiny
    negative. All-null dims come back as (0, nan, nan, nan, nan)."""
    x = F.col("x").cast("double")
    rows = (
        arr._sdf.select(F.posexplode(F.col(arr._col)).alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count(x).alias("n"),
            F.avg(x).alias("r1"),
            F.avg(x * x).alias("r2"),
            F.avg(x * x * x).alias("r3"),
            F.avg(x * x * x * x).alias("r4"),
        )
        .orderBy("dim")
        .collect()
    )
    out = []
    for r in rows:
        if not r["n"] or r["r1"] is None:
            out.append((0, _NAN, _NAN, _NAN, _NAN))
            continue
        mu = r["r1"]
        m2 = max(r["r2"] - mu**2, 0.0)
        m3 = r["r3"] - 3 * mu * r["r2"] + 2 * mu**3
        m4 = r["r4"] - 4 * mu * r["r3"] + 6 * mu**2 * r["r2"] - 3 * mu**4
        out.append((r["n"], mu, m2, m3, m4))
    return out


def moment(arr, k: int, axis: int = 0) -> list:
    """k-th central moment per dim (reference stats.py moment), k<=4."""
    if axis != 0:
        raise ValueError("moment supports axis=0")
    if not 1 <= k <= 4:
        raise ValueError("moment supports k in 1..4")
    return [
        (0.0, None, m2, m3, m4)[k] if k > 1 else 0.0
        for (_, _, m2, m3, m4) in _dim_stats(arr)
    ]


def skew(arr, axis: int = 0, bias: bool = True) -> list:
    """Per-dim skewness g1 = m3 / m2^1.5 (reference stats.py skew;
    bias=True matches the scipy/dask default). Zero-variance → nan,
    like scipy."""
    if axis != 0 or not bias:
        raise ValueError("skew supports axis=0, bias=True")
    return [m3 / m2**1.5 if m2 > 0 else _NAN
            for (_, _, m2, m3, _) in _dim_stats(arr)]


def kurtosis(arr, axis: int = 0, fisher: bool = True) -> list:
    """Per-dim kurtosis m4/m2² (−3 when fisher). Zero-variance → nan."""
    if axis != 0:
        raise ValueError("kurtosis supports axis=0")
    return [
        m4 / m2**2 - (3.0 if fisher else 0.0) if m2 > 0 else _NAN
        for (_, _, m2, _, m4) in _dim_stats(arr)
    ]


def _t_of(diff: float, denom: float) -> float:
    """scipy-style zero-denominator handling: ±inf by the sign of the
    difference, nan when both are zero or anything is nan."""
    if math.isnan(diff) or math.isnan(denom):
        return _NAN
    if denom > 0:
        return diff / denom
    if diff == 0:
        return _NAN
    return math.copysign(float("inf"), diff)


def _pvalue_t(t: float, df: float):
    try:
        from scipy import stats as _st  # optional, like dask's scipy dep
    except ImportError:
        return None
    return float(2 * _st.t.sf(abs(t), df))


def ttest_1samp(arr, popmean: float):
    """Per-dim one-sample t-test vs ``popmean`` (reference stats.py
    ttest_1samp): list of (t, df, pvalue|None). Dims with n < 2 yield
    (nan, nan, None) — sample variance is undefined."""
    out = []
    for n, mu, m2, _, _ in _dim_stats(arr):
        if n < 2 or math.isnan(m2):
            out.append((_NAN, _NAN, None))
            continue
        var = m2 * n / (n - 1)  # sample variance
        t = _t_of(mu - popmean, math.sqrt(var / n))
        out.append((t, n - 1, _pvalue_t(t, n - 1)))
    return out


def ttest_ind(a, b, equal_var: bool = True):
    """Per-dim two-sample t-test between two DArrays of the SAME dim
    width (reference stats.py ttest_ind; Welch when equal_var=False):
    list of (t, df, pvalue|None). Dims where either side has n < 2 —
    or, for Welch, where both variances are 0 (df is 0/0) — yield
    (nan, nan, None)."""
    sa, sb = _dim_stats(a), _dim_stats(b)
    if len(sa) != len(sb):
        raise ValueError(
            f"dim width mismatch: {len(sa)} vs {len(sb)}"
        )
    out = []
    for (n1, mu1, m21, _, _), (n2, mu2, m22, _, _) in zip(sa, sb):
        if n1 < 2 or n2 < 2 or math.isnan(m21) or math.isnan(m22):
            out.append((_NAN, _NAN, None))
            continue
        v1 = m21 * n1 / (n1 - 1)
        v2 = m22 * n2 / (n2 - 1)
        if equal_var:
            df = n1 + n2 - 2
            sp = ((n1 - 1) * v1 + (n2 - 1) * v2) / df
            denom = math.sqrt(max(sp, 0.0) * (1 / n1 + 1 / n2))
        else:
            vn1, vn2 = v1 / n1, v2 / n2
            if vn1 + vn2 == 0:
                out.append((_NAN, _NAN, None))
                continue
            df = (vn1 + vn2) ** 2 / (
                vn1**2 / (n1 - 1) + vn2**2 / (n2 - 1)
            )
            denom = math.sqrt(vn1 + vn2)
        t = _t_of(mu1 - mu2, denom)
        out.append((t, df, _pvalue_t(t, df)))
    return out
