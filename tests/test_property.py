"""Property-based tests (hypothesis) for the keyless-window machinery —
the code path with the most edge-case surface (range-bucket halos,
driver-merged bucket sizing, cross-bucket carry). Mirrors the
reference's randomized parity style (dask/dataframe/tests use random
frames against pandas)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _nn(series):
    return [None if pd.isna(x) else x for x in series]


def _frame(spark, vals):
    import dask_spark as ds

    # unique, shuffled order keys; duplicate VALUES are fair game
    n = len(vals)
    order = [(i * 2654435761 + 13) % (1 << 31) for i in range(n)]
    pdf = pd.DataFrame({"t": order, "v": [float(x) for x in vals]})
    return ds.from_pandas(pdf, npartitions=min(8, n)), pdf.sort_values(
        "t", ignore_index=True
    )


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=200),
    periods=st.integers(-4, 4).filter(lambda p: p != 0),
)
def test_keyless_shift_matches_pandas(spark, vals, periods):
    from dask_spark.operators.window import shift

    f, p = _frame(spark, vals)
    got = (
        shift(f, "v", periods=periods, order_by="t")
        .compute()
        .sort_values("t", ignore_index=True)
    )
    want = p.v.shift(periods)
    assert _nn(got.v_shift) == _nn(want)


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=200),
    fn=st.sampled_from(["sum", "max", "min"]),
)
def test_keyless_cumulative_matches_pandas(spark, vals, fn):
    from dask_spark.operators.window import cumulative

    f, p = _frame(spark, vals)
    got = (
        cumulative(f, "v", fn, order_by="t")
        .compute()
        .sort_values("t", ignore_index=True)
    )
    want = getattr(p.v, f"cum{fn}")()
    assert got[f"v_cum{fn}"].tolist() == pytest.approx(want.tolist())


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=150),
    window=st.integers(2, 12),
)
def test_keyless_rolling_matches_pandas(spark, vals, window):
    f, p = _frame(spark, vals)
    got = (
        f.rolling(window, on="t")
        .mean("v")
        .compute()
        .sort_values("t", ignore_index=True)
    )
    want = p.v.rolling(window, min_periods=1).mean()
    assert got.v_roll_mean.tolist() == pytest.approx(want.tolist())


@settings(**SETTINGS)
@given(
    lt=st.lists(st.integers(0, 500), min_size=1, max_size=80, unique=True),
    rt=st.lists(st.integers(0, 500), min_size=0, max_size=15, unique=True),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    allow_exact=st.booleans(),
)
def test_keyless_merge_asof_matches_pandas(spark, lt, rt, direction,
                                           allow_exact):
    import dask_spark as ds

    left = pd.DataFrame({"t": sorted(lt), "lv": range(len(lt))})
    right = pd.DataFrame(
        {"t": pd.Series(sorted(rt), dtype="int64"),
         "rv": pd.Series([float(x) for x in rt], dtype="float64")}
    )
    got = (
        ds.from_pandas(left)
        .merge_asof(ds.from_pandas(right), on="t", direction=direction,
                    allow_exact_matches=allow_exact)
        .compute()
        .sort_values("t", ignore_index=True)
    )
    want = pd.merge_asof(left, right, on="t", direction=direction,
                         allow_exact_matches=allow_exact)
    assert _nn(got.rv) == _nn(want.rv)


@settings(**SETTINGS)
@given(
    shape=st.lists(st.integers(1, 3), min_size=1, max_size=3),
    data=st.data(),
)
def test_einsum_single_operand_matches_numpy(spark, shape, data):
    """Random inner shapes × random single-operand einsum subscripts
    (transpose / partial sums) vs np.einsum on the same tensor."""
    import numpy as np

    from dask_spark.ndarray import NDArray, einsum

    labels = "ijk"[: len(shape)]
    # random subset of labels to keep (order shuffled) — the rest sum
    keep = data.draw(st.permutations(list(labels)))
    cut = data.draw(st.integers(0, len(labels)))
    out = "".join(keep[:cut])
    sub = f"n{labels}->n{out}"

    rows, size = 4, int(np.prod(shape))
    X = np.arange(rows * size, dtype="float64").reshape(rows, *shape) % 7
    sdf = spark.createDataFrame(
        [(i, [float(v) for v in X[i].ravel()]) for i in range(rows)],
        "id bigint, block array<double>",
    )
    nd = NDArray(sdf, tuple(shape), "block", "id")
    got = np.asarray(einsum(sub, nd).compute())
    want = np.einsum(sub.replace("n", "r"), X)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-12,
                               err_msg=sub)


@settings(**SETTINGS)
@given(
    n=st.integers(1, 60),
    seed=st.integers(0, 2**31),
)
def test_permutation_property(spark, n, seed):
    """Any (n, seed): the output is a permutation of range(n) and is
    reproducible."""
    import numpy as np
    import pyspark.sql.functions as F

    from dask_spark.random import RandomState

    out = RandomState(spark, seed=seed).permutation(n)
    pdf = out._sdf.select(
        "row_id", F.element_at("values", 1).alias("v")
    ).toPandas().sort_values("row_id")
    assert list(pdf["row_id"]) == list(range(n))
    assert sorted(pdf["v"].tolist()) == [float(i) for i in range(n)]


# ---- ufunc family properties (reference dask/array/ufunc.py) -----------

@settings(**SETTINGS)
@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              width=64).filter(lambda v: abs(v) > 1e-9),
    min_size=1, max_size=50,
))
def test_ufunc_mod_identity(spark, vals):
    """x == floor_divide(x, y) * y + mod(x, y) for nonzero y, and
    fmod follows the dividend sign while mod follows the divisor."""
    import numpy as np

    import dask_spark as ds
    import dask_spark.array as da

    y = 7.25
    f = ds.from_pandas(pd.DataFrame({"x": vals}))
    fd = da.floor_divide(f.x, y)
    md = da.mod(f.x, y)
    recon = [
        a[0] * y + b[0]
        for a, b in zip(
            fd._frame._sdf.select(fd._expr.alias("v")).collect(),
            md._frame._sdf.select(md._expr.alias("v")).collect(),
        )
    ]
    assert np.allclose(recon, vals, rtol=1e-9, atol=1e-6)


@settings(**SETTINGS)
@given(vals=st.lists(
    st.floats(min_value=1e-300, max_value=1e300, allow_nan=False,
              width=64),
    min_size=1, max_size=50,
))
def test_ufunc_frexp_reconstructs(spark, vals):
    """m * 2**e == x with 0.5 <= |m| < 1 across the full double
    range (the split-factor path guards 2**±1024 overflow)."""
    import numpy as np

    import dask_spark as ds
    import dask_spark.array as da

    f = ds.from_pandas(pd.DataFrame({"x": vals}))
    m, e = da.frexp(f.x)
    mv = [r[0] for r in m._frame._sdf.select(m._expr.alias("v")).collect()]
    ev = [r[0] for r in e._frame._sdf.select(e._expr.alias("v")).collect()]
    nm, ne = np.frexp(np.array(vals))
    assert np.allclose(mv, nm) and np.allclose(ev, ne)
    assert all(0.5 <= abs(x) < 1.0 for x in mv)


@settings(**SETTINGS)
@given(vals=st.lists(
    st.floats(min_value=-700, max_value=700, allow_nan=False, width=64),
    min_size=2, max_size=40,
))
def test_ufunc_logaddexp_stable(spark, vals):
    """logaddexp never overflows where naive log(exp+exp) would, and
    matches numpy to 1e-12 relative."""
    import numpy as np

    import dask_spark as ds
    import dask_spark.array as da

    xs = vals
    ys = list(reversed(vals))
    f = ds.from_pandas(pd.DataFrame({"x": xs, "y": ys}))
    la = da.logaddexp(f.x, f.y)
    got = [r[0] for r in la._frame._sdf.select(la._expr.alias("v")).collect()]
    exp = np.logaddexp(np.array(xs), np.array(ys))
    assert np.allclose(got, exp, rtol=1e-12)


def _ref_substring_dedup(texts, w=3, keep="all"):
    """Brute-force reference for substring_dedup: stride-1 w-token
    windows, corpus-wide counts, merge duplicated positions to maximal
    spans, strip covered tokens."""
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    occ = {}
    for i, ts in toks.items():
        for p in range(max(0, len(ts) - w + 1)):
            occ.setdefault(" ".join(ts[p:p + w]), []).append((i, p))
    out = {}
    for i, ts in toks.items():
        dup = []
        for p in range(max(0, len(ts) - w + 1)):
            key = " ".join(ts[p:p + w])
            hits = occ[key]
            if len(hits) > 1 and not (
                keep == "one" and min(hits) == (i, p)
            ):
                dup.append(p)
        covered = set()
        for p in dup:
            covered.update(range(p, p + w))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=0,
                 max_size=12).map(" ".join),
        min_size=1, max_size=10,
    ),
    keep=st.sampled_from(["all", "one"]),
)
def test_substring_dedup_matches_bruteforce(spark, docs, keep):
    """substring_dedup(w=3) over random tiny-alphabet corpora (heavy
    window collisions by construction, incl. within-doc repeats and
    empty docs) matches a brute-force python reference row for row in
    BOTH keep modes."""
    import dask_spark as ds
    from dask_spark.operators.dedup import substring_dedup

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = (
        substring_dedup(ds.from_pandas(pdf), window_tokens=3, keep=keep)
        .compute().set_index("doc_id").sort_index()
    )
    want = _ref_substring_dedup(docs, w=3, keep=keep)
    assert len(got) == len(docs)
    for i in range(len(docs)):
        kt, nt, nr = want[i]
        assert got.loc[i, "kept_text"] == kt, (i, docs, keep)
        assert got.loc[i, "n_tokens"] == nt
        assert got.loc[i, "n_removed"] == nr


def _ref_dsir(corpus, target, B=64, alpha=1.0):
    """Independent python reference for dsir_scores (md5 mode)."""
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    def hist(texts):
        ct = {}
        for t in texts:
            for tok in t.lower().split():
                b = bucket(tok)
                ct[b] = ct.get(b, 0) + 1
        return ct, sum(ct.values())

    ct_t, tt = hist(target)
    ct_r, tr = hist(corpus)
    lam = [
        round(
            math.log((ct_t.get(b, 0) + alpha) / (tt + alpha * B))
            - math.log((ct_r.get(b, 0) + alpha) / (tr + alpha * B)), 9)
        for b in range(B)
    ]
    out = []
    for t in corpus:
        toks = t.lower().split()
        acc = 0.0
        for b in sorted(bucket(tok) for tok in toks):
            acc = acc + lam[b]
        # UNROUNDED: the engine's final F.round follows Spark's
        # shortest-decimal HALF_UP, which differs from python round()
        # exactly at .xxxxx5 boundaries — the caller asserts the
        # engine's rounded value is within half a 6dp unit of this
        out.append((len(toks), acc if toks else 0.0))
    return out


@settings(**SETTINGS)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee ff".split()),
                 min_size=0, max_size=10).map(" ".join),
        min_size=1, max_size=8,
    ),
    tsel=st.integers(0, 3),
)
def test_dsir_scores_match_bruteforce(spark, corpus, tsel):
    """dsir_scores (md5 mode) matches an independent python reference
    bit-for-bit on random corpora — buckets, smoothing, 9-dp λ round,
    sorted-order fold, and the 6-dp final round."""
    import dask_spark as ds
    from dask_spark.operators.mixing import dsir_scores

    target = [corpus[tsel % len(corpus)], "aa bb"]
    cf = ds.from_pandas(pd.DataFrame(
        {"doc_id": range(len(corpus)), "text": corpus}))
    tf = ds.from_pandas(pd.DataFrame(
        {"doc_id": range(len(target)), "text": target}))
    got = (
        dsir_scores(cf, tf, n_buckets=64)
        .compute().set_index("doc_id").sort_index()
    )
    want = _ref_dsir(corpus, target, B=64)
    for i, (nt, lw) in enumerate(want):
        assert got.loc[i, "n_tokens"] == nt, (i, corpus)
        # engine value is round(lw, 6) under Spark's rounding rule —
        # half a 6dp unit of slack covers the boundary cases where
        # python round() and Spark's shortest-decimal HALF_UP differ
        assert abs(got.loc[i, "dsir_logweight"] - lw) <= 5.001e-7, \
            (i, corpus)


# ---------------- r12 binned escalation modes: invariants -------------------


@settings(**SETTINGS)
@given(
    ref=st.lists(st.integers(-30, 30), min_size=2, max_size=120),
    cur=st.lists(st.integers(-30, 30), min_size=2, max_size=120),
    bins=st.sampled_from([4, 16, 64]),
)
def test_binned_ks_never_exceeds_exact(spark, ref, cur, bins):
    """For ANY two multisets and ANY bin count, the binned D evaluates
    the exact CDF difference on a SUBSET of points — so d_stat_binned
    <= d_stat_exact, and with bins > value range they are equal."""
    from dask_spark.operators.monitor import ks_drift

    def mk(vals):
        return spark.createDataFrame([(float(v),) for v in vals],
                                     "x double")

    exact = ks_drift(mk(ref), mk(cur), "x").to_spark().first()
    binned = ks_drift(mk(ref), mk(cur), "x", exact=False,
                      bins=bins).to_spark().first()
    assert binned["d_stat"] <= exact["d_stat"] + 1e-12
    wide = ks_drift(mk(ref), mk(cur), "x", exact=False,
                    bins=4096).to_spark().first()
    assert wide["d_num"] == exact["d_num"]


@settings(**SETTINGS)
@given(
    xs=st.lists(st.integers(0, 40), min_size=3, max_size=120),
)
def test_binned_spearman_bounds_and_convergence(spark, xs):
    """rho stays in [-1, 1]; on integer-spaced data with bins > range,
    binned == exact bit-for-bit; a strictly monotone map preserves
    exact rho == 1 against itself."""
    from dask_spark.operators.reductions import spearman_corr

    ys = [(x * 3 + 7) % 41 for x in xs]
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double",
    )
    exact = spearman_corr(df, "x", "y").to_spark().first()
    fine = spearman_corr(df, "x", "y", exact=False,
                         bins=65536).to_spark().first()
    assert fine["rho"] == exact["rho"] and fine["n"] == exact["n"]
    if exact["rho"] is not None:
        assert -1.0 <= exact["rho"] <= 1.0
    mono = spark.createDataFrame(
        [(float(x), float(2 * x + 1)) for x in sorted(set(xs))],
        "x double, y double",
    )
    if len(set(xs)) >= 2:
        assert spearman_corr(mono, "x", "y", exact=False,
                             bins=65536).to_spark().first()["rho"] == 1.0


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(0, 1000), min_size=2, max_size=100),
)
def test_binned_gini_in_range_and_converges(spark, vals):
    """Gini stays in [0, 1); fine bins reproduce exact to 1e-9 (the
    block-mean formula degenerates to the rank formula when every
    per-key total has its own bucket)."""
    from dask_spark.operators.monitor import gini_coefficient

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)],
        "k bigint, v double",
    )
    exact = gini_coefficient(df, "v", "k").to_spark().first()
    fine = gini_coefficient(df, "v", "k", exact=False,
                            bins=1 << 21).to_spark().first()
    if exact["gini"] is None:
        assert fine["gini"] is None
    else:
        assert 0.0 <= exact["gini"] < 1.0
        assert abs(fine["gini"] - exact["gini"]) < 1e-9
    assert fine["n_keys"] == exact["n_keys"]
