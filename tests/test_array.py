"""dask.array parity via the DArray wrapper (reference:
dask/array/core.py)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def arr(tables, pdf_tables):
    import dask_spark as ds

    M = np.stack(pdf_tables["embeddings"].embedding.values)
    da = ds.DArray.from_frame(tables["embeddings"], "embedding", id_col="vec_id")
    return M, da


def test_elementwise_and_scalar_ops(arr):
    M, da = arr
    out = ((da * 2.0) + 1.0).compute()
    assert np.allclose(out, M * 2 + 1, atol=1e-5)
    sq = da.map(lambda x: x * x).compute()
    assert np.allclose(sq, M * M, atol=1e-4)


def test_axis1_reductions(arr):
    M, da = arr
    s = da.sum(axis=1).compute().sort_values("vec_id")
    import pandas as pd

    pdf = da.to_frame().compute()
    rowsum = np.array([sum(v) for v in pdf.embedding])
    joined = pd.DataFrame({"vec_id": pdf.vec_id, "want": rowsum}).merge(
        s, on="vec_id"
    )
    assert np.allclose(joined["sum"], joined["want"], atol=1e-4)
    am = da.argmax(axis=1).compute().merge(
        pd.DataFrame(
            {"vec_id": pdf.vec_id,
             "want": [int(np.argmax(v)) for v in pdf.embedding]}
        ),
        on="vec_id",
    )
    assert (am.argmax == am.want).all()


def test_axis0_reductions(arr):
    M, da = arr
    assert np.allclose(da.mean(axis=0), M.mean(axis=0), atol=1e-6)
    assert np.allclose(da.sum(axis=0), M.sum(axis=0), atol=1e-4)
    assert np.allclose(da.std(axis=0), M.std(axis=0), atol=1e-6)


def test_dot_and_matmul(arr):
    M, da = arr
    d = M.shape[1]
    v = np.arange(d) / d
    got = da.dot(list(v)).compute()
    import pandas as pd

    pdf = da.to_frame().compute()
    want = pd.DataFrame({"vec_id": pdf.vec_id, "want": M @ v})
    j = got.merge(want, on="vec_id")
    assert np.allclose(j["dot"], j["want"], atol=1e-4)
    W = np.random.RandomState(1).randn(d, 3)
    mm = da.matmul(W.tolist()).compute()
    assert mm.shape == (M.shape[0], 3)
    assert np.allclose(np.sort(mm, axis=0), np.sort(M @ W, axis=0), atol=1e-3)


def test_tsqr_reconstruct_orthogonal(spark):
    """tsqr (reference dask/array/linalg.py:60 + its test_linalg
    test_tsqr properties): Q@R == X, QᵀQ == I, R upper-triangular with
    non-negative diagonal — across multiple partitions."""
    import numpy as np
    import pyspark.sql.functions as F

    from dask_spark.array import DArray

    rng = np.random.RandomState(7)
    X = rng.randn(500, 6)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "rid bigint, vec array<double>",
    ).repartition(8)
    arr = DArray(sdf, "vec", "rid")
    Q, R = arr.tsqr()

    assert R.shape == (6, 6)
    assert np.allclose(R, np.triu(R)), "R not upper triangular"
    assert (np.diag(R) >= 0).all(), "sign fix failed"

    rows = Q._sdf.orderBy("rid").collect()
    Qm = np.array([list(r["vec"]) for r in rows])
    assert np.allclose(Qm.T @ Qm, np.eye(6), atol=1e-8), "Q not orthonormal"
    assert np.allclose(Qm @ R, X, atol=1e-8), "Q@R != X"


def test_svd_tall_skinny(spark):
    import numpy as np

    from dask_spark.array import DArray

    rng = np.random.RandomState(11)
    X = rng.randn(300, 5)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "rid bigint, vec array<double>",
    ).repartition(6)
    U, s, Vt = DArray(sdf, "vec", "rid").svd()
    rows = U._sdf.orderBy("rid").collect()
    Um = np.array([list(r["vec"]) for r in rows])
    assert np.all(np.diff(s) <= 0), "singular values not descending"
    assert np.allclose(sorted(s), sorted(np.linalg.svd(X)[1]), atol=1e-8)
    assert np.allclose(Um.T @ Um, np.eye(5), atol=1e-8), "U not orthonormal"
    assert np.allclose(Um @ np.diag(s) @ Vt, X, atol=1e-8), "USVt != X"


def test_to_series_rename_and_rechunk_noop(spark):
    import pyspark.sql.functions as F

    from dask_spark.array import DArray

    sdf = spark.createDataFrame(
        [(i, [float(i), 2.0]) for i in range(10)],
        "rid bigint, vec array<double>",
    ).repartition(4)
    arr = DArray(sdf, "vec", "rid")
    s = arr.to_series(name="renamed")
    assert s._name == "renamed"
    assert arr.rechunk(arr.npartitions) is arr  # no-op, no shuffle


def test_concatenate_axis1_misaligned_raises(spark):
    import pytest

    from dask_spark.array import DArray, concatenate

    a = DArray(
        spark.createDataFrame(
            [(i, [1.0]) for i in range(5)], "rid bigint, v array<double>"
        ),
        "v", "rid",
    )
    b = DArray(
        spark.createDataFrame(
            [(i, [2.0]) for i in range(4)], "rid bigint, w array<double>"
        ),
        "w", "rid",
    )
    with pytest.raises(Exception, match="misaligned|MISALIGNED|USER_RAISED"):
        concatenate([a, b], axis=1).compute()

    ok = DArray(
        spark.createDataFrame(
            [(i, [2.0, 3.0]) for i in range(5)], "rid bigint, w array<double>"
        ),
        "w", "rid",
    )
    got = concatenate([a, ok], axis=1)
    assert got.compute().shape == (5, 3)


def test_map_blocks(spark):
    """map_blocks: per-partition ndarray transform, row-aligned, with
    optional block info; row-count changes must raise."""
    import numpy as np
    import pytest

    from dask_spark.array import DArray

    X = np.arange(40, dtype="float64").reshape(20, 2)
    sdf = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(X)],
        "rid bigint, vec array<double>",
    ).repartition(4)
    arr = DArray(sdf, "vec", "rid")

    centered = arr.map_blocks(lambda M: M - M.mean(axis=0))
    got = {r["rid"]: list(r["vec"]) for r in centered._sdf.collect()}
    assert len(got) == 20  # row-aligned across 4 blocks

    widened = arr.map_blocks(lambda M: np.hstack([M, M.sum(1, keepdims=True)]))
    assert len(widened.compute()[0]) == 3  # column count may change

    info_seen = arr.map_blocks(
        lambda M, info: M * 0 + info["rows"], with_info=True
    ).compute()
    assert info_seen.shape == (20, 2)

    with pytest.raises(Exception, match="row count"):
        arr.map_blocks(lambda M: M[:1]).compute()


def test_lstsq_recovers_coefficients(spark):
    """lstsq via tsqr (reference dask/array/linalg.py lstsq): recover
    known coefficients from a noisy overdetermined system."""
    import numpy as np

    from dask_spark.array import DArray
    from dask_spark.frame import DaskFrame

    rng = np.random.RandomState(5)
    X = rng.randn(800, 4)
    beta = np.array([2.0, -1.0, 0.5, 3.0])
    y = X @ beta + rng.randn(800) * 0.01
    rows = [
        (i, [float(v) for v in X[i]], float(y[i])) for i in range(800)
    ]
    sdf = spark.createDataFrame(rows, "rid bigint, vec array<double>, y double")
    arr = DArray(sdf.select("rid", "vec"), "vec", "rid")
    got = arr.lstsq(DaskFrame(sdf.select("rid", "y")), "y")
    want = np.linalg.lstsq(X, y, rcond=None)[0]
    assert np.allclose(got, want, atol=1e-8)
    assert np.allclose(got, beta, atol=0.01)


def test_solve_inv_cholesky(spark):
    """solve/inv/cholesky (reference dask/array/linalg.py:1208,1268,
    1295): exact square solve, A@inv(A)=I, L@Lt reconstructions."""
    import numpy as np

    from dask_spark.array import DArray
    from dask_spark.frame import DaskFrame

    rng = np.random.RandomState(11)
    d = 5
    A = rng.randn(d, d) + np.eye(d) * 3  # well-conditioned square
    xs = rng.randn(d)
    b = A @ xs
    rows = [(i, [float(v) for v in A[i]], float(b[i])) for i in range(d)]
    sdf = spark.createDataFrame(rows, "rid bigint, vec array<double>, b double")
    arr = DArray(sdf.select("rid", "vec"), "vec", "rid")

    # exact square solve
    got = arr.solve(DaskFrame(sdf.select("rid", "b")), "b")
    assert np.allclose(got, xs, atol=1e-8)

    # inverse: returned transposed, row-aligned; A @ inv(A) == I
    invT_rows = arr.inv()._sdf.orderBy("rid").collect()
    invT = np.array([list(r["vec"]) for r in invT_rows])
    assert np.allclose(A @ invT.T, np.eye(d), atol=1e-8)

    # singular matrix raises
    S = np.zeros((3, 3))
    ssdf = spark.createDataFrame(
        [(i, [0.0, 0.0, 0.0]) for i in range(3)], "rid bigint, vec array<double>"
    )
    with pytest.raises(Exception):
        DArray(ssdf, "vec", "rid").inv()

    # cholesky of the gram matrix of a TALL array, multi-partition
    X = rng.randn(400, 6)
    xsdf = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(400)],
        "rid bigint, vec array<double>",
    ).repartition(8)
    tall = DArray(xsdf, "vec", "rid")
    L = tall.cholesky()  # of='gram'
    assert np.allclose(L, np.tril(L)), "not lower triangular"
    assert (np.diag(L) >= 0).all()
    assert np.allclose(L @ L.T, X.T @ X, atol=1e-8)

    # cholesky of an explicit SPD matrix (of='self')
    SPD = X[:6].T @ X[:6] + np.eye(6)
    psdf = spark.createDataFrame(
        [(i, [float(v) for v in SPD[i]]) for i in range(6)],
        "rid bigint, vec array<double>",
    )
    L2 = DArray(psdf, "vec", "rid").cholesky(of="self")
    assert np.allclose(L2 @ L2.T, SPD, atol=1e-10)


def test_fancy_and_boolean_row_indexing(arr):
    import pyspark.sql.functions as F

    M, da = arr
    # fancy: positions in vec_id order
    sub = da[[0, 3, 5]].to_frame().compute().sort_values("vec_id")
    ids = sorted(da.to_frame().compute().vec_id)
    assert list(sub.vec_id) == [ids[0], ids[3], ids[5]]
    # boolean mask: predicate Column over the array's frame
    masked = da[F.col("vec_id") % 2 == 0].to_frame().compute()
    assert all(v % 2 == 0 for v in masked.vec_id)
    assert len(masked) == sum(1 for v in ids if v % 2 == 0)


def test_fft_matches_numpy(arr):
    M, da = arr
    got = da.fft().compute().sort_values("vec_id")
    pdf = da.to_frame().compute().sort_values("vec_id")
    X = np.array(pdf.embedding.tolist(), dtype="float64")
    C = np.fft.fft(X, axis=1)
    R = np.array(got.fft_re.tolist())
    I = np.array(got.fft_im.tolist())
    assert np.allclose(R, C.real, atol=1e-8)
    assert np.allclose(I, C.imag, atol=1e-8)


def test_cumsum_cumprod_axis1(arr):
    M, da = arr
    got = da.cumsum(axis=1).compute()
    assert np.allclose(got, np.cumsum(M, axis=1), atol=1e-6)
    # cumprod on |values| <= 1-ish stays finite
    small = da.map(lambda x: x / 10.0)
    gotp = small.cumprod(axis=1).compute()
    assert np.allclose(gotp, np.cumprod(M / 10.0, axis=1), atol=1e-8)
    with pytest.raises(ValueError):
        da.cumsum(axis=0)


def test_small_array_surface(arr):
    M, da = arr
    n, d = da.shape
    assert (n, d) == M.shape and da.ndim == 2 and da.size == n * d
    assert da.dtype in ("float", "double")
    assert da.nbytes > 0

    r = da.round(1).compute()
    assert np.allclose(r, np.round(M, 1), atol=1e-9)
    c = da.clip(-0.1, 0.1).compute()
    assert np.allclose(c, np.clip(M, -0.1, 0.1), atol=1e-9)

    import pandas as pd

    pdf = da.to_frame().compute()
    am = da.argmin(axis=1).compute().merge(
        pd.DataFrame(
            {"vec_id": pdf.vec_id,
             "want": [int(np.argmin(v)) for v in pdf.embedding]}
        ),
        on="vec_id",
    )
    assert (am.argmin == am.want).all()

    pr = da.prod(axis=1).compute().merge(
        pd.DataFrame(
            {"vec_id": pdf.vec_id,
             "want": [float(np.prod(v)) for v in pdf.embedding]}
        ),
        on="vec_id",
    )
    assert np.allclose(pr["prod"], pr.want, rtol=1e-6, atol=1e-30)

    v = da.var(axis=0)
    assert np.allclose(v, M.var(axis=0, ddof=1), atol=1e-4)

    tk = da.topk(3).compute()
    want = -np.sort(-M, axis=1)[:, :3]
    assert np.allclose(np.sort(tk), np.sort(want), atol=1e-6)


def test_percentile_axis0(spark):
    import numpy as np

    import dask_spark as ds

    import pandas as pd

    from dask_spark.array import DArray

    rng = np.random.RandomState(7)
    data = rng.randn(101, 4)
    pdf = pd.DataFrame({"vec": [r.tolist() for r in data]})
    arr = DArray(ds.from_pandas(pdf).to_spark(), "vec")
    got = arr.percentile(0.5)
    want = np.percentile(data, 50, axis=0)
    assert np.allclose(got, want, atol=1e-9)
    approx = arr.percentile(0.5, exact=False)
    assert np.allclose(approx, want, atol=0.2)  # sketch: loose bound


def test_cov_corrcoef_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.array import DArray

    rng = np.random.RandomState(11)
    data = rng.randn(300, 5) @ rng.randn(5, 5)  # correlated components
    pdf = pd.DataFrame({"vec": [r.tolist() for r in data]})
    arr = DArray(ds.from_pandas(pdf, npartitions=4).to_spark(), "vec")
    assert np.allclose(arr.cov(ddof=1), np.cov(data, rowvar=False), atol=1e-9)
    assert np.allclose(arr.corrcoef(), np.corrcoef(data, rowvar=False), atol=1e-9)


def test_routines_2d_parity(spark):
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.array import DArray

    rng = np.random.RandomState(3)
    data = np.round(rng.randn(40, 6), 3)
    data[5, 2] = 0.0  # exercise any/all/count_nonzero
    pdf = pd.DataFrame({"rid": range(40), "vec": [r.tolist() for r in data]})
    arr = DArray(ds.from_pandas(pdf, npartitions=3).to_spark(), "vec", "rid")

    def col(df, name):
        p = df.compute().sort_values("rid")
        return np.array(p[name].tolist())

    assert np.allclose(col(arr.ptp(), "ptp"), data.ptp(axis=1))
    w = [1.0, 2.0, 0.5, 1.5, 1.0, 3.0]
    assert np.allclose(col(arr.average(w), "average"),
                       np.average(data, axis=1, weights=w))
    assert np.allclose(col(arr.median(), "median"), np.median(data, axis=1))
    assert np.allclose(col(arr.count_nonzero(), "count_nonzero"),
                       np.count_nonzero(data, axis=1))
    assert (col(arr.any(), "any") == data.astype(bool).any(axis=1)).all()
    assert (col(arr.all(), "all") == data.astype(bool).all(axis=1)).all()

    d1 = np.array(arr.diff().to_frame().compute().sort_values("rid")["vec"].tolist())
    assert np.allclose(d1, np.diff(data, axis=1))
    d2 = np.array(arr.diff(2).to_frame().compute().sort_values("rid")["vec"].tolist())
    assert np.allclose(d2, np.diff(data, n=2, axis=1))

    for s in (0, 1, -2, 7):
        r = np.array(arr.roll(s).to_frame().compute().sort_values("rid")["vec"].tolist())
        assert np.allclose(r, np.roll(data, s, axis=1)), s

    assert arr.unique() == sorted(np.unique(data).tolist())

    # nan-safe reductions
    nd = data.copy()
    nd[1, 1] = np.nan
    npdf = pd.DataFrame({"rid": range(40), "vec": [r.tolist() for r in nd]})
    narr = DArray(ds.from_pandas(npdf).to_spark(), "vec", "rid")
    assert np.allclose(col(narr.nansum(), "nansum"), np.nansum(nd, axis=1))
    assert np.allclose(col(narr.nanmean(), "nanmean"), np.nanmean(nd, axis=1))

    mask = np.array(arr.isin([0.0, data[0, 0]]).to_frame().compute()
                    .sort_values("rid")["vec"].tolist())
    assert (mask == np.isin(data, [0.0, data[0, 0]])).all()


def test_norm_orders(spark):
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.array import DArray

    rng = np.random.RandomState(5)
    data = rng.randn(30, 4)
    pdf = pd.DataFrame({"rid": range(30), "vec": [r.tolist() for r in data]})
    arr = DArray(ds.from_pandas(pdf).to_spark(), "vec", "rid")

    def col(df):
        return np.array(df.compute().sort_values("rid")["norm"].tolist())

    assert np.allclose(col(arr.norm()), np.linalg.norm(data, axis=1))
    assert np.allclose(col(arr.norm(1)), np.linalg.norm(data, 1, axis=1))
    assert np.allclose(col(arr.norm("inf")),
                       np.linalg.norm(data, np.inf, axis=1))
    assert np.allclose(col(arr.norm(3)),
                       (np.abs(data) ** 3).sum(axis=1) ** (1 / 3))


def test_stats_module_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    import dask_spark as ds
    from dask_spark.array import DArray
    from dask_spark.functions import stats as dst

    rng = np.random.RandomState(9)
    a_np = rng.randn(200, 3) * [1.0, 2.0, 0.5] + [0.0, 1.0, -1.0]
    b_np = rng.randn(150, 3)

    def arr(x):
        return DArray(
            ds.from_pandas(
                pd.DataFrame({"v": [r.tolist() for r in x]})
            ).to_spark(),
            "v",
        )

    a, b = arr(a_np), arr(b_np)

    m2 = np.mean((a_np - a_np.mean(0)) ** 2, axis=0)
    m3 = np.mean((a_np - a_np.mean(0)) ** 3, axis=0)
    m4 = np.mean((a_np - a_np.mean(0)) ** 4, axis=0)
    assert np.allclose(dst.moment(a, 2), m2, atol=1e-9)
    assert np.allclose(dst.skew(a), m3 / m2**1.5, atol=1e-9)
    assert np.allclose(dst.kurtosis(a), m4 / m2**2 - 3, atol=1e-9)

    # one-sample t vs hand formula
    got = dst.ttest_1samp(a, 0.0)
    n = len(a_np)
    want_t = a_np.mean(0) / np.sqrt(a_np.var(0, ddof=1) / n)
    assert np.allclose([t for t, _, _ in got], want_t, atol=1e-9)
    assert all(df == n - 1 for _, df, _ in got)

    # two-sample pooled and Welch t vs hand formulas
    for equal_var in (True, False):
        got = dst.ttest_ind(a, b, equal_var=equal_var)
        v1, v2 = a_np.var(0, ddof=1), b_np.var(0, ddof=1)
        n1, n2 = len(a_np), len(b_np)
        if equal_var:
            sp = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
            want = (a_np.mean(0) - b_np.mean(0)) / np.sqrt(sp * (1 / n1 + 1 / n2))
        else:
            want = (a_np.mean(0) - b_np.mean(0)) / np.sqrt(v1 / n1 + v2 / n2)
        assert np.allclose([t for t, _, _ in got], want, atol=1e-9)


def test_stats_degenerate_inputs(spark):
    import math

    import pandas as pd

    import dask_spark as ds
    from dask_spark.array import DArray
    from dask_spark.functions import stats as dst

    # constant dim (zero variance, incl. FP-cancellation territory),
    # plus a normal dim
    rows = [[0.5, float(i)] for i in range(50)]
    arr = DArray(
        ds.from_pandas(pd.DataFrame({"v": rows})).to_spark(), "v"
    )
    sk = dst.skew(arr)
    assert math.isnan(sk[0]) and not math.isnan(sk[1])
    ku = dst.kurtosis(arr)
    assert math.isnan(ku[0])
    # zero-variance t: sign follows the mean difference
    t_lo = dst.ttest_1samp(arr, 5.0)[0][0]
    t_hi = dst.ttest_1samp(arr, -5.0)[0][0]
    assert t_lo == float("-inf") and t_hi == float("inf")
    assert math.isnan(dst.ttest_1samp(arr, 0.5)[0][0])

    # width mismatch raises
    narrow = DArray(
        ds.from_pandas(pd.DataFrame({"v": [[1.0], [2.0]]})).to_spark(), "v"
    )
    import pytest
    with pytest.raises(ValueError):
        dst.ttest_ind(arr, narrow)
    # n < 2 → nan row, not a crash
    single = DArray(
        ds.from_pandas(pd.DataFrame({"v": [[1.0, 2.0]]})).to_spark(), "v"
    )
    assert all(math.isnan(t) for t, _, _ in dst.ttest_1samp(single, 0.0))
    # Welch both-constant → nan, not 0/0
    const2 = DArray(
        ds.from_pandas(
            pd.DataFrame({"v": [[0.5, 1.0]] * 10})
        ).to_spark(), "v"
    )
    w = dst.ttest_ind(arr, const2, equal_var=False)
    assert math.isnan(w[0][0])


def test_lu_plu_properties(spark):
    """lu (reference: dask/array/linalg.py:978 + test_linalg test_lu):
    a = p@l@u, l unit-lower, u upper, p a permutation."""
    import numpy as np

    from dask_spark.array import DArray

    rng = np.random.RandomState(3)
    A = rng.randn(8, 8)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(A)],
        "rid bigint, vec array<double>",
    ).repartition(4)
    P, L, U = DArray(sdf, "vec", "rid").lu()
    assert np.allclose(P @ L @ U, A, atol=1e-10)
    assert np.allclose(L, np.tril(L)) and np.allclose(np.diag(L), 1.0)
    assert np.allclose(U, np.triu(U))
    assert np.allclose(P @ P.T, np.eye(8))
    assert set(np.abs(P).sum(0)) == {1.0} and set(np.abs(P).sum(1)) == {1.0}


def test_solve_triangular(spark):
    """solve_triangular (reference: dask/array/linalg.py:1114):
    forward and back substitution vs numpy solve, vector and matrix
    rhs, and the DArray-factor form."""
    import numpy as np

    from dask_spark.array import DArray, solve_triangular

    rng = np.random.RandomState(5)
    L = np.tril(rng.randn(6, 6)) + 6 * np.eye(6)
    U = L.T
    b = rng.randn(6)
    B = rng.randn(6, 3)
    np.testing.assert_allclose(
        solve_triangular(L, b, lower=True), np.linalg.solve(L, b),
        rtol=1e-10)
    np.testing.assert_allclose(
        solve_triangular(U, B, lower=False), np.linalg.solve(U, B),
        rtol=1e-10)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(L)],
        "rid bigint, vec array<double>",
    )
    np.testing.assert_allclose(
        solve_triangular(DArray(sdf, "vec", "rid"), b, lower=True),
        np.linalg.solve(L, b), rtol=1e-10)
    with pytest.raises(np.linalg.LinAlgError):
        solve_triangular(np.zeros((3, 3)), np.ones(3), lower=True)


def test_svd_compressed(spark):
    """svd_compressed (reference: dask/array/linalg.py:746 + its
    test_linalg compression tests): on a matrix of known low rank the
    randomized SVD recovers the spectrum and the reconstruction; U is
    distributed and has orthonormal columns."""
    import numpy as np

    from dask_spark.array import DArray

    rng = np.random.RandomState(11)
    # rank-4 (600, 20) matrix + tiny noise
    X = rng.randn(600, 4) @ rng.randn(4, 20)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "rid bigint, vec array<double>",
    ).repartition(8)
    arr = DArray(sdf, "vec", "rid")
    U, s, Vt = arr.svd_compressed(k=4, n_power_iter=1, seed=1)
    assert s.shape == (4,) and Vt.shape == (4, 20)
    exact = np.linalg.svd(X, compute_uv=False)
    np.testing.assert_allclose(s, exact[:4], rtol=1e-6)
    rows = U._sdf.orderBy("rid").collect()
    Um = np.array([list(r["vec"]) for r in rows])
    np.testing.assert_allclose(Um.T @ Um, np.eye(4), atol=1e-8)
    np.testing.assert_allclose(
        Um @ np.diag(s) @ Vt, X, atol=1e-6 * np.abs(X).max())
    # determinism for a fixed seed
    _, s2, _ = arr.svd_compressed(k=4, n_power_iter=1, seed=1)
    np.testing.assert_array_equal(s, s2)


def test_qr_dispatch_tall_and_short_fat(spark):
    """qr (reference: dask/array/linalg.py qr → tsqr | sfqr): tall
    inputs route to the distributed TSQR (Q a DArray); short-fat
    inputs (rows < dim) to the driver QR — both reconstruct and both
    sign-fixed (non-negative R diagonal)."""
    import numpy as np

    from dask_spark.array import DArray

    rng = np.random.RandomState(2)

    def darr(X, parts=4):
        sdf = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(X)],
            "rid bigint, vec array<double>",
        ).repartition(parts)
        return DArray(sdf, "vec", "rid")

    # tall: distributed
    Xt = rng.randn(200, 5)
    Q, R = darr(Xt).qr()
    assert isinstance(Q, DArray) and R.shape == (5, 5)
    assert (np.diag(R) >= 0).all()

    # short-fat: driver numpy path
    Xs = rng.randn(4, 9)
    Q, R = darr(Xs, parts=2).qr()
    assert isinstance(Q, np.ndarray) and Q.shape == (4, 4)
    assert R.shape == (4, 9)
    assert np.allclose(Q @ R, Xs, atol=1e-10)
    assert np.allclose(Q.T @ Q, np.eye(4), atol=1e-10)
    assert (np.diag(R) >= 0).all()
    assert np.allclose(R[:, :4], np.triu(R[:, :4]))


def test_creation_functions(spark):
    """da creation family (reference: dask/array/creation.py):
    arange/linspace/ones/zeros/full/eye/_like — all map-only plans."""
    import numpy as np

    import dask_spark.array as da

    a = da.arange(10)
    np.testing.assert_allclose(
        sorted(a.compute().ravel()), np.arange(10.0))
    a2 = da.arange(3, 12, 2)
    np.testing.assert_allclose(
        sorted(a2.compute().ravel()), np.arange(3.0, 12.0, 2.0))

    l = da.linspace(0, 1, 11)
    np.testing.assert_allclose(sorted(l.compute().ravel()),
                               np.linspace(0, 1, 11))

    o = da.ones((5, 3))
    assert o.compute().shape == (5, 3) and o.compute().sum() == 15.0
    z = da.zeros((4, 2))
    assert z.compute().sum() == 0.0
    f = da.full((3, 2), 7.5)
    assert f.compute().sum() == 45.0

    e = da.eye(4)
    E = np.zeros((4, 4))
    rows = e._sdf.orderBy("row_id").collect()
    for r in rows:
        E[r["row_id"]] = list(r["values"])
    np.testing.assert_allclose(E, np.eye(4))
    ek = da.eye(3, 5, k=1)
    rows = sorted(ek._sdf.collect(), key=lambda r: r["row_id"])
    np.testing.assert_allclose(
        np.array([list(r["values"]) for r in rows]), np.eye(3, 5, k=1))

    # N-D shape → NDArray
    nd = da.full((4, 2, 3), 2.0)
    assert nd.inner_shape == (2, 3)
    assert np.asarray(nd.compute()).sum() == 4 * 6 * 2.0

    # _like twins
    assert da.ones_like(o).compute().sum() == 15.0
    assert da.full_like(z, 3.0).compute().sum() == 24.0
