"""NDArray (N-D dask.array analog) numpy-parity tests: every
structural op is checked against the same op applied by numpy to the
collected data (the reference's assert_eq pattern,
dask/array/tests/test_slicing.py style)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dask_spark.frame import DaskFrame
from dask_spark.ndarray import NDArray, bincount, digitize, histogram2d


@pytest.fixture(scope="module")
def nd(spark):
    """(12, 2, 3, 4) tensor: 12 rows of 24-long blocks, deterministic."""
    rows = []
    for r in range(12):
        rows.append((r, [float((r * 24 + i) % 17) - 5.0 for i in range(24)]))
    pdf = pd.DataFrame(rows, columns=["id", "block"])
    sdf = spark.createDataFrame(pdf)
    return NDArray(sdf, (2, 3, 4), "block", "id")


@pytest.fixture(scope="module")
def ref(nd):
    return nd.compute()  # (12, 2, 3, 4)


def _np(a: NDArray):
    return a.compute()


def test_shape_meta(nd):
    assert nd.ndim == 4
    assert nd.inner_shape == (2, 3, 4)
    assert nd.inner_size == 24
    assert nd.shape == (12, 2, 3, 4)


def test_reshape_ravel(nd, ref):
    np.testing.assert_allclose(_np(nd.reshape(6, 4)), ref.reshape(12, 6, 4))
    np.testing.assert_allclose(_np(nd.ravel()), ref.reshape(12, 24))
    with pytest.raises(ValueError):
        nd.reshape(5, 5)


def test_transpose_swapaxes(nd, ref):
    np.testing.assert_allclose(
        _np(nd.transpose((2, 0, 1))), ref.transpose(0, 3, 1, 2)
    )
    np.testing.assert_allclose(_np(nd.swapaxes(1, 3)), ref.swapaxes(1, 3))
    with pytest.raises(ValueError):
        nd.swapaxes(0, 1)


def test_getitem_inner(nd, ref):
    np.testing.assert_allclose(_np(nd[:, 1]), ref[:, 1])
    np.testing.assert_allclose(_np(nd[:, :, 0:2]), ref[:, :, 0:2])
    np.testing.assert_allclose(_np(nd[:, 1, [0, 2], ::2]), ref[:, 1][:, [0, 2]][:, :, ::2])


def test_getitem_rows(nd, ref):
    np.testing.assert_allclose(_np(nd[2:5]), ref[2:5])
    np.testing.assert_allclose(_np(nd[[1, 3, 8], 0]), ref[[1, 3, 8], 0])


def test_flip_roll(nd, ref):
    np.testing.assert_allclose(_np(nd.flip(2)), np.flip(ref, axis=2))
    np.testing.assert_allclose(_np(nd.roll(2, 3)), np.roll(ref, 2, axis=3))


def test_squeeze_expand(nd, ref):
    e = nd.expand_dims(2)
    assert e.inner_shape == (2, 1, 3, 4)
    np.testing.assert_allclose(_np(e.squeeze()), ref)


def test_tril_triu_diag(spark):
    pdf = pd.DataFrame(
        [(r, [float(r * 9 + i) for i in range(9)]) for r in range(5)],
        columns=["id", "block"],
    )
    a = NDArray(spark.createDataFrame(pdf), (3, 3), "block", "id")
    ref = a.compute()
    np.testing.assert_allclose(_np(a.tril()), np.tril(ref))
    np.testing.assert_allclose(_np(a.triu(1)), np.triu(ref, 1))
    np.testing.assert_allclose(_np(a.diagonal()), np.diagonal(ref, axis1=1, axis2=2))


def test_elementwise_broadcast(nd, ref):
    np.testing.assert_allclose(_np(nd + 1.5), ref + 1.5)
    np.testing.assert_allclose(_np(nd * 2), ref * 2)
    # broadcast a (4,) literal across the last axis
    v = np.array([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(_np(nd * v), ref * v)
    # broadcast a (3, 1) literal across middle axes
    w = np.array([[1.0], [0.5], [2.0]])
    np.testing.assert_allclose(_np(nd + w), ref + w)


def test_reduce_inner_axes(nd, ref):
    for axis in (1, 2, 3):
        np.testing.assert_allclose(
            _np(nd.sum(axis)), ref.sum(axis=axis), rtol=1e-12
        )
        np.testing.assert_allclose(
            _np(nd.mean(axis)), ref.mean(axis=axis), rtol=1e-12
        )
        np.testing.assert_allclose(_np(nd.max(axis)), ref.max(axis=axis))
        np.testing.assert_allclose(_np(nd.min(axis)), ref.min(axis=axis))


def test_reduce_axis0(nd, ref):
    got = _np(nd.sum(0))
    np.testing.assert_allclose(got[0], ref.sum(axis=0), rtol=1e-9)
    got = _np(nd.mean(0))
    np.testing.assert_allclose(got[0], ref.mean(axis=0), rtol=1e-9)


def test_matmul_tensordot(nd, ref):
    M = np.arange(8, dtype="float64").reshape(4, 2) / 7.0
    np.testing.assert_allclose(_np(nd.matmul(M)), ref @ M, rtol=1e-9)
    T = np.arange(12, dtype="float64").reshape(3, 4) / 11.0
    np.testing.assert_allclose(
        _np(nd.tensordot(T, axes=2)),
        np.tensordot(ref, T, axes=2),
        rtol=1e-9,
    )


def test_chained_pipeline(nd, ref):
    """transpose → slice → reduce composes into projections only (the
    whole thing is one Catalyst plan, no shuffle)."""
    got = _np(nd.transpose((2, 0, 1))[:, :, 1].sum(2))
    want = ref.transpose(0, 3, 1, 2)[:, :, 1].sum(axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    plan = nd.transpose((2, 0, 1))[:, :, 1].sum(2)._sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_map_blocks(nd, ref):
    out = nd.map_blocks(lambda b: b.sum(axis=3) + 1.0)
    np.testing.assert_allclose(_np(out), ref.sum(axis=3) + 1.0, rtol=1e-9)
    assert out.inner_shape == (2, 3)


def test_rechunk(nd):
    r = nd.rechunk(3)
    assert r._sdf.rdd.getNumPartitions() == 3
    np.testing.assert_allclose(r.compute(), nd.compute())


def test_from_vectors_roundtrip(tables):
    emb = tables["embeddings"]
    a = NDArray.from_vectors(emb, "embedding", 64, id_col="vec_id")
    m = a.reshape(8, 8)
    t = m.transpose()
    back = t.transpose()
    np.testing.assert_allclose(back.compute(), m.compute())
    d = t.to_darray() if False else None  # 2-D inner can't be a DArray
    assert m.ravel().inner_shape == (64,)


def test_digitize_bincount(spark):
    pdf = pd.DataFrame({"v": [-2.0, 0.1, 0.9, 1.5, 3.0, 7.2]})
    f = DaskFrame(spark.createDataFrame(pdf))
    bins = [0.0, 1.0, 2.0, 5.0]
    got = (
        digitize(f, "v", bins)
        .to_spark()
        .toPandas()
        .sort_values("v")["bucket"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, np.digitize(sorted(pdf["v"]), bins))
    bc = bincount(digitize(f, "v", bins), "bucket", minlength=6)
    out = bc.to_spark().toPandas().sort_values("bin")
    np.testing.assert_array_equal(
        out["count"].to_numpy(),
        np.bincount(np.digitize(pdf["v"], bins), minlength=6),
    )


def test_histogram2d(spark):
    rng = np.random.RandomState(7)
    x, y = rng.uniform(0, 10, 500), rng.uniform(-5, 5, 500)
    f = DaskFrame(spark.createDataFrame(pd.DataFrame({"x": x, "y": y})))
    got = histogram2d(f, "x", "y", 4, ((0.0, 10.0), (-5.0, 5.0)))
    pdf = got.to_spark().toPandas()
    H = np.zeros((4, 4))
    for _, r in pdf.iterrows():
        H[int(r["bx"]), int(r["by"])] = r["n"]
    want, _, _ = np.histogram2d(x, y, bins=4, range=((0, 10), (-5, 5)))
    np.testing.assert_array_equal(H, want)


def test_large_inner_arrow_path(spark):
    """Inner sizes above EXPR_FUSION_LIMIT must route through the
    Arrow/numpy kernel: a 4096-wide COMPUTED block column (the worst
    case — an expression gather consumer would let CollapseProject
    re-inline the producer per element read, O(size²) per row) both
    completes and matches the closed form."""
    import pyspark.sql.functions as F

    n, size = 2000, 4096
    sdf = spark.range(n).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(size - 1)),
            lambda i: (F.col("id") * size + i).cast("double"),
        ).alias("block"),
    )
    nd = NDArray(sdf, (64, 64), "block", "id")
    total = (
        nd.transpose().sum(2).explode().to_spark().agg({"val": "sum"}).first()[0]
    )
    want = float(np.arange(n * size, dtype="float64").sum())
    assert total == pytest.approx(want, rel=1e-12)
    # matmul big path: identity matrix roundtrip on a sampled row
    got = nd.matmul(np.eye(64))[[7]].compute()
    np.testing.assert_allclose(
        got.ravel(), np.arange(7 * size, 8 * size, dtype="float64")
    )


def test_concatenate_stack(nd, ref, spark):
    from dask_spark.ndarray import concatenate, stack

    both = concatenate([nd, nd], axis=0)
    assert both.inner_shape == nd.inner_shape
    assert both._sdf.count() == 2 * len(ref)
    # inner-axis concat: (2,3,4) ++ (2,3,4) along axis 2 -> (2,6,4)
    c = concatenate([nd, nd + 100.0], axis=2)
    want = np.concatenate([ref, ref + 100.0], axis=2)
    np.testing.assert_allclose(c.compute(), want)
    # stack along a new axis -> (2, 2, 3, 4)
    s = stack([nd, nd * 2], axis=1)
    want = np.stack([ref, ref * 2], axis=1)
    np.testing.assert_allclose(s.compute(), want)
    with pytest.raises(ValueError):
        stack([nd, nd], axis=0)


def test_map_overlap_stencil(spark):
    """Axis-0 moving mean over a 3-row window via halo shipping must
    match the closed form away from the edges and complete without a
    global single-partition step."""
    import pyspark.sql.functions as F
    from dask_spark.ndarray import NDArray

    n, d = 200, 4
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {"id": range(n), "block": [[float(r * d + i) for i in range(d)] for r in range(n)]}
        )
    )
    nd = NDArray(sdf, (d,), "block", "id")

    def smooth(blk):
        out = blk.copy()
        out[1:-1] = (blk[:-2] + blk[1:-1] + blk[2:]) / 3.0
        return out

    got = nd.map_overlap(smooth, depth=1, npartitions=8).compute()
    full = nd.compute()
    want = smooth(full)
    # interior rows (away from every bucket's outer edge) must match
    np.testing.assert_allclose(got[2:-2], want[2:-2], rtol=1e-12)


def test_map_overlap_boundary_modes(spark):
    """boundary='periodic'/'reflect'/'nearest'/constant must match
    numpy's pad-then-stencil-then-trim closed form EVERYWHERE,
    including the outermost rows (reference dask/array/overlap.py
    periodic:180, reflect:204, nearest:234)."""
    from dask_spark.ndarray import NDArray

    n, d, depth = 60, 3, 2
    rng = np.random.default_rng(5)
    data = rng.normal(size=(n, d)).round(3)
    sdf = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "block": [list(r) for r in data]})
    )
    nd = NDArray(sdf, (d,), "block", "id")

    def smooth(blk):
        out = blk.copy()
        for r in range(len(blk)):
            lo, hi = max(0, r - depth), min(len(blk), r + depth + 1)
            out[r] = blk[lo:hi].mean(axis=0)
        return out

    np_mode = {"periodic": "wrap", "reflect": "symmetric",
               "nearest": "edge"}
    for mode, npm in np_mode.items():
        padded = np.pad(data, ((depth, depth), (0, 0)), mode=npm)
        want = smooth(padded)[depth:-depth]
        got = nd.map_overlap(
            smooth, depth=depth, npartitions=6, boundary=mode
        ).compute()
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=mode)

    padded = np.pad(data, ((depth, depth), (0, 0)),
                    mode="constant", constant_values=7.5)
    want = smooth(padded)[depth:-depth]
    got = nd.map_overlap(
        smooth, depth=depth, npartitions=6, boundary=7.5
    ).compute()
    np.testing.assert_allclose(got, want, rtol=1e-12)

    with pytest.raises(ValueError):
        nd.map_overlap(smooth, depth=2, boundary="bogus")
    with pytest.raises(ValueError):
        nd.map_overlap(smooth, depth=n + 1, boundary="reflect")


def test_coarsen(spark):
    """coarsen matches dask/numpy block reduction on inner axes and on
    the distributed row axis."""
    from dask_spark.ndarray import NDArray, coarsen

    n, s1, s2 = 8, 4, 6
    pdf = pd.DataFrame(
        {
            "id": range(n),
            "block": [
                [float((r * s1 * s2 + i) % 23) for i in range(s1 * s2)]
                for r in range(n)
            ],
        }
    )
    nd = NDArray(spark.createDataFrame(pdf), (s1, s2), "block", "id")
    ref = nd.compute()

    got = coarsen("mean", nd, {1: 2, 2: 3}).compute()
    want = ref.reshape(n, 2, 2, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    got = coarsen("sum", nd, {0: 2}).compute()
    want = ref.reshape(4, 2, s1, s2).sum(axis=1)  # rows group as id//2
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # trim_excess drops the ragged tail like dask
    got = coarsen("max", nd, {2: 4}, trim_excess=True).compute()
    want = ref[:, :, :4].reshape(n, s1, 1, 4).max(axis=3)
    np.testing.assert_allclose(got, want)
    with pytest.raises(ValueError):
        coarsen("max", nd, {2: 4})


def test_reduce_extended_family(nd, ref):
    """prod/var/std/argmax/argmin along inner axes + var/prod along
    axis 0 match numpy (ddof semantics included)."""
    np.testing.assert_allclose(_np(nd.prod(2)), ref.prod(axis=2), rtol=1e-12)
    for ddof in (0, 1):
        np.testing.assert_allclose(
            _np(nd.var(3, ddof=ddof)), ref.var(axis=3, ddof=ddof), rtol=1e-9
        )
        np.testing.assert_allclose(
            _np(nd.std(2, ddof=ddof)), ref.std(axis=2, ddof=ddof), rtol=1e-9
        )
    np.testing.assert_allclose(_np(nd.argmax(3)), ref.argmax(axis=3))
    np.testing.assert_allclose(_np(nd.argmin(2)), ref.argmin(axis=2))
    got = _np(nd.var(0))
    np.testing.assert_allclose(got[0], ref.var(axis=0), rtol=1e-9)
    got = _np(nd.prod(0))
    np.testing.assert_allclose(got[0], ref.prod(axis=0), rtol=1e-9)
    with pytest.raises(ValueError, match="argmax"):
        nd.argmax(0)


def test_pad(nd, ref):
    from dask_spark.ndarray import NDArray  # noqa: F401

    got = _np(nd.pad({2: (1, 2)}, value=-9.0))
    want = np.pad(ref, [(0, 0), (0, 0), (1, 2), (0, 0)], constant_values=-9.0)
    np.testing.assert_allclose(got, want)
    # pad composes with a pending transpose perm
    got = _np(nd.transpose((2, 0, 1)).pad({1: (0, 1)}))
    want = np.pad(
        ref.transpose(0, 3, 1, 2), [(0, 0), (0, 1), (0, 0), (0, 0)]
    )
    np.testing.assert_allclose(got, want)
    # tuple form pads the last axis
    got = _np(nd.pad((2, 0), value=1.5))
    want = np.pad(ref, [(0, 0), (0, 0), (0, 0), (2, 0)], constant_values=1.5)
    np.testing.assert_allclose(got, want)
    with pytest.raises(ValueError):
        nd.pad({0: (1, 1)})


def test_stack_aliases(nd, ref):
    from dask_spark.ndarray import dstack, hstack, vstack

    assert vstack([nd, nd])._sdf.count() == 2 * len(ref)
    h = hstack([nd, nd])
    np.testing.assert_allclose(
        h.compute(), np.concatenate([ref, ref], axis=1)
    )
    flat = nd.ravel()
    d = dstack([flat, flat])
    np.testing.assert_allclose(
        d.compute(),
        np.dstack([ref.reshape(12, 24), ref.reshape(12, 24)]),
    )


def test_darray_reshape_bridge(tables):
    from dask_spark.array import DArray

    d = DArray.from_frame(tables["embeddings"], "embedding", "vec_id")
    m = d.reshape(8, 8)
    assert m.inner_shape == (8, 8)
    got = m.transpose().transpose().compute()
    np.testing.assert_allclose(got, d.reshape((64,)).compute().reshape(-1, 8, 8))


def test_cumsum_cumprod(nd, ref):
    np.testing.assert_allclose(
        _np(nd.cumsum(2)), ref.cumsum(axis=2), rtol=1e-12
    )
    np.testing.assert_allclose(
        _np(nd.cumprod(3)), ref.cumprod(axis=3), rtol=1e-9
    )
    np.testing.assert_allclose(
        _np(nd.cumsum(0)), ref.cumsum(axis=0), rtol=1e-12
    )
    # composes with a pending structural perm
    np.testing.assert_allclose(
        _np(nd.transpose((2, 0, 1)).cumsum(1)),
        ref.transpose(0, 3, 1, 2).cumsum(axis=1),
        rtol=1e-12,
    )
    with pytest.raises(ValueError):
        nd.cumprod(0)


def test_oversized_inner_block_raises(spark):
    """Inner axes are single-chunk by layout: constructing a block
    beyond INNER_BLOCK_LIMIT_BYTES must fail loudly with guidance
    (reference: dask/array/rechunk.py:270 rechunks any axis; this
    engine documents the boundary instead of OOMing an executor)."""
    from dask_spark.ndarray import INNER_BLOCK_LIMIT_BYTES

    sdf = spark.range(1).selectExpr("array(0.0) as block")
    too_many = INNER_BLOCK_LIMIT_BYTES // 8 + 1
    with pytest.raises(ValueError, match="single-chunk inner-axis"):
        NDArray(sdf, (too_many,), "block")
    with pytest.raises(ValueError, match="single-chunk inner-axis"):
        NDArray(sdf, (100_000, 100_000), "block")


def test_einsum_single_operand(nd, ref):
    """einsum parity (reference: dask/array/einsumfuncs.py:202):
    single-operand forms lower to gather/sum/transpose."""
    from dask_spark.ndarray import einsum

    cases = [
        "nijk->nkij",        # pure transpose
        "nijk->nij",         # sum last
        "nijk->nk",          # sum two
        "nijk->n",           # sum all inner
        "nijk->nkj",         # sum + transpose
    ]
    for sub in cases:
        got = np.asarray(einsum(sub, nd).compute())
        want = np.einsum(sub.replace("n", "r"), ref)
        np.testing.assert_allclose(got.reshape(want.shape), want,
                                   err_msg=sub)
    # diagonal: needs square inner axes
    sq_ref = ref[:, :, :2, :2]  # (12, 2, 2, 2)
    sq = nd[:, :, 0:2, 0:2]
    got = np.asarray(einsum("nijj->nij", sq).compute())
    want = np.einsum("rijj->rij", sq_ref)
    np.testing.assert_allclose(got.reshape(want.shape), want)
    got = np.asarray(einsum("nijj->ni", sq).compute())  # diag then sum
    want = np.einsum("rijj->ri", sq_ref)
    np.testing.assert_allclose(got.reshape(want.shape), want)


def test_einsum_two_operand_literal(nd, ref):
    from dask_spark.ndarray import einsum

    rng = np.random.default_rng(0)
    M = rng.normal(size=(4, 5))
    got = np.asarray(einsum("nijk,kl->nijl", nd, M).compute())
    want = np.einsum("rijk,kl->rijl", ref, M)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-9)

    # full contraction of the inner tensor against a literal
    T = rng.normal(size=(2, 3, 4))
    got = np.asarray(einsum("nijk,ijk->n", nd, T).compute())
    want = np.einsum("rijk,ijk->r", ref, T)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-9)

    # contraction over a middle label with output reorder
    A = rng.normal(size=(3, 2))
    got = np.asarray(einsum("nijk,jl->nlki", nd, A).compute())
    want = np.einsum("rijk,jl->rlki", ref, A)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-9)

    # outer product with a vector
    v = rng.normal(size=3)
    got = np.asarray(einsum("nk,j->nkj", nd.reshape(24), v).compute())
    want = np.einsum("rk,j->rkj", ref.reshape(12, 24), v)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-9)

    # y-only label summed inside the literal pre-pass
    B = rng.normal(size=(4, 6))
    got = np.asarray(einsum("nijk,km->nij", nd, B).compute())
    want = np.einsum("rijk,km->rij", ref, B)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-9)


def test_einsum_refusals(nd):
    from dask_spark.ndarray import einsum

    with pytest.raises(NotImplementedError):
        einsum("nijk->ijk", nd)  # contracting the row axis
    with pytest.raises(NotImplementedError):
        einsum("nijk,nk->nij", nd, np.ones((12, 4)))  # row label in y
    with pytest.raises(NotImplementedError):
        einsum("nijk,kj->nijk", nd, np.ones((4, 3)))  # batched shared
    with pytest.raises(NotImplementedError):
        einsum("nijk,kl->nijl", nd, nd)  # two distributed operands
    with pytest.raises(ValueError):
        einsum("nij->ni", nd)  # rank mismatch


def test_apply_gufunc(nd, ref):
    """apply_gufunc (reference: dask/array/gufunc.py:172): core dims
    from the signature, the distributed rows axis as the loop dim."""
    from dask_spark.ndarray import apply_gufunc

    flat = nd.reshape(24)
    fref = ref.reshape(12, 24)

    # "(i)->()" reduction, func vectorized over the batch axis
    got = apply_gufunc(lambda x: x.sum(axis=-1), "(i)->()", flat)
    np.testing.assert_allclose(
        np.asarray(got.compute()).ravel(), fref.sum(axis=1), rtol=1e-12)

    # "(i,j),(j)->(i)" matvec against a literal
    v = np.arange(4.0)
    got = apply_gufunc(lambda a, b: a @ b, "(i,j),(j)->(i)",
                       nd.reshape(6, 4), v)
    want = fref.reshape(12, 6, 4) @ v
    np.testing.assert_allclose(
        np.asarray(got.compute()).reshape(want.shape), want, rtol=1e-12)

    # vectorize=True wraps a per-element function
    got = apply_gufunc(lambda x: x.max() - x.min(), "(i)->()", flat,
                       vectorize=True)
    np.testing.assert_allclose(
        np.asarray(got.compute()).ravel(),
        fref.max(axis=1) - fref.min(axis=1))

    # two distributed operands, aligned on id
    got = apply_gufunc(
        lambda a, b: (a * b).sum(axis=-1), "(i),(i)->()", flat, flat)
    np.testing.assert_allclose(
        np.asarray(got.compute()).ravel(), (fref * fref).sum(axis=1),
        rtol=1e-12)

    # multiple outputs
    mean, std = apply_gufunc(
        lambda x: (x.mean(axis=-1), x.std(axis=-1)), "(i)->(),()", flat)
    np.testing.assert_allclose(
        np.asarray(mean.compute()).ravel(), fref.mean(axis=1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(std.compute()).ravel(), fref.std(axis=1), rtol=1e-12)

    # output label bound via output_sizes
    got = apply_gufunc(
        lambda x: np.stack([x.sum(axis=-1), x.prod(axis=-1) * 0], axis=-1),
        "(i)->(k)", flat, output_sizes={"k": 2})
    assert got.inner_shape == (2,)

    with pytest.raises(ValueError):
        apply_gufunc(lambda x: x, "(i)->(m)", flat)  # unbound output
    with pytest.raises(ValueError):
        apply_gufunc(lambda x, y: x, "(i),(j)->()", flat)  # arity


def test_masked_arrays(spark):
    """Masked-array family (reference: dask/array/ma.py) — the mask is
    a NULL element; parity against numpy.ma on the same data."""
    import numpy.ma as npma

    from dask_spark import ma

    data = np.array([
        [1.0, -2.0, 3.0, 100.0],
        [4.0, 5.0, -6.0, 7.0],
        [np.nan, 8.0, 9.0, -10.0],
    ])
    pdf = pd.DataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(data)],
        columns=["id", "block"],
    )
    nd = NDArray(spark.createDataFrame(pdf), (4,), "block", "id")

    mk = ma.masked_less(ma.masked_invalid(nd), 0.0)
    ref = npma.masked_less(npma.masked_invalid(data), 0.0)

    def col(a, name="v"):
        out = a._sdf.select(
            "id", F.element_at("block", 1).alias(name)
        ).orderBy("id").toPandas()
        return out[name].to_numpy(dtype=float)

    import pyspark.sql.functions as F

    np.testing.assert_allclose(col(ma.sum(mk)), ref.sum(axis=1).filled(np.nan),
                               equal_nan=True)
    np.testing.assert_allclose(col(ma.mean(mk)), ref.mean(axis=1))
    np.testing.assert_allclose(col(ma.count(mk)), ref.count(axis=1))
    np.testing.assert_allclose(col(ma.max(mk)), ref.max(axis=1))
    np.testing.assert_allclose(col(ma.min(mk)), ref.min(axis=1))

    # filled / getmaskarray
    np.testing.assert_allclose(
        np.asarray(ma.filled(mk, -1.0).compute()), ref.filled(-1.0))
    np.testing.assert_allclose(
        np.asarray(ma.getmaskarray(mk).compute()),
        npma.getmaskarray(ref).astype(float))

    # weighted average drops masked weights like numpy.ma
    w = [1.0, 2.0, 3.0, 4.0]
    np.testing.assert_allclose(
        col(ma.average(mk, weights=w)),
        npma.average(ref, axis=1, weights=w))

    # axis-0 null-skipping reductions
    np.testing.assert_allclose(
        np.asarray(ma.sum_axis0(mk).compute()).ravel(),
        ref.sum(axis=0).filled(np.nan), equal_nan=True)
    np.testing.assert_allclose(
        np.asarray(ma.count_axis0(mk).compute()).ravel(),
        ref.count(axis=0))

    # masked_inside / masked_equal / masked_values region checks
    mi = ma.masked_inside(nd, 3.0, 5.0)
    assert np.isnan(np.asarray(ma.filled(mi, np.nan).compute())).sum() >= 3
    me = ma.masked_equal(nd, 100.0)
    np.testing.assert_allclose(
        np.asarray(ma.filled(me, 0.0).compute())[0, 3], 0.0)


def test_masked_fully_masked_row(spark):
    """numpy.ma: a fully masked row's sum/max/min/mean are `masked`
    (NULL here) and count is 0."""
    from dask_spark import ma

    pdf = pd.DataFrame(
        [(0, [1.0, 2.0]), (1, [-1.0, -2.0])], columns=["id", "block"]
    )
    nd = NDArray(spark.createDataFrame(pdf), (2,), "block", "id")
    mk = ma.masked_less(nd, 0.0)  # row 1 fully masked
    import pyspark.sql.functions as F

    def col(a):
        out = a._sdf.select("id", F.element_at("block", 1).alias("v")) \
            .orderBy("id").toPandas()
        return out["v"].tolist()

    s = col(ma.sum(mk))
    assert s[0] == 3.0 and (s[1] is None or np.isnan(s[1]))
    assert col(ma.count(mk)) == [2.0, 0.0]
    m = col(ma.max(mk))
    assert m[0] == 2.0 and (m[1] is None or np.isnan(m[1]))


# ---- chunked-inner layout (chunked.py) ---------------------------------

class TestChunkedNDArray:
    """The escalation path past the single-chunk inner boundary
    (reference dask/array/rechunk.py:270 — cross-axis rechunk; see
    ndarray.py module note and chunked.py cost model)."""

    REF = np.arange(2 * 8 * 6, dtype="float64").reshape(2, 8, 6)

    def _chunked(self, spark, chunks=4):
        import dask_spark as ds
        from dask_spark.chunked import ChunkedNDArray

        nd = ds.NDArray.from_vectors(
            ds.from_pandas(pd.DataFrame({
                "rid": [0, 1],
                "vec": [list(r.ravel()) for r in self.REF],
            })), "vec", 48, "rid",
        ).reshape(8, 6)
        return ChunkedNDArray.from_ndarray(nd, chunks=chunks)

    def test_roundtrip_and_elementwise(self, spark):
        ch = self._chunked(spark)
        assert np.array_equal(ch.compute(), self.REF)
        assert np.array_equal((ch * 2.0 + 0.0).compute(), self.REF * 2)
        assert ch.tile_shape == (2, 6)

    def test_transpose_parity(self, spark):
        ch = self._chunked(spark)
        t = ch.transpose(out_chunks=2)
        assert t.inner_shape == (6, 8) and t.chunks == 2
        assert np.array_equal(t.compute(), np.transpose(self.REF, (0, 2, 1)))
        # involution through a different chunking
        assert np.array_equal(
            t.transpose(out_chunks=4).compute(), self.REF
        )

    def test_reductions(self, spark):
        ch = self._chunked(spark)
        assert np.allclose(
            ch.sum(axis=1).compute().reshape(2, 6), self.REF.sum(axis=1)
        )
        assert np.allclose(
            ch.sum(axis=2).compute().reshape(2, 8), self.REF.sum(axis=2)
        )

    def test_guards(self, spark):
        ch = self._chunked(spark)
        with pytest.raises(ValueError):
            ch.sum(axis=0)
        with pytest.raises(ValueError):
            self._chunked(spark, chunks=9)  # more chunks than rows
        with pytest.raises(ValueError):
            self._chunked(spark, chunks=(4, 3))  # sizes must sum to 8
        with pytest.raises(ValueError):
            self._chunked(spark, chunks=(8, 0))  # positive sizes only

    def test_ragged_chunks(self, spark):
        """Uneven splits (reference dask/array/rechunk.py:270 accepts
        any chunk tuple): int counts use array_split distribution,
        explicit ragged size tuples round-trip, transpose moves data
        correctly across ragged tilings on BOTH sides, and reductions
        read per-tile extents from the sizes literal."""
        # 8 rows into 3 chunks -> (3, 3, 2)
        ch = self._chunked(spark, chunks=3)
        assert ch.chunk_rows == (3, 3, 2)
        assert np.array_equal(ch.compute(), self.REF)
        assert np.array_equal((ch * 3.0).compute(), self.REF * 3)

        # explicit ragged sizes
        ch = self._chunked(spark, chunks=(1, 5, 2))
        assert ch.chunk_rows == (1, 5, 2)
        assert np.array_equal(ch.compute(), self.REF)

        # ragged transpose: 6 output rows into ragged (4, 2)
        t = ch.transpose(out_chunks=(4, 2))
        assert t.inner_shape == (6, 8) and t.chunk_rows == (4, 2)
        assert np.array_equal(t.compute(), np.transpose(self.REF, (0, 2, 1)))
        # involution back through yet another ragged chunking
        assert np.array_equal(
            t.transpose(out_chunks=(2, 3, 3)).compute(), self.REF
        )

        # reductions over ragged tiles
        assert np.allclose(
            ch.sum(axis=1).compute().reshape(2, 6), self.REF.sum(axis=1)
        )
        assert np.allclose(
            ch.sum(axis=2).compute().reshape(2, 8), self.REF.sum(axis=2)
        )

        # flat-index replay on a ragged layout
        ex = ch.explode().compute()
        for _, row in ex.iterrows():
            r, p = int(row["row_id"]), int(row["pos"])
            assert row["val"] == self.REF[r].ravel()[p]

    def test_transpose_is_one_shuffle(self, spark):
        """The rechunk bill: exactly ONE exchange keyed by
        (row, out_chunk) — no second pass, no driver reassembly."""
        ch = self._chunked(spark)
        t = ch.transpose(out_chunks=2)
        plan = t._sdf._jdf.queryExecution().sparkPlan().toString()
        n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n_ex <= 2, plan[:1200]  # partial+final agg of one groupBy
        assert "row_id" in plan and "__dst" in plan

    def test_sum_axis1_shuffles_scalars_only(self, spark):
        """axis-1 reduction must shuffle C partial B-vectors per row,
        never tiles: the aggregate input carries only __part."""
        ch = self._chunked(spark)
        out = ch.sum(axis=1)
        plan = out._sdf._jdf.queryExecution().sparkPlan().toString()
        assert "__part" in plan
        # the partial projection drops the tile before the exchange:
        # no Exchange node lists the tile column in its output
        import re as _re

        for m in _re.finditer(r"Exchange hashpartitioning\([^\n]*", plan):
            assert "block" not in m.group(0), m.group(0)


def test_array_method_tail(spark):
    """Array-class method/property tail (reference dask/array/core.py
    Array): T/partitions/blocks/chunks/copy/conj/imag/atleast_nd/
    argtopk/trace/to_delayed/to_svg/view/name — delegates onto the
    existing structural machinery and module routines."""
    import dask_spark as ds

    ref = np.arange(24, dtype="float64").reshape(6, 4)
    nd = ds.NDArray.from_vectors(
        ds.from_pandas(pd.DataFrame({
            "rid": range(6), "vec": [list(r) for r in ref],
        }), npartitions=3),
        "vec", 4, "rid",
    ).reshape(2, 2)

    assert np.array_equal(
        nd.T.compute(), np.transpose(ref.reshape(6, 2, 2), (0, 2, 1))
    )
    assert nd.itemsize == 8 and nd.A is nd
    assert len(nd.chunks) == 3 and nd.numblocks[1:] == (1, 1)
    assert nd.partitions[0].compute().shape[1:] == (2, 2)
    assert np.array_equal(nd.copy().compute(), nd.compute())
    assert np.array_equal(nd.conj().compute(), nd.compute())
    # real/imag are PROPERTIES like numpy/dask (conj stays a method)
    assert np.array_equal(nd.real.compute(), nd.compute())
    assert (nd.imag.compute() == 0).all()
    assert nd.atleast_nd(4).inner_shape == (2, 2, 1)
    assert nd.reshape(4).argtopk(2).inner_shape == (2,)
    tr = sorted(r["trace"] for r in nd.trace()._sdf.collect())
    assert tr == sorted(float(np.trace(r.reshape(2, 2))) for r in ref)
    delayed_parts = nd.to_delayed()
    assert sum(d.compute().shape[0] for d in delayed_parts) == 6
    assert nd.to_svg().startswith("<svg")
    assert nd.format_index() == "shape=(6, 2, 2)"
    assert nd.view() is not nd and nd.to_backend() is nd
    assert nd.name.startswith("ndarray-")
    assert nd.compute_chunk_sizes() is nd
    with pytest.raises(ValueError):
        nd.view("int32")
