"""Seventh slice of the ported reference suite (r14): overlap + gufunc.

Ports the semantic halves of dask/array/tests/test_overlap.py and
test_gufunc.py — same rules as slices 1-6. Chunk/graph halves do not
port: the engine's halo is a range shuffle over the distributed row
axis, so boundary semantics are checked through map_overlap against
numpy's pad-then-stencil-then-trim closed form on the REFERENCE tests'
own values, and gufunc cases run through the Arrow-batched
apply_gufunc (loop dim == rows).

Pinned deviations: depth/boundary are axis-0-only (inner axes are
in-row — a stencil over them is a plain map_blocks, no halo needed);
dask's per-axis depth dicts therefore collapse to the single axis-0
depth; output_dtypes is unnecessary (schema is derived).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dask_spark.ndarray import NDArray, apply_gufunc


def nd_rows(spark, arr, d=1):
    arr = np.asarray(arr, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    pdf = pd.DataFrame({"id": range(arr.shape[0]),
                        "block": [list(r) for r in arr]})
    return NDArray(spark.createDataFrame(pdf), arr.shape[1:], "block", "id")


def window_mean(depth):
    def fn(blk):
        out = blk.copy()
        for r in range(len(blk)):
            lo, hi = max(0, r - depth), min(len(blk), r + depth + 1)
            out[r] = blk[lo:hi].mean(axis=0)
        return out

    return fn


NP_MODE = {"periodic": "wrap", "reflect": "symmetric", "nearest": "edge"}


class TestOverlapPorted:
    @pytest.mark.parametrize("mode,depth", [
        ("reflect", 2),   # test_overlap.py:163 test_reflect (depth 2)
        ("reflect", 1),   # test_overlap.py:163 (depth 1)
        ("nearest", 2),   # test_overlap.py:176 test_nearest
        ("nearest", 1),
        ("periodic", 2),  # test_overlap.py:151 test_periodic
    ])
    def test_boundary_modes_reference_values(self, spark, mode, depth):
        """The reference's own arrays (arange(10) 1-D, arange(64)
        8×8), stencilled through the halo and checked against numpy's
        pad closed form — the value half of the padded-sequence
        asserts (engine pads inside map_overlap and trims)."""
        x = np.arange(10, dtype="float64")
        nd = nd_rows(spark, x)
        fn = window_mean(depth)
        padded = np.pad(x[:, None], ((depth, depth), (0, 0)),
                        mode=NP_MODE[mode])
        want = fn(padded)[depth:-depth]
        got = nd.map_overlap(fn, depth=depth, npartitions=3,
                             boundary=mode).compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_periodic_2d(self, spark):
        """test_overlap.py:151 test_periodic — the 8×8 arange(64)
        array; wrap rows through the halo."""
        x = np.arange(64, dtype="float64").reshape(8, 8)
        nd = nd_rows(spark, x)
        fn = window_mean(2)
        padded = np.pad(x, ((2, 2), (0, 0)), mode="wrap")
        want = fn(padded)[2:-2]
        got = nd.map_overlap(fn, depth=2, npartitions=2,
                             boundary="periodic").compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_constant_boundaries(self, spark):
        """test_overlap.py:189 test_constant + :650
        test_constant_boundaries — a scalar boundary pads the halo
        with that value."""
        x = np.arange(64, dtype="float64").reshape(8, 8)
        nd = nd_rows(spark, x)
        fn = window_mean(2)
        padded = np.pad(x, ((2, 2), (0, 0)), mode="constant",
                        constant_values=10.0)
        want = fn(padded)[2:-2]
        got = nd.map_overlap(fn, depth=2, npartitions=2,
                             boundary=10.0).compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_map_overlap_shift_stencil(self, spark):
        """test_overlap.py:314 test_map_overlap (value half): a
        length-dependent stencil over arange(10) with reflect —
        interior values must see the true neighbors."""
        x = np.arange(10, dtype="float64")
        nd = nd_rows(spark, x)

        def diff3(blk):
            out = blk.copy()
            out[1:-1] = blk[2:] - blk[:-2]
            return out

        padded = np.pad(x[:, None], ((2, 2), (0, 0)), mode="symmetric")
        want = diff3(padded)[2:-2]
        got = nd.map_overlap(diff3, depth=2, npartitions=3,
                             boundary="reflect").compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_boundary_none_keeps_edges_raw(self, spark):
        """test_overlap.py:201 test_boundaries ('none' half): without
        padding the outermost rows see a truncated window — matches
        the unpadded closed form at the global edges."""
        x = np.arange(12, dtype="float64")
        nd = nd_rows(spark, x)
        fn = window_mean(1)
        want = fn(x[:, None].copy())
        got = nd.map_overlap(fn, depth=1, npartitions=3).compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_one_chunk_along_axis(self, spark):
        """test_overlap.py:643 test_one_chunk_along_axis — a single
        partition still pads and matches."""
        x = np.arange(6, dtype="float64")
        nd = nd_rows(spark, x)
        fn = window_mean(1)
        padded = np.pad(x[:, None], ((1, 1), (0, 0)), mode="edge")
        want = fn(padded)[1:-1]
        got = nd.map_overlap(fn, depth=1, npartitions=1,
                             boundary="nearest").compute()
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_asymmetric_depth_refusal(self, spark):
        """test_overlap.py:306 test_asymmetric_overlap_boundary_
        exception — the engine validates depth/boundary (bad boundary
        name, depth exceeding the axis) with ValueError."""
        x = np.arange(8, dtype="float64")
        nd = nd_rows(spark, x)
        with pytest.raises(ValueError):
            nd.map_overlap(window_mean(1), depth=1, boundary="bogus")
        with pytest.raises(ValueError):
            nd.map_overlap(window_mean(1), depth=100, boundary="reflect")


class TestGufuncPorted:
    @pytest.fixture(scope="class")
    def arr(self, spark):
        rng = np.random.RandomState(3)
        data = rng.normal(size=(12, 30)).round(3)
        return nd_rows(spark, data), data

    def test_apply_gufunc_01_multi_output(self, arr):
        """test_gufunc.py:120 test_apply_gufunc_01 — '(i)->(),()'
        tuple output (mean, std per row)."""
        nd, data = arr

        def stats(x):
            return np.mean(x, axis=-1), np.std(x, axis=-1)

        mean, std = apply_gufunc(stats, "(i)->(),()", nd)
        np.testing.assert_allclose(
            np.asarray(mean.compute()).ravel(), data.mean(axis=1),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(std.compute()).ravel(), data.std(axis=1),
            rtol=1e-12)

    def test_apply_gufunc_elemwise(self, spark):
        """test_gufunc.py:197 test_apply_gufunc_elemwise_01 (adapted:
        the loop dim is the rows axis, the element slot is a 1-wide
        core dim; the second operand rides as a literal)."""
        a = nd_rows(spark, np.array([1.0, 2.0, 3.0]))
        got = np.asarray(
            apply_gufunc(lambda x, y: x * y, "(i),(i)->(i)", a,
                         np.array([2.0])).compute()).ravel()
        np.testing.assert_allclose(got, np.array([2.0, 4.0, 6.0]))

    def test_apply_gufunc_02_matvec(self, arr):
        """test_gufunc.py:177 test_apply_gufunc_02 — '(i,j),(j)->(i)'
        against a literal vector."""
        nd, data = arr
        m = nd.reshape(5, 6)
        v = np.arange(6.0)
        got = apply_gufunc(lambda a, b: a @ b, "(i,j),(j)->(i)", m, v)
        want = data.reshape(12, 5, 6) @ v
        np.testing.assert_allclose(
            np.asarray(got.compute()).reshape(want.shape), want,
            rtol=1e-12)

    @pytest.mark.parametrize("vectorize", [False, True])
    def test_output_dtypes_string_modes(self, arr, vectorize):
        """test_gufunc.py:145 test_apply_gufunc_output_dtypes_string
        (both vectorize modes) — reduction '(i)->()'."""
        nd, data = arr
        if vectorize:
            got = apply_gufunc(lambda x: np.median(x), "(i)->()", nd,
                               vectorize=True)
        else:
            got = apply_gufunc(lambda x: np.median(x, axis=-1),
                               "(i)->()", nd)
        np.testing.assert_allclose(
            np.asarray(got.compute()).ravel(), np.median(data, axis=1),
            rtol=1e-12)

    def test_signature_validation(self, arr):
        """test_gufunc.py:36/:57 axes/args validation — operand count
        and rank mismatches raise ValueError."""
        nd, _ = arr
        with pytest.raises(ValueError):
            apply_gufunc(lambda x, y: x, "(i),(j)->()", nd)  # 2 vs 1
        with pytest.raises(ValueError):
            apply_gufunc(lambda x: x, "(i,j)->()", nd)  # rank 1 vs 2

    def test_output_sizes_new_label(self, arr):
        """test_gufunc.py (output_sizes kwarg): an output label unbound
        by inputs needs output_sizes."""
        nd, data = arr

        def first_two(x):
            return x[..., :2]

        got = apply_gufunc(first_two, "(i)->(k)", nd,
                           output_sizes={"k": 2})
        np.testing.assert_allclose(
            np.asarray(got.compute()).reshape(12, 2), data[:, :2],
            rtol=1e-12)
        with pytest.raises(Exception):
            apply_gufunc(first_two, "(i)->(k)", nd)
