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
