"""Public testing helper (reference: dask/dataframe/utils.py assert_eq —
the reference's whole test suite is built on it; users porting dask
tests can keep the same shape)."""

from __future__ import annotations

import pandas as pd


def assert_eq(got, want, sort_by=None, check_dtype: bool = False,
              atol: float = 1e-6) -> None:
    """Order-insensitive equality between DaskFrame/pandas objects,
    NaN-tolerant, dtype-lenient (Spark ints come back int64/int32 while
    pandas may produce float)."""
    got = got.compute() if hasattr(got, "compute") else got
    want = want.compute() if hasattr(want, "compute") else want
    if isinstance(got, pd.Series):
        got = got.to_frame()
    if isinstance(want, pd.Series):
        want = want.to_frame()
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if sort_by is None:
        sort_by = list(got.columns)
    got = got.sort_values(sort_by, ignore_index=True) if len(got) else got
    want = want.sort_values(sort_by, ignore_index=True) if len(want) else want
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = pd.to_numeric(g, errors="coerce").astype(float)
            w = pd.to_numeric(w, errors="coerce").astype(float)
            ok = (g.isna() & w.isna()) | ((g - w).abs() <= atol + 1e-9 * w.abs())
            assert ok.all(), (
                f"col {c}: first diff at row {(~ok).idxmax()}: "
                f"{g[(~ok).idxmax()]!r} vs {w[(~ok).idxmax()]!r}"
            )
        elif check_dtype:
            pd.testing.assert_series_equal(g, w, check_names=False)
        else:
            assert g.astype(str).equals(w.astype(str)), (
                f"col {c}: first diff at row "
                f"{(g.astype(str) != w.astype(str)).idxmax()}"
            )
