"""Shared fixtures: one tuned SparkSession for the whole run, sf0.001
test tables, and a pandas-equality helper mirroring the reference's
``assert_eq`` style (dask/dataframe/utils.py:assert_eq)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dask_spark.session import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    """dict of table name -> DaskFrame over the sf0.001 parquet."""
    import dask_spark as ds

    names = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    return {n: ds.read_parquet(f"{sf_dir}/{n}.parquet") for n in names}


@pytest.fixture(scope="session")
def pdf_tables(tables):
    """Same tables collected to pandas — the oracle side for assert_eq."""
    return {n: f.compute() for n, f in tables.items()}


def assert_eq(got, want, sort_by=None, check_dtype=False, atol=1e-6):
    """Order-insensitive frame equality, NaN-tolerant, dtype-lenient
    (Spark ints come back int64/int32 while pandas may produce float)."""
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
    got = got.sort_values(sort_by, ignore_index=True)
    want = want.sort_values(sort_by, ignore_index=True)
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = pd.to_numeric(g, errors="coerce").astype(float)
            w = pd.to_numeric(w, errors="coerce").astype(float)
            ok = (g.isna() & w.isna()) | ((g - w).abs() <= atol + 1e-9 * w.abs())
            assert ok.all(), f"col {c}: first diff at row {(~ok).idxmax()}: " \
                f"{g[(~ok).idxmax()]!r} vs {w[(~ok).idxmax()]!r}"
        elif check_dtype:
            pd.testing.assert_series_equal(g, w, check_names=False)
        else:
            assert g.astype(str).equals(w.astype(str)), (
                f"col {c}: first diff at row "
                f"{(g.astype(str) != w.astype(str)).idxmax()}"
            )
