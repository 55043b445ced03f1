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


from dask_spark.testing import assert_eq  # noqa: E402,F401
