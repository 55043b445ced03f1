"""Focused pins for the r15 optimization-round internals changes:
results must be IDENTICAL to the unoptimized forms.

1. triangle_count(assume_canonical=True) over a pre-canonicalized
   edge set == the default self-canonicalizing path.
2. range_bucket pins NOTHING itself (the r15 auto-input-pin was
   measured a regression and reverted); release() chases a
   ``_ds_pinned_input`` handle when a caller chains pins that way
   (the spearman fused rank build).
3. spearman_corr's fused both-axes rank build matches scipy on tied
   and untied data (the per-column machinery it replaced was pinned
   against the same values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_triangle_count_assume_canonical(spark):
    import pyspark.sql.functions as F

    from dask_spark.operators.graph import triangle_count

    # messy input: duplicates, both orientations, self loop
    rows = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 4), (4, 1), (2, 2),
            (3, 1), (4, 3)]
    sdf = spark.createDataFrame(rows, "a bigint, b bigint")
    base = triangle_count(sdf, "a", "b").compute()

    canon = (
        sdf.select(F.least("a", "b").alias("a"),
                   F.greatest("a", "b").alias("b"))
        .filter(F.col("a") < F.col("b")).distinct()
    )
    fast = triangle_count(
        canon, "a", "b", assume_canonical=True
    ).compute()
    lhs = base.sort_values("node", ignore_index=True)
    rhs = fast.sort_values("node", ignore_index=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_range_bucket_pins_nothing_release_chases_handle(spark):
    from dask_spark.operators.sort import _PINNED, _pin, range_bucket, release

    sdf = spark.range(1000).selectExpr("id", "id * 2 as v")
    before = len(_PINNED)
    bucketed, n = range_bucket(sdf, "v")
    assert n >= 1
    assert len(_PINNED) == before  # range_bucket itself pins nothing
    # caller-chained pins: release(outer) frees the inner handle too
    inner = _pin(sdf)
    outer = _pin(bucketed)
    outer._ds_pinned_input = inner
    assert len(_PINNED) == before + 2
    release(outer)
    assert len(_PINNED) == before


def test_spearman_fused_matches_scipy(spark):
    from dask_spark.operators.reductions import spearman_corr

    rng = np.random.RandomState(7)
    x = np.round(rng.normal(size=400), 1)   # heavy ties
    y = np.round(x * 0.5 + rng.normal(size=400), 1)
    pdf = pd.DataFrame({"x": x, "y": y})
    sdf = spark.createDataFrame(pdf)
    got = spearman_corr(sdf, "x", "y").compute()
    # scipy-free expected: pandas rank(average) + pearson
    rx = pdf["x"].rank(method="average")
    ry = pdf["y"].rank(method="average")
    exp = round(float(np.corrcoef(rx, ry)[0, 1]), 6)
    assert got["n"].iloc[0] == 400
    assert got["rho"].iloc[0] == pytest.approx(exp, abs=2e-6)


def test_spearman_fused_constant_column(spark):
    from dask_spark.operators.reductions import spearman_corr

    pdf = pd.DataFrame({"x": [1.0] * 10, "y": list(range(10))})
    got = spearman_corr(spark.createDataFrame(pdf), "x", "y").compute()
    assert got["rho"].iloc[0] is None or np.isnan(got["rho"].iloc[0])
