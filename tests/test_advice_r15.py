"""Regression pins for the five round-14 ADVICE items.

1. ``DaskFrame.prod()`` routes float columns through the nanvl
   missing-source like ``_agg_all`` — a mid-plan NaN (sqrt(-1)) is a
   missing value, not a product poison; empty/all-missing columns
   still produce the min_count=0 identity 1.0.
2. ``Series.sem/skew/kurt`` adopt ``_skipna_expr`` like the other
   Series reductions: NaN neither inflates n (Spark count() counts
   NaN as non-null) nor poisons stddev/skewness/kurtosis.
3. ``GroupBy.transform('sum'|'prod')`` of an all-missing group yields
   the pandas identity (0.0 / 1.0) instead of NULL; null-key rows
   keep their dropna-NaN behavior.
4. ``_cmp_guards``'s dtype probe only swallows AnalysisException and
   caches per (frame, expression) so long comparison chains don't pay
   quadratic driver-side analysis.
5. ``_col`` refuses sub-microsecond Tick offsets (Nano(500)) instead
   of silently truncating them to a zero interval.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dask_spark.frame import DaskFrame, _probe_dtype


@pytest.fixture(scope="module")
def nanframe(spark):
    pdf = pd.DataFrame({
        "k": ["a", "a", "b", "b", None],
        "x": [-1.0, 4.0, np.nan, np.nan, 2.0],
        "y": [2.0, 3.0, 4.0, 5.0, 6.0],
    })
    return DaskFrame(spark.createDataFrame(pdf)), pdf


class TestFrameProdSkipna:
    def test_midplan_nan_is_missing(self, spark, nanframe):
        _, pdf = nanframe
        import pyspark.sql.functions as F

        # sqrt(-1) creates a mid-plan NaN in x's first row
        sdf = spark.createDataFrame(pdf).withColumn(
            "x", F.sqrt(F.col("x"))
        )
        out = DaskFrame(sdf).prod().compute()
        exp = pdf.assign(x=np.sqrt(pdf["x"]))[["x", "y"]].prod()
        assert out["x"].iloc[0] == pytest.approx(exp["x"])
        assert out["y"].iloc[0] == pytest.approx(exp["y"])

    def test_all_missing_identity(self, spark):
        pdf = pd.DataFrame({"x": [np.nan, np.nan]})
        out = DaskFrame(spark.createDataFrame(pdf)).prod().compute()
        assert out["x"].iloc[0] == 1.0


class TestSeriesMomentsSkipna:
    def test_sem_skew_kurt_ignore_nan(self, spark):
        pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 10.0, np.nan]})
        import pyspark.sql.functions as F

        # also create the NaN mid-plan so from_pandas translation
        # can't be what saves us
        sdf = spark.createDataFrame(
            pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0, 10.0, -1.0]})
        ).withColumn("x", F.when(F.col("x") < 0, F.sqrt(F.col("x")))
                           .otherwise(F.col("x")))
        s = DaskFrame(sdf)["x"]
        clean = pdf["x"].dropna()
        assert s.sem() == pytest.approx(clean.sem())
        # Spark's skewness/kurtosis are population (g1 / excess g2);
        # compare against the population forms on the CLEAN values —
        # the pin is that NaN dropped out of the moment sums
        n = len(clean)
        m = clean.mean()
        m2 = ((clean - m) ** 2).mean()
        m3 = ((clean - m) ** 3).mean()
        m4 = ((clean - m) ** 4).mean()
        assert s.skew() == pytest.approx(m3 / m2 ** 1.5)
        assert s.kurt() == pytest.approx(m4 / m2 ** 2 - 3.0)

    def test_sem_count_not_inflated(self, spark):
        # Spark count() counts NaN; with skipna n must be 2 not 3
        pdf = pd.DataFrame({"x": [1.0, 3.0, np.nan]})
        s = DaskFrame(spark.createDataFrame(pdf))["x"]
        assert s.sem() == pytest.approx(pdf["x"].sem())


class TestTransformIdentity:
    def test_all_missing_group_sum_prod(self, spark):
        pdf = pd.DataFrame({
            "k": ["a", "a", "b", "b"],
            "v": [1.0, 2.0, np.nan, np.nan],
        })
        df = DaskFrame(spark.createDataFrame(pdf))
        out = (df.groupby("k").transform("sum", "v", out="t")
               .compute().sort_values(["k", "v"]).reset_index(drop=True))
        exp = pdf.assign(t=pdf.groupby("k")["v"].transform("sum")) \
                 .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_series_equal(out["t"], exp["t"])
        assert (out[out["k"] == "b"]["t"] == 0.0).all()

        outp = (df.groupby("k").transform("prod", "v", out="t")
                .compute().sort_values(["k", "v"]).reset_index(drop=True))
        assert (outp[outp["k"] == "b"]["t"] == 1.0).all()

    def test_null_key_rows_stay_nan(self, spark):
        pdf = pd.DataFrame({
            "k": ["a", None, None],
            "v": [1.0, 2.0, 3.0],
        })
        df = DaskFrame(spark.createDataFrame(pdf))
        out = df.groupby("k").transform("sum", "v", out="t").compute()
        nullrows = out[out["k"].isna()]
        assert len(nullrows) == 2
        assert nullrows["t"].isna().all()


class TestCmpProbeCache:
    def test_probe_cached_per_expression(self, spark):
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0]})
        df = DaskFrame(spark.createDataFrame(pdf))
        s = df["x"]
        _ = (s > 1.0)
        cache = df.__dict__.get("_dtype_probe_cache")
        assert cache, "comparison must populate the probe cache"
        before = dict(cache)
        _ = (s > 2.0)
        _ = (s <= 0.5)
        # same operand expression → no new cache entries, i.e. no
        # repeated driver-side analysis
        assert dict(cache) == before

    def test_bare_column_uses_schema(self, spark):
        pdf = pd.DataFrame({"x": [1.0, 2.0]})
        df = DaskFrame(spark.createDataFrame(pdf))
        import pyspark.sql.functions as F

        assert _probe_dtype(df, F.col("x")) == "double"

    def test_comparison_still_pandas_exact(self, spark):
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0]})
        df = DaskFrame(spark.createDataFrame(pdf))
        got = (df["x"] > 1.0).compute().tolist()
        assert got == list(pdf["x"] > 1.0)


class TestTickRefusal:
    def test_nano_offset_refused(self, spark):
        pdf = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 00:00:00"]),
        })
        df = DaskFrame(spark.createDataFrame(pdf))
        with pytest.raises(TypeError, match="sub-microsecond"):
            _ = df["ts"] + pd.offsets.Nano(500)

    def test_micro_offset_still_works(self, spark):
        pdf = pd.DataFrame({
            "ts": pd.to_datetime(["2024-01-01 00:00:00"]),
        })
        df = DaskFrame(spark.createDataFrame(pdf))
        got = (df["ts"] + pd.offsets.Micro(1500)).compute()
        exp = pdf["ts"] + pd.offsets.Micro(1500)
        assert list(got) == list(exp)
