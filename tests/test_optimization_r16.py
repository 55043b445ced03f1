"""Pinning tests for r16 optimizations: every rewrite must compute
bit-for-bit what the r15 form computed."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _with_bucket_r15(sdf, col, cuts, numeric, dt, pid_col):
    """The r15 chained-projection binary search, verbatim — the
    equivalence oracle for the r16 single-expression form."""
    from dask_spark.operators.sort import _ord_double

    if not cuts:
        return sdf.withColumn(pid_col, F.lit(0))
    oc = (_ord_double(col, dt) if numeric else F.col(col))
    n = len(cuts)
    sdf = (
        sdf.withColumn("__bs_arr", F.array(*[F.lit(c) for c in cuts]))
        .withColumn("__bs_v", oc)
        .withColumn("__bs_lo", F.lit(0))
        .withColumn("__bs_hi", F.lit(n))
    )
    for _ in range(max(1, math.ceil(math.log2(n + 1)))):
        sdf = sdf.withColumn(
            "__bs_mid",
            F.floor((F.col("__bs_lo") + F.col("__bs_hi")) / 2).cast("int"),
        )
        le = (
            F.try_element_at(F.col("__bs_arr"), F.col("__bs_mid") + 1)
            <= F.col("__bs_v")
        )
        sdf = (
            sdf.withColumn(
                "__bs_lo2",
                F.when(le, F.col("__bs_mid") + 1).otherwise(F.col("__bs_lo")),
            )
            .withColumn(
                "__bs_hi",
                F.when(le, F.col("__bs_hi")).otherwise(F.col("__bs_mid")),
            )
            .withColumn("__bs_lo", F.col("__bs_lo2"))
            .drop("__bs_lo2", "__bs_mid")
        )
    pid = F.when(F.col(col).isNull(), F.lit(0)).otherwise(F.col("__bs_lo"))
    return sdf.withColumn(pid_col, pid).drop(
        "__bs_arr", "__bs_v", "__bs_lo", "__bs_hi"
    )


@pytest.mark.parametrize("ncuts", [1, 2, 3, 5, 8, 31, 100, 1000])
def test_bucket_tree_matches_chained_binary_search_doubles(spark, ncuts):
    """Random doubles incl. nulls, NaN, ±inf, exact-cut hits — the
    when-tree bucket id equals the r15 chained binary search on every
    row, and both equal #{cuts <= v}. The r15 form is only run up to
    31 cuts (the sizes the engine used at r15: n = defaultParallelism)
    because past that ITS OWN CollapseProject blowup — ~2^ceil(log2 n)
    inlined copies of a 100+-element array literal — OOMs the executor
    codegen; that pathology is what the r16 tree removes, so larger
    sizes pin against the pure-python count instead."""
    import random

    rng = random.Random(ncuts * 7919)
    cuts = sorted({round(rng.uniform(-50, 50), 3) for _ in range(ncuts)})
    vals = (
        [rng.uniform(-60, 60) for _ in range(500)]
        + list(cuts)                      # exact cut hits
        + [c + 1e-9 for c in cuts]        # just above
        + [c - 1e-9 for c in cuts]        # just below
        + [None, float("nan"), float("inf"), float("-inf")]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    dt = sdf.schema["v"].dataType
    from dask_spark.operators.sort import with_bucket

    new = with_bucket(sdf, "v", cuts, True, dt, "pid_new")
    if ncuts <= 31:
        both = _with_bucket_r15(new, "v", cuts, True, dt, "pid_old")
        assert both.filter(
            F.col("pid_new") != F.col("pid_old")
        ).count() == 0
    # and the ids really are #{cuts <= v}
    rows = new.select("v", "pid_new").collect()
    for r in rows:
        v = r["v"]
        if v is None:
            assert r["pid_new"] == 0
        elif isinstance(v, float) and math.isnan(v):
            assert r["pid_new"] == len(cuts)  # Spark: NaN > everything
        else:
            assert r["pid_new"] == sum(1 for c in cuts if c <= v)


def test_bucket_tree_matches_chained_binary_search_strings(spark):
    """Non-numeric path: raw-string comparison, same ids as r15."""
    cuts = sorted({"apple", "mango", "pear"})
    vals = ["aardvark", "apple", "applf", "zebra", None, "mango", "pe"]
    sdf = spark.createDataFrame([(v,) for v in vals], "v string")
    dt = sdf.schema["v"].dataType
    from dask_spark.operators.sort import with_bucket

    new = with_bucket(sdf, "v", cuts, False, dt, "pid_new")
    both = _with_bucket_r15(new, "v", cuts, False, dt, "pid_old")
    assert both.filter(F.col("pid_new") != F.col("pid_old")).count() == 0


def test_bucket_tree_empty_cuts(spark):
    from dask_spark.operators.sort import with_bucket

    sdf = spark.createDataFrame([(1.0,), (None,)], "v double")
    out = with_bucket(sdf, "v", [], True, sdf.schema["v"].dataType, "p")
    assert [r["p"] for r in out.collect()] == [0, 0]


class TestAdviceR16Tz:
    """r15 advice items: stale tags on overwritten outputs, and tag
    inheritance for timestamp-typed window outputs."""

    TOKYO = "Asia/Tokyo"

    def _aware_frame(self, spark):
        import pandas as pd

        from dask_spark.frame import DaskFrame

        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-06-15 23:30:00",
                                   "2024-06-16 01:00:00",
                                   "2024-06-16 02:30:00"]),
             "k": [1, 1, 2], "x": [3.0, 4.0, 5.0], "r": [2, 1, 3]}
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        df["aware"] = df["ts"].dt.tz_localize("UTC").dt.tz_convert(self.TOKYO)
        return df

    def test_out_overwriting_aware_column_clears_stale_tag(self, spark):
        """cumsum(..., out='aware') writes a NUMERIC column over a
        tz-tagged name: the stale zone tag must not survive
        (consistent with __setitem__/assign/astype)."""
        df = self._aware_frame(spark)
        for made in (
            df.cumsum("x", order_by="r", out="aware"),
            df.cumsum("x", order_by="r", by="k", out="aware"),
            df.shift("x", periods=1, order_by="r", out="aware"),
            df.diff("x", periods=1, order_by="r", by="k", out="aware"),
            df.pct_change("x", order_by="r", out="aware"),
        ):
            assert made._col_tz.get("aware") is None
            made["aware"].compute()  # and it is a usable numeric column

    def test_rolling_minmax_of_aware_column_inherits_tag(self, spark):
        """rolling min/max of a tz-aware timestamp yields tz-aware
        values (pandas keeps tz); the derived _roll_min/_roll_max
        columns must carry the source zone so .dt reads local time."""
        df = self._aware_frame(spark)
        out = df.rolling(2, on=["r"]).agg({"aware": "max"})
        assert out._col_tz.get("aware_roll_max") == self.TOKYO
        # rows ordered by r: UTC instants Jun16 01:00, Jun15 23:30,
        # Jun16 02:30 — rolling(2) max = 01:00, 01:00, 02:30 UTC,
        # read back as Tokyo local hours 10, 10, 11
        hours = out["aware_roll_max"].dt.hour.compute().tolist()
        assert sorted(hours) == [10, 10, 11]
        out2 = df.rolling(2, on=["r"], by="k").agg({"aware": "min"})
        assert out2._col_tz.get("aware_roll_min") == self.TOKYO

    def test_rolling_numeric_output_not_tagged(self, spark):
        df = self._aware_frame(spark)
        out = df.rolling(2, on=["r"]).mean("x")
        assert out._col_tz.get("x_roll_mean") is None
        assert out._col_tz.get("aware") == self.TOKYO  # source still tagged

    def test_shift_of_aware_column_inherits_tag(self, spark):
        df = self._aware_frame(spark)
        for made in (
            df.shift("aware", periods=1, order_by="r", out="prev_ts"),
            df.shift("aware", periods=1, order_by="r", by="k", out="prev_ts"),
            df.cummax("aware", order_by="r", out="prev_ts"),
        ):
            assert made._col_tz.get("prev_ts") == self.TOKYO
            assert made._col_tz.get("aware") == self.TOKYO

    def test_ffill_of_aware_column_keeps_tag(self, spark):
        df = self._aware_frame(spark)
        df["gappy"] = df["aware"]
        out = df.ffill(["gappy"], order_by="r")
        assert out._col_tz.get("gappy") == self.TOKYO
