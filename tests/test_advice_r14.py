"""Regression pins for the four round-13 ADVICE items.

1. ``aware_ts - Timestamp scalar`` is an interval and must DROP the tz
   tag (frame.py __sub__ previously propagated it, so .dt accessors on
   the resulting timedelta wrapped it in from_utc_timestamp and failed
   analysis); ``aware_ts - Timedelta/offset`` is still a timestamp and
   keeps the tag.
2. Row/column-preserving frame ops (drop_duplicates, random_split,
   get_partition, where/clip, pop) must carry ``_col_tz`` forward so
   .dt fields on an aware column never silently read UTC wall-clock.
3. ``Bag.random_sample`` rounds the 1e-6 hash threshold (int() was a
   systematic under-sample) and rejects prob outside [0, 1].
4. axis=1 reductions pandas parity: count(axis=1) counts non-null
   cells in ALL columns, integer inputs keep integer sums, and
   any/all(axis=1) with zero boolean columns return constant
   False/True like pandas on an empty axis.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from dask_spark.bag import Bag
from dask_spark.frame import DaskFrame

NY = "America/New_York"


@pytest.fixture(scope="module")
def aware(spark):
    pdf = pd.DataFrame({
        "ts": pd.to_datetime([
            "2024-06-15 12:00:00", "2024-06-15 12:00:00",
            "2024-12-25 23:59:59",
        ]),
        "k": [1, 1, 2],
    })
    df = DaskFrame(spark.createDataFrame(pdf))
    df["ts"] = df["ts"].dt.tz_localize(NY)
    return df, pdf


class TestSubTzTag:
    def test_minus_timestamp_scalar_drops_tag(self, aware):
        df, _ = aware
        delta = df["ts"] - pd.Timestamp("2024-06-01 00:00:00")
        assert getattr(delta, "_tz", None) is None
        assert delta.dt.tz is None
        # the r13 failure mode: .dt.total_seconds on the tagged
        # interval raised AnalysisException — must now compute
        secs = sorted(delta.dt.total_seconds().compute())
        assert all(isinstance(s, float) for s in secs)
        assert secs[0] > 0

    def test_minus_datetime_scalar_drops_tag(self, aware):
        df, _ = aware
        delta = df["ts"] - datetime.datetime(2024, 6, 1)
        assert getattr(delta, "_tz", None) is None

    def test_minus_timedelta_keeps_tag(self, aware):
        df, _ = aware
        shifted = df["ts"] - pd.Timedelta(hours=1)
        assert getattr(shifted, "_tz", None) == NY
        shifted2 = df["ts"] - datetime.timedelta(hours=1)
        assert getattr(shifted2, "_tz", None) == NY

    def test_minus_offset_keeps_tag(self, aware):
        df, _ = aware
        shifted = df["ts"] - pd.tseries.offsets.Hour(2)
        assert getattr(shifted, "_tz", None) == NY


class TestColTzThroughRowPreservingOps:
    def _hour_local(self, df):
        return sorted(df["ts"].dt.hour.compute())

    def test_drop_duplicates(self, aware):
        df, _ = aware
        out = df.drop_duplicates()
        assert out._col_tz.get("ts") == NY
        # June noon NY = 16:00 UTC; local hour must read 12, not 16
        assert 12 in self._hour_local(out)

    def test_drop_duplicates_subset_keep_first(self, aware):
        df, _ = aware
        out = df.drop_duplicates(subset=["k"], keep="first")
        assert out._col_tz.get("ts") == NY

    def test_random_split(self, aware):
        df, _ = aware
        parts = df.random_split([0.5, 0.5], seed=7)
        for p in parts:
            assert p._col_tz.get("ts") == NY

    def test_get_partition(self, aware):
        df, _ = aware
        out = df.get_partition(0)
        assert out._col_tz.get("ts") == NY

    def test_where_and_clip(self, aware):
        df, _ = aware
        out = df.where(df["k"] >= 1)
        assert out._col_tz.get("ts") == NY
        out2 = df.clip(lower=0)
        assert out2._col_tz.get("ts") == NY

    def test_pop_carries_series_tag_and_clears_frame(self, aware):
        df, _ = aware
        d = df.copy()
        s = d.pop("ts")
        assert getattr(s, "_tz", None) == NY
        assert "ts" not in d._col_tz
        assert 12 in sorted(s.dt.hour.compute())


class TestBagRandomSample:
    def test_prob_validated(self, spark):
        b = Bag.from_sequence(list(range(10)))
        with pytest.raises(ValueError):
            b.random_sample(1.5)
        with pytest.raises(ValueError):
            b.random_sample(-0.1)

    def test_bound_rounded_not_truncated(self, spark):
        # int(0.3 * 1e6) == 299999; the exact boundary hash value
        # 299999 must now be KEPT under prob=0.3 (bound 300000).
        b = Bag.from_sequence(list(range(2000)))
        n = b.random_sample(0.3, seed=42).count()
        # deterministic under the seed — pin the exact draw
        assert n == b.random_sample(0.3, seed=42).count()
        assert 0 < n < 2000

    def test_edge_probs(self, spark):
        b = Bag.from_sequence(list(range(50)))
        assert b.random_sample(0.0).count() == 0
        assert b.random_sample(1.0).count() == 50


class TestRowwisePandasParity:
    @pytest.fixture(scope="class")
    def mixed(self, spark):
        pdf = pd.DataFrame({
            "a": [1, 2, None],
            "b": [10, None, 30],
            "s": ["x", None, "z"],
        })
        pdf["a"] = pdf["a"].astype("Int64")
        pdf["b"] = pdf["b"].astype("Int64")
        sdf = spark.createDataFrame(
            [(1, 10, "x"), (2, None, None), (None, 30, "z")],
            schema="a bigint, b bigint, s string",
        )
        return DaskFrame(sdf), pdf

    def test_count_axis1_counts_all_columns(self, mixed):
        df, pdf = mixed
        got = sorted(df.count(axis=1).compute())
        exp = sorted(pdf.count(axis=1).tolist())
        assert got == exp  # [1, 2, 2] with the string column counted

    def test_integer_sum_stays_integer(self, mixed):
        df, _ = mixed
        s = df.sum(axis=1)
        out = s.compute()
        assert out.dtype.kind == "i"
        assert sorted(out.tolist()) == sorted([11, 2, 30])

    def test_integer_min_max_stay_integer(self, mixed):
        df, _ = mixed
        assert df.min(axis=1).compute().dtype.kind == "i"
        assert df.max(axis=1).compute().dtype.kind == "i"

    def test_float_inputs_still_float(self, spark):
        df = DaskFrame(spark.createDataFrame(
            [(1.5, 2.5)], schema="a double, b double"))
        assert df.sum(axis=1).compute()[0] == 4.0

    def test_any_all_no_boolean_columns(self, mixed):
        df, pdf = mixed
        got_any = df.any(axis=1).compute()
        got_all = df.all(axis=1).compute()
        assert list(got_any) == [False, False, False]
        assert list(got_all) == [True, True, True]
