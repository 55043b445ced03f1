""".dt.tz_localize / .dt.tz_convert pandas parity — the last named
reference-surface gap (reference dask_expr/_datetime.py:31-32 proxies
both to pandas).

Engine model (frame.py DtAccessor docstring): naive series are UTC
wall-clock; an aware series is the UTC instant + a ``_tz`` tag, and
every field accessor localizes through the tag. DST semantics are the
JVM's zone rules: ambiguous fall-back local times resolve to the
EARLIER offset (== pandas ``ambiguous=True``); nonexistent
spring-forward times shift forward BY THE GAP LENGTH (02:30 in a 1h
gap → 03:30 local) — the engine names this mode
``nonexistent='shift_by_gap'``; pandas ``'shift_forward'`` snaps to
the gap END (03:00) and the pandas name is refused so it can never
silently return non-pandas values. Deviation pinned here.

Also covers the r12 dt-tail: isocalendar, round (half-to-even),
timedelta parts (days/seconds/microseconds/total_seconds/components),
is_leap_year, to_period — each against pandas on the same values.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from dask_spark.frame import DaskFrame


NY = "America/New_York"
TOKYO = "Asia/Tokyo"

# plain / ambiguous (fall-back) / post-gap / far-from-DST values
TS = [
    "2024-06-15 12:00:00",
    "2024-11-03 01:30:00",   # ambiguous in America/New_York
    "2024-12-25 23:59:59",
    "2023-01-01 00:00:00",
]


@pytest.fixture(scope="module")
def ts_frame(spark):
    pdf = pd.DataFrame({"ts": pd.to_datetime(TS)})
    sdf = spark.createDataFrame(pdf)
    return DaskFrame(sdf), pdf


def _collect(series):
    return series.compute().sort_values().reset_index(drop=True)


class TestTzLocalize:
    def test_localize_matches_pandas_utc_instants(self, ts_frame):
        df, pdf = ts_frame
        got = _collect(df["ts"].dt.tz_localize(NY))
        exp = (
            pdf["ts"]
            .dt.tz_localize(NY, ambiguous=True, nonexistent="shift_forward")
            .dt.tz_convert("UTC")
            .dt.tz_localize(None)
            .sort_values()
            .reset_index(drop=True)
            .rename(got.name)
        )
        pd.testing.assert_series_equal(got, exp)

    def test_ambiguous_fall_back_takes_earlier_offset(self, spark):
        # 2024-11-03 01:30 happens twice in New York; JVM == pandas
        # ambiguous=True == the earlier (EDT, UTC-4) instant.
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-11-03 01:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        got = df["ts"].dt.tz_localize(NY).compute().iloc[0]
        assert got == pd.Timestamp("2024-11-03 05:30:00")

    def test_nonexistent_gap_shifts_by_gap_length(self, spark):
        # 2024-03-10 02:30 does not exist in New York (1h gap at 02:00).
        # JVM shifts forward BY the gap: local 03:30 EDT = 07:30 UTC.
        # pandas shift_forward would snap to 03:00 EDT = 07:00 UTC —
        # the documented deviation.
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-03-10 02:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        got = df["ts"].dt.tz_localize(NY).compute().iloc[0]
        assert got == pd.Timestamp("2024-03-10 07:30:00")
        pandas_sf = (
            pdf["ts"]
            .dt.tz_localize(NY, nonexistent="shift_forward")
            .dt.tz_convert("UTC")
            .dt.tz_localize(None)
            .iloc[0]
        )
        assert pandas_sf == pd.Timestamp("2024-03-10 07:00:00")

    def test_localize_none_round_trips(self, ts_frame):
        df, pdf = ts_frame
        rt = _collect(df["ts"].dt.tz_localize(NY).dt.tz_localize(None))
        exp = pdf["ts"].sort_values().reset_index(drop=True).rename(rt.name)
        # round-trip is exact except the nonexistent gap value (none in TS)
        pd.testing.assert_series_equal(rt, exp)

    def test_double_localize_raises(self, ts_frame):
        df, _ = ts_frame
        aware = df["ts"].dt.tz_localize(NY)
        with pytest.raises(TypeError, match="tz-aware"):
            aware.dt.tz_localize(TOKYO)

    def test_localize_none_on_naive_raises(self, ts_frame):
        df, _ = ts_frame
        with pytest.raises(TypeError, match="tz-naive"):
            df["ts"].dt.tz_localize(None)

    def test_unsupported_dst_modes_refused(self, ts_frame):
        df, _ = ts_frame
        with pytest.raises(NotImplementedError):
            df["ts"].dt.tz_localize(NY, ambiguous="raise")

    def test_pandas_shift_forward_name_refused(self, ts_frame):
        # the engine shifts by the gap LENGTH, which is NOT pandas'
        # shift_forward (snap to gap end) — the pandas name must raise
        # rather than silently return different values; the engine
        # mode has its own name.
        df, _ = ts_frame
        with pytest.raises(NotImplementedError, match="shift_forward"):
            df["ts"].dt.tz_localize(NY, nonexistent="shift_forward")
        got = (
            df["ts"].dt.tz_localize(NY, nonexistent="shift_by_gap")
            .compute()
        )
        assert len(got) == 4


class TestTzConvert:
    def test_convert_changes_wall_clock_fields(self, ts_frame):
        df, pdf = ts_frame
        got = _collect(df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO).dt.hour)
        exp = (
            pdf["ts"]
            .dt.tz_localize("UTC")
            .dt.tz_convert(TOKYO)
            .dt.hour
            .sort_values()
            .reset_index(drop=True)
            .rename(got.name)
            .astype(got.dtype)
        )
        pd.testing.assert_series_equal(got, exp)

    def test_convert_preserves_instant(self, ts_frame):
        df, pdf = ts_frame
        got = _collect(
            df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO).dt.tz_convert(None)
        )
        exp = pdf["ts"].sort_values().reset_index(drop=True).rename(got.name)
        pd.testing.assert_series_equal(got, exp)

    def test_convert_on_naive_raises(self, ts_frame):
        df, _ = ts_frame
        with pytest.raises(TypeError, match="tz-naive"):
            df["ts"].dt.tz_convert(TOKYO)

    def test_tz_tag(self, ts_frame):
        df, _ = ts_frame
        assert df["ts"].dt.tz is None
        assert df["ts"].dt.tz_localize(NY).dt.tz == NY

    def test_aware_floor_stays_aware_and_floors_local(self, spark):
        # 23:30 UTC = 08:30 next day in Tokyo; local daily floor is
        # Tokyo midnight = 15:00 UTC, NOT UTC midnight.
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-06-15 23:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        aware = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        floored = aware.dt.floor("D")
        assert floored.dt.tz == TOKYO
        assert floored.compute().iloc[0] == pd.Timestamp("2024-06-15 15:00:00")
        exp = (
            pdf["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
            .dt.floor("D").dt.tz_convert("UTC").dt.tz_localize(None).iloc[0]
        )
        assert floored.compute().iloc[0] == exp


class TestTzPersistence:
    """The zone tag must survive frame round-trips and value-preserving
    Series ops (r12 advice: an ephemeral tag silently dropped by
    __setitem__/arithmetic meant .dt re-read UTC fields — pandas keeps
    tz in the dtype, the engine keeps it in frame-level col_tz
    metadata plus Series-op propagation)."""

    def test_setitem_getitem_round_trip(self, spark):
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-06-15 23:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        df["aware"] = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        got = df["aware"]
        assert got.dt.tz == TOKYO
        # local hour in Tokyo (UTC 23:30 → 08:30 next day), not UTC
        assert got.dt.hour.compute().iloc[0] == 8

    def test_overwrite_with_naive_clears_tag(self, spark):
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-06-15 23:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        df["x"] = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        df["x"] = df["ts"]
        assert df["x"].dt.tz is None
        assert df["x"].dt.hour.compute().iloc[0] == 23

    def test_assign_and_filter_preserve_tag(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-06-15 23:30:00",
                                   "2024-06-16 01:00:00"]),
             "k": [1, 2]}
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        df2 = df.assign(aware=df["ts"].dt.tz_localize("UTC")
                        .dt.tz_convert(TOKYO))
        sub = df2[df2["k"] == 1]
        assert sub["aware"].dt.tz == TOKYO
        assert sub["aware"].dt.hour.compute().iloc[0] == 8
        # column-list projection keeps the tag too
        proj = df2[["aware", "k"]]
        assert proj["aware"].dt.tz == TOKYO

    def test_rename_astype_move_or_clear_tag(self, spark):
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-06-15 23:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        df["a"] = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        ren = df.rename(columns={"a": "b"})
        assert ren["b"].dt.tz == TOKYO
        recast = df.astype({"a": "string"})
        assert recast._col_tz.get("a") is None

    def test_series_ops_propagate_tag(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-06-15 23:30:00", None])}
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        aware = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        assert aware.fillna(pd.Timestamp("2024-01-01")).dt.tz == TOKYO
        assert aware.where(aware.notna()).dt.tz == TOKYO
        assert aware.mask(aware.isna()).dt.tz == TOKYO
        assert aware.alias("z").dt.tz == TOKYO
        plus = aware + pd.Timedelta(hours=1)
        assert plus.dt.tz == TOKYO
        # ts - ts is a timedelta: tag correctly dropped
        assert (aware - aware).dt.tz is None

    def test_merge_and_concat_preserve_tag(self, spark):
        import dask_spark as ds

        pdf_l = pd.DataFrame(
            {"k": [1, 2], "ts": pd.to_datetime(["2024-06-15 23:30:00",
                                                "2024-06-16 01:00:00"])}
        )
        pdf_r = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
        left = DaskFrame(spark.createDataFrame(pdf_l))
        left["aware"] = left["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        right = DaskFrame(spark.createDataFrame(pdf_r))
        merged = left.merge(right, on="k")
        assert merged["aware"].dt.tz == TOKYO
        # concat: frames agreeing on the zone keep it; a naive frame
        # with the same column drops it
        both = ds.concat([merged, merged])
        assert both["aware"].dt.tz == TOKYO
        naive = merged.astype({"aware": "timestamp"})
        naive._col_tz.pop("aware", None)
        mixed = ds.concat([merged, naive])
        assert mixed["aware"].dt.tz is None

    def test_shift_keeps_awareness(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-06-15 23:30:00",
                                   "2024-06-16 01:00:00"])}
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        aware = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        assert aware.shift(1).dt.tz == TOKYO


class TestDtTail:
    def test_isocalendar(self, ts_frame):
        df, pdf = ts_frame
        got = (
            df["ts"].dt.isocalendar().compute()
            .astype("int64")
            .sort_values(["year", "week", "day"])
            .reset_index(drop=True)
        )
        exp = (
            pdf["ts"].dt.isocalendar().astype("int64")
            .sort_values(["year", "week", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp)

    @pytest.mark.parametrize("freq", ["2h", "15min", "1D"])
    def test_round_half_even(self, spark, freq):
        vals = pd.to_datetime(
            [
                "2024-06-15 01:00:00",   # exact half of 2h → even multiple
                "2024-06-15 03:00:00",   # exact half → even
                "2024-06-15 01:37:13",
                "2024-06-15 22:52:30",   # half of 15min
                "2024-06-15 12:00:00",   # half of 1D
                "2024-06-16 11:59:59.999999",
            ],
            format="ISO8601",
        )
        pdf = pd.DataFrame({"ts": vals})
        df = DaskFrame(spark.createDataFrame(pdf))
        got = _collect(df["ts"].dt.round(freq))
        exp = (
            pdf["ts"].dt.round(freq).sort_values().reset_index(drop=True)
            .rename(got.name)
        )
        pd.testing.assert_series_equal(got, exp)

    def test_round_rejects_calendar_freq(self, ts_frame):
        df, _ = ts_frame
        with pytest.raises(ValueError, match="fixed"):
            df["ts"].dt.round("M")

    def test_timedelta_parts_match_pandas(self, spark):
        a = pd.to_datetime(
            ["2024-03-10 06:30:00.750000", "2024-03-07 02:00:00",
             "2024-01-01 00:00:00"],
            format="ISO8601",
        )
        b = pd.to_datetime(
            ["2024-03-08 01:15:30", "2024-03-08 00:00:00",
             "2024-01-01 00:00:00"]
        )
        pdf = pd.DataFrame({"a": a, "b": b})
        df = DaskFrame(spark.createDataFrame(pdf))
        delta = df["a"] - df["b"]
        exp_td = pdf["a"] - pdf["b"]
        assert delta.dt.days.compute().tolist() == exp_td.dt.days.tolist()
        assert delta.dt.seconds.compute().tolist() == exp_td.dt.seconds.tolist()
        assert (
            delta.dt.microseconds.compute().tolist()
            == exp_td.dt.microseconds.tolist()
        )
        assert (
            delta.dt.total_seconds().compute().tolist()
            == exp_td.dt.total_seconds().tolist()
        )
        got_c = delta.dt.components.compute().astype("int64")
        exp_c = exp_td.dt.components.astype("int64")
        pd.testing.assert_frame_equal(
            got_c.reset_index(drop=True), exp_c.reset_index(drop=True)
        )

    def test_is_leap_year(self, spark):
        vals = pd.to_datetime(
            ["2024-01-01", "2023-01-01", "2000-01-01", "1900-01-01"]
        )
        pdf = pd.DataFrame({"ts": vals})
        df = DaskFrame(spark.createDataFrame(pdf))
        assert (
            df["ts"].dt.is_leap_year.compute().tolist()
            == pdf["ts"].dt.is_leap_year.tolist()
        )

    def test_to_period_is_floor(self, ts_frame):
        df, pdf = ts_frame
        got = _collect(df["ts"].dt.to_period("M"))
        exp = (
            pdf["ts"].dt.to_period("M").dt.start_time
            .sort_values().reset_index(drop=True).rename(got.name)
        )
        pd.testing.assert_series_equal(got, exp)

    def test_nanosecond_zero(self, ts_frame):
        df, pdf = ts_frame
        assert df["ts"].dt.nanosecond.compute().tolist() == [0] * len(pdf)

    def test_to_pydatetime(self, ts_frame):
        df, pdf = ts_frame
        got = sorted(df["ts"].dt.to_pydatetime().tolist())
        exp = sorted(pdf["ts"].dt.to_pydatetime().tolist())
        assert got == exp

    def test_to_pytimedelta(self, spark):
        pdf = pd.DataFrame(
            {
                "a": pd.to_datetime(["2024-03-10 06:00:00"]),
                "b": pd.to_datetime(["2024-03-08 01:15:30"]),
            }
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        got = (df["a"] - df["b"]).dt.to_pytimedelta().tolist()
        assert got == [datetime.timedelta(days=2, hours=4, minutes=44, seconds=30)]

    def test_timetz_naive_and_aware(self, spark):
        pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-06-15 23:30:00"])})
        df = DaskFrame(spark.createDataFrame(pdf))
        assert df["ts"].dt.timetz.compute().iloc[0] == "23:30:00"
        aware = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        assert aware.dt.timetz.compute().iloc[0] == "08:30:00 " + TOKYO

    def test_period_only_fields_refused_with_guidance(self, ts_frame):
        df, _ = ts_frame
        for prop in ("start_time", "end_time", "qyear"):
            with pytest.raises(NotImplementedError):
                getattr(df["ts"].dt, prop)
        with pytest.raises(NotImplementedError):
            df["ts"].dt.to_timestamp()
        assert df["ts"].dt.freq is None


class TestTzThroughWindowOps:
    """r15 fuzz find (seeds 424549/424611): the window-family
    row-preserving ops (cum*/shift/diff/ffill/rolling/pct_change)
    returned bare DaskFrames instead of deriving from their input, so
    the zone tag was dropped and downstream .dt fields read UTC wall
    clock. Each op here must keep the tag AND the local-hour value."""

    def _aware_frame(self, spark):
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime(["2024-06-15 23:30:00",
                                   "2024-06-16 01:00:00",
                                   "2024-06-16 02:30:00"]),
             "k": [1, 1, 2], "x": [3.0, None, 5.0], "r": [2, 1, 3]}
        )
        df = DaskFrame(spark.createDataFrame(pdf))
        df["aware"] = df["ts"].dt.tz_localize("UTC").dt.tz_convert(TOKYO)
        return df

    def _check(self, out):
        assert out["aware"].dt.tz == TOKYO
        hours = sorted(out["aware"].dt.hour.compute().tolist())
        assert hours == [8, 10, 11]  # Tokyo local, not UTC 23/1/2

    def test_cum_keyless_and_keyed(self, spark):
        df = self._aware_frame(spark)
        self._check(df.cumsum("x", order_by="r", out="cu"))
        self._check(df.cummin("x", order_by="r", by="k", out="cu"))

    def test_shift_diff_keyless(self, spark):
        df = self._aware_frame(spark)
        self._check(df.shift("x", periods=1, order_by="r", out="sh"))
        self._check(df.diff("x", periods=1, order_by="r", out="dv"))

    def test_ffill_keyed_and_keyless(self, spark):
        df = self._aware_frame(spark)
        self._check(df.ffill(["x"], order_by="r"))
        self._check(df.ffill(["x"], order_by="r", by="k"))

    def test_rolling_and_pct_change(self, spark):
        df = self._aware_frame(spark)
        self._check(df.rolling(2, on=["r"]).mean("x"))
        self._check(df.pct_change("x", order_by="r"))
