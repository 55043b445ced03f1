"""Eighth slice of the ported reference suite (r15): rolling /
resample / merge_asof — the window/tseries family (§2.7), previously
the last dataframe world with only builder-authored parity tests.

Ports the semantic halves of:
- dask/dataframe/tests/test_rolling.py — test_rolling_methods:275
  (method × window × center grid), test_rolling_cov:310,
  test_time_rolling_methods:350, test_time_rolling_cov:380,
  test_time_rolling_large_window_fixed_chunks:396,
  test_time_rolling_large_window_variable_chunks:411,
  test_rolling_agg_aggregate:443, test_groupby_rolling:489.
- dask/dataframe/tseries/tests/test_resample.py —
  test_series_resample:38 (method × freq × closed × label grid),
  test_resample_has_correct_fill_value:64, test_resample_agg:75,
  test_common_aggs:217.
- dask/dataframe/tests/test_multi.py — test_merge_asof_indexed:92,
  test_merge_asof_on_basic:110, test_merge_asof_on:154,
  test_merge_asof_left_on_right_index:173 (the four value loops),
  test_merge_asof_on_by:247, test_merge_asof_on_by_tolerance:305,
  test_merge_asof_on_by_tolerance_no_exact_matches:363.

Fresh-expectation rule (slices 1-7 discipline): expectations are
computed by pandas on THIS file's own deterministic values at test
time — no expectation constants or code are taken from the reference;
the reference supplies case STRUCTURE (methods, windows, grids,
parameter combinations) only, cited by file:line above.

Pinned deviations/adaptations:
- The engine has no row index: order rides in an explicit column
  (``i`` for row windows, ``ts`` for time windows), and the indexed /
  right_index merge_asof variants port through equivalent ``on``
  columns.
- pandas' int-window default ``min_periods=window`` is passed
  explicitly (the engine's default is 1, documented in Rolling).
- ``DataFrame.rolling().cov()`` pairwise matrices port as the
  column-pair form ``cov(col, other)``.
- Rolling.agg takes one function per column; the reference's
  list-of-aggs cases port as one call per function.
- pandas emits empty buckets between min and max on resample; the
  engine's default is the sparse Spark-first groupBy — the ports opt
  into pandas parity with ``fill=True``.
- dd.merge_asof raises on unsorted input (test_multi.py:430); the
  engine's union+window formulation needs no sort precondition, so
  there is nothing to raise — unsorted input simply works (checked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dask_spark.frame import DaskFrame
from dask_spark.operators.joins import merge_asof

RNG = np.random.default_rng(158158)
N = 25

PDF = pd.DataFrame({
    "i": np.arange(N),
    "a": RNG.standard_normal(N).cumsum(),
    "b": RNG.integers(0, 100, N).astype("float64"),
    "c": RNG.integers(0, 100, N).astype("float64"),
})

TS_IDX = (
    pd.date_range("2016-01-01", freq="3s", periods=100)
    .union(pd.date_range("2016-01-01", freq="5s", periods=100))
)[:N]
TS_PDF = pd.DataFrame({
    "ts": TS_IDX,
    "a": RNG.standard_normal(N).cumsum(),
    "b": RNG.integers(0, 100, N).astype("float64"),
    "c": RNG.integers(0, 100, N).astype("float64"),
})


def mad(x):
    return np.fabs(x - x.mean()).mean()


@pytest.fixture(scope="module")
def rowdf(spark):
    return DaskFrame(spark.createDataFrame(PDF).repartition(3))


@pytest.fixture(scope="module")
def tsdf(spark):
    return DaskFrame(spark.createDataFrame(TS_PDF).repartition(3))


def _check(got, exp, atol=1e-9, rtol=1e-7):
    got = np.asarray(got, dtype="float64")
    exp = np.asarray(exp, dtype="float64")
    assert got.shape == exp.shape
    both_nan = np.isnan(got) & np.isnan(exp)
    close = np.isclose(got, exp, atol=atol, rtol=rtol, equal_nan=True)
    assert (both_nan | close).all(), (
        f"mismatch:\n got {got}\n exp {exp}"
    )


# the reference's method grid (test_rolling.py:250 list); kurt/skew
# compare at 1e-3 like the reference's check_less_precise
METHODS = [
    ("count", (), False),
    ("sum", (), False),
    ("mean", (), False),
    ("median", (), False),
    ("min", (), False),
    ("max", (), False),
    ("std", (), True),
    ("var", (), True),
    ("skew", (), True),
    ("kurt", (), True),
    ("quantile", (0.38,), False),
    ("apply", (mad,), False),
]


def _engine_roll(roll, method, args):
    """Dispatch a reference method name onto the engine Rolling."""
    if method == "quantile":
        return roll.quantile("a", args[0]), "a_roll_quantile"
    if method == "apply":
        return roll.apply("a", args[0]), "a_roll_apply"
    if method == "median":
        return roll.median("a"), "a_roll_median"
    if method == "skew":
        return roll.skew("a"), "a_roll_skew"
    if method == "kurt":
        return roll.kurt("a"), "a_roll_kurt"
    if method == "var":
        return roll.agg({"a": "var"}), "a_roll_var"
    return getattr(roll, method)("a"), f"a_roll_{method}"


class TestRollingMethods:
    """test_rolling.py:275 — method × window × center row windows."""

    @pytest.mark.parametrize("method,args,less_precise", METHODS)
    @pytest.mark.parametrize("window", [1, 2, 4, 5])
    @pytest.mark.parametrize("center", [True, False])
    def test_rolling_methods(self, rowdf, method, args, less_precise,
                             window, center):
        min_periods = 0 if method == "count" else None
        tol = {"atol": 1e-3, "rtol": 1e-3} if less_precise else {}
        # pandas int-window default min_periods = window
        mp = window if min_periods is None else min_periods
        out, colname = _engine_roll(
            rowdf.rolling(window, on="i", min_periods=max(mp, 1),
                          center=center),
            method, args,
        )
        got = out.compute().sort_values("i")[colname]
        exp = getattr(
            PDF.set_index("i")["a"].rolling(window, center=center,
                                            min_periods=min_periods),
            method,
        )(*args)
        _check(got, exp, **tol)

    @pytest.mark.parametrize("window", [1, 2, 4, 5])
    @pytest.mark.parametrize("center", [True, False])
    def test_rolling_cov(self, rowdf, window, center):
        """test_rolling.py:310 — column-pair form."""
        out = rowdf.rolling(window, on="i", min_periods=window,
                            center=center).cov("b", "c")
        got = out.compute().sort_values("i")["b_roll_cov"]
        exp = PDF.set_index("i")["b"].rolling(window, center=center) \
            .cov(PDF.set_index("i")["c"])
        _check(got, exp)


class TestTimeRollingMethods:
    """test_rolling.py:350 — method grid over range windows on the
    reference's irregular 3s/5s-union timestamp index."""

    @pytest.mark.parametrize("method,args,less_precise", METHODS)
    @pytest.mark.parametrize("window", ["1s", "2s", "3s", "5s"])
    def test_time_rolling_methods(self, tsdf, method, args,
                                  less_precise, window):
        tol = {"atol": 1e-3, "rtol": 1e-3} if less_precise else {}
        out, colname = _engine_roll(
            tsdf.rolling(window, on="ts"), method, args
        )
        got = out.compute().sort_values("ts")[colname]
        exp = getattr(
            TS_PDF.set_index("ts")["a"].rolling(window), method
        )(*args)
        _check(got, exp, **tol)

    @pytest.mark.parametrize("window", ["1s", "2s", "3s", "5s"])
    def test_time_rolling_cov(self, tsdf, window):
        """test_rolling.py:380."""
        out = tsdf.rolling(window, on="ts").cov("b", "c")
        got = out.compute().sort_values("ts")["b_roll_cov"]
        exp = TS_PDF.set_index("ts")["b"].rolling(window) \
            .cov(TS_PDF.set_index("ts")["c"])
        _check(got, exp)


class TestTimeRollingLargeWindow:
    """Windows much larger than any range bucket — the halo grouping
    must degrade to fewer (eventually one) groups, never truncate."""

    @pytest.mark.parametrize(
        "window,n",
        [("1s", 10), ("2s", 10), ("10s", 10), ("10h", 10),
         ("10s", 100), ("10h", 100)],
    )
    def test_fixed_chunks(self, spark, window, n):
        """test_rolling.py:396."""
        pdf = pd.DataFrame({
            "ts": pd.date_range("2016-01-01", periods=n, freq="1s"),
            "b": RNG.integers(0, 100, n).astype("float64"),
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(5))
        for method in ("sum", "count", "mean"):
            out = getattr(df.rolling(window, on="ts"), method)("b")
            got = out.compute().sort_values("ts")[f"b_roll_{method}"]
            exp = getattr(pdf.set_index("ts")["b"].rolling(window),
                          method)()
            _check(got, exp)

    @pytest.mark.parametrize("window", ["2s", "5s", "20s", "10h"])
    def test_variable_chunks(self, spark, window):
        """test_rolling.py:411 — uneven partitioning must not change
        values (the reference repartitions to ragged divisions; the
        engine analog is a skewed repartition)."""
        pdf = pd.DataFrame({
            "ts": pd.date_range("2016-01-01", periods=100, freq="1s"),
            "b": RNG.integers(0, 100, 100).astype("float64"),
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(9))
        out = df.rolling(window, on="ts").sum("b")
        got = out.compute().sort_values("ts")["b_roll_sum"]
        exp = pdf.set_index("ts")["b"].rolling(window).sum()
        _check(got, exp)


class TestRollingAggAggregate:
    """test_rolling.py:443 — agg forms + raw apply."""

    def test_agg_dict(self, spark):
        pdf = pd.DataFrame({
            "i": range(5),
            "A": np.arange(5, dtype="float64"),
            "B": np.arange(0, 10, 2, dtype="float64"),
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(3))
        out = df.rolling(3, on="i", min_periods=3) \
            .agg({"A": "sum", "B": "std"}).compute().sort_values("i")
        exp = pdf.set_index("i").rolling(window=3) \
            .agg({"A": "sum", "B": lambda x: np.std(x, ddof=1)})
        _check(out["A_roll_sum"], exp["A"])
        _check(out["B_roll_std"], exp["B"])

    def test_agg_mean_std_multi(self, spark):
        pdf = pd.DataFrame({
            "i": range(5),
            "A": np.arange(5, dtype="float64"),
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(3))
        exp = pdf.set_index("i")["A"].rolling(window=3).agg(
            ["mean", "std"])
        got_m = df.rolling(3, on="i", min_periods=3).mean("A") \
            .compute().sort_values("i")["A_roll_mean"]
        got_s = df.rolling(3, on="i", min_periods=3).std("A") \
            .compute().sort_values("i")["A_roll_std"]
        _check(got_m, exp["mean"])
        _check(got_s, exp["std"])

    def test_apply_raw(self, spark):
        pdf = pd.DataFrame({
            "i": range(5),
            "A": np.arange(5, dtype="float64"),
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(2))
        got = df.rolling(3, on="i", min_periods=3) \
            .apply("A", lambda x: np.std(x, ddof=1)) \
            .compute().sort_values("i")["A_roll_apply"]
        exp = pdf.set_index("i")["A"].rolling(window=3).apply(
            lambda x: np.std(x, ddof=1), raw=True)
        _check(got, exp)


class TestGroupbyRolling:
    """test_rolling.py:489 — keyed time rolling."""

    def test_groupby_rolling_sum(self, spark):
        pdf = pd.DataFrame({
            "ts": pd.Series(
                pd.date_range("20190101", periods=60).repeat(10)),
            "column1": np.arange(600, dtype="float64"),
            "group1": 5 * [f"g{i}" for i in range(120)],
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(8))
        out = df.rolling("15d", on="ts", by="group1").sum("column1") \
            .compute().sort_values(["group1", "ts", "column1"])
        exp_frame = pdf.set_index("ts").groupby("group1") \
            .rolling("15D")["column1"].sum().reset_index() \
            .sort_values(["group1", "ts", "column1"])
        # same (group, ts) multiset of rolling sums
        _check(out["column1_roll_sum"].to_numpy(),
               exp_frame["column1"].to_numpy())

    def test_groupby_rolling_mean(self, spark):
        pdf = pd.DataFrame({
            "ts": pd.Series(
                pd.date_range("20190101", periods=60).repeat(10)),
            "column1": np.arange(600, dtype="float64"),
            "group1": 5 * [f"g{i}" for i in range(120)],
        })
        df = DaskFrame(spark.createDataFrame(pdf).repartition(8))
        out = df.rolling("15d", on="ts", by="group1").mean("column1") \
            .compute().sort_values(["group1", "ts", "column1"])
        exp = pdf.set_index("ts").groupby("group1") \
            .rolling("15D")["column1"].mean().reset_index() \
            .sort_values(["group1", "ts", "column1"])
        _check(out["column1_roll_mean"].to_numpy(),
               exp["column1"].to_numpy())


# ---------------------------------------------------------------------
# resample — tseries/tests/test_resample.py
# ---------------------------------------------------------------------

RS_IDX = pd.date_range("1-1-2000", "2-15-2000", freq="h").union(
    pd.date_range("4-15-2000", "5-15-2000", freq="h"))
RS_PDF = pd.DataFrame({
    "ts": RS_IDX,
    "a": np.arange(len(RS_IDX), dtype="float64"),
})


@pytest.fixture(scope="module")
def rsdf(spark):
    return DaskFrame(spark.createDataFrame(RS_PDF).repartition(4))


class TestSeriesResample:
    """test_resample.py:38 — method × freq × closed × label over the
    reference's gap-bearing hourly index (empty buckets must appear,
    dense grid via fill=True)."""

    @pytest.mark.parametrize("method", ["count", "mean", "ohlc"])
    @pytest.mark.parametrize("freq", ["30min", "h", "D", "W", "ME"])
    @pytest.mark.parametrize("closed", ["right", "left"])
    @pytest.mark.parametrize("label", ["right", "left"])
    def test_grid(self, rsdf, method, freq, closed, label):
        r = rsdf.resample(freq, on="ts", closed=closed, label=label,
                          fill=True)
        exp = getattr(
            RS_PDF.set_index("ts")["a"].resample(
                freq, closed=closed, label=label), method)()
        if method == "ohlc":
            got = r.ohlc("a").compute().sort_values("ts_bucket")
            assert list(got["ts_bucket"]) == list(exp.index)
            for c in ("open", "high", "low", "close"):
                _check(got[c], exp[c])
        else:
            got = getattr(r, method)("a").compute() \
                .sort_values("ts_bucket")
            assert list(got["ts_bucket"]) == list(exp.index)
            _check(got[f"a_{method}"], exp)


class TestResampleFillValue:
    """test_resample.py:64 — empty buckets fill with the count/sum
    zero identity, not NULL."""

    @pytest.mark.parametrize("method", ["count", "nunique", "sum"])
    def test_fill_value(self, rsdf, method):
        r = rsdf.resample("30min", on="ts", fill=True)
        got = getattr(r, method)("a").compute().sort_values("ts_bucket")
        exp = getattr(RS_PDF.set_index("ts")["a"].resample("30min"),
                      method)()
        assert list(got["ts_bucket"]) == list(exp.index)
        _check(got[f"a_{method}"], exp)

    def test_fill_value_size(self, rsdf):
        got = rsdf.resample("30min", on="ts", fill=True).size() \
            .compute().sort_values("ts_bucket")
        exp = RS_PDF.set_index("ts")["a"].resample("30min").size()
        assert list(got["ts_bucket"]) == list(exp.index)
        _check(got["size"], exp)


class TestResampleAgg:
    """test_resample.py:75 + :217 — agg forms and the common aggs."""

    def test_agg_mean(self, rsdf):
        got = rsdf.resample("10min", on="ts", fill=True) \
            .agg({"a": "mean"}).compute().sort_values("ts_bucket")
        exp = RS_PDF.set_index("ts")["a"].resample("10min").agg("mean")
        assert list(got["ts_bucket"]) == list(exp.index)
        _check(got["a_mean"], exp)

    def test_agg_mean_min(self, rsdf):
        got = rsdf.resample("10min", on="ts", fill=True) \
            .agg({"a": ["mean", "min"]}).compute() \
            .sort_values("ts_bucket")
        exp = RS_PDF.set_index("ts")["a"].resample("10min") \
            .agg(["mean", "min"])
        _check(got["a_mean"], exp["mean"])
        _check(got["a_min"], exp["min"])

    @pytest.mark.parametrize("agg", ["count", "mean", "size", "sum",
                                     "min", "max", "std", "var"])
    def test_common_aggs(self, rsdf, agg):
        r = rsdf.resample("D", on="ts", fill=True)
        if agg == "size":
            got = r.size().compute().sort_values("ts_bucket")["size"]
        else:
            got = r.agg({"a": agg}).compute() \
                .sort_values("ts_bucket")[f"a_{agg}"]
        exp = getattr(RS_PDF.set_index("ts")["a"].resample("D"), agg)()
        # pandas leaves empty-bucket std/var/mean as NaN; count/size/
        # sum are 0 — both checked through the same dense grid
        _check(got, exp)


# ---------------------------------------------------------------------
# merge_asof — tests/test_multi.py
# ---------------------------------------------------------------------


def _asof_check(spark, A, B, exp, **kw):
    """Run engine merge_asof and compare against a precomputed pandas
    expectation frame (sorted on the on-key + payload)."""
    a = DaskFrame(spark.createDataFrame(A).repartition(3))
    b = DaskFrame(spark.createDataFrame(B).repartition(2))
    got = merge_asof(a, b, **kw).compute()
    on = kw["on"]
    sort_cols = [on] + [c for c in exp.columns if c != on]
    g = got[exp.columns].sort_values(sort_cols).reset_index(drop=True)
    e = exp.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


class TestMergeAsofBasic:
    def test_indexed(self, spark):
        """test_multi.py:92 — the indexed variant ports through an
        explicit on-column."""
        A = pd.DataFrame({
            "k": [1, 3, 7, 9, 10, 13, 14, 17, 20, 24, 25, 28],
            "left_val": list("abcd" * 3),
        })
        B = pd.DataFrame({
            "k": [1, 2, 3, 6, 7, 10, 12, 14, 16, 19, 23, 26],
            "right_val": list("xyz" * 4),
        })
        exp = pd.merge_asof(A, B, on="k")
        _asof_check(spark, A, B, exp, on="k")

    def test_on_basic(self, spark):
        """test_multi.py:110."""
        A = pd.DataFrame({"a": [1, 5, 10], "left_val": ["a", "b", "c"]})
        B = pd.DataFrame({"a": [1, 2, 3, 6, 7],
                          "right_val": [1, 2, 3, 6, 7]})
        exp = pd.merge_asof(A, B, on="a")
        _asof_check(spark, A, B, exp, on="a")

    def test_unsorted_works(self, spark):
        """test_multi.py:430 pinned deviation: dask raises on unsorted
        input; the union+window formulation has no sort precondition,
        so unsorted input must produce the SORTED-input answer."""
        A = pd.DataFrame({"a": [1, 5, 10], "left_val": ["a", "b", "c"]})
        B = pd.DataFrame({"a": [2, 1, 3, 6, 7],
                          "right_val": [1, 2, 3, 6, 7]})
        exp = pd.merge_asof(A, B.sort_values("a"), on="a")
        _asof_check(spark, A, B, exp, on="a")


class TestMergeAsofOn:
    """test_multi.py:154 — allow_exact_matches × direction."""

    @pytest.mark.parametrize("allow_exact_matches", [True, False])
    @pytest.mark.parametrize("direction",
                             ["backward", "forward", "nearest"])
    def test_on(self, spark, allow_exact_matches, direction):
        A = pd.DataFrame({"a": [1, 5, 10], "left_val": ["a", "b", "c"]})
        B = pd.DataFrame({"a": [1, 2, 3, 6, 7],
                          "right_val": [1, 2, 3, 6, 7]})
        exp = pd.merge_asof(A, B, on="a",
                            allow_exact_matches=allow_exact_matches,
                            direction=direction)
        _asof_check(spark, A, B, exp, on="a",
                    allow_exact_matches=allow_exact_matches,
                    direction=direction)


class TestMergeAsofDuplicateKeys:
    """test_multi.py:173 — the four duplicate/offset key loops (the
    right_index form ports as an equal-named on column)."""

    @pytest.mark.parametrize("a1,idx2", [
        ([5, 10, 15, 20], [1, 2, 3, 4]),
        ([1, 2, 3, 4], [5, 10, 15, 20]),
        ([5, 5, 10, 10, 15, 15], [4, 5, 6, 9, 10, 11, 14, 15, 16]),
        ([5, 10, 15], [4, 4, 5, 5, 6, 6, 9, 9, 10, 10, 11, 11]),
    ])
    @pytest.mark.parametrize("allow_exact_matches", [True, False])
    @pytest.mark.parametrize("direction",
                             ["backward", "forward", "nearest"])
    def test_dup_keys(self, spark, a1, idx2, allow_exact_matches,
                      direction):
        A = pd.DataFrame({"a": a1, "la": [x * 10 for x in a1]})
        B = pd.DataFrame({"a": idx2, "b": idx2})
        exp = pd.merge_asof(
            A, B, on="a", allow_exact_matches=allow_exact_matches,
            direction=direction)
        _asof_check(spark, A, B, exp, on="a",
                    allow_exact_matches=allow_exact_matches,
                    direction=direction)


def _quotes_trades():
    times_A = pd.to_datetime([
        "2016-05-25 13:30:00.023", "2016-05-25 13:30:00.023",
        "2016-05-25 13:30:00.030", "2016-05-25 13:30:00.041",
        "2016-05-25 13:30:00.048", "2016-05-25 13:30:00.049",
        "2016-05-25 13:30:00.072", "2016-05-25 13:30:00.075",
    ])
    A = pd.DataFrame({
        "time": times_A,
        "ticker": ["GOOG", "MSFT", "MSFT", "MSFT", "GOOG", "AAPL",
                   "GOOG", "MSFT"],
        "bid": [720.50, 51.95, 51.97, 51.99, 720.50, 97.99, 720.50,
                52.01],
        "ask": [720.93, 51.96, 51.98, 52.00, 720.93, 98.01, 720.88,
                52.03],
    })
    times_B = pd.to_datetime([
        "2016-05-25 13:30:00.023", "2016-05-25 13:30:00.038",
        "2016-05-25 13:30:00.048", "2016-05-25 13:30:00.048",
        "2016-05-25 13:30:00.048",
    ])
    B = pd.DataFrame({
        "time": times_B,
        "ticker": ["MSFT", "MSFT", "GOOG", "GOOG", "AAPL"],
        "price": [51.95, 51.95, 720.77, 720.92, 98.00],
        "quantity": [75, 155, 100, 100, 100],
    })
    return A, B


class TestMergeAsofOnBy:
    def test_on_by(self, spark):
        """test_multi.py:247 — trades×quotes by ticker."""
        A, B = _quotes_trades()
        exp = pd.merge_asof(B, A, on="time", by="ticker")
        _asof_check(spark, B, A, exp, on="time", by="ticker")

    def test_on_by_tolerance(self, spark):
        """test_multi.py:305 — Timedelta tolerance."""
        A, B = _quotes_trades()
        exp = pd.merge_asof(B, A, on="time", by="ticker",
                            tolerance=pd.Timedelta("2ms"))
        _asof_check(spark, B, A, exp, on="time", by="ticker",
                    tolerance=pd.Timedelta("2ms"))

    def test_on_by_tolerance_no_exact_matches(self, spark):
        """test_multi.py:363."""
        A, B = _quotes_trades()
        exp = pd.merge_asof(B, A, on="time", by="ticker",
                            tolerance=pd.Timedelta("10ms"),
                            allow_exact_matches=False)
        _asof_check(spark, B, A, exp, on="time", by="ticker",
                    tolerance=pd.Timedelta("10ms"),
                    allow_exact_matches=False)
