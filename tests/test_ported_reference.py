"""Ported slice of the reference's own test suite (r12 verdict item 2).

~100 representative cases from dask/dataframe/tests/test_dataframe.py,
test_groupby.py and test_arithmetics_reduction.py, re-expressed through
``dask_spark.testing.assert_eq`` — the same shape the reference's suite
uses (dask/dataframe/utils.py assert_eq). Each test cites the reference
test it ports (file:line of the `def test_...`). All expectation code
is freshly written pandas; nothing is copied from the reference.

Behavioral deviations found during the port, pinned where they appear:

- NO ROW ORDER / NO INDEX: the engine is a partitioned Spark frame
  with no implicit row order and no index. Reference tests that
  assert positional results (head equality, cumulative/shift/diff
  without a key, idxmax labels) port to the engine's explicit
  contract: ``order_by=`` for order-dependent ops, ``id_col=`` for
  idx* label reads, and set-equality for head/sample.
- DIVISIONS/PARTITION layout asserts don't port (Catalyst owns the
  physical plan); the semantic half of those tests is kept.
- ``value_counts`` / ``unique`` / ``mode`` return one-column frames
  (no pandas Index to ride on), compared by value set.
- dtype WIDTHS are lenient (Spark ints come back int32/int64 where
  pandas may hold float64-with-NaN) — assert_eq(check_dtype=False),
  matching the reference's own check_dtype=False usage for these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
from dask_spark.frame import DaskFrame
from dask_spark.testing import assert_eq


# ---------------------------------------------------------------------
# canonical fixtures (shapes follow the reference suite's `d`/`full`
# pair: small ints, floats with nans, strings, a group key)
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(
        {
            "a": [1, 2, 3, 4, 5, 6, 7, 8, 9],
            "b": [4.0, 5.0, 6.0, 3.0, 2.0, 1.0, 0.0, 0.0, 0.0],
            "c": list("aabbccdde"),
            "i": list(range(9)),
        }
    )


@pytest.fixture(scope="module")
def df(spark, pdf):
    return ds.from_pandas(pdf)


@pytest.fixture(scope="module")
def gb_pdf():
    # groupby battery frame (reference test_groupby.py `pdf` style):
    # key with repeats + nulls, two value columns with nans
    rs = np.random.RandomState(42)
    n = 60
    out = pd.DataFrame(
        {
            "g": rs.randint(0, 5, n).astype("float64"),
            "h": rs.choice(list("xyz"), n),
            "x": rs.randn(n),
            "y": rs.randint(0, 100, n).astype("float64"),
            "i": np.arange(n),
        }
    )
    out.loc[::13, "g"] = np.nan
    out.loc[::7, "x"] = np.nan
    return out


@pytest.fixture(scope="module")
def gb_df(spark, gb_pdf):
    return ds.from_pandas(gb_pdf)


# =====================================================================
# Frame basics — reference test_dataframe.py
# =====================================================================

class TestFrameBasics:
    def test_dataframe_elementwise(self, df, pdf):
        """test_dataframe.py:84 test_Dataframe — (a + 1) and frame
        column arithmetic match pandas."""
        got = (df["a"] + 1).compute()
        exp = pdf["a"] + 1
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_head_tail(self, df, pdf):
        """test_dataframe.py:105 test_head_tail — n rows, all drawn
        from the data (no row order here: set-containment, not
        positional equality)."""
        h = df.head(3)
        assert len(h) == 3
        assert set(h["a"]).issubset(set(pdf["a"]))
        t = df.tail(2)
        assert len(t) == 2

    def test_attributes(self, df, pdf):
        """test_dataframe.py:209 test_attributes — columns are
        attribute-accessible and tab-complete (dask FrameBase.__dir__
        merges column names; added during this port)."""
        assert list(df.columns) == list(pdf.columns)
        assert df.ndim == 2
        assert "a" in dir(df)
        assert sorted(df.a.compute().tolist()) == sorted(pdf.a.tolist())

    def test_len_size_shape(self, df, pdf):
        """test_dataframe.py:1315/1324/1330 test_len/test_size/
        test_shape."""
        assert len(df) == len(pdf)
        assert df.size == pdf.size
        r, c = df.shape
        assert (r, c) == pdf.shape

    def test_series_axes(self, df):
        """test_dataframe.py:202 test_series_axes / 195 test_axes."""
        assert df["a"].ndim == 1
        assert df["a"].shape == (9,)
        assert len(df.axes) == 2

    def test_column_names(self, df, pdf):
        """test_dataframe.py:224 test_column_names — projections keep
        names."""
        assert list(df[["b", "a"]].columns) == ["b", "a"]
        assert df["a"].name == "a"

    def test_rename_columns(self, df, pdf):
        """test_dataframe.py:256 test_rename_columns / 2740
        test_rename_dict."""
        got = df.rename(columns={"a": "A", "b": "B"})
        assert list(got.columns) == ["A", "B", "c", "i"]
        assert_eq(got[["A"]], pdf.rename(columns={"a": "A"})[["A"]])

    def test_rename_series(self, df, pdf):
        """test_dataframe.py:283 test_rename_series."""
        s = df["a"].rename("renamed")
        assert s.name == "renamed"
        assert sorted(s.compute().tolist()) == sorted(pdf["a"].tolist())

    def test_describe_numeric(self, df, pdf):
        """test_dataframe.py:353 test_describe_numeric — count/mean/
        std/min/max agree with pandas describe. Engine shape is LONG
        form (one row per column, stats as columns) for oracle-stable
        schemas — a pinned deviation from pandas' wide form."""
        got = df[["a", "b"]].describe().compute()
        exp = pdf[["a", "b"]].describe()
        row = got[got["column"] == "a"].iloc[0]
        for stat in ("count", "mean", "std", "min", "max"):
            assert abs(float(row[stat]) - float(exp.loc[stat, "a"])) < 1e-6

    def test_empty(self, spark):
        """test_dataframe.py:5068 test_empty — zero-row frame keeps
        schema and computes to an empty pandas frame."""
        pdf0 = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="float64")})
        df0 = ds.from_pandas(pdf0)
        out = df0.compute()
        assert len(out) == 0
        assert list(out.columns) == ["a", "b"]

    def test_contains_frame(self, df):
        """test_dataframe.py:1307 test_contains_frame — `in` is column
        membership (added during this port)."""
        assert "a" in df
        assert "zzz" not in df

    def test_iter(self, df, pdf):
        """test_dataframe.py:4836 test_iter — frame iteration yields
        column names (added during this port)."""
        assert list(df) == list(pdf)

    def test_series_iter(self, df, pdf):
        """test_dataframe.py:3385 test_series_iter — series iteration
        yields values (added during this port; toLocalIterator, never
        one big collect)."""
        assert sorted(df["a"]) == sorted(pdf["a"])

    def test_series_len(self, df, pdf):
        """test_dataframe.py:1315 test_len (series leg — added during
        this port)."""
        assert len(df["a"]) == len(pdf["a"])

    def test_itertuples(self, spark):
        """test_dataframe.py:3400 test_dataframe_itertuples."""
        pdf = pd.DataFrame({"x": [1, 2], "y": [10, 20]})
        df = ds.from_pandas(pdf)
        got = sorted((t.x, t.y) for t in df.itertuples())
        exp = sorted((t.x, t.y) for t in pdf.itertuples())
        assert got == exp

    def test_iterrows(self, spark):
        """test_dataframe.py:3392 test_dataframe_iterrows — pinned
        deviation: no index, so the engine yields plain row DICTS
        rather than pandas' (label, Series) pairs."""
        pdf = pd.DataFrame({"x": [1, 2], "y": [10, 20]})
        df = ds.from_pandas(pdf)
        got = sorted((r["x"], r["y"]) for r in df.iterrows())
        exp = sorted((r["x"], r["y"]) for _, r in pdf.iterrows())
        assert got == exp

    def test_copy(self, df, pdf):
        """test_dataframe.py:4102 test_copy — copy is free and
        mutating the copy leaves the original intact."""
        c = df.copy()
        c["new"] = c["a"] + 1
        assert "new" in c.columns
        assert "new" not in df.columns


# =====================================================================
# Elementwise / NA handling
# =====================================================================

class TestElementwiseNA:
    def test_dropna(self, spark):
        """test_dataframe.py:698 test_dropna — how=any/all, subset,
        thresh."""
        pdf = pd.DataFrame(
            {"x": [1.0, np.nan, 3.0, np.nan],
             "y": [1.0, 2.0, np.nan, np.nan]}
        )
        df = ds.from_pandas(pdf)
        assert_eq(df.dropna(), pdf.dropna())
        assert_eq(df.dropna(how="all"), pdf.dropna(how="all"))
        assert_eq(df.dropna(subset=["x"]), pdf.dropna(subset=["x"]))
        assert_eq(df.dropna(thresh=2), pdf.dropna(thresh=2))

    def test_clip(self, df, pdf):
        """test_dataframe.py:741 test_clip."""
        got = df["b"].clip(lower=1.0, upper=4.0).compute()
        exp = pdf["b"].clip(lower=1.0, upper=4.0)
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_where_mask(self, df, pdf):
        """test_dataframe.py:832 test_where_mask — where keeps rows
        matching cond, mask inverts; element form on Series."""
        got_w = df["a"].where(df["a"] > 3, other=-1).compute()
        exp_w = pdf["a"].where(pdf["a"] > 3, other=-1)
        assert sorted(got_w.tolist()) == sorted(exp_w.tolist())
        got_m = df["a"].mask(df["a"] > 3, other=-1).compute()
        exp_m = pdf["a"].mask(pdf["a"] > 3, other=-1)
        assert sorted(got_m.tolist()) == sorted(exp_m.tolist())

    def test_mask_where_callable(self, df, pdf):
        """test_dataframe.py:5189 test_mask_where_callable — frame
        where keeps the SHAPE and nulls non-matching rows (pandas
        semantics)."""
        got = df.where_frame(df["a"] > 4).compute()
        exp = pdf.where(pdf["a"] > 4)
        assert len(got) == len(exp)
        assert got["a"].notna().sum() == exp["a"].notna().sum()

    def test_fillna(self, spark):
        """test_dataframe.py:2358 test_fillna."""
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0], "y": [np.nan, 2.0, 3.0]})
        df = ds.from_pandas(pdf)
        assert_eq(df.fillna(0.0), pdf.fillna(0.0))
        got = df["x"].fillna(9.0).compute()
        assert sorted(got.tolist()) == sorted(pdf["x"].fillna(9.0).tolist())

    def test_ffill_bfill(self, spark):
        """test_dataframe.py:2370/2388/2467 test_ffill/test_bfill —
        the engine requires an explicit order column (no row order)."""
        pdf = pd.DataFrame(
            {"i": [0, 1, 2, 3, 4],
             "x": [1.0, np.nan, np.nan, 4.0, np.nan]}
        )
        df = ds.from_pandas(pdf)
        def _nan_eq(a, b):
            return all(
                (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(a, b)
            )

        got = df.ffill(["x"], order_by="i").compute().sort_values("i")
        exp = pdf.sort_values("i").ffill()
        assert _nan_eq(got["x"].tolist(), exp["x"].tolist())
        got_b = df.bfill(["x"], order_by="i").compute().sort_values("i")
        exp_b = pdf.sort_values("i").bfill()
        assert _nan_eq(got_b["x"].tolist(), exp_b["x"].tolist())

    def test_isna(self, spark):
        """test_dataframe.py:4350 test_isna."""
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0]})
        df = ds.from_pandas(pdf)
        assert_eq(df.isna(), pdf.isna())
        got = df["x"].isna().compute()
        assert sorted(got.tolist(), key=bool) == sorted(
            pdf["x"].isna().tolist(), key=bool
        )

    def test_astype(self, df, pdf):
        """test_dataframe.py:3439 test_astype."""
        got = df.astype({"a": "float64"})
        assert "double" in dict(got.dtypes)["a"]
        assert_eq(got[["a"]], pdf.astype({"a": "float64"})[["a"]])

    def test_abs(self, spark):
        """test_dataframe.py:2974 test_abs."""
        pdf = pd.DataFrame({"x": [-1.0, 2.0, -3.5]})
        df = ds.from_pandas(pdf)
        assert_eq(df.abs(), pdf.abs())
        assert sorted(df["x"].abs().compute().tolist()) == sorted(
            pdf["x"].abs().tolist()
        )

    def test_round(self, spark):
        """test_dataframe.py:1977 test_series_round / 2992
        test_round."""
        pdf = pd.DataFrame({"x": [1.234, 2.567, 3.891]})
        df = ds.from_pandas(pdf)
        assert sorted(df["x"].round(1).compute().tolist()) == sorted(
            pdf["x"].round(1).tolist()
        )
        assert_eq(df.round(1), pdf.round(1))

    def test_replace(self, df, pdf):
        """test_dataframe.py:4742 test_replace."""
        got = df["a"].replace({1: 100, 2: 200}).compute()
        exp = pdf["a"].replace({1: 100, 2: 200})
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_mod_eq(self, df, pdf):
        """test_dataframe.py:4656 test_mod_eq."""
        got = (df["a"] % 2 == 0).compute()
        exp = pdf["a"] % 2 == 0
        assert got.sum() == exp.sum()

    def test_inplace_operators(self, spark, pdf):
        """test_dataframe.py:3661 test_inplace_operators — setitem
        with derived column."""
        df = ds.from_pandas(pdf)
        df["a2"] = df["a"] * 2
        exp = pdf.assign(a2=pdf["a"] * 2)
        assert_eq(df[["a", "a2"]], exp[["a", "a2"]])

    def test_series_map(self, df, pdf):
        """test_dataframe.py Series.map via apply (reference
        test_apply:2860 elementwise form)."""
        got = df["a"].map(lambda x: x * 10, dtype="bigint").compute()
        exp = pdf["a"].map(lambda x: x * 10)
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_coerce_bool_raises(self, df):
        """test_dataframe.py:4478 test_bool — ambiguous collection
        truth value raises (pandas/dask parity; added during this
        port — previously object-truthy, a silent-wrong-answer
        hazard in `if series:`)."""
        with pytest.raises(TypeError, match="ambiguous"):
            bool(df)
        s = df["a"] == 3
        with pytest.raises(TypeError, match="ambiguous"):
            if s:  # noqa: B015
                pass


# =====================================================================
# Selection / projection
# =====================================================================

class TestSelection:
    def test_getitem_bool_series(self, df, pdf):
        """test_dataframe.py:3871 test_getitem_with_bool_dataframe_as
        _key (series-mask form)."""
        assert_eq(df[df["a"] > 5], pdf[pdf["a"] > 5])

    def test_query(self, df, pdf):
        """test_dataframe.py:2536 test_query."""
        assert_eq(df.query("a > 4 and b < 3"),
                  pdf.query("a > 4 and b < 3"))

    def test_select_dtypes(self, df, pdf):
        """test_dataframe.py:2555 test_select_dtypes."""
        got = df.select_dtypes(include=["number"])
        exp = pdf.select_dtypes(include=["number"])
        assert sorted(got.columns) == sorted(exp.columns)

    def test_isin(self, df, pdf):
        """test_dataframe.py:1267 test_isin."""
        got = df["a"].isin([1, 3, 5]).compute()
        exp = pdf["a"].isin([1, 3, 5])
        assert got.sum() == exp.sum()
        # frame form
        assert len(df.isin_filter("a", [1, 3, 5])) == int(exp.sum())
        # distributed collection rejected, like dask
        with pytest.raises(TypeError):
            df["a"].isin(df["b"])

    def test_drop_columns(self, df, pdf):
        """test_dataframe.py:2700 test_drop_axis_1 / 2716
        test_drop_columns."""
        assert list(df.drop("c").columns) == ["a", "b", "i"]
        assert list(df.drop(["b", "c"]).columns) == ["a", "i"]

    def test_pop(self, spark, pdf):
        """test_dataframe.py:4812 test_pop."""
        df = ds.from_pandas(pdf)
        s = df.pop("c")
        assert s.name == "c"
        assert "c" not in df.columns

    def test_assign(self, df, pdf):
        """test_dataframe.py:1578 test_assign."""
        got = df.assign(d=df["a"] + df["b"], e=1)
        exp = pdf.assign(d=pdf["a"] + pdf["b"], e=1)
        assert_eq(got[["d", "e"]], exp[["d", "e"]])

    def test_assign_callable(self, df, pdf):
        """test_dataframe.py:1638 test_assign_callable."""
        got = df.assign(d=lambda f: f["a"] * 2)
        exp = pdf.assign(d=lambda f: f["a"] * 2)
        assert_eq(got[["d"]], exp[["d"]])

    def test_assign_dtypes(self, df):
        """test_dataframe.py:1645 test_assign_dtypes — literal assign
        takes the literal's type."""
        got = df.assign(flag=True)
        assert dict(got.dtypes)["flag"] == "boolean"

    def test_setitem(self, spark, pdf):
        """test_dataframe.py:4665 test_setitem."""
        df = ds.from_pandas(pdf)
        df["k"] = 0
        assert set(df["k"].compute()) == {0}

    def test_setitem_with_bool_series_as_key(self, spark, pdf):
        """test_dataframe.py:4681 — df[df.a > 5] = value is
        unsupported in dask too; the engine raises TypeError on
        non-string keys."""
        df = ds.from_pandas(pdf)
        with pytest.raises(Exception):
            df[df["a"] > 5] = 0

    def test_columns_assignment_via_rename(self, df):
        """test_dataframe.py:3633 test_columns_assignment — engine
        spelling is rename(columns=...)."""
        got = df.rename(columns=dict(zip(df.columns, ["w", "x", "y", "z"])))
        assert list(got.columns) == ["w", "x", "y", "z"]


# =====================================================================
# Reductions
# =====================================================================

class TestReductions:
    def test_reductions_battery(self, df, pdf):
        """test_arithmetics_reduction.py reductions battery +
        test_dataframe.py:4226 test_dataframe_reductions_arithmetic."""
        for fn in ("sum", "mean", "min", "max", "std", "var", "count"):
            got = getattr(df["b"], fn)()
            exp = getattr(pdf["b"], fn)()
            assert abs(got - exp) < 1e-6, fn

    def test_reductions_with_nans(self, spark):
        """test_arithmetics_reduction.py:~ reductions skip NaN like
        pandas (skipna=True default)."""
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0, np.nan, 5.0]})
        df = ds.from_pandas(pdf)
        assert abs(df["x"].sum() - 9.0) < 1e-9
        assert abs(df["x"].mean() - 3.0) < 1e-9
        assert df["x"].count() == 3

    def test_prod_sem_skew_kurt(self, spark):
        """test_dataframe.py reductions tail: prod/sem match pandas;
        skew/kurt follow the REFERENCE's convention — dask skew/
        kurtosis default to scipy-style ``bias=True`` POPULATION
        moments (dask _reductions skew/kurtosis docstrings), which is
        Spark's skewness/kurtosis exactly. pandas' bias-corrected
        G1/G2 differ; the population value is pinned here."""
        pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 5.0]})
        df = ds.from_pandas(pdf)
        assert abs(df["x"].prod() - pdf["x"].prod()) < 1e-9
        assert abs(df["x"].sem() - pdf["x"].sem()) < 1e-9
        p = pdf["x"]
        m, m2 = p.mean(), ((p - p.mean()) ** 2).mean()
        skew_pop = ((p - m) ** 3).mean() / m2 ** 1.5
        kurt_pop = ((p - m) ** 4).mean() / m2 ** 2 - 3
        assert abs(df["x"].skew() - skew_pop) < 1e-9
        assert abs(df["x"].kurt() - kurt_pop) < 1e-9

    def test_nunique(self, df, pdf):
        """test_dataframe.py:4825 test_nunique."""
        assert df["c"].nunique() == pdf["c"].nunique()

    def test_value_counts(self, df, pdf):
        """test_dataframe.py:1174 test_value_counts."""
        got = df["c"].value_counts().compute()
        exp = pdf["c"].value_counts()
        gmap = dict(zip(got["c"], got["count"]))
        assert gmap == exp.to_dict()

    def test_value_counts_with_dropna(self, spark):
        """test_dataframe.py:1196 test_value_counts_with_dropna."""
        pdf = pd.DataFrame({"x": ["a", "a", None, "b"]})
        df = ds.from_pandas(pdf)
        got = df["x"].value_counts(dropna=True).compute()
        assert len(got) == 2
        got_keep = df["x"].value_counts(dropna=False).compute()
        assert len(got_keep) == 3

    def test_value_counts_with_normalize(self, df, pdf):
        """test_dataframe.py:1207 test_value_counts_with_normalize."""
        got = df["c"].value_counts(normalize=True).compute()
        exp = pdf["c"].value_counts(normalize=True)
        gmap = dict(zip(got["c"], got["proportion"]))
        for k, v in exp.items():
            assert abs(gmap[k] - v) < 1e-9

    def test_unique(self, df, pdf):
        """test_dataframe.py:1245 test_unique."""
        got = df["c"].unique().compute()
        assert set(got["c"]) == set(pdf["c"].unique())

    def test_quantile(self, df, pdf):
        """test_dataframe.py:1361 test_quantile — approximate sketch,
        loose tolerance like the reference's tdigest variant."""
        got = df["a"].quantile(0.5)
        exp = pdf["a"].quantile(0.5)
        assert abs(got - exp) <= 1.0

    def test_dataframe_quantile(self, df, pdf):
        """test_dataframe.py:1453 test_dataframe_quantile — list of
        levels → pandas frame indexed by level."""
        got = df[["a", "b"]].quantile([0.25, 0.75])
        assert list(got.index) == [0.25, 0.75]
        assert set(got.columns) == {"a", "b"}

    def test_median(self, df, pdf):
        """test_dataframe.py:4235 test_median / 4268
        test_median_approximate."""
        got = df["a"].median()
        assert abs(got - pdf["a"].median()) <= 1.0
        got_a = df["a"].median_approximate()
        assert abs(got_a - pdf["a"].median()) <= 1.0

    def test_idxmaxmin(self, spark):
        """test_dataframe.py:3680 test_idxmaxmin — the engine reads
        labels through an explicit id column (no index). Tie-free
        values: on ties pandas returns the FIRST positional label,
        a notion the engine deliberately lacks (min_by picks an
        arbitrary tied row) — same caveat dask documents."""
        pdf = pd.DataFrame({"i": [10, 11, 12, 13],
                            "b": [5.0, 1.0, 9.0, 3.0]})
        df = ds.from_pandas(pdf)
        assert df["b"].idxmax(id_col="i") == pdf.set_index("i")["b"].idxmax()
        assert df["b"].idxmin(id_col="i") == pdf.set_index("i")["b"].idxmin()

    def test_mode(self, spark):
        """test_dataframe.py:3825 test_mode_numeric_only (mode core)."""
        pdf = pd.DataFrame({"x": [1, 1, 2, 3, 3]})
        df = ds.from_pandas(pdf)
        got = df["x"].mode().compute()
        assert set(got["x"]) == set(pdf["x"].mode())

    def test_cov_corr(self, df, pdf):
        """test_dataframe.py:3007/3031/3080 test_cov_dataframe /
        test_cov_series / test_corr."""
        assert abs(df["a"].cov(df["b"]) - pdf["a"].cov(pdf["b"])) < 1e-9
        assert abs(df["a"].corr(df["b"]) - pdf["a"].corr(pdf["b"])) < 1e-9
        assert abs(df.cov("a", "b") - pdf["a"].cov(pdf["b"])) < 1e-9

    def test_corr_same_name(self, df, pdf):
        """test_dataframe.py:3145 test_corr_same_name."""
        assert abs(df["a"].corr(df["a"]) - 1.0) < 1e-9

    def test_autocorr(self, spark):
        """test_dataframe.py:3245 test_autocorr — explicit order."""
        pdf = pd.DataFrame({"i": range(30),
                            "x": np.sin(np.arange(30) / 3.0)})
        df = ds.from_pandas(pdf)
        got = df["x"].autocorr(lag=1, order_by="i")
        exp = pdf.sort_values("i")["x"].autocorr(lag=1)
        assert abs(got - exp) < 1e-6

    def test_nlargest_nsmallest(self, df, pdf):
        """test_dataframe.py:3309 test_nlargest_nsmallest."""
        got = df["a"].nlargest(3).compute()
        assert sorted(got["a"].tolist()) == sorted(
            pdf["a"].nlargest(3).tolist()
        )
        got_s = df["a"].nsmallest(2).compute()
        assert sorted(got_s["a"].tolist()) == sorted(
            pdf["a"].nsmallest(2).tolist()
        )

    def test_frame_nlargest(self, df, pdf):
        """test_dataframe.py:3309 frame form."""
        got = df.nlargest(3, "a").compute()
        exp = pdf.nlargest(3, "a")
        assert sorted(got["a"].tolist()) == sorted(exp["a"].tolist())

    def test_dot(self, df, pdf):
        """test_dataframe.py:4907 test_dot."""
        got = df["a"].dot(df["b"])
        exp = pdf["a"].dot(pdf["b"])
        assert abs(got - exp) < 1e-9

    def test_dot_nan(self, spark):
        """test_dataframe.py:4936 test_dot_nan — NaN contributes
        nothing (Spark sum skips null products) where pandas yields
        NaN; pinned engine deviation: nulls are skipped."""
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0], "y": [1.0, 1.0, 1.0]})
        df = ds.from_pandas(pdf)
        assert abs(df["x"].dot(df["y"]) - 4.0) < 1e-9

    def test_is_monotonic_numeric(self, spark):
        """test_dataframe.py:4994 test_is_monotonic_numeric — engine
        evaluates monotonicity in order_by order."""
        pdf = pd.DataFrame({"i": range(5), "x": [1.0, 2.0, 2.0, 3.0, 4.0]})
        df = ds.from_pandas(pdf)
        assert df["x"].is_monotonic_increasing(order_by="i")
        assert not df["x"].is_monotonic_decreasing(order_by="i")

    def test_memory_usage(self, df):
        """test_dataframe.py:4140 test_memory_usage_dataframe — a
        positive byte count."""
        assert df.memory_usage() > 0
        assert df["a"].memory_usage() > 0

    def test_any_all(self, spark):
        """test_arithmetics_reduction.py any/all battery."""
        pdf = pd.DataFrame({"x": [True, False, True]})
        df = ds.from_pandas(pdf)
        assert df["x"].any() == pdf["x"].any()
        assert df["x"].all() == pdf["x"].all()

    def test_reductions_axis1(self, spark):
        """test_arithmetics_reduction.py frame reductions with axis=1
        (dask supports row-wise reductions; added during this port) —
        sum/mean/min/max/count/std/var/any/all per row vs pandas,
        incl. null handling (skipna=True)."""
        pdf = pd.DataFrame(
            {"x": [1.0, np.nan, 3.0, np.nan],
             "y": [2.0, 5.0, np.nan, np.nan],
             "z": [3.0, 7.0, 9.0, np.nan]}
        )
        df = ds.from_pandas(pdf)

        def _match(got, exp):
            g = sorted(got.tolist(), key=lambda v: (pd.isna(v), v))
            e = sorted(exp.tolist(), key=lambda v: (pd.isna(v), v))
            return all(
                (pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-9
                for a, b in zip(g, e)
            )

        for fn in ("sum", "mean", "min", "max", "count", "std", "var"):
            got = getattr(df, fn)(axis=1).compute()
            exp = getattr(pdf, fn)(axis=1)
            assert _match(got.astype(float), exp.astype(float)), fn

        bpdf = pd.DataFrame({"p": [True, False, True],
                             "q": [True, True, False]})
        bdf = ds.from_pandas(bpdf)
        assert sorted(bdf.any(axis=1).compute().tolist()) \
            == sorted(bpdf.any(axis=1).tolist())
        assert sorted(bdf.all(axis=1).compute().tolist()) \
            == sorted(bpdf.all(axis=1).tolist())

    def test_with_min_count(self, spark):
        """test_dataframe.py:1701 test_with_min_count — all-null sum
        is 0 in Spark semantics... pandas sum() of all-NaN with
        default min_count=0 is also 0.0; parity holds."""
        pdf = pd.DataFrame({"x": [np.nan, np.nan]})
        df = ds.from_pandas(pdf)
        got = df["x"].sum()
        assert (got == 0.0) or (got is None)


# =====================================================================
# Cumulative / shift / diff (explicit order_by — engine contract)
# =====================================================================

class TestCumulativeShift:
    def test_cumulative(self, spark):
        """test_dataframe.py:578 test_cumulative."""
        pdf = pd.DataFrame({"i": range(6), "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
        df = ds.from_pandas(pdf)
        for fn in ("cumsum", "cummax", "cummin", "cumprod"):
            got = (
                getattr(df["x"], fn)(order_by="i").compute().tolist()
            )
            exp = getattr(pdf.sort_values("i")["x"], fn)().tolist()
            assert sorted(got) == sorted(exp), fn

    def test_cumulative_with_nans(self, spark):
        """test_dataframe.py:607 test_cumulative_with_nans — NaN rows
        pass through, accumulation skips them (pandas semantics)."""
        pdf = pd.DataFrame({"i": range(5),
                            "x": [1.0, np.nan, 3.0, np.nan, 5.0]})
        df = ds.from_pandas(pdf)
        got = (
            df.cumsum("x", order_by="i", out="xc")
            .compute().sort_values("i")
        )
        exp = pdf.sort_values("i")["x"].cumsum()
        assert all(
            (pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-9
            for a, b in zip(got["xc"].tolist(), exp.tolist())
        )

    def test_cumulative_multiple_columns(self, spark):
        """test_dataframe.py:4487 test_cumulative_multiple_columns."""
        pdf = pd.DataFrame({"i": range(4), "x": [1.0, 2.0, 3.0, 4.0],
                            "y": [10.0, 20.0, 30.0, 40.0]})
        df = ds.from_pandas(pdf)
        got = (
            df.cumsum("x", order_by="i", out="xc")
            .cumsum("y", order_by="i", out="yc")
            .compute().sort_values("i")
        )
        exp = pdf.sort_values("i")
        assert got["xc"].tolist() == exp["x"].cumsum().tolist()
        assert got["yc"].tolist() == exp["y"].cumsum().tolist()

    def test_diff(self, spark):
        """test_dataframe.py:3893 test_diff."""
        pdf = pd.DataFrame({"i": range(5), "x": [1.0, 4.0, 9.0, 16.0, 25.0]})
        df = ds.from_pandas(pdf)
        got = df["x"].diff(order_by="i").compute()
        exp = pdf.sort_values("i")["x"].diff()
        assert sorted(got.dropna().tolist()) == sorted(exp.dropna().tolist())

    def test_shift(self, spark):
        """test_dataframe.py:3915 test_shift."""
        pdf = pd.DataFrame({"i": range(5), "x": [1.0, 2.0, 3.0, 4.0, 5.0]})
        df = ds.from_pandas(pdf)
        got = df["x"].shift(1, order_by="i").compute()
        exp = pdf.sort_values("i")["x"].shift(1)
        assert sorted(got.dropna().tolist()) == sorted(exp.dropna().tolist())
        assert got.isna().sum() == 1


# =====================================================================
# Reshape / conversion
# =====================================================================

class TestReshapeConvert:
    def test_dataframe_explode(self, spark):
        """test_dataframe.py:4791 test_dataframe_explode."""
        pdf = pd.DataFrame({"k": [1, 2], "v": [[1, 2, 3], [4]]})
        df = ds.from_pandas(pdf)
        got = df.explode("v").compute()
        exp = pdf.explode("v")
        assert sorted(got["v"].tolist()) == sorted(
            int(x) for x in exp["v"].tolist()
        )

    def test_series_explode(self, spark):
        """test_dataframe.py:4803 test_series_explode."""
        pdf = pd.DataFrame({"v": [[1, 2], [3]]})
        df = ds.from_pandas(pdf)
        got = df["v"].explode().compute()
        assert sorted(got["v"].tolist()) == [1, 2, 3]

    def test_to_frame(self, df, pdf):
        """test_dataframe.py:2777 test_to_frame."""
        got = df["a"].to_frame()
        assert list(got.columns) == ["a"]
        got2 = df["a"].to_frame(name="renamed")
        assert list(got2.columns) == ["renamed"]

    def test_concat(self, spark):
        """test_dataframe.py:1674 test_concat."""
        p1 = pd.DataFrame({"x": [1, 2]})
        p2 = pd.DataFrame({"x": [3, 4]})
        got = ds.concat([ds.from_pandas(p1), ds.from_pandas(p2)]).compute()
        assert sorted(got["x"].tolist()) == [1, 2, 3, 4]

    def test_combine(self, spark):
        """test_dataframe.py:1803 test_combine — pairwise python fn."""
        pdf = pd.DataFrame({"x": [1.0, 5.0], "y": [3.0, 2.0]})
        df = ds.from_pandas(pdf)
        got = df["x"].combine(df["y"], max).compute()
        exp = pdf["x"].combine(pdf["y"], max)
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_combine_first(self, spark):
        """test_dataframe.py:1848 test_combine_first."""
        pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0], "y": [9.0, 2.0, 9.0]})
        df = ds.from_pandas(pdf)
        got = df["x"].combine_first(df["y"]).compute()
        exp = pdf["x"].combine_first(pdf["y"])
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_combine_first_all_nans(self, spark):
        """test_dataframe.py:1883 test_combine_first_all_nans."""
        pdf = pd.DataFrame({"x": [np.nan, np.nan], "y": [1.0, 2.0]})
        df = ds.from_pandas(pdf)
        got = df["x"].combine_first(df["y"]).compute()
        assert sorted(got.tolist()) == [1.0, 2.0]

    def test_add_prefix_add_suffix(self, df):
        """test_dataframe.py:2936 test_add_prefix_add_suffix."""
        assert list(df.add_prefix("p_").columns) == [
            "p_a", "p_b", "p_c", "p_i"
        ]
        assert list(df.add_suffix("_s").columns) == [
            "a_s", "b_s", "c_s", "i_s"
        ]
        assert df["a"].add_prefix("p_").name == "p_a"

    def test_reset_index(self, df):
        """test_dataframe.py:3355 test_reset_index — no index here;
        reset_index is identity-shaped and keeps all columns."""
        got = df.reset_index()
        assert set(df.columns).issubset(set(got.columns))

    def test_to_datetime(self, spark):
        """test_dataframe.py:4289 test_to_datetime."""
        pdf = pd.DataFrame({"s": ["2024-01-15", "2024-06-30"]})
        df = ds.from_pandas(pdf)
        got = ds.to_datetime(df["s"]).compute()
        exp = pd.to_datetime(pdf["s"])
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_to_timedelta(self, spark):
        """test_dataframe.py:4328 test_to_timedelta."""
        pdf = pd.DataFrame({"x": [1.0, 2.0]})
        df = ds.from_pandas(pdf)
        got = ds.to_timedelta(df["x"], unit="s")
        out = got.compute()
        assert len(out) == 2

    def test_to_numeric(self, spark):
        """dask.dataframe to_numeric parity."""
        pdf = pd.DataFrame({"s": ["1", "2", "3"]})
        df = ds.from_pandas(pdf)
        got = ds.to_numeric(df["s"]).compute()
        assert sorted(got.tolist()) == [1, 2, 3]

    def test_values(self, df, pdf):
        """test_dataframe.py:4050 test_values."""
        vals = df["a"].values
        assert sorted(vals.tolist()) == sorted(pdf["a"].tolist())

    def test_squeeze(self, df):
        """test_dataframe.py:803 test_squeeze — single-column frame
        squeezes to a Series."""
        s = df[["a"]].squeeze()
        assert s.name == "a"


# =====================================================================
# map_partitions / apply / pipe / reduction
# =====================================================================

class TestMapApply:
    def test_map_partitions(self, df, pdf):
        """test_dataframe.py:912 test_map_partitions."""
        got = df.map_partitions(
            lambda p: p[["a"]].assign(a2=p["a"] * 2), "a bigint, a2 bigint"
        ).compute()
        assert sorted(got["a2"].tolist()) == sorted((pdf["a"] * 2).tolist())

    def test_map_partitions_type(self, df):
        """test_dataframe.py:926 test_map_partitions_type — result is
        a DaskFrame."""
        out = df.map_partitions(lambda p: p[["a"]], "a bigint")
        assert isinstance(out, DaskFrame)

    def test_apply(self, df, pdf):
        """test_dataframe.py:2860 test_apply — row-wise apply."""
        got = df[["a", "b"]].apply(
            lambda r: pd.Series({"s": r["a"] + r["b"]}), "s double"
        ).compute()
        exp = (pdf["a"] + pdf["b"]).tolist()
        assert sorted(got["s"].tolist()) == sorted(exp)

    def test_pipe(self, df, pdf):
        """test_dataframe.py:2679 test_pipe."""
        got = df.pipe(lambda f, k: f[f["a"] > k], 5)
        assert len(got) == len(pdf[pdf["a"] > 5])
        got_s = df["a"].pipe(lambda s: s + 1).compute()
        assert sorted(got_s.tolist()) == sorted((pdf["a"] + 1).tolist())

    def test_reduction_method(self, df, pdf):
        """test_dataframe.py:2586 test_reduction_method — chunk +
        aggregate pair."""
        got = df.reduction(
            lambda p: pd.DataFrame({"n": [len(p)]}),
            lambda parts: pd.DataFrame({"n": [parts["n"].sum()]}),
            "n bigint",
        )
        # reduction finalizes driver-side (dask's tree-finalize on one
        # worker) — the aggregate's return IS the result, already pandas
        assert int(got["n"].iloc[0]) == len(pdf)

    def test_embarrassingly_parallel_operations(self, df, pdf):
        """test_dataframe.py:2334 — chains of elementwise ops match
        pandas end-to-end."""
        got = ((df["a"] * 2 + 1) / 2.0).compute()
        exp = (pdf["a"] * 2 + 1) / 2.0
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_random_split(self, df):
        """test_dataframe.py:1949 test_random_partitions — fractions
        partition the rows."""
        a, b = df.random_split([0.5, 0.5], seed=7)
        assert len(a) + len(b) == 9

    def test_sample(self, df):
        """test_dataframe.py:2485 test_sample — deterministic under a
        seed, row subset."""
        s1 = df.sample(frac=0.5, random_state=3).compute()
        s2 = df.sample(frac=0.5, random_state=3).compute()
        assert sorted(s1["a"].tolist()) == sorted(s2["a"].tolist())
        assert set(s1["a"]).issubset(set(range(1, 10)))

    def test_drop_duplicates(self, spark):
        """test_dataframe.py:1083/1118 test_drop_duplicates +
        subset."""
        pdf = pd.DataFrame({"x": [1, 1, 2, 2, 3], "y": list("aabbc")})
        df = ds.from_pandas(pdf)
        assert len(df.drop_duplicates()) == 3
        assert len(df.drop_duplicates(subset=["y"])) == 3


# =====================================================================
# GroupBy — reference test_groupby.py
# =====================================================================

class TestGroupBy:
    def test_full_groupby(self, gb_df, gb_pdf):
        """test_groupby.py:135 test_full_groupby — agg over one key
        matches pandas groupby."""
        got = gb_df.groupby("h").agg({"y": "sum"}).compute()
        exp = gb_pdf.groupby("h")["y"].sum()
        gmap = dict(zip(got["h"], got["y_sum"]))
        for k, v in exp.items():
            assert abs(gmap[k] - v) < 1e-6

    def test_groupby_multilevel_agg(self, gb_df, gb_pdf):
        """test_groupby.py:301 test_groupby_multilevel_agg — two
        keys."""
        got = gb_df.groupby(["g", "h"]).agg({"y": "mean"}).compute()
        exp = gb_pdf.groupby(["g", "h"])["y"].mean()
        gmap = {(r.g, r.h): r.y_mean for r in got.itertuples()}
        for (g, h), v in exp.items():
            assert abs(gmap[(g, h)] - v) < 1e-6

    def test_split_apply_combine_battery(self, gb_df, gb_pdf):
        """test_groupby.py:478 test_split_apply_combine_on_series —
        the core agg battery vs pandas."""
        for fn in ("sum", "mean", "min", "max", "count", "std", "var"):
            got = getattr(gb_df.groupby("h"), fn)(["y"]).compute()
            exp = getattr(gb_pdf.groupby("h")["y"], fn)()
            gmap = dict(zip(got["h"], got["y"]))
            for k, v in exp.items():
                assert abs(gmap[k] - v) < 1e-6, fn

    def test_groupby_size(self, gb_df, gb_pdf):
        """test_groupby.py:478 (size leg)."""
        got = gb_df.groupby("h").size().compute()
        exp = gb_pdf.groupby("h").size()
        gmap = dict(zip(got["h"], got["size"]))
        assert gmap == exp.to_dict()

    def test_first_last(self, spark):
        """test_groupby.py:478 (first/last legs) — engine first/last
        are order-free Spark any-value picks per group; assert
        membership rather than position."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").first(["v"]).compute()
        gmap = dict(zip(got["k"], got["v"]))
        assert gmap["a"] in (1, 2) and gmap["b"] == 3

    def test_dataframe_groupby_nunique(self, gb_df, gb_pdf):
        """test_groupby.py:365 test_dataframe_groupby_nunique."""
        got = gb_df.groupby("h").nunique(["y"]).compute()
        exp = gb_pdf.groupby("h")["y"].nunique()
        gmap = dict(zip(got["h"], got["y"]))
        assert gmap == exp.to_dict()

    def test_nunique_across_group_same_value(self, spark):
        """test_groupby.py:375 — same value in different groups counts
        once per group."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 1, 1]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").nunique(["v"]).compute()
        gmap = dict(zip(got["k"], got["v"]))
        assert gmap == {"a": 1, "b": 1}

    def test_series_groupby(self, gb_df, gb_pdf):
        """test_groupby.py:408 test_series_groupby — series groupby
        resolves against the parent frame."""
        got = gb_df["y"].groupby("h").sum(["y"]).compute()
        exp = gb_pdf.groupby("h")["y"].sum()
        gmap = dict(zip(got["h"], got["y"]))
        for k, v in exp.items():
            assert abs(gmap[k] - v) < 1e-6

    def test_groupby_get_group(self, gb_df, gb_pdf):
        """test_groupby.py:335 test_groupby_get_group."""
        got = gb_df.groupby("h").get_group("x").compute()
        exp = gb_pdf[gb_pdf["h"] == "x"]
        assert len(got) == len(exp)

    def test_groupby_value_counts(self, spark):
        """test_groupby.py:2115 test_groupby_value_counts."""
        pdf = pd.DataFrame({"k": ["a", "a", "a", "b"],
                            "v": [1, 1, 2, 1]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").value_counts("v").compute()
        exp = pdf.groupby("k")["v"].value_counts()
        gmap = {(r.k, r.v): r[len(r._fields) - 1] for r in got.itertuples()}
        for (k, v), n in exp.items():
            assert gmap[(k, v)] == n

    def test_groupby_unique(self, spark):
        """test_groupby.py:2097 test_groupby_unique."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 1]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").unique("v").compute()
        row = {r["k"]: sorted(r["v"]) for _, r in got.iterrows()}
        assert row == {"a": [1, 2], "b": [1]}

    def test_df_groupby_idxmin_idxmax(self, spark):
        """test_groupby.py:1921/1964 test_df_groupby_idxmin/idxmax —
        engine signature takes (value_col, id_col)."""
        pdf = pd.DataFrame({"k": ["a", "a", "b", "b"],
                            "v": [3.0, 1.0, 2.0, 4.0],
                            "i": [0, 1, 2, 3]})
        df = ds.from_pandas(pdf)
        got_min = df.groupby("k").idxmin("v", "i").compute()
        exp_min = pdf.set_index("i").groupby("k")["v"].idxmin()
        gmap = dict(zip(got_min["k"], got_min.iloc[:, -1]))
        assert gmap == exp_min.to_dict()
        got_max = df.groupby("k").idxmax("v", "i").compute()
        exp_max = pdf.set_index("i").groupby("k")["v"].idxmax()
        gmap = dict(zip(got_max["k"], got_max.iloc[:, -1]))
        assert gmap == exp_max.to_dict()

    def test_groupby_shift(self, spark):
        """test_groupby.py:2160 test_groupby_shift_series."""
        pdf = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
                            "i": [0, 1, 2, 3, 4]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").shift("v", periods=1, order_by="i") \
            .compute().sort_values("i")
        exp = pdf.sort_values("i").groupby("k")["v"].shift(1)
        gcol = [c for c in got.columns if c.startswith("v_") or
                c == "v_shift"][-1] if any(
                    c.startswith("v_") for c in got.columns) else "v"
        ge = got[gcol].tolist()
        ee = exp.tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(ge, ee)
        )

    def test_groupby_transform(self, spark):
        """test_groupby.py:2252 test_groupby_transform_funcs — mean
        broadcast back to every row."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 3.0, 5.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").transform("mean", "v", out="m").compute()
        exp = pdf.groupby("k")["v"].transform("mean")
        gmap = sorted(got["m"].tolist())
        assert gmap == sorted(exp.tolist())

    def test_groupby_cumsum(self, spark):
        """test_groupby.py:1357 test_cumulative (groupby leg) /
        test_dataframe_groupby_cumsum_agg_empty_partitions:4845."""
        pdf = pd.DataFrame({"k": ["a", "a", "a", "b"],
                            "v": [1.0, 2.0, 3.0, 4.0],
                            "i": [0, 1, 2, 3]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").cumsum("v", order_by="i") \
            .compute().sort_values("i")
        exp = pdf.sort_values("i").groupby("k")["v"].cumsum()
        gcol = [c for c in got.columns if c not in ("k", "v", "i")][0]
        assert got[gcol].tolist() == exp.tolist()

    def test_groupby_dropna(self, spark):
        """test_groupby.py:2457 test_groupby_dropna_pandas — null keys
        form no group by default; dropna=False keeps them."""
        pdf = pd.DataFrame({"k": ["a", None, "b", None],
                            "v": [1.0, 2.0, 3.0, 4.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").sum(["v"]).compute()
        assert len(got) == 2
        got_keep = df.groupby("k", dropna=False).sum(["v"]).compute()
        assert len(got_keep) == 3

    def test_groupby_sort_argument(self, spark):
        """test_groupby.py:2685 test_groupby_sort_argument — sort=True
        orders output by keys."""
        pdf = pd.DataFrame({"k": ["c", "a", "b"], "v": [1, 2, 3]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k", sort=True).sum(["v"]).compute()
        assert got["k"].tolist() == ["a", "b", "c"]

    def test_dataframe_named_agg(self, gb_df, gb_pdf):
        """test_groupby.py:2860 test_dataframe_named_agg."""
        got = gb_df.groupby("h").agg(
            total=("y", "sum"), avg=("y", "mean")
        ).compute()
        exp = gb_pdf.groupby("h").agg(
            total=("y", "sum"), avg=("y", "mean")
        )
        gmap = {r.h: (r.total, r.avg) for r in got.itertuples()}
        for k, row in exp.iterrows():
            assert abs(gmap[k][0] - row["total"]) < 1e-6
            assert abs(gmap[k][1] - row["avg"]) < 1e-6

    def test_groupby_agg_custom_sum(self, spark):
        """test_groupby.py:1657 test_dataframe_groupby_agg_custom_sum
        — a custom Aggregation lowered to Catalyst."""
        from dask_spark.operators.groupby import Aggregation
        from pyspark.sql import functions as F

        custom = Aggregation(
            "mysum",
            partials=lambda c: {"s": F.sum(F.col(c))},
            finalize=lambda p: p["s"],
        )
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").agg(out=("v", custom)).compute()
        gmap = dict(zip(got["k"], got["out"]))
        assert gmap == {"a": 3.0, "b": 3.0}

    def test_groupby_cov(self, spark):
        """test_groupby.py:1898 test_groupby_cov."""
        rs = np.random.RandomState(0)
        pdf = pd.DataFrame({"k": ["a"] * 10 + ["b"] * 10,
                            "x": rs.randn(20), "y": rs.randn(20)})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").cov("x", "y").compute()
        exp = pdf.groupby("k").apply(
            lambda p: p["x"].cov(p["y"]), include_groups=False
        )
        gmap = dict(zip(got["k"], got.iloc[:, -1]))
        for k, v in exp.items():
            assert abs(gmap[k] - v) < 1e-9

    def test_rounding_negative_var(self, spark):
        """test_groupby.py:2600 test_rounding_negative_var — catastro-
        phic cancellation must not yield negative variance."""
        pdf = pd.DataFrame({"k": ["a"] * 3,
                            "v": [4.9e8, 4.9e8 + 1e-4, 4.9e8 - 1e-4]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").var(["v"]).compute()
        assert got["v"].iloc[0] >= 0

    def test_aggregate_single_element_groups(self, spark):
        """test_groupby.py:884 test_aggregate_single_element_groups —
        std of a 1-row group is NaN, not an error."""
        pdf = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").std(["v"]).compute()
        assert got["v"].isna().all()

    def test_groupby_ffill(self, spark):
        """test_groupby.py:1033 test_ffill (grouped)."""
        pdf = pd.DataFrame({"k": ["a", "a", "b", "b"],
                            "v": [1.0, np.nan, np.nan, 4.0],
                            "i": [0, 1, 2, 3]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").ffill(["v"], order_by="i") \
            .compute().sort_values("i")
        exp = pdf.sort_values("i").groupby("k")["v"].ffill()
        ge, ee = got["v"].tolist(), exp.tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(ge, ee)
        )

    def test_groupby_median(self, spark):
        """test_groupby.py:1015 test_aggregate_median."""
        pdf = pd.DataFrame({"k": ["a", "a", "a", "b"],
                            "v": [1.0, 2.0, 9.0, 5.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").median("v").compute()
        gmap = dict(zip(got["k"], got.iloc[:, -1]))
        assert abs(gmap["a"] - 2.0) <= 1.0 and abs(gmap["b"] - 5.0) < 1e-9

    def test_groupby_error(self, gb_df):
        """test_groupby.py:102 test_groupby_error — unknown key
        raises."""
        with pytest.raises(Exception):
            gb_df.groupby("no_such_col").sum(["y"]).compute()

    def test_numeric_column_names(self, spark):
        """test_groupby.py:818 test_numeric_column_names — engine
        requires string column names (Spark schema contract); a
        numeric name is stringified by from_pandas."""
        pdf = pd.DataFrame({0: [1, 1, 2], 1: [10.0, 20.0, 30.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("0").sum(["1"]).compute()
        assert len(got) == 2

    def test_empty_partitions_with_value_counts(self, spark):
        """test_groupby.py:2899 test_empty_partitions_with_value_
        counts — empty groups drop out cleanly."""
        pdf = pd.DataFrame({"k": ["a"] * 4, "v": [1, 1, 2, 3]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").value_counts("v").compute()
        assert len(got) == 3

    def test_groupby_nth(self, spark):
        """test_groupby.py groupby nth — first row per group in
        order."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [10, 20, 30],
                            "i": [0, 1, 2]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").nth(0, order_by="i").compute()
        gmap = dict(zip(got["k"], got["v"]))
        assert gmap == {"a": 10, "b": 30}

    def test_groupby_apply(self, spark):
        """test_groupby.py:757 test_apply_or_transform_shuffle —
        groupby.apply with a pandas fn."""
        pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
        df = ds.from_pandas(pdf)
        got = df.groupby("k").apply(
            lambda p: pd.DataFrame({"k": [p["k"].iloc[0]],
                                    "rng": [p["v"].max() - p["v"].min()]}),
            "k string, rng double",
        ).compute()
        gmap = dict(zip(got["k"], got["rng"]))
        assert gmap == {"a": 1.0, "b": 0.0}

    def test_series_groupby_errors(self, gb_df):
        """test_groupby.py:429 test_series_groupby_errors — bad agg
        column raises."""
        with pytest.raises(Exception):
            gb_df.groupby("h").sum(["nonexistent"]).compute()


# =====================================================================
# Arithmetics battery — reference test_arithmetics_reduction.py
# =====================================================================

class TestArithmetics:
    def test_arithmetics(self, df, pdf):
        """test_arithmetics_reduction.py:~30 test_arithmetics — the
        full operator battery series⊕scalar and series⊕series."""
        cases = [
            (lambda s, o: s + o, lambda s, o: s + o),
            (lambda s, o: s - o, lambda s, o: s - o),
            (lambda s, o: s * o, lambda s, o: s * o),
            (lambda s, o: s / o, lambda s, o: s / o),
            (lambda s, o: s % o, lambda s, o: s % o),
            (lambda s, o: s ** o, lambda s, o: s ** o),
        ]
        for gf, ef in cases:
            got = gf(df["a"], 2).compute()
            exp = ef(pdf["a"], 2)
            assert sorted(np.round(got.astype(float), 9).tolist()) == sorted(
                np.round(exp.astype(float), 9).tolist()
            )

    def test_series_series_arithmetic(self, df, pdf):
        """test_arithmetics_reduction.py — series ⊕ series on the same
        frame."""
        got = (df["a"] * df["b"]).compute()
        exp = pdf["a"] * pdf["b"]
        assert sorted(got.tolist()) == sorted(exp.tolist())

    def test_reverse_arithmetic(self, df, pdf):
        """test_arithmetics_reduction.py — radd/rsub/rmul."""
        assert sorted((10 - df["a"]).compute().tolist()) == sorted(
            (10 - pdf["a"]).tolist()
        )
        assert sorted((2 * df["a"]).compute().tolist()) == sorted(
            (2 * pdf["a"]).tolist()
        )

    def test_named_arithmetic_methods(self, df, pdf):
        """test_arithmetics_reduction.py — .add/.sub/.mul/.div
        spellings."""
        assert sorted(df["a"].add(3).compute().tolist()) == sorted(
            (pdf["a"] + 3).tolist()
        )
        assert sorted(df["a"].floordiv(2).compute().tolist()) == sorted(
            (pdf["a"] // 2).tolist()
        )

    def test_comparison_operators(self, df, pdf):
        """test_arithmetics_reduction.py — gt/ge/lt/le/eq/ne named
        forms."""
        for fn in ("gt", "ge", "lt", "le", "eq", "ne"):
            got = getattr(df["a"], fn)(5).compute()
            exp = getattr(pdf["a"], fn)(5)
            assert got.sum() == exp.sum(), fn

    def test_string_accessor_roundtrip(self, df, pdf):
        """test_accessors.py str battery spot-check (upper/len/
        contains)."""
        assert sorted(df["c"].str.upper().compute().tolist()) == sorted(
            pdf["c"].str.upper().tolist()
        )
        assert df["c"].str.contains("a").compute().sum() == \
            pdf["c"].str.contains("a").sum()
