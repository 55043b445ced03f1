"""Second slice of the ported reference suite (r13): accessors,
reshape, multi/join, rolling, indexing.

Ports from dask/dataframe/tests/test_accessors.py, test_reshape.py,
test_multi.py, test_rolling.py, test_indexing.py — same rules as
tests/test_ported_reference.py (fresh pandas expectation code, each
test cites the reference `def test_...` it ports, deviations pinned
inline). See that module's docstring for the engine-contract
adaptations (no row order / no index → order_by / explicit keys /
set-equality)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
from dask_spark.frame import DaskFrame
from dask_spark.testing import assert_eq


@pytest.fixture(scope="module")
def str_pdf():
    return pd.DataFrame(
        {"s": ["a b c", "aabbcc", "  pad  ", "X-Y", "", "dog cat"],
         "i": range(6)}
    )


@pytest.fixture(scope="module")
def str_df(spark, str_pdf):
    return ds.from_pandas(str_pdf)


@pytest.fixture(scope="module")
def dt_pdf():
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-31 10:15:30", "2024-02-29 23:59:59",
                 "2024-06-01 00:00:00", "2023-12-25 18:30:00"]
            ),
            "i": range(4),
        }
    )


@pytest.fixture(scope="module")
def dt_df(spark, dt_pdf):
    return ds.from_pandas(dt_pdf)


def _sorted(series):
    return sorted(series.tolist(), key=lambda v: (v is None, v))


# =====================================================================
# str accessor — test_accessors.py:139 test_str_accessor battery
# =====================================================================

class TestStrAccessor:
    @pytest.mark.parametrize(
        "method,args",
        [
            ("lower", ()), ("upper", ()), ("len", ()), ("strip", ()),
            ("capitalize", ()),
            ("zfill", (8,)), ("repeat", (2,)),
            ("find", ("b",)), ("rfind", ("b",)),
            ("count", ("a",)),
        ],
    )
    def test_str_accessor_battery(self, str_df, str_pdf, method, args):
        """test_accessors.py:139 test_str_accessor."""
        got = getattr(str_df["s"].str, method)(*args).compute()
        exp = getattr(str_pdf["s"].str, method)(*args)
        assert _sorted(got) == _sorted(exp), method

    def test_str_title_whitespace_word_rule(self, str_df, str_pdf):
        """test_accessors.py:139 (title leg) — pinned deviation: the
        engine's title is JVM initcap, which starts words at
        WHITESPACE only; pandas also capitalizes after any non-alpha
        ("X-Y" -> "X-Y" vs initcap "X-y"). Equal on whitespace-word
        data."""
        ws = [s for s in str_pdf["s"] if "-" not in s]
        got = str_df["s"].str.title().compute()
        exp = str_pdf["s"].str.title()
        assert {g for g in got if "-" not in g.replace("X-y", "-")} \
            >= {e for e in exp if "-" not in e}
        # the deviation itself, pinned:
        assert "X-y" in set(got) and "X-Y" in set(exp)

    def test_str_startswith_endswith_contains(self, str_df, str_pdf):
        """test_accessors.py:139 (predicate legs)."""
        for m, a in (("startswith", "a"), ("endswith", "c"),
                     ("contains", "b")):
            got = getattr(str_df["s"].str, m)(a).compute()
            exp = getattr(str_pdf["s"].str, m)(a)
            assert got.sum() == exp.sum(), m

    def test_str_accessor_getitem(self, str_df, str_pdf):
        """test_accessors.py:221 test_str_accessor_getitem — engine
        spelling is .str.get(i)."""
        got = str_df["s"].str.get(0).compute()
        exp = str_pdf["s"].str.get(0)
        # pinned deviation: pandas get(0) of "" is NaN; the engine's
        # substring returns "" (SQL semantics) — map "" to NaN first
        got = got.replace("", None)
        assert _sorted(got.dropna()) == _sorted(exp.dropna())

    def test_str_removeprefix_removesuffix(self, spark):
        """test_accessors.py:235."""
        pdf = pd.DataFrame({"s": ["ab_c", "ab", "zab", "c_ab"]})
        df = ds.from_pandas(pdf)
        got = df["s"].str.removeprefix("ab").compute()
        exp = pdf["s"].str.removeprefix("ab")
        assert _sorted(got) == _sorted(exp)
        got = df["s"].str.removesuffix("ab").compute()
        exp = pdf["s"].str.removesuffix("ab")
        assert _sorted(got) == _sorted(exp)

    def test_str_accessor_cat(self, spark):
        """test_accessors.py:249 test_str_accessor_cat — same-frame
        column concatenation with a separator."""
        pdf = pd.DataFrame({"a": ["x", "y"], "b": ["1", "2"]})
        df = ds.from_pandas(pdf)
        got = df["a"].str.cat(df["b"], sep="-").compute()
        exp = pdf["a"].str.cat(pdf["b"], sep="-")
        assert _sorted(got) == _sorted(exp)

    def test_str_split_noexpand(self, str_df, str_pdf):
        """test_accessors.py:275 test_str_accessor_split_noexpand."""
        got = str_df["s"].str.split(" ").compute()
        exp = str_pdf["s"].str.split(" ")
        g = sorted(tuple(x) for x in got if x is not None)
        e = sorted(tuple(x) for x in exp if isinstance(x, list))
        assert g == e

    def test_str_split_expand(self, spark):
        """test_accessors.py:289 test_str_accessor_split_expand — n
        splits produce n+1 null-padded columns (dask's static-schema
        contract)."""
        pdf = pd.DataFrame({"s": ["a b c", "d e", "f"]})
        df = ds.from_pandas(pdf)
        got = df["s"].str.split(" ", n=2, expand=True).compute()
        assert got.shape[1] == 3
        exp = pdf["s"].str.split(" ", n=2, expand=True)
        g0 = _sorted(got.iloc[:, 0])
        assert g0 == _sorted(exp.iloc[:, 0])

    def test_str_replace_regex(self, str_df, str_pdf):
        """test_accessors.py battery replace leg."""
        got = str_df["s"].str.replace("[abc]", "_", regex=True).compute()
        exp = str_pdf["s"].str.replace("[abc]", "_", regex=True)
        assert _sorted(got) == _sorted(exp)

    def test_str_extract(self, spark):
        """test_accessors.py battery extract leg."""
        pdf = pd.DataFrame({"s": ["a1", "b22", "c333"]})
        df = ds.from_pandas(pdf)
        # engine extract returns ONE group per call (group= kwarg, a
        # Column not a frame) — pandas' multi-column form is the
        # composition of two extract calls
        got1 = df["s"].str.extract(r"([a-z])(\d+)", group=1).compute()
        got2 = df["s"].str.extract(r"([a-z])(\d+)", group=2).compute()
        exp = pdf["s"].str.extract(r"([a-z])(\d+)")
        assert _sorted(got1) == _sorted(exp[0])
        assert _sorted(got2) == _sorted(exp[1])

    def test_str_pad_justify(self, spark):
        """test_accessors.py battery pad/ljust/rjust/center legs —
        python no-truncate semantics."""
        pdf = pd.DataFrame({"s": ["ab", "cdef", "x"]})
        df = ds.from_pandas(pdf)
        for m in ("ljust", "rjust", "center"):
            got = getattr(df["s"].str, m)(5, ".").compute()
            exp = getattr(pdf["s"].str, m)(5, ".")
            assert _sorted(got) == _sorted(exp), m

    def test_str_match_fullmatch(self, str_df, str_pdf):
        """test_accessors.py battery match/fullmatch legs."""
        got = str_df["s"].str.match("a").compute()
        exp = str_pdf["s"].str.match("a")
        assert got.sum() == exp.sum()
        got = str_df["s"].str.fullmatch("aabbcc").compute()
        exp = str_pdf["s"].str.fullmatch("aabbcc")
        assert got.sum() == exp.sum()


# =====================================================================
# dt accessor — test_accessors.py:102 test_dt_accessor
# =====================================================================

class TestDtAccessor:
    @pytest.mark.parametrize(
        "prop",
        ["year", "month", "day", "hour", "minute", "second",
         "dayofweek", "dayofyear", "quarter"],
    )
    def test_dt_accessor_fields(self, dt_df, dt_pdf, prop):
        """test_accessors.py:102 test_dt_accessor."""
        got = getattr(dt_df["ts"].dt, prop).compute()
        exp = getattr(dt_pdf["ts"].dt, prop)
        assert _sorted(got.astype("int64")) == _sorted(exp.astype("int64"))

    def test_dt_strftime(self, dt_df, dt_pdf):
        """test_accessors.py:102 (strftime leg)."""
        got = dt_df["ts"].dt.strftime("%Y-%m-%d").compute()
        exp = dt_pdf["ts"].dt.strftime("%Y-%m-%d")
        assert _sorted(got) == _sorted(exp)

    def test_dt_floor_ceil(self, dt_df, dt_pdf):
        """test_accessors.py:102 (floor leg) + pandas ceil."""
        got = dt_df["ts"].dt.floor("h").compute()
        exp = dt_pdf["ts"].dt.floor("h")
        assert _sorted(got) == _sorted(exp)
        got = dt_df["ts"].dt.ceil("h").compute()
        exp = dt_pdf["ts"].dt.ceil("h")
        assert _sorted(got) == _sorted(exp)

    def test_dt_month_boundaries(self, dt_df, dt_pdf):
        """test_accessors.py:102 (is_month_start/end, days_in_month)."""
        assert (
            dt_df["ts"].dt.is_month_end.compute().sum()
            == dt_pdf["ts"].dt.is_month_end.sum()
        )
        assert _sorted(dt_df["ts"].dt.days_in_month.compute().astype(int)) \
            == _sorted(dt_pdf["ts"].dt.days_in_month.astype(int))


# =====================================================================
# reshape — test_reshape.py
# =====================================================================

class TestReshape:
    def test_get_dummies(self, spark):
        """test_reshape.py:25 test_get_dummies."""
        pdf = pd.DataFrame({"c": ["a", "b", "a", "c"]})
        df = ds.from_pandas(pdf)
        got = df.get_dummies("c").compute()
        exp = pd.get_dummies(pdf["c"])
        for cat in ("a", "b", "c"):
            gcol = f"c_{cat}"
            assert int(got[gcol].sum()) == int(exp[cat].sum())

    def test_get_dummies_drop_first_prefix(self, spark):
        """test_reshape.py:69 test_get_dummies_kwargs."""
        pdf = pd.DataFrame({"c": ["a", "b", "a", "c"]})
        df = ds.from_pandas(pdf)
        got = df.get_dummies("c", prefix="p", prefix_sep=".",
                             drop_first=True).compute()
        exp = pd.get_dummies(pdf["c"], prefix="p", prefix_sep=".",
                             drop_first=True)
        dummy_cols = [c for c in got.columns if c.startswith("p.")]
        assert sorted(dummy_cols) == sorted(exp.columns)

    def test_get_dummies_dummy_na(self, spark):
        """test_reshape.py:~ dummy_na leg."""
        pdf = pd.DataFrame({"c": ["a", None, "b"]})
        df = ds.from_pandas(pdf)
        got = df.get_dummies("c", dummy_na=True).compute()
        na_cols = [c for c in got.columns if c.lower().endswith(("nan", "na", "null"))]
        assert na_cols, f"no NA dummy column in {list(got.columns)}"
        assert int(got[na_cols[0]].sum()) == 1

    def test_get_dummies_errors(self, spark):
        """test_reshape.py:168 test_get_dummies_errors — unknown
        column raises."""
        pdf = pd.DataFrame({"c": ["a"]})
        df = ds.from_pandas(pdf)
        with pytest.raises(Exception):
            df.get_dummies("nope").compute()

    @pytest.mark.parametrize("aggfunc", ["mean", "sum", "count"])
    def test_pivot_table(self, spark, aggfunc):
        """test_reshape.py:192 test_pivot_table."""
        pdf = pd.DataFrame(
            {"k": ["r1", "r1", "r2", "r2", "r2"],
             "c": ["x", "y", "x", "x", "y"],
             "v": [1.0, 2.0, 3.0, 4.0, 5.0]}
        )
        df = ds.from_pandas(pdf)
        got = df.pivot_table(index="k", columns="c", values="v",
                             aggfunc=aggfunc).compute()
        exp = pdf.pivot_table(index="k", columns="c", values="v",
                              aggfunc=aggfunc)
        gmap = got.set_index("k")
        for k in exp.index:
            for c in exp.columns:
                g, e = gmap.loc[k, c], exp.loc[k, c]
                assert (pd.isna(g) and pd.isna(e)) or abs(g - e) < 1e-9

    def test_pivot_table_first(self, spark):
        """test_reshape.py:226 test_pivot_table_firstlast (first
        leg; Spark first is non-null-any within the cell — single
        values per cell here so deterministic)."""
        pdf = pd.DataFrame(
            {"k": ["r1", "r2"], "c": ["x", "x"], "v": [1.0, 2.0]}
        )
        df = ds.from_pandas(pdf)
        got = df.pivot_table(index="k", columns="c", values="v",
                             aggfunc="first").compute()
        assert sorted(got["x"].tolist()) == [1.0, 2.0]

    def test_melt(self, spark):
        """test_reshape (melt lives in test_dataframe/reshape in the
        reference tree) — id/value vars + custom names."""
        pdf = pd.DataFrame({"id": [1, 2], "a": [10.0, 20.0],
                            "b": [30.0, 40.0]})
        df = ds.from_pandas(pdf)
        got = df.melt(id_vars="id", value_vars=["a", "b"],
                      var_name="var", value_name="val").compute()
        exp = pdf.melt(id_vars="id", value_vars=["a", "b"],
                       var_name="var", value_name="val")
        assert_eq(got, exp)


# =====================================================================
# multi / joins — test_multi.py
# =====================================================================

class TestMulti:
    @pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
    def test_merge(self, spark, how):
        """test_multi.py:694 test_merge — all hows vs pandas."""
        l_pdf = pd.DataFrame({"k": [1, 2, 3], "x": [10.0, 20.0, 30.0]})
        r_pdf = pd.DataFrame({"k": [2, 3, 4], "y": [200.0, 300.0, 400.0]})
        got = ds.from_pandas(l_pdf).merge(
            ds.from_pandas(r_pdf), how=how, on="k"
        ).compute()
        exp = l_pdf.merge(r_pdf, how=how, on="k")
        assert_eq(got, exp)

    def test_merge_suffixes(self, spark):
        """test_multi.py merge suffix handling."""
        l_pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
        r_pdf = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
        got = ds.from_pandas(l_pdf).merge(
            ds.from_pandas(r_pdf), on="k", suffixes=("_l", "_r")
        ).compute()
        assert "v_l" in got.columns and "v_r" in got.columns

    def test_merge_empty_left(self, spark):
        """test_multi.py:798 test_merge_empty_left_df."""
        l_pdf = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "x": pd.Series([], dtype="float64")})
        r_pdf = pd.DataFrame({"k": [1], "y": [1.0]})
        got = ds.from_pandas(l_pdf).merge(
            ds.from_pandas(r_pdf), on="k", how="inner"
        ).compute()
        assert len(got) == 0

    def test_merge_how_raises(self, spark):
        """test_multi.py:817 test_merge_how_raises."""
        pdf = pd.DataFrame({"k": [1]})
        df = ds.from_pandas(pdf)
        with pytest.raises(Exception):
            df.merge(df, on="k", how="sideways")

    def test_semi_anti(self, spark):
        """test_multi.py:860 semi/anti joins."""
        l_pdf = pd.DataFrame({"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
        r_pdf = pd.DataFrame({"k": [2, 3, 4]})
        l, r = ds.from_pandas(l_pdf), ds.from_pandas(r_pdf)
        semi = l.merge(r, on="k", how="semi").compute()
        assert sorted(semi["k"].tolist()) == [2, 3]
        anti = l.merge(r, on="k", how="anti").compute()
        assert anti["k"].tolist() == [1]

    def test_sequential_joins(self, spark):
        """test_multi.py:71 test_sequential_joins."""
        a = pd.DataFrame({"k": [1, 2], "x": [1.0, 2.0]})
        b = pd.DataFrame({"k": [1, 2], "y": [3.0, 4.0]})
        c = pd.DataFrame({"k": [1, 2], "z": [5.0, 6.0]})
        got = (
            ds.from_pandas(a)
            .merge(ds.from_pandas(b), on="k")
            .merge(ds.from_pandas(c), on="k")
            .compute()
        )
        exp = a.merge(b, on="k").merge(c, on="k")
        assert_eq(got, exp)

    @pytest.mark.parametrize("join", ["inner", "outer"])
    def test_concat(self, spark, join):
        """test_multi.py:556 test_concat — axis=0 union; outer fills
        missing columns with nulls, matching pandas."""
        a = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
        b = pd.DataFrame({"x": [5.0, 6.0]})
        got = ds.concat([ds.from_pandas(a), ds.from_pandas(b)]).compute()
        exp = pd.concat([a, b], join="outer")
        # engine concat is always unionByName-with-null-fill (outer)
        assert sorted(got["x"].tolist()) == sorted(exp["x"].tolist())
        assert got["y"].isna().sum() == 2

    def test_concat_dataframe_empty(self, spark):
        """test_multi.py:631 test_concat_dataframe_empty."""
        a = pd.DataFrame({"x": pd.Series([], dtype="float64")})
        b = pd.DataFrame({"x": [1.0]})
        got = ds.concat([ds.from_pandas(a), ds.from_pandas(b)]).compute()
        assert got["x"].tolist() == [1.0]

    def test_merge_asof_on_basic(self, spark):
        """test_multi.py:110 test_merge_asof_on_basic."""
        l_pdf = pd.DataFrame({"t": [1, 5, 10]})
        r_pdf = pd.DataFrame({"t": [1, 2, 3, 6, 7], "v": [1.0, 2, 3, 6, 7]})
        got = ds.from_pandas(l_pdf).merge_asof(
            ds.from_pandas(r_pdf), on="t"
        ).compute().sort_values("t")
        exp = pd.merge_asof(l_pdf, r_pdf, on="t")
        assert got["v"].tolist() == exp["v"].tolist()

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("allow_exact", [True, False])
    def test_merge_asof_on(self, spark, direction, allow_exact):
        """test_multi.py:154 test_merge_asof_on — directions ×
        allow_exact_matches."""
        l_pdf = pd.DataFrame({"t": [2, 5, 9]})
        r_pdf = pd.DataFrame({"t": [1, 2, 3, 6, 7], "v": [1.0, 2, 3, 6, 7]})
        got = ds.from_pandas(l_pdf).merge_asof(
            ds.from_pandas(r_pdf), on="t", direction=direction,
            allow_exact_matches=allow_exact,
        ).compute().sort_values("t")
        exp = pd.merge_asof(l_pdf, r_pdf, on="t", direction=direction,
                            allow_exact_matches=allow_exact)
        ge, ee = got["v"].tolist(), exp["v"].tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(ge, ee)
        ), (ge, ee)

    def test_merge_asof_on_by(self, spark):
        """test_multi.py:247 test_merge_asof_on_by."""
        l_pdf = pd.DataFrame({"g": ["a", "a", "b"], "t": [3, 7, 3]})
        r_pdf = pd.DataFrame({"g": ["a", "a", "b", "b"],
                              "t": [1, 5, 2, 4],
                              "v": [10.0, 50.0, 20.0, 40.0]})
        got = ds.from_pandas(l_pdf).merge_asof(
            ds.from_pandas(r_pdf), on="t", by="g"
        ).compute().sort_values(["g", "t"])
        exp = pd.merge_asof(
            l_pdf.sort_values("t"), r_pdf.sort_values("t"), on="t", by="g"
        ).sort_values(["g", "t"])
        assert got["v"].tolist() == exp["v"].tolist()

    def test_merge_asof_tolerance(self, spark):
        """test_multi.py:305 test_merge_asof_on_by_tolerance."""
        l_pdf = pd.DataFrame({"t": [3, 10]})
        r_pdf = pd.DataFrame({"t": [1, 8], "v": [1.0, 8.0]})
        got = ds.from_pandas(l_pdf).merge_asof(
            ds.from_pandas(r_pdf), on="t", tolerance=2
        ).compute().sort_values("t")
        exp = pd.merge_asof(l_pdf, r_pdf, on="t", tolerance=2)
        ge, ee = got["v"].tolist(), exp["v"].tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(ge, ee)
        )

    def test_merge_indicator(self, spark):
        """test_multi.py merge(indicator=True)."""
        l_pdf = pd.DataFrame({"k": [1, 2]})
        r_pdf = pd.DataFrame({"k": [2, 3]})
        got = ds.from_pandas(l_pdf).merge(
            ds.from_pandas(r_pdf), on="k", how="outer", indicator=True
        ).compute()
        exp = l_pdf.merge(r_pdf, on="k", how="outer", indicator=True)
        assert (
            sorted(got["_merge"].astype(str).tolist())
            == sorted(exp["_merge"].astype(str).tolist())
        )


# =====================================================================
# rolling — test_rolling.py
# =====================================================================

class TestRolling:
    @pytest.mark.parametrize(
        "method", ["mean", "sum", "min", "max", "count", "std"]
    )
    def test_rolling_methods(self, spark, method):
        """test_rolling.py:275 test_rolling_methods — row windows,
        min_periods=1 (the engine default)."""
        pdf = pd.DataFrame({"t": range(12),
                            "v": [float((i * 7) % 5) for i in range(12)]})
        df = ds.from_pandas(pdf)
        got = getattr(df.rolling(3, on="t"), method)("v").compute() \
            .sort_values("t")
        exp = getattr(pdf["v"].rolling(3, min_periods=1), method)()
        gcol = [c for c in got.columns if c.startswith("v_roll")][0]
        ge = got[gcol].tolist()
        ee = exp.tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or abs(a - b) < 1e-9
            for a, b in zip(ge, ee)
        ), method

    def test_time_rolling_methods(self, spark):
        """test_rolling.py:350 test_time_rolling_methods — range
        window over a time column."""
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime("2024-01-01")
             + pd.to_timedelta(np.arange(10) * 30, unit="m"),
             "v": [float(i % 4) for i in range(10)]}
        )
        df = ds.from_pandas(pdf)
        got = df.rolling("1h", on="ts").sum("v").compute().sort_values("ts")
        exp = pdf.rolling("1h", on="ts")["v"].sum()
        gcol = [c for c in got.columns if c.startswith("v_roll")][0]
        assert got[gcol].tolist() == exp.tolist()

    def test_map_overlap(self, spark):
        """test_rolling.py:59 test_map_overlap — halo rows make a
        cross-partition shift exact."""
        pdf = pd.DataFrame({"t": range(50),
                            "v": [float(i) for i in range(50)]})
        df = ds.from_pandas(pdf)

        def shifted(p):
            p = p.sort_values("t")
            return p.assign(prev=p["v"].shift(1))

        got = df.map_overlap(
            shifted, "t bigint, v double, prev double", on="t",
            before=1, after=0, npartitions=4,
        ).compute().sort_values("t")
        exp = pdf.sort_values("t").assign(prev=pdf["v"].shift(1))
        ge, ee = got["prev"].tolist(), exp["prev"].tolist()
        assert all(
            (pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(ge, ee)
        )


# =====================================================================
# indexing — test_indexing.py
# =====================================================================

class TestIndexing:
    def test_loc_mask_and_columns(self, spark):
        """test_indexing.py loc[mask, cols]."""
        pdf = pd.DataFrame({"a": [1, 2, 3], "b": [4.0, 5.0, 6.0]})
        df = ds.from_pandas(pdf)
        got = df.loc[df["a"] > 1, ["b"]].compute()
        exp = pdf.loc[pdf["a"] > 1, ["b"]]
        assert sorted(got["b"].tolist()) == sorted(exp["b"].tolist())

    def test_iloc_column_positional(self, spark):
        """test_indexing.py iloc[:, positions] (dask: column-
        positional only — row slicing raises there too)."""
        pdf = pd.DataFrame({"a": [1], "b": [2], "c": [3]})
        df = ds.from_pandas(pdf)
        got = df.iloc[:, [0, 2]]
        assert list(got.columns) == ["a", "c"]
        with pytest.raises(Exception):
            df.iloc[0]

    def test_loc_value_range_after_set_index(self, spark):
        """test_indexing.py loc[a:b] — INCLUSIVE label slice over the
        set_index column (dask divisions semantics)."""
        pdf = pd.DataFrame({"i": [1, 3, 5, 7, 9], "v": list("abcde")})
        df = ds.from_pandas(pdf).set_index("i")
        got = df.loc[3:7].compute()
        assert sorted(got["v"].tolist()) == ["b", "c", "d"]

    def test_index_survives_filter(self, spark):
        """dask keeps the index through filters — the engine's
        set_index marker now rides _derive, so loc label slicing
        still works after a row filter (r13)."""
        pdf = pd.DataFrame({"i": [1, 3, 5, 7, 9], "v": [0, 1, 0, 1, 0]})
        df = ds.from_pandas(pdf).set_index("i")
        sub = df[df["v"] == 1]
        got = sub.loc[3:7].compute()
        assert sorted(got["i"].tolist()) == [3, 7]
