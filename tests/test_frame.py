"""DaskFrame elementwise / selection / NA behavior vs pandas oracle.

Mirrors reference test style (dask/dataframe/tests/test_dataframe.py):
many tiny parity cases against the in-memory pandas result."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import assert_eq


def test_getitem_columns(tables, pdf_tables):
    got = tables["lineitem"][["l_orderkey", "l_quantity"]]
    assert_eq(got, pdf_tables["lineitem"][["l_orderkey", "l_quantity"]])


def test_arith_assign(tables, pdf_tables):
    li = tables["lineitem"]
    got = li.assign(
        revenue=li.l_extendedprice * (1 - li.l_discount),
        qty2=li.l_quantity + 1,
    )[["l_orderkey", "revenue", "qty2"]]
    p = pdf_tables["lineitem"]
    want = pd.DataFrame(
        {
            "l_orderkey": p.l_orderkey,
            "revenue": p.l_extendedprice * (1 - p.l_discount),
            "qty2": p.l_quantity + 1,
        }
    )
    assert_eq(got, want)


def test_boolean_mask_filter(tables, pdf_tables):
    li = tables["lineitem"]
    got = li[(li.l_quantity > 30) & (li.l_discount <= 0.05)][["l_orderkey", "l_quantity"]]
    p = pdf_tables["lineitem"]
    want = p[(p.l_quantity > 30) & (p.l_discount <= 0.05)][["l_orderkey", "l_quantity"]]
    assert_eq(got, want)


def test_query_string(tables, pdf_tables):
    got = tables["orders"].query("o_totalprice > 100000")[["o_orderkey"]]
    want = pdf_tables["orders"].query("o_totalprice > 100000")[["o_orderkey"]]
    assert_eq(got, want)


def test_isin(tables, pdf_tables):
    n = tables["nation"]
    got = n[n.n_regionkey.isin([0, 2])][["n_name"]]
    p = pdf_tables["nation"]
    assert_eq(got, p[p.n_regionkey.isin([0, 2])][["n_name"]])


def test_where_mask_clip(tables, pdf_tables):
    li = tables["lineitem"]
    got = li.assign(
        w=li.l_quantity.where(li.l_quantity > 25, other=0.0),
        m=li.l_quantity.mask(li.l_quantity > 25, other=-1.0),
        c=li.l_quantity.clip(lower=10, upper=40),
    )[["l_orderkey", "l_linenumber", "w", "m", "c"]]
    p = pdf_tables["lineitem"]
    want = pd.DataFrame(
        {
            "l_orderkey": p.l_orderkey,
            "l_linenumber": p.l_linenumber,
            "w": p.l_quantity.where(p.l_quantity > 25, other=0.0),
            "m": p.l_quantity.mask(p.l_quantity > 25, other=-1.0),
            "c": p.l_quantity.clip(lower=10, upper=40).astype(float),
        }
    )
    assert_eq(got, want)


def test_fillna_dropna_replace(spark):
    import dask_spark as ds

    pdf = pd.DataFrame(
        {"a": [1.0, None, 3.0, None], "b": ["x", None, "y", "z"]}
    )
    f = ds.from_pandas(pdf)
    assert_eq(f.fillna(0.0)[["a"]], pdf[["a"]].fillna(0.0))
    assert len(f.dropna().compute()) == 2
    assert len(f.dropna(how="all").compute()) == 3
    got = f.replace("x", "xx").compute()
    assert set(got.b.dropna()) == {"xx", "y", "z"}


def test_astype(tables, pdf_tables):
    got = tables["lineitem"].astype({"l_quantity": "int"})[["l_quantity"]]
    want = pdf_tables["lineitem"][["l_quantity"]].astype(int)
    assert_eq(got, want)


def test_rename_drop(tables):
    li = tables["lineitem"]
    out = li.rename(columns={"l_quantity": "qty"}).drop("l_comment")
    assert "qty" in out.columns and "l_quantity" not in out.columns
    assert "l_comment" not in out.columns


def test_head_sample(tables):
    li = tables["lineitem"]
    assert len(li.head(7)) == 7
    n = len(li.sample(0.1).compute())
    total = len(li.compute())
    assert 0 < n < total


def test_str_accessor(tables, pdf_tables):
    c = tables["customer"]
    got = c.assign(
        lo=c.c_name.str.lower(),
        ln=c.c_name.str.len(),
        has=c.c_name.str.contains("1"),
        pre=c.c_name.str.slice(0, 8),
    )[["c_custkey", "lo", "ln", "has", "pre"]]
    p = pdf_tables["customer"]
    want = pd.DataFrame(
        {
            "c_custkey": p.c_custkey,
            "lo": p.c_name.str.lower(),
            "ln": p.c_name.str.len(),
            "has": p.c_name.str.contains("1"),
            "pre": p.c_name.str.slice(0, 8),
        }
    )
    assert_eq(got, want)


def test_dt_accessor(tables, pdf_tables):
    o = tables["orders"]
    got = o.assign(
        y=o.o_orderdate.dt.year, m=o.o_orderdate.dt.month, d=o.o_orderdate.dt.day
    )[["o_orderkey", "y", "m", "d"]]
    p = pdf_tables["orders"]
    dt = pd.to_datetime(p.o_orderdate)
    want = pd.DataFrame(
        {"o_orderkey": p.o_orderkey, "y": dt.dt.year, "m": dt.dt.month, "d": dt.dt.day}
    )
    assert_eq(got, want)


def test_map_pandas_udf(tables, pdf_tables):
    li = tables["lineitem"]
    got = li.assign(q2=li.l_quantity.map(lambda s: s * 2 + 1, dtype="double"))[
        ["l_orderkey", "l_linenumber", "q2"]
    ]
    p = pdf_tables["lineitem"]
    want = pd.DataFrame(
        {
            "l_orderkey": p.l_orderkey,
            "l_linenumber": p.l_linenumber,
            "q2": p.l_quantity * 2 + 1,
        }
    )
    assert_eq(got, want)


def test_map_partitions(tables, pdf_tables):
    li = tables["lineitem"]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": pdf.l_orderkey, "v": pdf.l_quantity * 3})

    got = li.map_partitions(fn, schema="k long, v double")
    p = pdf_tables["lineitem"]
    want = pd.DataFrame({"k": p.l_orderkey, "v": p.l_quantity * 3})
    assert_eq(got, want)


def test_empty_result_schema_stable(tables):
    li = tables["lineitem"]
    out = li[li.l_quantity > 1e12][["l_orderkey", "l_quantity"]].compute()
    assert len(out) == 0
    assert list(out.columns) == ["l_orderkey", "l_quantity"]


def test_concat_union(tables):
    import dask_spark as ds

    a = tables["nation"][["n_nationkey", "n_name"]]
    b = tables["nation"][["n_nationkey", "n_name"]]
    out = ds.concat([a, b]).compute()
    assert len(out) == 2 * len(tables["nation"].compute())


def test_setitem(tables):
    li = tables["lineitem"]
    li2 = li[["l_orderkey", "l_quantity"]]
    li2["double_q"] = li2.l_quantity * 2
    out = li2.compute()
    assert (out.double_q == out.l_quantity * 2).all()


def test_iloc_columns(tables):
    li = tables["lineitem"]
    got = li.iloc[:, [0, 3]]
    assert got.columns == [li.columns[0], li.columns[3]]
    got2 = li.iloc[:, 1:3]
    assert got2.columns == li.columns[1:3]


def test_loc(tables, pdf_tables):
    li = tables["lineitem"]
    p = pdf_tables["lineitem"]
    got = li.loc[li.l_quantity > 45, ["l_orderkey", "l_quantity"]].compute()
    want = p.loc[p.l_quantity > 45, ["l_orderkey", "l_quantity"]]
    assert len(got) == len(want)
    assert li.loc[:, ["l_orderkey"]].columns == ["l_orderkey"]


def test_misc_parity(tables, spark):
    import dask_spark as ds

    li = tables["lineitem"]
    # copy / reset_index / rename_axis are plan-level no-ops
    assert li.copy().columns == li.columns
    assert li.reset_index() is li
    # squeeze 1-col frame → Series
    s = li[["l_quantity"]].squeeze()
    from dask_spark.frame import Series

    assert isinstance(s, Series)
    # pop removes the column and returns it
    f2 = li[["l_orderkey", "l_quantity"]]
    popped = f2.pop("l_quantity")
    assert "l_quantity" not in f2.columns and popped._name == "l_quantity"
    # get_partition rows sum to the whole
    parts = li.to_spark().rdd.getNumPartitions()
    n0 = len(li.get_partition(0).compute())
    assert 0 < n0 < len(li.compute()) or parts == 1
    # itertuples streams rows
    it = li[["l_orderkey"]].itertuples()
    first = next(iter(it))
    assert hasattr(first, "l_orderkey")
    # info/nbytes
    assert "columns" in li.info() and li.nbytes > 0
    # from_dict
    fd = ds.from_dict({"a": [1, 2], "b": ["x", "y"]})
    assert sorted(fd.columns) == ["a", "b"]


def test_where_mask_frame(spark):
    import dask_spark as ds

    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]})
    f = ds.from_pandas(pdf)
    out = f.where_frame(f.a > 1, other=None).compute().sort_values("b", na_position="first")
    assert out.a.isna().sum() == 1 and out.b.isna().sum() == 1
    out2 = f.mask_frame(f.a > 1, other=None).compute()
    assert out2.a.isna().sum() == 2


def test_sql_passthrough(tables):
    import dask_spark as ds

    tables["nation"].to_view("v_nation")
    out = ds.sql(
        "SELECT n_regionkey, count(*) AS n FROM v_nation GROUP BY n_regionkey"
    ).compute()
    assert out.n.sum() == len(tables["nation"].compute())


def test_dropna_thresh(spark):
    import dask_spark as ds

    pdf = pd.DataFrame(
        {"a": [1.0, None, None], "b": [1.0, 2.0, None], "c": [1.0, 2.0, 3.0]}
    )
    f = ds.from_pandas(pdf)
    assert len(f.dropna(thresh=2).compute()) == 2
    assert len(f.dropna(thresh=3).compute()) == 1


def test_series_describe_and_tail(tables, pdf_tables):
    out = tables["lineitem"].l_quantity.describe().compute()
    assert out.column.tolist() == ["l_quantity"]
    assert out["count"].iloc[0] == len(pdf_tables["lineitem"])
    t = tables["nation"].tail(3)
    assert len(t) == 3 and "n_name" in t.columns


def test_corr_cov_matrix(tables, pdf_tables):
    """Pairwise corr/cov long-form vs pandas DataFrame.corr()/cov()."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    p = pdf_tables["lineitem"][cols]
    got_corr = tables["lineitem"].corr_matrix(cols).compute()
    want_corr = p.corr()
    got_cov = tables["lineitem"].cov_matrix(cols).compute()
    want_cov = p.cov()
    assert len(got_corr) == 9 and len(got_cov) == 9
    for _, r in got_corr.iterrows():
        assert abs(r["value"] - want_corr.loc[r.col_x, r.col_y]) < 1e-6
    for _, r in got_cov.iterrows():
        assert abs(r["value"] - want_cov.loc[r.col_x, r.col_y]) < 1e-4 * (
            1 + abs(want_cov.loc[r.col_x, r.col_y])
        )


def test_is_monotonic(spark):
    import pandas as pd

    import dask_spark as ds

    pdf = pd.DataFrame(
        {"t": [1, 2, 3, 4, 5], "up": [1.0, 1.0, 2.0, 5.0, 9.0],
         "down": [9.0, 7.0, 7.0, 3.0, 1.0], "mixed": [1.0, 3.0, 2.0, 4.0, 5.0]}
    )
    f = ds.from_pandas(pdf)
    assert f.is_monotonic_increasing("up", order_by="t") is True
    assert f.is_monotonic_decreasing("up", order_by="t") is False
    assert f.is_monotonic_decreasing("down", order_by="t") is True
    assert f.is_monotonic_increasing("mixed", order_by="t") is False
    assert f.is_monotonic_decreasing("mixed", order_by="t") is False


def test_conversion_bridges(tables):
    """to_bag/to_records/itertuples (reference: _collection.py
    conversions) + groupby split_out partitioning."""
    import pyspark.sql.functions as F

    n = tables["nation"]
    bag = n[["n_nationkey", "n_name"]].to_bag()
    items = bag.compute()
    assert len(items) == 25

    recs = n[["n_nationkey", "n_name"]].to_records()
    assert len(recs) == 25 and recs.dtype.names == ("n_nationkey", "n_name")

    rows = list(n[["n_nationkey"]].itertuples())
    assert sorted(r.n_nationkey for r in rows) == list(range(25))

    out = (
        tables["orders"]
        .groupby("o_orderpriority")
        .agg({"o_totalprice": "sum"}, split_out=2)
    )
    assert out.to_spark().rdd.getNumPartitions() == 2
    assert len(out.compute()) == 5


def test_series_is_monotonic(spark):
    import pandas as pd

    import dask_spark as ds

    pdf = pd.DataFrame({"t": [1, 2, 3], "v": [1.0, 2.0, 1.5]})
    f = ds.from_pandas(pdf)
    assert f.t.is_monotonic_increasing(order_by="t") is True
    assert f.v.is_monotonic_increasing(order_by="t") is False


def test_concat_axis1_and_frame_nunique(tables, pdf_tables):
    import dask_spark as ds

    n = tables["nation"]
    a = n[["n_nationkey", "n_name"]]
    b = n[["n_nationkey", "n_regionkey"]]
    got = ds.concat([a, b], axis=1, on="n_nationkey").compute()
    assert len(got) == 25
    assert set(got.columns) == {"n_nationkey", "n_name", "n_regionkey"}

    nu = tables["orders"][["o_orderstatus", "o_orderpriority"]].nunique().compute()
    p = pdf_tables["orders"]
    assert nu.o_orderstatus.iloc[0] == p.o_orderstatus.nunique()
    assert nu.o_orderpriority.iloc[0] == p.o_orderpriority.nunique()

    # with-replacement sampling returns roughly frac*n rows
    s = tables["orders"].sample(0.5, replace=True).compute()
    assert 0.2 < len(s) / len(p) < 0.9


def test_to_datetime_to_numeric(spark):
    import dask_spark as ds

    pdf = pd.DataFrame(
        {"d": ["2026-01-02 03:04:05", "2026-06-07 08:09:10"],
         "n": ["1.5", "oops"]}
    )
    f = ds.from_pandas(pdf)
    ts = f.assign(t=ds.to_datetime(f.d)).compute()
    assert str(ts.t.dtype).startswith("datetime64")
    assert ts.t.iloc[0] == pd.Timestamp("2026-01-02 03:04:05")
    num = f.assign(x=ds.to_numeric(f.n, errors="coerce")).compute()
    assert num.x.iloc[0] == 1.5 and pd.isna(num.x.iloc[1])


def test_dd_namespace_surface(spark, tmp_path):
    """dask.dataframe import-parity: every __all__ name resolves and
    the round-6 additions (from_map / from_array / from_dask_array /
    read_sql dispatch / demo) actually work."""
    import numpy as np
    import pandas as pd

    import dask_spark.dataframe as dd

    for name in dd.__all__:
        assert getattr(dd, name) is not None, name

    # from_map: func runs INSIDE the engine, one partition per item
    def make(i):
        return pd.DataFrame({"g": [i] * 3, "v": [i, i + 1, i + 2]})

    f = dd.from_map(make, [0, 1, 2])
    out = f.compute().sort_values(["g", "v"], ignore_index=True)
    assert len(out) == 9 and out["v"].sum() == sum(
        i + d for i in range(3) for d in (0, 1, 2))

    # from_array: 2-D ndarray → columns
    X = np.arange(12).reshape(4, 3)
    fa = dd.from_array(X, columns=["a", "b", "c"])
    assert sorted(fa.compute()["b"]) == [1, 4, 7, 10]

    # from_dask_array: DArray → one column per dim
    from dask_spark.array import from_array as arr_from_array

    da = arr_from_array([[1.0, 2.0], [3.0, 4.0]])
    fd = dd.from_dask_array(da, columns=["x", "y"])
    pdf = fd.compute().sort_values("x", ignore_index=True)
    assert pdf["y"].tolist() == [2.0, 4.0]

    # demo.make_timeseries is the timeseries generator
    ts = dd.demo.make_timeseries(end="2026-01-01 00:01:00")
    assert len(ts.compute()) == 60

    # module-level delegates
    assert len(dd.repartition(fa, 2).compute()) == 4
    assert dd.isna(fa).compute().values.sum() == 0


def test_series_framebase_delegation(spark):
    """Series inherits dask's FrameBase surface via its single-column
    frame: persist/repartition/IO/plan properties resolve and behave
    like the frame twin over the projected column."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.frame import DaskFrame

    pdf = pd.DataFrame({"x": [3.0, None, 1.0], "y": [1, 2, 3]})
    frame = ds.from_pandas(pdf, npartitions=2)
    s = frame["x"]
    assert s.npartitions == 2
    assert s.columns == ["x"]
    assert list(s.dtypes)  # resolves on the one-column frame
    assert s.tail(1).shape[1] == 1  # tail is an eager driver action
    s.explain()  # resolves, no raise
    assert isinstance(
        s.map_partitions(lambda p: p, schema="x double"), DaskFrame
    )
    filled = (s.combine_first(frame["y"].astype("double"))).compute()
    assert sorted(filled.tolist()) == [1.0, 2.0, 3.0]  # null filled from y
    with pytest.raises(AttributeError):
        s.definitely_not_a_method
    # classmethod twins + values
    f2 = DaskFrame.from_dict({"a": [1, 2, 3]}, npartitions=2)
    assert sorted(f2.compute().a.tolist()) == [1, 2, 3]
    assert f2.values.shape[0] == 3


def test_drop_duplicates_keep_false(spark):
    """pandas keep=False: every row whose key appears more than once
    is dropped entirely."""
    import pandas as pd

    import dask_spark as ds

    pdf = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": range(6)})
    got = (
        ds.from_pandas(pdf).drop_duplicates(subset=["k"], keep=False)
        .compute()
    )
    want = pdf.drop_duplicates(subset=["k"], keep=False)
    assert sorted(got.k.tolist()) == want.k.tolist() == [2]


def test_drop_duplicates_keep_false_null_keys(spark):
    """keep=False must treat null keys as equal on BOTH sides: a
    unique null-keyed row survives (pandas parity), duplicate nulls
    drop."""
    import pandas as pd

    import dask_spark as ds

    pdf = pd.DataFrame({"k": [1.0, None, 2.0, 2.0], "v": [1, 2, 3, 4]})
    got = (
        ds.from_pandas(pdf).drop_duplicates(subset=["k"], keep=False)
        .compute().sort_values("v")
    )
    want = pdf.drop_duplicates(subset=["k"], keep=False)
    assert got.v.tolist() == want.v.tolist() == [1, 2]
    pdf2 = pd.DataFrame({"k": [None, None, 3.0], "v": [1, 2, 3]})
    got2 = (
        ds.from_pandas(pdf2).drop_duplicates(subset=["k"], keep=False)
        .compute()
    )
    assert got2.v.tolist() == [3]


def test_values_property_column_shadow(spark):
    """FrameBase.values is ALWAYS the dask array (pandas/dask contract
    — no data-dependent return type); a column literally named
    'values' is reachable via frame['values']."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.frame import Series

    f = ds.from_pandas(pd.DataFrame({"values": [1.0, 2.0], "x": [3, 4]}))
    assert not isinstance(f.values, Series)  # dask contract: the array
    assert isinstance(f["values"], Series)   # the column, explicitly
    f2 = ds.from_pandas(pd.DataFrame({"x": [3.0, 4.0]}))
    assert not isinstance(f2.values, Series)


def test_series_map_dict_jvm_path(spark):
    """Series.map(dict) lowers to a literal-map lookup (no Python):
    pandas values for present keys, null for missing — and the plan
    contains no Arrow/Python evaluation node."""
    import pandas as pd

    import dask_spark as ds

    pdf = pd.DataFrame({"s": ["a", "b", "c", None]})
    f = ds.from_pandas(pdf)
    got = f.assign(m=f.s.map({"a": 10, "b": 20})).compute()
    want = pdf.s.map({"a": 10, "b": 20})
    assert all(
        (x == y) or (pd.isna(x) and pd.isna(y))
        for x, y in zip(got.m.tolist(), want.tolist())
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        f.assign(m=f.s.map({"a": 10})).to_spark().explain()
    assert "ArrowEvalPython" not in buf.getvalue()
    # empty mapping: all null (pandas gives all-NaN)
    allnull = f.assign(m=f.s.map({}, dtype="int")).compute()
    assert allnull.m.isna().all()
    # non-lowerable dicts fall back to the pandas-UDF path:
    # a None key (Spark maps reject null keys)
    nk = f.assign(m=f.s.map({None: "X", "a": "A"})).compute()
    nkm = dict(zip(nk.s.where(nk.s.notna(), None), nk.m))
    assert nkm["a"] == "A" and nkm[None] == "X"
    # a key type incompatible with the column type (int keys over a
    # string column): pandas returns all-NaN; the JVM literal-map
    # lookup would raise at plan time, so this must take the UDF path
    mis = f.assign(m=f.s.map({1: "one", 2: "two"})).compute()
    assert mis.m.isna().all()
    fnum = ds.from_pandas(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    mis2 = fnum.assign(m=fnum.x.map({"a": 9})).compute()
    assert mis2.m.isna().all()
    # numeric keys over a numeric column still lower to the JVM path
    okn = fnum.assign(m=fnum.x.map({1: 10, 2: 20}, dtype="int")).compute()
    assert okn.m.fillna(-1).tolist() == [10, 20, -1]
    # bool keys over a NUMERIC column: no implicit map-key coercion in
    # Catalyst (DATATYPE_MISMATCH) — must take the UDF path, and since
    # bool hash-equals int 1/0 in Python, pandas maps 1.0 -> the True
    # value (reproduces pandas exactly)
    okb = fnum.assign(m=fnum.x.map({True: "T", False: "F"})).compute()
    assert okb.m.tolist() == ["T", None, None]
    # a date-keyed dict over a DateType column keeps the fast JVM path
    import datetime as _dt

    fdt = ds.from_pandas(
        pd.DataFrame({"d": pd.to_datetime(["2024-01-01",
                                           "2024-01-02"]).date})
    )
    okd = fdt.assign(m=fdt.d.map({_dt.date(2024, 1, 1): 7}, dtype="int"))
    mm = okd.compute()
    assert mm.m.fillna(-1).tolist() == [7, -1]
    import io as _io
    from contextlib import redirect_stdout as _rs

    buf2 = _io.StringIO()
    with _rs(buf2):
        okd.to_spark().explain()
    assert "ArrowEvalPython" not in buf2.getvalue()
