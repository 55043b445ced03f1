"""Join family vs pandas oracle (reference: dask_expr/_merge.py,
dask/dataframe/multi.py incl. merge_asof)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_DIR, assert_eq


def _j(tables, pdf_tables, how):
    o = tables["orders"][["o_orderkey", "o_custkey", "o_totalprice"]]
    c = tables["customer"][["c_custkey", "c_name"]]
    got = o.merge(c, how=how, left_on="o_custkey", right_on="c_custkey")[
        ["o_orderkey", "c_name"]
    ]
    po = pdf_tables["orders"][["o_orderkey", "o_custkey", "o_totalprice"]]
    pc = pdf_tables["customer"][["c_custkey", "c_name"]]
    want = po.merge(pc, how=how, left_on="o_custkey", right_on="c_custkey")[
        ["o_orderkey", "c_name"]
    ]
    assert_eq(got, want)


def test_join_inner(tables, pdf_tables):
    _j(tables, pdf_tables, "inner")


def test_join_left(tables, pdf_tables):
    _j(tables, pdf_tables, "left")


def test_join_outer(tables, pdf_tables):
    _j(tables, pdf_tables, "outer")


def test_join_semi_anti(tables, pdf_tables):
    c = tables["customer"]
    o = tables["orders"]
    semi = c.merge(o, how="semi", left_on="c_custkey", right_on="o_custkey")
    anti = c.merge(o, how="anti", left_on="c_custkey", right_on="o_custkey")
    pc, po = pdf_tables["customer"], pdf_tables["orders"]
    with_orders = set(po.o_custkey)
    assert len(semi.compute()) == pc.c_custkey.isin(with_orders).sum()
    assert len(anti.compute()) == (~pc.c_custkey.isin(with_orders)).sum()
    # semi/anti partition the left side exactly
    assert len(semi.compute()) + len(anti.compute()) == len(pc)


def test_join_cross(tables, pdf_tables):
    r = tables["region"]
    n = tables["nation"]
    out = r.merge(n, how="cross").compute()
    assert len(out) == len(pdf_tables["region"]) * len(pdf_tables["nation"])


def test_join_suffixes(spark):
    import dask_spark as ds

    a = ds.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    b = ds.from_pandas(pd.DataFrame({"k": [1, 2], "v": [30, 40]}))
    out = a.merge(b, on="k").compute()
    assert sorted(out.columns) == ["k", "v_x", "v_y"]


def test_broadcast_join_plan(tables):
    from dask_spark.plans import uses_broadcast_join

    o = tables["orders"]
    n = tables["nation"]
    c = tables["customer"]
    j = c.merge(n, left_on="c_nationkey", right_on="n_nationkey", broadcast=True)
    assert uses_broadcast_join(j)


def test_salted_join_matches_plain(tables, pdf_tables):
    from dask_spark.operators.joins import salted_join

    o = tables["orders"][["o_orderkey", "o_custkey"]]
    c = tables["customer"][["c_custkey", "c_name", "c_nationkey"]].rename(
        columns={"c_custkey": "o_custkey"}
    )
    got = salted_join(o, c, on="o_custkey")[["o_orderkey", "c_name"]]
    po = pdf_tables["orders"][["o_orderkey", "o_custkey"]]
    pc = pdf_tables["customer"].rename(columns={"c_custkey": "o_custkey"})
    want = po.merge(pc, on="o_custkey")[["o_orderkey", "c_name"]]
    assert_eq(got, want)


def _asof_frames(direction, tolerance=None):
    left = pd.DataFrame(
        {
            "t": [1, 3, 5, 7, 9, 20],
            "g": ["a", "a", "a", "b", "b", "b"],
            "lv": [1, 2, 3, 4, 5, 6],
        }
    )
    right = pd.DataFrame(
        {
            "t": [0, 4, 6, 8, 100],
            "g": ["a", "a", "b", "b", "a"],
            "rv": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="g",
        direction=direction,
        tolerance=tolerance,
    )
    return left, right, want


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_asof(spark, direction):
    import dask_spark as ds

    left, right, want = _asof_frames(direction)
    got = ds.from_pandas(left).merge_asof(
        ds.from_pandas(right), on="t", by="g", direction=direction
    )
    assert_eq(got, want, sort_by=["t", "g"])


def test_merge_asof_tolerance(spark):
    import dask_spark as ds

    left, right, want = _asof_frames("backward", tolerance=3)
    got = ds.from_pandas(left).merge_asof(
        ds.from_pandas(right), on="t", by="g", direction="backward", tolerance=3
    )
    assert_eq(got, want, sort_by=["t", "g"])


def test_merge_asof_ties_included(spark):
    """Backward asof at equal timestamps matches the tie (pandas
    allow_exact_matches=True default)."""
    import dask_spark as ds

    left = pd.DataFrame({"t": [5], "lv": [1]})
    right = pd.DataFrame({"t": [5], "rv": [9.0]})
    got = (
        ds.from_pandas(left)
        .merge_asof(ds.from_pandas(right), on="t")
        .compute()
    )
    assert got.rv.iloc[0] == 9.0


def test_range_join(spark):
    import dask_spark as ds
    from dask_spark.operators.joins import range_join

    left = ds.from_pandas(
        pd.DataFrame({"g": ["a", "a", "b"], "t": [0, 100, 0], "lv": [1, 2, 3]})
    )
    right = ds.from_pandas(
        pd.DataFrame({"g": ["a", "a", "a", "b"], "t": [5, 50, 200, 500],
                      "rv": [10, 20, 30, 40]})
    )
    # numeric axis works through the timestamp path? use ints as epoch
    import pyspark.sql.functions as F

    from dask_spark.frame import DaskFrame

    l2 = DaskFrame(left.to_spark().withColumn("t", F.timestamp_seconds("t")))
    r2 = DaskFrame(right.to_spark().withColumn("t", F.timestamp_seconds("t")))
    out = range_join(l2, r2, by="g", on="t", lower=0, upper=60).compute()
    got = sorted(zip(out.lv, out.rv))
    # lv=1 (t=0,a) matches rv 10 (t=5), 20 (t=50); lv=2 (t=100,a) none ≤160
    # except none; lv=3 (t=0,b) none within 60 (t=500)
    assert got == [(1, 10), (1, 20)]


def test_merge_asof_timestamp_tolerance(spark):
    """Numeric tolerance (seconds) against a timestamp on-key: Spark
    interval arithmetic must not leak into the comparison."""
    import pandas as pd

    import dask_spark as ds

    lt = pd.to_datetime(["2026-01-01 00:00:10", "2026-01-01 00:05:00"])
    rt = pd.to_datetime(["2026-01-01 00:00:00"])
    left = pd.DataFrame({"t": lt, "lv": [1, 2]})
    right = pd.DataFrame({"t": rt, "rv": [7.0]})
    got = (
        ds.from_pandas(left)
        .merge_asof(ds.from_pandas(right), on="t", tolerance=30)
        .compute()
        .sort_values("t", ignore_index=True)
    )
    # 10s gap within 30s tolerance; 5min gap outside it
    assert got.rv.iloc[0] == 7.0 and pd.isna(got.rv.iloc[1])


@pytest.mark.parametrize("allow_exact", [True, False])
def test_merge_asof_nearest(spark, allow_exact):
    import dask_spark as ds

    left = pd.DataFrame(
        {
            "t": [1, 3, 5, 7, 9, 20, 100],
            "g": ["a", "a", "a", "b", "b", "b", "b"],
            "lv": [1, 2, 3, 4, 5, 6, 7],
        }
    )
    right = pd.DataFrame(
        {
            "t": [0, 4, 6, 8, 100],
            "g": ["a", "a", "b", "b", "a"],
            "rv": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="g",
        direction="nearest",
        allow_exact_matches=allow_exact,
    )
    got = ds.from_pandas(left).merge_asof(
        ds.from_pandas(right), on="t", by="g", direction="nearest",
        allow_exact_matches=allow_exact,
    )
    assert_eq(got, want, sort_by=["t", "g"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_merge_asof_keyless_nearest_and_strict(spark, direction):
    """Keyless (range-bucketed) path, exact matches EXCLUDED — the
    carry seeds must respect strictness across bucket boundaries."""
    import dask_spark as ds

    left = pd.DataFrame({"t": list(range(0, 60, 3)), "lv": range(20)})
    right = pd.DataFrame(
        {"t": [0, 6, 12, 30, 48, 57], "rv": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}
    )
    want = pd.merge_asof(
        left, right, on="t", direction=direction, allow_exact_matches=False
    )
    got = ds.from_pandas(left).merge_asof(
        ds.from_pandas(right), on="t", direction=direction,
        allow_exact_matches=False,
    )
    assert_eq(got, want, sort_by=["t"])


def test_merge_asof_nearest_tolerance(spark):
    import dask_spark as ds

    left = pd.DataFrame({"t": [0, 10, 100], "lv": [1, 2, 3]})
    right = pd.DataFrame({"t": [4, 90], "rv": [7.0, 8.0]})
    want = pd.merge_asof(left, right, on="t", direction="nearest", tolerance=6)
    got = ds.from_pandas(left).merge_asof(
        ds.from_pandas(right), on="t", direction="nearest", tolerance=6
    )
    assert_eq(got, want, sort_by=["t"])


def test_merge_indicator(spark):
    """pandas merge(indicator=True): per-row provenance column."""
    import dask_spark as ds

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": [200.0, 300.0, 400.0]})
    got = (
        ds.from_pandas(left)
        .merge(ds.from_pandas(right), on="k", how="outer", indicator=True)
        .compute()
        .sort_values("k", ignore_index=True)
    )
    want = pd.merge(left, right, on="k", how="outer", indicator=True)
    assert list(got._merge) == [str(v) for v in want.sort_values("k")._merge]


# ---------------------------------------------------------------- TPC-H tail


NEW_TPCH = [
    "join_q2_min_cost_supplier",
    "join_q8_market_share",
    "join_q9_product_profit",
    "join_q11_important_stock",
    "join_q12_late_priority",
    "join_q13_order_distribution",
    "join_q16_supplier_cnt",
    "join_q17_small_qty",
    "join_q20_excess_stock",
    "join_q21_sole_returns",
]


@pytest.mark.parametrize("name", NEW_TPCH)
def test_tpch_tail_runs(spark, sf_dir, name):
    """Round-8 TPC-H tail (Q2/8/9/11/12/13/16/17/20/21 shapes): every
    query executes and returns rows at sf0.001; values are oracled by
    the verify sweep (scripts/verify_local.py)."""
    from dask_spark.queries import REGISTRY

    fn, oracle = REGISTRY[name]
    assert oracle is not None  # every one is value-checked
    sdf = fn(spark, sf_dir)
    assert sdf.count() >= 0


def test_tpch_q9_plan_broadcasts_dims(spark, sf_dir):
    """Q9's part/supplier/nation dims must broadcast: the only real
    exchange is lineitem⋈orders plus the final group-key shuffle."""
    from dask_spark.queries import REGISTRY

    sdf = REGISTRY["join_q9_product_profit"][0](spark, sf_dir)
    txt = sdf._sc is not None and sdf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in txt


def test_tpch_q13_left_join_keeps_zero_customers(spark, sf_dir):
    """Customers with no qualifying orders must appear in the c_count=0
    bucket (the filter lives in the join, not after it)."""
    from dask_spark.queries import REGISTRY

    sdf = REGISTRY["join_q13_order_distribution"][0](spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in sdf.collect()}
    total = sum(rows.values())
    import duckdb

    con = duckdb.connect()
    ncust = con.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet'"
    ).fetchone()[0]
    assert total == ncust  # every customer lands in exactly one bucket


def test_merge_validate(spark):
    """pandas merge(validate=): uniqueness contracts checked eagerly,
    MergeError (a ValueError) on violation."""
    import pandas as pd
    import pytest

    import dask_spark as ds
    from dask_spark.operators.joins import MergeError

    uniq = ds.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [1, 2, 3]}))
    dup = ds.from_pandas(pd.DataFrame({"k": [1, 1, 2], "w": [1, 2, 3]}))
    # valid contracts pass through
    assert len(uniq.merge(dup, on="k", validate="1:m").compute()) == 3
    assert len(dup.merge(uniq, on="k", validate="m:1").compute()) == 3
    assert len(uniq.merge(uniq, on="k", validate="one_to_one",
                          suffixes=("_a", "_b")).compute()) == 3
    with pytest.raises(MergeError):
        uniq.merge(dup, on="k", validate="1:1")
    with pytest.raises(MergeError):
        dup.merge(uniq, on="k", validate="one_to_many")
    with pytest.raises(ValueError):
        uniq.merge(dup, on="k", validate="bogus")
    # left_on/right_on path
    with pytest.raises(MergeError):
        uniq.merge(dup, left_on="k", right_on="k", validate="m:1")


def test_salted_join_equals_plain_join(spark):
    """Inner and left salted joins reproduce the plain join's multiset
    exactly (incl. unmatched-left nulls and duplicate dim keys); the
    salt column never leaks; invalid args raise."""
    import pytest

    from dask_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 7)],
        "k bigint, payload bigint",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (2, "warm2"), (9, "unused")],
        "k bigint, label string",
    )
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(
            big, dim, "k", salt=8, how=how).to_spark().collect()))
        want = sorted(map(tuple, big.join(dim, "k", how).collect()))
        assert got == want, how
        assert "__salt" not in salted_join(
            big, dim, "k", salt=8, how=how).to_spark().columns

    with pytest.raises(ValueError, match="salt"):
        salted_join(big, dim, "k", salt=0)
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(big, dim, "k", how="outer")


def test_apply_cdc_semantics(spark):
    """Latest-seq wins per key, deletes drop, inserts append, an
    untouched key passes through, same-seq delete beats update (the
    conservative tie), and schema drift raises."""
    import pytest

    from dask_spark.operators.joins import apply_cdc

    state = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        "k bigint, v string",
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"), (1, "a3", 5, "U"),  # latest seq wins
            (2, "b", 2, "D"),                       # delete
            (5, "e", 3, "I"),                       # insert
            (3, "c-tie", 7, "U"), (3, "c", 7, "D"),  # tie: D wins
        ],
        "k bigint, v string, seq bigint, op string",
    )
    got = {r["k"]: r["v"] for r in
           apply_cdc(state, changes, "k").to_spark().collect()}
    assert got == {1: "a3", 4: "d", 5: "e"}

    bad = changes.withColumnRenamed("v", "w")
    with pytest.raises(ValueError, match="state schema"):
        apply_cdc(state, bad, "k")
    neg = spark.createDataFrame(
        [(1, "x", -5, "U")], "k bigint, v string, seq bigint, op string"
    )
    with pytest.raises(ValueError, match="seq must be"):
        apply_cdc(state, neg, "k")


def test_scd2_intervals_semantics(spark):
    """Consecutive equal observations collapse; a change opens a new
    interval whose valid_from is the change time and closes the
    previous; the last interval is current; a NULL phase is its own
    interval."""
    import datetime as dt

    from dask_spark.operators.joins import scd2_intervals

    d = dt.date
    rows = [
        (1, "gold", d(2024, 1, 1)), (1, "gold", d(2024, 2, 1)),
        (1, "silver", d(2024, 3, 1)), (1, "gold", d(2024, 5, 1)),
        (2, None, d(2024, 1, 1)), (2, "bronze", d(2024, 4, 1)),
    ]
    df = spark.createDataFrame(rows, "k bigint, tier string, ts date")
    out = sorted(
        scd2_intervals(df, "k", "tier", "ts").to_spark().collect(),
        key=lambda r: (r["k"], str(r["valid_from"])),
    )
    got = [(r["k"], r["tier"], str(r["valid_from"]),
            None if r["valid_to"] is None else str(r["valid_to"]),
            r["is_current"]) for r in out]
    assert got == [
        (1, "gold", "2024-01-01", "2024-03-01", False),
        (1, "silver", "2024-03-01", "2024-05-01", False),
        (1, "gold", "2024-05-01", None, True),
        (2, None, "2024-01-01", "2024-04-01", False),
        (2, "bronze", "2024-04-01", None, True),
    ]
