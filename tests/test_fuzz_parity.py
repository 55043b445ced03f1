"""Pytest smoke slice of the composed-plan differential fuzzer
(scripts/fuzz_parity.py — see its docstring for the generator and op
vocabulary). The full 500-chain sweep runs out-of-band per round; this
slice keeps a fixed seed window green in CI so a regression in any
composition path (project/filter/assign/fillna/rename/drop/dedup/sort/
groupby/join over frames with nulls, ties, empty partitions) fails the
suite with a reproducible seed."""

from __future__ import annotations

import pandas as pd
import pytest

from scripts.fuzz_parity import run_chain

BASE = 20260816


@pytest.mark.parametrize("offset", range(0, 30))
def test_fuzz_chain(spark, offset):
    ok, msg = run_chain(BASE + offset)
    assert ok, msg


def test_nan_is_missing_at_pandas_boundary(spark):
    """r14 fuzz find (seed 20261177): pandas' float NaN is its MISSING
    marker — from_pandas now translates top-level float NaN to null so
    null-skipping aggregates match pandas skipna; previously the NaN
    rode through as a Spark VALUE and poisoned group sums."""
    import numpy as np
    import dask_spark as ds

    pdf = pd.DataFrame({"k": [0, 0, 1], "f": [np.nan, 2.0, np.nan]})
    f = ds.from_pandas(pdf, npartitions=2)
    got = f.groupby("k").agg({"f": "sum"}).compute().sort_values("k")
    exp = pdf.groupby("k")["f"].sum()
    assert got.f_sum.tolist() == [exp[0], exp[1]]  # [2.0, 0.0]
    # fillna treats the translated NaN as missing too
    assert sorted(f["f"].fillna(-1.0).compute()) == [-1.0, -1.0, 2.0]
    # array cells keep NaN as an IEEE VALUE (numpy semantics), pinned
    pdf2 = pd.DataFrame({"rid": [0], "vec": [[np.nan, 1.0]]})
    v = ds.from_pandas(pdf2).compute().vec.iloc[0]
    assert np.isnan(v[0])


def test_groupby_sum_prod_min_count_identity(spark):
    """r14 fuzz find (seed 20261278): pandas sum/prod of an all-missing
    group are 0.0/1.0 (min_count=0), not NULL; applied at aggregate
    call sites only — transform() keeps NULL for null-key rows."""
    import numpy as np
    import dask_spark as ds

    pdf = pd.DataFrame({"k": [0, 1], "f": [np.nan, 3.0]})
    f = ds.from_pandas(pdf)
    got = f.groupby("k").agg({"f": ["sum", "prod"]}).compute() \
        .sort_values("k")
    assert got.f_sum.tolist() == [0.0, 3.0]
    assert got.f_prod.tolist() == [1.0, 3.0]


def test_midplan_nan_is_missing_to_aggregates(spark):
    """r14 deep-NaN pin: NaN created MID-PLAN (sqrt(-1), 0/0) is
    missing to every skipna aggregate — groupby, Series scalar, frame
    axis-0 and axis-1 — matching pandas; Spark alone would poison the
    sum and sort NaN greatest in max."""
    import numpy as np
    import dask_spark as ds

    pdf = pd.DataFrame({"k": [0, 0, 1], "f": [4.0, -1.0, 9.0]})
    f = ds.from_pandas(pdf)
    f["z"] = f["f"] ** 0.5
    with np.errstate(invalid="ignore"):
        pdf["z"] = pdf["f"] ** 0.5
    got = f.groupby("k").agg({"z": ["sum", "max"]}).compute() \
        .sort_values("k")
    assert got.z_sum.tolist() == pdf.groupby("k").z.sum().tolist()
    assert got.z_max.tolist() == pdf.groupby("k").z.max().tolist()
    assert f["z"].sum() == pdf.z.sum()
    assert f["z"].max() == pdf.z.max()
    assert f["z"].count() == pdf.z.count()
    assert sorted(f[["f", "z"]].sum(axis=1).compute()) == \
        sorted(pdf[["f", "z"]].sum(axis=1))
    assert sorted(f[["f", "z"]].count(axis=1).compute()) == \
        sorted(pdf[["f", "z"]].count(axis=1))


def test_midplan_nan_sort_placement(spark):
    """r14: NaN follows na_position in sort_values (Spark alone orders
    NaN greatest, putting it FIRST in a descending sort)."""
    import numpy as np
    import dask_spark as ds

    pdf = pd.DataFrame({"f": [4.0, -1.0, 9.0], "g": [1, 2, 3]})
    f = ds.from_pandas(pdf)
    f["z"] = f["f"] ** 0.5
    with np.errstate(invalid="ignore"):
        pdf["z"] = pdf["f"] ** 0.5
    for asc in (True, False):
        got = f.sort_values("z", ascending=asc).compute().g.tolist()
        exp = pdf.sort_values("z", ascending=asc).g.tolist()
        assert got == exp, (asc, got, exp)


def test_merge_missing_keys_deviation(spark):
    """PINNED DEVIATION (r14): pandas matches NaN join keys to each
    other; the engine keeps SQL semantics — missing keys never match
    (operators/joins.py merge docstring: a null-matching join is a
    cross-product skew hazard at scale)."""
    import numpy as np
    import dask_spark as ds

    l = pd.DataFrame({"k": [1.0, np.nan], "a": [10, 20]})
    r = pd.DataFrame({"k": [1.0, np.nan], "b": [100, 200]})
    assert len(l.merge(r, on="k")) == 2          # pandas: NaN == NaN
    got = ds.from_pandas(l).merge(ds.from_pandas(r), on="k").compute()
    assert len(got) == 1                          # engine: SQL rule
    assert got.a.iloc[0] == 10 and got.b.iloc[0] == 100


def test_midplan_nan_value_counts_rank_nunique(spark):
    """r14: mid-plan NaN is missing to value_counts (dropna default),
    rank (na_option='keep' leaves it unranked) and nunique — pandas
    parity; previously the NaN formed its own bucket/rank slot."""
    import numpy as np
    import dask_spark as ds

    pdf = pd.DataFrame({"f": [4.0, -1.0, 9.0, 4.0]})
    f = ds.from_pandas(pdf)
    f["z"] = f["f"] ** 0.5
    with np.errstate(invalid="ignore"):
        pdf["z"] = pdf["f"] ** 0.5
    vc = f["z"].value_counts().compute()
    assert sorted(zip(vc.iloc[:, 0], vc.iloc[:, 1])) == \
        sorted(pdf.z.value_counts().items())
    got = f["z"].rank(method="average").compute()
    assert sorted(got.dropna()) == sorted(pdf.z.rank().dropna())
    assert got.isna().sum() == 1
    assert f["z"].nunique() == pdf.z.nunique() == 2


def test_cumulative_nan_is_missing_not_carried(spark):
    """r15 extended-vocabulary fuzz find (seed 424273): pandas cum*
    skipna — a missing value (NULL or mid-plan NaN) reads NaN at its
    OWN row while the accumulation carries past it unpoisoned. The
    engine previously carried the running value INTO missing rows
    (SQL window-aggregate null skipping), and a NaN would have
    poisoned every later cumsum value."""
    import numpy as np

    import dask_spark as ds

    pdf = pd.DataFrame({
        "r": [0, 1, 2, 3, 4],
        "f": [2.0, np.nan, 1.0, None, 3.0],
        "k": [0, 0, 0, 1, 1],
    })
    d = ds.from_pandas(pdf, npartitions=2)
    for fn in ("cumsum", "cummin", "cummax"):
        got = getattr(d, fn)("f", order_by="r", out="c").compute() \
            .sort_values("r")["c"]
        exp = getattr(pdf.sort_values("r")["f"], fn)()
        both_nan = got.isna().to_numpy() & exp.isna().to_numpy()
        close = np.isclose(got.to_numpy(dtype=float),
                           exp.to_numpy(dtype=float), equal_nan=True)
        assert (both_nan | close).all(), (fn, list(got), list(exp))
    # keyed path (groupby cumsum) pins the same contract
    gk = d.groupby("k").cumsum("f", order_by="r", out="c").compute() \
        .sort_values("r")["c"]
    ek = pdf.sort_values("r").groupby("k")["f"].cumsum()
    both_nan = gk.isna().to_numpy() & ek.isna().to_numpy()
    close = np.isclose(gk.to_numpy(dtype=float),
                       ek.to_numpy(dtype=float), equal_nan=True)
    assert (both_nan | close).all(), (list(gk), list(ek))


def test_ndarray_array_array_elementwise(spark):
    """r15 array-fuzz find: dask supports elementwise Array⊕Array;
    the engine's _bin only took scalars/literals. Self-combinations
    zip in place; distinct sources id-align with one equi-join."""
    import numpy as np

    from dask_spark.ndarray import NDArray

    arr = np.arange(12, dtype="float64").reshape(3, 4)
    pdf = pd.DataFrame({"id": range(3), "block": [list(r) for r in arr]})
    nd = NDArray(spark.createDataFrame(pdf), (4,), "block", "id")
    assert np.allclose((nd + nd).compute(), arr + arr)
    assert np.allclose((nd * nd).compute(), arr * arr)
    # structurally-different views of the same source
    got = (nd + nd.flip(1)).compute()
    assert np.allclose(got, arr + np.flip(arr, axis=1))
    # distinct source frames align on id even when row order differs
    pdf2 = pdf.iloc[::-1].reset_index(drop=True)
    nd2 = NDArray(spark.createDataFrame(pdf2), (4,), "block", "id")
    assert np.allclose((nd - nd2).compute(), np.zeros_like(arr))
