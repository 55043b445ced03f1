"""delayed / compute (reference: dask/delayed.py Delayed + delayed):
driver-side task DAG with shared-node memoization and concurrent
execution of independent nodes (= concurrent Spark jobs)."""

from __future__ import annotations

import threading
import time

import pytest

from dask_spark.delayed import Delayed, compute, delayed


def test_diamond_single_evaluation():
    calls = {"base": 0, "l": 0, "r": 0}

    @delayed
    def base():
        calls["base"] += 1
        return 10

    @delayed
    def left(x):
        calls["l"] += 1
        return x + 1

    @delayed
    def right(x):
        calls["r"] += 1
        return x * 2

    @delayed
    def join(a, b):
        return a + b

    b = base()
    d = join(left(b), right(b))  # diamond: b shared by both branches
    for sched in ("sync", "threads"):
        calls.update(base=0, l=0, r=0)
        assert d.compute(scheduler=sched) == 31
        assert calls == {"base": 1, "l": 1, "r": 1}


def test_compute_many_shares_nodes():
    calls = []

    @delayed
    def src():
        calls.append(1)
        return 5

    s = src()
    x = delayed(lambda v: v + 1)(s)
    y = delayed(lambda v: v - 1)(s)
    assert compute(x, y) == (6, 4)
    assert len(calls) == 1  # shared source ran once across outputs


def test_nested_containers_and_operators():
    one = delayed(lambda: 1)()
    two = delayed(lambda: 2)()
    total = delayed(sum)([one, two, 3])
    assert total.compute() == 6
    assert (one + two).compute() == 3
    assert (one * 5).compute() == 5
    pair = delayed(lambda: {"a": 7, "b": 8})()
    assert pair["b"].compute() == 8


def test_threaded_runs_independent_nodes_concurrently():
    active, peak = [0], [0]
    lock = threading.Lock()

    @delayed
    def slow(i):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        time.sleep(0.2)
        with lock:
            active[0] -= 1
        return i

    out = delayed(sum)([slow(i) for i in range(4)])
    t0 = time.time()
    assert out.compute(scheduler="threads") == 6
    assert peak[0] >= 2  # genuinely overlapped
    assert time.time() - t0 < 0.75  # 4 x 0.2s did not serialize


def test_error_propagates():
    @delayed
    def boom():
        raise RuntimeError("kaput")

    with pytest.raises(RuntimeError, match="kaput"):
        boom().compute()
    with pytest.raises(RuntimeError, match="kaput"):
        boom().compute(scheduler="sync")


def test_delayed_over_frames(spark, tables):
    """The Spark-shaped use: each node is a distributed Catalyst plan;
    delayed sequences the imperative composition and the shared scan
    node is built once."""
    built = []

    @delayed
    def curated():
        built.append(1)
        o = tables["orders"]
        return o[o.o_totalprice > 100000]

    @delayed
    def n_rows(f):
        return f.to_spark().count()

    @delayed
    def total(f):
        return f.o_totalprice.sum()

    shared = curated()
    n, tot = compute(n_rows(shared), total(shared))
    assert len(built) == 1
    pdf = tables["orders"].compute()
    big = pdf[pdf["o_totalprice"] > 100000]
    assert n == len(big)
    assert abs(tot - big["o_totalprice"].sum()) < 1e-6


def test_to_delayed_from_delayed_roundtrip(spark):
    import pandas as pd

    import dask_spark as ds
    from dask_spark.delayed import delayed

    pdf = pd.DataFrame({"k": list(range(20)), "v": [i * 0.5 for i in range(20)]})
    frame = ds.from_pandas(pdf, npartitions=4)
    parts = frame.to_delayed()
    assert len(parts) == 4
    computed = [p.compute() for p in parts]
    assert sum(len(c) for c in computed) == 20

    # from_delayed accepts delayed-producing functions (dask idiom)
    @delayed
    def make(lo, hi):
        return pd.DataFrame({"k": range(lo, hi), "v": [0.5 * i for i in range(lo, hi)]})

    back = ds.from_delayed([make(0, 10), make(10, 20)])
    got = back.compute().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf)

    # roundtrip through to_delayed
    rt = ds.from_delayed(parts).compute().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(rt, pdf)


# ---- top-level dask namespace tail (base.py) ---------------------------

def test_base_namespace(spark, tables):
    import dask_spark as ds
    from dask_spark import base

    f = tables["region"]
    assert ds.is_dask_collection(f) and not ds.is_dask_collection(42)
    assert ds.istask((lambda: 1,)) is False
    out = ds.persist(f)
    assert out.compute().shape == f.compute().shape
    txt = ds.visualize(f)
    assert isinstance(txt, str) and txt
    with ds.annotate(priority=3):
        assert ds.get_annotations()["priority"] == "3"
    assert "priority" not in ds.get_annotations()
    ds.config.set({"a.b": 1})
    assert ds.config.get("a.b") == 1
    assert ds.config.get("spark.sql.shuffle.partitions") is not None
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        base.get({}, [])


def test_datasets_make_people(spark):
    from dask_spark.datasets import make_people

    b = make_people(2, 10, seed=7)
    rows = b.take(20)
    assert len(rows) == 20
    assert all(16 <= r["age"] < 99 for r in rows)
    # deterministic across calls
    b2 = make_people(2, 10, seed=7)
    assert [r["age"] for r in b2.take(20)] == [r["age"] for r in rows]


def test_bag_item_from_delayed(spark):
    from dask_spark.bag import Item
    from dask_spark.delayed import delayed

    it = Item.from_delayed(delayed(lambda: 42)())
    assert it.compute() == 42


def test_graph_manipulation(spark, tables):
    """checkpoint/wait_on/bind/clone twins (reference:
    dask/graph_manipulation.py): the ordering CONTRACT maps to
    persist barriers — parents fully materialize before children
    handles return; clone gives an independent recomputing copy."""
    from dask_spark import graph_manipulation as gm

    f = tables["region"]
    cp = gm.checkpoint(f, tables["nation"])
    assert cp.compute() is None

    w = gm.wait_on(f)
    assert w.compute().shape == f.compute().shape
    a, b = gm.wait_on(f, tables["nation"])
    assert len(a.compute()) == 5 and len(b.compute()) == 25

    parent = type(f)(f._sdf)  # fresh handle

    child = gm.bind(f, parent)
    assert len(child.compute()) == 5

    c = gm.clone(f)
    assert c is not f and len(c.compute()) == 5
