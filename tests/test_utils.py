"""dask.utils surface parity (reference: dask/utils.py,
dask/base.py tokenize, dask/sizeof.py — semantics pinned by dask's
own doctests/tests, re-verified here against this implementation)."""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pytest

from dask_spark import utils as u


def test_parse_bytes():
    assert u.parse_bytes("100") == 100
    assert u.parse_bytes("100 MB") == 100_000_000
    assert u.parse_bytes("128MiB") == 134217728
    assert u.parse_bytes("5kB") == 5000
    assert u.parse_bytes("1.5 GB") == 1_500_000_000
    assert u.parse_bytes(123) == 123
    with pytest.raises(ValueError):
        u.parse_bytes("12 blorps")


def test_format_bytes():
    assert u.format_bytes(1) == "1 B"
    assert u.format_bytes(1234567) == "1.18 MiB"
    assert u.format_bytes(2**30) == "1.00 GiB"
    assert u.parse_bytes(u.format_bytes(2**40).replace(" ", "")) == 2**40


def test_parse_timedelta():
    assert u.parse_timedelta("3s") == 3
    assert u.parse_timedelta("3.5 seconds") == 3.5
    assert u.parse_timedelta("300ms") == 0.3
    assert u.parse_timedelta("2min") == 120
    assert u.parse_timedelta("1h") == 3600
    assert u.parse_timedelta(5) == 5
    import datetime

    assert u.parse_timedelta(datetime.timedelta(seconds=2)) == 2.0


def test_format_time():
    assert u.format_time(1.5) == "1.50 s"
    assert u.format_time(0.012) == "12.00 ms"
    assert u.format_time(1e-5) == "10.00 us"
    assert u.format_time(4000) == "1hr 6min"


def test_natural_sort_key():
    names = ["f10", "f2", "f1"]
    assert sorted(names, key=u.natural_sort_key) == ["f1", "f2", "f10"]


def test_tokenize_deterministic(spark, tables):
    assert u.tokenize(1, "a", [2, 3]) == u.tokenize(1, "a", [2, 3])
    assert u.tokenize({"b": 1, "a": 2}) == u.tokenize({"a": 2, "b": 1})
    assert u.tokenize(np.arange(5)) == u.tokenize(np.arange(5))
    assert u.tokenize(np.arange(5)) != u.tokenize(np.arange(6))
    s = pd.Series([1, 2, 3])
    assert u.tokenize(s) == u.tokenize(s.copy())
    f = tables["region"]
    assert u.tokenize(f) == u.tokenize(f)
    assert u.tokenize(f) != u.tokenize(tables["nation"])


def test_dispatch_and_sizeof():
    d = u.Dispatch()

    @d.register(int)
    def _(x):
        return "int"

    @d.register((list, tuple))
    def _(x):
        return "seq"

    assert d(3) == "int" and d([1]) == "seq" and d((1,)) == "seq"
    with pytest.raises(TypeError):
        d(object())

    assert u.sizeof(np.zeros(10, dtype="float64")) == 80
    assert u.sizeof([1, 2, 3]) > u.sizeof([])
    assert u.sizeof(pd.Series(["abc"] * 10)) > 0


def test_misc_helpers():
    assert u.apply(lambda a, b: a + b, (1, 2)) == 3
    assert u.deepmap(lambda x: x * 2, [[1, 2], [3]]) == [[2, 4], [6]]
    assert u.ndeepmap(2, lambda x: x + 1, [[1], [2, 3]]) == [[2], [3, 4]]
    assert u.funcname(test_misc_helpers) == "test_misc_helpers"
    assert "int" in u.typename(3)
    assert u.is_integer(3) and u.is_integer(3.0) and not u.is_integer(3.5)
    assert u.ensure_bytes("ab") == b"ab" and u.ensure_unicode(b"ab") == "ab"
    assert u.concrete(iter([iter([1, 2]), iter([3])])) == [[1, 2], [3]]
    assert u.digit(1234, 2, 10) == 2
    assert u.insert((1, 2, 3), 1, 9) == (1, 9, 3)
    t = u.asciitable(["a", "bb"], [[1, 22], [3, 4]])
    assert "| a " in t and "| 22" in t.replace("  ", " ")
    mc = pickle.loads(pickle.dumps(u.methodcaller("upper")))
    assert mc("ab") == "AB"
    ig = pickle.loads(pickle.dumps(u.itemgetter(1)))
    assert ig([1, 2, 3]) == 2
    ic = u.IndexCallable(lambda k: k * 2)
    assert ic[4] == 8


def test_collection_probes(spark, tables):
    import dask_spark.array as da

    f = tables["region"]
    assert u.is_dataframe_like(f) and u.is_dataframe_like(f.compute())
    assert u.is_series_like(f.r_name)
    arr = da.asarray(np.ones((2, 2)))
    assert u.is_arraylike(arr) and u.is_arraylike(np.ones(3))
    assert not u.is_dataframe_like(3)


def test_tmp_and_lock():
    with u.tmpfile(extension="txt") as fn:
        with open(fn, "w") as fh:
            fh.write("x")
        assert fn.endswith(".txt")
    import os

    assert not os.path.exists(fn)
    with u.tmpdir() as d:
        assert os.path.isdir(d)
    assert not os.path.isdir(d)
    with u.filetext("hello") as fn2:
        assert open(fn2).read() == "hello"

    lock = u.SerializableLock("tok")
    lock2 = pickle.loads(pickle.dumps(lock))
    with lock:
        assert lock2.locked()  # same token -> same underlying lock


def test_random_helpers():
    x = u.pseudorandom(100, [0.5, 0.5], random_state=1)
    assert set(x) <= {0, 1} and len(x) == 100
    y = u.pseudorandom(100, [0.5, 0.5], random_state=1)
    assert (x == y).all()
    states = u.random_state_data(3, 42)
    states2 = u.random_state_data(3, 42)
    assert all((a == b).all() for a, b in zip(states, states2))
