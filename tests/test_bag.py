"""dask.bag parity via the Bag wrapper (reference: dask/bag/core.py,
dask/bag/text.py)."""

from __future__ import annotations

import json

import pandas as pd
import pytest


def test_read_text_roundtrip(spark, tmp_path):
    import dask_spark as ds

    lines = [json.dumps({"k": i % 3, "v": float(i)}) for i in range(30)]
    src = tmp_path / "in.txt"
    src.write_text("\n".join(lines))
    bag = ds.read_text(str(src))
    assert bag.count() == 30
    parsed = bag.map_json("k int, v double")
    ks = parsed.pluck("k")
    freq = ks.frequencies().compute().sort_values("item")
    assert freq["count"].tolist() == [10, 10, 10]


def test_bag_map_filter_expr_and_python(spark):
    import pyspark.sql.functions as F

    import dask_spark as ds

    bag = ds.Bag.from_sequence(["apple", "banana", "cherry", "kiwi"])
    # expression fast path
    upper = bag.map(lambda c: F.upper(c))
    assert sorted(upper.compute()) == ["APPLE", "BANANA", "CHERRY", "KIWI"]
    # python slow path
    lens = bag.map(len, dtype="bigint")
    assert sorted(lens.compute()) == [4, 5, 6, 6]
    kept = bag.filter(lambda c: F.length(c) > 4)
    assert sorted(kept.compute()) == ["apple", "banana", "cherry"]
    kept_py = bag.filter(lambda s: "a" in s)
    assert sorted(kept_py.compute()) == ["apple", "banana"]


def test_bag_topk_foldby_flatten(spark):
    import pyspark.sql.functions as F

    import dask_spark as ds

    nums = ds.Bag.from_sequence(list(range(20)))
    assert sorted(nums.topk(3)) == [17, 18, 19]
    folded = nums.foldby(lambda c: c % 3, lambda c: F.sum(c))
    want = {k: sum(x for x in range(20) if x % 3 == k) for k in range(3)}
    assert {r.key: r.value for r in folded.to_spark().collect()} == want
    nested = ds.Bag.from_sequence([[1, 2], [3], [4, 5]])
    assert sorted(nested.flatten().compute()) == [1, 2, 3, 4, 5]
    assert nested.flatten().distinct().count() == 5


def test_bag_to_dataframe(spark):
    import dask_spark as ds

    bag = ds.Bag.from_sequence(
        [json.dumps({"a": i, "b": f"x{i}"}) for i in range(5)]
    ).map_json("a int, b string")
    df = bag.to_dataframe().compute()
    assert sorted(df.columns) == ["a", "b"]
    assert len(df) == 5


def test_bag_random_sample(spark):
    import dask_spark as ds

    bag = ds.Bag.from_sequence(list(range(200)))
    n = bag.random_sample(0.3).count()
    assert 20 < n < 120


def test_bag_numeric_reductions_and_fold(spark):
    import dask_spark.bag as db

    b = db.from_sequence([1.0, 2.0, 3.0, 4.0], npartitions=2)
    assert b.sum() == 10.0 and b.max() == 4.0 and b.min() == 1.0
    assert b.mean() == 2.5 and b.product() == 24.0
    # dask Bag.var defaults to ddof=0 (population); ddof=1 = sample
    assert abs(b.var() - 1.25) < 1e-9
    assert abs(b.var(ddof=1) - 5.0 / 3.0) < 1e-9
    assert b.fold(lambda a, x: a + x, 0.0) == 10.0

    flags = db.from_sequence([True, True, False])
    assert flags.any() and not flags.all()


def test_bag_partition_ops(spark, tmp_path):
    import pyspark.sql.functions as F

    import dask_spark.bag as db

    b = db.from_sequence(["aa", "b", "ccc"], npartitions=2)
    kept = b.remove(lambda c: F.length(c) > 2).compute()
    assert sorted(kept) == ["aa", "b"]

    doubled = sorted(b.map_partitions(lambda items: [s * 2 for s in items]).compute())
    assert doubled == ["aaaa", "bb", "cccccc"]

    g = b.groupby(lambda s: str(len(s))).compute()
    got = {r.key: sorted(r["items"]) for _, r in g.iterrows()}
    assert got["1"] == ["b"] and got["2"] == ["aa"]

    out = tmp_path / "txt"
    b.to_textfiles(str(out))
    back = sorted(db.read_text(str(out)).compute())
    assert back == ["aa", "b", "ccc"]

    assert b.repartition(1).count() == 3


def test_bag_zip_positional(spark):
    from dask_spark.bag import from_sequence

    a = from_sequence([1, 2, 3, 4, 5, 6], npartitions=3)
    b = from_sequence([10, 20, 30, 40, 50, 60], npartitions=3)
    pairs = sorted(
        (r["left"], r["right"]) for r in a.zip(b).compute()
    )
    assert pairs == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (6, 60)]


def test_bag_long_tail(spark):
    """unzip / reduction / join / accumulate (reference: bag/core.py
    Bag long tail) — accumulate's non-identity initial enters exactly
    once across partitions."""
    import operator

    from dask_spark.bag import Bag

    b = Bag.from_sequence(list(range(1, 11)), npartitions=4)

    # reduction: two-level sum-of-squares
    got = b.reduction(
        lambda items: sum(x * x for x in items), lambda parts: sum(parts)
    )
    assert got == sum(x * x for x in range(1, 11))

    # accumulate with a NON-identity initial: toolz semantics — the
    # initial value itself leads the output (n+1 items, reference
    # dask/bag/core.py:1717 doctest [-1, 0, 2, 5, 9, 14])
    import itertools

    acc = b.accumulate(operator.add, initial=100).compute()
    want = list(itertools.accumulate(range(1, 11), operator.add, initial=100))
    assert acc == want  # contiguous slices: exact order match
    assert acc[0] == 100 and max(acc) == 100 + 55

    # accumulate without initial: output[0] = items[0]
    acc0 = b.accumulate(operator.add).compute()
    assert acc0 == list(itertools.accumulate(range(1, 11), operator.add))

    # join on computed key: (other_element, self_element) orientation
    # like the reference's doctest [('Apple', 'Alice'), ...]
    a = Bag.from_sequence([1, 2, 3, 4])
    c = Bag.from_sequence([10, 20, 31])
    j = a.join(c, on_self=lambda x: x % 2, on_other=lambda x: x % 2).compute()
    pairs = {(r["_1"], r["_2"]) for r in j}
    assert (31, 1) in pairs and (10, 2) in pairs and (20, 2) in pairs
    # positional pluck(0) gives the other-side element
    firsts = a.join(c, on_self=lambda x: x % 2).pluck(0).compute()
    assert set(firsts) == {10, 20, 31}

    # unzip via pluck positions
    t = Bag.from_sequence([(i, i * i) for i in range(5)])
    left, right = t.unzip(2)
    assert sorted(right.compute()) == [0, 1, 4, 9, 16]

    # to_delayed roundtrip
    parts = b.to_delayed()
    assert len(parts) == 4


def test_bag_random_sample_and_choices(spark):
    """bag.random twins (reference: dask/bag/random.py:12,40):
    sample is exactly-k unique elements; choices is k independent
    picks with replacement; both seed-reproducible."""
    from dask_spark.bag import Bag, choices, sample

    b = Bag.from_sequence(list(range(100)), npartitions=5)

    s = sample(b, 10, seed=1).compute()
    assert len(s) == 10 and len(set(s)) == 10
    assert set(s) <= set(range(100))
    assert sample(b, 10, seed=1).compute() == s  # reproducible
    assert set(sample(b, 10, seed=2).compute()) != set(s)

    c = choices(b, 8, seed=3).compute()
    assert len(c) == 8
    assert set(c) <= set(range(100))
    assert sorted(choices(b, 8, seed=3).compute()) == sorted(c)

    # k > population: sample returns everything, choices still k
    assert sorted(sample(b, 200, seed=0).compute()) == list(range(100))
    assert len(choices(b, 150, seed=0).compute()) == 150

    # with-replacement really replaces: over many draws from a tiny
    # population some value must repeat
    tiny = Bag.from_sequence([1, 2, 3])
    assert len(choices(tiny, 20, seed=5).compute()) == 20


def test_bag_to_avro_gated(spark):
    """reference dask/bag/avro.py to_avro — spark-avro is absent in
    this container, so the writer raises the documented ImportError
    (same plumbing contract as sources.read_avro)."""
    from dask_spark.bag import Bag

    b = Bag.from_sequence([1, 2, 3])
    with pytest.raises(ImportError):
        b.to_avro("/tmp/bag_avro_out")
