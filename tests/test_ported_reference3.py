"""Third slice of the ported reference suite (r13): dask.bag.

Ports from dask/bag/tests/test_bag.py — same rules as the other two
slices (fresh expectation code, reference test cited per case,
deviations pinned). Bag results are multisets (no partition order),
so list results compare sorted — dask's own bag tests mostly sort
too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import dask_spark.bag as db


@pytest.fixture(scope="module")
def nums(spark):
    return db.from_sequence(list(range(10)), npartitions=3)


class TestBagPorted:
    def test_bag_map(self, nums):
        """test_bag.py:115 test_Bag/test_bag_map."""
        got = sorted(nums.map(lambda x: int(x) * 2, dtype="bigint").compute())
        assert got == [x * 2 for x in range(10)]

    def test_filter_remove(self, nums):
        """test_bag.py:204 test_filter / 217 test_remove."""
        assert sorted(nums.filter(lambda x: x % 2 == 0).compute()) \
            == [0, 2, 4, 6, 8]
        assert sorted(nums.remove(lambda x: x % 2 == 0).compute()) \
            == [1, 3, 5, 7, 9]

    def test_starmap(self, spark):
        """test_bag.py:187 test_starmap."""
        b = db.from_sequence([(1, 2), (3, 4)], npartitions=2)
        got = sorted(b.starmap(lambda a, c: a + c, dtype="bigint").compute())
        assert got == [3, 7]

    def test_pluck(self, spark):
        """test_bag.py:237 test_pluck — field by name on struct items
        and by POSITION on tuple items."""
        b = db.from_sequence([("a", 1), ("b", 2)])
        assert sorted(b.pluck(1).compute()) == [1, 2]
        assert sorted(b.pluck("_1").compute()) == ["a", "b"]

    def test_distinct(self, spark):
        """test_bag.py:303 test_distinct."""
        b = db.from_sequence([1, 2, 1, 3, 3, 3])
        assert sorted(b.distinct().compute()) == [1, 2, 3]

    def test_frequencies(self, spark):
        """test_bag.py:320 test_frequencies."""
        b = db.from_sequence(list("aabbbc"))
        got = b.frequencies().compute()
        gmap = dict(zip(got.iloc[:, 0], got.iloc[:, 1]))
        assert gmap == {"a": 2, "b": 3, "c": 1}

    def test_topk(self, nums):
        """test_bag.py:343 test_topk (+ key form :354)."""
        assert nums.topk(3) == [9, 8, 7]
        assert nums.topk(2, key=lambda x: -x) == [0, 1]

    def test_fold(self, nums):
        """test_bag.py:263 test_fold — binop fold with initial."""
        got = nums.fold(lambda a, b: a + b, 0)
        assert got == sum(range(10))

    def test_reductions(self, nums):
        """test_bag.py:370 test_reductions — sum/max/min/mean +
        :430/:435 std/var."""
        assert nums.sum() == 45
        assert nums.max() == 9
        assert nums.min() == 0
        assert abs(nums.mean() - 4.5) < 1e-9
        import statistics

        assert abs(nums.var() - statistics.pvariance(range(10))) < 1e-9
        assert abs(nums.std() - statistics.pstdev(range(10))) < 1e-9

    def test_any_all(self, spark):
        """test_bag.py reductions (any/all legs)."""
        b = db.from_sequence([0, 0, 1])
        assert b.any() is True
        assert b.all() is False

    def test_foldby(self, spark):
        """test_bag.py:451 test_foldby — per-key reduction."""
        b = db.from_sequence([1, 2, 3, 4, 5, 6])
        got = b.foldby(lambda c: c % 2, lambda c: F.sum(c)).compute()
        gmap = dict(zip(got["key"].astype(int), got["value"]))
        assert gmap == {0: 12, 1: 9}

    def test_groupby(self, spark):
        """test_bag.py:66 test_bag_groupby_pure_hash."""
        b = db.from_sequence(list(range(6)))
        got = b.groupby(lambda x: str(int(x) % 2)).compute()
        groups = {
            row["key"]: sorted(int(v) for v in row["items"])
            for _, row in got.iterrows()
        }
        assert groups == {"0": [0, 2, 4], "1": [1, 3, 5]}

    def test_join(self, spark):
        """test_bag.py:443 test_join — (other, self) tuple order is
        dask's contract."""
        a = db.from_sequence([1, 2, 3])
        b = db.from_sequence([2, 3, 4])
        got = sorted(tuple(t) for t in a.join(b, lambda x: x, lambda x: x)
                     .compute())
        assert got == [(2, 2), (3, 3)]

    def test_unzip(self, spark):
        """test_bag.py:254 test_unzip."""
        b = db.from_sequence([(1, "a"), (2, "b")], npartitions=2)
        left, right = b.unzip(2)
        assert sorted(left.compute()) == [1, 2]
        assert sorted(right.compute()) == ["a", "b"]

    def test_map_partitions(self, nums):
        """test_bag.py:478 test_map_partitions."""
        got = sorted(
            nums.map_partitions(lambda it: [len(list(it))], dtype="bigint")
            .compute()
        )
        assert sum(got) == 10

    def test_random_sample(self, nums):
        """test_bag.py:525 test_random_sample_size — subset +
        deterministic under a seed."""
        s1 = sorted(nums.random_sample(0.5, seed=7).compute())
        s2 = sorted(nums.random_sample(0.5, seed=7).compute())
        assert s1 == s2
        assert set(map(int, s1)).issubset(set(range(10)))

    def test_concat_and_count(self, spark):
        """test_bag.py concat + count."""
        a = db.from_sequence([1, 2])
        b = db.from_sequence([3])
        assert db.concat([a, b]).count() == 3

    def test_take(self, nums):
        """test_bag.py take — n elements from the bag."""
        got = nums.take(3)
        assert len(got) == 3
        assert set(map(int, got)).issubset(set(range(10)))

    def test_accumulate(self, spark):
        """toolz accumulate parity (dask bag.accumulate) — running
        binop including the initial."""
        b = db.from_sequence([1, 2, 3, 4], npartitions=2)
        got = b.accumulate(lambda a, x: a + x, initial=0).compute()
        assert sorted(int(v) for v in got) == [0, 1, 3, 6, 10]

    def test_bag_zip(self, spark):
        """test_bag.py zip — element-wise pairing."""
        a = db.from_sequence([1, 2, 3])
        b = db.from_sequence([10, 20, 30])
        got = sorted(tuple(map(int, t)) for t in a.zip(b).compute())
        assert got == [(1, 10), (2, 20), (3, 30)]
