"""Fifth slice of the ported reference suite (r14): parquet io.

Ports the semantic halves of dask/dataframe/io/tests/test_parquet.py —
filters (tuple-DNF and engine predicates, with the pushdown asserted at
the scan), hive partition_on layout + pruning, schema evolution via
merge_schema, and dtype roundtrips. Same rules as slices 1-4: fresh
expectation code, reference test cited per case, deviations pinned.

Pinned deviations (engine model, not gaps):
- dask's npartitions-after-filter assertions don't port: Catalyst
  plans row-group/partition pruning internally, so the checkable
  contract is values + the PushedFilters / PartitionFilters clauses.
- there is no materialized index; index-flavored halves check the
  same values by key columns.
- partition_on reads the partition column back TYPED by Spark's
  partition-value inference (ints come back int), where pyarrow's
  hive reader yields categoricals of strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import dask_spark as ds
from dask_spark.plans import (
    has_pushed_filters,
    partition_filters,
    read_schema_columns,
)


@pytest.fixture(scope="module")
def filt_path(spark, tmp_path_factory):
    """The test_filters frame: x=range(10), y='aabbccddee'."""
    p = str(tmp_path_factory.mktemp("pq") / "filters")
    pdf = pd.DataFrame({"x": range(10), "y": list("aabbccddee")})
    ds.from_pandas(pdf, npartitions=5).to_parquet(p)
    return p, pdf


class TestFiltersPorted:
    """test_parquet.py:1382 test_filters + :1430 test_filters_v0 —
    every filter shape the reference exercises, value-checked against
    pandas on the same frame, pushdown plan-asserted."""

    @pytest.mark.parametrize("filters,mask", [
        ([("x", ">", 4)], lambda d: d.x > 4),
        ([("y", "==", "c")], lambda d: d.y == "c"),
        ([("y", "==", "c"), ("x", ">", 6)],
         lambda d: (d.y == "c") & (d.x > 6)),          # AND → empty
        ([[("x", ">", 1), ("x", "<", 6)],
          [("x", ">", 3), ("x", "<", 8)]],
         lambda d: ((d.x > 1) & (d.x < 6)) | ((d.x > 3) & (d.x < 8))),
        ([("x", "in", (0, 9))], lambda d: d.x.isin([0, 9])),
        ([("y", "=", "c")], lambda d: d.y == "c"),
        ([("x", "!=", 1)], lambda d: d.x != 1),
        ([("x", "not in", (2, 3))], lambda d: ~d.x.isin([2, 3])),
        ([("x", "<=", 3)], lambda d: d.x <= 3),
        ([("x", ">=", 8)], lambda d: d.x >= 8),
    ])
    def test_filters_dnf(self, filt_path, filters, mask):
        p, pdf = filt_path
        got = ds.read_parquet(p, filters=filters).compute()
        exp = pdf[mask(pdf)]
        assert sorted(got.x) == sorted(exp.x)
        assert sorted(got.y) == sorted(exp.y)

    def test_filters_reach_the_scan(self, filt_path):
        p, _ = filt_path
        f = ds.read_parquet(p, filters=[("x", ">", 4)])
        assert has_pushed_filters(f)

    def test_filter_string_predicate(self, filt_path):
        """test_parquet.py:1469 test_filtering_pyarrow_dataset (the
        expression-filter half): a SQL predicate string filters and
        pushes down."""
        p, pdf = filt_path
        f = ds.read_parquet(p, filters="x > 4 AND y != 'e'")
        got = f.compute()
        exp = pdf[(pdf.x > 4) & (pdf.y != "e")]
        assert sorted(got.x) == sorted(exp.x)
        assert has_pushed_filters(f)

    def test_filters_file_list(self, spark, tmp_path, filt_path):
        """test_parquet.py:1493 test_filters_file_list — reading an
        explicit file list still filters."""
        import glob

        p, pdf = filt_path
        files = sorted(glob.glob(f"{p}/*.parquet"))
        assert len(files) > 1
        got = ds.read_parquet(files, filters=[("x", ">", 4)]).compute()
        assert sorted(got.x) == [5, 6, 7, 8, 9]

    def test_unsupported_filter_op_raises(self, filt_path):
        p, _ = filt_path
        with pytest.raises(ValueError):
            ds.read_parquet(p, filters=[("x", "~", 4)]).compute()


class TestPartitionOnPorted:
    @pytest.fixture(scope="class")
    def part_path(self, spark, tmp_path_factory):
        """test_parquet.py:1284 test_partition_on layout."""
        p = str(tmp_path_factory.mktemp("pq") / "part")
        rng = np.random.RandomState(7)
        pdf = pd.DataFrame({
            "a1": rng.choice(["A", "B", "C"], size=100),
            "a2": rng.choice(["X", "Y", "Z"], size=100),
            "b": rng.random_sample(size=100),
            "d": np.arange(0, 100),
        })
        ds.from_pandas(pdf, npartitions=2).to_parquet(
            p, partition_on=["a1", "a2"])
        return p, pdf

    def test_partition_on_roundtrip(self, part_path):
        """test_parquet.py:1284 test_partition_on — per-key row sets
        survive the hive layout."""
        p, pdf = part_path
        out = ds.read_parquet(p).compute()
        for val in pdf.a1.unique():
            assert set(pdf.d[pdf.a1 == val]) == set(out.d[out.a1 == val])
        out2 = ds.read_parquet(p, columns=["d", "a2"]).compute()
        for val in pdf.a2.unique():
            assert set(pdf.d[pdf.a2 == val]) == set(out2.d[out2.a2 == val])

    def test_select_partitioned_column(self, part_path):
        """test_parquet.py:1749 test_select_partitioned_column."""
        p, pdf = part_path
        got = ds.read_parquet(p, columns=["a1"]).compute()
        assert set(got.a1) == set(pdf.a1)
        assert len(got) == len(pdf)

    def test_partition_pruning_reaches_scan(self, part_path):
        """test_parquet.py:1361 test_filters_categorical (pruning
        half): a filter on the partition column becomes a
        PartitionFilters clause, not a data-read filter."""
        p, pdf = part_path
        f = ds.read_parquet(p, filters=[("a1", "==", "B")])
        pf = partition_filters(f)
        assert "a1" in pf
        got = f.compute()
        assert set(got.d) == set(pdf.d[pdf.a1 == "B"])

    def test_partition_on_string_values(self, spark, tmp_path):
        """test_parquet.py:1341 test_partition_on_string."""
        p = str(tmp_path / "ps")
        vals = ["neat", "strings", "neat", "strings", "neat"]
        pdf = pd.DataFrame({"s": vals, "v": range(5)})
        ds.from_pandas(pdf, npartitions=1).to_parquet(p, partition_on=["s"])
        out = ds.read_parquet(p).compute()
        assert set(out.s) == {"neat", "strings"}
        assert set(out.v[out.s == "neat"]) == {0, 2, 4}


ROUNDTRIP_FRAMES = [
    # test_parquet.py:1035 test_roundtrip's parametrized frames
    # (semantic dtype halves), plus :505 test_roundtrip_from_pandas
    pd.DataFrame({"x": [1, 2, 3, 4], "y": [1.0, 2.5, -3.5, 0.0]}),
    pd.DataFrame({"x": ["c", "a", "b", "d"], "y": [1, 2, 3, 4]}),
    pd.DataFrame({"x": [True, False, True, False], "y": range(4)}),
    pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 00:00:01", "2024-06-15 12:30:00",
         "2025-12-31 23:59:59", "2023-03-01 08:00:00"]),
        "v": range(4)}),
    pd.DataFrame({"x": [1.5, np.nan, 3.0, np.nan], "y": range(4)}),
    pd.DataFrame({"x": pd.array([1, None, 3, None], dtype="Int64"),
                  "y": range(4)}),
    pd.DataFrame({"arr": [[1.0, 2.0], [3.0], [], [4.0, 5.0, 6.0]],
                  "y": range(4)}),
    pd.DataFrame({"x": [-(2 ** 62), 2 ** 62, 0, 1], "y": range(4)}),
]


class TestRoundtripPorted:
    @pytest.mark.parametrize("i", range(len(ROUNDTRIP_FRAMES)))
    def test_roundtrip_dtypes(self, spark, tmp_path, i):
        """test_parquet.py:1035 test_roundtrip + :505
        test_roundtrip_from_pandas + :515 nullable dtypes + :1113
        timestamp columns — write with the engine, read with the
        engine, compare to the source frame by sorted key."""
        pdf = ROUNDTRIP_FRAMES[i].copy()
        p = str(tmp_path / f"rt{i}")
        ds.from_pandas(pdf, npartitions=2).to_parquet(p)
        out = ds.read_parquet(p).compute()
        assert len(out) == len(pdf)
        key = "y" if "y" in pdf.columns else "v"
        out = out.sort_values(key).reset_index(drop=True)
        pdf = pdf.sort_values(key).reset_index(drop=True)
        for c in pdf.columns:
            g, e = out[c], pdf[c]
            if e.dtype.kind == "f" or str(e.dtype) == "Int64":
                ga = np.asarray(g, dtype="float64")
                ea = np.asarray(e, dtype="float64")
                assert np.allclose(ga, ea, equal_nan=True)
            elif c == "arr":
                assert [list(v) for v in g] == [list(v) for v in e]
            else:
                assert list(g) == list(e)

    def test_empty_frame_roundtrip(self, spark, tmp_path):
        """test_parquet.py:135 test_empty — zero-row dataset keeps
        its schema."""
        p = str(tmp_path / "empty")
        pdf = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                            "b": pd.Series([], dtype="float64")})
        ds.from_pandas(pdf, npartitions=1).to_parquet(p)
        out = ds.read_parquet(p)
        assert sorted(out.columns) == ["a", "b"]
        assert len(out.compute()) == 0

    def test_columns_selection_prunes_scan(self, spark, tmp_path):
        """test_parquet.py:357 test_columns_no_index + :972
        test_read_parquet_custom_columns — the projection reaches
        ReadSchema."""
        p = str(tmp_path / "cols")
        pdf = pd.DataFrame({"i": range(10), "x": np.arange(10.0),
                            "y": list("abcdefghij")})
        ds.from_pandas(pdf, npartitions=2).to_parquet(p)
        f = ds.read_parquet(p, columns=["i", "x"])
        assert sorted(f.columns) == ["i", "x"]
        assert sorted(read_schema_columns(f)) == ["i", "x"]
        got = f.compute().sort_values("i").reset_index(drop=True)
        assert np.allclose(got.x, pdf.x)

    def test_nonsense_column_raises(self, spark, tmp_path):
        """test_parquet.py:348 test_nonsense_column."""
        p = str(tmp_path / "nc")
        ds.from_pandas(pd.DataFrame({"a": [1, 2]}), npartitions=1) \
            .to_parquet(p)
        with pytest.raises(Exception):
            ds.read_parquet(p, columns=["nonsense"]).compute()

    def test_append_mode(self, spark, tmp_path):
        """test_parquet.py:582 test_append — a second append-mode
        write unions with the first."""
        p = str(tmp_path / "app")
        pdf1 = pd.DataFrame({"k": range(5), "v": list("abcde")})
        pdf2 = pd.DataFrame({"k": range(5, 10), "v": list("fghij")})
        ds.from_pandas(pdf1, npartitions=1).to_parquet(p)
        ds.from_pandas(pdf2, npartitions=1).to_parquet(p, mode="append")
        out = ds.read_parquet(p).compute()
        assert sorted(out.k) == list(range(10))

    def test_schema_evolution_merge_schema(self, spark, tmp_path):
        """test_parquet.py:867 test_append_different_columns (the
        schema-evolution half): a later file adds a column;
        merge_schema=True unifies (old rows null-padded),
        merge_schema=False serves one footer's schema."""
        p = str(tmp_path / "evo")
        old = pd.DataFrame({"k": range(3), "a": [1.0, 2.0, 3.0]})
        new = pd.DataFrame({"k": range(3, 6), "a": [4.0, 5.0, 6.0],
                            "b": ["x", "y", "z"]})
        ds.from_pandas(old, npartitions=1).to_parquet(p)
        ds.from_pandas(new, npartitions=1).to_parquet(p, mode="append")
        merged = ds.read_parquet(p, merge_schema=True).compute()
        assert sorted(merged.columns) == ["a", "b", "k"]
        assert len(merged) == 6
        padded = merged.sort_values("k").reset_index(drop=True)
        assert padded.b[:3].isna().all()
        assert list(padded.b[3:]) == ["x", "y", "z"]
        plain = ds.read_parquet(p).compute()
        assert len(plain) == 6  # one footer's schema, both files' rows
        assert set(plain.columns) <= {"a", "b", "k"}

    def test_empty_partition_files(self, spark, tmp_path):
        """test_parquet.py:1096 test_empty_partition — a dataset
        where some written partitions hold zero rows round-trips."""
        p = str(tmp_path / "ep")
        pdf = pd.DataFrame({"x": range(20)})
        f = ds.from_pandas(pdf, npartitions=4)
        f[f["x"] < 5].to_parquet(p)
        out = ds.read_parquet(p).compute()
        assert sorted(out.x) == list(range(5))
