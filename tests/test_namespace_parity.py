"""Namespace-parity audit: every public name the reference's package
``__init__`` files import/define must resolve on the corresponding
``dask_spark`` module (reference: dask/__init__.py, dask/array/
__init__.py, dask/dataframe/__init__.py, dask/bag/__init__.py). The
reference tree is parsed with ``ast`` (it is not importable here — its
runtime deps aren't in the container), so the audit is source-level
and cheap; it is the regression gate for the module surface a user's
``import dask.array as da`` port touches."""

from __future__ import annotations

import ast
import importlib
import os

import pytest

REF = "/root/reference/dask"

# Reference-internal helpers its __init__ defines for its own plumbing
# (error factories, config probes, exception locals) — not public API.
_NOISE = {
    "msg",  # ImportError reraise local
    "da",  # intra-init alias
    "inner_func", "raise_not_implemented_error",  # stub factory
    "use_array_expr", "use_dask_expr",  # config locals
    "annotations",  # __future__ import
}


def _exported(initfile: str) -> set[str]:
    tree = ast.parse(open(initfile).read())
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
        elif isinstance(node, ast.AnnAssign):
            if isinstance(node.target, ast.Name):
                names.add(node.target.id)
        elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            names.add(node.name)
    return {
        n for n in names
        if not n.startswith("_") and n != "*" and n not in _NOISE
    }


@pytest.mark.parametrize("ref_init,ours", [
    (os.path.join(REF, "__init__.py"), "dask_spark"),
    (os.path.join(REF, "array", "__init__.py"), "dask_spark.array"),
    (os.path.join(REF, "dataframe", "__init__.py"), "dask_spark.dataframe"),
    (os.path.join(REF, "bag", "__init__.py"), "dask_spark.bag"),
])
def test_namespace_parity(ref_init, ours):
    if not os.path.exists(ref_init):
        pytest.skip(f"reference init missing: {ref_init}")
    want = _exported(ref_init)
    mod = importlib.import_module(ours)
    missing = sorted(
        n for n in want
        if not hasattr(mod, n)  # hasattr honors module __getattr__
    )
    assert not missing, (
        f"{ours} is missing {len(missing)} reference public names: "
        f"{missing}"
    )


def test_array_module_twins_build_plans(spark):
    """The module-level method twins are real plan builders, not bare
    attributes: da.sum(x) == x.sum() on the same frame."""
    import pandas as pd

    import dask_spark as ds
    import dask_spark.array as da

    f = ds.from_pandas(pd.DataFrame({
        "rid": [0, 1], "vec": [[1.0, 2.0], [3.0, 4.0]],
    }))
    x = da.DArray(f._sdf, "vec", "rid")
    got, want = da.sum(x, axis=0), x.sum(axis=0)
    got = got.compute() if hasattr(got, "compute") else got
    want = want.compute() if hasattr(want, "compute") else want
    import numpy as np

    assert np.array_equal(np.asarray(got), np.asarray(want))

    nd = ds.NDArray.from_vectors(f, "vec", 2, "rid")
    t = da.transpose(nd)  # reverse of a 1-axis inner = identity
    assert t.inner_shape == (2,)

    with pytest.raises(TypeError):
        da.tensordot(x, x, axes=1)  # DArray has no tensordot method


def test_bag_module_functions(spark):
    """The bag module twins do real work: range/zip/concat/map/
    from_delayed/assert_eq (reference dask/bag/__init__.py exports)."""
    import dask_spark.bag as db

    r = db.range(6, npartitions=2)
    assert sorted(r.compute()) == [0, 1, 2, 3, 4, 5]

    a = db.from_sequence([1, 2, 3], npartitions=1)
    b = db.from_sequence([10, 20, 30], npartitions=1)
    z = db.zip(a, b).compute()
    assert sorted((t["left"], t["right"]) for t in z) == [
        (1, 10), (2, 20), (3, 30)]

    c = db.concat([a, b])
    assert sorted(c.compute()) == [1, 2, 3, 10, 20, 30]

    m = db.map(lambda l, r2: str(l + r2), a, b)
    assert sorted(m.compute()) == ["11", "22", "33"]

    from dask_spark.delayed import delayed
    fd = db.from_delayed([delayed(lambda: [1, 2])(),
                          delayed(lambda: [3])()])
    assert sorted(fd.compute()) == [1, 2, 3]

    db.assert_eq(a, [3, 2, 1])
    with pytest.raises(AssertionError):
        db.assert_eq(a, [1, 2])

    import pytest as _pt
    with _pt.raises(ImportError):
        db.read_avro("/tmp/nonexistent-avro-dir")


def test_collection_method_parity():
    """Method-level twin of the module audit: every public method the
    reference defines on FrameBase/DataFrame/Series
    (dask_expr/_collection.py) must resolve on DaskFrame/Series —
    Series inherits dask's full FrameBase surface via its frame
    delegation."""
    colfile = os.path.join(
        REF, "dataframe", "dask_expr", "_collection.py"
    )
    if not os.path.exists(colfile):
        pytest.skip("reference collection module missing")
    tree = ast.parse(open(colfile).read())
    classes: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name in (
            "FrameBase", "DataFrame", "Series"
        ):
            classes[node.name] = {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    from dask_spark.frame import DaskFrame, Series

    base = classes.get("FrameBase", set())
    missing_f = [
        m for m in sorted(base | classes.get("DataFrame", set()))
        if not hasattr(DaskFrame, m)
    ]
    missing_s = [
        m for m in sorted(base | classes.get("Series", set()))
        if not (hasattr(Series, m) or m in Series._FRAME_DELEGATES)
    ]
    assert not missing_f, f"DaskFrame missing: {missing_f}"
    assert not missing_s, f"Series missing: {missing_s}"


def test_array_method_parity():
    """Every public method on the reference's Array class
    (array/core.py) must resolve on DArray or NDArray."""
    corefile = os.path.join(REF, "array", "core.py")
    if not os.path.exists(corefile):
        pytest.skip("reference array core missing")
    tree = ast.parse(open(corefile).read())
    meths: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == "Array":
            meths = {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    from dask_spark.array import DArray
    from dask_spark.ndarray import NDArray

    missing = [
        m for m in sorted(meths)
        if not (hasattr(DArray, m) or hasattr(NDArray, m))
    ]
    assert not missing, f"Array surface missing: {missing}"


def test_bag_method_parity():
    """Every public method on the reference's Bag class (bag/core.py)
    must resolve on Bag."""
    bagfile = os.path.join(REF, "bag", "core.py")
    if not os.path.exists(bagfile):
        pytest.skip("reference bag core missing")
    tree = ast.parse(open(bagfile).read())
    meths: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == "Bag":
            meths = {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    from dask_spark.bag import Bag

    missing = [m for m in sorted(meths) if not hasattr(Bag, m)]
    assert not missing, f"Bag surface missing: {missing}"


def test_groupby_method_parity():
    """Every public method on the reference's GroupBy/SeriesGroupBy
    (dask_expr/_groupby.py) must resolve on GroupBy."""
    gfile = os.path.join(REF, "dataframe", "dask_expr", "_groupby.py")
    if not os.path.exists(gfile):
        pytest.skip("reference groupby module missing")
    tree = ast.parse(open(gfile).read())
    ref: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name in (
            "GroupBy", "SeriesGroupBy"
        ):
            ref |= {
                n.name
                for n in node.body
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                and not n.name.startswith("_")
            }
    from dask_spark.operators.groupby import GroupBy

    missing = [m for m in sorted(ref) if not hasattr(GroupBy, m)]
    assert not missing, f"GroupBy surface missing: {missing}"


def test_accessor_method_parity():
    """The reference's String/Datetime accessor surfaces (explicit
    defs + the _accessor_methods/_accessor_properties name lists in
    dataframe/accessor.py AND dask_expr/_datetime.py — the Datetime
    lists live only in the latter, so reading accessor.py alone made
    the Datetime half vacuous until r12) must resolve on
    StrAccessor/DtAccessor."""
    accfile = os.path.join(REF, "dataframe", "accessor.py")
    dtfile = os.path.join(REF, "dataframe", "dask_expr", "_datetime.py")
    if not os.path.exists(accfile):
        pytest.skip("reference accessor module missing")
    info: dict[str, set[str]] = {}
    for path in (accfile, dtfile):
        if not os.path.exists(path):
            continue
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if isinstance(node, ast.ClassDef):
                names = {
                    n.name
                    for n in node.body
                    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                    and not n.name.startswith("_")
                }
                for n in node.body:
                    if isinstance(n, ast.Assign):
                        for t in n.targets:
                            if isinstance(t, ast.Name) and t.id in (
                                "_accessor_methods", "_accessor_properties"
                            ):
                                try:
                                    names |= set(ast.literal_eval(n.value))
                                except (ValueError, SyntaxError):
                                    pass
                info.setdefault(node.name, set()).update(names)
    from dask_spark.frame import DtAccessor, StrAccessor

    for refname, cls in (
        ("StringAccessor", StrAccessor), ("DatetimeAccessor", DtAccessor)
    ):
        missing = [
            m for m in sorted(info.get(refname, set()))
            if not hasattr(cls, m)
        ]
        assert not missing, f"{refname} missing: {missing}"
