"""Top-level ``dask`` namespace tail (reference: dask/__init__.py —
compute, persist, visualize, annotate, config, is_dask_collection).

The graph-layer machinery these wrap in dask (HighLevelGraph
annotations, scheduler ``get``) is Catalyst's job here, so each
function maps to the Spark-native equivalent: ``persist`` caches the
plan, ``visualize`` prints the formatted physical plan, ``annotate``
scopes Spark local properties (the cluster-facing analog of dask's
layer annotations — they reach the scheduler as job properties)."""

from __future__ import annotations

import contextlib
from typing import Any

from dask_spark.delayed import compute  # noqa: F401


def is_dask_collection(x) -> bool:
    """reference dask/base.py is_dask_collection — true for every
    lazy collection in this engine (frame, series, arrays, bag,
    delayed)."""
    return (
        hasattr(x, "_sdf")
        or (hasattr(x, "_frame") and hasattr(x, "_expr"))
        or hasattr(x, "compute")
    ) and not isinstance(x, (int, float, str, bytes, list, dict, tuple))


def istask(x) -> bool:
    """reference dask/core.py istask — graph tuples don't exist here
    (the plan lives in Catalyst), so nothing is a raw task."""
    return False


def persist(*collections):
    """reference dask/base.py persist — caches each collection's plan
    (Spark MEMORY_AND_DISK), returning the same lazy handles."""
    out = [
        c.persist() if hasattr(c, "persist") else c for c in collections
    ]
    return out[0] if len(out) == 1 else tuple(out)


def visualize(*collections, filename: str | None = None, **kwargs):
    """reference dask/base.py visualize — the formatted physical plan
    is the task graph here; returns (and optionally writes) it."""
    texts = [
        c.visualize(filename=None) if hasattr(c, "visualize") else repr(c)
        for c in collections
    ]
    text = "\n\n".join(texts)
    if filename:
        with open(filename, "w") as fh:
            fh.write(text)
    return text


def optimize(*collections, **kwargs):
    """reference dask/base.py optimize — Catalyst optimizes at
    execution; identity here."""
    return collections if len(collections) != 1 else collections[0]


def get(dsk, keys, **kwargs):
    """reference dask scheduler get — raw graph execution has no
    analog; point users at compute()."""
    raise NotImplementedError(
        "raw task-graph get() has no Spark analog; call .compute() on "
        "the collection (Catalyst owns scheduling)"
    )


@contextlib.contextmanager
def annotate(**annotations):
    """reference dask/annotations: scoped metadata on graph layers.
    Spark's analog is local job properties — visible in the UI and to
    the scheduler (e.g. ``priority`` maps to a scheduler pool)."""
    from dask_spark.session import get_spark

    sc = get_spark().sparkContext
    prev = {}
    for k, v in annotations.items():
        key = f"dask.annotation.{k}"
        prev[key] = sc.getLocalProperty(key)
        sc.setLocalProperty(key, str(v))
    try:
        yield
    finally:
        for key, old in prev.items():
            sc.setLocalProperty(key, old)


def get_annotations() -> dict:
    """Current scoped annotations (reference dask/base.py
    get_annotations)."""
    from dask_spark.session import get_spark

    sc = get_spark().sparkContext
    out = {}
    # Spark exposes no listing API for local properties; track the
    # conventional keys users set via annotate()
    for k in ("priority", "retries", "resources", "workers"):
        v = sc.getLocalProperty(f"dask.annotation.{k}")
        if v is not None:
            out[k] = v
    return out


class _Config:
    """reference dask/config.py — a nested-key config store with the
    same get/set/context surface, backed by a plain dict plus the
    live SparkConf for ``spark.*`` keys."""

    def __init__(self):
        self._store: dict[str, Any] = {}

    def get(self, key: str, default=None):
        if key.startswith("spark."):
            from dask_spark.session import get_spark

            return get_spark().conf.get(key, default)
        return self._store.get(key, default)

    def set(self, arg: dict | None = None, **kwargs):
        """Applies immediately AND returns a context manager that
        restores the previous values on exit — dask.config.set's
        documented dual contract (plain call = permanent, with-block
        = scoped)."""
        updates = dict(arg or {}, **kwargs)

        def current(k):
            if k.startswith("spark."):
                from dask_spark.session import get_spark

                return get_spark().conf.get(k, None)
            return self._store.get(k)

        def apply(k, v):
            if k.startswith("spark."):
                from dask_spark.session import get_spark

                if v is None:
                    get_spark().conf.unset(k)
                else:
                    get_spark().conf.set(k, v)
            elif v is None:
                self._store.pop(k, None)
            else:
                self._store[k] = v

        old = {k: current(k) for k in updates}
        for k, v in updates.items():
            apply(k, v)

        @contextlib.contextmanager
        def restoring():
            try:
                yield self
            finally:
                for k, v in old.items():
                    apply(k, v)

        return restoring()

    @contextlib.contextmanager
    def ctx(self, **kwargs):
        old = {k: self._store.get(k) for k in kwargs}
        self._store.update(kwargs)
        try:
            yield
        finally:
            for k, v in old.items():
                if v is None:
                    self._store.pop(k, None)
                else:
                    self._store[k] = v


config = _Config()
annotations = annotate  # dask exposes both names


class Expr:
    """reference dask/_expr.py Expr — the dask-expr node base. The
    logical plan lives in Catalyst here, so these classes exist only
    so ported isinstance checks and imports resolve; collections in
    this engine are not Expr instances."""


class HLGExpr(Expr):
    pass


class LLGExpr(Expr):
    pass


class SingletonExpr(Expr):
    pass
