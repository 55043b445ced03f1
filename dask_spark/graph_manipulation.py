"""``dask.graph_manipulation``-shaped namespace (reference:
dask/graph_manipulation.py — checkpoint, wait_on, bind, clone).

dask's versions rewrite HighLevelGraph layers to add ordering edges.
There is no user-visible task graph here (Catalyst owns the DAG), so
each function maps the CONTRACT, not the mechanism, onto Spark:

- ``checkpoint``: a Delayed that completes once every input
  collection has fully materialized (a persist + count barrier —
  Spark's analog of walking all keys);
- ``wait_on``: returns the same lazy handles, each backed by the
  now-persisted plan, after the barrier — any downstream use reads
  the cached blocks, which is exactly the "everything waits for
  everything" effect dask builds with dependency edges;
- ``bind``: children re-derived from a persisted parent — the parent
  is guaranteed computed before any child task runs;
- ``clone``: an independent copy of the lazy plan (a fresh DataFrame
  over the same logical plan — recomputes rather than sharing cache,
  which is what dask's key-renaming clone achieves)."""

from __future__ import annotations

from dask_spark.delayed import Delayed, delayed


def _materialize(c):
    """Persist + force one full pass; returns the persisted handle.
    Collections without their own persist() (DArray/NDArray/Bag)
    persist their underlying DataFrame in place — a driver-side
    compute() here would collect the whole tensor and cache
    nothing."""
    if hasattr(c, "persist"):
        p = c.persist()
        sdf = getattr(p, "_sdf", None)
        if sdf is not None:
            sdf.count()
        elif hasattr(p, "compute"):
            p.compute()
        return p
    sdf = getattr(c, "_sdf", None)
    if sdf is not None:
        sdf.persist()
        sdf.count()
        return c
    if hasattr(c, "compute"):  # Delayed scalars
        c.compute()
    return c


def checkpoint(*collections) -> Delayed:
    """reference graph_manipulation.py:32 checkpoint — one Delayed
    completing when every collection is done."""

    def run():
        for c in collections:
            _materialize(c)
        return None

    return delayed(run)()


def wait_on(*collections):
    """reference graph_manipulation.py:478 wait_on — every returned
    collection waits on ALL inputs (here: all inputs are persisted
    and materialized before the handles come back)."""
    out = [_materialize(c) for c in collections]
    return out[0] if len(out) == 1 else tuple(out)


def bind(children, parents, *args, **kwargs):
    """reference graph_manipulation.py:210 bind — children depend on
    parents: the parents barrier runs first, then the (persisted)
    children handles are returned, so child tasks can never observe
    side effects that precede the parents."""
    plist = parents if isinstance(parents, (list, tuple)) else [parents]
    for p in plist:
        _materialize(p)
    if isinstance(children, (list, tuple)):
        return type(children)(_materialize(c) for c in children)
    return _materialize(children)


def clone(*collections, omit=None, seed=None, assume_layers: bool = True):
    """reference graph_manipulation.py:411 clone — independent copies
    that recompute instead of sharing intermediates (a fresh frame
    over the same logical plan; Spark gives each action its own run
    unless persisted)."""
    def one(c):
        sdf = getattr(c, "_sdf", None)
        if sdf is None:
            return c
        cls = type(c)
        fresh = sdf.select("*")
        if hasattr(c, "chunks") and hasattr(c, "_ck"):  # ChunkedNDArray
            return cls(fresh, c.inner_shape, c.chunks, c._col, c._id, c._ck)
        if hasattr(c, "inner_shape"):  # NDArray: keep the pending perm
            return cls(fresh, c.inner_shape, c._col, c._id,
                       perm=getattr(c, "_perm", None))
        if hasattr(c, "_col"):  # DArray / Bag
            if hasattr(c, "_id"):
                return cls(fresh, c._col, c._id)
            return cls(fresh, c._col)
        return cls(fresh)

    out = [one(c) for c in collections]
    return out[0] if len(out) == 1 else tuple(out)
