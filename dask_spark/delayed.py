"""``delayed`` — arbitrary lazy task composition (reference:
dask/delayed.py:414 ``Delayed`` / ``delayed``), the most-used dask API
outside the collections.

Spark-first re-expression: dask builds a task graph that its own
scheduler executes across workers; here the heavy lifting inside each
task is already a distributed Catalyst plan (DaskFrame / DataFrame),
so the task DAG itself lives on the DRIVER and the scheduler's job is
(a) evaluate every shared node exactly once (diamonds collapse), and
(b) run independent nodes concurrently — which submits independent
Spark JOBS concurrently, the supported Spark idiom for inter-job
parallelism (each job still fans out across all executors). Arbitrary
driver-side Python between jobs is exactly what dask users put in
delayed functions.

No hand-built graph optimizer: anything expressed on DaskFrames stays
one lazy Catalyst plan per node; ``delayed`` only sequences nodes whose
composition Catalyst cannot see (imperative control flow, multi-frame
checkpoints, external side effects).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


class Delayed:
    """A lazy call node. Arguments may be plain values, other Delayed
    nodes, or (nested) lists/tuples/dicts containing them. Sharing is
    by object identity: passing the SAME Delayed object into two
    downstream nodes makes a diamond that evaluates once."""

    __slots__ = ("_fn", "_args", "_kwargs", "_name")

    def __init__(self, fn: Callable, args: tuple, kwargs: dict,
                 name: str | None = None):
        self._fn = fn
        self._args = args
        self._kwargs = kwargs
        self._name = name or getattr(fn, "__name__", "delayed")

    def __repr__(self):
        return f"<Delayed {self._name!r}>"

    # dask-style conveniences: operators / getattr chain lazily
    def __add__(self, other):
        return Delayed(lambda a, b: a + b, (self, other), {}, "add")

    def __radd__(self, other):
        return Delayed(lambda a, b: b + a, (self, other), {}, "radd")

    def __mul__(self, other):
        return Delayed(lambda a, b: a * b, (self, other), {}, "mul")

    def __getitem__(self, key):
        return Delayed(lambda o, k: o[k], (self, key), {}, "getitem")

    def compute(self, scheduler: str = "threads", max_workers: int = 8):
        """Evaluate this node (and its whole upstream graph, shared
        nodes once). ``scheduler='threads'`` runs independent nodes
        concurrently — concurrent Spark job submission; ``'sync'``
        evaluates depth-first in the calling thread."""
        return compute(self, scheduler=scheduler, max_workers=max_workers)[0]


def delayed(fn: Callable | None = None, *, name: str | None = None):
    """Wrap a callable so invocations build Delayed nodes instead of
    running (reference: dask/delayed.py delayed). Usable as
    ``delayed(f)(x)`` or ``@delayed``."""
    if fn is None:
        return lambda f: delayed(f, name=name)
    if isinstance(fn, Delayed):
        return fn

    def build(*args, **kwargs) -> Delayed:
        return Delayed(fn, args, kwargs, name=name)

    build.__name__ = getattr(fn, "__name__", "delayed")
    return build


def _walk(obj: Any, seen: dict[int, Delayed]):
    """Collect every distinct Delayed reachable from ``obj``."""
    if isinstance(obj, Delayed):
        if id(obj) not in seen:
            seen[id(obj)] = obj
            for a in obj._args:
                _walk(a, seen)
            for a in obj._kwargs.values():
                _walk(a, seen)
    elif isinstance(obj, (list, tuple, set)):
        for x in obj:
            _walk(x, seen)
    elif isinstance(obj, dict):
        for x in obj.values():
            _walk(x, seen)


def _subst(obj: Any, results: dict[int, Any]):
    """Replace Delayed references with their computed values."""
    if isinstance(obj, Delayed):
        return results[id(obj)]
    if isinstance(obj, list):
        return [_subst(x, results) for x in obj]
    if isinstance(obj, tuple):
        return tuple(_subst(x, results) for x in obj)
    if isinstance(obj, dict):
        return {k: _subst(v, results) for k, v in obj.items()}
    return obj


def compute(*outputs, scheduler: str = "threads", max_workers: int = 8):
    """Evaluate one or more Delayed graphs together, sharing work:
    a node referenced by several outputs runs ONCE (dask.compute
    semantics). Returns a tuple of results, one per output."""
    nodes: dict[int, Delayed] = {}
    for out in outputs:
        _walk(out, nodes)

    # dependency edges between Delayed nodes only
    deps: dict[int, set[int]] = {}
    for nid, node in nodes.items():
        found: dict[int, Delayed] = {}
        for a in node._args:
            _walk(a, found)
        for a in node._kwargs.values():
            _walk(a, found)
        found.pop(nid, None)
        deps[nid] = {d for d in found if d in nodes}

    results: dict[int, Any] = {}
    if scheduler == "sync":
        done: set[int] = set()

        def run(nid: int):
            if nid in done:
                return
            for d in deps[nid]:
                run(d)
            node = nodes[nid]
            results[nid] = node._fn(
                *_subst(node._args, results),
                **_subst(node._kwargs, results),
            )
            done.add(nid)

        for nid in nodes:
            run(nid)
    else:
        # threaded topological execution: every node whose deps are
        # done is submitted; independent Spark jobs overlap
        lock = threading.Condition()
        remaining = dict(deps)
        failed: list[BaseException] = []

        def task(nid: int):
            node = nodes[nid]
            try:
                val = node._fn(
                    *_subst(node._args, results),
                    **_subst(node._kwargs, results),
                )
            except BaseException as exc:  # propagate to the caller
                with lock:
                    failed.append(exc)
                    lock.notify_all()
                return
            with lock:
                results[nid] = val
                lock.notify_all()

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            submitted: set[int] = set()
            with lock:
                while len(results) < len(nodes) and not failed:
                    ready = [
                        nid for nid, ds_ in remaining.items()
                        if nid not in submitted and ds_ <= results.keys()
                    ]
                    for nid in ready:
                        submitted.add(nid)
                        pool.submit(task, nid)
                    if len(results) < len(nodes) and not failed:
                        lock.wait(timeout=0.05)
        if failed:
            raise failed[0]

    return tuple(_subst(out, results) for out in outputs)
