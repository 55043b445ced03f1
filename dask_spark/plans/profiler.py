"""Execution profiler (reference: dask/diagnostics/profile.py
Profiler/ResourceProfiler — dask records per-task (key, start, end,
worker) tuples; here Spark's executed plan already carries per-operator
SQLMetrics, so the profiler executes the plan once and walks the final
AQE plan tree reading them).

What you get per operator node: output rows, data size, shuffle bytes
written/read, spill size, scan files/partitions — the numbers that
answer "where did the time/memory go" at any scale. Everything is read
from the JVM AFTER one action; profiling adds no listeners, no extra
jobs, and no overhead to the measured run itself."""

from __future__ import annotations

import time
from typing import Any

import pandas as pd

_KEEP_HINTS = (
    "numOutputRows", "dataSize", "spillSize", "numFiles", "filesSize",
    "numPartitions", "numTasks",
)


def _scala_map_items(m):
    it = m.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def _children(node):
    out = []
    # AQE wraps materialized stages in *QueryStageExec whose subtree
    # hangs off .plan(), not .children()
    if "QueryStage" in node.getClass().getSimpleName():
        try:
            out.append(node.plan())
        except Exception:
            pass
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _walk(node, depth, rows):
    metrics = {}
    for name, metric in _scala_map_items(node.metrics()):
        try:
            metrics[name] = metric.value()
        except Exception:
            continue
    rows.append((depth, node.nodeName(), metrics))
    for child in _children(node):
        _walk(child, depth + 1, rows)


def sql_metrics(frame, action: str = "count") -> pd.DataFrame:
    """Execute ``frame``'s plan once (``action``: count | collect) and
    return one row per (operator, metric): columns
    (depth, node, metric, value). The walk descends through the FINAL
    adaptive plan, so AQE re-plans (broadcast conversions, coalesced
    shuffle reads, skew splits) are what you see — not the static
    guess."""
    import pyspark.sql.functions as F

    sdf = frame._sdf if hasattr(frame, "_sdf") else frame
    if action == "collect":
        target = sdf
    else:
        # A bare count() would execute a DERIVED Dataset: the walked
        # plan below would never run and every metric would read 0 —
        # and count() also lets Catalyst prune all columns, so the
        # profiled plan would not be the plan a real consumer runs.
        # Materialize through a checksum aggregate instead: every
        # column is forced, one row reaches the driver, and the
        # executed plan we walk is the one that ran (the two extra
        # HashAggregate/checksum nodes at the root are the harness).
        # xxhash64 rejects map-typed columns (and needs >=1 arg) —
        # hash the hashable columns, count() still forces the rest
        hashable = [  # xxhash64 rejects MapType RECURSIVELY
            c for c, t in sdf.dtypes if "map" not in t
        ]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        aggs += [  # count(col) forces unhashable columns un-pruned
            F.count(F.col(c)).alias(f"__n_{i}")
            for i, (c, t) in enumerate(sdf.dtypes) if "map" in t
        ]
        if hashable:
            aggs.append(
                F.sum(
                    F.pmod(
                        F.xxhash64(*[F.col(c) for c in hashable]),
                        F.lit(1_000_003),
                    )
                ).alias("__checksum")
            )
        target = sdf.agg(*aggs)
    target.collect()
    ep = target._jdf.queryExecution().executedPlan()
    if "Adaptive" in ep.getClass().getName():
        ep = ep.executedPlan()
    walked: list[tuple[int, str, dict]] = []
    _walk(ep, 0, walked)
    out = []
    for depth, name, metrics in walked:
        for metric, value in metrics.items():
            out.append((depth, name, metric, value))
    return pd.DataFrame(out, columns=["depth", "node", "metric", "value"])


def profile(frame, action: str = "count") -> dict[str, Any]:
    """One-call profile summary (the dask ``with Profiler()`` shape):
    wall seconds plus the scale-health aggregates — total shuffle bytes
    written, total spill, rows out of every exchange, and the full
    per-operator table under ``"metrics"``."""
    t0 = time.time()
    m = sql_metrics(frame, action=action)
    wall = time.time() - t0

    def total(name: str) -> int:
        v = m[m.metric == name]["value"]
        return int(v.sum()) if len(v) else 0

    exchanges = m[(m.node.str.contains("Exchange")) & (m.metric == "dataSize")]
    return {
        "wall_sec": round(wall, 3),
        "shuffle_bytes_written": total("shuffleBytesWritten"),
        "spill_bytes": total("spillSize"),
        "exchange_rows": int(
            m[
                (m.node.str.contains("Exchange"))
                & (m.metric == "shuffleRecordsWritten")
            ]["value"].sum()
        ),
        "exchange_data_bytes": int(exchanges["value"].sum()) if len(exchanges) else 0,
        "metrics": m,
    }
