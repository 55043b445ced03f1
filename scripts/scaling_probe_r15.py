#!/usr/bin/env python
"""Graph-exchange probe at 100× (r14 verdict item 3): the graph family
curve stopped at 60M edges (scaling_probe_r13) — extend to ~600M with
the SAME deterministic bounded-degree generator (nodes = E/4, expected
degree ~8, so the degree distribution is held across scales):

- triangles: the O(E^1.5) oriented-wedge claim over two decades
  (6M → 60M → 600M edges).
- k-core (k=5, 4 fixed peel rounds): per-round degree agg + two semi
  joins — adjacency-bounded exchanges, lineage truncated per round.
- pagerank (3 iterations, symmetric): the per-iteration rank exchange
  is edges-bounded; integer-exact so the 600M sum is also a
  determinism check across AQE replans.

Wall-clock depends on host load; run idle. Overrides: PROBE_SCALES
env as comma-separated edge counts (default 6000000,60000000,600000000).

Prints one JSON line, then a summary with the per-decade ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dask_spark.frame import DaskFrame  # noqa: E402
from dask_spark.session import get_spark  # noqa: E402

SCALES = [int(x) for x in os.environ.get(
    "PROBE_SCALES", "6000000,60000000,600000000").split(",")]


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def graph_edges(spark, n_edges):
    """Same generator as scaling_probe_r13.graph_edges — degree ~8
    bounded-degree random graph, deterministic in n_edges."""
    nodes = max(n_edges // 4, 4)
    base = spark.range(n_edges)
    a = F.pmod(F.xxhash64("id"), F.lit(nodes))
    b = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(nodes))
    return DaskFrame(
        base.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
    )


def main():
    from dask_spark.operators.graph import k_core, pagerank, triangle_count

    spark = get_spark("scaling_probe_r15")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {"scales": SCALES}

    for n in SCALES:
        label = f"{n // 1_000_000}m"
        ed = DaskFrame(graph_edges(spark, n)._sdf.persist())
        n_ed = ed._sdf.count()
        res[f"edges_{label}"] = n_ed

        tri, t_tri = timed(
            lambda: triangle_count(ed).to_spark()
            .agg(F.sum("triangles")).first()[0]
        )
        res[f"triangles_{label}_sec"] = t_tri
        res[f"triangles_{label}_total"] = int(tri or 0)

        kc, t_kc = timed(
            lambda: k_core(ed, 5, rounds=4).to_spark().count()
        )
        res[f"kcore_{label}_sec"] = t_kc
        res[f"kcore_{label}_nodes"] = int(kc)

        pr, t_pr = timed(
            lambda: pagerank(ed, "a", "b", iters=3, symmetric=True)
            .to_spark().agg(F.sum("rank")).first()[0]
        )
        res[f"pagerank_{label}_sec"] = t_pr
        res[f"pagerank_{label}_ranksum"] = int(pr or 0)

        ed._sdf.unpersist()

    print(json.dumps(res))
    labels = [f"{n // 1_000_000}m" for n in SCALES]
    for fam in ("triangles", "kcore", "pagerank"):
        walls = [res[f"{fam}_{la}_sec"] for la in labels]
        ratios = [
            f"x{walls[i + 1] / max(walls[i], 1e-9):.1f}"
            for i in range(len(walls) - 1)
        ]
        print(f"{fam}: " + " ".join(
            f"{la}={w}s" for la, w in zip(labels, walls))
            + f"  per-decade ratios: {' '.join(ratios)}"
            + ("  (E^1.5 bound allows x31.6/decade)"
               if fam == "triangles" else ""))


if __name__ == "__main__":
    main()
