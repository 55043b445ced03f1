#!/usr/bin/env python
"""60M-row scaling probe for the exact-rank + graph families
(r12 verdict item 4).

Two questions, answered with measured numbers:

1. **Spearman exact vs binned crossover.** The exact rank exchange is
   distinct-value-bounded (~rows for continuous data); the binned mode
   caps every exchange at ``bins`` rows. §4 guides "crossover around
   1e7 distinct values" — measure exact and binned wall-clock at 6M
   and 60M near-unique doubles and report the observed ratio. Also
   re-checks the DECIMAL(38,0) moment-sum bound holds at 60M rows
   (the 10× probe caught an int64 overflow at 6M in r11; DECIMAL is
   good to n ≈ 1e12 — this is the first 100× datapoint).

2. **Graph family at 60M edges.** triangles (O(E^1.5) oriented wedge
   join) and BFS (frontier supersteps) on a deterministic bounded-
   degree random graph at 6M and 60M edges — the scaling exponent in
   practice, plus closed-form-free sanity (counts > 0, BFS reaches
   nodes each round).

Wall-clock depends on host load; run on an idle machine. Rows override:
PROBE_SMALL / PROBE_BIG env (default 6M / 60M).

Prints one JSON line, then a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dask_spark.session import get_spark  # noqa: E402
from dask_spark.frame import DaskFrame  # noqa: E402

SMALL = int(os.environ.get("PROBE_SMALL", "6000000"))
BIG = int(os.environ.get("PROBE_BIG", "60000000"))


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def spearman_frame(spark, n):
    """Near-unique doubles, positively rank-correlated by
    construction: y = x + bounded hash noise."""
    base = spark.range(n)
    x = (F.xxhash64("id") % F.lit(10 ** 12)).cast("double")
    noise = (F.xxhash64("id", F.lit(1)) % F.lit(10 ** 11)).cast("double")
    return DaskFrame(base.select(x.alias("x"), (x + noise).alias("y")))


def graph_edges(spark, n_edges):
    """Deterministic bounded-degree graph: node space n_edges/4, each
    edge i connects hash-chosen endpoints — expected degree ~8, so the
    oriented wedge join stays arboricity-bounded like a real sparse
    graph."""
    nodes = max(n_edges // 4, 4)
    base = spark.range(n_edges)
    a = F.pmod(F.xxhash64("id"), F.lit(nodes))
    b = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(nodes))
    return DaskFrame(
        base.select(a.alias("a"), b.alias("b")).filter(F.col("a") != F.col("b"))
    )


def main():
    from dask_spark.operators.graph import bfs_hops, triangle_count
    from dask_spark.operators.reductions import spearman_corr

    spark = get_spark("scaling_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {"small": SMALL, "big": BIG}

    # --- 1. spearman exact vs binned ------------------------------------
    for label, n in (("6m", SMALL), ("60m", BIG)):
        fr = DaskFrame(spearman_frame(spark, n)._sdf.persist())
        fr._sdf.count()
        row_e, t_e = timed(
            lambda: spearman_corr(fr, "x", "y", exact=True).compute()
        )
        row_b, t_b = timed(
            lambda: spearman_corr(
                fr, "x", "y", exact=False, bins=8192
            ).compute()
        )
        res[f"spearman_exact_{label}_sec"] = t_e
        res[f"spearman_binned_{label}_sec"] = t_b
        res[f"spearman_exact_{label}_rho"] = float(row_e["rho"].iloc[0])
        res[f"spearman_binned_{label}_rho"] = float(row_b["rho"].iloc[0])
        fr._sdf.unpersist()

    # --- 2. graph family at 6M / 60M edges ------------------------------
    for label, n in (("6m", SMALL), ("60m", BIG)):
        ed = DaskFrame(graph_edges(spark, n)._sdf.persist())
        n_ed = ed._sdf.count()
        tri, t_tri = timed(
            lambda: triangle_count(ed).to_spark()
            .agg(F.sum("triangles")).first()[0]
        )
        bfs, t_bfs = timed(
            lambda: bfs_hops(ed, 0, rounds=4).to_spark().count()
        )
        res[f"graph_edges_{label}"] = n_ed
        res[f"triangles_{label}_sec"] = t_tri
        res[f"triangles_{label}_total"] = int(tri or 0)
        res[f"bfs_{label}_sec"] = t_bfs
        res[f"bfs_{label}_reached"] = int(bfs)
        ed._sdf.unpersist()

    print(json.dumps(res))
    se, be = res["spearman_exact_6m_sec"], res["spearman_binned_6m_sec"]
    se2, be2 = res["spearman_exact_60m_sec"], res["spearman_binned_60m_sec"]
    print(
        f"\nspearman 6m: exact={se}s binned={be}s "
        f"(rho {res['spearman_exact_6m_rho']:.4f} vs "
        f"{res['spearman_binned_6m_rho']:.4f})\n"
        f"spearman 60m: exact={se2}s binned={be2}s — exact/binned "
        f"ratio {se2 / be2 if be2 else float('nan'):.1f}x at 6e7 "
        f"distinct values\n"
        f"triangles: 6m={res['triangles_6m_sec']}s "
        f"60m={res['triangles_60m_sec']}s "
        f"(x{res['triangles_60m_sec'] / max(res['triangles_6m_sec'], 1e-9):.1f} "
        f"for 10x edges; E^1.5 bound allows x31.6)\n"
        f"bfs(4 rounds): 6m={res['bfs_6m_sec']}s 60m={res['bfs_60m_sec']}s"
    )


if __name__ == "__main__":
    main()
