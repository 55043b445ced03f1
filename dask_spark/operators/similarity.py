"""Similarity search over embedding columns (brief-mandated extension;
dask.array has no ANN — this is the Spark-first design for 100 TB).

Brute-force: broadcast the query vector as a literal expression; the
corpus is scanned map-only (cosine per row, JVM higher-order fns) and
reduced with TakeOrdered top-k — NO shuffle of the corpus, ever.

LSH / IVF: candidate pruning first (bucket equality / nearest-centroid
probe), exact cosine only on the surviving fraction."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.functions.vector import (
    cosine_sim,
    dot,
    lsh_signature,
    norm,
    random_hyperplanes,
)


def _query_lit(query: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query])


def brute_force_topk(frame, query: Sequence[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k: map-only scoring + TakeOrdered(k)."""
    from dask_spark.frame import DaskFrame

    q = _query_lit(query)
    scored = frame._sdf.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
    )
    return DaskFrame(scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))


def lsh_topk(frame, query: Sequence[float], k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             planes: int = 8, seed: int = 7):
    """ANN: probe only the query's LSH bucket, exact-rank inside it.
    At scale the bucket filter is a pushed-down int equality over a
    precomputable signature column."""
    from dask_spark.frame import DaskFrame

    dim = len(query)
    sig_col = lsh_signature(F.col(vec_col), dim, planes, seed)
    hps = random_hyperplanes(dim, planes, seed)
    qsig = 0
    for i, h in enumerate(hps):
        if sum(a * b for a, b in zip(query, h)) >= 0:
            qsig |= 1 << i
    q = _query_lit(query)
    scored = (
        frame._sdf.withColumn("__sig", sig_col)
        .filter(F.col("__sig") == qsig)
        .select(F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"))
    )
    return DaskFrame(scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))


def kmeans_centroids(frame, vec_col: str = "embedding", n_clusters: int = 16,
                     iters: int = 5, seed: int = 42):
    """Deterministic Lloyd's k-means on the driver over a sample —
    centroids are tiny (k×dim floats) and become literal constants in
    downstream plans. The heavy assignment pass stays distributed.

    The sample is the 2048 rows with the LOWEST xxhash64(vector) —
    a TakeOrdered top-k (never a full sort), and unlike limit() or
    Bernoulli sample() it is invariant to input partitioning, so IVF
    centroids are reproducible run-to-run."""
    sample = [
        list(r[0])
        for r in frame._sdf.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>")))
        .limit(2048)
        .collect()
    ]
    import random as _random

    import numpy as np

    rng = _random.Random(seed)
    cents = [list(v) for v in rng.sample(sample, min(n_clusters, len(sample)))]
    if not cents:
        return cents
    # vectorized Lloyd's (same math as the scalar loop, numpy argmin
    # over squared distances — the pure-python triple loop was the
    # dominant driver cost of every IVF/semantic-dedup build)
    S = np.asarray(sample, dtype="float64")
    C = np.asarray(cents, dtype="float64")
    for _ in range(iters):
        d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)
        for ci in range(len(C)):
            members = S[best == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
    return [list(map(float, c)) for c in C]


def assign_clusters(frame, centroids, vec_col: str = "embedding"):
    """Nearest-centroid assignment as a pure expression: argmin over k
    literal-array distances (map-only)."""
    from dask_spark.frame import DaskFrame

    if not centroids:
        # empty corpus sampled no centroids: every (nonexistent) row
        # belongs to cell 0, keeping the schema stable downstream
        return DaskFrame(frame._sdf.withColumn("cluster", F.lit(0)))
    dists = [
        F.aggregate(
            F.zip_with(F.col(vec_col), _query_lit(c), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in centroids
    ]
    # STAGED distance array + first-minimum position. The previous
    # iterated when(d_i < best_d, ...) chain embedded the full best_d
    # tree into every comparison — expression size 2^k by k centroids
    # (k=16 measured 146s of analysis+codegen for a 2000-row count).
    # array_position(min) keeps the same first-min tie rule at O(k).
    sdf = frame._sdf.withColumn("__d", F.array(*dists))
    sdf = sdf.withColumn(
        "cluster",
        (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1).cast(
            "int"
        ),
    ).drop("__d")
    return DaskFrame(sdf)


def ivf_topk(frame, query: Sequence[float], k: int = 10, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids=None, n_clusters: int = 16):
    """IVF-style ANN: assign corpus to centroid cells (map-only), probe
    the n_probe cells nearest the query, exact-rank inside them."""
    from dask_spark.frame import DaskFrame

    if centroids is None:
        centroids = kmeans_centroids(frame, vec_col, n_clusters)
    assigned = assign_clusters(frame, centroids, vec_col)._sdf
    qd = [
        (i, sum((a - b) ** 2 for a, b in zip(query, c)))
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(qd, key=lambda t: t[1])[:n_probe]]
    q = _query_lit(query)
    scored = (
        assigned.filter(F.col("cluster").isin(probe))
        .select(F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"))
    )
    return DaskFrame(scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k))


def pq_topk(frame, query: Sequence[float], k: int = 10, m: int = 4,
            ks: int = 4, iters: int = 1, vec_col: str = "embedding",
            id_col: str = "vec_id", books=None):
    """Product-quantization ANN (Jégou et al. 2011 TPAMI):
    asymmetric-distance (ADC) top-k via per-subspace codebooks.

    100 TB shape:
    - training: one pass per Lloyd's iteration trains all m subspace
      books at once; the update exchange carries ≤ m·ks·dsub scalars
      per batch (operators/cluster.py pq_codebooks);
    - encode: map-only — the m-code array (m·log2(ks) bits) replaces
      the 4·dim-byte vector, the 4-32x index compression PQ buys;
    - scoring: the per-query distance table (m·ks doubles) is a
      DRIVER literal computed with the same left-to-right chain the
      kernels use; adc = an unrolled codegen sum of m element_at
      lookups (no HOF, stays whole-stage codegen) + TakeOrdered(k).
      The corpus never shuffles; per-query state is m·ks doubles.

    Deterministic end to end — the DuckDB oracle replays training,
    code assignment, table arithmetic, and the ordered ADC fold
    bit-for-bit (queries.py ann_pq)."""
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.cluster import pq_codebooks, pq_encode

    if books is None:
        books = pq_codebooks(frame, vec_col, id_col, m, ks, iters)
    m = len(books)
    ks = len(books[0])
    dsub = len(books[0][0])
    # per-query ADC table: tbl[s*ks + c] = |q_s - book[s][c]|^2 with
    # the kernels' exact accumulation order (qq from q0*q0; qc and cc
    # folded from 0.0 — adding 0.0 is exact, so both starts match
    # DuckDB's list_dot_product fold)
    tbl = []
    for s in range(m):
        qs = [float(x) for x in query[s * dsub:(s + 1) * dsub]]
        qq = qs[0] * qs[0]
        for i in range(1, dsub):
            qq = qq + qs[i] * qs[i]
        for c in books[s]:
            qc = 0.0
            for a, b in zip(qs, c):
                qc = qc + a * b
            cc = 0.0
            for x in c:
                cc = cc + x * x
            tbl.append((qq - 2.0 * qc) + cc)

    enc = pq_encode(frame, books, vec_col, id_col)._sdf
    t = F.array(*[F.lit(float(x)) for x in tbl])
    adc = F.lit(0.0)
    for s in range(m):  # unrolled ordered fold — pure codegen
        adc = adc + F.element_at(
            t, F.lit(s * ks) + F.element_at(F.col("codes"), s + 1) + 1
        )
    scored = enc.select(F.col(id_col), F.round(adc, 6).alias("adc"))
    return DaskFrame(
        scored.orderBy(F.col("adc").asc(), F.col(id_col)).limit(k)
    )


def brute_force_topk_batch(frame, queries, k: int = 10,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           query_id_col: str = "query_id"):
    """Batch exact ANN: top-k per query for a SET of query vectors —
    the realistic serving shape at scale. The query set (tiny) is
    broadcast; the corpus is scored map-only against every query, then
    one shuffle on query_id ranks per query. Corpus×queries rows exist
    only inside the scoring stage (projected to id+score immediately).

    ``queries``: list of (query_id, vector) pairs."""
    import pandas as pd
    from pyspark.sql import Window

    sdf = frame._sdf
    spark = sdf.sparkSession
    qdf = spark.createDataFrame(
        pd.DataFrame({query_id_col: [q[0] for q in queries],
                      "__qv": [list(map(float, q[1])) for q in queries]})
    )
    scored = sdf.crossJoin(F.broadcast(qdf)).select(
        query_id_col,
        F.col(id_col),
        F.round(
            cosine_sim(F.col(vec_col), F.col("__qv")), 6
        ).alias("cosine"),
    )
    # Two-phase rank: a bare PARTITION BY query_id would ship the WHOLE
    # scored corpus of every query into one task. Phase 1 keeps top-k
    # per (input partition, query) — the exchange hashes on both, skew-
    # free; phase 2 ranks <= k·P survivors per query. Identical output:
    # the (cosine desc, id asc) order is total.
    order = [F.col("cosine").desc(), F.col(id_col).asc()]
    pre = Window.partitionBy(F.spark_partition_id(), query_id_col).orderBy(*order)
    pruned = (
        scored.withColumn("__prn", F.row_number().over(pre))
        .filter(F.col("__prn") <= k)
        .drop("__prn")
    )
    w = Window.partitionBy(query_id_col).orderBy(*order)
    return frame.__class__(
        pruned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_join(left, right, k: int = 5, vec_col: str = "embedding",
             id_col: str = "vec_id", planes: int = 6, bands: int = 8,
             seed: int = 7, exclude_self: bool = False,
             round_dp: int = 6):
    """Approximate k-NN JOIN — every left vector gets its k nearest
    right vectors (both sides LARGE; unlike brute_force/ann_batch the
    query side never broadcasts and the corpus never fully scans per
    query).

    Scale shape: both sides compute bands×planes LSH signatures with
    the batched Arrow matmul (map-only), explode to (band, band_sig)
    keys, and candidates come from an equi-join on the band key —
    shuffle is by bucket, fan-out bounded by bucket sizes. The band
    join carries IDS ONLY (the vector never rides the bands× exchange);
    distinct candidate pairs are formed slim, then each side's vector
    is fetched by one id-equi-join before the exact cosine. A rank
    window per left id takes the top k. Recall grows with ``bands``
    (any shared band makes a pair a candidate); vectors with no shared
    band are simply absent (approximate by design).

    Returns (left id, right id, cosine, rank) rows, rank 1..k."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions.vector import lsh_band_signature_udf

    from pyspark.sql import Window

    # dim probe: one row; empty left side -> empty join output either way
    row = left._sdf.select(vec_col).first()
    dim = len(row[0]) if row is not None and row[0] is not None else 1
    sig = lsh_band_signature_udf(dim, planes, bands, seed)

    def banded(sdf, prefix):
        return sdf.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.posexplode(sig(F.col(vec_col))).alias("band", f"{prefix}_sig"),
        )

    a = banded(left._sdf, "l")
    b = banded(right._sdf, "r")
    cand = (
        a.join(b, on=[a["band"] == b["band"], a["l_sig"] == b["r_sig"]])
        .select("l_id", "r_id")
    )
    if exclude_self:
        cand = cand.filter(F.col("l_id") != F.col("r_id"))
    cand = cand.dropDuplicates(["l_id", "r_id"])
    # 1/norm is a SCALAR computed once per source row (n rows) and
    # carried through the fetch join — scoring each candidate pair
    # with the full cosine_sim would unroll dot+norm+norm (~3*dim
    # products) per PAIR; with the join boundary keeping the norms
    # pre-computed, the pair expression is one unrolled dot and two
    # multiplies (measured 2.4x on the sf0.1 bench).
    from dask_spark.functions.vector import dot as v_dot

    def side(sdf, idn, vecn, invn):
        v = F.col(vec_col)
        return sdf.select(
            F.col(id_col).alias(idn),
            v.alias(vecn),
            (F.lit(1.0) / F.sqrt(v_dot(v, v, dim))).alias(invn),
        )

    lv = side(left._sdf, "l_id", "__lv", "__linv")
    rv = side(right._sdf, "r_id", "__rv", "__rinv")
    # Arrow dot kernel over the candidate pairs: the dim-unrolled JVM
    # expression (~6*dim nodes after casts) exceeds codegen limits and
    # falls back to interpreted eval — measured ~7s of a 9s sf0.1 run
    # in ONE fused stage. The kernel accumulates STRICTLY left to
    # right over the dim axis (64 vectorized column ops, not numpy's
    # pairwise .dot) so the double result stays bit-identical to the
    # oracle's ordered sum; rounding stays JVM-side (F.round
    # semantics, not numpy half-even).
    #
    # r15 (guide §4.2): mapInArrow, not mapInPandas — the pandas path
    # materialized each list cell as its own tiny ndarray and re-stacked
    # them (two Python-loop passes over ~candidate-count rows, the
    # dominant kernel cost at 758k pairs/sf0.1). The ListArray's flat
    # float64 buffer reshapes to (n, dim) with zero per-row Python work;
    # the accumulation loop and multiply order are unchanged, so the
    # doubles are bit-identical (same ops, same order, same dtype).

    def dot_kernel(batches):
        import numpy as np
        import pyarrow as pa

        def mat(batch, name):
            flat = batch.column(name).flatten()
            return np.asarray(flat, dtype="float64").reshape(
                batch.num_rows, -1
            )

        for batch in batches:
            if not batch.num_rows:
                continue
            L = mat(batch, "__lv")
            R = mat(batch, "__rv")
            acc = np.zeros(batch.num_rows, dtype="float64")
            for i in range(L.shape[1]):  # ordered accumulation
                acc += L[:, i] * R[:, i]
            acc *= np.asarray(batch.column("__linv"), dtype="float64")
            acc *= np.asarray(batch.column("__rinv"), dtype="float64")
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_id"), batch.column("r_id"),
                 pa.array(acc, type=pa.float64())],
                names=["l_id", "r_id", "cosine"],
            )

    pair_t = dict(cand.dtypes)
    scored = (
        cand.join(lv, "l_id").join(rv, "r_id")
        .mapInArrow(
            dot_kernel,
            f"l_id {pair_t['l_id']}, r_id {pair_t['r_id']}, cosine double",
        )
        .select("l_id", "r_id", F.round("cosine", round_dp).alias("cosine"))
    )
    w = Window.partitionBy("l_id").orderBy(
        F.col("cosine").desc(), F.col("r_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return DaskFrame(out)


def bm25_topk(frame, terms: Sequence[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75, text_col: str = "text", id_col: str = "doc_id"):
    """BM25 lexical retrieval over a document corpus (Robertson/Spärck
    Jones; the standard keyword-search twin of the ANN family —
    reference scope: dask has no search operator, brief-mandated
    similarity-search extension).

    100 TB shape: ONE map-side partial agg computes the corpus stats
    (N, avgdl, per-term document frequency) as a single row that is
    broadcast back via crossJoin — no shuffle of the corpus. Scoring is
    then map-only in-row expressions (per-term tf over the token
    array), and top-k is TakeOrdered — the corpus itself never
    shuffles. Two scans total (stats + scoring); persist the tokenized
    frame to make it one.
    """
    from dask_spark.frame import DaskFrame
    from dask_spark.functions.text import word_tokens

    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    toked = sdf.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    # literal captures in element lambdas are fine (cheap re-eval);
    # capturing an outer ARRAY expression would be O(k) per element.
    # Closure factory, NOT a default arg — `lambda x, t=t` would make t
    # a second lambda parameter and filter() would bind it to the index.
    def _tf(t: str):
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t)))

    tfs = [_tf(t) for t in terms]
    scored_base = toked.select(
        F.col(id_col),
        F.size(F.col("__toks")).alias("__dl"),
        *[tf.alias(f"__tf_{i}") for i, tf in enumerate(tfs)],
    )
    stats = scored_base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = scored_base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}")
        idf = F.log(
            1.0
            + (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        term = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
        score = term if score is None else score + term
    out = joined.select(
        F.col(id_col), F.round(score, 6).alias("score")
    ).orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    return DaskFrame(out)


def tfidf_topk(frame, terms: Sequence[str], k: int = 10,
               text_col: str = "text", id_col: str = "doc_id"):
    """TF-IDF lexical retrieval (smoothed idf: tf * ln((1+N)/(1+df)))
    — BM25's simpler sibling, same brief-mandated similarity-search
    family.

    100 TB shape identical to bm25_topk: one map-side stats agg
    (N + per-term document frequencies, a single broadcast row),
    map-only per-term tf scoring over the token array, TakeOrdered
    top-k — the corpus never shuffles."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions.text import word_tokens

    if not terms:
        raise ValueError("tfidf_topk needs at least one query term")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    toked = sdf.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )

    def _tf(t: str):  # closure factory — see bm25_topk's lambda note
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t)))

    base = toked.select(
        F.col(id_col),
        *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        term = F.col(f"__tf_{i}") * F.log(
            (F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col(f"__df_{i}"))
        )
        score = term if score is None else score + term
    out = joined.select(
        F.col(id_col), F.round(score, 6).alias("score")
    ).orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    return DaskFrame(out)


def _double_matrix_literal(rows):
    """kc×dim nested array literal via ONE F.expr parse (F.lit pays a
    py4j round trip per element — see sketch.py _int64_array_literal;
    repr(float) round-trips exactly through the double parser)."""
    inner = ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in r) + ")"
        for r in rows
    )
    return F.expr(f"array({inner})")


def ivfpq_topk(frame, query: Sequence[float], k: int = 10, kc: int = 8,
               n_probe: int = 4, m: int = 4, ks: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF-ADC — the FAISS IVFPQ composition (Jégou et al. 2011 §IV):
    coarse k-means cells prune the corpus, product quantization over
    the RESIDUALS (v − centroid[cell]) compresses what remains, and
    the query scores probed cells through per-cell ADC tables built
    on the query residual. The realistic billion-vector serving
    index: IVF bounds the scan, PQ bounds the memory.

    100 TB shape (every stage inherits its component's bill):
    - coarse train: k·d scalars per partition per iteration
      (operators/cluster.py kmeans);
    - residuals: map-only zip_with against the kc×dim centroid
      literal (one F.expr parse) — exact elementwise subtraction, no
      shuffle, recomputed per PQ pass instead of materialized;
    - PQ train/encode on residuals: ≤ m·ks·dsub update scalars per
      batch; the stored index row is (id, cell, m codes) — the
      4·dim-byte vector never persists;
    - query: probe choice and the n_probe·m·ks ADC table are DRIVER
      arithmetic (same left-to-right chains as the kernels); scoring
      is an unrolled codegen sum of m element_at lookups over cell-
      selected table slices + TakeOrdered(k). Corpus never shuffles.

    Deterministic end to end: coarse cells, residuals, codebooks,
    probe set, and every ADC distance replay bit-for-bit in the
    DuckDB oracle (queries.py ann_ivfpq)."""
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.cluster import kmeans, pq_codebooks, pq_encode

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    assigned, cents = kmeans(frame, vec_col, id_col, k=kc, iters=1)
    kc = len(cents)
    dim = len(cents[0])
    cmat = _double_matrix_literal(cents)
    res = (
        sdf.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"))
        .join(assigned._sdf.select(id_col, "cluster"), id_col)
        .select(
            id_col, "cluster",
            F.zip_with(
                F.col("__v"),
                F.element_at(cmat, F.col("cluster") + 1),
                lambda a, b: a - b,
            ).alias("__r"),
        )
    )
    resfr = DaskFrame(res)
    books = pq_codebooks(resfr, "__r", id_col, m=m, ks=ks, iters=1)
    dsub = len(books[0][0])

    # probe choice: same centroid-distance double arithmetic as the
    # oracle (vv - 2vc + cc, each dot folded left to right), ties to
    # the lower cell
    q = [float(x) for x in query]
    qq = q[0] * q[0]
    for i in range(1, dim):
        qq = qq + q[i] * q[i]
    dists = []
    for ci, c in enumerate(cents):
        qc = 0.0
        for a, b in zip(q, c):
            qc = qc + a * b
        cc = 0.0
        for x in c:
            cc = cc + x * x
        dists.append(((qq - 2.0 * qc) + cc, ci))
    probe = [ci for _, ci in sorted(dists)[:n_probe]]

    # per-probed-cell ADC tables on the query residual, flattened to
    # ONE literal indexed [pidx][s][code] — n_probe*m*ks doubles
    tbl = []
    for ci in probe:
        qr = [a - b for a, b in zip(q, cents[ci])]
        for s in range(m):
            qs = qr[s * dsub:(s + 1) * dsub]
            sqq = qs[0] * qs[0]
            for i in range(1, dsub):
                sqq = sqq + qs[i] * qs[i]
            for c in books[s]:
                qc = 0.0
                for a, b in zip(qs, c):
                    qc = qc + a * b
                cc = 0.0
                for x in c:
                    cc = cc + x * x
                tbl.append((sqq - 2.0 * qc) + cc)

    from dask_spark.functions.text import _double_array_literal

    t = _double_array_literal(tbl)
    enc = (
        pq_encode(resfr, books, "__r", id_col)._sdf
        .join(assigned._sdf.select(id_col, "cluster"), id_col)
        .filter(F.col("cluster").isin([int(c) for c in probe]))
    )
    pidx = F.lit(0)
    for i, ci in enumerate(probe):  # tiny when-chain, n_probe branches
        pidx = F.when(F.col("cluster") == int(ci), i).otherwise(pidx)
    adc = F.lit(0.0)
    for s in range(m):  # unrolled ordered fold — pure codegen
        adc = adc + F.element_at(
            t,
            pidx * (m * ks) + F.lit(s * ks)
            + F.element_at(F.col("codes"), s + 1) + 1,
        )
    scored = enc.select(
        F.col(id_col), F.col("cluster").alias("cell"),
        F.round(adc, 6).alias("adc"),
    )
    return DaskFrame(
        scored.orderBy(F.col("adc").asc(), F.col(id_col)).limit(k)
    )


def ql_topk(frame, terms: Sequence[str], k: int = 10, mu: float = 2000.0,
            text_col: str = "text", id_col: str = "doc_id"):
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001 — the language-modeling alternative to BM25; the
    standard second scorer in IR eval): score(q, d) =
    Σ_t ln((tf_td + μ·p(t|C)) / (|d| + μ)), p(t|C) = collection term
    count / collection length.

    Same 100 TB shape as bm25_topk: ONE map-side stats aggregate
    (collection length + per-query-term collection counts — query-
    bounded scalars, never the vocabulary) broadcast back, then
    map-only per-term tf scoring and TakeOrdered k. The per-term log
    sum is a FIXED-ORDER chain (term list order), bit-identical in an
    ANSI oracle. Token-less docs with μ > 0 still score (pure
    collection model)."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions.text import word_tokens

    if not terms:
        raise ValueError("ql_topk needs at least one query term")
    if mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    toked = sdf.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )

    def _tf(t: str):  # closure factory — see bm25_topk's lambda note
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t)))

    base = toked.select(
        F.col(id_col),
        F.size(F.col("__toks")).alias("__dl"),
        *[_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.sum("__dl").cast("bigint").alias("__cl"),
        *[
            F.sum(F.col(f"__tf_{i}")).cast("bigint").alias(f"__cf_{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        # add-one on the collection count keeps unseen query terms
        # finite (standard practice); p(t|C) = (cf+1)/(cl+1)
        p_c = (
            (F.col(f"__cf_{i}") + F.lit(1)).cast("double")
            / (F.col("__cl") + F.lit(1)).cast("double")
        )
        term = F.log(
            (F.col(f"__tf_{i}").cast("double") + F.lit(float(mu)) * p_c)
            / (F.col("__dl").cast("double") + F.lit(float(mu)))
        )
        score = term if score is None else score + term
    out = (
        joined.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(int(k))
    )
    return DaskFrame(out)
