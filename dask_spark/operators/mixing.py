"""Corpus-mixing operators for training-data pipelines (brief-mandated
extension class; the reference's closest surface is stratified
sampling, dask/dataframe/dask_expr/_collection.py sample — these add
the per-source weighting a data-mix recipe actually uses)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Window


def temperature_mix(frame, source_col: str = "source",
                    id_col: str = "doc_id", alpha: float = 0.5,
                    scale: float = 10.0, candidate_margin: float = 4.0):
    """Temperature-weighted per-source sampling: keep EXACTLY
    ``min(N_s, ceil(scale * N_s^alpha))`` docs from each source —
    alpha < 1 up-weights small sources relative to proportional
    sampling (the standard multilingual/multi-domain mixing recipe).
    Selection order is md5(id) — deterministic, unbiased by ingest
    order, reproducible across engines and runs.

    100 TB shape — the selection is a rank-per-source problem, and a
    bare ``row_number() OVER (PARTITION BY source)`` would ship EVERY
    row of a source into one task (a 5 TB source = one dead executor).
    Instead:

    1. one tiny agg → per-source counts N_s (driver-scale: #sources);
    2. map-only candidate filter: md5-uniform u = hash/2^60 ≤
       margin·quota/N_s (clamped to 1) via a broadcast threshold join —
       keeps ~margin×quota rows per source, never more than the source;
    3. sufficiency check (one tiny agg): if a source with quota < N_s
       got fewer than quota candidates — probability ~e^(-quota) at
       margin 4 — the margin quadruples and the filter re-runs, so the
       result is EXACT, not approximate;
    4. the rank window then orders only the bounded candidate set.

    The kept rows are exactly the quota smallest (md5, id) keys per
    source — identical to the naive full-window formulation (the
    DuckDB oracle runs that formulation) at any margin.

    Production note: to hit an exact global token budget M, set
    scale = M / Σ_s N_s^alpha (one tiny agg); keeping scale explicit
    keeps the operator a pure function of the row set."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    spark = sdf.sparkSession
    # null source/id rows can never be selected (equi-joins and md5
    # ordering both drop null keys) — exclude them up front so a null
    # group can't earn an unfillable quota and hang the margin loop
    sdf = sdf.filter(
        F.col(source_col).isNotNull() & F.col(id_col).isNotNull()
    )

    counts = {
        r["s"]: r["n"]
        for r in sdf.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:  # empty input: createDataFrame([]) cannot infer
        return DaskFrame(sdf)
    weight = (lambda n: math.sqrt(n)) if alpha == 0.5 else (
        lambda n: float(n) ** alpha
    )
    quotas = {s: min(n, int(math.ceil(weight(n) * scale)))
              for s, n in counts.items()}

    from dask_spark.functions import md5_prefix60

    u = md5_prefix60(F.col(id_col).cast("string")).cast("double") / float(1 << 60)

    margin = candidate_margin
    while True:
        thr_map = {s: min(1.0, margin * quotas[s] / counts[s])
                   for s in counts}
        if all(t >= 1.0 for t in thr_map.values()):
            # every quota is a large fraction of its source — the
            # prefilter would keep everything, so skip the filter AND
            # the sufficiency action (trivially satisfied). This is
            # the local/small-scale fast path: one driver job total.
            cand = sdf
            break
        thr = spark.createDataFrame(
            list(thr_map.items()), [source_col, "__thr"]
        )
        cand = sdf.join(F.broadcast(thr), source_col).filter(
            u <= F.col("__thr")
        ).drop("__thr")
        got = {
            r["s"]: r["n"]
            for r in cand.groupBy(F.col(source_col).alias("s"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if all(got.get(s, 0) >= q for s, q in quotas.items()):
            break
        margin *= 4  # vanishingly rare; keeps the result exact

    qdf = spark.createDataFrame(
        list(quotas.items()), [source_col, "__quota"]
    )
    w_r = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    out = (
        cand.join(F.broadcast(qdf), source_col)
        .withColumn("__rn", F.row_number().over(w_r))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )
    return DaskFrame(out)


def stratified_cap(frame, group_col: str = "source", n: int = 100,
                   id_col: str = "doc_id"):
    """Per-group cap: keep at most ``n`` rows from each group, selected
    in deterministic md5(id) order — the domain-balancing step a web
    corpus needs before training (a single crawl domain must not
    dominate the mix; C4/Gopher both cap per-domain contributions).
    Equivalent to ``temperature_mix(alpha=0, scale=n)`` (N_s^0 = 1, so
    every group's quota is min(N_s, n)) and shares its 100 TB shape:
    a broadcast-threshold candidate prefilter bounds each group to
    ~margin·n rows BEFORE the rank window, so a 5 TB group never ships
    into one task; the window then orders only the bounded candidates
    (and Spark's InferWindowGroupLimit keeps per-partition state at n
    rows per group even on the fallback path)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return temperature_mix(frame, source_col=group_col, id_col=id_col,
                           alpha=0.0, scale=float(n))


def weighted_sample(frame, weight_col: str, rate: float,
                    id_col: str = "doc_id", salt: str = "ws"):
    """Deterministic importance sampling: keep a row iff
    u(id) < rate · w / mean(w), the quality-weighted corpus-sampling
    step (upsample high-quality docs toward a target rate) — u(id) is
    the engine-portable md5 uniform in [0,1), so the SAME rows are
    selected on every engine and every run, and a SQL oracle can
    replay the selection exactly.

    100 TB shape: ONE tiny agg for mean(w) (a driver scalar, like
    dask's divisions stats), then a map-only filter — the corpus never
    shuffles. mean(w) is rounded to 6 decimals on both engines so fp
    summation order cannot flip a boundary row. Rows with p ≥ 1
    (w ≥ mean/rate) are always kept — deterministic thinning cannot
    replicate rows."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import md5_prefix60

    sdf = frame._sdf
    mean_w = sdf.agg(F.avg(F.col(weight_col))).first()[0]
    if mean_w is None or mean_w <= 0:
        return DaskFrame(sdf.filter(F.lit(False)))
    mean_w = round(float(mean_w), 6)
    u = md5_prefix60(
        F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
    ) / F.lit(float(1 << 60))
    p = F.lit(rate) * F.col(weight_col) / F.lit(mean_w)
    return DaskFrame(sdf.filter(u < p))


def dsir_scores(corpus, target, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 1024,
                alpha: float = 1.0, word_hash: str = "md5"):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public): score every raw-corpus doc by how much more likely
    its hashed bag-of-words is under a TARGET-corpus unigram model
    than under the raw-corpus model; the standard pretraining-data
    curation step ("select web text that looks like Wikipedia"). The
    paper resamples by these weights; the deterministic engine
    primitive is the log importance weight itself —
    log w(doc) = Σ_tokens [ln p_target(b(tok)) − ln p_raw(b(tok))]
    over ``n_buckets`` hashed features with add-``alpha`` smoothing.
    Compose with :func:`weighted_sample` / TakeOrdered for the
    resample/top-k step.

    100 TB shape: each side's bucket histogram is ONE map-side-
    combined groupBy over ≤ n_buckets keys (a driver-bounded model,
    like dask broadcasting sklearn artifacts); the log-ratio table
    rides the scoring plan as a length-B literal; scoring is map-only
    over the corpus — no corpus shuffle, no Python. The fold runs
    over the SORTED feature array so its double accumulation is
    order-deterministic and a SQL oracle replays it bit-for-bit
    (word_hash="md5" is the engine-portable mode; "xxhash64" the fast
    JVM path).

    Returns (id, n_tokens, dsir_logweight) for every corpus doc
    (empty docs score 0.0 — no evidence either way)."""
    from dask_spark.frame import DaskFrame

    lam = dsir_fit(
        target, corpus, text_col=text_col, n_buckets=n_buckets,
        alpha=alpha, word_hash=word_hash,
    )
    out = _dsir_apply(
        corpus._sdf if hasattr(corpus, "_sdf") else corpus,
        lam, text_col=text_col, id_col=id_col, word_hash=word_hash,
    )
    return DaskFrame(out)


def _dsir_feat_expr(text_col: str, B: int, word_hash: str):
    """Hashed-bucket feature array as a pure Column expression — no id
    dependence, so histogram fitting works on frames that carry only
    the text column."""
    from dask_spark.functions import md5_prefix60

    hfn = md5_prefix60 if word_hash == "md5" else F.xxhash64
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    return F.transform(
        toks, lambda t: F.pmod(hfn(t), F.lit(B)).cast("int")
    )


def _dsir_feats(sdf, text_col: str, id_col: str, B: int, word_hash: str):
    return sdf.select(
        F.col(id_col),
        _dsir_feat_expr(text_col, B, word_hash).alias("__feat"),
    )


def dsir_fit(target, raw, text_col: str = "text",
             n_buckets: int = 1024, alpha: float = 1.0,
             word_hash: str = "md5"):
    """Fit the DSIR log-ratio table from two STATIC frames: returns
    the length-``n_buckets`` list λ[b] = ln p_target(b) − ln p_raw(b)
    (add-``alpha`` smoothing) — a driver-bounded model artifact. Each
    side is ONE map-side-combined ≤n_buckets-key histogram over the
    text column alone (no id column required)."""
    import math

    B = int(n_buckets)

    def hist_plan(frame, tag: int):
        sdf = frame._sdf if hasattr(frame, "_sdf") else frame
        return (
            sdf.select(
                F.explode(
                    _dsir_feat_expr(text_col, B, word_hash)
                ).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(tag).alias("__s"), "b", "c")
        )

    # both histograms in ONE driver action (r16, the §2.10 union
    # trick: the two ≤B-key aggregates are independent, so a tagged
    # union halves the fit's driver round trips); consumption is
    # dict-keyed and order-insensitive
    ct_t: dict = {}
    ct_r: dict = {}
    for r in hist_plan(target, 0).unionByName(hist_plan(raw, 1)).collect():
        (ct_t if r["__s"] == 0 else ct_r)[r["b"]] = r["c"]
    tot_t, tot_r = sum(ct_t.values()), sum(ct_r.values())
    a = float(alpha)
    # per-bucket ln ratio, rounded to 9 dp so the oracle's ln/round
    # replays the table exactly (same contract as kmeans centroids)
    return [
        round(
            math.log((ct_t.get(b, 0) + a) / (tot_t + a * B))
            - math.log((ct_r.get(b, 0) + a) / (tot_r + a * B)),
            9,
        )
        for b in range(B)
    ]


def _dsir_apply(sdf, lam, text_col: str, id_col: str, word_hash: str):
    """Map-only scoring plan: Σ λ[bucket] folded over the SORTED
    feature array (order-deterministic doubles). Works unchanged on a
    STREAMING DataFrame — no aggregation state, no shuffle."""
    lam_lit = F.lit(list(lam))
    fcol = F.array_sort("__feat")
    score = F.when(
        F.size("__feat") > 0,
        F.aggregate(
            fcol, F.lit(0.0),
            lambda acc, f: acc + F.element_at(lam_lit, f + 1),
        ),
    ).otherwise(F.lit(0.0))
    return _dsir_feats(sdf, text_col, id_col, len(lam), word_hash).select(
        F.col(id_col),
        F.size("__feat").cast("bigint").alias("n_tokens"),
        F.round(score, 6).alias("dsir_logweight"),
    )


def dsir_resample(corpus, target, k: int, text_col: str = "text",
                  id_col: str = "doc_id", n_buckets: int = 1024,
                  alpha: float = 1.0, word_hash: str = "md5",
                  salt: str = "dsir"):
    """The resample step of DSIR (Xie et al. 2023): draw ``k`` docs
    WITHOUT replacement with probability ∝ the importance weight, via
    the Gumbel-top-k trick (public: Kool et al. 2019) — key_i =
    log w_i + Gumbel_i, take the k largest. Gumbel noise comes from
    the engine-portable md5 uniform (−ln(−ln u), u = md5(id|salt) /
    2⁶⁰), so the SAME k docs come out on every engine and every run,
    and a SQL oracle replays the draw exactly.

    100 TB shape: :func:`dsir_scores` is map-only over the corpus;
    the key is one more map expression; top-k is TakeOrdered (never a
    global sort). Ties break on id — total order, deterministic.

    Returns the k selected (id, n_tokens, dsir_logweight, gumbel_key)
    rows."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import md5_prefix60

    scored = dsir_scores(
        corpus, target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, alpha=alpha, word_hash=word_hash,
    )._sdf
    u = (
        md5_prefix60(
            F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
        ).cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 60))  # (0,1): +0.5 keeps ln(u) finite at 0
    key = F.round(
        F.col("dsir_logweight") - F.log(-F.log(u)), 6
    ).alias("gumbel_key")
    out = (
        scored.select(id_col, "n_tokens", "dsir_logweight", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    return DaskFrame(out)


def split_assign(frame, id_col: str, ratios=None, salt: str = "split"):
    """Deterministic train/valid/test assignment → adds ``split``:
    the row's engine-portable uniform u = md5_prefix60(salt:id)/2^60
    lands in consecutive ratio intervals — the split every training
    pipeline needs to be REPRODUCIBLE across engines, runs, and
    re-ingests (a Bernoulli sample() reshuffles on every retry;
    this re-derives the same label from the id forever, and adding
    new rows never moves an old row's split).

    Map-only, zero shuffle: thresholds floor(cum_ratio·2^60) are
    int64 literals, the comparison is pure integer. Ratios must sum
    to 1 (±1e-9); labels keep dict order, last label absorbs the
    rounding tail."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import md5_prefix60

    if ratios is None:
        ratios = {"train": 0.8, "valid": 0.1, "test": 0.1}
    if abs(sum(ratios.values()) - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {ratios}")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    u = md5_prefix60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    labels = list(ratios)
    cuts = []
    acc = 0.0
    for lab in labels[:-1]:
        acc += float(ratios[lab])
        cuts.append(int(acc * float(1 << 60)))
    # forward when-chain: the FIRST interval whose upper cut exceeds
    # u wins, so intervals are [0,c1), [c1,c2), ..., [c_{k-1}, 2^60)
    expr = None
    for lab, cut in zip(labels[:-1], cuts):
        cond = u < F.lit(cut)
        expr = F.when(cond, F.lit(lab)) if expr is None \
            else expr.when(cond, F.lit(lab))
    expr = (expr.otherwise(F.lit(labels[-1])) if expr is not None
            else F.lit(labels[-1]))
    return DaskFrame(sdf.withColumn("split", expr))


def source_concentration(frame, group_col: str = "source",
                         top_k: int = 3, round_dp: int = 6):
    """Corpus concentration diagnostics → one-row DaskFrame(
    n_sources, n_docs, hhi, topk_share): HHI = Σ share_i² (the
    Herfindahl index — 1/n_sources for a perfectly balanced mix, 1.0
    for a single-source corpus) and the share of the ``top_k``
    largest sources — the "is one crawl eating the mixture"
    monitoring companion of temperature_mix / stratified_cap.

    One |sources|-bounded exact count; both statistics fold
    driver-side over the (count desc, source) sorted share list —
    exact int64 counts, pinned float chain, the same order the
    oracle's list_reduce replays. Null groups drop."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    counts = {
        r["g"]: int(r["c"])
        for r in sdf.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if not counts:
        raise ValueError("source_concentration: no non-null groups")
    n = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    hhi = 0.0
    for _, c in ordered:
        s = c / float(n)
        hhi = hhi + s * s
    top = sum(c for _, c in ordered[: int(top_k)])
    spark = sdf.sparkSession
    out = spark.createDataFrame(
        [(len(counts), n, round(hhi, round_dp),
          round(top / float(n), round_dp))],
        "n_sources int, n_docs bigint, hhi double, topk_share double",
    )
    return DaskFrame(out)


def contrastive_negatives(frame, id_col: str = "vec_id", k: int = 3,
                          salt: str = "neg"):
    """Deterministic negative sampling for contrastive training →
    DaskFrame(anchor_id, neg_rank, neg_id): negative j of anchor i is
    md5(salt:i:j) mod N over the DENSE id space (ids must be
    0..N−1 — the embeddings-table layout), bumped by one (mod N) on
    an anchor collision — so every (anchor, rank) resolves to the
    SAME partner on every engine/run/retry (a random sampler reshards
    the pairs every epoch, breaking caching and reproducibility).

    Map-only after one tiny count: N rides as a literal, the k
    negatives explode from a sequence — no shuffle, no join; the
    training pipeline equi-joins features afterwards."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import md5_prefix60

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    n = sdf.filter(F.col(id_col).isNotNull()).count()
    if n < 2:
        raise ValueError("contrastive_negatives: need >= 2 rows")
    base = sdf.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).cast("bigint").alias("anchor_id")
    )
    ranks = F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1)))
    staged = base.select("anchor_id", ranks.alias("neg_rank"))
    h = md5_prefix60(
        F.concat_ws(":", F.lit(salt), F.col("anchor_id"),
                    F.col("neg_rank"))
    )
    raw = F.pmod(h, F.lit(n))
    neg = F.when(
        raw == F.col("anchor_id"), F.pmod(raw + 1, F.lit(n))
    ).otherwise(raw)
    return DaskFrame(
        staged.select("anchor_id", "neg_rank",
                      neg.cast("bigint").alias("neg_id"))
    )
