"""Scale smoke: run the machinery most sensitive to partition count —
keyless prefix scan, global sort, hash agg — at 5M rows (≈50× the
bench documents table, 8× lineitem sf0.1) against CLOSED-FORM
expected values. Catches anything that silently degrades to a
single-partition plan or loses rows across bucket boundaries when the
data no longer fits one task comfortably."""

from __future__ import annotations

import pyspark.sql.functions as F

N = 5_000_000
MOD = 97
CYCLE = MOD * (MOD - 1) // 2  # sum of 0..96


def _frame(spark):
    from dask_spark.frame import DaskFrame

    sdf = spark.range(N).select(
        "id", (F.col("id") % MOD).cast("double").alias("v")
    )
    return DaskFrame(sdf)


def _closed_prefix(idx: int) -> float:
    """sum_{i<=idx} (i % MOD), exact."""
    full, rem = divmod(idx + 1, MOD)
    return float(full * CYCLE + rem * (rem - 1) // 2)


def test_keyless_cumsum_5m_closed_form(spark):
    from dask_spark.operators.window import cumulative

    out = cumulative(_frame(spark), "v", "sum", order_by="id", out="run")
    probes = [0, 12_345, 2_000_000, N - 1]
    got = {
        r["id"]: r["run"]
        for r in out.to_spark().filter(F.col("id").isin(probes)).collect()
    }
    assert got == {p: _closed_prefix(p) for p in probes}
    # plan sanity: the scan actually split into many partitions
    assert out.npartitions > 1


def test_global_sort_and_agg_5m(spark):
    f = _frame(spark)
    head = f.sort_values(["v", "id"]).head_frame(3).compute()
    assert list(head["id"]) == [0, MOD, 2 * MOD]  # v == 0 rows in id order
    total = f.groupby("v").size().compute()
    assert len(total) == MOD
    assert int(total["size"].sum()) == N


def test_ndarray_axis0_reduce_5m(spark):
    """N-D axis-0 mean at 5M rows × dim 8 against the closed form:
    component j holds (id % MOD + j) so mean_j = mean(id % MOD) + j.
    Verifies the posexplode+groupBy(position) path map-combines rather
    than funneling rows anywhere."""
    from dask_spark.ndarray import NDArray

    sdf = spark.range(N).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: ((F.col("id") % MOD) + j).cast("double"),
        ).alias("block"),
    )
    nd = NDArray(sdf, (8,), "block", "id")
    got = nd.mean(0).compute()[0]
    full, rem = divmod(N, MOD)
    mean_mod = (full * CYCLE + rem * (rem - 1) // 2) / N
    for j in range(8):
        assert abs(got[j] - (mean_mod + j)) < 1e-9


def test_classifier_scores_5m_closed_form(spark):
    """Linear classifier inference at 5M synthetic one-token docs:
    every doc's score is bias + weights[hash(token) % D] exactly, and
    the plan is map-only (no exchange before the final collect)."""
    import hashlib

    from dask_spark.functions.text import hashed_linear_scores

    D = 8
    W = [[float(f) for f in range(D)]]
    sdf = spark.range(N).select(
        "id", F.concat(F.lit("tok"), (F.col("id") % 10).cast("string")).alias("text")
    )
    out = hashed_linear_scores(sdf, W, [1.0], labels=["q"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {
        r["id"]: r["score_q"]
        for r in out.filter(F.col("id").isin([0, 9, 4_999_999])).collect()
    }
    for i, s in got.items():
        tok = f"tok{i % 10}"
        f = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % D
        assert s == 1.0 + W[0][f]


def test_random_family_5m_moments(spark):
    """da.random at 5M draws: the counter mix is map-only — means
    must land within 5 SE of theory and the draw must be identical
    under a different partitioning (rechunk invariance at volume)."""
    import math

    from dask_spark.random import RandomState

    rs = RandomState(spark, seed=99)
    u = rs.uniform(2.0, 5.0, n=N, npartitions=32)
    row = u._sdf.select(
        F.avg(F.element_at("values", 1)).alias("m"),
        F.var_pop(F.element_at("values", 1)).alias("v"),
    ).first()
    se = math.sqrt(0.75 / N)
    assert abs(row["m"] - 3.5) < 5 * se
    assert abs(row["v"] - 0.75) < 0.01
    # partitioning invariance at volume: same checksum on 7 partitions
    def cksum(arr):
        h = F.xxhash64(F.round(F.element_at("values", 1), 9),
                       F.col("row_id"))
        # bound each term so a 5M-row ANSI sum cannot overflow bigint
        return arr._sdf.select(F.sum(F.pmod(h, F.lit(10 ** 12)))).first()[0]

    assert cksum(u) == cksum(rs.uniform(2.0, 5.0, n=N, npartitions=7))


def test_permutation_1m_is_exact_permutation(spark):
    """permutation(1M): distributed key-bucket path must emit every
    value exactly once with positions 0..n-1 (closed-form sums)."""
    from dask_spark.random import RandomState

    n = 1_000_000
    out = RandomState(spark, seed=4).permutation(n, npartitions=32)
    row = out._sdf.select(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.element_at("values", 1)).alias("sv"),
        F.sum("row_id").alias("sp"),
        F.count_distinct(F.element_at("values", 1)).alias("dv"),
    ).first()
    want = n * (n - 1) // 2
    assert row["cnt"] == n and row["dv"] == n
    assert int(row["sv"]) == want and int(row["sp"]) == want


def test_ufunc_routines_5m_closed_form(spark):
    """Module-level ufuncs/routines at 5M rows with closed-form
    expectations: sin^2+cos^2 == 1 everywhere (one map-only pass),
    searchsorted buckets count exactly, and the ediff1d machinery's
    keyless diff shape survives the scale (the per-row diff of
    id % MOD is 1 except at cycle resets)."""
    import dask_spark.array as da

    f = _frame(spark)
    one = da.add(da.square(da.sin(f.v)), da.square(da.cos(f.v)))
    row = one._frame._sdf.select(
        F.min(one._expr).alias("lo"), F.max(one._expr).alias("hi")
    ).first()
    assert abs(row["lo"] - 1.0) < 1e-12 and abs(row["hi"] - 1.0) < 1e-12

    # searchsorted 'left': count of bins STRICTLY below v, so v==10
    # still lands in bucket 0 — buckets are v<=10, 10<v<=50, v>50
    ss = da.searchsorted([10.0, 50.0], f.v)
    counts = (
        ss._frame._sdf.select(ss._expr.alias("b"))
        .groupBy("b").count().orderBy("b").collect()
    )
    per_cycle = {0.0: 11, 1.0: 40, 2.0: MOD - 51}
    starts = {0.0: 0, 1.0: 11, 2.0: 51}
    full = N // MOD
    rem = N % MOD  # last partial cycle holds v = 0..rem-1
    exp = {
        b: full * c + min(max(0, rem - starts[b]), c)
        for b, c in per_cycle.items()
    }
    got = {r["b"]: r["count"] for r in counts}
    assert got == exp, (got, exp)


def test_chunked_transpose_1m_tiles(spark):
    """Chunked-inner transpose at 125k rows x (8, 8) = 8M elements
    (2 tiles/row): the one-shuffle rechunk stays exact — closed-form
    check of out[i, j] == in[j, i] at probe positions."""
    from dask_spark.chunked import ChunkedNDArray
    from dask_spark.frame import DaskFrame

    n = 125_000
    sdf = spark.range(n).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda p: F.col("id").cast("double") * 64 + p.cast("double"),
        ).alias("vec"),
    )
    from dask_spark.ndarray import NDArray

    nd = NDArray.from_vectors(DaskFrame(sdf), "vec", 64, "id").reshape(8, 8)
    t = ChunkedNDArray.from_ndarray(nd, chunks=2).transpose(out_chunks=2)
    ex = t.explode()
    probes = ex.to_spark().filter(
        (F.col("row_id").isin([0, 62_500, n - 1]))
        & (F.col("pos").isin([0, 9, 17, 63]))
    ).collect()
    # out flat pos p of row r: value = r*64 + (p%8)*8 + p//8
    for row in probes:
        r, p, v = row["row_id"], row["pos"], row["val"]
        assert v == r * 64 + (p % 8) * 8 + p // 8, row


def test_substring_dedup_200k_closed_form(spark):
    """Alignment-free substring scrub at 200k docs / ~5.6M tokens with
    a PLANTED 12-token passage shared by every 100th doc at token
    offset 8: exactly the 5 interior 8-windows duplicate, the island
    merge must recover the full [8, 20) span, and every planted doc
    loses exactly 12 tokens while all others lose none. Verifies the
    window count map-combines and the position exchange carries only
    the duplicated fraction at scale."""
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.dedup import substring_dedup

    n = 200_000
    shared = " ".join(f"s{i}" for i in range(12))
    uid = F.col("id").cast("string")
    # 8 doc-unique prefix tokens + 12 shared-or-unique + 8 unique tail
    pre = F.concat_ws(
        " ", *[F.concat(F.lit(f"p{j}x"), uid) for j in range(8)]
    )
    tail = F.concat_ws(
        " ", *[F.concat(F.lit(f"t{j}x"), uid) for j in range(8)]
    )
    mid = F.when(F.col("id") % 100 == 0, F.lit(shared)).otherwise(
        F.concat_ws(
            " ", *[F.concat(F.lit(f"m{j}x"), uid) for j in range(12)]
        )
    )
    sdf = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", pre, mid, tail).alias("text"),
    )
    out = substring_dedup(
        DaskFrame(sdf), window_tokens=8, window_hash="xxhash64"
    ).to_spark()
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_removed").alias("removed"),
        F.sum((F.col("n_removed") == 12).cast("int")).alias("hit12"),
        F.sum((F.col("n_removed") == 0).cast("int")).alias("hit0"),
        F.min("n_tokens").alias("mintok"),
    ).first()
    planted = n // 100
    assert agg["rows"] == n
    assert agg["hit12"] == planted and agg["hit0"] == n - planted
    assert agg["removed"] == 12 * planted
    assert agg["mintok"] == 28


def test_round11b_scan_machinery_2m_closed_form(spark):
    """The continuation's prefix-scan consumers at 2M rows against
    closed forms: exact weighted median of id%97 (uniform weights) is
    48; Gini over equal per-key totals is exactly 0; Spearman of a
    column against itself is exactly 1; KS of a distribution against
    itself is exactly 0."""
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.monitor import gini_coefficient, ks_drift
    from dask_spark.operators.reductions import (spearman_corr,
                                                 weighted_quantiles)

    n = 97 * 20_000  # divisible by 97: every key equally frequent
    sdf = spark.range(n).select(
        "id",
        (F.col("id") % 97).cast("double").alias("v"),
        F.lit(1.0).alias("w"),
    )

    wq = weighted_quantiles(
        DaskFrame(sdf), "v", "w", qs=(0.5,)
    ).to_spark().first()
    assert wq["wq_5"] == 48.0

    gi = gini_coefficient(
        sdf.select((F.col("id") % 97).alias("k"), F.lit(10.0).alias("x")),
        "x", "k",
    ).to_spark().first()
    assert gi["gini"] == 0.0 and gi["n_keys"] == 97

    rho = spearman_corr(sdf, "v", "v").to_spark().first()
    assert rho["rho"] == 1.0

    half = sdf.filter(F.col("id") < n // 2)
    other = sdf.filter(F.col("id") >= n // 2)
    ks = ks_drift(half, other, "v").to_spark().first()
    # same uniform-97 distribution on both halves (counts differ by
    # at most the partial cycle): D is tiny but n1*n2-scaled exact
    assert ks["d_stat"] < 0.001
