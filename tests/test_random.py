"""da.random distribution family (reference: dask/array/random.py):
moment parity against closed-form theory, determinism, and
partitioning-invariance of the counter-based draws."""

import math

import numpy as np
import pytest

import pyspark.sql.functions as F

from dask_spark.random import RandomState


def _vals(arr) -> np.ndarray:
    pdf = arr._sdf.select(F.explode("values").alias("v")).toPandas()
    return pdf["v"].to_numpy(dtype=float)


N = 30_000

# (name, draw(rs), theoretical mean, theoretical var)
MOMENTS = [
    ("uniform", lambda rs: rs.uniform(2, 5, N), 3.5, 0.75),
    ("normal", lambda rs: rs.normal(1, 2, N), 1.0, 4.0),
    ("lognormal", lambda rs: rs.lognormal(0, 0.5, N),
     math.exp(0.125), (math.exp(0.25) - 1) * math.exp(0.25)),
    ("exponential", lambda rs: rs.exponential(2, N), 2.0, 4.0),
    ("rayleigh", lambda rs: rs.rayleigh(1, N),
     math.sqrt(math.pi / 2), (4 - math.pi) / 2),
    ("gumbel", lambda rs: rs.gumbel(0, 1, N),
     0.5772156649, math.pi ** 2 / 6),
    ("laplace", lambda rs: rs.laplace(0, 1, N), 0.0, 2.0),
    ("logistic", lambda rs: rs.logistic(0, 1, N), 0.0, math.pi ** 2 / 3),
    ("pareto", lambda rs: rs.pareto(3, N), 0.5, 0.75),
    ("power", lambda rs: rs.power(2, N), 2 / 3, 1 / 18),
    ("weibull", lambda rs: rs.weibull(2, N),
     math.gamma(1.5), math.gamma(2) - math.gamma(1.5) ** 2),
    ("triangular", lambda rs: rs.triangular(0, 1, 3, N), 4 / 3, 7 / 18),
    ("geometric", lambda rs: rs.geometric(0.3, N), 1 / 0.3, 0.7 / 0.09),
    ("poisson", lambda rs: rs.poisson(3.0, N), 3.0, 3.0),
    ("binomial", lambda rs: rs.binomial(20, 0.3, N), 6.0, 4.2),
    ("integers", lambda rs: rs.integers(5, 15, N), 9.5, (100 - 1) / 12),
]


def test_moment_parity(spark):
    rs = RandomState(spark, seed=42)
    for name, draw, mu, var in MOMENTS:
        v = _vals(draw(rs))
        assert len(v) == N, name
        se_mean = math.sqrt(var / N)
        assert abs(v.mean() - mu) < 6 * se_mean + 1e-9, (
            name, v.mean(), mu)
        # var tolerance: generous 10% (4th-moment SE varies by dist)
        assert abs(v.var() - var) < 0.1 * var + 1e-9, (name, v.var(), var)


def test_cauchy_quartiles(spark):
    """Cauchy has no moments — check median ≈ 0 and IQR ≈ 2 (the
    quartiles of standard Cauchy are ±1)."""
    v = _vals(RandomState(spark, seed=1).standard_cauchy(40_000))
    q1, q2, q3 = np.percentile(v, [25, 50, 75])
    assert abs(q2) < 0.05
    assert abs(q1 + 1) < 0.08 and abs(q3 - 1) < 0.08


def test_determinism_and_partitioning_invariance(spark):
    rs = RandomState(spark, seed=7)
    a = _vals(rs.uniform(0, 1, 2000, dim=3, npartitions=2))
    b = _vals(rs.uniform(0, 1, 2000, dim=3, npartitions=16))
    assert np.array_equal(a, b)  # bit-for-bit across partitionings
    c = _vals(RandomState(spark, seed=8).uniform(0, 1, 2000, dim=3))
    assert not np.array_equal(a, c)  # seed actually enters the mix


def test_uniform_bounds_and_integers_support(spark):
    rs = RandomState(spark, seed=3)
    u = _vals(rs.uniform(-2, -1, 5000))
    assert u.min() >= -2 and u.max() <= -1
    z = _vals(rs.integers(5, 15, 5000))
    assert set(np.unique(z)) <= set(float(x) for x in range(5, 15))
    assert len(np.unique(z)) == 10


def test_poisson_pmf_shape(spark):
    lam = 3.0
    v = _vals(RandomState(spark, seed=11).poisson(lam, 20_000))
    assert v.min() >= 0
    counts = np.bincount(v.astype(int), minlength=10) / len(v)
    pmf = [math.exp(-lam) * lam ** k / math.factorial(k) for k in range(10)]
    assert np.abs(counts[:10] - pmf).max() < 0.01


def test_binomial_edges(spark):
    rs = RandomState(spark, seed=2)
    assert set(_vals(rs.binomial(10, 0.0, 100))) == {0.0}
    assert set(_vals(rs.binomial(10, 1.0, 100))) == {10.0}
    v = _vals(rs.binomial(20, 0.3, 5000))
    assert v.min() >= 0 and v.max() <= 20


def test_choice_weighted_and_uniform(spark):
    rs = RandomState(spark, seed=5)
    v = _vals(rs.choice([10, 20, 30, 40], n=20_000,
                        p=[0.1, 0.2, 0.3, 0.4]))
    assert set(np.unique(v)) == {10.0, 20.0, 30.0, 40.0}
    frac = {x: (v == x).mean() for x in (10.0, 20.0, 30.0, 40.0)}
    for x, w in zip((10.0, 20.0, 30.0, 40.0), (0.1, 0.2, 0.3, 0.4)):
        assert abs(frac[x] - w) < 0.02
    u = _vals(rs.choice(5, n=10_000))  # int a → range(a), unweighted
    assert set(np.unique(u)) == {0.0, 1.0, 2.0, 3.0, 4.0}


def test_choice_without_replacement(spark):
    rs = RandomState(spark, seed=9)
    v = _vals(rs.choice(list(range(100)), n=30, replace=False))
    assert len(v) == 30 and len(set(v)) == 30
    assert set(v) <= set(float(x) for x in range(100))
    v2 = _vals(RandomState(spark, seed=9).choice(
        list(range(100)), n=30, replace=False))
    assert np.array_equal(v, v2)  # seeded: reproducible
    with pytest.raises(ValueError):
        rs.choice([1, 2], n=5, replace=False)


def test_permutation(spark):
    rs = RandomState(spark, seed=3)
    out = rs.permutation(5000)
    pdf = out._sdf.select(
        "row_id", F.element_at("values", 1).alias("v")
    ).toPandas().sort_values("row_id")
    vals = pdf["v"].to_numpy(dtype=float)
    assert sorted(vals) == [float(i) for i in range(5000)]  # a permutation
    assert not np.array_equal(vals, np.arange(5000.0))      # actually mixed
    again = rs.permutation(5000)._sdf.select(
        "row_id", F.element_at("values", 1).alias("v")
    ).toPandas().sort_values("row_id")["v"].to_numpy(dtype=float)
    assert np.array_equal(vals, again)


def test_choice_weighted_without_replacement(spark):
    """Efraimidis–Spirakis weighted sample without replacement:
    distinct draws from the population, seeded-reproducible, and
    high-weight items dominate inclusion frequency across seeds."""
    pop = list(range(20))
    w = [100.0 if i < 2 else 1.0 for i in pop]
    w = [x / sum(w) for x in w]  # numpy requires sum(p) == 1
    v = _vals(RandomState(spark, seed=4).choice(
        pop, n=5, replace=False, p=w))
    assert len(v) == 5 and len(set(v)) == 5
    assert set(v) <= set(float(x) for x in pop)
    v2 = _vals(RandomState(spark, seed=4).choice(
        pop, n=5, replace=False, p=w))
    assert np.array_equal(v, v2)
    hits = 0
    for seed in range(40):
        s = _vals(RandomState(spark, seed=seed).choice(
            pop, n=5, replace=False, p=w))
        hits += (0.0 in s) + (1.0 in s)
    # P(high-weight item in sample) ~ 1 under 100:1 weights
    assert hits >= 70, hits
    with pytest.raises(ValueError):
        RandomState(spark, seed=0).choice(
            pop, n=5, replace=False, p=[-1.0] * 20)
    with pytest.raises(ValueError):
        RandomState(spark, seed=0).choice(
            pop, n=5, replace=False, p=[1.0] + [0.0] * 19)
    with pytest.raises(ValueError, match="sum"):  # numpy error contract
        RandomState(spark, seed=0).choice(
            pop, n=5, replace=False, p=[1.0] * 20)
    with pytest.raises(ValueError, match="sum"):
        RandomState(spark, seed=0).choice(
            pop, n=5, replace=True, p=[1.0] * 20)


def test_permutation_of_darray(spark):
    """Permuting an existing collection (reference random.py:301 →
    shuffle_slice): values are a permutation of the input along axis
    0, placement matches permutation(n)'s id map exactly, and the
    draw is seeded-reproducible."""
    rs = RandomState(spark, seed=11)
    base = rs.uniform(0, 1, 800, dim=2)
    bvals = _vals(base).reshape(800, 2)
    out = rs.permutation(base)
    pdf = out._sdf.select("row_id", "values").toPandas()
    pdf = pdf.sort_values("row_id")
    got = np.array([list(v) for v in pdf["values"]])
    assert sorted(map(tuple, got)) == sorted(map(tuple, bvals))
    # exact placement: out[dst] = base[perm[dst]]
    perm = RandomState(spark, seed=11).permutation(800)
    pp = perm._sdf.select(
        "row_id", F.element_at("values", 1).alias("v")
    ).toPandas().sort_values("row_id")
    idx = pp["v"].to_numpy(dtype=int)
    assert np.array_equal(got, bvals[idx])
    # NDArray round-trip keeps the inner shape
    nd = rs.chisquare(3.0, n=(60, 2, 2))
    pnd = rs.permutation(nd)
    assert pnd.inner_shape == (2, 2)
    a = np.asarray(nd.compute()).reshape(60, -1)
    b = np.asarray(pnd.compute()).reshape(60, -1)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


NR = 12_000

# Kernel rejection family: (name, draw, mean, var) — same moment
# harness as the closed-form family, tighter N (kernel draws cost a
# Python batch per partition).
REJECTION_MOMENTS = [
    ("gamma", lambda rs: rs.gamma(2.0, 1.5, NR), 3.0, 4.5),
    ("gamma_sub1", lambda rs: rs.gamma(0.4, 1.0, NR), 0.4, 0.4),
    ("standard_gamma", lambda rs: rs.standard_gamma(3.0, NR), 3.0, 3.0),
    ("beta", lambda rs: rs.beta(2.0, 5.0, NR), 2 / 7,
     (2 * 5) / (49 * 8)),
    ("chisquare", lambda rs: rs.chisquare(4.0, NR), 4.0, 8.0),
    ("standard_t", lambda rs: rs.standard_t(8.0, NR), 0.0, 8 / 6),
    ("f", lambda rs: rs.f(6.0, 12.0, NR), 12 / 10,
     2 * 12 ** 2 * 16 / (6 * 10 ** 2 * 8)),
    ("noncentral_chisquare",
     lambda rs: rs.noncentral_chisquare(3.0, 2.0, NR), 5.0, 14.0),
    ("noncentral_chisquare_sub1",
     lambda rs: rs.noncentral_chisquare(0.5, 2.0, NR), 2.5, 9.0),
    ("negative_binomial",
     lambda rs: rs.negative_binomial(4.0, 0.4, NR), 6.0, 15.0),
    ("wald", lambda rs: rs.wald(2.0, 3.0, NR), 2.0, 8 / 3),
    ("logseries", lambda rs: rs.logseries(0.5, NR),
     -0.5 / (0.5 * math.log(0.5)),
     -0.5 * (0.5 + math.log(0.5)) / (0.5 * math.log(0.5)) ** 2),
    ("hypergeometric",
     lambda rs: rs.hypergeometric(10, 20, 9, NR), 3.0,
     9 * (10 / 30) * (20 / 30) * (21 / 29)),
]


def test_rejection_family_moments(spark):
    rs = RandomState(spark, seed=42)
    for name, draw, mu, var in REJECTION_MOMENTS:
        v = _vals(draw(rs))
        assert len(v) == NR, name
        se_mean = math.sqrt(var / NR)
        assert abs(v.mean() - mu) < 6 * se_mean + 1e-9, (
            name, v.mean(), mu)
        assert abs(v.var() - var) < 0.12 * var + 1e-9, (name, v.var(), var)


def test_rejection_family_support(spark):
    rs = RandomState(spark, seed=9)
    assert _vals(rs.gamma(0.3, 1.0, 4000)).min() > 0
    b = _vals(rs.beta(0.5, 0.5, 4000))
    assert b.min() > 0 and b.max() < 1
    z = _vals(rs.zipf(3.0, 20_000))
    assert z.min() >= 1 and np.array_equal(z, np.floor(z))
    # zipf pmf head: P(1) = 1/zeta(3)
    assert abs((z == 1).mean() - 0.8319) < 0.02
    v = _vals(rs.vonmises(0.5, 2.0, 20_000))
    assert v.min() >= -math.pi and v.max() <= math.pi
    circ = math.atan2(np.sin(v).mean(), np.cos(v).mean())
    assert abs(circ - 0.5) < 0.05
    w = _vals(rs.wald(2.0, 3.0, 4000))
    assert w.min() > 0


def test_rejection_family_invariance(spark):
    """Kernel draws keep the counter contract: bit-identical across
    partitionings and between repeated runs; seed enters the mix."""
    rs = RandomState(spark, seed=7)
    a = _vals(rs.gamma(2.0, 1.0, 3000, npartitions=2))
    b = _vals(rs.gamma(2.0, 1.0, 3000, npartitions=16))
    assert np.array_equal(a, b)
    c = _vals(RandomState(spark, seed=8).gamma(2.0, 1.0, 3000))
    assert not np.array_equal(a, c)
    t1 = _vals(rs.standard_t(5.0, 1500, npartitions=3))
    t2 = _vals(rs.standard_t(5.0, 1500, npartitions=11))
    assert np.array_equal(t1, t2)


def test_multinomial(spark):
    rs = RandomState(spark, seed=5)
    arr = rs.multinomial(20, [0.2, 0.3, 0.5], n=2500)
    rows = arr._sdf.select("row_id", "values").collect()
    m = np.array([r["values"] for r in rows])
    assert m.shape == (2500, 3)
    assert (m.sum(axis=1) == 20).all()
    assert np.allclose(m.mean(axis=0), [4.0, 6.0, 10.0], atol=0.3)
    with pytest.raises(ValueError):
        rs.multinomial(20, [0.5, 0.6], n=10)
    with pytest.raises(ValueError):
        rs.multinomial(20_001, [0.5, 0.5], n=10)


def test_rejection_family_validation(spark):
    rs = RandomState(spark, seed=0)
    with pytest.raises(ValueError):
        _vals(rs.gamma(-1.0, 1.0, 100))
    with pytest.raises(ValueError):
        rs.zipf(1.0, 100)._sdf.collect()
    with pytest.raises(ValueError):
        rs.negative_binomial(3.0, 0.0, 100)
    with pytest.raises(ValueError):
        rs.wald(-1.0, 1.0, 100)
    with pytest.raises(ValueError):
        rs.logseries(0.999, 100)  # cap points at the kernel path
    with pytest.raises(ValueError):
        rs.hypergeometric(10_000, 10_000, 9000, 100)  # support cap
    with pytest.raises(ValueError):
        rs.hypergeometric(3, 3, 10, 100)


def test_poisson_ptrs_large_rate(spark):
    """PTRS kernel branch (lam >= 10): moments, integer support,
    partitioning invariance — and the compositions that used to crash
    past the old exp(-lam) recurrence cap (negative_binomial's
    gamma-Poisson mixture draws lam ~ nsucc(1-p)/p with an unbounded
    gamma tail; the public poisson routes lam > 1000 here too)."""
    rs = RandomState(spark, seed=13)
    for lam, nn in ((50.0, 20_000), (5000.0, 8000)):
        v = _vals(rs.poisson(lam, nn))
        assert np.array_equal(v, np.floor(v)) and v.min() >= 0
        assert abs(v.mean() - lam) < 6 * math.sqrt(lam / nn)
        assert abs(v.var() - lam) < 0.1 * lam
    a = _vals(rs.poisson(5000.0, 3000, npartitions=2))
    b = _vals(rs.poisson(5000.0, 3000, npartitions=16))
    assert np.array_equal(a, b)
    # nsucc=600, p=0.5: mixture rate ~ Gamma(600) — mean 600, 4-sigma
    # excursions past 700 were a stochastic ValueError before PTRS
    nb = _vals(rs.negative_binomial(600.0, 0.5, 8000))
    assert abs(nb.mean() - 600.0) < 6 * math.sqrt(1200.0 / 8000) + 2.0
    assert abs(nb.var() - 1200.0) < 0.12 * 1200.0


def test_parameter_validation(spark):
    rs = RandomState(spark, seed=0)
    with pytest.raises(ValueError):
        rs.geometric(0.0)
    # lam > 1000 routes to the PTRS kernel (no literal-CDF raise);
    # the literal helper itself still enforces its O(lam) cap
    with pytest.raises(ValueError):
        RandomState.poisson_cdf(2000.0)
    with pytest.raises(ValueError):
        rs.binomial(5000, 0.5)
    with pytest.raises(ValueError):
        rs.integers(5, 5)
    with pytest.raises(ValueError):
        rs.choice([])


def test_size_tuple_forms(spark):
    """dask-style size tuples: (n,) / (n, d) give DArrays, an N-tuple
    gives an NDArray with the trailing axes inner — identical draws to
    the flat form (the counter never sees the shape)."""
    from dask_spark.ndarray import NDArray

    rs = RandomState(spark, seed=6)
    flat = _vals(rs.uniform(0, 1, 120, dim=12))
    shaped = rs.uniform(0, 1, (120, 3, 4))
    assert isinstance(shaped, NDArray)
    assert shaped.inner_shape == (3, 4)
    got = np.asarray(shaped.compute()).reshape(120 * 12)
    assert np.array_equal(got, flat)
    two = rs.normal(0, 1, (50, 5))
    assert two._sdf.count() == 50
    one = rs.poisson(2.0, (30,))
    assert len(_vals(one)) == 30


def test_poisson_underflow_band_routes_to_kernel(spark):
    """lam in (700, 1000] used to build an all-zero CDF literal
    (exp(-lam) underflow) that returned a constant for every draw —
    now routed to PTRS like any large rate."""
    rs = RandomState(spark, seed=3)
    v = _vals(rs.poisson(800.0, 8000))
    assert v.std() > 0  # the broken path returned one constant
    assert abs(v.mean() - 800.0) < 6 * math.sqrt(800.0 / 8000)
    assert abs(v.var() - 800.0) < 0.1 * 800.0
    with pytest.raises(ValueError):
        RandomState.poisson_cdf(800.0)
