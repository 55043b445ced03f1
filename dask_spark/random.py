"""``da.random`` distribution family (reference: dask/array/random.py
— the RandomState/Generator surface, 1,113 lines wrapping one numpy
bitgen per chunk).

Spark-first re-expression: every draw is a STATELESS counter-based
function of (row, dim, stream, seed) — two LCG mixing rounds producing
a uniform in (0,1), then a closed-form inverse-CDF transform — built
as plain Column expressions over ``spark.range``. Map-only, no RNG
state, no shuffle, and partitioning-INVARIANT: dask's per-chunk bitgen
spawning makes results depend on the chunking; the counter design is
strictly stronger (rechunk never changes values) and lets a SQL oracle
replay any draw bit-for-bit (see queries.py arr_random_*).

Discrete distributions with no closed-form inverse (poisson, binomial)
precompute their CDF as DRIVER literals (the parameters are scalars)
and lower the draw to a searchsorted count — codegen'd comparison
chain, O(support) per element, same lowering as Series.searchsorted.

Distributions that genuinely need rejection sampling (gamma, beta,
chisquare, f, t, vonmises, wald …) raise NotImplementedError with the
composition to use instead — matching the brief's honesty contract
rather than shipping a biased approximation.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column

from dask_spark.array import DArray, _counter_uniform

_M31 = (1 << 31) - 1
_TWO_PI = 2.0 * math.pi


def _py_uniform(i: int, j: int, k: int, seed: int) -> float:
    """Driver-side replica of _counter_uniform — same integer mix, so
    driver decisions (choice without replacement) reproduce engine
    draws exactly."""
    x = (
        (i & _M31) * 1103515245 + (i >> 31) * 98765431
        + ((j * 12345 + k * 1013904223 + (seed & _M31) * 2654435761) & _M31)
    ) & _M31
    x ^= x >> 16
    x = (x * 69069) & _M31
    x ^= x >> 13
    x = (x * 1103515245) & _M31
    x ^= x >> 16
    return (x + 0.5) / (_M31 + 1)


def counter_uniform_sql(i: str, j, k: int, seed: int) -> str:
    """DuckDB SQL twin of _counter_uniform — lets every oracle replay
    engine draws bit-for-bit (queries.py arr_random_*). ``j`` may be an
    int or a SQL expression (a dim column from range(dim))."""
    base = (k * 1013904223 + (seed & _M31) * 2654435761) & _M31
    if isinstance(j, int):
        add = str((j * 12345 + base) & _M31)
    else:
        add = f"((({j}) * 12345 + {base}) & 2147483647)"
    x = (f"((({i} & 2147483647) * 1103515245 + ({i} >> 31) * 98765431 "
         f"+ {add}) & 2147483647)")
    x = f"xor({x}, {x} >> 16)"
    x = f"(({x} * 69069) & 2147483647)"
    x = f"xor({x}, {x} >> 13)"
    x = f"(({x} * 1103515245) & 2147483647)"
    x = f"xor({x}, {x} >> 16)"
    return f"(({x} + 0.5) / 2147483648.0)"


class RandomState:
    """Seeded distribution source producing (n, dim) DArrays
    (reference: dask/array/random.py RandomState). ``dim=1`` gives the
    1-D column-vector form every DArray reduction understands."""

    def __init__(self, spark, seed: int = 0):
        self._spark = spark
        self._seed = int(seed)

    # ---- plumbing -----------------------------------------------------
    def _range(self, n: int, npartitions: int | None):
        return self._spark.range(
            0, n, 1,
            npartitions or self._spark.sparkContext.defaultParallelism,
        )

    @staticmethod
    def _parse_size(n, dim: int):
        """dask-style ``size``: (rows,) or (rows, dim) → flat draw;
        an N-tuple also returns the trailing inner shape so the caller
        can reshape to an NDArray."""
        inner = None
        if isinstance(n, (tuple, list)):
            size = tuple(int(s) for s in n)
            if len(size) == 0:
                raise ValueError("empty size")
            n = size[0]
            dim = math.prod(size[1:]) if len(size) > 1 else 1
            if len(size) > 2:
                inner = size[1:]
        return n, dim, inner

    def _draw(self, n, dim: int, fn, npartitions: int | None = None
              ) -> DArray:
        """fn(id_column, stream_j) -> Column; one stream per dim.
        ``n`` may be a dask-style ``size`` tuple: (rows,) or
        (rows, dim) produce the usual DArray; an N-tuple returns an
        NDArray with the trailing axes as the inner shape (the draws
        are identical to the flat (rows, prod(inner)) form — the
        counter never sees the shape)."""
        n, dim, inner = self._parse_size(n, dim)
        rng = self._range(n, npartitions)
        idc = F.col("id")
        comps = [fn(idc, j) for j in range(dim)]
        sdf = rng.select(
            F.col("id").alias("row_id"), F.array(*comps).alias("values")
        )
        out = DArray(sdf, "values", "row_id")
        if inner is not None:
            from dask_spark.ndarray import NDArray

            return NDArray.from_darray(out, math.prod(inner)).reshape(inner)
        return out

    def _u(self, idc, j: int, k: int = 0) -> Column:
        return _counter_uniform(idc, j, k, self._seed)

    # ---- continuous closed-form inverses ------------------------------
    def random_sample(self, n: int, dim: int = 1,
                      npartitions: int | None = None) -> DArray:
        return self._draw(n, dim, lambda i, j: self._u(i, j), npartitions)

    random = random_sample
    rand = random_sample

    def uniform(self, low: float = 0.0, high: float = 1.0, n: int = 1,
                dim: int = 1, npartitions: int | None = None) -> DArray:
        lo, span = float(low), float(high) - float(low)
        return self._draw(
            n, dim,
            lambda i, j: F.lit(lo) + F.lit(span) * self._u(i, j),
            npartitions,
        )

    def normal(self, loc: float = 0.0, scale: float = 1.0, n: int = 1,
               dim: int = 1, npartitions: int | None = None) -> DArray:
        """Box–Muller over two independent streams per element — the
        exact transform random_normal (array.py) ships; loc/scale are
        an affine map on top."""

        def z(i, j):
            u1, u2 = self._u(i, j, 0), self._u(i, j, 1)
            return F.lit(loc) + F.lit(scale) * (
                F.sqrt(F.lit(-2.0) * F.log(u1))
                * F.cos(F.lit(_TWO_PI) * u2)
            )

        return self._draw(n, dim, z, npartitions)

    def standard_normal(self, n: int, dim: int = 1,
                        npartitions: int | None = None) -> DArray:
        return self.normal(0.0, 1.0, n, dim, npartitions)

    def lognormal(self, mean: float = 0.0, sigma: float = 1.0, n: int = 1,
                  dim: int = 1, npartitions: int | None = None) -> DArray:
        def z(i, j):
            u1, u2 = self._u(i, j, 0), self._u(i, j, 1)
            g = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(_TWO_PI) * u2)
            return F.exp(F.lit(mean) + F.lit(sigma) * g)

        return self._draw(n, dim, z, npartitions)

    def exponential(self, scale: float = 1.0, n: int = 1, dim: int = 1,
                    npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.lit(-float(scale)) * F.log(self._u(i, j)),
            npartitions,
        )

    def standard_exponential(self, n: int, dim: int = 1,
                             npartitions: int | None = None) -> DArray:
        return self.exponential(1.0, n, dim, npartitions)

    def rayleigh(self, scale: float = 1.0, n: int = 1, dim: int = 1,
                 npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.lit(float(scale))
            * F.sqrt(F.lit(-2.0) * F.log(self._u(i, j))),
            npartitions,
        )

    def standard_cauchy(self, n: int, dim: int = 1,
                        npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.tan(F.lit(math.pi) * (self._u(i, j) - F.lit(0.5))),
            npartitions,
        )

    def gumbel(self, loc: float = 0.0, scale: float = 1.0, n: int = 1,
               dim: int = 1, npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.lit(loc)
            - F.lit(scale) * F.log(-F.log(self._u(i, j))),
            npartitions,
        )

    def laplace(self, loc: float = 0.0, scale: float = 1.0, n: int = 1,
                dim: int = 1, npartitions: int | None = None) -> DArray:
        def z(i, j):
            u = self._u(i, j) - F.lit(0.5)
            return F.lit(loc) - F.lit(scale) * F.signum(u) * F.log(
                F.lit(1.0) - F.lit(2.0) * F.abs(u)
            )

        return self._draw(n, dim, z, npartitions)

    def logistic(self, loc: float = 0.0, scale: float = 1.0, n: int = 1,
                 dim: int = 1, npartitions: int | None = None) -> DArray:
        def z(i, j):
            u = self._u(i, j)
            return F.lit(loc) + F.lit(scale) * F.log(u / (F.lit(1.0) - u))

        return self._draw(n, dim, z, npartitions)

    def pareto(self, a: float, n: int = 1, dim: int = 1,
               npartitions: int | None = None) -> DArray:
        """numpy pareto is the Lomax: (1-u)^(-1/a) - 1."""
        return self._draw(
            n, dim,
            lambda i, j: F.pow(F.lit(1.0) - self._u(i, j), F.lit(-1.0 / a))
            - F.lit(1.0),
            npartitions,
        )

    def power(self, a: float, n: int = 1, dim: int = 1,
              npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.pow(self._u(i, j), F.lit(1.0 / a)),
            npartitions,
        )

    def weibull(self, a: float, n: int = 1, dim: int = 1,
                npartitions: int | None = None) -> DArray:
        return self._draw(
            n, dim,
            lambda i, j: F.pow(-F.log(self._u(i, j)), F.lit(1.0 / a)),
            npartitions,
        )

    def triangular(self, left: float, mode: float, right: float, n: int = 1,
                   dim: int = 1, npartitions: int | None = None) -> DArray:
        l, m, r = float(left), float(mode), float(right)
        fc = (m - l) / (r - l)

        def z(i, j):
            u = self._u(i, j)
            lo = F.lit(l) + F.sqrt(u * F.lit((r - l) * (m - l)))
            hi = F.lit(r) - F.sqrt(
                (F.lit(1.0) - u) * F.lit((r - l) * (r - m))
            )
            return F.when(u < F.lit(fc), lo).otherwise(hi)

        return self._draw(n, dim, z, npartitions)

    def geometric(self, p: float, n: int = 1, dim: int = 1,
                  npartitions: int | None = None) -> DArray:
        """Trials to first success, support {1, 2, …}:
        floor(log(1-u)/log(1-p)) + 1."""
        if not 0.0 < p <= 1.0:
            raise ValueError("p must be in (0, 1]")
        if p == 1.0:
            return self._draw(n, dim, lambda i, j: F.lit(1.0), npartitions)
        return self._draw(
            n, dim,
            lambda i, j: F.floor(
                F.log(F.lit(1.0) - self._u(i, j)) / F.lit(math.log(1.0 - p))
            ).cast("double") + F.lit(1.0),
            npartitions,
        )

    # ---- integer draws ------------------------------------------------
    def integers(self, low: int, high: int | None = None, n: int = 1,
                 dim: int = 1, npartitions: int | None = None) -> DArray:
        """Uniform integers in [low, high) (numpy Generator.integers)."""
        if high is None:
            low, high = 0, low
        span = int(high) - int(low)
        if span <= 0:
            raise ValueError("high must exceed low")
        return self._draw(
            n, dim,
            lambda i, j: F.floor(self._u(i, j) * F.lit(float(span)))
            .cast("double") + F.lit(float(low)),
            npartitions,
        )

    randint = integers

    # ---- driver-CDF discrete draws ------------------------------------
    @staticmethod
    def poisson_cdf(lam: float) -> list[float]:
        """Driver-side CDF literals for Poisson(lam), truncated where
        the tail mass drops below 1e-12 (draws beyond the truncation
        clamp to the last bucket — probability < 1e-12)."""
        if lam <= 0:
            raise ValueError("lam must be positive")
        if lam > 1000:
            raise ValueError(
                "poisson with lam > 1000: the CDF literal has O(lam) "
                "terms — use normal(loc=lam, scale=sqrt(lam)) rounded, "
                "the standard large-lam approximation"
            )
        pmf = math.exp(-lam)
        cdf, acc, k = [], pmf, 0
        while acc < 1.0 - 1e-12 and k < lam + 12 * math.sqrt(lam) + 25:
            cdf.append(acc)
            k += 1
            pmf *= lam / k
            acc += pmf
        return cdf

    @staticmethod
    def binomial_cdf(trials: int, p: float) -> list[float]:
        """Threshold list cdf(0..trials-1): the draw is #{thresholds
        < u}, so at most ``trials`` entries keeps every draw inside
        the support. Log-space pmf recurrence: stable for all
        (trials, p); tail truncated below 1e-12 mass."""
        if not 0.0 <= p <= 1.0:
            raise ValueError("p must be in [0, 1]")
        if trials > 2000:
            raise ValueError(
                "binomial with n > 2000: the CDF literal has O(n) terms "
                "— use normal(loc=n*p, scale=sqrt(n*p*(1-p))) rounded"
            )
        if p == 0.0:
            return []               # always 0
        if p == 1.0:
            return [0.0] * trials   # always trials
        thresholds = []
        logpmf = trials * math.log1p(-p)
        acc = math.exp(logpmf)      # cdf(0)
        for k in range(trials):
            thresholds.append(acc)
            if acc >= 1.0 - 1e-12:
                break
            logpmf += (
                math.log(trials - k) - math.log(k + 1)
                + math.log(p) - math.log1p(-p)
            )
            acc = min(1.0, acc + math.exp(logpmf))
        return thresholds

    @staticmethod
    def _searchsorted(u: Column, cdf: list[float]) -> Column:
        """k = #{cdf values < u} as a codegen comparison chain (the
        Series.searchsorted lowering) — the inverse-CDF draw for any
        driver-literal distribution."""
        expr = F.lit(0)
        for c in cdf:
            expr = expr + F.when(u > F.lit(c), 1).otherwise(0)
        return expr.cast("double")

    def poisson(self, lam: float = 1.0, n: int = 1, dim: int = 1,
                npartitions: int | None = None) -> DArray:
        cdf = self.poisson_cdf(float(lam))
        return self._draw(
            n, dim,
            lambda i, j: self._searchsorted(self._u(i, j), cdf),
            npartitions,
        )

    def binomial(self, trials: int, p: float, n: int = 1, dim: int = 1,
                 npartitions: int | None = None) -> DArray:
        cdf = self.binomial_cdf(int(trials), float(p))
        return self._draw(
            n, dim,
            lambda i, j: self._searchsorted(self._u(i, j), cdf),
            npartitions,
        )

    # ---- choice / permutation ----------------------------------------
    def choice(self, a, n: int = 1, dim: int = 1, replace: bool = True,
               p: list[float] | None = None,
               npartitions: int | None = None) -> DArray:
        """Sample from a literal population ``a`` (int → range(a), like
        numpy). With replacement: uniform index or weighted
        inverse-CDF, map-only. Without replacement: the population is
        driver data by contract — the draw replays the SAME counter
        mix driver-side (one key per element, take the n smallest), so
        engine and driver agree bit-for-bit."""
        vals = list(range(a)) if isinstance(a, int) else list(a)
        if not vals:
            raise ValueError("a must be non-empty")
        if not replace:
            if p is not None:
                raise NotImplementedError(
                    "weighted choice without replacement: compose "
                    "permutation over exponential(1/w) keys instead"
                )
            if n > len(vals):
                raise ValueError("cannot take more than len(a) without "
                                 "replacement")
            keyed = sorted(
                range(len(vals)),
                key=lambda i: _py_uniform(i, 0, 0, self._seed),
            )
            chosen = [float(vals[i]) for i in keyed[:n]]
            rng = self._range(n, npartitions)
            lit = F.array(*[F.lit(v) for v in chosen])
            sdf = rng.select(
                F.col("id").alias("row_id"),
                F.array(F.element_at(lit, F.col("id").cast("int") + 1))
                .alias("values"),
            )
            return DArray(sdf, "values", "row_id")
        arr_lit = F.array(*[F.lit(float(v)) for v in vals])
        if p is None:
            def idx(i, j):
                return F.floor(
                    self._u(i, j) * F.lit(float(len(vals)))
                ).cast("int")
        else:
            if len(p) != len(vals):
                raise ValueError("p length must match a")
            tot = float(sum(p))
            cdf, acc = [], 0.0
            for w in p[:-1]:
                acc += float(w) / tot
                cdf.append(acc)

            def idx(i, j):
                return self._searchsorted(self._u(i, j), cdf).cast("int")

        return self._draw(
            n, dim,
            lambda i, j: F.element_at(arr_lit, idx(i, j) + 1),
            npartitions,
        )

    def permutation(self, x, npartitions: int | None = None) -> DArray:
        """Random permutation (reference: dask/array/random.py
        permutation → shuffle_slice). int n → permuted arange(n).
        Fully distributed: each element draws one counter key; because
        the key is uniform in (0,1) BY CONSTRUCTION, the range bucket
        is just floor(key·nb) — balanced, deterministic, no quantile
        probe and no binary-search layers (the generic
        with_global_index path re-inlines a computed order key into
        every bucket comparison when its cache pin is gone — measured
        19s vs 2s at n=5000). One tiny per-bucket counts job bakes the
        offsets; the per-bucket window does the rest."""
        from pyspark.sql import Window

        if not isinstance(x, int):
            raise NotImplementedError(
                "permutation of an existing DArray: permute row ids "
                "with permutation(n) and join on id"
            )
        nb = (npartitions
              or self._spark.sparkContext.defaultParallelism or 2)
        rng = self._range(x, npartitions)
        keyed = rng.select(
            F.col("id"),
            _counter_uniform(F.col("id"), 0, 0, self._seed).alias("__key"),
        ).withColumn(
            "__pid", F.floor(F.col("__key") * F.lit(nb)).cast("int")
        )
        counts = {
            r["__pid"]: r["cnt"]
            for r in keyed.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        offsets, acc = [], 0
        for pid in sorted(counts):
            offsets.append((pid, acc))
            acc += counts[pid]
        off_df = self._spark.createDataFrame(
            offsets or [(0, 0)], "__pid int, __off long"
        )
        # id tiebreak: counter keys can collide (~n²/2³¹); without it
        # the position of colliding elements would be engine-dependent
        w = Window.partitionBy("__pid").orderBy("__key", "id")
        sdf = (
            keyed.join(F.broadcast(off_df), "__pid")
            .withColumn("row_id",
                        F.row_number().over(w) - 1 + F.col("__off"))
            .select("row_id",
                    F.array(F.col("id").cast("double")).alias("values"))
        )
        return DArray(sdf, "values", "row_id")

    # ---- honest refusals ---------------------------------------------
    def _rejection(self, name: str, hint: str):
        raise NotImplementedError(
            f"{name} needs rejection sampling (no closed-form inverse "
            f"CDF); {hint}"
        )

    def gamma(self, *a, **kw):
        self._rejection(
            "gamma", "for integer shape k compose sum of k exponential "
            "draws; otherwise sample driver-side and from_array()"
        )

    def beta(self, *a, **kw):
        self._rejection("beta", "compose two gammas: X/(X+Y)")

    def chisquare(self, *a, **kw):
        self._rejection(
            "chisquare", "sum of df squared standard_normal draws"
        )

    def vonmises(self, *a, **kw):
        self._rejection("vonmises", "sample driver-side and from_array()")

    def wald(self, *a, **kw):
        self._rejection("wald", "sample driver-side and from_array()")


def default_rng(spark, seed: int = 0) -> RandomState:
    """dask.array.random.default_rng twin."""
    return RandomState(spark, seed)
