"""``dask.array.linalg``-shaped namespace (reference:
dask/array/linalg.py public surface — qr, tsqr, svd, svd_compressed,
lu, cholesky, solve, solve_triangular, inv, lstsq, norm). Pure
delegates to the DArray methods, which implement each factorization
Spark-first (tall-skinny TSQR accumulation, Gram-path SVD, driver
finishes on the small R factor)."""

from __future__ import annotations

from dask_spark.array import solve_triangular  # noqa: F401


def qr(a):
    """reference linalg.py qr — tall-skinny routes through TSQR."""
    return a.qr()


def tsqr(a):
    """reference linalg.py:?? tsqr — the direct TSQR entry."""
    return a.tsqr()


def svd(a):
    return a.svd()


def svd_compressed(a, k: int, n_power_iter: int = 0, seed: int = 42):
    """reference linalg.py:746 svd_compressed (randomized range
    finder)."""
    return a.svd_compressed(k, n_power_iter, seed)


def lu(a):
    """reference linalg.py:978 lu."""
    return a.lu()


def cholesky(a, of: str = "gram"):
    return a.cholesky(of)


def solve(a, b, b_col: str):
    return a.solve(b, b_col)


def inv(a):
    return a.inv()


def lstsq(a, b, b_col: str):
    return a.lstsq(b, b_col)


def norm(a, ord=2):
    """reference linalg.py norm — per-row L_ord norms."""
    return a.norm(ord)
