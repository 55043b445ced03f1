"""Differential fuzzer for the ARRAY world (r14 verdict item 2):
random NDArray structural/elementwise/reduction chains vs numpy.

The dataframe fuzzer (fuzz_parity.py) never touches ndarray.py —
exactly where a perm-fusion composition bug would hide: every
structural op composes a driver-side ``perm`` gather instead of
emitting expressions, so a wrong index composition is invisible to
single-op tests that start from a fresh array. Chains of 3-6 ops
exercise the composition: transpose/T/swapaxes/flip/roll/slice/
reshape/expand_dims/squeeze each fold into perm; arithmetic
materializes the pending gather; reductions/cumsum indirect element
reads through the perm literal.

Every chain runs twice — engine (lazy → one ``compute()``) and numpy
on the same values — and compares with allclose(equal_nan). Values
include NaN and negatives; shapes include size-1 axes.

Usage: python scripts/fuzz_array.py [N_CHAINS] [BASE_SEED]
Defaults: 500 chains, seed 20260817. On mismatch prints seed + chain
and exits 1.
"""

from __future__ import annotations

import math
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from dask_spark.ndarray import NDArray


def gen_array(rng: random.Random):
    n = rng.choice([1, 2, 3, 6])
    ndim_inner = rng.choice([1, 2, 2, 3])
    inner = tuple(rng.choice([1, 2, 3, 4]) for _ in range(ndim_inner))
    size = n * math.prod(inner)
    npr = np.random.default_rng(rng.randrange(1 << 30))
    arr = npr.standard_normal(size).reshape((n, *inner))
    arr = np.round(arr * 4) / 2          # ties + exact halves
    if rng.random() < 0.3:
        mask = npr.random(arr.shape) < 0.15
        arr = np.where(mask, np.nan, arr)
    return arr


def _rand_slice(rng, dim):
    a = rng.randrange(0, dim)
    b = rng.randrange(a + 1, dim + 1)
    step = rng.choice([1, 1, 1, 2])
    return slice(a, b, step)


# each op: applies(np_arr) -> bool; make(rng, np_arr) ->
#   (engine_fn, numpy_fn, label)  — inner axes only (axis 0 is the
# distributed row axis; engine reductions over it are terminal)

def op_transpose(rng, a):
    if a.ndim < 3:
        return None
    axes = list(range(a.ndim - 1))
    rng.shuffle(axes)
    axes = tuple(axes)
    full = (0,) + tuple(x + 1 for x in axes)
    return (lambda x: x.transpose(axes),
            lambda y: y.transpose(full),
            f"transpose{axes}")


def op_T(rng, a):
    if a.ndim < 3:
        return None
    full = (0,) + tuple(range(a.ndim - 1, 0, -1))
    return (lambda x: x.T, lambda y: y.transpose(full), "T")


def op_flip(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    return (lambda x: x.flip(ax), lambda y: np.flip(y, axis=ax),
            f"flip({ax})")


def op_roll(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    sh = rng.randrange(1, max(2, a.shape[ax]))
    return (lambda x: x.roll(sh, ax), lambda y: np.roll(y, sh, axis=ax),
            f"roll({sh},{ax})")


def op_slice(rng, a):
    if a.ndim < 2:
        return None
    key = tuple([slice(None)] +
                [_rand_slice(rng, d) for d in a.shape[1:]])

    def npy(y):
        out = y[key]
        # engine collapses empty inner selections are impossible by
        # _rand_slice construction (start < stop)
        return out

    return (lambda x: x[key], npy, f"slice{key[1:]}")


def op_int_index(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    i = rng.randrange(a.shape[ax])
    key = tuple(slice(None) if d != ax else i for d in range(a.ndim))

    def eng(x):
        out = x[key]
        return out

    def npy(y):
        out = y[key]
        return out if out.ndim > 1 else out[:, None]

    # engine drops the int axis but keeps ≥1 inner axis ((1,) floor)
    def npy2(y):
        out = y[key]
        if out.ndim == 1:
            out = out[:, None]
        return out

    return eng, npy2, f"int_index(ax{ax}={i})"


def op_fancy(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    idx = [rng.randrange(a.shape[ax])
           for _ in range(rng.randrange(1, a.shape[ax] + 1))]
    key = tuple(slice(None) if d != ax else idx for d in range(a.ndim))
    return (lambda x: x[key],
            lambda y: np.take(y, idx, axis=ax),
            f"fancy(ax{ax}={idx})")


def op_ravel(rng, a):
    if a.ndim < 2:
        return None
    return (lambda x: x.ravel(),
            lambda y: y.reshape(y.shape[0], -1),
            "ravel")


def op_reshape(rng, a):
    if a.ndim < 2:
        return None
    size = math.prod(a.shape[1:])
    # random 2-factorization of the inner size
    divs = [d for d in range(1, size + 1) if size % d == 0]
    d = rng.choice(divs)
    return (lambda x: x.reshape(d, size // d),
            lambda y: y.reshape(y.shape[0], d, size // d),
            f"reshape({d},{size // d})")


def op_expand_squeeze(rng, a):
    if rng.random() < 0.5 and a.ndim < 4:
        ax = rng.randrange(1, a.ndim + 1)
        return (lambda x: x.expand_dims(ax),
                lambda y: np.expand_dims(y, ax),
                f"expand_dims({ax})")
    if a.ndim > 2 and any(s == 1 for s in a.shape[1:]):
        def npy(y):
            sq = tuple(i for i in range(1, y.ndim) if y.shape[i] == 1)
            out = np.squeeze(y, axis=sq)
            if out.ndim == 1:
                out = out[:, None]
            return out

        return (lambda x: x.squeeze(), npy, "squeeze")
    return None


def op_arith(rng, a):
    c = rng.choice([2.0, -1.5, 0.5])
    kind = rng.choice(["mul_add", "self_add", "self_mul", "neg_div"])
    if kind == "mul_add":
        return (lambda x: x * c + 1.0, lambda y: y * c + 1.0,
                f"x*{c}+1")
    if kind == "self_add":
        return (lambda x: x + x, lambda y: y + y, "x+x")
    if kind == "self_mul":
        return (lambda x: x * x, lambda y: y * y, "x*x")
    return (lambda x: x / c, lambda y: y / c, f"x/{c}")


def op_reduce_inner(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    how = rng.choice(["sum", "mean", "max", "min", "prod"])

    def eng(x):
        out = getattr(x, how)(ax)
        return out

    def npy(y):
        out = getattr(np, how)(y, axis=ax)
        if out.ndim == 1:
            out = out[:, None]
        return out

    return eng, npy, f"{how}(axis={ax})"


def op_cumsum_inner(rng, a):
    if a.ndim < 2:
        return None
    ax = rng.randrange(1, a.ndim)
    return (lambda x: x.cumsum(ax),
            lambda y: np.cumsum(y, axis=ax),
            f"cumsum(axis={ax})")


def op_tril(rng, a):
    if a.ndim != 3:
        return None
    k = rng.choice([-1, 0, 1])
    fn = rng.choice(["tril", "triu"])
    return (lambda x: getattr(x, fn)(k),
            lambda y: np.stack([getattr(np, fn)(r, k) for r in y]),
            f"{fn}({k})")


OPS = [op_transpose, op_T, op_flip, op_roll, op_slice, op_int_index,
       op_fancy, op_ravel, op_reshape, op_expand_squeeze, op_arith,
       op_reduce_inner, op_cumsum_inner, op_tril]


def run_chain(spark, seed: int) -> tuple[bool, str]:
    rng = random.Random(seed)
    ref = gen_array(rng)
    pdf = pd.DataFrame({
        "id": range(ref.shape[0]),
        "block": [list(r) for r in ref.reshape(ref.shape[0], -1)],
    })
    nd = NDArray(spark.createDataFrame(pdf).repartition(2),
                 ref.shape[1:], "block", "id")
    labels = []
    n_ops = rng.randrange(3, 7)
    for _ in range(n_ops):
        mk = rng.choice(OPS)
        made = mk(rng, ref)
        if made is None:
            continue
        e_fn, n_fn, label = made
        with np.errstate(invalid="ignore", over="ignore"):
            try:
                ref2 = n_fn(ref)
            except Exception:
                continue
        nd = e_fn(nd)
        ref = np.asarray(ref2, dtype="float64")
        labels.append(label)
    chain = " | ".join(labels) or "(empty)"
    try:
        got = nd.compute()
        exp = ref
        assert got.shape == exp.shape, f"shape {got.shape} != {exp.shape}"
        assert np.allclose(got, exp, atol=1e-9, rtol=1e-7,
                           equal_nan=True), "values differ"
        return True, chain
    except Exception as exc:
        try:
            got_r = repr(nd.compute())
        except Exception as inner:
            got_r = f"<engine collect failed: {inner}>"
        return False, (
            f"seed={seed} chain=[{chain}]\n{exc}\n"
            f"engine:\n{got_r}\nnumpy:\n{ref!r}"
        )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    from dask_spark.session import get_spark

    spark = get_spark("fuzz-array")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for j in range(n):
        ok, msg = run_chain(spark, base + j)
        if not ok:
            failures.append(msg)
            print(f"FAIL {msg}", file=sys.stderr)
        if (j + 1) % 50 == 0:
            print(f"# {j + 1}/{n} chains, {len(failures)} failures",
                  file=sys.stderr)
    print(f"fuzz_array: {n} chains, {len(failures)} failures "
          f"(base seed {base})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
