"""Differential property fuzzer for COMPOSED plans (r13 verdict item 2).

Single-op parity is saturated (297 oracled queries + 4 ported
reference slices); the remaining risk class is composition bugs —
state the wrapper carries (tz tags, id columns, column metadata)
dropped by an op in the middle of a chain, exactly what the r13 port
found for row-preserving ops. This fuzzer generates seed-reproducible
random frames × random 3-6-op chains and executes every chain twice:
once through the engine (DaskFrame lazy plan → one collect at the
end), once through pandas — then compares via the public assert_eq
(order-insensitive, NaN-tolerant).

Frame generator stresses: nulls/NaNs, duplicate keys, ties, empty
frames, empty partitions (npartitions > nrows), unicode strings,
negative/zero numerics.

Op vocabulary (each op = (name, engine_fn, pandas_fn) drawn with
replacement): project, filter, assign-arithmetic, fillna, rename,
drop-column, groupby-agg (sum/count/min/max/mean), self-join on a
distinct key table, sort_values (order folds into the comparator),
drop_duplicates (full row), head-less limit is excluded (no stable row
order to compare).

Usage:
    python scripts/fuzz_parity.py [N_CHAINS] [BASE_SEED]
Defaults: 500 chains, seed 20260816. Any mismatch prints the seed,
the chain, and the two frames, then exits 1 — re-run with that seed
to reproduce.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

import dask_spark as ds
from dask_spark.testing import assert_eq

STRINGS = ["alpha", "beta", "beta", "Γράμμα", "", "zz", None, "beta"]


def gen_frame(rng: random.Random) -> pd.DataFrame:
    n = rng.choice([0, 1, 2, 3, 7, 13, 30])
    k = [rng.randrange(4) for _ in range(n)]                 # dup keys
    f = [rng.choice([float(rng.randrange(-5, 6)), np.nan,     # ties+NaN
                     rng.random() * 10 - 5]) for _ in range(n)]
    i = [rng.randrange(-100, 100) for _ in range(n)]
    s = [rng.choice(STRINGS) for _ in range(n)]
    # timestamps far from DST boundaries (June) so tz chains compare
    # without ambiguous/nonexistent-time policy differences
    ts = [pd.Timestamp("2024-06-01") + pd.Timedelta(hours=rng.randrange(720))
          for _ in range(n)]
    # r: UNIQUE order key for the order-dependent ops (shift/diff/
    # cum*/ffill) — both sides order by it, so ties can't make the
    # comparison ambiguous; shuffled so storage order ≠ logical order
    r = list(range(n))
    rng.shuffle(r)
    return pd.DataFrame({"k": pd.Series(k, dtype="int64"),
                         "f": pd.Series(f, dtype="float64"),
                         "i": pd.Series(i, dtype="int64"),
                         "s": pd.Series(s, dtype="object"),
                         "ts": pd.Series(ts, dtype="datetime64[us]"),
                         "r": pd.Series(r, dtype="int64")})


# ---- op vocabulary -------------------------------------------------------
# each entry: name, applies(pdf) -> bool, make(rng, pdf) ->
#   (engine_fn(DaskFrame) -> DaskFrame, pandas_fn(pdf) -> pdf, label)

def op_project(rng, pdf):
    cols = sorted(rng.sample(list(pdf.columns), rng.randrange(1, len(pdf.columns) + 1)))
    if "k" not in cols:  # keep the groupby/join key available
        cols = ["k"] + cols
    return (lambda d: d[cols], lambda p: p[cols].copy(), f"project{cols}")


def op_filter(rng, pdf):
    cands = [c for c in pdf.columns
             if pd.api.types.is_numeric_dtype(pdf[c])]
    if not cands:
        return None
    col = rng.choice(cands)
    thr = rng.randrange(-3, 4)
    return (lambda d: d[d[col] > thr],
            lambda p: p[p[col] > thr],
            f"filter({col}>{thr})")


def op_assign(rng, pdf):
    cands = [c for c in pdf.columns
             if pd.api.types.is_numeric_dtype(pdf[c])]
    if not cands:
        return None
    src = rng.choice(cands)
    a, b = rng.randrange(1, 4), rng.randrange(-2, 3)

    def eng(d):
        out = d.copy()
        out["z"] = out[src] * a + b
        return out

    def pan(p):
        p = p.copy()
        p["z"] = p[src] * a + b
        return p

    return eng, pan, f"assign(z={src}*{a}+{b})"


def op_fillna(rng, pdf):
    v = float(rng.randrange(-2, 3))

    def eng(d):
        out = d.copy()
        if "f" in d.columns:
            out["f"] = out["f"].fillna(v)
        return out

    def pan(p):
        p = p.copy()
        if "f" in p.columns:
            p["f"] = p["f"].fillna(v)
        return p

    return eng, pan, f"fillna(f,{v})"


def op_rename(rng, pdf):
    cands = [c for c in pdf.columns if c != "k"]
    if not cands:
        return None
    src = rng.choice(cands)
    dst = src + "_r"
    return (lambda d: d.rename(columns={src: dst}),
            lambda p: p.rename(columns={src: dst}),
            f"rename({src}->{dst})")


def op_drop(rng, pdf):
    droppable = [c for c in pdf.columns if c != "k"]
    if len(droppable) < 2:
        return None
    col = rng.choice(droppable)
    return (lambda d: d.drop(columns=[col]),
            lambda p: p.drop(columns=[col]),
            f"drop({col})")


def op_dedup(rng, pdf):
    return (lambda d: d.drop_duplicates(),
            lambda p: p.drop_duplicates(),
            "drop_duplicates")


def op_sort(rng, pdf):
    if not len(pdf.columns):
        return None
    col = rng.choice(list(pdf.columns))
    return (lambda d: d.sort_values(col),
            lambda p: p.sort_values(col),
            f"sort({col})")


def op_groupby(rng, pdf):
    if "k" not in pdf.columns:
        return None
    nums = [c for c in pdf.columns if c != "k"
            and pd.api.types.is_numeric_dtype(pdf[c])]
    if not nums:
        return None
    val = rng.choice(nums)
    how = rng.choice(["sum", "min", "max", "count", "mean"])

    out_name = f"{val}_{how}"  # engine contract: dict-form agg emits
    # <col>_<fn> flat names (groupby.py:149 — divergence from pandas
    # is documented; the pandas twin mirrors it)

    def eng(d):
        return d.groupby("k").agg({val: how})

    def pan(p):
        if how == "count":
            out = p.groupby("k")[val].count().reset_index()
        else:
            out = getattr(p.groupby("k")[val], how)().reset_index()
        return out.rename(columns={val: out_name})

    return eng, pan, f"groupby(k).{how}({val})"


def op_selfjoin(rng, pdf):
    if "k" not in pdf.columns:
        return None

    def eng(d):
        keys = d[["k"]].drop_duplicates()
        keys = keys.rename(columns={"k": "k2"})
        return d.merge(keys, left_on="k", right_on="k2", how="inner")

    def pan(p):
        keys = p[["k"]].drop_duplicates().rename(columns={"k": "k2"})
        return p.merge(keys, left_on="k", right_on="k2", how="inner")

    return eng, pan, "selfjoin(k)"


NY = "America/New_York"


def op_tz_store(rng, pdf):
    """Store an AWARE column in place — the col_tz persistence class
    the r13 port found leaking: later row-preserving ops must keep the
    tag or .dt fields silently read UTC. pandas raises on re-localize,
    which run_chain treats as skip, so the op self-guards."""
    if "ts" not in pdf.columns:
        return None

    def eng(d):
        out = d.copy()
        out["ts"] = out["ts"].dt.tz_localize(NY)
        return out

    def pan(p):
        p = p.copy()
        p["ts"] = p["ts"].dt.tz_localize(NY)
        return p

    return eng, pan, "tz_store(ts,NY)"


def op_dt_hour(rng, pdf):
    """Extract .dt.hour — LOCAL hour if the column is aware (reads the
    engine tag through whatever ops ran in between)."""
    if "ts" not in pdf.columns:
        return None

    def eng(d):
        out = d.copy()
        out["h"] = out["ts"].dt.hour
        return out

    def pan(p):
        p = p.copy()
        p["h"] = p["ts"].dt.hour
        return p

    return eng, pan, "dt_hour"


def op_sqrt_nan(rng, pdf):
    """Create NaN MID-PLAN (sqrt of a possibly-negative float) — the
    r14 deep-NaN class: downstream skipna aggregates must treat the
    produced NaN as missing like pandas, not poison sums / win max."""
    cands = [c for c in pdf.columns
             if pd.api.types.is_float_dtype(pdf[c])]
    if not cands:
        return None
    src = rng.choice(cands)

    def eng(d):
        out = d.copy()
        out["q"] = d[src] ** 0.5
        return out

    def pan(p):
        p = p.copy()
        with np.errstate(invalid="ignore"):
            p["q"] = p[src] ** 0.5
        return p

    return eng, pan, f"sqrt_nan({src})"


def op_concat_self(rng, pdf):
    import dask_spark as _ds

    return (lambda d: _ds.concat([d, d]),
            lambda p: pd.concat([p, p], ignore_index=True),
            "concat(self,self)")


def op_merge_outer(rng, pdf):
    if "k" not in pdf.columns:
        return None

    def eng(d):
        dim = d.groupby("k").agg({"k": "count"})             .rename(columns={"k_count": "kc"})
        return d.merge(dim, on="k", how="left")

    def pan(p):
        dim = p.groupby("k")["k"].count().rename("kc").reset_index()
        return p.merge(dim, on="k", how="left")

    return eng, pan, "merge_left(count-dim)"


# ---- r15 vocabulary extension: order-dependent, accessor, multi-key,
# merge-how ops — the op classes where the last two composition-bug
# waves (tz tags, NaN-as-missing) actually lived (r14 verdict item 2).

def _num_cols(pdf):
    return [c for c in pdf.columns
            if c not in ("k", "r") and pd.api.types.is_numeric_dtype(pdf[c])]


def op_shift(rng, pdf):
    if "r" not in pdf.columns:
        return None
    cands = _num_cols(pdf)
    if not cands:
        return None
    col, p = rng.choice(cands), rng.randrange(1, 3)

    def eng(d):
        return d.shift(col, periods=p, order_by="r", out="sh")

    def pan(q):
        q = q.sort_values("r").copy()
        q["sh"] = q[col].shift(p)
        return q

    return eng, pan, f"shift({col},{p})"


def op_diff(rng, pdf):
    if "r" not in pdf.columns:
        return None
    cands = _num_cols(pdf)
    if not cands:
        return None
    col, p = rng.choice(cands), rng.randrange(1, 3)

    def eng(d):
        return d.diff(col, periods=p, order_by="r", out="dv")

    def pan(q):
        q = q.sort_values("r").copy()
        q["dv"] = q[col].diff(p)
        return q

    return eng, pan, f"diff({col},{p})"


def op_cum(rng, pdf):
    if "r" not in pdf.columns:
        return None
    cands = _num_cols(pdf)
    if not cands:
        return None
    col = rng.choice(cands)
    fn = rng.choice(["cumsum", "cummax", "cummin"])

    def eng(d):
        return getattr(d, fn)(col, order_by="r", out="cu")

    def pan(q):
        q = q.sort_values("r").copy()
        q["cu"] = getattr(q[col], fn)()
        return q

    return eng, pan, f"{fn}({col})"


def op_ffill_ordered(rng, pdf):
    if "r" not in pdf.columns or "f" not in pdf.columns:
        return None
    how = rng.choice(["ffill", "bfill"])

    def eng(d):
        return getattr(d, how)(["f"], order_by="r")

    def pan(q):
        q = q.sort_values("r").copy()
        q["f"] = getattr(q["f"], how)()
        return q

    return eng, pan, f"{how}(f by r)"


def op_str_chain(rng, pdf):
    if "s" not in pdf.columns or pdf["s"].dtype != object:
        return None
    kind = rng.choice(["lower", "upper", "strip", "len", "contains"])

    def eng(d):
        out = d.copy()
        if kind == "len":
            out["sv"] = d["s"].str.len()
        elif kind == "contains":
            out["sv"] = d["s"].str.contains("beta")
        else:
            out["sv"] = getattr(d["s"].str, kind)()
        return out

    def pan(q):
        q = q.copy()
        if kind == "len":
            q["sv"] = q["s"].str.len()
        elif kind == "contains":
            v = q["s"].str.contains("beta", regex=True)
            # engine nulls come back as None in an object column;
            # normalize pandas' NaN so the string compare agrees
            q["sv"] = v.astype(object).where(v.notna(), None)
        else:
            q["sv"] = getattr(q["s"].str, kind)()
        return q

    return eng, pan, f"str.{kind}(s)"


def op_dt_field(rng, pdf):
    if "ts" not in pdf.columns:
        return None
    fld = rng.choice(["month", "day", "dayofweek", "minute"])

    def eng(d):
        out = d.copy()
        out["dv2"] = getattr(d["ts"].dt, fld)
        return out

    def pan(q):
        q = q.copy()
        q["dv2"] = getattr(q["ts"].dt, fld)
        return q

    return eng, pan, f"dt.{fld}"


def op_groupby_multi(rng, pdf):
    if "k" not in pdf.columns or "s" not in pdf.columns:
        return None
    if pdf["s"].dtype != object:
        return None
    nums = _num_cols(pdf)
    if not nums:
        return None
    val = rng.choice(nums)
    how = rng.choice(["sum", "min", "max", "count", "mean"])
    out_name = f"{val}_{how}"

    def eng(d):
        return d.groupby(["k", "s"]).agg({val: how})

    def pan(q):
        g = q.groupby(["k", "s"], dropna=True)[val]
        out = (g.count() if how == "count"
               else getattr(g, how)()).reset_index()
        return out.rename(columns={val: out_name})

    return eng, pan, f"groupby(k,s).{how}({val})"


def op_merge_how(rng, pdf):
    if "k" not in pdf.columns:
        return None
    nums = _num_cols(pdf)
    if not nums:
        return None
    val = rng.choice(nums)
    how = rng.choice(["inner", "left"])

    def eng(d):
        dim = d.groupby("k").agg({val: "max"}) \
            .rename(columns={f"{val}_max": "mx"})
        return d.merge(dim, on="k", how=how)

    def pan(q):
        dim = q.groupby("k")[val].max().rename("mx").reset_index()
        return q.merge(dim, on="k", how=how)

    return eng, pan, f"merge_{how}(max-dim,{val})"


OPS = [op_project, op_filter, op_assign, op_fillna, op_rename,
       op_drop, op_dedup, op_sort, op_groupby, op_selfjoin,
       op_tz_store, op_dt_hour, op_concat_self, op_merge_outer,
       op_sqrt_nan,
       op_shift, op_diff, op_cum, op_ffill_ordered, op_str_chain,
       op_dt_field, op_groupby_multi, op_merge_how]


def run_chain(seed: int) -> tuple[bool, str]:
    rng = random.Random(seed)
    pdf = gen_frame(rng)
    nparts = rng.choice([1, 2, 3, 5])  # 5 > nrows for tiny frames
    eng = ds.from_pandas(pdf, npartitions=nparts)
    pan = pdf.copy()
    labels = []
    n_ops = rng.randrange(3, 7)
    grouped = False
    for _ in range(n_ops):
        mk = rng.choice(OPS)
        if grouped and mk in (op_groupby, op_selfjoin, op_fillna,
                              op_merge_outer, op_groupby_multi,
                              op_merge_how):
            continue  # post-agg frame has a different column set
        made = mk(rng, pan)
        if made is None:
            continue
        e_fn, p_fn, label = made
        try:
            pan2 = p_fn(pan)
        except Exception:
            continue  # pandas refused (e.g. no such column) — skip op
        eng = e_fn(eng)
        pan = pan2
        labels.append(label)
        if mk is op_groupby:
            grouped = True
    chain = " | ".join(labels) or "(empty)"
    # representation bridge: the engine stores aware timestamps as UTC
    # instants + a tz tag; pandas carries the zone in the dtype —
    # normalize pandas to UTC-naive for the value compare (the LOCAL
    # field semantics are exercised in-chain by op_dt_hour)
    for c in pan.columns:
        if isinstance(pan[c].dtype, pd.DatetimeTZDtype):
            pan = pan.copy()
            pan[c] = pan[c].dt.tz_convert("UTC").dt.tz_localize(None)
    try:
        assert_eq(eng, pan)
        return True, chain
    except Exception as exc:
        try:
            eng_pdf = repr(eng.compute())
        except Exception as inner:
            eng_pdf = f"<engine collect failed: {inner}>"
        return False, (
            f"seed={seed} nparts={nparts} chain=[{chain}]\n{exc}\n"
            f"engine:\n{eng_pdf}\npandas:\n{pan}"
        )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20260816
    from dask_spark.session import get_spark

    spark = get_spark("fuzz-parity")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for j in range(n):
        ok, msg = run_chain(base + j)
        if not ok:
            failures.append(msg)
            print(f"FAIL {msg}", file=sys.stderr)
        if (j + 1) % 50 == 0:
            print(f"# {j + 1}/{n} chains, {len(failures)} failures",
                  file=sys.stderr)
    print(f"fuzz_parity: {n} chains, {len(failures)} failures "
          f"(base seed {base})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
