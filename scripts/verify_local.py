"""Local replica of the driver's t2 correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB at the given
SF, compare row count, column names, and order-insensitive values.

Also a CODEGEN GUARD: the parent process re-execs itself with stderr
piped through plans.codegen_failure_lines, so a whole-stage-codegen
compile failure (which Spark silently downgrades to interpreted eval
— it passes every correctness check while running ~10× slow) fails
the sweep with rc=3. Disable with DS_NO_CODEGEN_GUARD=1.

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # duckdb returns Decimal for HUGEINT-ish; normalize numerics
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, ignore_index=True) if len(df) else df
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(oracle_pdf):
        return f"rowcount {len(spark_pdf)} vs {len(oracle_pdf)}"
    a, b = _norm(spark_pdf), _norm(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~(
                (av.isna() & bv.isna())
                | (abs(av - bv) <= 1e-6 + 1e-9 * abs(bv))
            )
            if bad.any():
                i = bad.idxmax()
                return f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                return f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
    return None


def _codegen_guard_reexec() -> None:
    """Re-run this script as a child with stderr scanned for silent
    whole-stage-codegen fallbacks; exit with the child's rc, or 3 if
    the run "passed" but a generated stage failed to compile."""
    from dask_spark.plans import codegen_failure_lines

    env = dict(os.environ, _DS_CG_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable] + sys.argv,
        env=env,
        stderr=subprocess.PIPE,
        text=True,
    )
    hits: list[str] = []
    assert proc.stderr is not None
    for line in proc.stderr:
        sys.stderr.write(line)
        hits.extend(codegen_failure_lines(line))
    rc = proc.wait()
    if hits:
        print(
            f"\nCODEGEN GUARD: {len(hits)} whole-stage compile "
            "failure(s) silently fell back to interpreted eval:",
            flush=True,
        )
        for h in hits[:5]:
            print(f"  {h}")
        sys.exit(rc or 3)
    sys.exit(rc)


def main():
    if (
        os.environ.get("_DS_CG_CHILD") != "1"
        and os.environ.get("DS_NO_CODEGEN_GUARD") != "1"
    ):
        _codegen_guard_reexec()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from dask_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    passed = failed = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failed += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = spark_pdf is not None
            print(f"rows-only {name}: {len(spark_pdf)} rows [{dt:.1f}s]")
            rows_only += 1
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            failed += 1
            continue
        err = compare(spark_pdf, oracle_pdf)
        if err:
            print(f"FAIL {name}: {err} [{dt:.1f}s]")
            failed += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows [{dt:.1f}s]")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
