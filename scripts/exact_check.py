"""Hash-stability audit: EXACT float compare (the driver hashes exact
values; tolerance passes can hide boundary straddles) between each
query's Spark result and its DuckDB oracle."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np

import __spark_entry__ as E
from dask_spark.session import get_spark

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    spark = get_spark()
    qs, os_ = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    for name in names or sorted(os_):
        if name not in os_:
            print(f"{name}: no oracle, skipped")
            continue
        a = qs[name](spark, sf).toPandas()
        b = con.sql(os_[name]).df()
        for df in (a, b):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = df[c].astype("datetime64[us]")
        a = a.reindex(sorted(a.columns), axis=1).sort_values(
            sorted(a.columns), ignore_index=True)
        b = b.reindex(sorted(b.columns), axis=1).sort_values(
            sorted(b.columns), ignore_index=True)
        if len(a) != len(b):
            print(f"{name}: ROWS {len(a)} vs {len(b)}"); bad += 1; continue
        mism = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            # int-vs-float dtype divergence is a hash risk the float
            # compare below can't see: the driver hashes each value's
            # string form, and a DuckDB HUGEINT (SUM(BIGINT) widens)
            # comes back as float64 — "2.3e+18" never hashes like
            # "2305843009213693952" even when numerically equal.
            ka = a[c].dtype.kind
            kb = b[c].dtype.kind
            if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
                mism.append((c, f"dtype {a[c].dtype} vs {b[c].dtype}"))
                continue
            try:
                avf = av.astype(float); bvf = bv.astype(float)
                eq = (avf == bvf) | (np.isnan(avf) & np.isnan(bvf))
            except (ValueError, TypeError):
                eq = np.array([x == y for x, y in zip(av, bv)])
            if not eq.all():
                mism.append((c, int((~eq).sum())))
        if mism:
            print(f"{name}: INEXACT {mism}"); bad += 1
        else:
            print(f"{name}: exact ({len(a)} rows)")
    print(f"done, {bad} inexact")


if __name__ == "__main__":
    main()
