"""Degenerate-input sweep: run EVERY registry query against zero-row,
one-row, and pathological-content datasets (null/unicode/whitespace
text, null event columns). Operators must either flow rows through to
an empty/sane result or raise a CLEAR contract error — this sweep
caught 9 silent NoneType crashes in round 5 (unguarded driver-side
scalar probes).

Usage: python scripts/sweep_degenerate.py [empty|one|weird|all]
Exit 0 unless a query fails with anything other than a ValueError
carrying a clear contract message.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# linalg/clustering contracts: factorizing empty or rank-deficient
# grams and clustering an empty/under-k corpus are undefined — a
# clear ValueError is the REQUIRED behavior here
EXPECTED_VALUEERROR = {
    "arr_cholesky", "arr_tsqr",
    # round-6 additions, same contract family:
    "arr_lu", "arr_solve_triangular", "arr_svd_compressed",
    "corpus_cluster", "dedup_semantic_cells", "ann_ivf_checked",
    # round-10 additions: training/factorization on empty or under-k
    # corpora is undefined — clear ValueError is the contract
    "ann_pq", "ann_ivfpq", "embed_pca", "classifier_train",
}


def build(kind: str, base: str = "/root/testdata/sf0.001") -> str:
    d = f"/tmp/sweep_{kind}"
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    limit = {"empty": 0, "one": 1}.get(kind)
    for t in TABLES:
        if kind != "weird" or t not in ("documents", "events"):
            n = limit if limit is not None else 5
            con.sql(
                f"COPY (SELECT * FROM '{base}/{t}.parquet' LIMIT {n}) "
                f"TO '{d}/{t}.parquet' (FORMAT parquet)"
            )
    if kind == "weird":
        con.sql(f"""
        COPY (SELECT * FROM (VALUES
            (0::BIGINT, NULL::VARCHAR, 'en', 'web', 0::BIGINT),
            (1, '', 'en', 'web', 0),
            (2, '    ', 'en', 'web', 4),
            (3, 'héllo wörld émoji 🎉🎉 café naïve 日本語テキスト', 'ja', 'web', 40),
            (4, repeat('a', 10000), 'en', 'book', 10000),
            (5, 'word', 'en', 'web', 4),
            (6, e'tab\tsep\nnewline text here ok fine', 'en', 'web', 34),
            (7, '🎉 🎉 🎉 🎉 🎉 🎉 🎉 🎉', 'en', 'web', 15)
        ) t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT parquet)
        """)
        con.sql(f"""
        COPY (SELECT event_id,
                     CASE WHEN event_id % 3 = 0 THEN NULL ELSE ts END AS ts,
                     CASE WHEN event_id % 4 = 0 THEN NULL ELSE user_id END AS user_id,
                     event_type,
                     CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
                     props
              FROM '{base}/events.parquet' LIMIT 50)
        TO '{d}/events.parquet' (FORMAT parquet)
        """)
    return d


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    kinds = ["empty", "one", "weird"] if which == "all" else [which]

    import __spark_entry__ as E
    from dask_spark.session import get_spark

    spark = get_spark("sweep_degenerate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    bad = 0
    for kind in kinds:
        d = build(kind)
        ok = expected = 0
        for name, fn in qs.items():
            try:
                fn(spark, d).limit(3).collect()
                ok += 1
            except ValueError as exc:
                if name in EXPECTED_VALUEERROR:
                    expected += 1
                else:
                    bad += 1
                    print(f"[{kind}] FAIL {name}: ValueError: {exc}")
            except Exception as exc:
                bad += 1
                msg = str(exc).replace("\n", " ")[:160]
                print(f"[{kind}] FAIL {name}: {type(exc).__name__}: {msg}")
        print(f"[{kind}] {ok} ok, {expected} expected-contract-errors")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
