#!/usr/bin/env python
"""Scaling probe for the 100 TB-critical TEXT exchanges (r13 verdict
item 3): LSH band join (dedup_minhash), ExactSubstr stride-1 window
count (dedup_substring), and the CCNet span scrub (span_dedup) at 1×,
10× and 100× the sf0.1 documents corpus.

Replication holds the DUP RATE constant: every replica k rewrites each
token t as ``r<k>_<t>`` — a disjoint token universe per replica, so
intra-replica duplicate structure is copied exactly and no cross-
replica shingle/window/span ever collides. Corpus-relative statistics
(duplicate fraction, candidate-pair rate per doc, span-removal rate)
are therefore scale-invariant by construction, and any measured
super-linear growth is the exchange's own cost curve, not a data
artifact.

Measured per scale and operator: wall seconds (count() on the final
output — full pipeline execution), output rows, and the size of the
100 TB-critical exchange (band rows = bands·docs for minhash; stride-1
window rows for substring; span rows for span scrub — computed with a
separate cheap aggregate, not by re-running the pipeline).

Wall-clock depends on host load; run idle. Scales override:
PROBE_SCALES env, comma-separated (default "1,10,100").
Prints one JSON line then a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dask_spark.frame import DaskFrame  # noqa: E402
from dask_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("PROBE_SCALES", "1,10,100").split(",")]
W = 8          # substring window / span tokens
BANDS = 16
NUM_HASHES = 64


def replicate(spark, scale: int):
    """documents × scale with per-replica disjoint token universes."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    if scale == 1:
        return base
    reps = base.crossJoin(
        spark.range(scale).select(F.col("id").alias("__r"))
    )
    tagged = reps.select(
        (F.col("doc_id") + F.col("__r") * F.lit(10_000_000)).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.lower("text"), r"\s+"),
                # closure factory not needed: __r is a column here
                lambda t: F.concat(F.lit("r"), F.col("__r").cast("string"),
                                   F.lit("_"), t),
            ),
            " ",
        ).alias("text"),
    )
    return tagged.repartition(32)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    spark = get_spark("scaling-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    from dask_spark.operators.dedup import (
        minhash_lsh_pairs,
        span_dedup,
        substring_dedup,
    )

    results = {}
    for scale in SCALES:
        sdf = replicate(spark, scale)
        sdf = sdf.persist()
        n_docs = sdf.count()  # also materializes the replica build
        frame = DaskFrame(sdf)

        toks = sdf.select(F.size(F.split(F.lower("text"), r"\s+")).alias("n"))
        agg = toks.agg(
            F.sum(F.greatest(F.col("n") - W + 1, F.lit(0))).alias("windows"),
            F.sum(F.ceil(F.col("n") / W)).alias("spans"),
        ).first()
        exchange = {
            "band_rows": n_docs * BANDS,
            "window_rows": int(agg["windows"]),
            "span_rows": int(agg["spans"]),
        }

        pairs, t_minhash = timed(
            lambda: minhash_lsh_pairs(
                frame, num_hashes=NUM_HASHES, bands=BANDS,
                jaccard_threshold=0.6,
            )._sdf.count()
        )
        sub, t_sub = timed(
            lambda: substring_dedup(
                frame, window_tokens=W, window_hash="xxhash64",
            )._sdf.agg(F.count(F.lit(1)), F.sum("n_removed")).first()
        )
        span, t_span = timed(
            lambda: span_dedup(
                frame, span_tokens=W,
            )._sdf.agg(F.count(F.lit(1)), F.sum("n_removed")).first()
        )
        sdf.unpersist()
        results[scale] = {
            "docs": n_docs,
            "exchange": exchange,
            "minhash": {"sec": t_minhash, "pairs": pairs,
                        "pairs_per_doc": round(pairs / n_docs, 4)},
            "substring": {"sec": t_sub, "rows": sub[0],
                          "removed": int(sub[1]),
                          "removed_per_doc": round(sub[1] / n_docs, 4)},
            "span": {"sec": t_span, "rows": span[0],
                     "removed": int(span[1]),
                     "removed_per_doc": round(span[1] / n_docs, 4)},
        }
        print(f"# scale {scale}x: docs={n_docs} "
              f"minhash={t_minhash}s ({pairs} pairs) "
              f"substring={t_sub}s span={t_span}s", file=sys.stderr)

    print(json.dumps({"probe": "text_exchanges_r14", "sf_dir": SF_DIR,
                      "results": results}))

    # scale-invariance check: per-doc rates must match across scales
    # (the replication contract) — a drift means cross-replica
    # collisions, i.e. a broken probe, not a broken operator
    base = results[SCALES[0]]
    for s in SCALES[1:]:
        r = results[s]
        for op in ("minhash",):
            b = base[op]["pairs_per_doc"]
            g = r[op]["pairs_per_doc"]
            assert abs(g - b) < max(0.05, 0.1 * b), (
                f"{op} pairs/doc drifted at {s}x: {g} vs {b}")
        for op in ("substring", "span"):
            b, g = base[op]["removed_per_doc"], r[op]["removed_per_doc"]
            assert abs(g - b) < max(0.05, 0.1 * b), (
                f"{op} removed/doc drifted at {s}x: {g} vs {b}")
    print("# scale-invariance: per-doc rates held across scales",
          file=sys.stderr)
    for i in range(1, len(SCALES)):
        lo, hi = SCALES[i - 1], SCALES[i]
        for op in ("minhash", "substring", "span"):
            ratio = results[hi][op]["sec"] / max(results[lo][op]["sec"], 1e-9)
            print(f"# {op}: {hi}x/{lo}x wall ratio = {ratio:.1f} "
                  f"(data ratio {hi // lo})", file=sys.stderr)


if __name__ == "__main__":
    main()
