#!/usr/bin/env python
"""ANN-exchange scaling probe (r14, companion to scaling_probe_r14.py):
the LSH-band k-NN JOIN and the broadcast batch top-k at 1×/10×/100×
the sf0.1 embeddings corpus (2k → 200k vectors, dim 64).

Replication preserves INTRA-replica geometry exactly and scrambles
cross-replica similarity: every replica k applies its own seeded
SIGNED PERMUTATION of the coordinates — an orthogonal transform, so
all cosines within a replica are bit-preserved, while a vector from
replica a vs one from replica b meets a random signed shuffle
(expected cosine ~0 for generic vectors). Near-duplicate structure is
therefore copied per replica, never inflated.

The scale lever this probe MEASURES rather than argues: the per-band
bucket self-join is quadratic in bucket occupancy, so ``planes`` must
grow ~log2(n) to hold occupancy constant (the standard LSH sizing
rule). The probe holds expected occupancy ≈ corpus/2^planes ≈ 25-40
vectors by raising planes 6 → 9 → 13 across the three scales, and
records wall, candidate-exchange rows (bands × n), output rows, and a
quality line (mean top-1 cosine over the UNTRANSFORMED replica-0
vectors) so recall drift from the extra planes is visible, not
hidden.

PROBE_SCALES env overrides (default "1,10,100").
Prints one JSON line then a summary.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dask_spark.frame import DaskFrame
from dask_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("PROBE_SCALES", "1,10,100").split(",")]
BANDS = 8
K = 5
TARGET_BUCKET = 32  # hold occupancy ≈ n / 2^planes near this


def planes_for(n: int) -> int:
    return max(6, int(round(math.log2(max(n, 1) / TARGET_BUCKET))))


def replicate(spark, scale: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if scale == 1:
        return base
    reps = base.crossJoin(
        spark.range(scale).select(F.col("id").alias("__r"))
    ).select(
        (F.col("vec_id") + F.col("__r") * F.lit(10_000_000)).alias("vec_id"),
        "embedding", "__r",
    )

    def xform(it):
        perms = {}
        for pdf in it:
            out_vecs = []
            for vec, r in zip(pdf["embedding"], pdf["__r"]):
                r = int(r)
                if r not in perms:
                    rs = np.random.RandomState(1000 + r)
                    perms[r] = (rs.permutation(len(vec)),
                                rs.choice([-1.0, 1.0], size=len(vec)))
                p, sgn = perms[r]
                v = np.asarray(vec, dtype="float64")
                out_vecs.append((v[p] * sgn).tolist())
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": out_vecs})

    return reps.mapInPandas(
        xform, "vec_id bigint, embedding array<double>"
    ).repartition(32)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    spark = get_spark("scaling-probe-r14b")
    spark.sparkContext.setLogLevel("ERROR")
    from dask_spark.operators.similarity import (
        brute_force_topk_batch,
        knn_join,
    )

    base_q = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .orderBy("vec_id").limit(10).collect()
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in base_q]

    results = {}
    for scale in SCALES:
        sdf = replicate(spark, scale).persist()
        n = sdf.count()
        frame = DaskFrame(sdf)
        planes = planes_for(n)

        knn, t_knn = timed(lambda: knn_join(
            frame, frame, k=K, planes=planes, bands=BANDS,
            exclude_self=True,
        )._sdf.persist())
        out_rows = knn.count()
        # quality: mean top-1 cosine over the untransformed replica-0
        # vectors (ids < 10M) — neighbor displacement by cross-replica
        # chance collisions or plane-growth recall loss shows up here
        top1 = (
            knn.filter(F.col("l_id") < 10_000_000)
            .groupBy("l_id").agg(F.max("cosine").alias("c1"))
            .agg(F.avg("c1")).first()[0]
        )
        knn.unpersist()

        _, t_brute = timed(lambda: brute_force_topk_batch(
            frame, queries, k=10
        )._sdf.count())

        sdf.unpersist()
        results[scale] = {
            "vectors": n, "planes": planes,
            "band_rows": n * BANDS,
            "knn": {"sec": t_knn, "rows": out_rows,
                    "top1_mean_cosine": round(float(top1), 4)},
            "brute_batch10": {"sec": t_brute},
        }
        print(f"# scale {scale}x: n={n} planes={planes} "
              f"knn={t_knn}s ({out_rows} rows, top1 {top1:.4f}) "
              f"brute={t_brute}s", file=sys.stderr)

    print(json.dumps({"probe": "ann_exchanges_r14", "sf_dir": SF_DIR,
                      "bands": BANDS, "k": K, "results": results}))
    base = results[SCALES[0]]["knn"]["top1_mean_cosine"]
    for s in SCALES[1:]:
        drift = results[s]["knn"]["top1_mean_cosine"] - base
        print(f"# top1 cosine drift at {s}x: {drift:+.4f} "
              f"(recall cost of plane growth + chance collisions)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
