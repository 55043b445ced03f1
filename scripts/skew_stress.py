#!/usr/bin/env python
"""Skewed-data stress bench (r12 verdict item 3).

Every prior scale claim was measured on uniform TPC-H keys. This
script builds a Zipf-style fact table whose hottest key carries ~10%
of all rows, then measures the engine's four skew mitigations
end-to-end against the plain shapes on the same data:

  1. key_skew_report      — does the pre-flight diagnostic actually
                            surface the hot key and size the salt?
  2. AQE skew-join        — does Spark's adaptive skew split fire on
                            the plain sort-merge join? (plan assert:
                            "skew=" markers in the final adaptive plan)
  3. salted_join          — same row multiset as the plain join, and
                            the wall-clock relation at this scale
  4. skew_safe_nunique    — exact same per-key distinct counts as the
                            plain countDistinct, under a hot key

Rows default to 6M (SKEW_ROWS env overrides; keep the hot key's row
count >> one shuffle partition so the skew is real). Data is generated
with deterministic hash arithmetic — no files, no randomness, identical
across runs and retries.

Prints one JSON line with timings + correctness booleans, then a short
human-readable summary. Exit 1 on any correctness mismatch.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dask_spark.session import get_spark  # noqa: E402
from dask_spark.frame import DaskFrame  # noqa: E402
from dask_spark.operators.joins import key_skew_report, salted_join  # noqa: E402
from dask_spark.operators.groupby import skew_safe_nunique  # noqa: E402

ROWS = int(os.environ.get("SKEW_ROWS", "6000000"))
KEYS = int(os.environ.get("SKEW_KEYS", "100000"))
HOT_SHARE_PCT = 10  # ~10% of rows land on key 0


def build(spark):
    """Fact table: id, key (hot key 0 ≈ 10% of rows, rest uniform over
    KEYS), val (≈ROWS/6 distinct values — heavy per-key distinct sets).
    Dim table: one row per key. All columns pure hash functions of the
    row id — deterministic under retries."""
    base = spark.range(ROWS)
    hot = F.pmod(F.xxhash64("id"), F.lit(100)) < F.lit(HOT_SHARE_PCT)
    key = F.when(hot, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(KEYS))
    )
    fact = base.select(
        F.col("id"),
        key.cast("bigint").alias("key"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(ROWS // 6))
        .cast("bigint").alias("val"),
        # incompressible per-row payload: without real bytes behind
        # the key, Catalyst's column pruning strips the fact shuffle
        # down to the key column alone, which compresses to almost
        # nothing — and AQE's byte-based skew detection (correctly)
        # sees no skewed partition. Real fact tables carry payloads.
        F.sha2(F.col("id").cast("string"), 256).alias("blob"),
    )
    dim = spark.range(KEYS).select(
        F.col("id").alias("key"),
        (F.col("id") * 7).cast("bigint").alias("payload"),
    )
    return fact, dim


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def final_plan(sdf) -> str:
    """Post-execution adaptive plan (isFinalPlan=true) as a string."""
    return sdf._jdf.queryExecution().executedPlan().toString()


def main():
    spark = get_spark(
        "skew_stress",
        # shrink AQE's skew thresholds so a 6M-row local run exhibits
        # the same adaptive behavior a 100 TB cluster run would
        **{
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "256k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
            # dim must NOT broadcast or there is no shuffle to skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)
    fact = fact.persist()
    n = fact.count()  # materialize once so gen cost stays out of timings
    res: dict = {"rows": n, "keys": KEYS}

    # --- 1. key_skew_report surfaces the hot key -----------------------
    rep, t_rep = timed(
        lambda: key_skew_report(DaskFrame(fact), "key", top=5).compute()
    )
    hot_row = rep[rep["key"] == 0].iloc[0]
    res["report_sec"] = t_rep
    res["hot_share"] = float(hot_row["share"])
    res["hot_skew_ratio"] = float(hot_row["skew_ratio"])
    ok_report = 0.08 < res["hot_share"] < 0.12 and res["hot_skew_ratio"] > 100

    # --- 2. plain sort-merge join: AQE skew split must fire ------------
    # the agg must CONSUME fact-side columns (blob/id) or pruning
    # empties the skewed shuffle; .collect() (not .first(), which runs
    # a separate limit-query) executes THIS plan so the adaptive final
    # plan (isFinalPlan=true) is readable afterwards
    agg_df = fact.join(dim, "key").agg(
        F.sum("payload").alias("s"),
        F.sum(F.length("blob")).alias("lb"),
        F.count(F.lit(1)).alias("n"),
    )
    jrows, t_plain = timed(agg_df.collect)
    jrow = jrows[0]
    plan = final_plan(agg_df)
    res["plain_join_sec"] = t_plain
    res["aqe_skew_fired"] = "skew=true" in plan
    plain_cnt = int(jrow["n"])
    plain_sum = int(jrow["s"])

    # --- 3. salted_join: identical multiset, measured side by side -----
    def run_salted():
        sj = salted_join(DaskFrame(fact), DaskFrame(dim), on="key", salt=16)
        rows = sj._sdf.agg(
            F.sum("payload").alias("s"),
            F.sum(F.length("blob")).alias("lb"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        return rows[0]

    srow, t_salted = timed(run_salted)
    res["salted_join_sec"] = t_salted
    ok_join = (
        int(srow["n"]) == plain_cnt
        and int(srow["s"]) == plain_sum
        and int(srow["lb"]) == int(jrow["lb"])
    )

    # --- 4. per-key distinct: plain vs skew_safe ------------------------
    def run_plain_nunique():
        out = (
            fact.groupBy("key").agg(F.countDistinct("val").alias("d"))
            .agg(F.sum("d").alias("sd"), F.max("d").alias("md"),
                 F.count(F.lit(1)).alias("nk"))
        )
        return out.first()

    prow, t_pn = timed(run_plain_nunique)

    def run_safe_nunique():
        out = skew_safe_nunique(DaskFrame(fact), "key", "val", buckets=32)
        return out._sdf.agg(
            F.sum("nunique").alias("sd"), F.max("nunique").alias("md"),
            F.count(F.lit(1)).alias("nk"),
        ).first()

    qrow, t_sn = timed(run_safe_nunique)
    res["plain_nunique_sec"] = t_pn
    res["skew_safe_nunique_sec"] = t_sn
    ok_nunique = (
        int(prow["sd"]) == int(qrow["sd"])
        and int(prow["md"]) == int(qrow["md"])
        and int(prow["nk"]) == int(qrow["nk"])
    )

    res["ok_report"] = ok_report
    res["ok_salted_join"] = ok_join
    res["ok_skew_safe_nunique"] = ok_nunique
    print(json.dumps(res))
    print(
        f"\nhot key share={res['hot_share']:.3f} "
        f"(skew_ratio={res['hot_skew_ratio']:.0f}) report={t_rep}s\n"
        f"join: plain={t_plain}s (AQE skew fired: {res['aqe_skew_fired']}) "
        f"salted={t_salted}s multiset-equal={ok_join}\n"
        f"nunique: plain={t_pn}s skew_safe={t_sn}s exact-equal={ok_nunique}"
    )
    if not (ok_report and ok_join and ok_nunique):
        sys.exit(1)


if __name__ == "__main__":
    main()
