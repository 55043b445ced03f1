#!/usr/bin/env python
"""Events-exchange scaling probe (r14, third probe): sessionization,
funnel, and the keyless +1/-1 concurrency sweep at 1×/10×/100× the
sf0.1 events table (100k → 10M events).

Replication gives every replica DISJOINT user ids (user_id + k·10M)
and event ids, with timestamps UNCHANGED — so per-user session/funnel
structure is copied exactly, and the concurrency sweep has a CLOSED
FORM at scale: the same instants carry s× the opens/closes, so every
day's peak must equal EXACTLY s × the 1× peak. That makes this probe
a 10M-row exactness check of the distributed keyless prefix scan
(operators/window.py cumulative: range-bucket + bucket-offset
combine), not just a wall-clock curve.

Measured per scale: wall seconds + exactness invariants —
- sessionize (user-keyed lag window): total sessions == s × base
- funnel signup→view→purchase (user-keyed step-min chain):
  per-step users == s × base
- peak_concurrency (keyless sweep over 2×events markers):
  per-day peak == s × base, checked day-by-day

PROBE_SCALES env overrides (default "1,10,100").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dask_spark.frame import DaskFrame
from dask_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get("PROBE_SCALES", "1,10,100").split(",")]
STEPS = ["signup", "view", "purchase"]


def replicate(spark, scale: int):
    from dask_spark.queries import load

    base = load(spark, SF_DIR, "events").to_spark().select(
        "event_id", "ts", "user_id", "event_type"
    )
    if scale == 1:
        return base
    reps = base.crossJoin(spark.range(scale).select(F.col("id").alias("__r")))
    return reps.select(
        (F.col("event_id") + F.col("__r") * F.lit(100_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__r") * F.lit(10_000_000)).alias("user_id"),
        "event_type",
    ).repartition(32)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main():
    spark = get_spark("scaling-probe-r14c")
    spark.sparkContext.setLogLevel("ERROR")
    from dask_spark.operators.behavior import funnel, peak_concurrency
    from dask_spark.streaming.windows import sessionize_batch

    results = {}
    base_funnel = base_sessions = base_peaks = None
    for scale in SCALES:
        sdf = replicate(spark, scale).persist()
        n = sdf.count()
        frame = DaskFrame(sdf)

        sess, t_sess = timed(
            lambda: sessionize_batch(frame)._sdf.count()
        )
        fun_rows, t_fun = timed(
            lambda: funnel(frame, STEPS)._sdf
            .orderBy("step_idx").collect()
        )
        fun = [int(r["users"]) for r in fun_rows]
        peaks_rows, t_peak = timed(
            lambda: peak_concurrency(frame)._sdf.collect()
        )
        peaks = {r["day"]: int(r["peak"]) for r in peaks_rows}
        sdf.unpersist()

        if scale == SCALES[0]:
            base_sessions, base_funnel, base_peaks = sess, fun, peaks
            factor = 1
        else:
            factor = scale // SCALES[0]
        assert sess == base_sessions * factor, (
            f"sessions not exact at {scale}x: {sess} vs "
            f"{base_sessions}*{factor}")
        assert fun == [u * factor for u in base_funnel], (
            f"funnel not exact at {scale}x: {fun} vs {base_funnel}")
        assert set(peaks) == set(base_peaks)
        for day, p in peaks.items():
            assert p == base_peaks[day] * factor, (
                f"peak not exact at {scale}x on {day}: {p} vs "
                f"{base_peaks[day]}*{factor}")

        results[scale] = {
            "events": n, "markers": 2 * n,
            "sessionize": {"sec": t_sess, "sessions": sess},
            "funnel": {"sec": t_fun, "users": fun},
            "peak_concurrency": {"sec": t_peak,
                                 "max_day_peak": max(peaks.values())},
        }
        print(f"# scale {scale}x: events={n} sessionize={t_sess}s "
              f"({sess} sessions) funnel={t_fun}s {fun} "
              f"peak={t_peak}s (max {max(peaks.values())})",
              file=sys.stderr)

    print(json.dumps({"probe": "events_exchanges_r14", "sf_dir": SF_DIR,
                      "results": results}))
    print("# exactness: sessions, per-step funnel users and per-day "
          "peaks all EXACTLY x-scale at every scale (the keyless "
          "prefix scan is value-exact at 20M markers)", file=sys.stderr)


if __name__ == "__main__":
    main()
