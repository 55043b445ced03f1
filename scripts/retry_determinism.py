"""Task-retry determinism pin (r13 verdict item 5).

Runs in its OWN process because retries need ``master=local[4, 3]``
(the second slot = spark.task.maxFailures) and a JVM can hold only one
SparkContext — the shared test session is plain ``local[*]`` where any
task failure kills the job.

Injection: a mapInPandas pass-through that RAISES on task attempt 0
(pyspark TaskContext.attemptNumber). Every task of the stage therefore
fails once and succeeds on the retry — so a successful collect is
itself proof the retry machinery fired, and the value comparison
against an uninjected run proves the recomputed values are identical.

Pinned claims (argued in docstrings since r11, measured here):
1. salted_join — the salt is pmod(xxhash64(<row>), S), a pure function
   of the row, so retried big-side tasks land every row in the same
   salt bucket and the join multiset is identical (joins.py:365-409).
2. da.random — counter-keyed draws (seed, row_id, stream) are pure
   functions of the id column, so a recomputed partition re-draws the
   exact same values (random.py:296+).
3. hash-threshold sampling — md5(key) < bound re-selects the SAME rows
   on recomputation (queries.py sample_hash_deterministic; the bag's
   xxhash64-threshold random_sample shares the construction).

Prints one line per pin and RETRY_DETERMINISM_OK at the end; any
mismatch raises.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession


def fail_once(sdf):
    """Pass-through Arrow kernel that fails every task's first attempt."""
    schema = sdf.schema

    def gen(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.attemptNumber() == 0:
            raise RuntimeError("injected fail-once (retry-determinism probe)")
        for pdf in it:
            yield pdf

    return sdf.mapInPandas(gen, schema)


def rows_sorted(sdf):
    return sorted(tuple(r) for r in sdf.collect())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.appName("retry-determinism")
        .master("local[4, 3]")  # 4 threads, task maxFailures=3
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- pin 1: salted_join ------------------------------------------------
    from dask_spark.frame import DaskFrame
    from dask_spark.operators.joins import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    ).withColumnRenamed("c_custkey", "o_custkey")

    clean = rows_sorted(
        salted_join(DaskFrame(orders), DaskFrame(cust), on="o_custkey",
                    salt=8)._sdf
    )
    injected = rows_sorted(
        salted_join(DaskFrame(fail_once(orders)), DaskFrame(cust),
                    on="o_custkey", salt=8)._sdf
    )
    assert injected == clean, (
        f"salted_join diverged under retry: {len(injected)} vs {len(clean)} rows"
    )
    assert len(clean) > 0
    print(f"salted_join: {len(clean)} rows identical under injected retry")

    # -- pin 2: counter-keyed da.random -------------------------------------
    from dask_spark.random import RandomState

    rng = RandomState(spark, seed=7)
    draw_sdf = rng.uniform(0.0, 1.0, n=5000, dim=4, npartitions=8)._sdf
    clean_draw = rows_sorted(
        draw_sdf.select("row_id", F.col("values").cast("array<double>"))
        .select("row_id", F.to_json("values").alias("v"))
    )
    injected_draw = rows_sorted(
        fail_once(draw_sdf)
        .select("row_id", F.col("values").cast("array<double>"))
        .select("row_id", F.to_json("values").alias("v"))
    )
    assert injected_draw == clean_draw, "da.random draw diverged under retry"
    assert len(clean_draw) == 5000
    print("da.random: 5000x4 counter-keyed draws bit-identical under retry")

    # -- pin 3: hash-threshold deterministic sample --------------------------
    sample = orders.filter(
        F.md5(F.col("o_orderkey").cast("string")) < "1a"
    ).select("o_orderkey")
    clean_sample = rows_sorted(sample)
    injected_sample = rows_sorted(
        fail_once(orders).filter(
            F.md5(F.col("o_orderkey").cast("string")) < "1a"
        ).select("o_orderkey")
    )
    assert injected_sample == clean_sample, "hash sample diverged under retry"
    assert len(clean_sample) > 0
    print(f"hash-threshold sample: {len(clean_sample)} rows re-selected "
          "identically under retry")

    # sanity: the injection really fires — an attempt-0 raise under
    # maxFailures=1 semantics would have failed the collects above, and
    # a direct probe shows attempt numbers advanced past 0
    att = fail_once(
        spark.range(0, 8, 1, 4).select(F.col("id"))
    ).mapInPandas(
        _attempt_tagger, "id bigint, attempt int"
    )
    max_attempt = att.agg(F.max("attempt")).first()[0]
    # the tagger stage contains fail_once upstream, so surviving rows
    # report attempt >= 1
    assert max_attempt >= 1, f"retry never fired (max attempt {max_attempt})"
    print(f"retry machinery verified: surviving tasks ran at attempt "
          f">= {max_attempt}")

    print("RETRY_DETERMINISM_OK")
    spark.stop()


def _attempt_tagger(it):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    n = ctx.attemptNumber() if ctx is not None else -1
    for pdf in it:
        pdf = pdf.copy()
        pdf["attempt"] = n
        yield pdf


if __name__ == "__main__":
    main()
