"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB target): AQE on (runtime coalesce + skew-join),
Arrow for every Python boundary, broadcast threshold generous enough
to catch TPC-H-style dims, shuffle partitions sized for local testing
but overridable via env for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# NOTE (r16): a scoped_conf set-and-restore helper for per-loop AQE /
# shuffle-partition tuning was written, measured inside the star-CC
# convergence loop, and REMOVED: with AQE off the per-round mins join
# loses its runtime broadcast conversion and runs as a static SMJ
# (dedup_clusters_star 6.6s -> 22.1s at 32 cores; still 9.0s with loop
# partitions forced to 8). AQE's query-stage jobs are the cheaper
# floor on every driver-loop operator measured (OPTIMIZATION_r16.md
# §2.3).

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Spark 4.1's streaming checkpoint file-checksum manager races on
    # the local filesystem (state-store commit dies with
    # FileNotFoundException on <state>/right-keyWithIndexToValue while
    # the checksum future creates its sibling file) — keep the pre-4.1
    # no-checksum behavior; overridable per-session like every default.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "dask_spark", **conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``);
    shuffle partitions default to that same width so local runs do not
    create thousands of empty reducers, while a cluster deployment
    overrides via ``spark.sql.shuffle.partitions``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    shuffle = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus if cpus != "*" else "32"
    )
    merged = dict(_DEFAULTS)
    merged["spark.sql.shuffle.partitions"] = shuffle
    merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
