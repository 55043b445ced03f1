"""SparkSession factory with scale-oriented defaults.

Design notes (100 TB target): AQE on (runtime coalesce + skew-join),
Arrow for every Python boundary, broadcast threshold generous enough
to catch TPC-H-style dims, shuffle partitions sized for local testing
but overridable via env for cluster runs.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_conf(spark: SparkSession, conf: dict):
    """Set session confs for the duration of a driver-side loop and
    RESTORE them on exit (r16, guide §1.2/§7: per-loop tuning must
    never leak session-global). Values are set through the runtime
    ``spark.conf`` API, so only runtime-mutable keys belong here
    (AQE toggles, shuffle partitions, broadcast thresholds)."""
    old: dict[str, str | None] = {}
    for k in conf:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in conf.items():
            spark.conf.set(k, str(v))
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

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
