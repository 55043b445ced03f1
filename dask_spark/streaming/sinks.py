"""Exactly-once sink patterns + state-store tuning (SURVEY §7:
"exactly-once sink patterns beyond foreachBatch; RocksDB tuning").

The reference has no streaming engine — this module is Spark-first by
brief. Three delivery patterns, strongest-to-weakest:

1. FILE SINK (``to_parquet_stream``): Spark's FileStreamSink keeps a
   transactional manifest (``_spark_metadata``) — a batch's files
   become visible only when its manifest entry commits, and replayed
   batches are skipped by id. Exactly-once END TO END with zero user
   code, as long as readers go through ``spark.read`` on the sink
   directory (raw ``ls`` sees uncommitted files).
2. IDEMPOTENT foreachBatch (``idempotent_parquet_writer``): each
   micro-batch overwrites its own ``__batch_id=<id>`` partition
   (dynamic partition overwrite). A replay after a crash re-runs the
   same batch_id → overwrites the same partition → no duplicates.
   This is the pattern for sinks without a transaction log.
3. At-least-once + downstream dedup: ``dedup_stream`` (windows.py)
   in front of any sink — when the sink is append-only and the
   payload carries a natural key.

RocksDB state store (``rocksdb_state_conf``): the default (HDFS-
backed) provider keeps EVERY key's state as JVM heap objects —
sessionization / transformWithState over millions of keys GCs itself
to death. RocksDB moves state off-heap with incremental-checkpoint
uploads. Tuning notes (all public Spark docs):

- ``changelogCheckpointing.enabled``: upload only the per-batch
  changelog instead of full SST snapshots — turns checkpoint cost
  O(delta), the single biggest win for large state.
- ``boundedMemoryUsage`` + ``maxMemoryUsageMB``: cap the combined
  block-cache + memtable budget per executor so state can't evict
  the shuffle/storage memory Spark itself needs.
- ``compactOnCommit``: trade commit latency for read amplification;
  enable for read-heavy stateful ops (stream-stream joins).
- state TTL (``stateful_user_stats(ttl_minutes=…)``) bounds state
  SIZE logically; RocksDB bounds where it LIVES physically — use
  both at 100 TB ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF


def to_parquet_stream(stream_sdf: SparkDF, path: str, checkpoint: str,
                      partition_by: list[str] | None = None,
                      trigger_seconds: int | None = None):
    """Exactly-once parquet file sink: the FileStreamSink manifest
    commits a batch's files atomically and skips replayed batch ids.
    Returns the started StreamingQuery."""
    w = (
        stream_sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def idempotent_parquet_writer(path: str):
    """foreachBatch fn with exactly-once delivery via batch-id
    partition overwrite: a replayed batch rewrites ``__batch_id=<id>``
    instead of appending a second copy. Pair with foreach_batch_sink;
    read the result with ``spark.read.parquet(path)`` (drop
    ``__batch_id`` if unwanted)."""
    import pyspark.sql.functions as F

    def write(batch_df, batch_id: int):
        (
            batch_df.withColumn("__batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )

    return write


def rocksdb_state_conf(max_memory_mb: int | None = None,
                       compact_on_commit: bool = False) -> dict:
    """Config dict enabling the RocksDB state store with changelog
    checkpointing (see module docstring for the tuning rationale).
    Apply with ``for k, v in rocksdb_state_conf().items():
    spark.conf.set(k, v)`` BEFORE starting the stateful query."""
    conf = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
        "spark.sql.streaming.stateStore.rocksdb.compactOnCommit":
            str(compact_on_commit).lower(),
    }
    if max_memory_mb is not None:
        conf.update({
            "spark.sql.streaming.stateStore.rocksdb."
            "boundedMemoryUsage": "true",
            "spark.sql.streaming.stateStore.rocksdb."
            "maxMemoryUsageMB": str(int(max_memory_mb)),
        })
    return conf
