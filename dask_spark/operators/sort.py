"""Sorting / partitioning: re-expression of dask's set_index /
sort_values / repartition (reference: dask/dataframe/dask_expr/_shuffle.py,
dask/dataframe/shuffle.py, partitionquantiles.py).

dask samples partition quantiles to compute ``divisions`` then
task-shuffles. Spark's RangePartitioner does exactly that sampling
inside ``repartitionByRange`` / global ``orderBy`` — so set_index is
declared, not hand-built."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F


def set_index(frame, col: str, npartitions: int | None = None):
    """Range-partition by ``col`` and sort within partitions — the
    Spark equivalent of dask's (index, divisions) invariant: rows
    globally ordered across partitions, sorted within each."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    if npartitions:
        sdf = sdf.repartitionByRange(npartitions, F.col(col))
    else:
        sdf = sdf.repartitionByRange(F.col(col))
    return DaskFrame(sdf.sortWithinPartitions(col))


def repartition(frame, npartitions: int | None = None, on: Sequence[str] | None = None):
    """dask repartition(npartitions=) / shuffle(on=). Decreasing
    partition count uses coalesce (no shuffle)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    if on:
        cols = [F.col(c) for c in on]
        sdf = sdf.repartition(npartitions, *cols) if npartitions else sdf.repartition(*cols)
    elif npartitions is not None:
        current = sdf.rdd.getNumPartitions()
        sdf = sdf.coalesce(npartitions) if npartitions < current else sdf.repartition(npartitions)
    return DaskFrame(sdf)


def with_global_index(sdf, order_by, index_col: str = "__idx",
                      num_partitions: int | None = None):
    """Scale-safe global 0-based row index in ``order_by`` order — the
    Spark twin of dask's (index, divisions) bookkeeping, with NO
    single-partition window:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` (range
       boundaries sampled, like dask's partitionquantiles),
    2. one TINY job counts rows per range partition (the only driver
       data is #partitions longs — same as dask's divisions),
    3. ``row_number`` windowed per PARTITION ID (parallel, never a
       global window) + broadcast-joined cumulative offset.

    The ranged plan is persisted so the count pass and the output scan
    agree on partition boundaries. Caller should unpersist when done
    (or let it age out)."""
    from pyspark.sql import Window

    cols = [order_by] if isinstance(order_by, str) else list(order_by)
    n = num_partitions or max(sdf.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        sdf.repartitionByRange(n, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = sdf.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    out = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(index_col, F.row_number().over(w) - 1 + F.col("__off"))
        .drop("__pid", "__off")
    )
    return out


def stratified_sample(frame, col: str, fractions: dict, seed: int = 42):
    """Per-stratum Bernoulli sampling (``sampleBy``) — the
    training-data mixing primitive (per-source quotas); map-only, no
    shuffle, deterministic for a fixed seed and partitioning. Strata
    absent from ``fractions`` are dropped (fraction 0)."""
    from dask_spark.frame import DaskFrame

    return DaskFrame(frame._sdf.sampleBy(col, dict(fractions), seed))
