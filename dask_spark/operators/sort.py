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


def stratified_sample(frame, col: str, fractions: dict, seed: int = 42):
    """Per-stratum Bernoulli sampling (``sampleBy``) — the
    training-data mixing primitive (per-source quotas); map-only, no
    shuffle, deterministic for a fixed seed and partitioning. Strata
    absent from ``fractions`` are dropped (fraction 0)."""
    from dask_spark.frame import DaskFrame

    return DaskFrame(frame._sdf.sampleBy(col, dict(fractions), seed))
