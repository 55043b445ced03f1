"""Corpus-mixing operators for training-data pipelines (brief-mandated
extension class; the reference's closest surface is stratified
sampling, dask/dataframe/dask_expr/_collection.py sample — these add
the per-source weighting a data-mix recipe actually uses)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def temperature_mix(frame, source_col: str = "source",
                    id_col: str = "doc_id", alpha: float = 0.5,
                    scale: float = 10.0):
    """Temperature-weighted per-source sampling: keep
    ``ceil(scale * N_s^alpha)`` docs from each source — alpha < 1
    up-weights small sources relative to proportional sampling (the
    standard multilingual/multi-domain mixing recipe). Selection order
    is md5(id) — deterministic, unbiased by ingest order, reproducible
    across engines and runs (same idiom as hash-threshold sampling).

    100 TB shape: ONE shuffle on source — the per-source count and the
    hash-rank window share the same partitioning, so Catalyst plans a
    single exchange; no driver round-trip for the quotas. For alpha=0.5
    the weight uses sqrt() (IEEE correctly-rounded in every engine) so
    quota boundaries are oracle-exact.

    Production note: to hit an exact global token budget M, set
    scale = M / Σ_s N_s^alpha (one tiny agg); keeping scale explicit
    keeps the operator a pure function of the row set."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    w_n = Window.partitionBy(source_col)
    w_r = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    n_s = F.count(F.lit(1)).over(w_n).cast("double")
    weight = F.sqrt(n_s) if alpha == 0.5 else F.pow(n_s, F.lit(alpha))
    quota = F.ceil(weight * F.lit(scale))
    out = (
        sdf.withColumn("__rn", F.row_number().over(w_r))
        .withColumn("__quota", quota)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )
    return DaskFrame(out)
