"""Frame-level reductions (reference: dask/dataframe/dask_expr/_reductions.py
ApplyConcatApply and dask/dataframe/core.py describe).

All reductions are declarative aggs → Spark partial+final hash aggregate
(map-side combine), identical in shape to dask's ACA tree-reduce but
JVM-codegen'd."""

from __future__ import annotations

import pyspark.sql.functions as F


def describe(frame, percentiles=None):
    """Long-form describe: one row per numeric column with
    count/mean/std/min/<quantiles>/max. Long form (not pandas' wide
    form) so the schema is stable for the oracle compare.

    ``percentiles`` (reference dask_expr/_describe.py parameter):
    quantile levels to report instead of the default
    (0.25, 0.5, 0.75); labels are q25/q50/q75-style (q5_5 for 0.055),
    so the default schema is unchanged."""
    from dask_spark.frame import DaskFrame

    pcts = (
        [0.25, 0.5, 0.75] if percentiles is None
        else sorted(float(p) for p in percentiles)
    )
    if any(not 0.0 <= p <= 1.0 for p in pcts):
        raise ValueError("percentiles must be in [0, 1]")
    labels = [("q" + f"{p * 100:g}".replace(".", "_")) for p in pcts]
    if len(set(labels)) != len(labels):
        raise ValueError("duplicate percentiles")
    cols = frame._numeric_cols()
    sdf = frame._sdf
    # one pass: aggregate every stat for every column, then unpivot
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__count"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__std"),
            F.min(c).cast("double").alias(f"{c}__min"),
            *[
                F.percentile(c, F.lit(p)).cast("double")
                .alias(f"{c}__{lab}")
                for p, lab in zip(pcts, labels)
            ],
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = sdf.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__count").cast("bigint").alias("count"),
            F.col(f"{c}__mean").alias("mean"),
            F.col(f"{c}__std").alias("std"),
            F.col(f"{c}__min").alias("min"),
            *[F.col(f"{c}__{lab}").alias(lab) for lab in labels],
            F.col(f"{c}__max").alias("max"),
        )
        for c in cols
    ]
    out = wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    return DaskFrame(out)


def histogram(frame, col: str, bins: int = 10,
              range: tuple[float, float] | None = None,
              weights: str | None = None, density: bool = False):
    """dask.array.histogram parity: fixed-width histogram as ONE
    map-side-combined groupBy over floor((x-lo)/w) (clamped to the last
    bin, values outside [lo, hi] dropped — numpy semantics). When
    ``range`` is omitted a first tiny agg job finds (min, max), same as
    dask needing known range for lazy histograms.

    ``weights``: a column name — each sample contributes its weight
    instead of 1 (reference routines.py:861 weights=). ``density``:
    normalize so the integral over the range is 1 (n / (total·width));
    the normalizing total comes from an unpartitioned window over the
    POST-AGG frame (≤ bins rows — safe at any input scale)."""
    import pyspark.sql.functions as F

    from dask_spark.frame import DaskFrame

    if range is None:
        lo, hi = frame._sdf.agg(F.min(col), F.max(col)).first()
        if lo is None or hi is None:
            lo, hi = 0.0, 1.0  # numpy's default range for empty input
        lo, hi = float(lo), float(hi)
        if lo == hi:  # constant column: numpy widens to (v-0.5, v+0.5)
            lo, hi = lo - 0.5, hi + 0.5
    else:
        lo, hi = float(range[0]), float(range[1])
    w = (hi - lo) / bins
    x = F.col(col).cast("double")
    bucket = F.least(F.floor((x - F.lit(lo)) / F.lit(w)), F.lit(bins - 1))
    agg = (
        F.count(F.lit(1)) if weights is None
        else F.sum(F.col(weights).cast("double"))
    )
    out = (
        frame._sdf.filter((x >= lo) & (x <= hi))
        .groupBy(bucket.cast("int").alias("bucket"))
        .agg(agg.alias("n"))
        .withColumn("bin_lo", F.lit(lo) + F.col("bucket") * F.lit(w))
        .withColumn("bin_hi", F.lit(lo) + (F.col("bucket") + 1) * F.lit(w))
    )
    if density:
        from pyspark.sql import Window

        total = F.sum("n").over(Window.partitionBy())
        out = out.withColumn("n", F.col("n") / (total * F.lit(w)))
    return DaskFrame(out)
