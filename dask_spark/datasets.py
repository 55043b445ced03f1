"""``dask.datasets``-shaped namespace (reference: dask/datasets.py —
timeseries and the demo text generator)."""

from __future__ import annotations

from dask_spark.sources import timeseries  # noqa: F401


def make_people(npartitions: int = 10, records_per_partition: int = 1000,
                seed: int = 42):
    """reference dask/datasets.py make_people — deterministic fake
    person records, generated JVM-side from hash-derived fields (no
    Python faker dependency; same role: demo/testing data)."""
    import pyspark.sql.functions as F

    from dask_spark.bag import Bag
    from dask_spark.session import get_spark

    spark = get_spark()
    n = npartitions * records_per_partition
    rng = spark.range(0, n, 1, npartitions)
    h = F.abs(F.xxhash64(F.col("id") + seed))
    first = F.element_at(
        F.array(*[F.lit(x) for x in (
            "Alice", "Bob", "Charlie", "Dan", "Edith", "Frank", "George",
            "Hannah", "Ingrid", "Jerry")]),
        (h % 10 + 1).cast("int"),
    )
    last = F.element_at(
        F.array(*[F.lit(x) for x in (
            "Anderson", "Durham", "Pasvolsky", "Chen", "Wright", "Kelly",
            "Smith", "Jones", "Patel", "Garcia")]),
        ((h / 10).cast("long") % 10 + 1).cast("int"),
    )
    sdf = rng.select(
        F.struct(
            F.array(first, last).alias("name"),
            (h % 83 + 16).cast("int").alias("age"),
            F.concat(
                (h % 900 + 100).cast("string"), F.lit(" Main St")
            ).alias("address"),
            F.round((h % 100000) / 100.0 + 10000, 2).alias("credit_card"),
        ).alias("value")
    )
    return Bag(sdf, "value")
