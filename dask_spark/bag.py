"""dask.bag parity (reference: dask/bag/core.py Bag) — a thin wrapper
over a one-column DataFrame of items.

Design: bag items live in a single ``item`` column. Structured ops
(pluck/frequencies/topk/foldby) lower to DataFrame expressions (JVM);
``map``/``filter`` accept either a Column-expression builder (fast
path, stays in codegen) or an arbitrary Python callable (Arrow-batched
mapInPandas — dask's model, the slow path)."""

from __future__ import annotations

import builtins as _builtins
from typing import Callable

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


class Bag:
    def __init__(self, sdf, col: str = "item"):
        self._sdf = sdf
        self._col = col

    # ---- construction ------------------------------------------------
    @classmethod
    def from_sequence(cls, items, npartitions: int | None = None) -> "Bag":
        """dask from_sequence slices CONTIGUOUSLY (partition 0 gets the
        first chunk) — round-robin repartition would scramble the
        sequence order that accumulate/fold observe, so partitioning
        goes by range over the position."""
        from dask_spark.sources import _spark

        sdf = _spark().createDataFrame(
            [(i, x) for i, x in enumerate(items)], ["__i", "item"]
        )
        if npartitions:
            sdf = (
                sdf.repartitionByRange(npartitions, "__i")
                .sortWithinPartitions("__i")
            )
        return cls(sdf.drop("__i"))

    # ---- transforms --------------------------------------------------
    def map(self, fn, dtype: str = "string") -> "Bag":
        """Column-builder (fast) or python callable (mapInPandas)."""
        from pyspark.sql import Column

        try:
            probe = fn(F.col(self._col))
        except Exception:  # a plain python fn chokes on a Column probe
            probe = None

        if isinstance(probe, Column):
            return Bag(self._sdf.select(probe.alias(self._col)), self._col)

        col = self._col

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame({col: pdf[col].map(fn)})

        return Bag(self._sdf.mapInPandas(gen, schema=f"{col} {dtype}"), col)

    def filter(self, fn) -> "Bag":
        from pyspark.sql import Column

        try:
            probe = fn(F.col(self._col)) if callable(fn) else fn
        except Exception:
            probe = None

        if isinstance(probe, Column):
            return Bag(self._sdf.filter(probe), self._col)

        col = self._col

        def gen(batches):
            for pdf in batches:
                yield pdf[pdf[col].map(fn)]

        return Bag(
            self._sdf.mapInPandas(gen, schema=self._sdf.schema), col
        )

    def pluck(self, field) -> "Bag":
        """Project a field out of struct/map items (dask pluck). An
        int plucks by POSITION (tuple items arrive as structs with
        _1/_2… field names — resolve through the schema)."""
        if isinstance(field, int):
            from pyspark.sql.types import StructType

            dt = self._sdf.schema[self._col].dataType
            if isinstance(dt, StructType):
                field = dt.names[field]
        return Bag(
            self._sdf.select(F.col(f"{self._col}.{field}").alias(self._col)),
            self._col,
        )

    def map_json(self, schema: str) -> "Bag":
        """Parse JSON-string items into structs (read_text → json lines)."""
        return Bag(
            self._sdf.select(
                F.from_json(F.col(self._col), schema).alias(self._col)
            ),
            self._col,
        )

    def flatten(self) -> "Bag":
        return Bag(
            self._sdf.select(F.explode(F.col(self._col)).alias(self._col)),
            self._col,
        )

    def distinct(self) -> "Bag":
        return Bag(self._sdf.select(self._col).distinct(), self._col)

    # ---- reductions --------------------------------------------------
    def frequencies(self) -> DaskFrame:
        return DaskFrame(
            self._sdf.groupBy(F.col(self._col).alias("item"))
            .agg(F.count(F.lit(1)).alias("count"))
        )

    def topk(self, k: int, key: Callable | None = None) -> list:
        """k largest items (TakeOrdered — no global sort). ``key`` may
        be a Column builder."""
        col = key(F.col(self._col)) if key else F.col(self._col)
        rows = (
            self._sdf.select(F.col(self._col), col.alias("__k"))
            .orderBy(F.col("__k").desc())
            .limit(k)
            .collect()
        )
        return [r[0] for r in rows]

    def foldby(self, key_fn, value_expr) -> DaskFrame:
        """Grouped reduction (dask foldby ≈ ACA): key/value are Column
        builders; lowering is one partial+final hash aggregate."""
        return DaskFrame(
            self._sdf.groupBy(key_fn(F.col(self._col)).alias("key"))
            .agg(value_expr(F.col(self._col)).alias("value"))
        )

    def random_sample(self, prob: float, seed: int = 42) -> "Bag":
        """Bernoulli sample (dask bag random_sample), DETERMINISTIC
        under the seed: the keep decision is a hash threshold over the
        item value + seed (the frame side's sample_hash_deterministic
        stance), because ``sdf.sample`` re-draws whenever the upstream
        range partitioner re-samples its boundaries — the same bag
        sampled twice returned different elements (r13 ported-test
        finding). Caveat vs dask: identical items share one decision
        (dask decides per element position)."""
        if not 0 <= prob <= 1:
            raise ValueError(f"prob must be in [0, 1], got {prob}")
        # round, not truncate: int(0.3 * 1e6) == 299999 — a systematic
        # ~1e-6 under-sample for any prob that isn't float-exact
        bound = round(prob * 1_000_000)
        keep = (
            F.pmod(
                F.xxhash64(F.col(self._col), F.lit(int(seed))),
                F.lit(1_000_000),
            )
            < F.lit(bound)
        )
        return Bag(self._sdf.filter(keep), self._col)

    # ---- numeric reductions (reference: bag/core.py sum/max/...) -----
    def _num_agg(self, agg):
        return self._sdf.agg(agg(F.col(self._col).cast("double"))).first()[0]

    def sum(self):
        return self._num_agg(F.sum)

    def max(self):
        return self._num_agg(F.max)

    def min(self):
        return self._num_agg(F.min)

    def mean(self):
        return self._num_agg(F.avg)

    def std(self, ddof: int = 0):
        """dask Bag.std defaults to POPULATION std (ddof=0 — unlike
        pandas); ddof=1 gives the sample form (r13 parity fix: this
        engine previously pinned the sample form as the only one)."""
        return self._num_agg(F.stddev_samp if ddof else F.stddev_pop)

    def var(self, ddof: int = 0):
        """dask Bag.var defaults to POPULATION variance (ddof=0)."""
        return self._num_agg(F.var_samp if ddof else F.var_pop)

    def product(self):
        return self._num_agg(F.product)

    def any(self) -> bool:
        return bool(self._sdf.agg(F.max(F.col(self._col).cast("boolean"))).first()[0])

    def all(self) -> bool:
        return bool(self._sdf.agg(F.min(F.col(self._col).cast("boolean"))).first()[0])

    def fold(self, binop: Callable, initial) -> object:
        """ACA fold (reference: bag/core.py fold): ``binop`` folds
        within each partition (Arrow batches), then the per-partition
        partials — one value each — fold on the driver. ``binop`` must
        be associative, like dask's contract."""
        import functools

        import pandas as pd

        col, dtype = self._col, dict(self._sdf.dtypes)[self._col]

        def run(it):
            acc, seen = initial, False
            for pdf in it:
                for v in pdf[col]:
                    acc, seen = binop(acc, v), True
            if seen:
                yield pd.DataFrame({col: [acc]})

        partials = [
            r[0] for r in self._sdf.mapInPandas(run, schema=f"{col} {dtype}").collect()
        ]
        return functools.reduce(binop, partials, initial)

    def remove(self, fn) -> "Bag":
        """Drop items where fn is true (reference: bag/core.py remove).
        ``fn`` is a Column-builder predicate like filter's."""
        return Bag(self._sdf.filter(~fn(F.col(self._col))), self._col)

    def starmap(self, fn: Callable, dtype: str = "string") -> "Bag":
        """fn(*item) per item of array/struct items (reference:
        bag/core.py starmap) — Arrow-batched."""
        import pandas as pd

        col = self._col

        def _args(v):
            # Arrow delivers struct items as dicts — *dict unpacks the
            # FIELD NAMES, so spread the values in field order instead
            # (r13 ported-test finding: fn('_1','_2') not fn(1, 2))
            return tuple(v.values()) if isinstance(v, dict) else tuple(v)

        def gen(batches):
            for pdf in batches:
                yield pd.DataFrame({col: [fn(*_args(v)) for v in pdf[col]]})

        return Bag(self._sdf.mapInPandas(gen, schema=f"{col} {dtype}"), col)

    def map_partitions(self, fn: Callable, dtype: str | None = None) -> "Bag":
        """fn over each partition's item list (reference: bag/core.py
        map_partitions)."""
        import pandas as pd

        col = self._col
        dtype = dtype or dict(self._sdf.dtypes)[col]

        def gen(batches):
            for pdf in batches:
                if len(pdf):
                    yield pd.DataFrame({col: list(fn(list(pdf[col])))})

        return Bag(self._sdf.mapInPandas(gen, schema=f"{col} {dtype}"), col)

    def repartition(self, npartitions: int) -> "Bag":
        return Bag(self._sdf.repartition(npartitions), self._col)

    def groupby(self, key_fn, key_dtype: str = "string") -> DaskFrame:
        """Group items by a python key fn (reference: bag/core.py
        groupby — dask warns it is a full shuffle; same here): one
        Arrow-batched key projection + groupBy collect_list."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _k(s):
            return pd.Series([key_fn(v) for v in s])

        _k.__annotations__ = {"s": pd.Series, "return": pd.Series}
        u = pandas_udf(key_dtype)(_k)
        return DaskFrame(
            self._sdf.groupBy(u(F.col(self._col)).alias("key"))
            .agg(F.collect_list(self._col).alias("items"))
        )

    def to_textfiles(self, path: str, mode: str = "overwrite"):
        """One text line per item (reference: bag/text.py
        to_textfiles)."""
        self._sdf.select(
            F.col(self._col).cast("string").alias("value")
        ).write.mode(mode).text(path)

    def zip(self, other: "Bag") -> "Bag":
        """Positional zip (reference: dask/bag/core.py Bag.zip — dask
        pairs the i-th items of equally-partitioned bags, partition by
        partition). Same contract here: both bags must share partition
        structure (built the same way); items pair within each
        partition by scan position. One join keyed on (partition, pos)
        — skew-free by construction."""
        from pyspark.sql import Window

        def tag(sdf, col, item_alias):
            tagged = sdf.select(
                F.col(col).alias(item_alias),
                F.spark_partition_id().alias("__pid"),
                F.monotonically_increasing_id().alias("__mid"),
            )
            w = Window.partitionBy("__pid").orderBy("__mid")
            return tagged.withColumn(
                "__pos", F.row_number().over(w)
            ).drop("__mid")

        left = tag(self._sdf, self._col, "__l")
        right = tag(other._sdf, other._col, "__r")
        out = left.join(right, ["__pid", "__pos"]).select(
            F.struct(F.col("__l").alias("left"),
                     F.col("__r").alias("right")).alias("item")
        )
        return Bag(out)

    def count(self) -> int:
        return self._sdf.count()

    def take(self, n: int) -> list:
        return [r[0] for r in self._sdf.limit(n).collect()]

    def to_dataframe(self) -> DaskFrame:
        sdf = self._sdf
        if dict(sdf.dtypes)[self._col].startswith("struct"):
            sdf = sdf.select(f"{self._col}.*")
        return DaskFrame(sdf)

    def compute(self) -> list:
        return [r[0] for r in self._sdf.collect()]


# dask.bag-shaped module-level constructors (reference: dask/bag/__init__.py)
def from_sequence(items, npartitions: int | None = None) -> "Bag":
    return Bag.from_sequence(items, npartitions)


def read_text(path: str) -> "Bag":
    from dask_spark.sources import read_text as _rt

    return _rt(path)


# ---- long tail (reference: dask/bag/core.py Bag) -----------------------

def _pickle64(obj) -> str:
    import base64
    import pickle

    return base64.b64encode(pickle.dumps(obj)).decode()


def _unpickle64(s: str):
    import base64
    import pickle

    return pickle.loads(base64.b64decode(s))


def _bag_unzip(self, n: int):
    """Bag of n-tuples → n Bags (reference: Bag.unzip) — each output
    plucks one position; the plans share the parent scan."""
    return tuple(self.pluck(i) for i in _builtins.range(n))


def _bag_reduction(self, perpartition: Callable, aggregate: Callable):
    """Per-partition python fold + driver aggregate (reference:
    Bag.reduction — dask's reduction tree collapsed to two levels:
    ONE pickled value per partition crosses the wire)."""
    import pandas as pd

    col = self._col

    def run(batches):
        items = []
        for pdf in batches:
            items.extend(pdf[col].tolist())
        if items:
            yield pd.DataFrame({"part": [_pickle64(perpartition(items))]})

    parts = [
        _unpickle64(r["part"])
        for r in self._sdf.mapInPandas(run, "part string").collect()
    ]
    return aggregate(parts)


def _bag_join(self, other: "Bag", on_self: Callable,
              on_other: Callable | None = None) -> "Bag":
    """Equi-join two bags on computed keys (reference: Bag.join):
    keys become real columns, the join is an ordinary shuffle join,
    output items are (left, right) structs."""
    import pandas as pd

    key_other = on_other or on_self

    def keyed(bag, key_fn, out):
        col = bag._col
        dt = dict(bag._sdf.dtypes)[col]

        def gen(batches):
            for pdf in batches:
                # repr, not str: distinguishes 1 from "1" from None —
                # str() would alias distinct keys into spurious matches
                yield pd.DataFrame(
                    {"k": [repr(key_fn(x)) for x in pdf[col]], out: pdf[col]}
                )

        return bag._sdf.mapInPandas(gen, f"k string, {out} {dt}")

    left = keyed(self, on_self, "__l")
    right = keyed(other, key_other, "__r")
    # dask's join yields (other_element, self_element) tuples
    # (reference: dask/bag/core.py:1184 doctest) — tuple-style _1/_2
    # field names so positional pluck unpacks like the reference
    joined = left.join(right, "k").select(
        F.struct(
            F.col("__r").alias("_1"), F.col("__l").alias("_2")
        ).alias(self._col)
    )
    return Bag(joined, self._col)


_accumulate_no_default = object()


def _bag_accumulate(self, binop: Callable,
                    initial=_accumulate_no_default) -> "Bag":
    """Prefix scan with toolz/dask semantics (reference:
    Bag.accumulate, dask/bag/core.py:1700): without ``initial``,
    output[0] = items[0] and output[i] = binop(output[i-1], items[i]);
    with ``initial``, the initial value itself is the FIRST output
    element (n+1 items, e.g. [-1, 0, 2, 5, 9, 14]). Classic two-pass
    cross-partition carry — per-partition UNSEEDED reduce produces one
    pickled carry per partition, the driver prefix-combines them
    (initial enters ONCE, so a non-identity initial stays correct),
    then each partition rescans from its seed. ``binop`` must be
    associative, as dask requires; partition order follows
    spark_partition_id like the keyless window machinery."""
    import functools

    import pandas as pd

    has_initial = initial is not _accumulate_no_default
    col = self._col
    dt = dict(self._sdf.dtypes)[col]
    part = self._sdf.select(
        F.spark_partition_id().alias("__p"), F.col(col)
    ).persist()

    def totals(batches):
        items, pid = [], None
        for pdf in batches:
            for p, x in _builtins.zip(pdf["__p"], pdf[col]):
                pid = int(p)
                items.append(x)
        if items:
            yield pd.DataFrame(
                {"p": [pid], "tot": [_pickle64(functools.reduce(binop, items))]}
            )

    rows = part.mapInPandas(totals, "p int, tot string").collect()
    tot = {int(r["p"]): _unpickle64(r["tot"]) for r in rows}
    if not tot:
        part.unpersist()
        return (Bag.from_sequence([initial], npartitions=1)
                if has_initial else Bag(self._sdf, col))
    first_pid = min(tot)
    seeds, acc, seen_first = {}, initial, False
    for p in sorted(tot):
        # the first non-empty partition is unseeded in the no-initial
        # form: its scan starts at its own first item
        seeds[p] = _pickle64(acc) if (has_initial or seen_first) else None
        seen_first = True
        acc = tot[p] if seeds[p] is None else binop(acc, tot[p])

    def rescan(batches):
        acc, started = None, False
        for pdf in batches:
            out = []
            for p, x in _builtins.zip(pdf["__p"], pdf[col]):
                if not started:
                    seed = seeds[int(p)]
                    started = True
                    if has_initial and int(p) == first_pid:
                        # toolz: the initial value leads the output
                        out.append(_unpickle64(seed))
                    if seed is None:
                        acc = x
                        out.append(acc)
                        continue
                    acc = _unpickle64(seed)
                acc = binop(acc, x)
                out.append(acc)
            if out:
                yield pd.DataFrame({col: out})

    # materialize BEFORE releasing the cache: the rescan must read the
    # same partition contents the seeds were computed from (an eager
    # unpersist would recompute `part` from lineage at collect time —
    # wasted work, and wrong seeds if the lineage is nondeterministic)
    res = part.mapInPandas(rescan, f"{col} {dt}").localCheckpoint(eager=True)
    part.unpersist()
    return Bag(res, col)


def _bag_to_delayed(self):
    """One Delayed per partition (reference: Bag.to_delayed)."""
    return DaskFrame(self._sdf).to_delayed()


Bag.unzip = _bag_unzip
Bag.reduction = _bag_reduction
Bag.join = _bag_join
Bag.accumulate = _bag_accumulate
Bag.to_delayed = _bag_to_delayed


# ---- bag.random (reference: dask/bag/random.py:12 sample, :40 choices)
def sample(population: "Bag", k: int, seed: int = 0) -> "Bag":
    """k unique random elements (reference: dask/bag/random.py:12 —
    dask runs a two-level weighted reservoir reduction; here each
    element draws one deterministic hash key over its row identity and
    a TakeOrdered keeps the k smallest: one pass, exact k, no
    reservoir state, reproducible for a fixed seed + partitioning).
    Row identity (not value) keys the draw, so duplicate values keep
    independent chances like real elements."""
    col = population._col
    keyed = population._sdf.select(
        F.col(col),
        F.xxhash64(F.monotonically_increasing_id(), F.lit(seed))
        .alias("__k"),
    )
    out = keyed.orderBy("__k").limit(int(k)).select(col)
    return Bag(out, col)


def choices(population: "Bag", k: int = 1, seed: int = 0) -> "Bag":
    """k elements WITH replacement (reference: dask/bag/random.py:40).
    Draw j picks the element whose (identity, j, seed) hash is
    minimal — k independent uniform picks in ONE map + one k-group
    min_by aggregate (map-side partials; only k rows shuffle), instead
    of k passes over the bag."""
    col = population._col
    ex = population._sdf.select(
        F.col(col),
        F.monotonically_increasing_id().alias("__mid"),
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("__d"),
    )
    out = (
        ex.groupBy("__d")
        .agg(F.min_by(
            F.col(col),
            F.xxhash64(F.col("__mid"), F.col("__d"), F.lit(seed)),
        ).alias(col))
        .select(col)
    )
    return Bag(out, col)


class Item:
    """reference dask/bag/core.py Item — a single lazy value derived
    from a Bag computation (what fold/reduction return in dask). Thin
    wrapper over Delayed with the Bag-facing name."""

    def __init__(self, fn):
        from dask_spark.delayed import delayed

        self._delayed = delayed(fn)() if callable(fn) else fn

    def compute(self):
        return (
            self._delayed.compute()
            if hasattr(self._delayed, "compute")
            else self._delayed
        )

    @classmethod
    def from_delayed(cls, d) -> "Item":
        out = cls.__new__(cls)
        out._delayed = d
        return out


def from_url(url: str) -> "Bag":
    """reference dask/bag/text.py from_url — lines of a remote text
    resource as a Bag. The fetch is one driver-side HTTP GET (same as
    dask: from_url reads the resource once, then the lines
    distribute); the parallelize happens on the fetched lines."""
    import urllib.request

    from dask_spark.sources import _spark

    with urllib.request.urlopen(url) as resp:  # noqa: S310
        text = resp.read().decode("utf-8", errors="replace")
    lines = text.splitlines()
    sdf = _spark().createDataFrame(
        [(ln,) for ln in lines], "item string"
    )
    return Bag(sdf, "item")


def _bag_to_avro(self, path: str, **options):
    """reference dask/bag/avro.py to_avro — writes the bag's records
    via Spark's external avro writer; same option plumbing and absent-
    package error as sources.read_avro (spark-avro is not baked into
    this container)."""
    w = self._sdf.write.format("avro").mode(options.pop("mode", "overwrite"))
    for k, v in options.items():
        w = w.option(k, v)
    try:
        w.save(path)
    except Exception as e:
        # only the actual missing-data-source markers — the user's
        # own path may contain the substring "avro"
        msg = str(e)
        if ("DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find data source" in msg
                or "ClassNotFoundException" in msg):
            raise ImportError(
                "to_avro needs the spark-avro package on the classpath "
                "(--packages org.apache.spark:spark-avro_2.13:<version>)"
            ) from e
        raise
    return path


Bag.to_avro = _bag_to_avro


# ---- module-level twins (reference dask/bag/__init__.py __all__:
# map/range/zip/concat/from_delayed/map_partitions/to_textfiles/
# read_avro/assert_eq/compute — the full import-parity surface for
# ``import dask_spark.bag as db``). -------------------------------------
def concat(bags) -> "Bag":
    """reference dask/bag/core.py concat — one bag holding every
    element of the inputs, partition structure preserved (a unionAll,
    no shuffle)."""
    bags = list(bags)
    if not bags:
        raise ValueError("concat needs at least one bag")
    col = bags[0]._col
    out = bags[0]._sdf.select(F.col(col).alias("item"))
    for b in bags[1:]:
        out = out.union(b._sdf.select(F.col(b._col).alias("item")))
    return Bag(out, "item")


def map(fn, bag, *rest, **kwargs) -> "Bag":
    """reference dask/bag/core.py bag_map — apply ``fn`` elementwise.
    One bag maps directly; two bags zip positionally then starmap;
    plain-python extra arguments broadcast via kwargs."""
    if kwargs:
        import functools

        fn = functools.partial(fn, **kwargs)
    if not rest:
        return bag.map(fn)
    if len(rest) == 1:
        z = bag.zip(rest[0])
        c = z._col

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame({c: [
                    fn(s["left"], s["right"]) for s in pdf[c]
                ]})

        return Bag(z._sdf.mapInPandas(gen, schema=f"{c} string"), c)
    raise NotImplementedError("map over >2 bags: zip then starmap")


def range(n: int, npartitions: int | None = None) -> "Bag":
    """reference dask/bag/core.py bag_range — 0..n-1. spark.range is
    the planner-native path (no driver list, splittable)."""
    from dask_spark.sources import _spark

    sdf = _spark().range(int(n))
    if npartitions:
        sdf = sdf.repartitionByRange(npartitions, "id")
    return Bag(sdf.select(F.col("id").alias("item")), "item")


def zip(*bags) -> "Bag":
    """reference dask/bag/core.py bag_zip — positional n-way zip.
    Pairs delegate to Bag.zip; wider zips fold left with the same
    (partition, scan-position) join key."""
    if len(bags) < 2:
        raise ValueError("zip needs at least two bags")
    out = bags[0]
    for b in bags[1:]:
        out = out.zip(b)
    return out


def map_partitions(fn, bag, **kwargs) -> "Bag":
    return bag.map_partitions(fn, **kwargs)


def to_textfiles(bag, path: str, **kwargs):
    return bag.to_textfiles(path, **kwargs)


def from_delayed(values) -> "Bag":
    """reference dask/bag/core.py from_delayed — one partition per
    delayed list. The delayeds run driver-side (they are plain python
    thunks); the result distributes via from_sequence with the same
    partition boundaries."""
    values = list(values)
    parts = [v.compute() if hasattr(v, "compute") else list(v)
             for v in values]
    items = [x for p in parts for x in p]
    return from_sequence(items, npartitions=max(len(parts), 1))


def read_avro(path: str, **options) -> "Bag":
    """reference dask/bag/avro.py read_avro — bag of record structs
    over the external spark-avro reader (same absent-package gate as
    sources.read_avro)."""
    from dask_spark.sources import read_avro as _read_frame

    f = _read_frame(path, **options)
    sdf = f._sdf.select(F.struct(*f._sdf.columns).alias("item"))
    return Bag(sdf, "item")


def assert_eq(a, b, **kwargs) -> None:
    """reference dask/bag/utils.py assert_eq — computed contents must
    match; order-insensitive like the reference's sorted comparison."""
    ca = a.compute() if hasattr(a, "compute") else list(a)
    cb = b.compute() if hasattr(b, "compute") else list(b)
    try:
        sa, sb = sorted(ca), sorted(cb)
    except TypeError:  # unorderable mixed items — compare as-is
        sa, sb = ca, cb
    assert sa == sb, f"bags differ: {sa[:5]!r}... != {sb[:5]!r}..."


from dask_spark.delayed import compute  # noqa: E402,F401
