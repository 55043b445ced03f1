"""Deduplication family.

``drop_duplicates`` mirrors the reference
(dask/dataframe/dask_expr/_collection.py drop_duplicates — hash shuffle
on the subset then per-partition dedup; Spark: dropDuplicates /
min_by-keep-first, same single shuffle).

The near-dup operators (MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine) are the 100 TB scale path for LLM corpus dedup:
candidate generation shuffles only (bucket_key → doc ids), verification
joins happen within buckets, and all hashing is JVM-side (xxhash64 /
higher-order array fns) — no Python in the hot path."""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.functions.text import shingles, word_tokens


def drop_duplicates(frame, subset: Sequence[str] | None = None, keep: str = "any"):
    """keep="any": Spark dropDuplicates (fastest — partial dedup
    map-side). keep="first"/"last": deterministic via min_by/max_by on a
    tie-break of all remaining columns (Spark has no row order, so
    "first" is defined by the natural sort of the other columns)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    if subset is None or keep == "any":
        return DaskFrame(sdf.dropDuplicates(subset))
    subset = list(subset)
    others = [c for c in sdf.columns if c not in subset]
    order = F.struct(*[F.col(c) for c in others])
    pick = F.min_by if keep == "first" else F.max_by
    aggs = [pick(F.col(c), order).alias(c) for c in others]
    return DaskFrame(sdf.groupBy(*subset).agg(*aggs))


def exact_dedup(frame, text_col: str = "text", id_col: str = "doc_id"):
    """Exact content dedup by 256-bit hash: keep the lowest id per
    distinct content. Single uniform shuffle on sha2 — no skew at any
    scale (hash keys are uniform by construction)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    out = (
        sdf.withColumn("__h", F.sha2(F.col(text_col), 256))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h")
    )
    return DaskFrame(out)


def minhash_signatures(sdf, text_col: str, id_col: str, num_hashes: int = 64,
                       shingle_k: int = 5):
    """MinHash signature per doc, fully JVM-side: char-k shingles →
    xxhash64 with per-permutation seeds → array_min per seed.

    At 100 TB the cost is a map-only pass (no shuffle); signatures are
    64 longs/doc."""
    sh = F.array_distinct(shingles(F.col(text_col), shingle_k))

    def _perm(i):  # closure factory: pyspark lambdas must be unary here
        return lambda s: F.xxhash64(s, F.lit(i))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__sh"), _perm(i)))
            for i in range(num_hashes)
        ]
    )
    return (
        sdf.select(id_col, F.col(text_col).alias("__t"))
        .withColumn("__sh", sh if text_col == "__t" else F.array_distinct(shingles(F.col("__t"), shingle_k)))
        .withColumn("minhash", sig)
        .select(id_col, "minhash")
    )


def minhash_lsh_pairs(frame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.6):
    """MinHash + LSH banding near-dup candidate pairs, verified by
    signature-estimated Jaccard.

    Scale shape: docs → signatures (map) → explode to `bands` rows/doc →
    shuffle by (band, band_hash) [bounded fan-out: bands×|docs| rows of
    (key, id, sig)] → per-bucket self-join (buckets are tiny unless data
    is pathological) → distinct pairs → estimate jaccard from signatures.
    This is the standard web-scale dedup pipeline (cf. Spark/Flink LSH
    implementations); everything JVM-side."""
    from dask_spark.frame import DaskFrame

    rows = num_hashes // bands
    sigs = minhash_signatures(frame._sdf, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        id_col,
        "minhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("minhash"), b * rows + 1, rows).cast("string")
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "minhash", "bk.band", "bk.bh")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.minhash").alias("mh_a"),
            F.col("b.minhash").alias("mh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.arrays_zip("mh_a", "mh_b").cast("array<struct<x:bigint,y:bigint>>")
               .cast("array<struct<x:bigint,y:bigint>>"))
    )
    # estimated jaccard = fraction of equal minhash slots
    eq = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    out = (
        pairs.withColumn("jaccard_est", eq / F.lit(num_hashes))
        .filter(F.col("jaccard_est") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard_est")
    )
    return DaskFrame(out)


def simhash(frame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64):
    """64-bit SimHash over word tokens, JVM-side: per-token xxhash64,
    per-bit vote via bit arithmetic inside ``aggregate``. Emitted with
    the 4 16-bit sub-bands for hamming-bucketing (docs within hamming
    distance 3 share ≥1 band — standard simhash dedup recall trick)."""
    from dask_spark.frame import DaskFrame

    toks = word_tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # vote per bit: sum(+1/-1) over tokens, bit set if sum > 0
    def _vote(i):  # closure factory (defaults would add a lambda param)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    votes = [F.aggregate(hashes, F.lit(0), _vote(i)) for i in range(bits)]
    sim = None
    for i, v in enumerate(votes):
        term = F.when(v > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint")) * F.lit(2 ** i).cast("bigint") if i < 63 else \
               F.when(v > 0, F.lit(-(2 ** 63)).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else (sim + term)
    out = frame._sdf.select(id_col, sim.alias("simhash"))
    for band in range(4):
        out = out.withColumn(
            f"band{band}",
            F.shiftrightunsigned(F.col("simhash"), band * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return DaskFrame(out)


def simhash_pairs(frame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """Candidate pairs sharing a 16-bit simhash band, verified by exact
    hamming distance ≤ max_hamming (bit_count of xor)."""
    from dask_spark.frame import DaskFrame

    sh = simhash(frame, text_col, id_col)._sdf
    banded = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bh"))
            for b in range(4)
        ])).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.bh")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.bh") == F.col("b.bh"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return DaskFrame(
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(frame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5):
    """Exact n-gram (word) Jaccard similarity for candidate pairs that
    share at least one n-gram. Shuffle is by n-gram (inverted index);
    frequency cap drops stop-grams to bound fan-out at scale."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    toks = F.filter(word_tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    docs = sdf.select(id_col, grams.alias("grams")).withColumn(
        "n_grams", F.size("grams")
    )
    inv = docs.select(id_col, "n_grams", F.explode("grams").alias("g"))
    # drop ultra-common grams (stop-gram cap) — bounds bucket fan-out
    g_freq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    inv = inv.join(F.broadcast(g_freq.filter(F.col("df") <= 100)), on="g")
    a, b = inv.alias("a"), inv.alias("b")
    pair_counts = (
        a.join(b, on=[F.col("a.g") == F.col("b.g"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"),
                 F.col("a.n_grams").alias("na"),
                 F.col("b.n_grams").alias("nb"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return DaskFrame(
        pair_counts.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_dedup_pairs(frame, vec_col: str = "embedding",
                          id_col: str = "vec_id", threshold: float = 0.95,
                          planes: int = 12, seed: int = 7):
    """Embedding near-dup: random-hyperplane LSH bucket (map-only
    signature) → per-bucket pairs → exact cosine verify. At 100 TB the
    corpus never self-joins — only same-bucket candidates do."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions.vector import cosine_sim, lsh_signature

    sdf = frame._sdf
    dim = len(sdf.select(vec_col).first()[0])
    sig = lsh_signature(F.col(vec_col), dim, planes, seed)
    docs = sdf.select(id_col, vec_col).withColumn("bucket", sig)
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                      F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                cosine_sim(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"))
    )
    return DaskFrame(
        pairs.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
    )
