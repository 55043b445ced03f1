"""Bounded-state sketches over distributed data: count-min frequency
estimation (Cormode & Muthukrishnan 2005, "An improved data stream
summary: the count-min sketch and its applications" — public) and
HyperLogLog distinct counting (Flajolet, Fusy, Gandouet, Meunier
2007, "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" — public).

Reference scope: dask's approximate reductions set the pattern — a
bounded-state summary replacing an exact shuffle. nunique_approx is
HLL-backed in dask (dask/dataframe/hyperloglog.py: per-chunk 2^b
register arrays reduced by elementwise max); the repo's frame-level
nunique_approx delegates to Spark's native approx_count_distinct,
while hll_count_distinct below is the engine-PORTABLE variant whose
md5 mode the DuckDB oracle replays register-for-register.

100 TB shape:
- BUILD: each token contributes ``depth`` (row, col) cell increments;
  the groupBy key space is depth x width, so map-side combine reduces
  every partition to <= depth*width scalars before the exchange — the
  token stream itself never shuffles, and the exchange bill is
  CONSTANT in the corpus size (the bloom-filter build shape,
  operators/dedup.py contamination_bloom).
- PROBE: the collected sketch (depth*width int64s, a few KB — bounded
  like the bloom bitset) ships as ONE array literal; the estimate is
  min over depth element_at lookups — pure codegen, map-only.
- HEAVY HITTERS: the estimate is computed ONCE per token occurrence
  (one digest, staged h1/h2 columns), partial-aggregated map-side to
  per-partition (term, est, cnt) combines, and the est >= min_count
  filter runs on the post-aggregate — where est is an attribute, so
  the non-cheap digest is never re-inlined. A pre-aggregate filter
  would bound the exchange by the candidate set instead of the
  per-partition vocabulary, but Catalyst pushes any such predicate
  below the hash projection, re-deriving the digest from the raw term
  inside the pushed condition (6 extra digests per token — measured
  3.4x slower end-to-end). Zipf: tokens >> types, so per-token scan
  compute dominates the per-type exchange at 100 TB; the exchange
  bill equals value_counts', a few MB per task. Because the estimate
  is a pure function of the term, filter placement does not change
  the output: a term survives with its exact corpus count or not at
  all.

Hashing: the k=depth cells derive from ONE digest per term via the
same Kirsch-Mitzenmacher double-hashing layout the bloom filter uses
(h1 + j*(h2|1) mod width, both pre-reduced mod width) — shared
helpers, so hash_kind="md5" stays engine-portable (the DuckDB oracle
replays every cell and every estimate) and hash_kind="xxhash64" is
the digest-free production mode.

CMS contract (pinned in tests): estimates NEVER undercount —
est(t) >= true_count(t) for every term; heavy_hitters is a SUPERSET
of the true >= min_count set (one-sided error, no false negatives).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

from dask_spark.frame import DaskFrame
from dask_spark.functions.text import word_tokens
from dask_spark.operators.dedup import (
    _bloom_digest,
    _bloom_h1,
    _bloom_h2,
)


def _cms_cells(term: Column, depth: int, width: int,
               hash_kind: str) -> Column:
    """array<int> of the depth column positions for one term —
    Kirsch-Mitzenmacher from one digest, h1/h2 pre-reduced mod width
    so every intermediate stays tiny (the bloom overflow lesson).

    The (h1, h2) pair is STAGED as a lambda variable (transform over a
    one-element array) so the digest evaluates twice per term total,
    not once per array element per reference — F.array(*[h1 + j*h2])
    inlines the digest 2*depth times, and a downstream element_at over
    that array re-inlines the whole construction per lookup (~6*depth
    evals in the probe). Same trick as quantize_int8's scale staging
    (functions/vector.py); measured 5x on build + probe at sf0.1."""
    d = _bloom_digest(term, hash_kind)
    w = F.lit(int(width))
    pair = F.array(
        F.pmod(_bloom_h1(d, hash_kind), w),
        F.pmod(_bloom_h2(d, hash_kind).bitwiseOR(F.lit(1)), w),
    )
    return F.element_at(
        F.transform(
            F.array(pair),
            lambda p: F.transform(
                F.sequence(F.lit(0), F.lit(int(depth) - 1)),
                lambda j: F.pmod(
                    p.getItem(0) + j * p.getItem(1), w
                ).cast("int"),
            ),
        ),
        1,
    )


def _int64_array_literal(values: Sequence[int]) -> Column:
    """One JVM-side parse of ``array(v0L,v1L,...)`` — F.lit(list) pays
    a py4j round trip PER ELEMENT (measured 1.2s for a 3072-int table,
    per plan construction), while one F.expr string parses in ~3ms and
    ConstantFolding collapses the all-literal CreateArray to a single
    Literal before execution."""
    return F.expr(
        "array(" + ",".join(str(int(v)) + "L" for v in values) + ")"
    )


def _cms_hashes(term: Column, width: int,
                hash_kind: str) -> tuple[Column, Column]:
    """(h1, h2) Kirsch-Mitzenmacher pair from ONE digest, pre-reduced
    mod width so every intermediate stays tiny (the bloom overflow
    lesson). Callers alias these as REAL projected columns before
    fanning out to the depth cells: the digest is non-cheap, so
    CollapseProject keeps the projection split and it evaluates once
    per token instead of once per cell reference."""
    d = _bloom_digest(term, hash_kind)
    w = F.lit(int(width))
    return (
        F.pmod(_bloom_h1(d, hash_kind), w),
        F.pmod(_bloom_h2(d, hash_kind).bitwiseOR(F.lit(1)), w),
    )


def cms_build(frame, text_col: str = "text", depth: int = 3,
              width: int = 1024, hash_kind: str = "md5"):
    """Distributed CMS build → DaskFrame(row, col, cnt) with at most
    depth*width rows. One exchange, carrying <= depth*width partial
    counts per partition (map-side combined) regardless of corpus
    size. The digest evaluates once per token (staged h1/h2 columns,
    then cheap-arithmetic cells over the attributes — whole-stage
    codegen throughout, no higher-order functions on the hot path)."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    toks = sdf.select(
        F.explode(word_tokens(F.col(text_col))).alias("__term")
    )
    h1, h2 = _cms_hashes(F.col("__term"), width, hash_kind)
    staged = toks.select(h1.alias("__h1"), h2.alias("__h2"))
    w = F.lit(int(width))
    cells = F.array(*[
        F.pmod(F.col("__h1") + j * F.col("__h2"), w).cast("int")
        for j in range(depth)
    ])
    rows = staged.select(F.posexplode(cells).alias("row", "col"))
    return DaskFrame(
        rows.groupBy("row", "col").agg(F.count("*").alias("cnt"))
    )


def cms_counts(frame, text_col: str = "text", depth: int = 3,
               width: int = 1024, hash_kind: str = "md5") -> list[int]:
    """Build + collect the sketch to a flat row-major int list of
    length depth*width (missing cells = 0) — the driver-bounded
    artifact every probe ships as one array literal."""
    rows = cms_build(frame, text_col, depth, width, hash_kind) \
        .to_spark().collect()
    flat = [0] * (depth * width)
    for r in rows:
        flat[r["row"] * width + r["col"]] = int(r["cnt"])
    return flat


def cms_estimate(term: Column, counts: Sequence[int], depth: int = 3,
                 width: int = 1024, hash_kind: str = "md5") -> Column:
    """Column: CMS frequency estimate for ``term`` — min over the
    depth cell lookups of the literal count table, map-only; >= the
    true count by construction. The lookups run INSIDE a transform
    over the cells array so the cell construction (and its digest)
    evaluates once, not once per depth lookup."""
    tbl = _int64_array_literal(counts)
    cells = _cms_cells(term, depth, width, hash_kind)
    return F.array_min(
        F.transform(
            cells,
            lambda c, j: F.element_at(tbl, j * int(width) + c + 1),
        )
    )


def cms_heavy_hitters(frame, text_col: str = "text",
                      min_count: int = 100, depth: int = 3,
                      width: int = 1024, hash_kind: str = "md5",
                      counts: Sequence[int] | None = None):
    """Tokens whose CMS estimate reaches min_count, with their EXACT
    counts → DaskFrame(term, est, cnt), est desc / term asc.

    The est filter runs AFTER the term aggregate (see below), so every
    term reaches the term-keyed exchange once per occurrence — but the
    exchange is map-side combined, so what actually moves is one
    (term, partial-count) pair per term per partition, and the exact
    cnt on the survivors IS the true corpus count. Output is a
    superset of the true >= min_count set (CMS one-sided error);
    downstream re-filters on cnt if exact membership is needed.

    The probe computes the digest ONCE per token (staged h1/h2
    columns; the depth table lookups are cheap arithmetic over those
    attributes) and filters AFTER the term aggregate, where est is an
    attribute reference — see the module docstring for why a map-side
    est filter is a net loss under Catalyst's predicate pushdown."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    if counts is None:
        counts = cms_counts(frame, text_col, depth, width, hash_kind)
    toks = sdf.select(
        F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    h1, h2 = _cms_hashes(F.col("term"), width, hash_kind)
    staged = toks.select(
        "term", h1.alias("__h1"), h2.alias("__h2")
    )
    tbl = _int64_array_literal(counts)
    w = F.lit(int(width))
    est = F.least(*[
        F.element_at(
            tbl,
            (F.lit(j * int(width))
             + F.pmod(F.col("__h1") + j * F.col("__h2"), w)
             + 1).cast("int"),
        )
        for j in range(depth)
    ])
    out = (
        staged.select("term", est.alias("est"))
        .groupBy("term")
        .agg(
            F.min("est").alias("est"),  # constant per term — min pins it
            F.count("*").cast("bigint").alias("cnt"),
        )
        .filter(F.col("est") >= int(min_count))
        .orderBy(F.col("est").desc(), F.col("term"))
    )
    return DaskFrame(out)


# ------------------------------ HyperLogLog ------------------------------
#
# 100 TB shape (same bill as the CMS build): one digest per row at the
# scan, groupBy on the 2^p register ids with map-side combine, so the
# exchange carries <= 2^p (register, max_rho) pairs per partition
# regardless of input size; the estimator runs over the <= 2^p-row
# register table. The register MERGE is elementwise max — exactly the
# per-chunk reduce dask's hyperloglog.py performs — which Spark's
# partial max aggregation gives for free.
#
# Determinism across engines (md5 mode): rho uses INTEGER bit-length
# (length of the base-2 string — Spark conv(w,10,2), DuckDB bin(w)),
# never floating log2, and the harmonic sum is computed in SCALED
# INTEGER arithmetic: sum(2^(52 - M_j)) as int64 (exact, order-free)
# with one final double division — so the estimate is bit-identical
# in Spark and DuckDB and ROUND(est, 6) hash-matches.

_HLL_BITS = 60  # md5 mode: 15 hex chars -> 60-bit nonnegative int64
_HLL_SCALE = 52  # 2^(52 - rho) stays integral for rho <= 52 = wp+1 max


def _hll_hash(value: Column, hash_kind: str) -> Column:
    """60-bit nonnegative hash of the value's string form — md5 mode
    is the engine-portable digest (same 15-hex-char extraction as the
    bloom/CMS family), xxhash64 the digest-free production mode
    (top 60 bits of the signed 64)."""
    s = value.cast("string")
    if hash_kind == "md5":
        return F.conv(
            F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10
        ).cast("bigint")
    if hash_kind == "xxhash64":
        return F.shiftrightunsigned(F.xxhash64(s), 64 - _HLL_BITS)
    raise ValueError("hash_kind must be xxhash64|md5")


def hll_registers(frame, value_col: str, p: int = 9,
                  hash_kind: str = "md5", group_cols: Sequence = ()):
    """Distributed HLL register table → DaskFrame([groups...,]
    register, max_rho) with at most 2^p rows per group. register =
    h mod 2^p; rho = leading-zero rank of the remaining wp = 60-p
    bits (wp+1 when they are all zero), via integer bit-length. One
    exchange of <= groups·2^p pairs per partition; union-merge of two
    sketches is a further groupBy-max over the same key space.
    ``group_cols`` turns this into the keyed form (distinct-per-group
    — e.g. unique users per day — at a bounded-state exchange where
    countDistinct would shuffle every (group, value) pair)."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    if not 4 <= int(p) <= 10:
        # p <= 10 keeps the empty-register term (m - np) * 2^52 under
        # 2^62, so the scaled-int64 harmonic sum can never overflow
        # signed int64 (and never trips ANSI mode); p >= 4 is the
        # smallest register count the alpha_m table covers.
        raise ValueError(f"p must be in [4, 10], got {p}")
    gc = list(group_cols)
    m = 1 << int(p)
    wp = _HLL_BITS - int(p)
    # nulls never reach a register: approx_count_distinct, nunique and
    # the DuckDB oracle all ignore them — an unfiltered null would
    # hash to a null register whose max_rho is null, inflating
    # nonzero_registers while contributing nothing to the sum.
    hh = sdf.filter(F.col(value_col).isNotNull()).select(
        *gc, _hll_hash(F.col(value_col), hash_kind).alias("__h")
    )
    staged = hh.select(
        *gc,
        F.pmod(F.col("__h"), F.lit(m)).cast("int").alias("register"),
        F.expr(f"__h div {m}").alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(wp + 1)).otherwise(
        F.lit(wp + 1)
        - F.length(F.conv(F.col("__w").cast("string"), 10, 2))
    )
    reg = staged.select(*gc, "register", rho.cast("int").alias("__rho"))
    return DaskFrame(
        reg.groupBy(*gc, "register").agg(F.max("__rho").alias("max_rho"))
    )


def hll_alpha(p: int) -> float:
    """Bias-correction constant alpha_m (Flajolet et al. 2007 §4) —
    embedded as a full-precision literal in both engines."""
    m = 1 << int(p)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_count_distinct(frame, value_col: str, p: int = 9,
                       hash_kind: str = "md5", group_cols: Sequence = ()):
    """DaskFrame([groups...,] est_distinct, sum_scaled,
    nonzero_registers) — one row per group (one row total without
    ``group_cols``): est = alpha_m * m^2 / sum_j 2^(-M_j), with the
    harmonic sum held as the exact int64 ``sum_scaled`` = sum_j
    2^(52 - M_j) (empty registers contribute 2^52) so the only
    floating-point steps are one bigint->double cast and one division
    — bit-identical across engines. Small-range (linear counting)
    correction applies below 2.5*m when empty registers remain, per
    the paper."""
    gc = list(group_cols)
    m = 1 << int(p)
    regs = hll_registers(frame, value_col, p, hash_kind, gc)._sdf
    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        F.lit(_HLL_SCALE) - F.col("max_rho"),
    )
    agg = regs.groupBy(*gc).agg(
        F.sum(term).alias("__sp"),
        F.count(F.lit(1)).cast("int").alias("__np"),
    )
    full = F.coalesce(F.col("__sp"), F.lit(0).cast("bigint")) + (
        (F.lit(m) - F.col("__np")).cast("bigint")
        * F.lit(1 << _HLL_SCALE).cast("bigint")
    )
    num = hll_alpha(p) * m * m * float(1 << _HLL_SCALE)
    raw = F.lit(num) / full.cast("double")
    zeros = (F.lit(m) - F.col("__np")).cast("int")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    out = agg.select(
        *gc,
        F.round(est, 6).alias("est_distinct"),
        full.alias("sum_scaled"),
        F.col("__np").alias("nonzero_registers"),
    )
    return DaskFrame(out)


def _hll_estimate_expr(p: int):
    """(est, sum_scaled, nonzero) Columns over an aggregated register
    frame exposing __sp/__np — the hll_count_distinct estimator body,
    shared with the set-algebra entry point so union/intersection
    estimates can never drift from the single-sketch arithmetic."""
    m = 1 << int(p)
    full = F.coalesce(F.col("__sp"), F.lit(0).cast("bigint")) + (
        (F.lit(m) - F.col("__np")).cast("bigint")
        * F.lit(1 << _HLL_SCALE).cast("bigint")
    )
    num = hll_alpha(p) * m * m * float(1 << _HLL_SCALE)
    raw = F.lit(num) / full.cast("double")
    zeros = (F.lit(m) - F.col("__np")).cast("int")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return est, full, F.col("__np")


def hll_set_estimates(frame_a, frame_b, value_col: str,
                      value_col_b: str | None = None, p: int = 9,
                      hash_kind: str = "md5"):
    """HLL set algebra between two frames → one-row DaskFrame
    (est_a, est_b, est_union, est_intersect): the sketches for A and
    B are the usual 2^p register tables; the UNION sketch is their
    element-wise register max — exactly the sketch a single pass over
    A ∪ B would have built, because max is the register merge (the
    mergeability that makes HLL the distributed-distinct workhorse) —
    and the intersection estimate is inclusion–exclusion over the
    three ROUNDED estimates (est_a + est_b − est_union; negative
    small-overlap noise clamps to 0).

    100 TB shape: each side pays one bounded register aggregate
    (≤ 2^p pairs per partition); the merge and the three estimator
    folds run over ≤ 3·2^p rows total. This is the "how many repeat
    users / how much corpus overlap" question answered without ever
    shuffling raw values — the same register tables can be persisted
    per day and unioned across arbitrary date ranges later."""
    vb = value_col_b or value_col
    ra = hll_registers(frame_a, value_col, p, hash_kind)._sdf
    rb = hll_registers(frame_b, vb, p, hash_kind)._sdf
    ru = (
        ra.unionByName(rb)
        .groupBy("register").agg(F.max("max_rho").alias("max_rho"))
    )

    term = F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        F.lit(_HLL_SCALE) - F.col("max_rho"),
    )

    def one(regs, name):
        agg = regs.groupBy().agg(
            F.sum(term).alias("__sp"),
            F.count(F.lit(1)).cast("int").alias("__np"),
        )
        est, _, _ = _hll_estimate_expr(p)
        return agg.select(F.round(est, 6).alias(name))

    out = (
        one(ra, "est_a")
        .crossJoin(one(rb, "est_b"))
        .crossJoin(one(ru, "est_union"))
    )
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6),
        F.lit(0.0),
    )
    return DaskFrame(out.select(
        "est_a", "est_b", "est_union", inter.alias("est_intersect"),
    ))


def cms_doc_heavy_fraction(frame, counts: Sequence[int],
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           min_count: int = 100, depth: int = 3,
                           width: int = 1024, hash_kind: str = "md5",
                           round_dp: int = 6,
                           heavy_terms: Sequence[str] | None = None):
    """Per-document heavy-token fraction against a PREBUILT sketch —
    the boilerplate gate: documents dominated by corpus-wide
    heavy-hitter tokens are templates/navigation, not prose.

    STATELESS scan→project: the model rides as a literal, tokens
    never leave their row (in-row filter + size, no explode, no
    shuffle, no aggregation state) — so the same Column program runs
    unchanged under Structured Streaming (streaming/hygiene.py
    cms_heavy_stream; stream/batch exactness pinned in tests).
    Returns (id, n_tokens, heavy_frac) — heavy_frac null for
    token-less docs.

    ``heavy_terms`` is the fast path: est >= min_count is a pure
    function of the term, so token-level estimation is EXACTLY
    membership in the (heavy-hitter-bounded) term set — one
    array_contains per token instead of a digest + depth sketch
    lookups (measured 3.2s -> ~1s at sf0.1, identical output). Pass
    cms_heavy_hitters(...)'s terms (same counts/min_count); without
    it the per-token estimate path runs. The two paths differ only
    for tokens ABSENT from the corpus that built the set (a stream's
    novel token whose cells collide into heavy counts scores heavy
    under the estimate path, not-heavy under the set path — the set
    semantics, "heavy in the reference corpus", are the ones a
    boilerplate gate wants)."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    staged = sdf.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    if heavy_terms is not None and len(list(heavy_terms)) == 0:
        # F.array() with no children is array<void>; array_contains
        # against it fails analysis. No heavy terms => no token is
        # heavy, so the count is a constant 0.
        heavy = F.lit(0)
    elif heavy_terms is not None:
        hs = F.array(*[F.lit(str(t)) for t in sorted(heavy_terms)])
        heavy = F.size(F.filter(
            F.col("__toks"), lambda t: F.array_contains(hs, t)
        ))
    else:
        heavy = F.size(F.filter(
            F.col("__toks"),
            lambda t: cms_estimate(t, counts, depth, width, hash_kind)
            >= int(min_count),
        ))
    n = F.size(F.col("__toks"))
    frac = F.when(
        n > 0, F.round(heavy.cast("double") / n, round_dp)
    )
    return DaskFrame(staged.select(
        F.col(id_col), n.alias("n_tokens"), frac.alias("heavy_frac")
    ))


def hll_estimate_registers(max_rhos: Sequence[int], p: int = 9):
    """Driver-side estimator over a collected register list — the
    exact python twin of hll_count_distinct's Column arithmetic
    (scaled-int64 harmonic sum, one float division, linear-counting
    branch), for sinks that hold the register table outside a plan
    (e.g. the streaming register state). Returns (est_distinct,
    sum_scaled, nonzero_registers)."""
    import math

    m = 1 << int(p)
    sp = sum(1 << (_HLL_SCALE - int(r)) for r in max_rhos)
    full = sp + (m - len(max_rhos)) * (1 << _HLL_SCALE)
    raw = (hll_alpha(p) * m * m * float(1 << _HLL_SCALE)) / float(full)
    zeros = m - len(max_rhos)
    if raw <= 2.5 * m and zeros > 0:
        est = float(m) * math.log(float(m) / float(zeros))
    else:
        est = raw
    return round(est, 6), full, len(max_rhos)


# ------------------------- histogram quantiles -------------------------


def histogram_quantiles(frame, value_col: str, qs: Sequence[float] = (
        0.25, 0.5, 0.75, 0.99), bins: int = 1024):
    """Approximate quantiles from a fixed-width histogram — the
    bounded-state sibling of the exact sort-based percentile (dask's
    percentile is likewise approximate, via per-chunk tdigests;
    dask/array/percentile.py sets the pattern).

    100 TB shape: one (min, max, count) aggregate, then one
    groupBy(bucket) count whose exchange carries <= bins partials per
    partition regardless of input size; the estimator interpolates
    inside the selected bucket over the <= bins collected rows —
    error bounded by one bucket width. Every arithmetic step (width
    division, bucket floor-clamp, ceil rank, in-bucket interpolation)
    is written identically in the SQL oracle, so the estimates are
    bit-identical across engines.

    Returns a one-row DaskFrame(q_<pct> double ...); all-null row on
    empty input (the percentile contract)."""
    if not qs or any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty with every q in (0, 1]")
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    spark = sdf.sparkSession

    def name(q):
        return "q_" + repr(float(q)).replace("0.", "").replace(".", "_")

    schema = ", ".join(f"{name(q)} double" for q in qs)
    vals = hist_quantile_values(sdf, value_col, qs, bins)
    if vals is None:
        return DaskFrame(
            spark.createDataFrame([tuple(None for _ in qs)], schema)
        )
    return DaskFrame(spark.createDataFrame([tuple(vals)], schema))


def hist_quantile_values(sdf, value_col: str, qs, bins: int = 1024):
    """Driver-side histogram-sketch quantile estimates as python
    floats (rounded half-up 6dp — the histogram_quantiles contract,
    replayed bit-identically by its SQL oracle). Returns None on
    empty input. The scale-safe boundary source for every op that
    would otherwise buffer all values in an exact percentile
    aggregate (quantile_bucketize/lift_table/robust_mean
    ``exact=False``)."""
    B = int(bins)
    x = F.col(value_col).cast("double")
    base = sdf.select(x.alias("__x")).filter(F.col("__x").isNotNull())
    mn, mx, n = base.agg(
        F.min("__x"), F.max("__x"), F.count(F.lit(1))
    ).first()
    if not n:
        return None
    mn, mx = float(mn), float(mx)
    from dask_spark.functions.text import _round_half_up6

    if mx == mn:
        return [_round_half_up6(mn) for _ in qs]
    width = (mx - mn) / B
    bucket = F.least(
        F.greatest(
            F.floor((F.col("__x") - F.lit(mn)) / F.lit(width)), F.lit(0)
        ),
        F.lit(B - 1),
    ).cast("int")
    counts = {
        r["b"]: int(r["c"])
        for r in base.select(bucket.alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    import math

    vals = []
    for q in qs:
        r = float(math.ceil(float(q) * n))
        cum = 0.0
        for b in range(B):
            c = counts.get(b, 0)
            if not c:
                continue
            if cum + c >= r:
                est = mn + width * (float(b) + (r - cum) / float(c))
                vals.append(_round_half_up6(est))
                break
            cum += c
        else:
            vals.append(_round_half_up6(mx))
    return vals


def histogram_quantiles_by_group(frame, value_col: str, group_col: str,
                                 qs: Sequence[float] = (0.25, 0.5, 0.75),
                                 bins: int = 256):
    """Keyed histogram quantiles — one row per group (e.g. per-source
    token-count percentiles), where an exact per-group percentile
    sorts every group's values.

    100 TB shape: one groupBy(group) stats aggregate (bounded by the
    group cardinality — the value_counts collect contract: the group
    column must be driver-bounded), then one groupBy(group, bucket)
    count whose exchange carries <= groups*bins partials per
    partition; per-group stats ride back as literal MAPS (no join),
    and the estimator interpolates over the collected <= groups*bins
    rows with the same arithmetic as histogram_quantiles. Groups with
    a single distinct value short-circuit to that value. Empty input
    -> empty frame."""
    if not qs or any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty with every q in (0, 1]")
    from dask_spark.functions.text import (
        _double_map_literal,
        _round_half_up6,
    )

    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    spark = sdf.sparkSession
    B = int(bins)
    g = F.col(group_col).cast("string")
    x = F.col(value_col).cast("double")
    base = (
        sdf.select(g.alias("__g"), x.alias("__x"))
        .filter(F.col("__x").isNotNull() & F.col("__g").isNotNull())
    )
    stats = {
        r["__g"]: (float(r["mn"]), float(r["mx"]), int(r["n"]))
        for r in base.groupBy("__g").agg(
            F.min("__x").alias("mn"), F.max("__x").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }

    def name(q):
        return "q_" + repr(float(q)).replace("0.", "").replace(".", "_")

    schema = f"{group_col} string, " + ", ".join(
        f"{name(q)} double" for q in qs
    )
    if not stats:
        return DaskFrame(spark.createDataFrame([], schema))
    widths = {
        k: (mx - mn) / B for k, (mn, mx, _) in stats.items() if mx > mn
    }
    counts: dict = {}
    if widths:
        mn_map = _double_map_literal(
            {k: stats[k][0] for k in widths}
        )
        w_map = _double_map_literal(widths)
        bucket = F.least(
            F.greatest(
                F.floor(
                    (F.col("__x") - F.element_at(mn_map, F.col("__g")))
                    / F.element_at(w_map, F.col("__g"))
                ),
                F.lit(0),
            ),
            F.lit(B - 1),
        ).cast("int")
        for r in (
            base.filter(F.col("__g").isin(list(widths)))
            .select("__g", bucket.alias("b"))
            .groupBy("__g", "b").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            counts.setdefault(r["__g"], {})[r["b"]] = int(r["c"])

    import math

    rows = []
    for k in sorted(stats):
        mn, mx, n = stats[k]
        if k not in widths:  # single distinct value
            rows.append(tuple([k] + [_round_half_up6(mn)] * len(qs)))
            continue
        width = widths[k]
        bc = counts.get(k, {})
        vals = []
        for q in qs:
            r = float(math.ceil(float(q) * n))
            cum = 0.0
            est = mx
            for b in range(B):
                c = bc.get(b, 0)
                if not c:
                    continue
                if cum + c >= r:
                    est = mn + width * (float(b) + (r - cum) / float(c))
                    break
                cum += c
            vals.append(_round_half_up6(est))
        rows.append(tuple([k] + vals))
    return DaskFrame(spark.createDataFrame(rows, schema))
