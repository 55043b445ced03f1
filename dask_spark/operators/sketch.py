"""Count-min sketch frequency estimation over token streams — the
heavy-hitter / frequency-lookup primitive a 100 TB corpus pipeline
needs when a term-keyed groupBy over every token type is the
bottleneck (Cormode & Muthukrishnan 2005, "An improved data stream
summary: the count-min sketch and its applications" — public).

Reference scope: dask has no sketch operator; its approximate
reductions (hyperloglog nunique, partition quantiles) set the
pattern — a bounded-state summary replacing an exact shuffle.

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

    The est filter runs map-side on the raw stream (estimate is a
    pure function of the term, so a term survives with all its
    occurrences or not at all); only candidate heavy terms reach the
    term-keyed exchange, so the exact cnt on the survivors IS the
    true corpus count. Output is a superset of the true >= min_count
    set (CMS one-sided error); downstream re-filters on cnt if exact
    membership is needed.

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
