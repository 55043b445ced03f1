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
- HEAVY HITTERS: the est >= min_count filter runs MAP-SIDE on the raw
  token stream. Because the estimate is a pure function of the term,
  the filter keeps either ALL occurrences of a term or none — so the
  exact count of every surviving term is still computable, and the
  only term-keyed exchange carries candidate heavy terms (bounded by
  the sketch's one-sided error, never the vocabulary).

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
    so every intermediate stays tiny (the bloom overflow lesson)."""
    d = _bloom_digest(term, hash_kind)
    w = F.lit(int(width))
    h1 = F.pmod(_bloom_h1(d, hash_kind), w)
    h2 = F.pmod(_bloom_h2(d, hash_kind).bitwiseOR(F.lit(1)), w)
    return F.array(*[
        F.pmod(h1 + j * h2, w).cast("int") for j in range(depth)
    ])


def cms_build(frame, text_col: str = "text", depth: int = 3,
              width: int = 1024, hash_kind: str = "md5"):
    """Distributed CMS build → DaskFrame(row, col, cnt) with at most
    depth*width rows. One exchange, carrying <= depth*width partial
    counts per partition (map-side combined) regardless of corpus
    size."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    toks = sdf.select(
        F.explode(word_tokens(F.col(text_col))).alias("__term")
    )
    cells = toks.select(
        F.posexplode(
            _cms_cells(F.col("__term"), depth, width, hash_kind)
        ).alias("row", "col")
    )
    return DaskFrame(
        cells.groupBy("row", "col").agg(F.count("*").alias("cnt"))
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
    depth cell lookups of the literal count table. Pure codegen
    expressions, map-only; >= the true count by construction."""
    tbl = F.lit([int(c) for c in counts])
    cells = _cms_cells(term, depth, width, hash_kind)
    return F.least(*[
        F.element_at(tbl, F.lit(j * width)
                     + F.element_at(cells, j + 1) + 1)
        for j in range(depth)
    ])


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
    membership is needed."""
    sdf = frame._sdf if isinstance(frame, DaskFrame) else frame
    if counts is None:
        counts = cms_counts(frame, text_col, depth, width, hash_kind)
    toks = sdf.select(
        F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    est = cms_estimate(F.col("term"), counts, depth, width, hash_kind)
    out = (
        toks.withColumn("est", est)
        .filter(F.col("est") >= int(min_count))
        .groupBy("term")
        .agg(
            F.min("est").alias("est"),  # constant per term — min pins it
            F.count("*").cast("bigint").alias("cnt"),
        )
        .orderBy(F.col("est").desc(), F.col("term"))
    )
    return DaskFrame(out)
