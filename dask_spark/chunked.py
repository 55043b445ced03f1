"""Chunked-inner N-D arrays — the escalation path past NDArray's
single-chunk inner-axis boundary (reference: dask/array/rechunk.py
:270, which rechunks ANY axis; ndarray.py's module note documents
this design and its cost model).

Layout: a logical (n, A, B) tensor whose rows exceed the one-task
block budget stores as ``(row_id, chunk_id, block)`` rows — the FIRST
inner axis splits into per-chunk row counts ``chunk_rows`` (RAGGED
allowed: any sizes summing to A; an int asks for numpy
``array_split`` distribution, so uneven counts like 8 rows into 3
chunks give (3, 3, 2)). One stored block is an (a_c, B) tile,
flattened row-major. Tiles of one logical row live on (potentially)
different executors: the 256 MiB/row ceiling becomes a 256 MiB/TILE
ceiling, and a (n, 100k, 100k) tensor is representable at ~80 GB/row
spread over ~300 tiles.

Cost model (the reason this is NOT the default layout): elementwise
ops and reductions along the non-chunked axis stay map-only, but any
structural op that MOVES data across the chunked axis — transpose,
rechunk — is ONE full-tensor shuffle keyed by (row_id, out_chunk),
exactly dask's rechunk shuffle. The single-chunk NDArray does those
same ops as a free driver-side permutation, which is why it remains
the default and this class is opt-in for oversized inners.

Ragged mechanics: every per-chunk quantity (tile row count a_c, row
offset) is either folded into the driver-built expression for that
chunk or read from an O(#chunks) sizes/offsets ARRAY LITERAL indexed
by the chunk-id column — the gather/scatter indices themselves are
closed-form stride arithmetic (k%a_c, k/a_c), so plan size stays
O(#chunks), never O(elements). Restriction kept: 2-D inner tiles."""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


def _require_np():
    import numpy as np

    return np


def _coerce_chunk_rows(extent: int, chunks) -> tuple[int, ...]:
    """int -> numpy array_split distribution over ``extent`` rows;
    sequence -> explicit per-chunk sizes (must sum to extent)."""
    if isinstance(chunks, int):
        if chunks < 1 or chunks > extent:
            raise ValueError(f"bad chunk count {chunks} for {extent} rows")
        big, rest = divmod(extent, chunks)
        return tuple([big + 1] * rest + [big] * (chunks - rest))
    sizes = tuple(int(s) for s in chunks)
    if any(s < 1 for s in sizes) or sum(sizes) != extent:
        raise ValueError(
            f"chunk sizes {sizes} must be positive and sum to {extent}"
        )
    return sizes


def _offsets(sizes: Sequence[int]) -> tuple[int, ...]:
    out, acc = [], 0
    for s in sizes:
        out.append(acc)
        acc += s
    return tuple(out)


class ChunkedNDArray:
    """Lazy (n, A, B) tensor stored as (a_c, B) tiles, ragged-aware."""

    def __init__(self, sdf, inner_shape: Sequence[int], chunks,
                 col: str = "block", id_col: str = "row_id",
                 chunk_col: str = "chunk_id"):
        self._sdf = sdf
        self._col = col
        self._id = id_col
        self._ck = chunk_col
        self.inner_shape = tuple(int(s) for s in inner_shape)
        if len(self.inner_shape) != 2:
            raise ValueError("ChunkedNDArray: 2-D inner tiles only")
        A, B = self.inner_shape
        self.chunk_rows = _coerce_chunk_rows(A, chunks)
        self.chunks = len(self.chunk_rows)

    # ---- constructors --------------------------------------------------
    @classmethod
    def from_ndarray(cls, nd, chunks) -> "ChunkedNDArray":
        """Split a single-chunk NDArray's first inner axis: axis-1
        chunks of a row-major (A, B) block are CONTIGUOUS flat
        ranges, so the explode is C in-row slices — map-only, no
        shuffle. ``chunks``: int (array_split sizes) or explicit
        per-chunk row counts (ragged fine; reference rechunk.py:270
        accepts any chunk tuple)."""
        if len(nd.inner_shape) != 2:
            raise ValueError("from_ndarray needs 2-D inner")
        A, B = nd.inner_shape
        sizes = _coerce_chunk_rows(A, chunks)
        offs = _offsets(sizes)
        m = nd._materialize()
        if m._id is None:
            raise ValueError("chunking needs an id column")
        sdf = m._sdf.select(
            F.col(m._id).alias("row_id"),
            F.posexplode(
                F.array(*[
                    F.slice(F.col(m._col), offs[c] * B + 1, sizes[c] * B)
                    for c in range(len(sizes))
                ])
            ).alias("chunk_id", "block"),
        )
        return cls(sdf, (A, B), sizes)

    @classmethod
    def from_vectors(cls, frame: DaskFrame, col: str, inner_shape,
                     chunks, id_col: str) -> "ChunkedNDArray":
        from dask_spark.ndarray import NDArray

        A, B = inner_shape
        nd = NDArray.from_vectors(frame, col, A * B, id_col).reshape(A, B)
        return cls.from_ndarray(nd, chunks)

    # ---- metadata ------------------------------------------------------
    @property
    def tile_shape(self):
        """(max tile rows, B) — tiles are ragged; this is the bound."""
        return (max(self.chunk_rows), self.inner_shape[1])

    @property
    def ndim(self) -> int:
        return 3

    def _sizes_lit(self):
        """O(#chunks) array literal: a_c by chunk id (1-based at)."""
        return F.array(*[F.lit(int(s)) for s in self.chunk_rows])

    def _offs_lit(self):
        return F.array(*[F.lit(int(o)) for o in _offsets(self.chunk_rows)])

    # ---- elementwise (map-only, chunking invisible) --------------------
    def map(self, fn) -> "ChunkedNDArray":
        out = self._sdf.select(
            self._id, self._ck,
            F.transform(F.col(self._col), lambda x: fn(x)).alias(self._col),
        )
        return ChunkedNDArray(out, self.inner_shape, self.chunk_rows,
                              self._col, self._id, self._ck)

    def __add__(self, o):
        if not isinstance(o, (int, float)):
            raise TypeError("scalar operands only")
        return self.map(lambda x: x + F.lit(float(o)))

    def __mul__(self, o):
        if not isinstance(o, (int, float)):
            raise TypeError("scalar operands only")
        return self.map(lambda x: x * F.lit(float(o)))

    # ---- the rechunk shuffle: inner transpose --------------------------
    def transpose(self, out_chunks=None) -> "ChunkedNDArray":
        """(n, A, B) -> (n, B, A) with the output chunked along B.

        The one genuinely-moving structural op: every output tile
        needs columns from EVERY input tile of its row, so the plan
        is slice-map (each input tile emits its contribution to each
        output tile via closed-form stride arithmetic) -> ONE shuffle
        keyed (row, out_chunk) -> ordered in-agg reassembly. Shuffle
        volume = the tensor, once — the same bill dask's rechunk
        pays for a cross-axis rechunk (rechunk.py:270). Ragged on
        BOTH sides: the source tile height a_c is read from the
        O(#chunks) sizes literal by the chunk-id column, so no gather
        literal ever materializes O(elements) plan state."""
        A, B = self.inner_shape
        out_sizes = _coerce_chunk_rows(
            B, out_chunks if out_chunks is not None else self.chunks
        )
        out_offs = _offsets(out_sizes)
        blk = F.col(self._col)
        asz = F.element_at(self._sizes_lit(), F.col(self._ck) + 1)

        # contribution of a source (a_c, B) tile to output chunk j —
        # an (out_sizes[j], a_c) sub-tile, row-major:
        #   piece[k] = tile[(k % a_c) * B + boff_j + k / a_c]
        def piece(j: int):
            bj, boff = out_sizes[j], out_offs[j]

            def gat(k):
                return F.element_at(
                    blk,
                    ((k % asz) * B + F.lit(boff)
                     + F.floor(k / asz)).cast("int") + 1,
                )

            return F.transform(
                F.sequence(F.lit(0), F.lit(bj) * asz - 1), gat
            )

        contrib = self._sdf.select(
            F.col(self._id),
            F.col(self._ck).alias("__src"),
            F.posexplode(
                F.array(*[piece(j) for j in range(len(out_sizes))])
            ).alias("__dst", "__piece"),
        )
        # reassemble: out tile (b_j, A) row r = concat over src tiles
        # (chunk order) of piece[r*a_src : (r+1)*a_src] — a_src read
        # from the sizes literal per source; ordered in-agg, never on
        # the driver
        szs = self._sizes_lit()

        def src_rows(p):
            return F.element_at(szs, p["__src"] + 1)

        assembled = (
            contrib.groupBy(self._id, "__dst")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__src", "__piece"))
                ).alias("__ps")
            )
            .select(
                F.col(self._id),
                F.col("__dst").alias(self._ck),
                F.flatten(
                    F.transform(
                        F.sequence(
                            F.lit(0),
                            F.element_at(
                                F.array(*[F.lit(s) for s in out_sizes]),
                                F.col("__dst") + 1,
                            ) - 1,
                        ),
                        lambda r: F.flatten(
                            F.transform(
                                F.col("__ps"),
                                lambda p: F.slice(
                                    p["__piece"],
                                    (r * src_rows(p)).cast("int") + 1,
                                    src_rows(p).cast("int"),
                                ),
                            )
                        ),
                    )
                ).alias(self._col),
            )
        )
        return ChunkedNDArray(assembled, (B, A), out_sizes,
                              self._col, self._id, self._ck)

    # ---- reductions ----------------------------------------------------
    def sum(self, axis: int):
        """axis 1 (the chunked axis): per-tile column partials (a
        closed-form stride walk, map-only) + one groupBy(row)
        zip_with-add of C partial B-vectors — only C*B scalars per
        row cross the wire, never the tensor. axis 2: per-tile row
        sums, reassembled to the (n, A) single-chunk layout by an
        ordered concat. Ragged: the per-tile extent a_c comes from
        the sizes literal."""
        from dask_spark.ndarray import NDArray

        A, B = self.inner_shape
        blk = F.col(self._col)
        asz = F.element_at(self._sizes_lit(), F.col(self._ck) + 1)
        if axis == 1:
            colsum = F.transform(
                F.sequence(F.lit(0), F.lit(B - 1)),
                lambda q: F.aggregate(
                    F.sequence(F.lit(0), asz - 1),
                    F.lit(0.0),
                    lambda acc, p: acc + F.element_at(
                        blk, (p * B + q + 1).cast("int")
                    ),
                ),
            )
            partial = self._sdf.select(
                self._id, self._ck, colsum.alias("__part")
            )
            out = partial.groupBy(self._id).agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(self._ck, "__part"))
                        ),
                        lambda s: s["__part"],
                    ),
                    F.array_repeat(F.lit(0.0), B),
                    lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y),
                ).alias("block")
            )
            return NDArray(
                out.withColumnRenamed(self._id, "row_id"),
                (B,), "block", "row_id",
            )
        if axis == 2:
            rowsum = F.transform(
                F.sequence(F.lit(0), asz - 1),
                lambda p: F.aggregate(
                    F.slice(blk, (p * B).cast("int") + 1, B), F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            partial = self._sdf.select(
                self._id, self._ck, rowsum.alias("__part")
            )
            out = partial.groupBy(self._id).agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(self._ck, "__part"))
                        ),
                        lambda s: s["__part"],
                    )
                ).alias("block")
            )
            return NDArray(
                out.withColumnRenamed(self._id, "row_id"),
                (A,), "block", "row_id",
            )
        raise ValueError("axis must be 1 (chunked) or 2 (in-tile)")

    # ---- materialization ----------------------------------------------
    def to_ndarray(self):
        """Reassemble to the single-chunk layout (only valid when the
        full inner fits one task — the constructor's boundary check
        applies on the way back in)."""
        from dask_spark.ndarray import NDArray

        out = (
            self._sdf.groupBy(self._id)
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(self._ck, self._col))
                        ),
                        lambda s: s[self._col],
                    )
                ).alias("block")
            )
            .withColumnRenamed(self._id, "row_id")
        )
        return NDArray(out, self.inner_shape, "block", "row_id")

    def compute(self):
        return self.to_ndarray().compute()

    def explode(self) -> DaskFrame:
        """(row, flat position, value) long form — the hash-checkable
        oracle bridge: flat position folds (chunk, in-tile pos) back
        to the LOGICAL row-major index via the offsets literal."""
        B = self.inner_shape[1]
        sdf = self._sdf.select(
            self._id,
            self._ck,
            F.posexplode(F.col(self._col)).alias("tpos", "val"),
        ).select(
            self._id,
            (
                F.element_at(self._offs_lit(), F.col(self._ck) + 1)
                .cast("long") * B + F.col("tpos")
            ).alias("pos"),
            "val",
        )
        return DaskFrame(sdf)
