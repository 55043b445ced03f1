"""Chunked-inner N-D arrays — the escalation path past NDArray's
single-chunk inner-axis boundary (reference: dask/array/rechunk.py
:270, which rechunks ANY axis; ndarray.py's module note documents
this design and its cost model).

Layout: a logical (n, A, B) tensor whose rows exceed the one-task
block budget stores as ``(row_id, chunk_id, block)`` rows — the FIRST
inner axis splits into ``chunks`` even slices of a = A/chunks rows
each, so one stored block is an (a, B) tile, flattened row-major.
Tiles of one logical row live on (potentially) different executors:
the 256 MiB/row ceiling becomes a 256 MiB/TILE ceiling, and a
(n, 100k, 100k) tensor is representable at ~80 GB/row spread over
~300 tiles.

Cost model (the reason this is NOT the default layout): elementwise
ops and reductions along the non-chunked axis stay map-only, but any
structural op that MOVES data across the chunked axis — transpose,
rechunk — is ONE full-tensor shuffle keyed by (row_id, out_chunk),
exactly dask's rechunk shuffle. The single-chunk NDArray does those
same ops as a free driver-side permutation, which is why it remains
the default and this class is opt-in for oversized inners.

Restrictions (documented, enforced): 2-D inner tiles, even chunking
(A % chunks == 0; transpose also needs B % out_chunks == 0). Ragged
chunks need per-chunk gather literals — a mechanical extension."""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F

from dask_spark.frame import DaskFrame


def _require_np():
    import numpy as np

    return np


class ChunkedNDArray:
    """Lazy (n, A, B) tensor stored as even (A/chunks, B) tiles."""

    def __init__(self, sdf, inner_shape: Sequence[int], chunks: int,
                 col: str = "block", id_col: str = "row_id",
                 chunk_col: str = "chunk_id"):
        self._sdf = sdf
        self._col = col
        self._id = id_col
        self._ck = chunk_col
        self.inner_shape = tuple(int(s) for s in inner_shape)
        self.chunks = int(chunks)
        if len(self.inner_shape) != 2:
            raise ValueError("ChunkedNDArray: 2-D inner tiles only")
        A, B = self.inner_shape
        if A % self.chunks:
            raise ValueError(
                f"even chunking required: {A} rows into {self.chunks} chunks"
            )

    # ---- constructors --------------------------------------------------
    @classmethod
    def from_ndarray(cls, nd, chunks: int) -> "ChunkedNDArray":
        """Split a single-chunk NDArray's first inner axis: axis-1
        chunks of a row-major (A, B) block are CONTIGUOUS flat
        ranges, so the explode is C in-row slices — map-only, no
        shuffle."""
        if len(nd.inner_shape) != 2:
            raise ValueError("from_ndarray needs 2-D inner")
        A, B = nd.inner_shape
        if A % chunks:
            raise ValueError(f"even chunking required: {A} / {chunks}")
        a = A // chunks
        m = nd._materialize()
        if m._id is None:
            raise ValueError("chunking needs an id column")
        tile = a * B
        sdf = m._sdf.select(
            F.col(m._id).alias("row_id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(chunks - 1)),
                    lambda c: F.slice(F.col(m._col), c * tile + 1, tile),
                )
            ).alias("chunk_id", "block"),
        )
        return cls(sdf, (A, B), chunks)

    @classmethod
    def from_vectors(cls, frame: DaskFrame, col: str, inner_shape,
                     chunks: int, id_col: str) -> "ChunkedNDArray":
        from dask_spark.ndarray import NDArray

        A, B = inner_shape
        nd = NDArray.from_vectors(frame, col, A * B, id_col).reshape(A, B)
        return cls.from_ndarray(nd, chunks)

    # ---- metadata ------------------------------------------------------
    @property
    def tile_shape(self):
        A, B = self.inner_shape
        return (A // self.chunks, B)

    @property
    def ndim(self) -> int:
        return 3

    # ---- elementwise (map-only, chunking invisible) --------------------
    def map(self, fn) -> "ChunkedNDArray":
        out = self._sdf.select(
            self._id, self._ck,
            F.transform(F.col(self._col), lambda x: fn(x)).alias(self._col),
        )
        return ChunkedNDArray(out, self.inner_shape, self.chunks,
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
    def transpose(self, out_chunks: int | None = None) -> "ChunkedNDArray":
        """(n, A, B) -> (n, B, A) with the output chunked along B.

        The one genuinely-moving structural op: every output tile
        needs columns from EVERY input tile of its row, so the plan
        is slice-map (each input tile emits its contribution to each
        output tile as one driver-planned gather) -> ONE shuffle
        keyed (row, out_chunk) -> ordered in-agg reassembly. Shuffle
        volume = the tensor, once — the same bill dask's rechunk
        pays for a cross-axis rechunk (rechunk.py:270)."""
        np = _require_np()
        A, B = self.inner_shape
        C = self.chunks
        a = A // C
        Cp = out_chunks or C
        if B % Cp:
            raise ValueError(f"even chunking required: {B} / {Cp}")
        b = B // Cp

        # gather literal for output chunk j, same for every input tile:
        # piece[r, c] = tile[c, j*b + r]  (flat: c*B + j*b + r), 1-based
        pieces = []
        for j in range(Cp):
            idx = np.empty(b * a, dtype="int32")
            k = 0
            for r in range(b):
                for c in range(a):
                    idx[k] = c * B + j * b + r + 1
                    k += 1
            pieces.append(F.lit(idx))
        blk = F.col(self._col)
        contrib = self._sdf.select(
            F.col(self._id),
            F.col(self._ck).alias("__src"),
            F.posexplode(
                F.array(*[
                    F.transform(p, lambda i: F.element_at(blk, i))
                    for p in pieces
                ])
            ).alias("__dst", "__piece"),
        )
        # reassemble: out tile (b, A) row r = concat over src tiles of
        # piece[r*a : (r+1)*a] — ordered in-agg, never on the driver
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
                        F.sequence(F.lit(0), F.lit(b - 1)),
                        lambda r: F.flatten(
                            F.transform(
                                F.col("__ps"),
                                lambda p: F.slice(
                                    p["__piece"], r * a + 1, a
                                ),
                            )
                        ),
                    )
                ).alias(self._col),
            )
        )
        return ChunkedNDArray(assembled, (B, A), Cp,
                              self._col, self._id, self._ck)

    # ---- reductions ----------------------------------------------------
    def sum(self, axis: int):
        """axis 1 (the chunked axis): per-tile column partials (a
        closed-form stride walk, map-only) + one groupBy(row)
        zip_with-add of C partial B-vectors — only C*B scalars per
        row cross the wire, never the tensor. axis 2: per-tile row
        sums, reassembled to the (n, A) single-chunk layout by an
        ordered concat."""
        from dask_spark.ndarray import NDArray

        np = _require_np()
        A, B = self.inner_shape
        a = A // self.chunks
        blk = F.col(self._col)
        if axis == 1:
            colsum = F.transform(
                F.sequence(F.lit(0), F.lit(B - 1)),
                lambda q: F.aggregate(
                    F.sequence(F.lit(0), F.lit(a - 1)),
                    F.lit(0.0),
                    lambda acc, p: acc + F.element_at(
                        blk, (p * B + q + 1).cast("int")
                    ),
                ),
            )
            partial = self._sdf.select(self._id, colsum.alias("__part"))
            out = partial.groupBy(self._id).agg(
                F.aggregate(
                    F.collect_list("__part"),
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
                F.sequence(F.lit(0), F.lit(a - 1)),
                lambda p: F.aggregate(
                    F.slice(blk, p * B + 1, B), F.lit(0.0),
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
        to the LOGICAL row-major index."""
        A, B = self.inner_shape
        a = A // self.chunks
        tile = a * B
        sdf = self._sdf.select(
            self._id,
            self._ck,
            F.posexplode(F.col(self._col)).alias("tpos", "val"),
        ).select(
            self._id,
            (F.col(self._ck).cast("long") * tile + F.col("tpos")).alias("pos"),
            "val",
        )
        return DaskFrame(sdf)
