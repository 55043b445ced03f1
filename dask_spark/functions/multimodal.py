"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata struct, with decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libs, so the DECODE step is a
deterministic fake (clearly marked) — the Spark-side contract (schema,
batch shape, partitioning) is real and tested. Swap ``_fake_decode``
for a PIL/libav call in production; nothing else changes."""

from __future__ import annotations

import hashlib
import struct

import pyspark.sql.functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, "
    "meta struct<kind:string, width:int, height:int, n_frames:int, sample_rate:int>"
)


def attach_fake_media(frame):
    """Synthesize a deterministic binary payload per doc (stands in for
    a real image/audio blob column read from parquet)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    payload = F.sha2(F.col("text"), 256).cast("binary")
    kind = F.when(F.col("doc_id") % 3 == 0, "image").when(
        F.col("doc_id") % 3 == 1, "audio"
    ).otherwise("video")
    meta = F.struct(
        kind.alias("kind"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        (F.col("doc_id") % 120 + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )
    return DaskFrame(
        sdf.select("doc_id", payload.alias("media"), meta.alias("meta"))
    )


def extract_meta(frame):
    """Project typed metadata out of the struct (pure JVM)."""
    from dask_spark.frame import DaskFrame

    return DaskFrame(
        frame._sdf.select(
            "doc_id",
            F.col("meta.kind").alias("kind"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.length("media").alias("n_bytes"),
        )
    )


def _fake_decode(blob: bytes, width: int, height: int, out_dim: int = 10) -> list[float]:
    """DETERMINISTIC FAKE decoder (no image libs in container).
    Real impl: PIL.Image.open(io.BytesIO(blob)) → resize → np.asarray.
    Emits exactly ``out_dim`` floats: hashed-byte features then (w, h).
    A null/absent blob (corrupt upstream row) decodes to the empty-
    bytes features rather than crashing the whole Arrow batch — the
    real decoder would do the same (skip-and-flag, never fail the
    task)."""
    h = hashlib.sha256(blob if blob is not None else b"").digest()
    feats = [b / 255.0 for b in h[: max(out_dim - 2, 0)]] + [
        float(width or 0), float(height or 0)
    ]
    return feats[:out_dim]


def decode_features(frame, out_dim: int = 10):
    """mapInPandas decode+featurize: binary → fixed-dim float vector.
    Arrow batches keep the Python boundary amortized; at 100 TB this
    stage is embarrassingly parallel (map-only, no shuffle)."""
    from dask_spark.frame import DaskFrame

    schema = f"doc_id bigint, features array<double>"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            feats = [
                _fake_decode(m, w, h, out_dim)
                for m, w, h in zip(
                    pdf["media"], pdf["meta"].map(lambda s: s["width"]),
                    pdf["meta"].map(lambda s: s["height"]),
                )
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return DaskFrame(frame._sdf.mapInPandas(gen, schema=schema))


def resize_media(frame, width: int, height: int):
    """Image/video RESIZE plumbing: binary → binary with updated
    (width, height) metadata, over Arrow batches. The pixel resample
    itself is the DETERMINISTIC FAKE (real impl: PIL resize /
    cv2.resize on the decoded array — libs absent in this container):
    the output payload is sha256(blob | target dims) truncated/tiled
    to a size proportional to the new pixel count, so downstream
    stages see a real binary column whose LENGTH scales the way a
    resized image's would. Schema/batching/metadata plumbing is the
    real thing — swap _fake bytes for the real codec and nothing
    downstream changes. Map-only, no shuffle; a null blob passes
    through as null (skip-and-flag, never fail the task)."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    meta_t = sdf.schema["meta"].dataType.simpleString()
    schema = f"doc_id bigint, media binary, meta {meta_t}"

    def gen(batches):
        import pandas as pd

        target = max(1, (int(width) * int(height)) // 64)

        def fake_resize(blob):
            if blob is None:
                return None
            h = hashlib.sha256(
                bytes(blob) + f"|{width}x{height}".encode()
            ).digest()
            return (h * (target // len(h) + 1))[:target]

        for pdf in batches:
            meta = [
                {**(dict(s) if s is not None else {}),
                 "width": int(width), "height": int(height)}
                for s in pdf["meta"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [fake_resize(b) for b in pdf["media"]],
                "meta": meta,
            })

    return DaskFrame(sdf.mapInPandas(gen, schema=schema))


def frame_sample(frame, every_n: int = 10):
    """Video frame-sampling contract: emit (doc_id, frame_idx) rows for
    every n-th frame — pure JVM via sequence+explode; the decode of the
    sampled frame would plug into decode_features."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf.filter(F.col("meta.kind") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    ).alias("frame_idx")
    return DaskFrame(sdf.select("doc_id", idx))


def audio_windows(frame, win: int = 16, hop: int = 8):
    """Audio frame windowing over the media column (the STFT-shaped
    plumbing a spectrogram pipeline needs: sample extraction →
    overlapping windows → per-window energy).

    The DECODE here is the deterministic fake in JVM-expression form
    — samples are the byte codes of the payload's sha2 hex digest —
    which makes the WHOLE pipeline (decode included) replayable in
    ANSI SQL, unlike the Arrow ``decode_features`` stub. The
    windowing arithmetic is the real thing: ``n_win = 1 +
    (n-win)/hop`` overlapping in-row slices, one posexplode, RMS per
    window via an in-row fold — map-only, no Python, no shuffle.
    Swap the sample expression for a real PCM decode and nothing
    downstream changes."""
    from dask_spark.frame import DaskFrame

    sdf = frame._sdf
    hexd = F.sha2(F.col("text"), 256)
    chars = F.split(hexd, "")
    n = 64  # digest length = fake sample count per doc
    samples = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.ascii(F.element_at(chars, (i + 1).cast("int")))
        .cast("double"),
    )
    n_win = 1 + (n - win) // hop
    windows = F.transform(
        F.sequence(F.lit(0), F.lit(n_win - 1)),
        lambda w: F.slice(samples, w * hop + 1, win),
    )
    out = sdf.select(
        "doc_id", F.posexplode(windows).alias("win_idx", "__w")
    ).select(
        "doc_id",
        "win_idx",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("__w"), F.lit(0.0), lambda a, x: a + x * x
                ) / win
            ),
            6,
        ).alias("rms"),
    )
    return DaskFrame(out)
