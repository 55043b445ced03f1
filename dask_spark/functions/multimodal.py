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


def decode_features(frame, out_dim: int = 10,
                    with_phash: int | None = None):
    """mapInPandas decode+featurize: binary → fixed-dim float vector.
    Arrow batches keep the Python boundary amortized; at 100 TB this
    stage is embarrassingly parallel (map-only, no shuffle).

    ``with_phash=dim`` (r15): additionally emit ``ph bigint`` — the
    perceptual hash over the first ``dim`` features, computed
    vectorized INSIDE the decode kernel instead of via the
    interpreted ``phash_bits`` higher-order aggregate downstream
    (guide §4.2: the HOF chain is ~dim·3 interpreted ops per row on
    the stage right after the Python boundary). Bit-identical to
    phash_bits by construction: the mean's sum starts at 0.0 and
    folds strictly left-to-right (the aggregate's exact order), and
    bit i packs 2^i iff features[i] > mean — integer arithmetic
    after two identically-ordered double ops."""
    from dask_spark.frame import DaskFrame

    schema = "doc_id bigint, features array<double>"
    if with_phash:
        schema += ", ph bigint"

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = [
                _fake_decode(m, w, h, out_dim)
                for m, w, h in zip(
                    pdf["media"], pdf["meta"].map(lambda s: s["width"]),
                    pdf["meta"].map(lambda s: s["height"]),
                )
            ]
            out = {"doc_id": pdf["doc_id"], "features": feats}
            if with_phash:
                d = int(with_phash)
                C = np.asarray(
                    [f[:d] for f in feats], dtype="float64"
                ).reshape(len(feats), d)
                s = np.zeros(len(feats), dtype="float64")
                for i in range(d):  # same L2R order as phash_bits
                    s = s + C[:, i]
                mean = s / float(d)
                ph = np.zeros(len(feats), dtype="int64")
                for i in range(d):
                    ph += np.where(C[:, i] > mean, np.int64(1) << i, 0)
                out["ph"] = ph
            yield pd.DataFrame(out)

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


def phash_bits(features: Column, dim: int) -> Column:
    """64-bit-style perceptual hash from a decoded feature vector:
    bit i set iff features[i] > mean(features) — the aHash/pHash
    thresholding step (real pHash inserts a DCT before it; the
    bit-fold, banding and hamming verify below are identical). Pure
    Column expressions: the mean folds left-to-right so an oracle
    replays it bit-for-bit; the fold packs bit i as 2^i."""
    s = F.aggregate(
        features, F.lit(0.0), lambda acc, v: acc + v
    )
    mean = s / F.lit(float(dim))
    idx = F.sequence(F.lit(0), F.lit(int(dim) - 1))
    return F.aggregate(
        F.zip_with(
            features, idx,
            lambda v, i: F.when(
                v > mean,
                F.call_function("shiftleft",
                                F.lit(1).cast("bigint"), i.cast("int")),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + b,
    )


def phash_near_dup(frame, dim: int = 32, band_bits: int = 8,
                   max_hamming: int = 6):
    """Perceptual-hash near-duplicate MEDIA pairs →
    DaskFrame(id_a, id_b, hamming): decode (Arrow kernel; the
    container-stubbed deterministic fake — the real decoder swaps in
    behind the same signature) → expression-level threshold hash →
    LSH banding on ``band_bits`` slices (a pair within ``max_hamming``
    collides on ≥1 band whenever its differing bits miss one band —
    the simhash recall argument) → exact hamming verify via
    bit_count(xor).

    100 TB shape: decode map-only Arrow; the hash and band columns
    are projections; the only exchanges carry (band, value, id)
    tuples and the candidate ids — media bytes never shuffle.

    The hash covers the ``dim`` CONTENT features only — the decoder's
    trailing (width, height) dims are excluded: dimensions are 10-600×
    the normalized intensities, so including them drags the threshold
    mean above every content feature and collapses the hash to ~2
    distinct values (caught when the first cut matched all C(n,2)
    pairs)."""
    from dask_spark.frame import DaskFrame

    n_bands = int(dim) // int(band_bits)
    # r15: ph computed inside the decode kernel (vectorized, one
    # Python pass) — the interpreted phash_bits HOF chain drops out
    # of the plan; arithmetic contract unchanged (see decode_features)
    feats = decode_features(
        frame, out_dim=int(dim) + 2, with_phash=int(dim)
    )._sdf
    hashed = feats.select("doc_id", "ph")
    mask = (1 << int(band_bits)) - 1
    bands = hashed.select(
        "doc_id", "ph",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.call_function(
                    "shiftrightunsigned", F.col("ph"),
                    F.lit(b * int(band_bits))
                ).bitwiseAND(F.lit(mask)).alias("sig"),
            )
            for b in range(n_bands)
        ])).alias("bd"),
    ).select("doc_id", "ph", "bd.band", "bd.sig")
    a = bands.select(F.col("doc_id").alias("id_a"),
                     F.col("ph").alias("ph_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("id_b"),
                     F.col("ph").alias("ph_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b").distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    out = cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= int(max_hamming))
    return DaskFrame(out)
