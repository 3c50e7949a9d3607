"""Multimodal column conventions + processing plumbing (north star).

Convention: media rides as an opaque ``binary`` column plus a typed metadata
struct — the schema, partitioning and Arrow-batch plumbing are real and
tested; the actual codec calls are STUBBED (image/audio libraries are not in
this container) behind ``decoder=`` injection points:

* default ``decoder=None`` raises ``NotImplementedError`` with a clear
  message (production wires Pillow/ffmpeg here);
* ``decoder=fake_decoder`` is a deterministic pure-python stand-in used by
  tests, so every Spark-side aspect (schema, batch shape, null handling,
  partition behavior) is exercised for real.

Scale posture: all media ops are ``mapInPandas`` narrow transforms — no
shuffle, Arrow-batched, memory bounded by ``maxRecordsPerBatch`` × blob
size. Keep blobs out of shuffle keys; join on ``media_id``.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_meta", MEDIA_META_SCHEMA),
    ]
)

#: A decoder maps raw bytes -> (width, height, n_channels, pixel_iterator).
Decoder = Callable[[bytes], tuple[int, int, int, bytes]]


def fake_decoder(blob: bytes) -> tuple[int, int, int, bytes]:
    """Deterministic stand-in decoder: derives a tiny 'image' from the blob
    hash. Lets tests exercise the full Spark plumbing without codecs."""
    h = hashlib.sha256(blob).digest()
    w = 4 + h[0] % 4
    ht = 4 + h[1] % 4
    pixels = (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3]
    return w, ht, 3, pixels


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def decode_media(
    df: DataFrame,
    decoder: Decoder | None = None,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Decode blobs to (dimensions, checksum) rows. Narrow ``mapInPandas``;
    schema/batching real, codec injected."""
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment — inject one "
            "(e.g. Pillow-based) or use multimodal.fake_decoder in tests"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = getattr(r, media_col)
                if raw is None:
                    # null blob → null-valued row (keeps media_id accounting;
                    # one bad row must never fail a 100TB stage)
                    rows.append((getattr(r, id_col), None, None, None, None, None))
                    continue
                blob = bytes(raw)
                w, h, c, pixels = decoder(blob)
                rows.append(
                    (
                        getattr(r, id_col),
                        w,
                        h,
                        c,
                        len(blob),
                        hashlib.md5(pixels).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(run, DECODE_SCHEMA)


def media_features(
    df: DataFrame,
    dim: int = 16,
    decoder: Decoder | None = None,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Feature-extraction stub: decoded media -> ``array<float>`` embedding
    (deterministic hash-derived in the fake path; a real model slots into
    the same Arrow-batch signature). Output joins straight into the
    similarity operators (operators.similarity)."""
    if decoder is None:
        raise NotImplementedError(
            "no feature extractor available — inject a decoder/model; tests "
            "use multimodal.fake_decoder"
        )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for r in pdf.itertuples(index=False):
                raw = getattr(r, media_col)
                if raw is None:
                    ids.append(getattr(r, id_col))
                    vecs.append(None)
                    continue
                blob = bytes(raw)
                _, _, _, pixels = decoder(blob)
                # deterministic projection of pixel bytes into `dim` floats
                vec = []
                for i in range(dim):
                    h = hashlib.sha256(pixels + _struct.pack(">I", i)).digest()
                    (v,) = _struct.unpack(">q", h[:8])
                    vec.append(float(v) / float(1 << 63))
                ids.append(getattr(r, id_col))
                vecs.append(vec)
            yield pd.DataFrame({id_col: ids, "embedding": vecs})

    return df.select(id_col, media_col).mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1_000,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Video frame-sampling stub: one output row per sampled frame with a
    frame index and byte-slice 'frame' — real explode shape (1→N rows),
    fake slicing. A real ffmpeg sampler keeps this exact signature."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = getattr(r, media_col)
                if raw is None:
                    continue  # no blob → no frames
                blob = bytes(raw)
                meta = getattr(r, "media_meta", None)
                duration = (meta["duration_ms"] if meta is not None else None) or 1_000
                n_frames = max(1, int(duration) // every_ms)
                step = max(1, len(blob) // n_frames) if blob else 1
                for i in range(n_frames):
                    rows.append((getattr(r, id_col), i, blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    cols = [id_col, media_col] + (["media_meta"] if "media_meta" in df.columns else [])
    return df.select(*cols).mapInPandas(run, out_schema)


def with_media_meta(
    df: DataFrame,
    mime: str,
    media_col: str = "media",
) -> DataFrame:
    """Attach the standard metadata struct (unknown dims until decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def raw_gray8_decoder(blob: bytes) -> tuple[int, int, int, bytes]:
    """Trivial codec for PRE-DECODED media: the blob already is a 64-byte
    8×8 single-channel pixel buffer (the shape a feature store would keep
    after thumbnailing upstream). Also the workers-importable controlled
    codec for perceptual-hash tests."""
    return 8, 8, 1, blob


PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def perceptual_hash(
    df: DataFrame,
    decoder: Decoder | None = None,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """64-bit average-hash (aHash) per media blob: decode → grayscale →
    8×8 block-mean downsample → threshold at the mean → one bit per cell.
    The standard cheap perceptual fingerprint: re-encodes, resizes, and
    small edits move a few bits; unrelated images differ in ~32. Narrow
    Arrow ``mapInPandas`` — same codec-injection contract as
    :func:`decode_media` (NULL blob → NULL hash).
    """
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment — inject one "
            "(e.g. Pillow-based) or use multimodal.fake_decoder in tests"
        )

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def ahash(blob: bytes) -> int:
            w, h, c, pixels = decoder(blob)
            a = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(np.int64)
            # grayscale as the exact per-pixel CHANNEL SUM (c·gray) — the
            # ×c scale cancels out of the threshold below, and staying in
            # integers makes the hash engine-portable: cell ≥ mean(cells)
            # on c-channel means is exactly 64·g ≥ Σg on channel sums, no
            # float rounding anywhere (this is what lets q122/q123 be
            # hash-certified against an ANSI-SQL oracle)
            g = a[: w * h * c].reshape(h, w, c).sum(axis=2)
            # 8×8 nearest-neighbor resample — total for ANY w,h (block-mean
            # grids produce empty slices when the image is smaller than
            # 8×8, which NaN-collapses the hash); index math is pure
            # integer: floor((2k+1)·dim/16), clamped
            yi = np.minimum(((2 * np.arange(8) + 1) * h) // 16, h - 1)
            xi = np.minimum(((2 * np.arange(8) + 1) * w) // 16, w - 1)
            cells = g[np.ix_(yi, xi)]
            bits = (64 * cells >= cells.sum()).flatten()
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            # two's-complement into int64
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = getattr(r, media_col)
                rows.append(
                    (
                        getattr(r, id_col),
                        None if raw is None else ahash(bytes(raw)),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return df.select(id_col, media_col).mapInPandas(run, PHASH_SCHEMA)


def phash_neardup_pairs(
    df: DataFrame,
    decoder: Decoder | None = None,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "media_id",
    media_col: str = "media",
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by banded perceptual hash — the
    multimodal twin of the SimHash text pipeline (operators/dedup.py):
    two blobs within ``max_hamming`` bits of aHash distance must agree
    EXACTLY on at least one of ``bands`` disjoint hash segments
    (pigeonhole: requires ``bands > max_hamming``), so candidates come
    from ``bands`` cheap equality bucket-joins — never an all-pairs
    comparison — and only candidates pay the exact popcount check.

    Scale shape: hashes are 8 bytes/blob (the blobs themselves never
    shuffle); each band join is an equality shuffle on (band, value);
    verification is ``bit_count(xor)`` JVM-side. Hub buckets (a constant
    band value shared by everything — letterboxed black frames, solid
    slides) are the df-cap analog: a bucket of size k emits k²/2
    candidates, so ``max_bucket`` DROPS (band, value) buckets larger
    than the cap ENTIRELY (contribution 0, not a truncated sample)
    before the self-join — candidate count is then bounded by
    ``bands · Σ_{buckets with k ≤ max_bucket} k²`` regardless of corpus
    degeneracy. The cost is recall only on pairs whose ONLY agreeing
    band is a hub value — exactly the least informative agreement (the
    same trade the near-dup text operators make with their
    document-frequency caps).

    Output: ``(id_1, id_2, hamming)``, id_1 < id_2, distinct.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"pigeonhole needs bands > max_hamming (got {bands} <= {max_hamming})"
        )
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    hashes = (
        perceptual_hash(df, decoder=decoder, id_col=id_col, media_col=media_col)
        .where(F.col("phash").isNotNull())
        # both sides of the band self-join reference this frame — without
        # eager materialization every branch would re-decode and re-hash
        # the blobs (the q111 cross-branch-CSE lesson, here with Python
        # decode cost attached)
        .localCheckpoint(eager=True)
    )
    mask = (1 << width) - 1
    banded = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "phash", "bv.band", "bv.val")
    if max_bucket is not None:
        # one (band, val)-keyed count + filter before the self-join; the
        # window-free two-step (count frame joined back) keeps it a plain
        # aggregate, broadcastable when the surviving bucket list is small
        sizes = banded.groupBy("band", "val").agg(
            F.count(F.lit(1)).alias("__n")
        )
        banded = (
            banded.join(sizes, ["band", "val"])
            .where(F.col("__n") <= int(max_bucket))
            .drop("__n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_1"),
            F.col("b.media_id").alias("id_2"),
            F.col("a.phash").alias("h1"),
            F.col("b.phash").alias("h2"),
        )
        .dropDuplicates(["id_1", "id_2"])
    )
    return (
        cands.withColumn(
            "hamming",
            F.expr("bit_count(h1 ^ h2)").cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )
