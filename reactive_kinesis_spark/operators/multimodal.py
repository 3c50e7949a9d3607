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
