"""Multimodal-pipeline queries (north-star extensions): binary media
columns processed through Arrow-batched ``mapInPandas`` plumbing
(operators.multimodal), verified against DuckDB oracles that recompute the
deterministic fake-codec math in portable SQL.

Media fixture: the ``documents`` table's text re-encoded as binary blobs —
the blob *content* is irrelevant to the plumbing under test (schema, batch
shape, explode arithmetic, null handling); what matters is that both engines
see identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators import multimodal as M
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the standard media frame (media_id, media, media_meta).
    Narrow projection; blob = UTF-8 bytes of the text."""
    docs = load_table(spark, sf_dir, "documents")
    return M.with_media_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("media"),
        ),
        mime="text/plain",
    )


# DuckDB re-derivation of fake_decoder's dimension math: width/height come
# from the first two bytes of sha256(blob); sha256() in DuckDB takes VARCHAR
# and hashes its UTF-8 bytes — identical input to the Python side.
_HEXB = "strpos('0123456789abcdef', {h}[{i}]) - 1"


def _sha_byte(pos: int) -> str:
    hi = _HEXB.format(h="sha256(text)", i=2 * pos + 1)
    lo = _HEXB.format(h="sha256(text)", i=2 * pos + 2)
    return f"(({hi}) * 16 + ({lo}))"


@query(
    "q32_media_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(4 + {_sha_byte(0)} % 4 AS INT) AS width,
           CAST(4 + {_sha_byte(1)} % 4 AS INT) AS height,
           3 AS n_channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY media_id
    """,
)
def q32_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode plumbing: binary column → (dims, size) via Arrow-batched
    ``mapInPandas`` with the deterministic fake codec. Narrow (no shuffle
    before the final presentation sort); memory bounded by Arrow batch size ×
    blob size — the 100 TB posture for opaque media columns."""
    dec = M.decode_media(_media_frame(spark, sf_dir), decoder=M.fake_decoder)
    return dec.select("media_id", "width", "height", "n_channels", "n_bytes").orderBy(
        "media_id"
    )


@query(
    "q33_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % 10 + 1 AS BIGINT) AS n,
               octet_length(encode(text)) AS len
        FROM documents
    )
    SELECT media_id,
           CAST(n AS BIGINT) AS n_frames,
           CAST(LEAST(n * GREATEST(1, len // n), len) AS BIGINT) AS total_frame_bytes
    FROM m
    ORDER BY media_id
    """,
)
def q33_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1→N explode of a media blob into per-frame rows
    (duration-derived frame count), re-aggregated to per-media stats. The
    oracle recomputes the slice arithmetic closed-form; row-explosion and
    byte-slicing happen for real on the Spark side."""
    media = _media_frame(spark, sf_dir).withColumn(
        "media_meta",
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            ((F.col("media_id") % 10 + 1) * 1000).cast("long").alias("duration_ms"),
        ),
    )
    frames = M.frame_sample(media, every_ms=1000)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.octet_length("frame")).alias("total_frame_bytes"),
        )
        .orderBy("media_id")
    )


@query("q34_media_features")  # rows-only: sha256-projection not portable SQL
def q34_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: blob → array<float> embedding (fake projection;
    a real model slots into the same Arrow signature), then fed straight
    into the JVM-side cosine pipeline — media and text embeddings share one
    similarity surface. Deterministic; verified by rows+schema check."""
    feats = M.media_features(
        _media_frame(spark, sf_dir), dim=16, decoder=M.fake_decoder
    )
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return feats.select(
        "media_id",
        F.round(dot, 6).alias("self_dot"),
        F.size("embedding").alias("dim"),
    ).orderBy("media_id")


@query("q122_media_phash_neardup")  # rows-only: sha-derived aHash, not portable SQL
def q122_media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over the media corpus by banded 64-bit
    perceptual hash (aHash, 4×16-bit pigeonhole bands, Hamming ≤ 3) — the
    multimodal twin of the SimHash text pipeline: blobs never shuffle
    (8-byte hashes do), candidates come from band-equality bucket joins,
    only candidates pay the exact popcount. A 10% re-ingest of the corpus under fresh ids provides the duplicate
    mass; with the deterministic fake codec those cross-copies land at
    Hamming 0 (sha-avalanche pixels have no near-miss regime — a real
    codec supplies the 1-3-bit band). See
    :func:`operators.multimodal.phash_neardup_pairs`."""
    base = _media_frame(spark, sf_dir)
    # simulate a partial re-ingest: 10% of the corpus re-appears under new
    # media_ids (same bytes — a re-uploaded image). The pipeline's job is
    # to find exactly those cross-copy pairs.
    reingest = base.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    media = base.unionByName(reingest)
    return (
        M.phash_neardup_pairs(media, decoder=M.fake_decoder)
        .orderBy("id_1", "id_2")
    )


@query("q123_media_phash_capped")  # rows-only: sha-derived aHash, not portable SQL
def q123_media_phash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q122 under corpus degeneracy: 5% of the media rows are replaced by
    one CONSTANT blob (the letterboxed-black-frame scenario — every such
    row agrees on every hash band), and ``max_bucket=16`` drops those hub
    buckets before the band self-join, so candidate count stays bounded
    by ``bands · Σ min(k, 16)²`` instead of the hub's k²/2 blowup (16 is
    below the hub size at every test scale factor; legitimate duplicate
    buckets have size ~2). The
    genuine 10% re-ingest pairs still surface through their (non-hub)
    bands; the constant-frame pairs — the least informative duplicates —
    are the ones traded away, exactly like the text near-dup operators'
    document-frequency caps. See
    :func:`operators.multimodal.phash_neardup_pairs` (``max_bucket``)."""
    base = _media_frame(spark, sf_dir).withColumn(
        "media",
        F.when(
            F.col("media_id") % 20 == 7, F.lit(b"\x00" * 256).cast("binary")
        ).otherwise(F.col("media")),
    )
    reingest = base.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(10_000_000)
    )
    media = base.unionByName(reingest)
    return (
        M.phash_neardup_pairs(media, decoder=M.fake_decoder, max_bucket=16)
        .orderBy("id_1", "id_2")
    )
