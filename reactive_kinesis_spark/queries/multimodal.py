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
    Narrow projection; blob = UTF-8 bytes of the text. ``parallelize=False``:
    the media tier is deliberately narrow (decode/slice per row, tiny final
    aggregate) — an injected deficient-layout repartition would shuffle the
    blob bytes for no parallel-compute gain (measured +1.3 s on q32 at
    sf0.1) and break the blobs-never-shuffle posture."""
    docs = load_table(spark, sf_dir, "documents", parallelize=False)
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


# -- q122/q123 oracle machinery: the ENTIRE perceptual-hash pipeline
# (fake-codec decode → integer aHash → pigeonhole banding → exact
# Hamming) re-derived in ANSI SQL. Portable because the aHash is pure
# integer arithmetic end-to-end (operators/multimodal.perceptual_hash):
# pixel j = sha256-digest byte (j % 32), grayscale = channel SUM,
# 8×8 NN resample via floor((2k+1)·dim/16), bit = 64·g ≥ Σg, so both
# engines compute the identical 64 bits from the identical digest.


def _db(dig: str, idx: str) -> str:
    """SQL for digest byte at (dynamic) index ``idx`` of hex string ``dig``."""
    hi = f"strpos('0123456789abcdef', substr({dig}, 2*({idx})+1, 1)) - 1"
    lo = f"strpos('0123456789abcdef', substr({dig}, 2*({idx})+2, 1)) - 1"
    return f"(({hi}) * 16 + ({lo}))"


def _phash_cte_sql(m_cte: str, capped: bool = False) -> str:
    """The shared phash pipeline CTEs over an ``m(media_id, dig)`` frame;
    ``capped=True`` adds the q123 max_bucket=16 hub-bucket drop."""
    base = (
        "(yi * w + xi) * 3"  # pixel base index of the sampled cell
    )
    g = " + ".join(_db("dig", f"({base} + {k}) % 32") for k in range(3))
    bucket_src = "bandvals_capped" if capped else "bandvals"
    cap_cte = (
        """,
    bsizes AS (
        SELECT band, val, COUNT(*) AS n FROM bandvals GROUP BY band, val
    ),
    bandvals_capped AS (
        SELECT bv.media_id, bv.band, bv.val
        FROM bandvals bv JOIN bsizes USING (band, val) WHERE n <= 16
    )"""
        if capped
        else ""
    )
    return f"""
    WITH m AS ({m_cte}),
    dims AS (
        SELECT media_id, dig,
               4 + ({_db('dig', '0')}) % 4 AS w,
               4 + ({_db('dig', '1')}) % 4 AS ht
        FROM m
    ),
    grid AS (
        SELECT media_id, dig, w, ht, t1.r AS r, t2.s AS s,
               LEAST(((2 * t1.r + 1) * ht) // 16, ht - 1) AS yi,
               LEAST(((2 * t2.s + 1) * w) // 16, w - 1) AS xi
        FROM dims, UNNEST(range(8)) AS t1(r), UNNEST(range(8)) AS t2(s)
    ),
    cells AS (
        SELECT media_id, r, s, {g} AS g FROM grid
    ),
    tot AS (SELECT media_id, SUM(g) AS sg FROM cells GROUP BY media_id),
    bits AS (
        SELECT c.media_id, (r * 8 + s) AS idx,
               CASE WHEN 64 * g >= sg THEN 1 ELSE 0 END AS b
        FROM cells c JOIN tot USING (media_id)
    ),
    ph AS (
        SELECT media_id,
               CAST(SUM(CASE
                   WHEN idx = 0 THEN
                       CASE WHEN b = 1 THEN -9223372036854775808 ELSE 0 END
                   ELSE b * (CAST(1 AS BIGINT) << CAST(63 - idx AS INT))
               END) AS BIGINT) AS phash
        FROM bits GROUP BY media_id
    ),
    bandvals AS (
        SELECT media_id, (63 - idx) // 16 AS band,
               SUM(b * (CAST(1 AS BIGINT) << CAST((63 - idx) % 16 AS INT)))
                 AS val
        FROM bits GROUP BY media_id, (63 - idx) // 16
    ){cap_cte},
    cand AS (
        SELECT DISTINCT x.media_id AS id_1, y.media_id AS id_2
        FROM {bucket_src} x
        JOIN {bucket_src} y
          ON x.band = y.band AND x.val = y.val AND x.media_id < y.media_id
    )
    SELECT c.id_1, c.id_2,
           CAST(bit_count(xor(p1.phash, p2.phash)) AS INT) AS hamming
    FROM cand c
    JOIN ph p1 ON p1.media_id = c.id_1
    JOIN ph p2 ON p2.media_id = c.id_2
    WHERE bit_count(xor(p1.phash, p2.phash)) <= 3
    ORDER BY id_1, id_2
    """


_Q122_M = """
        SELECT doc_id AS media_id, sha256(text) AS dig FROM documents
        UNION ALL
        SELECT doc_id + 10000000, sha256(text) FROM documents
        WHERE doc_id % 10 = 0
"""

# q123: 5% of base rows carry one constant 256-zero-byte blob; its digest
# is a compile-time constant (sha256 of 256 NUL bytes — bytes SQL cannot
# spell in a VARCHAR, so the oracle embeds the digest itself)
_ZERO_BLOB_DIGEST = "5341e6b2646979a70e57653007a1f310169421ec9bdd9f1a5648f75ade005af1"
_Q123_M = f"""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 20 = 7 THEN '{_ZERO_BLOB_DIGEST}'
                    ELSE sha256(text) END AS dig
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, sha256(text) FROM documents
        WHERE doc_id % 10 = 0
"""


@query("q122_media_phash_neardup", oracle=_phash_cte_sql(_Q122_M))
def q122_media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over the media corpus by banded 64-bit
    perceptual hash (aHash, 4×16-bit pigeonhole bands, Hamming ≤ 3) — the
    multimodal twin of the SimHash text pipeline: blobs never shuffle
    (8-byte hashes do), candidates come from band-equality bucket joins,
    only candidates pay the exact popcount. A 10% re-ingest of the corpus under fresh ids provides the duplicate
    mass; with the deterministic fake codec those cross-copies land at
    Hamming 0 (sha-avalanche pixels have no near-miss regime — a real
    codec supplies the 1-3-bit band). HASH-certified (round 10): the
    aHash is integer arithmetic end-to-end — digest bytes → channel
    sums → NN resample → 64·g ≥ Σg bits — so the full pipeline incl.
    banding and Hamming is re-derived verbatim in the DuckDB oracle.
    See :func:`operators.multimodal.phash_neardup_pairs`."""
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


@query("q123_media_phash_capped", oracle=_phash_cte_sql(_Q123_M, capped=True))
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
