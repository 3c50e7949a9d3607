"""Similarity search over embedding columns (``array<float>``).

Two strategies:

* **brute-force cosine top-k** — the correctness baseline: broadcast the
  query block, JVM-side ``zip_with``/``aggregate`` dot products (no Python in
  the hot path), ``row_number`` top-k. Exact; cost O(|queries|·|corpus|·d).
* **LSH-bucketed ANN (random hyperplanes)** — the 100 TB path: sign-bit
  signatures computed JVM-side from a broadcast hyperplane matrix, candidates
  restricted to matching buckets (multi-probe via bands), exact re-rank on
  candidates only.

Embedding-cosine near-duplicate detection reuses the same machinery with a
similarity threshold instead of top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reactive_kinesis_spark.functions import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row against the corpus.

    The query side is broadcast (block of query vectors); the corpus streams
    through — at 100 TB the corpus never shuffles, and query blocks are sized
    to fit the broadcast limit (chunk the query set and union for bigger Q).
    Returns ``(query_id, neighbor_id, cosine_sim, rn)``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qvec", "__cvec").alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure-python LCG so the
    operator has no numpy dependency at plan-build time)."""
    state = seed
    planes: list[list[float]] = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # xorshift64* style LCG -> uniform(-1, 1)
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def hyperplane_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Random-hyperplane LSH signature (int bitmap of dot-product signs),
    computed with JVM array ops against literal plane vectors."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane_col, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, sig.cast("int"))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing ≥1 of ``bands`` signature
    bands with the query, exact cosine re-rank on candidates only.

    At scale this replaces the O(Q·N) cross join with a bucket equi-join:
    corpus signatures are computed once (streamed, no shuffle), the join key
    is (band, band_bits), and AQE handles bucket skew.
    Returns ``(query_id, neighbor_id, cosine_sim, rn)`` — approximate recall.
    """
    bits_per_band = n_planes // bands

    def banded(df: DataFrame, id_alias: str, keep_vec: str) -> DataFrame:
        sig = hyperplane_signature(df, vec_col, n_planes, dim)
        return sig.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(keep_vec),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("lsh_sig"), b * bits_per_band)
                            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                            .alias("bits"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(id_alias, keep_vec, F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))

    qb = banded(queries, "query_id", "__qvec")
    cb = banded(corpus, "neighbor_id", "__cvec")
    cand = (
        cb.join(F.broadcast(qb), ["band", "bits"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_similarity("__qvec", "__cvec").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w).cast("int")).where(F.col("rn") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold) via the
    same LSH bucketing (near-dups almost surely collide in ≥1 band)."""
    bits_per_band = n_planes // bands
    sig = hyperplane_signature(df, vec_col, n_planes, dim)
    banded = sig.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("lsh_sig"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, vec_col, F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    x = banded.select(
        F.col("band"), F.col("bits"), F.col(id_col).alias("id_1"), F.col(vec_col).alias("__v1")
    )
    y = banded.select(
        F.col("band"), F.col("bits"), F.col(id_col).alias("id_2"), F.col(vec_col).alias("__v2")
    )
    return (
        x.join(y, ["band", "bits"])
        .where(F.col("id_1") < F.col("id_2"))
        .dropDuplicates(["id_1", "id_2"])
        .select("id_1", "id_2", cosine_similarity("__v1", "__v2").alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )
