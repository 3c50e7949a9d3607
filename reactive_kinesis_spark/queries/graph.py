"""Graph queries — the iterative-algorithm tier of the query surface.

PageRank is inherently iterative (a fixed point of the walk operator), so
it has no portable single-statement SQL oracle; correctness is pinned by
the numpy power-iteration differential in ``tests/test_graph.py`` (same
dangling-mass semantics, atol 1e-9) plus the engine-wide determinism
harnesses (six-seed differential, empty/null sweeps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.graph import pagerank
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier co-purchase edges from orders ⋈
    lineitem (distinct pairs; ids namespaced ``c<key>``/``s<key>`` so the
    two key spaces can't collide). Symmetry makes the walk complete (no
    dangling nodes), so ranks sum to 1."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


@query("q107_pagerank")  # rows-only: iterative fixed point, no portable SQL form
def q107_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 nodes of the customer↔supplier co-purchase graph by
    6-iteration PageRank — the iterative-dataflow tier next to q60's
    connected components. Deterministic (decimal mass sums) and fully
    distributed (no collects; lineage truncated per 3 rounds). See
    :func:`operators.graph.pagerank`."""
    edges = copurchase_edges(spark, sf_dir)
    return (
        pagerank(edges, iterations=6, assume_distinct=True)
        .orderBy(F.col("rank").desc(), "node")
        .limit(100)
    )
