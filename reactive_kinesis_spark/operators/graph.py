"""Iterative graph algorithms on DataFrames.

The engine's iterative-computation tier (alongside the O(log n)
large-star/small-star connected components in :mod:`operators.dedup`):
fixed-iteration dataflow loops built from joins + aggregations, with
per-round lineage truncation so the plan doesn't grow with the iteration
count — the Spark-first shape for PageRank-style algorithms (same loop
skeleton as the classic Pregel-on-dataflow formulations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal type for rank mass: ranks are probabilities (≤ 1), so 20 integer
#: digits / 18 fractional digits keeps per-node inbound sums exact for any
#: realistic in-degree while making the aggregation ORDER-INDEPENDENT —
#: a plain double sum would make ranks depend on partition/merge order,
#: breaking the engine's determinism contract (same input ⇒ same bits).
_RANK_DEC = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    assume_distinct: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the canonical
    "importance by random walk" score for entity graphs (co-purchase,
    citation, link graphs) a curation pipeline weights documents or
    sources by.

    Semantics: standard damped PageRank with DANGLING MASS DROPPED (a
    node with no outbound edges absorbs its walk; ranks then sum to < 1).
    That's the common dataflow simplification — redistribute-to-all needs
    a per-iteration global scalar, a driver round-trip this operator
    deliberately avoids; feed symmetric edges if the graph must be
    walk-complete. Multi-edges are collapsed up front.

    ``weight_col`` makes the walk WEIGHTED: a node's outbound mass splits
    proportionally to edge weight (``w / Σ_out w``) instead of uniformly
    — co-purchase counts, link frequencies, similarity scores. Weights
    must be non-negative; zero-total-weight nodes behave as dangling.
    With ``weight_col`` multi-edge dedup is skipped (duplicate (src, dst)
    rows are the caller's aggregation decision — pre-sum them into the
    weight instead).

    Determinism: per-node inbound mass is summed in DECIMAL(38,18)
    (exact, order-independent) so the result is bit-stable across
    partitionings, retries, and AQE re-plans — the property the engine's
    six-seed differential harness asserts for every registered query.

    100 TB shape: the per-iteration dataflow is one src-keyed equi-join
    (ranks ⋈ out-degree-annotated edges) and one dst-keyed aggregation —
    both AQE-managed shuffles keyed by node id; nothing is ever collected
    (the node count, one scalar, is computed distributed and carried as a
    broadcast single-row frame). ``localCheckpoint`` every
    ``checkpoint_every`` rounds truncates lineage so plan size and
    scheduler overhead stay O(1) in ``iterations`` — without it the DAG
    doubles per round. Returns ``(node, rank)``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if weight_col is not None:
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        ).where(F.col("w") > 0)
    else:
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.lit(1.0).alias("w"),
        )
        if not assume_distinct:
            # multi-edges would multiply contributions; skip the
            # (full-edge-list shuffle) dedup only when the producer
            # guarantees distinctness
            e = e.dropDuplicates(["src", "dst"])
    # the loop-invariant frames are materialized ONCE (localCheckpoint also
    # cuts their lineage out of every iteration's plan): nodes, the node
    # count (a single-row frame, broadcast into each round — never a
    # driver collect), and the out-degree-annotated edges
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(
        F.sum(F.col("w").cast(_RANK_DEC)).cast("double").alias("out_w")
    )
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    teleport = (1.0 - damping) / F.col("n").cast("double")
    ranks = (
        nodes.crossJoin(F.broadcast(n_total))
        .select("node", (F.lit(1.0) / F.col("n").cast("double")).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for i in range(iterations):
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("out_w")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("__c").cast(_RANK_DEC)).cast("double").alias("__mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("__mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
