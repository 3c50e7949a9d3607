"""Market-basket / co-occurrence mining on DataFrames.

Frequent-pair association rules — the curation-side "what co-occurs with
what" primitive (co-ordered parts, co-cited documents, co-clicked items)
built on the same capped co-occurrence projection as the graph tier.
Reference analog: none (engine-side extension surface, SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.graph import cooccurrence_edges


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed association rules antecedent → consequent over a
    (basket, item) relation: ``support = P(a,b)``, ``confidence =
    P(b|a)``, ``lift = P(a,b) / (P(a)·P(b))`` — all derived from three
    EXACT integer counts (pair baskets, item baskets, total baskets),
    so every metric is a single IEEE division of int64-exact doubles
    and bit-identical across engines and partitionings (no sums of
    floats anywhere).

    Scale shape: pair generation reuses :func:`cooccurrence_edges`
    (JVM-side per-basket pair expansion, hub baskets droppable via
    ``max_basket_size`` BEFORE any pair exists); ``min_pair_count``
    prunes the pair frame BEFORE the two item-count joins, so the wide
    stage only ever sees pairs that can appear in the answer. The total
    basket count enters the plan as a broadcast single-row frame (the
    PageRank ``n_total`` pattern) — no driver-side ``.count()``, no
    extra scan outside the one plan.

    Output: ``(antecedent, consequent, pair_count, support, confidence,
    lift)`` — one row per direction of each surviving pair.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    bi = (
        df.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = bi.groupBy().agg(F.countDistinct("b").alias("n"))
    item_counts = bi.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = cooccurrence_edges(bi, "b", "i", max_group_size=max_basket_size).where(
        F.col("weight") >= min_pair_count
    )
    directed = pairs.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        F.col("weight").cast("long").alias("pair_count"),
    ).unionAll(
        pairs.select(
            F.col("b").alias("antecedent"),
            F.col("a").alias("consequent"),
            F.col("weight").cast("long").alias("pair_count"),
        )
    )
    return (
        directed.join(
            item_counts.select(
                F.col("i").alias("antecedent"), F.col("cnt").alias("__ant_cnt")
            ),
            "antecedent",
        )
        .join(
            item_counts.select(
                F.col("i").alias("consequent"), F.col("cnt").alias("__cons_cnt")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            (F.col("pair_count") / F.col("n")).alias("support"),
            (F.col("pair_count") / F.col("__ant_cnt")).alias("confidence"),
            (
                (F.col("pair_count") * F.col("n"))
                / (F.col("__ant_cnt") * F.col("__cons_cnt"))
            ).alias("lift"),
        )
    )
