"""Composite relational operators Spark lacks as single calls.

Each is a composition of built-in DataFrame ops (no UDFs), so Catalyst
optimizes straight through them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` — one shuffle on the group
    key, no global sort; the scalable top-k idiom at any data size."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .where(F.col(rank_col) <= k)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the greatest
    ``right_time <= left_time`` for the same key.

    Implementation is the union+window idiom — a *single* shuffle on the key,
    instead of a range join (which would be O(n·m) per key):

    1. union left and right with a side tag (right sorts before left at equal
       timestamps, so equality matches);
    2. per key ordered by (time, side), carry the last non-null right values
       forward with ``last(..., ignorenulls=True)``;
    3. keep left rows.

    ``right`` must be unique per ``(right_key, right_time)`` — pre-dedup with
    :func:`top_k_per_group` if needed. This composition scales linearly and
    survives skew via AQE; it is the planner-friendly alternative to an
    iterative merge.
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    tagged_right = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_value_cols
        ],
    )
    return filled.where(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__f_{c}").alias(c) for c in right_value_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval/theta join. With a broadcastable right side this is a
    broadcast-nested-loop join (fine at scale when right is a small interval
    dimension); otherwise fall back to a shuffled cross+filter."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition, how)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE-INTO semantics as a DataFrame transform: rows from ``updates``
    win on matching keys (UPDATE), unmatched update rows are kept (INSERT),
    unmatched target rows pass through unchanged. The batch upsert every
    incremental-ingest pipeline needs (the dedup twin is
    :func:`operators.dedup.incremental_dedup`, which drops instead of
    replacing); compose with ``io.write_batch``/``write_bucketed`` to
    persist.

    Duplicate keys WITHIN ``updates`` are a caller bug this operator does
    not resolve (use :func:`operators.dedup.canonical_pick` first) — both
    copies land in the output exactly as MERGE would reject them.

    100 TB shape: ONE left-anti join (target minus updated keys) + a
    union. The target is never aggregated or windowed — the delta is the
    small side, broadcast by default so the 100 TB target does not
    shuffle at all; set ``broadcast_updates=False`` for giant deltas and
    let AQE pick (with a bucketed target the anti join is shuffle-free
    either way). Schemas must match (unionByName, no missing columns).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    u = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(u.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(updates)
