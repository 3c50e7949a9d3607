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


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed each step of
    ``steps`` IN ORDER (each step strictly after their first qualifying
    occurrence of the previous one), with step-over-step and overall
    conversion rates — the product-analytics staple every event pipeline
    reimplements.

    Semantics: a user reaches step ``i`` at ``t_i = min ts`` of their
    ``steps[i]`` events with ``ts > t_{i-1}`` (strict ordering; the
    earliest-qualifying-time rule makes the funnel greedy and
    deterministic). Counts are exact ints; conversions are single IEEE
    divisions (step 0's step-conversion is defined as 1.0).

    Returns one row per step:
    ``(step, step_name, n_users, conv_from_prev, conv_overall)``.

    100 TB shape: the plan is ``len(steps)`` user-keyed min-aggregates
    chained by user-keyed joins — every wide stage shuffles on the SAME
    key (one partitioning, reused), each stage's frame is
    one-row-per-surviving-user, and the event scan is filtered to one
    step's type before anything wide happens. The per-step counts union
    into a ``len(steps)``-row frame; the window over it is trivial. No
    sequence materialization (no collect_list of per-user event arrays —
    the usual OOM shape of naive funnel code at scale).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    reached = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    frames = [reached]
    for st in steps[1:]:
        nxt = (
            events.where(F.col(type_col) == st)
            .join(frames[-1].select(user_col, F.col("__t").alias("__prev")), user_col)
            .where(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        frames.append(nxt)
    counts = None
    for i, (st, fr) in enumerate(zip(steps, frames)):
        c = fr.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("step"),
            F.lit(st).alias("step_name"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    w = Window.orderBy("step")
    return counts.select(
        "step",
        "step_name",
        "n_users",
        F.when(F.col("step") == 0, F.lit(1.0))
        .otherwise(
            F.col("n_users").cast("double")
            / F.lag("n_users").over(w).cast("double")
        )
        .alias("conv_from_prev"),
        (
            F.col("n_users").cast("double")
            / F.first("n_users").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
        ).alias("conv_overall"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the ISO week
    of their FIRST event; for every (cohort, week offset) cell, the
    number of cohort members active that week and the retention ratio —
    the other product-analytics staple (funnels measure a flow, cohorts
    measure decay).

    Week truncation uses ``date_trunc('week', ts)`` (ISO Monday in both
    Spark and DuckDB); offsets are exact integer day-diffs divided by 7
    (week-truncated timestamps differ by exact multiples of 7 days, so
    the division is exact). Counts are exact ints; retention is one IEEE
    division.

    Returns ``(cohort_week, week_offset, n_active, cohort_size,
    retention)``, one row per cohort × active week.

    100 TB shape: one user-keyed min-aggregate (cohorts), one distinct
    over (user, week) — both map-side combinable — one user-keyed join,
    then a (cohort, offset)-keyed count. Cell count is bounded by
    #weeks², independent of corpus size; only the per-user frames are
    data-sized and they shuffle once each on the user key.
    """
    firsts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("__aw")
        )
        .distinct()
    )
    j = active.join(firsts, user_col).select(
        user_col,
        "cohort_week",
        (F.datediff("__aw", "cohort_week") / F.lit(7)).cast("int").alias("week_offset"),
    )
    cells = j.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(user_col).cast("long").alias("n_active")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )
