"""Skew mitigation: salted aggregation and salted broadcast-replicated
joins (SURVEY.md §2.2 / north star '100 TB posture').

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``, on in
session.get_spark): it splits oversized shuffle partitions at runtime. These
helpers are for the cases AQE can't fix:

* **aggregation skew** — one hot group key saturates a single reducer. AQE
  never splits a hash-aggregate partition, because rows of one key must meet
  in one task. ``salted_agg`` makes the aggregate two-phase: partial agg on
  (key, salt) spreads the hot key over N tasks, final agg on key merges N
  partials — correct for any decomposable aggregate.
* **join skew where the dimension is small enough to replicate** — salt the
  fact side, explode the dimension side over all salt values; every fact
  partition finds its dimension rows locally. (When the dimension fits in a
  broadcast, just ``broadcast()`` — replication is for the in-between.)

Both helpers are deterministic (salt = xxhash64 of the row, not rand()), so
task retries reproduce identical partitioning — required for exactly-once
sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates decomposable as agg(agg(partial)) with the same function.
_SELF_MERGING = {"sum": F.sum, "min": F.min, "max": F.max}


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of the whole row."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")
    )


def detect_hot_keys(
    df: DataFrame,
    key: str,
    min_share: float = 0.01,
    sample_fraction: float = 0.001,
) -> list:
    """Sampled heavy-hitter detection: key values whose share of a
    ``sample_fraction`` Bernoulli sample exceeds ``min_share``. One cheap
    scan; the returned list is tiny by construction (≤ 1/min_share values).
    Sampling only decides WHICH keys get salted — never the aggregate's
    value — so the seeded sample's partitioning sensitivity is harmless.
    """
    sample = df.select(key).sample(fraction=sample_fraction, seed=42)
    total = sample.count()
    if total == 0:
        return []
    rows = (
        sample.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.lit(min_share) * F.lit(float(total)))
        .collect()
    )
    return [r[0] for r in rows]


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    hot_keys: list | str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (function, input column) with function in
    {sum, count, min, max, count_distinct_approx, collect_list,
    collect_set}. Example::

        salted_agg(df, ["k"], {"n": ("count", "*"), "total": ("sum", "v")})

    Phase 1 aggregates on (keys, salt) — the hot key fans out over
    ``buckets`` reducers; phase 2 merges partials per key. Results are
    identical to a plain groupBy (all supported functions are decomposable;
    ``collect_list`` is merged with ``flatten``, so it is bag-equal, not
    order-equal — the same contract as plain ``collect_list``, whose order
    is already partitioning-dependent).

    **Salt only the hot keys.** ``hot_keys`` = a list of hot key values, or
    ``"auto"`` for a sampled heavy-hitter pre-pass (:func:`detect_hot_keys`),
    or ``None`` to salt every row. Targeted salting matters when the key
    space is large: salting a uniform million-key tail shreds phase 1's
    map-side collapse (each key's handful of rows lands in distinct (key,
    salt) groups), roughly doubling the shuffle for nothing. Measured on the
    bench skew leg (16M rows, one 30%-hot key over a 1M-key tail, sum+count,
    warm medians): naive 0.86 s, salt-everything 1.85 s, targeted 1.05 s —
    for DECOMPOSABLE aggregates Spark's own partial aggregation already
    absorbs the hot key and any salting is overhead; use this helper's
    sum/count/min/max paths only when partial aggregation is defeated (e.g.
    sort-based fallback under extreme group cardinality).

    The case salting targets is non-collapsible per-key state (collect_list/
    collect_set, where every hot-key row reaches ONE reducer). Know what
    local measurement can and cannot show: on local[32] — one shared-memory
    JVM — the "straggler" task sorts at full node bandwidth, so spreading it
    buys little while salting pays ~2x data movement (measured collect_list
    medians, naive vs targeted: 2.6/4.3 s at 30% hot, 6.6/5.0 s at 60%,
    3.0/5.2 s at 90%). On a real cluster the straggler is one core on one
    node while the rest of the fleet idles, and wall-clock follows the
    hot key's share; the salted plan removes that single-reducer dependency
    at a bounded ~2x volume cost. SCALING.md carries the full table, plus
    the cross-round bench adjudication: the salted JOIN leg is at parity
    with naive on local[32] (a one-round 2.8x gap proved environmental),
    while the salted collect_list leg stays reliably SLOWER locally —
    treat both as cluster remedies, not local wins.
    ``hot_keys`` requires a single grouping key (the common case); pass
    ``None`` to full-salt multi-key groupings.
    """
    if hot_keys is not None:
        if len(keys) != 1:
            raise ValueError("hot_keys requires exactly one grouping key")
        if hot_keys == "auto":
            hot_keys = detect_hot_keys(df, keys[0])
        salt = (
            F.when(
                F.col(keys[0]).isin(list(hot_keys)),
                F.pmod(F.xxhash64(*df.columns), F.lit(buckets)),
            )
            .otherwise(F.lit(0))
            .cast("int")
        )
        salted = df.withColumn("_salt", salt)
    else:
        salted = with_salt(df, buckets)
    partials, finals = [], []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partials.append(
                F.count(F.lit(1) if col == "*" else F.col(col)).alias(p)
            )
            finals.append(F.sum(p).alias(out))
        elif fn in _SELF_MERGING:
            agg_f = _SELF_MERGING[fn]
            partials.append(agg_f(col).alias(p))
            finals.append(agg_f(p).alias(out))
        elif fn == "count_distinct_approx":
            # HLL sketches merge associatively: partial sketch per salt
            # bucket, merged at the final phase.
            partials.append(F.hll_sketch_agg(col).alias(p))
            finals.append(F.hll_sketch_estimate(F.hll_union_agg(p)).alias(out))
        elif fn == "collect_list":
            partials.append(F.collect_list(col).alias(p))
            finals.append(F.flatten(F.collect_list(p)).alias(out))
        elif fn == "collect_set":
            partials.append(F.collect_set(col).alias(p))
            finals.append(
                F.array_distinct(F.flatten(F.collect_list(p))).alias(out)
            )
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    return (
        salted.groupBy(*keys, "_salt").agg(*partials).groupBy(*keys).agg(*finals)
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate every dimension
    row across all ``buckets`` salt values, join on (key, salt). The hot
    key's fact rows land in ``buckets`` different partitions, each finding
    its dimension row locally. Dimension cost: ×buckets rows shuffled —
    use only when the dim is too big to broadcast but far smaller than the
    fact."""
    f = with_salt(fact, buckets)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = f.join(d, on=[key, "_salt"], how=how)
    return out.drop("_salt")
