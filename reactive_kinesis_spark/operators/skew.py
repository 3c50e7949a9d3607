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


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (function, input column) with function in
    {sum, count, min, max, count_distinct_approx}. Example::

        salted_agg(df, ["k"], {"n": ("count", "*"), "total": ("sum", "v")})

    Phase 1 aggregates on (keys, salt) — the hot key fans out over
    ``buckets`` reducers; phase 2 merges partials per key. Results are
    identical to a plain groupBy (all supported functions are decomposable).
    """
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
