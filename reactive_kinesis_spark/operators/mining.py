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


def hll_cardinality(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: int = 8,
) -> DataFrame:
    """Engine-portable HyperLogLog — the certifiable complement of
    ``approx_count_distinct`` (q36, whose HLL++ sketch is a Spark
    internal no other engine can reproduce). Same md5-prefix 56-bit draw
    as the q23/q139 portable sketch family, so any engine that can md5
    builds the IDENTICAL register file and the IDENTICAL estimate — the
    property that lets a 100 TB sketch be built by Spark, merged by a
    warehouse, and audited by DuckDB.

    Construction (Flajolet et al. 2007, raw estimator):

    * ``h``      — 56-bit integer from ``md5(value)``'s first 14 hex chars;
    * bucket     — ``h % m`` (``m = 2^p`` registers);
    * rho        — leading-zero rank of the remaining ``56 - p`` bits
      (computed EXACTLY via ``length(bin(rest))`` — no float log);
    * register   — ``max(rho)`` per (group, bucket): integer max,
      order- and partition-insensitive, mergeable across shards;
    * estimate   — ``alpha_m · m² / Σ 2^(−reg)``. The harmonic sum is
      kept as the EXACT INTEGER ``Σ 2^(R − reg)`` (``R = 57 − p``; at
      p=8 the sum is ≤ 2^57, inside int64), absent buckets contributing
      ``2^R`` each; the numerator ``alpha_m · m² · 2^R`` is one Python
      double whose power-of-two scaling is exact — so the whole estimate
      is a SINGLE IEEE division of two engine-identical values. No
      small/large-range correction branches (they need ``ln``, which is
      not correctly-rounded-portable); the raw estimator's bias at
      n >> m is the documented trade.

    Output per group: ``(group_col, used_buckets, max_rho,
    hll_estimate, exact_distinct, rel_err)`` — the exact count rides
    along as the audit column (same pattern as q139's count-min audit).

    100 TB shape: the corpus collapses to ≤ m rows per group in ONE
    map-side-combined (group, bucket) max-aggregate — register files,
    not values, cross the wire; the exact-count audit column is the only
    expensive leg and exists for certification, not production (drop it
    and the whole plan is sketch-sized).
    """
    if not 4 <= p <= 12:
        raise ValueError("p in [4, 12] (m = 16..4096 registers)")
    m = 1 << p
    rest_bits = 56 - p
    rmax = rest_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha * m^2 * 2^R: power-of-two scaling of one double — exact
    numerator = alpha * float(m) * float(m) * float(1 << rmax)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 14), 16, 10
    ).cast("long")
    rest = F.shiftright(h, p)
    rho = F.when(rest == 0, F.lit(rmax)).otherwise(
        F.lit(rmax) - F.length(F.bin(rest))
    )
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.pmod(h, F.lit(m)).alias("__b"), rho.alias("__r"))
        .groupBy(group_col, "__b")
        .agg(F.max("__r").alias("__reg"))
    )
    sketch = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("used_buckets"),
        F.max("__reg").alias("max_rho"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rmax} - __reg AS INT))")
        ).alias("__s_present"),
    )
    s_scaled = F.col("__s_present") + (F.lit(m) - F.col("used_buckets")) * F.lit(
        1 << rmax
    ).cast("long")
    est = F.lit(numerator) / s_scaled.cast("double")
    exact = df.where(F.col(value_col).isNotNull()).groupBy(group_col).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    return sketch.join(exact, group_col).select(
        group_col,
        "used_buckets",
        "max_rho",
        est.alias("hll_estimate"),
        "exact_distinct",
        (
            F.abs(est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )


def bloom_membership_audit(
    reference: DataFrame,
    probe: DataFrame,
    value_col: str,
    group_col: str,
    m_bits: int = 1 << 14,
    k_hashes: int = 4,
) -> DataFrame:
    """Engine-portable Bloom-filter membership with a built-in
    false-positive audit — the sketch a 100 TB decontamination or
    join-pruning pass uses when the reference set is too large to
    broadcast exactly but a bitmap of it fits everywhere: build the
    filter over ``reference[value_col]``, probe every ``probe`` row, and
    report per ``group_col`` how the sketch's answers compare to exact
    membership (the q139/q151/q157 "certify the approximation's error"
    discipline — the FP rate you would otherwise only estimate from
    theory rides along as an exact-integer column).

    Portability: bit positions come from Kirsch-Mitzenmacher double
    hashing off ONE md5 per value (``h1``/``h2`` = the digest's two
    14-hex halves, ``pos_i = (h1 + i·h2) mod m_bits`` — the q23
    construction), so any engine that can md5 sets the IDENTICAL bits
    and returns the IDENTICAL verdicts; every reported metric is an
    integer count or a single IEEE division of two.

    Output per group: ``(group_col, n_rows, n_bloom_pos, n_exact_pos,
    n_false_pos, fp_rate)`` where ``fp_rate = n_false_pos / (n_rows -
    n_exact_pos)`` over the true negatives (0.0 when there are none).
    Bloom filters have no false negatives, so ``n_bloom_pos =
    n_exact_pos + n_false_pos`` always — the audit's internal invariant.

    100 TB shape: the filter is ONE distinct-aggregate collapsing the
    reference to ≤ ``m_bits`` integer rows (bits, not values, cross the
    wire; mergeable across shards by construction), then broadcast to
    the probe side; probes are evaluated per DISTINCT probe value (k
    positions each) and joined back, so the probe corpus itself never
    shuffles on anything wider than its own group key. The exact-
    membership audit join is the only value-keyed leg and exists for
    certification — drop the audit columns and the plan is sketch-sized.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("m_bits >= 2 and k_hashes >= 1 required")

    def positions(col):
        h1 = F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")
        h2 = F.conv(F.substring(F.md5(col), 15, 14), 16, 10).cast("long")
        return F.array(
            *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k_hashes)]
        )

    ref_vals = reference.select(F.col(value_col).cast("string").alias("__v")).where(
        F.col("__v").isNotNull()
    )
    bits = (
        ref_vals.select(F.explode(positions(F.col("__v"))).alias("pos"))
        .distinct()
    )
    probe_vals = (
        probe.select(F.col(value_col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
    )
    # bloom-positive iff NO position is missing from the filter (an
    # anti-join, not a matched-count == k check: double hashing can
    # collide positions within one value, and a count test would then
    # manufacture a false NEGATIVE — the one error class Bloom filters
    # are defined never to make)
    missing = (
        probe_vals.select("__v", F.explode(positions(F.col("__v"))).alias("pos"))
        .join(F.broadcast(bits), "pos", "left_anti")
        .select("__v")
        .distinct()
    )
    verdicts = probe_vals.join(missing, "__v", "left_anti").select(
        "__v", F.lit(1).alias("__bloom")
    )
    exact = ref_vals.distinct().select("__v", F.lit(1).alias("__exact"))
    scored = (
        probe.select(F.col(group_col), F.col(value_col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .join(verdicts, "__v", "left")
        .join(exact, "__v", "left")
        .select(
            group_col,
            F.coalesce(F.col("__bloom"), F.lit(0)).alias("__b"),
            F.coalesce(F.col("__exact"), F.lit(0)).alias("__e"),
        )
    )
    out = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__b").cast("long").alias("n_bloom_pos"),
        F.sum("__e").cast("long").alias("n_exact_pos"),
        F.sum(
            F.when((F.col("__b") == 1) & (F.col("__e") == 0), 1).otherwise(0)
        ).cast("long").alias("n_false_pos"),
    )
    neg = F.col("n_rows") - F.col("n_exact_pos")
    return out.select(
        group_col,
        "n_rows",
        "n_bloom_pos",
        "n_exact_pos",
        "n_false_pos",
        F.when(neg <= 0, F.lit(0.0))
        .otherwise(F.col("n_false_pos").cast("double") / neg.cast("double"))
        .alias("fp_rate"),
    )
