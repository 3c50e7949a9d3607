"""Declarative data-quality constraint checking (Deequ-style).

A large-scale training-data pipeline gates every ingest batch on a
constraint suite — completeness, uniqueness, domain bounds, referential
integrity — and the whole point at 100 TB is that the suite must NOT cost
one scan per check. This module folds every row-level and uniqueness
check into ONE full-scan aggregate (each check is a conditional count;
uniqueness is ``count(col) − count_distinct(col)`` in the same pass), and
only referential-integrity checks pay their own (anti-)join. A 12-check
suite on a 100 TB table is one scan + one map-side-combined agg, not 12.

Reference analog: none (the reference is a stream connector); this is the
engine-side admission-control surface its DLQ/tolerance layer
(streaming/tolerance.py) feeds into.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def check_constraints(
    df: DataFrame,
    *,
    not_null: Iterable[str] = (),
    unique: Iterable[str | Sequence[str]] = (),
    ranges: Mapping[str, tuple] | None = None,
    accepted: Mapping[str, Iterable] | None = None,
    patterns: Mapping[str, str] | None = None,
    foreign_keys: Iterable[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Run a constraint suite over ``df`` and return one row per check:
    ``(check_name, column_name, total, violations, passed)``.

    * ``not_null``: columns that must be non-null.
    * ``unique``: columns (or column tuples) whose non-null values must
      be distinct; violations = surplus rows beyond the distinct count.
      (Rows with a NULL in any key column are ignored, matching
      ``count_distinct`` semantics — pair with ``not_null`` to forbid.)
    * ``ranges``: ``{col: (lo, hi)}`` inclusive bounds; either side may
      be None for a one-sided bound. NULLs never violate (that's
      ``not_null``'s job) — same for ``accepted`` and ``patterns``.
    * ``accepted``: ``{col: allowed_values}``.
    * ``patterns``: ``{col: regex}`` (full-match via ``rlike``).
    * ``foreign_keys``: ``(col, dim_df, dim_col)`` triples; violations =
      non-null values with no match in the dimension. The only checks
      that cost a join (left-anti against the distinct dimension keys —
      broadcast when small, shuffle otherwise; Catalyst/AQE decides).

    All non-FK checks share ONE aggregate over a single scan of ``df``.
    Deterministic: every metric is an exact integer count.
    """
    ranges = dict(ranges or {})
    accepted = dict(accepted or {})
    patterns = dict(patterns or {})

    def _viol(cond: Column) -> Column:
        # count of rows violating `cond` — total on empty input (sum of an
        # empty frame is NULL; a zero-row table violates nothing)
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long")

    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("__total")]
    specs: list[tuple[str, str, str]] = []  # (check_name, column_name, agg alias)

    def _add(check: str, column: str, agg: Column) -> None:
        alias = f"__v{len(specs)}"
        aggs.append(agg.alias(alias))
        specs.append((check, column, alias))

    for c in not_null:
        _add("not_null", c, _viol(F.col(c).isNull()))
    for key in unique:
        cols = [key] if isinstance(key, str) else list(key)
        # count of rows where ALL key cols are non-null, minus the distinct
        # key count — both computed in the shared agg pass
        all_nn = F.col(cols[0]).isNotNull()
        for c in cols[1:]:
            all_nn = all_nn & F.col(c).isNotNull()
        non_null = F.coalesce(
            F.sum(F.when(all_nn, 1).otherwise(0)), F.lit(0)
        ).cast("long")
        _add(
            "unique",
            ",".join(cols),
            (non_null - F.count_distinct(*[F.col(c) for c in cols])).cast("long"),
        )
    for c, (lo, hi) in ranges.items():
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (F.col(c) < F.lit(lo))
        if hi is not None:
            bad = bad | (F.col(c) > F.lit(hi))
        _add("range", c, _viol(F.col(c).isNotNull() & bad))
    for c, vals in accepted.items():
        _add(
            "accepted_values",
            c,
            _viol(F.col(c).isNotNull() & ~F.col(c).isin(list(vals))),
        )
    for c, rx in patterns.items():
        _add("pattern", c, _viol(F.col(c).isNotNull() & ~F.col(c).rlike(rx)))

    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(check).alias("check_name"),
                F.lit(column).alias("column_name"),
                F.col("__total").alias("total"),
                F.col(alias).alias("violations"),
            )
            for check, column, alias in specs
        ]
    )
    out = one.select(F.explode(rows).alias("c")).select(
        "c.check_name",
        "c.column_name",
        "c.total",
        "c.violations",
        (F.col("c.violations") == 0).alias("passed"),
    )

    total_frame = one.select(F.col("__total").alias("total"))
    for col, dim_df, dim_col in foreign_keys:
        missing = (
            df.select(F.col(col))
            .where(F.col(col).isNotNull())
            .join(
                dim_df.select(F.col(dim_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        fk = (
            total_frame.crossJoin(F.broadcast(missing))
            .select(
                F.lit("foreign_key").alias("check_name"),
                F.lit(col).alias("column_name"),
                "total",
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
        )
        out = out.unionAll(fk)
    return out


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    buckets: int = 8,
) -> DataFrame:
    """Distribution drift between two snapshots of a numeric column — the
    data-drift gate a training pipeline runs between ingest snapshots
    (did the feature distribution move since the reference was
    profiled?): equi-depth bucket boundaries from the REFERENCE snapshot
    (the production convention — fixed boundaries make drift numbers
    comparable across runs), both snapshots counted into those buckets,
    per-bucket total-variation and chi-square contributions. Sum
    ``tvd_contrib`` for total variation distance in [0, 1]; sum
    ``chi2_contrib`` for Pearson's drift statistic.

    Both metrics are TRANSCENDENTAL-FREE by design (no ln/exp, unlike
    PSI/KL): exact int64 counts, IEEE division/multiplication only — so
    the whole report is hash-certifiable cross-engine, the same bar as
    the rest of the quality tier.

    Shape: one percentile aggregate over the reference, the 7 boundary
    doubles broadcast into two narrow bucket-assignment passes (the q119
    no-global-sort discipline), one tiny count aggregate per snapshot,
    totals as broadcast single-row frames (in-plan, never a driver
    collect). The spine is the STATIC bucket range ``1..buckets`` (a
    ``buckets``-row frame, broadcast), not the reference's observed
    buckets: a degenerate reference (heavy ties collapse the percentile
    cuts) leaves buckets it never populates, and current-snapshot mass
    landing there is exactly the most extreme drift — it must
    contribute to ``tvd_contrib`` (``ref_n = 0``), not vanish in a left
    join. ``chi2_contrib`` is NULL for those rows (expected count 0 ⇒
    the Pearson term is undefined; TVD carries the signal). Output is
    always exactly ``buckets`` rows. Returns ``(bucket, ref_n, cur_n,
    ref_frac, cur_frac, tvd_contrib, chi2_contrib)``.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    qs = [i / buckets for i in range(1, buckets)]
    rv = ref.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    cv = cur.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    cuts = rv.agg(
        F.expr(
            "percentile(v, array(" + ", ".join(f"{q}D" for q in qs) + "))"
        ).alias("c")
    )

    def bucketed(df: DataFrame) -> DataFrame:
        return df.crossJoin(F.broadcast(cuts)).select(
            (
                F.lit(1)
                + F.aggregate(
                    F.col("c"),
                    F.lit(0),
                    lambda acc, x: acc + F.when(F.col("v") > x, 1).otherwise(0),
                )
            ).cast("long").alias("bucket")
        )

    rc = bucketed(rv).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("ref_n")
    )
    cc = bucketed(cv).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cur_n")
    )
    rtot = rv.agg(F.count(F.lit(1)).cast("long").alias("ref_total"))
    ctot = cv.agg(F.count(F.lit(1)).cast("long").alias("cur_total"))
    spine = ref.sparkSession.range(1, buckets + 1).select(
        F.col("id").cast("long").alias("bucket")
    )
    joined = (
        spine.join(F.broadcast(rc), "bucket", "left")
        .join(F.broadcast(cc), "bucket", "left")
        .na.fill({"ref_n": 0, "cur_n": 0})
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ctot))
    )
    ref_frac = F.col("ref_n").cast("double") / F.col("ref_total").cast("double")
    cur_frac = F.col("cur_n").cast("double") / F.col("cur_total").cast("double")
    expected = F.col("ref_frac") * F.col("cur_total").cast("double")
    return (
        joined.select(
            "bucket",
            "ref_n",
            "cur_n",
            ref_frac.alias("ref_frac"),
            cur_frac.alias("cur_frac"),
            "ref_total",
            "cur_total",
        )
        .select(
            "bucket",
            "ref_n",
            "cur_n",
            "ref_frac",
            "cur_frac",
            (F.abs(F.col("ref_frac") - F.col("cur_frac")) * F.lit(0.5)).alias(
                "tvd_contrib"
            ),
            F.when(
                expected > 0,
                (F.col("cur_n").cast("double") - expected)
                * (F.col("cur_n").cast("double") - expected)
                / expected,
            ).otherwise(F.lit(None).cast("double")).alias("chi2_contrib"),
        )
        .orderBy("bucket")
    )


def chi_square_homogeneity(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Chi-square homogeneity audit over the ``row_col`` × ``col_col``
    contingency table — the classical "did the composition shift?" test
    a pipeline runs between corpus slices (source × language, batch ×
    label, shard × topic). Complements :func:`distribution_drift` (L1
    against a stored baseline) with the cross-sectional form: every
    slice against every other, no baseline snapshot needed.

    Per cell: observed count ``O`` (exact int), expected count
    ``E = r·c / N`` (one multiply of exact ints — caller's envelope is
    ``r·c < 2^53``, comfortably true for any per-slice audit — and one
    IEEE division), and the contribution ``(O−E)²/E`` (a fixed
    three-op chain). The total statistic and degrees of freedom ride on
    every row: ``chi2_total`` sums the contributions through the exact
    DECIMAL(38,6) path (:func:`functions.dsum` — order-irrelevant),
    ``dof = (R−1)(C−1)``. Cut-off lookup is the caller's job (a p-value
    needs the incomplete gamma — libm territory, deliberately outside
    the certified surface).

    Returns one row per observed cell:
    ``(row_col, col_col, observed, expected, chi2_term, chi2_total,
    dof)``.

    100 TB shape: ONE map-side-combined count aggregate over the corpus;
    everything after operates on the cell table (≤ R·C rows) — marginal
    re-aggregations, two broadcast joins, a broadcast single-row total.
    The corpus is scanned exactly once.
    """
    from reactive_kinesis_spark.functions import dsum

    cells = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    rows = cells.groupBy(row_col).agg(F.sum("observed").cast("long").alias("__r"))
    cols = cells.groupBy(col_col).agg(F.sum("observed").cast("long").alias("__c"))
    tot = cells.agg(
        F.sum("observed").cast("long").alias("__n"),
        F.countDistinct(row_col).cast("long").alias("__nr"),
        F.countDistinct(col_col).cast("long").alias("__nc"),
    )
    e = (F.col("__r") * F.col("__c")).cast("double") / F.col("__n").cast("double")
    d = F.col("observed").cast("double") - F.col("expected")
    term = d * d / F.col("expected")
    scored = (
        cells.join(F.broadcast(rows), row_col)
        .join(F.broadcast(cols), col_col)
        .crossJoin(F.broadcast(tot))
        .select(
            row_col,
            col_col,
            "observed",
            e.alias("expected"),
            ((F.col("__nr") - 1) * (F.col("__nc") - 1)).cast("long").alias("dof"),
        )
        .select(row_col, col_col, "observed", "expected", term.alias("chi2_term"), "dof")
    )
    total = scored.agg(dsum("chi2_term", "chi2_total"))
    return scored.crossJoin(F.broadcast(total)).select(
        row_col, col_col, "observed", "expected", "chi2_term", "chi2_total", "dof"
    )


def gini_feature_screen(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
) -> DataFrame:
    """Gini-impurity reduction of ``label_col`` by each candidate
    feature — the decision-tree split criterion used as a data audit:
    which metadata columns actually carry label signal (worth
    stratifying/balancing on) and which are noise. Gini is THE
    entropy-free impurity (pure ratios of counts, no logarithm), so the
    whole screen stays inside the exact-integer certification family.

    Per feature: ``gini_parent = 1 − Σ_c (n_c/N)²`` (label marginal),
    ``gini_split = 1 − (1/N)·Σ_v (Σ_c n_vc²)/n_v`` (count-weighted child
    impurity), ``gini_gain = gini_parent − gini_split``. Squared counts
    are DECIMAL(38,0)-exact; each per-value ratio is floor-quantized to
    1e15 micro-units before the cross-value sum (the q107 rule — floor of
    an identical double is identical in every engine) and divisions are
    correctly-rounded IEEE ops, so the triple is bit-equal cross-engine.

    Returns one row per feature: ``(feature, n_values, gini_parent,
    gini_split, gini_gain)``.

    100 TB shape: one scan per feature producing a (feature-cardinality ×
    label-cardinality) count table via map-side-combined aggregation;
    everything downstream operates on that tiny table. N and the parent
    impurity enter as a broadcast single-row frame — no collects. The
    quantized per-value term is ``(Σn_vc²/n_v)/N·1e15 ≤ 1e15``, so the
    DECIMAL(38,0) sum never overflows at any corpus size."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    sq = lambda c: F.col(c).cast("decimal(19,0)") * F.col(c)  # noqa: E731
    lab = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n"))
    parent = lab.agg(
        F.sum("__n").cast("double").alias("__N"),
        F.sum(sq("__n")).cast("double").alias("__S"),
    ).select(
        "__N",
        (
            F.lit(1.0) - F.col("__S") / F.col("__N") / F.col("__N")
        ).alias("gini_parent"),
    )
    out = None
    for feat in feature_cols:
        cell = df.groupBy(F.col(feat).alias("__v"), F.col(label_col)).agg(
            F.count(F.lit(1)).alias("__n")
        )
        val = cell.groupBy("__v").agg(
            F.sum("__n").alias("__nv"), F.sum(sq("__n")).alias("__sv")
        )
        row = (
            val.crossJoin(F.broadcast(parent))
            .select(
                "gini_parent",
                "__N",
                F.floor(
                    F.col("__sv").cast("double")
                    / F.col("__nv").cast("double")
                    / F.col("__N")
                    * F.lit(1e15)
                )
                .cast("decimal(38,0)")
                .alias("__t"),
            )
            .groupBy("gini_parent")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_values"),
                (
                    F.lit(1.0)
                    - F.sum("__t").cast("double") / F.lit(1e15)
                ).alias("gini_split"),
            )
            .select(
                F.lit(feat).alias("feature"),
                "n_values",
                "gini_parent",
                "gini_split",
                (F.col("gini_parent") - F.col("gini_split")).alias("gini_gain"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out
