"""Data-quality gate queries — the constraint-suite surface.

The batch admission-control companion to the streaming tolerance layer
(reference: reactive-kinesis's per-record skip/DLQ semantics,
``streaming/tolerance.py``): a pipeline validates each ingest snapshot
with a declarative check suite before it is allowed downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.quality import check_constraints
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


@query(
    "q112_quality_checks",
    oracle="""
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders),
    checks AS (
      SELECT 'not_null' AS check_name, 'o_orderkey' AS column_name, t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders) AS violations
      FROM t
      UNION ALL
      SELECT 'not_null', 'o_custkey', t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'not_null', 'o_orderdate', t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'unique', 'o_orderkey', t.total,
             (SELECT CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'range', 'o_totalprice', t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                          AND (o_totalprice < 0.0 OR o_totalprice > 200000.0)
                          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'accepted_values', 'o_orderstatus', t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O','F','P')
                          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'pattern', 'o_orderpriority', t.total,
             (SELECT CAST(COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
                          AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                          THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      FROM t
      UNION ALL
      SELECT 'foreign_key', 'o_custkey', t.total,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              WHERE o.o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      FROM t
    )
    SELECT check_name, column_name, total, violations,
           violations = 0 AS passed
    FROM checks
    ORDER BY check_name, column_name
    """,
)
def q112_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite gate over ``orders``: completeness, key
    uniqueness, domain bounds, accepted values, format pattern, and
    referential integrity against ``customer`` — 7 row-level checks in
    ONE full-scan aggregate plus one anti-join for the FK (see
    :func:`operators.quality.check_constraints`). The range check's
    200 000 bound is deliberately tight so ``violations > 0`` exercises
    the metric path, not just the all-green path."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    out = check_constraints(
        orders,
        not_null=("o_orderkey", "o_custkey", "o_orderdate"),
        unique=("o_orderkey",),
        ranges={"o_totalprice": (0.0, 200000.0)},
        accepted={"o_orderstatus": ("O", "F", "P")},
        patterns={"o_orderpriority": "^[1-5]-"},
        foreign_keys=[("o_custkey", customer, "c_custkey")],
    )
    return out.orderBy("check_name", "column_name")


@query(
    "q116_table_fingerprint",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST(('0x' || substr(md5(
               concat_ws(chr(31),
                 coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>'),
                 coalesce(CAST(o_custkey AS VARCHAR), '<NULL>'),
                 coalesce(CAST(o_orderdate AS VARCHAR), '<NULL>'))
           ), 1, 14)) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS fingerprint
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def q116_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status content fingerprint of the orders table — the
    order-independent multiset hash (Σ of 56-bit md5 slices, exact
    DECIMAL(38,0) sum) used to validate snapshot equality after a
    migration/backfill without sorting or moving the data: one scan, one
    map-side-combined agg. Engine-portable by construction (md5 and
    decimal addition, not engine hash functions). The fingerprint is
    emitted as STRING: the exact DECIMAL(38,0) sum exceeds int64, and
    pandas renders wide decimals engine-dependently (DuckDB → float64,
    Spark → Decimal), so the query's output contract is the decimal's
    canonical string rendering — identical from both engines. See
    :func:`io.table_fingerprint`."""
    from reactive_kinesis_spark.io import table_fingerprint

    orders = load_table(spark, sf_dir, "orders")
    fp = table_fingerprint(
        orders,
        ["o_orderkey", "o_custkey", "o_orderdate"],
        group_by="o_orderstatus",
    )
    return fp.select(
        F.col("o_orderstatus").alias("status"),
        "n_rows",
        F.col("fingerprint").cast("string").alias("fingerprint"),
    ).orderBy("status")


@query(
    "q117_train_val_test",
    oracle="""
    WITH s AS (
        SELECT lang,
               CASE
                 WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                       AS BIGINT) % 1000) < 980 THEN 'train'
                 WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))
                       AS BIGINT) % 1000) < 990 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    ),
    c AS (
        SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM s GROUP BY lang, split
    )
    SELECT lang, split, n_docs,
           CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS frac
    FROM c
    ORDER BY lang, split
    """,
)
def q117_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment over documents,
    reported per language — membership is a pure function of doc_id
    (56 md5 bits → bucket), so reruns, engines, and partitionings agree
    bit-for-bit and later ingests never move existing docs across the
    holdout boundary. Zero-shuffle assignment; one count agg + a tiny
    window for the fractions. See
    :func:`operators.text.train_val_test_split`."""
    from reactive_kinesis_spark.operators.text import train_val_test_split

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    c = (
        train_val_test_split(docs, "doc_id", train=0.98, val=0.01)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return c.select(
        "lang",
        "split",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("frac"),
    ).orderBy("lang", "split")


@query(
    "q125_snapshot_drift",
    oracle="""
    WITH ref AS (SELECT o_totalprice AS v FROM orders
                 WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL),
    cur AS (SELECT o_totalprice AS v FROM orders
            WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL),
    cuts AS (SELECT quantile_cont(v,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS c FROM ref),
    rb AS (SELECT 1 + len(list_filter(cuts.c, x -> v > x)) AS bucket FROM ref, cuts),
    cb AS (SELECT 1 + len(list_filter(cuts.c, x -> v > x)) AS bucket FROM cur, cuts),
    rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ref_n FROM rb GROUP BY bucket),
    cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cur_n FROM cb GROUP BY bucket),
    spine AS (SELECT CAST(unnest([1,2,3,4,5,6,7,8]) AS BIGINT) AS bucket),
    tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ref) AS ref_total,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cur) AS cur_total),
    j AS (
      SELECT spine.bucket, COALESCE(rc.ref_n, 0) AS ref_n,
             COALESCE(cc.cur_n, 0) AS cur_n,
             CAST(COALESCE(rc.ref_n, 0) AS DOUBLE)
                 / CAST(tot.ref_total AS DOUBLE) AS ref_frac,
             CAST(COALESCE(cc.cur_n, 0) AS DOUBLE) / CAST(tot.cur_total AS DOUBLE)
                 AS cur_frac,
             tot.cur_total
      FROM spine LEFT JOIN rc ON spine.bucket = rc.bucket
                 LEFT JOIN cc ON spine.bucket = cc.bucket CROSS JOIN tot
    )
    SELECT bucket, ref_n, cur_n, ref_frac, cur_frac,
           ABS(ref_frac - cur_frac) * CAST(0.5 AS DOUBLE) AS tvd_contrib,
           CASE WHEN ref_frac * CAST(cur_total AS DOUBLE) > 0 THEN
             (CAST(cur_n AS DOUBLE) - ref_frac * CAST(cur_total AS DOUBLE))
             * (CAST(cur_n AS DOUBLE) - ref_frac * CAST(cur_total AS DOUBLE))
             / (ref_frac * CAST(cur_total AS DOUBLE))
           END AS chi2_contrib
    FROM j ORDER BY bucket
    """,
)
def q125_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price distribution drift between the pre-1998 reference
    snapshot and the 1998+ current snapshot: equi-depth boundaries from
    the REFERENCE, per-bucket total-variation and chi-square
    contributions — the between-ingest data-drift gate (sum
    ``tvd_contrib``/``chi2_contrib`` and alarm over a threshold).
    Transcendental-free (no PSI/KL ln), so the whole report is
    hash-certified. See :func:`operators.quality.distribution_drift`."""
    from reactive_kinesis_spark.operators.quality import distribution_drift

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    ref = orders.where(F.col("o_orderdate") < cutoff).select("o_totalprice")
    cur = orders.where(F.col("o_orderdate") >= cutoff).select("o_totalprice")
    return distribution_drift(ref, cur, "o_totalprice", buckets=8)


@query(
    "q138_calibration_bins",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
               CAST(len(list_filter(string_split(text, ' '),
                    w -> list_contains(['the','a','of','and','in'], w)))
                    AS DOUBLE) AS ns
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), nt / CAST(100.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * (nd / nt)
               + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), CAST(4.0 AS DOUBLE) * (ns / nt))
                   AS score,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
        FROM t
    )
    SELECT CAST(least(9, CAST(FLOOR(score * CAST(10.0 AS DOUBLE)) AS BIGINT))
                AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(pos) AS BIGINT) / CAST(COUNT(*) AS BIGINT) AS pos_rate,
           (CAST(SUM(CAST(FLOOR(score * CAST('1000000000000.0' AS DOUBLE))
                          AS BIGINT)) AS BIGINT) / CAST(COUNT(*) AS BIGINT))
               / CAST('1000000000000.0' AS DOUBLE) AS mean_score
    FROM scored
    GROUP BY bin
    ORDER BY bin
    """,
)
def q138_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration (reliability) table: the q26 heuristic quality
    score binned into deciles, with each bin's observed positive rate
    (label = long document, ``n_chars ≥ 300``) beside its mean
    predicted score — the table a calibration curve / ECE audit plots
    before a learned quality filter's threshold is trusted at corpus
    scale.

    Exactness: the score is the q26-certified deterministic double;
    the bin is ``least(9, floor(10·score))`` (floor of an identical
    double is identical everywhere); the positive rate is one integer
    division; the mean score goes through the q102 floor-quantization
    rule (pico-unit integer sums — never a fold-order-dependent
    SUM(DOUBLE), never a decimal cast of an arbitrary double).

    Shape: one narrow scan computing the score per document, one
    10-ary groupBy — a single map-side-combinable aggregation."""
    import reactive_kinesis_spark.operators.text as T

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        T.quality_score("text").alias("score"),
        F.when(F.col("n_chars") >= 300, F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )
    binned = scored.select(
        F.least(
            F.lit(9), F.floor(F.col("score") * F.lit(10.0)).cast("long")
        ).cast("long").alias("bin"),
        "pos",
        F.floor(F.col("score") * F.lit(1000000000000.0)).cast("long").alias("score_p"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            (F.sum("pos").cast("long") / F.count(F.lit(1)).cast("long")).alias(
                "pos_rate"
            ),
            (
                (F.sum("score_p").cast("long") / F.count(F.lit(1)).cast("long"))
                / F.lit(1000000000000.0)
            ).alias("mean_score"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Model-evaluation tier (round 8): the labeling-QA readouts a training
# pipeline runs on a learned (or heuristic) quality filter before trusting
# it at corpus scale — ROC AUC, threshold sweep, inter-rater agreement,
# cumulative gains. All four share the q138 setup (q26-certified score,
# long-document label) and live in the integer-division certification
# class: int64-exact counts/rank-sums, fixed IEEE division trees, NaN on
# the documented degenerate shapes (the q142/q143 convention), mirrored
# token-for-token in the oracles.
# --------------------------------------------------------------------------

_SCORED_DOCS_SQL = """
    t AS (
        SELECT doc_id, source, n_chars,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
               CAST(len(list_filter(string_split(text, ' '),
                    w -> list_contains(['the','a','of','and','in'], w)))
                    AS DOUBLE) AS ns
        FROM documents
    ),
    scored AS (
        SELECT doc_id, source,
               CAST(0.4 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), nt / CAST(100.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * (nd / nt)
               + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), CAST(4.0 AS DOUBLE) * (ns / nt))
                   AS score,
               CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pos
        FROM t
    )
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, score, pos): the q26-certified heuristic quality
    score and the long-document label — the shared input of the
    evaluation tier (same construction q138 certifies)."""
    import reactive_kinesis_spark.operators.text as T

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        T.quality_score("text").alias("score"),
        F.when(F.col("n_chars") >= 300, F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    )


@query(
    "q144_roc_auc",
    oracle="""
    WITH """ + _SCORED_DOCS_SQL + """,
    s AS (
        SELECT source, score AS v,
               CAST(SUM(pos) AS BIGINT) AS ca,
               CAST(SUM(1 - pos) AS BIGINT) AS cb
        FROM scored GROUP BY source, score
    ),
    r AS (
        SELECT source, ca, cb, ca + cb AS t,
               CAST(COALESCE(SUM(ca + cb) OVER (PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
        FROM s
    ),
    agg AS (
        SELECT source,
               CAST(SUM(ca) AS BIGINT) AS n_pos,
               CAST(SUM(cb) AS BIGINT) AS n_neg,
               CAST(SUM(ca * (2 * before + t + 1)) AS BIGINT) AS ra2
        FROM r GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0
           THEN (ra2 - n_pos * (n_pos + 1))
                / (CAST('2.0' AS DOUBLE) * n_pos * n_neg)
           ELSE CAST('nan' AS DOUBLE) END AS auc
    FROM agg ORDER BY source
    """,
)
def q144_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC AUC of the heuristic quality score against the
    long-document label — THE threshold-free ranking readout for a
    corpus filter (AUC = P(random positive outranks random negative),
    ties at half credit), and the probabilistic identity behind q143:
    AUC = U/(n₊·n₋).

    Exactness: the q143 doubled-rank-sum trick — ``ra2 = Σ ca·(2·before
    + t + 1)`` over per-distinct-score tie groups is pure int64 and
    already carries tie groups at exactly half credit, so
    ``AUC = (ra2 − n₊(n₊+1)) / (2·n₊·n₋)`` is ONE IEEE division of
    exact integers. A source with only one class has no ranking to
    score — AUC is NaN (degenerate-input discipline, guarded in-plan).

    Shape: documents reduce to per-(source, distinct-score) tie counts
    first; the prefix window and both aggregates ride ONE source-keyed
    exchange. Nothing is collected."""
    from pyspark.sql import Window

    scored = _scored_docs(spark, sf_dir)
    s = scored.groupBy("source", F.col("score").alias("v")).agg(
        F.sum("pos").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("cb"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = s.select(
        "source",
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
        .cast("long")
        .alias("before"),
    )
    agg = r.groupBy("source").agg(
        F.sum("ca").cast("long").alias("n_pos"),
        F.sum("cb").cast("long").alias("n_neg"),
        F.sum(F.col("ca") * (F.lit(2) * F.col("before") + F.col("t") + F.lit(1)))
        .cast("long")
        .alias("ra2"),
    )
    return agg.select(
        "source",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (F.col("ra2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
        )
        .otherwise(F.lit(float("nan")))
        .alias("auc"),
    ).orderBy("source")


@query(
    "q145_threshold_sweep",
    oracle="""
    WITH """ + _SCORED_DOCS_SQL + """,
    b AS (
        SELECT CAST(least(19, CAST(FLOOR(score * CAST('20.0' AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS bin, pos
        FROM scored
    ),
    cnt AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS npos
        FROM b GROUP BY bin
    ),
    spine AS (SELECT CAST(unnest(range(0, 20)) AS BIGINT) AS bin),
    j AS (
        SELECT spine.bin, COALESCE(cnt.n, 0) AS n, COALESCE(cnt.npos, 0) AS npos
        FROM spine LEFT JOIN cnt ON spine.bin = cnt.bin
    ),
    c AS (
        SELECT bin,
               CAST(SUM(npos) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tp,
               CAST(SUM(n) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pp,
               CAST(SUM(npos) OVER () AS BIGINT) AS total_pos,
               CAST(SUM(n) OVER () AS BIGINT) AS total
        FROM j
    )
    SELECT bin, bin / CAST('20.0' AS DOUBLE) AS threshold,
           tp, pp - tp AS fp,
           total_pos - tp AS fn,
           (total - total_pos) - (pp - tp) AS tn,
           CASE WHEN pp > 0 THEN tp / CAST(pp AS DOUBLE)
                ELSE CAST('nan' AS DOUBLE) END AS prec,
           CASE WHEN total_pos > 0 THEN tp / CAST(total_pos AS DOUBLE)
                ELSE CAST('nan' AS DOUBLE) END AS rec,
           CASE WHEN 2 * tp + (pp - tp) + (total_pos - tp) > 0
                THEN CAST('2.0' AS DOUBLE) * tp
                     / (2 * tp + (pp - tp) + (total_pos - tp))
                ELSE CAST('nan' AS DOUBLE) END AS f1
    FROM c ORDER BY bin
    """,
)
def q145_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep of the quality filter over the 20-step
    threshold grid ``k/20`` — the operating-point table a pipeline owner
    reads to pick the filter cutoff (q138 tells you the score is
    calibrated; this tells you what each cutoff costs in recall).

    Exactness: ``floor(score·20) ≥ k ⇔ score ≥ k/20`` exactly (floor
    vs integer), so each threshold's confusion matrix is four int64
    suffix/total sums over a STATIC 20-bin spine (the q125 degenerate-
    reference rule: empty bins stay on the grid); precision / recall /
    F1 are single guarded IEEE divisions — NaN where the denominator
    is empty (nothing predicted positive / no positives at all).

    Shape: one 20-ary count aggregate, then windows over the 20-row
    spine — sub-kilobyte past the first reduce at any corpus size."""
    from pyspark.sql import Window

    scored = _scored_docs(spark, sf_dir)
    b = scored.select(
        F.least(F.lit(19), F.floor(F.col("score") * F.lit(20.0)).cast("long"))
        .cast("long")
        .alias("bin"),
        "pos",
    )
    cnt = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
    )
    spine = spark.range(0, 20).select(F.col("id").cast("long").alias("bin"))
    j = spine.join(F.broadcast(cnt), "bin", "left").na.fill({"n": 0, "npos": 0})
    w_desc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    c = j.select(
        "bin",
        F.sum("npos").over(w_desc).cast("long").alias("tp"),
        F.sum("n").over(w_desc).cast("long").alias("pp"),
        F.sum("npos").over(w_all).cast("long").alias("total_pos"),
        F.sum("n").over(w_all).cast("long").alias("total"),
    )
    fp = F.col("pp") - F.col("tp")
    fn = F.col("total_pos") - F.col("tp")
    return c.select(
        "bin",
        (F.col("bin") / F.lit(20.0)).alias("threshold"),
        "tp",
        fp.alias("fp"),
        fn.alias("fn"),
        ((F.col("total") - F.col("total_pos")) - fp).alias("tn"),
        F.when(F.col("pp") > 0, F.col("tp") / F.col("pp").cast("double"))
        .otherwise(F.lit(float("nan")))
        .alias("prec"),
        F.when(
            F.col("total_pos") > 0,
            F.col("tp") / F.col("total_pos").cast("double"),
        )
        .otherwise(F.lit(float("nan")))
        .alias("rec"),
        F.when(
            F.lit(2) * F.col("tp") + fp + fn > 0,
            F.lit(2.0) * F.col("tp") / (F.lit(2) * F.col("tp") + fp + fn),
        )
        .otherwise(F.lit(float("nan")))
        .alias("f1"),
    ).orderBy("bin")


@query(
    "q146_cohens_kappa",
    oracle="""
    WITH """ + _SCORED_DOCS_SQL + """,
    rated AS (
        SELECT source,
               CASE WHEN score >= CAST('0.5' AS DOUBLE) THEN 1 ELSE 0 END AS r1,
               pos AS r2
        FROM scored
    ),
    g AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r1 * r2) AS BIGINT) AS n11,
               CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS n10,
               CAST(SUM((1 - r1) * r2) AS BIGINT) AS n01,
               CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS n00
        FROM rated GROUP BY source
    ),
    k AS (
        SELECT source, n, n11, n00,
               (n11 + n00) / CAST(n AS DOUBLE) AS po,
               ((n11 + n10) / CAST(n AS DOUBLE))
                   * ((n11 + n01) / CAST(n AS DOUBLE))
               + ((n01 + n00) / CAST(n AS DOUBLE))
                   * ((n10 + n00) / CAST(n AS DOUBLE)) AS pe
        FROM g
    )
    SELECT source, n AS n_docs, n11 AS n_both_pos, n00 AS n_both_neg, po, pe,
           CASE WHEN CAST('1.0' AS DOUBLE) - pe > CAST('0.0' AS DOUBLE)
                THEN (po - pe) / (CAST('1.0' AS DOUBLE) - pe)
                ELSE CAST('nan' AS DOUBLE) END AS kappa
    FROM k ORDER BY source
    """,
)
def q146_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Cohen's kappa between two deterministic raters — the
    score-threshold rater (``score ≥ 0.5``) and the label rater
    (``n_chars ≥ 300``): chance-corrected agreement, the
    inter-annotator-consistency readout a labeling-QA pass runs before
    trusting weak labels (raw agreement ``po`` flatters imbalanced
    corpora; kappa doesn't).

    Exactness: the 2×2 confusion cells are int64; ``po``/``pe`` are
    fixed IEEE trees of single divisions by n (divide-THEN-multiply, so
    nothing overflows int64 at any corpus size); kappa is one guarded
    division — NaN when chance agreement is total (``pe = 1``: both
    raters constant, the degenerate shape).

    Shape: one source-keyed map-side-combinable aggregate; no windows,
    no joins."""
    scored = _scored_docs(spark, sf_dir)
    rated = scored.select(
        "source",
        F.when(F.col("score") >= F.lit(0.5), F.lit(1)).otherwise(F.lit(0)).alias("r1"),
        F.col("pos").alias("r2"),
    )
    g = rated.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r1") * F.col("r2")).cast("long").alias("n11"),
        F.sum(F.col("r1") * (F.lit(1) - F.col("r2"))).cast("long").alias("n10"),
        F.sum((F.lit(1) - F.col("r1")) * F.col("r2")).cast("long").alias("n01"),
        F.sum((F.lit(1) - F.col("r1")) * (F.lit(1) - F.col("r2")))
        .cast("long")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / nd
    pe = ((F.col("n11") + F.col("n10")) / nd) * (
        (F.col("n11") + F.col("n01")) / nd
    ) + ((F.col("n01") + F.col("n00")) / nd) * ((F.col("n10") + F.col("n00")) / nd)
    k = g.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("n11").alias("n_both_pos"),
        F.col("n00").alias("n_both_neg"),
        po.alias("po"),
        pe.alias("pe"),
    )
    return k.select(
        "source",
        "n_docs",
        "n_both_pos",
        "n_both_neg",
        "po",
        "pe",
        F.when(
            F.lit(1.0) - F.col("pe") > F.lit(0.0),
            (F.col("po") - F.col("pe")) / (F.lit(1.0) - F.col("pe")),
        )
        .otherwise(F.lit(float("nan")))
        .alias("kappa"),
    ).orderBy("source")


@query(
    "q147_cumulative_gains",
    oracle="""
    WITH """ + _SCORED_DOCS_SQL + """,
    b AS (
        SELECT CAST(least(9, CAST(FLOOR(score * CAST('10.0' AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS bin, pos
        FROM scored
    ),
    cnt AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS npos
        FROM b GROUP BY bin
    ),
    spine AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bin),
    j AS (
        SELECT spine.bin, COALESCE(cnt.n, 0) AS n, COALESCE(cnt.npos, 0) AS npos
        FROM spine LEFT JOIN cnt ON spine.bin = cnt.bin
    ),
    c AS (
        SELECT bin, n, npos,
               CAST(SUM(n) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_docs,
               CAST(SUM(npos) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_pos,
               CAST(SUM(n) OVER () AS BIGINT) AS total_docs,
               CAST(SUM(npos) OVER () AS BIGINT) AS total_pos
        FROM j
    )
    SELECT bin, n AS n_docs, npos AS n_pos, cum_docs, cum_pos,
           CASE WHEN total_pos > 0 THEN cum_pos / CAST(total_pos AS DOUBLE)
                ELSE CAST('nan' AS DOUBLE) END AS gain,
           CASE WHEN cum_docs > 0 AND total_pos > 0
                THEN (cum_pos / CAST(cum_docs AS DOUBLE))
                     / (total_pos / CAST(total_docs AS DOUBLE))
                ELSE CAST('nan' AS DOUBLE) END AS lift
    FROM c ORDER BY bin
    """,
)
def q147_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table over the score deciles (highest
    decile first): "keeping only the top-k score bins, what fraction of
    the positives do we keep, and at what lift over random" — the
    data-selection readout behind every score-ranked corpus-pruning
    decision, and the ranked companion to q138's calibration bins.

    Exactness: the decile is the q138 floor bin; cumulative and total
    counts are int64 window sums over a STATIC 10-bin spine; gain and
    lift are guarded single/two-step IEEE divisions — NaN until the
    running prefix contains a document (empty top bins) or when the
    corpus has no positives at all.

    Shape: one 10-ary count aggregate, windows over the 10-row spine."""
    from pyspark.sql import Window

    scored = _scored_docs(spark, sf_dir)
    b = scored.select(
        F.least(F.lit(9), F.floor(F.col("score") * F.lit(10.0)).cast("long"))
        .cast("long")
        .alias("bin"),
        "pos",
    )
    cnt = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("npos"),
    )
    spine = spark.range(0, 10).select(F.col("id").cast("long").alias("bin"))
    j = spine.join(F.broadcast(cnt), "bin", "left").na.fill({"n": 0, "npos": 0})
    w_desc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    c = j.select(
        "bin",
        F.col("n").alias("n_docs"),
        F.col("npos").alias("n_pos"),
        F.sum("n").over(w_desc).cast("long").alias("cum_docs"),
        F.sum("npos").over(w_desc).cast("long").alias("cum_pos"),
        F.sum("n").over(w_all).cast("long").alias("total_docs"),
        F.sum("npos").over(w_all).cast("long").alias("total_pos"),
    )
    return c.select(
        "bin",
        "n_docs",
        "n_pos",
        "cum_docs",
        "cum_pos",
        F.when(
            F.col("total_pos") > 0,
            F.col("cum_pos") / F.col("total_pos").cast("double"),
        )
        .otherwise(F.lit(float("nan")))
        .alias("gain"),
        F.when(
            (F.col("cum_docs") > 0) & (F.col("total_pos") > 0),
            (F.col("cum_pos") / F.col("cum_docs").cast("double"))
            / (F.col("total_pos") / F.col("total_docs").cast("double")),
        )
        .otherwise(F.lit(float("nan")))
        .alias("lift"),
    ).orderBy("bin")


@query(
    "q164_chi_square_drift",
    oracle="""
    WITH cells AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS observed
        FROM documents GROUP BY source, lang
    ),
    r AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS rr FROM cells GROUP BY source),
    c AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS cc FROM cells GROUP BY lang),
    t AS (
        SELECT CAST(SUM(observed) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS nc
        FROM cells
    ),
    scored AS (
        SELECT cells.source, cells.lang, cells.observed,
               CAST(r.rr * c.cc AS DOUBLE) / CAST(t.n AS DOUBLE) AS expected,
               CAST((t.nr - 1) * (t.nc - 1) AS BIGINT) AS dof
        FROM cells
        JOIN r USING (source)
        JOIN c USING (lang)
        CROSS JOIN t
    ),
    terms AS (
        SELECT source, lang, observed, expected,
               (CAST(observed AS DOUBLE) - expected)
               * (CAST(observed AS DOUBLE) - expected) / expected AS chi2_term,
               dof
        FROM scored
    ),
    tot AS (
        SELECT CAST(SUM(CAST((chi2_term) AS DECIMAL(38,6))) AS DOUBLE) AS chi2_total
        FROM terms
    )
    SELECT source, lang, observed, expected, chi2_term, chi2_total, dof
    FROM terms CROSS JOIN tot
    ORDER BY source, lang
    """,
)
def q164_chi_square_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity audit over the source × language
    contingency table: per-cell observed/expected counts and
    contributions, with the total statistic and degrees of freedom on
    every row — the cross-sectional "did the composition shift?"
    companion to the baseline-delta drift gate (q117 family). Expected
    counts are one multiply + one division of exact ints; contributions
    a fixed three-op chain; the total goes through the exact
    DECIMAL(38,6) sum. Cut-off lookup (p-values need the incomplete
    gamma, i.e. libm) is deliberately left to the caller. See
    :func:`operators.quality.chi_square_homogeneity`."""
    from reactive_kinesis_spark.operators.quality import chi_square_homogeneity

    docs = load_table(spark, sf_dir, "documents")
    return chi_square_homogeneity(docs, "source", "lang").orderBy("source", "lang")


def _gini_feature_block(prefix: str, fname: str, fexpr: str) -> str:
    """One feature's CTE block for the q171 oracle — mirrors
    :func:`operators.quality.gini_feature_screen`'s per-feature plan
    (cell counts → per-value squared-count sums → one quantized-ratio
    aggregate). ``FLOOR(sv/nv/N · 1e15)`` is the q107 floor-quantize rule
    applied to each per-value ratio so the cross-value sum is exact."""
    return f"""
    {prefix}cell AS (
        SELECT {fexpr} AS v, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2),
    {prefix}val AS (
        SELECT v, SUM(n) AS nv, SUM(CAST(n AS DECIMAL(19,0)) * n) AS sv
        FROM {prefix}cell GROUP BY v),
    {prefix}row AS (
        SELECT '{fname}' AS feature, CAST(COUNT(*) AS BIGINT) AS n_values,
               p.gini_parent,
               CAST('1.0' AS DOUBLE)
                 - CAST(SUM(CAST(FLOOR(CAST(sv AS DOUBLE) / CAST(nv AS DOUBLE)
                     / p.N * CAST('1e15' AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST('1e15' AS DOUBLE) AS gini_split
        FROM {prefix}val, parent p GROUP BY p.gini_parent, p.N)"""


@query(
    "q171_gini_feature_screen",
    oracle=f"""
    WITH lab AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    parent AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS N,
               CAST('1.0' AS DOUBLE)
                 - CAST(SUM(CAST(n AS DECIMAL(19,0)) * n) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS gini_parent
        FROM lab),{_gini_feature_block('f1', 'len_bucket', 'CAST(FLOOR(length(text) / 64) AS BIGINT)')},{_gini_feature_block('f2', 'source', 'source')}
    SELECT feature, n_values, gini_parent, gini_split,
           gini_parent - gini_split AS gini_gain
    FROM (SELECT * FROM f1row UNION ALL SELECT * FROM f2row)
    ORDER BY feature
    """,
)
def q171_gini_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-impurity reduction of the language label by each candidate
    metadata feature (source, 64-char length bucket) — the
    decision-tree split criterion as a which-columns-carry-signal audit,
    kept entirely inside the exact-integer certification family (no
    logarithm: Gini is pure count ratios; per-value ratios floor-quantized
    before the cross-value sum). See
    :func:`operators.quality.gini_feature_screen`."""
    from reactive_kinesis_spark.operators.quality import gini_feature_screen

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "len_bucket", F.floor(F.length("text") / F.lit(64)).cast("long")
    )
    return gini_feature_screen(docs, "lang", ["len_bucket", "source"]).orderBy(
        "feature"
    )
