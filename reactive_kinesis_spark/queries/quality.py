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
