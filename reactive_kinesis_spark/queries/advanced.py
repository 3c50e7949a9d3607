"""Advanced relational surface: subqueries (correlated + scalar), HAVING,
pivot/unpivot, exact statistical moments, percentiles, higher-order array
functions, null-safe joins, filtered/conditional aggregates, and
distribution window functions.

None of these exist in the reference (SURVEY.md §2.1 — it is a stream
connector with no relational layer); they complete the §2.2 north-star
surface. All are pure Catalyst plans: subqueries are decorrelated by the
optimizer into joins, PIVOT becomes one hash aggregate, higher-order array
functions stay inside whole-stage codegen (no UDFs anywhere here).

Numeric policy: every DOUBLE aggregate goes through the exact
DECIMAL(38,6) path (:mod:`reactive_kinesis_spark.functions`) and derived
statistics are computed with *textually identical* IEEE expression trees in
Spark and the DuckDB oracle, so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactive_kinesis_spark.functions import davg, davg_sql, dsum, dsum_sql
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_DEC = "decimal(38,6)"

# exact per-group average, usable inside both engines' SQL dialects
_EXACT_AVG_QTY = "0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))"
_EXACT_AVG_PRICE = "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)"


# --------------------------------------------------------------------------
# q45 — correlated scalar subquery (TPC-H Q17 shape)
# --------------------------------------------------------------------------


@query(
    "q45_correlated_subquery",
    oracle=f"""
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    WHERE l_quantity < (
        SELECT {_EXACT_AVG_QTY}
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def q45_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H Q17 "small-quantity
    revenue" shape). Catalyst decorrelates this into an aggregate + join on
    l_partkey — one shuffle on the correlation key, no per-row re-execution,
    which is exactly the plan you want at 100 TB."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q45")
    return spark.sql(
        f"""
        SELECT COUNT(*) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem_q45 l
        WHERE l_quantity < (
            SELECT {_EXACT_AVG_QTY}
            FROM lineitem_q45 l2 WHERE l2.l_partkey = l.l_partkey
        )
        """
    )


# --------------------------------------------------------------------------
# q46 — uncorrelated scalar subquery
# --------------------------------------------------------------------------


@query(
    "q46_scalar_subquery",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'sum_price')}
    FROM orders
    WHERE o_totalprice > (SELECT {_EXACT_AVG_PRICE} FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q46_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global average price.
    The subquery executes once and is broadcast as a literal into the main
    scan's filter — zero extra shuffles regardless of fact-table size."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q46")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice', 'sum_price')}
        FROM orders_q46
        WHERE o_totalprice > (SELECT {_EXACT_AVG_PRICE} FROM orders_q46)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# q47 — HAVING / filter-on-aggregate (TPC-H Q18 shape)
# --------------------------------------------------------------------------


@query(
    "q47_having",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, big.sum_qty
    FROM orders o JOIN (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 250
    ) big ON o.o_orderkey = big.l_orderkey
    ORDER BY big.sum_qty DESC, o.o_orderkey
    """,
)
def q47_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): aggregate-then-filter (HAVING)
    and join back to the order header. The HAVING output is tiny, so it is
    broadcast into orders — the big lineitem aggregation is the only
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
    )


# --------------------------------------------------------------------------
# q48 — pivot / q49 — unpivot
# --------------------------------------------------------------------------


@query(
    "q48_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q48_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order-status columns out of rows. With explicit pivot values
    Catalyst plans a single hash aggregate with conditional branches — one
    pass, no per-value scans; semantically identical to the oracle's
    conditional aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"))
        .orderBy("o_orderpriority")
    )


@query(
    "q49_unpivot",
    oracle=f"""
    WITH a AS (
        SELECT l_returnflag,
               {dsum_sql('l_quantity', 'sum_qty')},
               {dsum_sql('l_extendedprice', 'sum_price')}
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
    ORDER BY l_returnflag, metric
    """,
)
def q49_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-flag aggregates back to (flag, metric,
    value) rows. Spark's unpivot is a zero-shuffle Expand over the
    aggregate's output."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price")
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


# --------------------------------------------------------------------------
# q50 — exact statistical moments (variance / stddev / correlation)
# --------------------------------------------------------------------------

# Derived statistics are written with IDENTICAL expression text in both
# engines: the moment sums are exact decimals cast to double, and every
# subsequent op is IEEE double arithmetic with the same tree shape, so both
# engines emit bit-identical results regardless of partitioning.
_MOMENT_EXPRS = [
    "CAST(n AS BIGINT) AS n",
    "sx / nd AS mean_qty",
    "(sxx - sx * sx / nd) / (nd - 1) AS var_qty",
    "SQRT((sxx - sx * sx / nd) / (nd - 1)) AS stddev_qty",
    # corr is the one compound where engine-level FP contraction (FMA) can
    # differ by ~1 ulp; round to 12 significant decimals on both sides.
    "ROUND((sxy - sx * sy / nd)"
    " / SQRT((sxx - sx * sx / nd) * (syy - sy * sy / nd)), 12) AS corr_qty_price",
]
_MOMENT_FORMULAS = ",\n           ".join(_MOMENT_EXPRS)


@query(
    "q50_stats_moments",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           {_MOMENT_FORMULAS}
    FROM m ORDER BY l_returnflag
    """,
)
def q50_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample variance / stddev / Pearson correlation from exact
    decimal moment sums. The native var_samp/corr aggregates exist too, but
    their float summation order is engine- and partitioning-dependent; the
    moments formulation is the deterministic, mergeable (map-side partial)
    form you want on a 1000-executor cluster anyway."""
    li = _t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(x.cast(_DEC)).cast("double").alias("sx"),
        F.sum(y.cast(_DEC)).cast("double").alias("sy"),
        F.sum((x * x).cast(_DEC)).cast("double").alias("sxx"),
        F.sum((y * y).cast(_DEC)).cast("double").alias("syy"),
        F.sum((x * y).cast(_DEC)).cast("double").alias("sxy"),
    )
    return m.selectExpr("l_returnflag", *_MOMENT_EXPRS).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# q51 — exact percentiles (continuous interpolation)
# --------------------------------------------------------------------------


@query(
    "q51_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE) AS p50,
           CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75,
           CAST(quantile_cont(l_extendedprice, 0.90) AS DOUBLE) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q51_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median and quartiles). Both engines
    implement PERCENTILE_CONT semantics: sort, index p*(n-1), linear
    interpolation — deterministic for identical inputs. At 100 TB the same
    query swaps to approx_percentile (t-digest, mergeable) — exact
    percentile requires a per-group sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25D)").alias("p25"),
            F.expr("percentile(l_quantity, 0.50D)").alias("p50"),
            F.expr("percentile(l_quantity, 0.75D)").alias("p75"),
            F.expr("percentile(l_extendedprice, 0.90D)").alias("price_p90"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q52 — higher-order array functions (transform / filter / aggregate)
# --------------------------------------------------------------------------


@query(
    "q52_higher_order_array",
    oracle=f"""
    WITH per_vec AS (
        SELECT label,
               CASE WHEN len(embedding) = 0 THEN 0.0 ELSE
                   list_reduce(
                       list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (acc, x) -> acc + x
                   )
               END AS ss,
               CASE WHEN len(embedding) > 0 THEN
                   CAST(len(list_filter(embedding, x -> x > 0)) AS DOUBLE)
                       / CAST(len(embedding) AS DOUBLE)
               END AS pos_frac
        FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vecs,
           {davg_sql('SQRT(ss)', 'avg_norm')},
           {davg_sql('pos_frac', 'avg_pos_frac')}
    FROM per_vec GROUP BY label ORDER BY label
    """,
)
def q52_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over array<float> embeddings: transform
    (square), left-fold aggregate (sum of squares — fold order matches the
    oracle's list_reduce exactly since 0.0 + x1 == x1), filter + size
    (positive fraction). All inside whole-stage codegen — the 100 TB path
    for vector feature engineering without a single Python round-trip.

    Degenerate-input contract (pinned by an oracle-parity test with
    injected rows): empty array → ss = 0.0 (DuckDB ``list_reduce`` errors
    on [] without the CASE guard), pos_frac = NULL on both engines; NULL
    embedding → ss and pos_frac NULL. The averages divide by the NON-NULL
    count (matching ``davg_sql``'s null-skipping ``COUNT(expr)``), so a
    NULL row shrinks the denominator identically on both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    per_vec = emb.select(
        "label",
        F.aggregate(
            F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("ss"),
        F.when(
            F.size("embedding") > 0,
            F.size(F.filter("embedding", lambda v: v > 0)).cast("double")
            / F.size("embedding").cast("double"),
        ).alias("pos_frac"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum(F.sqrt("ss").cast(_DEC)).cast("double") / F.count(F.sqrt("ss"))).alias(
                "avg_norm"
            ),
            (
                F.sum(F.col("pos_frac").cast(_DEC)).cast("double") / F.count("pos_frac")
            ).alias("avg_pos_frac"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q53 — null-safe equality join
# --------------------------------------------------------------------------


@query(
    "q53_nullsafe_join",
    oracle="""
    WITH c AS (SELECT NULLIF(c_custkey % 10, 0) AS k FROM customer),
         d AS (SELECT NULLIF(id, 0) AS k,
                      'bucket_' || CAST(id AS VARCHAR) AS bucket
               FROM range(0, 10) t(id))
    SELECT d.bucket, COUNT(*) AS n_customers
    FROM c JOIN d ON c.k IS NOT DISTINCT FROM d.k
    GROUP BY d.bucket
    ORDER BY d.bucket
    """,
)
def q53_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    NULL keys instead of dropping out. The tiny bucket dim is broadcast, so
    null-safe semantics cost nothing extra over a plain broadcast hash
    join."""
    cust = _t(spark, sf_dir, "customer").select(
        F.expr("NULLIF(c_custkey % 10, 0)").alias("ck")
    )
    dim = spark.range(0, 10).select(
        F.expr("NULLIF(id, 0)").alias("dk"),
        F.concat(F.lit("bucket_"), F.col("id").cast("string")).alias("bucket"),
    )
    return (
        cust.join(F.broadcast(dim), F.col("ck").eqNullSafe(F.col("dk")))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# q54 — filtered / conditional aggregates
# --------------------------------------------------------------------------


@query(
    "q54_filtered_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           {dsum_sql("CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0.0 END",
                     'taxed_price')}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q54_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (SQL FILTER clause / count_if): several
    differently-filtered measures in one pass over the fact table — the
    alternative (N filtered scans + join) would be N× the I/O at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            dsum(
                F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0),
                "taxed_price",
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q55 — distribution window functions (ntile / percent_rank / cume_dist)
# --------------------------------------------------------------------------


@query(
    "q55_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q55_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions. percent_rank = (rank-1)/(n-1) and
    cume_dist = preceding/n are exact integer ratios → one IEEE division,
    identical across engines; the unique (o_totalprice, o_orderkey) order
    makes ntile assignment deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cume"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# q56 — collect_list / collect_set aggregation
# --------------------------------------------------------------------------


@query(
    "q56_collect_agg",
    oracle="""
    WITH per AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           array_to_string(list_sort(list(o_orderstatus || ':' || CAST(n AS VARCHAR))), ',')
               AS status_counts,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
    FROM per GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q56_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set array aggregation. Collection order is
    partitioning-dependent, so results are made deterministic (and
    engine-portable) by array_sort + array_join — the discipline any
    collect_* at scale needs anyway. Pre-aggregating to (priority, status)
    bounds the collected arrays (never collect unbounded groups at 100 TB)."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", "o_orderstatus", F.col("n").cast("string"))
                    )
                ),
                ",",
            ).alias("status_counts"),
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
                "statuses"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q57 — map type & map functions
# --------------------------------------------------------------------------


@query(
    "q57_map_functions",
    oracle="""
    WITH per AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN o_orderstatus = 'F' THEN n END) AS n_f,
           MAX(CASE WHEN o_orderstatus = 'O' THEN n END) AS n_o,
           CAST(COUNT(CASE WHEN n > 100 THEN 1 END) AS BIGINT) AS n_big,
           array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses
    FROM per GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q57_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map columns built with map_from_entries, probed with element_at,
    filtered with map_filter, enumerated with map_keys — the typed-map
    surface the reference's opaque byte payloads lack entirely. The oracle
    states the same semantics relationally (lookup = conditional MAX,
    map_filter count = filtered COUNT)."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
    )
    return (
        per.groupBy("o_orderpriority")
        .agg(m.alias("m"))
        .select(
            "o_orderpriority",
            F.element_at("m", "F").alias("n_f"),
            F.element_at("m", "O").alias("n_o"),
            F.size(F.map_filter("m", lambda k, v: v > 100)).cast("bigint").alias("n_big"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("statuses"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q58 — compound subqueries (TPC-H Q22 shape)
# --------------------------------------------------------------------------

_AVG_POS_BAL = (
    "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) "
    "FROM {tbl} WHERE c_acctbal > 0.0"
)


@query(
    "q58_compound_subqueries",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal', 'sum_bal')}
    FROM customer
    WHERE c_acctbal > ({_AVG_POS_BAL.format(tbl='customer')})
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-09-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q58_compound_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape ("global sales opportunity"): a scalar aggregate
    subquery (above-average positive balance) AND a NOT EXISTS anti-join
    (no recent orders) in one WHERE. Catalyst plans the scalar subquery as a
    one-row broadcast and the NOT EXISTS as a left-anti hash join — the
    whole query costs one shuffle over the semi-filtered customer side."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_q58")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q58")
    return spark.sql(
        f"""
        SELECT c_nationkey, COUNT(*) AS n_customers,
               {dsum_sql('c_acctbal', 'sum_bal')}
        FROM customer_q58
        WHERE c_acctbal > ({_AVG_POS_BAL.format(tbl='customer_q58')})
          AND NOT EXISTS (
              SELECT 1 FROM orders_q58
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-09-01'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


# --------------------------------------------------------------------------
# q59 — RANGE interval window frame (trailing 30 days)
# --------------------------------------------------------------------------


@query(
    "q59_range_frame_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS n_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS spend_30d
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
    )
    ORDER BY o_custkey, o_orderkey
    """,
)
def q59_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per-customer trailing-30-day order count and
    exact spend (q09 covers ROWS frames; this is the other frame kind).
    RANGE over unix seconds includes all order-date peers in the frame —
    identical tie semantics in both engines, so no tie-breaker is needed in
    the frame ordering."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_30d"),
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# q73 — approximate percentiles (the q51 100 TB posture, made concrete)
# --------------------------------------------------------------------------


@query("q73_percentiles_approx", oracle=None)
def q73_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path q51's docstring commits to: ``approx_percentile``
    (KLL/quantile-sketch — mergeable partial aggregates, NO per-group sort,
    one partial+final shuffle like any hash agg). Rows-only driver check —
    sketch internals are engine-specific so no DuckDB hash parity — with
    the rank-error contract pinned locally against the exact q51 values
    (tests/test_properties.py::test_approx_percentiles_rank_error_bound):
    accuracy=10000 bounds rank error at n/10000 per group."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_quantity, 0.25D, 10000)").alias("p25"),
            F.expr("approx_percentile(l_quantity, 0.50D, 10000)").alias("p50"),
            F.expr("approx_percentile(l_quantity, 0.75D, 10000)").alias("p75"),
            F.expr("approx_percentile(l_extendedprice, 0.90D, 10000)").alias("price_p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q86_robust_outliers",
    oracle="""
    WITH med AS (
        SELECT source, CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS med
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.source, med.med,
               ABS(CAST(n_chars AS DOUBLE) - med.med) AS adev
        FROM documents d JOIN med USING (source)
    ),
    mad AS (
        SELECT source, CAST(quantile_cont(adev, 0.5) AS DOUBLE) AS mad
        FROM dev GROUP BY source
    )
    SELECT dev.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(dev.med) AS med,
           MIN(mad.mad) AS mad,
           CAST(SUM(CASE WHEN adev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM dev JOIN mad USING (source)
    GROUP BY dev.source
    ORDER BY dev.source
    """,
)
def q86_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier report: median and MAD (median absolute
    deviation) of document length, and how many documents sit beyond
    3 MADs — the outlier-rate signal mean/stddev (q50) gets wrong on the
    heavy-tailed length distributions real corpora have (one 100 MB
    document drags a stddev fence; it cannot drag a median).

    Spark-first shape: ONE source-keyed shuffle for the whole query. Both
    exact medians run as WINDOW aggregates over the same partition key
    (``percentile(...).over(partitionBy(source))``), so the second window
    and the final group-by all reuse the first exchange — where the naive
    aggregate-then-join-back formulation (what the DuckDB oracle runs)
    scans and shuffles the corpus three times. Same bounded-strata
    contract as every per-source exact-median: each source must fit a
    task; at unbounded group sizes swap ``percentile`` for the q73
    ``approx_percentile`` sketch (mergeable, no single-task constraint)
    with the pinned rank-error bound.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    w = Window.partitionBy("source")
    dev = (
        docs.withColumn("med", F.percentile("n_chars", F.lit(0.5)).over(w))
        .withColumn("adev", F.abs(F.col("n_chars").cast("double") - F.col("med")))
        .withColumn("mad", F.percentile("adev", F.lit(0.5)).over(w))
    )
    return (
        dev.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("source")
    )


@query(
    "q89_table_profile",
    oracle="""
    SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_value,
           CAST(MAX(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    ORDER BY col_name
    """,
)
def q89_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the documents table (null counts,
    exact distinct cardinality, min/max) — the per-ingest data-quality /
    optimizer-stats pass. One corpus pass: a single multi-count_distinct
    aggregate (Catalyst Expand + map-side partials, one shuffle), then a
    driver-free stack unpivot. See io.profile_table."""
    from reactive_kinesis_spark.io import profile_table

    docs = load_table(spark, sf_dir, "documents")
    return profile_table(docs, ["doc_id", "lang", "source", "n_chars"]).orderBy(
        "col_name"
    )


@query(
    "q90_zscore_normalize",
    oracle="""
    WITH m AS (
        SELECT doc_id, source, n_chars,
               CAST(COUNT(*) OVER w AS DOUBLE) AS nd,
               CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(38,6))) OVER w
                   AS DOUBLE) AS sxx
        FROM documents
        WINDOW w AS (PARTITION BY source)
    )
    SELECT doc_id, source, n_chars,
           (CAST(n_chars AS DOUBLE) - sx / nd)
               / sqrt(GREATEST((sxx - sx * sx / nd) / nd, 0.0)) AS z
    FROM m
    ORDER BY doc_id
    """,
)
def q90_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row feature normalization: z-score of document length within its
    source — the ML-preprocessing step (comparable quality features across
    domains with different length regimes). Bit-identical across engines
    WITHOUT the decimal round-trip being approximate: sums and
    sums-of-squares are exact DECIMAL(38,6) (the engine's q50 policy
    extended from aggregates to windows), every division is one IEEE op,
    and sqrt — unlike ln/exp — is CORRECTLY ROUNDED by IEEE-754, so even
    the standard deviation is portable.

    Shape: ONE source-keyed exchange; the three moment windows and the
    per-row projection all ride it (the aggregate+join-back alternative
    scans twice). Population variance, clamped at 0 against cancellation.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source")
    nd = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum(F.col("n_chars").cast("decimal(38,6)")).over(w).cast("double")
    sxx = (
        F.sum((F.col("n_chars") * F.col("n_chars")).cast("decimal(38,6)"))
        .over(w)
        .cast("double")
    )
    var = F.greatest((sxx - sx * sx / nd) / nd, F.lit(0.0))
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        ((F.col("n_chars").cast("double") - sx / nd) / F.sqrt(var)).alias("z"),
    ).orderBy("doc_id")


@query(
    "q113_winsorize",
    oracle="""
    WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
    q AS (
        SELECT event_type,
               CAST(quantile_cont(value, 0.05) AS DOUBLE) AS p_lo,
               CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p_hi
        FROM v GROUP BY event_type
    ),
    c AS (
        SELECT v.event_type, v.value, q.p_lo, q.p_hi,
               LEAST(GREATEST(v.value, q.p_lo), q.p_hi) AS wv
        FROM v JOIN q USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(p_lo) AS p_lo,
           MIN(p_hi) AS p_hi,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
               AS mean_raw,
           CAST(SUM(CAST(wv AS DECIMAL(38,6))) AS DOUBLE) / COUNT(wv)
               AS mean_winsor,
           CAST(SUM(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_low,
           CAST(SUM(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_high
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def q113_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization report: clamp event values at the exact
    5th/95th percentile of their event_type and compare raw vs winsorized
    means — the tail-robust feature-scaling step (reward clipping, outlier
    capping) a training pipeline runs before normalization. The mean shift
    quantifies how much tail mass the clamp removed.

    Shape: ONE event_type-keyed exchange — both percentile windows, the
    clamp, and the final group-by all ride the same partitioning (the
    q86/q90 window-over-one-exchange discipline; the oracle's
    aggregate-join-back form scans twice). Means go through the exact
    DECIMAL(38,6) policy; the clamp itself is least/greatest of doubles —
    bit-identical in both engines. Same bounded-strata contract as every
    exact per-group percentile (q73's approx_percentile is the unbounded
    fallback).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .where(F.col("value").isNotNull())
    )
    w = Window.partitionBy("event_type")
    c = (
        ev.withColumn("p_lo", F.percentile("value", F.lit(0.05)).over(w))
        .withColumn("p_hi", F.percentile("value", F.lit(0.95)).over(w))
        .withColumn(
            "wv", F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
        )
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            davg("value", "mean_raw"),
            davg("wv", "mean_winsor"),
            F.sum(F.when(F.col("value") < F.col("p_lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("value") > F.col("p_hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
        )
        .orderBy("event_type")
    )


@query(
    "q119_equidepth_histogram",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(l_extendedprice,
                   [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS c
        FROM lineitem
    ),
    b AS (
        SELECT 1 + len(list_filter(cuts.c, x -> l_extendedprice > x)) AS bucket,
               l_extendedprice AS v
        FROM lineitem, cuts
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS lo, MAX(v) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def q119_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) 8-bucket histogram of
    ``l_extendedprice`` — the optimizer-stats / drift-monitoring summary
    — computed the SCALABLE way: one aggregate finds the 7 exact
    percentile boundaries, then a broadcast of those 7 doubles + a
    Catalyst higher-order fold assigns buckets in a second narrow pass.
    No ``ntile``: the textbook global-ntile formulation funnels the
    entire table through a single-partition sort, the canonical 100 TB
    failure mode. Two scans, two tiny shuffles, zero sorts of the data.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    cuts = li.agg(
        F.expr(
            "percentile(v, array(0.125D, 0.25D, 0.375D, 0.5D, "
            "0.625D, 0.75D, 0.875D))"
        ).alias("c")
    )
    b = li.crossJoin(F.broadcast(cuts)).select(
        (
            F.lit(1)
            + F.aggregate(
                F.col("c"),
                F.lit(0),
                lambda acc, x: acc + F.when(F.col("v") > x, 1).otherwise(0),
            )
        ).cast("long").alias("bucket"),
        "v",
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups: rank every row within its
    group by ``(value, id)``, then replace the value with the MEAN of
    the values holding that same rank across all groups — after which
    every group shares one reference distribution (up to size
    differences; ranks missing from shorter groups simply average over
    the groups that have them — the standard deterministic treatment of
    unequal sizes). The cross-source distribution aligner (batch-effect
    removal for quality scores, per-source length bias, etc.).

    Exactness: values must be integer-exact (or pre-quantized); the
    reference value is then ``SUM(int64) / COUNT`` — one IEEE division
    of exact integers, bit-identical everywhere with no decimal casts.
    The unique ``id_col`` tie-break makes the within-group ranking
    total, so ranks — and therefore every output bit — are
    deterministic across partitionings and engines.

    Shape: one group-keyed sort-window for ranks, one rank-keyed
    aggregate for the reference, one rank-keyed join back — ranks are
    dense and uniformly distributed by construction (no skew), and the
    per-group sort is a partition-local sort after the one exchange,
    never a global one.

    Returns the input columns plus ``rank`` and ``normalized``.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.select(
        id_col,
        group_col,
        value_col,
        F.row_number().over(w).cast("long").alias("rank"),
    )
    ref = ranked.groupBy("rank").agg(
        (F.sum(F.col(value_col).cast("long")) / F.count(F.lit(1))).alias(
            "normalized"
        )
    )
    return ranked.join(ref, "rank").select(
        id_col, group_col, value_col, "rank", "normalized"
    )


@query(
    "q130_quantile_normalize",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS BIGINT) AS rank
        FROM documents
    ),
    ref AS (
        SELECT rank,
               CAST(SUM(n_chars) AS BIGINT) / CAST(COUNT(*) AS BIGINT)
                   AS normalized
        FROM ranked GROUP BY rank
    )
    SELECT r.doc_id, r.source, r.n_chars, r.rank, ref.normalized
    FROM ranked r JOIN ref USING (rank)
    ORDER BY r.doc_id
    """,
)
def q130_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalize document lengths across the 20 sources: each
    doc's ``n_chars`` is replaced by the mean length at its within-source
    rank, removing per-source length bias while preserving each source's
    ordering — the cross-source distribution aligner before
    length-balanced sampling. Integer sums, one IEEE division —
    hash-certified. See :func:`quantile_normalize`."""
    docs = _t(spark, sf_dir, "documents")
    out = quantile_normalize(docs, "source", "n_chars", "doc_id")
    return out.orderBy("doc_id")


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of an integer measure — the
    inequality/concentration audit (is one source dominating the
    corpus, one customer dominating a nation's order volume, one
    cluster absorbing the dataset). 0 = perfectly even, → 1 =
    concentrated in one member.

    Formula: with within-group values sorted ascending (ties broken by
    ``id_col`` — the rank must be total for determinism),
    ``G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n``. Both terms are single IEEE
    divisions of int64-exact sums, so the result is bit-identical
    across engines — the integer-division certification class (q127/
    q128/q130). Zero-total groups are dropped (Gini undefined).

    Shape: ONE group-keyed exchange — the rank window and the moment
    aggregation share the partitioning. Returns ``(*group, n, total,
    gini)``.
    """
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = df.select(
        group_col,
        F.col(value_col).cast("long").alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).cast("long").alias("__a"),
    )
    return agg.where(F.col("total") > 0).select(
        group_col,
        "n",
        "total",
        (
            (F.lit(2) * F.col("__a")) / (F.col("n") * F.col("total"))
            - (F.col("n") + F.lit(1)) / F.col("n")
        ).alias("gini"),
    )


@query(
    "q131_gini_concentration",
    oracle="""
    WITH vol AS (
        SELECT c.c_nationkey, o.o_custkey, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT c_nationkey,
               x AS __x,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY x, o_custkey
               ) AS BIGINT) AS __i
        FROM vol
    ),
    agg AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(__x) AS BIGINT) AS total,
               CAST(SUM(__i * __x) AS BIGINT) AS a
        FROM ranked GROUP BY c_nationkey
    )
    SELECT nt.n_name AS nation, agg.n, agg.total,
           (2 * a) / (n * total) - (n + 1) / n AS gini
    FROM agg JOIN nation nt ON agg.c_nationkey = nt.n_nationkey
    WHERE total > 0
    ORDER BY nation
    """,
)
def q131_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer order-count concentration
    — "is this market's volume spread across its customers or owned by
    a few" — the inequality audit a mixture-design / source-balancing
    pass runs on corpus shares. Exact integer moments, two IEEE
    divisions — hash-certified. See :func:`gini_concentration`."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    vol = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    g = gini_concentration(vol, "c_nationkey", "x", "o_custkey")
    return (
        g.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            g.c_nationkey == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "n", "total", "gini")
        .orderBy("nation")
    )


@query(
    "q133_lorenz_deciles",
    oracle="""
    WITH vol AS (
        SELECT c.c_nationkey, o.o_custkey, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT c_nationkey, x,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY x, o_custkey
               ) AS BIGINT) AS i,
               CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n,
               CAST(SUM(x) OVER (PARTITION BY c_nationkey) AS BIGINT) AS total,
               CAST(SUM(x) OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum
        FROM vol
    ),
    dec AS (
        SELECT c_nationkey,
               CAST(CEIL((10 * i) / CAST(n AS DOUBLE)) AS BIGINT) AS decile,
               i, n, total, cum
        FROM ranked
    ),
    top_of_decile AS (
        SELECT c_nationkey, decile, n, total, cum,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey, decile
                                  ORDER BY i DESC) AS rn
        FROM dec
    )
    SELECT nt.n_name AS nation, t.decile,
           t.cum AS cum_orders, t.total AS total_orders,
           t.cum / t.total AS cum_share
    FROM top_of_decile t JOIN nation nt ON t.c_nationkey = nt.n_nationkey
    WHERE t.rn = 1
    ORDER BY nation, decile
    """,
)
def q133_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Lorenz curve at decile resolution: cumulative share of
    order volume held by the bottom 10%/20%/…/100% of customers — the
    curve whose area deficit q131's Gini summarizes, at the granularity
    a balance dashboard actually plots. Deciles come from the rank
    window itself (``ceil(10·i/n)`` — NEVER a global ntile sort); the
    decile's representative row is its highest-ranked member (one
    struct-max per (nation, decile)). Integer prefix sums, one IEEE
    division — hash-certified.

    Shape: ONE nation-keyed exchange for all four windows, one small
    aggregate, one broadcast nation join."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    vol = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w_seq = Window.partitionBy("c_nationkey").orderBy("x", "o_custkey")
    w_all = Window.partitionBy("c_nationkey")
    ranked = vol.select(
        "c_nationkey",
        F.row_number().over(w_seq).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("x").over(w_all).cast("long").alias("total"),
        F.sum("x")
        .over(w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    ).withColumn(
        "decile",
        F.ceil((F.lit(10) * F.col("i")) / F.col("n").cast("double")).cast("long"),
    )
    top = ranked.groupBy("c_nationkey", "decile").agg(
        F.max(
            F.struct(
                F.col("i").alias("i"),
                F.col("n").alias("n"),
                F.col("total").alias("total"),
                F.col("cum").alias("cum"),
            )
        ).alias("__t")
    )
    return (
        top.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            top.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "decile",
            F.col("__t.cum").alias("cum_orders"),
            F.col("__t.total").alias("total_orders"),
            (F.col("__t.cum") / F.col("__t.total")).alias("cum_share"),
        )
        .orderBy("nation", "decile")
    )


def _quintile_map(counts: DataFrame, val_col: str, ascending: bool) -> DataFrame:
    """Tie-stable quintile assignment over a per-VALUE count frame.

    ``counts`` has one row per distinct metric value (``val_col``,
    ``c`` = customers at that value). The cumulative count over the
    value order gives F(v)·n, and the quintile is the pure-integer
    ceiling ``(5·cum + n − 1) div n`` — every customer sharing a value
    lands in the same quintile (unlike ``ntile``, which splits ties by
    arbitrary row order and is NOT cross-engine stable), and the window
    runs over the distinct-VALUE frame, whose size is bounded by the
    metric's integer domain (days / order counts / currency ranges),
    not by the row count — the q133 "never a global ntile sort" rule.
    """
    order = F.col(val_col).asc() if ascending else F.col(val_col).desc()
    w_cum = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    return counts.select(
        val_col,
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    ).select(
        val_col,
        F.expr("CAST((5 * cum + n - 1) DIV n AS BIGINT)").alias("__q"),
    )


@query(
    "q135_rfm_segments",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ad FROM orders),
    m AS (
        SELECT o_custkey,
               CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                              (SELECT ad FROM anchor)) AS BIGINT) AS rec,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS mon_units
        FROM orders GROUP BY o_custkey
    ),
    mk AS (SELECT *, mon_units // 1000 AS mon_k FROM m),
    rq AS (
        SELECT rec, (5 * cum + n - 1) // n AS __q FROM (
            SELECT rec,
                   SUM(c) OVER (ORDER BY rec
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(c) OVER () AS n
            FROM (SELECT rec, CAST(COUNT(*) AS BIGINT) AS c FROM mk GROUP BY rec)
        )
    ),
    fq AS (
        SELECT freq, (5 * cum + n - 1) // n AS __q FROM (
            SELECT freq,
                   SUM(c) OVER (ORDER BY freq DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(c) OVER () AS n
            FROM (SELECT freq, CAST(COUNT(*) AS BIGINT) AS c FROM mk GROUP BY freq)
        )
    ),
    mq AS (
        SELECT mon_k, (5 * cum + n - 1) // n AS __q FROM (
            SELECT mon_k,
                   SUM(c) OVER (ORDER BY mon_k DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(c) OVER () AS n
            FROM (SELECT mon_k, CAST(COUNT(*) AS BIGINT) AS c FROM mk GROUP BY mon_k)
        )
    )
    SELECT CAST(rq.__q AS BIGINT) AS r_q,
           CAST(fq.__q AS BIGINT) AS f_q,
           CAST(mq.__q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(mk.freq) AS BIGINT) AS total_orders,
           CAST(SUM(mk.mon_units) AS BIGINT) AS total_mon_units,
           SUM(mk.rec) / COUNT(*) AS avg_recency_days
    FROM mk
    JOIN rq USING (rec) JOIN fq USING (freq) JOIN mq USING (mon_k)
    GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def q135_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each purchasing customer scored into quintiles
    of Recency (days since last order, 1 = most recent), Frequency
    (order count, 1 = most frequent) and Monetary (lifetime whole-unit
    spend, 1 = highest), then the 125-cell segment grid summarized —
    the audience-picking table behind "lapsed big spenders" campaigns
    and, in corpus terms, the source-freshness/volume/value mix audit.

    Exactness: all three metrics are integers (day diffs, counts,
    floored currency units), quintiles are pure integer ceilings, and
    the only double is the final ``Σrec/n`` IEEE division —
    hash-certified with no quantization.

    Shape: facts reduce to one row per customer FIRST (one shuffle);
    the three quintile maps are windows over distinct-VALUE frames
    (bounded by the metric's integer domain, not the customer count —
    monetary is bucketed to thousands for exactly this reason) and
    broadcast back. No global per-row ntile sort anywhere."""
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.to_date("o_orderdate")).alias("ad"))
    m = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.floor("o_totalprice").cast("long")).cast("long").alias("mon_units"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("ad", "last_d").cast("long").alias("rec"),
            "freq",
            "mon_units",
            F.expr("CAST(mon_units DIV 1000 AS BIGINT)").alias("mon_k"),
        )
        # materialize ONCE (lazily): the three quintile maps and the final
        # scored join all derive from this frame — without the checkpoint
        # each branch re-runs the orders scan + customer reduce (measured:
        # 8 parquet scans in the plan; at 100 TB that is five passes over
        # the fact table instead of one)
        .localCheckpoint(eager=False)
    )
    rq = _quintile_map(
        m.groupBy("rec").agg(F.count(F.lit(1)).cast("long").alias("c")), "rec", True
    ).withColumnRenamed("__q", "r_q")
    fq = _quintile_map(
        m.groupBy("freq").agg(F.count(F.lit(1)).cast("long").alias("c")), "freq", False
    ).withColumnRenamed("__q", "f_q")
    mq = _quintile_map(
        m.groupBy("mon_k").agg(F.count(F.lit(1)).cast("long").alias("c")), "mon_k", False
    ).withColumnRenamed("__q", "m_q")
    scored = (
        m.join(F.broadcast(rq), "rec")
        .join(F.broadcast(fq), "freq")
        .join(F.broadcast(mq), "mon_k")
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("freq").cast("long").alias("total_orders"),
            F.sum("mon_units").cast("long").alias("total_mon_units"),
            (F.sum("rec") / F.count(F.lit(1))).alias("avg_recency_days"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "q142_ab_ztest",
    oracle="""
    WITH g AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY cohort
    ),
    w AS (
        SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
               MAX(CASE WHEN cohort = 0 THEN x END) AS x0,
               MAX(CASE WHEN cohort = 1 THEN n END) AS n1,
               MAX(CASE WHEN cohort = 1 THEN x END) AS x1
        FROM g
    )
    SELECT n0, x0, n1, x1,
           x0 / n0 AS p0,
           x1 / n1 AS p1,
           CASE WHEN SQRT(((x0 + x1) / (n0 + n1))
                    * (CAST('1.0' AS DOUBLE) - (x0 + x1) / (n0 + n1))
                    * (CAST('1.0' AS DOUBLE) / n0
                       + CAST('1.0' AS DOUBLE) / n1))
                     > CAST('0.0' AS DOUBLE)
           THEN (x1 / n1 - x0 / n0)
             / SQRT(((x0 + x1) / (n0 + n1))
                    * (CAST('1.0' AS DOUBLE) - (x0 + x1) / (n0 + n1))
                    * (CAST('1.0' AS DOUBLE) / n0
                       + CAST('1.0' AS DOUBLE) / n1))
           ELSE CAST('nan' AS DOUBLE) END AS z
    FROM w
    """,
)
def q142_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on an A/B split (cohort = ``user_id % 2``;
    conversion = purchase share of events): the experiment read-out
    every product analytics stack runs, and the template for holdout-
    vs-treatment corpus comparisons (filter on/off, source swapped).

    Exactness: the four inputs are int64 counts; every derived term is
    a fixed expression tree of IEEE divisions/multiplications and ONE
    correctly-rounded SQRT, mirrored token-for-token in the oracle —
    hash-certified, no quantization. Float literals go through
    CAST('…' AS DOUBLE) (DuckDB's bare-literal DECIMAL rule).

    Shape: one map-side-combinable 2-group aggregate, one single-row
    pivot. Nothing shuffles but 2 rows."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy((F.col("user_id") % 2).cast("long").alias("cohort")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    w = g.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("cohort") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 1, F.col("x"))).alias("x1"),
    )
    pp = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    # Pooled p ∈ {0, 1} (nobody or everybody converted) collapses the
    # standard error to exactly 0 → ANSI DIVIDE_BY_ZERO; gate and return
    # NaN (oracle mirrors with CASE WHEN ... 'nan').
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    return w.select(
        "n0",
        "x0",
        "n1",
        "x1",
        (F.col("x0") / F.col("n0")).alias("p0"),
        (F.col("x1") / F.col("n1")).alias("p1"),
        F.when(
            se > F.lit(0.0),
            (F.col("x1") / F.col("n1") - F.col("x0") / F.col("n0")) / se,
        )
        .otherwise(F.lit(float("nan")))
        .alias("z"),
    )


@query(
    "q143_mannwhitney_u",
    oracle="""
    WITH s AS (
        SELECT value AS v,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY value
    ),
    r AS (
        SELECT ca, cb, ca + cb AS t,
               CAST(COALESCE(SUM(ca + cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
        FROM s
    ),
    agg AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb,
               CAST(SUM(ca * (2 * before + t + 1)) AS BIGINT) AS ra2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS ties3
        FROM r
    ),
    sig AS (
        SELECT na, nb, ra2,
               SQRT((CAST(na AS DOUBLE) * nb / CAST('12.0' AS DOUBLE))
                    * ((na + nb + 1)
                       - CASE WHEN na + nb > 1 THEN ties3
                           / (CAST(na + nb AS DOUBLE) * (na + nb - 1))
                         ELSE CAST('0.0' AS DOUBLE) END)) AS sigma
        FROM agg
    )
    SELECT na, nb,
           (ra2 - na * (na + 1)) / CAST('2.0' AS DOUBLE) AS u,
           na * nb / CAST('2.0' AS DOUBLE) AS mu,
           CASE WHEN sigma > CAST('0.0' AS DOUBLE)
           THEN ((ra2 - na * (na + 1)) / CAST('2.0' AS DOUBLE)
            - na * nb / CAST('2.0' AS DOUBLE)) / sigma
           ELSE CAST('nan' AS DOUBLE) END AS z
    FROM sig
    """,
)
def q143_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test (click vs view event values) with the full
    tie correction — the rank-based "did the distribution shift"
    companion to q137's KS: U is location-sensitive where KS is
    shape-sensitive, and rank statistics survive outliers that wreck
    the q50 moment tests.

    Exactness: midranks are avoided entirely — the DOUBLED rank sum
    ``ra2 = Σ ca·(2·before + t + 1)`` is pure int64 (before = items
    below the tie group, t = tie size), so U = (ra2 − na(na+1))/2 is
    ONE division of exact integers; the tie term Σ(t³−t) is int64; z
    is a fixed IEEE expression tree ending in one correctly-rounded
    SQRT. Hash-certified with no quantization anywhere.

    Shape: events reduce to per-distinct-value tie counts first (one
    shuffle); the prefix-sum window runs over the distinct-value frame
    (bounded by the value domain — the q135/q137 rule), then ONE
    scalar aggregate. Nothing is ever collected."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.col("value").alias("v"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = s.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
        .cast("long")
        .alias("before"),
    )
    agg = r.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("before") + F.col("t") + F.lit(1))
        )
        .cast("long")
        .alias("ra2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("ties3"),
    )
    u = (F.col("ra2") - F.col("na") * (F.col("na") + 1)) / F.lit(2.0)
    mu = F.col("na") * F.col("nb") / F.lit(2.0)
    nn = F.col("na") + F.col("nb")
    # nn = 1 (a single observation) zeroes the tie-term denominator;
    # the leading na·nb factor is 0 there anyway, so the guarded 0 is
    # value-transparent for every non-degenerate input
    tie_term = F.when(
        nn > F.lit(1),
        F.col("ties3") / (nn.cast("double") * (nn - F.lit(1))),
    ).otherwise(F.lit(0.0))
    sigma = F.sqrt(
        (F.col("na").cast("double") * F.col("nb") / F.lit(12.0))
        * ((nn + F.lit(1)) - tie_term)
    )
    # Degenerate inputs (every observation tied, or one sample empty)
    # collapse the tie-corrected variance to exactly 0; ANSI mode would
    # raise DIVIDE_BY_ZERO, so gate the division and return the
    # documented NaN z (oracle mirrors with CASE WHEN ... 'nan').
    return agg.select(
        "na",
        "nb",
        u.alias("u"),
        mu.alias("mu"),
        F.when(sigma > F.lit(0.0), (u - mu) / sigma)
        .otherwise(F.lit(float("nan")))
        .alias("z"),
    )
