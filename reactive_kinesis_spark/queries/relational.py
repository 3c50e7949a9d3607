"""Relational operator surface (SURVEY.md §2.2 rows: projection/filter,
joins of every type, aggregation + rollup/cube, window functions,
sort/limit/top-k, set ops, scalar functions).

The reference implements none of these (SURVEY.md §2.1 — it is a stream
connector); they are mandated by the north star and expressed as pure
Catalyst plans: filters/projections reach the parquet scan, dimension joins
are broadcast, aggregates are partial+final automatically. Every query here
would run unchanged on a 1000-executor cluster over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reactive_kinesis_spark.functions import davg, davg_sql, dsum, dsum_sql
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — full-scan aggregation (TPC-H Q1 pricing summary shape)
# --------------------------------------------------------------------------

_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           {dsum_sql(_REVENUE, 'sum_disc_price')},
           {davg_sql('l_quantity', 'avg_qty')},
           {davg_sql('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial+final hash aggregation over the fact table; the shipdate
    predicate and 6-column projection are pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q02 — selective filter + projection + deterministic top-N
# --------------------------------------------------------------------------


@query(
    "q02_filter_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(({_REVENUE}) AS DOUBLE) AS revenue,
           l_quantity, l_discount
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    ORDER BY l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown + column pruning; total order via the unique
    (l_orderkey, l_linenumber) key makes LIMIT deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            "l_quantity",
            "l_discount",
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q03 — 3-way join + agg + top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------


@query(
    "q03_join_agg_topk",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql(_REVENUE, 'revenue')},
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dimension (filtered customer) broadcast into the fact join;
    revenue uses the exact-decimal path so DESC ordering matches the oracle
    bit-for-bit."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — star-schema 5-way join (TPC-H Q5 shape)
# --------------------------------------------------------------------------


@query(
    "q04_star_join",
    oracle=f"""
    SELECT n_name, {dsum_sql(_REVENUE, 'revenue')}, COUNT(*) AS n_items
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q04_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic star join: bounded dims (region, nation) carry explicit
    broadcast hints; customer is broadcast after its semi-selective join;
    only the fact table shuffles (and AQE may remove even that)."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# q05 — anti join / q06 — left outer join with two-level agg
# --------------------------------------------------------------------------


@query(
    "q05_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS inactive_customers
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-06-01'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (customers with no recent orders; the date predicate
    keeps the result non-empty at every SF so the anti path is exercised on
    real values) — at scale this stays a shuffled hash anti-join on the
    smaller distinct key set."""
    cust = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp")
    )
    return (
        cust.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("inactive_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "q06_outer_join_histogram",
    oracle="""
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
    ORDER BY order_count
    """,
)
def q06_outer_join_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT of the null
    column = 0), then a second aggregation over the first's output."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("order_count")
    )


@query(
    "q07_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS active_customers
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one open order."""
    cust = _t(spark, sf_dir, "customer")
    open_orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("active_customers"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q08/q09 — window functions
# --------------------------------------------------------------------------


@query(
    "q08_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INT) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def q08_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — the scalable top-k-per-key
    idiom (single shuffle on the partition key; no global sort)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q09_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_price,
           LEAD(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS next_price,
           CAST(RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS INT) AS price_rank
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q09_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: running sum (exact-decimal frame agg),
    lag/lead, rank — one shuffle per distinct (partition, order) spec."""
    orders = _t(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_frame = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .over(w_frame)
            .cast("double")
            .alias("running_spend"),
            F.lag("o_totalprice").over(w_time).alias("prev_price"),
            F.lead("o_totalprice").over(w_time).alias("next_price"),
            F.rank().over(w_rank).cast("int").alias("price_rank"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --------------------------------------------------------------------------
# q10/q11 — grouping sets (rollup / cube)
# --------------------------------------------------------------------------


@query(
    "q10_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items, {dsum_sql('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — Catalyst expands to a single
    Expand + hash-aggregate (one pass over the fact table)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q11_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {dsum_sql('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# q12 — set operations
# --------------------------------------------------------------------------


@query(
    "q12_set_ops",
    oracle="""
    WITH early AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    late AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    )
    SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
    UNION ALL
    SELECT o_custkey, 'early_only' AS cohort FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
    UNION ALL
    SELECT o_custkey, 'late_only' AS cohort FROM (SELECT * FROM late EXCEPT SELECT * FROM early)
    ORDER BY cohort, o_custkey
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL cohort analysis over two date halves."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    early = orders.where(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    late = orders.where(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    # early/late are distinct sets, so exceptAll(other) ≡ EXCEPT — don't
    # recompute the intersection per branch (drops the plan from 9
    # exchanges / 20 aggregates to 7 / 16)
    both = early.intersect(late).select("o_custkey", F.lit("both").alias("cohort"))
    early_only = early.exceptAll(late).select(
        "o_custkey", F.lit("early_only").alias("cohort")
    )
    late_only = late.exceptAll(early).select(
        "o_custkey", F.lit("late_only").alias("cohort")
    )
    return both.unionByName(early_only).unionByName(late_only).orderBy("cohort", "o_custkey")


# --------------------------------------------------------------------------
# q13 — scalar function library (string / date / conditional)
# --------------------------------------------------------------------------


@query(
    "q13_scalar_functions",
    oracle="""
    SELECT UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 5) AS name_prefix,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CONCAT_WS('/', p_brand, p_type) AS brand_type,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CASE WHEN p_size >= 25 THEN 'large'
                WHEN p_size >= 10 THEN 'medium'
                ELSE 'small' END AS size_class,
           CAST(p_retailprice * 1.1 AS DOUBLE) AS marked_up,
           p_partkey
    FROM part
    ORDER BY p_partkey
    """,
)
def q13_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex/conditional scalar functions — all whole-stage-codegen
    built-ins (no UDFs)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.length("p_name").cast("int").alias("name_len"),
            F.when(F.col("p_size") >= 25, "large")
            .when(F.col("p_size") >= 10, "medium")
            .otherwise("small")
            .alias("size_class"),
            (F.col("p_retailprice") * 1.1).alias("marked_up"),
            "p_partkey",
        )
        .orderBy("p_partkey")
    )


@query(
    "q14_date_functions",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 'sum_price')}
    FROM orders
    WHERE date_trunc('year', o_orderdate) >= TIMESTAMP '1996-01-01'
    GROUP BY order_year, order_month
    ORDER BY order_year, order_month
    """,
)
def q14_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: extract, date_trunc, calendar aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where(
            F.date_trunc("year", "o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
        )
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
        .orderBy("order_year", "order_month")
    )


# --------------------------------------------------------------------------
# q15 — distinct aggregation / q16 — supplier-part join
# --------------------------------------------------------------------------


@query(
    "q15_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_suppliers,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q15_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst plans a single
    Expand rather than N self-joins)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q16_part_supplier_join",
    oracle=f"""
    SELECT s_name, p_type,
           {dsum_sql(_REVENUE, 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN part ON l_partkey = p_partkey
    WHERE p_type IN ('ECONOMY', 'PROMO')
    GROUP BY s_name, p_type
    ORDER BY s_name, p_type
    """,
)
def q16_part_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-two-dims join, both dims broadcast (supplier and filtered
    part are tiny at every SF ratio) — zero fact-table shuffle before agg."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type").isin("ECONOMY", "PROMO"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("s_name", "p_type")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("s_name", "p_type")
    )


# --------------------------------------------------------------------------
# q35 — explicit GROUPING SETS / q36 — approx distinct / q37 — range join
# --------------------------------------------------------------------------


@query(
    "q35_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q35_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint single-column sets — neither rollup
    nor cube): Catalyst plans one Expand over the scan, not N unions."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@query("q36_approx_distinct")  # rows-only: HLL sketch differs across engines
def q36_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count — the
    scale path for distinct-cardinality over 100 TB (sketches merge map-side;
    no exact-distinct Expand blowup). Emits per-group relative error at the
    default rsd=0.05; deterministic for fixed input (HLL merge is
    order-insensitive)."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return agg.select(
        "l_returnflag",
        "approx_orders",
        "exact_orders",
        F.round(
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders"),
            4,
        ).alias("rel_err"),
    ).orderBy("l_returnflag")


@query(
    "q37_range_join",
    oracle="""
    WITH bands AS (
        SELECT band_id, CAST(band_id * 50000 AS DOUBLE) AS lo,
               CAST((band_id + 1) * 50000 AS DOUBLE) AS hi
        FROM UNNEST(range(0, 12)) AS t(band_id)
    )
    SELECT b.band_id, COUNT(o.o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 0.0) AS sum_price
    FROM bands b LEFT JOIN orders o
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    ORDER BY b.band_id
    """,
)
def q37_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: facts against a tiny band table on a
    non-equi predicate. The band side is broadcast, so the physical plan is
    BroadcastNestedLoopJoin over a scan — the only sane shape when the join
    key is an interval; at 100 TB the fact side still never shuffles."""
    orders = _t(spark, sf_dir, "orders")
    bands = spark.range(0, 12).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 50000).cast("double").alias("lo"),
        ((F.col("id") + 1) * 50000).cast("double").alias("hi"),
    )
    joined = F.broadcast(bands).join(
        orders,
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        "left",
    )
    return (
        joined.groupBy("band_id")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("sum_price"),
        )
        .orderBy("band_id")
    )


@query(
    "q106_name_edit_join",
    oracle="""
    SELECT a.p_partkey AS id_1, b.p_partkey AS id_2,
           a.p_name AS name_1, b.p_name AS name_2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
    FROM part a
    JOIN part b
      ON string_split(a.p_name, ' ')[2] = string_split(b.p_name, ' ')[2]
     AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 500 AND b.p_partkey < 500
      AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY id_1, id_2
    """,
)
def q106_name_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: part-name pairs within 2 Levenshtein edits,
    blocked on the name's noun token so cost is per-block quadratic, never
    corpus-quadratic (at 100 TB compose tighter blocks: noun + length
    band + brand). Spark evaluates the bounded form
    ``levenshtein(l, r, threshold)`` — each comparison early-exits at
    distance 3. See :func:`operators.text.edit_distance_pairs`."""
    from reactive_kinesis_spark.operators.text import edit_distance_pairs

    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return (
        edit_distance_pairs(
            part,
            "p_name",
            "p_partkey",
            F.split(F.col("p_name"), " ").getItem(1),
            max_distance=2,
        )
        .select(
            "id_1", "id_2", "name_1", "name_2",
            F.col("distance").cast("long").alias("distance"),
        )
        .orderBy("id_1", "id_2")
    )


@query(
    "q108_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 1000.0 AS c_acctbal,
               'UPDATED' AS c_mktsegment
        FROM customer WHERE c_custkey < 50
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
               'NEW' AS c_mktsegment
        FROM customer WHERE c_custkey < 10
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM updates
    ORDER BY c_custkey, c_mktsegment
    """,
)
def q108_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a transform: a derived delta (50 account updates + 10
    inserts) upserted into customer — updates win on key, target passes
    through otherwise, delta broadcast so the (at scale, 100 TB) target
    never shuffles. See :func:`operators.relational.merge_upsert`."""
    from reactive_kinesis_spark.operators.relational import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    updates = (
        cust.where(F.col("c_custkey") < 50)
        .select(
            "c_custkey", "c_name", "c_nationkey",
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
        .unionByName(
            cust.where(F.col("c_custkey") < 10).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal",
                F.lit("NEW").alias("c_mktsegment"),
            )
        )
    )
    return merge_upsert(cust, updates, ["c_custkey"]).orderBy(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q118_sorted_neighborhood",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
        FROM part WHERE p_partkey < 2000
    ),
    s AS (
        SELECT p_partkey, p_name,
               LEAD(p_name, 1) OVER w AS n1, LEAD(p_partkey, 1) OVER w AS i1,
               LEAD(p_name, 2) OVER w AS n2, LEAD(p_partkey, 2) OVER w AS i2
        FROM p WINDOW w AS (PARTITION BY blk ORDER BY p_name, p_partkey)
    ),
    pairs AS (
        SELECT p_partkey AS id_1, i1 AS id_2, p_name AS name_1, n1 AS name_2
        FROM s WHERE i1 IS NOT NULL
        UNION ALL
        SELECT p_partkey, i2, p_name, n2 FROM s WHERE i2 IS NOT NULL
    )
    SELECT id_1, id_2, name_1, name_2,
           CAST(levenshtein(name_1, name_2) AS BIGINT) AS distance
    FROM pairs
    WHERE levenshtein(name_1, name_2) <= 6
    ORDER BY id_1, id_2
    """,
)
def q118_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidates by sorted-neighborhood blocking: parts
    sorted within their leading-token block, each compared to its next 2
    neighbors, kept within 6 edits — the complementary blocking pass to
    q106's equality blocks (multi-pass ER unions both). One block-keyed
    exchange, O(n·window) candidates by construction, bounded-early-exit
    Levenshtein. See :func:`operators.text.sorted_neighborhood_pairs`."""
    from reactive_kinesis_spark.operators.text import sorted_neighborhood_pairs

    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 2000)
    return sorted_neighborhood_pairs(
        part,
        "p_name",
        "p_partkey",
        F.split(F.col("p_name"), " ").getItem(0),
        window=2,
        max_distance=6,
    ).select(
        "id_1", "id_2", "name_1", "name_2", "distance"
    ).orderBy("id_1", "id_2")
