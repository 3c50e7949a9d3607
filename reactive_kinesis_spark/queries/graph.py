"""Graph queries — the iterative-algorithm tier of the query surface.

PageRank is inherently iterative (a fixed point of the walk operator), so
it has no portable single-statement SQL oracle; correctness is pinned by
the numpy power-iteration differential in ``tests/test_graph.py`` (same
dangling-mass semantics, atol 1e-9) plus the engine-wide determinism
harnesses (six-seed differential, empty/null sweeps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.graph import pagerank
from reactive_kinesis_spark.queries import query
from reactive_kinesis_spark.tables import load_table


#: Session-scoped memo of the materialized co-purchase pair frame, keyed by
#: (applicationId, sf_dir): q107 (uniform) and q121 (weighted) rank the SAME
#: graph, and the lineitem ⋈ orders projection is the expensive part of
#: both — sharing one localCheckpointed frame halves the pair's scan/join
#: work (round-6 verdict ask #3). The checkpoint's blocks die with the
#: session; the applicationId key makes a stale entry unreachable.
_COPURCHASE_CACHE: dict[tuple[str, str], DataFrame] = {}


def copurchase_pairs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier co-purchase pairs from orders ⋈
    lineitem with order-count weight ``w``, materialized once per
    (session, sf_dir). The weighted frame subsumes the uniform one: the
    groupBy keys are distinct by construction, so q107 just drops ``w``.

    Node ids are NUMERIC (customer ``2·custkey``, supplier
    ``2·suppkey+1`` — even/odd namespacing, collision-free): int64 keys
    hash/compare ~10% faster than the ``c<key>``/``s<key>`` strings
    through the loop's 12 node-keyed exchanges, and the public string
    labels are reapplied to the 100 output rows only (see
    :func:`_node_label`)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _COPURCHASE_CACHE.get(key)
    if cached is not None:
        return cached
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=False)
    )
    _COPURCHASE_CACHE[key] = pairs
    return pairs


def _node_label(node) -> F.Column:
    """Public label for a numeric co-purchase node id: ``c<custkey>`` /
    ``s<suppkey>`` (the query's output contract, unchanged from the
    string-keyed implementation)."""
    c = F.col(node) if isinstance(node, str) else node
    # shiftright is the exact integer halving for both parities (odd ids
    # are 2k+1 → k) — no double division, safe for arbitrarily large keys
    return F.concat(
        F.when(c % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        F.shiftright(c.cast("long"), 1).cast("string"),
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier co-purchase edges (distinct pairs,
    both directions). Symmetry makes the walk complete (no dangling
    nodes), so ranks sum to 1."""
    pairs = copurchase_pairs_weighted(spark, sf_dir).select("c", "s")
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _pagerank_oracle_sql(
    iterations: int = 6,
    damping: float = 0.85,
    weighted: bool = False,
    pairs_sql: list[str] | None = None,
    final_sql: list[str] | None = None,
) -> str:
    """Unrolled PageRank oracle over the co-purchase graph — the LAST
    iterative tier member to reach full hash certification (q115/q124
    precedent). Three cross-engine exactness rules, each found by
    measurement:

    * mass sums are floor-quantized integer micro-units (DECIMAL(38,0)):
      the plain double→DECIMAL(38,18) cast rounds HALF_UP in Spark and
      HALF_EVEN in DuckDB — observed 1-ulp rank diffs on ~60% of nodes;
    * every float literal is ``CAST('<python repr>' AS DOUBLE)``: DuckDB
      parses ``0.85``/``1.0 - 0.85`` as exact DECIMALs (teleport becomes
      exactly 0.15, not the double 0.15000000000000002);
    * expression shapes mirror the operator's evaluation order
      (``teleport + damping · (sum/Q)``).

    ``pairs_sql``/``final_sql`` swap the graph and the output projection
    (q169 ranks the word co-occurrence graph instead of co-purchase);
    the rank-iteration CTEs — the part whose exactness rules were
    hard-won — stay shared. Defaults reproduce the q107/q121 text byte
    for byte. ``pairs_sql`` must yield a ``pairs(c, s, w)`` CTE body
    (undirected edge per row, DOUBLE weight); ``final_sql`` the final
    SELECT lines over ``r{iterations}(node, rank)``.
    """
    tele = repr(1.0 - damping)
    damp = repr(damping)
    w_expr = "w" if weighted else "CAST(1.0 AS DOUBLE)"
    default_pairs = [
        "  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,",
        "         CAST(COUNT(*) AS DOUBLE) AS w",
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),",
    ]
    parts = ["WITH pairs AS ("] + (pairs_sql if pairs_sql is not None else default_pairs) + [
        f"e AS (SELECT c AS src, s AS dst, {w_expr} AS w FROM pairs",
        f"      UNION ALL SELECT s AS src, c AS dst, {w_expr} AS w FROM pairs),",
        "deg AS (SELECT src, CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE)",
        "        AS out_w FROM e GROUP BY src),",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),",
        "r0 AS (SELECT src AS node,",
        "       CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS rank FROM deg, nn),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"r{i} AS (",
            "  SELECT e.dst AS node,",
            f"    CAST('{tele}' AS DOUBLE) / CAST(nn.n AS DOUBLE)",
            f"    + CAST('{damp}' AS DOUBLE)",
            "      * (CAST(SUM(CAST(FLOOR(r.rank * e.w / d.out_w",
            "           * CAST(1e15 AS DOUBLE)) AS DECIMAL(38,0))) AS DOUBLE)",
            "         / CAST(1e15 AS DOUBLE)) AS rank",
            f"  FROM e JOIN r{i - 1} r ON e.src = r.node",
            "  JOIN deg d ON e.src = d.src CROSS JOIN nn",
            "  GROUP BY e.dst, nn.n),",
        ]
    parts[-1] = parts[-1].rstrip(",")
    parts += final_sql if final_sql is not None else [
        "SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)",
        "            ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node, rank",
        f"FROM r{iterations} ORDER BY rank DESC, 1 LIMIT 100",
    ]
    return "\n".join(parts)


@query("q107_pagerank", oracle=_pagerank_oracle_sql(6, 0.85, weighted=False))
def q107_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 nodes of the customer↔supplier co-purchase graph by
    6-iteration PageRank — the iterative-dataflow tier next to q60's
    connected components. Deterministic (quantized integer mass sums) and
    fully distributed (no collects; lineage truncated per 3 rounds). The
    edge list is symmetric by construction, so the ``symmetric=True``
    fast path applies (no node frame, no per-round left join). As of
    round 7 the fixed point is HASH-CERTIFIED against an unrolled DuckDB
    oracle (``quantize=1e15`` makes the mass sums cross-engine exact —
    see :func:`_pagerank_oracle_sql`); the numpy power-iteration
    differential in tests/test_graph.py independently pins the math."""
    edges = copurchase_edges(spark, sf_dir)
    ranks = pagerank(
        edges, iterations=6, assume_distinct=True, symmetric=True, quantize=1e15
    )
    return (
        ranks.select(_node_label("node").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(100)
    )


_COSUPPLY_CACHE: dict[tuple[str, str], DataFrame] = {}


def cosupply_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-supply projection: suppliers sharing a part (10% part
    sample keyed by partkey, hub parts capped at 32 suppliers).
    Materialized once per (session, sf_dir) — q110/q111/q115 all rank
    this same graph, so the projection's two exchanges run once."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _COSUPPLY_CACHE.get(key)
    if cached is not None:
        return cached
    from reactive_kinesis_spark.operators.graph import cooccurrence_edges

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 10 == 0)
        .select("l_partkey", "l_suppkey")
    )
    out = cooccurrence_edges(
        li, "l_partkey", "l_suppkey", max_group_size=32
    ).localCheckpoint(eager=False)
    _COSUPPLY_CACHE[key] = out
    return out


_Q110_EDGES_SQL = """
    pi AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
           WHERE l_partkey % 10 = 0),
    sized AS (SELECT l_partkey FROM pi
              GROUP BY l_partkey HAVING COUNT(*) BETWEEN 2 AND 32),
    p AS (SELECT pi.l_partkey, pi.l_suppkey FROM pi JOIN sized USING (l_partkey)),
    pairs AS (
      SELECT x.l_suppkey AS s_a, y.l_suppkey AS s_b,
             CAST(COUNT(*) AS BIGINT) AS weight
      FROM p x JOIN p y
        ON x.l_partkey = y.l_partkey AND x.l_suppkey < y.l_suppkey
      GROUP BY s_a, s_b)
"""


@query(
    "q110_cooccurrence_pairs",
    oracle=f"""
    WITH {_Q110_EDGES_SQL}
    SELECT s_a, s_b, weight FROM pairs
    ORDER BY weight DESC, s_a, s_b LIMIT 200
    """,
)
def q110_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 supplier pairs by number of co-supplied parts — the
    bipartite→unipartite projection primitive (co-purchase / co-click
    graphs) with the hub-group cap applied BEFORE any pair is emitted.
    Two exchanges total: group collect, pair count (see
    :func:`operators.graph.cooccurrence_edges`)."""
    e = cosupply_pairs(spark, sf_dir)
    return e.select(
        F.col("a").alias("s_a"), F.col("b").alias("s_b"), "weight"
    ).orderBy(F.col("weight").desc(), "s_a", "s_b").limit(200)


@query(
    "q111_triangle_stats",
    oracle=f"""
    WITH {_Q110_EDGES_SQL},
    thr AS (SELECT quantile_cont(CAST(weight AS DOUBLE), 0.9) AS q FROM pairs),
    e AS (SELECT s_a AS u, s_b AS v FROM pairs, thr
          WHERE CAST(weight AS DOUBLE) >= thr.q),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
              (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node),
    tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM
               (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
             GROUP BY node)
    SELECT deg.node, deg.degree,
           COALESCE(pern.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2 THEN
             CAST(2 * COALESCE(pern.triangles, 0) AS DOUBLE)
               / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
           ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN pern ON deg.node = pern.node
    ORDER BY triangles DESC, deg.node LIMIT 100
    """,
)
def q111_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle count, degree, and local clustering
    coefficient over the top-decile-weight co-supply graph — the
    local-density tier next to q107's global PageRank. Degree-ordered
    orientation bounds wedge fanout by O(sqrt(m)) on ANY degree
    distribution (hub-safe at 100 TB); the weight threshold is
    corpus-relative (90th percentile, the q103 df-cap discipline), so the
    graph sparsifies identically at every scale. Each triangle is found
    exactly once. The coefficient is one IEEE division of exact int64s —
    bit-identical across engines."""
    from reactive_kinesis_spark.operators.graph import triangle_stats

    edges = cosupply_pairs(spark, sf_dir)
    thr = edges.agg(
        F.expr("percentile(CAST(weight AS DOUBLE), 0.9D)").alias("__thr")
    )
    e = (
        edges.crossJoin(F.broadcast(thr))
        .where(F.col("weight").cast("double") >= F.col("__thr"))
        .select("a", "b")
    )
    stats = triangle_stats(e, "a", "b", assume_canonical=True)
    return stats.orderBy(F.col("triangles").desc(), "node").limit(100)


def _lpa_oracle_sql(iterations: int) -> str:
    """Unrolled label-propagation oracle: fixed iterations make the
    'iterative' algorithm a finite chain of CTEs — one count + one
    per-node argmin per round (rank by count DESC, label ASC)."""
    from reactive_kinesis_spark.queries.graph import _Q110_EDGES_SQL

    parts = [
        f"WITH {_Q110_EDGES_SQL},",
        "thr AS (SELECT quantile_cont(CAST(weight AS DOUBLE), 0.9) AS q FROM pairs),",
        "eg AS (SELECT s_a AS u, s_b AS v FROM pairs, thr",
        "       WHERE CAST(weight AS DOUBLE) >= thr.q),",
        "adj AS (SELECT u, v FROM eg UNION ALL SELECT v AS u, u AS v FROM eg),",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM adj),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT a.u AS node, l.label, COUNT(*) AS cnt "
            f"FROM adj a JOIN l{i - 1} l ON a.v = l.node GROUP BY 1, 2),"
        )
        parts.append(
            f"l{i} AS (SELECT node, label FROM ("
            f"SELECT node, label, ROW_NUMBER() OVER ("
            f"PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn FROM c{i}"
            f") WHERE rn = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, label AS community FROM l{iterations} ORDER BY node"
    )
    return "\n".join(parts)


@query("q115_label_propagation", oracle=_lpa_oracle_sql(4))
def q115_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community assignment for the top-decile co-supply graph by 4-round
    deterministic label propagation (most-frequent neighbor label,
    smallest-label tie-break). The fixed iteration count makes the
    iterative dataflow SQL-expressible by UNROLLING — so unlike q107's
    fixed point, this iterative query is fully hash-certified against
    the DuckDB oracle. See :func:`operators.graph.label_propagation`."""
    from reactive_kinesis_spark.operators.graph import label_propagation

    edges = cosupply_pairs(spark, sf_dir)
    thr = edges.agg(
        F.expr("percentile(CAST(weight AS DOUBLE), 0.9D)").alias("__thr")
    )
    e = (
        edges.crossJoin(F.broadcast(thr))
        .where(F.col("weight").cast("double") >= F.col("__thr"))
        .select("a", "b")
    )
    out = label_propagation(e, "a", "b", iterations=4, assume_canonical=True)
    return out.select("node", F.col("label").alias("community")).orderBy("node")


@query("q121_weighted_pagerank", oracle=_pagerank_oracle_sql(6, 0.85, weighted=True))
def q121_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 nodes by EDGE-WEIGHTED PageRank over the customer↔supplier
    graph — outbound mass splits by order-count weight (w/Σw) instead of
    uniformly, the walk a recommender actually wants (a supplier you
    ordered from 50 times pulls 50× the mass of a one-off). Same
    deterministic decimal-mass loop as q107; weights pre-aggregated into
    the edge list per the ``weight_col`` contract (shared materialized
    pair frame with q107 — see :func:`copurchase_pairs_weighted`).
    HASH-CERTIFIED against the weighted unrolled oracle (round 7); the
    numpy power-iteration differential in tests/test_graph.py
    independently pins the math."""
    pairs = copurchase_pairs_weighted(spark, sf_dir)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst"), "w"
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w"))
    ranks = pagerank(edges, iterations=6, weight_col="w", symmetric=True, quantize=1e15)
    return (
        ranks.select(_node_label("node").alias("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
        .limit(100)
    )


def _bfs_oracle_sql(max_hops: int) -> str:
    """Unrolled multi-source BFS oracle: min-distance propagation is a
    finite CTE chain for fixed ``max_hops`` (each round: settled ∪
    neighbors+1, per-node MIN). Different physical shape from the
    engine's frontier BFS — deliberately: the oracle states the
    semantics, the operator picks the scale-safe plan. Integer hops ⇒
    bit-equal without any quantization tricks."""
    parts = [
        "WITH pairs AS (",
        "  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s",
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),",
        "adj AS (SELECT c AS u, s AS v FROM pairs",
        "        UNION ALL SELECT s AS u, c AS v FROM pairs),",
        "d0 AS (SELECT DISTINCT c AS node, 0 AS hops FROM pairs WHERE c % 500 = 0),",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"d{i} AS (SELECT node, MIN(hops) AS hops FROM ("
            f"SELECT node, hops FROM d{i - 1} "
            f"UNION ALL SELECT a.v AS node, d.hops + 1 AS hops "
            f"FROM adj a JOIN d{i - 1} d ON a.u = d.node"
            f") GROUP BY node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        "SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)"
        " ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,"
        f" CAST(hops AS BIGINT) AS hops FROM d{max_hops} ORDER BY hops, node"
    )
    return "\n".join(parts)


@query("q126_bfs_hops", oracle=_bfs_oracle_sql(3))
def q126_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance of every customer/supplier from the seed customers
    (custkey ≡ 0 mod 250) through the co-purchase graph, capped at 3
    hops — the reachability / blast-radius query (which entities does a
    quarantined seed set touch within k relationship hops). Frontier
    BFS (see :func:`operators.graph.bfs_distances`); HASH-CERTIFIED
    against an unrolled min-propagation oracle — integer distances need
    no quantization. Shares the materialized co-purchase pair frame
    with q107/q121."""
    from reactive_kinesis_spark.operators.graph import bfs_distances

    pairs = copurchase_pairs_weighted(spark, sf_dir)
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    seeds = pairs.select(F.col("c").alias("node")).where(F.col("node") % 500 == 0)
    dist = bfs_distances(edges, seeds, max_hops=3, undirected=True)
    return (
        dist.select(_node_label("node").alias("node"), "hops")
        .orderBy("hops", "node")
    )


_Q127_ORACLE = """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
ic AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS cnt FROM bi GROUP BY i),
pc AS (SELECT x.i AS pa, y.i AS pb, CAST(COUNT(*) AS BIGINT) AS pair_count
       FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
       GROUP BY pa, pb),
pf AS (SELECT * FROM pc WHERE pair_count >= 2),
dir AS (SELECT pa AS antecedent, pb AS consequent, pair_count FROM pf
        UNION ALL
        SELECT pb AS antecedent, pa AS consequent, pair_count FROM pf)
SELECT d.antecedent, d.consequent, d.pair_count,
       d.pair_count / n.n AS support,
       d.pair_count / ia.cnt AS confidence,
       (d.pair_count * n.n) / (ia.cnt * ib.cnt) AS lift
FROM dir d
JOIN ic ia ON d.antecedent = ia.i
JOIN ic ib ON d.consequent = ib.i
CROSS JOIN n
ORDER BY lift DESC, antecedent, consequent LIMIT 100
"""


@query("q127_association_rules", oracle=_Q127_ORACLE)
def q127_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 part→part association rules by lift over order baskets —
    the market-basket mining query (support / confidence / lift from
    exact basket counts). Every metric is one IEEE division of
    int64-exact values, so the whole report hash-certifies with no
    quantization; the pair frame is pruned by ``min_pair_count`` BEFORE
    the item-count joins and the basket total enters as a broadcast
    single-row frame. See :func:`operators.mining.association_rules`."""
    from reactive_kinesis_spark.operators.mining import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    rules = association_rules(li, "l_orderkey", "l_partkey", min_pair_count=2)
    return rules.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(100)


_Q129_ORACLE = """
WITH cp AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
eg AS (SELECT LEAST(c, s) AS a, GREATEST(c, s) AS b FROM cp),
adj AS (SELECT a AS u, b AS v FROM eg UNION ALL SELECT b AS u, a AS v FROM eg),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY u),
centers AS (SELECT node FROM deg WHERE degree <= 64),
adjc AS (SELECT adj.u, adj.v FROM adj JOIN centers ON adj.u = centers.node),
wedges AS (
  SELECT x.v AS a, y.v AS b, CAST(COUNT(*) AS BIGINT) AS common_neighbors
  FROM adjc x JOIN adjc y ON x.u = y.u AND x.v < y.v
  GROUP BY a, b),
cand AS (
  SELECT w.* FROM wedges w LEFT JOIN eg ON w.a = eg.a AND w.b = eg.b
  WHERE eg.a IS NULL)
SELECT CASE WHEN c.a % 2 = 0 THEN 'c' || CAST(c.a // 2 AS VARCHAR)
            ELSE 's' || CAST(c.a // 2 AS VARCHAR) END AS a,
       CASE WHEN c.b % 2 = 0 THEN 'c' || CAST(c.b // 2 AS VARCHAR)
            ELSE 's' || CAST(c.b // 2 AS VARCHAR) END AS b,
       c.common_neighbors,
       da.degree AS degree_a, db.degree AS degree_b,
       c.common_neighbors / (da.degree + db.degree - c.common_neighbors)
           AS jaccard
FROM cand c
JOIN deg da ON c.a = da.node
JOIN deg db ON c.b = db.node
ORDER BY jaccard DESC, c.a, c.b LIMIT 100
"""


@query("q129_link_prediction", oracle=_Q129_ORACLE)
def q129_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted links in the co-purchase graph by
    neighbor-Jaccard — in the bipartite customer↔supplier graph every
    wedge joins two same-side nodes, so with hub supplier centers
    dropped by the degree-64 cap this ranks SUPPLIER pairs by shared
    customer base ("never sold to each other's accounts directly, but
    serve the same buyers") — the recommender query over the graph
    tier. The cap is stated semantics, mirrored in the oracle (its
    co-supply twin is a COMPLETE graph at test SFs — zero non-adjacent
    pairs, a vacuous target; the bipartite graph is where prediction
    means something). Exact-integer counts, one IEEE division —
    hash-certified. Shares the materialized co-purchase frame with
    q107/q121/q126. See
    :func:`operators.graph.link_prediction_jaccard`."""
    from reactive_kinesis_spark.operators.graph import link_prediction_jaccard

    pairs = copurchase_pairs_weighted(spark, sf_dir)
    # canonicalize a<b without the operator's distinct shuffle: (c, s)
    # rows are already distinct and least/greatest is injective on them
    edges = pairs.select(
        F.least("c", "s").alias("src"), F.greatest("c", "s").alias("dst")
    )
    out = link_prediction_jaccard(edges, max_center_degree=64, assume_canonical=True)
    return (
        out.orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(100)
        .select(
            _node_label("a").alias("a"),
            _node_label("b").alias("b"),
            "common_neighbors",
            "degree_a",
            "degree_b",
            "jaccard",
        )
    )


def _hits_oracle_sql(iterations: int = 2, top_k: int = 25) -> str:
    """Unrolled HITS oracle over the supplier→part bipartite graph.

    Same three exactness rules as :func:`_pagerank_oracle_sql`: every
    sum (per-node and the L1 normalizer) floor-quantizes to integer
    micro-units in DECIMAL(38,0); scores then differ from exact HITS
    by < 1e-12 but are bit-identical across engines; the SELECT shapes
    mirror the operator's evaluation order (``raw / tot``)."""
    qz = "CAST(1e15 AS DOUBLE)"

    def qsum(expr: str) -> str:
        return (
            f"CAST(SUM(CAST(FLOOR({expr} * {qz}) AS DECIMAL(38,0))) AS DOUBLE)"
            f" / {qz}"
        )

    parts = [
        "WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst",
        "           FROM lineitem),",
        "a0 AS (SELECT dst AS node, CAST(1.0 AS DOUBLE) AS score",
        "       FROM (SELECT DISTINCT dst FROM e)),",
    ]
    prev_a = "a0"
    for i in range(1, iterations + 1):
        parts += [
            f"h{i}r AS (SELECT e.src, {qsum('a.score')} AS raw",
            f"  FROM e JOIN {prev_a} a ON e.dst = a.node GROUP BY e.src),",
            f"h{i}t AS (SELECT {qsum('raw')} AS tot FROM h{i}r),",
            f"h{i} AS (SELECT src AS node, raw / tot AS score",
            f"  FROM h{i}r, h{i}t),",
            f"a{i}r AS (SELECT e.dst, {qsum('h.score')} AS raw",
            f"  FROM e JOIN h{i} h ON e.src = h.node GROUP BY e.dst),",
            f"a{i}t AS (SELECT {qsum('raw')} AS tot FROM a{i}r),",
            f"a{i} AS (SELECT dst AS node, raw / tot AS score",
            f"  FROM a{i}r, a{i}t),",
        ]
        prev_a = f"a{i}"
    parts[-1] = parts[-1].rstrip(",")
    n = iterations
    parts += [
        "SELECT side, node, score FROM (",
        "  SELECT 'hub' AS side, 'S' || CAST(node AS VARCHAR) AS node, score",
        f"  FROM h{n} ORDER BY score DESC, node LIMIT {top_k}",
        ") UNION ALL",
        "SELECT side, node, score FROM (",
        "  SELECT 'auth' AS side, 'P' || CAST(node AS VARCHAR) AS node, score",
        f"  FROM a{n} ORDER BY score DESC, node LIMIT {top_k}",
        ")",
        "ORDER BY side, score DESC, node",
    ]
    return "\n".join(parts)


@query("q140_hits_scores", oracle=_hits_oracle_sql(2, 25))
def q140_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the supplier→part supply graph:
    suppliers that stock the widely-sourced parts (hubs) and parts
    carried by the broadest suppliers (authorities) — the second
    certified iterative family next to PageRank (q107/q121), exercising
    the OTHER fixed-point shape: alternating bipartite half-steps with
    a global L1 normalizer per half-step, carried as a broadcast
    single-row frame (never a driver collect).

    Hash-certified against a fully unrolled 2-iteration DuckDB oracle
    (:func:`_hits_oracle_sql`); every mass and normalizer sum uses the
    pagerank ``quantize=1e15`` integer-micro-unit rule, so Spark and
    DuckDB reach bit-identical scores. See
    :func:`reactive_kinesis_spark.operators.graph.hits` for the 100 TB
    exchange pattern."""
    from reactive_kinesis_spark.operators.graph import hits

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    hubs, auths = hits(
        li, src_col="l_suppkey", dst_col="l_partkey", iterations=2, quantize=1e15
    )
    # tie-break on the LABEL string (the oracle's ORDER BY key): at tiny
    # SFs every score can tie, and 'P100' < 'P11' lexicographically —
    # ordering by the numeric id first picks a different top-k set
    top_h = (
        hubs.select(
            F.lit("hub").alias("side"),
            F.concat(F.lit("S"), F.col("node").cast("string")).alias("node"),
            "score",
        )
        .orderBy(F.col("score").desc(), "node")
        .limit(25)
    )
    top_a = (
        auths.select(
            F.lit("auth").alias("side"),
            F.concat(F.lit("P"), F.col("node").cast("string")).alias("node"),
            "score",
        )
        .orderBy(F.col("score").desc(), "node")
        .limit(25)
    )
    return top_h.unionByName(top_a).orderBy("side", F.col("score").desc(), "node")


def _textrank_pairs_sql(from_tbl: str = "documents") -> list[str]:
    """q169/q198: TextRank pairs CTE — the word co-occurrence graph (±2
    window, normalized word pairs, co-occurrence count as weight),
    mirroring operators.text.cooccurrence_word_edges. Word nodes are the
    strings themselves; no numeric namespacing or relabeling step.
    Parameterized over the docs source (r13 verdict Next #4: q198 runs
    the identical text over the synthetic Zipf corpus); the default
    reproduces the q169 text byte for byte (pinned in
    tests/test_round14_ops.py)."""
    return [
        "  SELECT LEAST(w1, w2) AS c, GREATEST(w1, w2) AS s,",
        "         CAST(COUNT(*) AS DOUBLE) AS w",
        "  FROM (",
        "    SELECT words[i] AS w1, words[i + o] AS w2",
        "    FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '')",
        f"          AS words FROM {from_tbl}),",
        "         UNNEST(range(1, len(words))) AS t(i), UNNEST([1, 2]) AS u(o)",
        "    WHERE len(words) >= 3 AND i + o <= len(words)",
        "      AND words[i] <> words[i + o]",
        "  ) GROUP BY 1, 2),",
    ]


_TEXTRANK_PAIRS_SQL = _textrank_pairs_sql()


@query(
    "q169_textrank_keywords",
    oracle=_pagerank_oracle_sql(
        6,
        0.85,
        weighted=True,
        pairs_sql=_TEXTRANK_PAIRS_SQL,
        final_sql=[
            "SELECT node AS word, rank",
            "FROM r6 ORDER BY rank DESC, node LIMIT 30",
        ],
    ),
)
def q169_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004): top-30
    words by 6-iteration weighted PageRank over the ±2-window word
    co-occurrence graph — keyword extraction as a composition of two
    certified pieces (the single-scan co-occurrence edge builder and the
    quantized-integer-mass PageRank loop). One corpus scan builds the
    vocab-sized graph; the walk never touches documents again. See
    :func:`operators.text.cooccurrence_word_edges` and
    :func:`operators.graph.pagerank`."""
    from reactive_kinesis_spark.operators.text import cooccurrence_word_edges

    docs = load_table(spark, sf_dir, "documents")
    und = cooccurrence_word_edges(docs, "text", window=2, min_words=3)
    edges = und.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w").unionAll(
        und.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    pr = pagerank(
        edges, iterations=6, damping=0.85, weight_col="w",
        symmetric=True, quantize=1e15,
    )
    return (
        pr.orderBy(F.desc("rank"), F.asc("node"))
        .limit(30)
        .select(F.col("node").alias("word"), "rank")
    )
