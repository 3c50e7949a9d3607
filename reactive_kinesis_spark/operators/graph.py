"""Iterative graph algorithms on DataFrames.

The engine's iterative-computation tier (alongside the O(log n)
large-star/small-star connected components in :mod:`operators.dedup`):
fixed-iteration dataflow loops built from joins + aggregations, with
per-round lineage truncation so the plan doesn't grow with the iteration
count — the Spark-first shape for PageRank-style algorithms (same loop
skeleton as the classic Pregel-on-dataflow formulations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal type for rank mass: ranks are probabilities (≤ 1), so 20 integer
#: digits / 18 fractional digits keeps per-node inbound sums exact for any
#: realistic in-degree while making the aggregation ORDER-INDEPENDENT —
#: a plain double sum would make ranks depend on partition/merge order,
#: breaking the engine's determinism contract (same input ⇒ same bits).
_RANK_DEC = "decimal(38,18)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    assume_distinct: bool = False,
    weight_col: str | None = None,
    symmetric: bool = False,
    quantize: float | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — the canonical
    "importance by random walk" score for entity graphs (co-purchase,
    citation, link graphs) a curation pipeline weights documents or
    sources by.

    Semantics: standard damped PageRank with DANGLING MASS DROPPED (a
    node with no outbound edges absorbs its walk; ranks then sum to < 1).
    That's the common dataflow simplification — redistribute-to-all needs
    a per-iteration global scalar, a driver round-trip this operator
    deliberately avoids; feed symmetric edges if the graph must be
    walk-complete. Multi-edges are collapsed up front.

    ``weight_col`` makes the walk WEIGHTED: a node's outbound mass splits
    proportionally to edge weight (``w / Σ_out w``) instead of uniformly
    — co-purchase counts, link frequencies, similarity scores. Weights
    must be non-negative; zero-total-weight nodes behave as dangling.
    With ``weight_col`` multi-edge dedup is skipped (duplicate (src, dst)
    rows are the caller's aggregation decision — pre-sum them into the
    weight instead).

    ``symmetric=True`` is the caller's guarantee that every edge's
    reverse is also present (an undirected graph fed as both directions —
    the co-purchase/co-click shape). Then the src key set IS the node
    set and every node receives inbound mass, so the node frame, its
    union-distinct setup shuffle, and the per-iteration left join against
    it all disappear: setup is one degree aggregate + one join, and each
    round is exactly one join + one aggregation. Results are
    bit-identical to the general path on any symmetric input (pinned by
    tests/test_graph.py).

    Determinism: per-node inbound mass is summed in DECIMAL(38,18)
    (exact, order-independent) so the result is bit-stable across
    partitionings, retries, and AQE re-plans — the property the engine's
    six-seed differential harness asserts for every registered query.

    ``quantize`` upgrades within-engine determinism to CROSS-ENGINE
    bit-equality: each contribution is floor-quantized to integer
    micro-units (``floor(contrib · quantize)``, summed in DECIMAL(38,0))
    before the mass sum. The plain decimal path is bit-stable per engine
    but a double→DECIMAL(38,18) cast rounds HALF_UP in Spark and
    HALF_EVEN elsewhere, so engines can differ in the final ulp; floor of
    an identical double is identical everywhere. ``quantize=1e15``
    perturbs each contribution by < 1e-15 (ranks shift ~1e-11 over 6
    rounds — far inside the numpy differential's 1e-9 pin) and is what
    lets q107/q121 run under FULL hash certification against unrolled
    DuckDB oracles. Still order-independent: the summands are exact
    integers.

    100 TB shape: the per-iteration dataflow is one src-keyed equi-join
    (ranks ⋈ out-degree-annotated edges) and one dst-keyed aggregation —
    both AQE-managed shuffles keyed by node id; nothing is ever collected
    (the node count, one scalar, is computed distributed and carried as a
    broadcast single-row frame). ``localCheckpoint`` every
    ``checkpoint_every`` rounds truncates lineage so plan size and
    scheduler overhead stay O(1) in ``iterations`` — without it the DAG
    doubles per round. Intermediate-round checkpoints are LAZY
    (``eager=False``): they still truncate lineage and cache on first
    evaluation, but don't force a blocking job per checkpoint, so the
    whole fixed-iteration loop executes as ONE submitted job — the LPA
    unrolling lesson (SCALING.md: eager per-round barriers measured
    9.6 s vs 4.4 s unrolled on the same graph). Returns ``(node, rank)``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if weight_col is not None:
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        ).where(F.col("w") > 0)
    else:
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.lit(1.0).alias("w"),
        )
        if not assume_distinct:
            # multi-edges would multiply contributions; skip the
            # (full-edge-list shuffle) dedup only when the producer
            # guarantees distinctness
            e = e.dropDuplicates(["src", "dst"])
    # the loop-invariant frames are materialized ONCE (localCheckpoint also
    # cuts their lineage out of every iteration's plan): the edge frame
    # itself (r15 — ``e`` feeds BOTH the degree aggregate and the
    # out-degree-annotated edge join, so without this its whole upstream
    # lineage evaluated twice; pathological when the edges derive from an
    # expensive projection, e.g. the computed synthetic-corpus
    # co-occurrence graph of q198: measured 2.98 s → 2.05 s at sf0.1,
    # neutral for cheap checkpointed-upstream callers like q107), the
    # degree frame, the node count (a single-row frame, broadcast into
    # each round — never a driver collect), and the annotated edges
    e = e.localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(
        F.sum(F.col("w").cast(_RANK_DEC)).cast("double").alias("out_w")
    )
    if symmetric:
        # src key set == node set; no separate node frame needed —
        # checkpoint deg (it now feeds nodes, n_total, AND ed). LAZY:
        # the whole setup then fuses into the single loop job instead of
        # three blocking barrier jobs (measured ~20% of q107 at sf0.1);
        # the checkpoint still caches on first evaluation and truncates
        # lineage for every later reference.
        deg = deg.localCheckpoint(eager=False)
        nodes = deg.select(F.col("src").alias("node"))
        n_total = nodes.agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).localCheckpoint(eager=False)
        ed = e.join(deg, "src").localCheckpoint(eager=False)
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_total = nodes.agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).localCheckpoint(eager=True)
        ed = e.join(deg, "src").localCheckpoint(eager=True)
    teleport = (1.0 - damping) / F.col("n").cast("double")
    # initial ranks derive from the checkpointed frames by one broadcast
    # crossJoin — one plan step, nothing worth a barrier
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("rank")
    )
    for i in range(iterations):
        joined = ed.join(ranks.withColumnRenamed("node", "src"), "src")
        contrib = F.col("rank") * F.col("w") / F.col("out_w")
        if quantize is not None:
            q = float(quantize)
            # Quantized contributions are summed as INT64 when the scale
            # cannot overflow (r15): ranks sum to <= 1 invariantly
            # (teleport + damping·mass with mass <= Σranks), so every
            # per-node sum of floor(contrib·q) is bounded by q — for
            # q <= 2^61 the long sum is exact and bit-identical to the
            # DECIMAL(38,0) sum (both are the same integer; same double
            # after the division) while shuffling 8-byte values instead
            # of 16-byte decimals and aggregating without decimal
            # overhead (measured 3.77 -> 3.35 s on the 6-round q107 loop
            # at sf0.1). Larger scales keep the decimal path. HITS keeps
            # decimal unconditionally — its first half-step sums
            # UN-normalized scores, where per-node totals can exceed q.
            summand = (
                F.col("__cq")
                if q <= float(1 << 61)
                else F.col("__cq").cast("decimal(38,0)")
            )
            contribs = (
                joined.select(
                    F.col("dst").alias("node"),
                    F.floor(contrib * F.lit(q)).alias("__cq"),
                )
                .groupBy("node")
                .agg((F.sum(summand).cast("double") / F.lit(q)).alias("__mass"))
            )
        else:
            contribs = (
                joined.select(F.col("dst").alias("node"), contrib.alias("__c"))
                .groupBy("node")
                .agg(
                    F.sum(F.col("__c").cast(_RANK_DEC)).cast("double").alias("__mass")
                )
            )
        if symmetric:
            # every node has an inbound edge (its own reverse), so the
            # aggregation output already covers the full node set
            ranks = contribs.crossJoin(F.broadcast(n_total)).select(
                "node",
                (teleport + F.lit(damping) * F.col("__mass")).alias("rank"),
            )
        else:
            ranks = (
                nodes.join(contribs, "node", "left")
                .crossJoin(F.broadcast(n_total))
                .select(
                    "node",
                    (
                        teleport
                        + F.lit(damping) * F.coalesce(F.col("__mass"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Project a bipartite (group, item) relation onto item–item edges:
    one edge per unordered item pair sharing at least one group, with
    ``weight`` = number of shared groups. The similarity-graph builder
    behind co-purchase / co-supply / co-click graphs (reference analog:
    none — engine-side graph prep for the iterative tier).

    Scale shape: pair generation is QUADRATIC in group size, so hub
    groups (a part supplied by thousands of suppliers, a token in every
    document) must be capped — ``max_group_size`` DROPS groups larger
    than the cap before any pair is emitted, the same discipline as the
    near-dup operators' document-frequency caps (a hub group's pairs are
    the least informative and the most expensive). Pairs are generated
    JVM-side from each group's sorted item array (one Catalyst
    ``transform``/``slice`` expansion, no self-join), so the whole
    projection is TWO exchanges: group-keyed collect, pair-keyed count.

    Output: ``(a, b, weight)`` with ``a < b`` (canonical undirected),
    distinct pairs, NULL groups/items dropped.
    """
    grouped = (
        df.where(F.col(group_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("__items"))
        .where(F.size("__items") >= 2)
    )
    if max_group_size is not None:
        grouped = grouped.where(F.size("__items") <= int(max_group_size))
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) -> "
                "transform(slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("__p")
    )
    return pairs.groupBy(
        F.col("__p.a").alias("a"), F.col("__p.b").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("weight"))


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle count + degree + local clustering coefficient
    over an undirected edge list — the local-density companion to
    :func:`pagerank`'s global importance.

    Algorithm: DEGREE-ORDERED orientation (each undirected edge points
    from the endpoint with the smaller ``(degree, id)`` to the larger),
    then wedges are built only between a node's ORIENTED out-neighbors
    and closed against the oriented edge set — the classic
    MapReduce/dataflow triangle scheme. Orientation bounds every node's
    out-degree by O(sqrt(m)) regardless of how skewed the real degree
    distribution is, so the wedge stage never explodes on hub nodes —
    the property that makes this survive a power-law graph at 100 TB
    (plain neighbor-pairing is quadratic in the hub's degree). Each
    triangle is found exactly once, at its lowest-(degree, id) corner.

    ``assume_canonical=True`` skips the canonicalization shuffle when
    the producer (e.g. :func:`cooccurrence_edges`) already guarantees
    distinct ``src < dst`` rows with no self-loops.

    Output: ``(node, degree, triangles, clustering_coeff)`` for every
    node with at least one edge; ``clustering_coeff`` is the one IEEE
    division ``2·triangles / (degree·(degree−1))`` of exact int64s
    (0.0 for degree-1 nodes), bit-identical across engines.
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if not assume_canonical:
        e = (
            e.where(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
        )
    # The edge list and the two derived frames below are each referenced by
    # SEVERAL join branches; Catalyst has no cross-branch common-subexpression
    # reuse, so without eager materialization every branch would re-evaluate
    # the whole upstream pipeline (the q77 lesson — measured 34 redundant
    # scans on the co-supply graph). localCheckpoint also truncates lineage.
    e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .localCheckpoint(eager=True)
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("degree", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("degree").alias("dv")),
            "v",
        )
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=True)
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.a") == F.col("o2.a"))
        & (
            F.struct(F.col("o1.db"), F.col("o1.b"))
            < F.struct(F.col("o2.db"), F.col("o2.b"))
        ),
    ).select(
        F.col("o1.a").alias("c0"),
        F.col("o1.b").alias("c1"),
        F.col("o2.b").alias("c2"),
    )
    closing = oriented.select(
        F.col("a").alias("c1"), F.col("b").alias("c2")
    )
    tri_nodes = (
        wedges.join(closing, ["c1", "c2"])
        .select(F.explode(F.array("c0", "c1", "c2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return deg.join(tri_nodes, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias("triangles"),
        F.when(F.col("degree") >= 2, (
            (F.lit(2) * F.coalesce(F.col("triangles"), F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double")
        )).otherwise(F.lit(0.0)).alias("clustering_coeff"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
    checkpoint_every: int = 3,
    assume_canonical: bool = False,
) -> DataFrame:
    """Deterministic synchronous label propagation over an undirected
    edge list — the cheap community-detection pass (near-linear per
    round) next to :func:`pagerank`'s importance and
    :func:`triangle_stats`'s density.

    Every node starts labeled with its own id; each round it adopts the
    most frequent label among its neighbors, ties broken by SMALLEST
    label — the classic LPA update made fully deterministic (no random
    tie-breaks, no asynchronous order dependence), so the result is
    bit-stable across partitionings and, with fixed ``iterations``, even
    SQL-expressible by unrolling (see q115's oracle).

    Dataflow per round: adjacency ⋈ labels (label-keyed shuffle) →
    (node, label) count → per-node argmin of ``(−count, label)`` — one
    struct-min aggregate, no window. Lineage is truncated every
    ``checkpoint_every`` rounds (the :func:`pagerank` loop skeleton);
    intermediate rounds stay lazy so short runs execute as ONE fused job.

    Output: ``(node, label)`` — nodes sharing a label are one community.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if not assume_canonical:
        e = (
            e.where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )
    adj = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _i in range(iterations):
        nbr = adj.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("nc"), F.col("label").alias("l"))
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("label"))
        )
        if (_i + 1) % checkpoint_every == 0 and (_i + 1) < iterations:
            labels = labels.localCheckpoint(eager=False)
    return labels


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    source_col: str = "node",
    max_hops: int = 4,
    undirected: bool = True,
    early_exit: bool = True,
) -> DataFrame:
    """Multi-source breadth-first hop distances over an edge list —
    "how far is every entity from a seed set", the reachability /
    influence-radius primitive (blast-radius of a bad data source,
    k-hop neighborhoods for graph features, seed-expansion sampling).

    Algorithm: FRONTIER BFS. Each round joins only the newly-reached
    frontier against the adjacency list and anti-joins the visited set,
    so per-round work is proportional to the frontier's edge
    neighborhood, not the whole graph — the shape that survives a
    100 TB edge list (min-distance propagation re-joins every settled
    node every round; a saturating BFS's frontier instead shrinks to
    nothing). Both shuffles are node-id-keyed. The frontier is eagerly
    localCheckpoint-ed each round (it is reused twice: the visited
    union and the next join) and the visited set stays a lazy union of
    checkpointed rounds, so lineage stays flat.

    ``early_exit`` stops as soon as a round reaches no new node (one
    cheap ``take(1)`` on the already-materialized frontier); the result
    is identical to running all ``max_hops`` rounds, so certification
    against a fixed-unroll oracle is unaffected.

    Distances are INTEGERS — results are trivially bit-identical across
    engines and partitionings (no float arithmetic anywhere), which is
    why q126 runs under full hash certification against an unrolled
    min-propagation DuckDB oracle (equal semantics, different physical
    shape — the oracle is the spec, not the plan).

    Output: ``(node, hops)`` for every node within ``max_hops`` of any
    source (sources themselves at 0). Unreached nodes are absent.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if undirected:
        e = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = e.localCheckpoint(eager=False)
    visited = (
        sources.select(F.col(source_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("long").alias("hops"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        reached = (
            adj.join(frontier.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = (
            reached.join(visited, "node", "left_anti")
            .select("node", F.lit(h).cast("long").alias("hops"))
            .localCheckpoint(eager=True)
        )
        if early_exit and not new.take(1):
            break
        visited = visited.unionAll(new)
        frontier = new.select("node")
    return visited


def link_prediction_jaccard(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int | None = None,
    assume_canonical: bool = False,
) -> DataFrame:
    """Neighbor-Jaccard link prediction over an undirected edge list:
    score every NON-adjacent node pair that shares at least one
    neighbor by ``|N(a)∩N(b)| / |N(a)∪N(b)|`` — the classic
    common-neighbors recommender ("suppliers that co-supply with the
    same peers but never directly", "users two hops apart").

    Shape: the wedge stage is :func:`cooccurrence_edges` over the
    adjacency list viewed as a (center, neighbor) bipartite relation —
    JVM-side per-center pair expansion, TWO exchanges, and hub wedge
    centers droppable via ``max_center_degree`` BEFORE any pair exists
    (a hub's wedges are quadratic in its degree and the least
    informative — the same cap discipline as the near-dup band caps).
    Existing edges leave by ONE anti-join on the canonical pair key;
    degrees join back on node id. With a cap set, ``common_neighbors``
    counts only shared neighbors of capped degree — stated semantics,
    not an approximation of the uncapped count (mirror the cap in any
    oracle).

    Exactness: counts are int64; the Jaccard is one IEEE division of
    exact integers — bit-identical across engines, no quantization.

    Returns ``(a, b, common_neighbors, degree_a, degree_b, jaccard)``
    with ``a < b``.
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if not assume_canonical:
        e = (
            e.where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )
    e = e.localCheckpoint(eager=False)
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    wedges = cooccurrence_edges(
        adj.select(F.col("u").alias("w"), F.col("v").alias("x")),
        "w",
        "x",
        max_group_size=max_center_degree,
    ).select("a", "b", F.col("weight").cast("long").alias("common_neighbors"))
    cand = wedges.join(e, (wedges.a == e.u) & (wedges.b == e.v), "left_anti")
    return (
        cand.join(
            deg.select(F.col("node").alias("a"), F.col("degree").alias("degree_a")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("degree").alias("degree_b")),
            "b",
        )
        .select(
            "a",
            "b",
            "common_neighbors",
            "degree_a",
            "degree_b",
            (
                F.col("common_neighbors")
                / (F.col("degree_a") + F.col("degree_b") - F.col("common_neighbors"))
            ).alias("jaccard"),
        )
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    quantize: float = 1e15,
    checkpoint_every: int = 3,
    assume_distinct: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """HITS (hubs & authorities) over a directed edge list — the mutual-
    reinforcement companion to :func:`pagerank`: a good hub points at
    good authorities, a good authority is pointed at by good hubs. On a
    bipartite relation (supplier→part, user→item, page→cited-doc) the
    two sides get separately meaningful scores where a single PageRank
    would mix them.

    Semantics: classic Kleinberg updates with L1 normalization each
    half-step — ``h(s) = Σ_{s→p} a(p)`` then ``h ← h/Σh``, and
    symmetrically for authorities. Nodes with no outbound edges get no
    hub score; no inbound, no authority score (they contribute nothing
    and would be exact zeros).

    Determinism & cross-engine exactness: every sum — per-node AND the
    global normalizer — is the pagerank ``quantize`` rule (floor to
    integer micro-units, summed in DECIMAL(38,0), one IEEE division
    back): order-independent within an engine, bit-identical across
    engines, which is what lets the fixed point run under full hash
    certification against an unrolled SQL oracle (q140). The
    normalizer is carried as a broadcast single-row frame — never a
    driver collect.

    100 TB shape: per half-step ONE node-keyed equi-join + ONE
    node-keyed aggregation + one tiny global aggregate — the same
    exchange pattern as pagerank, alternating between the src and dst
    key; lineage is truncated lazily every ``checkpoint_every``
    half-steps (the LPA lesson — no eager barriers inside the loop).

    Returns ``(hubs, authorities)`` as ``(node, score)`` frames.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    q = float(quantize)
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not assume_distinct:
        e = e.dropDuplicates(["src", "dst"])
    e = e.localCheckpoint(eager=False)

    def _qsum(col: str):
        return (
            F.sum(F.floor(F.col(col) * F.lit(q)).cast("decimal(38,0)")).cast(
                "double"
            )
            / F.lit(q)
        )

    auth = (
        e.select(F.col("dst").alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("score"))
    )
    hubs = None
    steps = 0
    for _ in range(iterations):
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(_qsum("score").alias("raw"))
        )
        h_tot = h_raw.agg(_qsum("raw").alias("tot"))
        hubs = h_raw.crossJoin(F.broadcast(h_tot)).select(
            F.col("src").alias("node"),
            (F.col("raw") / F.col("tot")).alias("score"),
        )
        steps += 1
        if steps % checkpoint_every == 0:
            hubs = hubs.localCheckpoint(eager=False)
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(_qsum("score").alias("raw"))
        )
        a_tot = a_raw.agg(_qsum("raw").alias("tot"))
        auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
            F.col("dst").alias("node"),
            (F.col("raw") / F.col("tot")).alias("score"),
        )
        steps += 1
        if steps % checkpoint_every == 0:
            auth = auth.localCheckpoint(eager=False)
    return hubs, auth
