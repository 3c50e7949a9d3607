"""PageRank contract tests: numpy power-iteration differential (the
oracle for the iterative tier — same dangling-mass-dropped semantics),
determinism, and structural invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, schema="src string, dst string")


def _numpy_pagerank(pairs, iterations, damping=0.85):
    """Reference power iteration with the SAME semantics as the operator:
    distinct edges, uniform init, dangling mass dropped."""
    pairs = sorted(set(pairs))
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in pairs:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        mass = np.zeros(n)
        for s, d in pairs:
            mass[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        r = (1 - damping) / n + damping * mass
    return dict(zip(nodes, r))


PAIRS = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
    ("d", "a"), ("c", "d"), ("e", "a"),  # e: no inbound; sink-free core
]


def test_matches_numpy_power_iteration(spark):
    got = {
        r.node: r.rank
        for r in pagerank(_edges(spark, PAIRS), iterations=8).collect()
    }
    want = _numpy_pagerank(PAIRS, iterations=8)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node


def test_dangling_mass_is_dropped_not_crashed(spark):
    # "z" has no outbound edge: its mass must drain, ranks sum < 1
    pairs = [("a", "z"), ("a", "b"), ("b", "a")]
    rows = pagerank(_edges(spark, pairs), iterations=5).collect()
    total = sum(r.rank for r in rows)
    want = _numpy_pagerank(pairs, iterations=5)
    assert total < 1.0
    for r in rows:
        assert r.rank == pytest.approx(want[r.node], abs=1e-9)


def test_symmetric_graph_conserves_mass(spark):
    pairs = PAIRS + [(d, s) for s, d in PAIRS]
    rows = pagerank(_edges(spark, pairs), iterations=6).collect()
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-12)


def test_multi_edges_collapse(spark):
    once = pagerank(_edges(spark, PAIRS), iterations=4).collect()
    dup = pagerank(_edges(spark, PAIRS + PAIRS), iterations=4).collect()
    assert sorted((r.node, r.rank) for r in once) == sorted(
        (r.node, r.rank) for r in dup
    )


def test_deterministic_across_runs_and_partitionings(spark):
    e = _edges(spark, PAIRS)
    a = sorted((r.node, r.rank) for r in pagerank(e, iterations=6).collect())
    b = sorted(
        (r.node, r.rank)
        for r in pagerank(e.repartition(7, "dst"), iterations=6).collect()
    )
    assert a == b  # bit-identical, incl. float bits (decimal mass sums)


def test_registry_query_runs_and_is_ranked(spark, sf_dir):
    from reactive_kinesis_spark.queries import load_all

    df = load_all()["q107_pagerank"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 100
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank > 0 for r in rows)


def test_iterations_validated(spark):
    with pytest.raises(ValueError, match="iterations"):
        pagerank(_edges(spark, PAIRS), iterations=0)


def _numpy_pagerank_weighted(triples, iterations, damping=0.85):
    nodes = sorted({s for s, _, _ in triples} | {d for _, d, _ in triples})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for s, _, w in triples:
        out_w[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        mass = np.zeros(n)
        for s, d, w in triples:
            mass[idx[d]] += r[idx[s]] * w / out_w[idx[s]]
        r = (1 - damping) / n + damping * mass
    return dict(zip(nodes, r))


def test_weighted_matches_numpy(spark):
    triples = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 2.0),
        ("c", "a", 1.0), ("c", "b", 5.0),
    ]
    df = spark.createDataFrame(triples, schema="src string, dst string, w double")
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=8, weight_col="w").collect()
    }
    want = _numpy_pagerank_weighted(triples, iterations=8)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node
    # the 3:1 outbound split must actually matter: b gets more of a's mass
    assert got["b"] > got["c"]


def test_uniform_weights_equal_unweighted(spark):
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in PAIRS], schema="src string, dst string, w double"
    )
    unweighted = sorted(
        (r.node, r.rank) for r in pagerank(_edges(spark, PAIRS), iterations=5).collect()
    )
    weighted = sorted(
        (r.node, r.rank)
        for r in pagerank(df, iterations=5, weight_col="w").collect()
    )
    assert unweighted == weighted  # bit-identical incl. float bits


def test_nonpositive_weights_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 0.0), ("b", "a", -2.0), ("c", "a", 1.0)],
        schema="src string, dst string, w double",
    )
    got = {r.node: r.rank for r in pagerank(df, iterations=4, weight_col="w").collect()}
    # only a->b and c->a survive; b is dangling, c gets teleport only
    want = _numpy_pagerank_weighted([("a", "b", 1.0), ("c", "a", 1.0)], iterations=4)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9)


# ---------------------------------------------------------------------------
# cooccurrence_edges / triangle_stats
# ---------------------------------------------------------------------------

from reactive_kinesis_spark.operators.graph import cooccurrence_edges, triangle_stats  # noqa: E402


def test_cooccurrence_projection_weights_and_cap(spark):
    rows = [
        # group 1: items a,b,c  -> ab ac bc
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup (1,a) must not double-count
        # group 2: items a,b    -> ab (weight 2 total for ab)
        (2, "a"), (2, "b"),
        # group 3: hub group of 4 items, dropped by cap=3
        (3, "w"), (3, "x"), (3, "y"), (3, "z"),
        # group 4: singleton — no pairs
        (4, "q"),
        # nulls dropped
        (None, "a"), (5, None),
    ]
    df = spark.createDataFrame(rows, schema="g long, item string")
    got = {
        (r.a, r.b): r.weight
        for r in cooccurrence_edges(df, "g", "item", max_group_size=3).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_canonical_order(spark):
    df = spark.createDataFrame([(1, 9), (1, 3), (1, 7)], schema="g long, item long")
    rows = cooccurrence_edges(df, "g", "item").collect()
    assert all(r.a < r.b for r in rows)
    assert len(rows) == 3


def _tri(spark, pairs):
    return spark.createDataFrame(pairs, schema="src string, dst string")


def test_triangle_stats_known_graph(spark):
    # K4 minus edge (c,d): triangles abc and abd; a,b in 2 each, c,d in 1
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    got = {
        r.node: (r.degree, r.triangles, r.clustering_coeff)
        for r in triangle_stats(_tri(spark, pairs)).collect()
    }
    assert got["a"] == (3, 2, 2 * 2 / (3 * 2))
    assert got["b"] == (3, 2, 2 * 2 / (3 * 2))
    assert got["c"] == (2, 1, 1.0)
    assert got["d"] == (2, 1, 1.0)


def test_triangle_stats_canonicalizes_input(spark):
    # duplicate edges, reversed direction, and a self-loop must not change
    # the count: one triangle abc
    pairs = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"), ("a", "b"),
    ]
    got = {r.node: r.triangles for r in triangle_stats(_tri(spark, pairs)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_stats_triangle_free(spark):
    # star graph: no triangles, hub degree 3, coefficient 0.0 everywhere
    pairs = [("h", "a"), ("h", "b"), ("h", "c")]
    got = {
        r.node: (r.degree, r.triangles, r.clustering_coeff)
        for r in triangle_stats(_tri(spark, pairs)).collect()
    }
    assert got["h"] == (3, 0, 0.0)
    assert got["a"] == (1, 0, 0.0)


def test_triangle_stats_matches_bruteforce_random(spark):
    import itertools, random
    rng = random.Random(20260814)
    nodes = list(range(24))
    edges = [
        (u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.3
    ]
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v); adj[v].add(u)
    want = {}
    for n in nodes:
        t = sum(
            1 for x, y in itertools.combinations(sorted(adj[n]), 2) if y in adj[x]
        )
        if adj[n]:
            want[n] = (len(adj[n]), t)
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r.node: (r.degree, r.triangles) for r in triangle_stats(df).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

from reactive_kinesis_spark.operators.graph import label_propagation  # noqa: E402


def _python_lpa(edges, iterations):
    """Reference implementation of the deterministic synchronous update:
    most frequent neighbor label, ties -> smallest label."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(iterations):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                lbl = labels[m]
                counts[lbl] = counts.get(lbl, 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(pairs, schema="src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, iterations=4).collect()}
    assert got == _python_lpa(pairs, 4)
    # the two triangles resolve to two distinct communities
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_lpa_matches_python_random(spark):
    import itertools, random

    rng = random.Random(7)
    nodes = list(range(30))
    pairs = [
        (u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.12
    ]
    df = spark.createDataFrame(pairs, schema="src long, dst long")
    for iters in (1, 3, 5):
        got = {
            r.node: r.label
            for r in label_propagation(df, iterations=iters).collect()
        }
        assert got == _python_lpa(pairs, iters), iters


def test_lpa_canonicalizes_and_validates(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (2, 3)], schema="src long, dst long"
    )
    got = {r.node: r.label for r in label_propagation(df, iterations=2).collect()}
    assert got == _python_lpa([(1, 2), (2, 3)], 2)
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


def test_symmetric_fast_path_bit_identical(spark):
    """``symmetric=True`` (no node frame, no per-round left join) must be
    bit-identical to the general path on any symmetric edge list —
    uniform and weighted."""
    import random

    rnd = random.Random(7)
    und = set()
    while len(und) < 400:
        u, v = rnd.randrange(80), rnd.randrange(80)
        if u != v:
            und.add((min(u, v), max(u, v)))
    sym = sorted(und | {(v, u) for u, v in und})
    e = spark.createDataFrame(sym, "src int, dst int")
    a = {r.node: r.rank for r in pagerank(e, iterations=5, assume_distinct=True).collect()}
    b = {
        r.node: r.rank
        for r in pagerank(
            e, iterations=5, assume_distinct=True, symmetric=True
        ).collect()
    }
    assert a == b
    ew = e.withColumn("w", (F.col("src") % 5 + 1).cast("double"))
    aw = {r.node: r.rank for r in pagerank(ew, iterations=5, weight_col="w").collect()}
    bw = {
        r.node: r.rank
        for r in pagerank(ew, iterations=5, weight_col="w", symmetric=True).collect()
    }
    assert aw == bw


def test_copurchase_node_labels_roundtrip(spark):
    """q107/q121 compute on numeric even/odd node ids and reapply the
    public ``c<key>``/``s<key>`` labels at output — the label expression
    must invert the namespacing exactly."""
    from reactive_kinesis_spark.queries.graph import _node_label

    df = spark.createDataFrame(
        [(2 * 123,), (2 * 456 + 1,), (0,), (2 * 10**12 + 1,)], "node long"
    )
    got = [r.lbl for r in df.select(_node_label("node").alias("lbl")).collect()]
    assert got == ["c123", "s456", "c0", "s1000000000000"]


def test_quantized_pagerank_close_to_exact_and_deterministic(spark):
    """quantize=1e15 (the cross-engine certification mode q107/q121 run
    under) may perturb each contribution by < 1e-15 — ranks must stay
    within the numpy differential's own 1e-9 bar of the plain decimal
    path, and remain bit-deterministic across partitionings."""
    import random

    rnd = random.Random(5)
    und = set()
    while len(und) < 300:
        u, v = rnd.randrange(60), rnd.randrange(60)
        if u != v:
            und.add((min(u, v), max(u, v)))
    sym = sorted(und | {(v, u) for u, v in und})
    e = spark.createDataFrame(sym, "src int, dst int")
    plain = {
        r.node: r.rank
        for r in pagerank(e, iterations=6, assume_distinct=True, symmetric=True).collect()
    }
    quant = {
        r.node: r.rank
        for r in pagerank(
            e, iterations=6, assume_distinct=True, symmetric=True, quantize=1e15
        ).collect()
    }
    assert set(plain) == set(quant)
    for n in plain:
        assert quant[n] == pytest.approx(plain[n], abs=1e-9), n
    quant2 = {
        r.node: r.rank
        for r in pagerank(
            e.repartition(16, "src"),
            iterations=6,
            assume_distinct=True,
            symmetric=True,
            quantize=1e15,
        ).collect()
    }
    assert quant == quant2  # bit-identical across partitionings


# ---------------------------------------------------------------- BFS


def test_bfs_basic_path_and_unreachable(spark):
    from reactive_kinesis_spark.operators.graph import bfs_distances

    # path 1-2-3-4-5, isolated component 8-9
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hops for r in bfs_distances(e, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond cap, 8/9 unreachable


def test_bfs_multi_source_takes_min(spark):
    from reactive_kinesis_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {r.node: r.hops for r in bfs_distances(e, seeds, max_hops=3).collect()}
    assert got == {1: 0, 4: 0, 2: 1, 3: 1}


def test_bfs_directed_respects_edge_direction(spark):
    from reactive_kinesis_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.hops
        for r in bfs_distances(e, seeds, max_hops=2, undirected=False).collect()
    }
    assert got == {1: 0, 2: 1}  # 3 only reaches 2, never reached from 1


def test_bfs_early_exit_matches_full_unroll(spark):
    from reactive_kinesis_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    full = {
        r.node: r.hops
        for r in bfs_distances(e, seeds, max_hops=10, early_exit=False).collect()
    }
    fast = {
        r.node: r.hops
        for r in bfs_distances(e, seeds, max_hops=10, early_exit=True).collect()
    }
    assert full == fast == {1: 0, 2: 1, 3: 2}


def test_bfs_validates_hops(spark):
    from reactive_kinesis_spark.operators.graph import bfs_distances

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError):
        bfs_distances(e, seeds, max_hops=-1)


# ------------------------------------------------- link prediction


def test_link_prediction_hand_checked(spark):
    from reactive_kinesis_spark.operators.graph import link_prediction_jaccard

    # square 1-2-3-4-1: each diagonal pair shares 2 neighbors, deg 2 each
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    got = {(r.a, r.b): r for r in link_prediction_jaccard(e).collect()}
    assert set(got) == {(1, 3), (2, 4)}  # existing edges excluded
    r = got[(1, 3)]
    assert r.common_neighbors == 2
    assert r.degree_a == r.degree_b == 2
    assert r.jaccard == 2 / (2 + 2 - 2)


def test_link_prediction_excludes_adjacent_and_caps_centers(spark):
    from reactive_kinesis_spark.operators.graph import link_prediction_jaccard

    # star center 0 with leaves 1..5, plus edge 1-2.
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "src long, dst long"
    )
    got = {(r.a, r.b): r for r in link_prediction_jaccard(e).collect()}
    # all leaf pairs except the adjacent (1,2) predicted via center 0
    assert (1, 2) not in got
    assert (3, 4) in got and got[(3, 4)].common_neighbors == 1
    # capping below the hub degree (5) kills every wedge through 0:
    # only center 1 and 2 (degree 2) survive; their shared pair (0, 2)/(0, 1)
    # are existing edges -> no predictions at all
    capped = link_prediction_jaccard(e, max_center_degree=2).collect()
    assert capped == []


def test_link_prediction_canonicalizes_messy_input(spark):
    from reactive_kinesis_spark.operators.graph import link_prediction_jaccard

    messy = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (3, 3)], "src long, dst long"
    )
    clean = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    a = sorted(map(tuple, link_prediction_jaccard(messy).collect()))
    b = sorted(map(tuple, link_prediction_jaccard(clean).collect()))
    assert a == b == [(1, 3, 1, 1, 1, 1.0)]


# ---------------------------------------------------------------- HITS


def _numpy_hits(pairs, iterations):
    """Reference HITS with the operator's exact semantics: distinct
    edges, authorities init 1.0, L1 normalization after each half-step,
    hub scores only for src nodes / authority scores only for dst
    nodes. No quantization — the operator's 1e15 floor perturbs scores
    by < 1e-12, inside the differential tolerance."""
    pairs = sorted(set(pairs))
    srcs = sorted({s for s, _ in pairs})
    dsts = sorted({d for _, d in pairs})
    a = {d: 1.0 for d in dsts}
    h = None
    for _ in range(iterations):
        h = {s: sum(a[d] for s2, d in pairs if s2 == s) for s in srcs}
        tot = sum(h.values())
        h = {s: v / tot for s, v in h.items()}
        a = {d: sum(h[s] for s, d2 in pairs if d2 == d) for d in dsts}
        tot = sum(a.values())
        a = {d: v / tot for d, v in a.items()}
    return h, a


HITS_PAIRS = [
    ("s1", "p1"), ("s1", "p2"), ("s1", "p3"),
    ("s2", "p2"), ("s2", "p3"),
    ("s3", "p3"), ("s3", "p4"),
    ("s4", "p1"),
]


def test_hits_matches_numpy(spark):
    from reactive_kinesis_spark.operators.graph import hits

    hubs, auths = hits(_edges(spark, HITS_PAIRS), iterations=3)
    got_h = {r.node: r.score for r in hubs.collect()}
    got_a = {r.node: r.score for r in auths.collect()}
    want_h, want_a = _numpy_hits(HITS_PAIRS, iterations=3)
    assert set(got_h) == set(want_h) and set(got_a) == set(want_a)
    for k in want_h:
        assert got_h[k] == pytest.approx(want_h[k], abs=1e-9), k
    for k in want_a:
        assert got_a[k] == pytest.approx(want_a[k], abs=1e-9), k
    # L1 normalized (up to quantization): each side sums to ~1
    assert sum(got_h.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(got_a.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_multi_edges_collapse_and_validation(spark):
    from reactive_kinesis_spark.operators.graph import hits

    dup = HITS_PAIRS + [("s1", "p1"), ("s1", "p1")]
    hubs, _ = hits(_edges(spark, dup), iterations=2)
    hubs_clean, _ = hits(_edges(spark, HITS_PAIRS), iterations=2)
    got = {r.node: r.score for r in hubs.collect()}
    want = {r.node: r.score for r in hubs_clean.collect()}
    assert got == want
    with pytest.raises(ValueError):
        hits(_edges(spark, HITS_PAIRS), iterations=0)
