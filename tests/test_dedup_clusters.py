"""Connected-components cluster resolution over near-dup pair edges.

The pair emitters (Jaccard / MinHash / SimHash) stop at edges; "keep one
copy per duplicate group" needs the transitive closure. These tests pin
the large-star/small-star implementation (operators.dedup
.connected_components): exact components on hand-built graphs, O(log n)
convergence on a pathological chain, and cluster invariants on real
pair-emitter output.
"""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.operators import dedup as D


def _components(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    rows = D.connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_cc_exact_on_disjoint_shapes(spark):
    # triangle {1,2,3} + path {10,11,12,13} + pair {20,21} + cycle {30..33}
    edges = [
        (1, 2), (2, 3), (3, 1),
        (10, 11), (11, 12), (12, 13),
        (21, 20),
        (30, 31), (31, 32), (32, 33), (33, 30),
    ]
    got = _components(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_cc_duplicate_and_reversed_edges_are_canonicalized(spark):
    got = _components(spark, [(2, 1), (1, 2), (2, 3), (3, 3)])
    # self-loop (3,3) must not crash or create a phantom component
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_long_chain_converges_in_logarithmic_rounds(spark):
    # a 256-node path is the worst case for label propagation (O(n) rounds);
    # large-star/small-star must resolve it in O(log n) alternating rounds —
    # pin the ACTUAL round count via stats so a regression to linear
    # convergence (≈128 shuffles here, ruinous at 100 TB) fails loudly
    edges = [(i, i + 1) for i in range(256)]
    stats: dict = {}
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    # local_threshold=0 forces the distributed loop — the round pin is
    # about ITS convergence, not the adaptive local fast path
    rows = D.connected_components(
        df, max_iterations=20, stats=stats, local_threshold=0
    ).collect()
    got = {r.node: r.component for r in rows}
    assert len(got) == 257
    assert set(got.values()) == {0}
    assert stats["local"] is False
    assert 1 <= stats["rounds"] <= 12, f"expected O(log n) rounds, got {stats['rounds']}"


def test_cc_local_fast_path_matches_distributed(spark):
    """Below local_threshold the driver-side union-find must produce the
    identical (node, component) mapping the distributed loop produces —
    same worst-case chain graph, both paths."""
    edges = [(i, i + 1) for i in range(64)] + [(500, 400), (400, 300)]
    df = spark.createDataFrame(edges, ["id_1", "id_2"])
    stats: dict = {}
    local = {
        (r.node, r.component)
        for r in D.connected_components(df, stats=stats).collect()
    }
    assert stats["local"] is True and stats["rounds"] == 0
    dist = {
        (r.node, r.component)
        for r in D.connected_components(df, local_threshold=0).collect()
    }
    assert local == dist


def test_cc_empty_edge_set(spark):
    df = spark.createDataFrame([], "id_1 long, id_2 long")
    assert D.connected_components(df).count() == 0


def test_cc_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(
            spark.createDataFrame([(i, i + 1) for i in range(64)], ["id_1", "id_2"]),
            max_iterations=1,
            local_threshold=0,
        )


def test_cc_matches_union_find_on_random_graphs(spark):
    """Differential check: large-star/small-star must agree with a plain
    union-find on seeded random graphs (mixed density, isolated pairs,
    multi-edges, self-loops)."""
    import random

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = rng.randint(10, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(5, 80))
        ]
        parent = list(range(n + 1))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            if a != b:
                touched.update((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in touched}
        # differential across BOTH execution paths
        got_local = _components(spark, edges)
        got_dist = _components(spark, edges, local_threshold=0)
        assert got_local == expected, f"seed {seed}: {got_local} != {expected}"
        assert got_dist == expected, f"seed {seed}: {got_dist} != {expected}"


def test_dedup_clusters_invariants_on_minhash_pairs(spark, sf_dir):
    """End-to-end: MinHash LSH pairs -> clusters. Every clustered doc
    appears exactly once, the representative is the cluster minimum and a
    member of its own cluster, and sizes sum to the node count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=32, bands=8)
    clusters = D.dedup_clusters(pairs).collect()
    assert clusters, "planted duplicates must produce at least one cluster"
    by_doc = {}
    for r in clusters:
        assert r["doc_id"] not in by_doc, "doc assigned to two clusters"
        by_doc[r["doc_id"]] = r
        assert r["rep_id"] <= r["doc_id"]
    reps = {r["rep_id"] for r in clusters}
    assert reps <= set(by_doc), "every representative is itself clustered"
    for rep in reps:
        members = [r for r in clusters if r["rep_id"] == rep]
        assert by_doc[rep]["rep_id"] == rep
        assert all(m["cluster_size"] == len(members) for m in members)
        assert min(m["doc_id"] for m in members) == rep
    # edges only connect nodes inside one cluster (pairs respect clusters)
    assign = {d: r["rep_id"] for d, r in by_doc.items()}
    for p in pairs.select("id_1", "id_2").collect():
        assert assign[p["id_1"]] == assign[p["id_2"]]


def test_cache_registry_exposes_persisted_frames(spark, sf_dir):
    """Long-lived sessions can unpersist deterministically: passing
    ``cache_registry=[]`` hands back every frame the operator persisted
    (the ADVICE-flagged leak in duplicate_span_stats and friends)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    registry = []
    out = D.duplicate_span_stats(docs, cache_registry=registry)
    assert out.count() == 50
    assert len(registry) == 1 and registry[0].is_cached
    for frame in registry:
        frame.unpersist()
    assert not registry[0].is_cached
    # cache_shingles=False registers nothing
    registry2 = []
    D.duplicate_span_stats(docs, cache_shingles=False, cache_registry=registry2).count()
    assert registry2 == []
