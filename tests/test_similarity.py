"""Similarity-operator invariants beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactive_kinesis_spark.operators import similarity as S
from reactive_kinesis_spark.tables import load_table


def test_numpy_and_sql_strategies_bit_identical(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    cols = ["query_id", "neighbor_id", "cosine_sim", "rn"]
    a = sorted(S.cosine_topk(emb, queries, k=3, strategy="numpy").select(*cols).collect())
    b = sorted(S.cosine_topk(emb, queries, k=3, strategy="sql").select(*cols).collect())
    assert a == b  # includes float bit-equality


def test_ann_recall_against_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id").collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_lsh_topk(emb, queries, k=5).select("query_id", "neighbor_id").collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall too low: {recall:.2f}"


def test_embedding_neardup_pairs_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(emb, threshold=0.8)
    rows = pairs.collect()
    for r in rows:
        assert r.id_1 < r.id_2
        assert r.cosine_sim >= 0.8


def test_ivf_recall_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id").collect()
    }
    run1 = S.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6)
    got1 = sorted((r.query_id, r.neighbor_id, r.cosine_sim) for r in run1.collect())
    approx = {(q, n) for q, n, _ in got1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"
    got2 = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim)
        for r in S.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6).collect()
    )
    assert got1 == got2  # deterministic incl. float bits


def test_recall_artifact_pins_clustered_ann_quality(spark):
    """RECALL.json is the committed evidence for the ANN 100 TB design
    claim (similarity.py: clustered-data settings ⇒ recall ≥ 0.9+). The
    clustered measurements must hold the ≥ 0.9 bar, and the LSH number
    must REPRODUCE from the deterministic generator — a stale artifact
    fails here."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "RECALL.json")
    with open(path) as fh:
        art = json.load(fh)
    assert art["lsh_clustered"]["recall"] >= 0.9
    assert art["ivf_clustered"]["recall"] >= 0.9

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    import recall_report as R

    cfg = R.CLUSTERED
    clustered = R.clustered_frame(spark)
    cq = clustered.where(F.col("vec_id") < cfg["n_queries"])
    exact = S.cosine_topk(clustered, cq, k=cfg["k"])
    approx = S.ann_lsh_topk(
        clustered, cq, k=cfg["k"], n_planes=16, bands=4, dim=cfg["dim"]
    )
    assert R.recall_at_k(exact, approx) == art["lsh_clustered"]["recall"]
