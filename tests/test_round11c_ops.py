"""Hand-computed micro-input tests for the session's composition
operators: the k-means elbow sweep (q178), BLEU-style pair n-gram
precision (q179), and MMR diversified top-k (q180)."""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.operators.dedup import pair_ngram_precision
from reactive_kinesis_spark.operators.similarity import mmr_topk
from reactive_kinesis_spark.queries import load_all


# ------------------------------------------------------------ elbow (q178)


def test_kmeans_elbow_invariants_on_testdata(spark, sf_dir):
    rows = load_all()["q178_kmeans_elbow"].fn(spark, sf_dir).collect()
    by_k = {r["k"]: r for r in rows}
    assert sorted(by_k) == [2, 4, 8]
    n_vecs = {r["n_vecs"] for r in rows}
    assert len(n_vecs) == 1  # every fit sees the same corpus
    for k, r in by_k.items():
        assert 1 <= r["n_clusters"] <= k
        assert r["inertia"] > 0.0
    # more clusters must explain the planted-cluster corpus much better
    assert by_k[8]["inertia"] < by_k[2]["inertia"]


# --------------------------------------------- pair n-gram precision (q179)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pair_ngram_precision_hand_computed(spark):
    docs = _docs(spark, [(1, "x y x"), (2, "x z"), (3, "x y x")])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_1 long, id_2 long")
    rows = {(r["id_1"], r["id_2"]): r for r in pair_ngram_precision(docs, pairs).collect()}
    r12 = rows[(1, 2)]
    # candidate=1 {x:2,y:1}, reference=2 {x:1,z:1}: clip=min(2,1)+min(1,0)=1 of 3
    assert r12["clip_1"] == 1 and r12["tot_1"] == 3 and r12["prec_1"] == 1 / 3
    # bigrams: cand {"x y","y x"}, ref {"x z"}: no overlap
    assert r12["clip_2"] == 0 and r12["tot_2"] == 2 and r12["prec_2"] == 0.0
    # identical docs: perfect precision at both orders
    r13 = rows[(1, 3)]
    assert r13["prec_1"] == 1.0 and r13["prec_2"] == 1.0


def test_pair_ngram_precision_clipping_caps_repeats(spark):
    # candidate repeats "x" 4 times; reference has it twice -> clip at 2
    docs = _docs(spark, [(1, "x x x x"), (2, "x x y")])
    pairs = spark.createDataFrame([(1, 2)], "id_1 long, id_2 long")
    r = pair_ngram_precision(docs, pairs).collect()[0]
    assert r["clip_1"] == 2 and r["tot_1"] == 4 and r["prec_1"] == 0.5
    # bigrams: cand {"x x":3}, ref {"x x":1} -> clip 1 of 3
    assert r["clip_2"] == 1 and r["tot_2"] == 3


# ------------------------------------------------------------- MMR (q180)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_mmr_prefers_diversity_over_clone(spark):
    corpus = _vecs(
        spark,
        [
            (1, (1.0, 0.1)),   # near the query
            (2, (1.0, 0.12)),  # clone of 1
            (3, (0.6, -0.8)),  # distinct direction, lower relevance
        ],
    )
    queries = _vecs(spark, [(100, (1.0, 0.0))])
    out = {r["step"]: r for r in mmr_topk(corpus, queries, k=2, pool=3, lam=0.5).collect()}
    assert out[1]["neighbor_id"] == 1  # pure relevance argmax
    assert out[1]["redundancy"] == 0.0
    # step 2: the clone is crushed by its similarity to the selected set
    assert out[2]["neighbor_id"] == 3
    assert out[2]["redundancy"] < out[1]["relevance"]
    # lam=1 degenerates to plain top-k order: clone wins instead
    pure = {r["step"]: r for r in mmr_topk(corpus, queries, k=2, pool=3, lam=1.0).collect()}
    assert pure[2]["neighbor_id"] == 2


def test_mmr_validates_parameters(spark):
    v = _vecs(spark, [(1, (1.0, 0.0)), (2, (0.0, 1.0))])
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(v, v, lam=0.0)
    with pytest.raises(ValueError, match="k <= pool"):
        mmr_topk(v, v, k=5, pool=3)


def test_mmr_emits_k_steps_per_query(spark):
    corpus = _vecs(spark, [(i, (1.0, float(i) / 10)) for i in range(1, 7)])
    queries = _vecs(spark, [(100, (1.0, 0.0)), (200, (0.5, 0.5))])
    out = mmr_topk(corpus, queries, k=3, pool=5, lam=0.7).collect()
    assert len(out) == 6
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # selections are distinct within each query
    assert all(len(s) == 3 for s in per_q.values())


# ---------------------------------------------- power-iteration PC (q183)


def test_power_iteration_pc_matches_numpy_mirror(spark, sf_dir):
    """Differential against an independent implementation: a numpy
    float64 mirror of the SAME fixed-k quantized program (the honest
    apples-to-apples — on this deliberately flat-spectrum corpus,
    lambda2/lambda1 ≈ 0.93, so NO 6-round power iteration lands on the
    true eigenvector; convergence-when-a-gap-exists is pinned by the
    planted-axis test below). Also checks the reported ev_share equals
    the mirror's Rayleigh share."""
    import numpy as np

    from reactive_kinesis_spark.operators.similarity import power_iteration_pc
    from reactive_kinesis_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = power_iteration_pc(emb, "embedding", "vec_id", iterations=6).collect()
    got = np.array([r["component"] for r in sorted(rows, key=lambda r: r["pos"])])
    share = rows[0]["ev_share"]

    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    mean = np.array(
        # the engine's means are decimal-exact; float64 mean of 2000 rows
        # agrees far beyond the micro-unit budget below
        X.mean(axis=0)
    )
    P = X - mean
    # the engine's covariance: per-row centered products floor-quantized
    # to int64 micro-units, then an exact integer sum
    C = np.floor((P[:, :, None] * P[:, None, :]) * 1e6).sum(axis=0)
    Cq = np.floor(C * 2**20 / np.abs(C).max())
    v = np.full(C.shape[0], 2**20, dtype=np.float64)
    for _ in range(6):
        w = Cq @ v
        v = np.floor(w * 2**20 / max(np.abs(w).max(), 1.0))
    u = v / np.linalg.norm(v)
    assert abs(float(np.dot(got, u))) > 1 - 1e-9
    want_share = float(v @ Cq @ v) / (float(v @ v) * float(np.trace(Cq)))
    # numpy's float64 covariance can flip a few Cq entries by +-1 vs the
    # engine's decimal-exact moments; the share agrees to the same budget
    assert abs(share - want_share) < 1e-6


def test_power_iteration_pc_validates_iterations(spark, sf_dir):
    from reactive_kinesis_spark.operators.similarity import power_iteration_pc
    from reactive_kinesis_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="iterations"):
        power_iteration_pc(emb, iterations=0)


def test_power_iteration_pc_on_planted_dominant_axis(spark):
    """Hand-built geometry: variance concentrated on axis 0 -> the
    component must be ~e_0 and the share ~1."""
    import numpy as np

    from reactive_kinesis_spark.operators.similarity import power_iteration_pc

    rng = np.random.default_rng(7)
    X = np.zeros((200, 4))
    X[:, 0] = rng.normal(0, 10.0, 200)   # dominant axis
    X[:, 1:] = rng.normal(0, 0.1, (200, 3))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    rows = sorted(power_iteration_pc(df, iterations=6).collect(), key=lambda r: r["pos"])
    comp = [r["component"] for r in rows]
    assert abs(comp[0]) > 0.999
    assert all(abs(c) < 0.03 for c in comp[1:])
    assert rows[0]["ev_share"] > 0.99


def test_power_iteration_pc_degenerate_constant_corpus(spark):
    """ADVICE r11: a constant-embedding corpus has an all-zero covariance;
    covariance_q20's GREATEST(maxc, 1) keeps the Q20 quantization 0/1
    (not 0/0) and power_iteration_pc reports a well-formed all-zero
    result instead of crashing on ss == 0."""
    from reactive_kinesis_spark.operators.similarity import (
        covariance_q20,
        power_iteration_pc,
    )

    vecs = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    cq = covariance_q20(vecs).collect()
    assert len(cq) == 9
    assert all(r["cq"] == 0 for r in cq)
    rows = power_iteration_pc(vecs, iterations=4).orderBy("pos").collect()
    assert [r["pos"] for r in rows] == [1, 2, 3]
    assert all(r["component"] == 0.0 and r["ev_share"] == 0.0 for r in rows)


# ---------------------------------------------------- deflation PCs (q189)


def test_deflation_pcs_matches_numpy_mirror(spark, sf_dir):
    """Differential against an independent numpy/Python mirror of the
    SAME fixed-k quantized deflation program (big-int exact where the
    engine is, float64 where the engine is): components and Q20-quantized
    shares must agree bit for bit."""
    import math

    import numpy as np

    from reactive_kinesis_spark.operators.similarity import (
        _tdiv,
        covariance_q20,
        deflation_pcs,
    )
    from reactive_kinesis_spark.tables import load_table

    Q = 1 << 20
    emb = load_table(spark, sf_dir, "embeddings")
    got = deflation_pcs(emb, "embedding", "vec_id", k=3, iterations=4).collect()

    rows = covariance_q20(emb, "embedding", "vec_id").collect()
    dims = sorted({r["p"] for r in rows})
    cqm = {(r["p"], r["q"]): r["cq"] for r in rows}
    want = []
    for j in range(1, 4):
        tr = sum(cqm.get((p, p), 0) for p in dims)
        v = {p: Q for p in dims}
        for _ in range(4):
            w = {p: sum(cqm.get((p, q), 0) * v[q] for q in dims) for p in dims}
            mw = max(max(abs(x) for x in w.values()), 1)
            v = {p: math.floor(float(w[p]) * float(Q) / float(mw)) for p in dims}
        ss = sum(x * x for x in v.values())
        num = sum(cqm[(p, q)] * v[p] * v[q] for (p, q) in cqm)
        share = float(_tdiv(num * Q, ss * tr)) / float(Q)
        want.extend(
            (j, p, float(v[p]) / math.sqrt(float(ss)), share) for p in dims
        )
        dmat = {
            (p, q): ss * ss * cqm.get((p, q), 0) - num * v[p] * v[q]
            for p in dims
            for q in dims
        }
        maxd = max(max(abs(x) for x in dmat.values()), 1)
        s = max(maxd // Q, 1)
        cqm = {pq: _tdiv(x, s) for pq, x in dmat.items()}
    got_t = sorted((r.comp, r.pos, r.component, r.ev_share_resid) for r in got)
    assert got_t == sorted(want)
    assert len(got_t) == 3 * len(dims)


def test_deflation_pcs_recovers_planted_orthogonal_axes(spark):
    """Hand-built geometry: variance 100:25:~0 on axes 0/1/rest — the
    first two components must be ~e0 and ~e1 (the deflation actually
    removes the dominant axis), and shares must rank accordingly."""
    import numpy as np

    from reactive_kinesis_spark.operators.similarity import deflation_pcs

    rng = np.random.default_rng(7)
    n = 400
    X = np.zeros((n, 5))
    X[:, 0] = rng.normal(0, 10.0, n)
    X[:, 1] = rng.normal(0, 5.0, n)
    X[:, 2:] = rng.normal(0, 0.05, (n, 3))
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    out = deflation_pcs(vecs, k=2, iterations=8).collect()
    c1 = np.array([r.component for r in sorted(out, key=lambda r: r.pos) if r.comp == 1])
    c2 = np.array([r.component for r in sorted(out, key=lambda r: r.pos) if r.comp == 2])
    assert abs(c1[0]) > 0.99
    assert abs(c2[1]) > 0.99
    assert abs(float(np.dot(c1, c2))) < 0.02
    s1 = next(r.ev_share_resid for r in out if r.comp == 1)
    s2 = next(r.ev_share_resid for r in out if r.comp == 2)
    assert s1 > 0.7        # ~100/125 of total variance
    assert s2 > 0.9        # ~all of what remains after deflating axis 0


def test_deflation_pcs_degenerate_rank_pads_zero_rows(spark):
    """k above the numerical rank: a rank-1 corpus annihilates after one
    deflation; remaining components emit well-formed zero rows."""
    from reactive_kinesis_spark.operators.similarity import deflation_pcs

    import pytest as _pytest

    vecs = spark.createDataFrame(
        [(i, [float(i), 2.0 * i, -float(i)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    out = deflation_pcs(vecs, k=3, iterations=6).collect()
    assert len(out) == 9
    comp1 = [r for r in out if r.comp == 1]
    assert any(abs(r.component) > 0.1 for r in comp1)
    for j in (2, 3):
        assert all(
            r.component == 0.0 and r.ev_share_resid == 0.0
            for r in out
            if r.comp == j
        )
    with _pytest.raises(ValueError, match="k >= 1"):
        deflation_pcs(vecs, k=0)
    with _pytest.raises(ValueError, match="iterations"):
        deflation_pcs(vecs, iterations=0)
