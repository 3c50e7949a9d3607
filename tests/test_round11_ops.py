"""Round-11 hardening: the judge/advisor asks from round 10 — the
hard_negative_topk broadcast guard, the enforced SemDeDup k ∝ N rule,
simhash width validation, the estimator-audit / retrieval-eval left-join
semantics, and the PQ fit-once/apply-many bit-equality pin."""

from __future__ import annotations

import pytest

from reactive_kinesis_spark.operators import dedup as D
from reactive_kinesis_spark.operators.similarity import (
    hard_negative_topk,
    pq_codebooks,
    pq_encode,
    retrieval_eval,
    semantic_decontaminate,
    semantic_dedup,
)


def _vecs(spark, rows, with_label=False):
    if with_label:
        return spark.createDataFrame(
            [(i, [float(x) for x in v], lab) for i, v, lab in rows],
            "vec_id long, embedding array<float>, label int",
        )
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


# ------------------------------------------------ hard_negative_topk guard


def test_hard_negative_topk_raises_on_oversized_query_block(spark):
    rows = [(i, (1.0, float(i)), i % 2) for i in range(6)]
    df = _vecs(spark, rows, with_label=True)
    with pytest.raises(ValueError, match="max_query_rows"):
        hard_negative_topk(df, df, max_query_rows=3)


def test_hard_negative_topk_within_cap_unchanged(spark):
    rows = [(i, (1.0, float(i)), i % 2) for i in range(4)]
    df = _vecs(spark, rows, with_label=True)
    out = hard_negative_topk(df, df, k=1, max_query_rows=10).collect()
    assert len(out) == 4
    assert all(r.query_label != r.neighbor_label for r in out)


# -------------------------------------------- enforced k ∝ N (SemDeDup)


def test_semdedup_default_k_derives_floor_and_matches_explicit(spark):
    rows = [(i, (float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2))) for i in range(12)]
    df = _vecs(spark, rows)
    # 12 vectors // 256 -> floor 8 clusters; k=None must equal explicit k=8
    derived = semantic_dedup(df, iterations=1, threshold=0.9).collect()
    explicit = semantic_dedup(df, k=8, iterations=1, threshold=0.9).collect()
    key = lambda r: r.cluster  # noqa: E731
    assert sorted(derived, key=key) == sorted(explicit, key=key)


def test_semdedup_target_cluster_size_scales_k(spark):
    rows = [(i, (1.0 + i, float(i), 1.0)) for i in range(40)]
    df = _vecs(spark, rows)
    # target 4 -> k = max(8, 40 // 4) = 10 clusters requested; at least
    # the derived-k path must run and produce more clusters than k=8 would
    out = semantic_dedup(df, iterations=0, threshold=2.0, target_cluster_size=4)
    assert out.count() == 10  # iterations=0 keeps all 10 seed clusters


def test_semdedup_rejects_nonpositive_target(spark):
    df = _vecs(spark, [(1, (1.0, 0.0))])
    with pytest.raises(ValueError, match="target_cluster_size"):
        semantic_dedup(df, target_cluster_size=0)


def test_decontaminate_default_k_matches_explicit_floor(spark):
    train = _vecs(spark, [(i, (float(i), 1.0)) for i in range(10)])
    evalset = _vecs(spark, [(100, (3.0, 1.0))])
    derived = semantic_decontaminate(train, evalset, iterations=1, threshold=0.5).collect()
    explicit = semantic_decontaminate(
        train, evalset, k=8, iterations=1, threshold=0.5
    ).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, explicit))


# ---------------------------------------------------- simhash validation


def test_simhash_pairs_rejects_bits_not_divisible_by_4(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible by 4"):
        D.simhash_pairs(df, bits=54)


def test_simhash_pairs_rejects_max_hamming_beyond_pigeonhole(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        D.simhash_pairs(df, max_hamming=4)


def test_simhash_rejects_odd_bits(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bits"):
        D.simhash(df, bits=55)


# ------------------------------------- estimator audit keeps 0-common pairs


def test_minhash_estimator_audit_keeps_collision_only_candidates(spark, monkeypatch):
    # two docs with fully disjoint vocabularies can only become candidates
    # via a hash collision; force that path by pinning the candidate set
    df = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")],
        "doc_id long, text string",
    )
    forced = spark.createDataFrame([(1, 2)], "id_1 long, id_2 long")
    monkeypatch.setattr(D, "_band_candidates", lambda *a, **k: forced)
    rows = D.minhash_estimator_audit(df, n=2, num_hashes=4, bands=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_1, r.id_2) == (1, 2)
    assert r.jaccard == 0.0  # zero common shingles, kept with exact 0
    assert r.abs_err == r.est_jaccard  # the maximal-error pair the audit exists for


# ------------------------------------------- retrieval_eval disjoint queries


def test_retrieval_eval_disjoint_query_set_no_over_subtract(spark):
    corpus = _vecs(
        spark,
        [(1, (1.0, 0.0), 7), (2, (0.9, 0.1), 7), (3, (0.0, 1.0), 8)],
        with_label=True,
    )
    # query id 100 is NOT a corpus row; its label 7 has 2 corpus members
    queries = _vecs(spark, [(100, (1.0, 0.05), 7)], with_label=True)
    out = retrieval_eval(corpus, queries, k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rel == 2  # no self-subtraction for a non-member query
    assert r.hits_at_k == 2 and r.recall_at_k == 1.0


def test_retrieval_eval_label_absent_from_corpus_scores_zero(spark):
    corpus = _vecs(
        spark,
        [(1, (1.0, 0.0), 7), (2, (0.0, 1.0), 7)],
        with_label=True,
    )
    queries = _vecs(spark, [(100, (1.0, 0.0), 9)], with_label=True)
    out = retrieval_eval(corpus, queries, k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_rel == 0 and r.hits_at_k == 0
    assert r.recall_at_k == 0.0 and r.mrr == 0.0 and r.ndcg == 0.0


def test_retrieval_eval_member_query_still_subtracts_self(spark):
    corpus = _vecs(
        spark,
        [(1, (1.0, 0.0), 7), (2, (0.9, 0.1), 7), (3, (0.0, 1.0), 8)],
        with_label=True,
    )
    queries = corpus.where("vec_id = 1")
    r = retrieval_eval(corpus, queries, k=2).collect()[0]
    assert r.n_rel == 1  # 2 label-7 rows minus the query itself


# --------------------------------------------- PQ fit-once == fused path


def test_pq_encode_with_explicit_codebooks_bit_equal(spark):
    rows = [(i, tuple(float((i * 7 + j * 3) % 5 - 2) for j in range(8))) for i in range(16)]
    df = _vecs(spark, rows)
    fused = pq_encode(df, dim=8, m=2, k=2, iterations=1).collect()
    books = pq_codebooks(df, dim=8, m=2, k=2, iterations=1)
    split = pq_encode(df, dim=8, m=2, k=2, iterations=1, codebooks=books).collect()
    key = lambda r: r.vec_id  # noqa: E731
    assert sorted(fused, key=key) == sorted(split, key=key)


def test_pq_encode_rejects_wrong_codebook_count(spark):
    df = _vecs(spark, [(1, (1.0, 0.0, 0.0, 0.0))])
    books = pq_codebooks(df, dim=4, m=2, k=1, iterations=0)
    with pytest.raises(ValueError, match="codebooks"):
        pq_encode(df, dim=4, m=4, k=1, iterations=0, codebooks=books)


# ------------------------------------------- integer-exact LSH family


def test_int_hyperplanes_deterministic_and_bounded():
    from reactive_kinesis_spark.operators.similarity import int_hyperplanes

    a = int_hyperplanes(8, 4)
    b = int_hyperplanes(8, 4)
    assert a == b
    assert all(-(1 << 20) <= c < (1 << 20) for row in a for c in row)
    assert len(a) == 4 and all(len(row) == 8 for row in a)


def test_int_banded_signatures_rejects_out_of_envelope_values(spark):
    from reactive_kinesis_spark.operators.similarity import _int_banded_signatures

    df = _vecs(spark, [(1, (5.0, 0.0, 0.0, 0.0))])
    sig = _int_banded_signatures(df, "vec_id", "embedding", 4, 2, 4, "id_1")
    with pytest.raises(Exception, match="integer-LSH family requires"):
        sig.collect()


def test_embedding_neardup_pairs_int_matches_quantized_bruteforce(spark):
    import math as m

    from reactive_kinesis_spark.operators.similarity import (
        LSH_INT_SCALE_BITS,
        embedding_neardup_pairs,
    )

    vecs = {
        1: (0.5, 0.1, -0.3, 0.2),
        2: (0.5, 0.1, -0.3, 0.21),   # near-dup of 1
        3: (-0.4, 0.5, 0.1, -0.2),
        4: (0.49, 0.11, -0.29, 0.2), # near-dup of 1/2
    }
    df = _vecs(spark, [(i, v) for i, v in vecs.items()])
    out = {
        (r.id_1, r.id_2): r.cosine_sim
        for r in embedding_neardup_pairs(
            df, threshold=0.99, n_planes=8, bands=4, dim=4, family="int"
        ).collect()
    }
    # python-exact expectation over the SAME quantization
    scale = float(1 << LSH_INT_SCALE_BITS)
    q = {i: [m.floor(float(np_x) * scale) for np_x in v] for i, v in vecs.items()}
    # float32 round-trip: Spark reads array<float>; mirror it
    import numpy as np

    q = {
        i: [int(m.floor(float(np.float32(x)) * scale)) for x in v]
        for i, v in vecs.items()
    }
    def cos(i, j):
        d = sum(a * b for a, b in zip(q[i], q[j]))
        return d / (m.sqrt(sum(a * a for a in q[i])) * m.sqrt(sum(b * b for b in q[j])))

    expected = {
        (i, j): cos(i, j)
        for i in vecs
        for j in vecs
        if i < j and cos(i, j) >= 0.99
    }
    # every expected high-cosine pair that shares a band must be found with
    # the exact same score; found pairs must all be expected
    for pair, sim in out.items():
        assert pair in expected and expected[pair] == sim
    assert (1, 2) in out and (1, 4) in out  # the planted near-dups collide


def test_ann_lsh_topk_int_family_shape_and_order(spark):
    from reactive_kinesis_spark.operators.similarity import ann_lsh_topk

    rows = [(i, tuple(0.1 * ((i * 3 + j) % 7 - 3) for j in range(4))) for i in range(20)]
    df = _vecs(spark, rows)
    out = ann_lsh_topk(
        df, df.where("vec_id < 3"), k=2, n_planes=8, bands=4, dim=4, family="int"
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cosine_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != qid for r in rs)
