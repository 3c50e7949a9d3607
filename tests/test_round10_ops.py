"""Round-10 operators: SemDeDup, quality-rule gate battery, token-budget
allocation. Registry-wide oracle parity for q148/q149/q150 is covered by
test_oracle_parity; these tests pin the operator-level semantics on
crafted micro-inputs where the right answer is known by hand."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reactive_kinesis_spark.operators.similarity import semantic_dedup
from reactive_kinesis_spark.operators.text import (
    quality_rule_battery,
    token_budget_allocation,
)

# ---------------------------------------------------------- semantic_dedup


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_flags_exact_duplicate_and_drops_larger_id(spark):
    # ids 1/2 seed the two clusters; 3 is an exact copy of 1, 4 is nearly
    # orthogonal noise in cluster 1's half-space, 5 joins cluster 2.
    df = _vecs(
        spark,
        [
            (1, (1.0, 0.0, 0.0)),
            (2, (0.0, 1.0, 0.0)),
            (3, (1.0, 0.0, 0.0)),
            (4, (0.8, 0.0, 0.6)),
            (5, (0.0, 0.9, 0.1)),
        ],
    )
    out = {
        r.cluster: r
        for r in semantic_dedup(
            df, k=2, iterations=1, threshold=0.995
        ).collect()
    }
    sizes = sorted(r.n_vecs for r in out.values())
    assert sizes == [2, 3]
    big = next(r for r in out.values() if r.n_vecs == 3)
    small = next(r for r in out.values() if r.n_vecs == 2)
    # only the exact-duplicate pair (1,3) crosses 0.995 — the (2,5) pair
    # sits at cos 0.9939, just below; id 3 is dropped
    assert big.n_dup_pairs == 1 and big.n_dropped == 1
    assert abs(big.dup_cos_sum - 1.0) < 1e-6
    assert small.n_dup_pairs == 0 and small.n_dropped == 0
    assert small.dup_cos_sum == 0.0


def test_semdedup_threshold_zero_flags_every_nonnegative_pair(spark):
    # all-nonnegative vectors => every within-cluster cosine >= 0, so at
    # threshold 0 each cluster flags all C(n,2) pairs and drops n-1 members
    df = _vecs(
        spark,
        [
            (1, (1.0, 0.1)),
            (2, (0.1, 1.0)),
            (3, (1.0, 0.2)),
            (4, (0.9, 0.1)),
            (5, (0.2, 1.0)),
            (6, (0.1, 0.9)),
        ],
    )
    for r in semantic_dedup(df, k=2, iterations=1, threshold=0.0).collect():
        n = r.n_vecs
        assert r.n_dup_pairs == n * (n - 1) // 2
        assert r.n_dropped == n - 1


def test_semdedup_cluster_without_dups_still_reported(spark):
    df = _vecs(spark, [(1, (1.0, 0.0)), (2, (0.0, 1.0))])
    rows = semantic_dedup(df, k=2, iterations=0, threshold=0.5).collect()
    assert len(rows) == 2
    assert all(r.n_dup_pairs == 0 and r.dup_cos_sum == 0.0 for r in rows)


# ---------------------------------------------------- quality_rule_battery


def _doc(words):
    return " ".join(words)


def test_quality_battery_per_rule_failures(spark):
    good = [f"wrd{i:02d}" for i in range(28)] + ["the", "and"]  # passes all
    short = ["the", "and"] + [f"wrd{i:02d}" for i in range(8)]  # 10 words
    nostop = [f"wrd{i:02d}" for i in range(30)]  # no stopwords
    thin = ["abc"] * 0 + [f"ab{i}" for i in range(28)] + ["the", "and"]  # 3-char words
    repet = ["wrd00"] * 26 + ["wrd01", "wrd02", "the", "and"]  # dup frac 25/30
    rows = [
        ("good", _doc(good)),
        ("short", _doc(short)),
        ("nostop", _doc(nostop)),
        ("thin", _doc(thin)),
        ("repet", _doc(repet)),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in quality_rule_battery(df).collect()}
    g = out["good"]
    assert (g.fail_length, g.fail_word_len, g.fail_stopword, g.fail_repetition) == (
        0,
        0,
        0,
        0,
    )
    assert g.n_pass == 1 and g.pass_rate == 1.0
    assert out["short"].fail_length == 1
    assert out["nostop"].fail_stopword == 1
    assert out["thin"].fail_word_len == 1
    assert out["repet"].fail_repetition == 1
    # a failing doc is not counted as passing
    for src in ("short", "nostop", "thin", "repet"):
        assert out[src].n_pass == 0 and out[src].pass_rate == 0.0


def test_quality_battery_word_len_bounds_are_inclusive(spark):
    # both mean-word-length edges must PASS — the band is inclusive.
    # lower edge: 30 words, chars = 6 (the+and) + 26*4 + 2*5 = 120 = 4*30
    lo = ["the", "and"] + [f"wr{i:02d}" for i in range(26)] + ["wrdaa", "wrdbb"]
    # upper edge: 30 words, chars = 6 + 24*5 + 4*6 = 150 = 5*30
    hi = ["the", "and"] + [f"wd{i:03d}" for i in range(24)] + [
        "wrdln0", "wrdln1", "wrdln2", "wrdln3"
    ]
    assert sum(map(len, lo)) == 120 and sum(map(len, hi)) == 150
    df = spark.createDataFrame(
        [("lo", _doc(lo)), ("hi", _doc(hi))], "source string, text string"
    )
    out = {r.source: r for r in quality_rule_battery(df).collect()}
    assert out["lo"].fail_word_len == 0 and out["lo"].n_pass == 1
    assert out["hi"].fail_word_len == 0 and out["hi"].n_pass == 1


def test_quality_battery_null_text_excluded(spark):
    df = spark.createDataFrame(
        [("s", None), ("s", _doc([f"wrd{i:02d}" for i in range(28)] + ["the", "and"]))],
        "source string, text string",
    )
    out = quality_rule_battery(df).collect()[0]
    assert out.n_docs == 1 and out.n_pass == 1


# -------------------------------------------------- token_budget_allocation


def test_token_budget_allocation_shares_and_caps(spark):
    # source a: 100 tokens, source b: 400 tokens => sqrt shares 10/30, 20/30
    docs = [("a", _doc(["t"] * 50)), ("a", _doc(["t"] * 50)), ("b", _doc(["t"] * 400))]
    df = spark.createDataFrame(docs, "source string, text string")
    out = {
        r.source: r
        for r in token_budget_allocation(
            df, budget_tokens=600, max_epochs=1
        ).collect()
    }
    assert out["a"].avail_tokens == 100 and out["b"].avail_tokens == 400
    # mirror the operator's float sequence exactly in python
    share_a, share_b = 10.0 / 30.0, 20.0 / 30.0
    assert out["a"].target_share == share_a
    assert out["b"].target_share == share_b
    alloc_a, alloc_b = math.floor(600.0 * share_a), math.floor(600.0 * share_b)
    assert out["a"].alloc_tokens == alloc_a
    assert out["b"].alloc_tokens == alloc_b
    # epoch cap 1: source a is over-asked (alloc ~2x avail) and forfeits
    assert out["a"].granted_tokens == 100
    assert out["a"].shortfall_tokens == alloc_a - 100
    assert out["b"].granted_tokens == alloc_b  # under cap: grant = ask
    assert out["b"].shortfall_tokens == 0
    assert out["a"].epochs == alloc_a / 100.0
    assert out["b"].epochs == alloc_b / 400.0


def test_token_budget_total_never_exceeds_budget(spark):
    docs = [(f"s{i}", _doc(["t"] * (10 + 7 * i))) for i in range(6)]
    df = spark.createDataFrame(docs, "source string, text string")
    out = token_budget_allocation(df, budget_tokens=1000, max_epochs=3)
    got = out.agg(
        F.sum("alloc_tokens").alias("alloc"), F.sum("granted_tokens").alias("granted")
    ).collect()[0]
    # floor() per source guarantees sum(alloc) <= budget; the cap only shrinks
    assert got.alloc <= 1000
    assert got.granted <= got.alloc


# ------------------------------------------------------- hll_cardinality


def test_hll_single_value(spark):
    from reactive_kinesis_spark.operators.mining import hll_cardinality

    df = spark.createDataFrame([("g", "x")] * 5, "grp string, v string")
    out = hll_cardinality(df, "v", "grp").collect()[0]
    assert out.used_buckets == 1 and out.exact_distinct == 1


def test_hll_estimate_within_tolerance(spark):
    from reactive_kinesis_spark.operators.mining import hll_cardinality

    df = spark.createDataFrame(
        [("g", f"val{i}") for i in range(2000)], "grp string, v string"
    )
    out = hll_cardinality(df, "v", "grp").collect()[0]
    assert out.exact_distinct == 2000
    # raw estimator, m=256: 3 sigma ~ 3 * 1.04/sqrt(256) ~ 20%
    assert out.rel_err < 0.20


def test_hll_duplicates_do_not_move_the_estimate(spark):
    from reactive_kinesis_spark.operators.mining import hll_cardinality

    base = [("g", f"val{i}") for i in range(500)]
    df1 = spark.createDataFrame(base, "grp string, v string")
    df3 = spark.createDataFrame(base * 3, "grp string, v string")
    e1 = hll_cardinality(df1, "v", "grp").collect()[0]
    e3 = hll_cardinality(df3, "v", "grp").collect()[0]
    assert e1.hll_estimate == e3.hll_estimate
    assert e1.used_buckets == e3.used_buckets


def test_hll_rejects_out_of_range_precision(spark):
    import pytest

    from reactive_kinesis_spark.operators.mining import hll_cardinality

    df = spark.createDataFrame([("g", "x")], "grp string, v string")
    with pytest.raises(ValueError, match="p in"):
        hll_cardinality(df, "v", "grp", p=14)


# ----------------------------------------------------------------- oov_rate


def test_oov_rate_against_hand_count(spark):
    from reactive_kinesis_spark.operators.text import oov_rate

    # global counts: aa x4, bb x3, cc x2, dd x1 -> vocab(2) = {aa, bb}
    rows = [
        ("s1", "aa aa bb cc"),
        ("s1", "aa bb dd"),
        ("s2", "aa bb cc"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in oov_rate(df, vocab_size=2).collect()}
    # s1: 7 tokens, oov = cc + dd = 2; s2: 3 tokens, oov = cc = 1
    assert out["s1"].n_tokens == 7 and out["s1"].n_oov == 2
    assert out["s2"].n_tokens == 3 and out["s2"].n_oov == 1
    assert out["s1"].oov_rate == 2.0 / 7.0
    assert out["s2"].oov_rate == 1.0 / 3.0


def test_oov_rate_vocab_tie_breaks_on_token(spark):
    from reactive_kinesis_spark.operators.text import oov_rate

    # bb and cc tie at 2; vocab(2) = {aa, bb} (count desc, token asc)
    df = spark.createDataFrame(
        [("s", "aa aa aa bb bb cc cc")], "source string, text string"
    )
    out = oov_rate(df, vocab_size=2).collect()[0]
    assert out.n_oov == 2  # the two cc occurrences


# ------------------------------------------------------- hard_negative_topk


def test_hard_negatives_exclude_same_label(spark):
    from reactive_kinesis_spark.operators.similarity import hard_negative_topk

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.1], 0),   # same label as 1: excluded despite cos~1
        (3, [0.9, 0.3], 1),
        (4, [0.0, 1.0], 1),
        (5, [-1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.where(F.col("vec_id") == 1)
    got = hard_negative_topk(df, q, k=2).orderBy("rn").collect()
    assert [r.neighbor_id for r in got] == [3, 4]  # 3 closest, then 4; 2 skipped
    assert all(r.neighbor_label != r.query_label for r in got)
    assert got[0].cosine_sim > got[1].cosine_sim


# --------------------------------------------------- semantic_decontaminate


def test_semantic_decontaminate_flags_paraphrase_hit(spark):
    from reactive_kinesis_spark.operators.similarity import semantic_decontaminate

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.98, 0.05]),   # near-copy of eval item 100
        ],
        "vec_id long, embedding array<float>",
    )
    evalset = spark.createDataFrame(
        [
            (100, [1.0, 0.0]),      # contaminated: ~identical to 1 and 3
            (101, [-1.0, -1.0]),    # nothing similar in train
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.eval_id: r
        for r in semantic_decontaminate(
            train, evalset, k=2, iterations=1, threshold=0.9
        ).collect()
    }
    assert 100 in got and got[100].n_train_hits == 2
    assert abs(got[100].max_cos - 1.0) < 1e-9  # exact self-match with train id 1
    assert 101 not in got  # negative-direction vector: no row


def test_kmeans_centroids_fit_apply_matches_kmeans_assign(spark, sf_dir):
    """Regression for the round-10 fit/apply split: assigning the training
    corpus under the exposed centroids must reproduce kmeans_assign
    bit-for-bit (same clusters, same distances)."""
    from reactive_kinesis_spark.operators.similarity import (
        _kmeans_assign_to,
        _kmeans_prepare,
        kmeans_assign,
        kmeans_centroids,
    )
    from reactive_kinesis_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    direct = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_assign(emb, k=4, iterations=1).collect()
    }
    cents = kmeans_centroids(emb, k=4, iterations=1)
    split = {
        r["__id"]: (r["cluster"], r["dist"])
        for r in _kmeans_assign_to(
            _kmeans_prepare(emb, "embedding", "vec_id"), cents
        ).collect()
    }
    assert direct == split


# ------------------------------------------------------------------ pq_encode


def test_pq_encode_exact_codebook_member_has_zero_error(spark):
    from reactive_kinesis_spark.operators.similarity import pq_encode

    # iterations=0: codebooks are the slices of the two smallest ids.
    # id 3 duplicates id 1 -> same codes, recon_err exactly 0.
    rows = [
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [0.0, 1.0, 1.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 1.0]),
        (4, [0.9, 0.1, 0.2, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r
        for r in pq_encode(df, dim=4, m=2, k=2, iterations=0).collect()
    }
    assert got[1].recon_err == 0.0 and got[2].recon_err == 0.0
    assert (got[3].code_0, got[3].code_1) == (got[1].code_0, got[1].code_1)
    assert got[3].recon_err == 0.0
    assert got[4].recon_err > 0.0
    for r in got.values():
        assert 0 <= r.code_0 < 2 and 0 <= r.code_1 < 2


def test_pq_encode_matches_per_subspace_kmeans(spark, sf_dir):
    """recon_err must be bit-equal to the sum (in subspace order) of the
    per-subspace kmeans_assign distances over sliced vectors."""
    from pyspark.sql import functions as FF

    from reactive_kinesis_spark.operators.similarity import kmeans_assign, pq_encode
    from reactive_kinesis_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.vec_id: (r.code_0, r.code_1, r.recon_err)
        for r in pq_encode(emb, dim=64, m=2, k=4, iterations=1).collect()
    }
    parts = []
    for s in range(2):
        sv = emb.select(
            "vec_id", FF.slice("embedding", s * 32 + 1, 32).alias("sv")
        )
        parts.append(
            {
                r.vec_id: (r.cluster, r.dist)
                for r in kmeans_assign(sv, "sv", "vec_id", k=4, iterations=1).collect()
            }
        )
    for vid, (c0, c1, err) in got.items():
        assert parts[0][vid][0] == c0 and parts[1][vid][0] == c1
        assert err == parts[0][vid][1] + parts[1][vid][1]


def test_pq_encode_rejects_indivisible_dim(spark):
    import pytest

    from reactive_kinesis_spark.operators.similarity import pq_encode

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(df, dim=3, m=2)


# ---------------------------------------------------------------- pq_adc_topk


def test_pq_adc_codebook_member_query_ranks_itself_first(spark):
    from reactive_kinesis_spark.operators.similarity import pq_adc_topk

    rows = [
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [0.0, 1.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.1, 0.9]),
        (4, [0.1, 0.9, 0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") == 1)
    got = pq_adc_topk(
        df, q, dim=4, m=2, k_codebook=2, iterations=0, k=4
    ).orderBy("rn").collect()
    # query 1 IS codeword 0 in both subspaces: ADC to itself is exactly 0,
    # and to every vector sharing its codes is also 0 (id tie-break)
    assert got[0].neighbor_id == 1 and got[0].adc_dist == 0.0
    # ADC distances are non-decreasing in rank
    dists = [r.adc_dist for r in got]
    assert dists == sorted(dists)


def test_pq_adc_matches_manual_table_sum(spark):
    """ADC(q, x) must be bit-equal to qdist_0[code_0(x)] + qdist_1[code_1(x)]
    computed independently from the exposed codebooks and codes."""
    from reactive_kinesis_spark.operators.similarity import (
        kmeans_centroids,
        pq_adc_topk,
        pq_encode,
    )
    from reactive_kinesis_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") == 7)
    got = {
        r.neighbor_id: r.adc_dist
        for r in pq_adc_topk(
            emb, q, dim=64, m=2, k_codebook=4, iterations=1, k=3
        ).collect()
    }
    codes = {
        r.vec_id: (r.code_0, r.code_1)
        for r in pq_encode(emb, dim=64, m=2, k=4, iterations=1).collect()
    }
    qrow = q.select("embedding").collect()[0][0]
    tables = []
    for s in range(2):
        sv = emb.select("vec_id", F.slice("embedding", s * 32 + 1, 32).alias("sv"))
        cents = {
            r.cid: r.cent
            for r in kmeans_centroids(sv, "sv", "vec_id", k=4, iterations=1).collect()
        }
        qs = [float(x) for x in qrow[s * 32 : (s + 1) * 32]]
        tables.append(
            {
                cid: _fold_sq_dist(qs, cent)
                for cid, cent in cents.items()
            }
        )
    for nid, adc in got.items():
        c0, c1 = codes[nid]
        assert adc == tables[0][c0] + tables[1][c1]


def _fold_sq_dist(q, cent):
    acc = 0.0
    for x, c in zip(q, cent):
        acc = acc + (x - c) * (x - c)
    return acc


def test_pq_adc_query_block_guard(spark):
    import pytest

    from reactive_kinesis_spark.operators.similarity import pq_adc_topk

    rows = [(i, [float(i), 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="max_query_rows"):
        pq_adc_topk(df, df, dim=2, m=1, k_codebook=2, max_query_rows=5)


# ------------------------------------------------- minhash_estimator_audit


def test_minhash_audit_identical_docs_have_zero_error(spark):
    from reactive_kinesis_spark.operators.dedup import minhash_estimator_audit

    text = " ".join(f"w{i}" for i in range(20))
    other = " ".join(f"v{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    rows = minhash_estimator_audit(df, num_hashes=16, bands=4).collect()
    got = {(r.id_1, r.id_2): r for r in rows}
    # identical docs: every minhash agrees and exact jaccard is 1
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.est_jaccard == 1.0 and r.jaccard == 1.0 and r.abs_err == 0.0
    # disjoint doc 3 shares no band with 1/2 (16 joint hash agreements
    # would be needed); if it ever did collide, est/exact stay in [0,1]
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0 and 0.0 <= r.jaccard <= 1.0


def test_minhash_audit_estimator_tracks_exact_on_corpus(spark, sf_dir):
    from reactive_kinesis_spark.operators.dedup import minhash_estimator_audit
    from reactive_kinesis_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = minhash_estimator_audit(docs).collect()
    assert rows, "corpus has planted near-dups; the audit must see candidates"
    # 32-hash estimator: standard error ~ sqrt(J(1-J)/32) <= 0.09 — allow 3x
    assert all(r.abs_err <= 0.27 for r in rows)


# ------------------------------------------------------------ retrieval_eval


def test_retrieval_eval_perfect_retriever_scores_one(spark):
    from reactive_kinesis_spark.operators.similarity import retrieval_eval

    # two label pairs, same-label vectors nearly identical: each query's
    # rank-1 neighbor is its twin -> recall/MRR/nDCG all exactly 1.0
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.01, 0.99], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.query_id: r for r in retrieval_eval(df, df, k=1).collect()}
    for r in out.values():
        assert r.n_rel == 1 and r.hits_at_k == 1
        assert r.recall_at_k == 1.0 and r.mrr == 1.0 and r.ndcg == 1.0


def test_retrieval_eval_irrelevant_topk_scores_zero(spark):
    from reactive_kinesis_spark.operators.similarity import retrieval_eval

    # query 1's nearest neighbor has the other label; its same-label twin
    # is opposite in direction -> k=1 retrieval finds nothing relevant
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 1),
        (3, [-1.0, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.where(F.col("vec_id") == 1)
    r = retrieval_eval(df, q, k=1).collect()[0]
    assert r.hits_at_k == 0 and r.mrr == 0.0 and r.ndcg == 0.0 and r.recall_at_k == 0.0


def test_retrieval_eval_dcg_rank_position_matters(spark):
    from reactive_kinesis_spark.operators.similarity import (
        DCG_DISCOUNTS_1E6,
        retrieval_eval,
    )

    # query 10: relevant twin sits at rank 2 behind an irrelevant rank 1
    rows = [
        (10, [1.0, 0.0, 0.0], 0),
        (11, [0.99, 0.1, 0.0], 1),   # rank 1, wrong label
        (12, [0.9, 0.0, 0.1], 0),    # rank 2, relevant
        (13, [0.0, 1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.where(F.col("vec_id") == 10)
    r = retrieval_eval(df, q, k=2).collect()[0]
    assert r.mrr == 0.5
    # n_rel=1 -> idcg = d1; dcg = d2 -> ndcg = d2/d1 exactly
    assert r.ndcg == DCG_DISCOUNTS_1E6[1] / DCG_DISCOUNTS_1E6[0]


def test_minhash_md5_family_num_hashes_bound(spark):
    import pytest

    from reactive_kinesis_spark.operators.dedup import minhash_signatures

    sh = spark.createDataFrame([(1, "a b c")], "doc_id long, shingle string")
    with pytest.raises(ValueError, match="num_hashes <= 64"):
        minhash_signatures(sh, num_hashes=65, hash_family="md5")


# -------------------------------------------------- q159 family agreement


def test_neardup_agreement_exact_dup_found_by_both(spark):
    from reactive_kinesis_spark.queries import load_all
    import os, tempfile

    text = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, text, "s", "en", len(text)),
         (2, text, "s", "en", len(text)),
         (3, other, "s", "en", len(other))],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {(r.id_1, r.id_2): r for r in
           load_all()["q159_neardup_agreement"].fn(spark, tmp).collect()}
    r = out[(1, 2)]
    assert r.found_by == "both" and r.jaccard == 1.0 and r.hamming == 0
    assert (1, 3) not in out and (2, 3) not in out
