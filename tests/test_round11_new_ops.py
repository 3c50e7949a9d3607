"""Round-11 new operators: Bloom membership audit, bigram LM fluency,
tokenizer fertility, funnel, cohort retention, chi-square homogeneity,
kNN label disagreement. Registry-wide oracle parity for q160-q166 is
covered by test_oracle_parity; these pin operator semantics on crafted
micro-inputs where the right answer is known by hand."""

from __future__ import annotations

import datetime as dt

import pytest

from reactive_kinesis_spark.operators.mining import bloom_membership_audit
from reactive_kinesis_spark.operators.quality import chi_square_homogeneity
from reactive_kinesis_spark.operators.relational import cohort_retention, funnel_steps
from reactive_kinesis_spark.operators.similarity import knn_label_disagreement
from reactive_kinesis_spark.operators.text import bigram_lm_score, tokenizer_fertility

# ------------------------------------------------------------- bloom audit


def _kv(spark, rows, schema="g string, v string"):
    return spark.createDataFrame(rows, schema)


def test_bloom_no_false_negatives_and_audit_invariant(spark):
    ref = _kv(spark, [("r", f"val{i}") for i in range(50)])
    # probe = 10 members + 40 non-members; tiny filter to force FPs
    probe = _kv(
        spark,
        [("g1", f"val{i}") for i in range(10)]
        + [("g1", f"other{i}") for i in range(40)],
    )
    r = bloom_membership_audit(
        ref, probe, value_col="v", group_col="g", m_bits=64, k_hashes=3
    ).collect()[0]
    assert r.n_rows == 50
    assert r.n_exact_pos == 10
    # no false negatives: every true member is bloom-positive
    assert r.n_bloom_pos >= r.n_exact_pos
    # the audit's internal invariant
    assert r.n_bloom_pos == r.n_exact_pos + r.n_false_pos
    assert r.fp_rate == r.n_false_pos / 40.0


def test_bloom_large_filter_no_false_positives(spark):
    ref = _kv(spark, [("r", f"val{i}") for i in range(5)])
    probe = _kv(spark, [("g", f"miss{i}") for i in range(5)])
    r = bloom_membership_audit(
        ref, probe, value_col="v", group_col="g", m_bits=1 << 16, k_hashes=4
    ).collect()[0]
    assert r.n_bloom_pos == 0 and r.n_false_pos == 0 and r.fp_rate == 0.0


def test_bloom_rejects_degenerate_params(spark):
    df = _kv(spark, [("g", "x")])
    with pytest.raises(ValueError):
        bloom_membership_audit(df, df, "v", "g", m_bits=1)


# ------------------------------------------------------------ bigram LM


def test_bigram_lm_hand_computed(spark):
    # corpus: "a b" x2, "a c" x1 -> c1(a)=3, V=3 (a,b,c)
    # p(a b) = (2+1)/(3+3) = 0.5 ; p(a c) = (1+1)/6 = 1/3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    q = 1 << 40
    assert rows[1].n_bigrams == 1
    assert rows[1].sum_p_q40 == q // 2
    assert rows[3].sum_p_q40 == int((2 / 6) * q)  # floor of exact double
    assert rows[1].avg_p_q40 == rows[1].sum_p_q40 / 1.0
    # single-word docs are excluded
    df2 = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert bigram_lm_score(df2).count() == 0


def test_bigram_lm_orders_shuffled_text_lower(spark):
    # repeated natural phrase vs its shuffled counterpart: the natural
    # doc's transitions are corpus-frequent, the shuffled one's are not
    docs = [(i, "the cat sat on the mat") for i in range(5)]
    docs.append((99, "mat the on sat cat the"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert rows[99].avg_p_q40 < rows[0].avg_p_q40


# ---------------------------------------------------- tokenizer fertility


def test_tokenizer_fertility_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "ab cd", "x"), (2, "e", "x")], "doc_id long, text string, lang string"
    )
    r = tokenizer_fertility(df).collect()[0]
    assert (r.n_docs, r.n_words, r.n_bytes) == (2, 3, 6)
    # BPE-ish regex: "ab", " cd", "e" -> 3 tokens
    assert r.n_tokens == 3
    assert r.tokens_per_word == 1.0
    assert r.bytes_per_token == 2.0


# ------------------------------------------------------------------ funnel


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, t, base + dt.timedelta(minutes=m)) for u, t, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_order_sensitive(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "signup", 0), (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
            # user 2: purchase BEFORE click -> stops at view
            (2, "signup", 0), (2, "view", 1), (2, "purchase", 2), (2, "click", 5),
            # user 3: no signup -> never enters
            (3, "view", 0), (3, "click", 1),
        ],
    )
    rows = {r.step: r for r in funnel_steps(ev, ("signup", "view", "click", "purchase")).collect()}
    assert [rows[i].n_users for i in range(4)] == [2, 2, 2, 1]
    assert rows[0].conv_from_prev == 1.0
    assert rows[3].conv_from_prev == 0.5
    assert rows[3].conv_overall == 0.5


def test_funnel_counts_monotone_nonincreasing(spark):
    ev = _events(
        spark,
        [(u, t, u * 10 + i) for u in range(6) for i, t in enumerate(["signup", "view", "click"])],
    )
    rows = sorted(funnel_steps(ev, ("signup", "view", "click", "purchase")).collect(),
                  key=lambda r: r.step)
    ns = [r.n_users for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert ns[3] == 0  # nobody purchased


def test_funnel_rejects_empty_steps(spark):
    ev = _events(spark, [(1, "signup", 0)])
    with pytest.raises(ValueError):
        funnel_steps(ev, ())


# ------------------------------------------------------- cohort retention


def test_cohort_retention_hand_computed(spark):
    # two users first seen in week of Mon 2024-01-01; one returns next week
    ev = _events(
        spark,
        [(1, "view", 0), (2, "view", 60), (1, "view", 7 * 24 * 60)],
    )
    rows = {(r.cohort_week, r.week_offset): r for r in cohort_retention(ev).collect()}
    w0 = dt.datetime(2024, 1, 1)
    assert rows[(w0, 0)].n_active == 2 and rows[(w0, 0)].cohort_size == 2
    assert rows[(w0, 0)].retention == 1.0
    assert rows[(w0, 1)].n_active == 1 and rows[(w0, 1)].retention == 0.5


# ---------------------------------------------------- chi-square homogeneity


def test_chi_square_zero_on_homogeneous_table(spark):
    rows = [(s, g) for s in ("a", "b") for g in ("x", "y") for _ in range(10)]
    df = spark.createDataFrame(rows, "src string, grp string")
    out = chi_square_homogeneity(df, "src", "grp").collect()
    assert len(out) == 4
    for r in out:
        assert r.expected == 10.0 and r.chi2_term == 0.0 and r.chi2_total == 0.0
        assert r.dof == 1


def test_chi_square_positive_on_skewed_table(spark):
    rows = [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 30
    df = spark.createDataFrame(rows, "src string, grp string")
    out = chi_square_homogeneity(df, "src", "grp").collect()
    # classic 2x2: chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 80*(900-100)^2/40^4 = 20
    assert all(abs(r.chi2_total - 20.0) < 1e-6 for r in out)


# ----------------------------------------------------- kNN label noise


def test_knn_disagreement_flags_planted_mislabel(spark):
    # two tight clusters; vec 99 sits in cluster A but carries B's label
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i], 0))
        rows.append((10 + i, [-1.0, 0.01 * i], 1))
    rows.append((99, [1.0, 0.035], 1))  # mislabeled A-cluster point
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.vec_id: r for r in knn_label_disagreement(df, k=3).collect()}
    assert out[99].n_diff == 3 and out[99].flagged == 1
    assert out[0].flagged == 0 and out[10].flagged == 0
    assert out[99].disagreement == 1.0
