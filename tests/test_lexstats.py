"""Hand-computed micro-input tests for the lexstats tier (q174–q177)
plus a pure-Python reference differential: ``_log2_ref`` re-implements
the fixmath Q12 program in plain ints, so expected values are derived
independently of either engine, and the true-entropy proximity check
pins the documented accuracy envelope end-to-end."""

from __future__ import annotations

import math

import pytest

from reactive_kinesis_spark.fixmath import LOG2_SCALE
from reactive_kinesis_spark.operators import lexstats as L

_S = 25
_TWO = 1 << (_S + 1)


def _log2_ref(c: int) -> int:
    """Plain-int mirror of fixmath's Q12 log2 (the test oracle)."""
    e = c.bit_length() - 1
    x = c << (_S - e) if e <= _S else int(math.floor(c / 2.0 ** (e - _S)))
    acc = 0
    for _ in range(12):
        s = (x * x) >> _S
        if s >= _TWO:
            acc = acc * 2 + 1
            x = s >> 1
        else:
            acc = acc * 2
            x = s
    return e * LOG2_SCALE + acc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


# ------------------------------------------------------------ vocab growth


def test_vocab_growth_hand_computed(spark):
    df = _docs(
        spark,
        [(1, "a b a", "en", "s0"), (2, "b c", "en", "s0"), (3, "c d e", "en", "s0")],
    )
    rows = {r["bucket"]: r for r in L.vocab_growth(df, buckets=3).collect()}
    assert rows[1]["n_docs"] == 1 and rows[1]["cum_tokens"] == 3 and rows[1]["vocab"] == 2
    assert rows[2]["n_docs"] == 2 and rows[2]["cum_tokens"] == 5 and rows[2]["vocab"] == 3
    assert rows[3]["n_docs"] == 3 and rows[3]["cum_tokens"] == 8 and rows[3]["vocab"] == 5
    assert rows[3]["type_token_ratio"] == 5 / 8


def test_vocab_growth_null_text_dropped(spark):
    df = _docs(spark, [(1, "a", "en", "s0"), (2, None, "en", "s0")])
    rows = L.vocab_growth(df, buckets=1).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 1 and rows[0]["vocab"] == 1


def test_vocab_growth_rejects_bad_buckets(spark):
    df = _docs(spark, [(1, "a", "en", "s0")])
    with pytest.raises(ValueError, match="buckets"):
        L.vocab_growth(df, buckets=0)


# ----------------------------------------------------------- token entropy


def test_token_entropy_uniform_and_degenerate(spark):
    df = _docs(
        spark,
        [(1, "a a b b", "en", "uniform"), (2, "c c c c", "en", "point")],
    )
    rows = {r["source"]: r for r in L.token_entropy(df).collect()}
    # two equiprobable symbols -> exactly 1 bit (all logs land on powers of 2)
    assert rows["uniform"]["entropy_bits"] == 1.0
    assert rows["uniform"]["n_tokens"] == 4 and rows["uniform"]["vocab"] == 2
    # a single symbol -> exactly 0 bits
    assert rows["point"]["entropy_bits"] == 0.0


def test_token_entropy_matches_python_reference(spark):
    text = "a a a a b b c d"  # counts 4,2,1,1 over N=8
    df = _docs(spark, [(1, text, "en", "s0")])
    got = L.token_entropy(df).collect()[0]
    counts = [4, 2, 1, 1]
    num = 8 * _log2_ref(8) - sum(c * _log2_ref(c) for c in counts)
    want = num / (8 * LOG2_SCALE)
    assert got["entropy_bits"] == want
    # and the fixed-point answer is close to true Shannon entropy
    true_h = -sum((c / 8) * math.log2(c / 8) for c in counts)
    assert abs(got["entropy_bits"] - true_h) < 1e-3


# -------------------------------------------------------------- zipf slope


def test_zipf_slope_exact_on_power_of_two_points(spark):
    # freqs 4,2 at ranks 1,2: Δy/Δx = (L(2)-L(4)) / (L(2)-L(1)) = -1 exactly
    df = _docs(spark, [(1, "a a a a b b", "en", "s0")])
    rows = L.zipf_slope(df, group_col="lang").collect()
    assert len(rows) == 1
    assert rows[0]["n_ranks"] == 2
    assert rows[0]["zipf_slope"] == -1.0


def test_zipf_slope_matches_python_reference(spark):
    df = _docs(spark, [(1, "a a a a a b b b c c d", "en", "s0")])
    got = L.zipf_slope(df, group_col="lang").collect()[0]
    freqs = [5, 3, 2, 1]  # ranks 1..4
    xs = [_log2_ref(r) for r in range(1, 5)]
    ys = [_log2_ref(c) for c in freqs]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["zipf_slope"] == want


def test_zipf_slope_drops_single_word_groups(spark):
    df = _docs(
        spark,
        [(1, "a a a", "en", "s0"), (2, "x y", "fr", "s0")],
    )
    rows = {r["lang"]: r for r in L.zipf_slope(df, group_col="lang").collect()}
    assert "en" not in rows  # one distinct word -> no variance to regress
    assert rows["fr"]["n_ranks"] == 2


def test_zipf_slope_rejects_bad_ranks(spark):
    df = _docs(spark, [(1, "a", "en", "s0")])
    with pytest.raises(ValueError, match="top_ranks"):
        L.zipf_slope(df, top_ranks=1)


# ---------------------------------------------------------- NB domain LLR


def test_nb_domain_llr_hand_computed(spark):
    df = _docs(spark, [(1, "a a", "en", "s0"), (2, "a b", "fr", "s0")])
    rows = {r["doc_id"]: r for r in L.nb_domain_llr(df, "lang = 'en'").collect()}
    # ct: a=2, b=0; cb: a=1, b=1; nt=2, nb=2, v=2
    llr_a = (_log2_ref(3) - _log2_ref(4)) - (_log2_ref(2) - _log2_ref(4))
    llr_b = (_log2_ref(1) - _log2_ref(4)) - (_log2_ref(2) - _log2_ref(4))
    assert rows[1]["is_target"] is True and rows[2]["is_target"] is False
    assert rows[1]["n_tokens"] == 2 and rows[2]["n_tokens"] == 2
    assert rows[1]["llr_bits_per_token"] == (2 * llr_a) / (2 * LOG2_SCALE)
    assert rows[2]["llr_bits_per_token"] == (llr_a + llr_b) / (2 * LOG2_SCALE)
    # the target-heavy word scores positive, the background-only negative
    assert llr_a > 0 > llr_b


def test_nb_domain_llr_separates_planted_domains(spark):
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma", "en", "s0"))
    for i in range(20, 40):
        rows.append((i, "delta epsilon zeta", "fr", "s0"))
    df = _docs(spark, rows)
    out = L.nb_domain_llr(df, "lang = 'en'").collect()
    for r in out:
        if r["is_target"]:
            assert r["llr_bits_per_token"] > 0
        else:
            assert r["llr_bits_per_token"] < 0


# ------------------------------------------------------- KL divergence


def test_source_kl_zero_for_identical_distributions(spark):
    df = _docs(spark, [(1, "a b", "en", "A"), (2, "a b", "en", "B")])
    rows = L.source_kl_divergence(df).collect()
    assert {r["source"] for r in rows} == {"A", "B"}
    for r in rows:
        # every term is (L(1)-L(2)) - (L(2)-L(4)) = 0 exactly
        assert r["kl_bits"] == 0.0


def test_source_kl_exact_one_bit_for_disjoint_halves(spark):
    # A={a,a}, B={b,b}: each source concentrates half the corpus mass on
    # its own word -> KL = log2(2) = 1 bit, exactly (all logs land on
    # powers of two)
    df = _docs(spark, [(1, "a a", "en", "A"), (2, "b b", "en", "B")])
    rows = {r["source"]: r for r in L.source_kl_divergence(df).collect()}
    assert rows["A"]["kl_bits"] == 1.0
    assert rows["B"]["kl_bits"] == 1.0
    assert rows["A"]["n_tokens"] == 2 and rows["A"]["vocab"] == 1


# ---------------------------------------------------- PMI collocations


def test_pmi_exact_one_bit_for_perfect_collocation(spark):
    # "a b" x5: c_ab=5, c_a=c_b=5, N=10 -> PMI = L(10)-L(5) = exactly 1 bit;
    # "b a" occurs only 4 times and is cut by min_count
    df = _docs(spark, [(1, "a b a b a b a b a b", "en", "s0")])
    rows = L.pmi_collocations(df, min_count=5, top=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["c_xy"]) == ("a", "b", 5)
    assert r["pmi_bits"] == 1.0


def test_pmi_top_cut_is_exact_and_ordered(spark):
    # two collocations with different PMI; top=1 keeps the higher one
    text1 = " ".join(["x y"] * 8)          # tight pair
    text2 = " ".join(["p q", "p r", "p q", "p r"] * 4)  # looser pair
    df = _docs(spark, [(1, text1, "en", "s0"), (2, text2, "en", "s0")])
    all_rows = L.pmi_collocations(df, min_count=5, top=100).collect()
    assert all_rows == sorted(
        all_rows, key=lambda r: (-round(r["pmi_bits"] * 4096), r["w1"], r["w2"])
    )
    top1 = L.pmi_collocations(df, min_count=5, top=1).collect()
    assert len(top1) == 1
    assert top1[0]["w1"] == all_rows[0]["w1"] and top1[0]["w2"] == all_rows[0]["w2"]


# ------------------------------------------------ conditional entropy


def test_conditional_entropy_zero_for_deterministic_chain(spark):
    # "a b a b a b": heads {a:3, b:2}; every head determines its successor
    # -> H(pair) == H(head), conditional entropy exactly 0
    df = _docs(spark, [(1, "a b a b a b", "en", "s0")])
    rows = L.conditional_entropy(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_bigrams"] == 5
    assert r["cond_entropy_bits"] == 0.0


def test_conditional_entropy_one_bit_for_fair_branching(spark):
    # heads all 'a'; successors split 2/2 between b and c:
    # H(head)=0, H(pair)=1 -> conditional entropy exactly 1 bit
    df = _docs(spark, [(1, "a b", "en", "s0"), (2, "a c", "en", "s0"),
                       (3, "a b", "en", "s0"), (4, "a c", "en", "s0")])
    r = L.conditional_entropy(df).collect()[0]
    assert r["n_bigrams"] == 4
    assert r["head_entropy_bits"] == 0.0
    assert r["pair_entropy_bits"] == 1.0
    assert r["cond_entropy_bits"] == 1.0


def test_conditional_entropy_matches_python_reference(spark):
    df = _docs(spark, [(1, "a b a c a b b c", "en", "s0")])
    r = L.conditional_entropy(df).collect()[0]
    # bigrams: ab,ba,ac,ca,ab,bb,bc -> pair counts {ab:2,ba:1,ac:1,ca:1,bb:1,bc:1}
    # heads (w1 of each bigram; the final word is never a head): a:3, b:3, c:1
    def h(counts):
        n = sum(counts)
        num = n * _log2_ref(n) - sum(c * _log2_ref(c) for c in counts)
        return num / (n * LOG2_SCALE)
    hp = h([2, 1, 1, 1, 1, 1])
    hh = h([3, 3, 1])
    assert r["n_bigrams"] == 7
    assert r["pair_entropy_bits"] == hp
    assert r["head_entropy_bits"] == hh
    assert r["cond_entropy_bits"] == hp - hh


# ------------------------------------------------------ Heaps exponent


def test_heaps_exponent_exact_on_power_of_two_checkpoints(spark):
    # checkpoints (cum_tokens, vocab) = (4, 2) and (16, 4):
    # beta = (L(4)-L(2)) / (L(16)-L(4)) = 4096/8192 = 0.5 exactly
    df = _docs(
        spark,
        [(1, "a a b b", "en", "s0"), (2, "c c c c c c d d d d d d", "en", "s0")],
    )
    rows = L.heaps_exponent(df, buckets=2).collect()
    assert len(rows) == 1
    assert rows[0]["n_checkpoints"] == 2
    assert rows[0]["heaps_beta"] == 0.5


def test_heaps_exponent_flags_vocabulary_churn(spark):
    # every doc introduces only new words -> vocab grows ~linearly with
    # tokens -> beta near 1; a repeated-vocab corpus sits far lower
    churn = [(i, " ".join(f"w{i}_{j}" for j in range(10)), "en", "s0") for i in range(10)]
    fixed = [(i, "a b c d e f g h i j", "en", "s0") for i in range(10)]
    b_churn = L.heaps_exponent(_docs(spark, churn), buckets=5).collect()[0]["heaps_beta"]
    b_fixed = L.heaps_exponent(_docs(spark, fixed), buckets=5).collect()[0]["heaps_beta"]
    assert b_churn > 0.95
    assert b_fixed < 0.2
    assert b_churn > b_fixed


def test_heaps_exponent_rejects_single_bucket(spark):
    df = _docs(spark, [(1, "a", "en", "s0")])
    with pytest.raises(ValueError, match="buckets"):
        L.heaps_exponent(df, buckets=1)


def test_heaps_exponent_null_when_x_variance_quantizes_to_zero(spark):
    # 65536 = 2^16 tokens in bucket 1, +1 token in bucket 2: both
    # checkpoints' cum_tokens quantize to the SAME Q12 log (the +1 sits
    # far below the ~0.017% Q12 resolution and 2^16 is safely mid-cell),
    # so the regression denominator is exactly 0 -> explicit NULL beta,
    # not NaN-by-accident (ADVICE r11)
    assert _log2_ref(65536) == _log2_ref(65537)
    df = _docs(
        spark,
        [(1, " ".join("a" for _ in range(65536)), "en", "s0"), (2, "b", "en", "s0")],
    )
    rows = L.heaps_exponent(df, buckets=2).collect()
    assert len(rows) == 1
    assert rows[0]["n_checkpoints"] == 2
    assert rows[0]["heaps_beta"] is None


def test_nb_domain_llr_null_filter_is_background(spark):
    # NULL lang -> target_filter evaluates NULL -> coalesced to FALSE:
    # the document is counted in (and scored against) the background
    # class, never silently dropped from both (ADVICE r11)
    df = _docs(
        spark,
        [(1, "a a b", "en", "s0"), (2, "a c c", "fr", "s0"), (3, "b c", None, "s0")],
    )
    rows = {r["doc_id"]: r for r in L.nb_domain_llr(df, "lang = 'en'").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["is_target"] is True
    assert rows[2]["is_target"] is False
    assert rows[3]["is_target"] is False
    # and its tokens really entered the background counts: the scorer on
    # an explicit-false corpus must agree exactly
    df2 = _docs(
        spark,
        [(1, "a a b", "en", "s0"), (2, "a c c", "fr", "s0"), (3, "b c", "xx", "s0")],
    )
    rows2 = {r["doc_id"]: r for r in L.nb_domain_llr(df2, "lang = 'en'").collect()}
    for i in (1, 2, 3):
        assert rows[i]["llr_bits_per_token"] == rows2[i]["llr_bits_per_token"]


# ------------------------------------------------- synthetic Zipf corpus


def test_zipf_synth_docs_deterministic_and_passthrough(spark):
    df = _docs(spark, [(1, "orig one", "en", "s0"), (2, "orig two", "fr", "s1")])
    a = {r["doc_id"]: r for r in L.zipf_synth_docs(df, tokens_per_doc=8).collect()}
    b = {r["doc_id"]: r for r in L.zipf_synth_docs(df, tokens_per_doc=8).collect()}
    assert a.keys() == b.keys() == {1, 2}
    for i in (1, 2):
        assert a[i]["text"] == b[i]["text"]          # deterministic
        assert len(a[i]["text"].split(" ")) == 8
        assert a[i]["lang"] == df.where(f"doc_id = {i}").first()["lang"]
    # seed changes the draw
    c = {r["doc_id"]: r for r in
         L.zipf_synth_docs(df, tokens_per_doc=8, seed="other").collect()}
    assert c[1]["text"] != a[1]["text"]
    with pytest.raises(ValueError, match="tokens_per_doc"):
        L.zipf_synth_docs(df, tokens_per_doc=0)


def test_zipf_synth_docs_is_heavy_tailed(spark):
    # 200 docs x 32 tokens: rank-1 word holds ~1/2 of all tokens
    # (pmf 1/r(r+1)), and the Heaps exponent is discriminating (~0.56) —
    # the property the degenerate testdata corpus cannot exhibit
    df = _docs(spark, [(i, "x", "en", "s0") for i in range(1, 201)])
    synth = L.zipf_synth_docs(df, tokens_per_doc=32)
    counts = (
        synth.select(L.F.explode(L.F.split("text", " ")).alias("w"))
        .groupBy("w").count().orderBy(L.F.desc("count")).limit(2).collect()
    )
    assert counts[0]["w"] == "w1"
    assert 0.4 < counts[0]["count"] / 6400 < 0.6
    beta = L.heaps_exponent(synth, buckets=5).collect()[0]["heaps_beta"]
    assert 0.35 < beta < 0.8
