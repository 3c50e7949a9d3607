"""Known-answer tests for the round-8 model-evaluation tier
(q144 ROC AUC, q145 threshold sweep, q146 Cohen's kappa, q147
cumulative gains): hand-computed micro-fixtures written as real parquet
documents tables, driven through the registry query functions —
semantic grounding independent of the DuckDB parity gate, plus the
degenerate shapes (one-class corpus, constant raters) the tier must
survive per the q143 lesson."""

from __future__ import annotations

import math

import pytest

from reactive_kinesis_spark.queries import load_all

_REG = load_all()

# quality_score = 0.4·min(1, nt/100) + 0.3·(nd/nt) + 0.3·min(1, 4·ns/nt)
# (nt tokens, nd distinct, ns stopwords from {the,a,of,and,in}) — texts
# below are chosen so the scores and labels (n_chars >= 300) are exact.
LOW_SHORT = "aa bb cc"  # score 0.312, 8 chars  -> r1=0, neg
HIGH_SHORT = "the a of and in"  # score 0.620, 15 chars -> r1=1, neg
HIGH_LONG = " ".join(["the a of and in"] * 100)  # 0.7003, 1599 chars -> r1=1, pos
# 3 distinct 120-char tokens: score 0.312 (ties LOW_SHORT), 362 chars -> pos
LOW_LONG = " ".join(ch * 120 for ch in "xyz")


def _write_documents(spark, sf_dir: str, rows) -> None:
    """rows: (doc_id, text, source)."""
    spark.createDataFrame(
        [(int(i), t, "en", src, len(t)) for i, t, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- q144 AUC


def test_auc_perfect_separation_is_one(spark, tmp_path):
    rows = [(0, HIGH_LONG, "s0"), (1, HIGH_LONG + " x", "s0")]  # pos, high
    rows += [(2, LOW_SHORT, "s0"), (3, LOW_SHORT + "!", "s0")]  # neg, low
    _write_documents(spark, str(tmp_path), rows)
    [r] = _REG["q144_roc_auc"].fn(spark, str(tmp_path)).collect()
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.auc == 1.0


def test_auc_complete_tie_is_half(spark, tmp_path):
    # LOW_LONG (pos) and LOW_SHORT (neg) have the SAME score 0.312
    _write_documents(
        spark, str(tmp_path), [(0, LOW_LONG, "s0"), (1, LOW_SHORT, "s0")]
    )
    [r] = _REG["q144_roc_auc"].fn(spark, str(tmp_path)).collect()
    assert (r.n_pos, r.n_neg) == (1, 1)
    assert r.auc == 0.5


def test_auc_reversed_ranking_is_zero(spark, tmp_path):
    # positives score LOWER than negatives: AUC = 0
    _write_documents(
        spark, str(tmp_path), [(0, LOW_LONG, "s0"), (1, HIGH_SHORT, "s0")]
    )
    [r] = _REG["q144_roc_auc"].fn(spark, str(tmp_path)).collect()
    assert r.auc == 0.0


def test_auc_single_class_source_is_nan(spark, tmp_path):
    _write_documents(
        spark, str(tmp_path), [(0, LOW_SHORT, "s0"), (1, HIGH_SHORT, "s0")]
    )
    [r] = _REG["q144_roc_auc"].fn(spark, str(tmp_path)).collect()
    assert r.n_pos == 0
    assert math.isnan(r.auc)


# -------------------------------------------------------------- q146 kappa


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    # r1 (score>=0.5) and r2 (long) agree on every doc
    rows = [(i, HIGH_LONG, "s0") for i in range(3)]
    rows += [(10 + i, LOW_SHORT, "s0") for i in range(3)]
    _write_documents(spark, str(tmp_path), rows)
    [r] = _REG["q146_cohens_kappa"].fn(spark, str(tmp_path)).collect()
    assert (r.n_both_pos, r.n_both_neg, r.n_docs) == (3, 3, 6)
    assert r.po == 1.0 and r.kappa == 1.0


def test_kappa_constant_raters_is_nan(spark, tmp_path):
    # every doc: r1=0, r2=0 -> pe = 1 -> chance agreement total
    _write_documents(
        spark, str(tmp_path), [(i, LOW_SHORT, "s0") for i in range(4)]
    )
    [r] = _REG["q146_cohens_kappa"].fn(spark, str(tmp_path)).collect()
    assert r.po == 1.0 and r.pe == 1.0
    assert math.isnan(r.kappa)


def test_kappa_systematic_disagreement_is_negative(spark, tmp_path):
    # r1=1/r2=0 and r1=0/r2=1 in equal measure: kappa = -1
    rows = [(i, HIGH_SHORT, "s0") for i in range(2)]  # r1=1, neg
    rows += [(10 + i, LOW_LONG, "s0") for i in range(2)]  # r1=0, pos
    _write_documents(spark, str(tmp_path), rows)
    [r] = _REG["q146_cohens_kappa"].fn(spark, str(tmp_path)).collect()
    assert r.po == 0.0
    assert r.kappa == -1.0


# -------------------------------------------------- q145 / q147 invariants


def _mixed_corpus():
    rows = [(i, HIGH_LONG, "s0") for i in range(4)]  # pos, score .70
    rows += [(10 + i, LOW_LONG, "s0") for i in range(2)]  # pos, score .31
    rows += [(20 + i, HIGH_SHORT, "s0") for i in range(3)]  # neg, score .62
    rows += [(30 + i, LOW_SHORT, "s0") for i in range(5)]  # neg, score .31
    return rows  # 6 pos / 8 neg


def test_threshold_sweep_confusion_identities(spark, tmp_path):
    _write_documents(spark, str(tmp_path), _mixed_corpus())
    rows = _REG["q145_threshold_sweep"].fn(spark, str(tmp_path)).collect()
    assert [r.bin for r in rows] == list(range(20))  # static spine
    total_pos, total = 6, 14
    prev_tp = None
    for r in rows:
        assert r.tp + r.fn == total_pos
        assert r.tp + r.fp + r.fn + r.tn == total
        assert r.threshold == r.bin / 20.0
        if prev_tp is not None:
            assert r.tp <= prev_tp  # raising the threshold never gains tp
        prev_tp = r.tp
    at0 = rows[0]  # threshold 0: everything predicted positive
    assert at0.tp == total_pos and at0.tn == 0
    assert at0.rec == 1.0 and at0.prec == total_pos / total
    # above every score (bins 15+: max score is .7003 -> bin 14): nothing
    # predicted positive -> precision NaN, recall 0
    assert rows[15].tp == 0 and math.isnan(rows[15].prec) and rows[15].rec == 0.0


def test_cumulative_gains_reaches_one_and_unit_lift(spark, tmp_path):
    _write_documents(spark, str(tmp_path), _mixed_corpus())
    rows = _REG["q147_cumulative_gains"].fn(spark, str(tmp_path)).collect()
    assert [r.bin for r in rows] == list(range(10))
    by_bin = {r.bin: r for r in rows}
    # bottom of the DESC cumulative (bin 0) covers the whole corpus
    assert by_bin[0].cum_docs == 14 and by_bin[0].cum_pos == 6
    assert by_bin[0].gain == 1.0 and by_bin[0].lift == 1.0
    # the top populated decile (score .70 -> bin 7) is all positives:
    # lift = (4/4)/(6/14) = 14/6
    assert by_bin[7].cum_docs == 4 and by_bin[7].cum_pos == 4
    assert by_bin[7].lift == pytest.approx(14.0 / 6.0)
    # deciles above any score are empty prefixes -> NaN lift, on the spine
    assert math.isnan(by_bin[9].lift)
    # gain is nondecreasing as the prefix grows (bin DESC)
    gains = [r.gain for r in sorted(rows, key=lambda r: -r.bin) if not math.isnan(r.gain)]
    assert gains == sorted(gains)


def test_gains_no_positives_is_nan(spark, tmp_path):
    _write_documents(
        spark, str(tmp_path), [(i, LOW_SHORT, "s0") for i in range(3)]
    )
    rows = _REG["q147_cumulative_gains"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    assert all(math.isnan(r.gain) for r in rows)
