"""Degenerate-input sweep over the statistics tier (the round-7 q143
lesson: a query certified on varied SF data can still crash on a
constant-value corpus). Every query in the tier is driven through four
adversarial corpus shapes — EMPTY (zero rows), SINGLE (one row),
ALL-TIES (every value identical, every timestamp in the same second),
and ONE-SIDED (a single group/type carries the whole corpus) — and must
return (possibly zero rows) without raising. Shape-specific semantic
assertions pin the documented degenerate outputs (NaN z, NULL stat,
dropped rows)."""

from __future__ import annotations

import datetime
import math

import pytest

from reactive_kinesis_spark.queries import load_all

_REG = load_all()

_T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

_EVENT_QUERIES = [
    "q128_cusum_changepoint",
    "q132_attribution",
    "q134_interarrival_burstiness",
    "q136_ewma_smoothing",
    "q137_ks_test",
    "q142_ab_ztest",
    "q143_mannwhitney_u",
]

_DOC_QUERIES = [
    "q130_quantile_normalize",
    "q138_calibration_bins",
    "q141_simpson_diversity",
    "q144_roc_auc",
    "q145_threshold_sweep",
    "q146_cohens_kappa",
    "q147_cumulative_gains",
]


def _write_events(spark, sf_dir: str, rows) -> None:
    """rows: (event_id, seconds_offset, user_id, event_type, value)."""
    spark.createDataFrame(
        [
            (int(i), _T0 + datetime.timedelta(seconds=s), int(u), t, float(v), "{}")
            for i, s, u, t, v in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")


def _write_documents(spark, sf_dir: str, rows) -> None:
    """rows: (doc_id, text, lang, source)."""
    spark.createDataFrame(
        [(int(i), t, lg, src, len(t)) for i, t, lg, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


def _event_shape(name: str):
    if name == "empty":
        return []
    if name == "single":
        return [(0, 0, 1, "click", 5.0)]
    if name == "all_ties":
        # 6 rows, same value, same second, split across two types/users
        return [
            (i, 0, 1 if i < 3 else 2, "click" if i < 3 else "view", 5.0)
            for i in range(6)
        ]
    if name == "one_sided":
        # a single event_type (and a single user, even cohort) carries
        # everything — exercises n_rest = 0 / missing-cohort paths
        return [(i, i, 2, "click", float(i)) for i in range(5)]
    raise AssertionError(name)


def _doc_shape(name: str):
    if name == "empty":
        return []
    if name == "single":
        return [(0, "hello world.", "en", "s0")]
    if name == "all_ties":
        return [(i, "same text here.", "en", "s0") for i in range(4)]
    if name == "one_sided":
        return [(i, "x" * (10 + i), "en", "s0") for i in range(4)]
    raise AssertionError(name)


_SHAPES = ["empty", "single", "all_ties", "one_sided"]


@pytest.mark.parametrize("qname", _EVENT_QUERIES)
@pytest.mark.parametrize("shape", _SHAPES)
def test_event_query_survives_degenerate_corpus(spark, tmp_path, qname, shape):
    _write_events(spark, str(tmp_path), _event_shape(shape))
    rows = _REG[qname].fn(spark, str(tmp_path)).collect()
    assert isinstance(rows, list)  # no raise is the contract
    if shape == "empty":
        if qname == "q142_ab_ztest":
            # the cohort pivot always yields its single row; every
            # measure is NULL on an empty corpus
            assert len(rows) == 1 and rows[0].n0 is None
        elif qname == "q143_mannwhitney_u":
            # scalar report: one row, NULL counts (and NaN z — the
            # NULL sigma falls through the > 0 gate)
            assert len(rows) == 1 and rows[0].na is None
            assert math.isnan(rows[0].z)
        else:
            assert rows == []


@pytest.mark.parametrize("qname", _DOC_QUERIES)
@pytest.mark.parametrize("shape", _SHAPES)
def test_doc_query_survives_degenerate_corpus(spark, tmp_path, qname, shape):
    _write_documents(spark, str(tmp_path), _doc_shape(shape))
    rows = _REG[qname].fn(spark, str(tmp_path)).collect()
    assert isinstance(rows, list)
    if shape == "empty":
        if qname == "q145_threshold_sweep":
            # static-spine report: the full grid survives, all-zero counts
            assert len(rows) == 20 and all(r.tp == 0 for r in rows)
        elif qname == "q147_cumulative_gains":
            assert len(rows) == 10 and all(r.cum_docs == 0 for r in rows)
        else:
            assert rows == []


# ------------------------------------------------- pinned degenerate values


def test_burstiness_all_zero_gaps_is_nan(spark, tmp_path):
    # >= 2 gaps, all zero seconds apart: sigma + mu = 0 exactly
    _write_events(
        spark, str(tmp_path), [(i, 0, 1, "click", 1.0) for i in range(4)]
    )
    [r] = _REG["q134_interarrival_burstiness"].fn(spark, str(tmp_path)).collect()
    assert (r.mean_gap_sec, r.sigma_gap_sec) == (0.0, 0.0)
    assert math.isnan(r.burstiness)


def test_ks_single_type_rows_are_dropped(spark, tmp_path):
    # only clicks: "rest" is empty for the one type — KS undefined, dropped
    _write_events(
        spark, str(tmp_path), [(i, i, 1, "click", float(i)) for i in range(4)]
    )
    assert _REG["q137_ks_test"].fn(spark, str(tmp_path)).collect() == []


def test_ztest_all_conversions_is_nan_z(spark, tmp_path):
    # both cohorts convert 100%: pooled p = 1 → se = 0 → NaN z
    rows = [(i, i, i, "purchase", 1.0) for i in range(4)]  # users 0..3
    _write_events(spark, str(tmp_path), rows)
    [r] = _REG["q142_ab_ztest"].fn(spark, str(tmp_path)).collect()
    assert r.p0 == 1.0 and r.p1 == 1.0
    assert math.isnan(r.z)


def test_ztest_no_conversions_is_nan_z(spark, tmp_path):
    rows = [(i, i, i, "view", 1.0) for i in range(4)]
    _write_events(spark, str(tmp_path), rows)
    [r] = _REG["q142_ab_ztest"].fn(spark, str(tmp_path)).collect()
    assert r.p0 == 0.0 and r.p1 == 0.0
    assert math.isnan(r.z)


def test_cusum_zero_total_group_reports_null_stat(spark, tmp_path):
    """The OPERATOR accepts signed integer series; a group summing to 0
    has no normalizer — NULL stat, exact means preserved."""
    from reactive_kinesis_spark.queries.events import cusum_changepoints

    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, -5), ("h", 1, 3), ("h", 2, 9)],
        "k string, t int, x long",
    )
    got = {
        r.k: r for r in cusum_changepoints(df, ["k"], "t", "x").collect()
    }
    assert got["g"].cusum_stat is None
    assert (got["g"].mean_before, got["g"].mean_after) == (5.0, -5.0)
    assert got["h"].cusum_stat is not None and got["h"].cusum_stat > 0


def test_simpson_single_language_source_is_zero(spark, tmp_path):
    _write_documents(
        spark, str(tmp_path), [(i, f"text {i}", "en", "s0") for i in range(5)]
    )
    [r] = _REG["q141_simpson_diversity"].fn(spark, str(tmp_path)).collect()
    assert (r.n_docs, r.n_langs, r.simpson_diversity) == (5, 1, 0.0)
