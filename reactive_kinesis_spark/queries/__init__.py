"""Query registry — the engine's public query surface.

Every implemented operator from SURVEY.md §2 is exposed here as a named query
``(spark, sf_dir) -> DataFrame`` together with (when SQL-expressible) a
DuckDB oracle SQL string computing the same result. The driver hash-compares
the two at sf0.01 (CORRECTNESS_r{N}.json).

Conventions (critical for the hash compare):
* every computed column is aliased identically in Spark and SQL;
* DOUBLE aggregates go through the exact DECIMAL(38,6) path
  (:mod:`reactive_kinesis_spark.functions`) so both engines emit
  bit-identical doubles;
* queries with LIMIT/top-k are totally ordered with unique tie-breakers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


#: Driver-visibility rotation (round 12) — the CERTIFICATION-DEBT round
#: (r11 verdict Next #1). The driver's correctness run samples the FIRST
#: 50 registry entries; with 183 oracle-backed queries, the rest must sit
#: past the window each round. Policy: the least-driver-certified queries
#: get the visible slots — never-certified first, then queries whose CODE
#: OR ORACLE CHANGED since their last green row (a stale green row proves
#: the old query, not this one), then by staleness. This round:
#:   slots 0-3   — the four NEW round-12 queries: q186/q187/q188 (the
#:                 lexstats tier re-certified on the deterministic
#:                 heavy-tailed synthetic corpus, where Heaps beta ≈ 0.57
#:                 and the Zipf slope ≈ −1.7 actually discriminate) and
#:                 q189 (top-k principal components by exact-integer
#:                 Hotelling deflation over the q183 power iteration) —
#:                 never certified, so they outrank every green row;
#:   slots 4-6   — r11-certified queries whose CODE AND ORACLE changed
#:                 this round and need re-proving: q177 (NULL target
#:                 filter now coalesces to background), q183 (GREATEST
#:                 maxc guard in the covariance quantization), q185
#:                 (explicit NULL beta on zero x-variance) — all three
#:                 ADVICE closures with oracle-text edits;
#:   slots 7-39  — ALL 33 _DEFERRED_R12 entries, burned to zero as the
#:                 r11 verdict's first ask: led by the twice-displaced
#:                 q126/q127/q129, then the r7-certified q130–q141/q37/
#:                 q44/q45/q50/q51/q68–q75/q99/q141 blocks and the
#:                 q16–q29 block (r7-certified, 5 rounds stale);
#:   slots 40-49 — the 10 alphabetically-first of the 50 r9-certified
#:                 queries (q02/q05/q07/q09/q102–q108 block) — the next-
#:                 oldest debt tier; the other 40 move to _DEFERRED_R13.
#: Everything past the window remains fully oracle-checked locally every
#: session (tests/test_oracle_parity.py runs the ENTIRE registry against
#: DuckDB), and tools/round_end.py FAILS the round if this window equals
#: the previous round's CORRECTNESS key set or if any oracle-count
#: literal in this file drifts from the live registry.
_WINDOW = (
    # -- round-12 new queries (never certified) --
    "q186_zipf_synth_growth",
    "q187_zipf_synth_slope",
    "q188_zipf_synth_heaps",
    "q189_deflation_pcs",
    # -- code+oracle changed this round (ADVICE closures) --
    "q177_domain_affinity",
    "q183_power_iteration_pc",
    "q185_heaps_exponent",
    # -- the full _DEFERRED_R12 burn-down (r7-certified; q126/q127/q129
    #    twice-displaced) --
    "q126_bfs_hops",
    "q127_association_rules",
    "q129_link_prediction",
    "q130_quantile_normalize",
    "q131_gini_concentration",
    "q132_attribution",
    "q133_lorenz_deciles",
    "q135_rfm_segments",
    "q136_ewma_smoothing",
    "q138_calibration_bins",
    "q139_countmin_sketch",
    "q140_hits_scores",
    "q37_range_join",
    "q44_deterministic_sample",
    "q45_correlated_subquery",
    "q50_stats_moments",
    "q51_percentiles",
    "q68_embedding_quantization",
    "q69_duplicate_spans",
    "q70_async_enrichment",
    "q71_vocabulary_topk",
    "q72_collocations",
    "q74_stratified_sample",
    "q75_rare_word_scoring",
    "q99_resample_daily",
    "q141_simpson_diversity",
    "q16_part_supplier_join",
    "q18_events_json_props",
    "q19_events_asof_join",
    "q20_events_sessions",
    "q21_dedup_exact",
    "q22_dedup_ngram_jaccard",
    "q29_embedding_cosine_topk",
    # -- oldest remaining debt: first 11 of the 50 r9-certified --
    "q02_filter_project",
    "q05_anti_join",
    "q07_semi_join",
    "q09_window_analytic",
    "q102_bm25_scoring",
    "q103_tf_cosine_pairs",
    "q104_seasonal_anomaly",
    "q105_trend_slope",
    "q106_name_edit_join",
    "q108_merge_upsert",
)
#: The 40 r9-certified queries the round-12 window could not fit (the
#: certification-debt round consumed all of _DEFERRED_R12, so the oldest
#: remaining tier is now r9 — 3 rounds stale at r12 close, exactly the
#: ≈3.5-round floor the 183-oracle/50-slot rotation math predicts).
#: Round 13 takes these FIRST.
_DEFERRED_R13 = (
    "q109_scd2_intervals",
    "q110_cooccurrence_pairs",
    "q111_triangle_stats",
    "q125_snapshot_drift",
    "q128_cusum_changepoint",
    "q12_set_ops",
    "q134_interarrival_burstiness",
    "q137_ks_test",
    "q13_scalar_functions",
    "q142_ab_ztest",
    "q143_mannwhitney_u",
    "q144_roc_auc",
    "q145_threshold_sweep",
    "q146_cohens_kappa",
    "q147_cumulative_gains",
    "q14_date_functions",
    "q15_distinct_agg",
    "q47_having",
    "q76_characteristic_terms",
    "q77_source_overlap",
    "q78_event_transitions",
    "q79_temperature_weights",
    "q80_incremental_dedup",
    "q82_heavy_hitters",
    "q83_chunking",
    "q84_weighted_sample",
    "q85_event_funnel",
    "q86_robust_outliers",
    "q87_surprisal_scoring",
    "q88_canonical_pick",
    "q89_table_profile",
    "q90_zscore_normalize",
    "q91_feature_hashing",
    "q92_centroid_similarity",
    "q93_session_paths",
    "q94_snapshot_diff",
    "q95_blocklist_stats",
    "q96_training_prep",
    "q97_resample_ffill",
    "q98_cohort_retention",
)
_WINDOW_RANK = {name: i for i, name in enumerate(_WINDOW)}


def _registry_order(item: tuple[str, QueryDef]) -> tuple[int, int, str]:
    """Driver-visibility ordering: the explicit window list by slot index,
    then the remaining oracle-backed queries (r6-certified + deferred,
    alphabetic), then rows-only queries (which get the weaker rows-only
    driver check wherever they land)."""
    name, qd = item
    if name in _WINDOW_RANK:
        return (0, _WINDOW_RANK[name], name)
    if qd.oracle is not None:
        return (1, 0, name)
    return (2, 0, name)


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (side-effect: registry population)."""
    from reactive_kinesis_spark.queries import (  # noqa: F401
        advanced,
        corpus,
        events,
        graph,
        llm,
        multimodal,
        quality,
        relational,
    )

    return dict(sorted(QUERIES.items(), key=_registry_order))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None}
