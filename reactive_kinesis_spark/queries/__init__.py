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


#: Driver-visibility rotation (round 10). The driver's correctness run samples
#: the FIRST 50 registry entries; with 149 oracle-backed queries, the rest
#: must sit past the window each round. Policy: the least-driver-certified
#: queries get the visible slots — never-certified first, then queries whose
#: CODE OR ORACLE CHANGED since their last green row (a stale green row
#: proves the old query, not this one), then by staleness. This round:
#:   slots 0-13  — round-10 never-hash-certified queries: the twelve NEW
#:                 round-10 operators (q148 SemDeDup, q149 quality-rule
#:                 battery, q150 token-budget allocation, q151 portable
#:                 HLL, q152 semantic decontamination, q153 OOV rate,
#:                 q154 hard negatives, q155 product quantization, q156
#:                 PQ-ADC search, q157 MinHash estimator audit, q158
#:                 retrieval eval, q159 near-dup family agreement) and
#:                 the
#:                 four oracle graduations — q23/q24 (MinHash-LSH /
#:                 SimHash via the portable md5-prefix hash family) and
#:                 q122/q123 (perceptual-hash near-dup via the
#:                 integer-exact aHash), each with a fully unrolled
#:                 oracle;
#:   slots 16-49 — 34 of the 39 _DEFERRED_R9 queries (r6-certified, the
#:                 oldest rows in the ledger); the other five (q62,
#:                 q64-q67, displaced by q155-q159) head _DEFERRED_R11
#:                 alongside ALL 44 r7-certified queries (the
#:                 149-oracle/50-slot rotation math makes a ≈3-round
#:                 staleness floor the best achievable).
#: Everything past the window remains fully oracle-checked locally every
#: session (tests/test_oracle_parity.py runs the ENTIRE registry against
#: DuckDB).
_WINDOW = (
    # -- round-10 new operators (never hash-certified) --
    "q148_semantic_dedup",
    "q149_quality_rule_battery",
    "q150_token_budget",
    "q151_hll_portable",
    "q152_semantic_decontamination",
    "q153_oov_rate",
    "q154_hard_negatives",
    "q155_product_quantization",
    "q156_pq_adc_search",
    "q157_minhash_estimator_audit",
    "q158_retrieval_eval",
    "q159_neardup_agreement",
    # -- round-10 oracle graduations (never hash-certified) --
    "q23_dedup_minhash_lsh",
    "q24_dedup_simhash",
    "q122_media_phash_neardup",
    "q123_media_phash_capped",
    # -- _DEFERRED_R9 (r6-certified, oldest debt — all 39) --
    "q112_quality_checks",
    "q113_winsorize",
    "q114_rrf_fusion",
    "q115_label_propagation",
    "q117_train_val_test",
    "q118_sorted_neighborhood",
    "q119_equidepth_histogram",
    "q120_pit_join",
    "q17_events_hourly_window",
    "q25_text_stats_by_lang",
    "q26_quality_scores",
    "q27_fingerprint_stats",
    "q28_lang_id",
    "q31_embedding_centroids",
    "q32_media_decode",
    "q33_frame_sample",
    "q35_grouping_sets",
    "q39_sliding_window",
    "q40_salted_agg",
    "q41_interval_self_join",
    "q43_bpe_token_stats",
    "q46_scalar_subquery",
    "q48_pivot",
    "q49_unpivot",
    "q52_higher_order_array",
    "q53_nullsafe_join",
    "q54_filtered_agg",
    "q55_window_distribution",
    "q56_collect_agg",
    "q57_map_functions",
    "q58_compound_subqueries",
    "q59_range_frame_window",
    "q60_dedup_clusters",
    "q61_curation_pipeline",
)
#: Queries that don't fit this round's window (5 displaced R9-deferred —
#: 5 rounds stale, take these FIRST in round 11 — then the 44
#: r7-certified); they take round-11 slots (the 149-oracle/50-slot
#: rotation's staleness floor).
_DEFERRED_R11 = (
    "q62_token_packing",
    "q64_decontamination",
    "q65_mixture_sample",
    "q66_repetition_stats",
    "q67_pii_redaction",
    "q01_pricing_summary",
    "q03_join_agg_topk",
    "q04_star_join",
    "q06_outer_join_histogram",
    "q08_window_topk_per_group",
    "q107_pagerank",
    "q10_rollup",
    "q116_table_fingerprint",
    "q11_cube",
    "q121_weighted_pagerank",
    "q124_kmeans_clusters",
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
    "q141_simpson_diversity",
    "q16_part_supplier_join",
    "q18_events_json_props",
    "q19_events_asof_join",
    "q20_events_sessions",
    "q21_dedup_exact",
    "q22_dedup_ngram_jaccard",
    "q29_embedding_cosine_topk",
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
