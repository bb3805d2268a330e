"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship document-assembly query (the reference's
core capability re-expressed Spark-first) on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from
SURVEY.md §2 + the LLM-pipeline extensions, each as a
(spark, sf_dir) -> DataFrame callable with a DuckDB oracle where
SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: nested customer-360 documents (decode dims, nest
    orders, build titled JSON envelopes) at sf0.001 — the reference's
    document-assembly pipeline shape (SURVEY §1.4) on the test schema."""
    from pipeline_usnvc_spark.plans.flagship import customer_documents

    return customer_documents(spark, "/root/testdata/sf0.001")


# Queries that already have a green driver row in CORRECTNESS_r01.json
# or CORRECTNESS_r02.json. The driver samples a prefix of the registry
# in dict order, so ordering the not-yet-driver-verified queries FIRST
# (oracle-paired before rows-only) maximizes fresh external
# verification per round; prior greens go last — they remain covered
# by tests/test_oracle_parity. q104/q122 (the two red r02 rows, fixed
# by the HUGEINT oracle casts) are deliberately NOT listed so the r03
# sample re-verifies them.
_R01_VERIFIED = frozenset(
    {
        "q01_pricing_summary", "q02_filter_project", "q03_top_revenue_orders",
        "q04_dim_decode_chain", "q05_nest_orders_per_customer",
        "q06_conditional_extract", "q07_clean_string", "q08_display_title",
        "q09_split_flags", "q10_star_join", "q11_set_ops", "q12_window_topk",
        "q13_rollup", "q14_pivot", "q28_grouping_sets", "q111_global_share",
        "q20_hierarchy_ancestors", "q25_recursive_cte", "q21_hierarchy_children",
        "q22_hierarchy_descendant_counts", "q23_hierarchy_root_rewrite",
        "q30_token_count", "q31_lang_id", "q32_quality_score",
        "q36_quality_filter", "q38_source_entropy", "q37_train_eval_split",
        "q33_fingerprint", "q39_stratified_sample", "q68_bpe_token_estimate",
        "q69_weighted_sample", "q89_bm25_rank", "q106_rrf_hybrid_rank",
        "q50_exact_dedup", "q51_minhash_signature", "q52_lsh_candidate_pairs",
        "q53_simhash", "q57_span_dedup", "q54_ngram_jaccard",
        "q94_prefix_filter_jaccard", "q153_cross_source_dups",
        "q110_contamination", "q113_heavy_hitters", "q114_pii_redact",
        "q115_repetition_stats", "q116_sequence_packing", "q117_source_mixture",
        "q130_boilerplate_removal", "q131_vocab_coverage", "q134_bigram_lm",
    }
)

# Green rows from CORRECTNESS_r02.json (48 of 50 sampled; q104/q122
# excluded — see above).
_R02_VERIFIED = frozenset(
    {
        "q147_lm_surprisal", "q148_chunk_documents", "q149_distinctive_terms",
        # q61_embedding_near_dup deliberately omitted: its r02 green row
        # was vacuous (0 vs 0 rows); re-sample with the retuned threshold.
        "q60_cosine_topk", "q66_cosine_topk_arrow",
        "q135_int8_quantize", "q169_label_centroid_sim", "q170_matryoshka_overlap",
        "q173_embedding_dim_stats", "q157_quality_keeper", "q158_token_fertility",
        "q159_winsorize_values", "q160_novelty_score", "q161_temperature_mix",
        "q162_dup_rate_report", "q163_containment_pairs", "q165_source_quota_cap",
        "q166_temperature_quota_fill", "q167_curriculum_rank", "q168_zipf_fit",
        "q172_neardup_threshold_sweep", "q174_curation_pipeline",
        "q175_feature_hashing", "q176_lsh_parameter_plan", "q177_curation_funnel",
        "q187_decontaminated_split", "q188_token_budget_report",
        "q189_neardup_pair_diagnostics", "q186_filtered_vector_search",
        "q40_sessionize", "q41_tumbling_window", "q45_range_join", "q42_asof_join",
        "q79_gap_fill", "q103_native_session_window", "q105_retention_cohorts",
        "q112_time_weighted_avg", "q118_max_concurrency", "q121_markov_transitions",
        "q133_sliding_zscore", "q141_ohlc_bars", "q151_asof_forward",
        "q152_user_mode", "q181_ewma_user_value", "q15_semi_anti_join",
        "q16_cube", "q17_unpivot",
    }
)

# Green rows from CORRECTNESS_r03.json (49 of 50 sampled; the one
# red row, q59_regexp_gauntlet, was a driver-canonicalizer err on raw
# array<string> columns — fixed via concat_ws serialization and pinned
# first below for re-sampling).
_R03_VERIFIED = frozenset(
    {
        "q104_growth_accounting", "q107_variant_extract",
        "q108_udtf_sentence_split", "q122_interval_coverage",
        "q150_salted_join", "q184_xml_roundtrip", "q18_date_arith",
        "q195_hard_negatives", "q196_dim_correlation", "q197_shard_pack",
        "q19_count_distinct", "q200_pmi_cooccurrence",
        "q201_last_touch_attribution", "q202_interarrival_burstiness",
        "q203_quality_logit", "q204_quantile_transform",
        "q205_rolling_active_users", "q206_prepare_corpus",
        "q207_pseudonymize", "q208_conversion_funnel", "q211_epoch_upsample",
        "q24_hierarchy_path", "q26_json_roundtrip", "q27_subqueries_sql",
        "q29_full_outer_join", "q34_term_stats", "q35_tfidf_topk",
        "q43_sliding_window", "q44_first_last_lag", "q46_percentiles",
        "q47_levenshtein_pairs", "q48_null_semantics", "q49_scalar_gauntlet",
        "q55_dup_clusters", "q56_dedup_pipeline", "q58_array_gauntlet",
        "q61_embedding_near_dup", "q67_window_gauntlet",
        "q72_datetime_gauntlet", "q73_posexplode_tokens", "q74_salted_agg",
        "q75_map_gauntlet", "q76_trycast_gauntlet", "q77_stats_gauntlet",
        "q78_conditional_agg", "q80_streaming_hourly",
        "q82_incremental_upsert", "q84_json_path", "q86_null_safe_join",
    }
)

_DRIVER_VERIFIED = _R01_VERIFIED | _R02_VERIFIED | _R03_VERIFIED


# Queries ADDED late in round 4 (after the 50-slot sample was already
# full): they sort after the two showcase rows-only entries so they
# cannot displace the never-sampled backlog; round 5 picks them up.
_R04_LATE = (
    "q216_forecast_revenue_change",
    "q217_dsir_importance",
    "q218_gopher_quality_gate",
    "q220_listagg_gauntlet",
    "q221_semantic_dedup",
    "q223_multiset_ops",
    "q224_null_ordering_gauntlet",
    "q225_collation_group",
    "q226_rolling_median",
    "q227_rfm_segmentation",
    "q228_association_rules",
    "q229_top_paths",
    "q230_benford_audit",
    "q231_weighted_median",
    "q232_gini_spend",
    "q233_time_to_convert",
    "q234_shipping_sla",
    "q239_k_anonymity",
    "q245_bounce_rate",
    "q246_sorted_neighborhood",
    "q247_quantile_normalize_sources",
    "q248_minhash_calibration",
    "q249_incremental_dedup",
    "q254_json_flatten",
    "q256_trimmed_mean",
    "q259_ngram_diversity",
    "q264_cuped_adjustment",
    "q250_freshness_report",
    "q263_neyman_allocation",
    "q267_histogram_overlap",
    "q272_gate_agreement",
    "q275_error_slo_deciles",
    "q277_degree_powerlaw",
    "q278_gaps_and_islands",
    "q282_apriori_triples",
    "q284_wow_change",
    "q290_daily_entropy_trend",
    "q292_source_vocab_overlap",
    "q294_seasonal_naive_backtest",
    "q295_dispersion_index",
    "q296_discount_response",
    "q297_supplier_hhi",
    "q301_lift_table",
    "q303_dow_seasonality",
    "q309_inventory_turns",
    "q311_weighted_sample_wr",
)

# Two rows-only queries pinned INSIDE the sample on purpose (VERDICT
# r03 item 4): they carry runtime assert_true accuracy contracts, so
# their rows-only driver rows certify ANN recall, not just counts.
_R04_SHOWCASE_ROWS_ONLY = ("q62_lsh_topk", "q63_ivf_topk")


def _ordered_names() -> list[str]:
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    names = list(QUERIES)
    # Fixed-this-round queries go first so the driver's sample prefix
    # is guaranteed to re-verify them (VERDICT r03 items 1 and 2:
    # q59's array columns now serialize through concat_ws).
    recheck = [n for n in ("q59_regexp_gauntlet",) if n in names]
    pinned = set(recheck) | set(_R04_SHOWCASE_ROWS_ONLY) | set(_R04_LATE)
    fresh_oracle = [
        n
        for n in names
        if n not in _DRIVER_VERIFIED and n in ORACLES and n not in pinned
    ]
    showcase = [n for n in _R04_SHOWCASE_ROWS_ONLY if n in names]
    late = [n for n in _R04_LATE if n in names]
    fresh_rows_only = [
        n
        for n in names
        if n not in _DRIVER_VERIFIED and n not in ORACLES and n not in pinned
    ]
    seen = [n for n in names if n in _DRIVER_VERIFIED]
    return recheck + fresh_oracle + showcase + late + fresh_rows_only + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipeline_usnvc_spark.plans import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from pipeline_usnvc_spark.plans import ORACLES

    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
