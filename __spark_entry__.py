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


# Queries with a green driver row in a prior round's CORRECTNESS
# file. The driver samples a 50-query prefix of the registry in dict
# order, so ordering the not-yet-driver-verified queries FIRST
# (oracle-paired before rows-only) maximizes fresh external
# verification per round; prior greens go last — they remain covered
# by tests/test_oracle_parity (the full 259-oracle registry replays
# in pytest every round).
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
        "q110_contamination", "q114_pii_redact",
        "q115_repetition_stats", "q116_sequence_packing", "q117_source_mixture",
        "q130_boilerplate_removal", "q131_vocab_coverage", "q134_bigram_lm",
    }
)

_R02_VERIFIED = frozenset(
    {
        "q147_lm_surprisal", "q148_chunk_documents", "q149_distinctive_terms",
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

_R04_VERIFIED = frozenset(
    {
        "q59_regexp_gauntlet", "q87_fk_orphan_audit", "q88_price_histogram",
        "q90_scd2_history", "q91_session_funnel", "q92_table_diff",
        "q93_merge_upsert", "q95_column_profile", "q96_equidepth_histogram",
        "q97_triangle_count", "q98_skyline", "q99_int_shingle_jaccard",
        "q102_lateral_topk", "q109_scd2_point_in_time", "q119_mad_outliers",
        "q120_bfs_reachability", "q124_small_qty_revenue",
        "q125_large_volume_orders", "q126_top_part_family_suppliers",
        "q127_sole_late_supplier", "q128_rich_inactive_customers",
        "q129_nation_market_share", "q136_local_commerce_revenue",
        "q137_returned_top_customers", "q138_priority_by_returnflag",
        "q139_disjunctive_revenue", "q140_count_min", "q142_trend_regression",
        "q143_priority_order_check", "q144_customer_order_distribution",
        "q145_volume_shipping", "q146_product_profit", "q154_forecast_revenue",
        "q155_promo_share", "q156_top_supplier", "q180_blocked_fuzzy_pairs",
        "q182_constraint_checks", "q183_bitmap_distinct",
        "q185_join_key_skew_audit", "q190_psi_drift", "q191_ks_drift",
        "q192_chi2_type_hour", "q193_cusum_changepoint",
        "q194_acf_daily_counts", "q198_kmv_distinct", "q213_min_cost_supplier",
        "q214_part_value_share", "q215_supplier_exclusion_count",
        # contract-carrying rows-only showcases executed in the r04
        # sample (recall-bound contracts live in-plan):
        "q62_lsh_topk", "q63_ivf_topk",
    }
)

# Green rows from CORRECTNESS_r05.json: 46/46 sampled oracle rows
# hash-green, plus the four contract-carrying rows-only rows that
# executed clean under their in-plan contracts (q113's Misra-Gries
# bound recheck, q219's BPE round-trip, q222's streaming-vs-batch
# near-dup audit, q212's HLL-vs-exact error contract) — VERDICT r05
# item 1 counts all of them as driver-verified.
_R05_VERIFIED = frozenset(
    {
        "q216_forecast_revenue_change", "q217_dsir_importance",
        "q218_gopher_quality_gate", "q220_listagg_gauntlet",
        "q221_semantic_dedup", "q223_multiset_ops",
        "q224_null_ordering_gauntlet", "q225_collation_group",
        "q226_rolling_median", "q227_rfm_segmentation",
        "q228_association_rules", "q229_top_paths", "q230_benford_audit",
        "q231_weighted_median", "q232_gini_spend", "q233_time_to_convert",
        "q234_shipping_sla", "q239_k_anonymity", "q245_bounce_rate",
        "q246_sorted_neighborhood", "q247_quantile_normalize_sources",
        "q248_minhash_calibration", "q249_incremental_dedup",
        "q250_freshness_report", "q254_json_flatten", "q256_trimmed_mean",
        "q259_ngram_diversity", "q263_neyman_allocation",
        "q264_cuped_adjustment", "q267_histogram_overlap",
        "q272_gate_agreement", "q275_error_slo_deciles",
        "q277_degree_powerlaw", "q278_gaps_and_islands",
        "q282_apriori_triples", "q284_wow_change", "q290_daily_entropy_trend",
        "q292_source_vocab_overlap", "q294_seasonal_naive_backtest",
        "q295_dispersion_index", "q296_discount_response",
        "q297_supplier_hhi", "q301_lift_table", "q303_dow_seasonality",
        "q309_inventory_turns", "q311_weighted_sample_wr",
        # contract-carrying rows-only rows executed in the r05 sample:
        "q113_heavy_hitters", "q219_bpe_encode", "q222_streaming_neardup",
        "q212_rolling_actives_sketch",
    }
)

# Green rows from CORRECTNESS_r06.json: 33/33 sampled oracle rows
# hash-green (the q282 re-record after its round-6 plan rewrite, all
# 20 _R05_LATE backlog queries, and 12 of the round-6 stats family),
# plus the 15 contract-carrying rows-only queries that executed clean
# under their in-plan contracts (recall bounds, HLL/KLL error bounds,
# PageRank mass conservation, k-means invariants, BPE round-trip,
# streaming batch-equivalence) — VERDICT r06 counts all of them as
# driver-verified. q70/q199 are deliberately ABSENT: their driver rows
# crashed in the driver's canonicalizer on raw array<float> columns;
# fixed this round (6dp JSON serialization in the driver-facing final
# select) and re-pinned first for a clean row.
_R06_VERIFIED = frozenset(
    {
        "q282_apriori_triples", "q235_theil_sen_trend", "q236_mann_kendall",
        "q237_js_divergence", "q238_lagged_crosscorr", "q240_qq_drift",
        "q241_time_in_state", "q243_pareto_coverage", "q251_lang_confusion",
        "q252_dedup_survivorship", "q253_priority_mix_shift",
        "q257_fano_factor", "q258_rfm_migration", "q260_quality_token_budget",
        "q262_leadtime_percentiles", "q266_hapax_ratio",
        "q268_length_lognormal_fit", "q269_order_gap_medians",
        "q270_repeat_purchase_survival", "q273_l_diversity",
        "q274_t_closeness", "q312_spearman_corr", "q313_mann_whitney",
        "q314_anova_f", "q315_two_proportion_z", "q316_theil_index",
        "q317_assortativity", "q318_burrows_delta", "q319_flesch_readability",
        "q320_poisson_bootstrap", "q321_episode_mining", "q322_cohens_d",
        "q323_kendall_tau_b",
        # contract-carrying rows-only rows executed clean in the r06
        # sample (`err: no_oracle` is the expected rows-only marker):
        "q64_multiprobe_lsh_topk", "q65_pq_topk", "q71_approx_count_distinct",
        "q81_stateful_sessionize", "q83_stream_dedup_watermark",
        "q85_approx_percentiles", "q100_hll_mergeable_distinct",
        "q101_pagerank", "q132_kmeans_clusters", "q164_embedding_near_dup_lsh",
        "q171_bpe_merge_train", "q178_label_propagation",
        "q179_streaming_term_counts", "q209_audio_features",
        "q210_video_frame_sample",
    }
)

# Green rows from CORRECTNESS_r07.json: 41/41 sampled oracle rows
# hash-green and 9/9 rows-only entries executed clean (including the
# q70/q199 canonicalizer-crash rechecks). q342 and q369 are
# deliberately ABSENT: q342's green row verified an EMPTY result at
# sf0.01 (degenerate `r <= 10` cap — vacuous signal) and q369's plan
# changed this round (vocab-grain broadcast removed), so both are
# re-pinned at the head of the round-8 sample for a fresh row
# (VERDICT r07 items 2/3).
_R07_VERIFIED = frozenset(
    {
        "q70_multimodal_features", "q199_thumbnail_grid",
        "q326_waterfill_budget", "q327_periodogram",
        "q328_pythagorean_means", "q329_tukey_outliers",
        "q330_kl_divergence", "q331_simpson_diversity",
        "q332_transition_entropy", "q333_holt_smoothing",
        "q334_cramers_v", "q335_image_phash_neardup",
        "q336_range_interval_window", "q337_stream_outer_join",
        "q338_systematic_sample", "q339_span_corruption",
        "q340_shapley_attribution", "q341_bh_fdr",
        "q343_jackknife_source", "q344_cochran_armitage",
        "q345_calibration_ece", "q346_dedup_scaling_curve",
        "q347_page_hinkley", "q348_info_gain", "q349_cvm_two_sample",
        "q350_binseg_changepoint", "q351_seasonal_decompose",
        "q352_kaplan_meier", "q353_capture_recapture", "q354_mi_matrix",
        "q355_ndcg_eval", "q356_auc_roc", "q357_cohens_kappa",
        "q358_pr_curve", "q359_pca_power_iteration", "q360_holt_winters",
        "q361_stream_session_window", "q362_gram_matrix",
        "q363_ridge_probe", "q364_covariance_matrix",
        "q365_conformal_quantile", "q366_isotonic_calibration",
        "q367_energy_distance", "q368_wasserstein_1d",
        "q370_bucketed_join", "q371_markov_accuracy",
        "q372_hll_intersection", "q373_whitening_transform",
    }
)

# Green rows from CORRECTNESS_r08.json: 48/48 sampled oracle rows
# hash-green and 2/2 rows-only entries executed clean (q374
# fixed-point contract, q400 Bloom contracts). With this merge every
# registry query has had an external driver row at least once
# (VERDICT r08: "the registry is now fully externally verified").
# Only the names not already in an earlier round's set are listed.
_R08_VERIFIED = frozenset(
    {
        "q342_good_turing", "q369_hellinger_distance",
        "q374_markov_absorption", "q375_ks_decision", "q376_negbin_fit",
        "q377_nelson_aalen", "q378_confusion_mcc", "q379_macro_f1",
        "q380_mrr_eval", "q381_map_eval", "q382_brier_decomposition",
        "q383_hosmer_lemeshow", "q384_log_loss", "q385_weighted_kappa",
        "q386_logrank_test", "q387_durbin_watson", "q388_runs_test",
        "q389_ljung_box", "q390_pacf_durbin", "q391_ewma_control",
        "q392_banded_drift_reference", "q393_chao1_richness",
        "q394_heaps_law", "q395_atkinson_index", "q396_lorenz_deciles",
        "q397_term_burstiness", "q398_audience_jaccard",
        "q399_fd_violation_profile", "q400_bloom_filter_audit",
        "q401_hill_tail_index", "q402_gumbel_maxima", "q403_smd_balance",
        "q404_sprt_monitor",
    }
)

# Green rows from CORRECTNESS_r09.json: 48/48 sampled oracle rows
# hash-green and 2/2 rows-only entries executed clean (q400 Bloom
# contracts, q113 heavy-hitters contract). The 4 re-pins re-proved and
# the 41 rotated stale greens all held; only the round-9 additions are
# new names here.
_R09_VERIFIED = frozenset(
    {
        "q405_banded_kendall_tau", "q406_permutation_shapley",
        "q407_windowed_theil_sen", "q408_banded_cvm_reference",
        "q409_banded_energy_reference",
    }
)

# Green rows from CORRECTNESS_r10.json: 42/42 sampled oracle rows
# hash-green and 8/8 rows-only entries executed clean (q414
# streaming<->batch equivalence, q420 k-core fixed point, the
# q62–q65/q132/q164 recall/invariant contracts). The 14 re-pins all
# re-proved; only the round-10 additions are new names here. q111 is
# deliberately ABSENT: its r10 green row verified an EMPTY frame at
# sf0.01 (fixed 0.1% threshold — vacuous signal, VERDICT r10 item 1);
# the threshold is now scale-adaptive and q111 was re-pinned at the
# head of the round-11 sample, where its fresh row verified a
# non-degenerate 29-row frame (it re-enters via _R11_VERIFIED).
_R10_VERIFIED = frozenset(
    {
        "q410_capped_episode_mining", "q411_zonemap_skipping",
        "q412_compaction_plan", "q413_rle_run_audit",
        "q414_streaming_zonemap_maintenance", "q415_zorder_skipping",
        "q416_deletion_staleness_audit", "q417_manifest_cascade_pruning",
        "q418_range_boundary_plan", "q419_layout_advisor",
        "q420_kcore_decomposition", "q421_mannwhitney_randomization",
        "q422_recluster_advisor", "q423_deletion_aware_recluster",
    }
)

# Green rows from CORRECTNESS_r11.json: 47/47 sampled oracle rows
# hash-green and 3/3 rows-only entries executed clean. New names:
# the five round-11 additions plus the two de-vacuized re-pins (q111
# scale-adaptive threshold, 29 rows; q252 planted duplicate classes,
# 72 rows) — with these, every one of the 396 registry queries has a
# non-degenerate external driver row (VERDICT r11 cumulative record).
_R11_VERIFIED = frozenset(
    {
        "q111_global_share", "q252_dedup_survivorship",
        "q424_streaming_staleness_maintenance", "q425_block_ridge_probe",
        "q426_block_decorrelate", "q427_merge_ledger_compaction",
        "q428_snapshot_diff",
    }
)

# Green rows from CORRECTNESS_r12.json: 45/45 sampled oracle rows
# hash-green and 5/5 rows-only entries executed clean (q432 new, plus
# the q70/q71/q81/q83 rotated backlog re-checks). New names here: the
# four round-12 additions; everything else in the r12 sample was
# already in an earlier round's set.
_R12_VERIFIED = frozenset(
    {
        "q429_exact_isotonic_calibration", "q430_coarse_chain_absorption",
        "q431_bucketed_ledger_compaction", "q432_update_mode_staleness",
    }
)

_DRIVER_VERIFIED = (
    _R01_VERIFIED | _R02_VERIFIED | _R03_VERIFIED | _R04_VERIFIED
    | _R05_VERIFIED | _R06_VERIFIED | _R07_VERIFIED | _R08_VERIFIED
    | _R09_VERIFIED | _R10_VERIFIED | _R11_VERIFIED | _R12_VERIFIED
)


# Round index driving the verified-backlog rotation (bump per round).
_ROUND = 13

# Round 13 sample head: the queries whose PLANS (and in four cases
# ORACLES) changed this round — q62/q164 flipped from rows-only to
# hash oracles on the integer-exact LSH bucketing, q101/q178 flipped
# on the fixed-point / CTE-chain rewrites, and q63/q64/q65 share the
# rewritten recall-contract reshape (integer-exact mean recall) — are
# re-pinned for fresh driver rows. The round-13 additions (q433
# closed-form whitening probe, q434 update-mode bucketed ledger) are
# not in _DRIVER_VERIFIED and enter the sample automatically as fresh
# entries.
_R13_HEAD: tuple[str, ...] = (
    "q62_lsh_topk",
    "q164_embedding_near_dup_lsh",
    "q101_pagerank",
    "q178_label_propagation",
    "q171_bpe_merge_train",
    "q219_bpe_encode",
    "q435_portable_hll_merge",
    "q436_portable_rolling_hll",
    "q420_kcore_decomposition",
    "q437_integer_kmeans_probe",
    "q438_portable_hll_setops",
    "q400_bloom_filter_audit",
    "q63_ivf_topk",
    "q64_multiprobe_lsh_topk",
    "q65_pq_topk",
)


def _rotated_seen(seen: list[str], round_no: int) -> list[str]:
    """Rotate the verified backlog by a fixed per-round stride so the
    driver's free tail slots cycle through ALL verified queries over
    ~10 rounds instead of re-verifying the same registry prefix
    forever (VERDICT r08 item 1: with the registry fully verified,
    the 50-slot sample's job shifts from closure to stale-green
    regression detection). Anchor 17 = where round 8's tail stopped
    (its ~17 free slots re-verified the registry prefix q01..q28), so
    round 9 resumes at the STALEST un-re-checked green; stride 37 ≈
    the typical free-tail width and is coprime with the backlog
    length in practice, so consecutive rounds sample near-disjoint
    windows."""
    if not seen:
        return seen
    off = (17 + (round_no - 9) * 37) % len(seen)
    return seen[off:] + seen[:off]


def _ordered_names() -> list[str]:
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    names = list(QUERIES)
    # Head: this round's re-pins, then every never-driver-verified
    # query (oracle-paired before rows-only, registration order — new
    # round-9 additions fill the rest of the 50-slot sample), then the
    # verified backlog rotated by round index (regression monitor).
    head = [n for n in _R13_HEAD if n in names]
    pinned = set(head)
    fresh_oracle = [
        n
        for n in names
        if n not in _DRIVER_VERIFIED and n in ORACLES and n not in pinned
    ]
    fresh_rows_only = [
        n
        for n in names
        if n not in _DRIVER_VERIFIED and n not in ORACLES and n not in pinned
    ]
    seen = [n for n in names if n in _DRIVER_VERIFIED and n not in pinned]
    return head + fresh_oracle + fresh_rows_only + _rotated_seen(seen, _ROUND)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipeline_usnvc_spark.plans import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from pipeline_usnvc_spark.plans import ORACLES

    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
