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


# Queries that already have a green driver row in CORRECTNESS_r01.json.
# The driver samples a prefix of the registry in dict order, so ordering
# the not-yet-driver-verified queries FIRST (oracle-paired before
# rows-only) maximizes fresh external verification per round; the r01
# greens go last — they remain covered by tests/test_oracle_parity.
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


def _ordered_names() -> list[str]:
    from pipeline_usnvc_spark.plans import ORACLES, QUERIES

    names = list(QUERIES)
    fresh_oracle = [n for n in names if n not in _R01_VERIFIED and n in ORACLES]
    fresh_rows_only = [n for n in names if n not in _R01_VERIFIED and n not in ORACLES]
    seen = [n for n in names if n in _R01_VERIFIED]
    return fresh_oracle + fresh_rows_only + seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pipeline_usnvc_spark.plans import QUERIES

    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    from pipeline_usnvc_spark.plans import ORACLES

    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
