"""Driver-facing query inventory: every implemented operator from
SURVEY.md §2 gets a (queries, oracle_sql) pair here.

Each submodule exposes ``QUERIES: dict[str, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (ANSI SQL for the DuckDB oracle; omitted for
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

import importlib

# Ordered for driver-window rotation: the driver's correctness gate
# verifies the first 50 registry entries each round, so modules are
# rotated so every module eventually gets a driver-green CORRECTNESS row.
# r02 covered tpch/relational; r03 covered table_models/sketches/
# behavioral/dialect/sampling/llm; r04 puts rollup/window/aggregate/
# scalar/sources/streaming first. The full registry stays guarded every
# round by tests/test_parity_full.py → scripts/check_parity.py.
_MODULE_NAMES = [
    "rollup_q",
    "window_funcs",
    "aggregates",
    "scalar_funcs",
    "sources_sinks",
    "streaming_q",
    "table_models",
    "sketches",
    "behavioral",
    "dialect",
    "sampling_q",
    "llm",
    "tpch",
    "tpch2",
    "relational",
    "doris_sql",
    "tpcds",
    "geo_q",
]

_PRIORITY = [
    # r07 window: the driver verifies the FIRST 50 registry entries.
    # These are 50 of the 75 entries that have never had a driver-green
    # CORRECTNESS row (VERDICT r6 advice #1): the longest-waiting
    # carry-overs (streaming, table models, sampling, llm-pipeline,
    # similarity) plus ALL 23 round-6 additions (tpcds waves 3-5,
    # sql_dialect_week_modes/tsdiff_months, split_leakage_safe,
    # dedup_simhash_md5_replay). The 25 left for the r08 window are
    # listed in the TODO comment below.
    "scalar_sm4_crypto",
    "streaming_tumbling_window",
    "streaming_state_dedup",
    "streaming_session_window",
    "streaming_running_agg_model",
    "streaming_static_enrich",
    "streaming_stream_stream_join",
    "table_model_auto_partition",
    "table_model_bitmap_union_col",
    "table_model_partition_rollup",
    "sample_heavy_hitters",
    "sample_grouped_heavy_hitters",
    "sample_training_order",
    "sample_token_budget",
    "sample_temperature_mix",
    "similarity_search_ivf_literal",
    "text_intra_doc_line_dedup",
    "dedup_url_normalized",
    "corpus_profile_report",
    "embedding_pca_variance",
    "dedup_semantic_semdedup",
    "text_quality_classifier",
    "dedup_substring_spans",
    "text_perplexity_filter",
    "multimodal_audio_wav_features",
    "dedup_incremental_snapshot",
    "text_bpe_pair_counts",
    "split_leakage_safe",
    "dedup_simhash_md5_replay",
    "sql_dialect_week_modes",
    "sql_dialect_tsdiff_months",
    "tpcds_channel_rollup_union",
    "tpcds_yoy_nation_share",
    "tpcds_returns_anti_join",
    "tpcds_brand_rank_shift",
    "tpcds_lifetime_gap_bands",
    "tpcds_quarter_brand_deviation",
    "tpcds_returned_spend_ratio",
    "tpcds_promo_share_by_nation",
    "tpcds_priority_year_matrix",
    "tpcds_above_nation_avg_returns",
    "tpcds_frequent_parts_best_customers",
    "tpcds_channel_parity_brands",
    "tpcds_repeat_purchase_pairs",
    "tpcds_hour_value_band_matrix",
    "tpcds_category_cross_channel",
    "tpcds_ship_latency_bands",
    "tpcds_multi_supplier_returned_orders",
    "tpcds_discount_above_part_avg",
    "tpcds_buy_return_rebuy",
]

# r8 rotation TODO — EXACT ordered backlog (after the r7 window goes
# green): the 25 longest-waiting carry-overs, then every r7 addition
# (similarity_search_ivf is ledger-green under its OLD invariant
# oracle; re-scheduled because r7 replaced it with a full value
# oracle). Put the first 50 of these in the r8 _PRIORITY; the
# remainder (plus r8 additions) lead r9:
#   text_bpe_apply
#   knn_label_propagation
#   embedding_outlier_topk
#   events_asof_forward_tolerance
#   sql_session_mv_pipeline
#   sql_join_hint_broadcast
#   sql_join_hint_shuffle
#   sql_create_view_query
#   sql_match_predicates
#   sql_lateral_explode_split
#   sql_lateral_explode_json_numbers
#   sql_qualify_topn_per_group
#   sql_qualify_direct_window
#   sql_inverted_index_query
#   sql_rollup_grouping_sets
#   tpcds_case_heavy_agg
#   tpcds_exists_chain
#   tpcds_segment_topn
#   tpcds_customer_set_ops
#   tpcds_revenue_share
#   tpcds_am_pm_ratio
#   tpcds_frequent_buyers
#   tpcds_return_rate_bands
#   tpcds_cumulative_channels
#   tpcds_cov_filter
#   scalar_sub_replace_compress
#   sample_dsir_importance
#   embedding_kmeans_clusters
#   similarity_search_ivf
#   tpcds_rolling_stockout
#   tpcds_same_store_yoy_except
#   tpcds_cross_channel_migration
#   tpcds_channel_margin_grouping_sets
#   tpcds_inventory_position
#   tpcds_quarter_brand_share
#   tpcds_first_purchase_cohort
#   tpcds_consecutive_active_months
#   tpcds_weekday_weekend_mix
#   tpcds_volume_band_customers
#   tpcds_part_quantity_outliers
#   tpcds_nation_channel_growth_pairs
#   tpcds_weekday_halfyear_matrix
#   tpcds_best_brand_per_nation
#   tpcds_sized_parts_supplier_window
#   tpcds_above_avg_nations
#   tpcds_post_promo_window_revenue
#   tpcds_monthly_dip_detection
#   tpcds_cumulative_channel_crossover
#   tpcds_declining_brands_net
#   tpcds_returned_value_pivot
#   tpcds_refund_reason_bands
#   tpcds_unspecified_dim_report
#   tpcds_weekly_item_vs_year
#   dedup_corpus_lines
#   dedup_semantic_decontaminate

def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    head.update({k: v for k, v in d.items() if k not in head})
    return head


def _modules():
    mods = []
    for name in _MODULE_NAMES:
        try:
            mods.append(importlib.import_module(f"palo_spark.suite.{name}"))
        except ModuleNotFoundError as e:
            # Only swallow "this suite module isn't built yet"; a typo'd
            # import *inside* an existing module must fail loudly, or its
            # queries would silently vanish from the verified surface.
            if e.name != f"palo_spark.suite.{name}":
                raise
    return mods


def all_queries() -> dict:
    out = {}
    for m in _modules():
        for k, v in getattr(m, "QUERIES", {}).items():
            if k in out:
                raise ValueError(f"duplicate query name: {k}")
            out[k] = v
    return _reorder(out)


def all_oracles() -> dict[str, str]:
    out = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return _reorder(out)
