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

# r06 window: the driver verifies the FIRST 50 registry entries; these
# are the 50 highest-value entries of the 102 that have never had a
# driver-green CORRECTNESS row (VERDICT r5 advice #1 names exactly
# these groups). Entries listed here are yielded before everything
# else, in this order; anything not listed keeps module order.
_PRIORITY = [
    "sql_tpch_q1",
    "sql_tpch_q2",
    "sql_tpch_q3",
    "sql_tpch_q4_exists",
    "sql_tpch_q5",
    "sql_tpch_q6",
    "sql_tpch_q7",
    "sql_tpch_q8",
    "sql_tpch_q9",
    "sql_tpch_q10_returned",
    "sql_tpch_q11",
    "sql_tpch_q12_if",
    "sql_tpch_q13",
    "sql_tpch_q14_promo_if",
    "sql_tpch_q15_cte_max",
    "sql_tpch_q16",
    "sql_tpch_q17",
    "sql_tpch_q18_in_subquery",
    "sql_tpch_q19_or_bands",
    "sql_tpch_q20",
    "sql_tpch_q21",
    "sql_tpch_q22_not_exists",
    "sql_dialect_datetime",
    "sql_dialect_limit_offset",
    "sql_dialect_group_concat",
    "sql_dialect_interval_arith",
    "sql_dialect_cast_nullsafe",
    "sql_dialect_week_format",
    "sql_dialect_date_funcs",
    "sql_dialect_field_elt",
    "jdbc_roundtrip",
    "text_match_indexed",
    "geo_point_wkt_roundtrip",
    "geo_distance_azimuth",
    "geo_contains_polygon",
    "agg_state_two_phase",
    "events_asof_join",
    "similarity_search_pq",
    "text_bm25_retrieval",
    "rag_fusion_rrf",
    "multimodal_real_ppm_codec",
    "multimodal_real_png_codec",
    "tpcds_spend_deciles",
    "tpcds_rolling_3mo_avg",
    "tpcds_purchase_streaks",
    "tpcds_yoy_growth",
    "tpcds_channel_union_agg",
    "tpcds_window_over_agg",
    "tpcds_multilevel_rollup",
    "tpcds_grouping_margin_rank",
]

# r7 rotation TODO: the remaining 52 never-driver-green entries plus the
# 9 tpcds shapes added in round 6 (tpcds_channel_rollup_union,
# tpcds_yoy_nation_share, tpcds_returns_anti_join, tpcds_brand_rank_shift,
# tpcds_lifetime_gap_bands, tpcds_quarter_brand_deviation,
# tpcds_returned_spend_ratio, tpcds_promo_share_by_nation,
# tpcds_priority_year_matrix), wave 4 (tpcds_above_nation_avg_returns,
# tpcds_frequent_parts_best_customers, tpcds_channel_parity_brands,
# tpcds_repeat_purchase_pairs, tpcds_hour_value_band_matrix,
# tpcds_category_cross_channel), wave 5 (tpcds_ship_latency_bands,
# tpcds_multi_supplier_returned_orders, tpcds_discount_above_part_avg,
# tpcds_buy_return_rebuy), sql_dialect_week_modes,
# sql_dialect_tsdiff_months, and split_leakage_safe — put up to 50 of
# these first next round:
# scalar_sm4_crypto, streaming_tumbling_window, streaming_state_dedup,
# streaming_session_window, streaming_running_agg_model,
# streaming_static_enrich, streaming_stream_stream_join,
# table_model_auto_partition, table_model_bitmap_union_col,
# table_model_partition_rollup, sample_heavy_hitters,
# sample_grouped_heavy_hitters, sample_training_order,
# sample_token_budget, sample_temperature_mix,
# similarity_search_ivf_literal, text_intra_doc_line_dedup,
# dedup_url_normalized, corpus_profile_report, embedding_pca_variance,
# dedup_semantic_semdedup, text_quality_classifier,
# dedup_substring_spans, text_perplexity_filter,
# multimodal_audio_wav_features, dedup_incremental_snapshot,
# text_bpe_pair_counts, text_bpe_apply, knn_label_propagation,
# embedding_outlier_topk, events_asof_forward_tolerance,
# sql_session_mv_pipeline, sql_join_hint_broadcast,
# sql_join_hint_shuffle, sql_create_view_query, sql_match_predicates,
# sql_lateral_explode_split, sql_lateral_explode_json_numbers,
# sql_qualify_topn_per_group, sql_qualify_direct_window,
# sql_inverted_index_query, sql_rollup_grouping_sets,
# tpcds_case_heavy_agg, tpcds_exists_chain, tpcds_segment_topn,
# tpcds_customer_set_ops, tpcds_revenue_share, tpcds_am_pm_ratio,
# tpcds_frequent_buyers, tpcds_return_rate_bands,
# tpcds_cumulative_channels, tpcds_cov_filter


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
