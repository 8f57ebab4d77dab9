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
    "ssb",
]

_PRIORITY = [
    # r09 window: the driver verifies the FIRST 50 registry entries.
    # This is the full 54-entry never-green backlog after r8 went 50/50
    # green (the 5 pre-r8 carry-overs first, then every r8 addition in
    # the order VERDICT r8 pinned at the former TODO comment here).
    # Entries 51-54 plus any r9 additions form the r10 backlog.
    # tests/test_rotation_window.py asserts this window is never stale:
    # every entry is never-green in CORRECTNESS_r01..r{_WINDOW_ROUND-1}
    # or explicitly listed in _RESCHEDULED_OK.
    "tpcds_refund_reason_bands",
    "tpcds_unspecified_dim_report",
    "tpcds_weekly_item_vs_year",
    "dedup_corpus_lines",
    "dedup_semantic_decontaminate",
    "tpcds_lifetime_channel_preference",
    "tpcds_demographic_exists_battery",
    "tpcds_rolling_category_deviation",
    "tpcds_cohort_next_quarter_spend",
    "tpcds_underperforming_brands",
    "tpcds_monthly_ship_pivot",
    "tpcds_worst_return_ratio_topn",
    "tpcds_weekly_sales_yoy_ratio",
    "dialect_largeint_overflow",
    "sql_catalog_cross_join",
    "text_gopher_rules",
    "tpcds_period_overlap_counts",
    "tpcds_case_ratio_report",
    "tpcds_part_attribute_battery",
    "tpcds_or_band_matrix",
    "tpcds_demographic_or_averages",
    "tpcds_net_paid_after_returns",
    "tpcds_best_worst_performers",
    "tpcds_excess_discount_total",
    "text_gopher_repetition",
    "behavioral_transition_matrix",
    "tpcds_brand_year_revenue",
    "tpcds_demographic_rollup_averages",
    "tpcds_preferred_nation_intersect",
    "tpcds_nonlocal_brand_revenue",
    "tpcds_best_trip_per_customer",
    "tpcds_band_join_acct_tiers",
    "tpcds_cross_channel_item_intersect",
    "tpcds_disjunctive_branch_filter",
    "tpcds_quantity_bucket_battery",
    "tpcds_cov_consecutive_months",
    "tpcds_top_regions_rollup",
    "tpcds_rollup_rank_per_category",
    "tpcds_returns_excluded_ratio",
    "table_model_partial_update",
    "table_model_delete_sign_merge",
    "tpcds_class_ratio_window",
    "tpcds_store_weekday_matrix",
    "tpcds_nonlocal_weekend_trips",
    "tpcds_return_latency_bands",
    "tpcds_state_avg_return_detail",
    "tpcds_rollup_rank_within_parent",
    "tpcds_warehouse_latency_matrix",
    "tpcds_brand_channel_union",
    "tpcds_manager_monthly_deviation",
    "tpcds_returned_qty_channel_ratio",
    "tpcds_clean_multiwarehouse_orders",
    "tpcds_own_zip_color_returns",
    "tpcds_call_center_demographic_loss",
]

# Round this _PRIORITY window was written FOR: the staleness test
# computes the never-green set from CORRECTNESS_r01..r{N-1} only, so
# checking in CORRECTNESS_r08.json at round end does not retroactively
# fail the r8 window. Bump when rotating.
_WINDOW_ROUND = 9

# Entries allowed in the window despite a prior driver-green row,
# each with the reason (judge-auditable). Empty for r9: every window
# entry is never-green in CORRECTNESS_r01..r08.
_RESCHEDULED_OK: set[str] = set()

# r10 rotation TODO — ordered backlog after the r9 window goes green
# (20 entries: _PRIORITY[50:] first, then the 16 r9 additions):
#   tpcds_returned_qty_channel_ratio      (window overflow, r8 addition)
#   tpcds_clean_multiwarehouse_orders     (window overflow, r8 addition)
#   tpcds_own_zip_color_returns           (window overflow, r8 addition)
#   tpcds_call_center_demographic_loss    (window overflow, r8 addition)
#   table_model_partial_update_sequence   (r9: partial × sequence_col)
#   sql_catalog_jdbc_join                 (r9: jdbc catalog)
#   sql_async_mv_refresh                  (r9: async materialized view)
#   ssb_q1_1 ssb_q1_2 ssb_q1_3            (r9: SSB flight 1)
#   ssb_q2_1 ssb_q2_2 ssb_q2_3            (r9: SSB flight 2)
#   ssb_q3_1 ssb_q3_2 ssb_q3_3 ssb_q3_4   (r9: SSB flight 3)
#   ssb_q4_1 ssb_q4_2 ssb_q4_3            (r9: SSB flight 4)

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
