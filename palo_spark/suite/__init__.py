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

# r11 STALENESS rotation (VERDICT r10 advice #2): the never-green
# backlog drained to zero in r10, so from r11 on the 50-slot driver
# window re-verifies the LEAST-RECENTLY-driver-checked entries — for
# each registry entry, its last green round in the checked-in
# CORRECTNESS_r01..r{_WINDOW_ROUND-1} ledger (0 if never green, which
# puts brand-new entries first automatically), sorted ascending with
# name as the tie-break. The list is pinned statically here so the
# driver order is deterministic and auditable;
# tests/test_rotation_window.py RECOMPUTES the rule from the ledger
# and asserts this list matches it, so a new suite entry or a new
# ledger file forces a conscious re-pin.
_PRIORITY = [
    # never driver-green: the r10 window cut off at slot 50, these 3
    # r10 additions overflowed (plus any r11 additions, by the rule)
    "sql_alias_function",
    "sql_async_mv_avg_rewrite",
    "sql_hash_functions",
    "sql_row_policy_filter",
    "sql_row_policy_role_permissive",
    "sql_update_from_join",
    # last green r01 — ten rounds of code churn ago
    "case_when_projection",
    "distinct_projection",
    "values_inline_table",
    # last green r02
    "correlated_scalar_subquery",
    "datagen_numbers",
    "empty_set_const_false",
    "except_all",
    "except_distinct",
    "hash_join_full_outer",
    "hash_join_inner",
    "hash_join_left_anti",
    "hash_join_left_outer",
    "hash_join_left_semi",
    "hash_join_right_outer",
    "having_filter",
    "in_subquery",
    "intersect_all",
    "intersect_distinct",
    "nested_loop_cross_join",
    "nested_loop_theta_join",
    "not_in_subquery",
    "null_aware_anti_join",
    "repeat_cube",
    "repeat_grouping_sets",
    "repeat_rollup",
    "scalar_subquery",
    "sort_limit_offset",
    "table_function_explode",
    "table_function_posexplode",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_lines",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_cnt",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue",
    "tpch_q1_pricing_summary",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opp",
    "tpch_q2_min_cost_supplier",
]

# Round this _PRIORITY window was written FOR: the staleness test
# computes last-green rounds from CORRECTNESS_r01..r{N-1} only, so
# checking in CORRECTNESS_r11.json at round end does not retroactively
# invalidate the r11 window. Bump when rotating.
_WINDOW_ROUND = 11

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
