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
    # last green r03 — the rest of that cohort rotated through r12
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_token_stats",
    # last green r04
    "agg_avg_weighted_regr",
    "agg_collect_list_set",
    "agg_corr_covar",
    "agg_group_array_intersect",
    "agg_group_bit_ops",
    "agg_group_concat",
    "agg_histogram_buckets",
    "agg_map_collect",
    "agg_min_max_by_any_value",
    "agg_multi_distinct",
    "agg_name_surface",
    "agg_ndv_approx_count_distinct",
    "agg_percentile_approx",
    "agg_percentile_array",
    "agg_percentile_exact",
    "agg_skew_kurt",
    "agg_stddev_variance",
    "agg_sum0_empty",
    "agg_topn_values",
    "agg_topn_weighted",
    "events_sessionization",
    "partition_topn",
    "rollup_avg_derivation",
    "rollup_incremental_refresh",
    "rollup_join_mv",
    "rollup_rewrite_fallback",
    "rollup_rewrite_filtered",
    "rollup_rewrite_hit",
    "rollup_sql_rewrite",
    "scalar_array_funcs",
    "scalar_array_higher_order",
    "scalar_conditional",
    "scalar_date_arith",
    "scalar_date_format_shim",
    "scalar_hash_crypto",
    "scalar_ip_funcs",
    "scalar_json_funcs",
    "scalar_map_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "window_first_last_value",
    "window_ignore_nulls",
    "window_lag_lead",
    "window_nth_value",
    "window_ntile_percent",
    "window_range_frame",
    "window_rank_dense_rank",
]

# Round this _PRIORITY window was written FOR: the staleness test
# computes last-green rounds from CORRECTNESS_r01..r{N-1} only, so
# checking in CORRECTNESS_r13.json at round end does not retroactively
# invalidate the r13 window. Bump when rotating.
_WINDOW_ROUND = 13

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
