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
    # never driver-green: the r12 additions
    "sql_async_mv_join_rewrite",
    "sql_async_mv_snowflake_rewrite",
    "sql_workload_group_admission",
    # last green r02 — ten rounds of code churn ago
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "union_all",
    "union_distinct",
    # last green r03
    "behavioral_sequence_match",
    "behavioral_window_funnel",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_exact_keep_best",
    "dedup_minhash_fuzzy",
    "dedup_ngram_jaccard",
    "dialect_division_semantics",
    "dialect_implicit_cast_cmp",
    "dialect_largeint_decimal",
    "dialect_lax_cast_null",
    "dialect_string_number_arith",
    "mix_sources_weighted",
    "sample_hash_fraction",
    "sample_nested_subset",
    "sample_split_assignment",
    "sample_stratified_lang",
    "similarity_knn_join",
    "similarity_search_topk",
    "sketch_bitmap_distinct",
    "sketch_bitmap_distinct_salted",
    "sketch_bitmap_hash_distinct",
    "sketch_bitmap_intersect_agg",
    "sketch_bitmap_merge_two_phase",
    "sketch_bitmap_ops",
    "sketch_explode_bitmap",
    "sketch_hll_merge_two_phase",
    "sketch_hll_ndv",
    "sketch_orthogonal_bitmap_expr",
    "sketch_orthogonal_union_count",
    "sketch_quantile_union",
    "table_model_aggregate_merge",
    "table_model_delete_compact",
    "table_model_delete_predicate",
    "table_model_duplicate_append",
    "table_model_schema_change",
    "table_model_unique_sequence_col",
    "table_model_unique_upsert",
]

# Round this _PRIORITY window was written FOR: the staleness test
# computes last-green rounds from CORRECTNESS_r01..r{N-1} only, so
# checking in CORRECTNESS_r11.json at round end does not retroactively
# invalidate the r11 window. Bump when rotating.
_WINDOW_ROUND = 12

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
