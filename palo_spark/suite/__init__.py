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
]


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
    return out


def all_oracles() -> dict[str, str]:
    out = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
