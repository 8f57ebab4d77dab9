"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) at sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2, one entry
                  each, collected from ``palo_spark.suite``.
``oracle_sql()``— matching ANSI SQL for the DuckDB oracle (omitted for
                  non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from palo_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from palo_spark.suite.tpch import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return suite.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each entry in ``queries()``."""
    return suite.all_oracles()
