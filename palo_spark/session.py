"""SparkSession factory with OLAP-tuned defaults.

Doris's optimizer/executor machinery (predicate pushdown, column pruning,
partition pruning, constant folding, subquery decorrelation, CBO join
reorder, runtime filters, two-phase aggregation, TopN, spill, vectorized
execution — SURVEY.md §4) is Catalyst/Tungsten/AQE built-ins. This module
turns the relevant knobs on once so every downstream plan benefits.

Scale notes (the defaults are written for a real cluster, overridable for
local testing):
- AQE handles runtime partition coalescing and skew-join splitting, which
  replaces Doris's hand-tuned bucket counts at 100 TB.
- runtime bloom filters replace Doris's join runtime filters
  (``RuntimeFilterGenerator.java`` upstream).
- ANSI off gives MySQL-ish lax semantics (Doris speaks MySQL dialect).
- session timezone pinned to UTC so timestamp semantics are stable across
  driver/executors and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that define the engine's semantics — applied on every session.
ENGINE_CONFS: dict[str, str] = {
    # -- adaptivity: runtime re-planning replaces static MPP tuning
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # -- cost-based optimization (Doris Nereids CBO equivalent)
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # -- runtime filters (Doris bloom/in/min-max runtime filter equivalent)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # -- MySQL-ish dialect: lax casts, `/` on ints yields double, no
    #    overflow errors (Doris is MySQL-compatible)
    "spark.sql.ansi.enabled": "false",
    # -- deterministic timestamps, matches the UTC-naive DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # -- Arrow for the pandas-UDF slow path (vectorized transfer)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # -- fixtures carry TIMESTAMP(NANOS) parquet columns which Spark has no
    #    native type for; read them as long and convert at the catalog layer
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_session(
    app_name: str = "palo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for local testing; on a real cluster pass ``master=None`` with a
    pre-configured spark-submit and only the ENGINE_CONFS are applied.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local: ~cores. On a 1000-executor cluster this should be
        # ~2-3x total cores; AQE coalesces downward at runtime.
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("PALO_SPARK_DRIVER_MEM", "32g"))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
