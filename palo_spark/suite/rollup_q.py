"""Rollup/MV rewrite coverage (SURVEY.md §4's one custom optimizer
piece). Each query goes through :class:`~palo_spark.plans.RollupCatalog`
— the oracle aggregates the base table directly, so a rewrite that
changed results in ANY way breaks the hash match. The queries also
assert which path answered (rollup vs base): a silently-not-firing
rewrite is a perf bug, a wrongly-firing one a correctness bug.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.plans import Measure, RollupCatalog
from palo_spark.suite.util import o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_M = [
    Measure("count"),
    Measure("dsum", "l_quantity"),
    Measure("min", "l_discount"),
    Measure("max", "l_extendedprice"),
]


#: per-process memo: rollups are built ONCE per sf_dir (they are
#: synchronously maintained structures, not per-query scratch), so a
#: repeated query measures the rewrite READ path, not the build.
_CAT_CACHE: dict[str, RollupCatalog] = {}


def _catalog(spark, sf_dir) -> RollupCatalog:
    cat = _CAT_CACHE.get(sf_dir)
    if cat is None:
        cat = RollupCatalog(spark, root=f"/tmp/palo_spark_rollups_{os.getpid()}")
        li = load_table(spark, sf_dir, "lineitem")
        cat.register_base("lineitem", li)
        cat.add_rollup("li_by_flag_status", "lineitem", ["l_returnflag", "l_linestatus"], _M)
        cat.add_rollup("li_by_flag", "lineitem", ["l_returnflag"], _M)
        _CAT_CACHE[sf_dir] = cat
    return cat


@q(
    "rollup_rewrite_hit",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           {o_dsum('l_quantity')} AS dsum_l_quantity,
           MIN(l_discount) AS min_l_discount,
           MAX(l_extendedprice) AS max_l_extendedprice
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rollup_rewrite_hit(spark, sf_dir):
    """A query covered by TWO rollups must pick the smaller one
    (``li_by_flag``, 3 rows) and still equal the base aggregation
    bit-for-bit (dsum decimal re-aggregation is exact)."""
    cat = _catalog(spark, sf_dir)
    df, src = cat.query("lineitem", ["l_returnflag"], _M)
    assert src == "li_by_flag", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))


@q(
    "rollup_rewrite_filtered",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           {o_dsum('l_quantity')} AS dsum_l_quantity
    FROM lineitem WHERE l_linestatus = 'F'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rollup_rewrite_filtered(spark, sf_dir):
    """A filter on a rollup dimension is pushed to the rollup scan
    (legal: the predicate partitions whole pre-merged groups). The
    finer rollup must be chosen — the coarse one lacks l_linestatus."""
    cat = _catalog(spark, sf_dir)
    ms = [Measure("count"), Measure("dsum", "l_quantity")]
    df, src = cat.query(
        "lineitem",
        ["l_returnflag", "l_linestatus"],
        ms,
        where=F.col("l_linestatus") == "F",
        where_cols=["l_linestatus"],
    )
    assert src == "li_by_flag_status", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))


@q(
    "rollup_rewrite_fallback",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           {o_dsum('l_quantity')} AS dsum_l_quantity
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def rollup_rewrite_fallback(spark, sf_dir):
    """A predicate on a NON-dimension column (l_shipdate) cannot be
    answered from any rollup — groups would be partially filtered — so
    the rewriter must fall back to the base table. Falling back keeps
    correctness; answering from a rollup here would be wrong."""
    cat = _catalog(spark, sf_dir)
    ms = [Measure("count"), Measure("dsum", "l_quantity")]
    df, src = cat.query(
        "lineitem",
        ["l_returnflag"],
        ms,
        where=F.col("l_shipdate") >= F.expr("timestamp'1997-01-01'"),
        where_cols=["l_shipdate"],
    )
    assert src == "base", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))


@q(
    "rollup_incremental_refresh",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           {o_dsum('l_quantity')} AS dsum_l_quantity,
           MIN(l_discount) AS min_l_discount,
           MAX(l_extendedprice) AS max_l_extendedprice
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rollup_incremental_refresh(spark, sf_dir):
    """Incremental rollup maintenance: build the rollup over 2/3 of
    lineitem, load the remaining third as a delta via ``apply_delta``
    (aggregate-the-delta + merge — the base is NEVER re-scanned), then
    answer from the rollup. The result must equal a full-table
    aggregation bit-for-bit: count/sum/dsum merge by exact addition,
    min/max by min/max."""
    li = load_table(spark, sf_dir, "lineitem")
    initial = li.filter(F.col("l_orderkey") % 3 != 0)
    delta = li.filter(F.col("l_orderkey") % 3 == 0)
    cat = RollupCatalog(spark, root=f"/tmp/palo_spark_rollups_{os.getpid()}")
    cat.register_base("lineitem_incr", initial)
    cat.add_rollup("li_incr_by_flag", "lineitem_incr", ["l_returnflag"], _M)
    cat.apply_delta("lineitem_incr", delta)
    cat.register_base("lineitem_incr", li)  # base now includes the load
    df, src = cat.query("lineitem_incr", ["l_returnflag"], _M)
    assert src == "li_incr_by_flag", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))


@q(
    "rollup_sql_rewrite",
    f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rollup_sql_rewrite(spark, sf_dir):
    """Doris's silent MV selection at the SQL surface: a plain
    ``spark.sql``-style aggregate string is answered from the covering
    rollup (``SUM(l_quantity)`` matches the stored exact ``dsum``
    measure) without the caller naming any rollup — the Python-API
    rewrite exposed to SQL users (upstream MaterializedViewSelector)."""
    cat = _catalog(spark, sf_dir)
    df, src = cat.sql(
        "SELECT l_returnflag, COUNT(*) AS n_lines, SUM(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY l_returnflag"
    )
    assert src == "li_by_flag", f"SQL rewrite picked {src}"
    return df.withColumn("n_lines", F.col("n_lines").cast("bigint"))


@q(
    "rollup_avg_derivation",
    f"""
    SELECT l_returnflag,
           {o_dsum('l_quantity')} AS dsum_l_quantity,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           ({o_dsum('l_quantity')} / COUNT(*)) AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rollup_avg_derivation(spark, sf_dir):
    """AVG is never stored — it is derived as dsum/count at answer time
    (the only decomposition that stays correct when rolling further up)."""
    cat = _catalog(spark, sf_dir)
    ms = [Measure("dsum", "l_quantity"), Measure("count")]
    df, src = cat.query(
        "lineitem",
        ["l_returnflag"],
        ms,
        avg_pairs={"avg_qty": ("dsum_l_quantity", "count_all")},
    )
    assert src == "li_by_flag", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))


@q(
    "rollup_join_mv",
    f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS count_all,
           {o_dsum('l_extendedprice')} AS dsum_l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    """,
)
def rollup_join_mv(spark, sf_dir):
    """Multi-table materialized view (Doris 2.x async MV over a join):
    the MV base is a JOIN — orders ⋈ lineitem pre-aggregated by
    customer — and a covering query is answered from the 1.5k-row MV
    instead of re-running the join. Same selection/merge machinery as
    single-table rollups; the MV build is the only place the join runs."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = orders.join(
        li, F.col("o_orderkey") == F.col("l_orderkey")
    ).select("o_custkey", "l_extendedprice")
    cat = RollupCatalog(spark, root=f"/tmp/palo_spark_rollups_{os.getpid()}")
    cat.register_base("order_lines", joined)
    cat.add_rollup(
        "ol_by_cust",
        "order_lines",
        ["o_custkey"],
        [Measure("count"), Measure("dsum", "l_extendedprice")],
    )
    df, src = cat.query(
        "order_lines",
        ["o_custkey"],
        [Measure("count"), Measure("dsum", "l_extendedprice")],
    )
    assert src == "ol_by_cust", f"selector picked {src}"
    return df.withColumn("count_all", F.col("count_all").cast("bigint"))
