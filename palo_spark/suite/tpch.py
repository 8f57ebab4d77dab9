"""TPC-H-shaped multi-operator queries over the star schema.

These are the flagship OLAP shapes Doris's regression suite runs
([upstream: regression-test/suites/tpch_sf1_p2], SURVEY.md §5.1), adapted
to the fixture schema (FIXTURES.md). They exercise OLAP_SCAN + SELECT +
HASH_JOIN + AGGREGATION + SORT/TopN (SURVEY.md §2.1 #1,8,10,13,16).

Scale notes: every join here either broadcasts a dimension (region/nation/
supplier/part/customer are small relative to the fact tables — AQE picks
broadcast automatically under the threshold) or shuffles on the join key
with AQE skew handling; aggregates are two-phase (partial map-side combine
is automatic). Filters and projections reach the parquet scan (verified
via .explain — PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import davg, dsum, o_davg, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@q(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum(_DISC_PRICE, scale=10)} AS sum_disc_price,
           {o_dsum(_CHARGE, scale=10)} AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount', scale=10)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1: scan → pushed filter → hash agg (partial/final) → sort."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("timestamp'1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=10).alias("sum_disc_price"),
            dsum(charge, scale=10).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=10).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {o_dsum(_DISC_PRICE, scale=10)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3: dim-filtered 3-way join → agg → TopN.

    No broadcast hints: customer scales with SF, so AQE picks broadcast
    while it fits under autoBroadcastJoinThreshold and shuffles when it
    doesn't (a forced hint would OOM the driver at sf100). TopN is
    Catalyst TakeOrderedAndProject — Doris's SortNode bounded-heap
    optimization for free.
    """
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("timestamp'1998-03-15'")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("timestamp'1998-03-15'")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cu.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price, scale=10).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@q(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4: EXISTS → left-semi join (Doris HASH_JOIN LEFT SEMI)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1996-07-01'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1996-10-01'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n_name, {o_dsum(_DISC_PRICE, scale=10)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5: 6-way star join. Fixed-size dims (region/nation) are
    broadcast-hinted; SF-scaled supplier is left to AQE so the plan
    survives a 100× scale-up."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1998-01-01'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(disc_price, scale=10).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@q(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT {o_dsum('l_extendedprice * l_discount', scale=10)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """TPC-H Q6: pure scan+filter+global agg — all filters pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1997-01-01'"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=10).alias("revenue"))


@q(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {o_dsum(_DISC_PRICE, scale=10)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """TPC-H Q10: join + agg + TopN on computed measure."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1996-10-01'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1997-01-01'"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(disc_price, scale=10).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "tpch_q14_promo_effect",
    f"""
    SELECT 100.0 * {o_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END", scale=10)}
               / {o_dsum(_DISC_PRICE, scale=10)} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14: conditional aggregation ratio. ``part`` scales with SF —
    AQE decides broadcast vs shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-09-01'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1996-10-01'"))
    )
    pa = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(promo, scale=10)
                / dsum(disc_price, scale=10)
            ).alias("promo_revenue")
        )
    )


@q(
    "tpch_q16_supplier_part_cnt",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """TPC-H Q16-like: DISTINCT aggregate (Doris's AGGREGATION distinct rewrite)."""
    pa = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(5, 10, 15, 20, 25))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        pa.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@q(
    "tpch_q18_large_volume_customer",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {o_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING {o_dsum('l_quantity')} > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18: IN-subquery with HAVING → semi join against an aggregate."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        cu.join(o, cu.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
              F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
