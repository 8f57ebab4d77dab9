"""TPC-H query shapes, second wave (Q7/Q8/Q9/Q13/Q15/Q17/Q19/Q20/Q21/Q22
analogs), adapted to the fixture schema where the official columns
don't exist (no partsupp table, no commit/receipt dates, no comments —
each adaptation keeps the ORIGINAL query's plan shape: the join graph,
subquery structure, and aggregation pattern are what's being tested).

All revenue sums use the ``dsum`` decimal quantization; all year
extractions are cast to INT on both sides (DuckDB ``year()`` is
BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from palo_spark.catalog import load_table, register_views
from palo_spark.suite.util import dsum, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

def _rev():
    # built lazily: F.col needs an active SparkContext (import time has none)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REV = "(l_extendedprice * (1 - l_discount))"


@q(
    "tpch_q7_nation_volume",
    f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           {o_dsum(_O_REV, scale=4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey IN (1, 2) AND n2.n_nationkey IN (1, 2)
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark, sf_dir):
    """Q7 shape: two-nation bilateral trade volume by year — the 6-way
    join with a disjunctive cross-nation predicate. Fixed-size nation
    is broadcast by AQE; the fact side shuffles once per join key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("c_nk"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("s_nk"))
        .filter(
            F.col("c_nk").isin(1, 2)
            & F.col("s_nk").isin(1, 2)
            & (F.col("c_nk") != F.col("s_nk"))
        )
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(_rev(), scale=4).alias("revenue"))
    )


@q(
    "tpch_q8_market_share",
    f"""
    WITH all_nations AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {_O_REV} AS volume,
               n2.n_nationkey AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type LIKE 'STANDARD%'
    )
    SELECT o_year,
           ({o_dsum('CASE WHEN supp_nation = 3 THEN volume ELSE 0.0 END', scale=4)}
            / {o_dsum('volume', scale=4)}) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape: national market share — conditional-sum ratio over a
    5-way star join restricted by part type."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("STANDARD%"))
    su = load_table(spark, sf_dir, "supplier")
    vol = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            F.col("s_nationkey").alias("supp_nation"),
        )
    )
    nat = F.when(F.col("supp_nation") == 3, F.col("volume")).otherwise(F.lit(0.0))
    return vol.groupBy("o_year").agg(
        (dsum(nat, scale=4) / dsum("volume", scale=4)).alias("mkt_share")
    )


@q(
    "tpch_q9_product_profit",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {o_dsum('(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity)', scale=4)} AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape: profit by supplier nation and year (partsupp's supply
    cost replaced by p_retailprice — same arithmetic-over-join shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, scale=4).alias("profit"))
    )


@q(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13: customer order-count distribution — LEFT join with an extra
    join-time predicate, double aggregation (the comment filter is
    replaced by an order-priority filter; identical plan shape)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        cu.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {o_dsum(_O_REV, scale=4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: top supplier by quarterly revenue — view + scalar-subquery
    max (the classic 'equal to the max of an aggregate' shape)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {o_dsum(_O_REV, scale=4)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@q(
    "tpch_q17_small_quantity",
    f"""
    SELECT ({o_dsum('l_extendedprice', scale=4)} / 7.0) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l_partkey)
    """,
)
def tpch_q17_small_quantity(spark, sf_dir):
    """Q17: small-quantity-order revenue — correlated scalar subquery
    (per-part average) against the same fact table; Catalyst
    decorrelates it into an aggregate + join, Doris does the same."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT ({o_dsum('l_extendedprice', scale=4)} / 7.0) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l_partkey)
        """
    )


@q(
    "tpch_q19_discounted_revenue",
    f"""
    SELECT {o_dsum(_O_REV, scale=4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def tpch_q19_discounted_revenue(spark, sf_dir):
    """Q19: disjunction of conjunctive band predicates across the join
    — the OR-of-ANDs shape that tests predicate normalization (Catalyst
    extracts the common join key; the residual evaluates post-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_rev(), scale=4).alias("revenue"))
    )


@q(
    "tpch_q20_excess_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type LIKE 'SMALL%'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 500.0
    )
    """,
)
def tpch_q20_excess_suppliers(spark, sf_dir):
    """Q20 shape: suppliers with excess volume of a part class —
    IN-subquery over a filtered aggregate (partsupp availqty replaced
    by a HAVING threshold; same semi-join-over-aggregate plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("SMALL%"))
    su = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(pa, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500.0)
        .select("l_suppkey")
    )
    return su.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@q(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 shape: the only-guilty-supplier pattern — EXISTS + NOT EXISTS
    correlated on the same fact table (receipt/commit dates replaced by
    the return flag; the double-semi/anti-join plan is identical)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        """
    )


_Q22_BODY = f"""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               {o_dsum('c_acctbal', scale=4)} AS totacctbal
        FROM (
            SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, c_acctbal
            FROM customer
            WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
              AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        )
        GROUP BY cntrycode
"""


@q("tpch_q22_global_sales_opp", _Q22_BODY)
def tpch_q22_global_sales_opp(spark, sf_dir):
    """Q22: customers with above-average balance and no orders —
    uncorrelated scalar subquery + anti join (phone country code
    replaced by nationkey buckets). The filter's AVG compares exactly:
    both engines compute it over the identical full column. The SAME
    SQL text (with the dsum quantization) runs on Spark and DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_BODY)


@q(
    "tpch_q2_min_cost_supplier",
    """
    WITH unit AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS u_price
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN unit     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
      AND u_price = (
          SELECT min(u2.u_price)
          FROM unit u2
          JOIN supplier s2 ON u2.l_suppkey = s2.s_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE u2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: minimum-cost supplier per part — the 5-way dim join with
    a CORRELATED scalar-min subquery over the same join graph (the
    fixture has no partsupp, so supply cost = the supplier's best
    observed unit price from lineitem; the plan shape — correlated
    min + re-join + TopN — is the original's). Both the outer and inner
    sides share the aggregated `unit` subplan; min(unit-price) equality
    is a single IEEE division per row, bit-stable across engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH unit AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS u_price
            FROM lineitem GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM part
        JOIN unit     ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND r_name = 'EUROPE'
          AND u_price = (
              SELECT min(u2.u_price)
              FROM unit u2
              JOIN supplier s2 ON u2.l_suppkey = s2.s_suppkey
              JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
              WHERE u2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )


@q(
    "tpch_q11_important_stock",
    f"""
    WITH pv AS (
        SELECT l_partkey, {o_dsum('l_extendedprice * l_quantity', scale=2)} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey = 1
        GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM pv
    WHERE value > (SELECT sum(value) * 0.001 FROM pv)
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape: parts representing a significant fraction of one
    nation's stock value — grouped value sum HAVING > scalar-subquery
    threshold over the SAME aggregate (no partsupp: value =
    price × quantity from that nation's lineitems). Catalyst reuses the
    pv subplan for both branches."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 1)
    pv = (
        li.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity"), scale=2).alias("value"))
    )
    threshold = pv.agg((F.sum("value") * F.lit(0.001)).alias("t"))
    return pv.join(F.broadcast(threshold)).filter(F.col("value") > F.col("t")).select(
        "l_partkey", "value"
    )


@q(
    "tpch_q12_late_lines",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def tpch_q12_late_lines(spark, sf_dir):
    """Q12 shape: late-shipment lines split into high/low-priority
    counts per line attribute (no shipmode/receiptdate in the fixture:
    'late' = shipped >60 days after order; the plan shape — fact⨝fact
    join, date-lag predicate, two conditional sums — is the original's)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("int")).cast("bigint").alias("high_line_count"),
            F.sum((~high).cast("int")).cast("bigint").alias("low_line_count"),
        )
    )
