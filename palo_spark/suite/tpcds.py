"""TPC-DS-shaped stretch queries over the star fixtures.

Doris's regression suite runs TPC-DS 99 (SURVEY.md §5.1, upstream:
``regression-test/suites/tpcds_sf1_p1``); the fixture schema is
TPC-H-ish, so these re-create the characteristic TPC-DS *shapes* —
window-over-aggregate trend analysis (q47/q57), multi-level ROLLUP
hierarchies (q18/q22), CASE-heavy banded aggregates (q34/q88), EXISTS /
NOT EXISTS chains (q10/q35), channel UNIONs re-aggregated (q71), and
per-group top-n over joined aggregates (q38-ish) — on the star tables.

Scale notes: every shape is one or two keyed shuffles plus windows over
the already-aggregated (small) result; dimension joins broadcast under
AQE. Double sums use the suite's floor-decimal ``dsum`` for
cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import davg, dsum, o_davg, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


@q(
    "tpcds_window_over_agg",
    f"""
    WITH monthly AS (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym,
               {o_dsum('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY n_name, strftime(o_orderdate, '%Y-%m')
    )
    SELECT n_name, ym, revenue,
           CAST(RANK() OVER (PARTITION BY n_name ORDER BY revenue DESC, ym) AS INT) AS rev_rank,
           (CAST(SUM(CAST(FLOOR(revenue * 10000.0) AS DECIMAL(38,0)))
                 OVER (PARTITION BY n_name) AS DOUBLE) / 10000.0)
           / COUNT(revenue) OVER (PARTITION BY n_name) AS nation_avg
    FROM monthly
    """,
)
def tpcds_window_over_agg(spark, sf_dir):
    """TPC-DS q47/q57 shape: aggregate to (nation, month) grain, then
    windows OVER the aggregate — rank within nation + deviation base
    (nation average). Window input is the post-agg frame (|nations|×
    |months| rows), so the window shuffle is tiny regardless of fact
    size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name")
    nation_avg = (
        F.sum(F.floor(F.col("revenue") * 10000.0).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        / 10000.0
    ) / F.count("revenue").over(w)
    return monthly.select(
        "n_name",
        "ym",
        "revenue",
        F.rank().over(w.orderBy(F.desc("revenue"), F.col("ym"))).cast("int").alias("rev_rank"),
        nation_avg.alias("nation_avg"),
    )


@q(
    "tpcds_multilevel_rollup",
    f"""
    SELECT r_name, n_name, c_mktsegment,
           CAST(GROUPING(r_name) AS INT) + CAST(GROUPING(n_name) AS INT) * 2
               + CAST(GROUPING(c_mktsegment) AS INT) * 4 AS g_lvl,
           COUNT(*) AS n_cust,
           {o_davg('c_acctbal', scale=4)} AS avg_bal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
    """,
)
def tpcds_multilevel_rollup(spark, sf_dir):
    """TPC-DS q18/q22 shape: 3-level geography/segment ROLLUP with a
    grouping-level indicator — Doris's REPEAT node over a dimension
    hierarchy. One shuffle; REPEAT fan-out is 4× the (small) group
    count, not 4× the fact rows (Catalyst expands after partial agg)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name", "c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            davg("c_acctbal", scale=4).alias("avg_bal"),
            (
                F.grouping("r_name").cast("int")
                + F.grouping("n_name").cast("int") * 2
                + F.grouping("c_mktsegment").cast("int") * 4
            ).alias("g_lvl"),
        )
        .select("r_name", "n_name", "c_mktsegment", "g_lvl", "n_cust", "avg_bal")
    )


@q(
    "tpcds_case_heavy_agg",
    f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS q_low,
           CAST(SUM(CASE WHEN l_quantity BETWEEN 10 AND 30 THEN 1 ELSE 0 END) AS BIGINT) AS q_mid,
           CAST(SUM(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS BIGINT) AS q_high,
           {o_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount) ELSE 0 END", scale=10)} AS disc_rev,
           {o_dsum("CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END")} AS taxed_base
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpcds_case_heavy_agg(spark, sf_dir):
    """TPC-DS q34/q88 shape: one scan, many CASE-banded aggregates —
    the 8-way count-if pattern collapsed into a single pass (Doris would
    likewise evaluate all branches in one AGGREGATION node). All
    branches are codegen'd conditionals; no extra shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(qty < 10, 1).otherwise(0)).cast("bigint").alias("q_low"),
            F.sum(F.when((qty >= 10) & (qty <= 30), 1).otherwise(0)).cast("bigint").alias("q_mid"),
            F.sum(F.when(qty > 30, 1).otherwise(0)).cast("bigint").alias("q_high"),
            dsum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                ).otherwise(F.lit(0.0)),
                scale=10,
            ).alias("disc_rev"),
            dsum(
                F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(
                    F.lit(0.0)
                )
            ).alias("taxed_base"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "tpcds_exists_chain",
    """
    SELECT c_mktsegment, COUNT(*) AS n_cust
    FROM customer
    WHERE EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
          )
      AND EXISTS (
            SELECT 1 FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_custkey = c_custkey AND l_returnflag = 'R'
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
              AND o_totalprice > 300000
          )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpcds_exists_chain(spark, sf_dir):
    """TPC-DS q10/q35 shape: chained EXISTS / EXISTS-join / NOT EXISTS
    membership predicates, then aggregate. Catalyst decorrelates each
    into semi/anti hash joins on c_custkey (pinned native by
    test_semi_anti_joins_are_native) — never per-row subquery loops."""
    from palo_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_cust
        FROM customer
        WHERE EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
              )
          AND EXISTS (
                SELECT 1 FROM orders
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE o_custkey = c_custkey AND l_returnflag = 'R'
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                  AND o_totalprice > 300000
              )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@q(
    "tpcds_channel_union_agg",
    f"""
    WITH channels AS (
        SELECT 'open' AS channel, o_custkey AS ck, o_totalprice AS amt
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'closed' AS channel, o_custkey AS ck, o_totalprice AS amt
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT channel, c_mktsegment, COUNT(*) AS n_orders,
           {o_dsum('amt')} AS revenue
    FROM channels JOIN customer ON c_custkey = ck
    GROUP BY channel, c_mktsegment
    ORDER BY channel, c_mktsegment
    """,
)
def tpcds_channel_union_agg(spark, sf_dir):
    """TPC-DS q71 shape: multiple 'channels' UNION ALL'd with a channel
    tag, joined to a dimension and re-aggregated. The union is
    plan-level only (both branches scan the same parquet with disjoint
    pushed filters); one shuffle for the final group."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ch = (
        o.filter(F.col("o_orderstatus") == "O")
        .select(F.lit("open").alias("channel"), F.col("o_custkey").alias("ck"), F.col("o_totalprice").alias("amt"))
        .unionByName(
            o.filter(F.col("o_orderstatus") == "F").select(
                F.lit("closed").alias("channel"), F.col("o_custkey").alias("ck"), F.col("o_totalprice").alias("amt")
            )
        )
    )
    return (
        ch.join(c, ch.ck == c.c_custkey)
        .groupBy("channel", "c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("amt").alias("revenue"))
        .orderBy("channel", "c_mktsegment")
    )


@q(
    "tpcds_segment_topn",
    f"""
    WITH cust_rev AS (
        SELECT c_mktsegment, c_custkey, {o_dsum('o_totalprice')} AS revenue
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment, c_custkey
    ),
    ranked AS (
        SELECT c_mktsegment, c_custkey, revenue,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                    ORDER BY revenue DESC, c_custkey) AS INT) AS rn
        FROM cust_rev
    )
    SELECT c_mktsegment, c_custkey, revenue, rn FROM ranked WHERE rn <= 3
    """,
)
def tpcds_segment_topn(spark, sf_dir):
    """TPC-DS q38-adjacent shape: per-segment top-3 customers by joined
    aggregate revenue. row_number ≤ k over the agg output triggers
    WindowGroupLimit (bounded per-group heap) — the PARTITION_SORT
    posture that keeps top-n cheap at any segment cardinality."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("revenue"), F.col("c_custkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "revenue", "rn")
    )


@q(
    "tpcds_customer_set_ops",
    """
    WITH y94 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1994-01-01'
                   AND o_orderdate <  DATE '1995-01-01'),
         y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= DATE '1995-01-01'
                   AND o_orderdate <  DATE '1996-01-01'),
         open_ AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderstatus = 'O')
    SELECT CAST(COUNT(*) AS BIGINT) AS loyal_closed
    FROM ((SELECT o_custkey FROM y94
           INTERSECT
           SELECT o_custkey FROM y95)
          EXCEPT
          SELECT o_custkey FROM open_) t
    """,
)
def tpcds_customer_set_ops(spark, sf_dir):
    """TPC-DS q38/q87 shape: multi-way set algebra over customer id
    sets from different slices (bought in BOTH years, no open orders).
    INTERSECT/EXCEPT plan as hash semi/anti joins on the distinct sets
    — ids-only shuffles, never row payloads."""
    o = load_table(spark, sf_dir, "orders")
    y94 = o.filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    ).select("o_custkey").distinct()
    y95 = o.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey").distinct()
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return (
        y94.intersect(y95)
        .subtract(open_)
        .agg(F.count("*").cast("bigint").alias("loyal_closed"))
    )


@q(
    "tpcds_grouping_margin_rank",
    f"""
    WITH g AS (
        SELECT n_name, c_mktsegment,
               GROUPING(n_name) + GROUPING(c_mktsegment) * 2 AS lvl,
               {o_dsum('o_totalprice')} AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
    )
    SELECT COALESCE(n_name, '<all>') AS n_name,
           COALESCE(c_mktsegment, '<all>') AS c_mktsegment,
           CAST(lvl AS INT) AS lvl,
           FLOOR(rev / n_orders * 1e4) / 1e4 AS avg_order,
           CAST(RANK() OVER (PARTITION BY lvl
                             ORDER BY FLOOR(rev / n_orders * 1e4) / 1e4 DESC)
                AS INT) AS rnk
    FROM g
    """,
)
def tpcds_grouping_margin_rank(spark, sf_dir):
    """TPC-DS q36 shape: lattice rank — ROLLUP hierarchy with
    GROUPING() lineage, then RANK over each aggregation level by
    average order value. One REPEAT shuffle, window over the (small)
    lattice output."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            (F.grouping("n_name") + F.grouping("c_mktsegment") * 2).alias("lvl"),
            dsum("o_totalprice").alias("rev"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    avg_order = F.floor(F.col("rev") / F.col("n_orders") * 1e4) / 1e4
    w = Window.partitionBy("lvl").orderBy(F.desc(avg_order))
    return g.select(
        F.coalesce("n_name", F.lit("<all>")).alias("n_name"),
        F.coalesce("c_mktsegment", F.lit("<all>")).alias("c_mktsegment"),
        F.col("lvl").cast("int").alias("lvl"),
        avg_order.alias("avg_order"),
        F.rank().over(w).cast("int").alias("rnk"),
    )


@q(
    "tpcds_revenue_share",
    f"""
    WITH bt AS (
        SELECT p_brand, p_type, {o_dsum('l_extendedprice')} AS rev
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand, p_type
    )
    SELECT p_brand, p_type, rev,
           FLOOR(rev / SUM(rev) OVER (PARTITION BY p_brand) * 1e6) / 1e6
               AS share_in_brand
    FROM bt
    """,
)
def tpcds_revenue_share(spark, sf_dir):
    """TPC-DS q12/q98 shape: ratio-to-report — each (brand, type)'s
    revenue share within its brand via a windowed sum over the
    aggregate. The window input is the aggregated (small) frame, and
    the share divides two identical-order decimal sums, so the ratio is
    deterministic cross-engine."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bt = (
        l.join(p, p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_type")
        .agg(dsum("l_extendedprice").alias("rev"))
    )
    w = Window.partitionBy("p_brand")
    return bt.select(
        "p_brand",
        "p_type",
        "rev",
        (F.floor(F.col("rev") / F.sum("rev").over(w) * 1e6) / 1e6).alias(
            "share_in_brand"
        ),
    )


@q(
    "tpcds_am_pm_ratio",
    """
    SELECT event_type,
           CAST(COUNT(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12
                           THEN 1 END) AS BIGINT) AS am_cnt,
           CAST(COUNT(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) >= 12
                           THEN 1 END) AS BIGINT) AS pm_cnt,
           FLOOR(CAST(COUNT(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12
                                 THEN 1 END) AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) >= 12
                                     THEN 1 END), 0) * 1e4) / 1e4 AS am_pm_ratio
    FROM events GROUP BY event_type
    """,
)
def tpcds_am_pm_ratio(spark, sf_dir):
    """TPC-DS q90 shape: AM/PM activity ratio per event type — two
    conditionally-counted aggregates finished as a guarded ratio, one
    keyed shuffle, everything map-side-combined."""
    e = load_table(spark, sf_dir, "events")
    am = F.count(F.when(F.hour("ts") < 12, 1))
    pm = F.count(F.when(F.hour("ts") >= 12, 1))
    return e.groupBy("event_type").agg(
        am.cast("bigint").alias("am_cnt"),
        pm.cast("bigint").alias("pm_cnt"),
        (F.floor(am.cast("double") / F.nullif(pm, F.lit(0)) * 1e4) / 1e4).alias(
            "am_pm_ratio"
        ),
    )


@q(
    "tpcds_frequent_buyers",
    f"""
    WITH buyers AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               {o_dsum('o_totalprice')} AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 25
    )
    SELECT b.o_custkey, b.n_orders, b.spend
    FROM buyers b
    WHERE b.spend > 0.5 * (SELECT MAX(spend) FROM buyers)
    """,
)
def tpcds_frequent_buyers(spark, sf_dir):
    """TPC-DS q23 shape: frequent buyers (HAVING over a count) filtered
    against a scalar subquery of the cohort maximum — the aggregate
    frame is computed once and reused for both the filter's subquery
    and the output (Catalyst ReusedExchange / subquery reuse)."""
    o = load_table(spark, sf_dir, "orders")
    buyers = (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
        )
        .filter(F.col("n_orders") >= 25)
    )
    mx = buyers.agg(F.max("spend").alias("mx"))
    return (
        buyers.join(F.broadcast(mx))
        .filter(F.col("spend") > 0.5 * F.col("mx"))
        .select("o_custkey", "n_orders", "spend")
    )


_RET_CASE = "CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END"


@q(
    "tpcds_return_rate_bands",
    f"""
    WITH sr AS (
        SELECT l_suppkey,
               {o_dsum(_RET_CASE)}
                   AS ret_qty,
               {o_dsum('l_quantity')} AS tot_qty
        FROM lineitem GROUP BY l_suppkey
    ),
    banded AS (
        SELECT l_suppkey,
               FLOOR(ret_qty / tot_qty * 1e6) / 1e6 AS ret_rate,
               CAST(NTILE(4) OVER (ORDER BY FLOOR(ret_qty / tot_qty * 1e6) / 1e6,
                                   l_suppkey) AS INT) AS band
        FROM sr WHERE tot_qty > 0
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           FLOOR(AVG(ret_rate) * 1e6) / 1e6 AS avg_ret_rate
    FROM banded GROUP BY band
    """,
)
def tpcds_return_rate_bands(spark, sf_dir):
    """TPC-DS q49 shape: return-rate quartile banding — per-supplier
    return ratio, exact quartile banding with a unique tiebreak
    (deterministic), then per-band stats. The banding is
    ``operators.ranking.global_ntile`` — a range shuffle + keyed window
    + offset join, NOT ``NTILE(4) OVER (ORDER BY ...)``: the global
    window plans as Exchange SinglePartition (one task sorts every
    supplier), the one shape that cannot survive a 100× scale-up.
    Results are bit-equal to the oracle's exact NTILE because the order
    key (rate, suppkey) is unique."""
    from palo_spark.operators.ranking import global_ntile

    l = load_table(spark, sf_dir, "lineitem")
    sr = l.groupBy("l_suppkey").agg(
        dsum(
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)
        ).alias("ret_qty"),
        dsum("l_quantity").alias("tot_qty"),
    )
    rate = F.floor(F.col("ret_qty") / F.col("tot_qty") * 1e6) / 1e6
    banded = global_ntile(
        sr.filter(F.col("tot_qty") > 0).select(
            "l_suppkey", rate.alias("ret_rate")
        ),
        ["ret_rate", "l_suppkey"],
        4,
        out="band",
    )
    return banded.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        (F.floor(F.avg("ret_rate") * 1e6) / 1e6).alias("avg_ret_rate"),
    )


@q(
    "tpcds_yoy_growth",
    """
    WITH yearly AS (
        SELECT o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend_cents
        FROM orders GROUP BY o_custkey, EXTRACT(year FROM o_orderdate)
    )
    SELECT a.o_custkey AS custkey, a.yr AS yr,
           a.spend_cents AS prev_cents, b.spend_cents AS cur_cents
    FROM yearly a JOIN yearly b
      ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
    WHERE b.spend_cents > 2 * a.spend_cents
    ORDER BY custkey, yr
    """,
)
def tpcds_yoy_growth(spark, sf_dir):
    """TPC-DS q4/q11 shape: a per-(customer, year) aggregate CTE
    self-joined on (customer, year+1) to find customers whose spend
    more than doubled year-over-year. Shape notes: the self-join keys
    on the GROUP BY output — Catalyst reuses one Exchange for both
    sides of the self-join (aggregate once, join the result to itself);
    spend in integer cents so the growth comparison is exact."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("spend_cents")
    )
    a, b = yearly.alias("a"), yearly.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .filter(F.col("b.spend_cents") > 2 * F.col("a.spend_cents"))
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.yr").alias("yr"),
            F.col("a.spend_cents").alias("prev_cents"),
            F.col("b.spend_cents").alias("cur_cents"),
        )
        .orderBy("custkey", "yr")
    )


@q(
    "tpcds_cumulative_channels",
    """
    WITH mail AS (
        SELECT CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ym,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem WHERE l_returnflag = 'R'
        GROUP BY strftime(l_shipdate, '%Y-%m')
    ), ship AS (
        SELECT CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS ym,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem WHERE l_returnflag = 'A'
        GROUP BY strftime(l_shipdate, '%Y-%m')
    ), joined AS (
        SELECT COALESCE(m.ym, s.ym) AS ym, m.qty AS r_qty, s.qty AS a_qty
        FROM mail m FULL OUTER JOIN ship s ON m.ym = s.ym
    )
    SELECT ym,
           CAST(SUM(COALESCE(r_qty, 0)) OVER (ORDER BY ym
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r_cum,
           CAST(SUM(COALESCE(a_qty, 0)) OVER (ORDER BY ym
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS a_cum
    FROM joined
    ORDER BY ym
    """,
)
def tpcds_cumulative_channels(spark, sf_dir):
    """TPC-DS q51 shape: two channel aggregates FULL OUTER joined on
    the time key, then cumulative windows over the merged series. The
    windows run over the already-aggregated (months-sized) frame — the
    single-partition window is bounded by the number of months, never
    by fact rows, which is what makes q51's global ORDER BY survive
    scale."""
    li = load_table(spark, sf_dir, "lineitem")

    def chan(flag):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ym"))
            .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
        )

    m, s = chan("R").alias("m"), chan("A").alias("s")
    joined = m.join(s, F.col("m.ym") == F.col("s.ym"), "full_outer").select(
        F.coalesce(F.col("m.ym"), F.col("s.ym")).alias("ym"),
        F.col("m.qty").alias("r_qty"),
        F.col("s.qty").alias("a_qty"),
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return (
        joined.select(
            "ym",
            F.sum(F.coalesce(F.col("r_qty"), F.lit(0))).over(w).cast("long").alias("r_cum"),
            F.sum(F.coalesce(F.col("a_qty"), F.lit(0))).over(w).cast("long").alias("a_cum"),
        )
        .orderBy("ym")
    )


@q(
    "tpcds_cov_filter",
    """
    WITH s AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS sum_c,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                        * CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS DECIMAL(38,0)) AS sumsq_c
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand
    )
    SELECT p_brand, n, CAST(sum_c AS BIGINT) AS sum_cents
    FROM s
    WHERE n > 1 AND 100 * (n * sumsq_c - sum_c * sum_c) > 25 * sum_c * sum_c
    ORDER BY p_brand
    """,
)
def tpcds_cov_filter(spark, sf_dir):
    """TPC-DS q17 shape: statistical dispersion filter — keep brands
    whose price coefficient of variation exceeds 0.5. The CV test is
    cross-multiplied into EXACT integer arithmetic on cents
    (cv^2 = (n*sumsq - sum^2)/sum^2 > 0.25  <=>  100*(n*sumsq - sum^2)
    > 25*sum^2, DECIMAL(38,0) sums — no float stddev in either engine,
    so the boundary rows can't flip on summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    s = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents.cast("decimal(38,0)")).cast("decimal(38,0)").alias("sum_c"),
            F.sum((cents * cents).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("sumsq_c"),
        )
    )
    return (
        s.filter(
            (F.col("n") > 1)
            & (
                100 * (F.col("n") * F.col("sumsq_c") - F.col("sum_c") * F.col("sum_c"))
                > 25 * F.col("sum_c") * F.col("sum_c")
            )
        )
        .select("p_brand", "n", F.col("sum_c").cast("long").alias("sum_cents"))
        .orderBy("p_brand")
    )


@q(
    "tpcds_purchase_streaks",
    """
    WITH monthly AS (
        SELECT DISTINCT o_custkey,
               CAST(strftime(o_orderdate, '%Y') AS INT) * 12
                 + CAST(strftime(o_orderdate, '%m') AS INT) AS mi
        FROM orders
    ),
    grp AS (
        SELECT o_custkey, mi,
               mi - CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY mi) AS INT) AS g
        FROM monthly
    ),
    streaks AS (
        SELECT o_custkey, g, COUNT(*) AS len
        FROM grp GROUP BY o_custkey, g
    )
    SELECT o_custkey, CAST(MAX(len) AS INT) AS max_streak
    FROM streaks
    GROUP BY o_custkey
    HAVING MAX(len) >= 3
    ORDER BY max_streak DESC, o_custkey
    LIMIT 50
    """,
)
def tpcds_purchase_streaks(spark, sf_dir):
    """Gaps-and-islands consecutive-behavior shape (TPC-DS q… sequential
    purchase analysis): per customer, the longest run of CONSECUTIVE
    months with at least one order. month_index − dense_rank(month_index)
    is constant within a consecutive run (the islands trick), so one
    window + two keyed aggregations produce streak lengths; all frames
    after the first DISTINCT are |customers × months| — tiny."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int").alias("mi"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("mi")
    grp = monthly.withColumn(
        "g", F.col("mi") - F.dense_rank().over(w).cast("int")
    )
    streaks = grp.groupBy("o_custkey", "g").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("o_custkey")
        .agg(F.max("len").cast("int").alias("max_streak"))
        .filter(F.col("max_streak") >= 3)
        .orderBy(F.desc("max_streak"), "o_custkey")
        .limit(50)
    )


@q(
    "tpcds_rolling_3mo_avg",
    """
    WITH monthly AS (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY n_name, strftime(o_orderdate, '%Y-%m')
    )
    SELECT n_name, ym,
           CAST(cents AS BIGINT) AS cents,
           CAST(SUM(cents) OVER w AS BIGINT) AS roll_cents,
           COUNT(*) OVER w AS roll_n
    FROM monthly
    WINDOW w AS (PARTITION BY n_name ORDER BY ym ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY n_name, ym
    """,
)
def tpcds_rolling_3mo_avg(spark, sf_dir):
    """Rolling-frame trend shape (TPC-DS q47-adjacent): nation×month
    revenue with a 3-month ROWS frame. Integer cents keep the rolling
    sums bit-exact; the window input is the post-aggregate frame, so the
    frame scan is |nations × months| regardless of fact size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("ym")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.select(
            "n_name",
            "ym",
            F.col("cents").cast("long").alias("cents"),
            F.sum("cents").over(w).cast("long").alias("roll_cents"),
            F.count("*").over(w).alias("roll_n"),
        )
        .orderBy("n_name", "ym")
    )


@q(
    "tpcds_spend_deciles",
    """
    WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT o_custkey, cents,
               NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
        FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(MIN(cents) AS BIGINT) AS floor_cents,
           CAST(MAX(cents) AS BIGINT) AS ceil_cents
    FROM tiled
    GROUP BY decile
    ORDER BY decile
    """,
)
def tpcds_spend_deciles(spark, sf_dir):
    """Customer-stratification shape (TPC-DS customer segmentation):
    exact spend deciles per customer, then per-decile totals and
    boundaries. The tile order key (cents, custkey) is unique, so tile
    assignment is deterministic and bit-equal to the oracle's
    ``NTILE(10)``. Deciles come from ``operators.ranking.global_ntile``
    (range shuffle + keyed window + offset join) instead of a global
    window — ``NTILE(10) OVER (ORDER BY ...)`` plans as Exchange
    SinglePartition and one task would sort every customer, the one
    shape that cannot survive a 100× scale-up."""
    from palo_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tiled = global_ntile(spend, ["cents", "o_custkey"], 10, out="decile")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("cents").cast("long").alias("cents"),
            F.min("cents").cast("long").alias("floor_cents"),
            F.max("cents").cast("long").alias("ceil_cents"),
        )
        .orderBy("decile")
    )


# ----------------------------------------------------------------- r6 tranche
# VERDICT r5 advice #6: rollup-over-channel-union shapes, multi-year
# comparisons, returns anti-joins — the next slice of the 99-query
# surface (upstream: regression-test/suites/tpcds_sf1_p1). All money is
# exact integer cents so both engines agree bit-for-bit.

_CENTS = "CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"


@q(
    "tpcds_channel_rollup_union",
    f"""
    WITH u AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 'returns' ELSE 'sales' END
                   AS channel,
               n_name,
               CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY 1, 2
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(n_name, 'ALL') AS n_name,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(GROUPING(channel) * 2 + GROUPING(n_name) AS INT) AS lvl
    FROM u GROUP BY ROLLUP(channel, n_name)
    ORDER BY lvl, channel, n_name
    """,
)
def tpcds_channel_rollup_union(spark, sf_dir):
    """TPC-DS q5/q77 shape: per-channel results re-aggregated through a
    ROLLUP hierarchy (channel → nation → grand total). The rollup input
    is the post-aggregate |channels × nations| frame, so the REPEAT
    expansion is metadata-sized; the one fact shuffle is the (channel,
    nation) hash agg, dimensions broadcast under AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    u = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.when(F.col("l_returnflag") == "R", "returns")
            .otherwise("sales")
            .alias("channel"),
            "n_name",
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    return (
        u.rollup("channel", "n_name")
        .agg(
            F.sum("cents").cast("long").alias("cents"),
            (F.grouping("channel") * 2 + F.grouping("n_name"))
            .cast("int")
            .alias("lvl"),
        )
        .select(
            F.coalesce("channel", F.lit("ALL")).alias("channel"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "cents",
            "lvl",
        )
        .orderBy("lvl", "channel", "n_name")
    )


@q(
    "tpcds_yoy_nation_share",
    """
    WITH yearly AS (
        SELECT n_name, CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT n_name, yr, cents,
               CAST((CAST(cents AS HUGEINT) * 1000000)
                    // SUM(cents) OVER (PARTITION BY yr)
                    AS BIGINT) AS share_ppm
        FROM yearly
    )
    SELECT n_name, yr AS cur_yr,
           LAG(share_ppm) OVER (PARTITION BY n_name ORDER BY yr)
               AS prev_share_ppm,
           share_ppm AS cur_share_ppm
    FROM shared
    QUALIFY prev_share_ppm IS NOT NULL
        AND cur_share_ppm < prev_share_ppm
    ORDER BY n_name, cur_yr
    """,
)
def tpcds_yoy_nation_share(spark, sf_dir):
    """TPC-DS q74/q75 shape: multi-year comparison of each nation's
    share of total revenue — years where the share DECLINED vs the
    prior year. Shares are integer parts-per-million (exact BIGINT
    division) so the decline test can't flip on float rounding; all
    windows run over the |nations × years| aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yearly = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wy = Window.partitionBy("yr")
    # Exact integer ppm on BOTH sides (ADVICE r6): decimal(38,0) DIV here,
    # HUGEINT // in DuckDB. The earlier double-FLOOR form was only exact
    # below 2^53 — a (nation, year) aggregate past ~$90M in cents made
    # cents*1e6 inexact in IEEE double and the two engines' FLOOR of the
    # rounded product could disagree. Integer division never rounds.
    shared = (
        yearly.withColumn("__yr_total", F.sum("cents").over(wy))
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)"
                " DIV __yr_total AS BIGINT)"
            ),
        )
        .drop("__yr_total")
    )
    wn = Window.partitionBy("n_name").orderBy("yr")
    return (
        shared.select(
            "n_name",
            F.col("yr").alias("cur_yr"),
            F.lag("share_ppm").over(wn).alias("prev_share_ppm"),
            F.col("share_ppm").alias("cur_share_ppm"),
        )
        .filter(
            F.col("prev_share_ppm").isNotNull()
            & (F.col("cur_share_ppm") < F.col("prev_share_ppm"))
        )
        .orderBy("n_name", "cur_yr")
    )


@q(
    "tpcds_returns_anti_join",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS clean_orders
    FROM orders
    WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1997
      AND NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpcds_returns_anti_join(spark, sf_dir):
    """TPC-DS catalog-returns anti-join shape (q16 family): 1997 orders
    with NO returned line, counted per priority. Left-anti hash join on
    the order key after the returns-side filter — the anti side is
    pre-filtered to returned lines only, so the join build is a
    fraction of lineitem, and the year filter prunes the probe side at
    the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    ret = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(ret, "o_orderkey", "left_anti")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("clean_orders"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpcds_brand_rank_shift",
    f"""
    WITH by_year AS (
        SELECT p_brand, CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
               CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p_brand, yr,
               CAST(DENSE_RANK() OVER (PARTITION BY yr
                    ORDER BY cents DESC, p_brand) AS INT) AS rnk
        FROM by_year
    )
    SELECT a.p_brand AS p_brand, a.rnk AS rank_1996, b.rnk AS rank_1997,
           CAST(a.rnk - b.rnk AS INT) AS moved_up
    FROM ranked a JOIN ranked b
      ON a.p_brand = b.p_brand AND a.yr = 1996 AND b.yr = 1997
    WHERE ABS(a.rnk - b.rnk) >= 3
    ORDER BY moved_up DESC, p_brand
    """,
)
def tpcds_brand_rank_shift(spark, sf_dir):
    """Multi-year rank-movement shape (TPC-DS q74's rank comparison):
    brand revenue rank in 1996 vs 1997, reporting movers of ≥3
    positions. Both rankings window over the |brands| aggregate; the
    year-vs-year comparison is a self-join on brand of that tiny
    frame."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    by_year = (
        li.filter(F.year("l_shipdate").isin(1996, 1997))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("cents"), "p_brand")
    ranked = by_year.select(
        "p_brand", "yr", F.dense_rank().over(w).cast("int").alias("rnk")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    return (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand")))
        .filter((F.col("a.yr") == 1996) & (F.col("b.yr") == 1997))
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.rnk").alias("rank_1996"),
            F.col("b.rnk").alias("rank_1997"),
            (F.col("a.rnk") - F.col("b.rnk")).cast("int").alias("moved_up"),
        )
        .filter(F.abs(F.col("rank_1996") - F.col("rank_1997")) >= 3)
        .orderBy(F.desc("moved_up"), "p_brand")
    )


@q(
    "tpcds_lifetime_gap_bands",
    """
    WITH lifetime AS (
        SELECT o_custkey,
               date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS gap_days,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT CASE WHEN gap_days = 0 THEN 'single'
                WHEN gap_days <= 365 THEN 'within_1y'
                WHEN gap_days <= 1095 THEN 'within_3y'
                ELSE 'over_3y' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM lifetime GROUP BY 1 ORDER BY band
    """,
)
def tpcds_lifetime_gap_bands(spark, sf_dir):
    """Customer-lifetime banding (TPC-DS demographic-band family):
    first-to-last order span per customer, banded with CASE, counted.
    One keyed agg over orders, then a metadata-sized band agg."""
    o = load_table(spark, sf_dir, "orders")
    lifetime = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("gap_days"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    band = (
        F.when(F.col("gap_days") == 0, "single")
        .when(F.col("gap_days") <= 365, "within_1y")
        .when(F.col("gap_days") <= 1095, "within_3y")
        .otherwise("over_3y")
    )
    return (
        lifetime.groupBy(band.alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("band")
    )


@q(
    "tpcds_quarter_brand_deviation",
    f"""
    WITH q AS (
        SELECT p_brand,
               CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
               CAST(quarter(l_shipdate) AS INT) AS qtr,
               CAST(SUM({_CENTS}) AS BIGINT) AS qcents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1997
        GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT p_brand, yr, qtr, qcents,
               SUM(qcents) OVER (PARTITION BY p_brand) AS bcents,
               COUNT(*) OVER (PARTITION BY p_brand) AS nq
        FROM q
    )
    SELECT p_brand, qtr, qcents
    FROM tot
    WHERE nq > 1 AND qcents * nq * 10 > bcents * 11
    ORDER BY p_brand, qtr
    """,
)
def tpcds_quarter_brand_deviation(spark, sf_dir):
    """TPC-DS q53 shape: quarters where a brand's revenue exceeds 1.1×
    its own quarterly average for the year. The avg test is
    cross-multiplied into exact integers (qcents·nq·10 > bcents·11) so
    boundary quarters can't flip; windows run over the |brand ×
    quarter| aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    qf = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "p_brand",
            F.year("l_shipdate").cast("int").alias("yr"),
            F.quarter("l_shipdate").cast("int").alias("qtr"),
        )
        .agg(F.sum(cents).cast("long").alias("qcents"))
    )
    wb = Window.partitionBy("p_brand")
    tot = qf.select(
        "p_brand",
        "qtr",
        "qcents",
        F.sum("qcents").over(wb).alias("bcents"),
        F.count("*").over(wb).alias("nq"),
    )
    return (
        tot.filter(
            (F.col("nq") > 1)
            & (F.col("qcents") * F.col("nq") * 10 > F.col("bcents") * 11)
        )
        .select("p_brand", "qtr", "qcents")
        .orderBy("p_brand", "qtr")
    )


@q(
    "tpcds_returned_spend_ratio",
    f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_CENTS}
                             ELSE 0 END) AS BIGINT) AS ret_cents,
               CAST(SUM({_CENTS}) AS BIGINT) AS tot_cents
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY o_custkey
    )
    SELECT o_custkey, ret_cents, tot_cents
    FROM per_cust
    WHERE ret_cents * 2 > tot_cents AND tot_cents > 0
    ORDER BY ret_cents DESC, o_custkey
    LIMIT 40
    """,
)
def tpcds_returned_spend_ratio(spark, sf_dir):
    """TPC-DS q93 shape: customers whose RETURNED spend exceeds half
    their total spend, top 40 by returned value. One fact-side join +
    one keyed agg; the ratio test is exact integer cross-multiplication
    (ret·2 > tot), LIMIT is a bounded heap."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    per_cust = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", cents).otherwise(0))
            .cast("long")
            .alias("ret_cents"),
            F.sum(cents).cast("long").alias("tot_cents"),
        )
    )
    return (
        per_cust.filter(
            (F.col("ret_cents") * 2 > F.col("tot_cents")) & (F.col("tot_cents") > 0)
        )
        .orderBy(F.desc("ret_cents"), "o_custkey")
        .limit(40)
    )


@q(
    "tpcds_promo_share_by_nation",
    f"""
    SELECT n_name,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_CENTS} ELSE 0 END)
                AS BIGINT) AS promo_cents,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           CAST((CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_CENTS} ELSE 0 END)
                AS HUGEINT) * 1000000) // SUM({_CENTS}) AS BIGINT) AS promo_ppm
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_promo_share_by_nation(spark, sf_dir):
    """TPC-DS q61 shape (promotion effect by geography): per supplier
    nation, the promo-part share of revenue in integer ppm. Conditional
    aggregation — ONE pass over the fact join, no second subquery scan;
    part/supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", cents).otherwise(0)
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(promo).cast("long").alias("promo_cents"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
        # exact integer ppm — decimal DIV / hugeint //, never a double
        # product (see yoy_nation_share note)
        .withColumn(
            "promo_ppm",
            F.expr(
                "CAST((CAST(promo_cents AS DECIMAL(38,0)) * 1000000)"
                " DIV total_cents AS BIGINT)"
            ),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_priority_year_matrix",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
                THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y1995_cents,
           CAST(SUM(CASE WHEN CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
                THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y1996_cents,
           CAST(SUM(CASE WHEN CAST(strftime(o_orderdate, '%Y') AS INT) = 1997
                THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS y1997_cents
    FROM orders
    WHERE CAST(strftime(o_orderdate, '%Y') AS INT) BETWEEN 1995 AND 1997
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpcds_priority_year_matrix(spark, sf_dir):
    """TPC-DS q66 matrix shape: a years × priority pivot as conditional
    sums in ONE scan+agg (the manual-pivot form every DS matrix query
    compiles to) — no per-year re-scan, no transpose shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").between(1995, 1997)
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")

    def ycol(y):
        return (
            F.sum(F.when(F.year("o_orderdate") == y, cents).otherwise(0))
            .cast("long")
            .alias(f"y{y}_cents")
        )

    return (
        o.groupBy("o_orderpriority")
        .agg(ycol(1995), ycol(1996), ycol(1997))
        .orderBy("o_orderpriority")
    )


# -------------------------------------------------------- r6 tranche, wave 4
# Remaining TPC-DS archetypes: correlated group-average filters (q1),
# frequent-item/best-customer set composition (q23), channel-parity
# bands (q58), repeat-purchase self-joins (q64), and multi-band count
# matrices (q88).


@q(
    "tpcds_above_nation_avg_returns",
    f"""
    WITH per_cust AS (
        SELECT c_custkey, c_nationkey,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_CENTS}
                             ELSE 0 END) AS BIGINT) AS ret_cents
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        GROUP BY c_custkey, c_nationkey
    ),
    nat AS (
        SELECT c_nationkey AS nk,
               CAST(SUM(ret_cents) AS BIGINT) AS nat_cents,
               CAST(COUNT(*) AS BIGINT) AS nat_n
        FROM per_cust GROUP BY c_nationkey
    )
    SELECT c_custkey, ret_cents
    FROM per_cust JOIN nat ON nk = c_nationkey
    WHERE ret_cents * nat_n * 10 > nat_cents * 12
    ORDER BY ret_cents DESC, c_custkey
    LIMIT 100
    """,
)
def tpcds_above_nation_avg_returns(spark, sf_dir):
    """TPC-DS q1 shape: customers whose returned value exceeds 1.2× the
    average of their nation — the correlated aggregate decorrelated
    into (per-customer agg) ⋈ (per-nation re-agg), with the comparison
    cross-multiplied into exact integers. The nation frame is
    |nations|-sized and broadcasts; one fact shuffle total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    per_cust = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", cents).otherwise(0))
            .cast("long")
            .alias("ret_cents")
        )
    )
    nat = per_cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum("ret_cents").cast("long").alias("nat_cents"),
        F.count("*").cast("long").alias("nat_n"),
    )
    return (
        per_cust.join(F.broadcast(nat), F.col("nk") == F.col("c_nationkey"))
        .filter(F.col("ret_cents") * F.col("nat_n") * 10 > F.col("nat_cents") * 12)
        .select("c_custkey", "ret_cents")
        .orderBy(F.desc("ret_cents"), "c_custkey")
        .limit(100)
    )


@q(
    "tpcds_frequent_parts_best_customers",
    f"""
    WITH freq_parts AS (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(*) >= 8
    ),
    best_cust AS (
        SELECT o_custkey FROM orders
        GROUP BY o_custkey
        HAVING SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) >= 50000000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENTS}) AS BIGINT) AS cents
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM freq_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_cust)
    """,
)
def tpcds_frequent_parts_best_customers(spark, sf_dir):
    """TPC-DS q23 shape: spend of high-value customers on frequently
    sold parts — two independently computed membership sets applied as
    semi-joins to the fact. Both set builds are keyed aggregates with
    HAVING; the memberships broadcast (they are aggregate outputs, a
    fraction of the fact)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    freq_parts = (
        li.groupBy("l_partkey").agg(F.count("*").alias("n")).filter(F.col("n") >= 8)
        .select("l_partkey")
    )
    best_cust = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("s"))
        .filter(F.col("s") >= 50000000)
        .select("o_custkey")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(freq_parts), "l_partkey", "left_semi")
        .join(F.broadcast(best_cust), "o_custkey", "left_semi")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(cents).cast("long").alias("cents"),
        )
    )


@q(
    "tpcds_channel_parity_brands",
    f"""
    WITH ch AS (
        SELECT p_brand,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {_CENTS}
                             ELSE 0 END) AS BIGINT) AS f_cents,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {_CENTS}
                             ELSE 0 END) AS BIGINT) AS o_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand
    )
    SELECT p_brand, f_cents, o_cents
    FROM ch
    WHERE f_cents > 0 AND o_cents > 0
      AND f_cents * 10 <= o_cents * 11 AND o_cents * 10 <= f_cents * 11
    ORDER BY p_brand
    """,
)
def tpcds_channel_parity_brands(spark, sf_dir):
    """TPC-DS q58 shape: brands whose revenue is within ±10% across two
    channels (linestatus F vs O standing in for store/web). Both
    channel sums come from ONE conditional aggregate pass; the
    symmetric band test is exact integer cross-multiplication."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    ch = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", cents).otherwise(0))
            .cast("long")
            .alias("f_cents"),
            F.sum(F.when(F.col("l_linestatus") == "O", cents).otherwise(0))
            .cast("long")
            .alias("o_cents"),
        )
    )
    return (
        ch.filter(
            (F.col("f_cents") > 0)
            & (F.col("o_cents") > 0)
            & (F.col("f_cents") * 10 <= F.col("o_cents") * 11)
            & (F.col("o_cents") * 10 <= F.col("f_cents") * 11)
        )
        .orderBy("p_brand")
    )


@q(
    "tpcds_repeat_purchase_pairs",
    """
    WITH cp AS (
        SELECT DISTINCT o_custkey, l_partkey,
               CAST(strftime(o_orderdate, '%Y') AS INT) AS yr
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (1996, 1997)
    )
    SELECT a.o_custkey AS custkey, a.l_partkey AS partkey
    FROM cp a JOIN cp b
      ON a.o_custkey = b.o_custkey AND a.l_partkey = b.l_partkey
     AND a.yr = 1996 AND b.yr = 1997
    ORDER BY custkey, partkey
    LIMIT 200
    """,
)
def tpcds_repeat_purchase_pairs(spark, sf_dir):
    """TPC-DS q64 shape: (customer, part) pairs bought in BOTH 1996 and
    1997 — the fact self-join on the composite key after a DISTINCT
    reduction. The distinct (cust, part, yr) frame is the only fact
    shuffle; the year-vs-year join is a co-partitioned hash join on the
    same key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cp = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .select(
            "o_custkey", "l_partkey", F.year("o_orderdate").cast("int").alias("yr")
        )
        .distinct()
    )
    a, b = cp.alias("a"), cp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_partkey") == F.col("b.l_partkey")),
        )
        .filter((F.col("a.yr") == 1996) & (F.col("b.yr") == 1997))
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.l_partkey").alias("partkey"),
        )
        .orderBy("custkey", "partkey")
        .limit(200)
    )


@q(
    "tpcds_hour_value_band_matrix",
    """
    SELECT event_type,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) < 8
                         AND value < 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS night_small,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) < 8
                         AND value >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS night_large,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 15
                         AND value < 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS day_small,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 8 AND 15
                         AND value >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS day_large,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) > 15
                         AND value < 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS eve_small,
           CAST(SUM(CASE WHEN EXTRACT(hour FROM ts) > 15
                         AND value >= 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS eve_large
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def tpcds_hour_value_band_matrix(spark, sf_dir):
    """TPC-DS q88 shape: the 3×2 time-of-day × size count matrix in ONE
    scan — q88's eight correlated sub-selects collapsed into
    conditional aggregation (Doris's AGGREGATION node evaluates all
    cells per row the same way)."""
    e = load_table(spark, sf_dir, "events")
    hr = F.hour("ts")

    def cell(name, hcond, vcond):
        return (
            F.sum(F.when(hcond & vcond, 1).otherwise(0)).cast("bigint").alias(name)
        )

    v = F.col("value")
    return (
        e.groupBy("event_type")
        .agg(
            cell("night_small", hr < 8, v < 100),
            cell("night_large", hr < 8, v >= 100),
            cell("day_small", (hr >= 8) & (hr <= 15), v < 100),
            cell("day_large", (hr >= 8) & (hr <= 15), v >= 100),
            cell("eve_small", hr > 15, v < 100),
            cell("eve_large", hr > 15, v >= 100),
        )
        .orderBy("event_type")
    )


@q(
    "tpcds_category_cross_channel",
    f"""
    WITH pool AS (
        SELECT l_partkey, l_returnflag, {_CENTS} AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type IN ('PROMO', 'ECONOMY')
    )
    SELECT l_partkey AS partkey,
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN cents ELSE 0 END)
                AS BIGINT) AS n_cents,
           CAST(SUM(CASE WHEN l_returnflag <> 'N' THEN cents ELSE 0 END)
                AS BIGINT) AS rest_cents
    FROM pool
    GROUP BY l_partkey
    HAVING SUM(cents) > 0
    ORDER BY n_cents + rest_cents DESC, partkey
    LIMIT 60
    """,
)
def tpcds_category_cross_channel(spark, sf_dir):
    """TPC-DS q33/q56 shape: revenue for a category short-list split
    across channels, top parts by combined revenue. The category filter
    (an IN over a literal list) prunes at the broadcast-joined part
    side BEFORE the fact aggregate — the oracle's WHERE and the Spark
    plan both reduce the fact input first."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("PROMO", "ECONOMY")
    )
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    pool = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    return (
        pool.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "N", cents).otherwise(0))
            .cast("long")
            .alias("n_cents"),
            F.sum(F.when(F.col("l_returnflag") != "N", cents).otherwise(0))
            .cast("long")
            .alias("rest_cents"),
        )
        .filter(F.col("n_cents") + F.col("rest_cents") > 0)
        .orderBy(F.desc(F.col("n_cents") + F.col("rest_cents")), "partkey")
        .limit(60)
    )


# -------------------------------------------------------- r6 tranche, wave 5
# Latency banding (q62), multi-supplier order predicates (q95/q21),
# above-own-average detail filters (q92), and buy→return→re-buy event
# chains (q25/q29).


@q(
    "tpcds_ship_latency_bands",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END)
                AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90p
    FROM (
        SELECT o_orderpriority,
               date_diff('day', o_orderdate, l_shipdate) AS lat
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ) t
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpcds_ship_latency_bands(spark, sf_dir):
    """TPC-DS q62 shape: order→ship latency banded into 30-day buckets
    per priority — the days-in-transit matrix as conditional sums in
    one pass over the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(name, cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderpriority", lat.alias("lat"))
        .groupBy("o_orderpriority")
        .agg(
            band("d30", F.col("lat") <= 30),
            band("d60", (F.col("lat") > 30) & (F.col("lat") <= 60)),
            band("d90", (F.col("lat") > 60) & (F.col("lat") <= 90)),
            band("d90p", F.col("lat") > 90),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "tpcds_multi_supplier_returned_orders",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING COUNT(DISTINCT l_suppkey) >= 3
           AND SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
    )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpcds_multi_supplier_returned_orders(spark, sf_dir):
    """TPC-DS q95/q21 shape: orders touched by ≥3 distinct suppliers
    with at least one returned line — a grouped-HAVING membership set
    semi-joined back to orders. ONE aggregate over the fact computes
    both conditions; the qualifying id set broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ids = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("nr"),
        )
        .filter((F.col("ns") >= 3) & (F.col("nr") > 0))
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(ids, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@q(
    "tpcds_discount_above_part_avg",
    """
    WITH pavg AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(FLOOR(l_discount * 1000) AS BIGINT)) AS BIGINT)
                   AS mdisc_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem JOIN pavg ON pk = l_partkey
    WHERE n > 1
      AND CAST(FLOOR(l_discount * 1000) AS BIGINT) * n * 10 > mdisc_sum * 13
    """,
)
def tpcds_discount_above_part_avg(spark, sf_dir):
    """TPC-DS q92 shape: lineitems discounted more than 1.3× their own
    part's average discount — the correlated scalar average
    decorrelated into a per-part aggregate joined back to the detail,
    compared in exact integer milli-discounts (no float boundary
    flips). Two passes over the fact, one keyed shuffle each; the
    per-part aggregate is |parts|-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    mdisc = F.floor(F.col("l_discount") * 1000).cast("long")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(mdisc).cast("long").alias("mdisc_sum"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        li.join(pavg, F.col("pk") == F.col("l_partkey"))
        .filter(
            (F.col("n") > 1)
            & (mdisc * F.col("n") * 10 > F.col("mdisc_sum") * 13)
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


@q(
    "tpcds_buy_return_rebuy",
    """
    WITH ev AS (
        SELECT o_custkey AS ck, l_partkey AS pk, l_shipdate AS d,
               l_returnflag = 'R' AS ret
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    firsts AS (
        SELECT ck, pk,
               MIN(CASE WHEN ret THEN d END) AS first_ret,
               MAX(d) AS last_any
        FROM ev GROUP BY ck, pk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM firsts
    WHERE first_ret IS NOT NULL AND last_any > first_ret
    """,
)
def tpcds_buy_return_rebuy(spark, sf_dir):
    """TPC-DS q25/q29 chain shape: (customer, part) pairs with a
    purchase AFTER their first return of that part — the
    sold→returned→re-sold funnel collapsed into one keyed aggregate
    (first return date vs latest activity date) instead of a 3-way
    fact self-join; same result set, one fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ev = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").alias("d"),
        (F.col("l_returnflag") == "R").alias("ret"),
    )
    firsts = ev.groupBy("ck", "pk").agg(
        F.min(F.when(F.col("ret"), F.col("d"))).alias("first_ret"),
        F.max("d").alias("last_any"),
    )
    return firsts.filter(
        F.col("first_ret").isNotNull() & (F.col("last_any") > F.col("first_ret"))
    ).agg(F.count("*").cast("bigint").alias("n_pairs"))


# ------------------------------------------------------------ wave 6
# Inventory / date-dimension shapes (VERDICT r6 advice #4): rolling
# stock-out windows (q72), same-store YoY churn via EXCEPT (q38/q87),
# cross-channel customer migration (q68-ish), grouping-set channel
# margins (q77/q80), running inventory position, cohort matrices (q30),
# gaps-and-islands consecutive activity, weekday/weekend date-dim mix.
# Money stays exact-integer cents (FLOOR(x*100) summed as BIGINT);
# shares use decimal DIV / hugeint // (never a double product).

_NET_CENTS = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


@q(
    "tpcds_rolling_stockout",
    f"""
    WITH monthly AS (
        SELECT p_brand, strftime(l_shipdate, '%Y-%m') AS ym,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2
    ),
    rolled AS (
        SELECT p_brand, ym, qty,
               CAST(SUM(qty) OVER (PARTITION BY p_brand ORDER BY ym
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS demand_3mo,
               CAST(SUM(qty) OVER (PARTITION BY p_brand) AS BIGINT) AS total_qty,
               CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_months
        FROM monthly
    )
    SELECT p_brand,
           CAST(COUNT(*) FILTER (WHERE demand_3mo * n_months > 4 * total_qty)
                AS BIGINT) AS risk_months,
           CAST(MAX(demand_3mo) AS BIGINT) AS peak_3mo_qty
    FROM rolled
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def tpcds_rolling_stockout(spark, sf_dir):
    """TPC-DS q72 (inventory stock-out) shape on the star fixtures:
    demand aggregated to (brand, ship-month) grain, a 3-month rolling
    window over the aggregate flags months whose rolling demand exceeds
    the brand's long-run rate (exact integer cross-multiplication
    ``demand_3mo·n_months > 4·total`` — no division, no floats). The
    rolling window runs per brand over ≤ |months| rows — keyed, never
    fact-scaled."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", F.date_format("l_shipdate", "yyyy-MM").alias("ym"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    wb = Window.partitionBy("p_brand")
    w3 = wb.orderBy("ym").rowsBetween(-2, Window.currentRow)
    rolled = monthly.select(
        "p_brand",
        "ym",
        F.sum("qty").over(w3).cast("long").alias("demand_3mo"),
        F.sum("qty").over(wb).cast("long").alias("total_qty"),
        F.count("*").over(wb).cast("long").alias("n_months"),
    )
    return (
        rolled.groupBy("p_brand")
        .agg(
            F.count(
                F.when(
                    F.col("demand_3mo") * F.col("n_months")
                    > 4 * F.col("total_qty"),
                    True,
                )
            )
            .cast("long")
            .alias("risk_months"),
            F.max("demand_3mo").cast("long").alias("peak_3mo_qty"),
        )
        .orderBy("p_brand")
    )


@q(
    "tpcds_same_store_yoy_except",
    """
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
    ),
    y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
    ),
    churned AS (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    SELECT n_name,
           CAST(COUNT(DISTINCT ch.o_custkey) AS BIGINT) AS churned_customers,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS lost_spend_cents
    FROM churned ch
    JOIN customer ON c_custkey = ch.o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN orders o ON o.o_custkey = ch.o_custkey
              AND CAST(strftime(o.o_orderdate, '%Y') AS INT) = 1995
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_same_store_yoy_except(spark, sf_dir):
    """TPC-DS q38/q87 EXCEPT shape as same-store YoY churn: customers
    active in 1995 EXCEPT active in 1996, then their 1995 spend rolled
    up per nation. The EXCEPT runs on DISTINCT custkey sets (already
    reduced), the spend join is a semi-join-shaped probe back into the
    1995 slice; nation/customer dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("o_orderdate")
    y95 = o.filter(yr == 1995).select("o_custkey").distinct()
    y96 = o.filter(yr == 1996).select("o_custkey").distinct()
    churned = y95.exceptAll(y96).distinct()
    spend95 = o.filter(yr == 1995).join(churned, "o_custkey")
    return (
        spend95.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("churned_customers"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("lost_spend_cents"),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_cross_channel_migration",
    """
    WITH tagged AS (
        SELECT o_custkey,
               CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'express' ELSE 'standard' END AS channel,
               COUNT(*) AS n
        FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (1995, 1996)
        GROUP BY 1, 2, 3
    ),
    dominant AS (
        SELECT o_custkey, yr, channel FROM (
            SELECT o_custkey, yr, channel,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, yr
                        ORDER BY n DESC, channel DESC) AS rn
            FROM tagged
        ) WHERE rn = 1
    )
    SELECT a.channel AS from_channel, b.channel AS to_channel,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM dominant a JOIN dominant b
      ON a.o_custkey = b.o_custkey AND a.yr = 1995 AND b.yr = 1996
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_cross_channel_migration(spark, sf_dir):
    """TPC-DS cross-channel migration matrix: each customer's dominant
    order channel (priority band) in 1995 vs 1996, counted as a 2×2
    from→to matrix. Dominance = max order count, ties to the
    lexically-higher channel (max_by struct ordering = the oracle's
    ROW_NUMBER tie-break). One keyed agg + one self-join on the
    per-customer-year frame (already ≤ |customers|·2 rows)."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    channel = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "express"
    ).otherwise("standard")
    tagged = (
        o.filter(yr.isin(1995, 1996))
        .groupBy("o_custkey", yr.alias("yr"), channel.alias("channel"))
        .agg(F.count("*").alias("n"))
    )
    dominant = tagged.groupBy("o_custkey", "yr").agg(
        F.max_by("channel", F.struct(F.col("n"), F.col("channel"))).alias("channel")
    )
    a = dominant.filter(F.col("yr") == 1995).select(
        "o_custkey", F.col("channel").alias("from_channel")
    )
    b = dominant.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("channel").alias("to_channel")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("from_channel", "to_channel")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("from_channel", "to_channel")
    )


@q(
    "tpcds_channel_margin_grouping_sets",
    f"""
    WITH base AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'express' ELSE 'standard' END AS channel,
               CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               {_CENTS} AS gross,
               {_NET_CENTS} AS net
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT COALESCE(channel, 'ALL') AS channel,
           COALESCE(CAST(yr AS VARCHAR), 'ALL') AS yr,
           CAST(SUM(gross) AS BIGINT) AS gross_cents,
           CAST(SUM(net) AS BIGINT) AS net_cents,
           CAST(SUM(gross) - SUM(net) AS BIGINT) AS discount_cents,
           CAST(GROUPING(channel) * 2 + GROUPING(yr) AS INT) AS lvl
    FROM base
    GROUP BY GROUPING SETS ((channel, yr), (channel), ())
    ORDER BY lvl, channel, yr
    """,
)
def tpcds_channel_margin_grouping_sets(spark, sf_dir):
    """TPC-DS q77/q80 shape: channel margin report over GROUPING SETS
    ((channel, yr), (channel), ()) — gross vs discounted revenue and
    the margin given away, with the GROUPING() bitmask as the level
    marker. One fact-side pass (grouping sets expand AFTER the partial
    aggregate), dims broadcast; all money exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    channel = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "express"
    ).otherwise("standard")
    base = li.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        channel.alias("channel"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("gross"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("net"),
    )
    return (
        base.groupingSets(
            [["channel", "yr"], ["channel"], []], "channel", "yr"
        )
        .agg(
            F.sum("gross").cast("long").alias("gross_cents"),
            F.sum("net").cast("long").alias("net_cents"),
            (F.sum("gross") - F.sum("net")).cast("long").alias("discount_cents"),
            (F.grouping("channel") * 2 + F.grouping("yr"))
            .cast("int")
            .alias("lvl"),
        )
        .select(
            F.coalesce("channel", F.lit("ALL")).alias("channel"),
            F.coalesce(F.col("yr").cast("string"), F.lit("ALL")).alias("yr"),
            "gross_cents",
            "net_cents",
            "discount_cents",
            "lvl",
        )
        .orderBy("lvl", "channel", "yr")
    )


@q(
    "tpcds_inventory_position",
    """
    WITH monthly AS (
        SELECT n_name, strftime(l_shipdate, '%Y-%m') AS ym,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_quantity AS BIGINT)
                             ELSE -CAST(l_quantity AS BIGINT) END)
                    AS BIGINT) AS net_qty
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, ym, net_qty,
           CAST(SUM(net_qty) OVER (PARTITION BY n_name ORDER BY ym)
                AS BIGINT) AS position_qty
    FROM monthly
    ORDER BY n_name, ym
    """,
)
def tpcds_inventory_position(spark, sf_dir):
    """Running inventory position per supplier nation: returns restock
    (+qty), shipments draw down (−qty); monthly nets accumulate through
    a window PARTITIONED BY nation over the (nation × month) aggregate
    — ≤ |nations|·|months| rows, so the cumulative sort is keyed and
    calendar-bounded, never fact-scaled (the q72 date-dim companion)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    qty = F.col("l_quantity").cast("long")
    monthly = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", F.date_format("l_shipdate", "yyyy-MM").alias("ym"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", qty).otherwise(-qty)
            )
            .cast("long")
            .alias("net_qty")
        )
    )
    w = Window.partitionBy("n_name").orderBy("ym")
    return monthly.select(
        "n_name",
        "ym",
        "net_qty",
        F.sum("net_qty").over(w).cast("long").alias("position_qty"),
    ).orderBy("n_name", "ym")


@q(
    "tpcds_quarter_brand_share",
    f"""
    WITH qb AS (
        SELECT strftime(l_shipdate, '%Y') || '-Q' ||
               CAST(quarter(l_shipdate) AS VARCHAR) AS qtr,
               p_brand,
               CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2
    ),
    shared AS (
        SELECT qtr, p_brand, cents,
               CAST((CAST(cents AS HUGEINT) * 1000000)
                    // SUM(cents) OVER (PARTITION BY qtr) AS BIGINT)
                   AS share_ppm
        FROM qb
    )
    SELECT qtr, p_brand, cents, share_ppm FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qtr
                    ORDER BY share_ppm DESC, p_brand) AS rn
        FROM shared
    ) WHERE rn <= 3
    ORDER BY qtr, share_ppm DESC, p_brand
    """,
)
def tpcds_quarter_brand_share(spark, sf_dir):
    """Top-3 brands per quarter by revenue share: (quarter, brand)
    aggregate, exact-integer ppm share (decimal DIV — the r6 advice
    pattern), per-quarter top-3 via a keyed window (WindowGroupLimit
    keeps a 3-row heap per quarter). Quarter key built as YYYY-Qn in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qtr = F.concat(
        F.year("l_shipdate").cast("string"),
        F.lit("-Q"),
        F.quarter("l_shipdate").cast("string"),
    )
    qb = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(qtr.alias("qtr"), F.col("p_brand"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wq = Window.partitionBy("qtr")
    shared = (
        qb.withColumn("__q_total", F.sum("cents").over(wq))
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)"
                " DIV __q_total AS BIGINT)"
            ),
        )
        .drop("__q_total")
    )
    wr = wq.orderBy(F.desc("share_ppm"), "p_brand")
    return (
        shared.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("qtr", "p_brand", "cents", "share_ppm")
        .orderBy("qtr", F.desc("share_ppm"), "p_brand")
    )


@q(
    "tpcds_first_purchase_cohort",
    """
    WITH firsts AS (
        SELECT o_custkey,
               MIN(CAST(strftime(o_orderdate, '%Y') AS INT)) AS cohort
        FROM orders GROUP BY o_custkey
    )
    SELECT f.cohort,
           CAST(strftime(o.o_orderdate, '%Y') AS INT) AS yr,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_first_purchase_cohort(spark, sf_dir):
    """TPC-DS q30-style cohort matrix: customers keyed by first-order
    year, then (cohort × order-year) activity and spend. Two keyed
    shuffles on o_custkey (the min-year aggregate reuses the join
    partitioning); output is a |years|² matrix."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate").cast("int")).alias("cohort")
    )
    return (
        o.join(firsts, "o_custkey")
        .groupBy("cohort", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("active_customers"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents"),
        )
        .orderBy("cohort", "yr")
    )


@q(
    "tpcds_consecutive_active_months",
    """
    WITH months AS (
        SELECT DISTINCT n_name,
               CAST(strftime(o_orderdate, '%Y') AS INT) * 12 +
               CAST(strftime(o_orderdate, '%m') AS INT) AS midx
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
    ),
    islands AS (
        SELECT n_name,
               midx - ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY midx)
                   AS grp
        FROM months
    )
    SELECT n_name, CAST(MAX(run_len) AS BIGINT) AS longest_streak_months
    FROM (
        SELECT n_name, grp, COUNT(*) AS run_len
        FROM islands GROUP BY n_name, grp
    )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_consecutive_active_months(spark, sf_dir):
    """Gaps-and-islands over the date dimension: per nation, the
    longest run of consecutive calendar months with at least one order.
    Month index minus its per-nation row_number is constant within a
    consecutive run (the classic islands key); every window runs over
    the DISTINCT (nation, month) frame — calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    months = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "n_name",
            (F.year("o_orderdate").cast("int") * 12
             + F.month("o_orderdate").cast("int")).alias("midx"),
        )
        .distinct()
    )
    w = Window.partitionBy("n_name").orderBy("midx")
    islands = months.withColumn(
        "grp", F.col("midx") - F.row_number().over(w)
    )
    runs = islands.groupBy("n_name", "grp").agg(F.count("*").alias("run_len"))
    return (
        runs.groupBy("n_name")
        .agg(F.max("run_len").cast("long").alias("longest_streak_months"))
        .orderBy("n_name")
    )


@q(
    "tpcds_weekday_weekend_mix",
    """
    SELECT n_name,
           CAST(SUM(CASE WHEN isodow(o_orderdate) >= 6
                    THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS weekend_cents,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST((CAST(SUM(CASE WHEN isodow(o_orderdate) >= 6
                         THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS HUGEINT) * 1000000)
                // SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS weekend_ppm
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_weekday_weekend_mix(spark, sf_dir):
    """Date-dimension mix report: weekend (ISO day-of-week ≥ 6) share
    of spend per nation in exact ppm. Spark's weekday() (Mon=0) + 1
    equals DuckDB's isodow (Mon=1..Sun=7) — pinned here rather than
    dayofweek(), whose week origin differs between the engines. One
    conditional aggregate pass, dims broadcast, exact-integer share."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    weekend = (F.weekday("o_orderdate") + 1) >= 6
    return (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.when(weekend, cents).otherwise(0))
            .cast("long")
            .alias("weekend_cents"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
        .withColumn(
            "weekend_ppm",
            F.expr(
                "CAST((CAST(weekend_cents AS DECIMAL(38,0)) * 1000000)"
                " DIV total_cents AS BIGINT)"
            ),
        )
        .orderBy("n_name")
    )


# ------------------------------------------------------------ wave 7
# Statistical / growth-comparison shapes: q34/q73 volume bands, q17
# exact 2-sigma outliers (integer cross-multiplication, no sqrt), q31
# channel growth pairs, q59 weekday matrix, q65 best brand per nation,
# q37/q82 sized-part supplier windows, q6 above-average nations, q54
# post-promo revenue window, q47 rolling-dip detection.


@q(
    "tpcds_volume_band_customers",
    """
    WITH per_order AS (
        SELECT o_orderkey, o_custkey, COUNT(*) AS n_lines
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey, o_custkey
    ),
    banded AS (
        SELECT o_custkey,
               CASE WHEN n_lines >= 6 THEN 'bulk'
                    WHEN n_lines >= 3 THEN 'mid' ELSE 'small' END AS band
        FROM per_order
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM banded GROUP BY band ORDER BY band
    """,
)
def tpcds_volume_band_customers(spark, sf_dir):
    """TPC-DS q34/q73 (customers buying in volume): per-order line
    counts banded small/mid/bulk, then order and distinct-customer
    counts per band. One fact join + keyed count; the band histogram is
    3 rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("n_lines"))
    )
    band = (
        F.when(F.col("n_lines") >= 6, "bulk")
        .when(F.col("n_lines") >= 3, "mid")
        .otherwise("small")
    )
    return (
        per_order.select("o_custkey", band.alias("band"))
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        )
        .orderBy("band")
    )


@q(
    "tpcds_part_quantity_outliers",
    """
    WITH q AS (
        SELECT p_brand, CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    stats AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qty) AS BIGINT) AS s,
               CAST(SUM(qty * qty) AS BIGINT) AS sq
        FROM q GROUP BY p_brand
    )
    SELECT q.p_brand,
           CAST(COUNT(*) FILTER (WHERE
                (CAST(q.qty AS HUGEINT) * st.n - st.s)
                * (CAST(q.qty AS HUGEINT) * st.n - st.s)
                > 4 * (CAST(st.sq AS HUGEINT) * st.n - CAST(st.s AS HUGEINT) * st.s))
                AS BIGINT) AS n_outliers,
           CAST(MIN(st.n) AS BIGINT) AS n_lines
    FROM q JOIN stats st ON st.p_brand = q.p_brand
    GROUP BY q.p_brand
    ORDER BY q.p_brand
    """,
)
def tpcds_part_quantity_outliers(spark, sf_dir):
    """TPC-DS q17 shape (quantity outliers vs the part's own
    distribution), EXACT: |x − μ| > 2σ rewritten with integer
    cross-multiplication — (n·x − S)² > 4·(n·Q − S²) where S=Σx, Q=Σx²
    are exact BIGINT sums — so no mean, variance, or sqrt is ever
    materialized in floating point. One stats aggregate per brand
    broadcast back over the fact; per-brand outlier counts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q_ = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_brand", F.col("l_quantity").cast("long").alias("qty"))
    )
    stats = q_.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qty").cast("long").alias("s"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sq"),
    )
    d = F.col("qty").cast("decimal(38,0)") * F.col("n") - F.col("s")
    var4 = 4 * (
        F.col("sq").cast("decimal(38,0)") * F.col("n")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return (
        q_.join(F.broadcast(stats), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.count(F.when(d * d > var4, True)).cast("long").alias("n_outliers"),
            F.min("n").cast("long").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@q(
    "tpcds_nation_channel_growth_pairs",
    """
    WITH yearly AS (
        SELECT n_name,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'express' ELSE 'standard' END AS channel,
               CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (1995, 1996)
        GROUP BY 1, 2, 3
    ),
    wide AS (
        SELECT n_name, channel,
               SUM(CASE WHEN yr = 1995 THEN cents ELSE 0 END) AS c95,
               SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS c96
        FROM yearly GROUP BY 1, 2
    ),
    pair AS (
        SELECT e.n_name,
               e.c95 AS e95, e.c96 AS e96, s.c95 AS s95, s.c96 AS s96
        FROM wide e JOIN wide s
          ON e.n_name = s.n_name AND e.channel = 'express'
         AND s.channel = 'standard'
        WHERE e.c95 > 0 AND s.c95 > 0
    )
    SELECT n_name,
           CAST(e95 AS BIGINT) AS e95, CAST(e96 AS BIGINT) AS e96,
           CAST(s95 AS BIGINT) AS s95, CAST(s96 AS BIGINT) AS s96
    FROM pair
    WHERE CAST(e96 AS HUGEINT) * s95 > CAST(s96 AS HUGEINT) * e95
    ORDER BY n_name
    """,
)
def tpcds_nation_channel_growth_pairs(spark, sf_dir):
    """TPC-DS q31 shape (web growth outpacing store growth per county):
    nations where the express channel's 1995→1996 revenue growth RATIO
    exceeds the standard channel's — compared exactly as
    e96·s95 > s96·e95 (integer cross-multiplication, no division).
    One fact aggregate, a 2-row-per-nation self-join on the aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("o_orderdate").cast("int")
    channel = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "express"
    ).otherwise("standard")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    wide = (
        o.filter(yr.isin(1995, 1996))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", channel.alias("channel"))
        .agg(
            F.sum(F.when(yr == 1995, cents).otherwise(0)).alias("c95"),
            F.sum(F.when(yr == 1996, cents).otherwise(0)).alias("c96"),
        )
    )
    e = wide.filter(F.col("channel") == "express").select(
        "n_name", F.col("c95").alias("e95"), F.col("c96").alias("e96")
    )
    s = wide.filter(F.col("channel") == "standard").select(
        "n_name", F.col("c95").alias("s95"), F.col("c96").alias("s96")
    )
    pair = e.join(s, "n_name").filter((F.col("e95") > 0) & (F.col("s95") > 0))
    growth_cmp = (
        F.col("e96").cast("decimal(38,0)") * F.col("s95")
        > F.col("s96").cast("decimal(38,0)") * F.col("e95")
    )
    return (
        pair.filter(growth_cmp)
        .select(
            "n_name",
            F.col("e95").cast("long").alias("e95"),
            F.col("e96").cast("long").alias("e96"),
            F.col("s95").cast("long").alias("s95"),
            F.col("s96").cast("long").alias("s96"),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_weekday_halfyear_matrix",
    """
    SELECT n_name, CAST(isodow(o_orderdate) AS INT) AS dow,
           CAST(SUM(CASE WHEN CAST(strftime(o_orderdate, '%m') AS INT) <= 6
                THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS h1_cents,
           CAST(SUM(CASE WHEN CAST(strftime(o_orderdate, '%m') AS INT) > 6
                THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS h2_cents
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_weekday_halfyear_matrix(spark, sf_dir):
    """TPC-DS q59 shape (week-over-week sales matrix by weekday): per
    (nation, ISO weekday) first-half vs second-half 1995 spend, one
    conditional-aggregate pass. ISO weekday pinned as Spark
    weekday()+1 = DuckDB isodow (see tpcds_weekday_weekend_mix)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    h1 = F.month("o_orderdate") <= 6
    return (
        o.filter(F.year("o_orderdate") == 1995)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", (F.weekday("o_orderdate") + 1).cast("int").alias("dow"))
        .agg(
            F.sum(F.when(h1, cents).otherwise(0)).cast("long").alias("h1_cents"),
            F.sum(F.when(~h1, cents).otherwise(0)).cast("long").alias("h2_cents"),
        )
        .orderBy("n_name", "dow")
    )


@q(
    "tpcds_best_brand_per_nation",
    f"""
    WITH nb AS (
        SELECT n_name, p_brand, CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, p_brand, cents FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                    ORDER BY cents DESC, p_brand) AS rn
        FROM nb
    ) WHERE rn = 1
    ORDER BY n_name
    """,
)
def tpcds_best_brand_per_nation(spark, sf_dir):
    """TPC-DS q65 shape (best-selling item per store): revenue per
    (supplier nation, brand), then the top brand per nation via a keyed
    window over the |nations|×|brands| aggregate (WindowGroupLimit
    bounded heap)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    nb = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("cents"), "p_brand")
    return (
        nb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", "p_brand", "cents")
        .orderBy("n_name")
    )


@q(
    "tpcds_sized_parts_supplier_window",
    """
    SELECT p_brand, CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts
    FROM part p
    WHERE p_size BETWEEN 10 AND 25
      AND EXISTS (
          SELECT 1 FROM lineitem l
          JOIN supplier s ON s_suppkey = l_suppkey
          WHERE l.l_partkey = p.p_partkey
            AND s.s_acctbal > 0
            AND l.l_shipdate >= CAST('1995-03-01' AS TIMESTAMP)
            AND l.l_shipdate <  CAST('1995-06-01' AS TIMESTAMP)
      )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def tpcds_sized_parts_supplier_window(spark, sf_dir):
    """TPC-DS q37/q82 shape (sized in-stock parts with activity in a
    date window): size-banded parts having any positive-balance
    supplier shipment inside a 3-month window — a left-semi join from
    the (pre-filtered, broadcastable) part dim into the date-pruned
    fact slice."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    window_li = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-06-01").cast("timestamp"))
        )
        .join(s.filter(F.col("s_acctbal") > 0), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("l_partkey")
    )
    return (
        p.filter(F.col("p_size").between(10, 25))
        .join(window_li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(F.count_distinct("p_partkey").cast("long").alias("n_parts"))
        .orderBy("p_brand")
    )


@q(
    "tpcds_above_avg_nations",
    """
    WITH per_nation AS (
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY n_name
    ),
    tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS g_cents,
               CAST(SUM(n_orders) AS BIGINT) AS g_orders
        FROM per_nation
    )
    SELECT n_name, cents, n_orders, n_customers
    FROM per_nation, tot
    WHERE CAST(cents AS HUGEINT) * g_orders
          > CAST(g_cents AS HUGEINT) * n_orders
    ORDER BY n_name
    """,
)
def tpcds_above_avg_nations(spark, sf_dir):
    """TPC-DS q6 shape (states whose customers spend above average):
    nations whose mean order value exceeds the global mean — compared
    exactly as cents·g_orders > g_cents·n_orders (integer
    cross-multiplication, no division; a fixed premium like q6's 1.2×
    degenerates to an empty set as nation means converge with scale, so
    the plain above-average cut keeps the entry discriminative at every
    SF). One keyed aggregate + a one-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
            F.count("*").cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        )
    )
    tot = per_nation.agg(
        F.sum("cents").cast("long").alias("g_cents"),
        F.sum("n_orders").cast("long").alias("g_orders"),
    )
    cond = (
        F.col("cents").cast("decimal(38,0)") * F.col("g_orders")
        > F.col("g_cents").cast("decimal(38,0)") * F.col("n_orders")
    )
    return (
        per_nation.crossJoin(F.broadcast(tot))
        .filter(cond)
        .select("n_name", "cents", "n_orders", "n_customers")
        .orderBy("n_name")
    )


@q(
    "tpcds_post_promo_window_revenue",
    """
    WITH firsts AS (
        SELECT o_custkey,
               MIN(CAST(strftime(o_orderdate, '%Y') AS INT) * 12 +
                   CAST(strftime(o_orderdate, '%m') AS INT)) AS promo_m
        FROM orders o
        JOIN lineitem l ON l_orderkey = o_orderkey
        JOIN part p     ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
        GROUP BY o_custkey
    )
    SELECT f.promo_m,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS follow_cents
    FROM orders o
    JOIN firsts f ON f.o_custkey = o.o_custkey
    WHERE CAST(strftime(o.o_orderdate, '%Y') AS INT) * 12 +
          CAST(strftime(o.o_orderdate, '%m') AS INT)
          BETWEEN f.promo_m + 1 AND f.promo_m + 3
    GROUP BY f.promo_m
    ORDER BY f.promo_m
    """,
)
def tpcds_post_promo_window_revenue(spark, sf_dir):
    """TPC-DS q54 shape (revenue in the 3 months after a promo
    purchase): each customer's FIRST promo-part month, then their spend
    in months m+1..m+3, cohorted by promo month. Two fact passes joined
    on the customer key — the month-window predicate rides the join,
    no window function over raw rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int")
    firsts = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p.filter(F.col("p_type") == "PROMO"),
              F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("o_custkey")
        .agg(F.min(midx).alias("promo_m"))
    )
    return (
        o.join(firsts, "o_custkey")
        .filter(midx.between(F.col("promo_m") + 1, F.col("promo_m") + 3))
        .groupBy("promo_m")
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("follow_cents"),
        )
        .orderBy("promo_m")
    )


@q(
    "tpcds_monthly_dip_detection",
    """
    WITH monthly AS (
        SELECT n_name, strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY 1, 2
    ),
    ctx AS (
        SELECT n_name, ym, cents,
               CAST(SUM(cents) OVER (PARTITION BY n_name ORDER BY ym
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
                   AS sum3,
               CAST(COUNT(*) OVER (PARTITION BY n_name ORDER BY ym
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
                   AS n3
        FROM monthly
    )
    SELECT n_name, ym, cents, sum3
    FROM ctx
    WHERE n3 = 3 AND CAST(cents AS HUGEINT) * 3 * 10 < CAST(sum3 AS HUGEINT) * 9
    ORDER BY n_name, ym
    """,
)
def tpcds_monthly_dip_detection(spark, sf_dir):
    """TPC-DS q47 shape (months deviating from their neighborhood):
    nation-months whose revenue falls below 90% of the centered
    3-month mean — exactly, as cents·3·10 < sum3·9 (the 0.9 threshold
    is the rational 9/10; the mean is never divided out). Centered
    window over the (nation, month) aggregate, interior months only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w3 = Window.partitionBy("n_name").orderBy("ym").rowsBetween(-1, 1)
    ctx = monthly.select(
        "n_name",
        "ym",
        "cents",
        F.sum("cents").over(w3).cast("long").alias("sum3"),
        F.count("*").over(w3).cast("long").alias("n3"),
    )
    dip = (
        F.col("cents").cast("decimal(38,0)") * 30
        < F.col("sum3").cast("decimal(38,0)") * 9
    )
    return (
        ctx.filter((F.col("n3") == 3) & dip)
        .select("n_name", "ym", "cents", "sum3")
        .orderBy("n_name", "ym")
    )


# ------------------------------------------------------------ wave 8
# Channel-crossover cumulative (q51), declining brands with returns
# netted (q75), returned value before/after a pivot (q40), refund
# reason bands (q85), unspecified-dimension report (q76), weekly item
# sales vs year average (q2).


@q(
    "tpcds_cumulative_channel_crossover",
    """
    WITH monthly AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'express' ELSE 'standard' END AS channel,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1, 2
    ),
    cum AS (
        SELECT channel, ym,
               CAST(SUM(cents) OVER (PARTITION BY channel ORDER BY ym)
                    AS BIGINT) AS cum_cents
        FROM monthly
    ),
    wide AS (
        SELECT e.ym, e.cum_cents AS express_cum, s.cum_cents AS standard_cum
        FROM cum e JOIN cum s ON e.ym = s.ym
         AND e.channel = 'express' AND s.channel = 'standard'
    )
    SELECT ym, express_cum, standard_cum
    FROM wide WHERE express_cum > standard_cum
    ORDER BY ym
    """,
)
def tpcds_cumulative_channel_crossover(spark, sf_dir):
    """TPC-DS q51 shape (web/store cumulative crossover): per-channel
    cumulative revenue by month, months where the express channel's
    running total exceeds the standard channel's. The cumulative window
    is PARTITIONED BY channel over month-grain rows — keyed and
    calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    channel = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "express"
    ).otherwise("standard")
    monthly = o.groupBy(
        channel.alias("channel"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = Window.partitionBy("channel").orderBy("ym")
    cum = monthly.select(
        "channel", "ym", F.sum("cents").over(w).cast("long").alias("cum_cents")
    )
    e = cum.filter(F.col("channel") == "express").select(
        "ym", F.col("cum_cents").alias("express_cum")
    )
    s = cum.filter(F.col("channel") == "standard").select(
        "ym", F.col("cum_cents").alias("standard_cum")
    )
    return (
        e.join(s, "ym")
        .filter(F.col("express_cum") > F.col("standard_cum"))
        .orderBy("ym")
    )


@q(
    "tpcds_declining_brands_net",
    """
    WITH net AS (
        SELECT p_brand,
               CAST(strftime(l_shipdate, '%Y') AS INT) AS yr,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN -CAST(l_quantity AS BIGINT)
                             ELSE CAST(l_quantity AS BIGINT) END)
                    AS BIGINT) AS net_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) IN (1995, 1996)
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT a.p_brand, a.net_qty AS q95, b.net_qty AS q96
        FROM net a JOIN net b
          ON a.p_brand = b.p_brand AND a.yr = 1995 AND b.yr = 1996
        WHERE a.net_qty > 0
    )
    SELECT p_brand, q95, q96
    FROM wide WHERE q96 * 10 < q95 * 9
    ORDER BY p_brand
    """,
)
def tpcds_declining_brands_net(spark, sf_dir):
    """TPC-DS q75 shape (declining brands with returns netted): net
    quantity (sold − returned) per (brand, year); brands whose 1996 net
    fell more than 10% below 1995 — exactly, as q96·10 < q95·9. One
    fact aggregate + a 2-row self-join per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yr = F.year("l_shipdate").cast("int")
    qty = F.col("l_quantity").cast("long")
    net = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(yr.isin(1995, 1996))
        .groupBy("p_brand", yr.alias("yr"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", -qty).otherwise(qty)
            )
            .cast("long")
            .alias("net_qty")
        )
    )
    a = net.filter((F.col("yr") == 1995) & (F.col("net_qty") > 0)).select(
        "p_brand", F.col("net_qty").alias("q95")
    )
    b = net.filter(F.col("yr") == 1996).select(
        "p_brand", F.col("net_qty").alias("q96")
    )
    return (
        a.join(b, "p_brand")
        .filter(F.col("q96") * 10 < F.col("q95") * 9)
        .orderBy("p_brand")
    )


@q(
    "tpcds_returned_value_pivot",
    """
    SELECT n_name,
           CAST(SUM(CASE WHEN l_shipdate < CAST('1996-01-01' AS TIMESTAMP)
                THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS before_cents,
           CAST(SUM(CASE WHEN l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
                THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS after_cents
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_returned_value_pivot(spark, sf_dir):
    """TPC-DS q40 shape (returned value before/after a pivot date):
    returned-lineitem value per supplier nation split at 1996-01-01 —
    one conditional-aggregate pass over the returns slice, dims
    broadcast, filter pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    pivot = F.lit("1996-01-01").cast("timestamp")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, cents).otherwise(0))
            .cast("long")
            .alias("before_cents"),
            F.sum(F.when(F.col("l_shipdate") >= pivot, cents).otherwise(0))
            .cast("long")
            .alias("after_cents"),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_refund_reason_bands",
    """
    SELECT o_orderpriority,
           CASE WHEN l_discount >= 0.08 THEN 'deep'
                WHEN l_discount >= 0.04 THEN 'mid' ELSE 'shallow' END
               AS discount_band,
           CAST(COUNT(*) AS BIGINT) AS n_returns,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS refund_cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_refund_reason_bands(spark, sf_dir):
    """TPC-DS q85 shape (refunds crossed by reason bands): returned
    lineitems bucketed by (order priority × discount depth), counts and
    refunded value. One conditional pass over the returns slice."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("l_discount") >= 0.08, "deep")
        .when(F.col("l_discount") >= 0.04, "mid")
        .otherwise("shallow")
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", band.alias("discount_band"))
        .agg(
            F.count("*").cast("long").alias("n_returns"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("refund_cents"),
        )
        .orderBy("o_orderpriority", "discount_band")
    )


@q(
    "tpcds_unspecified_dim_report",
    """
    SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                THEN 'unspecified' ELSE 'specified' END AS dim_state,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_unspecified_dim_report(spark, sf_dir):
    """TPC-DS q76 shape (rows with an unspecified dimension value,
    reported alongside the specified ones): orders whose priority is
    the placeholder '4-NOT SPECIFIED' vs the rest, per year — the
    data-quality report q76 runs over NULL channel keys. Single
    aggregate pass."""
    o = load_table(spark, sf_dir, "orders")
    state = F.when(
        F.col("o_orderpriority") == "4-NOT SPECIFIED", "unspecified"
    ).otherwise("specified")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            state.alias("dim_state"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("yr", "dim_state")
    )


@q(
    "tpcds_weekly_item_vs_year",
    """
    WITH weekly AS (
        SELECT p_brand,
               CAST(strftime(l_shipdate, '%V') AS INT) AS wk,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
          AND CAST(strftime(l_shipdate, '%m') AS INT) BETWEEN 2 AND 11
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT p_brand,
               CAST(SUM(cents) AS BIGINT) AS y_cents,
               CAST(COUNT(*) AS BIGINT) AS n_weeks
        FROM weekly GROUP BY p_brand
    )
    SELECT w.p_brand,
           CAST(COUNT(*) FILTER (WHERE
                CAST(w.cents AS HUGEINT) * t.n_weeks * 2
                > CAST(t.y_cents AS HUGEINT) * 3) AS BIGINT) AS hot_weeks,
           CAST(MIN(t.n_weeks) AS BIGINT) AS n_weeks
    FROM weekly w JOIN tot t ON t.p_brand = w.p_brand
    GROUP BY w.p_brand
    ORDER BY w.p_brand
    """,
)
def tpcds_weekly_item_vs_year(spark, sf_dir):
    """TPC-DS q2 shape (weekly sales vs the year's average): ISO-week
    brand revenue (interior months only, so ISO week ≡ calendar year —
    Spark weekofyear and DuckDB %V agree) flagged when a week runs over
    1.5× the brand's weekly average — exactly, as
    cents·n_weeks·2 > y_cents·3. Aggregate → one-row-per-brand
    broadcast → count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    weekly = (
        li.filter(
            (F.year("l_shipdate") == 1995)
            & F.month("l_shipdate").between(2, 11)
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", F.weekofyear("l_shipdate").cast("int").alias("wk"))
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    tot = weekly.groupBy("p_brand").agg(
        F.sum("cents").cast("long").alias("y_cents"),
        F.count("*").cast("long").alias("n_weeks"),
    )
    hot = (
        F.col("cents").cast("decimal(38,0)") * F.col("n_weeks") * 2
        > F.col("y_cents").cast("decimal(38,0)") * 3
    )
    return (
        weekly.join(F.broadcast(tot), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.count(F.when(hot, True)).cast("long").alias("hot_weeks"),
            F.min("n_weeks").cast("long").alias("n_weeks"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- wave 9
# VERDICT r7 advice #4: the multi-year store-comparison shapes the star
# fixtures can still express — q11/q4 cross-channel lifetime preference,
# q35/q69 demographic EXISTS batteries, q89 rolling category deviation,
# plus q54/q65/q66/q49/q59. All integer-exact (cents, cross-multiplied
# thresholds, decimal-DIV ppm ratios) per the suite's exactness patterns.


@q(
    "tpcds_lifetime_channel_preference",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                              AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
                             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS e95,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                              AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
                             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS e96,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) NOT IN ('1','2')
                              AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
                             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS s95,
               CAST(SUM(CASE WHEN substr(o_orderpriority, 1, 1) NOT IN ('1','2')
                              AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
                             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS s96
        FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (1995, 1996)
        GROUP BY o_custkey
    )
    SELECT o_custkey, e95, e96, s95, s96
    FROM per
    WHERE e95 > 0 AND e96 > 0 AND s95 > 0 AND s96 > 0
      AND CAST(e96 AS HUGEINT) * s95 > CAST(s96 AS HUGEINT) * e95
    ORDER BY o_custkey
    """,
)
def tpcds_lifetime_channel_preference(spark, sf_dir):
    """TPC-DS q11/q4 shape (customers whose year-over-year growth in one
    channel outpaces the other): express channel = priority 1-2 orders,
    standard = the rest; per-customer 1995/1996 spend in each, keep
    customers active in all four cells whose express growth ratio beats
    standard — EXACTLY, via integer cross-multiplication
    e96·s95 > s96·e95 (no float division anywhere). ONE conditional
    aggregate pass over the two-year orders slice; the year filter
    pushes to the scan."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("int")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    express = F.substring("o_orderpriority", 1, 1).isin("1", "2")

    def cell(ch, y):
        return (
            F.sum(F.when(ch & (yr == y), cents).otherwise(0))
            .cast("long")
        )

    per = (
        o.filter(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            cell(express, 1995).alias("e95"),
            cell(express, 1996).alias("e96"),
            cell(~express, 1995).alias("s95"),
            cell(~express, 1996).alias("s96"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    return (
        per.filter(
            (F.col("e95") > 0) & (F.col("e96") > 0)
            & (F.col("s95") > 0) & (F.col("s96") > 0)
            & (dec("e96") * dec("s95") > dec("s96") * dec("e95"))
        )
        .select("o_custkey", "e95", "e96", "s95", "s96")
        .orderBy("o_custkey")
    )


@q(
    "tpcds_demographic_exists_battery",
    """
    SELECT n_name,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS min_bal_cents,
           CAST(MAX(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_bal_cents,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c_custkey
              AND CAST(strftime(o.o_orderdate, '%Y') AS INT) = 1995)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c_custkey
              AND CAST(strftime(o.o_orderdate, '%Y') AS INT) = 1995
              AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (
            SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_custkey = c_custkey
              AND CAST(strftime(o.o_orderdate, '%Y') AS INT) = 1995
              AND l.l_returnflag = 'R')
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_demographic_exists_battery(spark, sf_dir):
    """TPC-DS q35/q69 shape (demographic report over an EXISTS / NOT
    EXISTS battery): customers who ordered in 1995 (EXISTS), never
    urgently (NOT EXISTS), and had nothing returned that year (NOT
    EXISTS through the order→lineitem chain), profiled per
    (nation × account-balance band) with count/min/max/sum over exact
    balance cents. Plan: one semi-join + two anti-joins on c_custkey
    (each ONE keyed shuffle; Spark plans them as broadcast at dim size)
    feeding a single aggregate — the Doris q35 posture."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o95 = o.filter(F.year("o_orderdate") == 1995)
    urgent = o95.filter(F.col("o_orderpriority") == "1-URGENT")
    returned = o95.join(
        li.filter(F.col("l_returnflag") == "R"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    base = (
        c.join(o95.select("o_custkey"), c.c_custkey == o95.o_custkey, "left_semi")
        .join(
            urgent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(
            returned.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
    )
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    bal_cents = F.floor(F.col("c_acctbal") * 100).cast("long")
    return (
        base.groupBy("n_name", band.alias("bal_band"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.min(bal_cents).cast("long").alias("min_bal_cents"),
            F.max(bal_cents).cast("long").alias("max_bal_cents"),
            F.sum(bal_cents).cast("long").alias("sum_bal_cents"),
        )
        .orderBy("n_name", "bal_band")
    )


@q(
    "tpcds_rolling_category_deviation",
    """
    WITH monthly AS (
        SELECT p_type, p_brand, strftime(l_shipdate, '%Y-%m') AS ym,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1, 2, 3
    ),
    win AS (
        SELECT p_type, p_brand, ym, cents,
               CAST(COUNT(*) OVER (PARTITION BY p_type, p_brand) AS BIGINT)
                   AS n_months,
               CAST(SUM(cents) OVER (PARTITION BY p_type, p_brand) AS BIGINT)
                   AS tot_cents
        FROM monthly
    )
    SELECT p_type, p_brand, ym, cents, n_months, tot_cents
    FROM win
    WHERE ABS(CAST(cents AS HUGEINT) * n_months - tot_cents) * 10
          > CAST(tot_cents AS HUGEINT)
    ORDER BY p_type, p_brand, ym
    """,
)
def tpcds_rolling_category_deviation(spark, sf_dir):
    """TPC-DS q89 shape (months deviating from the category-brand
    average): monthly (type, brand) revenue in 1995, flag months whose
    sales sit more than 10% off the brand's monthly average — EXACTLY,
    as |cents·n − tot|·10 > tot (integer cross-multiplication, no
    float division). The window runs over the post-aggregate
    |types × brands × 12| frame — metadata-sized, keyed on
    (type, brand), never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    monthly = (
        li.filter(F.year("l_shipdate") == 1995)
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "p_type", "p_brand",
            F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("p_type", "p_brand")
    win = monthly.select(
        "p_type", "p_brand", "ym", "cents",
        F.count("*").over(w).cast("long").alias("n_months"),
        F.sum("cents").over(w).cast("long").alias("tot_cents"),
    )
    dev = (
        F.abs(
            F.col("cents").cast("decimal(38,0)") * F.col("n_months")
            - F.col("tot_cents")
        )
        * 10
        > F.col("tot_cents").cast("decimal(38,0)")
    )
    return win.filter(dev).orderBy("p_type", "p_brand", "ym")


@q(
    "tpcds_cohort_next_quarter_spend",
    """
    WITH cohort AS (
        SELECT DISTINCT o_custkey
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN part     ON p_partkey = l_partkey
        WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
          AND p_type = 'PROMO'
    ),
    spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders
        WHERE o_custkey IN (SELECT o_custkey FROM cohort)
          AND o_orderdate >= CAST('1995-04-01' AS TIMESTAMP)
          AND o_orderdate <  CAST('1995-07-01' AS TIMESTAMP)
        GROUP BY o_custkey
    )
    SELECT CAST(cents // 500000 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM spend GROUP BY 1 ORDER BY 1
    """,
)
def tpcds_cohort_next_quarter_spend(spark, sf_dir):
    """TPC-DS q54 shape (cohort of category buyers, segmented by their
    next-quarter spend): customers who bought a PROMO part in 1995-03;
    their Q2-1995 order spend bucketed into $5,000 bands (integer
    cents // 500000 — exact in both engines). Cohort = one distinct
    semi-join key set; spend = one filtered aggregate; bands =
    metadata-sized regroup. Customers with no Q2 orders drop out (INNER
    cohort join), matching q54's 'revenue counted only for purchasers'
    reading."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cohort = (
        o.filter(F.date_format("o_orderdate", "yyyy-MM") == "1995-03")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p.filter(F.col("p_type") == "PROMO"),
              F.col("p_partkey") == F.col("l_partkey"))
        .select("o_custkey")
        .distinct()
    )
    spend = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
        )
        .join(cohort, "o_custkey", "left_semi")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    return (
        spend.select(F.expr("CAST(cents DIV 500000 AS BIGINT)").alias("band"))
        .groupBy("band")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("band")
    )


@q(
    "tpcds_underperforming_brands",
    """
    WITH rev AS (
        SELECT p_type, p_brand,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1, 2
    ),
    typ AS (
        SELECT p_type,
               CAST(COUNT(*) AS BIGINT) AS n_brands,
               CAST(SUM(cents) AS BIGINT) AS tot_cents
        FROM rev GROUP BY p_type
    )
    SELECT r.p_type, r.p_brand, r.cents, t.n_brands, t.tot_cents
    FROM rev r JOIN typ t ON t.p_type = r.p_type
    WHERE CAST(r.cents AS HUGEINT) * t.n_brands * 20
          < CAST(t.tot_cents AS HUGEINT) * 19
    ORDER BY r.p_type, r.p_brand
    """,
)
def tpcds_underperforming_brands(spark, sf_dir):
    """TPC-DS q65 shape (items selling below a fraction of their
    category's average): 1995 revenue per (type, brand); keep brands
    under 95% of the type's average brand revenue — EXACTLY, as
    cents·n·20 < tot·19. One fact aggregate, then a 6-row broadcast of
    per-type totals; no window needed."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.filter(F.year("l_shipdate") == 1995)
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    typ = rev.groupBy("p_type").agg(
        F.count("*").cast("long").alias("n_brands"),
        F.sum("cents").cast("long").alias("tot_cents"),
    )
    under = (
        F.col("cents").cast("decimal(38,0)") * F.col("n_brands") * 20
        < F.col("tot_cents").cast("decimal(38,0)") * 19
    )
    return (
        rev.join(F.broadcast(typ), "p_type")
        .filter(under)
        .select("p_type", "p_brand", "cents", "n_brands", "tot_cents")
        .orderBy("p_type", "p_brand")
    )


@q(
    "tpcds_monthly_ship_pivot",
    """
    SELECT n_name,
    """
    + ",\n".join(
        f"""       CAST(SUM(CASE WHEN CAST(strftime(l_shipdate, '%m') AS INT) = {m}
                THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS m{m:02d}_cents"""
        for m in range(1, 13)
    )
    + """
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_monthly_ship_pivot(spark, sf_dir):
    """TPC-DS q66 shape (12-month shipped-value pivot per warehouse →
    here supplier nation): one conditional-aggregate pass produces the
    wide monthly matrix — no PIVOT operator, no 12 self-joins; the year
    filter pushes to the scan and the dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    aggs = [
        F.sum(F.when(F.month("l_shipdate") == m, cents).otherwise(0))
        .cast("long")
        .alias(f"m{m:02d}_cents")
        for m in range(1, 13)
    ]
    return (
        li.filter(F.year("l_shipdate") == 1995)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
    )


@q(
    "tpcds_worst_return_ratio_topn",
    """
    WITH per AS (
        SELECT CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
                    THEN 'express' ELSE 'standard' END AS channel,
               l_partkey,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS ret_qty,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_qty
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT channel, l_partkey, ret_qty, sold_qty,
               CAST((CAST(ret_qty AS HUGEINT) * 1000000) // sold_qty AS BIGINT)
                   AS ratio_ppm
        FROM per WHERE ret_qty > 0
    )
    SELECT channel, l_partkey, ret_qty, sold_qty, ratio_ppm, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY channel
                   ORDER BY ratio_ppm DESC, l_partkey) AS INT) AS rn
        FROM scored
    ) WHERE rn <= 10
    ORDER BY channel, rn
    """,
)
def tpcds_worst_return_ratio_topn(spark, sf_dir):
    """TPC-DS q49 shape (worst return ratios per channel, top-n): per
    (channel, part) returned vs sold quantity in 1995; the ratio is the
    EXACT integer ppm (decimal DIV — never a float division), ranked
    per channel with the unique part key as tiebreak, top 10 kept.
    One fact aggregate + a bounded per-channel window (WindowGroupLimit
    pushes the rank filter into the sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    channel = F.when(
        F.substring("o_orderpriority", 1, 1).isin("1", "2"), "express"
    ).otherwise("standard")
    qty = F.col("l_quantity").cast("long")
    per = (
        li.filter(F.year("l_shipdate") == 1995)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(channel.alias("channel"), "l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", qty).otherwise(0))
            .cast("long")
            .alias("ret_qty"),
            F.sum(qty).cast("long").alias("sold_qty"),
        )
        .filter(F.col("ret_qty") > 0)
        .withColumn(
            "ratio_ppm",
            F.expr(
                "CAST((CAST(ret_qty AS DECIMAL(38,0)) * 1000000)"
                " DIV sold_qty AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("channel").orderBy(
        F.desc("ratio_ppm"), F.col("l_partkey")
    )
    return (
        per.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 10)
        .select("channel", "l_partkey", "ret_qty", "sold_qty", "ratio_ppm", "rn")
        .orderBy("channel", "rn")
    )


@q(
    "tpcds_weekly_sales_yoy_ratio",
    """
    WITH wk AS (
        SELECT n_name, CAST(strftime(l_shipdate, '%V') AS INT) AS wk,
               CAST(SUM(CASE WHEN CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
                             THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents95,
               CAST(SUM(CASE WHEN CAST(strftime(l_shipdate, '%Y') AS INT) = 1996
                             THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents96
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) IN (1995, 1996)
          AND CAST(strftime(l_shipdate, '%m') AS INT) BETWEEN 2 AND 11
        GROUP BY 1, 2
    )
    SELECT n_name, wk, cents95, cents96,
           CAST((CAST(cents96 AS HUGEINT) * 1000000) // cents95 AS BIGINT)
               AS yoy_ppm
    FROM wk WHERE cents95 > 0
    ORDER BY n_name, wk
    """,
)
def tpcds_weekly_sales_yoy_ratio(spark, sf_dir):
    """TPC-DS q59 shape (weekly sales this year vs last, per store →
    supplier nation): ISO-week revenue 1995 vs 1996 (interior months
    Feb–Nov only, where Spark weekofyear ≡ DuckDB %V — the ISO-year
    edge weeks differ between engines), YoY ratio as EXACT integer ppm
    via decimal DIV. One conditional aggregate over the two-year slice;
    dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("l_shipdate").cast("int")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    wk = (
        li.filter(yr.isin(1995, 1996) & F.month("l_shipdate").between(2, 11))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", F.weekofyear("l_shipdate").cast("int").alias("wk"))
        .agg(
            F.sum(F.when(yr == 1995, cents).otherwise(0))
            .cast("long")
            .alias("cents95"),
            F.sum(F.when(yr == 1996, cents).otherwise(0))
            .cast("long")
            .alias("cents96"),
        )
    )
    return (
        wk.filter(F.col("cents95") > 0)
        .withColumn(
            "yoy_ppm",
            F.expr(
                "CAST((CAST(cents96 AS DECIMAL(38,0)) * 1000000)"
                " DIV cents95 AS BIGINT)"
            ),
        )
        .select("n_name", "wk", "cents95", "cents96", "yoy_ppm")
        .orderBy("n_name", "wk")
    )


@q(
    "tpcds_period_overlap_counts",
    """
    WITH a AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1995
    ),
    b AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
    )
    SELECT CAST(COUNT(*) FILTER (WHERE a.o_custkey IS NOT NULL
                                   AND b.o_custkey IS NOT NULL) AS BIGINT)
               AS both_years,
           CAST(COUNT(*) FILTER (WHERE b.o_custkey IS NULL) AS BIGINT)
               AS only_1995,
           CAST(COUNT(*) FILTER (WHERE a.o_custkey IS NULL) AS BIGINT)
               AS only_1996
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def tpcds_period_overlap_counts(spark, sf_dir):
    """TPC-DS q97 shape (customer overlap between two periods): the
    distinct 1995 and 1996 buyer sets FULL OUTER joined on the customer
    key, counted into both/only-left/only-right buckets in one pass —
    the q97 store/catalog overlap report on the star fixture's year
    axis. Two distinct-aggregates + one keyed full join + a scalar
    aggregate; no window, no cross join."""
    o = load_table(spark, sf_dir, "orders")

    def buyers(year, alias):
        return (
            o.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias(alias))
            .distinct()
        )

    a, b = buyers(1995, "ck_a"), buyers(1996, "ck_b")
    j = a.join(b, a.ck_a == b.ck_b, "full_outer")
    return j.agg(
        F.count(F.when(F.col("ck_a").isNotNull() & F.col("ck_b").isNotNull(), 1))
        .cast("long")
        .alias("both_years"),
        F.count(F.when(F.col("ck_b").isNull(), 1)).cast("long").alias("only_1995"),
        F.count(F.when(F.col("ck_a").isNull(), 1)).cast("long").alias("only_1996"),
    )


# ---------------------------------------------------------------- wave 9b


@q(
    "tpcds_case_ratio_report",
    """
    WITH g AS (
        SELECT
    """
    + ",\n".join(
        f"""           CAST(COUNT(*) FILTER (WHERE l_quantity >= {lo} AND l_quantity < {hi})
                   AS BIGINT) AS cnt{i},
           CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_quantity >= {lo} AND l_quantity < {hi}
                          AND l_returnflag = 'R'), 0) AS BIGINT) AS r{i},
           CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_quantity >= {lo} AND l_quantity < {hi}
                          AND l_returnflag <> 'R'), 0) AS BIGINT) AS nr{i}"""
        for i, (lo, hi) in enumerate([(1, 11), (11, 21), (21, 31), (31, 41), (41, 51)])
    )
    + """
        FROM lineitem
    )
    SELECT """
    + ",\n           ".join(
        f"CASE WHEN cnt{i} > 3000 THEN r{i} ELSE nr{i} END AS bucket{i}"
        for i in range(5)
    )
    + """
    FROM g
    """,
)
def tpcds_case_ratio_report(spark, sf_dir):
    """TPC-DS q9 shape (bucket report choosing between two aggregates
    per quantity band) — re-expressed Spark-first: upstream q9 runs 15
    scalar subqueries (15 fact scans); here ALL candidate aggregates
    compute in ONE conditional-aggregate pass and the CASE picks among
    the resulting columns. Same answer, 15× fewer scans — the rewrite a
    100 TB plan needs. Exact integer cents; count thresholds exact."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    bands = [(1, 11), (11, 21), (21, 31), (31, 41), (41, 51)]
    aggs = []
    for i, (lo, hi) in enumerate(bands):
        inb = (F.col("l_quantity") >= lo) & (F.col("l_quantity") < hi)
        ret = F.col("l_returnflag") == "R"
        aggs += [
            F.count(F.when(inb, 1)).cast("long").alias(f"cnt{i}"),
            F.coalesce(F.sum(F.when(inb & ret, cents)), F.lit(0))
            .cast("long")
            .alias(f"r{i}"),
            F.coalesce(F.sum(F.when(inb & ~ret, cents)), F.lit(0))
            .cast("long")
            .alias(f"nr{i}"),
        ]
    g = li.agg(*aggs)
    return g.select(
        *[
            F.when(F.col(f"cnt{i}") > 3000, F.col(f"r{i}"))
            .otherwise(F.col(f"nr{i}"))
            .alias(f"bucket{i}")
            for i in range(5)
        ]
    )


@q(
    "tpcds_part_attribute_battery",
    """
    SELECT DISTINCT p.p_name
    FROM part p
    WHERE p.p_size BETWEEN 10 AND 40
      AND EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_brand = p.p_brand AND q.p_partkey <> p.p_partkey
            AND ((q.p_type = 'PROMO'   AND q.p_size BETWEEN 10 AND 20)
              OR (q.p_type = 'ECONOMY' AND q.p_size BETWEEN 20 AND 30)
              OR (q.p_type = 'LARGE'   AND q.p_size BETWEEN 30 AND 40)))
    ORDER BY p.p_name
    """,
)
def tpcds_part_attribute_battery(spark, sf_dir):
    """TPC-DS q41 shape (dimension-only attribute battery): part names
    whose BRAND also carries another part matching one of three
    (type × size-band) OR-combinations — a correlated EXISTS entirely
    inside the dimension table. Plans as a broadcast semi-join on the
    brand key over the (tiny) dimension; the fact tables are never
    touched, exactly q41's appeal at scale."""
    p = load_table(spark, sf_dir, "part")
    combo = (
        ((F.col("q.p_type") == "PROMO") & F.col("q.p_size").between(10, 20))
        | ((F.col("q.p_type") == "ECONOMY") & F.col("q.p_size").between(20, 30))
        | ((F.col("q.p_type") == "LARGE") & F.col("q.p_size").between(30, 40))
    )
    q_side = p.alias("q").filter(combo).select(
        F.col("q.p_brand").alias("qb"), F.col("q.p_partkey").alias("qk")
    )
    return (
        p.alias("p")
        .filter(F.col("p.p_size").between(10, 40))
        .join(
            q_side,
            (F.col("qb") == F.col("p.p_brand"))
            & (F.col("qk") != F.col("p.p_partkey")),
            "left_semi",
        )
        .select("p.p_name")
        .distinct()
        .orderBy("p_name")
    )


@q(
    "tpcds_or_band_matrix",
    """
    SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE (c_mktsegment = 'BUILDING'  AND c_acctbal BETWEEN 0 AND 3000
             AND l_quantity BETWEEN 1 AND 15)
       OR (c_mktsegment = 'MACHINERY' AND c_acctbal BETWEEN 3000 AND 6000
             AND l_quantity BETWEEN 16 AND 35)
       OR (c_mktsegment = 'HOUSEHOLD' AND c_acctbal BETWEEN 6000 AND 10000
             AND l_quantity BETWEEN 36 AND 50)
    """,
)
def tpcds_or_band_matrix(spark, sf_dir):
    """TPC-DS q48 shape (a disjunction of three (segment × balance-band
    × quantity-band) conjunctions feeding one total): the OR matrix sits
    in the WHERE, so Catalyst pushes each band's constraints into the
    scan as a disjunctive filter and the whole query is one scan + two
    broadcast joins + a scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (
        ((F.col("c_mktsegment") == "BUILDING")
         & F.col("c_acctbal").between(0, 3000)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("c_mktsegment") == "MACHINERY")
           & F.col("c_acctbal").between(3000, 6000)
           & F.col("l_quantity").between(16, 35))
        | ((F.col("c_mktsegment") == "HOUSEHOLD")
           & F.col("c_acctbal").between(6000, 10000)
           & F.col("l_quantity").between(36, 50))
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .filter(cond)
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_total"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


@q(
    "tpcds_demographic_or_averages",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE (c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal >= 5000)
       OR (c_mktsegment IN ('MACHINERY', 'FURNITURE') AND c_acctbal < 1000)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpcds_demographic_or_averages(spark, sf_dir):
    """TPC-DS q13 shape (averages under OR'd demographic branches):
    lineitems of customers matching either of two (segment-set ×
    balance) branches, profiled per order priority. The exact-sum
    form (counts + integer sums) carries the same information as q13's
    AVGs without a float division; one scan, dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (
        (F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
         & (F.col("c_acctbal") >= 5000))
        | (F.col("c_mktsegment").isin("MACHINERY", "FURNITURE")
           & (F.col("c_acctbal") < 1000))
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .filter(cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "tpcds_net_paid_after_returns",
    """
    SELECT o_custkey,
           CAST(SUM(CASE WHEN l_returnflag <> 'R'
                         THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS net_cents,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS returned_cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    ORDER BY net_cents DESC, o_custkey
    LIMIT 100
    """,
)
def tpcds_net_paid_after_returns(spark, sf_dir):
    """TPC-DS q93 shape (net paid once returns are subtracted, top
    customers): per-customer kept vs returned value in exact cents, top
    100 by net with the unique customer key as tie-break — a
    TakeOrderedAndProject over the post-aggregate frame, never a global
    sort of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(~ret, cents).otherwise(0)).cast("long").alias("net_cents"),
            F.sum(F.when(ret, cents).otherwise(0))
            .cast("long")
            .alias("returned_cents"),
        )
        .orderBy(F.desc("net_cents"), F.col("o_custkey"))
        .limit(100)
    )


@q(
    "tpcds_best_worst_performers",
    """
    WITH perf AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM lineitem
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS INT)
                   AS best_rn,
               CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, l_partkey) AS INT)
                   AS worst_rn
        FROM perf
    )
    SELECT b.best_rn AS rnk,
           pb.p_name AS best_part, b.cents AS best_cents,
           pw.p_name AS worst_part, w.cents AS worst_cents
    FROM ranked b
    JOIN ranked w ON w.worst_rn = b.best_rn
    JOIN part pb ON pb.p_partkey = b.l_partkey
    JOIN part pw ON pw.p_partkey = w.l_partkey
    WHERE b.best_rn <= 10
    ORDER BY rnk
    """,
)
def tpcds_best_worst_performers(spark, sf_dir):
    """TPC-DS q44 shape (best and worst performing items side by side):
    1995 revenue per part, ranked ascending AND descending, the two
    rank-1..10 lists zipped on rank position and decorated with part
    names. The ranks run over the post-aggregate |parts| frame — and
    since the rank-n rows are all that survive, Spark plans the rank
    filter as a bounded WindowGroupLimit, never materializing a global
    sort of the fact table. Tie-break on the unique part key keeps both
    engines' orderings identical."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    perf = (
        li.filter(F.year("l_shipdate") == 1995)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wb = Window.orderBy(F.desc("cents"), F.col("l_partkey"))
    ww = Window.orderBy(F.asc("cents"), F.col("l_partkey"))
    ranked = perf.select(
        "l_partkey", "cents",
        F.row_number().over(wb).cast("int").alias("best_rn"),
        F.row_number().over(ww).cast("int").alias("worst_rn"),
    )
    b = ranked.filter(F.col("best_rn") <= 10).select(
        F.col("best_rn").alias("rnk"),
        F.col("l_partkey").alias("bk"),
        F.col("cents").alias("best_cents"),
    )
    w = ranked.filter(F.col("worst_rn") <= 10).select(
        F.col("worst_rn").alias("rnk"),
        F.col("l_partkey").alias("wk"),
        F.col("cents").alias("worst_cents"),
    )
    pb = p.select(F.col("p_partkey").alias("bk"), F.col("p_name").alias("best_part"))
    pw = p.select(F.col("p_partkey").alias("wk"), F.col("p_name").alias("worst_part"))
    return (
        b.join(w, "rnk")
        .join(F.broadcast(pb), "bk")
        .join(F.broadcast(pw), "wk")
        .select("rnk", "best_part", "best_cents", "worst_part", "worst_cents")
        .orderBy("rnk")
    )


@q(
    "tpcds_excess_discount_total",
    """
    WITH avg_d AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_discount * 1000000) AS BIGINT)) AS BIGINT)
                   AS d_ppm_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS excess_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN avg_d a ON a.l_partkey = l.l_partkey
    WHERE CAST(FLOOR(l.l_discount * 1000000) AS HUGEINT) * a.n * 10
          > CAST(a.d_ppm_sum AS HUGEINT) * 13
    """,
)
def tpcds_excess_discount_total(spark, sf_dir):
    """TPC-DS q32 shape (total value sold above 1.3× the item's average
    discount): per-part discount mean replayed exactly as integer ppm
    sums, the 1.3× threshold as the cross-multiplication
    d·n·10 > Σd·13 (no float division anywhere), and one scalar total
    over the excess lines. Upstream q32 phrases the mean as a
    correlated scalar subquery; here it is the same aggregate computed
    once and joined back — one extra keyed shuffle instead of a
    re-scan per row."""
    li = load_table(spark, sf_dir, "lineitem")
    d_ppm = F.floor(F.col("l_discount") * 1000000).cast("long")
    avg_d = li.groupBy("l_partkey").agg(
        F.sum(d_ppm).cast("long").alias("d_ppm_sum"),
        F.count("*").cast("long").alias("n"),
    )
    joined = li.join(avg_d, "l_partkey")
    excess = (
        d_ppm.cast("decimal(38,0)") * F.col("n") * 10
        > F.col("d_ppm_sum").cast("decimal(38,0)") * 13
    )
    return joined.filter(excess).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("excess_cents"),
        F.count("*").cast("long").alias("n_lines"),
    )


# ------------------------------------------------------------ wave 10
# Round-8 closing wave: the remaining distinct TPC-DS plan shapes the
# star fixtures can express — simple brand/year report (q3/q42/q52/
# q55), demographic ROLLUP averages (q7/q26/q27), INTERSECT-driven
# dimension short-list (q8), cross-channel item INTERSECT with an
# above-average scalar gate (q14), disjunctive filters across join
# branches (q15/q45), customer/supplier locality mismatch (q19),
# bucket scalar-aggregate battery (q28), coefficient-of-variation
# month pairs (q39), windowed dimension short-list over a ROLLUP
# (q70), per-trip/per-customer two-grain max (q79), and a banded
# non-equi dimension join (q84). Money stays exact integer cents;
# ratios are integer ppm via decimal DIV / hugeint //.


@q(
    "tpcds_brand_year_revenue",
    f"""
    SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS yr, p_brand,
           CAST(SUM({_NET_CENTS}) AS BIGINT) AS rev_cents
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN part   ON p_partkey = l_partkey
    WHERE CAST(strftime(o_orderdate, '%m') AS INT) = 12
    GROUP BY 1, 2
    ORDER BY yr, rev_cents DESC, p_brand
    """,
)
def tpcds_brand_year_revenue(spark, sf_dir):
    """TPC-DS q3/q42/q52/q55 shape (the canonical star-probe: one fact,
    two dimension joins, a month predicate, brand×year aggregate,
    ordered report). Catalyst broadcasts both dims under AQE and the
    month filter prunes before the join; one keyed shuffle total.
    Money is exact integer cents so the ORDER BY can't flip on float
    rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.month("o_orderdate") == 12)
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"), "p_brand")
        .agg(F.sum(net).cast("long").alias("rev_cents"))
        .orderBy("yr", F.desc("rev_cents"), "p_brand")
    )


@q(
    "tpcds_demographic_rollup_averages",
    f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY ROLLUP(n_name)
    """,
)
def tpcds_demographic_rollup_averages(spark, sf_dir):
    """TPC-DS q7/q26/q27 shape: average quantity/price/discount for one
    demographic slice (a market segment standing in for the customer-
    demographics dimension), rolled up by geography — q27 is exactly
    q7 plus the ROLLUP. All averages use the order-independent
    floor-decimal form; the rollup runs over the post-join fact with
    one Expand + one keyed shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(F.col("c_mktsegment") == "BUILDING")
        .rollup("n_name")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
        )
    )


@q(
    "tpcds_preferred_nation_intersect",
    """
    WITH preferred AS (
        SELECT n_nationkey FROM nation
        WHERE substr(n_name, 8, 1) IN ('1', '2')
        INTERSECT
        SELECT CAST(c_nationkey AS INT) FROM customer
        GROUP BY 1 HAVING COUNT(*) > 2
    )
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE n_nationkey IN (SELECT n_nationkey FROM preferred)
    GROUP BY n_name
    """,
)
def tpcds_preferred_nation_intersect(spark, sf_dir):
    """TPC-DS q8 shape: the dimension short-list is itself an INTERSECT
    — zip prefixes from a literal list ∩ zips with more than N resident
    customers, here nations by first letter ∩ nations by customer
    count. The INTERSECT runs over dimension-sized sets (≤|nations|
    rows) and feeds a broadcast semi-join into the fact scan, so the
    fact is filtered without any extra fact-sized shuffle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    by_letter = n.filter(
        F.substring("n_name", 8, 1).isin("1", "2")
    ).select("n_nationkey")
    by_count = (
        c.groupBy(F.col("c_nationkey").cast("int").alias("n_nationkey"))
        .count()
        .filter(F.col("count") > 2)
        .select("n_nationkey")
    )
    preferred = by_letter.intersect(by_count)
    return (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(preferred), "n_nationkey", "left_semi")
        .groupBy("n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


@q(
    "tpcds_nonlocal_brand_revenue",
    f"""
    SELECT p_brand,
           CAST(SUM({_NET_CENTS}) AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    WHERE c_nationkey <> s_nationkey
      AND CAST(strftime(o_orderdate, '%Y') AS INT) = 1996
    GROUP BY p_brand
    """,
)
def tpcds_nonlocal_brand_revenue(spark, sf_dir):
    """TPC-DS q19 shape: brand revenue restricted to NON-LOCAL trade —
    the customer's geography differs from the seller's (upstream: the
    store zip ≠ customer zip predicate). The inequality is evaluated
    post-join inside codegen (it cannot be an equi-key); all four
    dimension joins broadcast, the fact shuffles once for the brand
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            (F.col("c_nationkey") != F.col("s_nationkey"))
            & (F.year("o_orderdate") == 1996)
        )
        .groupBy("p_brand")
        .agg(
            F.sum(net).cast("long").alias("rev_cents"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@q(
    "tpcds_best_trip_per_customer",
    f"""
    WITH trips AS (
        SELECT o_custkey, l_orderkey AS trip,
               CAST(SUM({_NET_CENTS}) AS BIGINT) AS trip_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS trip_qty
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    )
    SELECT c_name, trip AS best_order, trip_cents, trip_qty
    FROM (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY trip_cents DESC, trip DESC) AS rn
          FROM trips) t
    JOIN customer ON c_custkey = o_custkey
    WHERE rn = 1
    """,
)
def tpcds_best_trip_per_customer(spark, sf_dir):
    """TPC-DS q79 shape: two-grain analysis — aggregate to the
    (customer, shopping-trip) grain first, then keep each customer's
    single largest trip. The trip grain is one keyed shuffle over the
    fact; the per-customer pick is a partitioned row_number over the
    already-aggregated trips frame (group-limit pushdown applies), and
    the customer-name join broadcasts. Deterministic tie-break on the
    order key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    trips = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", F.col("l_orderkey").alias("trip"))
        .agg(
            F.sum(net).cast("long").alias("trip_cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("trip_qty"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("trip_cents"), F.desc("trip")
    )
    return (
        trips.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            F.col("trip").alias("best_order"),
            "trip_cents",
            "trip_qty",
        )
    )


@q(
    "tpcds_band_join_acct_tiers",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('low', -1000.0, 2000.0),
               ('mid', 2000.0, 6000.0),
               ('high', 6000.0, 100000.0)
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM customer
    JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band
    """,
)
def tpcds_band_join_acct_tiers(spark, sf_dir):
    """TPC-DS q84 shape: a chained lookup through an income-band
    dimension — the join key is a BETWEEN range, not an equality
    (upstream: household_demographics → income_band ib_lower_bound /
    ib_upper_bound). The band table is a 3-row inline VALUES frame, so
    Spark plans a BroadcastNestedLoopJoin: each fact row streams
    through codegen against 3 broadcast rows — no shuffle, no
    cartesian blow-up, scale-independent."""
    c = load_table(spark, sf_dir, "customer")
    bands = spark.createDataFrame(
        [("low", -1000.0, 2000.0), ("mid", 2000.0, 6000.0),
         ("high", 6000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        c.join(
            F.broadcast(bands),
            (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        )
    )


@q(
    "tpcds_cross_channel_item_intersect",
    f"""
    WITH sold AS (
        SELECT o_orderstatus AS channel, l_partkey,
               CAST(SUM({_NET_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    ),
    cross_items AS (
        SELECT l_partkey FROM sold WHERE channel = 'O'
        INTERSECT SELECT l_partkey FROM sold WHERE channel = 'F'
        INTERSECT SELECT l_partkey FROM sold WHERE channel = 'P'
    ),
    tot AS (
        SELECT CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS all_cents,
               CAST(COUNT(*) AS BIGINT) AS all_n
        FROM sold
    )
    SELECT channel, p_brand,
           CAST(SUM(cents) AS BIGINT) AS brand_cents
    FROM sold
    JOIN part ON p_partkey = l_partkey
    JOIN tot ON TRUE
    WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
    GROUP BY channel, p_brand, all_cents, all_n
    HAVING CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) * all_n > all_cents
    """,
)
def tpcds_cross_channel_item_intersect(spark, sf_dir):
    """TPC-DS q14 shape: items sold through ALL channels (a 3-way
    INTERSECT of per-channel item sets — order status stands in for the
    store/catalog/web split) reported per channel×brand, keeping only
    groups above the average per-(channel, item) sales — q14's
    ``avg_sales`` scalar gate. The gate is cross-multiplied in exact
    integers (group_cents × total_n > total_cents) so no float division
    can flip it; the one-row total broadcasts, the INTERSECT runs over
    item-sized sets and semi-joins back."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    sold = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_orderstatus").alias("channel"), "l_partkey")
        .agg(F.sum(net).cast("long").alias("cents"))
    )
    # NOTE: no persist() — sold is recomputed for the channel branches,
    # but a suite-entry persist would sit in the CacheManager for the
    # session lifetime (the ADVICE-r7 leak class); the frame is an
    # item-grain aggregate and the recompute is one cheap keyed agg.
    chans = [
        sold.filter(F.col("channel") == st).select("l_partkey")
        for st in ("O", "F", "P")
    ]
    cross_items = chans[0].intersect(chans[1]).intersect(chans[2])
    tot = sold.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("all_cents"),
        F.count("*").cast("long").alias("all_n"),
    )
    return (
        sold.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(cross_items, "l_partkey", "left_semi")
        .join(F.broadcast(tot))
        .groupBy("channel", "p_brand", "all_cents", "all_n")
        .agg(F.sum("cents").cast("long").alias("brand_cents"))
        .filter(
            F.col("brand_cents").cast("decimal(38,0)") * F.col("all_n")
            > F.col("all_cents")
        )
        .select("channel", "p_brand", "brand_cents")
    )


@q(
    "tpcds_disjunctive_branch_filter",
    f"""
    SELECT n_name,
           CAST(SUM({_NET_CENTS}) AS BIGINT) AS rev_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE substr(n_name, 8, 1) IN ('3', '9')
       OR l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
    GROUP BY n_name
    """,
)
def tpcds_disjunctive_branch_filter(spark, sf_dir):
    """TPC-DS q15/q45 shape: a disjunction ACROSS join branches — keep
    a row if its geography matches a literal short-list OR its item is
    in a subquery-defined set (upstream: zip prefix list OR item id
    list). An OR spanning two tables can't be pushed into either scan
    and can't be a semi-join alone; the Spark-first form joins the
    small item set as a broadcast LEFT join and evaluates the OR over
    the marker column in codegen — no fact re-scan, no union of two
    branches (which would double-count rows matching both arms)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    small = p.filter(F.col("p_size") == 1).select(
        F.col("p_partkey").alias("__sz1_pk")
    )
    net = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(small),
            F.col("l_partkey") == F.col("__sz1_pk"),
            "left",
        )
        .filter(
            F.substring("n_name", 8, 1).isin("3", "9")
            | F.col("__sz1_pk").isNotNull()
        )
        .groupBy("n_name")
        .agg(
            F.sum(net).cast("long").alias("rev_cents"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


_B28 = [(1, 8), (9, 16), (17, 24), (25, 32), (33, 40), (41, 50)]


@q(
    "tpcds_quantity_bucket_battery",
    "SELECT "
    + ", ".join(
        f"b{i}.avg_price AS b{i}_avg, b{i}.n AS b{i}_n, b{i}.nd AS b{i}_nd"
        for i in range(1, 7)
    )
    + " FROM "
    + ", ".join(
        f"(SELECT {o_davg('l_extendedprice')} AS avg_price,"
        f" CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS nd"
        f" FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi}) b{i}"
        for i, (lo, hi) in enumerate(_B28, 1)
    ),
)
def tpcds_quantity_bucket_battery(spark, sf_dir):
    """TPC-DS q28 shape: six quantity-band scalar aggregates (average
    list price, row count, DISTINCT price count per band) cross-joined
    into one wide row. The reference form is six separate fact scans;
    the Spark-first rewrite is ONE scan → groupBy(band) (six groups,
    count-distinct evaluated exactly per band in the same pass) → a
    six-row pivot into the wide row. The oracle keeps the six-subquery
    spelling — same values, and the plan diff is the point."""
    li = load_table(spark, sf_dir, "lineitem")
    q_ = F.col("l_quantity")
    band = F.lit(None).cast("int")
    for i, (lo, hi) in reversed(list(enumerate(_B28, 1))):
        band = F.when((q_ >= lo) & (q_ <= hi), F.lit(i)).otherwise(band)
    g = (
        li.withColumn("__b", band)
        .filter(F.col("__b").isNotNull())
        .groupBy("__b")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 1000000.0).cast(
                    "decimal(38,0)"
                )
            ).alias("s"),
            F.count("l_extendedprice").alias("cnt"),
            F.countDistinct("l_extendedprice").alias("nd"),
        )
    )
    cols = []
    for i in range(1, 7):
        hit = F.col("__b") == i
        s = F.max(F.when(hit, F.col("s")))
        cnt = F.max(F.when(hit, F.col("cnt")))
        nd = F.max(F.when(hit, F.col("nd")))
        cols.append(
            ((s.cast("double") / 1000000.0) / cnt).alias(f"b{i}_avg")
        )
        # an EMPTY band yields NULL from the max-pivot but 0 from the
        # oracle's COUNT() subquery — coalesce to the COUNT contract
        cols.append(F.coalesce(cnt, F.lit(0)).cast("long").alias(f"b{i}_n"))
        cols.append(F.coalesce(nd, F.lit(0)).cast("long").alias(f"b{i}_nd"))
    return g.agg(*cols)


@q(
    "tpcds_cov_consecutive_months",
    """
    WITH monthly AS (
        SELECT s_suppkey, s_name,
               CAST(strftime(l_shipdate, '%Y') AS INT) * 12
                   + CAST(strftime(l_shipdate, '%m') AS INT) - 1 AS ymi,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS ss
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= 2
    ),
    cov AS (
        SELECT s_suppkey, s_name, ymi,
               CAST(((CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
                     * n * n * 1000000)
                    // ((CAST(n AS HUGEINT) * (n - 1)) * s * s)
                    AS BIGINT) AS cov2_ppm
        FROM monthly
    )
    SELECT m1.s_name AS s_name, m1.ymi AS ymi,
           m1.cov2_ppm AS cov2_ppm, m2.cov2_ppm AS next_cov2_ppm
    FROM cov m1
    JOIN cov m2 ON m2.s_suppkey = m1.s_suppkey AND m2.ymi = m1.ymi + 1
    WHERE m1.cov2_ppm > 250000 AND m2.cov2_ppm > 250000
    """,
)
def tpcds_cov_consecutive_months(spark, sf_dir):
    """TPC-DS q39 shape: per (supplier, month) demand dispersion — the
    squared coefficient of variation — self-joined on month+1 to find
    suppliers volatile in CONSECUTIVE months (upstream: warehouse/item
    inventory stdev/mean > 1 in March AND April). cov² is computed as
    an exact integer rational — (n·Σq² − (Σq)²)·n²·10⁶ ÷ (n(n−1)·(Σq)²)
    — sample variance over squared mean with no sqrt and no float
    division, decimal DIV here and HUGEINT // in DuckDB, so the
    volatility threshold is bit-identical cross-engine. The self-join
    is keyed on (supplier, month): one shuffle of the tiny monthly
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    qv = F.col("l_quantity").cast("long")
    monthly = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            "s_suppkey",
            "s_name",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("int")
            .alias("ymi"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(qv).cast("long").alias("s"),
            F.sum(qv * qv).cast("long").alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    d = "decimal(38,0)"
    cov = monthly.select(
        "s_suppkey",
        "s_name",
        "ymi",
        F.expr(
            f"CAST(((CAST(n AS {d}) * ss - CAST(s AS {d}) * s)"
            " * n * n * 1000000)"
            f" DIV ((CAST(n AS {d}) * (n - 1)) * s * s) AS BIGINT)"
        ).alias("cov2_ppm"),
    )
    m1, m2 = cov.alias("m1"), cov.alias("m2")
    return (
        m1.join(
            m2,
            (F.col("m2.s_suppkey") == F.col("m1.s_suppkey"))
            & (F.col("m2.ymi") == F.col("m1.ymi") + 1),
        )
        .filter(
            (F.col("m1.cov2_ppm") > 250000) & (F.col("m2.cov2_ppm") > 250000)
        )
        .select(
            F.col("m1.s_name").alias("s_name"),
            F.col("m1.ymi").alias("ymi"),
            F.col("m1.cov2_ppm").alias("cov2_ppm"),
            F.col("m2.cov2_ppm").alias("next_cov2_ppm"),
        )
    )


@q(
    "tpcds_top_regions_rollup",
    """
    WITH rev AS (
        SELECT r_name, n_name,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n_regionkey
    ),
    top_regions AS (
        SELECT r_name
        FROM (SELECT r_name, SUM(CAST(cents AS HUGEINT)) AS t
              FROM rev GROUP BY 1)
        ORDER BY t DESC, r_name LIMIT 3
    )
    SELECT r_name, n_name,
           CAST(SUM(cents) AS BIGINT) AS rev_cents,
           CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochier,
           CAST(RANK() OVER (
               PARTITION BY GROUPING(r_name) + GROUPING(n_name),
                            CASE WHEN GROUPING(n_name) = 0 THEN r_name END
               ORDER BY SUM(cents) DESC, COALESCE(n_name, '')) AS INT)
               AS rank_in_parent
    FROM rev
    WHERE r_name IN (SELECT r_name FROM top_regions)
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def tpcds_top_regions_rollup(spark, sf_dir):
    """TPC-DS q70 shape: restrict the geography dimension to the top-k
    entries chosen by a ranked subquery over the SAME fact, then ROLLUP
    the hierarchy and rank siblings within each parent (q70's
    lochierarchy / rank_within_parent). The top-k subquery is a TopN
    (bounded heap, no global sort) over the region-grain aggregate and
    semi-joins back as a broadcast; the rank windows partition by
    grouping level so no single-partition window appears."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "r_name",
            "n_name",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    top = (
        rev.groupBy("r_name")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("t"))
        .orderBy(F.desc("t"), "r_name")
        .limit(3)
        .select("r_name")
    )
    rolled = (
        rev.join(F.broadcast(top), "r_name", "left_semi")
        .rollup("r_name", "n_name")
        .agg(
            F.sum("cents").cast("long").alias("rev_cents"),
            (F.grouping("r_name") + F.grouping("n_name"))
            .cast("int")
            .alias("lochier"),
            F.when(F.grouping("n_name") == 0, F.col("r_name")).alias(
                "__parent"
            ),
        )
    )
    w = Window.partitionBy("lochier", "__parent").orderBy(
        F.desc("rev_cents"), F.coalesce("n_name", F.lit(""))
    )
    return rolled.select(
        "r_name",
        "n_name",
        "rev_cents",
        "lochier",
        F.rank().over(w).cast("int").alias("rank_in_parent"),
    )


# ---------------------------------------------------------------------------
# Wave 11 (round-8 continuation): the last two distinct expressible shapes —
# rank-per-category over the FULL rollup lattice (q67) and the
# returns-excluded cross-channel yearly ratio (q78).
# ---------------------------------------------------------------------------


@q(
    "tpcds_rollup_rank_per_category",
    """
    WITH sales AS (
        SELECT p_brand, p_type,
               strftime(l_shipdate, '%Y') || '-Q'
                   || CAST(quarter(l_shipdate) AS VARCHAR) AS qtr,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    rolled AS (
        SELECT p_brand, p_type, qtr,
               CAST(SUM(cents) AS BIGINT) AS sales_cents,
               CAST(GROUPING(p_brand) + GROUPING(p_type) + GROUPING(qtr)
                    AS INT) AS g_lvl
        FROM sales
        GROUP BY ROLLUP (p_brand, p_type, qtr)
    )
    SELECT p_brand, p_type, qtr, sales_cents, g_lvl, rk
    FROM (
        SELECT *, CAST(RANK() OVER (
                   PARTITION BY p_brand
                   ORDER BY sales_cents DESC, g_lvl,
                            COALESCE(p_type, ''), COALESCE(qtr, '')) AS INT)
                   AS rk
        FROM rolled
    )
    WHERE rk <= 10
    """,
)
def tpcds_rollup_rank_per_category(spark, sf_dir):
    """TPC-DS q67 shape: ROLLUP the full product x time hierarchy, then
    rank EVERY lattice row (detail rows, subtotals, and the grand total
    alike) within its top-grain category and keep the top k per
    category (q67's ``rank() over (partition by i_category order by
    sumsales desc) <= 100``). Differs from the q70 entry in that no
    dimension is pre-restricted — the window runs over the whole rollup
    output, and NULL-category rows (the grand total) form their own
    partition exactly as q67's NULL i_category does.

    Scale: one fact shuffle for the rollup partial/final agg; the
    window input is the lattice (|brands|x|types|x|quarters| rows, dim-
    bounded, independent of fact size), and the rk<=10 filter plans as
    WindowGroupLimit so no partition materializes more than the frame
    it keeps. [upstream: regression-test/suites/tpcds_sf1_p1 q67]"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sales = li.join(p, F.col("p_partkey") == F.col("l_partkey")).select(
        "p_brand",
        "p_type",
        F.concat(
            F.date_format("l_shipdate", "yyyy"),
            F.lit("-Q"),
            F.quarter("l_shipdate").cast("string"),
        ).alias("qtr"),
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    rolled = (
        sales.rollup("p_brand", "p_type", "qtr")
        .agg(
            F.sum("cents").cast("long").alias("sales_cents"),
            (
                F.grouping("p_brand")
                + F.grouping("p_type")
                + F.grouping("qtr")
            )
            .cast("int")
            .alias("g_lvl"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("sales_cents"),
        "g_lvl",
        F.coalesce("p_type", F.lit("")),
        F.coalesce("qtr", F.lit("")),
    )
    return (
        rolled.withColumn("rk", F.rank().over(w).cast("int"))
        .filter(F.col("rk") <= 10)
        .select("p_brand", "p_type", "qtr", "sales_cents", "g_lvl", "rk")
    )


@q(
    "tpcds_returns_excluded_ratio",
    """
    WITH clean AS (
        SELECT * FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem r
            WHERE r.l_returnflag = 'R'
              AND r.l_orderkey = l.l_orderkey
              AND r.l_partkey = l.l_partkey)
    ),
    yearly AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
               o_custkey AS ck,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(FLOOR(l_quantity) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS qty_primary,
               CAST(SUM(CASE WHEN o_orderstatus <> 'F'
                             THEN CAST(FLOOR(l_quantity) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS qty_other,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_primary
        FROM clean JOIN orders ON o_orderkey = l_orderkey
        GROUP BY 1, 2
    )
    SELECT yr, ck, qty_primary, qty_other, cents_primary,
           CAST((CAST(qty_other AS HUGEINT) * 1000000) // qty_primary
                AS BIGINT) AS other_ratio_ppm
    FROM yearly
    WHERE qty_primary > 0
    ORDER BY other_ratio_ppm DESC, yr, ck
    LIMIT 100
    """,
)
def tpcds_returns_excluded_ratio(spark, sf_dir):
    """TPC-DS q78 shape: exclude every (order, part) that had ANY
    returned line via a genuine ANTI JOIN (not a row filter — a
    returned line knocks out the order's other lines for that part),
    then compare per-(year, customer) volume across channels and rank
    by the cross-channel ratio where the primary channel is non-zero.

    Spark-first rewrite: upstream q78 materializes three channel
    branches (ss/ws/cs minus their returns) and joins them at the
    (customer, year) grain — three fact scans plus two joins. Here the
    channel split is conditional aggregation over ONE cleaned scan
    (channel tag = order status), so the whole query is one anti join +
    one keyed shuffle. The ratio is an exact integer ppm (decimal DIV /
    hugeint //, never a double product), and the top-100 is a bounded
    TakeOrderedAndProject over a totally-ordered key.
    [upstream: regression-test/suites/tpcds_sf1_p1 q78]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    returned = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_partkey"
    )
    clean = li.join(returned, ["l_orderkey", "l_partkey"], "left_anti")
    is_primary = F.col("o_orderstatus") == "F"
    qty = F.floor(F.col("l_quantity")).cast("long")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    yearly = (
        clean.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_custkey").alias("ck"),
        )
        .agg(
            F.sum(F.when(is_primary, qty).otherwise(F.lit(0)))
            .cast("long")
            .alias("qty_primary"),
            F.sum(F.when(~is_primary, qty).otherwise(F.lit(0)))
            .cast("long")
            .alias("qty_other"),
            F.sum(F.when(is_primary, cents).otherwise(F.lit(0)))
            .cast("long")
            .alias("cents_primary"),
        )
    )
    return (
        yearly.filter(F.col("qty_primary") > 0)
        .withColumn(
            "other_ratio_ppm",
            F.expr(
                "CAST((CAST(qty_other AS DECIMAL(38,0)) * 1000000)"
                " DIV qty_primary AS BIGINT)"
            ),
        )
        .orderBy(F.desc("other_ratio_ppm"), "yr", "ck")
        .limit(100)
    )


# ------------------------------------------------- r8 tranche, wave 12
# The last expressible shapes: every residual upstream query that the
# fixtures can carry (q20, q43, q46, q50, q60, q63, q81, q83, q86, q94,
# q99). Only q24 (zip/color dims) and q91 (call-center dims) need
# fixture columns that do not exist. All integer-exact (cents,
# cross-multiplied comparisons, DECIMAL-DIV ppm ratios).


@q(
    "tpcds_class_ratio_window",
    f"""
    WITH pr AS (
        SELECT p_type, p_brand, p_partkey, CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate BETWEEN DATE '1995-03-01' AND DATE '1995-03-30'
          AND p_type IN ('PROMO', 'ECONOMY', 'STANDARD')
        GROUP BY 1, 2, 3
    )
    SELECT p_type, p_brand, p_partkey, cents,
           CAST((CAST(cents AS HUGEINT) * 1000000)
                // SUM(cents) OVER (PARTITION BY p_type) AS BIGINT) AS ratio_ppm
    FROM pr
    ORDER BY p_type, ratio_ppm DESC, p_partkey
    LIMIT 100
    """,
)
def tpcds_class_ratio_window(spark, sf_dir):
    """TPC-DS q20: per-item revenue ratio-to-report WITHIN its class
    over a 30-day sale window restricted to a 3-category short-list —
    the dated, filtered variant of the q12/q98 family (which
    ``tpcds_revenue_share`` covers undated at brand grain). The
    ratio divides two identical integer cent sums via DECIMAL DIV, so
    it is exact cross-engine. The date filter pushes to the fact scan
    and the 3-type filter prunes the broadcast part side BEFORE the
    aggregate; the window runs over the (small) per-part frame.
    [upstream: regression-test/suites/tpcds_sf1_p1 q20]"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").isin("PROMO", "ECONOMY", "STANDARD")
    )
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    pr = (
        li.filter(
            F.col("l_shipdate").between("1995-03-01", "1995-03-30")
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_type", "p_brand", "p_partkey")
        .agg(F.sum(cents).cast("long").alias("cents"))
    )
    w = Window.partitionBy("p_type")
    return (
        pr.withColumn("cls_cents", F.sum("cents").over(w))
        .withColumn(
            "ratio_ppm",
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000)"
                " DIV cls_cents AS BIGINT)"
            ),
        )
        .select("p_type", "p_brand", "p_partkey", "cents", "ratio_ppm")
        .orderBy("p_type", F.desc("ratio_ppm"), "p_partkey")
        .limit(100)
    )


@q(
    "tpcds_store_weekday_matrix",
    f"""
    SELECT n_name,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 1 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS mon_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 2 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS tue_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 3 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS wed_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 4 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS thu_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 5 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS fri_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 6 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS sat_cents,
           CAST(SUM(CASE WHEN isodow(l_shipdate) = 7 THEN {_CENTS} ELSE 0 END) AS BIGINT) AS sun_cents
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1996
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_store_weekday_matrix(spark, sf_dir):
    """TPC-DS q43: one year of sales pivoted into a
    store × day-of-week matrix — seven conditional cent sums in ONE
    pass (store → supplier nation). Distinct from the q59-family
    entries (those compare across halves/years; q43 is the plain
    weekday pivot). ISO weekday pinned as Spark weekday()+1 = DuckDB
    isodow. One keyed shuffle; dims broadcast.
    [upstream: regression-test/suites/tpcds_sf1_p1 q43]"""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    dow = F.weekday("l_shipdate") + 1

    def day(name, d):
        return (
            F.sum(F.when(dow == d, cents).otherwise(0)).cast("long").alias(name)
        )

    return (
        li.filter(F.year("l_shipdate") == 1996)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            day("mon_cents", 1),
            day("tue_cents", 2),
            day("wed_cents", 3),
            day("thu_cents", 4),
            day("fri_cents", 5),
            day("sat_cents", 6),
            day("sun_cents", 7),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_nonlocal_weekend_trips",
    f"""
    SELECT c_name, sn.n_name AS bought_nation, o_orderkey,
           CAST(SUM({_CENTS}) AS BIGINT) AS amt_cents,
           CAST(SUM({_NET_CENTS}) AS BIGINT) AS net_cents
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE isodow(o_orderdate) IN (6, 7)
      AND s_nationkey <> c_nationkey
    GROUP BY c_name, sn.n_name, o_orderkey
    ORDER BY c_name, o_orderkey, bought_nation
    LIMIT 100
    """,
)
def tpcds_nonlocal_weekend_trips(spark, sf_dir):
    """TPC-DS q46: weekend shopping trips where the purchase locality
    differs from the customer's home — trip grain (order, customer,
    bought-nation), amount + net per trip, home≠bought as a join-time
    predicate (trip → order, city → nation). One fact shuffle to the
    trip grain; customer/supplier dims broadcast; the weekend filter
    prunes at the orders scan. [upstream:
    regression-test/suites/tpcds_sf1_p1 q46]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    net = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(
            o.filter((F.weekday("o_orderdate") + 1).isin(6, 7)),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            "c_name", F.col("n_name").alias("bought_nation"), "o_orderkey"
        )
        .agg(
            F.sum(cents).cast("long").alias("amt_cents"),
            F.sum(net).cast("long").alias("net_cents"),
        )
        .orderBy("c_name", "o_orderkey", "bought_nation")
        .limit(100)
    )


@q(
    "tpcds_return_latency_bands",
    """
    SELECT n_name,
           CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lat > 90 AND lat <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lat > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p
    FROM (
        SELECT n_name, date_diff('day', o_orderdate, l_shipdate) AS lat
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE l_returnflag = 'R'
    ) t
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_return_latency_bands(spark, sf_dir):
    """TPC-DS q50: RETURNED items banded by days between the sale and
    the return event, per store (supplier nation), five 30-day bands
    as conditional counts in one pass. Distinct from
    ``tpcds_ship_latency_bands`` (q62: all lines, priority grain, four
    bands). The returnflag filter pushes to the fact scan.
    [upstream: regression-test/suites/tpcds_sf1_p1 q50]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(name, cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("n_name", lat.alias("lat"))
        .groupBy("n_name")
        .agg(
            band("d30", F.col("lat") <= 30),
            band("d60", (F.col("lat") > 30) & (F.col("lat") <= 60)),
            band("d90", (F.col("lat") > 60) & (F.col("lat") <= 90)),
            band("d120", (F.col("lat") > 90) & (F.col("lat") <= 120)),
            band("d120p", F.col("lat") > 120),
        )
        .orderBy("n_name")
    )


@q(
    "tpcds_state_avg_return_detail",
    """
    WITH per_cust AS (
        SELECT c_custkey, c_name, c_nationkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS ret_cents
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag = 'R'
          AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1, 2, 3
    ),
    nat AS (
        SELECT c_nationkey AS nk,
               CAST(SUM(ret_cents) AS BIGINT) AS nat_cents,
               CAST(COUNT(*) AS BIGINT) AS nat_n
        FROM per_cust GROUP BY 1
    )
    SELECT c_name, n_name, ret_cents
    FROM per_cust
    JOIN nat    ON nk = c_nationkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE ret_cents * nat_n * 10 > nat_cents * 12
    ORDER BY c_name
    LIMIT 100
    """,
)
def tpcds_state_avg_return_detail(spark, sf_dir):
    """TPC-DS q81: customer DETAIL (name + geography) for customers
    whose one-year return total exceeds 1.2× their state's average —
    the q1/q30 correlated-average family finished with the address
    join upstream q81 adds. Distinct from
    ``tpcds_above_nation_avg_returns`` (q1: undated, keys-only
    output). Comparison cross-multiplied into exact integers; the
    per-nation frame broadcasts. [upstream:
    regression-test/suites/tpcds_sf1_p1 q81]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    per_cust = (
        li.filter(
            (F.col("l_returnflag") == "R") & (F.year("l_shipdate") == 1995)
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(cents).cast("long").alias("ret_cents"))
    )
    nat = per_cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.sum("ret_cents").cast("long").alias("nat_cents"),
        F.count("*").cast("long").alias("nat_n"),
    )
    return (
        per_cust.join(F.broadcast(nat), F.col("nk") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(
            F.col("ret_cents") * F.col("nat_n") * 10 > F.col("nat_cents") * 12
        )
        .select("c_name", "n_name", "ret_cents")
        .orderBy("c_name")
        .limit(100)
    )


@q(
    "tpcds_rollup_rank_within_parent",
    f"""
    WITH g AS (
        SELECT p_type, p_brand,
               CAST(GROUPING(p_type) + GROUPING(p_brand) AS INT)
                   AS lochierarchy,
               GROUPING(p_brand) AS gb,
               CAST(SUM({_NET_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY ROLLUP (p_type, p_brand)
    )
    SELECT COALESCE(p_type, '<all>') AS p_type,
           COALESCE(p_brand, '<all>') AS p_brand,
           lochierarchy, cents,
           CAST(RANK() OVER (
                    PARTITION BY lochierarchy,
                                 CASE WHEN gb = 0 THEN p_type END
                    ORDER BY cents DESC, p_brand) AS INT) AS rnk
    FROM g
    ORDER BY lochierarchy DESC, p_type, p_brand
    """,
)
def tpcds_rollup_rank_within_parent(spark, sf_dir):
    """TPC-DS q86: the ROLLUP lattice ranked WITHIN EACH PARENT — the
    rank partition is (lochierarchy, parent key), so detail rows rank
    among siblings of the same class and subtotals rank among
    subtotals, exactly upstream's CASE-keyed PARTITION BY. Distinct
    from ``tpcds_grouping_margin_rank`` (q36: rank within level only)
    and q70 (dim-restricted). REPEAT fan-out happens after partial
    agg; the window input is the (small) lattice.
    [upstream: regression-test/suites/tpcds_sf1_p1 q86]"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    g = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            F.sum(net).cast("long").alias("cents"),
            (F.grouping("p_type") + F.grouping("p_brand"))
            .cast("int")
            .alias("lochierarchy"),
            F.grouping("p_brand").alias("gb"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("gb") == 0, F.col("p_type")),
    ).orderBy(F.desc("cents"), "p_brand")
    return (
        g.select(
            F.coalesce("p_type", F.lit("<all>")).alias("p_type"),
            F.coalesce("p_brand", F.lit("<all>")).alias("p_brand"),
            "lochierarchy",
            "cents",
            F.rank().over(w).cast("int").alias("rnk"),
        )
        .orderBy(F.desc("lochierarchy"), "p_type", "p_brand")
    )


@q(
    "tpcds_warehouse_latency_matrix",
    """
    SELECT n_name AS warehouse, o_orderpriority AS ship_mode,
           CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN lat > 90 AND lat <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN lat > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p
    FROM (
        SELECT n_name, o_orderpriority,
               date_diff('day', o_orderdate, l_shipdate) AS lat
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
    ) t
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def tpcds_warehouse_latency_matrix(spark, sf_dir):
    """TPC-DS q99: one year of fulfilment latency banded per
    (warehouse, ship mode) — warehouse → supplier nation, ship mode →
    order priority — five 30-day bands at a TWO-dimension grain.
    Distinct from q62 (priority only, undated) and q50 (returns,
    store grain). One conditional-aggregate pass; dims broadcast.
    [upstream: regression-test/suites/tpcds_sf1_p1 q99]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def band(name, cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return (
        li.filter(F.year("l_shipdate") == 1995)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("warehouse"),
            F.col("o_orderpriority").alias("ship_mode"),
            lat.alias("lat"),
        )
        .groupBy("warehouse", "ship_mode")
        .agg(
            band("d30", F.col("lat") <= 30),
            band("d60", (F.col("lat") > 30) & (F.col("lat") <= 60)),
            band("d90", (F.col("lat") > 60) & (F.col("lat") <= 90)),
            band("d120", (F.col("lat") > 90) & (F.col("lat") <= 120)),
            band("d120p", F.col("lat") > 120),
        )
        .orderBy("warehouse", "ship_mode")
    )


@q(
    "tpcds_brand_channel_union",
    f"""
    WITH ch AS (
        SELECT p_brand, {_CENTS} AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
          AND CAST(strftime(l_shipdate, '%m') AS INT) = 9
          AND l_linenumber % 3 = 0
        UNION ALL
        SELECT p_brand, {_CENTS} AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
          AND CAST(strftime(l_shipdate, '%m') AS INT) = 9
          AND l_linenumber % 3 = 1
        UNION ALL
        SELECT p_brand, {_CENTS} AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
          AND CAST(strftime(l_shipdate, '%m') AS INT) = 9
          AND l_linenumber % 3 = 2
    )
    SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM ch
    GROUP BY p_brand
    ORDER BY total_cents DESC, p_brand
    LIMIT 100
    """,
)
def tpcds_brand_channel_union(spark, sf_dir):
    """TPC-DS q60: one month's revenue for a category short-list,
    summed PER BRAND ACROSS three channels — upstream's three channel
    CTEs UNION ALLed then re-aggregated (channel → line-number ring,
    as the other channel entries simulate it). Each branch pushes the
    same category/date filter; Catalyst re-uses the broadcast part
    side across branches. Distinct from q33/q56
    (``tpcds_category_cross_channel``: per-part, channels as columns)
    — q60 is the union-then-reaggregate shape at brand grain.
    [upstream: regression-test/suites/tpcds_sf1_p1 q60]"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    base = li.filter(
        (F.year("l_shipdate") == 1995) & (F.month("l_shipdate") == 9)
    ).join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))

    def channel(i):
        return base.filter(F.col("l_linenumber") % 3 == i).select(
            "p_brand", cents.alias("cents")
        )

    ch = channel(0).unionAll(channel(1)).unionAll(channel(2))
    return (
        ch.groupBy("p_brand")
        .agg(F.sum("cents").cast("long").alias("total_cents"))
        .orderBy(F.desc("total_cents"), "p_brand")
        .limit(100)
    )


@q(
    "tpcds_manager_monthly_deviation",
    f"""
    WITH m AS (
        SELECT p_size AS mgr,
               CAST(strftime(l_shipdate, '%m') AS INT) AS moy,
               CAST(SUM({_NET_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1, 2
    ),
    a AS (
        SELECT mgr, CAST(SUM(cents) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS nm
        FROM m GROUP BY 1
    )
    SELECT m.mgr, moy, cents,
           CAST((CAST(tot AS HUGEINT) * 1000000) // nm AS BIGINT)
               AS avg_monthly_micro
    FROM m JOIN a ON m.mgr = a.mgr
    WHERE cents * nm * 10 > tot * 11 OR cents * nm * 10 < tot * 9
    ORDER BY m.mgr, moy
    """,
)
def tpcds_manager_monthly_deviation(spark, sf_dir):
    """TPC-DS q63: months where a manager's sales deviate more than
    10% from that manager's monthly average over the year (manager →
    p_size, an integer id like upstream's i_manager_id). The
    correlated AVG decorrelates into a per-manager re-aggregate of the
    per-month frame; |dev| > 0.1·avg cross-multiplies into exact
    integers (cents·n vs tot·1.1 and ·0.9). Distinct from q53/q89
    (quarter grain vs 1.1× only). Two tiny post-agg shuffles.
    [upstream: regression-test/suites/tpcds_sf1_p1 q63]"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    m = (
        li.filter(F.year("l_shipdate") == 1995)
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("p_size").alias("mgr"),
            F.month("l_shipdate").cast("int").alias("moy"),
        )
        .agg(F.sum(net).cast("long").alias("cents"))
    )
    a = m.groupBy(F.col("mgr").alias("amgr")).agg(
        F.sum("cents").cast("long").alias("tot"),
        F.count("*").cast("long").alias("nm"),
    )
    dev = (F.col("cents") * F.col("nm") * 10 > F.col("tot") * 11) | (
        F.col("cents") * F.col("nm") * 10 < F.col("tot") * 9
    )
    return (
        m.join(F.broadcast(a), F.col("amgr") == F.col("mgr"))
        .filter(dev)
        .withColumn(
            "avg_monthly_micro",
            F.expr(
                "CAST((CAST(tot AS DECIMAL(38,0)) * 1000000)"
                " DIV nm AS BIGINT)"
            ),
        )
        .select("mgr", "moy", "cents", "avg_monthly_micro")
        .orderBy("mgr", "moy")
    )


@q(
    "tpcds_returned_qty_channel_ratio",
    """
    WITH r AS (
        SELECT l_partkey AS partkey,
               CAST(SUM(CASE WHEN l_linenumber % 3 = 0
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q0,
               CAST(SUM(CASE WHEN l_linenumber % 3 = 1
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q1,
               CAST(SUM(CASE WHEN l_linenumber % 3 = 2
                             THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS q2
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
        GROUP BY 1
    )
    SELECT partkey, q0, q1, q2,
           CAST((CAST(q0 AS HUGEINT) * 3000000) // (q0 + q1 + q2) AS BIGINT)
               AS r0_ppm,
           CAST((CAST(q1 AS HUGEINT) * 3000000) // (q0 + q1 + q2) AS BIGINT)
               AS r1_ppm,
           CAST((CAST(q2 AS HUGEINT) * 3000000) // (q0 + q1 + q2) AS BIGINT)
               AS r2_ppm
    FROM r
    WHERE q0 > 0 AND q1 > 0 AND q2 > 0
    ORDER BY partkey
    LIMIT 100
    """,
)
def tpcds_returned_qty_channel_ratio(spark, sf_dir):
    """TPC-DS q83: items returned in ALL THREE channels in the same
    season, each channel's returned quantity as a share of a third of
    the total (upstream's ``qty/((sr+cr+wr)/3)·100``, here exact
    integer ppm of the third). Upstream's three-CTE three-way item
    join collapses Spark-first into ONE conditional aggregate with an
    all-channels-present HAVING — one fact pass instead of three scans
    and two joins. [upstream: regression-test/suites/tpcds_sf1_p1 q83]"""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")

    def ch(name, i):
        return (
            F.sum(F.when(F.col("l_linenumber") % 3 == i, qty).otherwise(0))
            .cast("long")
            .alias(name)
        )

    r = (
        li.filter(
            (F.col("l_returnflag") == "R") & (F.year("l_shipdate") == 1995)
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(ch("q0", 0), ch("q1", 1), ch("q2", 2))
        .filter((F.col("q0") > 0) & (F.col("q1") > 0) & (F.col("q2") > 0))
    )
    for i in range(3):
        r = r.withColumn(
            f"r{i}_ppm",
            F.expr(
                f"CAST((CAST(q{i} AS DECIMAL(38,0)) * 3000000)"
                " DIV (q0 + q1 + q2) AS BIGINT)"
            ),
        )
    return r.orderBy("partkey").limit(100)


@q(
    "tpcds_clean_multiwarehouse_orders",
    f"""
    WITH per_o AS (
        SELECT l_orderkey AS ok,
               COUNT(DISTINCT s_nationkey) AS nw,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nr,
               CAST(SUM({_CENTS}) AS BIGINT) AS cents
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM per_o JOIN orders ON o_orderkey = ok
    WHERE nw >= 2 AND nr = 0
      AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-01'
    """,
)
def tpcds_clean_multiwarehouse_orders(spark, sf_dir):
    """TPC-DS q94: orders in a 60-day window shipped from MORE THAN
    ONE warehouse (EXISTS a sibling line from a different site) with
    NO return (NOT EXISTS) — both correlated predicates decorrelated
    into ONE per-order aggregate (distinct-warehouse count ≥ 2, zero
    returned lines), then the order-count/value rollup. Same
    decorrelation family as q95/q21 (``tpcds_multi_supplier_returned_
    orders``: ≥3 suppliers AND returned — q94 is the complement:
    multi-site AND clean). Scalar output; one fact shuffle.
    [upstream: regression-test/suites/tpcds_sf1_p1 q94]"""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    per_o = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.countDistinct("s_nationkey").alias("nw"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("nr"),
            F.sum(cents).cast("long").alias("cents"),
        )
        .filter((F.col("nw") >= 2) & (F.col("nr") == 0))
    )
    return (
        o.filter(
            F.col("o_orderdate").between("1995-01-01", "1995-03-01")
        )
        .join(per_o, F.col("o_orderkey") == F.col("ok"), "inner")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


@q(
    "tpcds_own_zip_color_returns",
    f"""
    WITH ssales AS (
        SELECT c_name, s_name, split_part(p_name, ' ', 1) AS color,
               CAST(SUM({_NET_CENTS}) AS BIGINT) AS paid_cents
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND s_nationkey = c_nationkey
        GROUP BY 1, 2, 3
    ),
    st AS (
        SELECT CAST(SUM(paid_cents) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ssales
    )
    SELECT c_name, s_name, color, paid_cents
    FROM ssales, st
    WHERE paid_cents * n * 100 > tot * 5
    ORDER BY c_name, s_name, color
    LIMIT 100
    """,
)
def tpcds_own_zip_color_returns(spark, sf_dir):
    """TPC-DS q24: returns of items bought from a LOCAL store (upstream
    ``s_zip = ca_zip`` → supplier and customer share a nation), summed
    per (customer, store, item COLOR), keeping groups above 5% of the
    average group's paid value. The color dimension is genuine TPC-H:
    ``p_name`` is built from the TPC-H color-word list, so its first
    word plays upstream's ``i_color`` honestly. The correlated scalar
    (0.05·avg over the CTE) decorrelates into a one-row aggregate
    cross-joined in (broadcast, scale-free); comparison
    cross-multiplied into exact integers.
    [upstream: regression-test/suites/tpcds_sf1_p1 q24]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    net = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    ssales = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            "c_name",
            "s_name",
            F.split(F.col("p_name"), " ")[0].alias("color"),
        )
        .agg(F.sum(net).cast("long").alias("paid_cents"))
    )
    st = ssales.agg(
        F.sum("paid_cents").cast("long").alias("tot"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        ssales.crossJoin(F.broadcast(st))
        .filter(F.col("paid_cents") * F.col("n") * 100 > F.col("tot") * 5)
        .select("c_name", "s_name", "color", "paid_cents")
        .orderBy("c_name", "s_name", "color")
        .limit(100)
    )


@q(
    "tpcds_call_center_demographic_loss",
    f"""
    SELECT o_orderpriority AS call_center,
           CAST(SUM({_NET_CENTS}) AS BIGINT) AS returns_loss
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE l_returnflag = 'R'
      AND CAST(strftime(l_shipdate, '%Y') AS INT) = 1995
      AND CAST(strftime(l_shipdate, '%m') AS INT) = 11
      AND ((c_mktsegment = 'BUILDING'  AND c_acctbal < 0)
        OR (c_mktsegment = 'MACHINERY' AND c_acctbal >= 5000))
    GROUP BY 1
    ORDER BY returns_loss DESC, call_center
    """,
)
def tpcds_call_center_demographic_loss(spark, sf_dir):
    """TPC-DS q91: one month's return loss per call center for an
    OR-battery of two demographic profiles — call center → order
    priority (the service-channel dim the fixtures carry), and
    upstream's (marital, education) pairs → (market segment,
    balance band) pairs, the same synthetic-demographic convention the
    q35/q69 battery uses. The disjunction is a row filter ahead of one
    keyed aggregate; loss in exact integer cents.
    [upstream: regression-test/suites/tpcds_sf1_p1 q91]"""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    net = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    demo = (
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0)
    ) | ((F.col("c_mktsegment") == "MACHINERY") & (F.col("c_acctbal") >= 5000))
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.year("l_shipdate") == 1995)
            & (F.month("l_shipdate") == 11)
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.filter(demo), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(F.col("o_orderpriority").alias("call_center"))
        .agg(F.sum(net).cast("long").alias("returns_loss"))
        .orderBy(F.desc("returns_loss"), "call_center")
    )
