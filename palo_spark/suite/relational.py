"""Core relational operator coverage (SURVEY.md §2.1).

One query per Doris plan-node capability: HASH_JOIN in every join type
(incl. the null-aware anti join backing NOT IN), NESTED_LOOP_JOIN (theta /
cross), UNION / INTERSECT / EXCEPT (ALL and DISTINCT), REPEAT (grouping
sets / rollup / cube), SELECT (post-join filters, HAVING), ASSERT_NUM_ROWS
(scalar subqueries), TABLE_FUNCTION (lateral explode), EMPTY_SET,
DATA_GEN_SCAN (numbers generator), plus sort/limit/offset pagination.

Spark-first notes: semi/anti/null-aware joins are native join types (no
row-level emulation); grouping sets lower to Catalyst's Expand (exactly
Doris's REPEAT node); the numbers generator is ``spark.range`` (parallel,
no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table, register_views
from palo_spark.suite.util import dsum, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


# ---------------------------------------------------------------- joins


@q(
    "hash_join_inner",
    """
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'P'
    """,
)
def hash_join_inner(spark, sf_dir):
    """INNER equi-join. No broadcast hint: ``customer`` scales with SF, so
    the broadcast-vs-shuffle choice is left to AQE/autoBroadcastJoinThreshold
    (Doris HASH_JOIN picks its distribution mode the same way)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@q(
    "hash_join_left_outer",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
      ON c_custkey = o_custkey
    """,
)
def hash_join_left_outer(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@q(
    "hash_join_right_outer",
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) big
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def hash_join_right_outer(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey"), "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@q(
    "hash_join_full_outer",
    """
    WITH a AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust
               FROM customer WHERE c_acctbal > 8000 GROUP BY c_nationkey),
         b AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(a.k, b.k) AS nationkey, n_cust, n_supp
    FROM a FULL JOIN b ON a.k = b.k
    """,
)
def hash_join_full_outer(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"), "n_cust", "n_supp"
    )


@q(
    "hash_join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
)
def hash_join_left_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@q(
    "hash_join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def hash_join_left_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@q(
    "null_aware_anti_join",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderstatus <> 'P' THEN o_custkey END FROM orders
    )
    """,
)
def null_aware_anti_join(spark, sf_dir):
    """NOT IN over a nullable subquery — Doris NULL_AWARE_LEFT_ANTI_JOIN.

    The subquery produces NULLs, so per three-valued logic the result must
    be empty; a non-null-aware anti join would wrongly return rows.
    Catalyst plans this as NullAwareAntiJoin natively.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (
            SELECT CASE WHEN o_orderstatus <> 'P' THEN o_custkey END FROM orders
        )
        """
    )


@q(
    "not_in_subquery",
    """
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < 0)
    """,
)
def not_in_subquery(spark, sf_dir):
    """NOT IN with a non-null subquery — returns real rows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_nationkey, n_name FROM nation
        WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer WHERE c_acctbal < 0)
        """
    )


@q(
    "nested_loop_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def nested_loop_cross_join(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@q(
    "nested_loop_theta_join",
    """
    SELECT a.n_name AS n1, b.n_name AS n2
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def nested_loop_theta_join(spark, sf_dir):
    """Non-equi predicate alongside the equi key (range/theta join)."""
    a = load_table(spark, sf_dir, "nation").alias("a")
    b = load_table(spark, sf_dir, "nation").alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))


@q(
    "nested_loop_range_join",
    """
    WITH bands(band, d1, d2) AS (
        VALUES ('1996Q1', TIMESTAMP '1996-01-01', TIMESTAMP '1996-04-01'),
               ('1996Q2', TIMESTAMP '1996-04-01', TIMESTAMP '1996-07-01'),
               ('1996Q3', TIMESTAMP '1996-07-01', TIMESTAMP '1996-10-01'),
               ('1996Q4', TIMESTAMP '1996-10-01', TIMESTAMP '1997-01-01')
    )
    SELECT band, COUNT(*) AS n, {rev} AS revenue
    FROM lineitem JOIN bands ON l_shipdate >= d1 AND l_shipdate < d2
    GROUP BY band
    """.format(rev=o_dsum("l_extendedprice")),
)
def nested_loop_range_join(spark, sf_dir):
    """PURE non-equi join (SURVEY.md §2.1 NESTED_LOOP_JOIN, range form):
    a date-band frame joined on ``l_shipdate ∈ [d1, d2)`` with NO equi
    conjunct, so Catalyst MUST plan BroadcastNestedLoopJoin (asserted in
    tests/test_plans.py). Scale posture: the stream side is the big
    fact table scanned once; the broadcast side is the band frame, tiny
    by construction (calendar bands, not data) — each executor does a
    constant-size comparison per row, so this is scan-bound at 100 TB."""
    bands = spark.createDataFrame(
        [
            ("1996Q1", "1996-01-01", "1996-04-01"),
            ("1996Q2", "1996-04-01", "1996-07-01"),
            ("1996Q3", "1996-07-01", "1996-10-01"),
            ("1996Q4", "1996-10-01", "1997-01-01"),
        ],
        "band string, d1 string, d2 string",
    ).select(
        "band",
        F.col("d1").cast("timestamp").alias("d1"),
        F.col("d2").cast("timestamp").alias("d2"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(bands),
            (li["l_shipdate"] >= bands["d1"]) & (li["l_shipdate"] < bands["d2"]),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("revenue"))
    )


# ---------------------------------------------------------------- set ops


@q(
    "union_all",
    """
    SELECT c_nationkey AS nationkey, c_acctbal AS bal FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_nationkey, s_acctbal FROM supplier WHERE s_acctbal > 9000
    """,
)
def union_all(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("bal"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("bal"))
    )
    return c.unionAll(s)


@q(
    "union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def union_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@q(
    "intersect_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_distinct(spark, sf_dir):
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "intersect_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def intersect_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@q(
    "except_distinct",
    """
    SELECT n_nationkey AS k FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_distinct(spark, sf_dir):
    """EXCEPT DISTINCT — ``subtract`` is Spark's native set-difference
    (distinct semantics even when the left side carries duplicates)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return n.subtract(s)


@q(
    "except_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


# ------------------------------------------------- REPEAT: grouping sets


@q(
    "repeat_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           {o_dsum('l_quantity')} AS sum_qty, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def repeat_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir)

    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               {o_dsum('l_quantity')} AS sum_qty, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@q(
    "repeat_rollup",
    f"""
    SELECT l_returnflag, l_linestatus, {o_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def repeat_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price")
    )


@q(
    "repeat_cube",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def repeat_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


# ----------------------------------------------- subqueries / ASSERT_NUM_ROWS


@q(
    "scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 0.999 * (SELECT MAX(o_totalprice) FROM orders)
    """,
)
def scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (Doris ASSERT_NUM_ROWS guard)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 0.999 * (SELECT MAX(o_totalprice) FROM orders)
        """
    )


@q(
    "correlated_scalar_subquery",
    """
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c_acctbal > (SELECT 2.0 * AVG(c_acctbal) FROM customer i
                       WHERE i.c_nationkey = c.c_nationkey AND i.c_acctbal >= 0)
    """,
)
def correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar agg subquery → Catalyst decorrelates to a join.

    AVG over non-negative doubles per nation: both engines sum the same
    ~60 values; determinism verified empirically (groups are small). The
    comparison is a strict inequality against 2*avg, far from float noise.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT 2.0 * AVG(c_acctbal) FROM customer i
                           WHERE i.c_nationkey = c.c_nationkey AND i.c_acctbal >= 0)
        """
    )


@q(
    "in_subquery",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'P'
    """,
)
def in_subquery(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'P'
        """
    )


@q(
    "having_filter",
    f"""
    SELECT c_nationkey, COUNT(*) AS n_cust, {o_dsum('c_acctbal')} AS total_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 50
    """,
)
def having_filter(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
        .filter(F.col("n_cust") > 50)
    )


# ------------------------------------------------- TABLE_FUNCTION / lateral


@q(
    "table_function_explode",
    """
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 25
    """,
)
def table_function_explode(spark, sf_dir):
    """LATERAL VIEW explode(split(...)) — Doris TABLE_FUNCTION node."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(25)
    )


@q(
    "table_function_posexplode",
    """
    SELECT doc_id, CAST(p.pos AS INT) AS pos,
           string_split(text, ' ')[CAST(p.pos AS INT) + 1] AS word
    FROM documents, (SELECT range AS pos FROM range(3)) p
    WHERE doc_id < 5 AND len(string_split(text, ' ')) > p.pos
    ORDER BY doc_id, pos
    """,
)
def table_function_posexplode(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        d.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .filter(F.col("pos") < 3)
        .orderBy("doc_id", "pos")
    )


# --------------------------------------------- EMPTY_SET / DATA_GEN / misc


@q(
    "empty_set_const_false",
    """
    SELECT o_orderkey, o_totalprice FROM orders WHERE 1 = 0
    """,
)
def empty_set_const_false(spark, sf_dir):
    """Constant-false pruning → Catalyst LocalRelation <empty> (EMPTY_SET)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.lit(False)).select("o_orderkey", "o_totalprice")


@q(
    "datagen_numbers",
    """
    SELECT CAST(SUM(CASE WHEN range % 7 = 0 THEN range ELSE 0 END) AS BIGINT) AS s,
           COUNT(*) AS n
    FROM range(100000)
    """,
)
def datagen_numbers(spark, sf_dir):
    """numbers(n) generator — spark.range (distributed, no driver loop)."""
    return spark.range(100000).agg(
        F.sum(F.when(F.col("id") % 7 == 0, F.col("id")).otherwise(0)).alias("s"),
        F.count("*").alias("n"),
    )


@q(
    "sort_limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def sort_limit_offset(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(20)
    )


@q(
    "distinct_projection",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_projection(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@q(
    "case_when_projection",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           IF(o_orderstatus = 'F', 1, 0) AS is_final,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status2
    FROM orders
    """,
)
def case_when_projection(spark, sf_dir):
    """Conditional scalar functions: CASE WHEN / IF / NULLIF / COALESCE."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status2"
        ),
    )


@q(
    "values_inline_table",
    """
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag) WHERE id >= 2
    """,
)
def values_inline_table(spark, sf_dir):
    """Inline VALUES relation (UNION const-expr lists in Doris)."""
    return spark.sql(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag) WHERE id >= 2"
    )


@q(
    "relational_pivot",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def relational_pivot(spark, sf_dir):
    """PIVOT: order counts by priority × status. Spark's native
    relational pivot (one shuffle, statuses become columns) against the
    conditional-aggregation form Doris users write (CASE/FILTER)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
            F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
            F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
        )
    )


@q(
    "table_function_explode_variants",
    """
    WITH e AS (SELECT event_id, props FROM events WHERE event_id < 50)
    SELECT event_id, part, jn
    FROM e,
         unnest(string_split('a,b,c', ',')) AS t1(part),
         unnest([1, 2]) AS t2(jn)
    ORDER BY event_id, part, jn
    """,
)
def table_function_explode_variants(spark, sf_dir):
    """Doris explode_split + explode_json_array_int in one LATERAL VIEW
    chain (generators compose as successive native explodes)."""
    from palo_spark.functions import explode_json_array_int, explode_split

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    return (
        e.select("event_id", explode_split(F.lit("a,b,c"), ",").alias("part"))
        .select("event_id", "part", explode_json_array_int(F.lit("[1,2]")).alias("jn"))
        .orderBy("event_id", "part", "jn")
    )


@q(
    "events_asof_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, MAX(event_id) AS click_id
               FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, c.click_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join (point-in-time): each purchase picks the latest click
    at or before it per user — the temporal-correctness join every
    feature-store / trading workload needs. Oracle is DuckDB's native
    ASOF JOIN; the Spark side is the distributed merge in
    ``operators/temporal.py`` (ONE key shuffle, no candidate pairs)."""
    from palo_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        "click_id",
        F.expr("timestampdiff(MICROSECOND, matched_ts, ts)")
        .cast("long")
        .alias("gap_us"),
    ).orderBy("event_id")


@q(
    "events_asof_forward_tolerance",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'signup'),
         e AS (SELECT user_id, ts, MAX(event_id) AS err_id
               FROM events WHERE event_type = 'error' GROUP BY user_id, ts),
         m AS (SELECT p.event_id, p.user_id, e.err_id,
                      CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
               FROM p ASOF LEFT JOIN e
                 ON p.user_id = e.user_id AND p.ts <= e.ts)
    SELECT event_id, user_id,
           CASE WHEN gap_us <= 86400000000 THEN err_id END AS err_id,
           CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
    FROM m ORDER BY event_id
    """,
)
def events_asof_forward_tolerance(spark, sf_dir):
    """Forward as-of with a 24h tolerance: first error AFTER each signup
    per user, nulled when farther than a day — pandas
    ``merge_asof(direction='forward', tolerance=...)`` semantics."""
    from palo_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
    )
    out = asof_join(
        p, e, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward", tolerance=86400,
    )
    return out.select(
        "event_id",
        "user_id",
        "err_id",
        F.expr("timestampdiff(MICROSECOND, ts, matched_ts)")
        .cast("long")
        .alias("gap_us"),
    ).orderBy("event_id")
