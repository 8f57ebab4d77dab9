"""Sketch-column coverage (SURVEY.md §1.4, §2.4): BITMAP exact-distinct
sets and HLL cardinality as mergeable BinaryType values.

Bitmaps are EXACT, so every bitmap query is oracle-checked against
plain COUNT(DISTINCT)/set-op SQL. HLL estimates are engine-specific
(hash-dependent) but deterministic, so the queries assert their own
error bound and — the real sketch contract — that the two-phase merge
(partial sketches → register max) equals the single-phase sketch
exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.functions.sketches import (
    bitmap_and,
    bitmap_andnot,
    bitmap_count,
    bitmap_or,
    bitmap_union_of_bitmaps,
    bitmap_union_of_values,
    hll_cardinality,
    hll_union_agg,
    hll_union_agg_values,
    quantile_percent,
    quantile_state_of_values,
    quantile_union,
)
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


@q(
    "sketch_bitmap_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS ndv
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_bitmap_distinct(spark, sf_dir):
    """BITMAP_UNION_COUNT(TO_BITMAP(c)): exact distinct via bitmap —
    must equal COUNT(DISTINCT). Routed through the DEFAULT convenience
    API :func:`bitmap_distinct_count`, which salts into the two-level
    partial/merge shape (r5: the salted form is now the default — the
    plain GROUPED_AGG path has no map-side combine and funnels hot keys
    through one worker; plan pinned two-level by
    tests/test_plans.py::test_bitmap_distinct_default_is_two_level)."""
    from palo_spark.functions.sketches import bitmap_distinct_count

    li = load_table(spark, sf_dir, "lineitem")
    return bitmap_distinct_count(li, "l_returnflag", "l_suppkey", out_col="ndv")


@q(
    "sketch_bitmap_distinct_salted",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS ndv
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_bitmap_distinct_salted(spark, sf_dir):
    """The skew-safe two-level form (``grouped_bitmap_union_values``):
    partial bitmaps per (key, hash(v) % 32) then bitmap merge per key —
    the REQUIRED form at 100 TB, where a hot key would otherwise funnel
    all its raw values through one Python worker. Must equal
    COUNT(DISTINCT) exactly."""
    from palo_spark.functions.sketches import grouped_bitmap_union_values

    li = load_table(spark, sf_dir, "lineitem")
    bm = grouped_bitmap_union_values(li, "l_returnflag", "l_suppkey", out_col="bm")
    return bm.select("l_returnflag", bitmap_count("bm").alias("ndv"))


@q(
    "sketch_bitmap_merge_two_phase",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS ndv
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_bitmap_merge_two_phase(spark, sf_dir):
    """The mergeable-column path: partial bitmaps per (flag, status) —
    what an AGGREGATE-KEY table stores — merged up to flag level must
    equal the direct distinct count. This is Doris compaction-merge
    semantics for sketch columns."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        bitmap_union_of_values("l_suppkey").alias("bm")
    )
    merged = partial.groupBy("l_returnflag").agg(
        bitmap_union_of_bitmaps("bm").alias("bm")
    )
    return merged.select("l_returnflag", bitmap_count("bm").alias("ndv"))


@q(
    "sketch_bitmap_ops",
    """
    WITH a AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
    r AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM r)) AS BIGINT) AS n_and,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM r)) AS BIGINT) AS n_or,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM r)) AS BIGINT) AS n_andnot
    """,
)
def sketch_bitmap_ops(spark, sf_dir):
    """Bitmap set algebra (AND / OR / ANDNOT) against SQL set-op
    oracles: suppliers shipping returned vs accepted lines."""
    li = load_table(spark, sf_dir, "lineitem")
    bm = (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(bitmap_union_of_values("l_suppkey").alias("bm"))
    )
    a = bm.filter(F.col("l_returnflag") == "A").select(F.col("bm").alias("bm_a"))
    r = bm.filter(F.col("l_returnflag") == "R").select(F.col("bm").alias("bm_r"))
    both = a.crossJoin(r)
    return both.select(
        bitmap_count(bitmap_and("bm_a", "bm_r")).alias("n_and"),
        bitmap_count(bitmap_or("bm_a", "bm_r")).alias("n_or"),
        bitmap_count(bitmap_andnot("bm_a", "bm_r")).alias("n_andnot"),
    )


@q(
    "sketch_quantile_union",
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok, TRUE AS merged_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sketch_quantile_union(spark, sf_dir):
    """QUANTILE_STATE / QUANTILE_UNION / QUANTILE_PERCENT: mergeable
    t-digest-lite quantile columns. The sketch can't be replayed
    cross-engine; its rank-error CONTRACT can: the estimated p50/p95 of
    l_extendedprice must sit within ±3% rank of the target (the sketch
    guarantees ~2/256), both for the directly-built state and for the
    two-phase merge (partials per (flag, status) → QUANTILE_UNION) —
    the AGGREGATE-KEY-column load path."""
    li = load_table(spark, sf_dir, "lineitem")
    direct = li.groupBy("l_returnflag").agg(
        quantile_state_of_values("l_extendedprice").alias("qs")
    )
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        quantile_state_of_values("l_extendedprice").alias("qs")
    )
    merged = partial.groupBy("l_returnflag").agg(quantile_union("qs").alias("qs_m"))
    est = (
        direct.join(merged, "l_returnflag")
        .select(
            "l_returnflag",
            quantile_percent("qs", 0.5).alias("e50"),
            quantile_percent("qs", 0.95).alias("e95"),
            quantile_percent("qs_m", 0.5).alias("e50_m"),
        )
    )
    # exact rank of each estimate, via one broadcast join back to the data
    ranks = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.avg((F.col("l_extendedprice") <= F.col("e50")).cast("double")).alias("r50"),
            F.avg((F.col("l_extendedprice") <= F.col("e95")).cast("double")).alias("r95"),
            F.avg((F.col("l_extendedprice") <= F.col("e50_m")).cast("double")).alias("r50_m"),
        )
    )
    return ranks.select(
        "l_returnflag",
        "n",
        F.col("r50").between(0.47, 0.53).alias("p50_rank_ok"),
        F.col("r95").between(0.92, 0.98).alias("p95_rank_ok"),
        F.col("r50_m").between(0.47, 0.53).alias("merged_rank_ok"),
    )


@q(
    "sketch_hll_ndv",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_ndv,
           TRUE AS hll_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_hll_ndv(spark, sf_dir):
    """HLL_UNION_AGG + HLL_CARDINALITY: p=12 sketch (rse ~1.6%) must
    land within 5% of the exact NDV; the sketch itself can't be
    replayed cross-engine, the bound can."""
    o = load_table(spark, sf_dir, "orders")
    hll = o.groupBy("o_orderstatus").agg(
        hll_union_agg_values("o_custkey").alias("hll")
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_ndv")
    )
    return (
        hll.join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_ndv",
            (
                F.abs(hll_cardinality("hll") - F.col("exact_ndv"))
                <= 0.05 * F.col("exact_ndv")
            ).alias("hll_within_5pct"),
        )
    )


@q(
    "sketch_hll_merge_two_phase",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_ndv,
           TRUE AS merge_equals_direct
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_hll_merge_two_phase(spark, sf_dir):
    """The HLL merge contract: partial sketches per (status, priority)
    merged by register-max must equal the directly-built sketch EXACTLY
    (register-for-register) — merge is associative/commutative, so the
    estimate is load-order-independent. This is what makes HLL a legal
    AGGREGATE-KEY column type."""
    o = load_table(spark, sf_dir, "orders")
    partial = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        hll_union_agg_values("o_custkey").alias("hll")
    )
    merged = partial.groupBy("o_orderstatus").agg(hll_union_agg("hll").alias("hll_m"))
    # pandas UDAFs can't mix with builtin aggregates in one agg() —
    # build the direct sketch and the exact count separately and join
    direct = o.groupBy("o_orderstatus").agg(
        hll_union_agg_values("o_custkey").alias("hll_d")
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_ndv")
    )
    return (
        merged.join(direct, "o_orderstatus")
        .join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_ndv",
            (
                hll_cardinality("hll_m") == hll_cardinality("hll_d")
            ).alias("merge_equals_direct"),
        )
    )


@q(
    "sketch_explode_bitmap",
    """
    SELECT l_returnflag, l_suppkey AS supp
    FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)
    """,
)
def sketch_explode_bitmap(spark, sf_dir):
    """Doris ``EXPLODE_BITMAP`` table function: bitmap column back to
    rows (bitmap_to_array → explode) — the round-trip proves the bitmap
    is a faithful distinct set."""
    from palo_spark.functions.sketches import bitmap_to_array

    li = load_table(spark, sf_dir, "lineitem")
    bm = li.groupBy("l_returnflag").agg(
        bitmap_union_of_values("l_suppkey").alias("bm")
    )
    return bm.select(
        "l_returnflag", F.explode(bitmap_to_array("bm")).alias("supp")
    )


@q(
    "sketch_bitmap_intersect_agg",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_all_flags
    FROM (
        SELECT l_suppkey FROM lineitem
        GROUP BY l_suppkey HAVING COUNT(DISTINCT l_returnflag) = 3
    )
    """,
)
def sketch_bitmap_intersect_agg(spark, sf_dir):
    """BITMAP_INTERSECT (orthogonal-bitmap audience pattern): suppliers
    present in ALL THREE return flags = AND-merge of the per-flag
    supplier bitmaps. Two-level: one bitmap per flag (3 sketches), then
    a 3-row intersect — raw rows never cross the Python boundary twice."""
    from palo_spark.functions.sketches import bitmap_intersect

    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        bitmap_union_of_values("l_suppkey").alias("bm")
    )
    inter = per_flag.agg(bitmap_intersect("bm").alias("bm_all"))
    return inter.select(bitmap_count("bm_all").alias("n_all_flags"))


@q(
    "sketch_orthogonal_bitmap_expr",
    """
    WITH t AS (
        SELECT l_suppkey,
               bool_or(l_returnflag = 'A') AS a,
               bool_or(l_returnflag = 'N') AS n,
               bool_or(l_returnflag = 'R') AS r
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(COUNT(*) FILTER (WHERE (a AND n) OR (a AND NOT r)) AS BIGINT)
        AS result_count
    FROM t
    """,
)
def sketch_orthogonal_bitmap_expr(spark, sf_dir):
    """ORTHOGONAL_BITMAP_EXPR_CALCULATE_COUNT: audience algebra
    '(A&N)|(A-R)' over per-flag supplier bitmaps — one two-phase bitmap
    agg per tag, then set algebra over three single-row sketches.
    Oracle = the equivalent boolean membership SQL."""
    from palo_spark.functions.sketches import orthogonal_bitmap_expr_calculate

    li = load_table(spark, sf_dir, "lineitem")
    return orthogonal_bitmap_expr_calculate(
        li, "l_returnflag", "l_suppkey", "(A&N)|(A-R)", count_only=True
    )


@q(
    "sketch_orthogonal_union_count",
    """
    SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n
    FROM lineitem
    """,
)
def sketch_orthogonal_union_count(spark, sf_dir):
    """ORTHOGONAL_BITMAP_UNION_COUNT: per-flag partial bitmaps (the
    orthogonal partition) union-merged and counted — must equal the
    plain COUNT(DISTINCT)."""
    from palo_spark.functions.sketches import orthogonal_bitmap_union_count

    li = load_table(spark, sf_dir, "lineitem")
    part = li.groupBy("l_returnflag").agg(
        bitmap_union_of_values("l_suppkey").alias("bm")
    )
    return part.agg(orthogonal_bitmap_union_count(F.col("bm")).alias("n"))


@q(
    "sketch_bitmap_hash_distinct",
    """
    SELECT o_orderstatus, CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_bitmap_hash_distinct(spark, sf_dir):
    """BITMAP_HASH over a STRING column: hash-to-bitmap extends exact
    bitmap distinct to non-integer inputs (collision probability ~n²/2³²
    — negligible at this cardinality; Doris's bitmap_hash has the same
    property)."""
    from palo_spark.functions.sketches import bitmap_hash, bitmap_union_of_bitmaps

    o = load_table(spark, sf_dir, "orders")
    per = o.select("o_orderstatus", bitmap_hash(F.col("o_orderpriority")).alias("bm"))
    bm = per.groupBy("o_orderstatus").agg(bitmap_union_of_bitmaps("bm").alias("u"))
    return bm.select("o_orderstatus", bitmap_count("u").alias("ndv"))


@q(
    "sketch_bitmap_subset_ops",
    """
    WITH s AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
    ordered AS (SELECT l_suppkey FROM s ORDER BY l_suppkey)
    SELECT COALESCE(array_to_string((SELECT list(l_suppkey ORDER BY l_suppkey)
              FROM (SELECT l_suppkey FROM ordered LIMIT 5)), ','), '') AS first5,
           COALESCE(array_to_string((SELECT list(l_suppkey ORDER BY l_suppkey)
              FROM (SELECT l_suppkey FROM ordered WHERE l_suppkey >= 50 LIMIT 5)),
              ','), '') AS from50_5,
           COALESCE(array_to_string((SELECT list(l_suppkey ORDER BY l_suppkey)
              FROM ordered WHERE l_suppkey >= 10 AND l_suppkey < 40),
              ','), '') AS range_10_40
    """,
)
def sketch_bitmap_subset_ops(spark, sf_dir):
    """SUB_BITMAP / BITMAP_SUBSET_LIMIT / BITMAP_SUBSET_IN_RANGE —
    positional and range slicing of an ordered bitmap, materialized via
    bitmap_to_array and serialized to CSV strings (the driver's pandas
    canonicalizer cannot hash list cells)."""
    from palo_spark.functions.sketches import (
        bitmap_subset_in_range,
        bitmap_subset_limit,
        bitmap_to_array,
        sub_bitmap,
    )

    li = load_table(spark, sf_dir, "lineitem")
    bm = (
        li.filter(F.col("l_returnflag") == "A")
        .agg(bitmap_union_of_values("l_suppkey").alias("bm"))
    )
    def _csv(c):
        return F.array_join(c.cast("array<string>"), ",")

    return bm.select(
        _csv(bitmap_to_array(sub_bitmap(F.col("bm"), 0, 5))).alias("first5"),
        _csv(bitmap_to_array(bitmap_subset_limit(F.col("bm"), 50, 5))).alias("from50_5"),
        _csv(bitmap_to_array(bitmap_subset_in_range(F.col("bm"), 10, 40))).alias(
            "range_10_40"
        ),
    )
