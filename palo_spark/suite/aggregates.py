"""AGGREGATION function tail (SURVEY.md §2.4).

Doris's aggregate surface beyond COUNT/SUM/MIN/MAX/AVG
(``be/src/vec/aggregate_functions/`` upstream): MIN_BY/MAX_BY, ANY_VALUE,
SUM0, stddev/variance family, CORR/COVAR, NDV/APPROX_COUNT_DISTINCT,
exact + approximate percentiles, MEDIAN, TOPN, GROUP_CONCAT,
COLLECT_LIST/SET, HISTOGRAM. All are native ``pyspark.sql.functions`` —
JVM-side, two-phase (partial/final) hash aggregation, no UDFs.

Oracle-comparison techniques used here:
- ``collect_list``/``group_concat`` are wrapped in ``array_sort`` /
  ``ORDER BY`` so multiset results are order-canonical in both engines.
- stddev/corr/covar are rounded to 4 decimals: both engines merge partial
  moments in nondeterministic partition order, so the last ulps differ.
- approximate functions (HLL NDV, t-digest percentile) cannot hash-match a
  different engine's sketch; instead the Spark side *checks its own
  accuracy against the exact value* and emits a boolean the oracle
  trivially mirrors (``TRUE``) — the comparison then verifies the sketch
  is within its documented error bound, which is the actual contract.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)


@q(
    "agg_min_max_by_any_value",
    """
    SELECT c_nationkey,
           MAX_BY(c_name, c_custkey) AS newest_cust,
           MIN_BY(c_name, c_custkey) AS oldest_cust,
           ANY_VALUE(c_nationkey % 7) AS any_mod,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_min_max_by_any_value(spark, sf_dir):
    """MIN_BY/MAX_BY (argmin/argmax) + ANY_VALUE. The by-key (c_custkey)
    is unique, and any_value's argument is constant per group, so all
    three are deterministic."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_custkey").alias("newest_cust"),
        F.min_by("c_name", "c_custkey").alias("oldest_cust"),
        F.any_value(F.col("c_nationkey") % 7).alias("any_mod"),
        F.count("*").alias("n"),
    )


@q(
    "agg_sum0_empty",
    """
    SELECT COALESCE(SUM(o_totalprice), 0.0) AS sum0_price,
           COUNT(*) AS n
    FROM orders WHERE o_totalprice < 0
    """,
)
def agg_sum0_empty(spark, sf_dir):
    """Doris SUM0: returns 0 instead of NULL on empty input."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") < 0)
    return o.agg(
        F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("sum0_price"),
        F.count("*").alias("n"),
    )


@q(
    "agg_stddev_variance",
    """
    SELECT c_nationkey,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_samp,
           ROUND(STDDEV_POP(c_acctbal), 4)  AS sd_pop,
           ROUND(VAR_SAMP(c_acctbal), 4)    AS v_samp,
           ROUND(VAR_POP(c_acctbal), 4)     AS v_pop
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_stddev_variance(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("c_acctbal"), 4).alias("sd_pop"),
        F.round(F.var_samp("c_acctbal"), 4).alias("v_samp"),
        F.round(F.var_pop("c_acctbal"), 4).alias("v_pop"),
    )


@q(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_samp,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 2)  AS cov_pop
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_samp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_pop"),
    )


@q(
    "agg_ndv_approx_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS exact_ndv,
           TRUE AS ndv_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_ndv_approx_count_distinct(spark, sf_dir):
    """Doris NDV/APPROX_COUNT_DISTINCT (HLL-based). A sketch can't
    hash-match another engine, so the query asserts its own error bound:
    HLL++ at default rsd=0.05 must land within 5% of the exact count. The
    oracle mirrors the exact count and the (expected-true) bound check."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("exact_ndv"),
            F.approx_count_distinct("l_suppkey").alias("approx_ndv"),
        )
        .select(
            "l_returnflag",
            "exact_ndv",
            (
                F.abs(F.col("approx_ndv") - F.col("exact_ndv"))
                <= 0.05 * F.col("exact_ndv")
            ).alias("ndv_within_5pct"),
        )
    )


@q(
    "agg_percentile_exact",
    """
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS p25,
           ROUND(QUANTILE_CONT(l_quantity, 0.50), 6) AS p50,
           ROUND(QUANTILE_CONT(l_quantity, 0.75), 6) AS p75,
           ROUND(MEDIAN(l_quantity), 6)              AS med
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark, sf_dir):
    """Exact PERCENTILE + MEDIAN (linear interpolation in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 6).alias("p25"),
        F.round(F.percentile("l_quantity", 0.50), 6).alias("p50"),
        F.round(F.percentile("l_quantity", 0.75), 6).alias("p75"),
        F.round(F.median("l_quantity"), 6).alias("med"),
    )


@q(
    "agg_percentile_approx",
    """
    SELECT l_returnflag, TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_approx(spark, sf_dir):
    """PERCENTILE_APPROX self-checked against the exact percentile (same
    rank-error contract Doris documents for its t-digest percentiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
            F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        )
        .select(
            "l_returnflag",
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= 0.02 * F.col("exact_p50")
            ).alias("approx_within_2pct"),
        )
    )


@q(
    "agg_group_concat",
    """
    SELECT c_nationkey,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_group_concat(spark, sf_dir):
    """GROUP_CONCAT(DISTINCT ... ORDER BY ...) — sorted-set join, the
    order-canonical form (Doris group_concat supports ORDER BY)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments")
    )


@q(
    "agg_collect_list_set",
    """
    SELECT n_regionkey,
           array_to_string(LIST_SORT(LIST(n_name)), ',')          AS names,
           array_to_string(LIST_SORT(LIST(DISTINCT n_name)), ',') AS names_set,
           CAST(LEN(LIST(n_name)) AS INT)   AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_list_set(spark, sf_dir):
    """COLLECT_LIST / COLLECT_SET (ARRAY_AGG), order-canonicalized and
    CSV-serialized (driver's canonicalizer cannot hash list cells)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("names_set"),
        F.size(F.collect_list("n_name")).alias("n"),
    )


@q(
    "agg_histogram_buckets",
    """
    SELECT CAST(LEAST(FLOOR(o_totalprice / 50000) + 1, 13) AS INT) AS bucket,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def agg_histogram_buckets(spark, sf_dir):
    """HISTOGRAM via width_bucket(x, 0, 650000, 13): equi-width bucket
    counts (the oracle mirrors width_bucket's closed-form for in-range
    values since DuckDB lacks the function)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(650000.0), F.lit(13))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@q(
    "agg_topn_values",
    """
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    LIMIT 3
    """,
)
def agg_topn_values(spark, sf_dir):
    """Doris TOPN(c, k) — approximate most-frequent values; v1 computes it
    exactly as sub-agg + TopN (SURVEY §2.4 decision). At 100 TB the
    two-phase hash agg partials keep this one shuffle of |distinct| rows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "event_type")
        .limit(3)
    )


@q(
    "agg_group_bit_ops",
    """
    SELECT l_returnflag,
           BIT_AND(l_linenumber) AS band,
           BIT_OR(l_linenumber)  AS bor,
           BIT_XOR(l_linenumber) AS bxor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_group_bit_ops(spark, sf_dir):
    """Doris GROUP_BIT_AND / GROUP_BIT_OR / GROUP_BIT_XOR — native Spark
    bit aggregates (two-phase, whole-stage codegen)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("band"),
        F.bit_or("l_linenumber").alias("bor"),
        F.bit_xor("l_linenumber").alias("bxor"),
    )


@q(
    "agg_percentile_array",
    """
    WITH g AS (
        SELECT l_returnflag,
               QUANTILE_CONT(l_quantity, [0.1, 0.5, 0.9]) AS qs
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(unnest(generate_series(1, len(qs))) - 1 AS INT) AS pos,
           ROUND(unnest(qs), 6) AS pct
    FROM g
    """,
)
def agg_percentile_array(spark, sf_dir):
    """Doris ``PERCENTILE_ARRAY(c, [p...])`` — one pass, many exact
    quantiles (linear interpolation in both engines). Exploded to
    (pos, pct) rows so the doubles compare as scalars (the driver's
    canonicalizer cannot hash list cells, and double→string formatting
    is not cross-engine stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_quantity", F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
            ).alias("qs")
        )
        .select(
            "l_returnflag",
            F.posexplode(F.transform(F.col("qs"), lambda x: F.round(x, 6))).alias(
                "pos", "pct"
            ),
        )
    )


@q(
    "agg_topn_weighted",
    """
    WITH w AS (
        SELECT user_id, event_type,
               SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))) AS wt
        FROM events WHERE user_id < 30 GROUP BY user_id, event_type
    ), r AS (
        SELECT user_id, event_type, wt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY wt DESC, event_type) AS rn
        FROM w
    )
    SELECT user_id, array_to_string(list(event_type ORDER BY rn), ',') AS top_types
    FROM r WHERE rn <= 2 GROUP BY user_id
    """,
)
def agg_topn_weighted(spark, sf_dir):
    """Doris ``TOPN_WEIGHTED(col, weight, k)`` — top-k values per group
    by SUMMED weight (exact decimal weights so cross-engine ordering is
    deterministic): sub-agg → WindowGroupLimit → sort_array collect.
    Two keyed shuffles, no driver-side vocabulary."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        e.groupBy("user_id", "event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 1e6).cast("decimal(38,0)")).alias("wt")
        )
    )
    win = Window.partitionBy("user_id").orderBy(F.desc("wt"), F.asc("event_type"))
    return (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ",",
            ).alias("top_types")
        )
    )


@q(
    "agg_skew_kurt",
    """
    WITH mu AS (
        SELECT c_nationkey AS k,
               CAST(SUM(CAST(FLOOR(c_acctbal * 1000000.0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000.0 / COUNT(*) AS m
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey,
           FLOOR(
             ((CAST(SUM(CAST(FLOOR(POWER(c_acctbal - m, 3) * 1000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000.0 / COUNT(*))
              / POWER(CAST(SUM(CAST(FLOOR(POWER(c_acctbal - m, 2) * 1000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000.0 / COUNT(*), 1.5)) * 1e4
           ) / 1e4 AS skew_pop,
           FLOOR(
             ((CAST(SUM(CAST(FLOOR(POWER(c_acctbal - m, 4) * 1000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000.0 / COUNT(*))
              / POWER(CAST(SUM(CAST(FLOOR(POWER(c_acctbal - m, 2) * 1000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000.0 / COUNT(*), 2) - 3) * 1e4
           ) / 1e4 AS kurt_pop
    FROM customer JOIN mu ON c_nationkey = k
    GROUP BY c_nationkey
    """,
)
def agg_skew_kurt(spark, sf_dir):
    """Doris SKEW/KURT (population third/fourth standardized moments).
    The engine's native single-pass ``skewness``/``kurtosis`` merge
    partial moments in partition order and, on tiny groups, drift >1e-4
    from any fixed-order reference (caught by the sf0.001 sweep) — so
    the parity entry computes the textbook two-pass formula on the
    suite's exact decimal grid: the per-group mean and every central
    power sum are order-independent, making both engines bit-identical
    before the final quantize. The native one-pass forms stay available
    as ``functions.skew/kurt`` and are pinned against these two-pass
    values at test scale in tests/test_functions.py."""
    c = load_table(spark, sf_dir, "customer")
    grp = c.groupBy("c_nationkey").agg(
        (dsum("c_acctbal") / F.count("*")).alias("m")
    )
    j = c.join(grp, "c_nationkey")
    d = F.col("c_acctbal") - F.col("m")

    def cavg(p, scale=3):
        mlt = float(10**scale)
        return (
            F.sum(F.floor(F.pow(d, p) * mlt).cast("decimal(38,0)")).cast("double")
            / mlt
            / F.count("*")
        )

    return j.groupBy("c_nationkey").agg(
        (F.floor(cavg(3) / F.pow(cavg(2), 1.5) * 1e4) / 1e4).alias("skew_pop"),
        (F.floor((cavg(4) / F.pow(cavg(2), 2) - 3) * 1e4) / 1e4).alias("kurt_pop"),
    )


@q(
    "agg_avg_weighted_regr",
    """
    SELECT l_returnflag,
           FLOOR((SUM(l_extendedprice * l_quantity) / SUM(l_quantity)) * 1e4) / 1e4
               AS wavg_price,
           FLOOR(REGR_SLOPE(l_extendedprice, l_quantity) * 1e4) / 1e4 AS slope,
           FLOOR(REGR_INTERCEPT(l_extendedprice, l_quantity) * 1e4) / 1e4 AS icept,
           FLOOR(REGR_R2(l_extendedprice, l_quantity) * 1e6) / 1e6 AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_avg_weighted_regr(spark, sf_dir):
    """Doris AVG_WEIGHTED + SQL2016 REGR_SLOPE/INTERCEPT/R2 — all
    distributive two-phase JVM aggregates (sum-of-products / covar
    partials merged map-side). Floor-quantized: double accumulation
    order differs across engines."""
    from palo_spark.functions import avg_weighted, regr_intercept, regr_r2, regr_slope

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.floor(avg_weighted("l_extendedprice", "l_quantity") * 1e4) / 1e4).alias(
            "wavg_price"
        ),
        (F.floor(regr_slope("l_extendedprice", "l_quantity") * 1e4) / 1e4).alias("slope"),
        (F.floor(regr_intercept("l_extendedprice", "l_quantity") * 1e4) / 1e4).alias(
            "icept"
        ),
        (F.floor(regr_r2("l_extendedprice", "l_quantity") * 1e6) / 1e6).alias("r2"),
    )


@q(
    "agg_map_collect",
    """
    WITH seg AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey,
           array_to_string(LIST(c_mktsegment ORDER BY c_mktsegment), ',') AS seg_keys,
           array_to_string(LIST(cnt ORDER BY c_mktsegment), ',') AS seg_counts
    FROM seg GROUP BY c_nationkey
    """,
)
def agg_map_collect(spark, sf_dir):
    """Doris MAP_AGG: per-nation map of market segment → customer count
    (two-level agg: count, then map_agg). The map is presented as
    sorted key/value arrays because maps have no canonical order to
    hash across engines — map_agg itself sorts entries, so keys/values
    are aligned and deterministic."""
    from palo_spark.functions import map_agg

    c = load_table(spark, sf_dir, "customer")
    seg = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("cnt"))
    m = seg.groupBy("c_nationkey").agg(
        map_agg("c_mktsegment", "cnt").alias("m")
    )
    return m.select(
        "c_nationkey",
        F.array_join(F.map_keys("m"), ",").alias("seg_keys"),
        F.array_join(F.map_values("m").cast("array<string>"), ",").alias("seg_counts"),
    )


@q(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_part,
           COUNT(DISTINCT (l_partkey, l_suppkey)) AS nd_pair,
           SUM(DISTINCT l_quantity) AS sum_dq
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Doris MULTI_DISTINCT_COUNT / MULTI_DISTINCT_SUM — Spark plans
    these as Expand + two-phase aggregation (per-key distinct sets are
    never materialized on one node). Distinct quantities are integral
    doubles 1..50, so SUM(DISTINCT) is exact without quantization."""
    from palo_spark.functions import multi_distinct_count, multi_distinct_sum

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        multi_distinct_count("l_partkey").alias("nd_part"),
        multi_distinct_count("l_partkey", "l_suppkey").alias("nd_pair"),
        multi_distinct_sum("l_quantity").alias("sum_dq"),
    )


@q(
    "agg_group_array_intersect",
    """
    WITH n AS (
        SELECT p_brand, COUNT(*) AS nr FROM part GROUP BY p_brand
    ),
    w AS (
        SELECT p_brand,
               UNNEST(LIST_DISTINCT(STRING_SPLIT(p_name, ' '))) AS word
        FROM part
    ),
    c AS (
        SELECT p_brand, word, COUNT(*) AS cnt
        FROM w GROUP BY p_brand, word
    ),
    common AS (
        SELECT c.p_brand, LIST(c.word ORDER BY c.word) AS words
        FROM c JOIN n USING (p_brand)
        WHERE c.cnt = n.nr
        GROUP BY c.p_brand
    )
    SELECT n.p_brand,
           COALESCE(array_to_string(common.words, ','), '') AS common_words
    FROM n LEFT JOIN common USING (p_brand)
    """,
)
def agg_group_array_intersect(spark, sf_dir):
    """Doris GROUP_ARRAY_INTERSECT: words common to every part name of
    a brand. Spark side is a native fold of array_intersect over the
    collected arrays; result sorted (set semantics). Mostly-empty
    results at this SF exercise the empty-array path."""
    from palo_spark.functions import group_array_intersect

    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_brand", F.split("p_name", " ").alias("words"))
        .groupBy("p_brand")
        .agg(
            F.array_join(group_array_intersect("words"), ",").alias("common_words")
        )
    )


@q(
    "agg_name_surface",
    """
    WITH pool AS (
        SELECT c_mktsegment, c_nationkey, c_acctbal FROM customer
        WHERE c_custkey <= 600
    )
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT CAST(c_nationkey AS VARCHAR))),
                           '|') AS nations,
           CAST(length(c_mktsegment) AS INT) AS seg_len,
           COALESCE(SUM(CASE WHEN c_acctbal > 99999999 THEN c_acctbal END), 0)
               AS sum0_big,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd,
           ROUND(VAR_POP(c_acctbal), 4) AS vp,
           ROUND(MEDIAN(c_acctbal), 4) AS med,
           MIN(c_nationkey) FILTER (WHERE c_acctbal = (
               SELECT MIN(p2.c_acctbal) FROM pool p2
               WHERE p2.c_mktsegment = pool.c_mktsegment)) AS nat_of_min_bal
    FROM pool
    GROUP BY c_mktsegment
    """,
)
def agg_name_surface(spark, sf_dir):
    """The Doris aggregate NAME surface (`palo_spark.functions`):
    GROUP_CONCAT(DISTINCT, sorted), ANY_VALUE (over a group-constant
    expression, so deterministic), SUM0 on an empty slice, STDDEV_SAMP /
    VARIANCE_POP / MEDIAN, MIN_BY (min-tie broken by taking MIN of the
    candidates in the oracle — the fixture has unique minima per
    segment). Semantics of each are covered by the dedicated agg_*
    entries; this pins the callable names a migrating Doris user
    reaches for."""
    from palo_spark import functions as PF

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 600)
    return c.groupBy("c_mktsegment").agg(
        PF.group_concat(
            F.col("c_nationkey").cast("string"), "|", distinct=True
        ).alias("nations"),
        PF.any_value(F.length("c_mktsegment")).cast("int").alias("seg_len"),
        PF.sum0(
            F.when(F.col("c_acctbal") > 99999999, F.col("c_acctbal"))
        ).alias("sum0_big"),
        F.round(PF.stddev_samp("c_acctbal"), 4).alias("sd"),
        F.round(PF.variance_pop("c_acctbal"), 4).alias("vp"),
        F.round(PF.median("c_acctbal"), 4).alias("med"),
        PF.min_by("c_nationkey", "c_acctbal").alias("nat_of_min_bal"),
    )


@q(
    "agg_state_two_phase",
    """
    WITH g AS (
        SELECT n.n_regionkey AS rk,
               CAST(FLOOR(c.c_acctbal * 1000000.0) AS DECIMAL(38,0)) AS gx,
               c.c_acctbal AS x
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT rk,
           CAST(SUM(gx) AS DOUBLE) / 1000000.0 AS sum_bal,
           CAST(COUNT(x) AS BIGINT) AS cnt_bal,
           (CAST(SUM(gx) AS DOUBLE) / 1000000.0) / COUNT(x) AS avg_bal,
           MIN(x) AS min_bal,
           MAX(x) AS max_bal,
           FLOOR(SQRT(GREATEST(
               (CAST(SUM(gx * gx) AS DOUBLE) / 1000000000000.0
                - POW(CAST(SUM(gx) AS DOUBLE) / 1000000.0, 2) / COUNT(x))
               / COUNT(x), 0.0)) * 1e6) / 1e6 AS stddev_bal
    FROM g GROUP BY rk
    """,
)
def agg_state_two_phase(spark, sf_dir):
    """AGG_STATE combinators (Doris 2.1 ``_state``/``_union``/``_merge``):
    segment-level states over customer balances → nation-level ``_union``
    → region-level ``_merge`` after a join — three aggregation levels
    where the base table is scanned exactly once (the Doris agg_state
    rollup-refresh pattern). The oracle replays the grid-decimal algebra
    directly from the base rows: states carry no information loss."""
    from palo_spark.functions import agg_state as S

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    seg_states = c.groupBy("c_nationkey", "c_mktsegment").agg(
        S.sum_state("c_acctbal").alias("st_sum"),
        S.count_state("c_acctbal").alias("st_cnt"),
        S.avg_state("c_acctbal").alias("st_avg"),
        S.min_state("c_acctbal").alias("st_min"),
        S.max_state("c_acctbal").alias("st_max"),
        S.stddev_state("c_acctbal").alias("st_std"),
    )
    nation_states = seg_states.groupBy("c_nationkey").agg(
        S.sum_union("st_sum").alias("st_sum"),
        S.count_union("st_cnt").alias("st_cnt"),
        S.avg_union("st_avg").alias("st_avg"),
        S.min_union("st_min").alias("st_min"),
        S.max_union("st_max").alias("st_max"),
        S.stddev_union("st_std").alias("st_std"),
    )
    joined = nation_states.join(
        F.broadcast(n), nation_states["c_nationkey"] == n["n_nationkey"]
    )
    return joined.groupBy(F.col("n_regionkey").alias("rk")).agg(
        S.sum_merge("st_sum").alias("sum_bal"),
        S.count_merge("st_cnt").alias("cnt_bal"),
        S.avg_merge("st_avg").alias("avg_bal"),
        S.min_merge("st_min").alias("min_bal"),
        S.max_merge("st_max").alias("max_bal"),
        (F.floor(S.stddev_merge("st_std") * 1e6) / 1e6).alias("stddev_bal"),
    )
