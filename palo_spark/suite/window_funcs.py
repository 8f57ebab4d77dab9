"""ANALYTIC_EVAL — window functions (SURVEY.md §2.1 #15, §2.3) and
PARTITION_SORT (§2.1 #17).

Doris executes window functions in ``vanalytic_eval_node.cpp`` over
sorted partitions with ROWS/RANGE frame support; the 2.0
``PartitionSortNode`` implements per-partition TopN for
``row_number() <= k`` filters. Spark-first mapping: ``pyspark.sql.Window``
specs — one shuffle on the partition key, in-partition sort, whole-stage
codegen evaluation; the ``row_number() <= k`` filter pattern triggers
Catalyst's ``WindowGroupLimit`` (= Doris partition topn) which prunes
per-partition before the full sort.

Determinism notes for the oracle comparison:
- ``events.ts`` is globally unique in the fixtures, so ``ORDER BY ts``
  within a user partition is a total order — rank/row_number are stable.
- windowed SUM/AVG over doubles uses the same floor-decimal quantization
  as the grouped aggregates (``util.dsum``): DuckDB evaluates window
  aggregates with segment trees (addition order differs from a running
  accumulator), so plain double sums would drift in the last ulp.
- rank/row_number/ntile are cast to INT in the oracle (DuckDB emits
  BIGINT, Spark INT).

Scale: every query here is one hash-shuffle on the partition key
(user_id / o_orderstatus) + in-partition sort — the same distribution
Doris uses. No driver-side work, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from palo_spark.catalog import load_table, register_views
from palo_spark.suite.util import dsum, o_dsum, register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_M = float(10**6)


def _wsum(col, w) -> "F.Column":
    """Order-independent windowed SUM over doubles (see util.dsum)."""
    return (
        F.sum(F.floor(F.col(col) * F.lit(_M)).cast("decimal(38,0)")).over(w).cast("double")
        / F.lit(_M)
    )


def _o_wsum(expr: str, over: str) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {_M!r}) AS DECIMAL(38,0))) OVER {over} AS DOUBLE)"
        f" / {_M!r})"
    )


# ------------------------------------------------------------- ranking


@q(
    "window_row_number",
    """
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS INT) AS rn
    FROM events
    WHERE user_id < 20
    """,
)
def window_row_number(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select("event_id", "user_id", F.row_number().over(w).alias("rn"))


@q(
    "window_rank_dense_rank",
    """
    SELECT event_id, user_id, event_type,
           CAST(RANK()       OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS INT) AS drnk
    FROM events
    WHERE user_id < 20
    """,
)
def window_rank_dense_rank(spark, sf_dir):
    """RANK/DENSE_RANK over a tie-heavy order key (deterministic per row
    even though tied rows are emitted in arbitrary order)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("event_type")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@q(
    "window_ntile_percent",
    """
    SELECT event_id, user_id,
           CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts) AS INT) AS quartile,
           PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS pct_rank,
           CUME_DIST()    OVER (PARTITION BY user_id ORDER BY ts) AS cdist
    FROM events
    WHERE user_id < 20
    """,
)
def window_ntile_percent(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


# ------------------------------------------------------------- analytic


@q(
    "window_lag_lead",
    """
    SELECT event_id, user_id, value,
           LAG(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value,
           LEAD(value, 2)      OVER (PARTITION BY user_id ORDER BY ts) AS next2_value
    FROM events
    WHERE user_id < 20
    """,
)
def window_lag_lead(spark, sf_dir):
    """LAG with default + LEAD with offset — pure value plumbing, bit-exact."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1, -1.0).over(w).alias("prev_value"),
        F.lead("value", 2).over(w).alias("next2_value"),
    )


@q(
    "window_first_last_value",
    """
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_et,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_et
    FROM events
    WHERE user_id < 20
    """,
)
def window_first_last_value(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w_grow = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_grow).alias("first_et"),
        F.last("event_type").over(w_full).alias("last_et"),
    )


# --------------------------------------------------- aggregates over frames


@q(
    "window_running_sum",
    f"""
    SELECT event_id, user_id,
           {_o_wsum('value', '(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)')} AS running_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    """Cumulative SUM/COUNT per user — the classic running-total query."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        _wsum("value", w).alias("running_sum"),
        F.count("*").over(w).alias("running_cnt"),
    )


@q(
    "window_sliding_avg",
    f"""
    SELECT event_id, user_id,
           {_o_wsum('value', '(PARTITION BY user_id ORDER BY ts ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)')}
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS moving_avg,
           MIN(value) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS moving_min,
           MAX(value) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS moving_max
    FROM events
    WHERE user_id < 50
    """,
)
def window_sliding_avg(spark, sf_dir):
    """Sliding ROWS frame (3 preceding, 1 following): moving avg/min/max.
    MIN/MAX are order statistics — exact regardless of evaluation order;
    the avg numerator uses the quantized sum."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-3, 1)
    return e.select(
        "event_id",
        "user_id",
        (_wsum("value", w) / F.count("*").over(w)).alias("moving_avg"),
        F.min("value").over(w).alias("moving_min"),
        F.max("value").over(w).alias("moving_max"),
    )


@q(
    "window_range_frame",
    f"""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_within_5k,
           {_o_wsum('o_totalprice', '(PARTITION BY o_orderstatus ORDER BY o_totalprice RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)')} AS sum_within_5k
    FROM orders
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a numeric order key: all peers within a 5000-wide
    value band precede the current row. RANGE (unlike ROWS) includes ties,
    so the result is deterministic even with duplicate prices."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                              RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_within_5k,
               {_o_wsum('o_totalprice', '(PARTITION BY o_orderstatus ORDER BY o_totalprice RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)')} AS sum_within_5k
        FROM orders
        """
    )


# ------------------------------------------------- PARTITION_SORT / topn


@q(
    "partition_topn",
    """
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def partition_topn(spark, sf_dir):
    """Doris PARTITION_SORT: per-user top-3 by value. The ``row_number() <=
    k`` filter triggers Catalyst ``WindowGroupLimit`` — each partition keeps
    a bounded heap instead of fully sorting, exactly Doris's partition topn.
    ``event_id`` tiebreak keeps the cut deterministic under equal values."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
    )


@q(
    "window_ignore_nulls",
    """
    SELECT o_orderkey, o_custkey,
           first_value(big_price IGNORE NULLS) OVER w AS first_big,
           last_value(big_price IGNORE NULLS) OVER w AS last_big,
           lag(big_price, 1 IGNORE NULLS) OVER w AS prev_big
    FROM (SELECT o_orderkey, o_custkey,
                 CASE WHEN o_totalprice > 150000.0 THEN o_totalprice END AS big_price
          FROM orders WHERE o_custkey < 200)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_ignore_nulls(spark, sf_dir):
    """Doris FIRST_VALUE/LAST_VALUE/LAG ... IGNORE NULLS: skip NULL
    rows when picking the value (MySQL 8 / Doris 2.x semantics) —
    native Spark ignorenulls flags, still one window pass."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .withColumn(
            "big_price",
            F.when(F.col("o_totalprice") > 150000.0, F.col("o_totalprice")),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("big_price", ignorenulls=True).over(w).alias("first_big"),
        F.last("big_price", ignorenulls=True).over(w).alias("last_big"),
        # PySpark's F.lag has no ignoreNulls parameter — SQL form does
        F.expr(
            "lag(big_price, 1) IGNORE NULLS OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderkey)"
        ).alias("prev_big"),
    )


@q(
    "events_sessionization",
    f"""
    WITH d AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                         >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM d
    )
    SELECT user_id,
           CAST(epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('value')} AS sum_value
    FROM s GROUP BY user_id, sess
    """,
)
def events_sessionization(spark, sf_dir):
    """Batch sessionization via native ``F.session_window`` (30-min
    gap): events merge while consecutive gaps stay under the threshold.
    The oracle replays it as gaps-and-islands SQL (lag → break flag →
    running island id), pinning Spark's session-merge semantics
    (a gap of exactly 30:00 starts a NEW session) against plain SQL."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(
                # events.ts is TIMESTAMP_NTZ in the parquet, so the session
                # window bounds come back NTZ too; unix_micros only accepts
                # TIMESTAMP. The session is UTC, so the cast is exact.
                F.col("session_window.start").cast("timestamp")
            ).alias("session_start_us"),
            "n",
            "sum_value",
        )
    )


@q(
    "window_nth_value",
    """
    SELECT event_id, user_id,
           NTH_VALUE(event_type, 2) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_et,
           NTH_VALUE(event_type, 3) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_et_all
    FROM events WHERE user_id < 20
    """,
)
def window_nth_value(spark, sf_dir):
    """NTH_VALUE over growing and full frames (Doris 2.x analytic
    surface): NULL until the frame holds n rows, then the n-th by the
    frame order."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w_grow = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.nth_value("event_type", 2).over(w_grow).alias("second_et"),
        F.nth_value("event_type", 3).over(w_full).alias("third_et_all"),
    )
