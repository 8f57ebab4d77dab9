"""Behavioral aggregate coverage (SURVEY.md §2.4 tail) over ``events``:
RETENTION / WINDOW_FUNNEL / SEQUENCE_MATCH / SEQUENCE_COUNT.

Oracle strategy: retention is plain conditional aggregation → mirrored
directly. The 2-step funnel and the ``(?1).*(?2)`` sequence pattern have
closed-form SQL equivalents (EXISTS-style joins / min-max ordering), so
those two are oracle-checked as well; deeper funnels and adjacency
patterns exercise the greedy/regex kernels and are pytest-checked with
hand-built sequences (rows-only here).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.functions.behavioral import (
    retention,
    retention_sql,
    sequence_count,
    sequence_match,
    window_funnel,
)
from palo_spark.suite.util import register

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_CONDS_SQL = [
    "event_type = 'signup'",
    "event_type = 'purchase'",
    "event_type = 'error'",
]


@q(
    "behavioral_retention",
    f"""
    SELECT user_id, array_to_string({retention_sql(_CONDS_SQL)}, ',') AS r
    FROM events GROUP BY user_id
    """,
)
def behavioral_retention(spark, sf_dir):
    """RETENTION(signup, purchase, error) per user: element 0 = signed
    up; element i = signed up AND did step i. Native conditional
    aggregation, one shuffle. The array is serialized to a CSV string so
    the driver's pandas canonicalizer (which cannot sort list cells) can
    hash it."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(
            retention(
                F.col("event_type") == "signup",
                F.col("event_type") == "purchase",
                F.col("event_type") == "error",
            ).cast("array<string>"),
            ",",
        ).alias("r")
    )


@q(
    "behavioral_window_funnel",
    """
    WITH su AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    pu AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l2 AS (
        SELECT DISTINCT s.user_id
        FROM su s JOIN pu p ON p.user_id = s.user_id
         AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    )
    SELECT u.user_id,
           CAST(CASE WHEN l2.user_id IS NOT NULL THEN 2
                     WHEN l1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_level
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN (SELECT DISTINCT user_id FROM su) l1 ON u.user_id = l1.user_id
    LEFT JOIN l2 ON u.user_id = l2.user_id
    """,
)
def behavioral_window_funnel(spark, sf_dir):
    """WINDOW_FUNNEL(1h, ts, signup, purchase) per user. For a 2-step
    funnel, 'reached level 2' ≡ ∃ purchase within 1h after a signup, so
    the oracle can replay it as an EXISTS join; deeper funnels (greedy
    chaining) are pytest-checked."""
    e = load_table(spark, sf_dir, "events")
    return window_funnel(
        e,
        "user_id",
        "ts",
        3600.0,
        [F.col("event_type") == "signup", F.col("event_type") == "purchase"],
    )


@q(
    "behavioral_sequence_match",
    """
    SELECT user_id,
           COALESCE(MIN(CASE WHEN event_type = 'signup' THEN ts END)
                    < MAX(CASE WHEN event_type = 'purchase' THEN ts END),
                    FALSE) AS matched
    FROM events GROUP BY user_id
    """,
)
def behavioral_sequence_match(spark, sf_dir):
    """SEQUENCE_MATCH('(?1).*(?2)', ts, signup, purchase): some signup
    strictly before some purchase. The ``.*`` pattern makes the match
    order-theoretic (min signup < max purchase), which the oracle
    computes directly; adjacency patterns are pytest territory."""
    e = load_table(spark, sf_dir, "events")
    return sequence_match(
        e,
        "user_id",
        "ts",
        "(?1).*(?2)",
        [F.col("event_type") == "signup", F.col("event_type") == "purchase"],
    )


@q("behavioral_sequence_count")  # rows-only: adjacency semantics ≠ plain SQL
def behavioral_sequence_count(spark, sf_dir):
    """SEQUENCE_COUNT('(?1)(?2)', ts, signup, purchase): non-overlapping
    *adjacent* signup→purchase pairs in the condition-filtered event
    stream — the regex-over-sequence kernel; exactness pytest-checked."""
    e = load_table(spark, sf_dir, "events")
    return sequence_count(
        e,
        "user_id",
        "ts",
        "(?1)(?2)",
        [F.col("event_type") == "signup", F.col("event_type") == "purchase"],
    )


@q("behavioral_funnel_modes")  # rows-only: interrupt semantics ≠ plain SQL
def behavioral_funnel_modes(spark, sf_dir):
    """WINDOW_FUNNEL mode variants (Doris 'deduplication'/'fixed'/
    'increase') over the 3-step signup→purchase→error funnel: one row
    per user with the level under each mode. Interrupt-mode exactness is
    pytest-checked on hand-built sequences (tests/test_behavioral.py);
    this entry keeps the kernels exercised on the real fixture."""
    e = load_table(spark, sf_dir, "events")
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "purchase",
        F.col("event_type") == "error",
    ]
    out = None
    for mode in ("deduplication", "fixed", "increase"):
        lv = window_funnel(e, "user_id", "ts", 3600.0, conds, mode=mode).withColumnRenamed(
            "funnel_level", f"level_{mode}"
        )
        out = lv if out is None else out.join(lv, "user_id")
    return out
