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

from pyspark.sql import Window
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


@q(
    "behavioral_sequence_count",
    """
    WITH f AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
        FROM events WHERE event_type IN ('signup', 'purchase')
    ), c AS (
        SELECT user_id, COUNT(*) AS n FROM f
        WHERE event_type = 'signup' AND nxt = 'purchase' GROUP BY user_id
    )
    SELECT u.user_id, CAST(COALESCE(c.n, 0) AS INT) AS n_matches
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN c USING (user_id)
    """,
)
def behavioral_sequence_count(spark, sf_dir):
    """SEQUENCE_COUNT('(?1)(?2)', ts, signup, purchase): non-overlapping
    *adjacent* signup→purchase pairs in the condition-filtered event
    stream — the regex-over-sequence kernel. Because the two pattern
    symbols are mutually exclusive, non-overlapping minimal matches are
    exactly the adjacent (signup, next-filtered-event=purchase) pairs,
    which the oracle counts with one LEAD over the filtered stream
    (exact given the fixture's tie-free (user_id, ts) pairs — verified;
    deeper/overlapping patterns remain pytest territory)."""
    e = load_table(spark, sf_dir, "events")
    return sequence_count(
        e,
        "user_id",
        "ts",
        "(?1)(?2)",
        [F.col("event_type") == "signup", F.col("event_type") == "purchase"],
    )


@q(
    "behavioral_funnel_modes",
    """
    WITH tr AS (
        SELECT user_id, ts, event_type,
               LEAD(ts) OVER w AS nts, LEAD(event_type) OVER w AS ntype
        FROM events WHERE event_type IN ('signup', 'purchase', 'error')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sp AS (
        SELECT user_id, ts, event_type,
               LEAD(ts) OVER w AS nts, LEAD(event_type) OVER w AS ntype
        FROM events WHERE event_type IN ('signup', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    dedup2 AS (
        SELECT DISTINCT user_id FROM sp
        WHERE event_type = 'signup' AND ntype = 'purchase'
          AND nts <= ts + INTERVAL 1 HOUR
    ),
    dedup3 AS (
        SELECT DISTINCT s.user_id FROM sp s
        JOIN tr p ON p.user_id = s.user_id AND p.ts = s.nts
                 AND p.event_type = 'purchase'
        WHERE s.event_type = 'signup' AND s.ntype = 'purchase'
          AND s.nts <= s.ts + INTERVAL 1 HOUR
          AND p.ntype = 'error' AND p.nts <= s.ts + INTERVAL 1 HOUR
    ),
    fixed2 AS (
        SELECT DISTINCT user_id FROM tr
        WHERE event_type = 'signup' AND ntype = 'purchase'
          AND nts <= ts + INTERVAL 1 HOUR
    ),
    fixed3 AS (
        SELECT DISTINCT s.user_id FROM tr s
        JOIN tr p ON p.user_id = s.user_id AND p.ts = s.nts
                 AND p.event_type = 'purchase'
        WHERE s.event_type = 'signup' AND s.ntype = 'purchase'
          AND s.nts <= s.ts + INTERVAL 1 HOUR
          AND p.ntype = 'error' AND p.nts <= s.ts + INTERVAL 1 HOUR
    ),
    inc2 AS (
        SELECT DISTINCT s.user_id FROM events s
        JOIN events p ON p.user_id = s.user_id AND p.event_type = 'purchase'
                     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup'
    ),
    inc3 AS (
        SELECT DISTINCT s.user_id FROM events s
        JOIN events p ON p.user_id = s.user_id AND p.event_type = 'purchase'
                     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        JOIN events e ON e.user_id = s.user_id AND e.event_type = 'error'
                     AND e.ts > p.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
        WHERE s.event_type = 'signup'
    ),
    l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    SELECT u.user_id,
           CAST(CASE WHEN d3.user_id IS NOT NULL THEN 3
                     WHEN d2.user_id IS NOT NULL THEN 2
                     WHEN l1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS level_deduplication,
           CAST(CASE WHEN f3.user_id IS NOT NULL THEN 3
                     WHEN f2.user_id IS NOT NULL THEN 2
                     WHEN l1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS level_fixed,
           CAST(CASE WHEN i3.user_id IS NOT NULL THEN 3
                     WHEN i2.user_id IS NOT NULL THEN 2
                     WHEN l1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS level_increase
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN dedup3 d3 ON u.user_id = d3.user_id
    LEFT JOIN dedup2 d2 ON u.user_id = d2.user_id
    LEFT JOIN fixed3 f3 ON u.user_id = f3.user_id
    LEFT JOIN fixed2 f2 ON u.user_id = f2.user_id
    LEFT JOIN inc3 i3 ON u.user_id = i3.user_id
    LEFT JOIN inc2 i2 ON u.user_id = i2.user_id
    LEFT JOIN l1 ON u.user_id = l1.user_id
    """,
)
def behavioral_funnel_modes(spark, sf_dir):
    """WINDOW_FUNNEL mode variants (Doris 'deduplication'/'fixed'/
    'increase') over the 3-step signup→purchase→error funnel: one row
    per user with the level under each mode.

    Oracle closed forms (exact for a 3-step funnel on tie-free
    timestamps — verified for the fixture):

    - *increase*: greedy-first chaining is optimal for monotone chains,
      so level ≥ k ⇔ ∃ s < p (< e) within s+window — plain joins.
    - *deduplication*: a chain from signup s survives step 2 iff the
      FIRST later signup-or-purchase event (error is not yet matched,
      so it cannot interrupt) within the window is a purchase, and
      survives step 3 iff the first later tracked event after that
      purchase is an error — one LEAD over each filtered stream.
    - *fixed*: same but ANY tracked condition out of order interrupts,
      so both lookups use the full tracked stream.

    Interrupt exactness on adversarial hand-built sequences stays
    pytest-checked (tests/test_behavioral.py)."""
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


@q(
    "behavioral_transition_matrix",
    """
    WITH s AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   AS prev_type
        FROM events
    )
    SELECT prev_type, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, event_type
    """,
)
def behavioral_transition_matrix(spark, sf_dir):
    """Event-transition matrix (the user-journey Markov counts behind
    path-analysis dashboards — the Doris user-behavior family next to
    RETENTION/WINDOW_FUNNEL): per user, consecutive event pairs via a
    user-keyed LAG window ((user_id, ts) is unique in the fixture, so
    the ordering is total), then global pair counts + distinct-user
    counts. One keyed window + one grouped aggregate — no self-join of
    the event stream, which is the naive O(n²) formulation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    s = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        s.groupBy("prev_type", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_transitions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("prev_type", "event_type")
    )
