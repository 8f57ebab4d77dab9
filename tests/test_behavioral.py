"""Unit tests for behavioral aggregates with hand-built event sequences."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from palo_spark.functions.behavioral import (
    _compile_pattern,
    retention,
    sequence_count,
    sequence_match,
    window_funnel,
)

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (user, seconds_offset, type)"""
    data = [(u, T0 + dt.timedelta(seconds=s), t) for u, s, t in rows]
    return spark.createDataFrame(data, "user_id long, ts timestamp, event_type string")


CONDS = lambda: [  # noqa: E731
    F.col("event_type") == "a",
    F.col("event_type") == "b",
    F.col("event_type") == "c",
]


def test_retention_semantics(spark):
    df = _events(
        spark,
        [(1, 0, "a"), (1, 10, "b"), (2, 0, "b"), (2, 5, "c"), (3, 0, "a")],
    )
    got = {
        r["user_id"]: r["r"]
        for r in df.groupBy("user_id").agg(retention(*CONDS()).alias("r")).collect()
    }
    assert got[1] == [1, 1, 0]
    assert got[2] == [0, 0, 0]  # no first-step event → all zero
    assert got[3] == [1, 0, 0]


def test_window_funnel_levels_and_window(spark):
    df = _events(
        spark,
        [
            # user 1: full chain within window
            (1, 0, "a"), (1, 10, "b"), (1, 20, "c"),
            # user 2: step 3 arrives after the 60s window → level 2
            (2, 0, "a"), (2, 10, "b"), (2, 100, "c"),
            # user 3: wrong order → level 1
            (3, 0, "b"), (3, 10, "a"),
            # user 4: second chance start succeeds where the first fails
            (4, 0, "a"), (4, 100, "a"), (4, 110, "b"), (4, 120, "c"),
            # user 5: no first step
            (5, 0, "c"),
        ],
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(df, "user_id", "ts", 60.0, CONDS()).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 3, 5: 0}


def test_window_funnel_boundary_inclusive(spark):
    # deadline is start + window inclusive (<=)
    df = _events(spark, [(1, 0, "a"), (1, 60, "b")])
    got = window_funnel(df, "user_id", "ts", 60.0, CONDS()[:2]).collect()[0]
    assert got["funnel_level"] == 2


def test_sequence_match_adjacency_vs_gap(spark):
    df = _events(
        spark,
        [
            # user 1: a ... (noise) ... b — noise doesn't match any cond
            (1, 0, "a"), (1, 5, "x"), (1, 10, "b"),
            # user 2: a c b — the c sits between them in the filtered seq
            (2, 0, "a"), (2, 5, "c"), (2, 10, "b"),
        ],
    )
    adj = {
        r["user_id"]: r["matched"]
        for r in sequence_match(df, "user_id", "ts", "(?1)(?2)", CONDS()).collect()
    }
    gap = {
        r["user_id"]: r["matched"]
        for r in sequence_match(df, "user_id", "ts", "(?1).*(?2)", CONDS()).collect()
    }
    # unmatched events are skipped → user 1 is adjacent; user 2 is not
    assert adj == {1: True, 2: False}
    assert gap == {1: True, 2: True}


def test_sequence_count_non_overlapping(spark):
    df = _events(
        spark,
        [(1, i, t) for i, t in enumerate(["a", "b", "a", "b", "a"])],
    )
    got = sequence_count(df, "user_id", "ts", "(?1)(?2)", CONDS()[:2]).collect()[0]
    assert got["n_matches"] == 2


def test_sequence_count_gap_pattern_restarts_after_match(spark):
    # a,b,a,b with '(?1).*(?2)' = 2 minimal non-overlapping chains; a
    # greedy '.*' would swallow the second chain and count 1
    df = _events(
        spark,
        [(1, i, t) for i, t in enumerate(["a", "b", "a", "b"])],
    )
    got = sequence_count(df, "user_id", "ts", "(?1).*(?2)", CONDS()[:2]).collect()[0]
    assert got["n_matches"] == 2


def test_group_spanning_full_arrow_batches(spark):
    # A group larger than one Arrow batch must accumulate across batches,
    # not emit one row per batch (regression: eq_last.all() used to emit).
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        rows = [(1, i * 10, t) for i, t in enumerate(["a", "x", "x", "x", "x", "x", "b", "c"])]
        rows += [(2, 0, "a"), (2, 10, "b")]
        df = _events(spark, rows).coalesce(1)
        got = {
            r["user_id"]: r["funnel_level"]
            for r in window_funnel(df, "user_id", "ts", 600.0, CONDS()).collect()
        }
        assert got == {1: 3, 2: 2}
        cnt = sequence_count(df, "user_id", "ts", "(?1).*(?2)", CONDS()[:2]).collect()
        assert {r["user_id"]: r["n_matches"] for r in cnt} == {1: 1, 2: 1}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_pattern_compiler_rejects_garbage():
    with pytest.raises(ValueError):
        _compile_pattern("(?1)+(?2)", 2)
    with pytest.raises(ValueError):
        _compile_pattern("(?3)", 2)
    assert _compile_pattern("(?1).*(?2)", 2).pattern == "a.*?b"


def test_window_funnel_modes(spark):
    # deduplication: a repeat of a matched condition before the next
    # step interrupts that chain (second-chance starts still apply)
    df = _events(
        spark,
        [
            # user 1: a(0) b(10) a(20) c(30) — default reaches 3; dedup
            # interrupts the t0 chain at the repeated 'a' (level 2), and
            # the t20 chain finds no 'b' → 2
            (1, 0, "a"), (1, 10, "b"), (1, 20, "a"), (1, 30, "c"),
            # user 2: clean chain — identical in every mode
            (2, 0, "a"), (2, 10, "b"), (2, 20, "c"),
        ],
    )
    default = {r["user_id"]: r["funnel_level"]
               for r in window_funnel(df, "user_id", "ts", 60.0, CONDS()).collect()}
    dedup = {r["user_id"]: r["funnel_level"]
             for r in window_funnel(df, "user_id", "ts", 60.0, CONDS(),
                                    mode="deduplication").collect()}
    assert default == {1: 3, 2: 3}
    assert dedup == {1: 2, 2: 3}

    # fixed: ANY tracked event between steps interrupts (repeated 'b')
    df2 = _events(
        spark,
        [(1, 0, "a"), (1, 10, "b"), (1, 20, "b"), (1, 30, "c"),
         (2, 0, "a"), (2, 10, "b"), (2, 20, "c")],
    )
    fixed = {r["user_id"]: r["funnel_level"]
             for r in window_funnel(df2, "user_id", "ts", 60.0, CONDS(),
                                    mode="fixed").collect()}
    assert fixed == {1: 2, 2: 3}

    # increase: equal timestamps don't advance the chain
    df3 = _events(
        spark,
        [(1, 0, "a"), (1, 0, "b"), (1, 10, "c"),
         (2, 0, "a"), (2, 5, "b"), (2, 10, "c")],
    )
    default3 = {r["user_id"]: r["funnel_level"]
                for r in window_funnel(df3, "user_id", "ts", 60.0, CONDS()).collect()}
    incr = {r["user_id"]: r["funnel_level"]
            for r in window_funnel(df3, "user_id", "ts", 60.0, CONDS(),
                                   mode="increase").collect()}
    assert default3[1] == 3  # same-ts 'b' counts in default mode
    assert incr == {1: 1, 2: 3}

    with pytest.raises(ValueError, match="mode"):
        window_funnel(df, "user_id", "ts", 60.0, CONDS(), mode="strict")
