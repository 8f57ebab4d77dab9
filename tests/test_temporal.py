"""asof_join: backward/forward semantics, tolerance, ties, collisions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from palo_spark.operators.temporal import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(2), "b"), (2, _t(5), "c"), (3, _t(7), "d")],
        "k int, ts timestamp_ntz, lv string",
    )
    right = spark.createDataFrame(
        [(1, _t(3), 100), (1, _t(10), 200), (2, _t(9), 300)],
        "k int, ts timestamp_ntz, rv int",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = {
        r["lv"]: (r["rv"], r["matched_ts"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out["a"] == (200, _t(10))  # equal ts matches (inclusive)
    assert out["b"] == (None, None)  # nothing at or before 0:02
    assert out["c"] == (None, None)  # right row is later
    assert out["d"] == (None, None)  # no right rows for key 3
    assert len(out) == 4


def test_forward_and_tolerance(frames):
    left, right = frames
    fwd = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert fwd == {"a": 200, "b": 100, "c": 300, "d": None}
    tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance=60
        ).collect()
    }
    # b: gap 0:02->0:03 = 60s kept; c: 0:05->0:09 = 240s nulled out
    assert tol == {"a": 200, "b": 100, "c": None, "d": None}


def test_column_collision_fails_loud(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lv"), on="k")


def test_single_shuffle_plan(frames):
    """The asof merge must cost ONE key shuffle (union -> one Exchange ->
    window), never a join of candidate pairs."""
    left, right = frames
    plan = (
        asof_join(left, right, on="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
