"""Partition-incremental rollup: exact for UNIQUE upserts and deletes,
refreshing only the partitions whose version moved."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palo_spark.plans import Measure
from palo_spark.plans.partition_rollup import PartitionRollup
from palo_spark.tables import Table


def _rows(spark, day_vals):
    """day_vals: {day: [(id, seg, v), ...]} → DataFrame with ts on day."""
    rows = [
        Row(id=i, ts=f"2024-07-{d:02d} 06:00:00", seg=s, v=float(v))
        for d, items in day_vals.items()
        for (i, s, v) in items
    ]
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture
def setup(spark, tmp_path):
    t = Table(
        spark, "pr", "UNIQUE", ["id", "ts"],
        location=str(tmp_path / "pr"), auto_partition=("ts", "day"),
    )
    t.insert(_rows(spark, {
        1: [(1, "a", 10), (2, "b", 20)],
        2: [(3, "a", 30)],
        3: [(4, "b", 40)],
    }))
    r = PartitionRollup(
        t, ["seg"], [Measure("dsum", "v"), Measure("count")],
        store=str(tmp_path / "store"),
    )
    return t, r


def _totals(r):
    return {row["seg"]: (row["dsum_v"], row["count_all"]) for row in r.read().collect()}


def test_initial_build_and_incremental_upsert(setup, spark):
    t, r = setup
    assert _totals(r) == {"a": (40.0, 2), "b": (60.0, 2)}
    assert sorted(r.last_refreshed) == ["d2024-07-01", "d2024-07-02", "d2024-07-03"]
    # steady state: nothing recomputes
    _totals(r)
    assert r.last_refreshed == []
    # upsert ONE row in day 2 (same key -> same partition): only that
    # partition refreshes, and the upsert is exact (not double-counted)
    t.insert(_rows(spark, {2: [(3, "a", 300)]}))
    assert _totals(r) == {"a": (310.0, 2), "b": (60.0, 2)}
    assert r.last_refreshed == ["d2024-07-02"]


def test_delete_conservatively_refreshes_and_stays_exact(setup, spark):
    t, r = setup
    _totals(r)
    t.delete_where("seg = 'b'")
    assert _totals(r) == {"a": (40.0, 2)}
    # deletes can match anywhere: every partition refreshes (documented)
    assert len(r.last_refreshed) == 3


def test_drop_partition_removes_its_aggregate(setup, spark):
    t, r = setup
    _totals(r)
    t.drop_partition("d2024-07-03")
    assert _totals(r) == {"a": (40.0, 2), "b": (20.0, 1)}
    assert "d2024-07-03" in r.last_refreshed


def test_new_partition_only_computes_itself(setup, spark):
    t, r = setup
    _totals(r)
    t.insert(_rows(spark, {4: [(9, "a", 1)]}))
    assert _totals(r)["a"] == (41.0, 3)
    assert r.last_refreshed == ["d2024-07-04"]


def test_matches_direct_aggregation_always(setup, spark):
    t, r = setup
    t.insert(_rows(spark, {1: [(1, "a", 99)], 5: [(7, "c", 7)]}))
    t.delete_where("v > 90")
    direct = {
        row["seg"]: (row["s"], row["n"])
        for row in t.read()
        .groupBy("seg")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    got = {k: (v[0], v[1]) for k, v in _totals(r).items()}
    assert got == direct
