"""AGG_STATE combinators: state→union→merge algebra, parquet
persistence of states, and two-phase plan shape."""

import math

from pyspark.sql import functions as F

from palo_spark.functions import agg_state as S


def _df(spark):
    rows = [(i % 4, i % 2, float(i) * 1.25 - 7) for i in range(200)]
    return spark.createDataFrame(rows, "k int, k2 int, v double")


def test_state_union_merge_equals_direct(spark):
    df = _df(spark)
    states = df.groupBy("k", "k2").agg(
        S.sum_state("v").alias("s"),
        S.avg_state("v").alias("a"),
        S.count_state("v").alias("c"),
        S.min_state("v").alias("mn"),
        S.max_state("v").alias("mx"),
        S.stddev_state("v").alias("sd"),
    )
    merged = (
        states.groupBy("k")
        .agg(
            S.sum_merge("s").alias("sum_v"),
            S.avg_merge("a").alias("avg_v"),
            S.count_merge("c").alias("cnt_v"),
            S.min_merge("mn").alias("min_v"),
            S.max_merge("mx").alias("max_v"),
            S.stddev_merge("sd").alias("std_v"),
        )
        .collect()
    )
    direct = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"),
            F.count("v").alias("cnt_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.stddev_pop("v").alias("std_v"),
        )
        .collect()
    }
    assert len(merged) == 4
    for r in merged:
        d = direct[r["k"]]
        assert abs(r["sum_v"] - d["sum_v"]) < 1e-6
        assert abs(r["avg_v"] - d["avg_v"]) < 1e-6
        assert r["cnt_v"] == d["cnt_v"]
        assert r["min_v"] == d["min_v"] and r["max_v"] == d["max_v"]
        assert abs(r["std_v"] - d["std_v"]) < 1e-5


def test_union_is_associative_across_regroupings(spark):
    """Combining states along different intermediate groupings must give
    identical results — the property that lets states live in an
    AGGREGATE-KEY table and be compacted in any order."""
    df = _df(spark)
    via_k2 = (
        df.groupBy("k", "k2")
        .agg(S.avg_state("v").alias("a"))
        .groupBy("k")
        .agg(S.avg_union("a").alias("a"))
    )
    direct_state = df.groupBy("k").agg(S.avg_state("v").alias("a"))
    r1 = {r["k"]: r["a"] for r in via_k2.collect()}
    r2 = {r["k"]: r["a"] for r in direct_state.collect()}
    assert r1 == r2  # exact: decimal-grid states, no float drift


def test_states_survive_parquet_roundtrip(spark, tmp_path):
    df = _df(spark)
    states = df.groupBy("k").agg(
        S.sum_state("v").alias("s"), S.stddev_state("v").alias("sd")
    )
    path = str(tmp_path / "states")
    states.write.parquet(path)
    back = spark.read.parquet(path)
    out = back.groupBy().agg(
        S.sum_merge("s").alias("sum_v"), S.stddev_merge("sd").alias("std_v")
    ).first()
    exact = df.groupBy().agg(
        F.sum("v").alias("s"), F.stddev_pop("v").alias("sd")
    ).first()
    assert abs(out["sum_v"] - exact["s"]) < 1e-6
    assert abs(out["std_v"] - exact["sd"]) < 1e-5


def test_generic_spelling_and_two_phase_plan(spark):
    df = _df(spark)
    out = df.groupBy("k").agg(S.state("avg", "v").alias("a"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Native two-phase hash aggregation (map-side partial) — the whole
    # point of expressing states as plain struct aggregates.
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    merged = out.groupBy().agg(S.merge("avg", "a").alias("m")).first()["m"]
    assert math.isclose(merged, sum(float(i) * 1.25 - 7 for i in range(200)) / 200)
