"""Unit tests for the rollup/MV rewrite layer (palo_spark/plans)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palo_spark.plans import Measure, RollupCatalog

ROOT = f"/tmp/palo_spark_test_rollups_{os.getpid()}"


@pytest.fixture()
def cat(spark):
    c = RollupCatalog(spark, root=ROOT)
    df = spark.createDataFrame(
        [Row(a=a, b=b, x=float(a * 10 + b), y=a - b) for a in range(3) for b in range(4)]
    )
    c.register_base("t", df)
    c.add_rollup("t_by_ab", "t", ["a", "b"], [Measure("count"), Measure("dsum", "x"), Measure("min", "y")])
    c.add_rollup("t_by_a", "t", ["a"], [Measure("count"), Measure("dsum", "x"), Measure("min", "y")])
    return c


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_selector_prefers_smaller_rollup(cat):
    ms = [Measure("count"), Measure("dsum", "x")]
    assert cat.choose("t", ["a"], ms).name == "t_by_a"
    assert cat.choose("t", ["a", "b"], ms).name == "t_by_ab"


def test_selector_rejects_uncovered(cat):
    assert cat.choose("t", ["a"], [Measure("max", "y")]) is None  # max not stored
    assert cat.choose("t", ["y"], [Measure("count")]) is None  # y not a dim
    assert cat.choose("t", ["a"], [Measure("count")], where_cols=["x"]) is None


def test_rollup_answer_equals_base(cat, spark):
    ms = [Measure("count"), Measure("dsum", "x"), Measure("min", "y")]
    df, src = cat.query("t", ["a"], ms)
    assert src == "t_by_a"
    base = spark.createDataFrame(
        [Row(a=a, b=b, x=float(a * 10 + b), y=a - b) for a in range(3) for b in range(4)]
    ).groupBy("a").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.min("y").alias("my")
    )
    got = _rows(df, "a", "count_all", "dsum_x", "min_y")
    exp = _rows(base, "a", "n", "sx", "my")
    assert [(a, int(n), sx, my) for a, n, sx, my in got] == [
        (a, int(n), sx, my) for a, n, sx, my in exp
    ]


def test_filter_on_dim_pushed_to_rollup(cat):
    df, src = cat.query(
        "t", ["a"], [Measure("count")], where=F.col("b") == 2, where_cols=["b"]
    )
    assert src == "t_by_ab"  # needs b as a dim even though output groups by a
    assert _rows(df, "a", "count_all") == [(0, 1), (1, 1), (2, 1)]


def test_refresh_after_base_change(cat, spark):
    df2 = spark.createDataFrame([Row(a=9, b=0, x=1.0, y=0)])
    cat.register_base("t", cat._bases["t"].unionByName(df2))
    cat.refresh("t")
    df, src = cat.query("t", ["a"], [Measure("count")])
    assert src == "t_by_a"
    assert (9, 1) in _rows(df, "a", "count_all")


def test_measure_validation():
    with pytest.raises(ValueError):
        Measure("median", "x")
    with pytest.raises(ValueError):
        Measure("sum")


def test_apply_delta_equals_full_rebuild(cat, spark):
    delta = spark.createDataFrame(
        [Row(a=a, b=b, x=float(a + b) / 3.0, y=-5) for a in (1, 9) for b in range(2)]
    )
    full = cat._bases["t"].unionByName(delta)
    cat.apply_delta("t", delta)
    incr_ab = _rows(cat._rollups["t"][0].read(spark), "a", "b", "count_all", "dsum_x", "min_y")
    incr_a = _rows(cat._rollups["t"][1].read(spark), "a", "count_all", "dsum_x", "min_y")
    # rebuild from scratch over the full data and compare bit-for-bit
    cat.register_base("t", full)
    cat.refresh("t")
    assert _rows(cat._rollups["t"][0].read(spark), "a", "b", "count_all", "dsum_x", "min_y") == incr_ab
    assert _rows(cat._rollups["t"][1].read(spark), "a", "count_all", "dsum_x", "min_y") == incr_a
    # and the query answer over the delta-merged state matches the base agg
    df, src = cat.query("t", ["a"], [Measure("count"), Measure("dsum", "x"), Measure("min", "y")])
    assert src == "t_by_a"
    base_agg = full.groupBy("a").agg(
        F.count("*").alias("count_all"),
        (F.sum(F.floor(F.col("x") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6).alias("dsum_x"),
        F.min("y").alias("min_y"),
    )
    assert _rows(df, "a", "count_all", "dsum_x", "min_y") == _rows(
        base_agg, "a", "count_all", "dsum_x", "min_y"
    )


def test_sql_rewrite_hits_rollup(cat):
    df, src = cat.sql(
        "SELECT a, COUNT(*) AS n, SUM(x) AS sx, MIN(y) AS my FROM t GROUP BY a"
    )
    assert src == "t_by_a"  # SUM(x) matched the stored dsum_x measure
    assert sorted(df.columns) == ["a", "my", "n", "sx"]
    rows = _rows(df, "a", "n", "sx", "my")
    base = cat._bases["t"].groupBy("a").agg(
        F.count("*").alias("n"),
        (F.sum(F.floor(F.col("x") * 1e6).cast("decimal(38,0)")).cast("double") / 1e6).alias("sx"),
        F.min("y").alias("my"),
    )
    assert rows == _rows(base, "a", "n", "sx", "my")


def test_sql_rewrite_where_on_dim(cat):
    df, src = cat.sql("SELECT a, COUNT(*) AS n FROM t WHERE b = 2 GROUP BY a")
    assert src == "t_by_ab"
    assert _rows(df, "a", "n") == [(0, 1), (1, 1), (2, 1)]


def test_sql_rewrite_falls_back_when_uncovered(cat, spark):
    cat._bases["t"].createOrReplaceTempView("t")
    # x is not a rollup dimension → recognized shape, no covering rollup
    df, src = cat.sql("SELECT a, COUNT(*) AS n FROM t WHERE x > 5.0 GROUP BY a")
    assert src == "base-sql"
    direct = spark.sql("SELECT a, COUNT(*) AS n FROM t WHERE x > 5.0 GROUP BY a")
    assert _rows(df, "a", "n") == _rows(direct, "a", "n")
    # a shape outside the grammar passes through untouched
    df2, src2 = cat.sql("SELECT a, COUNT(DISTINCT b) AS n FROM t GROUP BY a")
    assert src2 == "spark"
    assert _rows(df2, "a", "n") == [(0, 4), (1, 4), (2, 4)]


def test_attach_table_maintains_rollup_on_insert(spark):
    import os as _os
    import shutil as _shutil

    from palo_spark.tables import Table

    loc = _os.path.join(ROOT, "attach_t")
    _shutil.rmtree(loc, ignore_errors=True)
    t = Table(spark, "attach_t", "DUPLICATE", ["a"], location=loc)
    t.insert(spark.createDataFrame([Row(a=a, b=0, x=float(a), y=a) for a in range(3)]))

    cat = RollupCatalog(spark, root=ROOT + "_attach")
    cat.register_base("att", t.read())
    cat.add_rollup("att_by_a", "att", ["a"], [Measure("count"), Measure("dsum", "x")])
    cat.attach_table("att", t)

    # a load is folded into the rollup with NO explicit refresh call
    t.insert(spark.createDataFrame([Row(a=1, b=1, x=10.0, y=9), Row(a=5, b=0, x=2.0, y=0)]))
    df, src = cat.query("att", ["a"], [Measure("count"), Measure("dsum", "x")])
    assert src == "att_by_a"
    got = _rows(df, "a", "count_all", "dsum_x")
    assert (1, 2, 11.0) in got and (5, 1, 2.0) in got


def test_attach_table_unique_falls_back_to_refresh(spark):
    import os as _os
    import shutil as _shutil

    from palo_spark.tables import Table

    loc = _os.path.join(ROOT, "attach_u")
    _shutil.rmtree(loc, ignore_errors=True)
    t = Table(spark, "attach_u", "UNIQUE", ["a"], location=loc)
    t.insert(spark.createDataFrame([Row(a=1, x=10.0), Row(a=2, x=20.0)]))

    cat = RollupCatalog(spark, root=ROOT + "_attach_u")
    cat.register_base("attu", t.read())
    cat.add_rollup("attu_all", "attu", ["a"], [Measure("dsum", "x")])
    cat.attach_table("attu", t)

    # upsert REPLACES a=1: a delta-merge would double-count; refresh must not
    t.insert(spark.createDataFrame([Row(a=1, x=100.0)]))
    df, src = cat.query("attu", ["a"], [Measure("dsum", "x")])
    assert src == "attu_all"
    assert dict(_rows(df, "a", "dsum_x")) == {1: 100.0, 2: 20.0}
