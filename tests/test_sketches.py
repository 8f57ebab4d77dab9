"""Unit tests for bitmap/HLL sketch columns (palo_spark/functions/sketches)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palo_spark.functions.sketches import (
    _bm_de,
    _hll_de,
    _hll_empty,
    _hll_add,
    _hll_estimate,
    bitmap_and,
    bitmap_andnot,
    bitmap_contains,
    bitmap_count,
    bitmap_from_string,
    bitmap_or,
    bitmap_to_array,
    bitmap_to_string,
    bitmap_union_of_bitmaps,
    bitmap_union_of_values,
    bitmap_xor,
    hll_cardinality,
    hll_union_agg,
    hll_union_agg_values,
    to_bitmap,
)


def _kv(spark, pairs):
    return spark.createDataFrame([Row(g=g, v=v) for g, v in pairs], "g int, v long")


def test_bitmap_union_exact_distinct(spark):
    df = _kv(spark, [(1, 5), (1, 5), (1, 7), (2, 1), (2, None)])
    got = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(bitmap_union_of_values("v").alias("bm"))
        .select("g", bitmap_count("bm").alias("n"))
        .collect()
    }
    assert got == {1: 2, 2: 1}


def test_bitmap_scalar_algebra(spark):
    df = spark.createDataFrame([Row(a="1,2,3,4", b="3,4,5")])
    out = df.select(
        bitmap_count(bitmap_and(bitmap_from_string("a"), bitmap_from_string("b"))).alias("i"),
        bitmap_count(bitmap_or(bitmap_from_string("a"), bitmap_from_string("b"))).alias("u"),
        bitmap_count(bitmap_xor(bitmap_from_string("a"), bitmap_from_string("b"))).alias("x"),
        bitmap_count(bitmap_andnot(bitmap_from_string("a"), bitmap_from_string("b"))).alias("d"),
        bitmap_contains(bitmap_from_string("a"), 2).alias("has2"),
        bitmap_contains(bitmap_from_string("b"), 2).alias("bhas2"),
        bitmap_to_string(bitmap_and(bitmap_from_string("a"), bitmap_from_string("b"))).alias("s"),
        bitmap_to_array(bitmap_from_string("b")).alias("arr"),
    ).collect()[0]
    assert (out["i"], out["u"], out["x"], out["d"]) == (2, 5, 3, 2)
    assert out["has2"] and not out["bhas2"]
    assert out["s"] == "3,4"
    assert out["arr"] == [3, 4, 5]


def test_bitmap_merge_matches_direct(spark):
    df = _kv(spark, [(g, v) for g in (1, 2) for v in range(50)] + [(1, 999)])
    partial = df.withColumn("sub", F.col("v") % 5).groupBy("g", "sub").agg(
        bitmap_union_of_values("v").alias("bm")
    )
    merged = partial.groupBy("g").agg(bitmap_union_of_bitmaps("bm").alias("bm"))
    got = {r["g"]: r["n"] for r in merged.select("g", bitmap_count("bm").alias("n")).collect()}
    assert got == {1: 51, 2: 50}


def test_to_bitmap_roundtrip(spark):
    df = spark.createDataFrame([Row(v=42)])
    row = df.select(bitmap_to_array(to_bitmap("v")).alias("a")).collect()[0]
    assert row["a"] == [42]


def test_hll_estimate_accuracy_pure_python():
    regs = _hll_empty()
    _hll_add(regs, range(10000))
    est = _hll_estimate(regs)
    assert abs(est - 10000) <= 0.05 * 10000  # p=12 → rse ~1.6%


def test_hll_small_cardinality_linear_counting():
    regs = _hll_empty()
    _hll_add(regs, range(10))
    assert _hll_estimate(regs) == 10  # linear counting regime is exact-ish


def test_hll_merge_is_register_max(spark):
    df = _kv(spark, [(1, v) for v in range(2000)] + [(2, v) for v in range(1000, 3000)])
    parts = df.groupBy("g").agg(hll_union_agg_values("v").alias("hll"))
    merged = parts.agg(hll_union_agg("hll").alias("m")).collect()[0]["m"]
    direct = (
        df.select("v").agg(hll_union_agg_values("v").alias("d")).collect()[0]["d"]
    )
    assert np.array_equal(_hll_de(merged), _hll_de(direct))
    est = parts.agg(hll_union_agg("hll").alias("m")).select(
        hll_cardinality("m").alias("c")
    ).collect()[0]["c"]
    assert abs(est - 3000) <= 0.06 * 3000


def test_bitmap_rejects_foreign_bytes():
    with pytest.raises(ValueError):
        _bm_de(b"NOTABITMAP")
    with pytest.raises(ValueError):
        _hll_de(b"NOTANHLL..")


# ------------------------------------------------------------ quantile state


def test_quantile_state_rank_error_bound():
    from palo_spark.functions.sketches import _qs_compress, _qs_quantile

    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=50_000)
    m, w = _qs_compress(vals, np.ones_like(vals))
    assert m.size <= 257
    for p in (0.05, 0.5, 0.95):
        est = _qs_quantile(m, w, p)
        rank = float(np.mean(vals <= est))
        assert abs(rank - p) <= 0.01, (p, rank)


def test_quantile_union_merge_stays_in_bound():
    from palo_spark.functions.sketches import _qs_compress, _qs_quantile

    rng = np.random.default_rng(11)
    vals = rng.normal(size=40_000)
    # 8 partials merged = concat centroid lists + recompress
    parts = [
        _qs_compress(chunk, np.ones_like(chunk))
        for chunk in np.array_split(vals, 8)
    ]
    m = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    mm, mw = _qs_compress(m, w)
    assert float(mw.sum()) == float(len(vals))
    for p in (0.1, 0.5, 0.9):
        est = _qs_quantile(mm, mw, p)
        rank = float(np.mean(vals <= est))
        assert abs(rank - p) <= 0.02, (p, rank)


def test_quantile_state_spark_udaf(spark):
    from palo_spark.functions.sketches import (
        quantile_percent,
        quantile_state_of_values,
        quantile_union,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").cast("double").alias("x")
    )
    direct = df.groupBy("g").agg(quantile_state_of_values("x").alias("qs"))
    got = {
        r["g"]: r["p50"]
        for r in direct.select("g", quantile_percent("qs", 0.5).alias("p50")).collect()
    }
    for g, est in got.items():
        # group g holds {g, g+4, ...}: median ~ 4999.5 ± rank bound
        assert abs(est - 5000.0) <= 200.0, (g, est)
    # merge path: partials by finer key, union up
    partial = df.withColumn("sub", F.col("x") % 16).groupBy("g", "sub").agg(
        quantile_state_of_values("x").alias("qs")
    )
    merged = partial.groupBy("g").agg(quantile_union("qs").alias("qs"))
    got_m = {
        r["g"]: r["p50"]
        for r in merged.select("g", quantile_percent("qs", 0.5).alias("p50")).collect()
    }
    for g, est in got_m.items():
        assert abs(est - 5000.0) <= 300.0, (g, est)


def test_grouped_bitmap_salted_equals_direct(spark):
    from palo_spark.functions.sketches import grouped_bitmap_union_values

    # skewed: group 1 holds 500 values (with dups), group 2 holds 3
    pairs = [(1, i % 250) for i in range(500)] + [(2, v) for v in (7, 8, 7)]
    df = _kv(spark, pairs)
    direct = df.groupBy("g").agg(bitmap_union_of_values("v").alias("bm"))
    salted = grouped_bitmap_union_values(df, "g", "v", out_col="bm", salt_buckets=8)
    d = {r["g"]: bytes(r["bm"]) for r in direct.collect()}
    s = {r["g"]: bytes(r["bm"]) for r in salted.collect()}
    assert d == s  # exact same serialized bitmaps


def test_grouped_hll_salted_equals_direct(spark):
    from palo_spark.functions.sketches import grouped_hll_union_values

    pairs = [(1, i % 300) for i in range(600)] + [(2, v) for v in range(10)]
    df = _kv(spark, pairs)
    direct = df.groupBy("g").agg(hll_union_agg_values("v").alias("hll"))
    salted = grouped_hll_union_values(df, "g", "v", out_col="hll", salt_buckets=8)
    d = {r["g"]: bytes(r["hll"]) for r in direct.collect()}
    s = {r["g"]: bytes(r["hll"]) for r in salted.collect()}
    assert d == s  # register-max merge is associative → bit-identical


def test_bitmap_subset_and_count_scalars(spark):
    from palo_spark.functions.sketches import (
        bitmap_and_count,
        bitmap_andnot_count,
        bitmap_has_all,
        bitmap_has_any,
        bitmap_max,
        bitmap_min,
        bitmap_or_count,
        bitmap_subset_in_range,
        bitmap_subset_limit,
        bitmap_to_string,
        bitmap_xor_count,
        sub_bitmap,
    )

    df = spark.createDataFrame([Row(a="1,3,5,7,9", b="5,7,11")]).select(
        bitmap_from_string("a").alias("ba"), bitmap_from_string("b").alias("bb")
    )
    r = df.select(
        bitmap_min("ba").alias("mn"),
        bitmap_max("ba").alias("mx"),
        bitmap_has_any("ba", "bb").alias("any"),
        bitmap_has_all("ba", "bb").alias("all"),
        bitmap_to_string(sub_bitmap("ba", 1, 2)).alias("sub"),
        bitmap_to_string(sub_bitmap("ba", -2, 2)).alias("sub_neg"),
        bitmap_to_string(bitmap_subset_limit("ba", 5, 2)).alias("lim"),
        bitmap_to_string(bitmap_subset_in_range("ba", 3, 8)).alias("rng"),
        bitmap_and_count("ba", "bb").alias("n_and"),
        bitmap_or_count("ba", "bb").alias("n_or"),
        bitmap_xor_count("ba", "bb").alias("n_xor"),
        bitmap_andnot_count("ba", "bb").alias("n_andnot"),
    ).head()
    assert (r["mn"], r["mx"]) == (1, 9)
    assert (r["any"], r["all"]) == (True, False)  # 11 not in ba
    assert r["sub"] == "3,5" and r["sub_neg"] == "7,9"
    assert r["lim"] == "5,7" and r["rng"] == "3,5,7"
    assert (r["n_and"], r["n_or"], r["n_xor"], r["n_andnot"]) == (2, 6, 4, 3)


def test_bitmap_min_max_empty_is_null(spark):
    from palo_spark.functions.sketches import bitmap_max, bitmap_min

    df = spark.createDataFrame([Row(a="")]).select(bitmap_from_string("a").alias("bm"))
    r = df.select(bitmap_min("bm").alias("mn"), bitmap_max("bm").alias("mx")).head()
    assert r["mn"] is None and r["mx"] is None


def test_weighted_quantile_state_equals_repeats(spark):
    """A weight-w value must behave exactly like w repeated rows."""
    from palo_spark.functions.sketches import (
        quantile_percent,
        quantile_state_of_values,
        quantile_state_weighted,
    )

    vals = [(1.0, 3), (5.0, 1), (9.0, 2), (2.0, 4)]
    weighted = spark.createDataFrame(vals, "x double, w int")
    expanded = spark.createDataFrame(
        [(x,) for x, w in vals for _ in range(w)], "x double"
    )
    qw = weighted.agg(quantile_state_weighted("x", "w").alias("qs"))
    qe = expanded.agg(quantile_state_of_values("x").alias("qs"))
    for p in (0.1, 0.5, 0.9):
        got_w = qw.select(quantile_percent("qs", p).alias("v")).head()["v"]
        got_e = qe.select(quantile_percent("qs", p).alias("v")).head()["v"]
        assert abs(got_w - got_e) < 1e-9, (p, got_w, got_e)
