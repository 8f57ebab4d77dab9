"""Pins for the r12 optimization round's operator-internal changes.

Each test pins the BEHAVIOR the optimization relies on (not timings):
the table-handle cache returns live lazy plans, the partitioned
unbucketed write bounds files-per-load at one per label, the
substring-dedup window rewrite matches the join formulation row for
row, and the partition-rollup refresh still writes one aggregate file
per stale label after the parallel-write change.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_load_table_handle_cache_identity_and_freshness(spark, sf_dir):
    """Same (session, sf_dir, table) → the SAME lazy DataFrame handle
    (the py4j schema-inference round-trip is paid once), and the handle
    still reads CURRENT parquet state — nothing row-level is cached."""
    from palo_spark.catalog import load_table

    a = load_table(spark, sf_dir, "orders")
    b = load_table(spark, sf_dir, "orders")
    assert a is b, "second load must hit the handle cache"
    # distinct tables / sf_dirs get distinct slots
    c = load_table(spark, sf_dir, "customer")
    assert c is not a
    # the cached handle is a lazy plan over the files: counts agree with
    # a fresh read (i.e. the cache holds no materialized rows)
    fresh = spark.read.parquet(f"{sf_dir.rstrip('/')}/orders.parquet")
    assert a.count() == fresh.count()


def test_load_table_cache_invalidates_on_rewrite(spark, tmp_path):
    """load_table is also used on MUTABLE dirs (the result-cache
    lifecycle fuzzer overwrites catalog tables through it): a rewrite of
    the underlying parquet path must invalidate the cached handle — a
    stale handle would hold the old file listing and fail with
    FILE_NOT_EXIST (the exact failure the r12 fuzzer caught before the
    mtime key was added)."""
    import time as _time

    from palo_spark.catalog import load_table

    d = str(tmp_path)
    spark.range(10).toDF("x").write.parquet(f"{d}/t.parquet")
    first = load_table(spark, d, "t")
    assert first.count() == 10
    _time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    spark.range(25).toDF("x").write.mode("overwrite").parquet(f"{d}/t.parquet")
    again = load_table(spark, d, "t")
    assert again is not first
    assert again.count() == 25


def test_partitioned_unbucketed_load_writes_one_file_per_label(spark, tmp_path):
    """The §6 hash-distribute-by-label write: a multi-task load into an
    AUTO PARTITION (month) table must land exactly ONE data file per
    month label, not tasks×labels small files."""
    from palo_spark.tables import Table

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        F.expr("date_add(date'2024-01-01', cast(id % 180 as int))").alias("d"),
        (F.col("id") * 2).alias("v"),
    ).repartition(8)  # multi-task input — the pre-fix pathology source
    t = Table(
        spark,
        "r12_opt_files_per_label",
        keys_type="DUPLICATE",
        key_cols=["k"],
        auto_partition=("d", "month"),
        location=str(tmp_path / "t"),
    )
    t.insert(df)
    from palo_spark.tables import AUTO_PART_COL

    rowset = t.meta.rowsets[-1]["path"]
    labels = [e for e in os.listdir(rowset) if e.startswith(f"{AUTO_PART_COL}=")]
    assert len(labels) == 6  # 180 days → 6 month labels
    for lbl in labels:
        files = [
            f
            for f in os.listdir(os.path.join(rowset, lbl))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{lbl}: {files}"


def test_substring_dedup_window_form_matches_join_form(spark):
    """The window-MIN first-seen rewrite must keep every row of the
    former groupBy+join formulation (computed inline here as the
    reference)."""
    from palo_spark.operators import substring_dup_docs

    rows = [
        (1, "a b c d e f g h i j k l m n o p q r"),
        (2, "x y z " + " ".join(f"w{i}" for i in range(20))),
        # doc 3 shares a 16-token run with doc 1 → dropped
        (3, "zz qq a b c d e f g h i j k l m n o p"),
        (4, "totally different text with its own words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in substring_dup_docs(df, k=16, hash_grams=False).collect()
    )
    assert kept == [1, 2, 4]
    # reference: the pre-r12 join formulation, inline
    from palo_spark.operators.text import tokenize

    toks = tokenize(F.col("text"))
    n_eff = F.size(toks) - F.lit(15)
    starts = F.when(
        n_eff > 0, F.transform(F.sequence(F.lit(0), n_eff - 1), lambda i: i)
    ).otherwise(F.array().cast("array<int>"))
    grams = df.select(
        F.col("doc_id").alias("__id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    starts,
                    lambda i: F.array_join(
                        F.slice(tokenize(F.col("text")), i + 1, 16), " "
                    ),
                )
            )
        ).alias("__gram"),
    )
    first = grams.groupBy("__gram").agg(F.min("__id").alias("__first"))
    dup = (
        grams.join(first, "__gram")
        .filter(F.col("__id") > F.col("__first"))
        .select("__id")
        .distinct()
    )
    ref_kept = sorted(
        r["doc_id"]
        for r in df.join(
            dup, df["doc_id"] == dup["__id"], "left_anti"
        ).collect()
    )
    assert kept == ref_kept


def test_simhash_fingerprints_match_column_fold(spark):
    """The codegen explode+groupBy simhash must be bit-identical to the
    per-row fold Column form — including a NULL text (fold yields 0;
    explode would drop the row without the left-join backfill) and the
    60-bit md5 portable hash."""
    from palo_spark.operators.dedup import (
        md5_token_hash,
        simhash,
        simhash_fingerprints,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, ""),
        (4, None),
        (5, "  spaced   out   tokens  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for kw in (
        {},
        {"bits": 60, "token_hash": md5_token_hash},
    ):
        fold = {
            r["doc_id"]: r["fp"]
            for r in df.select(
                "doc_id", simhash("text", **kw).alias("fp")
            ).collect()
        }
        fast = {
            r["__id"]: r["__fp"]
            for r in simhash_fingerprints(df, "text", "doc_id", **kw).collect()
        }
        assert fold == fast, kw


def test_partition_rollup_refresh_parallel_write_one_file_per_label(
    spark, sf_dir, tmp_path
):
    """After the parallel refresh write, the store still holds exactly
    one aggregate parquet file per partition label."""
    from palo_spark.catalog import load_table
    from palo_spark.plans import Measure
    from palo_spark.plans.partition_rollup import PartitionRollup
    from palo_spark.tables import Table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    t = Table(
        spark,
        "r12_opt_prollup",
        keys_type="UNIQUE",
        key_cols=["o_orderkey", "o_orderdate"],
        auto_partition=("o_orderdate", "month"),
        location=str(tmp_path / "t"),
    )
    t.insert(o)
    roll = PartitionRollup(
        t,
        ["o_orderpriority"],
        [Measure("dsum", "o_totalprice"), Measure("count")],
        store=str(tmp_path / "store"),
    )
    refreshed = roll.refresh()
    assert refreshed  # every label stale on first build
    for lbl in refreshed:
        pdir = roll._part_dir(lbl)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        assert len(files) == 1, f"{lbl}: {files}"
    # and the merged answer equals the direct aggregate over the table
    got = {
        r["o_orderpriority"]: r["count_all"]
        for r in roll.read().collect()
    }
    want = {
        r["o_orderpriority"]: r["n"]
        for r in t.read()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
