"""Unit tests for Doris table-model semantics (palo_spark/tables.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palo_spark.tables import Table

ROOT = f"/tmp/palo_spark_test_tables_{os.getpid()}"


def _mk(spark, name, **kw) -> Table:
    loc = os.path.join(ROOT, name)
    shutil.rmtree(loc, ignore_errors=True)
    return Table(spark, name, location=loc, **kw)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_duplicate_appends_everything(spark):
    t = _mk(spark, "dup", keys_type="DUPLICATE", key_cols=["k"])
    df = spark.createDataFrame([Row(k=1, x=10), Row(k=1, x=20)])
    t.insert(df)
    t.insert(df)
    assert t.read().count() == 4


def test_unique_latest_version_wins(spark):
    t = _mk(spark, "uniq", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=10), Row(k=2, x=20)]))
    t.insert(spark.createDataFrame([Row(k=2, x=99), Row(k=3, x=30)]))
    assert _rows(t.read(), "k", "x") == [(1, 10), (2, 99), (3, 30)]


def test_unique_sequence_col_breaks_in_batch_ties(spark):
    t = _mk(spark, "uniq_seq", keys_type="UNIQUE", key_cols=["k"], sequence_col="seq")
    t.insert(
        spark.createDataFrame(
            [Row(k=1, seq=5, x="a"), Row(k=1, seq=9, x="b"), Row(k=1, seq=7, x="c")]
        )
    )
    assert _rows(t.read(), "k", "x") == [(1, "b")]
    # the sequence value decides across loads (out-of-order ingestion):
    # a later insert with a LOWER sequence must not overwrite seq=9
    t.insert(spark.createDataFrame([Row(k=1, seq=1, x="z")]))
    assert _rows(t.read(), "k", "x") == [(1, "b")]
    # a later insert with a higher sequence does replace
    t.insert(spark.createDataFrame([Row(k=1, seq=12, x="w")]))
    assert _rows(t.read(), "k", "x") == [(1, "w")]
    # equal sequence → later load version wins (tie-break)
    t.insert(spark.createDataFrame([Row(k=1, seq=12, x="w2")]))
    assert _rows(t.read(), "k", "x") == [(1, "w2")]


def test_aggregate_merge_semantics(spark):
    t = _mk(
        spark,
        "aggt",
        keys_type="AGGREGATE",
        key_cols=["k"],
        agg_spec={"s": "SUM", "mn": "MIN", "mx": "MAX", "r": "REPLACE", "rn": "REPLACE_IF_NOT_NULL"},
    )
    t.insert(spark.createDataFrame([Row(k=1, s=10, mn=5, mx=5, r="v1", rn="keep")]))
    t.insert(
        spark.createDataFrame(
            [(1, 7, 3, 9, "v2", None), (2, 1, 1, 1, "new", None)],
            "k long, s long, mn long, mx long, r string, rn string",
        )
    )
    got = {r["k"]: r for r in t.read().collect()}
    assert got[1]["s"] == 17 and got[1]["mn"] == 3 and got[1]["mx"] == 9
    assert got[1]["r"] == "v2"
    assert got[1]["rn"] == "keep"  # REPLACE_IF_NOT_NULL ignores the NULL in v2
    assert got[2]["s"] == 1 and got[2]["rn"] is None


def test_label_dedup_is_idempotent(spark):
    t = _mk(spark, "labels", keys_type="DUPLICATE", key_cols=["k"])
    df = spark.createDataFrame([Row(k=1, x=1)])
    assert t.insert(df, label="load-1") == 1
    assert t.insert(df, label="load-1") == -1  # replayed label → no-op
    assert t.read().count() == 1


def test_delete_where_keeps_null_predicate_rows(spark):
    t = _mk(spark, "del", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=5), Row(k=2, x=-1), Row(k=3, x=None)]))
    t.delete_where("x < 0")
    assert _rows(t.read(), "k") == [(1,), (3,)]


def test_compact_single_rowset_same_view(spark):
    t = _mk(spark, "cmp", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=i, x=i) for i in range(10)]))
    t.insert(spark.createDataFrame([Row(k=i, x=i * 100) for i in range(0, 10, 2)]))
    before = _rows(t.read(), "k", "x")
    t.compact()
    assert len(t.meta.rowsets) == 1
    assert _rows(t.read(), "k", "x") == before


def test_open_reattaches(spark):
    t = _mk(spark, "reopen", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=1)]))
    t2 = Table.open(spark, t.location)
    assert t2.meta.keys_type == "UNIQUE"
    assert t2.read().count() == 1


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="keys_type"):
        _mk(spark, "bad1", keys_type="NOPE", key_cols=["k"])
    with pytest.raises(ValueError, match="agg_spec"):
        _mk(spark, "bad2", keys_type="AGGREGATE", key_cols=["k"])
    with pytest.raises(ValueError, match="key column"):
        _mk(spark, "bad3", keys_type="AGGREGATE", key_cols=["k"], agg_spec={"k": "SUM"})
    t = _mk(spark, "bad4", keys_type="UNIQUE", key_cols=["k"])
    with pytest.raises(ValueError, match="missing key"):
        t.insert(spark.createDataFrame([Row(z=1)]))


def _file_stamps(t):
    stamps = {}
    for r in t.meta.rowsets:
        for dp, _, fns in os.walk(r["path"]):
            for fn in fns:
                p = os.path.join(dp, fn)
                st = os.stat(p)
                stamps[p] = (st.st_size, st.st_mtime_ns)
    return stamps


def test_delete_is_deferred_and_versioned(spark):
    t = _mk(spark, "defdel", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=5), Row(k=2, x=-1), Row(k=3, x=-7)]))
    before = _file_stamps(t)
    v = t.delete_where("x < 0")
    assert _file_stamps(t) == before  # no storage touched
    assert t.meta.deletes == [{"version": v, "predicate": "x < 0"}]
    assert _rows(t.read(), "k") == [(1,)]
    # a load AFTER the delete is not subject to the predicate
    t.insert(spark.createDataFrame([Row(k=4, x=-9)]))
    assert _rows(t.read(), "k") == [(1,), (4,)]
    # compact folds the predicate into storage and clears it
    t.compact()
    assert t.meta.deletes == [] and len(t.meta.rowsets) == 1
    assert _rows(t.read(), "k") == [(1,), (4,)]


def test_delete_survives_reopen(spark):
    t = _mk(spark, "defdel2", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=1), Row(k=2, x=-2)]))
    t.delete_where("x < 0")
    t2 = Table.open(spark, t.location)
    assert _rows(t2.read(), "k") == [(1,)]


def test_delete_requires_sql_string(spark):
    t = _mk(spark, "defdel3", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=1)]))
    with pytest.raises(TypeError, match="SQL predicate string"):
        t.delete_where(F.col("x") < 0)


def test_auto_compact_bounds_rowsets(spark):
    t = _mk(spark, "autoc", keys_type="DUPLICATE", key_cols=["k"], auto_compact_rowsets=3)
    for i in range(7):
        t.insert(spark.createDataFrame([Row(k=i, x=i)]))
    assert len(t.meta.rowsets) <= 3  # compaction kept read fan-in bounded
    assert t.read().count() == 7


def test_add_column_is_metadata_only(spark):
    t = _mk(spark, "addcol", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=10), Row(k=2, x=20)]))
    before = _file_stamps(t)
    t.add_column("tier", "string", default="STANDARD")
    assert _file_stamps(t) == before  # no rowset rewritten
    # old rows surface the default
    assert _rows(t.read(), "k", "tier") == [(1, "STANDARD"), (2, "STANDARD")]
    # a load including the column keeps its values — explicit NULL survives
    t.insert(spark.createDataFrame(
        [(3, 30, "GOLD"), (4, 40, None)], "k long, x long, tier string"))
    # a load OMITTING the optional column gets the default
    t.insert(spark.createDataFrame([Row(k=5, x=50)]))
    got = dict(_rows(t.read(), "k", "tier"))
    assert got == {1: "STANDARD", 2: "STANDARD", 3: "GOLD", 4: None, 5: "STANDARD"}
    # survives reopen
    t2 = Table.open(spark, t.location)
    assert dict(_rows(t2.read(), "k", "tier"))[5] == "STANDARD"


def test_add_column_aggregate_with_agg_spec(spark):
    t = _mk(spark, "addagg", keys_type="AGGREGATE", key_cols=["k"], agg_spec={"s": "SUM"})
    t.insert(spark.createDataFrame([Row(k=1, s=10)]))
    t.add_column("cnt", "long", default=0, agg="SUM")
    t.insert(spark.createDataFrame([Row(k=1, s=5, cnt=2), Row(k=2, s=1, cnt=7)]))
    got = {r["k"]: (r["s"], r["cnt"]) for r in t.read().collect()}
    assert got == {1: (15, 2), 2: (1, 7)}  # old rowset contributes default 0
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("cnt", "long")


def _ts_rows(spark, days, n_per_day=4):
    rows = []
    for d in days:
        for i in range(n_per_day):
            rows.append(Row(id=d * 100 + i, ts=f"2024-01-{d:02d} 0{i}:30:00", v=float(i)))
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_auto_partition_layout_and_listing(spark, tmp_path):
    t = Table(
        spark, "ev", "DUPLICATE", ["id"],
        location=str(tmp_path / "ev"), auto_partition=("ts", "day"),
    )
    t.insert(_ts_rows(spark, range(1, 11)))
    parts = t.partitions()
    assert parts == [f"d2024-01-{d:02d}" for d in range(1, 11)]
    # labels are strings on read-back (prefix defeats type inference)
    from palo_spark.tables import AUTO_PART_COL
    schema = dict(t.read().dtypes)
    assert schema[AUTO_PART_COL] == "string"


def test_auto_partition_scan_prunes_files(spark, tmp_path):
    t = Table(
        spark, "ev2", "DUPLICATE", ["id"],
        location=str(tmp_path / "ev2"), auto_partition=("ts", "day"),
    )
    t.insert(_ts_rows(spark, range(1, 21)))
    full = (
        t.read().select(F.input_file_name().alias("f")).distinct().count()
    )
    pruned_df = t.scan("ts >= '2024-01-18'")
    touched = (
        t.read(partition_pred=t._prune_predicate("ts >= '2024-01-18'"))
        .select(F.input_file_name().alias("f")).distinct().count()
    )
    assert touched < full / 3, (touched, full)
    # pruned result == unpruned filter result
    got = sorted(r["id"] for r in pruned_df.collect())
    want = sorted(
        r["id"] for r in t.read().filter("ts >= '2024-01-18'").collect()
    )
    assert got == want and got


def test_auto_partition_unique_upsert_prunes_soundly(spark, tmp_path):
    t = Table(
        spark, "evu", "UNIQUE", ["id", "ts"],
        location=str(tmp_path / "evu"), auto_partition=("ts", "day"),
    )
    t.insert(_ts_rows(spark, [1, 2, 3]))
    # upsert day 2 rows with new values (same keys -> same partition)
    upd = _ts_rows(spark, [2]).withColumn("v", F.col("v") + 100.0)
    t.insert(upd)
    out = t.scan("ts = '2024-01-02 01:30:00'").collect()
    assert len(out) == 1 and out[0]["v"] == 101.0
    # equality predicate at day granularity prunes to one partition
    pred = t._prune_predicate("ts = '2024-01-02 01:30:00'")
    assert pred is not None
    # BETWEEN form and unsupported (OR) form
    assert t._prune_predicate("ts BETWEEN '2024-01-01' AND '2024-01-02'") is not None
    assert t._prune_predicate("ts >= '2024-01-01' OR v > 5") is None


def test_auto_partition_validation_and_compact(spark, tmp_path):
    with pytest.raises(ValueError, match="granularity"):
        Table(spark, "bad", "DUPLICATE", ["id"], auto_partition=("ts", "week"))
    with pytest.raises(ValueError, match="key column"):
        Table(spark, "bad2", "UNIQUE", ["id"], auto_partition=("ts", "day"))
    t = Table(
        spark, "evc", "DUPLICATE", ["id"],
        location=str(tmp_path / "evc"), auto_partition=("ts", "month"),
    )
    t.insert(_ts_rows(spark, [1, 2]))
    t.insert(_ts_rows(spark, [15]))
    assert t.partitions() == ["m2024-01"]
    t.compact()
    assert len(t.meta.rowsets) == 1 and t.partitions() == ["m2024-01"]
    assert t.read().count() == 12


def test_drop_and_rename_column_light_schema_change(spark, tmp_path):
    t = Table(spark, "sc", "UNIQUE", ["k"], location=str(tmp_path / "sc"))
    t.insert(spark.createDataFrame([Row(k=1, a=10, b="x"), Row(k=2, a=20, b="y")]))
    t.rename_column("a", "amount")
    assert "amount" in t.read().columns and "a" not in t.read().columns
    # new loads use the new name; old rowsets surface it via the rename map
    t.insert(spark.createDataFrame([Row(k=3, amount=30, b="z")]))
    got = {r["k"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 10, 2: 20, 3: 30}
    t.drop_column("b")
    assert "b" not in t.read().columns
    assert t.read().count() == 3
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("k")
    # dropped columns stay gone through compaction
    t.compact()
    assert set(t.read().columns) == {"k", "amount"}


def test_drop_partition_and_retention(spark, tmp_path):
    t = Table(
        spark, "ret", "DUPLICATE", ["id"],
        location=str(tmp_path / "ret"),
        auto_partition=("ts", "day"),
        dynamic_partition_retention=3,
    )
    t.insert(_ts_rows(spark, [1, 2, 3, 4, 5]))
    # retention keeps only the newest 3 day-partitions
    assert t.partitions() == ["d2024-01-03", "d2024-01-04", "d2024-01-05"]
    assert t.read().count() == 12
    assert t.drop_partition("d2024-01-03") is True
    assert t.partitions() == ["d2024-01-04", "d2024-01-05"]
    assert t.drop_partition("d2024-01-03") is False
    # a non-partitioned table refuses
    t2 = Table(spark, "np", "DUPLICATE", ["id"], location=str(tmp_path / "np"))
    with pytest.raises(ValueError, match="partitioned table"):
        t2.drop_partition("x")


def test_all_partitions_expired_rowset_is_skipped(spark, tmp_path):
    t = Table(
        spark, "exp", "DUPLICATE", ["id"],
        location=str(tmp_path / "exp"), auto_partition=("ts", "day"),
    )
    t.insert(_ts_rows(spark, [1]))
    t.insert(_ts_rows(spark, [2]))
    t.drop_partition("d2024-01-01")  # first rowset fully expired
    assert t.read().count() == 4
    assert t.partitions() == ["d2024-01-02"]


def test_aggregate_table_bitmap_and_hll_union_columns(spark, tmp_path):
    """Doris's pre-aggregated distinct-count pattern: an AGGREGATE table
    with BITMAP_UNION / HLL_UNION columns merges sketch states across
    loads; bitmap counts are exact, HLL within its error bound."""
    from palo_spark.functions import sketches as SK

    t = Table(
        spark, "aud", "AGGREGATE", ["seg"],
        agg_spec={"users_bm": "BITMAP_UNION", "users_hll": "HLL_UNION"},
        location=str(tmp_path / "aud"),
    )

    def batch(lo, hi):
        df = spark.range(lo, hi).select(
            (F.col("id") % 3).cast("string").alias("seg"),
            F.col("id").alias("uid"),
        )
        return df.groupBy("seg").agg(
            SK.bitmap_union_of_values("uid").alias("users_bm"),
            SK.hll_union_agg_values(F.col("uid").cast("string")).alias("users_hll"),
        )

    t.insert(batch(0, 300))
    t.insert(batch(150, 450))  # overlapping uids must not double-count
    out = t.read().select(
        "seg",
        SK.bitmap_count("users_bm").alias("exact"),
        SK.hll_cardinality("users_hll").alias("approx"),
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["exact"] == 150  # 450 distinct uids over 3 segments
        assert abs(r["approx"] - 150) / 150 < 0.15
    # compaction folds the merge into storage and stays correct
    t.compact()
    out2 = {r["seg"]: r for r in t.read().select(
        "seg", SK.bitmap_count("users_bm").alias("exact")
    ).collect()}
    assert all(v["exact"] == 150 for v in out2.values())


def test_prune_predicate_fail_open_cases(spark, tmp_path):
    """The FE-style pruner must be conservative: anything it cannot
    prove maps to NO pruning (correctness never depends on it)."""
    t = Table(
        spark, "fo", "DUPLICATE", ["id"],
        location=str(tmp_path / "fo"), auto_partition=("ts", "day"),
    )
    t.insert(_ts_rows(spark, [1, 2, 3]))
    # OR / parens / non-literal / other-column predicates: no pruning
    for w in [
        "ts >= '2024-01-02' OR v > 1",
        "(ts >= '2024-01-02')",
        "ts >= cast(v as timestamp)",
        "v > 1",
        "ts >= 'not-a-date'",
    ]:
        assert t._prune_predicate(w) is None
    # and scan() still answers correctly without pruning
    for w in ["ts >= '2024-01-02' OR v > 1", "(ts >= '2024-01-02')", "v > 1"]:
        got = {r["id"] for r in t.scan(w).collect()}
        want = {r["id"] for r in t.read().filter(w).collect()}
        assert got == want
    # mixed conjunct: prunable part prunes, rest row-filters
    pred = t._prune_predicate("ts >= '2024-01-02' AND v > 1.5")
    assert pred is not None
    got = sorted(r["id"] for r in t.scan("ts >= '2024-01-02' AND v > 1.5").collect())
    want = sorted(
        r["id"] for r in t.read().filter("ts >= '2024-01-02' AND v > 1.5").collect()
    )
    assert got == want


def test_modify_column_type_is_metadata_only(spark, tmp_path):
    t = Table(spark, "mt", "DUPLICATE", ["k"], location=str(tmp_path / "mt"))
    t.insert(spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)]))
    import glob
    files_before = sorted(glob.glob(f"{t.location}/rowset_*/*.parquet"))
    t.modify_column_type("v", "double")
    assert dict(t.read().dtypes)["v"] == "double"
    assert {r["v"] for r in t.read().collect()} == {10.0, 20.0}
    # no rowset rewritten
    assert sorted(glob.glob(f"{t.location}/rowset_*/*.parquet")) == files_before
    # later loads may carry either type; the view stays the new type
    t.insert(spark.createDataFrame([Row(k=3, v=5)]))
    assert dict(t.read().dtypes)["v"] == "double"
    assert t.read().count() == 3


def test_modify_column_type_rejects_structural_columns(spark, tmp_path):
    """Light type change is value-column only: a lax narrowing cast on a
    KEY column would NULL unrepresentable keys and silently merge
    distinct rows; partition/distribution columns drove the physical
    layout at write time, so a read-time cast would desync pruning and
    bucketing from storage."""
    t = Table(spark, "mt_guard", "UNIQUE", ["k"], sequence_col="seq",
              location=str(tmp_path / "mtg"))
    t.insert(spark.createDataFrame([Row(k=1, seq=1, v=10)]))
    with pytest.raises(ValueError, match="key column"):
        t.modify_column_type("k", "string")
    with pytest.raises(ValueError, match="sequence column"):
        t.modify_column_type("seq", "string")
    t2 = Table(spark, "mt_guard2", "DUPLICATE", ["k"],
               auto_partition=("ts", "day"),
               location=str(tmp_path / "mtg2"))
    with pytest.raises(ValueError, match="partition/distribution"):
        t2.modify_column_type("ts", "string")


def test_unique_model_randomized_vs_reference_model(spark):
    """Model-based check of the UNIQUE merge-on-read path: a seeded
    random interleaving of upsert batches, predicate deletes, and
    compactions, mirrored against a plain Python dict reference. The
    fixed examples above pin individual semantics; this pins their
    COMPOSITION (delete-version application to pre-delete rowsets only,
    upserts after deletes resurrecting keys, compaction folding)."""
    import random

    rng = random.Random(2026)
    t = _mk(spark, "uniq_model", keys_type="UNIQUE", key_cols=["k"])
    # Reference mirrors the DOCUMENTED delete-version design: a delete
    # predicate applies to rowsets older than the delete version, and
    # the UNIQUE merge then picks the newest SURVIVING row per key — so
    # deleting a key's newest version can resurrect an older one.
    inserts: list[tuple[int, dict[int, int]]] = []  # (version, batch)
    deletes: list[tuple[int, int]] = []  # (version, cut): drops x < cut
    ver = 0

    def expected() -> dict[int, int]:
        best: dict[int, tuple[int, int]] = {}
        for iv, batch in inserts:
            for k, v in batch.items():
                if any(dv > iv and v < cut for dv, cut in deletes):
                    continue  # row deleted in its rowset
                if k not in best or iv > best[k][0]:
                    best[k] = (iv, v)
        return {k: v for k, (_, v) in best.items()}

    for step in range(24):
        op = rng.random()
        ver += 1
        if op < 0.65:
            batch = {rng.randint(0, 14): rng.randint(0, 999) for _ in range(rng.randint(1, 6))}
            t.insert(spark.createDataFrame(
                [Row(k=k, x=v) for k, v in sorted(batch.items())]))
            inserts.append((ver, batch))
        elif op < 0.85:
            cut = rng.randint(0, 999)
            t.delete_where(f"x < {cut}")
            deletes.append((ver, cut))
        else:
            t.compact()
            # compaction materializes the merged view and DISCARDS
            # superseded row versions (Doris cumulative compaction), so
            # a later delete can no longer resurrect them
            inserts = [(ver, expected())]
            deletes = []
        got = dict(_rows(t.read(), "k", "x"))
        assert got == expected(), f"step {step}"


def test_aggregate_model_randomized_vs_reference_model(spark):
    """Same model-based approach for the AGGREGATE merge: SUM/MIN/MAX/
    REPLACE/REPLACE_IF_NOT_NULL folded across random batches and
    compactions must equal a sequential Python fold (REPLACE order =
    load order, the Doris contract)."""
    import random

    rng = random.Random(77)
    t = _mk(
        spark, "agg_model_rand", keys_type="AGGREGATE", key_cols=["k"],
        agg_spec={"s": "SUM", "mn": "MIN", "mx": "MAX", "r": "REPLACE",
                  "rn": "REPLACE_IF_NOT_NULL"},
    )
    ref: dict[int, list] = {}
    for step in range(16):
        if rng.random() < 0.2:
            t.compact()
        else:
            rows = []
            # one row per key within a batch (in-batch REPLACE order is
            # unspecified in Doris; the ledger contract is across loads)
            for k in rng.sample(range(8), rng.randint(1, 4)):
                s = rng.randint(1, 9)
                mn = rng.randint(0, 99)
                mx = rng.randint(0, 99)
                r = f"r{step}_{k}"
                rn = None if rng.random() < 0.4 else f"n{step}_{k}"
                rows.append((k, s, mn, mx, r, rn))
                if k in ref:
                    o = ref[k]
                    ref[k] = [o[0] + s, min(o[1], mn), max(o[2], mx), r,
                              rn if rn is not None else o[4]]
                else:
                    ref[k] = [s, mn, mx, r, rn]
            t.insert(spark.createDataFrame(
                rows, "k long, s long, mn long, mx long, r string, rn string"))
        got = {
            r["k"]: [r["s"], r["mn"], r["mx"], r["r"], r["rn"]]
            for r in t.read().collect()
        }
        assert got == ref, f"step {step}"


# ---------------------------------------------------------- partial update


def test_partial_update_column_wise_merge(spark):
    """Doris 2.0 partial_columns: per-column latest-wins — a stored NULL
    in a carrying load overwrites, an absent column preserves, and a key
    that never had a full row surfaces NULL for never-carried columns."""
    t = _mk(spark, "pupd", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double"))
    t.insert(spark.createDataFrame([(1, 100.0), (2, None)],
                                   "k long, bal double"),
             partial_columns=True)
    t.insert(spark.createDataFrame([(2, "B2"), (4, "d4")],
                                   "k long, name string"),
             partial_columns=True)
    assert _rows(t.read(), "k", "name", "bal") == [
        (1, "a", 100.0),   # bal overwritten, name preserved
        (2, "B2", None),   # explicit NULL overwrote bal; later name load won
        (3, "c", 30.0),    # untouched
        (4, "d4", None),   # never-full key: NULL where no load carried
    ]


def test_partial_update_survives_compact_and_more_partials(spark):
    t = _mk(spark, "pupd2", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)],
                                   "k long, name string, bal double"))
    t.insert(spark.createDataFrame([(1, 11.0)], "k long, bal double"),
             partial_columns=True)
    t.compact()
    assert len(t.meta.rowsets) == 1
    assert not any(r.get("partial") for r in t.meta.rowsets)
    # post-compact partials start a fresh overlay on the folded base
    t.insert(spark.createDataFrame([(2, "B")], "k long, name string"),
             partial_columns=True)
    assert _rows(t.read(), "k", "name", "bal") == [
        (1, "a", 11.0), (2, "B", 20.0)]


def test_partial_update_guards(spark):
    dup = _mk(spark, "pupd_dup", keys_type="DUPLICATE", key_cols=["k"])
    with pytest.raises(ValueError, match="UNIQUE key model"):
        dup.insert(spark.createDataFrame([(1, 1.0)], "k long, bal double"),
                   partial_columns=True)
    seq = _mk(spark, "pupd_seq", keys_type="UNIQUE", key_cols=["k"],
              sequence_col="s")
    with pytest.raises(ValueError, match="sequence column"):
        seq.insert(spark.createDataFrame([(1, 2.0)], "k long, bal double"),
                   partial_columns=True)
    t = _mk(spark, "pupd_g", keys_type="UNIQUE", key_cols=["k"])
    with pytest.raises(ValueError, match="no value columns"):
        t.insert(spark.createDataFrame([(1,)], "k long"),
                 partial_columns=True)
    with pytest.raises(ValueError, match="missing key columns"):
        t.insert(spark.createDataFrame([(1.0,)], "bal double"),
                 partial_columns=True)


def test_partial_update_after_delete_pins_contract(spark):
    """A delete removes the FULL row from older rowsets; a later partial
    load on that key resurrects only its carried columns (others NULL) —
    the documented column-wise contract at the delete boundary."""
    t = _mk(spark, "pupd_del", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(3, "c", 30.0)],
                                   "k long, name string, bal double"))
    t.delete_where("k = 3")
    t.insert(spark.createDataFrame([(3, 99.0)], "k long, bal double"),
             partial_columns=True)
    assert _rows(t.read(), "k", "name", "bal") == [(3, None, 99.0)]


def test_partial_update_does_not_claim_added_column_default(spark):
    """A partial rowset carries EXACTLY the columns its load carried:
    the read-time schema-add normalization fills an added column with
    its default for frame alignment, but the rowset must not CLAIM it —
    otherwise a newer partial load overwrites a genuinely stored value
    with the declared default. Regression: the presence tag used to be
    computed from the normalized frame's columns."""
    t = _mk(spark, "pupd_addcol", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 1.0)],
                                   "k long, a double, b double"))
    t.add_column("c", "long", default=0)
    t.insert(spark.createDataFrame([(1, 2.0, 2.0, 5)],
                                   "k long, a double, b double, c long"))
    t.insert(spark.createDataFrame([(1, 3.0)], "k long, a double"),
             partial_columns=True)
    # c=5 from the full load must survive the newer partial load
    assert _rows(t.read(), "k", "a", "b", "c") == [(1, 3.0, 2.0, 5)]
    # compaction folds the overlay to the same answer
    t.compact()
    assert _rows(t.read(), "k", "a", "b", "c") == [(1, 3.0, 2.0, 5)]


def test_partial_only_key_added_column_surfaces_default(spark):
    """An ADDED column surfaces its declared default even for keys that
    only ever arrived via partial loads — consistent with the row-wise
    path, where a full load omitting the optional added column also
    reads back the default. Original never-carried columns stay NULL."""
    t = _mk(spark, "pupd_addonly", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 1.0)],
                                   "k long, a double, b double"))
    t.add_column("c", "long", default=7)
    t.insert(spark.createDataFrame([(2, 5.0)], "k long, a double"),
             partial_columns=True)
    assert _rows(t.read(), "k", "b", "c") == [
        (1, 1.0, 7),    # pre-add full row: default
        (2, None, 7),   # partial-only key: added col default, original NULL
    ]


def test_drop_then_readd_column_is_a_new_column(spark):
    """DROP COLUMN then ADD COLUMN with the same name (Doris allows the
    cycle): the re-added column is NEW — values from rowsets written
    before the re-add must not resurrect, old rows surface the declared
    default, and loads after the re-add carry real values again.
    Regression: the name used to stay in schema_drops, erasing the
    re-added column from every read forever."""
    t = _mk(spark, "readd", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 2.0)],
                                   "k long, a double, b double"))
    t.drop_column("b")
    assert "b" not in t.read().columns
    t.add_column("b", "double", default=9.0)
    assert _rows(t.read(), "k", "b") == [(1, 9.0)]  # 2.0 must not resurrect
    t.insert(spark.createDataFrame([(2, 5.0, 6.0)],
                                   "k long, a double, b double"))
    assert _rows(t.read(), "k", "b") == [(1, 9.0), (2, 6.0)]
    t.compact()  # folding must preserve the same view
    assert _rows(t.read(), "k", "b") == [(1, 9.0), (2, 6.0)]


def test_compact_on_empty_table_is_noop(spark):
    """Base compaction of an empty tablet (truncated, or every partition
    expired) is a no-op, not an error."""
    t = _mk(spark, "empty_compact", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    t.truncate()
    t.compact()  # must not raise
    t.insert(spark.createDataFrame([(2, 2.0)], "k long, v double"))
    assert _rows(t.read(), "k", "v") == [(2, 2.0)]


def test_versions_stay_monotonic_across_truncate(spark):
    """TRUNCATE clears the rowset/delete lists the version counter was
    derived from, so versions used to restart at 1 — making old
    version-gated schema boundaries (rename 'until', re-add 'since',
    delete gating) apply to NEW rowsets. Regression: rename b->r1, add b
    (reuse), truncate, partial load carrying both — the restarted
    version fell below the rename boundary, the mapping renamed the
    reused column onto the renamed one, and the read collapsed into
    duplicate columns."""
    t = _mk(spark, "vmono", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0)], "k long, b double"))
    t.rename_column("b", "r1")
    t.add_column("b", "double", default=523.0)
    t.truncate()
    t.insert(spark.createDataFrame([(4, 158.0, 166.0)],
                                   "k long, b double, r1 double"),
             partial_columns=True)
    assert _rows(t.read(), "k", "b", "r1") == [(4, 158.0, 166.0)]


def test_full_load_must_match_declared_value_schema(spark):
    """The first full load captures the table's value schema; later full
    loads must carry exactly it (schema-add columns stay optional).
    Regression: a full load omitting a value column used to COMMIT and
    poison every subsequent read with an unresolvable-column union;
    stray columns silently appeared in the read view."""
    t = _mk(spark, "vschema", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 2.0)],
                                   "k long, a double, b double"))
    with pytest.raises(ValueError, match="missing value columns"):
        t.insert(spark.createDataFrame([(2, 3.0)], "k long, a double"))
    with pytest.raises(ValueError, match="unknown columns"):
        t.insert(spark.createDataFrame([(2, 3.0, 4.0, 9)],
                                       "k long, a double, b double, zz long"))
    with pytest.raises(ValueError, match="unknown columns"):
        t.insert(spark.createDataFrame([(1, 9.0)], "k long, zz double"),
                 partial_columns=True)
    # the table stays healthy and the declared set follows renames/drops
    t.rename_column("b", "c")
    t.insert(spark.createDataFrame([(2, 3.0, 4.0)],
                                   "k long, a double, c double"))
    t.drop_column("a")
    t.insert(spark.createDataFrame([(3, 5.0)], "k long, c double"))
    assert _rows(t.read(), "k", "c") == [(1, 2.0), (2, 4.0), (3, 5.0)]
    # added columns stay optional in loads
    t.add_column("d", "double", default=7.0)
    t.insert(spark.createDataFrame([(4, 6.0)], "k long, c double"))
    assert _rows(t.read(), "k", "d") == [
        (1, 7.0), (2, 7.0), (3, 7.0), (4, 7.0)]


def test_aggregate_delete_requires_key_column_predicate(spark):
    """Doris rule: DELETE on an AGGREGATE table may reference key columns
    only. The predicate filters stored delta rows BEFORE the merge, so a
    value-column condition drops individual deltas and silently corrupts
    the aggregate (observed: SUM deltas +10,-3 with DELETE val>5 left the
    key visible with val=-3 instead of removing it)."""
    t = _mk(spark, "agg_del", keys_type="AGGREGATE", key_cols=["k"],
            agg_spec={"val": "SUM"})
    t.insert(spark.createDataFrame([(1, 10.0), (2, 1.0)],
                                   "k long, val double"))
    t.insert(spark.createDataFrame([(1, -3.0)], "k long, val double"))
    with pytest.raises(ValueError, match="key columns only"):
        t.delete_where("val > 5")
    t.delete_where("k = 1")  # key predicate: every delta matches uniformly
    assert _rows(t.read(), "k", "val") == [(2, 1.0)]


def test_delete_with_live_partial_rowsets_folds_first(spark):
    """DELETE predicates bind per stored row BEFORE the column-wise
    merge, so with a live partial overlay a predicate matching the
    MERGED row would miss the overlay and strip only the base row —
    leaving the key visible with NULLed columns (observed: partial
    (k,name) then DELETE bal>5 kept the key with bal NULL instead of
    deleting it). DELETE now folds the overlay implicitly (compaction
    materializes the merged state, making the per-row predicate exact) —
    a refusal would break the everyday UPDATE-then-DELETE sequence,
    since UPDATE takes the partial-load path internally."""
    t = _mk(spark, "del_partial", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, "a", 10.0), (2, "b", 1.0)],
                                   "k long, name string, bal double"))
    t.insert(spark.createDataFrame([(1, "z")], "k long, name string"),
             partial_columns=True)
    t.delete_where("bal > 5")  # merged k=1 had bal=10 -> deleted whole
    assert not any(r.get("partial") for r in t.meta.rowsets)  # folded
    assert _rows(t.read(), "k", "name", "bal") == [(2, "b", 1.0)]


def test_delete_predicate_survives_rename_and_drop_of_column(spark):
    """A pending DELETE predicate binds to the ORIGINAL column even after
    that column is renamed (Spark resolves the old attribute through the
    rename projection) — the recorded predicate keeps deleting the rows
    it matched when it was issued."""
    t = _mk(spark, "del_ren", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0), (2, 9.0)], "k long, b double"))
    t.delete_where("b > 5")
    t.rename_column("b", "c")
    assert _rows(t.read(), "k", "c") == [(1, 1.0)]


def test_schema_change_cannot_capture_pending_delete_predicate(spark):
    """Introducing a column NAME that a pending DELETE predicate
    references is refused: predicates are stored as SQL text and bound at
    read, so a new same-named column would capture the predicate and
    delete the wrong rows (regression: rename b->c then add b default 100
    used to delete every pre-delete row). compact() folds predicates away
    and lifts the restriction."""
    t = _mk(spark, "del_capture", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0), (2, 9.0)], "k long, b double"))
    t.delete_where("b > 5")
    t.rename_column("b", "c")
    with pytest.raises(ValueError, match="pending DELETE predicate"):
        t.add_column("b", "double", default=100.0)
    t.compact()
    t.add_column("b", "double", default=100.0)
    assert _rows(t.read(), "k", "c", "b") == [(1, 1.0, 100.0)]


def test_rename_target_cannot_capture_pending_delete_predicate(spark):
    t = _mk(spark, "del_capture_rn", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 2.0)],
                                   "k long, b double, x double"))
    t.delete_where("b > 5")
    t.rename_column("b", "c")
    with pytest.raises(ValueError, match="pending DELETE predicate"):
        t.rename_column("x", "b")


def test_add_column_may_reuse_renamed_away_name(spark):
    """RENAME b->c then ADD COLUMN b: the rename mapping is version-aware
    (only rowsets written before the rename store the old name), so new
    loads carrying the reused name keep it. Regression: the mapping used
    to fire on new rowsets too, renaming the reused column onto the
    renamed one and failing the read with COLUMN_ALREADY_EXISTS."""
    t = _mk(spark, "ren_reuse", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 2.0)], "k long, b double"))
    t.rename_column("b", "c")
    t.add_column("b", "double", default=9.0)
    t.insert(spark.createDataFrame([(2, 3.0, 4.0)],
                                   "k long, c double, b double"))
    assert _rows(t.read(), "k", "c", "b") == [(1, 2.0, 9.0), (2, 3.0, 4.0)]
    t.compact()
    assert _rows(t.read(), "k", "c", "b") == [(1, 2.0, 9.0), (2, 3.0, 4.0)]


def test_partial_presence_mapping_is_rename_version_aware(spark):
    """A partial load recorded BEFORE a rename maps its carried list to
    the new name; a partial load recorded AFTER the old name was reused
    by ADD COLUMN keeps the reused name — the two overlays land on
    different columns."""
    t = _mk(spark, "ren_reuse_p", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 2.0)], "k long, b double"))
    t.insert(spark.createDataFrame([(1, 5.0)], "k long, b double"),
             partial_columns=True)           # pre-rename: targets old b
    t.rename_column("b", "c")
    t.add_column("b", "double", default=9.0)
    t.insert(spark.createDataFrame([(1, 7.0)], "k long, b double"),
             partial_columns=True)           # post-reuse: targets NEW b
    assert _rows(t.read(), "k", "c", "b") == [(1, 5.0, 7.0)]


def test_rename_to_dropped_name_is_rejected(spark):
    """The read-time drop filter is name-based, so renaming onto a
    dropped name would silently erase the renamed column's data — the
    engine refuses instead."""
    t = _mk(spark, "ren_dropped", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0, 2.0)],
                                   "k long, a double, b double"))
    t.drop_column("a")
    with pytest.raises(ValueError, match="dropped column name"):
        t.rename_column("b", "a")


def test_partial_update_presence_tracks_renamed_column(spark):
    """RENAME COLUMN after a partial load: the recorded carried-column
    list is mapped through the rename at read, so the partial rowset
    still overwrites under the column's NEW name."""
    t = _mk(spark, "pupd_rename", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 10.0, 1.0)],
                                   "k long, bal double, fee double"))
    t.insert(spark.createDataFrame([(1, 99.0)], "k long, bal double"),
             partial_columns=True)
    t.rename_column("bal", "balance")
    assert _rows(t.read(), "k", "balance", "fee") == [(1, 99.0, 1.0)]


# ------------------------------------------------------------ delete sign


def test_delete_sign_merge_load(spark):
    """Doris batch delete (MERGE load, hidden __DORIS_DELETE_SIGN__):
    a load row with sign=1 removes its key if it wins the merge; later
    upserts resurrect the key; compaction folds signs away."""
    from palo_spark.tables import DELETE_SIGN_COL
    t = _mk(spark, "dsign", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                   "k long, v string"))
    t.insert(spark.createDataFrame(
        [(2, "ignored", 1), (4, "d", 0)],
        f"k long, v string, {DELETE_SIGN_COL} int"))
    assert _rows(t.read(), "k", "v") == [(1, "a"), (3, "c"), (4, "d")]
    # a later plain upsert resurrects the deleted key
    t.insert(spark.createDataFrame([(2, "B2")], "k long, v string"))
    assert _rows(t.read(), "k", "v") == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    t.compact()
    assert t.meta.has_delete_sign is False
    assert DELETE_SIGN_COL not in t.read().columns
    assert _rows(t.read(), "k", "v") == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]


def test_delete_sign_respects_sequence_col(spark):
    """A delete carrying a LOWER sequence than the live row must lose
    (out-of-order ingestion safety — the exact reason sequence_col
    exists upstream)."""
    from palo_spark.tables import DELETE_SIGN_COL
    t = _mk(spark, "dsign_seq", keys_type="UNIQUE", key_cols=["k"],
            sequence_col="s")
    t.insert(spark.createDataFrame([(1, 10, "live")], "k long, s long, v string"))
    t.insert(spark.createDataFrame(
        [(1, 5, "stale-del", 1)],
        f"k long, s long, v string, {DELETE_SIGN_COL} int"))
    assert _rows(t.read(), "k", "v") == [(1, "live")]  # stale delete lost
    t.insert(spark.createDataFrame(
        [(1, 20, "del", 1)],
        f"k long, s long, v string, {DELETE_SIGN_COL} int"))
    assert t.read().count() == 0  # fresh delete won


def test_delete_sign_guards(spark):
    from palo_spark.tables import DELETE_SIGN_COL
    dup = _mk(spark, "dsign_dup", keys_type="DUPLICATE", key_cols=["k"])
    with pytest.raises(ValueError, match="UNIQUE key model"):
        dup.insert(spark.createDataFrame(
            [(1, 1)], f"k long, {DELETE_SIGN_COL} int"))
    t = _mk(spark, "dsign_mix", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, "a", 1.0)],
                                   "k long, v string, b double"))
    t.insert(spark.createDataFrame([(1, 2.0)], "k long, b double"),
             partial_columns=True)
    with pytest.raises(ValueError, match="compact"):
        t.insert(spark.createDataFrame(
            [(1, "x", 3.0, 1)],
            f"k long, v string, b double, {DELETE_SIGN_COL} int"))


def test_delete_sign_survives_auto_compaction(spark):
    """Auto-compaction triggered mid-stream folds sign rowsets away
    without changing the visible state (cumulative-compaction analog
    must be invisible to readers)."""
    from palo_spark.tables import DELETE_SIGN_COL, Table
    t = _mk(spark, "dsign_ac", keys_type="UNIQUE", key_cols=["k"],
            auto_compact_rowsets=2)
    t.insert(spark.createDataFrame([(i, f"v{i}") for i in range(4)],
                                   "k long, v string"))
    t.insert(spark.createDataFrame(
        [(0, "x", 1), (4, "d", 0)],
        f"k long, v string, {DELETE_SIGN_COL} int"))
    # third load pushes past the 2-rowset trigger → auto compact runs
    t.insert(spark.createDataFrame([(5, "e")], "k long, v string"))
    assert len(t.meta.rowsets) == 1  # compacted
    assert t.meta.has_delete_sign is False
    assert _rows(t.read(), "k", "v") == [
        (1, "v1"), (2, "v2"), (3, "v3"), (4, "d"), (5, "e")]


def test_aggregate_add_column_default_semantics_pinned(spark):
    """AGGREGATE + ADD COLUMN with agg spec: the default fills per STORED
    DELTA ROW before the merge (upstream behavior) — two unmerged loads
    of a key contribute 2x a SUM default — and compaction is value-
    neutral on the visible result."""
    t = _mk(spark, "agg_add", keys_type="AGGREGATE", key_cols=["k"],
            agg_spec={"val": "SUM"})
    t.insert(spark.createDataFrame([(1, 10.0)], "k long, val double"))
    t.insert(spark.createDataFrame([(1, 20.0)], "k long, val double"))
    t.add_column("c", "double", default=5.0, agg="SUM")
    assert _rows(t.read(), "k", "val", "c") == [(1, 30.0, 10.0)]
    t.compact()
    assert _rows(t.read(), "k", "val", "c") == [(1, 30.0, 10.0)]
    t.insert(spark.createDataFrame([(1, 1.0)], "k long, val double"))
    assert _rows(t.read(), "k", "val", "c") == [(1, 31.0, 15.0)]


def test_delete_sign_composes_with_schema_changes(spark):
    """Delete-sign MERGE loads after RENAME (batch carries the new name)
    and ADD COLUMN (batch omits the optional column): the sign rides the
    row-wise merge unchanged, the added column's default fills, and the
    renamed sequence column still decides out-of-order deletes."""
    from palo_spark.tables import DELETE_SIGN_COL

    t = _mk(spark, "sign_schema", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    t.rename_column("v", "w")
    t.add_column("c", "double", default=7.0)
    t.insert(spark.createDataFrame(
        [(1, 10.0, 0), (2, 2.0, 1)],
        f"k long, w double, {DELETE_SIGN_COL} int"))
    assert _rows(t.read(), "k", "w", "c") == [(1, 10.0, 7.0)]
    t.compact()
    assert _rows(t.read(), "k", "w", "c") == [(1, 10.0, 7.0)]

    t2 = _mk(spark, "sign_seq_ren", keys_type="UNIQUE", key_cols=["k"],
             sequence_col="seq")
    t2.insert(spark.createDataFrame([(1, 5, "a")], "k long, seq long, x string"))
    t2.rename_column("seq", "ver")
    # an out-of-order delete (lower renamed-sequence) loses
    t2.insert(spark.createDataFrame(
        [(1, 3, "junk", 1)], f"k long, ver long, x string, {DELETE_SIGN_COL} int"))
    assert _rows(t2.read(), "k", "ver", "x") == [(1, 5, "a")]
    # a higher-sequence delete wins
    t2.insert(spark.createDataFrame(
        [(1, 9, "junk", 1)], f"k long, ver long, x string, {DELETE_SIGN_COL} int"))
    assert t2.read().count() == 0


def test_delete_guard_catches_backtick_quoted_predicate(spark):
    """ADVICE r8: _guard_delete_predicate_capture must also trip on a
    backtick-quoted column reference in the stored predicate — ADD
    reintroducing that name would otherwise bypass the guard and the
    predicate would capture the NEW column at read."""
    t = _mk(spark, "btguard", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 5), (2, 9)], "k long, x int"))
    t.drop_column("x")
    t.delete_where("`x` > 5")  # quoted spelling of a now-dropped column
    with pytest.raises(ValueError, match="pending DELETE predicate"):
        t.add_column("x", "int", default=0)
    # compact folds the predicate (it binds the ORIGINAL stored x, so
    # the x=9 row goes) and lifts the restriction; the re-added x is a
    # NEW column surfacing its default
    t.compact()
    t.add_column("x", "int", default=0)
    assert _rows(t.read(), "k", "x") == [(1, 0)]


def test_compact_surfaces_malformed_delete_predicate(spark):
    """ADVICE r8: compact() must not swallow a genuine read-path error
    as 'empty table' — a malformed stored delete predicate has to
    surface, not silently no-op the compaction."""
    t = _mk(spark, "badpred", keys_type="DUPLICATE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, 5)], "k long, x int"))
    # corrupt the stored predicate the way a buggy writer would
    t.meta.deletes.append({"version": t.meta.last_version + 99,
                           "predicate": "x >>> broken ("})
    with pytest.raises(Exception):
        t.compact()
    # and on a genuinely empty table compact stays a silent no-op
    e = _mk(spark, "emptyc", keys_type="DUPLICATE", key_cols=["k"])
    e.compact()
    assert e.meta.rowsets == []


def test_truncate_resets_delete_sign_flag(spark):
    """ADVICE r8: truncate() leaves no rowsets, so has_delete_sign must
    clear — an empty table must accept partial-column loads without a
    manual compact()."""
    from palo_spark.tables import DELETE_SIGN_COL
    t = _mk(spark, "trsign", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([(1, "a", 10)], "k long, v string, w int"))
    t.insert(spark.createDataFrame(
        [(1, "x", 0, 1)], f"k long, v string, w int, {DELETE_SIGN_COL} int"))
    assert t.meta.has_delete_sign is True
    t.truncate()
    assert t.meta.has_delete_sign is False
    t.insert(spark.createDataFrame([(2, "b", 20)], "k long, v string, w int"))
    t.insert(spark.createDataFrame([(2, "B2")], "k long, v string"),
             partial_columns=True)
    assert _rows(t.read(), "k", "v", "w") == [(2, "B2", 20)]


def test_drop_partition_recomputes_delete_sign_flag(spark):
    """ADVICE r8: expiring the partition holding the only sign-carrying
    rowset must clear has_delete_sign (and prune the empty rowset), so
    partial-column loads work again."""
    from palo_spark.tables import DELETE_SIGN_COL
    t = _mk(spark, "dpsign", keys_type="UNIQUE", key_cols=["d", "k"],
            auto_partition=("d", "day"))
    t.insert(spark.createDataFrame(
        [("2024-01-01", 1, "a")], "d string, k long, v string"))
    t.insert(spark.createDataFrame(
        [("2024-01-02", 2, "gone", 1)],
        f"d string, k long, v string, {DELETE_SIGN_COL} int"))
    assert t.meta.has_delete_sign is True
    assert t.drop_partition("d2024-01-02") is True
    assert t.meta.has_delete_sign is False
    assert len(t.meta.rowsets) == 1  # empty sign rowset pruned
    assert _rows(t.read(), "k", "v") == [(1, "a")]
    # version monotonicity survives the prune
    t.insert(spark.createDataFrame(
        [("2024-01-03", 3, "c")], "d string, k long, v string"))
    assert _rows(t.read(), "k", "v") == [(1, "a"), (3, "c")]


def test_partial_columns_with_sequence_col(spark):
    """Doris 2.0 partial update × sequence_col (VERDICT r8 #6): the
    winner per column is the argmax over (carries-it, sequence,
    version) — a lower-sequence partial loses every column it carries;
    a higher-sequence partial wins exactly its carried columns; equal
    sequences fall back to load order."""
    t = _mk(spark, "pseq", keys_type="UNIQUE", key_cols=["k"],
            sequence_col="seq")
    t.insert(spark.createDataFrame(
        [(1, 10, "a", "x"), (2, 10, "b", "y")],
        "k long, seq int, v string, w string"))
    # higher seq: wins only its carried column (v); w survives
    t.insert(spark.createDataFrame([(1, 20, "A2")], "k long, seq int, v string"),
             partial_columns=True)
    # lower seq: loses entirely (out-of-order ingestion safety)
    t.insert(spark.createDataFrame([(2, 5, "LOSE")], "k long, seq int, v string"),
             partial_columns=True)
    # equal seq: later load wins the carried column
    t.insert(spark.createDataFrame([(1, 20, "W2")], "k long, seq int, w string"),
             partial_columns=True)
    want = [(1, 20, "A2", "W2"), (2, 10, "b", "y")]
    assert _rows(t.read(), "k", "seq", "v", "w") == want
    t.compact()  # folding the overlay is value-neutral
    assert _rows(t.read(), "k", "seq", "v", "w") == want
    # a partial batch WITHOUT the sequence column is rejected — it has
    # no win priority to merge under
    with pytest.raises(ValueError, match="sequence column"):
        t.insert(spark.createDataFrame([(1, "zz")], "k long, v string"),
                 partial_columns=True)


def test_cross_handle_convergence(spark):
    """r10 audit — the cross-handle/cross-session contract, PINNED:
    one writer at a time per table directory; any number of other
    handles (Table.open re-attachments, other sessions) converge on
    externally-committed mutations at their next read() or
    state_token(). Without the meta sync, the first handle served
    stale rowsets forever AND its state_token never advanced — a
    result cache keyed on it would replay pre-mutation answers
    indefinitely."""
    t = _mk(spark, "xh", keys_type="UNIQUE", key_cols=["k"])
    t.insert(spark.createDataFrame([Row(k=1, x=1)]))
    tok0 = t.state_token()
    assert t.read().count() == 1
    # a second handle commits an upsert + a new key
    t2 = Table.open(spark, t.location)
    t2.insert(spark.createDataFrame([Row(k=1, x=100), Row(k=2, x=2)]))
    # the FIRST handle sees the commit at its next read...
    rows = {r["k"]: r["x"] for r in t.read().collect()}
    assert rows == {1: 100, 2: 2}, rows
    # ...and its state token advanced (cache invalidation)
    assert t.state_token() != tok0
    assert t.state_token() == t2.state_token()
    # schema change through the second handle converges too
    t2.add_column("w", "INT", default="7")
    assert "w" in t.read().columns
    # directory recreated underneath (new lineage): handle follows
    import shutil as _sh
    loc = t.location
    _sh.rmtree(loc)
    t3 = Table(spark, "xh", keys_type="DUPLICATE", key_cols=["k"],
               location=loc)
    t3.insert(spark.createDataFrame([Row(k=9, y=9)]))
    assert t.state_token() == t3.state_token()
    assert [r["k"] for r in t.read().collect()] == [9]
