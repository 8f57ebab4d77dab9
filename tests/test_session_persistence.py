"""Session metadata durability (r10): a PaloSession pointed at an
existing warehouse RE-ATTACHES its tables (Doris FE metadata
persistence), DROP TABLE lands in a recycle bin (directory kept,
marked dropped), RECOVER TABLE un-drops, and live sessions over the
same warehouse CONVERGE — the query-path sweep re-registers any temp
view whose table's state token moved under it, so a second session's
commits are visible AND invalidate this session's result cache."""

from __future__ import annotations

import os

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def wh(tmp_path):
    d = tmp_path / "wh"
    d.mkdir()
    return str(d)


def test_session_reattach(spark, wh):
    a = PaloSession(spark, location_root=wh)
    a.sql("CREATE TABLE t1 (k BIGINT, props VARIANT, v INT) UNIQUE KEY(k) "
          "DISTRIBUTED BY HASH(k) BUCKETS 2")
    a.sql("""INSERT INTO t1 VALUES (1, '{"x": 5}', 10)""")
    a.sql("ALTER TABLE t1 ADD COLUMN w INT DEFAULT '3'")
    # "restart": a fresh session over the same warehouse
    b = PaloSession(spark, location_root=wh)
    assert set(b.tables) == {"t1"}
    r = b.sql("SELECT k, CAST(props['x'] AS INT) AS x, v, w FROM t1"
              ).collect()[0]
    # data, variant subscripts (persisted variant_cols), and schema-add
    # defaults (persisted meta) all survive the restart
    assert (r["k"], r["x"], r["v"], r["w"]) == (1, 5, 10, 3)
    # typed VALUES insert works — the declared schema is persisted
    b.sql("""INSERT INTO t1 VALUES (2, '{"x": 7}', 20, 9)""")
    assert b.sql("SELECT count(*) AS n FROM t1").collect()[0]["n"] == 2
    # re-creating a live table is an error; IF NOT EXISTS returns it
    with pytest.raises(ValueError, match="already exists"):
        b.sql("CREATE TABLE t1 (k BIGINT) DUPLICATE KEY(k) "
              "DISTRIBUTED BY HASH(k) BUCKETS 2")
    same = b.sql("CREATE TABLE IF NOT EXISTS t1 (k BIGINT) "
                 "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    assert same is b.tables["t1"]


def test_drop_recover_recycle_bin(spark, wh):
    a = PaloSession(spark, location_root=wh)
    a.sql("CREATE TABLE rc (k BIGINT, v INT) DUPLICATE KEY(k) "
          "DISTRIBUTED BY HASH(k) BUCKETS 2")
    a.sql("INSERT INTO rc VALUES (1, 1)")
    a.sql("DROP TABLE rc")
    # the directory survives, marked dropped
    assert os.path.isdir(os.path.join(wh, "rc"))
    # a fresh session does NOT resurrect it
    b = PaloSession(spark, location_root=wh)
    assert "rc" not in b.tables
    # RECOVER un-drops with data intact
    b.sql("RECOVER TABLE rc")
    assert b.sql("SELECT v FROM rc").collect()[0]["v"] == 1
    with pytest.raises(ValueError, match="already exists"):
        b.sql("RECOVER TABLE rc")
    with pytest.raises(ValueError, match="no dropped table"):
        b.sql("RECOVER TABLE nope")


def test_cross_session_convergence_and_cache(spark, wh):
    a = PaloSession(spark, location_root=wh)
    a.sql("CREATE TABLE cv (k BIGINT, v INT) UNIQUE KEY(k) "
          "DISTRIBUTED BY HASH(k) BUCKETS 2")
    a.sql("INSERT INTO cv VALUES (1, 10)")
    c = PaloSession(spark, location_root=wh, result_cache=True)
    assert c.sql("SELECT sum(v) AS s FROM cv").collect()[0]["s"] == 10
    assert c.sql("SELECT sum(v) AS s FROM cv").collect()[0]["s"] == 10
    assert c.last_cache_hit is True
    # a commit through a DIFFERENT handle, with NO view refresh in
    # either session: the next query must converge (the registered
    # temp view held the old rowset enumeration) and the cache must
    # miss (state token moved)
    a.tables["cv"].insert(spark.createDataFrame([(2, 90)], "k long, v int"))
    assert c.sql("SELECT sum(v) AS s FROM cv").collect()[0]["s"] == 100
    assert c.last_cache_hit is False
    assert a.sql("SELECT sum(v) AS s FROM cv").collect()[0]["s"] == 100


def test_recreate_evicts_recycle_entry(spark, wh):
    """Re-creating a dropped table's name reuses its directory —
    evicting the older recycle-bin entry (documented deviation from
    Doris's id-keyed bin, where both coexist). RECOVER thereafter
    returns the NEWEST drop, never a zombie mix of incarnations."""
    ps = PaloSession(spark, location_root=wh)
    ps.sql("CREATE TABLE rx (k BIGINT, v INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO rx VALUES (1, 1)")
    ps.sql("DROP TABLE rx")
    ps.sql("CREATE TABLE rx (k BIGINT, v INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO rx VALUES (9, 9)")
    with pytest.raises(ValueError, match="already exists"):
        ps.sql("RECOVER TABLE rx")
    ps.sql("DROP TABLE rx")
    ps.sql("RECOVER TABLE rx")
    assert sorted(r["v"] for r in ps.sql("SELECT v FROM rx").collect()) == [9]


def test_incremental_refresh_sees_foreign_commit(spark, wh):
    """r10 probe pin: the partition-incremental refresh diff uses
    SYNCED partition versions (`Table._sync_meta` inside
    partition_versions' caller), so a commit made through a foreign
    handle of the same directory is picked up and its partition
    recomputed."""
    from palo_spark.tables import Table

    a = PaloSession(spark, location_root=wh)
    a.sql("CREATE TABLE fi (d DATETIME, k BIGINT, g VARCHAR(4), v INT) "
          "DUPLICATE KEY(d, k) "
          "AUTO PARTITION BY RANGE (date_trunc(`d`, 'day')) () "
          "DISTRIBUTED BY HASH(k) BUCKETS 2")
    a.sql("INSERT INTO fi VALUES ('2024-01-01 01:00:00', 1, 'a', 10), "
          "('2024-01-02 01:00:00', 2, 'b', 20)")
    a.sql("CREATE MATERIALIZED VIEW fmv BUILD IMMEDIATE REFRESH AUTO "
          "ON MANUAL AS SELECT g, sum(v) AS sv FROM fi GROUP BY g")
    t2 = Table.open(spark, a.tables["fi"].location)
    t2.insert(spark.createDataFrame(
        [("2024-01-02 05:00:00", 3, "b", 40)],
        "d string, k long, g string, v int"))
    a.sql("REFRESH MATERIALIZED VIEW fmv")
    got = sorted((r.g, r.sv)
                 for r in a.sql("SELECT g, sv FROM fmv").collect())
    assert got == [("a", 10), ("b", 60)]


def test_show_catalog_recycle_bin(spark, wh):
    ps = PaloSession(spark, location_root=wh)
    assert ps.sql("SHOW CATALOG RECYCLE BIN").count() == 0
    ps.sql("CREATE TABLE rb1 (k BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE rb2 (k BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("DROP TABLE rb1")
    got = [(r["name"], r["type"])
           for r in ps.sql("SHOW CATALOG RECYCLE BIN").collect()]
    assert got == [("rb1", "TABLE")]
    ps.sql("RECOVER TABLE rb1")
    assert ps.sql("SHOW CATALOG RECYCLE BIN").count() == 0
