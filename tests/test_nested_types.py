"""Doris 2.x nested column types ([docs: data-types ARRAY/MAP/STRUCT])
on session tables: DDL parsing, typed VALUES inserts, LIKE clones,
DESC/SHOW CREATE rendering, light schema change coexistence, and the
declared-schema plumbing being nesting-aware (a naive split(',')
would cut through MAP<K,V>)."""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def test_nested_type_ddl_and_access(ps):
    ps.sql("CREATE TABLE at (k BIGINT, tags ARRAY<VARCHAR(10)>, "
           "scores ARRAY<INT>, m MAP<VARCHAR(5), BIGINT>, "
           "st STRUCT<a:INT, b:VARCHAR(4)>) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    assert ps.tables["at"]._declared_schema == (
        "k bigint, tags array<string>, scores array<int>, "
        "m map<string,bigint>, st struct<a:int,b:string>")
    ps.sql("INSERT INTO at VALUES (1, array('x','y'), array(3,1,2), "
           "map('a', 9), named_struct('a', 5, 'b', 'zz'))")
    r = ps.sql("SELECT array_contains(tags, 'x') AS hx, "
               "array_sort(scores) AS ss, m['a'] AS ma, st.a AS sta "
               "FROM at").collect()[0]
    assert (r["hx"], r["ss"], r["ma"], r["sta"]) == (True, [1, 2, 3], 9, 5)
    # LATERAL VIEW over a genuine array column (not JSON)
    rows = ps.sql("SELECT e FROM at LATERAL VIEW explode(tags) t AS e"
                  ).collect()
    assert sorted(x["e"] for x in rows) == ["x", "y"]


def test_nested_type_lifecycle(ps):
    ps.sql("CREATE TABLE nt (k BIGINT, m MAP<VARCHAR(5), BIGINT>, "
           "extra0 INT) UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE nt2 LIKE nt")
    ps.sql("INSERT INTO nt2 VALUES (1, map('q', 4), 0)")
    assert ps.sql("SELECT m['q'] AS q FROM nt2").collect()[0]["q"] == 4
    # DESC + SHOW CREATE render the nested type whole
    descs = {r["field"]: r["type"] for r in ps.sql("DESC nt2").collect()}
    assert descs["m"] == "map<string,bigint>"
    stmt = ps.sql("SHOW CREATE TABLE nt2").collect()[0][1]
    assert "MAP<STRING,BIGINT>" in stmt
    # light schema change coexists (split-safety of the declared schema)
    ps.sql("ALTER TABLE nt2 ADD COLUMN extra INT DEFAULT '0'")
    ps.sql("ALTER TABLE nt2 RENAME COLUMN m m2")
    r = ps.sql("SELECT m2['q'] AS q, extra FROM nt2").collect()[0]
    assert (r["q"], r["extra"]) == (4, 0)
    # UPDATE's typed-cast path must not trip on the map type
    ps.sql("UPDATE nt2 SET extra = 5 WHERE k = 1")
    assert ps.sql("SELECT extra FROM nt2").collect()[0]["extra"] == 5


def test_map_column_merge_paths(ps):
    """Un-orderable (MAP) value columns survive every merge path: the
    UNIQUE partial-column read falls back to max_by (max over a
    struct containing a map fails Spark analysis); the AGGREGATE
    REPLACE path already rides max_by."""
    # UNIQUE + partial-column update with a live map column
    ps.sql("CREATE TABLE um (k BIGINT, m MAP<VARCHAR(5), BIGINT>, v INT) "
           "UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO um VALUES (1, map('a', 1), 10)")
    ps.sql("UPDATE um SET v = 99 WHERE k = 1")  # partial-column load
    r = ps.sql("SELECT m['a'] AS ma, v FROM um").collect()[0]
    assert (r["ma"], r["v"]) == (1, 99)
    # AGGREGATE REPLACE on a map column
    ps.sql("CREATE TABLE am (k BIGINT, m MAP<VARCHAR(5), BIGINT> REPLACE) "
           "AGGREGATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO am VALUES (1, map('x', 1))")
    ps.sql("INSERT INTO am VALUES (1, map('x', 2))")
    assert ps.sql("SELECT m['x'] AS x FROM am").collect()[0]["x"] == 2
