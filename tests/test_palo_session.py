"""PaloSession: Doris SQL text DDL + DML + query in one surface."""

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def test_create_aggregate_table_and_merge(ps):
    t = ps.sql(
        """CREATE TABLE sv (`site_id` INT, `city` VARCHAR(20), `pv` BIGINT SUM,
           `best` DOUBLE MAX) AGGREGATE KEY(site_id, city)
           DISTRIBUTED BY HASH(site_id) BUCKETS 8
           PROPERTIES ("replication_num" = "1")"""
    )
    assert t.meta.keys_type == "AGGREGATE"
    assert t.meta.agg_spec == {"pv": "SUM", "best": "MAX"}
    ps.sql("INSERT INTO sv VALUES (1,'bj',10,1.5), (1,'bj',5,9.9), (2,'sh',7,2.0)")
    rows = {(r["site_id"], r["city"]): (r["pv"], r["best"]) for r in ps.sql("SELECT * FROM sv").collect()}
    assert rows == {(1, "bj"): (15, 9.9), (2, "sh"): (7, 2.0)}


def test_unique_key_upsert_through_sql(ps):
    ps.sql(
        "CREATE TABLE u (`uid` BIGINT, `name` VARCHAR(10)) UNIQUE KEY(uid) "
        "DISTRIBUTED BY HASH(uid) BUCKETS 4"
    )
    ps.sql("INSERT INTO u VALUES (1,'a'),(2,'b')")
    ps.sql("INSERT INTO u VALUES (2,'b2')")
    got = sorted((r["uid"], r["name"]) for r in ps.sql("SELECT * FROM u").collect())
    assert got == [(1, "a"), (2, "b2")]


def test_insert_select_positional_mapping(ps):
    ps.sql(
        "CREATE TABLE d (`k` INT, `s` VARCHAR(5)) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    # dialect function + positional mapping + cast (int literal -> INT)
    ps.sql("INSERT INTO d SELECT 7, lcase('XY')")
    got = [(r["k"], r["s"]) for r in ps.sql("SELECT k, s FROM d").collect()]
    assert got == [(7, "xy")]


def test_insert_arity_mismatch_raises(ps):
    ps.sql(
        "CREATE TABLE a2 (`k` INT, `s` VARCHAR(5)) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    with pytest.raises(Exception, match="arity|columns"):
        ps.sql("INSERT INTO a2 VALUES (1)")


def test_drop_table(ps):
    ps.sql("CREATE TABLE g (`k` INT) DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("DROP TABLE g")
    assert "g" not in ps.tables
    ps.sql("DROP TABLE IF EXISTS g")  # idempotent
    with pytest.raises(ValueError, match="unknown"):
        ps.sql("DROP TABLE g")


def test_query_goes_through_dialect_front_end(ps):
    ps.sql("CREATE TABLE q (`k` INT, `d` DATETIME) DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO q VALUES (1, '2020-03-04 05:06:07')")
    r = ps.sql("SELECT date_format(`d`, '%Y-%m') AS ym FROM q WHERE k = 1 || k = 99").collect()
    assert [x["ym"] for x in r] == ["2020-03"]


def test_rollup_integration_answers_from_mv(spark, tmp_path):
    from pyspark.sql import Row
    from palo_spark.plans import Measure, RollupCatalog

    base = spark.createDataFrame(
        [Row(g="a", v=1), Row(g="a", v=2), Row(g="b", v=3)]
    )
    rc = RollupCatalog(spark, root=str(tmp_path / "r"))
    rc.register_base("base_t", base)
    rc.add_rollup("r1", "base_t", ["g"], [Measure("sum", "v")])
    base.createOrReplaceTempView("base_t")
    ps = PaloSession(spark, location_root=str(tmp_path), rollups=rc)
    df, source = rc.sql("SELECT g, SUM(v) AS sum_v FROM base_t GROUP BY g")
    assert source == "r1"  # the MV really covers it
    got = {r["g"]: r["sum_v"] for r in ps.sql("SELECT g, SUM(v) AS sum_v FROM base_t GROUP BY g").collect()}
    assert got == {"a": 3, "b": 3}
