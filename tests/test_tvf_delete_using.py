"""Doris table-valued functions (local/file/s3/hdfs/numbers) and
DELETE ... USING join-delete — r10 continuation pins.

TVF docs surface: [docs: sql-functions/table-functions/{local,s3,hdfs,
numbers}]; join-delete: [docs: delete — DELETE FROM t1 USING t2 WHERE].
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from palo_spark.catalog import load_table, register_views
from palo_spark.palo_session import PaloSession
from palo_spark.sources import rewrite_table_functions, table_function_read
from palo_spark.sql_frontend import doris_sql


def test_numbers_tvf(spark):
    got = doris_sql(
        spark,
        'SELECT number FROM numbers("number" = "10") WHERE number >= 7',
    ).collect()
    assert sorted(r.number for r in got) == [7, 8, 9]


def test_numbers_tvf_const_value(spark):
    got = doris_sql(
        spark,
        'SELECT number FROM numbers("number" = "4", "const_value" = "5")',
    ).collect()
    assert [r.number for r in got] == [5, 5, 5, 5]


def test_local_tvf_parquet_pushdown(spark, sf_dir):
    df = doris_sql(
        spark,
        f'SELECT l_orderkey FROM local("file_path" = '
        f'"{sf_dir}/lineitem.parquet", "format" = "parquet") '
        "WHERE l_quantity < 2",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the TVF resolves to an ordinary FileScan: filter + projection
    # push into the parquet reader like any named table
    assert "PushedFilters: [IsNotNull(l_quantity)" in plan
    assert df.count() > 0


def test_csv_tvf_positional_and_with_names(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="tvf_csv_")
    load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    ).write.mode("overwrite").option("sep", ";").option(
        "header", "true"
    ).csv(d)
    named = doris_sql(
        spark,
        f'SELECT r_name FROM local("file_path" = "{d}", '
        f'"format" = "csv_with_names", "column_separator" = ";")',
    )
    assert sorted(r.r_name for r in named.collect())[0] == "AFRICA"
    # positional naming reads the header row as DATA (c1..cN contract)
    pos = doris_sql(
        spark,
        f'SELECT c1, c2 FROM local("file_path" = "{d}", '
        f'"format" = "csv", "column_separator" = ";")',
    )
    vals = {r.c1 for r in pos.collect()}
    assert "r_regionkey" in vals and "0" in vals


def test_tvf_rewrite_guards(spark):
    # scalar-call shapes and qualified names must pass through untouched
    for text in (
        "SELECT if('a'='b', 1, 2) AS x, s3 FROM t",
        "SELECT db.local('k'='v') FROM t",
        "SELECT 'FROM s3(''u''=''v'')' FROM t",
        "SELECT locals3('k'='v') FROM t",
        "SELECT file(col) FROM t",
    ):
        assert rewrite_table_functions(spark, text) == text


def test_tvf_unknown_format_fails_loud(spark):
    with pytest.raises(ValueError, match="unsupported TVF format"):
        table_function_read(
            spark, "local", {"file_path": "/tmp/x", "format": "avro2"}
        )
    with pytest.raises(ValueError, match="file_path"):
        table_function_read(spark, "s3", {"format": "parquet"})


def test_insert_from_tvf_session_path(spark):
    ps = PaloSession(spark)
    ps.sql(
        "CREATE TABLE tvf_ins (`n` BIGINT, `sq` BIGINT) "
        "DUPLICATE KEY(n) DISTRIBUTED BY HASH(n) BUCKETS 4"
    )
    ps.sql(
        "INSERT INTO tvf_ins SELECT number, number * number "
        'FROM numbers("number" = "6")'
    )
    row = ps.sql(
        "SELECT COUNT(*) AS c, SUM(sq) AS s FROM tvf_ins"
    ).collect()[0]
    assert (row.c, row.s) == (6, 55)


def _build_delete_using_pair(spark, sf_dir, ps, suffix):
    c = load_table(spark, sf_dir, "customer")
    t = ps._create_table(
        f"CREATE TABLE duc_{suffix} (`c_custkey` BIGINT, `bal_cents` "
        "BIGINT) UNIQUE KEY(c_custkey) DISTRIBUTED BY HASH(c_custkey) "
        "BUCKETS 4"
    )
    t.insert(
        c.select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias(
                "bal_cents"
            ),
        )
    )
    ps._refresh_view(f"duc_{suffix}")
    o = load_table(spark, sf_dir, "orders")
    t2 = ps._create_table(
        f"CREATE TABLE duo_{suffix} (`o_orderkey` BIGINT, `o_custkey` "
        "BIGINT, `o_orderstatus` VARCHAR(1)) DUPLICATE KEY(o_orderkey) "
        "DISTRIBUTED BY HASH(o_orderkey) BUCKETS 4"
    )
    t2.insert(o.select("o_orderkey", "o_custkey", "o_orderstatus"))
    ps._refresh_view(f"duo_{suffix}")
    return t, t2


def test_delete_using_matches_anti_join(spark, sf_dir):
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    t, _ = _build_delete_using_pair(spark, sf_dir, ps, "m")
    ps.sql(
        "DELETE FROM duc_m USING duo_m "
        "WHERE duc_m.c_custkey = duo_m.o_custkey "
        "AND duo_m.o_orderstatus = 'F'"
    )
    got = {r.c_custkey for r in ps.sql("SELECT c_custkey FROM duc_m").collect()}
    expect = {
        r.c_custkey
        for r in spark.sql(
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"
        ).collect()
    }
    assert got == expect
    assert t.meta.has_delete_sign


def test_delete_using_no_match_commits_nothing(spark, sf_dir):
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    t, _ = _build_delete_using_pair(spark, sf_dir, ps, "n")
    before = len(t.meta.rowsets)
    ps.sql(
        "DELETE FROM duc_n USING duo_n "
        "WHERE duc_n.c_custkey = duo_n.o_custkey "
        "AND duo_n.o_orderstatus = 'ZZZ'"
    )
    # no matched rows: no rowset committed, sign read-path not enabled
    assert len(t.meta.rowsets) == before
    assert not t.meta.has_delete_sign


def test_delete_using_requires_unique_model(spark, sf_dir):
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    _build_delete_using_pair(spark, sf_dir, ps, "r")
    with pytest.raises(ValueError, match="UNIQUE key model"):
        ps.sql(
            "DELETE FROM duo_r USING duc_r "
            "WHERE duo_r.o_custkey = duc_r.c_custkey"
        )


def test_delete_using_with_join_in_using_clause(spark, sf_dir):
    """USING may hold a JOIN tree (Doris's documented multi-table
    form) — it passes through as the FROM clause of the matching
    select."""
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    t, _ = _build_delete_using_pair(spark, sf_dir, ps, "j")
    ps.sql(
        "DELETE FROM duc_j USING duo_j JOIN orders "
        "ON duo_j.o_orderkey = orders.o_orderkey "
        "WHERE duc_j.c_custkey = duo_j.o_custkey "
        "AND orders.o_orderpriority = '1-URGENT'"
    )
    got = {r.c_custkey for r in ps.sql("SELECT c_custkey FROM duc_j").collect()}
    expect = {
        r.c_custkey
        for r in spark.sql(
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_orderpriority = "
            "'1-URGENT')"
        ).collect()
    }
    assert got == expect


def test_plain_delete_with_using_in_literal_still_parses(spark, sf_dir):
    """A predicate string containing the word USING must not divert the
    plain DELETE into the join-delete branch."""
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    t = ps._create_table(
        "CREATE TABLE dlit (`k` BIGINT, `v` VARCHAR(20)) "
        "UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    t.insert(
        spark.createDataFrame(
            [(1, "USING"), (2, "other")], "k bigint, v string"
        )
    )
    ps._refresh_view("dlit")
    ps.sql("DELETE FROM dlit WHERE v = 'USING'")
    assert [r.k for r in ps.sql("SELECT k FROM dlit").collect()] == [2]


def test_tvf_result_cache_never_stale(spark):
    """External files have no mutation ledger, so TVF-touching
    statements must bypass the result cache (same class as external
    catalogs) — directly and through a session view."""
    ps = PaloSession(spark, result_cache=True)
    d = tempfile.mkdtemp(prefix="tvf_cache_pin_")
    spark.createDataFrame([(1,), (2,)], "x bigint").write.mode(
        "overwrite"
    ).parquet(d)
    q = (
        f'SELECT COUNT(*) AS n FROM local("file_path"="{d}", '
        '"format"="parquet")'
    )
    assert ps.sql(q).collect()[0].n == 2
    spark.createDataFrame([(1,), (2,), (3,)], "x bigint").write.mode(
        "overwrite"
    ).parquet(d)
    assert ps.sql(q).collect()[0].n == 3
    ps.sql(
        f'CREATE VIEW v_tvf_pin AS SELECT x FROM local("file_path"="{d}", '
        '"format"="parquet")'
    )
    assert ps.sql("SELECT COUNT(*) AS n FROM v_tvf_pin").collect()[0].n == 3
    spark.createDataFrame([(9,), (8,), (7,), (6,)], "x bigint").write.mode(
        "overwrite"
    ).parquet(d)
    assert ps.sql("SELECT COUNT(*) AS n FROM v_tvf_pin").collect()[0].n == 4


def test_view_over_tvf_relists_replaced_files(spark):
    """A session view over a TVF must re-list the external path per
    query — a fully REPLACED file set (new part-file names) previously
    crashed with FAILED_READ_FILE off the listing pinned at CREATE
    VIEW time."""
    ps = PaloSession(spark)
    d = tempfile.mkdtemp(prefix="tvf_relist_pin_")
    spark.createDataFrame([(1,), (2,)], "x bigint").write.mode(
        "overwrite"
    ).parquet(d)
    ps.sql(
        f'CREATE VIEW v_tvf_rl AS SELECT x FROM local("file_path"="{d}", '
        '"format"="parquet")'
    )
    assert ps.sql("SELECT COUNT(*) AS n FROM v_tvf_rl").collect()[0].n == 2
    spark.createDataFrame([(9,), (8,), (7,)], "x bigint").write.mode(
        "overwrite"
    ).parquet(d)
    assert ps.sql("SELECT COUNT(*) AS n FROM v_tvf_rl").collect()[0].n == 3


def test_delete_using_sequence_col_semantics(spark):
    """Join-delete on a sequence_col table carries the CURRENT sequence
    value, so a later lower-sequence load must NOT resurrect the key
    while a higher-sequence load must."""
    ps = PaloSession(spark)
    t = ps._create_table(
        "CREATE TABLE sqd (`k` BIGINT, `s` BIGINT, `v` VARCHAR(5)) "
        "UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2 "
        "PROPERTIES('function_column.sequence_col'='s')"
    )
    t.insert(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 10, "b")], "k bigint, s bigint, v string"
        )
    )
    ps._refresh_view("sqd")
    ps._create_table(
        "CREATE TABLE sqd2 (`k` BIGINT) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.tables["sqd2"].insert(spark.createDataFrame([(2,)], "k bigint"))
    ps._refresh_view("sqd2")
    ps.sql("DELETE FROM sqd USING sqd2 WHERE sqd.k = sqd2.k")
    t.insert(
        spark.createDataFrame([(2, 5, "low")], "k bigint, s bigint, v string")
    )
    ps._refresh_view("sqd")
    assert sorted(r.k for r in ps.sql("SELECT k FROM sqd").collect()) == [1]
    t.insert(
        spark.createDataFrame([(2, 20, "hi")], "k bigint, s bigint, v string")
    )
    ps._refresh_view("sqd")
    got = dict(
        (r.k, r.v) for r in ps.sql("SELECT k, v FROM sqd").collect()
    )
    assert got == {1: "a", 2: "hi"}


def test_delete_using_non_equality_correlated_predicate(spark, sf_dir):
    """ADVICE r12: the EXISTS rewrite hands non-equality correlated
    predicates to Spark's subquery decorrelation (complete since 3.4).
    Pin that a mixed equality + inequality condition still deletes
    exactly the anti-join complement — if the Spark floor ever drops
    below decorrelation support, this fails loudly at planning time
    rather than silently wrong."""
    register_views(spark, sf_dir)
    ps = PaloSession(spark)
    t, _ = _build_delete_using_pair(spark, sf_dir, ps, "q")
    ps.sql(
        "DELETE FROM duc_q USING duo_q "
        "WHERE duc_q.c_custkey = duo_q.o_custkey "
        "AND duc_q.bal_cents < duo_q.o_orderkey"
    )
    got = {r.c_custkey for r in ps.sql("SELECT c_custkey FROM duc_q").collect()}
    expect = {
        r.c_custkey
        for r in spark.sql(
            "SELECT c.c_custkey FROM customer c WHERE NOT EXISTS ("
            "  SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey"
            "  AND CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) < o.o_orderkey)"
        ).collect()
    }
    assert got == expect
