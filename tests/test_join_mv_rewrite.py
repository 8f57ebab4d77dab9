"""Join-body async MVs + join-aware transparent rewrite (r12; [docs:
async-materialized-view] — upstream Nereids rewrites queries whose
join subtree matches an MV whose body itself joins fact x dim).

Pins: derivation fires only on the SAME table set + SAME inner
equi-join keys, covered dims, derivable aggregates; the rewritten
plan scans the snapshot with NO join; staleness always falls back to
the bases; every out-of-grammar shape (outer joins, differing keys,
uncovered filters, ambiguous bare columns) declines and stays
correct."""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession
from palo_spark.plans import _parse_join_agg_sql


@pytest.fixture
def ps(spark, tmp_path):
    s = PaloSession(spark, location_root=str(tmp_path))
    s.sql("CREATE TABLE jf (`k` BIGINT, `d` BIGINT, `amt` DOUBLE, `q` INT) "
          "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    s.sql("CREATE TABLE jd (`d` BIGINT, `region` VARCHAR(8), "
          "`seg` VARCHAR(8)) DUPLICATE KEY(d) DISTRIBUTED BY HASH(d) "
          "BUCKETS 2")
    s.sql("INSERT INTO jf VALUES (1,1,10.0,1),(2,2,20.0,2),(3,1,30.0,3),"
          "(4,3,40.0,4)")
    s.sql("INSERT INTO jd VALUES (1,'eu','a'),(2,'us','b'),(3,'eu','b')")
    s.sql("CREATE MATERIALIZED VIEW jmv BUILD IMMEDIATE REFRESH COMPLETE "
          "ON MANUAL AS SELECT d2.region AS region, d2.seg AS seg, "
          "SUM(jf.amt) AS sum_amt, COUNT(jf.amt) AS count_amt, "
          "COUNT(*) AS count_all, MIN(jf.q) AS min_q, MAX(jf.q) AS max_q "
          "FROM jf JOIN jd d2 ON jf.d = d2.d GROUP BY d2.region, d2.seg")
    return s


def _base(ps, sql):
    """The same query computed from the bases (rewrite off)."""
    prev = ps.mv_rewrite_enabled
    ps.mv_rewrite_enabled = False
    try:
        return sorted(tuple(r) for r in ps.sql(sql).collect())
    finally:
        ps.mv_rewrite_enabled = prev


def test_coarser_group_derivation_and_plan(ps):
    q = ("SELECT d.region AS region, SUM(jf.amt) AS s, AVG(jf.amt) AS a, "
         "COUNT(*) AS n, MIN(jf.q) AS mq, MAX(jf.q) AS xq "
         "FROM jf JOIN jd d ON jf.d = d.d GROUP BY d.region")
    expect = _base(ps, q)
    df = ps.sql(q)
    assert ps.last_mv_rewrite == "jmv"
    assert sorted(tuple(r) for r in df.collect()) == expect
    plan = df._jdf.queryExecution().executedPlan().toString().replace("\n", " ")
    assert "Join" not in plan, "rewritten plan still joins"
    assert "_async_mv/jmv" in plan or "FileScan" in plan


def test_residual_where_on_dim(ps):
    q = ("SELECT d.seg AS seg, SUM(jf.amt) AS s FROM jf JOIN jd d "
         "ON jf.d = d.d WHERE d.region = 'eu' GROUP BY d.seg")
    expect = _base(ps, q)
    df = ps.sql(q)
    assert ps.last_mv_rewrite == "jmv"
    assert sorted(tuple(r) for r in df.collect()) == expect
    # bare (unqualified) dim column resolves through the schemas too
    q2 = ("SELECT seg, SUM(amt) AS s FROM jf JOIN jd d ON jf.d = d.d "
          "WHERE region = 'eu' GROUP BY seg")
    expect2 = _base(ps, q2)
    df2 = ps.sql(q2)
    assert ps.last_mv_rewrite == "jmv"
    assert sorted(tuple(r) for r in df2.collect()) == expect2


def test_stale_snapshot_never_rewrites(ps):
    ps.sql("INSERT INTO jf VALUES (5,3,50.0,5)")
    q = ("SELECT d.region AS region, SUM(jf.amt) AS s FROM jf JOIN jd d "
         "ON jf.d = d.d GROUP BY d.region")
    df = ps.sql(q)
    assert ps.last_mv_rewrite is None, "stale snapshot must not answer"
    assert sorted(tuple(r) for r in df.collect()) == _base(ps, q)
    ps.sql("REFRESH MATERIALIZED VIEW jmv")
    ps.sql(q)
    assert ps.last_mv_rewrite == "jmv"


def test_out_of_grammar_shapes_decline_and_stay_correct(ps):
    cases = [
        # different join key (jf.k, not jf.d) — NOT the MV's subtree
        "SELECT d.region AS region, SUM(jf.amt) AS s FROM jf JOIN jd d "
        "ON jf.k = d.d GROUP BY d.region",
        # outer join — out of grammar entirely
        "SELECT d.region AS region, SUM(jf.amt) AS s FROM jf LEFT JOIN "
        "jd d ON jf.d = d.d GROUP BY d.region",
        # filter on a non-dim (fact measure) column
        "SELECT d.region AS region, SUM(jf.amt) AS s FROM jf JOIN jd d "
        "ON jf.d = d.d WHERE jf.q > 1 GROUP BY d.region",
        # aggregate the MV does not store (SUM of q)
        "SELECT d.region AS region, SUM(jf.q) AS s FROM jf JOIN jd d "
        "ON jf.d = d.d GROUP BY d.region",
        # group by a non-dim column
        "SELECT jf.q AS q, SUM(jf.amt) AS s FROM jf JOIN jd d "
        "ON jf.d = d.d GROUP BY jf.q",
    ]
    for q in cases:
        df = ps.sql(q)
        assert ps.last_mv_rewrite is None, q
        assert sorted(tuple(r) for r in df.collect()) == _base(ps, q), q


def test_mv_body_where_requires_exact_match(ps, tmp_path):
    # drop the unfiltered MV — it can answer these with a residual
    # filter (also correct), which would mask the filtered-body path
    ps.sql("DROP MATERIALIZED VIEW jmv")
    ps.sql("CREATE MATERIALIZED VIEW jmv_w BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT d2.seg AS seg, SUM(jf.amt) AS "
           "sum_amt FROM jf JOIN jd d2 ON jf.d = d2.d "
           "WHERE d2.region = 'eu' GROUP BY d2.seg")
    # same filter, different alias spelling → canonical match, rewrite
    q = ("SELECT x.seg AS seg, SUM(jf.amt) AS s FROM jf JOIN jd x "
         "ON jf.d = x.d WHERE x.region = 'eu' GROUP BY x.seg")
    expect = _base(ps, q)
    df = ps.sql(q)
    assert ps.last_mv_rewrite == "jmv_w"
    assert sorted(tuple(r) for r in df.collect()) == expect
    # different filter → the filtered snapshot CANNOT answer it
    q2 = ("SELECT x.seg AS seg, SUM(jf.amt) AS s FROM jf JOIN jd x "
          "ON jf.d = x.d WHERE x.region = 'us' GROUP BY x.seg")
    df2 = ps.sql(q2)
    assert ps.last_mv_rewrite != "jmv_w"
    assert sorted(tuple(r) for r in df2.collect()) == _base(ps, q2)


def test_refresh_auto_join_body_full_refresh_fallback(spark, tmp_path):
    """REFRESH AUTO on a join body: partition-incremental alignment is
    single-table by design, so the refresh falls back to the
    always-correct full recompute (documented fallback; the fact-side
    incremental path is future work)."""
    ps = PaloSession(spark, location_root=str(tmp_path))
    ps.sql("CREATE TABLE af (`k` BIGINT, `d` BIGINT, `amt` BIGINT) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE ad (`d` BIGINT, `g` VARCHAR(4)) DUPLICATE KEY(d) "
           "DISTRIBUTED BY HASH(d) BUCKETS 2")
    ps.sql("INSERT INTO af VALUES (1,1,5),(2,2,7)")
    ps.sql("INSERT INTO ad VALUES (1,'x'),(2,'y')")
    ps.sql("CREATE MATERIALIZED VIEW amv_j BUILD IMMEDIATE REFRESH AUTO "
           "ON COMMIT AS SELECT ad.g AS g, SUM(af.amt) AS s FROM af "
           "JOIN ad ON af.d = ad.d GROUP BY ad.g")
    ps.sql("INSERT INTO af VALUES (3,1,11)")
    got = sorted(tuple(r) for r in
                 ps.sql("SELECT g, s FROM amv_j").collect())
    assert got == [("x", 16), ("y", 7)]


def test_parser_shapes(spark):
    cols = {"t1": {"a", "b", "m"}, "t2": {"b", "c"}}.get
    p = _parse_join_agg_sql(
        "SELECT t2.c AS c, SUM(t1.m) AS s FROM t1 JOIN t2 ON t1.b = t2.b "
        "GROUP BY t2.c", cols)
    assert p is not None
    assert p["tables"] == frozenset({"t1", "t2"})
    assert p["join_keys"] == frozenset(
        {frozenset({("t1", "b"), ("t2", "b")})})
    # unqualified columns resolve through the schemas; ambiguous ones
    # (b lives in both) refuse
    assert _parse_join_agg_sql(
        "SELECT c, SUM(m) AS s FROM t1 JOIN t2 ON t1.b = t2.b GROUP BY c",
        cols) is not None
    assert _parse_join_agg_sql(
        "SELECT b, SUM(m) AS s FROM t1 JOIN t2 ON t1.b = t2.b GROUP BY b",
        cols) is None
    # out of grammar: outer join, self-join, non-equi ON, no GROUP BY
    assert _parse_join_agg_sql(
        "SELECT c, SUM(m) AS s FROM t1 LEFT JOIN t2 ON t1.b = t2.b "
        "GROUP BY c", cols) is None
    assert _parse_join_agg_sql(
        "SELECT x.a, SUM(x.m) AS s FROM t1 x JOIN t1 y ON x.b = y.b "
        "GROUP BY x.a", cols) is None
    assert _parse_join_agg_sql(
        "SELECT c, SUM(m) AS s FROM t1 JOIN t2 ON t1.b < t2.b GROUP BY c",
        cols) is None
    assert _parse_join_agg_sql(
        "SELECT t1.a, t2.c FROM t1 JOIN t2 ON t1.b = t2.b", cols) is None
