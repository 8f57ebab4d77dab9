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
    """REFRESH AUTO on a join body with NO partitioned side: the
    fact-side incremental path needs exactly one partitioned table
    (see test_join_body_fact_side_incremental_refresh), so this falls
    back to the always-correct full recompute."""
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


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_join_rewrite_equivalence_fuzz(spark, tmp_path, seed):
    """Randomized closure of the join-aware rewrite: random join-body
    MVs x random queries (alias-shuffled, group subsets, AVG asks,
    matching/residual/declining filters, staleness injections) — after
    EVERY query, rewrite-enabled results must equal rewrite-disabled
    (computed from the bases). Tracks that rewrites actually FIRE so
    the fuzz can't go vacuous."""
    import random

    rng = random.Random(seed)
    ps = PaloSession(spark, location_root=str(tmp_path))
    ps.sql("CREATE TABLE fz_f (`k` BIGINT, `d1` BIGINT, `d2` BIGINT, "
           "`m1` BIGINT, `m2` BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE fz_da (`d1` BIGINT, `ga` VARCHAR(4), "
           "`gb` VARCHAR(4)) DUPLICATE KEY(d1) DISTRIBUTED BY HASH(d1) "
           "BUCKETS 2")
    ps.sql("CREATE TABLE fz_db (`d2` BIGINT, `gc` VARCHAR(4)) "
           "DUPLICATE KEY(d2) DISTRIBUTED BY HASH(d2) BUCKETS 2")
    ps.sql("INSERT INTO fz_da VALUES " + ", ".join(
        f"({i}, 'a{i % 3}', 'b{i % 2}')" for i in range(6)))
    ps.sql("INSERT INTO fz_db VALUES " + ", ".join(
        f"({i}, 'c{i % 2}')" for i in range(4)))
    ps.sql("INSERT INTO fz_f VALUES " + ", ".join(
        f"({i}, {i % 6}, {i % 4}, {i * 7 % 23}, {i * 3 % 11})"
        for i in range(60)))

    DIM_COLS = {"fz_da": ["ga", "gb"], "fz_db": ["gc"]}
    WHERES = [  # (text template over alias, refs dim table)
        ("{a}.ga = 'a1'", "fz_da"),
        ("{a}.gb != 'b0'", "fz_da"),
        ("{a}.gc = 'c1'", "fz_db"),
    ]
    fired = 0
    for round_i in range(12):
        use_db = rng.random() < 0.5
        tables = ["fz_da"] + (["fz_db"] if use_db else [])
        # ---- MV body
        mv_dims = []
        for t in tables:
            mv_dims += [(t, c) for c in DIM_COLS[t]
                        if rng.random() < 0.8]
        if not mv_dims:
            mv_dims = [("fz_da", "ga")]
        aggs = rng.sample(
            ["sum(f.m1) AS s_m1", "count(f.m1) AS c_m1",
             "count(*) AS c_all", "min(f.m1) AS mn_m1",
             "max(f.m2) AS mx_m2"],
            rng.randint(2, 4))
        if rng.random() < 0.5 and "sum(f.m1) AS s_m1" not in aggs:
            aggs.append("sum(f.m1) AS s_m1")
        sel = [f"{t.split('_')[1]}.{c} AS {c}" for t, c in mv_dims] + aggs
        frm = "fz_f f JOIN fz_da da ON f.d1 = da.d1"
        if use_db:
            frm += " JOIN fz_db db ON f.d2 = db.d2"
        frm = frm.replace("fz_da da", "fz_da da").replace(
            "fz_db db", "fz_db db")
        body = (f"SELECT {', '.join(sel)} FROM {frm} GROUP BY "
                + ", ".join(f"{t.split('_')[1]}.{c}" for t, c in mv_dims))
        mv_where = None
        if rng.random() < 0.3:
            wt, wtbl = rng.choice(WHERES)
            if wtbl in tables:
                mv_where = wt.format(a=wtbl.split("_")[1])
                body = body.replace(" GROUP BY",
                                    f" WHERE {mv_where} GROUP BY", 1)
        ps.sql(f"CREATE MATERIALIZED VIEW fz_mv{round_i} BUILD IMMEDIATE "
               f"REFRESH COMPLETE ON MANUAL AS {body}")
        # ---- queries against it
        for _q in range(3):
            q_dims = [d for d in mv_dims if rng.random() < 0.7] or mv_dims[:1]
            q_aggs = []
            for a in aggs:
                if rng.random() < 0.6:
                    q_aggs.append(a.replace(" AS ", " AS q_"))
            if rng.random() < 0.4:
                q_aggs.append("avg(f.m1) AS q_avg")  # derivable iff pair
            if not q_aggs:
                q_aggs = ["count(*) AS q_n"]
            qsel = ([f"{t.split('_')[1]}2.{c} AS {c}" for t, c in q_dims]
                    + [a.replace("f.", "f2.") for a in q_aggs])
            qfrm = "fz_f f2 JOIN fz_da da2 ON f2.d1 = da2.d1"
            if use_db:
                qfrm += " JOIN fz_db db2 ON f2.d2 = db2.d2"
            q = (f"SELECT {', '.join(qsel)} FROM {qfrm}")
            r = rng.random()
            if mv_where is not None:
                # must match the MV filter exactly (alias-shifted) or
                # the rewrite declines — both paths must stay correct
                if r < 0.6:
                    q += " WHERE " + mv_where.replace(
                        "da.", "da2.").replace("db.", "db2.")
            elif r < 0.4:
                wt, wtbl = rng.choice(WHERES)
                if wtbl in tables:
                    q += " WHERE " + wt.format(a=wtbl.split("_")[1] + "2")
            elif r < 0.5:
                q += " WHERE f2.m1 > 5"  # fact filter → must decline
            q += " GROUP BY " + ", ".join(
                f"{t.split('_')[1]}2.{c}" for t, c in q_dims)
            want = _base(ps, q)
            got = sorted(tuple(x) for x in ps.sql(q).collect())
            if ps.last_mv_rewrite:
                fired += 1
            assert got == want, (seed, round_i, _q, q,
                                 ps.last_mv_rewrite, got[:3], want[:3])
        # ---- staleness injection: mutate, query (must fall back),
        # refresh, query again
        if rng.random() < 0.5:
            ps.sql(f"INSERT INTO fz_f VALUES (900{round_i}, "
                   f"{rng.randint(0, 5)}, {rng.randint(0, 3)}, 99, 7)")
            q = ("SELECT da2.ga AS ga, sum(f2.m1) AS q_s FROM fz_f f2 "
                 "JOIN fz_da da2 ON f2.d1 = da2.d1 GROUP BY da2.ga")
            got = sorted(tuple(x) for x in ps.sql(q).collect())
            assert not (ps.last_mv_rewrite or "").startswith("fz_mv"), (
                seed, round_i, "stale snapshot answered", ps.last_mv_rewrite)
            assert got == _base(ps, q), (seed, round_i, "stale", q)
            ps.sql(f"REFRESH MATERIALIZED VIEW fz_mv{round_i}")
        ps.sql(f"DROP MATERIALIZED VIEW fz_mv{round_i}")
    assert fired >= 5, f"rewrite fired only {fired} times — fuzz vacuous"


def test_join_body_fact_side_incremental_refresh(spark, tmp_path):
    """r12 fact-side incremental for JOIN bodies: with exactly one
    partitioned table in the join (the fact), REFRESH AUTO recomputes
    ONLY the stale fact partitions' slices (joined against the full
    dims; mtime-pinned), while a DIM change rebuilds every slice (its
    state token gates the diff — fact-partition versions alone cannot
    see it). Values always equal the base recompute, and the
    transparent rewrite still derives from the merged slice view."""
    import os
    import time

    ps = PaloSession(spark, location_root=str(tmp_path))
    ps.sql("CREATE TABLE ijf (`k` BIGINT, `d` DATETIME, `c` BIGINT, "
           "`amt` BIGINT) DUPLICATE KEY(k) AUTO PARTITION BY RANGE "
           "(date_trunc(`d`, 'month')) () DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE ijd (`c` BIGINT, `g` VARCHAR(4)) DUPLICATE "
           "KEY(c) DISTRIBUTED BY HASH(c) BUCKETS 2")
    ps.sql("INSERT INTO ijd VALUES (1,'x'),(2,'y')")
    ps.sql("INSERT INTO ijf VALUES (1,'2024-01-05 00:00:00',1,10),"
           "(2,'2024-02-05 00:00:00',2,20),(3,'2024-01-15 00:00:00',2,30)")
    ps.sql("CREATE MATERIALIZED VIEW ijm BUILD IMMEDIATE REFRESH AUTO "
           "ON MANUAL AS SELECT ijd.g AS g, SUM(ijf.amt) AS s, "
           "COUNT(*) AS n FROM ijf JOIN ijd ON ijf.c = ijd.c "
           "GROUP BY ijd.g")
    info = ps._mv_incremental_info("ijm", ps.async_mvs["ijm"])
    assert info is not None and info["join"]["fact"] == "ijf"
    assert info["join"]["dims"] == ["ijd"]
    parts = ps.async_mvs["ijm"]["path"] + "_parts"

    def slice_mtimes():
        return {e: os.path.getmtime(os.path.join(parts, e))
                for e in os.listdir(parts) if e.startswith("__mv_part=")}

    def truth():
        return _base(ps, "SELECT ijd.g AS g, SUM(ijf.amt) AS s, "
                         "COUNT(*) AS n FROM ijf JOIN ijd "
                         "ON ijf.c = ijd.c GROUP BY ijd.g")

    assert {"__mv_part=m2024-01", "__mv_part=m2024-02"} <= set(
        os.listdir(parts))
    assert sorted(tuple(r) for r in
                  ps.sql("SELECT g, s, n FROM ijm").collect()) == truth()
    m1 = slice_mtimes()
    time.sleep(1.1)
    # fact insert touching ONLY February
    ps.sql("INSERT INTO ijf VALUES (4,'2024-02-20 00:00:00',1,40)")
    ps.sql("REFRESH MATERIALIZED VIEW ijm")
    m2 = slice_mtimes()
    assert sorted(e for e in m2 if m1.get(e) != m2[e]) == [
        "__mv_part=m2024-02"], "untouched slices were rewritten"
    assert sorted(tuple(r) for r in
                  ps.sql("SELECT g, s, n FROM ijm").collect()) == truth()
    # a NEW fact partition computes only itself
    time.sleep(1.1)
    ps.sql("INSERT INTO ijf VALUES (5,'2024-03-01 00:00:00',2,70)")
    ps.sql("REFRESH MATERIALIZED VIEW ijm")
    m3 = slice_mtimes()
    assert sorted(e for e in m3 if m2.get(e) != m3[e]) == [
        "__mv_part=m2024-03"]
    assert sorted(tuple(r) for r in
                  ps.sql("SELECT g, s, n FROM ijm").collect()) == truth()
    # DIM change: every slice rebuilds (the diff is gated on dim state)
    time.sleep(1.1)
    ps.sql("INSERT INTO ijd VALUES (3,'z')")
    ps.sql("INSERT INTO ijf VALUES (6,'2024-01-25 00:00:00',3,50)")
    ps.sql("REFRESH MATERIALIZED VIEW ijm")
    m4 = slice_mtimes()
    assert sorted(e for e in m4 if m3.get(e) != m4[e]) == [
        "__mv_part=m2024-01", "__mv_part=m2024-02", "__mv_part=m2024-03"]
    assert sorted(tuple(r) for r in
                  ps.sql("SELECT g, s, n FROM ijm").collect()) == truth()
    # the transparent rewrite derives from the merged slice view
    q = ("SELECT ijd.g AS g, SUM(ijf.amt) AS s FROM ijf JOIN ijd "
         "ON ijf.c = ijd.c GROUP BY ijd.g")
    got = sorted(tuple(r) for r in ps.sql(q).collect())
    assert ps.last_mv_rewrite == "ijm"
    assert got == _base(ps, q)


def test_cheapest_covering_snapshot_wins(ps):
    """When several join MVs cover a query, the one with the FEWEST
    stored dims answers (smallest snapshot — the rollup catalog's
    cheapest-cover rule). jmv stores (region, seg); a region-only MV
    must win region-grouped queries."""
    ps.sql("CREATE MATERIALIZED VIEW jmv_r BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT d2.region AS region, "
           "SUM(jf.amt) AS sum_amt FROM jf JOIN jd d2 ON jf.d = d2.d "
           "GROUP BY d2.region")
    q = ("SELECT d.region AS region, SUM(jf.amt) AS s FROM jf JOIN jd d "
         "ON jf.d = d.d GROUP BY d.region")
    expect = _base(ps, q)
    df = ps.sql(q)
    assert ps.last_mv_rewrite == "jmv_r", "wider snapshot won"
    assert sorted(tuple(r) for r in df.collect()) == expect
    # a seg-grouped query is NOT covered by jmv_r — falls to jmv
    q2 = ("SELECT d.seg AS seg, SUM(jf.amt) AS s FROM jf JOIN jd d "
          "ON jf.d = d.d GROUP BY d.seg")
    expect2 = _base(ps, q2)
    df2 = ps.sql(q2)
    assert ps.last_mv_rewrite == "jmv"
    assert sorted(tuple(r) for r in df2.collect()) == expect2
