"""r10 interaction audit, tranche 3 (VERDICT r9 advice #4) — pins.

Axes probed: bucketed tables x lifecycle (rename / CTAS-LIKE /
dist-col rename / ADD COLUMN), agg-state columns x light schema
change (add / rename / drop / type-widen across rowset boundaries),
and Table reopen semantics (pinned separately in
tests/test_tables.py::test_cross_handle_convergence). The audit found
NO wrong answers on the first two axes; these tests pin the probed
interactions so they stay that way.
"""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def test_bucket_spec_survives_lifecycle(ps):
    """Bucket count + distribution columns survive table rename and
    CTAS-LIKE; renaming the distribution column re-keys the spec (and
    a LIKE clone taken afterwards carries the NEW name); ADD COLUMN
    leaves the spec untouched and the write path still buckets."""
    ps.sql("CREATE TABLE ba (k BIGINT, v INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 8")
    ps.sql("INSERT INTO ba VALUES (1, 10)")
    ps.sql("ALTER TABLE ba RENAME bb")
    t = ps.tables["bb"]
    assert (t.meta.buckets, t.meta.dist_cols) == (8, ["k"])
    ps.sql("INSERT INTO bb VALUES (2, 20)")
    ps.sql("CREATE TABLE bc LIKE bb")
    assert (ps.tables["bc"].meta.buckets,
            ps.tables["bc"].meta.dist_cols) == (8, ["k"])
    ps.sql("ALTER TABLE bc RENAME COLUMN k k2")
    assert ps.tables["bc"].meta.dist_cols == ["k2"]
    ps.sql("INSERT INTO bc (k2, v) VALUES (5, 50)")
    ps.sql("CREATE TABLE bd LIKE bc")
    assert ps.tables["bd"].meta.dist_cols == ["k2"]
    ps.sql("ALTER TABLE bb ADD COLUMN w INT DEFAULT '0'")
    ps.sql("INSERT INTO bb (k, v, w) VALUES (3, 30, 7)")
    assert (ps.tables["bb"].meta.buckets,
            ps.tables["bb"].meta.dist_cols) == (8, ["k"])
    rows = {r["k"]: (r["v"], r["w"])
            for r in ps.sql("SELECT k, v, w FROM bb").collect()}
    assert rows == {1: (10, 0), 2: (20, 0), 3: (30, 7)}


def test_agg_state_across_schema_change(ps):
    """AGGREGATE-model merge state x light schema change: an added agg
    column merges across the add boundary (pre-add rows contribute the
    DEFAULT), a renamed agg column keeps its merge function, a dropped
    one vanishes from reads without disturbing siblings, and a widened
    value column sums across old+new rowsets."""
    ps.sql("CREATE TABLE ag (k BIGINT, s INT SUM, mx INT MAX) "
           "AGGREGATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 4")
    ps.sql("INSERT INTO ag VALUES (1, 10, 5), (1, 20, 9)")
    ps.sql("ALTER TABLE ag ADD COLUMN mn INT MIN DEFAULT '999'")
    ps.sql("INSERT INTO ag VALUES (1, 5, 1, 3)")
    r = ps.sql("SELECT k, s, mx, mn FROM ag").collect()[0]
    assert (r["s"], r["mx"], r["mn"]) == (35, 9, 3)
    ps.sql("ALTER TABLE ag RENAME COLUMN s s2")
    ps.sql("INSERT INTO ag (k, s2, mx, mn) VALUES (1, 7, 2, 100)")
    r = ps.sql("SELECT k, s2, mx, mn FROM ag").collect()[0]
    assert (r["s2"], r["mx"], r["mn"]) == (42, 9, 3)
    ps.sql("ALTER TABLE ag DROP COLUMN mx")
    assert "mx" not in ps.sql("SELECT * FROM ag").columns
    ps.sql("ALTER TABLE ag MODIFY COLUMN s2 BIGINT")
    ps.sql("INSERT INTO ag (k, s2, mn) VALUES (1, 1000000000000, 50)")
    r = ps.sql("SELECT k, s2, mn FROM ag").collect()[0]
    assert (r["s2"], r["mn"]) == (1000000000042, 3)


def test_replace_agg_across_add_boundary(ps):
    """REPLACE (latest-version-wins) agg columns stay version-ordered
    across an ADD COLUMN boundary — the added column's default applies
    to pre-add versions but the REPLACE still picks the newest row."""
    ps.sql("CREATE TABLE rg (k BIGINT, r VARCHAR(8) REPLACE) "
           "AGGREGATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 4")
    ps.sql("INSERT INTO rg VALUES (1, 'old')")
    ps.sql("ALTER TABLE rg ADD COLUMN r2 VARCHAR(8) REPLACE DEFAULT 'd'")
    ps.sql("INSERT INTO rg VALUES (1, 'new', 'x')")
    r = ps.sql("SELECT k, r, r2 FROM rg").collect()[0]
    assert (r["r"], r["r2"]) == ("new", "x")
