"""r12 interaction audit (VERDICT r11 advice #2) — the r11 privilege /
row-policy machinery crossed with lifecycle ops.

Axes probed: self-DROP USER as a privilege escalation (the found-and-
fixed wrong answer of this round: falling back to root let any
GRANT_PRIV holder promote themselves), REVOKE vs the result cache
(enforcement must precede the cache lookup), row policies x in-place
BACKUP/RESTORE (the policy must filter the RESTORED incarnation),
access state x cross-warehouse RESTORE (privileges are FE metadata,
not snapshot content — upstream posture), and MV maintenance
surviving its creating user's drop (maintenance is definer-rights
session machinery, not tied to a stored identity)."""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def _mk(ps):
    ps.sql("CREATE TABLE ir_t (`k` BIGINT, `region` VARCHAR(4), `v` INT) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO ir_t VALUES (1,'eu',10),(2,'us',20)")


def test_self_drop_user_is_refused_not_promoted(ps):
    """r12 found wrong answer: DROP USER of the CURRENT identity fell
    back to current_user='root', so any GRANT_PRIV holder could
    self-drop INTO the superuser and read everything. Now refused."""
    _mk(ps)
    ps.sql("CREATE USER 'evil'")
    ps.sql("GRANT GRANT_PRIV ON *.*.* TO 'evil'")
    ps.su("evil")
    try:
        with pytest.raises(ValueError, match="current session identity"):
            ps.sql("DROP USER 'evil'")
        assert ps.current_user == "evil"
        with pytest.raises(PermissionError):
            ps.sql("SELECT k FROM ir_t")
    finally:
        ps.su("root")
    ps.sql("DROP USER 'evil'")  # root may drop them fine
    assert "evil" not in ps.access.users


def test_revoke_beats_result_cache(ps):
    """The result cache is identity-blind by design (it stores only
    policy-exempt results), so REVOKE must bite BEFORE the cache
    lookup — a revoked user must never be served a cached row set."""
    ps.result_cache_enabled = True
    _mk(ps)
    ps.sql("CREATE USER 'al'")
    ps.sql("GRANT SELECT_PRIV ON ir_t TO 'al'")
    q = "SELECT count(*) AS n FROM ir_t"
    try:
        ps.su("al")
        assert ps.sql(q).collect()[0]["n"] == 2
        assert ps.sql(q).collect()[0]["n"] == 2 and ps.last_cache_hit
        ps.su("root")
        ps.sql("REVOKE SELECT_PRIV ON ir_t FROM 'al'")
        ps.su("al")
        with pytest.raises(PermissionError):
            ps.sql(q)
        # and a policy arriving AFTER a cache prime bypasses the cache
        ps.su("root")
        ps.sql("GRANT SELECT_PRIV ON ir_t TO 'al'")
        ps.sql("CREATE ROW POLICY al_eu ON ir_t AS RESTRICTIVE TO 'al' "
               "USING (region = 'eu')")
        ps.su("al")
        assert ps.sql(q).collect()[0]["n"] == 1 and not ps.last_cache_hit
    finally:
        ps.su("root")
    assert ps.sql(q).collect()[0]["n"] == 2  # root's cache entry intact


def test_row_policy_filters_restored_incarnation(ps, tmp_path):
    """In-place RESTORE replaces the Table OBJECT under the name; row
    policies bind by name (upstream: table id in one FE namespace), so
    the policy must keep filtering the RESTORED data — the
    NAME-vs-OBJECT lifetime class the r9/r11 hunts kept finding."""
    _mk(ps)
    ps.sql("CREATE USER 'bo'")
    ps.sql("GRANT SELECT_PRIV ON ir_t TO 'bo'")
    ps.sql("CREATE ROW POLICY bo_eu ON ir_t AS RESTRICTIVE TO 'bo' "
           "USING (region = 'eu')")
    ps.sql(f"CREATE REPOSITORY irp WITH LOCATION '{tmp_path}/irp'")
    ps.sql("BACKUP SNAPSHOT is1 TO irp ON (ir_t)")
    ps.sql("INSERT INTO ir_t VALUES (3,'eu',30),(4,'us',40)")
    ps.sql("RESTORE SNAPSHOT is1 FROM irp ON (ir_t)")  # rewind in place
    try:
        ps.su("bo")
        got = sorted(r["k"] for r in ps.sql("SELECT k FROM ir_t").collect())
        assert got == [1], "policy must filter the restored incarnation"
    finally:
        ps.su("root")
    assert sorted(r["k"] for r in
                  ps.sql("SELECT k FROM ir_t").collect()) == [1, 2]


def test_access_state_is_warehouse_metadata_not_snapshot_content(
    spark, tmp_path
):
    """RESTORE into a DIFFERENT warehouse brings table data, never the
    source warehouse's users/grants/policies — privileges are FE
    metadata ([docs: backup-restore]: snapshots carry table state;
    upstream privileges live in the FE image, not in snapshots). The
    restored table is governed by the DESTINATION warehouse's access
    state. Same-warehouse persistence is covered by
    test_access_state_survives_session_reattach."""
    src = str(tmp_path / "src")
    ps1 = PaloSession(spark, location_root=src)
    ps1.sql("CREATE TABLE xw (`k` BIGINT, `region` VARCHAR(4)) "
            "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 1")
    ps1.sql("INSERT INTO xw VALUES (1,'eu'),(2,'us')")
    ps1.sql("CREATE USER 'carol'")
    ps1.sql("CREATE ROW POLICY c_eu ON xw AS RESTRICTIVE TO 'carol' "
            "USING (region = 'eu')")
    ps1.sql(f"CREATE REPOSITORY xr WITH LOCATION '{tmp_path}/xrepo'")
    ps1.sql("BACKUP SNAPSHOT xs TO xr ON (xw)")
    ps2 = PaloSession(spark, location_root=str(tmp_path / "dst"))
    ps2.sql(f"CREATE REPOSITORY xr WITH LOCATION '{tmp_path}/xrepo'")
    ps2.sql("RESTORE SNAPSHOT xs FROM xr ON (xw AS xw2)")
    assert ps2.access.policies == [] and "carol" not in ps2.access.users
    assert sorted(r["k"] for r in
                  ps2.sql("SELECT k FROM xw2").collect()) == [1, 2]
    # destination-side governance applies to the restored table
    ps2.sql("CREATE USER 'dave'")
    ps2.sql("GRANT SELECT_PRIV ON xw2 TO 'dave'")
    ps2.sql("CREATE ROW POLICY d_us ON xw2 AS RESTRICTIVE TO 'dave' "
            "USING (region = 'us')")
    try:
        ps2.su("dave")
        assert [r["k"] for r in ps2.sql("SELECT k FROM xw2").collect()] == [2]
    finally:
        ps2.su("root")


def test_mv_maintenance_survives_definer_drop(ps):
    """An async MV created by a later-dropped user keeps refreshing:
    maintenance runs definer-rights as SESSION machinery (upstream: the
    FE refreshes MVs with its own authority), so no dangling identity
    reference exists to go stale."""
    _mk(ps)
    ps.sql("CREATE USER 'cr'")
    ps.sql("GRANT SELECT_PRIV, CREATE_PRIV, LOAD_PRIV ON *.*.* TO 'cr'")
    ps.su("cr")
    ps.sql("CREATE MATERIALIZED VIEW ir_mv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON COMMIT AS SELECT region, SUM(v) AS sv FROM ir_t "
           "GROUP BY region")
    ps.su("root")
    ps.sql("DROP USER 'cr'")
    ps.sql("INSERT INTO ir_t VALUES (9,'ap',99)")  # fires ON COMMIT
    got = sorted(tuple(r) for r in
                 ps.sql("SELECT region, sv FROM ir_mv").collect())
    assert got == [("ap", 99), ("eu", 10), ("us", 20)]
    ps.sql("REFRESH MATERIALIZED VIEW ir_mv")  # explicit refresh too


def test_rename_refused_while_on_commit_mv_references_table(ps):
    """r12 audit: async MV bodies bind to bases by NAME — a rename
    silently detaches the ON COMMIT trigger (stale snapshot serves
    forever; wrong-answer repro: post-rename inserts never refreshed
    the MV). ON COMMIT MVs refuse the rename loudly, like the
    column-drop guard. ON MANUAL MVs keep renaming: their staleness is
    within the manual contract and the rewrite is lineage-gated
    (pinned in test_async_mv_rewrite_adversarial_edges)."""
    import pytest

    ps.sql("CREATE TABLE rnb (k INT, v INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO rnb VALUES (1,10),(2,20)")
    ps.sql("CREATE MATERIALIZED VIEW rnb_cmv REFRESH AUTO ON COMMIT AS "
           "SELECT SUM(v) AS sv FROM rnb")
    with pytest.raises(ValueError, match="rnb_cmv"):
        ps.sql("ALTER TABLE rnb RENAME rnb2")
    # through a view too: the MV reaches the table transitively
    ps.sql("DROP MATERIALIZED VIEW rnb_cmv")
    ps.sql("CREATE VIEW rnb_v AS SELECT v FROM rnb")
    ps.sql("CREATE MATERIALIZED VIEW rnb_vmv REFRESH AUTO ON COMMIT AS "
           "SELECT SUM(v) AS sv FROM rnb_v")
    with pytest.raises(ValueError, match="rnb_vmv"):
        ps.sql("ALTER TABLE rnb RENAME rnb2")
    ps.sql("DROP MATERIALIZED VIEW rnb_vmv")
    # an ON MANUAL MV does NOT block the rename
    ps.sql("CREATE MATERIALIZED VIEW rnb_mmv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT SUM(v) AS sv FROM rnb")
    ps.sql("ALTER TABLE rnb RENAME rnb2")
    assert ps.sql("SELECT count(*) AS n FROM rnb2").collect()[0]["n"] == 2
    # post-rename manual refresh fails LOUDLY (base name gone), never
    # silently serves
    with pytest.raises(Exception):
        ps.sql("REFRESH MATERIALIZED VIEW rnb_mmv")
