"""r11 interaction audit (VERDICT r10 advice #4) — the new
partition / MV / index / job machinery crossed with lifecycle ops.

Axes probed: static+temporary partitions x BACKUP/RESTORE (staged
state must survive the snapshot roundtrip with rebased rowset
paths), static partitions x RENAME COLUMN of the partition column
(declared bounds + routing + pruning must follow the rename),
partition-incremental async-MV refresh x DELETE ... USING and x
REPLACE PARTITION (join-deletes bump exactly the touched
partitions; a swap must invalidate the swapped slice), and the job
scheduler x DROP/RENAME TABLE (a job over a vanished name fails as
a recorded task row, never a silent success or a stale handle).
"""

from __future__ import annotations

import os

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def _mk_static(ps, name):
    ps.sql(
        f"CREATE TABLE {name} (`k` BIGINT, `d` DATETIME, `v` BIGINT) "
        "DUPLICATE KEY(k, d) PARTITION BY RANGE(`d`) ("
        "  PARTITION p_old VALUES LESS THAN ('2000-01-01'),"
        "  PARTITION p_new VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql(
        f"INSERT INTO {name} VALUES "
        "(1, '1999-06-01 00:00:00', 10), (2, '2001-06-01 00:00:00', 20)"
    )


def test_restore_keeps_temp_partitions_staged(ps, tmp_path):
    """BACKUP x temporary partitions: the staged (invisible) rows and
    the temp declaration are part of the table state, so a restore
    must bring them back STAGED — invisible to reads, with rowset
    paths rebased onto the restore location so the later REPLACE
    swap serves the restored copy, not the original's files."""
    _mk_static(ps, "bkt")
    ps.sql("ALTER TABLE bkt ADD TEMPORARY PARTITION t_old "
           "VALUES LESS THAN ('2000-01-01')")
    ps.sql("INSERT INTO bkt TEMPORARY PARTITION (t_old) VALUES "
           "(1, '1999-06-01 00:00:00', 999)")
    ps.sql(f"CREATE REPOSITORY br WITH LOCATION '{tmp_path}/brepo'")
    ps.sql("BACKUP SNAPSHOT sp1 TO br ON (bkt)")
    ps.sql("RESTORE SNAPSHOT sp1 FROM br ON (bkt AS bkt2)")
    t2 = ps.tables["bkt2"]
    # the staged declaration survived, and staged rows stay invisible
    assert [p["name"] for p in t2.meta.range_partitions["temp"]] == ["t_old"]
    got = sorted((r.k, r.v) for r in ps.sql("SELECT k, v FROM bkt2").collect())
    assert got == [(1, 10), (2, 20)]
    # every restored rowset path lives under the RESTORE location —
    # the swap below cannot touch the original's files
    orig_loc = ps.tables["bkt"].location
    assert all(
        not r["path"].startswith(orig_loc + os.sep) for r in t2.meta.rowsets
    )
    # the swap materializes the restored staged rows
    ps.sql("ALTER TABLE bkt2 REPLACE PARTITION (p_old) WITH TEMPORARY "
           "PARTITION (t_old)")
    got = sorted((r.k, r.v) for r in ps.sql("SELECT k, v FROM bkt2").collect())
    assert got == [(1, 999), (2, 20)]
    # the original table still has ITS staged copy and original data
    assert [p["name"] for p in
            ps.tables["bkt"].meta.range_partitions["temp"]] == ["t_old"]
    got = sorted((r.k, r.v) for r in ps.sql("SELECT k, v FROM bkt").collect())
    assert got == [(1, 10), (2, 20)]


def test_rename_partition_column_follows_everywhere(ps):
    """RENAME COLUMN of the static partition column: declared bounds
    survive, later loads ROUTE through the renamed column, pruning
    and temp-partition backfill keep working, and DROP COLUMN of the
    (renamed) partition column still refuses."""
    _mk_static(ps, "rnp")
    ps.sql("ALTER TABLE rnp RENAME COLUMN d dt")
    t = ps.tables["rnp"]
    assert t.meta.range_partitions["col"] == "dt"
    assert [p["name"] for p in t.meta.range_partitions["parts"]] == [
        "p_old", "p_new"]
    # loads route through the renamed column into the right partition
    ps.sql("INSERT INTO rnp VALUES (3, '1998-01-01 00:00:00', 30)")
    assert sorted(t.partitions()) == ["p_new", "p_old"]
    # pruning on the renamed column still answers correctly
    got = sorted(r.k for r in ps.sql(
        "SELECT k FROM rnp WHERE dt < '2000-01-01'").collect())
    assert got == [1, 3]
    # temp-partition backfill works post-rename
    ps.sql("ALTER TABLE rnp ADD TEMPORARY PARTITION t_old "
           "VALUES LESS THAN ('2000-01-01')")
    ps.sql("INSERT INTO rnp TEMPORARY PARTITION (t_old) VALUES "
           "(9, '1997-01-01 00:00:00', 90)")
    ps.sql("ALTER TABLE rnp REPLACE PARTITION (p_old) WITH TEMPORARY "
           "PARTITION (t_old)")
    got = sorted((r.k, r.v) for r in ps.sql("SELECT k, v FROM rnp").collect())
    assert got == [(2, 20), (9, 90)]
    # the partition column stays undroppable under its NEW name
    with pytest.raises(ValueError):
        ps.sql("ALTER TABLE rnp DROP COLUMN dt")


def _slice_mtimes(ps, mv_name):
    parts_dir = ps.async_mvs[mv_name]["path"] + "_parts"
    out = {}
    for e in os.listdir(parts_dir):
        if e.startswith("__mv_part="):
            p = os.path.join(parts_dir, e)
            out[e] = max(
                os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
            )
    return out


def test_incremental_mv_refresh_after_delete_using(ps):
    """Partition-incremental async-MV refresh x DELETE ... USING: the
    join-delete lands as a delete-sign rowset whose rows carry the
    partition values of the DELETED rows, so exactly the touched
    partitions' versions bump — the next refresh recomputes those
    slices (values reflect the delete) and leaves the untouched
    slice's files alone (mtime-pinned, the incremental contract)."""
    ps.sql(
        "CREATE TABLE idm (`k` BIGINT, `d` DATETIME, `v` BIGINT) "
        "UNIQUE KEY(k, d) PARTITION BY RANGE(`d`) ("
        "  PARTITION p_old VALUES LESS THAN ('2000-01-01'),"
        "  PARTITION p_new VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql(
        "INSERT INTO idm VALUES "
        "(1, '1999-01-01 00:00:00', 10), (2, '1999-02-01 00:00:00', 20), "
        "(3, '2001-01-01 00:00:00', 30), (4, '2001-02-01 00:00:00', 40)"
    )
    ps.sql(
        "CREATE MATERIALIZED VIEW idm_mv BUILD IMMEDIATE REFRESH AUTO "
        "ON MANUAL AS SELECT k, d, SUM(v) AS sv FROM idm GROUP BY k, d"
    )
    before = _slice_mtimes(ps, "idm_mv")
    assert set(before) == {"__mv_part=p_old", "__mv_part=p_new"}
    # join-delete reaches only the p_old rows
    ps.sql("CREATE TABLE idsrc (`k` BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO idsrc VALUES (1)")
    ps.sql("DELETE FROM idm USING idsrc WHERE idm.k = idsrc.k")
    ps.sql("REFRESH MATERIALIZED VIEW idm_mv")
    got = sorted((r.k, r.sv) for r in
                 ps.sql("SELECT k, sv FROM idm_mv").collect())
    assert got == [(2, 20), (3, 30), (4, 40)]
    after = _slice_mtimes(ps, "idm_mv")
    assert after["__mv_part=p_new"] == before["__mv_part=p_new"], (
        "untouched partition slice was recomputed — incremental "
        "refresh degraded to full rebuild")
    assert after["__mv_part=p_old"] > before["__mv_part=p_old"]


def test_incremental_mv_refresh_after_replace_partition(ps):
    """Partition-incremental async-MV refresh x REPLACE PARTITION:
    while a temp partition is STAGED the refresh must fall back to
    the always-correct full path (staged labels make version space
    and data diverge); after the swap the refresh is incremental
    again and the swapped slice reflects the new data."""
    _mk_static(ps, "rpm")
    ps.sql(
        "CREATE MATERIALIZED VIEW rpm_mv BUILD IMMEDIATE REFRESH AUTO "
        "ON MANUAL AS SELECT k, SUM(v) AS sv FROM rpm GROUP BY k"
    )
    assert sorted((r.k, r.sv) for r in
                  ps.sql("SELECT k, sv FROM rpm_mv").collect()) == [
        (1, 10), (2, 20)]
    ps.sql("ALTER TABLE rpm ADD TEMPORARY PARTITION t_old "
           "VALUES LESS THAN ('2000-01-01')")
    ps.sql("INSERT INTO rpm TEMPORARY PARTITION (t_old) VALUES "
           "(1, '1999-06-01 00:00:00', 777)")
    # staged rows are invisible: a refresh NOW must not see them
    ps.sql("REFRESH MATERIALIZED VIEW rpm_mv")
    assert sorted((r.k, r.sv) for r in
                  ps.sql("SELECT k, sv FROM rpm_mv").collect()) == [
        (1, 10), (2, 20)]
    ps.sql("ALTER TABLE rpm REPLACE PARTITION (p_old) WITH TEMPORARY "
           "PARTITION (t_old)")
    ps.sql("REFRESH MATERIALIZED VIEW rpm_mv")
    assert sorted((r.k, r.sv) for r in
                  ps.sql("SELECT k, sv FROM rpm_mv").collect()) == [
        (1, 777), (2, 20)]


def test_mv_maintenance_survives_inplace_restore(ps, tmp_path):
    """r11 fuzz hunt (seed 19, wrong-answer repro): the load-time MV
    hook rides the Table OBJECT, and an in-place RESTORE swaps in a
    fresh object — the old name-keyed attach guard skipped re-attach,
    so an MV created (or already live) after the restore silently
    stopped maintaining and answered with pre-insert sums."""
    ps.sql("CREATE TABLE rmv (k BIGINT, grp VARCHAR(4), v DOUBLE) "
           "UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql(f"CREATE REPOSITORY rmvrepo WITH LOCATION '{tmp_path}/rmvrepo'")
    ps.sql("BACKUP SNAPSHOT rs1 TO rmvrepo ON (rmv)")
    ps.sql("INSERT INTO rmv (k, grp, v) VALUES (1,'a',10.0)")
    ps.sql("RESTORE SNAPSHOT rs1 FROM rmvrepo ON (rmv)")  # rewind: empty
    # MV created on the RESTORED (fresh) object
    ps.sql("CREATE MATERIALIZED VIEW rmv_mv AS SELECT grp, SUM(v) AS s "
           "FROM rmv GROUP BY grp")
    ps.sql("INSERT INTO rmv (k, grp, v) VALUES (2,'b',20.0), (3,'a',5.0)")
    df, src = ps.rollups.sql("SELECT grp, SUM(v) AS s FROM rmv GROUP BY grp")
    assert src == "rmv_mv"
    assert sorted((r.grp, r.s) for r in df.collect()) == [
        ("a", 5.0), ("b", 20.0)]
    # an MV LIVE ACROSS the restore keeps maintaining afterwards too
    ps.sql("BACKUP SNAPSHOT rs2 TO rmvrepo ON (rmv)")
    ps.sql("RESTORE SNAPSHOT rs2 FROM rmvrepo ON (rmv)")
    ps.sql("INSERT INTO rmv (k, grp, v) VALUES (4,'b',7.0)")
    df, src = ps.rollups.sql("SELECT grp, SUM(v) AS s FROM rmv GROUP BY grp")
    assert src == "rmv_mv"
    assert sorted((r.grp, r.s) for r in df.collect()) == [
        ("a", 5.0), ("b", 27.0)]


def test_mv_no_double_attach_after_rename(ps):
    """The flip side of the object-keyed guard: RENAME keeps the same
    object, so CREATE MV on the new name must NOT attach a second
    load hook — on an additive (DUPLICATE) base a double hook would
    double-apply every delta."""
    ps.sql("CREATE TABLE dda (k BIGINT, grp VARCHAR(4), v DOUBLE) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO dda VALUES (1,'a',10.0)")
    ps.sql("CREATE MATERIALIZED VIEW dda_mv1 AS SELECT grp, SUM(v) AS s "
           "FROM dda GROUP BY grp")
    ps.sql("ALTER TABLE dda RENAME dda2")
    ps.sql("CREATE MATERIALIZED VIEW dda_mv2 AS SELECT grp, COUNT(*) AS c "
           "FROM dda2 GROUP BY grp")
    ps.sql("INSERT INTO dda2 VALUES (2,'a',30.0)")
    df, src = ps.rollups.sql("SELECT grp, SUM(v) AS s FROM dda2 GROUP BY grp")
    assert src in ("dda_mv1", "dda_mv2") or src.startswith("dda_mv")
    assert [(r.grp, r.s) for r in df.collect()] == [("a", 40.0)], (
        "delta applied twice — double-attached load hook")
    df, _ = ps.rollups.sql("SELECT grp, COUNT(*) AS c FROM dda2 GROUP BY grp")
    assert [(r.grp, r.c) for r in df.collect()] == [("a", 2)]


def test_job_scheduler_vs_drop_and_rename_table(ps):
    """Job scheduler x DROP/RENAME TABLE: jobs store statement TEXT,
    not handles — after the target vanishes, a due occurrence records
    a FAILED task row (loud, inspectable) and the job keeps its
    schedule; re-pointing the name at a new table makes later ticks
    insert into the CURRENT owner of the name."""
    ps.sql("CREATE TABLE jt (`k` BIGINT, `v` INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE JOB jj ON SCHEDULE EVERY 1 HOUR STARTS '2024-01-01 00:00:00' "
           "DO INSERT INTO jt VALUES (1, 1)")
    ps.tick_jobs("2024-01-01 00:00:00")
    assert ps.sql("SELECT count(*) AS n FROM jt").collect()[0]["n"] == 1
    ps.sql("ALTER TABLE jt RENAME jt2")
    ps.tick_jobs("2024-01-01 01:00:00")
    tasks = ps.insert_jobs["jj"]["tasks"]
    assert tasks[-1]["status"] == "FAILED" and "jt" in tasks[-1]["err"]
    # the renamed table was NOT written through a stale handle
    assert ps.sql("SELECT count(*) AS n FROM jt2").collect()[0]["n"] == 1
    # a NEW table takes over the name: the job inserts into it
    ps.sql("CREATE TABLE jt (`k` BIGINT, `v` INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.tick_jobs("2024-01-01 02:00:00")
    assert tasks[-1]["status"] == "SUCCESS"
    assert ps.sql("SELECT count(*) AS n FROM jt").collect()[0]["n"] == 1
    assert ps.sql("SELECT count(*) AS n FROM jt2").collect()[0]["n"] == 1
    # DROP: later ticks fail loudly, schedule intact
    ps.sql("DROP TABLE jt")
    ps.tick_jobs("2024-01-01 03:00:00")
    assert tasks[-1]["status"] == "FAILED"
    assert ps.insert_jobs["jj"]["state"] == "RUNNING"
