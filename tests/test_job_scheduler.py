"""Doris 2.1 scheduled jobs ([docs: job-scheduler]): CREATE JOB ... ON
SCHEDULE (AT | EVERY) DO INSERT, PAUSE/RESUME/DROP JOB, tick_jobs
deterministic replay, jobs()/tasks() metadata TVFs."""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark):
    s = PaloSession(spark)
    s.sql(
        "CREATE TABLE jobt (`k` BIGINT, `v` BIGINT) DUPLICATE KEY(k) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    return s


def test_recurring_job_catchup_and_ends(ps):
    ps.sql(
        "CREATE JOB jr ON SCHEDULE EVERY 1 DAY STARTS "
        "'2024-01-01 00:00:00' ENDS '2024-01-03 00:00:00' "
        "DO INSERT INTO jobt VALUES (1, 10)"
    )
    # every due occurrence executes once; ENDS caps the window
    assert ps.tick_jobs("2024-01-10 00:00:00") == 3
    assert ps.sql("SELECT COUNT(*) AS n FROM jobt").collect()[0].n == 3
    # finished: further ticks are no-ops
    assert ps.tick_jobs("2024-02-01 00:00:00") == 0
    row = ps.sql('SELECT Status FROM jobs("type"="insert")').collect()[0]
    assert row.Status == "FINISHED"


def test_one_time_job_and_task_rows(ps):
    ps.sql(
        "CREATE JOB jo ON SCHEDULE AT '2024-02-01 00:00:00' "
        "DO INSERT INTO jobt VALUES (2, 20)"
    )
    assert ps.tick_jobs("2024-01-31 00:00:00") == 0  # not due yet
    assert ps.tick_jobs("2024-02-01 00:00:00") == 1
    tasks = ps.sql(
        'SELECT JobName, Status FROM tasks("type"="insert")'
    ).collect()
    assert [(t.JobName, t.Status) for t in tasks] == [("jo", "SUCCESS")]


def test_pause_resume_drop(ps):
    ps.sql(
        "CREATE JOB jp ON SCHEDULE EVERY 1 HOUR STARTS "
        "'2024-01-01 00:00:00' DO INSERT INTO jobt VALUES (3, 30)"
    )
    ps.sql("PAUSE JOB WHERE jobname = 'jp'")
    assert ps.tick_jobs("2024-01-01 00:00:00") == 0
    ps.sql("RESUME JOB WHERE jobname = 'jp'")
    assert ps.tick_jobs("2024-01-01 00:00:00") == 1
    ps.sql("DROP JOB WHERE jobname = 'jp'")
    assert ps.sql('SELECT * FROM jobs("type"="insert")').count() == 0
    with pytest.raises(ValueError, match="unknown job"):
        ps.sql("RESUME JOB WHERE jobname = 'jp'")


def test_failed_task_recorded_not_raised(ps):
    ps.sql(
        "CREATE JOB jf ON SCHEDULE AT '2024-01-01 00:00:00' "
        "DO INSERT INTO no_such_table VALUES (1, 1)"
    )
    assert ps.tick_jobs("2024-01-02 00:00:00") == 1
    t = ps.sql('SELECT Status, ErrorMsg FROM tasks("type"="insert")').collect()[0]
    assert t.Status == "FAILED" and "no_such_table" in t.ErrorMsg


def test_job_restrictions(ps):
    with pytest.raises(ValueError, match="INSERT statements only"):
        ps.sql(
            "CREATE JOB jb ON SCHEDULE AT '2024-01-01 00:00:00' "
            "DO DROP TABLE jobt"
        )
    ps.sql(
        "CREATE JOB jd ON SCHEDULE AT '2024-01-01 00:00:00' "
        "DO INSERT INTO jobt VALUES (4, 40)"
    )
    with pytest.raises(ValueError, match="already exists"):
        ps.sql(
            "CREATE JOB jd ON SCHEDULE AT '2025-01-01 00:00:00' "
            "DO INSERT INTO jobt VALUES (5, 50)"
        )
    # FINISHED name is reusable (same contract as routine load)
    ps.tick_jobs("2024-01-02 00:00:00")
    ps.sql(
        "CREATE JOB jd ON SCHEDULE AT '2025-01-01 00:00:00' "
        "DO INSERT INTO jobt VALUES (5, 50)"
    )


def test_insert_with_label_idempotent(ps):
    ps.sql("INSERT INTO jobt WITH LABEL l1 VALUES (1, 10), (2, 20)")
    assert ps.sql("INSERT INTO jobt WITH LABEL l1 VALUES (1, 10)") == -1
    ps.sql("INSERT INTO jobt WITH LABEL l2 (k, v) VALUES (3, 30)")
    row = ps.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM jobt").collect()[0]
    assert (row.n, row.s) == (3, 60)


def test_dynamic_partition_property_validation(spark):
    ps = PaloSession(spark)
    with pytest.raises(ValueError, match="require a partitioned"):
        ps.sql(
            "CREATE TABLE dpv1 (`k` BIGINT, `v` BIGINT) DUPLICATE KEY(k) "
            "DISTRIBUTED BY HASH(k) BUCKETS 2 "
            "PROPERTIES ('dynamic_partition.enable' = 'true', "
            "'dynamic_partition.start' = '-3')"
        )
    with pytest.raises(ValueError, match="does not match"):
        ps.sql(
            "CREATE TABLE dpv2 (`k` BIGINT, `d` DATE, `v` BIGINT) "
            "DUPLICATE KEY(k, d) "
            "AUTO PARTITION BY RANGE (date_trunc(`d`, 'month')) () "
            "DISTRIBUTED BY HASH(k) BUCKETS 2 "
            "PROPERTIES ('dynamic_partition.enable' = 'true', "
            "'dynamic_partition.time_unit' = 'DAY', "
            "'dynamic_partition.start' = '-3')"
        )
    t = ps.sql(
        "CREATE TABLE dpv3 (`k` BIGINT, `d` DATE, `v` BIGINT) "
        "DUPLICATE KEY(k, d) "
        "AUTO PARTITION BY RANGE (date_trunc(`d`, 'month')) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 2 "
        "PROPERTIES ('dynamic_partition.enable' = 'true', "
        "'dynamic_partition.time_unit' = 'MONTH', "
        "'dynamic_partition.start' = '-2')"
    )
    assert t.meta.dynamic_partition_retention == 2
    import datetime

    t.insert(spark.createDataFrame(
        [(i, datetime.date(2024, m, 1), i) for i, m in
         enumerate([1, 2, 3, 4], 1)],
        "k bigint, d date, v bigint"))
    ps._refresh_view("dpv3")
    assert sorted(t.partitions()) == ["m2024-03", "m2024-04"]


def test_list_partition_lifecycle(spark):
    """AUTO PARTITION BY LIST: value labels, equality pruning, explicit
    PARTITION selection, DELETE PARTITION, drop_partition."""
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE lpt (`k` BIGINT, `region` VARCHAR(20), `v` BIGINT) "
        "DUPLICATE KEY(k, region) AUTO PARTITION BY LIST (`region`) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql(
        "INSERT INTO lpt VALUES (1,'asia',10),(2,'europe',20),"
        "(3,'asia',30),(4,'america',40)"
    )
    assert sorted(t.partitions()) == ["lamerica", "lasia", "leurope"]
    df = t.scan("region = 'asia'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "= lasia" in plan.replace("'", "")  # directory pruning
    assert sorted(r.k for r in df.collect()) == [1, 3]
    assert ps.sql(
        "SELECT COUNT(*) AS n FROM lpt PARTITION (lasia)"
    ).collect()[0].n == 2
    ps.sql("DELETE FROM lpt PARTITION (lasia) WHERE v > 0")
    assert sorted(r.k for r in ps.sql("SELECT k FROM lpt").collect()) == [2, 4]
    t.drop_partition("leurope")
    assert sorted(t.partitions()) == ["lamerica", "lasia"]
    show = ps.sql("SHOW CREATE TABLE lpt").collect()[0][1]
    assert "AUTO PARTITION BY LIST (`region`) ()" in show


def test_list_partition_numeric_equality_only_pruning(spark):
    """Numeric LIST labels sort lexicographically ('10' < '9'), so only
    EQUALITY conjuncts may prune — a range predicate must fail open and
    still answer correctly row-level."""
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE lpn (`k` BIGINT, `bucket` INT, `v` BIGINT) "
        "DUPLICATE KEY(k, bucket) AUTO PARTITION BY LIST (`bucket`) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql(
        "INSERT INTO lpn VALUES (1,9,10),(2,10,20),(3,11,30)"
    )
    assert t._prune_predicate("bucket > 9") is None  # fail-open
    assert sorted(r.k for r in t.scan("bucket > 9").collect()) == [2, 3]
    assert t._prune_predicate("bucket = 10") is not None
    assert [r.k for r in t.scan("bucket = 10").collect()] == [2]


def test_static_range_partition_lifecycle(spark):
    """Classic PARTITION BY RANGE ... VALUES LESS THAN: routing,
    out-of-range load rejection (atomic), ADD PARTITION above the top
    bound, middle-drop leaves a HOLE (reload refused), SHOW PARTITIONS
    lists declared partitions, pruning uses declared bounds."""
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE srpt (`k` BIGINT, `d` DATE, `v` BIGINT) "
        "DUPLICATE KEY(k, d) PARTITION BY RANGE(`d`) ("
        "PARTITION a VALUES LESS THAN ('2023-02-01'), "
        "PARTITION b VALUES LESS THAN ('2023-03-01'), "
        "PARTITION c VALUES LESS THAN ('2023-04-01')"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql(
        "INSERT INTO srpt VALUES (1,'2023-01-05',10),(2,'2023-02-10',20),"
        "(3,'2023-03-20',30)"
    )
    assert sorted(t.partitions()) == ["a", "b", "c"]
    with pytest.raises(ValueError, match="no matching partition"):
        ps.sql("INSERT INTO srpt VALUES (4,'2023-05-05',40)")
    assert ps.sql("SELECT COUNT(*) AS n FROM srpt").collect()[0].n == 3
    ps.sql("ALTER TABLE srpt ADD PARTITION dd VALUES LESS THAN ('2023-05-01')")
    with pytest.raises(ValueError, match="must exceed"):
        ps.sql(
            "ALTER TABLE srpt ADD PARTITION ee VALUES LESS THAN "
            "('2023-04-15')"
        )
    ps.sql("INSERT INTO srpt VALUES (4,'2023-04-05',40)")
    # middle drop leaves a hole: the dropped range refuses new rows
    ps.sql("ALTER TABLE srpt DROP PARTITION b")
    assert sorted(t.partitions()) == ["a", "c", "dd"]
    with pytest.raises(ValueError, match="no matching partition"):
        ps.sql("INSERT INTO srpt VALUES (9,'2023-02-15',90)")
    shows = [r[0] for r in ps.sql("SHOW PARTITIONS FROM srpt").collect()]
    assert shows == ["a", "c", "dd"]
    # pruning: range predicate → declared-bound interval logic
    pred = t._prune_predicate("d >= '2023-03-01'")
    assert pred is not None
    assert sorted(r.k for r in t.scan("d >= '2023-03-01'").collect()) == [3, 4]
    # equality inside the hole matches NO partition → empty isin
    assert t.scan("d = '2023-02-15'").count() == 0
    show = ps.sql("SHOW CREATE TABLE srpt").collect()[0][1]
    assert "PARTITION BY RANGE(`d`)" in show and "MAXVALUE" not in show


def test_static_range_partition_restrictions(spark):
    ps = PaloSession(spark)
    with pytest.raises(ValueError, match="strictly increasing"):
        ps.sql(
            "CREATE TABLE srx (`k` BIGINT, `d` DATE) DUPLICATE KEY(k, d) "
            "PARTITION BY RANGE(`d`) ("
            "PARTITION a VALUES LESS THAN ('2023-03-01'), "
            "PARTITION b VALUES LESS THAN ('2023-02-01')"
            ") DISTRIBUTED BY HASH(k) BUCKETS 2"
        )
    with pytest.raises(ValueError, match="key column"):
        ps.sql(
            "CREATE TABLE sry (`k` BIGINT, `d` DATE, `v` BIGINT) "
            "UNIQUE KEY(k) PARTITION BY RANGE(`d`) ("
            "PARTITION a VALUES LESS THAN ('2023-02-01')"
            ") DISTRIBUTED BY HASH(k) BUCKETS 2"
        )
    # MAXVALUE only last; adding above MAXVALUE refused
    t = ps.sql(
        "CREATE TABLE srz (`k` BIGINT, `n` BIGINT) DUPLICATE KEY(k, n) "
        "PARTITION BY RANGE(`n`) ("
        "PARTITION lo VALUES LESS THAN (100), "
        "PARTITION hi VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    with pytest.raises(ValueError, match="MAXVALUE"):
        ps.sql("ALTER TABLE srz ADD PARTITION xx VALUES LESS THAN (200)")
    # numeric bounds route correctly
    ps.sql("INSERT INTO srz VALUES (1, 99), (2, 100), (3, 5000)")
    assert [r.k for r in t.scan("n = 99").collect()] == [1]
    assert sorted(t.partitions()) == ["hi", "lo"]


def test_static_list_partition_lifecycle(spark):
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE slpt (`k` BIGINT, `seg` VARCHAR(12), `v` BIGINT) "
        "DUPLICATE KEY(k, seg) PARTITION BY LIST(`seg`) ("
        "PARTITION pa VALUES IN ('A', 'B'), "
        "PARTITION pb VALUES IN ('C')"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO slpt VALUES (1,'A',10),(2,'C',20),(3,'B',30)")
    assert sorted(t.partitions()) == ["pa", "pb"]
    with pytest.raises(ValueError, match="no matching partition"):
        ps.sql("INSERT INTO slpt VALUES (4,'Z',40)")
    ps.sql("ALTER TABLE slpt ADD PARTITION pc VALUES IN ('Z')")
    with pytest.raises(ValueError, match="already declared"):
        ps.sql("ALTER TABLE slpt ADD PARTITION pd VALUES IN ('A')")
    ps.sql("INSERT INTO slpt VALUES (4,'Z',40)")
    # equality pruning to the single declaring partition
    assert [r.k for r in t.scan("seg = 'C'").collect()] == [2]
    pred = t._prune_predicate("seg = 'C'")
    assert pred is not None
    # dropping removes the declaration: the value refuses to reload
    ps.sql("ALTER TABLE slpt DROP PARTITION pb")
    with pytest.raises(ValueError, match="no matching partition"):
        ps.sql("INSERT INTO slpt VALUES (9,'C',90)")
    show = ps.sql("SHOW CREATE TABLE slpt").collect()[0][1]
    assert "PARTITION BY LIST(`seg`)" in show and "VALUES IN ('Z')" in show


def test_static_partition_column_schema_change_guards(spark):
    """The static partition column is load-bearing for routing: DROP and
    MODIFY refuse; RENAME follows through to the declaration so later
    loads keep routing."""
    ps = PaloSession(spark)
    # DUPLICATE model: the partition column need not be a key column,
    # so these guards are the ONLY protection
    t = ps.sql(
        "CREATE TABLE spguard (`k` BIGINT, `n` BIGINT, `v` BIGINT) "
        "DUPLICATE KEY(k) PARTITION BY RANGE(`n`) ("
        "PARTITION lo VALUES LESS THAN (100), "
        "PARTITION hi VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO spguard VALUES (1, 5, 50)")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("n")
    with pytest.raises(ValueError, match="key column|partition"):
        t.modify_column_type("n", "string")
    ps.sql("ALTER TABLE spguard RENAME COLUMN n num")
    assert t.meta.range_partitions["col"] == "num"
    ps.sql("INSERT INTO spguard (k, num, v) VALUES (2, 500, 70)")
    assert sorted(t.partitions()) == ["hi", "lo"]


def test_temporary_partition_backfill(spark):
    """Temp partitions: staged rows invisible, interval-validated,
    strict-match REPLACE swaps atomically, compact refuses while
    staged, DROP discards a staged temp."""
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE tpbt (`k` BIGINT, `n` BIGINT, `v` BIGINT) "
        "DUPLICATE KEY(k) PARTITION BY RANGE(`n`) ("
        "PARTITION lo VALUES LESS THAN (100), "
        "PARTITION hi VALUES LESS THAN (200)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO tpbt VALUES (1, 5, 10), (2, 150, 20)")
    ps.sql("ALTER TABLE tpbt ADD TEMPORARY PARTITION tlo VALUES LESS THAN (100)")
    ps.sql("INSERT INTO tpbt TEMPORARY PARTITION (tlo) VALUES (7, 50, 777)")
    assert sorted(r.k for r in ps.sql("SELECT k FROM tpbt").collect()) == [1, 2]
    with pytest.raises(ValueError, match="no matching partition"):
        ps.sql("INSERT INTO tpbt TEMPORARY PARTITION (tlo) VALUES (9, 150, 9)")
    with pytest.raises(ValueError, match="strict matching"):
        ps.sql(
            "ALTER TABLE tpbt REPLACE PARTITION (hi) "
            "WITH TEMPORARY PARTITION (tlo)"
        )
    with pytest.raises(ValueError, match="temporary partitions"):
        t.compact()
    ps.sql("ALTER TABLE tpbt REPLACE PARTITION (lo) WITH TEMPORARY PARTITION (tlo)")
    assert sorted(
        (r.k, r.v) for r in ps.sql("SELECT k, v FROM tpbt").collect()
    ) == [(2, 20), (7, 777)]
    assert t.meta.range_partitions.get("temp") == []
    # a dropped staged temp disappears without touching visible data
    ps.sql("ALTER TABLE tpbt ADD TEMPORARY PARTITION thi VALUES LESS THAN (200)")
    ps.sql("INSERT INTO tpbt TEMPORARY PARTITION (thi) VALUES (5, 150, 55)")
    ps.sql("ALTER TABLE tpbt DROP PARTITION thi")
    assert sorted(r.k for r in ps.sql("SELECT k FROM tpbt").collect()) == [2, 7]
    t.compact()  # allowed again once no temp is live
    # strict matching at CREATE time: bound must equal a formal's
    with pytest.raises(ValueError, match="strict matching"):
        ps.sql(
            "ALTER TABLE tpbt ADD TEMPORARY PARTITION tx "
            "VALUES LESS THAN (150)"
        )


def test_truncate_and_overwrite_partition(spark):
    ps = PaloSession(spark)
    t = ps.sql(
        "CREATE TABLE topt (`k` BIGINT, `n` BIGINT, `v` BIGINT) "
        "DUPLICATE KEY(k) PARTITION BY RANGE(`n`) ("
        "PARTITION lo VALUES LESS THAN (100), "
        "PARTITION hi VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO topt VALUES (1, 5, 10), (2, 150, 20)")
    # TRUNCATE PARTITION: storage empties, declaration survives
    ps.sql("TRUNCATE TABLE topt PARTITION (lo)")
    assert [r.k for r in ps.sql("SELECT k FROM topt").collect()] == [2]
    ps.sql("INSERT INTO topt VALUES (3, 8, 30)")  # range still loadable
    # INSERT OVERWRITE PARTITION replaces only that partition
    ps.sql("INSERT OVERWRITE topt PARTITION (lo) VALUES (9, 50, 900)")
    assert sorted(
        (r.k, r.n) for r in ps.sql("SELECT k, n FROM topt").collect()
    ) == [(2, 150), (9, 50)]
    # stray rows refuse BEFORE anything is truncated (atomic)
    with pytest.raises(ValueError, match="outside that partition"):
        ps.sql("INSERT OVERWRITE topt PARTITION (lo) VALUES (11, 500, 1)")
    assert sorted(r.k for r in ps.sql("SELECT k FROM topt").collect()) == [2, 9]


def test_metadata_tvfs_and_alter_set_retention(spark):
    ps = PaloSession(spark)
    # catalogs()/frontends()/backends() metadata TVFs
    rows = ps.sql('SELECT CatalogName, Type FROM catalogs()').collect()
    assert ("internal", "internal") in {(r.CatalogName, r.Type) for r in rows}
    assert ps.sql("SELECT State FROM backends()").collect()[0].State == "Alive"
    assert ps.sql("SELECT Name FROM frontends()").count() == 1
    # ALTER TABLE SET: flip retention on later, applied immediately
    import datetime

    t = ps.sql(
        "CREATE TABLE asr (`k` BIGINT, `d` DATE, `v` BIGINT) "
        "DUPLICATE KEY(k, d) "
        "AUTO PARTITION BY RANGE (date_trunc(`d`, 'month')) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    t.insert(spark.createDataFrame(
        [(i, datetime.date(2024, m, 1), i) for i, m in
         enumerate([1, 2, 3, 4], 1)],
        "k bigint, d date, v bigint"))
    ps._refresh_view("asr")
    assert len(t.partitions()) == 4
    ps.sql(
        "ALTER TABLE asr SET ('dynamic_partition.enable' = 'true', "
        "'dynamic_partition.start' = '-2')"
    )
    assert sorted(t.partitions()) == ["m2024-03", "m2024-04"]
    ps.sql("ALTER TABLE asr SET ('dynamic_partition.enable' = 'false')")
    assert t.meta.dynamic_partition_retention == 0
    with pytest.raises(ValueError, match="unsupported ALTER TABLE SET"):
        ps.sql("ALTER TABLE asr SET ('bloom_filter_columns' = 'v')")


def test_show_temporary_partitions(spark):
    ps = PaloSession(spark)
    ps.sql(
        "CREATE TABLE stpt (`k` BIGINT, `n` BIGINT) DUPLICATE KEY(k) "
        "PARTITION BY RANGE(`n`) (PARTITION lo VALUES LESS THAN (100)) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    assert ps.sql("SHOW TEMPORARY PARTITIONS FROM stpt").count() == 0
    ps.sql("ALTER TABLE stpt ADD TEMPORARY PARTITION tlo VALUES LESS THAN (100)")
    got = ps.sql("SHOW TEMPORARY PARTITIONS FROM stpt").collect()
    assert [(r.PartitionName, r.ReplacesPartition) for r in got] == [
        ("tlo", "lo")
    ]


def test_temp_partitions_survive_backup_restore(spark):
    """A snapshot taken with staged temporary partitions carries them:
    the restored table can still REPLACE (or drop) the staged temps,
    and the staged rows stay invisible until then."""
    import tempfile

    ps = PaloSession(spark)
    ps.sql(
        "CREATE TABLE tbkp (`k` BIGINT, `n` BIGINT) DUPLICATE KEY(k) "
        "PARTITION BY RANGE(`n`) (PARTITION lo VALUES LESS THAN (100)) "
        "DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO tbkp VALUES (1, 5)")
    ps.sql("ALTER TABLE tbkp ADD TEMPORARY PARTITION tl VALUES LESS THAN (100)")
    ps.sql("INSERT INTO tbkp TEMPORARY PARTITION (tl) VALUES (9, 50)")
    repo = tempfile.mkdtemp(prefix="repo_tbkp_")
    ps.sql(f"CREATE REPOSITORY tbkp_r WITH LOCATION '{repo}'")
    ps.sql("BACKUP SNAPSHOT tbkp_s TO tbkp_r ON (tbkp)")
    ps.sql("RESTORE SNAPSHOT tbkp_s FROM tbkp_r ON (tbkp AS tbkp2)")
    t2 = ps.tables["tbkp2"]
    assert [p["name"] for p in t2.meta.range_partitions["temp"]] == ["tl"]
    assert [r.k for r in ps.sql("SELECT k FROM tbkp2").collect()] == [1]
    ps.sql("ALTER TABLE tbkp2 REPLACE PARTITION (lo) WITH TEMPORARY PARTITION (tl)")
    assert [r.k for r in ps.sql("SELECT k FROM tbkp2").collect()] == [9]


def test_incremental_mv_refresh_over_static_partitions(spark):
    """Partition-incremental REFRESH AUTO extends to STATIC-partitioned
    bases: a lo-only insert recomputes ONLY the lo slice (mtime pin on
    the untouched slices), and a dropped partition's slice disappears.
    With temporary partitions staged, eligibility falls back to the
    always-correct full recompute (version space and visible data
    diverge)."""
    import glob
    import os

    ps = PaloSession(spark)
    ps.sql(
        "CREATE TABLE imvt (`k` BIGINT, `n` BIGINT, `v` BIGINT) "
        "DUPLICATE KEY(k) PARTITION BY RANGE(`n`) ("
        "PARTITION lo VALUES LESS THAN (100), "
        "PARTITION mid VALUES LESS THAN (200), "
        "PARTITION hi VALUES LESS THAN (MAXVALUE)"
        ") DISTRIBUTED BY HASH(k) BUCKETS 2"
    )
    ps.sql("INSERT INTO imvt VALUES (1, 5, 10), (2, 150, 20), (3, 500, 30)")
    ps.sql(
        "CREATE MATERIALIZED VIEW imvt_mv BUILD IMMEDIATE REFRESH AUTO "
        "ON MANUAL AS SELECT n, SUM(v) AS s FROM imvt GROUP BY n"
    )
    ps.sql("REFRESH MATERIALIZED VIEW imvt_mv")
    parts_dir = ps.async_mvs["imvt_mv"]["path"] + "_parts"

    def mtimes():
        return {
            d: max(
                (os.path.getmtime(f) for f in glob.glob(
                    os.path.join(parts_dir, d, "**"), recursive=True
                )),
                default=0,
            )
            for d in os.listdir(parts_dir)
            if d.startswith("__mv_part=")
        }

    m0 = mtimes()
    ps.sql("INSERT INTO imvt VALUES (9, 50, 900)")
    ps.sql("REFRESH MATERIALIZED VIEW imvt_mv")
    m1 = mtimes()
    assert sorted(d for d in m1 if m1[d] != m0.get(d)) == ["__mv_part=lo"]
    got = sorted(
        (r.n, r.s) for r in ps.sql("SELECT n, s FROM imvt_mv").collect()
    )
    assert got == [(5, 10), (50, 900), (150, 20), (500, 30)]
    ps.sql("ALTER TABLE imvt DROP PARTITION hi")
    ps.sql("REFRESH MATERIALIZED VIEW imvt_mv")
    assert "__mv_part=hi" not in os.listdir(parts_dir)
    # staged temps gate incremental off (falls back to full — correct)
    ps.sql("ALTER TABLE imvt ADD TEMPORARY PARTITION tlo VALUES LESS THAN (100)")
    assert ps._mv_incremental_info("imvt_mv", ps.async_mvs["imvt_mv"]) is None
    ps.sql("REFRESH MATERIALIZED VIEW imvt_mv")  # still correct via full
    got = sorted(
        (r.n, r.s) for r in ps.sql("SELECT n, s FROM imvt_mv").collect()
    )
    assert got == [(5, 10), (50, 900), (150, 20)]
