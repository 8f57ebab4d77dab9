"""Workload groups ([docs: workload-group]) — DDL surface + REAL
admission control: per-group max_concurrency token bucket with a
bounded, timed queue around PaloSession.sql(). cpu_share/memory_limit
are metadata here (no resource manager in a single embedded JVM);
concurrency admission is enforced and tested, including from real
threads."""

from __future__ import annotations

import threading
import time

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    s = PaloSession(spark, location_root=str(tmp_path))
    s.sql("CREATE TABLE wg_t (`k` BIGINT, `v` INT) DUPLICATE KEY(k) "
          "DISTRIBUTED BY HASH(k) BUCKETS 2")
    s.sql("INSERT INTO wg_t VALUES (1, 10), (2, 20)")
    return s


def test_ddl_surface_and_session_binding(ps):
    ps.sql("CREATE WORKLOAD GROUP wg1 PROPERTIES("
           "'max_concurrency'='4', 'max_queue_size'='8', "
           "'queue_timeout'='1000', 'cpu_share'='512')")
    with pytest.raises(ValueError, match="already exists"):
        ps.sql("CREATE WORKLOAD GROUP wg1")
    ps.sql("CREATE WORKLOAD GROUP IF NOT EXISTS wg1")
    with pytest.raises(ValueError, match="unknown workload group prop"):
        ps.sql("CREATE WORKLOAD GROUP bad PROPERTIES('cpu'='1')")
    rows = {r["Name"]: r for r in ps.sql("SHOW WORKLOAD GROUPS").collect()}
    assert set(rows) == {"normal", "wg1"}
    assert rows["wg1"]["max_concurrency"] == "4"
    assert rows["wg1"]["cpu_share"] == "512"
    ps.sql("ALTER WORKLOAD GROUP wg1 PROPERTIES('max_concurrency'='2')")
    rows = {r["Name"]: r for r in ps.sql("SHOW WORKLOAD GROUPS").collect()}
    assert rows["wg1"]["max_concurrency"] == "2"
    # session binding via SET; queries run under the group
    ps.sql("SET workload_group = 'wg1'")
    assert ps.sql("SELECT count(*) AS n FROM wg_t").collect()[0]["n"] == 2
    with pytest.raises(ValueError, match="unknown workload group"):
        ps.sql("SET workload_group = 'nope'")
    assert ps.variables["workload_group"] == "wg1"  # bad SET kept prior
    # the active group cannot be dropped; 'normal' never can
    with pytest.raises(ValueError, match="active"):
        ps.sql("DROP WORKLOAD GROUP wg1")
    with pytest.raises(ValueError, match="built-in"):
        ps.sql("DROP WORKLOAD GROUP normal")
    ps.sql("SET workload_group = 'normal'")
    ps.sql("DROP WORKLOAD GROUP wg1")
    ps.sql("DROP WORKLOAD GROUP IF EXISTS wg1")
    with pytest.raises(ValueError, match="unknown workload group"):
        ps.sql("DROP WORKLOAD GROUP wg1")


def test_admission_queue_full_and_timeout(ps):
    """Deterministic admission semantics: with the single slot held,
    max_queue_size=0 rejects immediately and max_queue_size>0 waits
    queue_timeout ms then fails — upstream's two error shapes."""
    ps.sql("CREATE WORKLOAD GROUP tight PROPERTIES("
           "'max_concurrency'='1', 'max_queue_size'='0', "
           "'queue_timeout'='120')")
    ps.sql("SET workload_group = 'tight'")
    g = ps.workload_groups["tight"]
    with g.slot():  # an in-flight statement holds the only slot
        with pytest.raises(RuntimeError, match="queue full"):
            ps.sql("SELECT count(*) AS n FROM wg_t")
    # slot free again: statements pass
    assert ps.sql("SELECT count(*) AS n FROM wg_t").collect()[0]["n"] == 2
    ps.sql("ALTER WORKLOAD GROUP tight PROPERTIES('max_queue_size'='1')")
    with g.slot():
        t0 = time.monotonic()
        with pytest.raises(RuntimeError, match="wait timeout"):
            ps.sql("SELECT count(*) AS n FROM wg_t")
        assert time.monotonic() - t0 >= 0.1  # actually queued ~120ms
    # DDL and SET are never admission-gated — a full queue must not
    # lock the admin out
    with g.slot():
        ps.sql("SHOW WORKLOAD GROUPS")
        ps.sql("SET workload_group = 'normal'")
    ps.sql("DROP WORKLOAD GROUP tight")


def test_admission_from_threads_and_internal_recursion(ps):
    """A queued statement RUNS once the slot frees (thread A holds the
    slot while thread B queues), and one user statement takes ONE slot
    even when it recurses through sql() internally (INSERT ... SELECT
    under max_concurrency=1 must not self-deadlock)."""
    ps.sql("CREATE WORKLOAD GROUP serial PROPERTIES("
           "'max_concurrency'='1', 'max_queue_size'='4', "
           "'queue_timeout'='30000')")
    ps.sql("SET workload_group = 'serial'")
    # internal recursion: INSERT ... SELECT runs a SELECT through sql()
    ps.sql("INSERT INTO wg_t SELECT k + 100, v FROM wg_t")
    assert ps.sql("SELECT count(*) AS n FROM wg_t").collect()[0]["n"] == 4
    g = ps.workload_groups["serial"]
    results = []

    def worker():
        results.append(
            ps.sql("SELECT count(*) AS n FROM wg_t").collect()[0]["n"])

    g.acquire()  # hold the slot; the thread must QUEUE, not fail
    th = threading.Thread(target=worker)
    th.start()
    time.sleep(0.2)
    assert not results, "queued statement ran while the slot was held"
    g.release()
    th.join(timeout=30)
    assert results == [4]
    ps.sql("SET workload_group = 'normal'")


def test_workload_groups_persist_across_reattach(spark, tmp_path):
    """Workload groups are FE metadata upstream — they survive a
    restart. A re-attached session sees the group and its properties
    (admission counters start fresh); DROP travels too."""
    from palo_spark.palo_session import PaloSession

    root = str(tmp_path)
    s1 = PaloSession(spark, location_root=root)
    s1.sql("CREATE WORKLOAD GROUP wg_keep PROPERTIES("
           "'max_concurrency'='3', 'max_queue_size'='7')")
    s2 = PaloSession(spark, location_root=root)
    assert "wg_keep" in s2.workload_groups
    assert s2.workload_groups["wg_keep"].props["max_concurrency"] == "3"
    assert s2.workload_groups["wg_keep"].props["max_queue_size"] == "7"
    s2.sql("ALTER WORKLOAD GROUP wg_keep PROPERTIES("
           "'max_concurrency'='5')")
    s3 = PaloSession(spark, location_root=root)
    assert s3.workload_groups["wg_keep"].props["max_concurrency"] == "5"
    s3.sql("DROP WORKLOAD GROUP wg_keep")
    s4 = PaloSession(spark, location_root=root)
    assert "wg_keep" not in s4.workload_groups
    assert "normal" in s4.workload_groups  # built-in always present


def test_workload_group_ddl_requires_admin(spark, tmp_path):
    """Upstream gates workload-group DDL behind ADMIN_PRIV — a
    table-level CREATE_PRIV holder must not reach the admission
    policy; SHOW stays readable."""
    import pytest

    from palo_spark.palo_session import PaloSession

    s = PaloSession(spark, location_root=str(tmp_path))
    s.sql("CREATE USER 'wgx'")
    s.sql("GRANT CREATE_PRIV, DROP_PRIV, ALTER_PRIV ON *.*.* TO 'wgx'")
    try:
        s.su("wgx")
        with pytest.raises(PermissionError, match="ADMIN_PRIV"):
            s.sql("CREATE WORKLOAD GROUP wg_na PROPERTIES("
                  "'max_concurrency'='2')")
        with pytest.raises(PermissionError, match="ADMIN_PRIV"):
            s.sql("DROP WORKLOAD GROUP normal")
        s.sql("SHOW WORKLOAD GROUPS")  # readable
    finally:
        s.su("root")
    s.sql("CREATE WORKLOAD GROUP wg_ok PROPERTIES('max_concurrency'='2')")
    assert "wg_ok" in s.workload_groups
