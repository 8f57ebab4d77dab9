"""Session-lifecycle fuzzer: random DDL/DML/lifecycle statement
sequences against a dict model, with MV-rewrite cross-checking.

The round-8 hardening sweep found its defects in the INTERACTIONS of
features each individually value-oracled (schema change x partial loads
x delete predicates x MVs x table lifecycle). This fuzzer locks the
class at the SESSION level, where the per-table randomized models in
tests/test_property.py cannot see: statement parsing, the MV rewrite
path, view refreshes, and the lifecycle handlers (DROP/RENAME/TRUNCATE/
INSERT OVERWRITE) that own cross-object cleanup.

Invariant checked after EVERY phase: the canonical aggregate
``SELECT grp, SUM(val) FROM t GROUP BY grp`` answered through the
session (which silently routes via a live MV when one covers it) equals
the dict model — so a stale rollup, a zombie registration, a missed
re-derive, or a broken view refresh surfaces immediately, not just at
the end. When an MV is live, the rewrite SOURCE is asserted too: the
query must actually be MV-answered for the check to mean anything.
"""

from __future__ import annotations

import random

import pytest

from palo_spark.palo_session import PaloSession
from palo_spark.tables import Table


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def _check(ps, name, model, mv_name):
    q = f"SELECT grp, SUM(val) AS s FROM {name} GROUP BY grp"
    if mv_name is not None:
        df, source = ps.rollups.sql(q)
        assert source == mv_name, f"expected MV answer, got {source}"
    else:
        df = ps.sql(q)
    got = {r["grp"]: r["s"] for r in df.collect()}
    want: dict[str, float] = {}
    for row in model.values():
        want[row["grp"]] = want.get(row["grp"], 0.0) + row["val"]
    assert got == want, f"got={got} want={want}"


def _run(ps, seed: int, phases: int = 12) -> None:
    rng = random.Random(seed)
    name = f"fz{seed}"
    ps.sql(
        f"CREATE TABLE {name} (k BIGINT, grp VARCHAR(8), val DOUBLE) "
        "UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 4"
    )
    model: dict[int, dict] = {}
    mv_name: str | None = None
    mv_n = 0
    extra_col_n = 0  # r10 axis: light schema change in the op mix
    # r10 axis: randomized backup/restore — a restore must reproduce the
    # dict model EXACTLY as it stood at backup time, regardless of every
    # mutation in between
    repo_made = False
    snapshots: dict[str, dict] = {}
    snap_n = 0
    # r11 axes: UPDATE ... FROM (join-update) and scheduled-job ticks
    # in the same mix — the job stores statement TEXT, so a
    # rename_table in between makes its next occurrence FAIL loudly
    # (recorded task row) instead of writing through a stale handle
    src_made = False
    job_made = False
    job_now = None
    for _ in range(phases):
        op = rng.choices(
            ["insert", "create_mv", "drop_mv", "delete", "truncate",
             "overwrite", "update", "rename_table", "add_column",
             "drop_column", "backup", "restore_check",
             "restore_in_place", "update_from", "job_tick"],
            weights=[40, 12, 8, 10, 5, 8, 12, 5, 6, 4, 6, 6, 5, 8, 6],
        )[0]
        if op == "insert":
            rows = [
                (k, rng.choice("abc"), float(rng.randint(0, 99)))
                for k in rng.sample(range(10), rng.randint(1, 5))
            ]
            vals = ", ".join(f"({k},'{g}',{v})" for k, g, v in rows)
            ps.sql(f"INSERT INTO {name} (k, grp, val) VALUES {vals}")
            for k, g, v in rows:
                model[k] = {"grp": g, "val": v}
        elif op == "create_mv":
            if mv_name is not None:
                continue
            mv_n += 1
            mv_name = f"fzmv{seed}_{mv_n}"
            ps.sql(
                f"CREATE MATERIALIZED VIEW {mv_name} AS "
                f"SELECT grp, SUM(val) AS s FROM {name} GROUP BY grp"
            )
        elif op == "drop_mv":
            if mv_name is None:
                continue
            ps.sql(f"DROP MATERIALIZED VIEW {mv_name}")
            mv_name = None
        elif op == "delete":
            lo = rng.randint(0, 9)
            ps.sql(f"DELETE FROM {name} WHERE k >= {lo}")
            model = {k: r for k, r in model.items() if k < lo}
        elif op == "truncate":
            ps.sql(f"TRUNCATE TABLE {name}")
            model = {}
        elif op == "overwrite":
            k = rng.randint(0, 9)
            g = rng.choice("abc")
            v = float(rng.randint(100, 199))
            ps.sql(f"INSERT OVERWRITE TABLE {name} (k, grp, val) "
                   f"VALUES ({k},'{g}',{v})")
            model = {k: {"grp": g, "val": v}}
        elif op == "update":
            if not model:
                continue
            lo = rng.randint(0, 9)
            d = rng.randint(1, 9)
            ps.sql(f"UPDATE {name} SET val = val + {d} WHERE k >= {lo}")
            for k, r in model.items():
                if k >= lo:
                    r["val"] += d
        elif op == "add_column":
            # r10 audit axis: light schema change interleaved with the
            # MV/lifecycle mix — an added defaulted column must not
            # disturb the canonical aggregate (nor MV maintenance)
            extra_col_n += 1
            ps.sql(f"ALTER TABLE {name} ADD COLUMN "
                   f"xc{extra_col_n} INT DEFAULT '0'")
        elif op == "drop_column":
            if extra_col_n == 0:
                continue
            ps.sql(f"ALTER TABLE {name} DROP COLUMN xc{extra_col_n}")
            extra_col_n -= 1
        elif op == "backup":
            if not repo_made:
                import tempfile as _tf

                ps.sql(f"CREATE REPOSITORY fzrepo{seed} WITH LOCATION "
                       f"'{_tf.mkdtemp(prefix='fzrepo_')}'")
                repo_made = True
            snap_n += 1
            label = f"s{seed}_{snap_n}"
            ps.sql(f"BACKUP SNAPSHOT {label} TO fzrepo{seed} ON ({name})")
            # manifest keys the name AT BACKUP TIME (a later table
            # rename must not orphan the snapshot)
            snapshots[label] = {
                "as_name": name,
                "model": {k: dict(r) for k, r in model.items()},
                # schema-change counter AT BACKUP TIME: an in-place
                # restore rewinds the xcN columns too, so the drop
                # pointer must rewind with it
                "extra_col_n": extra_col_n,
            }
        elif op == "restore_check":
            if not snapshots:
                continue
            label = rng.choice(sorted(snapshots))
            dst = f"{name}_rst_{label}_{mv_n}{len(model)}"
            ps.sql(f"RESTORE SNAPSHOT {label} FROM fzrepo{seed} "
                   f"ON ({snapshots[label]['as_name']} AS {dst})")
            want: dict[str, float] = {}
            for row in snapshots[label]["model"].values():
                want[row["grp"]] = want.get(row["grp"], 0.0) + row["val"]
            if want:
                got = {
                    r["grp"]: r["s"]
                    for r in ps.sql(
                        f"SELECT grp, SUM(val) AS s FROM {dst} GROUP BY grp"
                    ).collect()
                }
                assert got == want, (label, got, want)
            else:
                assert ps.sql(f"SELECT * FROM {dst}").count() == 0
            ps.sql(f"DROP TABLE {dst}")
        elif op == "restore_in_place":
            # r10-continuation axis: RESTORE onto the LIVE name — the
            # session must serve the model AS OF BACKUP TIME afterwards
            # (every mutation since vanishes; a live sync MV must be
            # re-derived by the swap, which _check asserts through the
            # MV-answer path)
            candidates = [
                lb for lb, s in snapshots.items() if s["as_name"] == name
            ]
            if not candidates:
                continue
            label = rng.choice(candidates)
            ps.sql(f"RESTORE SNAPSHOT {label} FROM fzrepo{seed} ON ({name})")
            model = {k: dict(r) for k, r in snapshots[label]["model"].items()}
            extra_col_n = snapshots[label]["extra_col_n"]
        elif op == "update_from":
            if not model:
                continue
            if not src_made:
                ps.sql(f"CREATE TABLE fzsrc{seed} (k BIGINT, dv DOUBLE) "
                       "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
                ps.sql(f"INSERT INTO fzsrc{seed} VALUES " + ", ".join(
                    f"({k}, {float(k + 1)})" for k in range(5)))
                src_made = True
            ps.sql(f"UPDATE {name} SET val = val + s.dv FROM fzsrc{seed} s "
                   f"WHERE {name}.k = s.k")
            for k, r in model.items():
                if k <= 4:
                    r["val"] += float(k + 1)
        elif op == "job_tick":
            from datetime import datetime as _dt, timedelta as _td

            if not job_made:
                # DO text captures the CURRENT table name; a later
                # rename makes occurrences fail as task rows
                ps.sql(f"CREATE JOB fzjob{seed} ON SCHEDULE EVERY 1 HOUR "
                       "STARTS '2030-01-01 00:00:00' DO "
                       f"INSERT INTO {name} (k, grp, val) VALUES (7,'a',3.0)")
                job_made = True
                job_now = _dt.fromisoformat("2030-01-01 00:00:00")
            ps.tick_jobs(job_now)
            last = ps.insert_jobs[f"fzjob{seed}"]["tasks"][-1]
            if last["status"] == "SUCCESS":
                model[7] = {"grp": "a", "val": 3.0}
            else:  # the table was renamed away — loud failure, no write
                assert "unknown" in last["err"] or "table" in last["err"]
            job_now = job_now + _td(hours=1)
        else:  # rename_table
            new = f"{name}_r{mv_n}{len(model)}"
            ps.sql(f"ALTER TABLE {name} RENAME {new}")
            name = new
        if model:  # empty tables: SELECT over the empty view returns 0 rows
            _check(ps, name, model, mv_name)
        else:
            assert ps.sql(f"SELECT * FROM {name}").count() == 0
    # final: lifecycle teardown must leave no zombies for a reused name
    if job_made:
        ps.sql(f"DROP JOB WHERE jobname = 'fzjob{seed}'")
    if src_made:
        ps.sql(f"DROP TABLE fzsrc{seed}")
    ps.sql(f"DROP TABLE {name}")
    assert all(
        base != name for _, base, _, _ in
        (ps.rollups.list_rollups() if ps.rollups else [])
    )


def test_session_lifecycle_fuzz_seeded(ps):
    # 18 phases: enough draws that the low-weight backup/restore axis
    # actually fires across the seeds. Seed 19 at 24 phases is the r11
    # hunt's catcher: in-place RESTORE then CREATE MV then INSERT — the
    # name-keyed attach guard skipped the fresh object's load hook and
    # the MV answered stale (kept as a permanent regression tripwire).
    for seed in (11, 12, 13, 14):
        _run(ps, seed, phases=18)
    _run(ps, 19, phases=24)


@pytest.mark.parametrize("fuzz_seed", [2026])
def test_result_cache_consistency_fuzz(spark, tmp_path, fuzz_seed):
    """Randomized closure of the r9 cache-audit class (TZ keying,
    view-body expansion, drop/recreate lineage) EXTENDED in r10 to the
    whole staleness surface (VERDICT r9 advice #6): drive random
    mutations — inserts, deletes, truncate, drop+recreate, view
    create/replace, time-zone flips, async-MV create/refresh/
    drop+recreate (same name, different body — the cache-nonce class),
    external-catalog root-file swaps + REFRESH CATALOG — with the
    result cache AND transparent MV rewrite ON, and after every phase
    assert that each probe SELECT answered through the session equals
    the same statement executed with the cache and the rewrite OFF
    (ground truth from the bases). Seeded sweep; any stale cache hit
    OR stale transparent rewrite shows up as a value mismatch."""
    import random

    from palo_spark.palo_session import PaloSession

    ps = PaloSession(spark, location_root=str(tmp_path / "loc"),
                     result_cache=True)
    rng = random.Random(fuzz_seed)
    ps.sql("CREATE TABLE fz (`k` BIGINT, `v` INT, `ts` DATETIME) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO fz VALUES (1, 10, '2024-01-01 00:30:00')")
    ps.sql("CREATE VIEW fzv AS SELECT sum(v) AS s FROM fz")
    # external catalog whose root file the fuzzer swaps underneath
    root = tmp_path / "cat"
    root.mkdir()
    spark.range(3).selectExpr("id AS k", "id * 2 AS v2").write.mode(
        "overwrite").parquet(str(root / "e.parquet"))
    ps.sql(f"CREATE CATALOG fzc PROPERTIES ('type'='parquet_dir', "
           f"'root'='{root}')")
    # r10-continuation axis: a table-valued-function scan over an
    # external dir the fuzzer rewrites underneath — TVF reads carry no
    # mutation ledger, so they must never be served from the cache,
    # directly or through a session view
    tdir = tmp_path / "tvfdata"
    spark.range(4).selectExpr("id AS x").write.mode("overwrite").parquet(
        str(tdir))
    ps.sql(f'CREATE VIEW fztv AS SELECT x FROM local('
           f'"file_path"="{tdir}", "format"="parquet")')
    probes = [
        "SELECT count(*) AS n FROM fz",
        "SELECT s FROM fzv",
        "SELECT date_format(max(ts), '%Y-%m-%d %H:%i') AS d FROM fz",
        # grouped probe: eligible for TRANSPARENT rewrite onto fzamv
        # when the snapshot is fresh — stale-rewrite detector
        "SELECT v, count(*) AS n FROM fz GROUP BY v",
        # never cached (catalog) — stale would mean the gate broke
        "SELECT sum(v2) AS sv FROM fzc.e",
        # never cached (TVF — direct and view-wrapped)
        f'SELECT count(*) AS tn FROM local("file_path"="{tdir}", '
        '"format"="parquet")',
        "SELECT count(*) AS tvn FROM fztv",
    ]
    # r11 axis: a STATIC-partitioned table in the same mix — partition
    # truncate and temp-partition REPLACE are metadata/directory ops,
    # so a stale cache hit or stale transparent rewrite after either
    # is exactly the class this fuzzer exists to catch
    ps.sql("CREATE TABLE fzp (`k` BIGINT, `d` DATETIME, `pv` BIGINT) "
           "DUPLICATE KEY(k, d) PARTITION BY RANGE(`d`) ("
           "  PARTITION p_lo VALUES LESS THAN ('2000-01-01'),"
           "  PARTITION p_hi VALUES LESS THAN (MAXVALUE)"
           ") DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO fzp VALUES (1, '1999-01-01 00:00:00', 10), "
           "(2, '2001-01-01 00:00:00', 20)")
    probes.append("SELECT sum(pv) AS ps_ FROM fzp")
    probes.append("SELECT count(*) AS pn FROM fzp WHERE d < '2000-01-01'")
    pk = 1000
    temp_n = 0
    # r11 axis: a policied identity probed EVERY phase against the
    # explicit-predicate ground truth — any cache/rewrite/store leak of
    # unfiltered rows (in either direction) is a value mismatch. The
    # policy rides fzp, which partition ops mutate but never drop.
    ps.sql("CREATE USER 'fzpol'")
    ps.sql("GRANT SELECT_PRIV ON *.*.* TO 'fzpol'")
    ps.sql("CREATE ROW POLICY fz_small ON fzp AS RESTRICTIVE TO 'fzpol' "
           "USING (pv < 50)")
    # r10: a SECOND session attached to the same warehouse — its
    # commits go through its own Table handles, exercising the
    # cross-session convergence sweep + state-token cache invalidation
    foreign = PaloSession(spark, location_root=str(tmp_path / "loc"))
    k = 100
    amv_live = False
    for phase in range(48):
        op = rng.choice(
            ["insert", "insert", "delete", "truncate", "drop_recreate",
             "replace_view", "set_tz", "amv_create", "amv_refresh",
             "amv_drop_recreate", "cat_swap", "foreign_insert",
             "tvf_swap", "part_insert", "part_truncate", "part_replace"]
        )
        if op == "insert":
            k += 1
            ps.sql(f"INSERT INTO fz VALUES ({k}, {rng.randint(0, 99)}, "
                   f"'2024-0{rng.randint(1, 9)}-01 0{rng.randint(0, 9)}:15:00')")
        elif op == "delete":
            ps.sql(f"DELETE FROM fz WHERE v < {rng.randint(0, 50)}")
        elif op == "truncate":
            ps.sql("TRUNCATE TABLE fz")
        elif op == "drop_recreate":
            ps.sql("DROP TABLE fz")
            ps.sql("CREATE TABLE fz (`k` BIGINT, `v` INT, `ts` DATETIME) "
                   "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
            k += 1
            ps.sql(f"INSERT INTO fz VALUES ({k}, 5, '2024-02-02 12:00:00')")
        elif op == "replace_view":
            mult = rng.randint(1, 3)
            ps.sql(f"CREATE VIEW fzv AS SELECT sum(v) * {mult} AS s FROM fz")
        elif op == "amv_create":
            if amv_live:
                continue
            on = rng.choice(["MANUAL", "COMMIT"])
            ps.sql("CREATE MATERIALIZED VIEW fzamv REFRESH AUTO ON "
                   f"{on} AS SELECT v, count(*) AS n FROM fz GROUP BY v")
            amv_live = True
        elif op == "amv_refresh":
            if not amv_live:
                continue
            ps.sql("REFRESH MATERIALIZED VIEW fzamv")
        elif op == "amv_drop_recreate":
            if not amv_live:
                continue
            ps.sql("DROP MATERIALIZED VIEW fzamv")
            # same name, DIFFERENT body: a cached SELECT over the old
            # MV must not replay for the new one (nonce keying)
            ps.sql("CREATE MATERIALIZED VIEW fzamv REFRESH COMPLETE AS "
                   f"SELECT v, count(*) * {rng.randint(2, 5)} AS n "
                   "FROM fz GROUP BY v")
        elif op == "tvf_swap":
            # rewrite the TVF's external files (new part-file names AND
            # a new row count): the next TVF probe must see it
            spark.range(rng.randint(1, 9)).selectExpr(
                "id AS x").write.mode("overwrite").parquet(str(tdir))
        elif op == "part_insert":
            pk += 1
            yr = rng.choice(["1998", "1999", "2001", "2002"])
            ps.sql(f"INSERT INTO fzp VALUES ({pk}, "
                   f"'{yr}-0{rng.randint(1, 9)}-01 00:00:00', "
                   f"{rng.randint(0, 99)})")
        elif op == "part_truncate":
            ps.sql("TRUNCATE TABLE fzp PARTITION "
                   f"({rng.choice(['p_lo', 'p_hi'])})")
        elif op == "part_replace":
            # stage a rebuilt low partition under a temp label, swap it
            # in atomically — every cached/rewritten probe must see the
            # post-swap world
            temp_n += 1
            ps.sql(f"ALTER TABLE fzp ADD TEMPORARY PARTITION tz{temp_n} "
                   "VALUES LESS THAN ('2000-01-01')")
            pk += 1
            ps.sql(f"INSERT INTO fzp TEMPORARY PARTITION (tz{temp_n}) "
                   f"VALUES ({pk}, '1999-06-01 00:00:00', "
                   f"{rng.randint(100, 199)})")
            ps.sql("ALTER TABLE fzp REPLACE PARTITION (p_lo) WITH "
                   f"TEMPORARY PARTITION (tz{temp_n})")
        elif op == "cat_swap":
            n = rng.randint(2, 6)
            spark.range(n).selectExpr("id AS k", "id * 3 AS v2").write.mode(
                "overwrite").parquet(str(root / "e.parquet"))
            ps.sql("REFRESH CATALOG fzc")
        elif op == "foreign_insert":
            # another session's commit, through ITS handle of the same
            # directory — neither ps's view nor its cache saw it happen
            t = foreign.tables.get("fz")
            if t is None:
                t = Table.open(spark, ps.tables["fz"].location)
                foreign.tables["fz"] = t
            if t.meta.lineage != ps.tables["fz"].meta.lineage:
                # ps drop_recreate'd fz; re-open the new directory
                t = Table.open(spark, ps.tables["fz"].location)
                foreign.tables["fz"] = t
            k += 1
            t.insert(spark.createDataFrame(
                [(k, rng.randint(0, 99), "2024-03-03 03:30:00")],
                "k long, v int, ts string"))
        else:
            ps.sql(f"SET time_zone = "
                   f"'{rng.choice(['UTC', 'Asia/Shanghai', 'America/New_York'])}'")
        live_probes = probes + (
            ["SELECT v, n FROM fzamv"] if amv_live else [])
        for q in rng.sample(live_probes, 3):
            try:
                served = [tuple(r) for r in ps.sql(q).collect()]
            except ValueError:
                continue  # empty table state — both paths would raise
            saved, saved_mvr = ps.result_cache_enabled, ps.mv_rewrite_enabled
            ps.result_cache_enabled = False
            # ground truth bypasses the transparent rewrite too, EXCEPT
            # when the probe names the MV itself (both paths read the
            # snapshot there — that's the honest explicit contract)
            if "fzamv" not in q:
                ps.mv_rewrite_enabled = False
            try:
                truth = [tuple(r) for r in ps.sql(q).collect()]
            finally:
                ps.result_cache_enabled = saved
                ps.mv_rewrite_enabled = saved_mvr
            assert sorted(served, key=repr) == sorted(truth, key=repr), (
                phase, op, q, served, truth)
        # policied-identity probe: filtered count == explicit predicate
        ps.su("fzpol")
        try:
            pol_n = ps.sql(
                "SELECT count(*) AS n FROM fzp").collect()[0]["n"]
        finally:
            ps.su("root")
        want_n = ps.sql(
            "SELECT count(*) AS n FROM fzp WHERE pv < 50"
        ).collect()[0]["n"]
        assert pol_n == want_n, (phase, op, pol_n, want_n)


@pytest.mark.parametrize("fuzz_seed", [10])
def test_index_route_consistency_fuzz(spark, tmp_path, fuzz_seed):
    """Randomized closure of the r10c index-route class: drive random
    mutations (insert / delete / truncate / drop+recreate) interleaved
    with NGRAM_BF / BITMAP index create/drop, with the result cache ON,
    and after every phase assert that LIKE / equality probes answered
    through the session (index-accelerated where eligible) equal the
    same statements with every index removed and the cache off — the
    full-scan ground truth. Any stale posting read, broken freshness
    token, or unsound route splice shows up as a value mismatch."""
    import random

    from palo_spark.palo_session import PaloSession

    ps = PaloSession(spark, location_root=str(tmp_path / "ix"),
                     result_cache=True)
    rng = random.Random(fuzz_seed)
    words = ["alpha", "borwick", "cromulent", "dax", "embiggen"]

    def mk():
        ps.sql(
            "CREATE TABLE ix (`id` BIGINT, `txt` VARCHAR(64), "
            "`tag` VARCHAR(8)) DUPLICATE KEY(id) "
            "DISTRIBUTED BY HASH(id) BUCKETS 2"
        )

    mk()
    nid = 0
    ng_live = bm_live = False
    idx_n = 0

    def seed(n):
        nonlocal nid
        vals = []
        for _ in range(n):
            nid += 1
            w1, w2 = rng.choice(words), rng.choice(words)
            vals.append(f"({nid}, '{w1} {w2} t{nid % 13}', 'g{nid % 4}')")
        ps.sql("INSERT INTO ix VALUES " + ", ".join(vals))

    seed(40)
    for phase in range(24):
        op = rng.choice(
            ["insert", "insert", "delete", "truncate", "drop_recreate",
             "mk_ngram", "mk_bitmap", "drop_ngram", "drop_bitmap"]
        )
        if op == "insert":
            seed(rng.randint(1, 8))
        elif op == "delete":
            ps.sql(f"DELETE FROM ix WHERE id < {rng.randint(0, nid)}")
        elif op == "truncate":
            ps.sql("TRUNCATE TABLE ix")
        elif op == "drop_recreate":
            ps.sql("DROP TABLE ix")  # indexes die with the table
            ng_live = bm_live = False
            mk()
            seed(10)
        elif op == "mk_ngram" and not ng_live:
            idx_n += 1
            ps.sql(f"CREATE INDEX ng{idx_n} ON ix (txt) USING NGRAM_BF "
                   "PROPERTIES('gram_size'='3')")
            ng_live = True
        elif op == "mk_bitmap" and not bm_live:
            idx_n += 1
            ps.sql(f"CREATE INDEX bm{idx_n} ON ix (tag) USING BITMAP")
            bm_live = True
        elif op == "drop_ngram" and ng_live:
            name = next(i for i, v in ps.indexes.items() if v[3] == "NGRAM_BF")
            ps.sql(f"DROP INDEX {name} ON ix")
            ng_live = False
        elif op == "drop_bitmap" and bm_live:
            name = next(i for i, v in ps.indexes.items() if v[3] == "BITMAP")
            ps.sql(f"DROP INDEX {name} ON ix")
            bm_live = False
        frag = rng.choice(words)[1:5]
        probes = [
            f"SELECT id FROM ix WHERE `txt` LIKE '%{frag}%' ORDER BY id",
            f"SELECT id FROM ix WHERE tag = 'g{rng.randint(0, 4)}' ORDER BY id",
            f"SELECT count(*) AS n FROM ix WHERE `txt` LIKE '%t{rng.randint(0, 13)} %'",
        ]
        for q in rng.sample(probes, 2):
            try:
                served = [tuple(r) for r in ps.sql(q).collect()]
            except ValueError:
                continue  # empty-table state
            saved_idx, saved_rc = dict(ps.indexes), ps.result_cache_enabled
            ps.indexes, ps.result_cache_enabled = {}, False
            try:
                truth = [tuple(r) for r in ps.sql(q).collect()]
            finally:
                ps.indexes, ps.result_cache_enabled = saved_idx, saved_rc
            assert served == truth, (phase, op, q, served, truth)
