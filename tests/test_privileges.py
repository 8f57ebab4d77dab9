"""Privilege / ACL / row-policy surface ([docs: privilege,
row-policy]) — users, roles, GRANT/REVOKE, per-statement enforcement,
and row policies that filter through views and compose
RESTRICTIVE-AND / PERMISSIVE-OR, with every unfiltered store (result
cache, MV snapshots, rollups) bypassed for policied identities."""

from __future__ import annotations

import pytest

from palo_spark.palo_session import PaloSession


@pytest.fixture()
def ps(spark, tmp_path):
    return PaloSession(spark, location_root=str(tmp_path))


def _mk(ps):
    ps.sql("CREATE TABLE acl_t (`k` BIGINT, `region` VARCHAR(8), `v` INT) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO acl_t VALUES (1,'eu',10),(2,'us',20),(3,'eu',30)")


def test_grant_revoke_enforcement(ps):
    _mk(ps)
    ps.sql("CREATE USER 'alice'")
    ps.su("alice")
    with pytest.raises(PermissionError, match="SELECT_PRIV"):
        ps.sql("SELECT k FROM acl_t")
    with pytest.raises(PermissionError, match="LOAD_PRIV"):
        ps.sql("INSERT INTO acl_t VALUES (9,'eu',90)")
    with pytest.raises(PermissionError, match="DROP_PRIV"):
        ps.sql("DROP TABLE acl_t")
    with pytest.raises(PermissionError, match="GRANT_PRIV"):
        ps.sql("GRANT SELECT_PRIV ON acl_t TO 'alice'")
    ps.su("root")
    ps.sql("GRANT SELECT_PRIV, LOAD_PRIV ON acl_t TO 'alice'")
    ps.su("alice")
    assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3
    ps.sql("INSERT INTO acl_t VALUES (9,'eu',90)")
    # INSERT ... SELECT still needs SELECT on the source
    ps.su("root")
    ps.sql("CREATE TABLE acl_src (`k` BIGINT, `region` VARCHAR(8), "
           "`v` INT) DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO acl_src VALUES (50,'eu',5)")
    ps.su("alice")
    with pytest.raises(PermissionError, match="acl_src"):
        ps.sql("INSERT INTO acl_t SELECT * FROM acl_src")
    ps.su("root")
    ps.sql("REVOKE SELECT_PRIV ON acl_t FROM 'alice'")
    ps.su("alice")
    with pytest.raises(PermissionError, match="SELECT_PRIV"):
        ps.sql("SELECT k FROM acl_t")


def test_roles_and_global_scope(ps):
    _mk(ps)
    ps.sql("CREATE ROLE 'analyst'")
    ps.sql("GRANT SELECT_PRIV ON *.*.* TO ROLE 'analyst'")
    ps.sql("CREATE USER 'bob' DEFAULT ROLE 'analyst'")
    ps.su("bob")
    assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3
    with pytest.raises(PermissionError):
        ps.sql("CREATE TABLE bob_t (k BIGINT) DUPLICATE KEY(k) "
               "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.su("root")
    ps.sql("REVOKE 'analyst' FROM 'bob'")
    ps.su("bob")
    with pytest.raises(PermissionError):
        ps.sql("SELECT k FROM acl_t")
    ps.su("root")
    # membership in built-in role 'admin' IS admin (upstream)
    ps.sql("GRANT 'admin' TO 'bob'")
    ps.su("bob")
    ps.sql("CREATE TABLE bob_t (k BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("DROP TABLE bob_t")
    # SHOW GRANTS / SHOW ROLES surfaces
    ps.su("root")
    rows = ps.sql("SHOW GRANTS FOR 'bob'").collect()
    assert any("admin" in r["UserIdentity"] for r in rows) or rows
    assert {"admin", "operator", "analyst"} <= {
        r["Name"] for r in ps.sql("SHOW ROLES").collect()
    }


def test_row_policies_filter_and_compose(ps):
    _mk(ps)
    ps.sql("CREATE USER 'carol'")
    ps.sql("GRANT SELECT_PRIV ON acl_t TO 'carol'")
    ps.sql("CREATE ROW POLICY eu_only ON acl_t AS RESTRICTIVE TO 'carol' "
           "USING (region = 'eu')")
    ps.su("carol")
    got = sorted(r["k"] for r in ps.sql("SELECT k FROM acl_t").collect())
    assert got == [1, 3]
    # a view cannot launder policy rows (views re-resolve per query)
    ps.su("root")
    ps.sql("CREATE VIEW acl_v AS SELECT region, SUM(v) AS sv FROM acl_t "
           "GROUP BY region")
    ps.su("carol")
    assert [(r["region"], r["sv"]) for r in
            ps.sql("SELECT region, sv FROM acl_v").collect()] == [("eu", 40)]
    # PERMISSIVE policies OR together, then AND with RESTRICTIVE
    ps.su("root")
    ps.sql("CREATE ROW POLICY hi ON acl_t AS PERMISSIVE TO 'carol' "
           "USING (v >= 30)")
    ps.sql("CREATE ROW POLICY lo ON acl_t AS PERMISSIVE TO 'carol' "
           "USING (v <= 10)")
    ps.su("carol")
    got = sorted((r["k"], r["v"]) for r in
                 ps.sql("SELECT k, v FROM acl_t").collect())
    assert got == [(1, 10), (3, 30)]
    # root and DROP ROW POLICY are unaffected / restore visibility
    ps.su("root")
    assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3
    for pname in ("eu_only", "hi", "lo"):
        ps.sql(f"DROP ROW POLICY {pname} ON acl_t")
    ps.su("carol")
    assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3


def test_row_policy_bypasses_unfiltered_stores(ps):
    """The result cache and the transparent MV rewrite hold UNFILTERED
    data — a policied identity must never be served from either, and a
    root-cached result must not leak to a policy user (nor the
    filtered result back to root)."""
    ps.result_cache_enabled = True
    _mk(ps)
    ps.sql("CREATE USER 'dave'")
    ps.sql("GRANT SELECT_PRIV ON acl_t TO 'dave'")
    ps.sql("CREATE ROW POLICY d_eu ON acl_t AS RESTRICTIVE TO 'dave' "
           "USING (region = 'eu')")
    q = "SELECT count(*) AS n FROM acl_t"
    assert ps.sql(q).collect()[0]["n"] == 3  # root primes the cache
    assert ps.sql(q).collect()[0]["n"] == 3 and ps.last_cache_hit
    ps.su("dave")
    assert ps.sql(q).collect()[0]["n"] == 2
    assert not ps.last_cache_hit
    ps.su("root")
    assert ps.sql(q).collect()[0]["n"] == 3
    # transparent MV rewrite: fresh snapshot serves root, never dave
    ps.sql("CREATE MATERIALIZED VIEW acl_mv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT region, SUM(v) AS sv FROM acl_t "
           "GROUP BY region")
    df = ps.sql("SELECT region, SUM(v) AS sv FROM acl_t GROUP BY region")
    assert ps.last_mv_rewrite == "acl_mv" and df.count() == 2
    ps.su("dave")
    got = [(r["region"], r["sv"]) for r in ps.sql(
        "SELECT region, SUM(v) AS sv FROM acl_t GROUP BY region").collect()]
    assert got == [("eu", 40)] and ps.last_mv_rewrite is None
    # reading the MV by name needs SELECT on its bases (no laundering)
    ps.su("root")
    ps.sql("CREATE USER 'eve'")
    ps.su("eve")
    with pytest.raises(PermissionError, match="acl_t"):
        ps.sql("SELECT region, sv FROM acl_mv")


def test_definer_rights_maintenance_under_policy_user(ps):
    """Internal maintenance (ON COMMIT MV refresh, scheduled-job DO)
    runs definer-rights: a policied, LOAD-granted identity committing a
    batch must refresh the MV from the FULL base, not its filtered
    view of it."""
    _mk(ps)
    ps.sql("CREATE USER 'frank'")
    ps.sql("GRANT SELECT_PRIV, LOAD_PRIV ON acl_t TO 'frank'")
    ps.sql("CREATE ROW POLICY f_eu ON acl_t AS RESTRICTIVE TO 'frank' "
           "USING (region = 'eu')")
    ps.sql("CREATE MATERIALIZED VIEW acl_cmv REFRESH AUTO ON COMMIT AS "
           "SELECT region, SUM(v) AS sv FROM acl_t GROUP BY region")
    ps.su("frank")
    ps.sql("INSERT INTO acl_t VALUES (10,'us',100)")  # fires ON COMMIT
    ps.su("root")
    got = {r["region"]: r["sv"] for r in
           ps.sql("SELECT region, sv FROM acl_cmv").collect()}
    assert got == {"eu": 40, "us": 120}  # full base, frank's commit in


def test_user_role_lifecycle_and_errors(ps):
    ps.sql("CREATE USER 'gina'")
    with pytest.raises(ValueError, match="already exists"):
        ps.sql("CREATE USER 'gina'")
    ps.sql("CREATE USER IF NOT EXISTS 'gina'")
    with pytest.raises(ValueError, match="unknown role"):
        ps.sql("GRANT 'nope' TO 'gina'")
    with pytest.raises(ValueError, match="unknown privilege"):
        ps.sql("GRANT FLY_PRIV ON acl_t TO 'gina'")
    with pytest.raises(ValueError, match="built-in"):
        ps.sql("DROP ROLE 'admin'")
    with pytest.raises(ValueError, match="root"):
        ps.sql("DROP USER 'root'")
    # dropping a user removes its grants and policies
    ps.sql("CREATE TABLE gt (k BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("GRANT SELECT_PRIV ON gt TO 'gina'")
    ps.sql("CREATE ROW POLICY gp ON gt AS RESTRICTIVE TO 'gina' "
           "USING (k > 0)")
    ps.sql("DROP USER 'gina'")
    assert not ps.access.policies
    assert ("user", "gina") not in ps.access.grants
    # dropping a granted role revokes it from users
    ps.sql("CREATE ROLE 'temp_r'")
    ps.sql("CREATE USER 'hank' DEFAULT ROLE 'temp_r'")
    ps.sql("DROP ROLE 'temp_r'")
    assert ps.access.users["hank"] == set()
    # su() to an unknown user fails loudly
    with pytest.raises(ValueError, match="unknown user"):
        ps.su("nobody")


@pytest.mark.parametrize("seed", [7, 19, 42])
def test_privilege_policy_fuzz(ps, tmp_path, seed):
    """Randomized closure of the authorization surface: drive random
    grant/revoke (user- and role-scoped), role membership flips,
    policy create/drop (both kinds, both grantee kinds), table
    renames, in-place BACKUP/RESTORE roundtrips, and DROP USER +
    recreate (r12 op extensions), and after EVERY phase assert the
    identity's view of the table equals a pure-Python model — both
    the allowed/denied decision and the exact visible row set under
    the policy combination rule. Any enforcement staleness, policy
    leak, or lifecycle-follow miss is a hard mismatch."""
    import random

    rows = [
        (1, "eu", 10), (2, "eu", 60), (3, "us", 20),
        (4, "us", 80), (5, "ap", 45), (6, "ap", 95),
    ]
    ps.sql("CREATE TABLE fzacl (`k` BIGINT, `region` VARCHAR(4), `v` INT) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO fzacl VALUES " + ", ".join(
        f"({k},'{r}',{v})" for k, r, v in rows))
    # static twin probed THROUGH an async MV and a view-over-MV (r12:
    # the MV-laundering class) — every grant/policy op below mirrors
    # onto it, so the model's allowed/visible state applies to both
    ps.sql("CREATE TABLE fzs (`k` BIGINT, `region` VARCHAR(4), `v` INT) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO fzs VALUES " + ", ".join(
        f"({k},'{r}',{v})" for k, r, v in rows))
    ps.sql("CREATE MATERIALIZED VIEW fzs_mv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT region, SUM(v) AS sv FROM fzs "
           "GROUP BY region")
    ps.sql("CREATE VIEW v_fzs_mv AS SELECT region, sv FROM fzs_mv")
    ps.sql("CREATE USER 'fu'")
    ps.sql("CREATE ROLE 'fr'")
    preds = {
        "p_eu": ("region = 'eu'", lambda r: r[1] == "eu"),
        "p_low": ("v < 50", lambda r: r[2] < 50),
        "p_hi": ("v >= 45", lambda r: r[2] >= 45),
    }
    ps.sql(f"CREATE REPOSITORY fzrepo WITH LOCATION '{tmp_path}/fzrepo'")
    rng = random.Random(seed)
    name = "fzacl"
    sel_user = sel_role = has_role = False
    live: dict[str, tuple[str, str]] = {}  # pname -> (kind, to_kind)
    n_ren = 0
    for phase in range(48):
        op = rng.choice(
            ["gs_user", "rs_user", "gs_role", "rs_role", "g_role",
             "r_role", "pol_add", "pol_drop", "rename",
             "snap_roundtrip", "drop_user"])
        if op == "gs_user":
            ps.sql(f"GRANT SELECT_PRIV ON {name} TO 'fu'")
            ps.sql("GRANT SELECT_PRIV ON fzs TO 'fu'")
            sel_user = True
        elif op == "rs_user":
            ps.sql(f"REVOKE SELECT_PRIV ON {name} FROM 'fu'")
            ps.sql("REVOKE SELECT_PRIV ON fzs FROM 'fu'")
            sel_user = False
        elif op == "gs_role":
            ps.sql(f"GRANT SELECT_PRIV ON {name} TO ROLE 'fr'")
            ps.sql("GRANT SELECT_PRIV ON fzs TO ROLE 'fr'")
            sel_role = True
        elif op == "rs_role":
            ps.sql(f"REVOKE SELECT_PRIV ON {name} FROM ROLE 'fr'")
            ps.sql("REVOKE SELECT_PRIV ON fzs FROM ROLE 'fr'")
            sel_role = False
        elif op == "g_role":
            ps.sql("GRANT 'fr' TO 'fu'")
            has_role = True
        elif op == "r_role":
            ps.sql("REVOKE 'fr' FROM 'fu'")
            has_role = False
        elif op == "pol_add":
            pn = rng.choice(list(preds))
            if pn in live:
                continue
            kind = rng.choice(["RESTRICTIVE", "PERMISSIVE"])
            to_role = rng.random() < 0.5
            to = "ROLE 'fr'" if to_role else "'fu'"
            ps.sql(f"CREATE ROW POLICY {pn} ON {name} AS {kind} TO {to} "
                   f"USING ({preds[pn][0]})")
            ps.sql(f"CREATE ROW POLICY {pn} ON fzs AS {kind} TO {to} "
                   f"USING ({preds[pn][0]})")
            live[pn] = (kind, "role" if to_role else "user")
        elif op == "pol_drop":
            if not live:
                continue
            pn = rng.choice(sorted(live))
            ps.sql(f"DROP ROW POLICY {pn} ON {name}")
            ps.sql(f"DROP ROW POLICY {pn} ON fzs")
            del live[pn]
        elif op == "rename":
            # rename — grants are NAME-based and must be re-issued;
            # to keep the grant model simple, re-grant what was held
            n_ren += 1
            new = f"fzacl_r{n_ren}"
            ps.sql(f"ALTER TABLE {name} RENAME {new}")
            if sel_user:
                ps.sql(f"GRANT SELECT_PRIV ON {new} TO 'fu'")
            if sel_role:
                ps.sql(f"GRANT SELECT_PRIV ON {new} TO ROLE 'fr'")
            name = new
        elif op == "snap_roundtrip":
            # in-place BACKUP + RESTORE: a fresh Table OBJECT under the
            # same name — enforcement, policies, and visible rows must
            # be unchanged (NAME-vs-OBJECT lifetime class)
            ps.sql(f"BACKUP SNAPSHOT fz{phase} TO fzrepo ON ({name})")
            ps.sql(f"RESTORE SNAPSHOT fz{phase} FROM fzrepo ON ({name})")
        else:  # drop_user — user grants and user-grantee policies die
            # with the user; role-grantee policies and role grants
            # survive (they belong to the role). Recreate fresh.
            ps.sql("DROP USER 'fu'")
            ps.sql("CREATE USER 'fu'")
            sel_user = has_role = False
            live = {pn: v for pn, v in live.items() if v[1] == "role"}
        # ---- probe as 'fu' against the Python model
        allowed = sel_user or (has_role and sel_role)
        mine = [
            (pn, k)
            for pn, (k, tk) in live.items()
            if tk == "user" or has_role
        ]
        restr = [preds[pn][1] for pn, k in mine if k == "RESTRICTIVE"]
        perm = [preds[pn][1] for pn, k in mine if k == "PERMISSIVE"]

        def visible(r):
            ok = all(f(r) for f in restr)
            if perm:
                ok = ok and any(f(r) for f in perm)
            return ok

        want = sorted(r[0] for r in rows if visible(r))
        agg: dict[str, int] = {}
        for r in rows:
            if visible(r):
                agg[r[1]] = agg.get(r[1], 0) + r[2]
        want_mv = sorted(agg.items())
        mv_tgt = rng.choice(["fzs_mv", "v_fzs_mv"])
        ps.su("fu")
        try:
            if not allowed:
                with pytest.raises(PermissionError):
                    ps.sql(f"SELECT k FROM {name}").collect()
                # the MV (and a view over it) must enforce the same
                # base grant — no privilege laundering
                with pytest.raises(PermissionError):
                    ps.sql(f"SELECT region, sv FROM {mv_tgt}").collect()
            else:
                got = sorted(
                    r["k"]
                    for r in ps.sql(f"SELECT k FROM {name}").collect()
                )
                assert got == want, (phase, op, got, want, live,
                                     has_role, mine)
                # MV snapshot is UNFILTERED — a policied identity's
                # read by name must equal the aggregate of its
                # policy-visible base rows (r12 laundering class)
                got_mv = sorted(
                    (r["region"], r["sv"]) for r in
                    ps.sql(f"SELECT region, sv FROM {mv_tgt}").collect()
                )
                assert got_mv == want_mv, (phase, op, mv_tgt, got_mv,
                                           want_mv, live, has_role)
        finally:
            ps.su("root")


def test_access_state_survives_session_reattach(spark, tmp_path):
    """Security state is FE metadata: a session re-attached to the same
    warehouse keeps users, roles, grants, and row policies — a policy
    must never silently evaporate on restart."""
    root = str(tmp_path / "wh")
    ps1 = PaloSession(spark, location_root=root)
    ps1.sql("CREATE TABLE per_t (`k` BIGINT, `v` INT) DUPLICATE KEY(k) "
            "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps1.sql("INSERT INTO per_t VALUES (1, 10), (2, 60)")
    ps1.sql("CREATE ROLE 'reader'")
    ps1.sql("GRANT SELECT_PRIV ON per_t TO ROLE 'reader'")
    ps1.sql("CREATE USER 'uma' DEFAULT ROLE 'reader'")
    ps1.sql("CREATE ROW POLICY u_small ON per_t AS RESTRICTIVE TO 'uma' "
            "USING (v < 50)")
    ps2 = PaloSession(spark, location_root=root)
    assert "uma" in ps2.access.users and "reader" in ps2.access.roles
    ps2.su("uma")
    got = [r["k"] for r in ps2.sql("SELECT k FROM per_t").collect()]
    assert got == [1], "policy did not survive the re-attach"
    with pytest.raises(PermissionError):
        ps2.sql("INSERT INTO per_t VALUES (9, 9)")


def test_show_tables_filters_by_privilege(ps):
    _mk(ps)
    ps.sql("CREATE TABLE acl_hidden (k BIGINT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE USER 'sam'")
    ps.sql("GRANT SELECT_PRIV ON acl_t TO 'sam'")
    ps.su("sam")
    names = {r["table_name"] for r in ps.sql("SHOW TABLES").collect()}
    assert names == {"acl_t"}
    ps.su("root")
    names = {r["table_name"] for r in ps.sql("SHOW TABLES").collect()}
    assert {"acl_t", "acl_hidden"} <= names


def test_row_policy_applies_through_partition_selection(ps):
    """FROM t PARTITION (p) rewrites to a per-statement __psel view
    built straight from the rowsets — the policy filter must ride it
    too, or explicit partition selection would bypass the policy."""
    ps.sql("CREATE TABLE acl_p (`k` BIGINT, `d` DATETIME, `v` INT) "
           "DUPLICATE KEY(k, d) PARTITION BY RANGE(`d`) ("
           "  PARTITION p_lo VALUES LESS THAN ('2000-01-01'),"
           "  PARTITION p_hi VALUES LESS THAN (MAXVALUE)"
           ") DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO acl_p VALUES (1,'1999-01-01 00:00:00',10), "
           "(2,'1999-02-01 00:00:00',60), (3,'2001-01-01 00:00:00',70)")
    ps.sql("CREATE USER 'pat'")
    ps.sql("GRANT SELECT_PRIV ON acl_p TO 'pat'")
    ps.sql("CREATE ROW POLICY p_small ON acl_p AS RESTRICTIVE TO 'pat' "
           "USING (v < 50)")
    ps.su("pat")
    got = sorted(r["k"] for r in ps.sql(
        "SELECT k FROM acl_p PARTITION (p_lo)").collect())
    assert got == [1], "partition selection bypassed the row policy"
    ps.su("root")
    got = sorted(r["k"] for r in ps.sql(
        "SELECT k FROM acl_p PARTITION (p_lo)").collect())
    assert got == [1, 2]


def test_row_policy_follows_rename_and_dies_with_drop(ps):
    """Policies bind to the TABLE (upstream: table id): ALTER TABLE
    RENAME carries them along — a rename must never silently strip a
    filter — while DROP TABLE removes them (a later same-named table
    starts clean, as upstream's id-keyed policies do). Grants stay
    name-based: the renamed table needs a re-grant."""
    _mk(ps)
    ps.sql("CREATE USER 'ivy'")
    ps.sql("GRANT SELECT_PRIV ON *.*.* TO 'ivy'")  # global: survives rename
    ps.sql("CREATE ROW POLICY i_eu ON acl_t AS RESTRICTIVE TO 'ivy' "
           "USING (region = 'eu')")
    ps.sql("ALTER TABLE acl_t RENAME acl_r")
    ps.su("ivy")
    got = sorted(r["k"] for r in ps.sql("SELECT k FROM acl_r").collect())
    assert got == [1, 3], "policy did not follow the rename"
    ps.su("root")
    ps.sql("DROP TABLE acl_r")
    assert not ps.access.policies
    # a recreated same-named table starts unpoliced
    _mk(ps)
    ps.su("ivy")
    assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3


def test_mutation_embedded_reads_respect_row_policies(ps):
    """ADVICE r11 (high): UPDATE ... FROM and DELETE ... USING compose
    a join-SELECT that previously ran definer-rights, so a policied
    identity could launder policy-hidden source rows into a table it
    can read (or delete/update correlated with rows it cannot see).
    The embedded read now runs AS the current identity."""
    for t in ("pol_mine", "pol_mine2"):
        ps.sql(f"CREATE TABLE {t} (`k` BIGINT, `v` INT) UNIQUE KEY(k) "
               "DISTRIBUTED BY HASH(k) BUCKETS 2")
        ps.sql(f"INSERT INTO {t} VALUES (1, 0), (2, 0)")
    ps.sql("CREATE TABLE pol_secret (`k` BIGINT, `s` INT, "
           "`region` VARCHAR(8)) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO pol_secret VALUES (1, 111, 'eu'), (2, 222, 'us')")
    ps.sql("CREATE USER 'mallory'")
    ps.sql("GRANT SELECT_PRIV, LOAD_PRIV ON pol_mine TO 'mallory'")
    ps.sql("GRANT SELECT_PRIV, LOAD_PRIV ON pol_mine2 TO 'mallory'")
    ps.sql("GRANT SELECT_PRIV ON pol_secret TO 'mallory'")
    ps.sql("CREATE ROW POLICY s_eu ON pol_secret AS RESTRICTIVE TO "
           "'mallory' USING (region = 'eu')")
    try:
        ps.su("mallory")
        ps.sql("UPDATE pol_mine SET v = s.s FROM pol_secret s "
               "WHERE pol_mine.k = s.k")
        got = {r["k"]: r["v"]
               for r in ps.sql("SELECT k, v FROM pol_mine").collect()}
        # k=2's source row is policy-hidden from mallory: untouched
        assert got == {1: 111, 2: 0}
        ps.sql("DELETE FROM pol_mine2 USING pol_secret s "
               "WHERE pol_mine2.k = s.k")
        left = sorted(
            r["k"] for r in ps.sql("SELECT k FROM pol_mine2").collect())
        assert left == [2]
    finally:
        ps.su("root")
    # root's identical join-mutations stay unfiltered
    ps.sql("UPDATE pol_mine SET v = s.s FROM pol_secret s "
           "WHERE pol_mine.k = s.k")
    assert {r["k"]: r["v"]
            for r in ps.sql("SELECT k, v FROM pol_mine").collect()
            } == {1: 111, 2: 222}
    ps.sql("DELETE FROM pol_mine2 USING pol_secret s WHERE pol_mine2.k = s.k")
    assert ps.sql("SELECT count(*) AS n FROM pol_mine2").collect()[0]["n"] == 0


def test_target_side_policy_limits_mutations(ps):
    """A policy on the TARGET table bounds which rows a join-mutation
    can touch (the composed read swaps every policied table it
    reaches, target included — PostgreSQL-RLS posture)."""
    ps.sql("CREATE TABLE pol_tgt (`k` BIGINT, `region` VARCHAR(8), "
           "`v` INT) UNIQUE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO pol_tgt VALUES (1,'eu',0),(2,'us',0)")
    ps.sql("CREATE TABLE pol_srd (`k` BIGINT, `s` INT) DUPLICATE KEY(k) "
           "DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("INSERT INTO pol_srd VALUES (1, 11), (2, 22)")
    ps.sql("CREATE USER 'nina'")
    ps.sql("GRANT SELECT_PRIV, LOAD_PRIV ON pol_tgt TO 'nina'")
    ps.sql("GRANT SELECT_PRIV ON pol_srd TO 'nina'")
    ps.sql("CREATE ROW POLICY t_eu ON pol_tgt AS RESTRICTIVE TO 'nina' "
           "USING (region = 'eu')")
    try:
        ps.su("nina")
        ps.sql("DELETE FROM pol_tgt USING pol_srd s WHERE pol_tgt.k = s.k")
    finally:
        ps.su("root")
    # only the row nina can SEE was deletable; the us row survives
    assert sorted(r["k"] for r in
                  ps.sql("SELECT k FROM pol_tgt").collect()) == [2]


def test_builtin_admin_is_superuser(ps):
    """ADVICE r11: upstream bootstraps admin@'%' with ADMIN_PRIV (role
    'admin'); su('admin') must be a working superuser, not a powerless
    identity."""
    _mk(ps)
    assert ps.access.is_superuser("admin")
    try:
        ps.su("admin")
        assert ps.sql("SELECT count(*) AS n FROM acl_t").collect()[0]["n"] == 3
        ps.sql("CREATE USER 'frank'")  # DDL needs superuser/grants
    finally:
        ps.su("root")
    assert "frank" in ps.access.users


def test_show_row_policy_for_resolves_roles(ps):
    """ADVICE r11: SHOW ROW POLICY FOR 'user' must include policies
    attached via roles the user holds, and FOR ROLE 'r' must not be
    conflated with a same-named user."""
    _mk(ps)
    ps.sql("CREATE ROLE 'readers'")
    ps.sql("CREATE USER 'grace'")
    ps.sql("GRANT 'readers' TO 'grace'")
    ps.sql("CREATE ROW POLICY via_role ON acl_t AS RESTRICTIVE TO ROLE "
           "'readers' USING (region = 'eu')")
    ps.sql("CREATE ROW POLICY direct ON acl_t AS PERMISSIVE TO 'grace' "
           "USING (v > 0)")
    # a role named like a user must not bleed into the user listing
    ps.sql("CREATE ROLE 'grace'")
    ps.sql("CREATE ROW POLICY role_only ON acl_t AS RESTRICTIVE TO ROLE "
           "'grace' USING (v < 0)")
    names = sorted(r["PolicyName"] for r in
                   ps.sql("SHOW ROW POLICY FOR 'grace'").collect())
    assert names == ["direct", "via_role"]
    names = sorted(r["PolicyName"] for r in
                   ps.sql("SHOW ROW POLICY FOR ROLE 'readers'").collect())
    assert names == ["via_role"]
    names = sorted(r["PolicyName"] for r in
                   ps.sql("SHOW ROW POLICY FOR ROLE 'grace'").collect())
    assert names == ["role_only"]


def test_policied_reads_keep_index_routes_and_pushdown(ps):
    """VERDICT r11 #3 plan pin: a row policy must attach to, not
    defeat, the scan's accelerations. The NGRAM/MATCH/value-index
    splice is IMPLIED by the predicate it replaces, so running it
    over the policy-filtered view returns exactly (visible rows) ∩
    (predicate rows) — and the policy conjunct rides the filtered
    view into the parquet scan as an ordinary pushed filter."""
    ps.sql("CREATE TABLE pol_docs (`doc_id` BIGINT, `text` VARCHAR(200), "
           "`lang` VARCHAR(4)) DUPLICATE KEY(doc_id) "
           "DISTRIBUTED BY HASH(doc_id) BUCKETS 2")
    rows = ", ".join(
        f"({i}, 'alpha tok{i % 23} needlehay{i % 7} omega', "
        f"'{'en' if i % 3 else 'de'}')" for i in range(80))
    ps.sql(f"INSERT INTO pol_docs VALUES {rows}")
    ps.sql("CREATE INDEX pd_ng ON pol_docs (text) USING NGRAM_BF "
           "PROPERTIES('gram_size'='3', 'bf_size'='256')")
    ps.sql("CREATE USER 'rix'")
    ps.sql("GRANT SELECT_PRIV ON pol_docs TO 'rix'")
    ps.sql("CREATE ROW POLICY rix_en ON pol_docs AS RESTRICTIVE TO 'rix' "
           "USING (lang = 'en')")
    q = ("SELECT doc_id FROM pol_docs WHERE `text` LIKE '%needlehay3%' "
         "ORDER BY doc_id")
    root_hits = [r[0] for r in ps.sql(q).collect()]
    assert ps.last_like_indexed and root_hits
    try:
        ps.su("rix")
        got = [r[0] for r in ps.sql(q).collect()]
        assert ps.last_like_indexed, "policy defeated the NGRAM route"
        assert got == [i for i in root_hits if i % 3]
        # pushdown pin: policy conjunct AND user predicate both reach
        # the parquet scan
        df = ps.sql("SELECT doc_id FROM pol_docs WHERE doc_id = 5")
        plan = df._jdf.queryExecution().executedPlan().toString()
        flat = plan.replace("\n", " ")
        assert "EqualTo(lang,en)" in flat, "policy filter not pushed"
        assert "EqualTo(doc_id,5)" in flat, "user filter not pushed"
    finally:
        ps.su("root")


def test_policied_direct_mv_read_is_filtered(ps):
    """r12 audit: an async-MV snapshot holds UNFILTERED rows, so a
    row-policied identity reading the MV BY NAME (or through a view
    over it) must get the body recomputed over its filtered bases —
    not the snapshot. Non-policied identities keep the snapshot, and
    the swap restores it."""
    _mk(ps)
    ps.sql("CREATE MATERIALIZED VIEW pmv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT region, SUM(v) AS sv FROM acl_t "
           "GROUP BY region")
    ps.sql("CREATE VIEW v_pmv AS SELECT region, sv FROM pmv")
    ps.sql("CREATE USER 'gina'")
    ps.sql("GRANT SELECT_PRIV ON acl_t TO 'gina'")
    ps.sql("CREATE ROW POLICY g_eu ON acl_t AS RESTRICTIVE TO 'gina' "
           "USING (region = 'eu')")
    try:
        ps.su("gina")
        got = {(r["region"], r["sv"])
               for r in ps.sql("SELECT region, sv FROM pmv").collect()}
        assert got == {("eu", 40)}, "direct MV read laundered policy rows"
        got_v = {(r["region"], r["sv"])
                 for r in ps.sql("SELECT region, sv FROM v_pmv").collect()}
        assert got_v == {("eu", 40)}, "view-over-MV laundered policy rows"
    finally:
        ps.su("root")
    # snapshot restored for unrestricted identities
    got = {(r["region"], r["sv"])
           for r in ps.sql("SELECT region, sv FROM pmv").collect()}
    assert got == {("eu", 40), ("us", 20)}


def test_policied_direct_join_mv_read_is_filtered(ps):
    """Same laundering check for a JOIN-BODY async MV (r12): the
    policy sits on the DIM side; the recompute joins the filtered dim,
    so the policied identity loses exactly the hidden dim's rows."""
    ps.sql("CREATE TABLE pjf (`k` BIGINT, `d` BIGINT, `amt` DOUBLE) "
           "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 2")
    ps.sql("CREATE TABLE pjd (`d` BIGINT, `region` VARCHAR(8)) "
           "DUPLICATE KEY(d) DISTRIBUTED BY HASH(d) BUCKETS 2")
    ps.sql("INSERT INTO pjf VALUES (1,1,10.0),(2,2,20.0),(3,1,30.0)")
    ps.sql("INSERT INTO pjd VALUES (1,'eu'),(2,'us')")
    ps.sql("CREATE MATERIALIZED VIEW pjmv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT d2.region AS region, "
           "SUM(pjf.amt) AS sa FROM pjf JOIN pjd d2 ON pjf.d = d2.d "
           "GROUP BY d2.region")
    ps.sql("CREATE USER 'hana'")
    ps.sql("GRANT SELECT_PRIV ON pjf TO 'hana'")
    ps.sql("GRANT SELECT_PRIV ON pjd TO 'hana'")
    ps.sql("CREATE ROW POLICY h_eu ON pjd AS RESTRICTIVE TO 'hana' "
           "USING (region = 'eu')")
    try:
        ps.su("hana")
        got = {(r["region"], r["sa"])
               for r in ps.sql("SELECT region, sa FROM pjmv").collect()}
        assert got == {("eu", 40.0)}, "join-MV read laundered dim policy"
    finally:
        ps.su("root")
    got = {(r["region"], r["sa"])
           for r in ps.sql("SELECT region, sa FROM pjmv").collect()}
    assert got == {("eu", 40.0), ("us", 20.0)}


def test_view_over_mv_cannot_launder_privileges(ps):
    """r12 audit: privilege enforcement must see an async MV reached
    THROUGH a session view (the MV-name scan walks view bodies), or a
    view-over-MV read needs no grant at all."""
    _mk(ps)
    ps.sql("CREATE MATERIALIZED VIEW lmv BUILD IMMEDIATE REFRESH "
           "COMPLETE ON MANUAL AS SELECT region, SUM(v) AS sv FROM acl_t "
           "GROUP BY region")
    ps.sql("CREATE VIEW v_lmv AS SELECT region, sv FROM lmv")
    ps.sql("CREATE USER 'ivan'")
    try:
        ps.su("ivan")
        with pytest.raises(PermissionError, match="acl_t"):
            ps.sql("SELECT region, sv FROM v_lmv")
    finally:
        ps.su("root")
    ps.sql("GRANT SELECT_PRIV ON acl_t TO 'ivan'")
    try:
        ps.su("ivan")
        assert ps.sql("SELECT count(*) AS n FROM v_lmv").collect()[0]["n"] == 2
    finally:
        ps.su("root")
