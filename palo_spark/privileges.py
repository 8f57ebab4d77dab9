"""Doris privilege / ACL / row-policy model ([docs: privilege,
row-policy; upstream: fe/.../mysql/privilege/Auth.java — capability
reference only, this is an original implementation).

Scope notes for this embedded engine:

- Doris scopes grants as ``catalog.db.table``; this session has one
  flat namespace, so a grant scope is either ``*`` (global — what
  ``*.*.*`` means upstream) or one table name. Database-level grants
  collapse into the global scope.
- Identity comes from the embedded session, not a wire handshake:
  :meth:`palo_spark.palo_session.PaloSession.su` is the analog of
  reconnecting as another user with the mysql client. ``root`` is the
  superuser and (as upstream) is never subject to privilege checks or
  row policies; so is any user holding global ``ADMIN_PRIV``.
- Row policies follow upstream semantics: per (table, grantee) WHERE
  predicates, RESTRICTIVE policies AND together, PERMISSIVE policies
  OR together, and the two groups AND; they apply to reads and are
  invisible to the policy-exempt users above.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: the grantable privileges ([docs: privilege] — NODE_PRIV is the
#: cluster-node management right, meaningless in an embedded session,
#: deliberately not grantable here so a request for it fails loudly)
PRIVS = {
    "ADMIN_PRIV",
    "GRANT_PRIV",
    "SELECT_PRIV",
    "LOAD_PRIV",
    "ALTER_PRIV",
    "CREATE_PRIV",
    "DROP_PRIV",
    "USAGE_PRIV",
}

#: ``GRANT ALL`` expands to everything grantable (upstream's ALL)
ALL_PRIVS = frozenset(PRIVS - {"ADMIN_PRIV"})


@dataclass
class RowPolicy:
    name: str
    table: str
    kind: str  # RESTRICTIVE | PERMISSIVE
    to_kind: str  # user | role
    to_name: str
    expr: str  # the USING (...) predicate, Doris dialect


@dataclass
class AccessController:
    """In-memory authorization state + decision procedures. Pure
    metadata — nothing here touches Spark; enforcement call sites live
    in PaloSession.sql()."""

    #: upstream bootstraps admin@'%' holding role 'admin' (Auth.java
    #: creates both built-in identities with ADMIN_PRIV) — membership
    #: in role 'admin' is what :meth:`is_superuser` keys on (ADVICE
    #: r11: a roleless built-in admin was a powerless identity)
    users: dict = field(
        default_factory=lambda: {"root": set(), "admin": {"admin"}}
    )
    roles: set = field(default_factory=lambda: {"operator", "admin"})
    #: grants[(kind, name)][scope] = set of privs; scope '*' or table
    grants: dict = field(default_factory=dict)
    policies: list = field(default_factory=list)

    # ------------------------------------------------------- principals

    def create_user(self, name: str, default_role: str | None = None):
        name = name.lower()
        if name in self.users:
            raise ValueError(f"user {name!r} already exists")
        roles = set()
        if default_role:
            if default_role.lower() not in self.roles:
                raise ValueError(f"unknown role {default_role!r}")
            roles.add(default_role.lower())
        self.users[name] = roles

    def drop_user(self, name: str):
        name = name.lower()
        if name == "root":
            raise ValueError("cannot drop user 'root'")
        if name not in self.users:
            raise ValueError(f"unknown user {name!r}")
        del self.users[name]
        self.grants.pop(("user", name), None)
        self.policies = [
            p for p in self.policies
            if not (p.to_kind == "user" and p.to_name == name)
        ]

    def create_role(self, name: str):
        name = name.lower()
        if name in self.roles:
            raise ValueError(f"role {name!r} already exists")
        self.roles.add(name)

    def drop_role(self, name: str):
        name = name.lower()
        if name in ("admin", "operator"):
            raise ValueError(f"cannot drop built-in role {name!r}")
        if name not in self.roles:
            raise ValueError(f"unknown role {name!r}")
        self.roles.discard(name)
        self.grants.pop(("role", name), None)
        for roles in self.users.values():
            roles.discard(name)
        self.policies = [
            p for p in self.policies
            if not (p.to_kind == "role" and p.to_name == name)
        ]

    # ----------------------------------------------------------- grants

    def _grantee(self, kind: str, name: str):
        name = name.lower()
        if kind == "user" and name not in self.users:
            raise ValueError(f"unknown user {name!r}")
        if kind == "role" and name not in self.roles:
            raise ValueError(f"unknown role {name!r}")
        return (kind, name)

    def grant(self, privs: set[str], scope: str, kind: str, name: str):
        key = self._grantee(kind, name)
        self.grants.setdefault(key, {}).setdefault(scope, set()).update(privs)

    def revoke(self, privs: set[str], scope: str, kind: str, name: str):
        key = self._grantee(kind, name)
        held = self.grants.get(key, {}).get(scope, set())
        held.difference_update(privs)

    def grant_role(self, role: str, user: str):
        role, user = role.lower(), user.lower()
        if role not in self.roles:
            raise ValueError(f"unknown role {role!r}")
        if user not in self.users:
            raise ValueError(f"unknown user {user!r}")
        self.users[user].add(role)

    def revoke_role(self, role: str, user: str):
        role, user = role.lower(), user.lower()
        if user not in self.users:
            raise ValueError(f"unknown user {user!r}")
        self.users[user].discard(role)

    # -------------------------------------------------------- decisions

    def is_superuser(self, user: str) -> bool:
        user = user.lower()
        if user == "root":
            return True
        sets = [self.grants.get(("user", user), {})]
        sets += [
            self.grants.get(("role", r), {})
            for r in self.users.get(user, ())
        ]
        # upstream built-in: membership in role 'admin' IS admin
        if "admin" in self.users.get(user, ()):
            return True
        return any("ADMIN_PRIV" in g.get("*", set()) for g in sets)

    def has_priv(self, user: str, priv: str, table: str | None = None) -> bool:
        user = user.lower()
        if self.is_superuser(user):
            return True
        if user not in self.users:
            return False
        sets = [self.grants.get(("user", user), {})]
        sets += [
            self.grants.get(("role", r), {})
            for r in self.users.get(user, ())
        ]
        scopes = ["*"] + ([table.lower()] if table else [])
        return any(
            priv in g.get(s, set()) for g in sets for s in scopes
        )

    # ------------------------------------------------------ row policies

    def add_policy(self, p: RowPolicy):
        self._grantee(p.to_kind, p.to_name)
        if any(
            q.name == p.name and q.table == p.table for q in self.policies
        ):
            raise ValueError(
                f"row policy {p.name!r} already exists on {p.table!r}"
            )
        if p.kind not in ("RESTRICTIVE", "PERMISSIVE"):
            raise ValueError(f"unknown policy kind {p.kind!r}")
        self.policies.append(p)

    def drop_policy(self, name: str, table: str):
        before = len(self.policies)
        self.policies = [
            p for p in self.policies
            if not (p.name == name and p.table == table)
        ]
        if len(self.policies) == before:
            raise ValueError(f"unknown row policy {name!r} on {table!r}")

    def policy_filter(self, user: str, table: str) -> str | None:
        """The combined row-policy predicate for (user, table), or None
        when unrestricted: AND of RESTRICTIVE, AND'ed with the OR of
        PERMISSIVE (upstream/PostgreSQL combination rule)."""
        user = user.lower()
        if self.is_superuser(user):
            return None
        granted_roles = self.users.get(user, set())
        mine = [
            p for p in self.policies
            if p.table == table.lower()
            and (
                (p.to_kind == "user" and p.to_name == user)
                or (p.to_kind == "role" and p.to_name in granted_roles)
            )
        ]
        if not mine:
            return None
        restrictive = [p.expr for p in mine if p.kind == "RESTRICTIVE"]
        permissive = [p.expr for p in mine if p.kind == "PERMISSIVE"]
        parts = [f"({e})" for e in restrictive]
        if permissive:
            parts.append("(" + " OR ".join(f"({e})" for e in permissive) + ")")
        return " AND ".join(parts)

    # ------------------------------------------------------- persistence

    def to_dict(self) -> dict:
        """JSON-serializable snapshot — the FE-metadata analog, saved
        by PaloSession under the warehouse root so a re-attached
        session keeps its users/grants/policies (security state must
        never silently evaporate on restart)."""
        return {
            "users": {u: sorted(r) for u, r in self.users.items()},
            "roles": sorted(self.roles),
            "grants": [
                [kind, name, scope, sorted(privs)]
                for (kind, name), by_scope in self.grants.items()
                for scope, privs in by_scope.items()
                if privs
            ],
            "policies": [
                [p.name, p.table, p.kind, p.to_kind, p.to_name, p.expr]
                for p in self.policies
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "AccessController":
        ac = cls()
        ac.users = {u: set(r) for u, r in d.get("users", {}).items()}
        ac.users.setdefault("root", set())
        ac.users.setdefault("admin", {"admin"})
        ac.roles = set(d.get("roles", [])) | {"admin", "operator"}
        for kind, name, scope, privs in d.get("grants", []):
            ac.grants.setdefault((kind, name), {}).setdefault(
                scope, set()
            ).update(privs)
        for name, table, kind, to_kind, to_name, expr in d.get(
            "policies", []
        ):
            ac.policies.append(
                RowPolicy(name, table, kind, to_kind, to_name, expr)
            )
        return ac

    # ----------------------------------------------------------- display

    def grants_rows(self, user: str) -> list[tuple[str, str, str]]:
        """SHOW GRANTS rows: (identity, scope, privs) for the user's
        direct grants plus one row per granted role."""
        user = user.lower()
        out = []
        direct = self.grants.get(("user", user), {})
        for scope in sorted(direct):
            if direct[scope]:
                out.append(
                    (f"'{user}'@'%'", scope, ", ".join(sorted(direct[scope])))
                )
        for r in sorted(self.users.get(user, ())):
            rg = self.grants.get(("role", r), {})
            for scope in sorted(rg):
                if rg[scope]:
                    out.append(
                        (f"role '{r}'", scope, ", ".join(sorted(rg[scope])))
                    )
        if not out:
            out.append((f"'{user}'@'%'", "*", ""))
        return out
