"""Role and permission statements — the DCL tier (grammar Parser.g:224-245,
statements 16-22 and 32-37: CREATE/ALTER/DROP/LIST ROLE, the legacy USER
aliases, GRANT/REVOKE ROLE, GRANT/REVOKE/LIST PERMISSIONS).

Registry-backed, no enforcement: reads stay unauthenticated analytics (the
engine is a query/write surface, not a multi-user server), but a real
schema dump containing CREATE ROLE / GRANT lines now replays end-to-end
and the LIST statements return the reference's 4.0 result shapes:

- LIST ROLES   -> (role text, super boolean, login boolean, options text,
                   datacenters text)        [ListRolesStatement.java:49-54;
  options is the custom-options map rendered as sorted JSON text — the
  engine's DataFrame surface keeps LIST outputs scalar]
- LIST USERS   -> (name, super, datacenters) [ListUsersStatement.java:42-45]
- LIST PERMISSIONS -> (role, username, resource, permission)
                   [ListPermissionsStatement.java:46-51; role==username,
                    resource in its display form e.g. '<table ks.t>']

Semantics mirrored from the reference:
- CREATE ROLE defaults LOGIN=false SUPERUSER=false; CREATE USER defaults
  LOGIN=true (Parser.g:1157,1214 @init blocks); duplicate CREATE errors
  '%s already exists' (CreateRoleStatement.java:72).
- ALTER/DROP/GRANT on a missing role errors "%s doesn't exist"
  (AlterRoleStatement.java:65, RoleManagementStatement.java:52).
- GRANT ROLE rejects membership cycles both directions with
  '%s is a member of %s' (CassandraRoleManager.java:207-214); REVOKE of a
  non-member errors '%s is not a member of %s' (:228).
- DROP ROLE removes the role from every member_of set and revokes both
  the permissions it held and permissions granted ON it
  (CassandraAuthorizer.revokeAllFrom/revokeAllOn).
- GRANT/REVOKE PERMISSIONS filters the requested set against the
  resource's applicable permissions and rejects when nothing survives
  (Parser.g:149 filterPermissions; DataResource.java:44-55,
  RoleResource.java:44-52).
- LIST PERMISSIONS OF g always walks the TRANSITIVE role closure
  (CassandraAuthorizer.list:259 getRoles(grantee, true)); NORECURSIVE
  gates only the RESOURCE parent-chain expansion
  (ListPermissionsStatement.java:93-97 Resources.chain).
- Rows sort like the reference: roles by name (ListRolesStatement
  sorted), permissions by (grantee, resource name, permission enum
  position) (PermissionDetails.compareTo:41-48).
- ACCESS TO DATACENTERS rejects like AllowAllNetworkAuthorizer
  (AllowAllNetworkAuthorizer.java:35); LIST ROLES shows
  datacenters='ALL' (DCPermissions.all().toString()).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cassandra_pmem_spark.cql.parser import _Parser
from cassandra_pmem_spark.cql.validator import InvalidRequest

# auth/Permission.java:32-65, declaration order (sort position in LIST)
PERMISSIONS = (
    "READ", "WRITE",  # deprecated but still declared
    "CREATE", "ALTER", "DROP", "SELECT", "MODIFY",
    "AUTHORIZE", "DESCRIBE", "EXECUTE",
)
# Permission.ALL = range(CREATE, EXECUTE) (Permission.java:66)
ALL_PERMISSIONS = PERMISSIONS[2:]
_PERM_POS = {p: i for i, p in enumerate(PERMISSIONS)}

# DataResource.java:44-55
_TABLE_PERMS = frozenset({"ALTER", "DROP", "SELECT", "MODIFY", "AUTHORIZE"})
_KEYSPACE_PERMS = _TABLE_PERMS | {"CREATE"}
# RoleResource.java:44-52
_ROLE_ROOT_PERMS = frozenset({"CREATE", "ALTER", "DROP", "AUTHORIZE", "DESCRIBE"})
_ROLE_PERMS = frozenset({"ALTER", "DROP", "AUTHORIZE"})
# FunctionResource.java COLLECTION/FUNCTION level
_FN_ROOT_PERMS = frozenset({"CREATE", "ALTER", "DROP", "AUTHORIZE", "EXECUTE"})
_FN_PERMS = frozenset({"ALTER", "DROP", "AUTHORIZE", "EXECUTE"})


@dataclass(frozen=True)
class Resource:
    """IResource analog: kind + path parts. name() is the storage form
    ('data/ks/t' — DataResource ROOT_NAME chains), display() the LIST
    output form ('<table ks.t>' — DataResource.toString:233)."""

    kind: str  # 'data' | 'role' | 'function'
    parts: tuple = ()

    def name(self) -> str:
        root = {"data": "data", "role": "roles", "function": "functions"}[self.kind]
        return "/".join((root,) + self.parts)

    def display(self) -> str:
        if self.kind == "data":
            if not self.parts:
                return "<all keyspaces>"
            if len(self.parts) == 1:
                return f"<keyspace {self.parts[0]}>"
            return f"<table {self.parts[0]}.{self.parts[1]}>"
        if self.kind == "role":
            return "<all roles>" if not self.parts else f"<role {self.parts[0]}>"
        if not self.parts:
            return "<all functions>"
        if len(self.parts) == 1:
            return f"<all functions in {self.parts[0]}>"
        return f"<function {self.parts[0]}.{self.parts[1]}>"

    def applicable(self) -> frozenset:
        if self.kind == "data":
            return frozenset(_KEYSPACE_PERMS if len(self.parts) < 2 else _TABLE_PERMS)
        if self.kind == "role":
            return _ROLE_ROOT_PERMS if not self.parts else _ROLE_PERMS
        return _FN_ROOT_PERMS if len(self.parts) < 2 else _FN_PERMS

    def parent(self) -> "Resource | None":
        """Resources.chain step: table -> keyspace -> root; role/function
        levels chain to their root the same way."""
        if not self.parts:
            return None
        return Resource(self.kind, self.parts[:-1])

    def chain(self) -> list["Resource"]:
        out, cur = [], self
        while cur is not None:
            out.append(cur)
            cur = cur.parent()
        return out


@dataclass
class RoleRecord:
    name: str
    can_login: bool = False
    is_superuser: bool = False
    password: str | None = None
    options: dict = field(default_factory=dict)  # custom OPTIONS map
    member_of: set = field(default_factory=set)  # roles granted TO this role


class _AuthParser(_Parser):
    """Token helpers for the DCL grammar (reuses the base CQL lexer)."""

    def role_name(self) -> str:
        # userOrRoleName: identifier or quoted string (Parser.g:1310)
        t = self.next()
        if t.kind == "string":
            return t.text[1:-1].replace("''", "'")
        if t.kind == "ident":
            return t.text
        raise InvalidRequest(f"expected a role name, got {t.text!r}")

    def string(self) -> str:
        t = self.next()
        if t.kind != "string":
            raise InvalidRequest(f"expected a string literal, got {t.text!r}")
        return t.text[1:-1].replace("''", "'")

    def boolean(self) -> bool:
        t = self.next()
        if t.kind == "ident" and t.text.lower() in ("true", "false"):
            return t.text.lower() == "true"
        raise InvalidRequest(f"expected true/false, got {t.text!r}")

    def end(self) -> None:
        """Every auth statement must consume its full input — otherwise a
        mistyped option list (`WITH LOGIN = true SUPERUSER = true`,
        missing AND) would silently drop the tail. A trailing ';' is
        accepted like the DDL parser's _end (schema dumps terminate every
        line with one)."""
        self.accept_punct(";")
        if self.peek().kind != "eof":
            raise InvalidRequest(f"trailing input near {self.peek().text!r}")


class AuthStore:
    """The role manager + authorizer + network authorizer registries
    (CassandraRoleManager / CassandraAuthorizer analogs), driven by
    statement text through execute(). LIST statements return a Spark
    DataFrame; everything else returns None."""

    def __init__(self):
        self.roles: dict[str, RoleRecord] = {}
        # (grantee, resource) -> set of permission names
        self.grants: dict[tuple[str, str], set] = {}
        self._resources: dict[str, Resource] = {}

    # -- role membership -------------------------------------------------

    def _require(self, name: str) -> RoleRecord:
        r = self.roles.get(name)
        if r is None:
            raise InvalidRequest(f"{name} doesn't exist")
        return r

    def closure(self, name: str) -> list[str]:
        """collectRoles(role, includeInherited=True): the role itself,
        then its member_of graph, each role once, DFS discovery order
        (CassandraRoleManager.java:395-399)."""
        seen: list[str] = []

        def walk(n: str) -> None:
            if n in seen:
                return
            seen.append(n)
            for m in sorted(self.roles[n].member_of):
                if m in self.roles:
                    walk(m)

        walk(name)
        return seen

    # -- statement surface -------------------------------------------------

    def execute(self, cql: str, spark, schema_registry=None, current_keyspace=None):
        """Apply one DCL statement, all-or-nothing: handlers PARSE AND
        VALIDATE without touching the registries, returning a deferred
        apply closure that runs only after the trailing-input check — a
        rejected statement therefore mutates nothing (no snapshot or
        deepcopy needed, and replaying a large dump stays linear)."""
        from cassandra_pmem_spark.cql.parser import _tokenize

        p = _AuthParser(_tokenize(cql))
        head = p.ident().lower()
        apply_fn = None
        if head == "create":
            kind = p.ident().lower()
            out, apply_fn = self._create(p, kind)
        elif head == "alter":
            kind = p.ident().lower()
            out, apply_fn = self._alter(p, kind)
        elif head == "drop":
            kind = p.ident().lower()
            out, apply_fn = self._drop(p)
        elif head == "grant":
            out, apply_fn = self._grant_or_revoke(
                p, grant=True, schema_registry=schema_registry,
                current_keyspace=current_keyspace,
            )
        elif head == "revoke":
            out, apply_fn = self._grant_or_revoke(
                p, grant=False, schema_registry=schema_registry,
                current_keyspace=current_keyspace,
            )
        elif head == "list":
            out = self._list(p, spark, schema_registry, current_keyspace)
        else:
            raise InvalidRequest(f"unsupported auth statement {head!r}")
        p.end()
        if apply_fn is not None:
            apply_fn()
        return out

    # -- CREATE/ALTER/DROP -------------------------------------------------

    def _role_options(self, p: _AuthParser, rec: RoleRecord) -> None:
        # roleOptions (Parser.g:1283-1293)
        while True:
            opt = p.ident().lower()
            if opt == "access":
                p.expect_kw("to")
                # AllowAllNetworkAuthorizer.setRoleDatacenters (.java:35)
                raise InvalidRequest(
                    "ACCESS TO DATACENTERS operations not supported by "
                    "AllowAllNetworkAuthorizer"
                )
            if opt == "password":
                self._expect_eq(p)
                rec.password = p.string()
            elif opt == "login":
                self._expect_eq(p)
                rec.can_login = p.boolean()
            elif opt == "superuser":
                self._expect_eq(p)
                rec.is_superuser = p.boolean()
            elif opt == "options":
                self._expect_eq(p)
                rec.options = self._map_literal(p)
            else:
                raise InvalidRequest(f"unknown role option {opt!r}")
            if not p.accept_kw("and"):
                break

    @staticmethod
    def _expect_eq(p: _AuthParser) -> None:
        t = p.next()
        if not (t.kind == "op" and t.text == "="):
            raise InvalidRequest(f"expected '=', got {t.text!r}")

    @staticmethod
    def _map_literal(p: _AuthParser) -> dict:
        p.expect_punct("{")
        out = {}
        if not p.accept_punct("}"):
            while True:
                k = p.string()
                p.expect_punct(":")
                out[k] = p.string()
                if not p.accept_punct(","):
                    break
            p.expect_punct("}")
        return out

    def _if_not_exists(self, p: _AuthParser) -> bool:
        if p.accept_kw("if"):
            p.expect_kw("not")
            p.expect_kw("exists")
            return True
        return False

    def _create(self, p: _AuthParser, kind: str):
        if_not_exists = self._if_not_exists(p)
        name = p.role_name()
        rec = RoleRecord(name, can_login=(kind == "user"))
        if kind == "user":
            # CREATE USER ... [WITH PASSWORD 's'] [SUPERUSER|NOSUPERUSER]
            if p.accept_kw("with"):
                if p.ident().lower() != "password":
                    raise InvalidRequest("CREATE USER supports WITH PASSWORD only")
                rec.password = p.string()
            if p.accept_kw("superuser"):
                rec.is_superuser = True
            elif p.accept_kw("nosuperuser"):
                rec.is_superuser = False
        else:
            if p.accept_kw("with"):
                self._role_options(p, rec)
        if name in self.roles:
            if if_not_exists:
                return None, None
            raise InvalidRequest(f"{name} already exists")

        def apply():
            self.roles[name] = rec

        return None, apply

    def _alter(self, p: _AuthParser, kind: str):
        name = p.role_name()
        cur = self._require(name)
        # parse onto a SCRATCH record (apply replaces the live one only
        # after the trailing-input check — a mistyped option list must
        # leave the role untouched)
        rec = RoleRecord(
            name, cur.can_login, cur.is_superuser, cur.password,
            dict(cur.options), set(cur.member_of),
        )
        if kind == "user":
            if p.accept_kw("with"):
                if p.ident().lower() != "password":
                    raise InvalidRequest("ALTER USER supports WITH PASSWORD only")
                rec.password = p.string()
            if p.accept_kw("superuser"):
                rec.is_superuser = True
            elif p.accept_kw("nosuperuser"):
                rec.is_superuser = False
        else:
            if p.accept_kw("with"):
                self._role_options(p, rec)

        def apply():
            self.roles[name] = rec

        return None, apply

    def _drop(self, p: _AuthParser):
        if_exists = False
        if p.accept_kw("if"):
            p.expect_kw("exists")
            if_exists = True
        name = p.role_name()
        if name not in self.roles:
            if if_exists:
                return None, None
            raise InvalidRequest(f"{name} doesn't exist")

        def apply():
            del self.roles[name]
            for r in self.roles.values():
                r.member_of.discard(name)
            # revokeAllFrom + revokeAllOn (CassandraAuthorizer)
            gone = Resource("role", (name,)).name()
            self.grants = {
                (g, res): perms
                for (g, res), perms in self.grants.items()
                if g != name and res != gone
            }

        return None, apply

    # -- GRANT/REVOKE -------------------------------------------------------

    def _grant_or_revoke(
        self, p: _AuthParser, grant: bool, schema_registry,
        current_keyspace=None,
    ):
        link = "to" if grant else "from"
        if p.accept_kw("role"):
            role = p.role_name()
            p.expect_kw(link)
            grantee = p.role_name()
            self._require(role)
            g = self._require(grantee)
            if grant:
                if role in self.closure(grantee):
                    raise InvalidRequest(f"{grantee} is a member of {role}")
                if grantee in self.closure(role):
                    raise InvalidRequest(f"{role} is a member of {grantee}")
                return None, lambda: g.member_of.add(role)
            if role not in g.member_of:
                raise InvalidRequest(f"{grantee} is not a member of {role}")
            return None, lambda: g.member_of.discard(role)
        perms = self._permission_set(p)
        p.expect_kw("on")
        res = self._resource(p, schema_registry, current_keyspace)
        p.expect_kw(link)
        grantee = p.role_name()
        self._require(grantee)
        filtered = set(perms) & res.applicable()
        if not filtered:
            # Parser.g:149 filterPermissions recognition error
            raise InvalidRequest(
                f"Resource type {res.kind} does not support any of the "
                "requested permissions"
            )

        def apply():
            key = (grantee, res.name())
            self._resources[res.name()] = res
            if grant:
                self.grants.setdefault(key, set()).update(filtered)
            else:
                have = self.grants.get(key, set())
                have -= filtered
                if not have:
                    self.grants.pop(key, None)

        return None, apply

    def _permission_set(self, p: _AuthParser) -> tuple:
        if p.accept_kw("all"):
            p.accept_kw("permissions")
            return ALL_PERMISSIONS
        t = p.ident().upper()
        if t not in PERMISSIONS:
            raise InvalidRequest(f"unknown permission {t}")
        p.accept_kw("permission")
        return (t,)

    def _resource(self, p: _AuthParser, schema_registry, current_keyspace=None) -> Resource:
        # dataResource | roleResource | functionResource (Parser.g:1111+)
        if p.accept_kw("all"):
            w = p.ident().lower()
            if w == "keyspaces":
                return Resource("data")
            if w == "roles":
                return Resource("role")
            if w == "functions":
                if p.accept_kw("in"):
                    p.expect_kw("keyspace")
                    return Resource("function", (p.role_name(),))
                return Resource("function")
            raise InvalidRequest(f"unknown resource ALL {w!r}")
        if p.accept_kw("keyspace"):
            ks = p.role_name()
            self._check_keyspace(ks, schema_registry)
            return Resource("data", (ks,))
        if p.accept_kw("role"):
            name = p.role_name()
            self._require(name)
            return Resource("role", (name,))
        if p.accept_kw("function"):
            ks, fn = self._qualified(p)
            # arg types are mandatory in the reference grammar; accepted
            # and folded into the display name here
            args = []
            p.expect_punct("(")
            if not p.accept_punct(")"):
                while True:
                    args.append(p.ident().lower())
                    if not p.accept_punct(","):
                        break
                p.expect_punct(")")
            return Resource("function", (ks, f"{fn}({', '.join(args)})"))
        p.accept_kw("table") or p.accept_kw("columnfamily")
        ks, tbl = self._qualified(p)
        tables = getattr(schema_registry, "tables", None)
        if hasattr(tables, "resolve"):
            # canonicalize through the SAME namespace resolution DML uses
            # (qualified exact, else current keyspace, else the unscoped
            # name) so `GRANT ... ON t` under USE ks and `... ON ks.t`
            # share ONE grant identity and the resource chain walks the
            # real keyspace
            key = tables.resolve(
                tbl, keyspace=ks, current=current_keyspace, missing_ok=True
            )
            if key is None:
                disp = f"{ks}.{tbl}" if ks else tbl
                raise InvalidRequest(f"<table {disp}> doesn't exist")
            rks, rname = key
            return Resource("data", (rks or "", rname))
        if tables is not None:
            # plain-mapping registries (the public AuthStore API with a
            # test double) keep the membership existence check
            key = (ks, tbl) if ks else None
            known = key in tables if key else any(t == tbl for (_k, t) in tables)
            if not known:
                disp = f"{ks}.{tbl}" if ks else tbl
                raise InvalidRequest(f"<table {disp}> doesn't exist")
        return Resource("data", ((ks or current_keyspace) or "", tbl))

    @staticmethod
    def _qualified(p: _AuthParser) -> tuple:
        a = p.role_name()
        if p.accept_punct("."):
            return a, p.role_name()
        return None, a

    @staticmethod
    def _check_keyspace(ks: str, schema_registry) -> None:
        if schema_registry is not None and ks not in getattr(
            schema_registry, "keyspaces", {ks}
        ):
            raise InvalidRequest(f"<keyspace {ks}> doesn't exist")

    # -- LIST ----------------------------------------------------------------

    def _list(self, p: _AuthParser, spark, schema_registry, current_keyspace=None):
        from pyspark.sql import types as T

        if p.accept_kw("roles"):
            grantee = None
            if p.accept_kw("of"):
                grantee = p.role_name()
                self._require(grantee)
            recursive = not p.accept_kw("norecursive")
            if grantee is None:
                names = sorted(self.roles)
            elif recursive:
                names = sorted(self.closure(grantee))
            else:
                g = self.roles[grantee]
                names = sorted({grantee} | (g.member_of & set(self.roles)))
            schema = T.StructType([
                T.StructField("role", T.StringType()),
                T.StructField("super", T.BooleanType()),
                T.StructField("login", T.BooleanType()),
                T.StructField("options", T.StringType()),
                T.StructField("datacenters", T.StringType()),
            ])
            rows = [
                (
                    n,
                    self.roles[n].is_superuser,
                    self.roles[n].can_login,
                    _json_text(self.roles[n].options),
                    "ALL",
                )
                for n in names
            ]
            return spark.createDataFrame(rows, schema)
        if p.accept_kw("users"):
            schema = T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("super", T.BooleanType()),
                T.StructField("datacenters", T.StringType()),
            ])
            rows = [
                (n, self.roles[n].is_superuser, "ALL")
                for n in sorted(self.roles)
                if self.roles[n].can_login
            ]
            return spark.createDataFrame(rows, schema)
        # LIST permissionOrAll [ON resource] [OF role] [NORECURSIVE]
        perms = self._permission_set(p)
        res = None
        if p.accept_kw("on"):
            res = self._resource(p, schema_registry, current_keyspace)
        grantee = None
        if p.accept_kw("of"):
            grantee = p.role_name()
            self._require(grantee)
        recursive = not p.accept_kw("norecursive")
        # role closure is ALWAYS transitive for a named grantee
        # (CassandraAuthorizer.list:259); NORECURSIVE gates the RESOURCE
        # parent chain only (ListPermissionsStatement.java:93-97)
        roles = set(self.closure(grantee)) if grantee else None
        res_names = None
        if res is not None:
            res_names = {r.name() for r in (res.chain() if recursive else [res])}
        details = []
        for (g, rname), have in self.grants.items():
            if roles is not None and g not in roles:
                continue
            if res_names is not None and rname not in res_names:
                continue
            disp = self._resources[rname].display()
            for perm in have & set(perms):
                details.append((g, g, disp, perm, rname))
        details.sort(key=lambda d: (d[0], d[4], _PERM_POS[d[3]]))
        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("role", T.StringType()),
            T.StructField("username", T.StringType()),
            T.StructField("resource", T.StringType()),
            T.StructField("permission", T.StringType()),
        ])
        return spark.createDataFrame([d[:4] for d in details], schema)


def _json_text(m: dict) -> str:
    """Custom-options map as byte-stable text (sorted keys) — the LIST
    ROLES `options` cell, scalar so the DataFrame surface stays sortable."""
    import json

    return json.dumps(dict(sorted(m.items())), separators=(", ", ": "))
