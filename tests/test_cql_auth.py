"""Role/permission statement tier (Parser.g:224-245 st16-22, st32-37):
CREATE/ALTER/DROP/LIST ROLE + USER aliases, GRANT/REVOKE ROLE,
GRANT/REVOKE/LIST PERMISSIONS — registry-backed, no enforcement
(cql/auth.py documents the reference citations per rule)."""

from __future__ import annotations

import pytest

from cassandra_pmem_spark.cql.validator import InvalidRequest


@pytest.fixture()
def db(spark):
    from cassandra_pmem_spark.cql.ddl import CqlDatabase

    d = CqlDatabase(spark)
    d.execute("CREATE KEYSPACE authks WITH REPLICATION = {'class': 'SimpleStrategy'}")
    d.execute("USE authks")
    d.execute("CREATE TABLE t1 (k int PRIMARY KEY, v int)")
    return d


class TestRoleLifecycle:
    def test_create_role_defaults(self, db, spark):
        db.execute("CREATE ROLE carlos")
        [r] = db.execute("LIST ROLES OF carlos").collect()
        # CREATE ROLE defaults LOGIN=false SUPERUSER=false (Parser.g:1214)
        assert (r.role, r.super, r.login, r.options, r.datacenters) == (
            "carlos", False, False, "{}", "ALL",
        )

    def test_create_user_defaults_login_true(self, db):
        db.execute("CREATE USER alice WITH PASSWORD 'pw' SUPERUSER")
        [r] = db.execute("LIST ROLES OF alice").collect()
        assert (r.super, r.login) == (True, True)
        names = [x.name for x in db.execute("LIST USERS").collect()]
        assert names == ["alice"]

    def test_role_options(self, db):
        db.execute(
            "CREATE ROLE app WITH PASSWORD = 's3' AND LOGIN = true AND "
            "SUPERUSER = false AND OPTIONS = {'ticket': 'X-42', 'env': 'prod'}"
        )
        [r] = db.execute("LIST ROLES OF app").collect()
        assert r.login is True
        assert r.options == '{"env": "prod", "ticket": "X-42"}'

    def test_duplicate_create_errors_if_not_exists_tolerates(self, db):
        db.execute("CREATE ROLE dup")
        with pytest.raises(InvalidRequest, match="already exists"):
            db.execute("CREATE ROLE dup")
        db.execute("CREATE ROLE IF NOT EXISTS dup")
        db.execute("CREATE USER IF NOT EXISTS dup")

    def test_alter_and_drop_missing_error(self, db):
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("ALTER ROLE ghost WITH LOGIN = true")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("DROP ROLE ghost")
        db.execute("DROP ROLE IF EXISTS ghost")

    def test_alter_flips_options(self, db):
        db.execute("CREATE ROLE ops")
        db.execute("ALTER ROLE ops WITH LOGIN = true AND SUPERUSER = true")
        [r] = db.execute("LIST ROLES OF ops").collect()
        assert (r.super, r.login) == (True, True)
        db.execute("ALTER USER ops NOSUPERUSER")
        [r] = db.execute("LIST ROLES OF ops").collect()
        assert r.super is False

    def test_access_to_datacenters_rejects(self, db):
        # AllowAllNetworkAuthorizer.setRoleDatacenters (.java:35)
        with pytest.raises(InvalidRequest, match="AllowAllNetworkAuthorizer"):
            db.execute("CREATE ROLE dc WITH ACCESS TO ALL DATACENTERS")


class TestRoleMembership:
    def test_grant_revoke_and_closure(self, db):
        for n in ("reader", "writer", "admin", "bob"):
            db.execute(f"CREATE ROLE {n}")
        db.execute("GRANT ROLE reader TO writer")
        db.execute("GRANT ROLE writer TO admin")
        db.execute("GRANT ROLE admin TO bob")
        # LIST ROLES OF g includes g itself plus the transitive closure
        # (CassandraRoleManager.collectRoles:395-399)
        roles = [r.role for r in db.execute("LIST ROLES OF bob").collect()]
        assert roles == ["admin", "bob", "reader", "writer"]
        roles = [r.role for r in db.execute("LIST ROLES OF bob NORECURSIVE").collect()]
        assert roles == ["admin", "bob"]
        db.execute("REVOKE ROLE admin FROM bob")
        roles = [r.role for r in db.execute("LIST ROLES OF bob").collect()]
        assert roles == ["bob"]

    def test_cycle_and_nonmember_errors(self, db):
        db.execute("CREATE ROLE a")
        db.execute("CREATE ROLE b")
        db.execute("GRANT ROLE a TO b")
        with pytest.raises(InvalidRequest, match="is a member of"):
            db.execute("GRANT ROLE b TO a")  # would cycle
        with pytest.raises(InvalidRequest, match="is a member of"):
            db.execute("GRANT ROLE a TO b")  # already granted
        with pytest.raises(InvalidRequest, match="is not a member of"):
            db.execute("REVOKE ROLE b FROM a")

    def test_grant_missing_roles_error(self, db):
        db.execute("CREATE ROLE solo")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("GRANT ROLE ghost TO solo")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("GRANT ROLE solo TO ghost")


class TestPermissions:
    def test_grant_list_revoke_on_table(self, db):
        db.execute("CREATE ROLE reader")
        db.execute("GRANT SELECT ON TABLE authks.t1 TO reader")
        db.execute("GRANT MODIFY ON authks.t1 TO reader")
        rows = db.execute("LIST ALL PERMISSIONS OF reader").collect()
        assert [(r.role, r.username, r.resource, r.permission) for r in rows] == [
            ("reader", "reader", "<table authks.t1>", "SELECT"),
            ("reader", "reader", "<table authks.t1>", "MODIFY"),
        ]
        db.execute("REVOKE MODIFY ON authks.t1 FROM reader")
        rows = db.execute("LIST ALL PERMISSIONS OF reader").collect()
        assert [r.permission for r in rows] == ["SELECT"]

    def test_permission_resource_filtering(self, db):
        db.execute("CREATE ROLE r1")
        # CREATE is keyspace-level, not table-level (DataResource.java:44)
        with pytest.raises(InvalidRequest, match="does not support"):
            db.execute("GRANT CREATE ON TABLE authks.t1 TO r1")
        db.execute("GRANT CREATE ON KEYSPACE authks TO r1")
        db.execute("GRANT ALL PERMISSIONS ON ALL KEYSPACES TO r1")
        rows = db.execute("LIST ALL PERMISSIONS OF r1 NORECURSIVE").collect()
        perms = {(r.resource, r.permission) for r in rows}
        assert ("<keyspace authks>", "CREATE") in perms
        # ALL filtered to the keyspace-level set (no DESCRIBE/EXECUTE)
        assert ("<all keyspaces>", "SELECT") in perms
        assert ("<all keyspaces>", "DESCRIBE") not in perms

    def test_missing_resource_errors(self, db):
        db.execute("CREATE ROLE r2")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("GRANT SELECT ON TABLE authks.nope TO r2")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("GRANT SELECT ON KEYSPACE nowhere TO r2")

    def test_list_respects_resource_chain_and_closure(self, db):
        db.execute("CREATE ROLE base")
        db.execute("CREATE ROLE top")
        db.execute("GRANT ROLE base TO top")
        db.execute("GRANT SELECT ON KEYSPACE authks TO base")
        db.execute("GRANT MODIFY ON TABLE authks.t1 TO top")
        # recursive resource listing walks table -> keyspace -> root
        # (ListPermissionsStatement.java:93-97 Resources.chain), and a
        # named grantee ALWAYS includes granted roles' permissions
        # (CassandraAuthorizer.list:259)
        rows = db.execute("LIST ALL PERMISSIONS ON authks.t1 OF top").collect()
        assert [(r.role, r.resource, r.permission) for r in rows] == [
            ("base", "<keyspace authks>", "SELECT"),
            ("top", "<table authks.t1>", "MODIFY"),
        ]
        rows = db.execute(
            "LIST ALL PERMISSIONS ON authks.t1 OF top NORECURSIVE"
        ).collect()
        assert [(r.role, r.permission) for r in rows] == [("top", "MODIFY")]
        # permission filter
        rows = db.execute("LIST SELECT ON KEYSPACE authks OF top").collect()
        assert [(r.role, r.permission) for r in rows] == [("base", "SELECT")]

    def test_role_resources(self, db):
        db.execute("CREATE ROLE mgr")
        db.execute("CREATE ROLE minion")
        db.execute("GRANT AUTHORIZE ON ROLE minion TO mgr")
        db.execute("GRANT DESCRIBE ON ALL ROLES TO mgr")
        rows = db.execute("LIST ALL PERMISSIONS OF mgr").collect()
        assert {(r.resource, r.permission) for r in rows} == {
            ("<role minion>", "AUTHORIZE"),
            ("<all roles>", "DESCRIBE"),
        }
        # DESCRIBE is root-level only (RoleResource.java:50-52)
        with pytest.raises(InvalidRequest, match="does not support"):
            db.execute("GRANT DESCRIBE ON ROLE minion TO mgr")

    def test_drop_role_cascades(self, db):
        db.execute("CREATE ROLE leaver")
        db.execute("CREATE ROLE stayer")
        db.execute("GRANT ROLE leaver TO stayer")
        db.execute("GRANT SELECT ON KEYSPACE authks TO leaver")
        db.execute("GRANT ALTER ON ROLE leaver TO stayer")
        db.execute("DROP ROLE leaver")
        # membership gone, its grants gone, grants ON it gone
        roles = [r.role for r in db.execute("LIST ROLES OF stayer").collect()]
        assert roles == ["stayer"]
        assert db.execute("LIST ALL PERMISSIONS OF stayer").collect() == []
        # (CassandraAuthorizer.revokeAllFrom/revokeAllOn)
        assert db.execute("LIST ALL PERMISSIONS").collect() == []


class TestDumpReplay:
    def test_schema_dump_with_roles_replays(self, db):
        """A cqlsh-style dump mixing DDL, DML, and the DCL tier replays
        end-to-end through one CqlDatabase — the round-9 gap (the CLI
        errored on CREATE ROLE/GRANT lines) is closed."""
        dump = """
        CREATE ROLE IF NOT EXISTS svc WITH LOGIN = true AND PASSWORD = 'x';
        CREATE TABLE t2 (k int PRIMARY KEY, v text);
        GRANT SELECT ON TABLE authks.t2 TO svc;
        GRANT MODIFY ON KEYSPACE authks TO svc;
        INSERT INTO t2 (k, v) VALUES (1, 'hello');
        LIST ROLES;
        """
        out = None
        for stmt in dump.split(";"):
            if stmt.strip():
                out = db.execute(stmt.strip())
        assert [r.role for r in out.collect()] == ["svc"]
        rows = db.execute("LIST ALL PERMISSIONS OF svc").collect()
        assert [(r.resource, r.permission) for r in rows] == [
            ("<keyspace authks>", "MODIFY"),
            ("<table authks.t2>", "SELECT"),
        ]
        assert db.execute("SELECT v FROM t2").collect()[0].v == "hello"


class TestStatementHygiene:
    def test_trailing_input_rejects(self, db):
        """Every auth statement verifies end-of-input: a mistyped option
        list (missing AND) must error, not silently drop the tail."""
        with pytest.raises(InvalidRequest, match="trailing input"):
            db.execute("CREATE ROLE trail WITH LOGIN = true SUPERUSER = true")
        assert db.execute("LIST ROLES").collect() == []
        db.execute("CREATE ROLE ok WITH LOGIN = true AND SUPERUSER = true")
        [r] = db.execute("LIST ROLES").collect()
        assert (r.login, r.super) == (True, True)
        db.execute("CREATE ROLE rr")
        with pytest.raises(InvalidRequest, match="trailing input"):
            db.execute("GRANT SELECT ON TABLE authks.t1 TO rr anything garbage")
        assert db.execute("LIST ALL PERMISSIONS OF rr").collect() == []

    def test_unqualified_table_resolves_current_keyspace(self, db):
        """GRANT ... ON t under USE ks and ... ON ks.t share ONE grant
        identity (the reference qualifies through ClientState); the
        resource chain walks the real keyspace."""
        db.execute("CREATE ROLE reader")
        db.execute("GRANT SELECT ON t1 TO reader")  # unqualified, USE authks
        rows = db.execute("LIST ALL PERMISSIONS OF reader").collect()
        assert [(r.resource, r.permission) for r in rows] == [
            ("<table authks.t1>", "SELECT")
        ]
        # the qualified spelling addresses the SAME grant
        db.execute("REVOKE SELECT ON TABLE authks.t1 FROM reader")
        assert db.execute("LIST ALL PERMISSIONS OF reader").collect() == []
        # and the keyspace parent-chain sees keyspace-level grants when
        # listing ON the unqualified table recursively
        db.execute("GRANT MODIFY ON KEYSPACE authks TO reader")
        rows = db.execute("LIST ALL PERMISSIONS ON t1 OF reader").collect()
        assert [(r.resource, r.permission) for r in rows] == [
            ("<keyspace authks>", "MODIFY")
        ]

    def test_unknown_unqualified_table_errors(self, db):
        db.execute("CREATE ROLE r2")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("GRANT SELECT ON TABLE nope TO r2")
