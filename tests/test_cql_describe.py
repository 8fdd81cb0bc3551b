"""DESCRIBE — pasteable DDL reconstruction (bin/cqlsh.py:1311-1315: the
output "should be pasteable back into a CQL session to recreate the
given object"). The round-trip test IS that contract: describe → execute
every emitted statement in a FRESH database → describe again → identical
rows."""

from __future__ import annotations

import pytest

from cassandra_pmem_spark.cql.validator import InvalidRequest


@pytest.fixture()
def db(spark):
    from cassandra_pmem_spark.cql.ddl import CqlDatabase

    db = CqlDatabase(spark)
    db.execute(
        "CREATE KEYSPACE dsc WITH REPLICATION = "
        "{'class': 'SimpleStrategy', 'replication_factor': '1'}"
    )
    db.execute("USE dsc")
    db.execute("CREATE TYPE addr (street text, zip int)")
    db.execute(
        "CREATE TABLE users (org int, id int, name text, a frozen<addr>, "
        "tags set<text>, note text STATIC, PRIMARY KEY (org, id)) "
        "WITH CLUSTERING ORDER BY (id DESC)"
    )
    db.execute("CREATE INDEX users_name_idx ON users (name)")
    db.execute(
        "CREATE MATERIALIZED VIEW by_name AS SELECT org, id, name FROM users "
        "WHERE org IS NOT NULL AND id IS NOT NULL AND name IS NOT NULL "
        "PRIMARY KEY (name, org, id)"
    )
    db.execute(
        "CREATE FUNCTION plus1 (x int) RETURNS NULL ON NULL INPUT "
        "RETURNS int LANGUAGE sql AS 'x + 1'"
    )
    db.execute(
        "CREATE FUNCTION acc2 (s int, v int) CALLED ON NULL INPUT "
        "RETURNS int LANGUAGE sql AS 'coalesce(s, 0) + coalesce(v, 0)'"
    )
    db.execute(
        "CREATE AGGREGATE mysum (int) SFUNC acc2 STYPE int INITCOND 0"
    )
    return db


def _rows(df):
    return [(r.keyspace_name, r.type, r.name, r.create_statement) for r in df.collect()]


class TestDescribeRoundTrip:
    def test_keyspace_output_is_pasteable(self, spark, db):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        first = _rows(db.execute("DESCRIBE KEYSPACE dsc"))
        assert [t for _, t, _, _ in first] == [
            "keyspace", "type", "function", "function", "aggregate",
            "table", "index", "materialized_view",
        ]
        fresh = CqlDatabase(spark)
        for _, _, _, stmt in first:
            fresh.execute(stmt)
        fresh.current_keyspace = "dsc"
        second = _rows(fresh.execute("DESCRIBE KEYSPACE dsc"))
        assert first == second

    def test_schema_covers_all_keyspaces(self, spark, db):
        db.execute("CREATE KEYSPACE other WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("CREATE TABLE other.t2 (k int PRIMARY KEY, v text)")
        rows = _rows(db.execute("DESCRIBE SCHEMA"))
        keyspaces = {ks for ks, _, _, _ in rows}
        assert keyspaces == {"dsc", "other"}

    def test_describe_table_includes_indexes(self, db):
        rows = _rows(db.execute("DESCRIBE TABLE users"))
        assert [t for _, t, _, _ in rows] == ["table", "index"]
        stmt = rows[0][3]
        assert "note text STATIC" in stmt
        assert "PRIMARY KEY (org, id)" in stmt
        assert "WITH CLUSTERING ORDER BY (id DESC)" in stmt
        assert "a frozen<addr>" in stmt
        assert "tags set<text>" in stmt

    def test_describe_type(self, db):
        rows = _rows(db.execute("DESCRIBE TYPE addr"))
        assert rows[0][1] == "type"
        assert "street text" in rows[0][3] and "zip int" in rows[0][3]

    def test_describe_function_body_quoting(self, spark, db):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db.execute(
            "CREATE FUNCTION q (s text) CALLED ON NULL INPUT RETURNS text "
            "LANGUAGE sql AS 'concat(s, ''x'')'"
        )
        stmt = _rows(db.execute("DESCRIBE FUNCTION q"))[0][3]
        fresh = CqlDatabase(spark)
        fresh.execute("CREATE KEYSPACE dsc WITH REPLICATION = {'class': 'SimpleStrategy'}")
        fresh.execute("USE dsc")
        fresh.execute(stmt)
        assert fresh.registry.functions[("dsc", "q")].body == "concat(s, 'x')"

    def test_describe_keyspaces_lists_create_statements(self, db):
        rows = _rows(db.execute("DESCRIBE KEYSPACES"))
        assert rows[0][1] == "keyspace"
        assert rows[0][3].startswith("CREATE KEYSPACE dsc WITH replication")

    def test_unknown_object_rejected(self, db):
        with pytest.raises(InvalidRequest, match="not found"):
            db.execute("DESCRIBE TABLE nope")
        with pytest.raises(InvalidRequest, match="DESCRIBE"):
            db.execute("DESCRIBE banana stand thing")

    def test_view_statement_reparses(self, spark, db):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        rows = _rows(db.execute("DESCRIBE MATERIALIZED VIEW by_name"))
        assert rows[0][1] == "materialized_view"
        fresh = CqlDatabase(spark)
        for _, _, _, stmt in _rows(db.execute("DESCRIBE KEYSPACE dsc")):
            fresh.execute(stmt)
        vm = fresh.registry.views[("dsc", "by_name")]
        assert vm.base_key == ("dsc", "users")
        assert set(vm.isnotnull) == {"org", "id", "name"}


class TestDescribeFixes:
    """Second-review hardening: declared type-field text, qualified
    DESCRIBE TYPE, bare-keyspace coexistence, aggregate recreate without
    a USE, keyspace type cascade."""

    def test_type_with_set_field_round_trips(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tf WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tf")
        db.execute("CREATE TYPE bag (items set<text>, names list<ascii>)")
        stmt = _rows(db.execute("DESCRIBE TYPE bag"))[0][3]
        assert "items set<text>" in stmt and "names list<ascii>" in stmt
        fresh = CqlDatabase(spark)
        fresh.execute("CREATE KEYSPACE tf WITH REPLICATION = {'class': 'SimpleStrategy'}")
        fresh.execute(stmt)
        assert _rows(fresh.execute("DESCRIBE TYPE bag"))[0][3] == stmt

    def test_alter_type_keeps_declared_text(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tf WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tf")
        db.execute("CREATE TYPE bag (items set<text>)")
        db.execute("ALTER TYPE bag ADD extras set<int>")
        db.execute("ALTER TYPE bag RENAME items TO stuff")
        stmt = _rows(db.execute("DESCRIBE TYPE bag"))[0][3]
        assert "stuff set<text>" in stmt and "extras set<int>" in stmt

    def test_describe_type_accepts_qualified_name(self, db):
        rows = _rows(db.execute("DESCRIBE TYPE dsc.addr"))
        assert rows[0][2] == "addr"
        with pytest.raises(InvalidRequest, match="not found"):
            db.execute("DESCRIBE TYPE wrongks.addr")

    def test_bare_keyspace_objects_coexist(self, spark, db):
        """A session can hold keyspace-less tables next to keyspaced ones;
        DESCRIBE must not crash sorting (None, name) against (ks, name)."""
        from cassandra_pmem_spark.cql.writes import CqlWriteSession  # noqa: F401

        bare = type(db)(spark)
        bare.execute("CREATE TABLE solo (k int PRIMARY KEY, v text)")
        rows = _rows(bare.execute("DESCRIBE TABLES"))
        assert [(r[0], r[2]) for r in rows] == [("", "solo")]
        assert "CREATE TABLE solo (" in rows[0][3]

    def test_aggregate_recreate_without_use(self, spark, db):
        """The emitted CREATE AGGREGATE must replay in a fresh database
        with NO current keyspace: SFUNC resolves in the aggregate's own
        keyspace, not the caller's."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        stmts = [r[3] for r in _rows(db.execute("DESCRIBE KEYSPACE dsc"))]
        fresh = CqlDatabase(spark)
        for stmt in stmts:  # no USE issued anywhere
            fresh.execute(stmt)
        assert ("dsc", "mysum") in fresh.registry.aggregates

    def test_drop_keyspace_cascades_types(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tk WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tk")
        db.execute("CREATE TYPE gone (x int)")
        db.execute("DROP KEYSPACE tk")
        assert "gone" not in db.registry.types
        assert "gone" not in db.registry.type_field_text
