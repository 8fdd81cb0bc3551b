"""CQL trigger tier (triggers/ITrigger.java:41,49 — augment contract;
triggers/TriggerExecutor.java:113-202 — per-update firing, atomic apply,
counter rejection, CAS same-partition gate;
CreateTriggerStatement.java:49-80 / DropTriggerStatement.java:45-67;
examples/triggers AuditTrigger.java:34-53)."""

from __future__ import annotations

import pytest

from cassandra_pmem_spark.cql.triggers import (
    ITrigger,
    TriggerUpdate,
    register_trigger_class,
    unregister_trigger_class,
)
from cassandra_pmem_spark.cql.validator import InvalidRequest


@pytest.fixture()
def db(spark):
    from cassandra_pmem_spark.cql.ddl import CqlDatabase

    d = CqlDatabase(spark)
    d.execute("CREATE KEYSPACE test WITH REPLICATION = {'class': 'SimpleStrategy'}")
    d.execute("USE test")
    d.execute("CREATE TABLE src (k int, c int, v text, PRIMARY KEY (k, c))")
    d.execute(
        "CREATE TABLE audit (id timeuuid PRIMARY KEY, keyspace_name text, "
        "table_name text, primary_key text)"
    )
    return d


def rows(df, *cols):
    out = [tuple(getattr(r, c) for c in cols) for r in df.collect()]
    return sorted(out)


class TestTriggerDdl:
    def test_create_requires_existing_table(self, db):
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("CREATE TRIGGER t1 ON ghost USING 'AuditTrigger'")

    def test_create_rejects_view_target(self, db):
        db.execute(
            "CREATE MATERIALIZED VIEW mv1 AS SELECT k, c, v FROM src "
            "WHERE k IS NOT NULL AND c IS NOT NULL PRIMARY KEY (c, k)"
        )
        with pytest.raises(InvalidRequest, match="materialized view"):
            db.execute("CREATE TRIGGER t1 ON mv1 USING 'AuditTrigger'")

    def test_create_rejects_unloadable_class(self, db):
        # CreateTriggerStatement.java:71-78
        with pytest.raises(InvalidRequest, match="couldn't be loaded"):
            db.execute("CREATE TRIGGER t1 ON src USING 'NoSuchClass'")

    def test_duplicate_name_and_if_not_exists(self, db):
        db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        with pytest.raises(InvalidRequest, match="already exists"):
            db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        db.execute("CREATE TRIGGER IF NOT EXISTS t1 ON src USING 'AuditTrigger'")

    def test_drop_trigger(self, db):
        db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        db.execute("DROP TRIGGER t1 ON src")
        with pytest.raises(InvalidRequest, match="doesn't exist"):
            db.execute("DROP TRIGGER t1 ON src")
        db.execute("DROP TRIGGER IF EXISTS t1 ON src")

    def test_system_schema_triggers(self, db):
        db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        got = rows(
            db.execute("SELECT * FROM system_schema.triggers"),
            "keyspace_name", "table_name", "trigger_name", "options",
        )
        assert got == [("test", "src", "t1", '{"class": "AuditTrigger"}')]

    def test_drop_table_cascades_triggers(self, db):
        db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        db.execute("DROP MATERIALIZED VIEW IF EXISTS mv1")
        db.execute("DROP TABLE src")
        assert db.execute("SELECT * FROM system_schema.triggers").count() == 0


class TestAuditTrigger:
    """The reference's shipped example: one audit row per partition
    update with (keyspace_name, table_name, partition-key-as-string),
    keyed by a fresh timeuuid (AuditTrigger.java:44-52)."""

    def test_insert_fires_audit_row(self, db):
        db.execute("CREATE TRIGGER audit_src ON src USING 'AuditTrigger'")
        db.execute("INSERT INTO src (k, c, v) VALUES (1, 10, 'a')")
        got = rows(
            db.execute("SELECT keyspace_name, table_name, primary_key FROM audit"),
            "keyspace_name", "table_name", "primary_key",
        )
        assert got == [("test", "src", "1")]
        # the primary write landed too
        assert db.execute("SELECT v FROM src WHERE k = 1 AND c = 10").collect()[0].v == "a"

    def test_one_row_per_partition_update(self, db):
        db.execute("CREATE TRIGGER audit_src ON src USING 'AuditTrigger'")
        # two rows in ONE partition = one partition update = one audit row
        db.execute("BEGIN BATCH "
                   "INSERT INTO src (k, c, v) VALUES (7, 1, 'x'); "
                   "INSERT INTO src (k, c, v) VALUES (7, 2, 'y'); "
                   "APPLY BATCH")
        assert db.execute("SELECT * FROM audit").count() == 1
        # two partitions = two audit rows
        db.execute("BEGIN BATCH "
                   "INSERT INTO src (k, c, v) VALUES (8, 1, 'x'); "
                   "INSERT INTO src (k, c, v) VALUES (9, 1, 'y'); "
                   "APPLY BATCH")
        got = rows(db.execute("SELECT primary_key FROM audit"), "primary_key")
        assert got == [("7",), ("8",), ("9",)]

    def test_delete_fires_too(self, db):
        db.execute("CREATE TRIGGER audit_src ON src USING 'AuditTrigger'")
        db.execute("DELETE FROM src WHERE k = 42 AND c = 1")
        got = rows(db.execute("SELECT primary_key FROM audit"), "primary_key")
        assert got == [("42",)]

    def test_distinct_timeuuid_keys(self, db):
        db.execute("CREATE TRIGGER audit_src ON src USING 'AuditTrigger'")
        db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
        db.execute("INSERT INTO src (k, c, v) VALUES (1, 2, 'b')")
        ids = [r.id for r in db.execute("SELECT id FROM audit").collect()]
        assert len(ids) == 2 and len(set(ids)) == 2

    def test_generated_mutations_do_not_refire(self, db):
        # a trigger on the AUDIT table must not fire for trigger-generated
        # writes (StorageProxy applies augmented mutations directly)
        db.execute("CREATE TABLE audit2 (id timeuuid PRIMARY KEY, "
                   "keyspace_name text, table_name text, primary_key text)")

        class Audit2(ITrigger):
            audit_keyspace = "test"
            audit_table = "audit2"

            def augment(self, update):
                from cassandra_pmem_spark.cql.triggers import AuditTrigger

                t = AuditTrigger()
                t.audit_keyspace, t.audit_table = "test", "audit2"
                return t.augment(update)

        register_trigger_class("Audit2", Audit2)
        try:
            db.execute("CREATE TRIGGER a ON src USING 'AuditTrigger'")
            db.execute("CREATE TRIGGER b ON audit USING 'Audit2'")
            db.execute("INSERT INTO src (k, c, v) VALUES (5, 5, 'z')")
            # src write fired AuditTrigger → one audit row; that generated
            # write must NOT fire audit's trigger into audit2
            assert db.execute("SELECT * FROM audit").count() == 1
            assert db.execute("SELECT * FROM audit2").count() == 0
            # but a DIRECT write to audit does fire it
            db.execute("INSERT INTO audit (id, keyspace_name, table_name, "
                       "primary_key) VALUES (now(), 'x', 'y', 'z')")
            assert db.execute("SELECT * FROM audit2").count() == 1
        finally:
            unregister_trigger_class("Audit2")


class TestTriggerGates:
    def test_counter_mutations_reject_with_trigger_mutations(self, db):
        db.execute("CREATE TABLE cnt (k int PRIMARY KEY, n counter)")
        db.execute("CREATE TRIGGER t ON cnt USING 'AuditTrigger'")
        with pytest.raises(InvalidRequest, match="Counter mutations and trigger"):
            db.execute("UPDATE cnt SET n = n + 1 WHERE k = 1")
        # the ENTIRE write rolled back: no counter state, no audit row
        assert db.execute("SELECT * FROM cnt").count() == 0
        assert db.execute("SELECT * FROM audit").count() == 0

    def test_cas_path_rejects_cross_partition_augment(self, db):
        # AuditTrigger writes to a DIFFERENT table — legal for plain
        # writes, rejected on the CAS path
        # (TriggerExecutor.validateForSinglePartition:194-202)
        db.execute("CREATE TRIGGER t ON src USING 'AuditTrigger'")
        db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
        with pytest.raises(InvalidRequest, match="does not match primary update"):
            db.execute("UPDATE src SET v = 'b' WHERE k = 1 AND c = 1 IF v = 'a'")
        # rollback: the conditional update did NOT land
        assert db.execute(
            "SELECT v FROM src WHERE k = 1 AND c = 1"
        ).collect()[0].v == "a"

    def test_failed_condition_fires_nothing(self, db):
        db.execute("CREATE TRIGGER t ON src USING 'AuditTrigger'")
        applied = db.execute(
            "UPDATE src SET v = 'b' WHERE k = 1 AND c = 1 IF v = 'nope'"
        )
        assert applied is False
        assert db.execute("SELECT * FROM audit").count() == 0

    def test_trigger_error_rolls_back_primary(self, db):
        class Boom(ITrigger):
            def augment(self, update):
                raise RuntimeError("boom")

        register_trigger_class("Boom", Boom)
        try:
            db.execute("CREATE TRIGGER t ON src USING 'Boom'")
            with pytest.raises(RuntimeError, match="boom"):
                db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
            assert db.execute("SELECT * FROM src").count() == 0
        finally:
            unregister_trigger_class("Boom")

    def test_bad_generated_statement_rolls_back_everything(self, db):
        class BadStmt(ITrigger):
            def augment(self, update):
                return [("INSERT INTO audit (keyspace_name) VALUES ('x')", [])]

        register_trigger_class("BadStmt", BadStmt)
        try:
            db.execute("CREATE TRIGGER t ON src USING 'BadStmt'")
            with pytest.raises(InvalidRequest):
                db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
            assert db.execute("SELECT * FROM src").count() == 0
            assert db.execute("SELECT * FROM audit").count() == 0
        finally:
            unregister_trigger_class("BadStmt")

    def test_update_shape_exposed_to_trigger(self, db):
        seen: list[TriggerUpdate] = []

        class Probe(ITrigger):
            def augment(self, update):
                seen.append(update)
                return []

        register_trigger_class("Probe", Probe)
        try:
            db.execute("CREATE TRIGGER t ON src USING 'Probe'")
            db.execute("INSERT INTO src (k, c, v) VALUES (3, 4, 'w')")
            [u] = seen
            assert (u.keyspace, u.table, u.kind) == ("test", "src", "write")
            assert u.partition_key == {"k": 3}
            assert u.rows == ({"c": 4, "v": "w"},)
        finally:
            unregister_trigger_class("Probe")


class TestCasSamePartition:
    def test_same_partition_augment_allowed_on_cas(self, db):
        # a trigger whose generated mutation targets the SAME table and
        # partition passes validateForSinglePartition — the CAS write
        # and its augmentation land atomically
        class Mirror(ITrigger):
            def augment(self, update):
                k = update.partition_key["k"]
                return [(
                    "UPDATE test.src SET v = ? WHERE k = ? AND c = 999",
                    [f"mirror-{k}", k],
                )]

        register_trigger_class("Mirror", Mirror)
        try:
            db.execute("CREATE TRIGGER m ON src USING 'Mirror'")
            db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
            applied = db.execute(
                "UPDATE src SET v = 'b' WHERE k = 1 AND c = 1 IF v = 'a'"
            )
            assert applied is True
            got = {
                (r.k, r.c): r.v
                for r in db.execute("SELECT k, c, v FROM src").collect()
            }
            # the CAS update, its own mirror row, and the first insert's
            # mirror row are all present
            assert got[(1, 1)] == "b" and got[(1, 999)] == "mirror-1"
        finally:
            unregister_trigger_class("Mirror")


class TestDescribeTriggers:
    def test_describe_emits_pasteable_create_trigger(self, db, spark):
        db.execute("CREATE TRIGGER audit_src ON src USING 'AuditTrigger'")
        rows = {
            (r.type, r.name): r.create_statement
            for r in db.execute("DESCRIBE TABLE src").collect()
        }
        stmt = rows[("trigger", "audit_src")]
        assert stmt == "CREATE TRIGGER audit_src ON test.src USING 'AuditTrigger';"
        # pasteable: replaying into a fresh database registers the trigger
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db2 = CqlDatabase(spark)
        db2.execute("CREATE KEYSPACE test2 WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db2.execute("USE test2")
        db2.execute("CREATE TABLE src (k int, c int, v text, PRIMARY KEY (k, c))")
        db2.execute(stmt.replace("test.src", "test2.src"))
        got = db2.execute("SELECT trigger_name FROM system_schema.triggers").collect()
        assert [r.trigger_name for r in got] == ["audit_src"]


class TestSecondReviewRegressions:
    def test_drop_last_trigger_reengages_fast_path(self, db):
        db.execute("CREATE TRIGGER t1 ON src USING 'AuditTrigger'")
        db.execute("DROP TRIGGER t1 ON src")
        # the registry entry is gone entirely, not an empty dict — the
        # coordinator's `if not registry.triggers` fast path re-engages
        assert db.registry.triggers == {}
        db.execute("INSERT INTO src (k, c, v) VALUES (1, 1, 'a')")
        assert db.execute("SELECT * FROM audit").count() == 0

    def test_failing_trigger_rewinds_clock_on_fresh_database(self, db, spark):
        # the failing statement CREATES the only session it touches: the
        # shared clock and now()-mints must still rewind ("a rejected
        # statement leaves no trace")
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        class Boom(ITrigger):
            def augment(self, update):
                raise RuntimeError("boom")

        register_trigger_class("Boom2", Boom)
        try:
            d = CqlDatabase(spark)
            d.execute("CREATE KEYSPACE fz WITH REPLICATION = {'class': 'SimpleStrategy'}")
            d.execute("USE fz")
            d.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid, v int)")
            d.execute("CREATE TRIGGER b ON t USING 'Boom2'")
            clock0 = d._write_clock[0]
            with pytest.raises(RuntimeError):
                d.execute("INSERT INTO t (k, id, v) VALUES (1, now(), 1)")
            assert d._write_clock[0] == clock0
            # a replay WITHOUT the rejected statement mints the same uuid
            d.execute("DROP TRIGGER b ON t")
            d.execute("INSERT INTO t (k, id, v) VALUES (2, now(), 2)")
            d2 = CqlDatabase(spark)
            d2.execute("CREATE KEYSPACE fz2 WITH REPLICATION = {'class': 'SimpleStrategy'}")
            d2.execute("USE fz2")
            d2.execute("CREATE TABLE t (k int PRIMARY KEY, id timeuuid, v int)")
            d2.execute("INSERT INTO t (k, id, v) VALUES (2, now(), 2)")
            a = d.execute("SELECT id FROM t WHERE k = 2").collect()[0].id
            b = d2.execute("SELECT id FROM t WHERE k = 2").collect()[0].id
            assert a == b
        finally:
            unregister_trigger_class("Boom2")
