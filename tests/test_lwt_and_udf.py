"""LWT conditional writes (InsertUpdateIfConditionTest.java style) and
CREATE FUNCTION null-handling semantics (UFTest.java style)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_pmem_spark.catalog import TableMeta
from cassandra_pmem_spark.cql.writes import CqlWriteSession
from cassandra_pmem_spark.functions.udf import create_function, create_pandas_function

META = TableMeta(
    "kv",
    T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    ),
    partition_key=("k",),
)


@pytest.fixture()
def sess(spark):
    return CqlWriteSession(spark, META)


def rows(df, *cols):
    return sorted(tuple(r) for r in (df.select(*cols) if cols else df).collect())


class TestLwt:
    def test_insert_if_not_exists(self, sess):
        assert sess.execute("INSERT INTO kv (k, v) VALUES (1, 'first') IF NOT EXISTS")
        # second insert on the same key is NOT applied
        assert not sess.execute("INSERT INTO kv (k, v) VALUES (1, 'second') IF NOT EXISTS")
        assert rows(sess.table(), "k", "v") == [(1, "first")]

    def test_update_if_exists(self, sess):
        assert not sess.execute("UPDATE kv SET v = 'x' WHERE k = 9 IF EXISTS")
        sess.execute("INSERT INTO kv (k, v) VALUES (9, 'seed')")
        assert sess.execute("UPDATE kv SET v = 'x' WHERE k = 9 IF EXISTS")
        assert rows(sess.table(), "v") == [("x",)]

    def test_update_if_column_condition(self, sess):
        sess.execute("INSERT INTO kv (k, v, n) VALUES (1, 'a', 10)")
        # condition false → not applied, state unchanged
        assert not sess.execute("UPDATE kv SET v = 'no' WHERE k = 1 IF n = 99")
        assert rows(sess.table(), "v") == [("a",)]
        # compound condition true → applied
        assert sess.execute("UPDATE kv SET v = 'yes' WHERE k = 1 IF n = 10 AND v = 'a'")
        assert rows(sess.table(), "v") == [("yes",)]

    def test_condition_on_null_column_never_applies(self, sess):
        sess.execute("INSERT INTO kv (k, v) VALUES (1, 'a')")  # n is null
        assert not sess.execute("UPDATE kv SET v = 'no' WHERE k = 1 IF n = 0")

    def test_delete_if_condition(self, sess):
        sess.execute("INSERT INTO kv (k, v) VALUES (1, 'keep')")
        assert not sess.execute("DELETE FROM kv WHERE k = 1 IF v = 'other'")
        assert sess.execute("DELETE FROM kv WHERE k = 1 IF v = 'keep'")
        assert rows(sess.table(), "k") == []

    def test_inequality_conditions(self, sess):
        sess.execute("INSERT INTO kv (k, n) VALUES (1, 5)")
        assert sess.execute("UPDATE kv SET v = 'lt' WHERE k = 1 IF n < 10")
        assert not sess.execute("UPDATE kv SET v = 'gt' WHERE k = 1 IF n > 10")
        assert rows(sess.table(), "v") == [("lt",)]


class TestCreateFunction:
    def test_returns_null_on_null_input(self, spark):
        calls = []

        def body(x):
            calls.append(x)
            return (x or 0) + 1

        create_function(spark, "f_strictnull", body, "int", called_on_null_input=False)
        df = spark.createDataFrame([(1,), (None,)], T.StructType([T.StructField("x", T.IntegerType())]))
        df.createOrReplaceTempView("udf_in")
        got = {r[0] for r in spark.sql("SELECT f_strictnull(x) FROM udf_in").collect()}
        assert got == {2, None}
        # the body never saw the null (reference skips invocation)
        assert None not in calls

    def test_called_on_null_input(self, spark):
        create_function(
            spark, "f_callednull", lambda x: -1 if x is None else x + 1, "int",
            called_on_null_input=True,
        )
        df = spark.createDataFrame([(1,), (None,)], T.StructType([T.StructField("x", T.IntegerType())]))
        df.createOrReplaceTempView("udf_in2")
        got = {r[0] for r in spark.sql("SELECT f_callednull(x) FROM udf_in2").collect()}
        assert got == {2, -1}

    def test_pandas_function(self, spark):
        import pandas as pd

        create_pandas_function(spark, "f_vec", lambda s: s * 2, "long")
        df = spark.range(5)
        df.createOrReplaceTempView("udf_in3")
        got = sorted(r[0] for r in spark.sql("SELECT f_vec(id) FROM udf_in3").collect())
        assert got == [0, 2, 4, 6, 8]


class TestElementConditions:
    """Collection element LWT conditions (ColumnCondition.java:329
    ElementAccessBound): IF m['k'] op v and IF l[i] op v resolve the
    element at the condition read; missing keys and out-of-bounds
    indexes read null, which never satisfies a comparison."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE ecnd WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE ecnd")
        db.execute(
            "CREATE TABLE t (k bigint PRIMARY KEY, m map<text, bigint>, "
            "l list<text>, s set<text>, v text)"
        )
        db.execute(
            "INSERT INTO t (k, m, l, s, v) VALUES "
            "(1, {'a': 5}, ['x', 'y'], {'q'}, 'v0')"
        )
        return db

    def test_map_element_condition(self, db):
        assert db.execute("UPDATE t SET v = 'w' WHERE k = 1 IF m['a'] = 5") is True
        assert db.execute("UPDATE t SET v = 'x' WHERE k = 1 IF m['a'] = 6") is False
        r = db.execute("SELECT v FROM t").collect()
        assert [x.v for x in r] == ["w"]

    def test_missing_map_key_null_comparison_rules(self, db):
        # ColumnCondition.java:253-255 — a null element satisfies only !=
        assert db.execute("UPDATE t SET v = 'x' WHERE k = 1 IF m['zz'] = 1") is False
        assert db.execute("UPDATE t SET v = 'x' WHERE k = 1 IF m['zz'] != 1") is True
        assert db.execute("UPDATE t SET v = 'y' WHERE k = 1 IF m['zz'] = null") is True
        assert db.execute("UPDATE t SET v = 'z' WHERE k = 1 IF m['a'] = null") is False

    def test_list_index_condition_and_bounds(self, db):
        assert db.execute("UPDATE t SET v = 'w' WHERE k = 1 IF l[0] = 'x'") is True
        assert db.execute("UPDATE t SET v = 'x' WHERE k = 1 IF l[9] = 'x'") is False

    def test_mixed_scalar_and_element_conditions(self, db):
        applied = db.execute(
            "UPDATE t SET v = 'w' WHERE k = 1 IF v = 'v0' AND m['a'] != 9 AND l[1] = 'y'"
        )
        assert applied is True

    def test_set_element_condition_rejected(self, db):
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        with pytest.raises(InvalidRequest, match="element"):
            db.execute("UPDATE t SET v = 'x' WHERE k = 1 IF s['q'] = 'q'")

    def test_element_condition_binds_markers(self, db):
        applied = db.execute(
            "UPDATE t SET v = ? WHERE k = ? IF m[?] = ?", params=["w", 1, "a", 5]
        )
        assert applied is True
        r = db.execute("SELECT v FROM t").collect()
        assert [x.v for x in r] == ["w"]


class TestNullConditionSemantics:
    """ColumnCondition.java:241-258: a null condition value is legal for
    =/!= only; a null cell satisfies only !=; a missing row reads every
    column as null (the classic `IF v = null` CAS on a fresh key
    APPLIES)."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE ncs WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE ncs")
        db.execute("CREATE TABLE t (k bigint PRIMARY KEY, a text, b text)")
        db.execute("INSERT INTO t (k, a) VALUES (1, 'set')")
        return db

    def test_eq_null_matches_unset_column(self, db):
        assert db.execute("UPDATE t SET b = 'won' WHERE k = 1 IF b = null") is True
        assert db.execute("UPDATE t SET b = 'x' WHERE k = 1 IF a = null") is False

    def test_neq_null_matches_set_column(self, db):
        assert db.execute("UPDATE t SET b = 'won' WHERE k = 1 IF a != null") is True

    def test_null_cell_satisfies_only_neq(self, db):
        assert db.execute("UPDATE t SET b = 'x' WHERE k = 1 IF b = 'v'") is False
        assert db.execute("UPDATE t SET b = 'won' WHERE k = 1 IF b != 'v'") is True

    def test_ordering_op_with_null_rejected(self, db):
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        with pytest.raises(InvalidRequest, match="Invalid comparison with null"):
            db.execute("UPDATE t SET b = 'x' WHERE k = 1 IF a > null")

    def test_missing_row_column_conditions(self, db):
        # CAS on a nonexistent row: columns read null
        assert db.execute("UPDATE t SET a = 'born' WHERE k = 99 IF a = null") is True
        assert db.execute("UPDATE t SET a = 'x' WHERE k = 98 IF a = 'v'") is False
        # the applied UPDATE wrote a cell but no row liveness: visible row
        r = db.execute("SELECT k, a FROM t WHERE k = 99").collect()
        assert [(x.k, x.a) for x in r] == [(99, "born")]


class TestInConditions:
    """IF v IN (…) (ColumnCondition.SimpleBound.isSatisfiedBy): EQ
    against any listed value, per-element null rules — a null list
    element matches an unset column."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE inc WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE inc")
        db.execute("CREATE TABLE t (k bigint PRIMARY KEY, n bigint, m map<text, bigint>)")
        db.execute("INSERT INTO t (k, n, m) VALUES (1, 5, {'a': 7})")
        return db

    def test_scalar_in(self, db):
        assert db.execute("UPDATE t SET n = 6 WHERE k = 1 IF n IN (4, 5)") is True
        assert db.execute("UPDATE t SET n = 9 WHERE k = 1 IF n IN (4, 5)") is False
        r = db.execute("SELECT n FROM t").collect()
        assert [x.n for x in r] == [6]

    def test_null_element_matches_unset(self, db):
        db.execute("INSERT INTO t (k) VALUES (2)")
        assert db.execute("UPDATE t SET n = 1 WHERE k = 2 IF n IN (4, null)") is True
        assert db.execute("UPDATE t SET n = 2 WHERE k = 1 IF n IN (null)") is False

    def test_element_in(self, db):
        assert db.execute("UPDATE t SET n = 7 WHERE k = 1 IF m['a'] IN (7, 8)") is True
        assert db.execute("UPDATE t SET n = 8 WHERE k = 1 IF m['zz'] IN (7, 8)") is False


class TestUndefinedConditionColumn:
    def test_typoed_condition_column_errors(self, spark):
        """A condition on a nonexistent column must ERROR (the reference's
        'Undefined column name'), never silently read null and apply."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE ucc WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE ucc")
        db.execute("CREATE TABLE t (k bigint PRIMARY KEY, a text)")
        db.execute("INSERT INTO t (k, a) VALUES (1, 'x')")
        with pytest.raises(InvalidRequest, match="Undefined column name"):
            db.execute("UPDATE t SET a = 'y' WHERE k = 1 IF nosuhc = null")
        r = db.execute("SELECT a FROM t").collect()
        assert [x.a for x in r] == ["x"]  # the guarded write did NOT apply
