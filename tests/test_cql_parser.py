"""CQL SELECT parser/executor tests — golden-row checks in the CQLTester
style plus parse-level assertions for the grammar corners
(SelectTest.java / SelectSingleColumnRelationTest.java analogs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_pmem_spark.catalog import load_table
from cassandra_pmem_spark.cql.parser import InvalidRequest, execute_cql, parse_select
from cassandra_pmem_spark.cql.validator import Op
from tests.conftest import SF_SMALL


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestParse:
    def test_full_grammar_roundtrip(self):
        st = parse_select(
            "SELECT o_orderkey, o_totalprice AS price FROM orders "
            "WHERE o_custkey = 42 AND o_orderdate >= '1997-01-01' "
            "ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 5 ALLOW FILTERING"
        )
        assert st.table == "orders"
        assert [s.args for s in st.selectors] == [["o_orderkey"], ["o_totalprice"]]
        assert st.selectors[1].alias == "price"
        assert [r.op for r in st.relations] == [Op.EQ, Op.GTE]
        assert st.order_by == [("o_orderdate", False), ("o_orderkey", True)]
        assert st.limit == 5 and st.allow_filtering

    def test_tuple_token_contains(self):
        st = parse_select(
            "SELECT * FROM lineitem WHERE (l_orderkey, l_linenumber) > (10, 2) "
            "AND token(l_orderkey) > 0 AND l_tags CONTAINS 'x' AND l_map CONTAINS KEY 'k'"
        )
        kinds = [r.kind for r in st.relations]
        assert kinds == ["tuple", "token", "contains", "contains_key"]

    def test_json_distinct_per_partition(self):
        st = parse_select(
            "SELECT JSON o_custkey FROM orders PER PARTITION LIMIT 2 LIMIT 10"
        )
        assert st.json and st.per_partition_limit == 2 and st.limit == 10
        st2 = parse_select("SELECT DISTINCT o_custkey FROM orders")
        assert st2.distinct

    def test_udt_field_selector(self):
        # Selectable.WithFieldSelection: SELECT a.b[.c] projects a struct
        # field; alias optional
        st = parse_select("SELECT k, info.region, info.name AS nm FROM t")
        kinds = [s.kind for s in st.selectors]
        assert kinds == ["col", "field", "field"]
        assert st.selectors[1].args == ["info", "region"]
        assert st.selectors[2].args == ["info", "name"] and st.selectors[2].alias == "nm"
        deep = parse_select("SELECT a.b.c FROM t")
        assert deep.selectors[0].args == ["a", "b", "c"]

    def test_string_escapes_and_keyspace(self):
        st = parse_select("SELECT a FROM ks.t WHERE b = 'it''s'")
        # the qualified name keeps both parts (keyspace-scoped resolution)
        assert st.table == "ks.t" and st.relations[0].values == ["it's"]

    def test_syntax_errors(self):
        for bad in (
            "SELEC x FROM t",
            "SELECT FROM t",
            "SELECT a FROM t WHERE",
            "SELECT a FROM t WHERE a ==",
            "SELECT a FROM t extra",
        ):
            with pytest.raises(InvalidRequest):
                parse_select(bad)


class TestExecute:
    def test_point_lookup_matches_dataframe(self, spark):
        got = rows(
            execute_cql(
                spark,
                "SELECT c_name, c_acctbal FROM customer WHERE c_custkey = 42",
                SF_SMALL,
            )
        )
        want = rows(
            load_table(spark, "customer", SF_SMALL)
            .filter(F.col("c_custkey") == 42)
            .select("c_name", "c_acctbal")
        )
        assert got == want and len(got) == 1

    def test_in_order_limit(self, spark):
        df = execute_cql(
            spark,
            "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
            "WHERE o_custkey IN (1, 7, 42) ORDER BY o_orderdate DESC, o_orderkey LIMIT 4",
            SF_SMALL,
        )
        out = [tuple(r) for r in df.collect()]
        assert len(out) == 4
        dates = [r[1] for r in out]
        assert dates == sorted(dates, reverse=True)

    def test_bind_markers(self, spark):
        got = execute_cql(
            spark,
            "SELECT o_orderkey FROM orders WHERE o_custkey = ? LIMIT ?",
            SF_SMALL,
            params=[42, 3],
        )
        assert got.count() <= 3

    def test_strict_gate_fires_through_parser(self, spark):
        with pytest.raises(InvalidRequest, match="ALLOW FILTERING"):
            execute_cql(
                spark,
                "SELECT o_orderkey FROM orders WHERE o_totalprice > 100",
                SF_SMALL,
            ).collect()
        # same statement with ALLOW FILTERING executes
        n = execute_cql(
            spark,
            "SELECT o_orderkey FROM orders WHERE o_totalprice > 100 ALLOW FILTERING",
            SF_SMALL,
        ).count()
        assert n > 0

    def test_distinct_partitions(self, spark):
        got = execute_cql(spark, "SELECT DISTINCT o_custkey FROM orders", SF_SMALL)
        want = load_table(spark, "orders", SF_SMALL).select("o_custkey").distinct()
        assert got.count() == want.count()

    def test_global_and_grouped_aggregates(self, spark):
        got = execute_cql(
            spark,
            "SELECT count(*) AS n, min(o_totalprice) AS lo FROM orders",
            SF_SMALL,
        ).collect()[0]
        base = load_table(spark, "orders", SF_SMALL)
        assert got["n"] == base.count()
        assert got["lo"] == base.agg(F.min("o_totalprice")).collect()[0][0]

        grouped = execute_cql(
            spark,
            "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey",
            SF_SMALL,
        )
        assert grouped.count() == base.select("o_custkey").distinct().count()

    def test_limit_counts_groups_not_scanned_rows(self, spark):
        """LIMIT on an aggregate counts result groups (CQLGroupByLimits) —
        it must NOT truncate the scanned input before aggregating."""
        base = load_table(spark, "orders", SF_SMALL)
        got = execute_cql(spark, "SELECT count(*) AS n FROM orders LIMIT 5", SF_SMALL)
        assert got.collect()[0]["n"] == base.count()  # all rows aggregated
        grouped = execute_cql(
            spark,
            "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey LIMIT 7",
            SF_SMALL,
        )
        assert grouped.count() == 7  # limit applies to groups

    def test_group_by_non_pk_prefix_rejected(self, spark):
        with pytest.raises(InvalidRequest, match="prefix"):
            execute_cql(
                spark,
                "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
                SF_SMALL,
            )

    def test_per_partition_limit_via_parser(self, spark):
        df = execute_cql(
            spark,
            "SELECT o_custkey, o_orderkey FROM orders PER PARTITION LIMIT 2",
            SF_SMALL,
        )
        per = df.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
        assert per <= 2

    def test_select_json_row_form(self, spark):
        df = execute_cql(
            spark,
            "SELECT JSON o_orderkey, o_orderstatus FROM orders "
            "WHERE o_custkey = 42 ALLOW FILTERING",
            SF_SMALL,
        )
        assert df.columns == ["[json]"]
        import json

        parsed = json.loads(df.collect()[0][0])
        assert set(parsed) == {"o_orderkey", "o_orderstatus"}

    def test_token_relation_and_selector(self, spark):
        df = execute_cql(
            spark,
            "SELECT c_custkey, token(c_custkey) FROM customer "
            "WHERE token(c_custkey) > 0 LIMIT 20",
            SF_SMALL,
        )
        out = df.collect()
        assert 0 < len(out) <= 20
        assert all(r["token"] > 0 for r in out)

    def test_tuple_relation_via_parser(self, spark):
        # strict CQL only allows tuple relations on clustering columns;
        # permissive mode exposes the full Spark surface (SURVEY §7 stance)
        got = execute_cql(
            spark,
            "SELECT l_orderkey, l_linenumber FROM lineitem "
            "WHERE (l_orderkey, l_linenumber) > (100, 2) "
            "AND (l_orderkey, l_linenumber) <= (120, 1)",
            SF_SMALL,
            strict=False,
        )
        data = rows(got)
        assert all((a, b) > (100, 2) and (a, b) <= (120, 1) for a, b in data)
        assert len(data) > 0

    def test_tuple_in_statement_form(self, spark):
        # (a, b) IN ((…), (…)) — Parser.g:443 tupleOfTupleOfIdentifiers;
        # MultiColumnRestriction.InRestrictionWithValues. Duplicate source
        # rows matching an IN pair are all kept (IN filters, not dedups).
        got = execute_cql(
            spark,
            "SELECT l_orderkey, l_linenumber FROM lineitem "
            "WHERE (l_orderkey, l_linenumber) IN ((1001, 1), (1000, 5), (999999, 1))",
            SF_SMALL,
            strict=False,
        )
        data = rows(got)
        assert len(data) > 0
        assert set(data) <= {(1001, 1), (1000, 5)}

    def test_tuple_in_arity_mismatch_rejected(self, spark):
        # the reference rejects tuples whose size differs from the column
        # list ("Expected N elements") — MultiColumnRestriction
        with pytest.raises(InvalidRequest, match="Expected 2 elements"):
            execute_cql(
                spark,
                "SELECT l_orderkey FROM lineitem "
                "WHERE (l_orderkey, l_linenumber) IN ((1, 2), (3, 4, 5))",
                SF_SMALL,
                strict=False,
            )

    def test_tuple_comparison_arity_mismatch_rejected(self, spark):
        with pytest.raises(InvalidRequest, match="Expected 2 elements"):
            execute_cql(
                spark,
                "SELECT l_orderkey FROM lineitem "
                "WHERE (l_orderkey, l_linenumber) > (1, 2, 3)",
                SF_SMALL,
                strict=False,
            )

    def test_writetime_on_primary_key_rejected(self, spark):
        # SelectTest.java: "Cannot use selection function writeTime on
        # PRIMARY KEY part" — key columns have no cells
        with pytest.raises(InvalidRequest, match="PRIMARY KEY part"):
            execute_cql(
                spark,
                "SELECT writetime(o_orderkey) FROM orders WHERE o_custkey = 1",
                SF_SMALL,
            )

    def test_ttl_on_primary_key_rejected(self, spark):
        with pytest.raises(InvalidRequest, match="PRIMARY KEY part"):
            execute_cql(
                spark,
                "SELECT ttl(o_orderdate) FROM orders WHERE o_custkey = 1",
                SF_SMALL,
            )

    def test_in_with_duplicate_values_returns_each_row_once(self, spark):
        # a partition named twice in IN is read once (single partition
        # read per key — SelectTest IN semantics)
        once = rows(
            execute_cql(
                spark,
                "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (5, 7)",
                SF_SMALL,
            )
        )
        doubled = rows(
            execute_cql(
                spark,
                "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (5, 5, 7, 7)",
                SF_SMALL,
            )
        )
        assert once == doubled and len(once) == 2


class TestNestedAggregates:
    """Selectable.WithFunction nesting: aggregates over writetime/cast/
    field selectables, plus CQL integer-avg truncation on the statement
    path (AggregateFcts.java:431-446)."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE nag WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE nag")
        db.execute("CREATE TYPE pt (x int, y int)")
        db.execute(
            "CREATE TABLE t (k int, c int, v double, n int, u pt, "
            "PRIMARY KEY (k, c))"
        )
        db.execute("INSERT INTO t (k, c, v, n, u) VALUES (1, 1, 2.7, 5, {x: 3})")
        db.execute("INSERT INTO t (k, c, v, n, u) VALUES (1, 2, 3.9, 6, {x: 5})")
        db.execute("UPDATE t USING TIMESTAMP 50 SET v = 9.9 WHERE k = 1 AND c = 3")
        return db

    def test_max_writetime(self, db):
        r = db.execute("SELECT k, max(writetime(v)) AS mw FROM t GROUP BY k").collect()
        assert [(x.k, x.mw) for x in r] == [(1, 50)]

    def test_avg_cast_truncates_int(self, db):
        r = db.execute("SELECT avg(cast(v as int)) AS a FROM t").collect()
        # cast 2.7->2, 3.9->3, 9.9->9; avg = 14 div 3 = 4 (int, not 4.67)
        assert [x.a for x in r] == [4]

    def test_avg_int_column_truncates(self, db):
        r = db.execute("SELECT avg(n) AS a FROM t").collect()
        assert [x.a for x in r] == [5]  # (5+6) div 2, int

    def test_sum_udt_field(self, db):
        r = db.execute("SELECT sum(u.x) AS s FROM t").collect()
        assert [x.s for x in r] == [8]

    def test_avg_double_stays_double(self, db):
        r = db.execute("SELECT avg(v) AS a FROM t").collect()
        assert abs(x := r[0].a - (2.7 + 3.9 + 9.9) / 3) < 1e-9, x

    def test_writetime_agg_on_pk_rejected(self, db):
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        with pytest.raises(InvalidRequest, match="PRIMARY KEY"):
            db.execute("SELECT max(writetime(k)) FROM t")

    def test_avg_decimal_keeps_decimal_dtype(self, db):
        """The empty-group zero coalesce must not widen avg(decimal) to
        double (CQL avg(decimal) returns decimal — BigDecimal division);
        avg(varint) divides in INTEGER arithmetic like every integral
        type (AvgFunction's BigInteger sum/count)."""
        import decimal as _dec

        from pyspark.sql import types as T

        db.execute(
            "CREATE TABLE dec (k int PRIMARY KEY, d decimal, w varint)"
        )
        db.execute("INSERT INTO dec (k, d, w) VALUES (1, 2.5, 5)")
        db.execute("INSERT INTO dec (k, d, w) VALUES (2, 3.5, 6)")
        out = db.execute("SELECT avg(d) AS a, avg(w) AS aw FROM dec")
        assert isinstance(out.schema["a"].dataType, T.DecimalType)
        assert isinstance(out.schema["aw"].dataType, T.DecimalType)
        r = out.collect()[0]
        assert r.a == _dec.Decimal("3")
        assert r.aw == _dec.Decimal("5")  # (5+6) div 2 — truncating
        # empty input still folds to ZERO (AggregateFcts initial state)
        r = db.execute(
            "SELECT avg(d) AS a, avg(w) AS aw FROM dec WHERE k = 99"
        ).collect()[0]
        assert (r.a, r.aw) == (_dec.Decimal("0"), _dec.Decimal("0"))

    def test_avg_varint_exact_beyond_long_range(self, db):
        """varint is arbitrary-precision: the integer division must not
        go through Spark's 64-bit IntegralDivide (sum 2*10^20 wrapped to
        7766279631452241920 under `div`)."""
        import decimal as _dec

        db.execute("CREATE TABLE big (k int PRIMARY KEY, w varint)")
        db.execute("INSERT INTO big (k, w) VALUES (1, 100000000000000000000)")
        db.execute("INSERT INTO big (k, w) VALUES (2, 100000000000000000001)")
        r = db.execute("SELECT avg(w) AS a FROM big").collect()[0]
        # (2*10^20 + 1) div 2 truncates to 10^20
        assert r.a == _dec.Decimal("100000000000000000000")
        # cast-to-varint divides in integer arithmetic too
        db.execute("CREATE TABLE cv (k int PRIMARY KEY, v double)")
        db.execute("INSERT INTO cv (k, v) VALUES (1, 2.9)")
        db.execute("INSERT INTO cv (k, v) VALUES (2, 3.9)")
        r = db.execute("SELECT avg(cast(v as varint)) AS a FROM cv").collect()[0]
        assert r.a == _dec.Decimal("2")  # (2+3) div 2

    def test_decimal_literal_precision_and_varint_integrality(self, db):
        """Legal wide literals store exactly (the default 28-digit
        Python decimal context must not leak a raw InvalidOperation);
        fractional constants for varint and out-of-range decimals reject
        at prepare."""
        import decimal as _dec

        from cassandra_pmem_spark.cql.validator import InvalidRequest

        db.execute("CREATE TABLE wd (k int PRIMARY KEY, d decimal, w varint)")
        db.execute("INSERT INTO wd (k, d) VALUES (1, 99999999999.5)")
        r = db.execute("SELECT d FROM wd WHERE k = 1").collect()[0]
        assert r.d == _dec.Decimal("99999999999.5")
        with pytest.raises(InvalidRequest, match="non-integer"):
            db.execute("INSERT INTO wd (k, w) VALUES (2, 2.5)")
        with pytest.raises(InvalidRequest, match="out of range"):
            db.execute(
                "INSERT INTO wd (k, d) VALUES "
                "(3, 100000000000000000000.0)"  # 21 integer digits > 38-18
            )
        # a 29-digit varint (beyond the old 28-digit context) is legal
        db.execute(
            "INSERT INTO wd (k, w) VALUES (4, 10000000000000000000000000000)"
        )
        r = db.execute("SELECT w FROM wd WHERE k = 4").collect()[0]
        assert r.w == _dec.Decimal("10000000000000000000000000000")


class TestNamedBindMarkers:
    """Named bind markers :name (Parser.g marker rule; QueryOptions named
    values): repeated names bind the same value, no positional cursor."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE nbm WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE nbm")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, v text, n int)")
        return db

    def test_insert_update_select_roundtrip(self, db):
        db.execute(
            "INSERT INTO t (k, v, n) VALUES (:k, :v, :n)",
            {"k": 1, "v": "x", "n": 5},
        )
        db.execute(
            "UPDATE t USING TTL :ttl SET v = :v WHERE k = :k",
            {"ttl": 1000, "v": "y", "k": 2},
        )
        r = db.execute("SELECT k, v, n FROM t WHERE k = :k", {"k": 1}).collect()
        assert [(x.k, x.v, x.n) for x in r] == [(1, "x", 5)]

    def test_repeated_name_binds_same_value(self, db):
        db.execute("INSERT INTO t (k, v) VALUES (:a, 'one')", {"a": 7})
        db.execute(
            "UPDATE t SET n = :a WHERE k = :a", {"a": 7}
        )
        r = db.execute("SELECT n FROM t").collect()
        assert [x.n for x in r] == [7]

    def test_mixing_positional_with_dict_rejected(self, db):
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        with pytest.raises(InvalidRequest, match="positional"):
            db.execute("INSERT INTO t (k, v) VALUES (?, :v)", {"v": "z"})

    def test_missing_name_rejected(self, db):
        from cassandra_pmem_spark.cql.validator import InvalidRequest

        with pytest.raises(InvalidRequest, match="no bind value"):
            db.execute("INSERT INTO t (k) VALUES (:missing)", {})

    def test_named_in_batch(self, db):
        db.execute(
            "BEGIN BATCH "
            "INSERT INTO t (k, v) VALUES (:k1, :v); "
            "INSERT INTO t (k, v) VALUES (:k2, :v); "
            "APPLY BATCH",
            {"k1": 1, "k2": 2, "v": "b"},
        )
        r = db.execute("SELECT k, v FROM t").collect()
        assert sorted((x.k, x.v) for x in r) == [(1, "b"), (2, "b")]


class TestRelationFunctionTerms:
    """Constant function terms as relation values (Parser.g term rule in
    relations; cql3/functions/BytesConversionFcts.java, TimeFcts.java) —
    folded at prepare, so the pushed-down predicate is an ordinary typed
    comparison."""

    @pytest.fixture()
    def db(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE rft WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE rft")
        db.execute("CREATE TABLE t (k int PRIMARY KEY, n bigint, s text)")
        db.execute("INSERT INTO t (k, n, s) VALUES (1, 100, 'a')")
        db.execute("INSERT INTO t (k, n, s) VALUES (2, 200, 'b')")
        return db

    def test_select_where_eq_term(self, db):
        r = db.execute(
            "SELECT k FROM t WHERE n = blobAsBigint(bigintAsBlob(200)) "
            "ALLOW FILTERING"
        ).collect()
        assert [x.k for x in r] == [2]

    def test_select_where_in_term(self, db):
        r = db.execute(
            "SELECT k FROM t WHERE k IN (blobAsInt(intAsBlob(1)), 2)"
        ).collect()
        assert sorted(x.k for x in r) == [1, 2]

    def test_update_where_key_term(self, db):
        db.execute("UPDATE t SET s = 'z' WHERE k = blobAsInt(intAsBlob(1))")
        r = db.execute("SELECT s FROM t WHERE k = 1").collect()
        assert [x.s for x in r] == ["z"]

    def test_delete_where_key_term(self, db):
        db.execute("DELETE FROM t WHERE k = blobAsInt(intAsBlob(2))")
        r = db.execute("SELECT k FROM t").collect()
        assert [x.k for x in r] == [1]

    def test_nondeterministic_relation_term_rejected(self, db):
        with pytest.raises(InvalidRequest, match="non-deterministic"):
            db.execute("SELECT k FROM t WHERE k = now()")


class TestTokenRhs:
    """token(pk) op token(<key literals>) — the RHS token of a literal key
    (TokenFct.java:61; TokenRelation.java). The scalar fold must be
    bit-exact with where_token's column expression: the equality tests
    return zero rows if the two ever disagree."""

    def test_bigint_key_equality(self, spark):
        got = rows(
            execute_cql(
                spark,
                "SELECT c_custkey FROM customer WHERE token(c_custkey) = token(42)",
                SF_SMALL,
            )
        )
        assert got == [(42,)]

    def test_bigint_key_range(self, spark):
        from cassandra_pmem_spark.functions.murmur3 import murmur3_token_py

        df = execute_cql(
            spark,
            "SELECT c_custkey FROM customer WHERE token(c_custkey) > token(42) LIMIT 500",
            SF_SMALL,
        )
        bound = murmur3_token_py(42)
        toks = [murmur3_token_py(r.c_custkey) for r in df.collect()]
        assert toks and all(t > bound for t in toks)

    def test_composite_key_equality(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tok WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tok")
        db.execute(
            "CREATE TABLE tt (a bigint, b text, v int, PRIMARY KEY ((a, b)))"
        )
        db.execute("INSERT INTO tt (a, b, v) VALUES (1, 'x', 10)")
        db.execute("INSERT INTO tt (a, b, v) VALUES (1, 'y', 20)")
        db.execute("INSERT INTO tt (a, b, v) VALUES (2, 'x', 30)")
        r = db.execute(
            "SELECT v FROM tt WHERE token(a, b) = token(1, 'x')"
        ).collect()
        assert [x.v for x in r] == [10]

    def test_text_key_equality(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tok WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tok")
        db.execute("CREATE TABLE ts (name text PRIMARY KEY, v int)")
        db.execute("INSERT INTO ts (name, v) VALUES ('MADAGASCAR IS LONG', 1)")
        db.execute("INSERT INTO ts (name, v) VALUES ('PERU', 2)")
        r = db.execute(
            "SELECT v FROM ts WHERE token(name) = token('PERU')"
        ).collect()
        assert [x.v for x in r] == [2]

    def test_arity_mismatch_rejected(self, spark):
        with pytest.raises(InvalidRequest, match="full partition key"):
            execute_cql(
                spark,
                "SELECT c_custkey FROM customer WHERE token(c_custkey) = token(1, 2)",
                SF_SMALL,
            ).collect()

    def test_min_max_timeuuid_bounds_fold(self, spark):
        """minTimeuuid/maxTimeuuid relations compare the v1-embedded
        timestamp of a DECLARED timeuuid column (TimeFcts.java:69,81;
        TimeUUIDType timestamp-first order). now() mints from the session
        clock (EPOCH + statement tick ms), so the bound instants are
        deterministic."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tu WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tu")
        db.execute("CREATE TABLE ev (k int, id timeuuid, v int, PRIMARY KEY (k, id))")
        # statement ticks 1..4 -> instants 2024-01-01T00:00:00.001 .. .004
        for i in range(4):
            db.execute(f"INSERT INTO ev (k, id, v) VALUES (1, now(), {i})")
        r = db.execute(
            "SELECT v FROM ev WHERE k = 1 AND "
            "id > minTimeuuid('2024-01-01 00:00:00.003')"
        ).collect()
        assert sorted(x.v for x in r) == [2, 3]

    def test_timeuuid_bounds_include_the_named_millisecond(self, spark):
        """minTimeuuid/maxTimeuuid extremes sit strictly outside every
        real timeuuid in the named millisecond (TimeFcts.java:69,81):
        `> minTimeuuid(t)` and `< maxTimeuuid(t)` both INCLUDE a real
        timeuuid whose embedded instant is exactly t."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tub WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tub")
        db.execute("CREATE TABLE ev (k int, id timeuuid, PRIMARY KEY (k, id))")
        # statement tick 1 -> embedded instant 2024-01-01T00:00:00.001
        db.execute("INSERT INTO ev (k, id) VALUES (1, now())")
        at_t = "SELECT k FROM ev WHERE k = 1 AND id %s"
        inc = db.execute(at_t % "> minTimeuuid('2024-01-01 00:00:00.001')").collect()
        assert [x.k for x in inc] == [1]
        inc = db.execute(at_t % "< maxTimeuuid('2024-01-01 00:00:00.001')").collect()
        assert [x.k for x in inc] == [1]
        exc = db.execute(at_t % "< minTimeuuid('2024-01-01 00:00:00.001')").collect()
        assert exc == []
        exc = db.execute(at_t % "> maxTimeuuid('2024-01-01 00:00:00.001')").collect()
        assert exc == []

    def test_timeuuid_bound_rejects_non_timeuuid_columns(self, spark):
        """The compared column must be DECLARED timeuuid: the reference
        rejects the timeuuid/timestamp type mismatch at prepare — the
        fold must not silently compile `ts < t+1ms` against a plain
        timestamp column."""
        import pytest

        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tug WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tug")
        db.execute("CREATE TABLE ev (k int PRIMARY KEY, ts timestamp)")
        db.execute(
            "INSERT INTO ev (k, ts) VALUES (1, toTimestamp('2024-03-01 00:00:00'))"
        )
        with pytest.raises(InvalidRequest, match="not declared timeuuid"):
            db.execute(
                "SELECT k FROM ev WHERE ts > minTimeuuid('2024-01-01') "
                "ALLOW FILTERING"
            )

    def test_token_rhs_date_key_and_fn_term(self, spark):
        """token() literals coerce to the key's type (date strings) and
        accept function terms like every other value position."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tod WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tod")
        db.execute("CREATE TABLE dd (d date PRIMARY KEY, v int)")
        db.execute("INSERT INTO dd (d, v) VALUES (toDate('2024-01-01'), 1)")
        db.execute("INSERT INTO dd (d, v) VALUES (toDate('2024-06-01'), 2)")
        r = db.execute(
            "SELECT v FROM dd WHERE token(d) = token('2024-01-01')"
        ).collect()
        assert [x.v for x in r] == [1]
        r = db.execute(
            "SELECT v FROM dd WHERE token(d) = token(toDate('2024-06-01'))"
        ).collect()
        assert [x.v for x in r] == [2]

    def test_timeuuid_bound_in_write_stores_exact_instant(self, spark):
        """A min/maxTimeuuid fold in a WRITE position stores the exact
        instant (the reference stores a fake timeuuid whose timestamp IS
        t) — the per-operator extreme shifts apply only in relations."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tuw WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tuw")
        db.execute("CREATE TABLE ev (k int PRIMARY KEY, ts timestamp)")
        db.execute(
            "INSERT INTO ev (k, ts) VALUES (1, minTimeuuid('2024-03-01 00:00:00'))"
        )
        r = db.execute(
            "SELECT k FROM ev WHERE ts = toTimestamp('2024-03-01 00:00:00') "
            "ALLOW FILTERING"
        ).collect()
        assert [x.k for x in r] == [1]

    def test_timeuuid_bound_eq_matches_fake_extreme_only(self, spark):
        """On a DECLARED timeuuid column, equality/IN against an extreme
        compares the fake extreme uuid itself — empty unless a row stored
        it, exactly the reference (TestExtremeEquality in
        test_timeuuid_now.py pins the full matrix); a TUPLE relation
        position still rejects with guidance."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tue WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tue")
        db.execute("CREATE TABLE ev (k int, id timeuuid, PRIMARY KEY (k, id))")
        db.execute("INSERT INTO ev (k, id) VALUES (1, now())")
        q = "SELECT k FROM ev WHERE k = 1 AND id %s minTimeuuid('2024-03-01 00:00:00')"
        assert db.execute(q % "=").collect() == []  # empty, not an error
        assert db.execute(
            "SELECT k FROM ev WHERE k = 1 AND id IN "
            "(minTimeuuid('2024-03-01 00:00:00'))"
        ).collect() == []

    def test_timeuuid_bound_in_delete_range_matches_select(self, spark):
        """A DELETE slice bound and the SELECT that previews it gate and
        translate the extreme IDENTICALLY: on a declared timeuuid
        clustering column `id >= minTimeuuid(t)` removes exactly the rows
        the preview returns; on a plain timestamp column BOTH reject —
        a user must never be able to range-delete on a predicate they
        cannot first SELECT-preview."""
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tud WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tud")
        db.execute(
            "CREATE TABLE ev (k int, id timeuuid, v int, PRIMARY KEY (k, id))"
        )
        db.execute(
            "INSERT INTO ev (k, id, v) VALUES (1, maxTimeuuid('2024-02-01 00:00:00'), 20)"
        )
        db.execute(
            "INSERT INTO ev (k, id, v) VALUES (1, maxTimeuuid('2024-03-01 00:00:00'), 10)"
        )
        q = (
            "SELECT v FROM ev WHERE k = 1 AND "
            "id >= minTimeuuid('2024-03-01 00:00:00')"
        )
        assert [x.v for x in db.execute(q).collect()] == [10]
        db.execute(
            "DELETE FROM ev WHERE k = 1 AND id >= minTimeuuid('2024-03-01 00:00:00')"
        )
        r = db.execute("SELECT v FROM ev").collect()
        assert [x.v for x in r] == [20]
        # the preview gate applies to the DELETE too: a timestamp
        # clustering column rejects the extreme in both statements
        db.execute(
            "CREATE TABLE evt (k int, ts timestamp, v int, PRIMARY KEY (k, ts))"
        )
        with pytest.raises(InvalidRequest, match="not declared timeuuid"):
            db.execute(
                "DELETE FROM evt WHERE k = 1 AND ts > minTimeuuid('2024-03-01 00:00:00')"
            )

    def test_bad_date_token_literal_is_invalid_request(self, spark):
        from cassandra_pmem_spark.cql.ddl import CqlDatabase

        db = CqlDatabase(spark)
        db.execute("CREATE KEYSPACE tbd WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE tbd")
        db.execute("CREATE TABLE dd (d date PRIMARY KEY, v int)")
        with pytest.raises(InvalidRequest):
            db.execute("SELECT v FROM dd WHERE token(d) = token('2024-13-99')")
