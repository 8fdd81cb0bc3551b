"""CREATE FUNCTION / CREATE AGGREGATE statement forms (Parser.g
createFunction/createAggregate rules; CreateFunctionStatement.java;
CreateAggregateStatement.java; UDFunction.java:69,382;
UDAggregate.java:44-53; test shapes mirror
test/unit/org/apache/cassandra/cql3/validation/entities/UFTest.java).

This engine's body dialect is LANGUAGE sql (a Spark SQL expression over
the argument names): scalar calls expand inline into whole-stage
codegen, aggregates compile to one aggregate(collect_list(…)) fold."""

import pytest

from cassandra_pmem_spark.cql.validator import InvalidRequest


@pytest.fixture()
def db(spark):
    from cassandra_pmem_spark.cql.ddl import CqlDatabase

    db = CqlDatabase(spark)
    db.execute("CREATE KEYSPACE fks WITH REPLICATION = {'class': 'SimpleStrategy'}")
    db.execute("USE fks")
    db.execute(
        "CREATE TABLE sales (region text, id int, amount int, note text, "
        "PRIMARY KEY (region, id))"
    )
    db.execute("INSERT INTO sales (region, id, amount, note) VALUES ('e', 0, 10, 'a')")
    db.execute("INSERT INTO sales (region, id, amount) VALUES ('e', 1, 20)")
    db.execute("INSERT INTO sales (region, id, amount, note) VALUES ('e', 2, 30, 'c')")
    db.execute("INSERT INTO sales (region, id, amount, note) VALUES ('e', 3, 40, 'd')")
    return db


def _mk_avg(db):
    db.execute(
        "CREATE FUNCTION avg_state (st tuple<bigint,bigint>, v int) "
        "CALLED ON NULL INPUT RETURNS tuple<bigint,bigint> LANGUAGE sql AS "
        "'named_struct(''_1'', st._1 + coalesce(v, 0), "
        "''_2'', st._2 + IF(v IS NULL, 0L, 1L))'"
    )
    db.execute(
        "CREATE FUNCTION avg_final (st tuple<bigint,bigint>) "
        "CALLED ON NULL INPUT RETURNS double LANGUAGE sql "
        "AS 'IF(st._2 = 0, NULL, st._1 / st._2)'"
    )
    db.execute(
        "CREATE AGGREGATE iavg (int) SFUNC avg_state "
        "STYPE tuple<bigint,bigint> FINALFUNC avg_final INITCOND (0, 0)"
    )


class TestCreateFunction:
    def test_called_on_null_input_sees_nulls(self, db):
        db.execute(
            "CREATE FUNCTION tagit (s text) CALLED ON NULL INPUT "
            "RETURNS text LANGUAGE sql AS 'coalesce(s, ''-'')'"
        )
        r = db.execute("SELECT id, tagit(note) AS tag FROM sales").collect()
        assert sorted((x.id, x.tag) for x in r) == [
            (0, "a"), (1, "-"), (2, "c"), (3, "d"),
        ]

    def test_returns_null_on_null_input_short_circuits(self, db):
        # UDFunction.java `calledOnNullInput` — body never evaluated on null
        db.execute(
            "CREATE FUNCTION tagit (s text) RETURNS NULL ON NULL INPUT "
            "RETURNS text LANGUAGE sql AS 'concat(s, ''!'')'"
        )
        r = db.execute("SELECT id, tagit(note) AS tag FROM sales").collect()
        assert sorted((x.id, x.tag) for x in r) == [
            (0, "a!"), (1, None), (2, "c!"), (3, "d!"),
        ]

    def test_or_replace_swaps_body(self, db):
        db.execute(
            "CREATE FUNCTION f (x int) CALLED ON NULL INPUT RETURNS int "
            "LANGUAGE sql AS 'x + 1'"
        )
        db.execute(
            "CREATE OR REPLACE FUNCTION f (x int) CALLED ON NULL INPUT "
            "RETURNS int LANGUAGE sql AS 'x * 2'"
        )
        r = db.execute("SELECT f(amount) AS y FROM sales WHERE region = 'e' AND id = 0").collect()
        assert [x.y for x in r] == [20]

    def test_duplicate_rejected_if_not_exists_tolerated(self, db):
        db.execute(
            "CREATE FUNCTION f (x int) CALLED ON NULL INPUT RETURNS int "
            "LANGUAGE sql AS 'x'"
        )
        with pytest.raises(InvalidRequest, match="already exists"):
            db.execute(
                "CREATE FUNCTION f (x int) CALLED ON NULL INPUT RETURNS int "
                "LANGUAGE sql AS 'x'"
            )
        db.execute(
            "CREATE FUNCTION IF NOT EXISTS f (x int) CALLED ON NULL INPUT "
            "RETURNS int LANGUAGE sql AS 'x + 99'"
        )  # suppressed; original body kept
        r = db.execute("SELECT f(amount) AS y FROM sales WHERE region = 'e' AND id = 0").collect()
        assert [x.y for x in r] == [10]

    def test_or_replace_with_if_not_exists_conflict(self, db):
        # CreateFunctionStatement.java directive conflict
        with pytest.raises(InvalidRequest, match="Cannot use both"):
            db.execute(
                "CREATE OR REPLACE FUNCTION IF NOT EXISTS f (x int) "
                "CALLED ON NULL INPUT RETURNS int LANGUAGE sql AS 'x'"
            )

    def test_java_language_rejected(self, db):
        # the reference hosts sandboxed java bytecode; this engine's
        # dialect is LANGUAGE sql — an honest, loud divergence
        with pytest.raises(InvalidRequest, match="LANGUAGE java is not supported"):
            db.execute(
                "CREATE FUNCTION f (x int) CALLED ON NULL INPUT RETURNS int "
                "LANGUAGE java AS 'return x;'"
            )

    def test_unknown_function_in_selection(self, db):
        with pytest.raises(InvalidRequest, match="Unknown function"):
            db.execute("SELECT nosuch(amount) FROM sales")


class TestCreateAggregate:
    def test_uda_global_and_grouped(self, db):
        _mk_avg(db)
        r = db.execute("SELECT iavg(amount) AS a FROM sales").collect()
        assert [x.a for x in r] == [25.0]
        r = db.execute(
            "SELECT region, iavg(amount) AS a FROM sales GROUP BY region"
        ).collect()
        assert [(x.region, x.a) for x in r] == [("e", 25.0)]

    def test_sfunc_signature_validated(self, db):
        _mk_avg(db)
        # avg_final takes (stype) only — wrong shape for an SFUNC
        with pytest.raises(InvalidRequest, match="must take"):
            db.execute(
                "CREATE AGGREGATE bad (int) SFUNC avg_final "
                "STYPE tuple<bigint,bigint>"
            )

    def test_unknown_sfunc(self, db):
        with pytest.raises(InvalidRequest, match="Unknown function"):
            db.execute("CREATE AGGREGATE bad (int) SFUNC nosuch STYPE int")

    def test_drop_function_used_by_aggregate_rejected(self, db):
        _mk_avg(db)
        with pytest.raises(InvalidRequest, match="still referenced"):
            db.execute("DROP FUNCTION avg_state")
        db.execute("DROP AGGREGATE iavg")
        db.execute("DROP FUNCTION avg_state")  # free once the UDA is gone

    def test_no_finalfunc_returns_state(self, db):
        db.execute(
            "CREATE FUNCTION cnt_state (st bigint, v int) CALLED ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + 1L'"
        )
        db.execute(
            "CREATE AGGREGATE cnt (int) SFUNC cnt_state STYPE bigint INITCOND 0"
        )
        r = db.execute("SELECT cnt(amount) AS n FROM sales").collect()
        assert [x.n for x in r] == [4]

    def test_rnoni_sfunc_skips_null_rows(self, db):
        # RETURNS NULL ON NULL INPUT state function: null inputs leave
        # the state untouched (the reference skips the invocation)
        db.execute(
            "CREATE FUNCTION ncnt_state (st bigint, v text) "
            "RETURNS NULL ON NULL INPUT RETURNS bigint LANGUAGE sql AS 'st + 1L'"
        )
        db.execute(
            "CREATE AGGREGATE ncnt (text) SFUNC ncnt_state STYPE bigint INITCOND 0"
        )
        r = db.execute("SELECT ncnt(note) AS n FROM sales").collect()
        assert [x.n for x in r] == [3]  # note is NULL for id=1

    def test_drop_keyspace_cascades_functions(self, db):
        _mk_avg(db)
        db.execute("DROP KEYSPACE fks")
        assert ("fks", "iavg") not in db.registry.aggregates
        assert ("fks", "avg_state") not in db.registry.functions


class TestReviewRegressions:
    def test_body_string_literals_survive_substitution(self, db):
        """Formal-arg substitution must not rewrite identifiers inside
        the body's string literals: CASE WHEN s = 's' compares against
        the LITERAL 's', not the argument."""
        db.execute(
            "CREATE FUNCTION is_s (s text) CALLED ON NULL INPUT RETURNS int "
            "LANGUAGE sql AS 'CASE WHEN s = ''s'' THEN 1 ELSE 0 END'"
        )
        db.execute("INSERT INTO sales (region, id, amount, note) VALUES ('e', 9, 1, 's')")
        r = db.execute("SELECT id, is_s(note) AS f FROM sales").collect()
        got = {x.id: x.f for x in r}
        assert got[9] == 1 and got[0] == 0  # note 'a' != literal 's'

    def test_negative_initcond(self, db):
        db.execute(
            "CREATE FUNCTION mx_state (st int, v int) CALLED ON NULL INPUT "
            "RETURNS int LANGUAGE sql AS 'greatest(st, coalesce(v, st))'"
        )
        db.execute("CREATE AGGREGATE mx (int) SFUNC mx_state STYPE int INITCOND -1")
        r = db.execute("SELECT mx(amount) AS m FROM sales").collect()
        assert [x.m for x in r] == [40]

    def test_negative_tuple_initcond(self, db):
        db.execute(
            "CREATE FUNCTION t_state (st tuple<bigint,bigint>, v int) "
            "CALLED ON NULL INPUT RETURNS tuple<bigint,bigint> LANGUAGE sql "
            "AS 'named_struct(''_1'', greatest(st._1, CAST(v AS BIGINT)), "
            "''_2'', st._2 + 1L)'"
        )
        db.execute(
            "CREATE AGGREGATE mx2 (int) SFUNC t_state "
            "STYPE tuple<bigint,bigint> INITCOND (-1, 0)"
        )
        r = db.execute("SELECT mx2(amount) AS m FROM sales").collect()
        assert [tuple(x.m) for x in r] == [(40, 4)]


class TestAdviceRound9:
    """Round-9 advisor findings: cross-keyspace function binding, null
    state/finalfunc semantics, nested generics, field-access collision,
    table-vs-view name collision."""

    def test_aggregate_binds_sfunc_at_create_time(self, db):
        """SFUNC/FINALFUNC resolve in the keyspace the aggregate was
        created in; a same-named function in the CALLER's keyspace must
        not hijack the fold (UDAggregate holds references, not names)."""
        db.execute(
            "CREATE FUNCTION s1 (st bigint, v int) CALLED ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + CAST(coalesce(v,0) AS BIGINT)'"
        )
        db.execute("CREATE AGGREGATE tot (int) SFUNC s1 STYPE bigint INITCOND 0")
        # another keyspace with a DIFFERENT same-named function + same table
        db.execute("CREATE KEYSPACE oks WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE oks")
        db.execute(
            "CREATE FUNCTION s1 (st bigint, v int) CALLED ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + 1000L'"
        )
        # caller sits in oks: the aggregate name 'tot' uniquely resolves
        # to fks.tot, but its SFUNC must stay bound to fks.s1 even though
        # oks.s1 shadows the bare name in the caller's keyspace
        r = db.execute("SELECT tot(amount) AS t FROM fks.sales").collect()
        assert [x.t for x in r] == [100]  # 10+20+30+40, not 4000

    def test_drop_function_guard_uses_resolved_keys(self, db):
        """A same-named function in ANOTHER keyspace is not blocked by
        this keyspace's aggregate referencing its own s2."""
        db.execute(
            "CREATE FUNCTION s2 (st bigint, v int) CALLED ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + 1L'"
        )
        db.execute("CREATE AGGREGATE c2 (int) SFUNC s2 STYPE bigint INITCOND 0")
        db.execute("CREATE KEYSPACE oks2 WITH REPLICATION = {'class': 'SimpleStrategy'}")
        db.execute("USE oks2")
        db.execute(
            "CREATE FUNCTION s2 (st bigint, v int) CALLED ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + 2L'"
        )
        db.execute("DROP FUNCTION oks2.s2")  # unreferenced — must succeed
        db.execute("USE fks")
        with pytest.raises(InvalidRequest, match="still referenced"):
            db.execute("DROP FUNCTION s2")

    def test_rnoni_sfunc_null_state_stays_null(self, db):
        """No INITCOND + RETURNS NULL ON NULL INPUT state function: the
        reference never invokes on a null state — the aggregate stays
        NULL even when a COALESCE in the body could produce a value."""
        db.execute(
            "CREATE FUNCTION zs (st bigint, v int) RETURNS NULL ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'coalesce(st, 0L) + 1L'"
        )
        db.execute("CREATE AGGREGATE znull (int) SFUNC zs STYPE bigint")
        r = db.execute("SELECT znull(amount) AS z FROM sales").collect()
        assert [x.z for x in r] == [None]

    def test_rnoni_finalfunc_short_circuits_null_state(self, db):
        db.execute(
            "CREATE FUNCTION fs (st bigint, v int) RETURNS NULL ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'st + 1L'"
        )
        db.execute(
            "CREATE FUNCTION ff (st bigint) RETURNS NULL ON NULL INPUT "
            "RETURNS bigint LANGUAGE sql AS 'coalesce(st, -1L)'"
        )
        db.execute(
            "CREATE AGGREGATE zfin (int) SFUNC fs STYPE bigint FINALFUNC ff"
        )
        r = db.execute("SELECT zfin(amount) AS z FROM sales").collect()
        assert [x.z for x in r] == [None]  # not -1: finalfunc never ran

    def test_nested_tuple_type_in_signature(self, db):
        db.execute(
            "CREATE FUNCTION nt (st tuple<tuple<bigint,bigint>,bigint>, v int) "
            "CALLED ON NULL INPUT RETURNS tuple<tuple<bigint,bigint>,bigint> "
            "LANGUAGE sql AS 'named_struct(''_1'', named_struct(''_1'', "
            "st._1._1 + CAST(coalesce(v,0) AS BIGINT), ''_2'', st._1._2), "
            "''_2'', st._2 + 1L)'"
        )
        db.execute(
            "CREATE AGGREGATE ntag (int) SFUNC nt "
            "STYPE tuple<tuple<bigint,bigint>,bigint> INITCOND ((0, 0), 0)"
        )
        r = db.execute("SELECT ntag(amount) AS m FROM sales").collect()
        assert [(tuple(x.m._1), x.m._2) for x in r] == [((100, 0), 4)]

    def test_field_access_colliding_with_formal_not_substituted(self, db):
        """Formal parameter s must not rewrite the FIELD access st.s —
        only bare identifiers are formals (negative lookbehind on '.')."""
        # exercise a formal named exactly like a struct FIELD: '_1'
        db.execute(
            "CREATE FUNCTION fb (st tuple<bigint,bigint>, _1 int) "
            "CALLED ON NULL INPUT RETURNS tuple<bigint,bigint> LANGUAGE sql "
            "AS 'named_struct(''_1'', st._1 + CAST(coalesce(_1, 0) AS BIGINT), ''_2'', st._2)'"
        )
        db.execute(
            "CREATE AGGREGATE fbg (int) SFUNC fb "
            "STYPE tuple<bigint,bigint> INITCOND (0, 0)"
        )
        r = db.execute("SELECT fbg(amount) AS m FROM sales").collect()
        assert [tuple(x.m) for x in r] == [(100, 0)]

    def test_create_table_rejects_existing_view_name(self, db):
        db.execute(
            "CREATE MATERIALIZED VIEW mv9 AS SELECT region, id, amount "
            "FROM sales WHERE region IS NOT NULL AND id IS NOT NULL "
            "PRIMARY KEY (id, region)"
        )
        with pytest.raises(InvalidRequest, match="materialized view"):
            db.execute("CREATE TABLE mv9 (k int PRIMARY KEY, v int)")

    def test_nested_tuple_initcond_arity_error(self, db):
        db.execute(
            "CREATE FUNCTION na (st tuple<tuple<bigint,bigint>,bigint>, v int) "
            "CALLED ON NULL INPUT RETURNS tuple<tuple<bigint,bigint>,bigint> "
            "LANGUAGE sql AS 'st'"
        )
        with pytest.raises(InvalidRequest, match="arity"):
            db.execute(
                "CREATE AGGREGATE nag (int) SFUNC na "
                "STYPE tuple<tuple<bigint,bigint>,bigint> INITCOND (1, 2, 3)"
            )
