"""Property-style randomized predicate tests (SURVEY §5 strategy): arbitrary
conjunctions/disjunctions of comparisons over `orders`, executed by Spark and
DuckDB, must agree row-for-row. This sweeps the predicate-evaluation corners
(boundary values, negations, type coercions) that hand-picked queries miss.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cassandra_pmem_spark.catalog import load_table
from tests.conftest import SF_SMALL

# (name, spark column builder, sql fragment builder, value strategy)
_FIELDS = [
    ("o_orderkey", st.integers(min_value=-10, max_value=7000)),
    ("o_custkey", st.integers(min_value=-5, max_value=1600)),
    ("o_totalprice", st.floats(min_value=0, max_value=600000, allow_nan=False)),
    ("o_orderstatus", st.sampled_from(["P", "O", "F", "X"])),
    (
        "o_orderpriority",
        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
    ),
]

_OPS = ["=", "!=", "<", "<=", ">", ">="]


@st.composite
def predicate(draw):
    name, vals = draw(st.sampled_from(_FIELDS))
    op = draw(st.sampled_from(_OPS))
    val = draw(vals)
    return name, op, val


@st.composite
def where_clause(draw):
    preds = draw(st.lists(predicate(), min_size=1, max_size=3))
    joiners = draw(
        st.lists(st.sampled_from(["AND", "OR"]), min_size=len(preds) - 1, max_size=len(preds) - 1)
    )
    return preds, joiners


def _sql_lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


_SPARK_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


@pytest.fixture(scope="module")
def duck_orders():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMALL}/orders.parquet'"
    )
    yield con
    con.close()


class TestRandomPredicates:
    @settings(
        max_examples=30,
        deadline=None,
        derandomize=True,  # deterministic corpus across runs/rounds
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(clause=where_clause())
    def test_spark_matches_duckdb(self, spark, duck_orders, clause):
        preds, joiners = clause
        # SQL precedence: AND binds tighter than OR — group AND-runs first
        frags = []
        and_groups: list = [[]]
        for i, (name, op, val) in enumerate(preds):
            c = _SPARK_OPS[op](F.col(name), val)
            frags.append(f"{name} {op if op != '!=' else '<>'} {_sql_lit(val)}")
            if i and joiners[i - 1] == "OR":
                and_groups.append([])
            and_groups[-1].append(c)

        def all_of(cs):
            out = cs[0]
            for c in cs[1:]:
                out = out & c
            return out

        cond = all_of(and_groups[0])
        for grp in and_groups[1:]:
            cond = cond | all_of(grp)
        sql_where = ""
        for i, f_ in enumerate(frags):
            sql_where += (f" {joiners[i - 1]} " if i else "") + f_

        got = sorted(
            r[0]
            for r in load_table(spark, "orders", SF_SMALL)
            .filter(cond)
            .select("o_orderkey")
            .collect()
        )
        want = sorted(
            r[0]
            for r in duck_orders.execute(
                f"SELECT o_orderkey FROM orders WHERE {sql_where}"
            ).fetchall()
        )
        assert got == want, f"WHERE {sql_where}: {len(got)} vs {len(want)} rows"
