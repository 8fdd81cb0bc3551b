"""Bit-exactness tests for the Cassandra Murmur3 partitioner token.

Ground truth is murmur3_token_py — a direct port of
utils/MurmurHash.java:174 hash3_x64_128 + Murmur3Partitioner.java:244
normalize for 8-byte bigint keys. Both engine backends (Spark decimal
arithmetic, DuckDB HUGEINT SQL) must match it value-for-value, including
the reference's sign-extension quirk (negative-byte keys) and the
Long.MIN_VALUE normalization edge."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_pmem_spark.functions.murmur3 import (
    murmur3_token_py,
    murmur3_token_subquery,
    with_murmur3_token,
)

EDGE_KEYS = [0, 1, -1, 2, 127, 128, 255, 256, -128, -129, 42, 10**6, -(10**6),
             2**31 - 1, -(2**31), 2**62, 2**63 - 1, -(2**63), 7, -5]


def _duck_tokens(vals):
    con = duckdb.connect()
    lits = ",".join(f"(CAST('{v}' AS BIGINT))" for v in vals)
    sub = murmur3_token_subquery(f"(VALUES {lits}) v(k)", "k", ["k"])
    rows = con.execute(f"SELECT k, token FROM {sub}").fetchall()
    con.close()
    return dict(rows)


class TestMurmur3Token:
    def test_spark_matches_reference_port(self, spark):
        df = spark.createDataFrame([(v,) for v in EDGE_KEYS], "k bigint")
        got = {r.k: r.token for r in with_murmur3_token(df, "k").collect()}
        assert got == {v: murmur3_token_py(v) for v in EDGE_KEYS}

    def test_duckdb_oracle_matches_reference_port(self):
        assert _duck_tokens(EDGE_KEYS) == {v: murmur3_token_py(v) for v in EDGE_KEYS}

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=20, unique=True))
    def test_duckdb_matches_python_property(self, vals):
        assert _duck_tokens(vals) == {v: murmur3_token_py(v) for v in vals}

    def test_normalize_min_value(self):
        # normalize(Long.MIN_VALUE) == Long.MAX_VALUE: no key hashes to
        # MIN, so probe the normalize step through the python port's
        # contract instead — every token must exceed LONG_MIN
        assert all(murmur3_token_py(v) > -(2**63) for v in EDGE_KEYS)

    def test_where_token_uses_murmur3_for_bigint_pk(self, spark):
        from cassandra_pmem_spark.cql.table import cql_table
        from tests.conftest import SF_SMALL

        t = cql_table(spark, "customer", SF_SMALL)
        rows = (
            t.where_token(">", 0).df().select("c_custkey").limit(5).collect()
        )
        keys = [r.c_custkey for r in rows]
        assert keys and all(murmur3_token_py(k) > 0 for k in keys)
