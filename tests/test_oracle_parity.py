"""The driver-mimicking correctness gate: every oracle-backed query in the
registry must match DuckDB row-for-row (order-insensitive, full float
precision) at sf0.001. This is the same comparison shape the driver runs at
sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL, normalize_rows, register_duck_views


def _registry():
    from cassandra_pmem_spark.queries import all_queries

    return all_queries()


NAMES = sorted(_registry().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = _registry()[name]
    sdf = fn(spark, SF_SMALL)
    srows = sdf.collect()
    scols = sdf.columns

    if sql is None:
        # rows-only contract: runs, stable schema, deterministic row count
        assert len(scols) > 0
        again = fn(spark, SF_SMALL).collect()
        assert len(again) == len(srows)
        return

    register_duck_views(duck, SF_SMALL)
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs oracle {len(drows)}"

    s_norm = normalize_rows([tuple(r) for r in srows], scols)
    d_norm = normalize_rows(drows, dcols)
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mism, f"{name}: first mismatches: {mism[:3]}"

    # The driver hashes per-pandas-dtype: equal VALUES with skewed dtype
    # kinds (e.g. DuckDB SUM(BIGINT)->HUGEINT->float64 vs Spark int64) is
    # still a red row. Guard the kinds, not just the normalized values.
    from scripts.driver_gate import dtype_kind_mismatches

    hard, _soft = dtype_kind_mismatches(sdf.toPandas(), duck.execute(sql).df())
    assert not hard, f"{name}: numeric dtype kind skew vs oracle: {hard}"


def test_gate_catches_hugeint_float_skew(spark, duck):
    """Regression stage for the round-3 defect class: a bare SUM(BIGINT)
    DuckDB oracle materializes float64 while Spark returns int64 — the
    gate's dtype check must flag it even though values compare equal."""
    from scripts.driver_gate import dtype_kind_mismatches

    spdf = spark.createDataFrame([(10194974,)], "cents long").toPandas()
    bad = duck.execute("SELECT SUM(CAST(10194974 AS BIGINT)) AS cents").df()
    hard, soft = dtype_kind_mismatches(spdf, bad)
    assert hard == ["cents: spark=int!=oracle=float"] and soft == []
    good = duck.execute(
        "SELECT CAST(SUM(CAST(10194974 AS BIGINT)) AS BIGINT) AS cents"
    ).df()
    assert dtype_kind_mismatches(spdf, good) == ([], [])
