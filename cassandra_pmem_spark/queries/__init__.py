"""Query registry: every SURVEY.md §2 operator exposed as a (spark_fn,
oracle_sql) pair for the driver's DuckDB correctness gate.

Each module defines QUERIES: dict[name, (callable(spark, sf_dir) ->
DataFrame, oracle_sql | None)]. None ⇒ non-portable semantics (e.g.
xxhash64 token order, LSH bucketing) — driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from cassandra_pmem_spark.queries import (
        analytics,
        cql_queries,
        extras,
        pipeline_queries,
        tpch_more,
    )

    out: dict = {}
    for mod in (cql_queries, analytics, tpch_more, extras, pipeline_queries):
        overlap = out.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(mod.QUERIES)
    return out
