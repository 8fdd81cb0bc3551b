"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1 shape) at sf0.001.
queries()      — every implemented SURVEY §2 operator, (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-runnable ANSI SQL twin for each query (omitted for
                 non-portable ops: xxhash64 token order, LSH buckets, numpy
                 entropy — driver records rows-only checks for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cassandra_pmem_spark.queries.analytics import tpch_q1_pricing_summary

    return tpch_q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cassandra_pmem_spark.queries import all_queries

    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from cassandra_pmem_spark.queries import all_queries

    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
