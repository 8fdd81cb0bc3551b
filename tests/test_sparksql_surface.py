"""spark.sql surface parity: the engine's registered temp views answer SQL
statement text identically to the DataFrame-API implementations (entry point
B analog — prepared SQL over the same catalog)."""

from __future__ import annotations

import pytest

from cassandra_pmem_spark.catalog import load_tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    load_tables(spark, SF_SMALL, register=True)


def norm(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


class TestSqlStringParity:
    def test_q6_sql_matches_dataframe(self, spark):
        from cassandra_pmem_spark.queries.analytics import tpch_q6_forecast_revenue

        sql = spark.sql(
            """
            SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(30,10))) AS DOUBLE)
                   AS revenue
            FROM lineitem
            WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
            """
        )
        assert norm(sql) == norm(tpch_q6_forecast_revenue(spark, SF_SMALL))

    def test_q1_sql_matches_dataframe(self, spark):
        from cassandra_pmem_spark.queries.analytics import tpch_q1_pricing_summary

        sql = spark.sql(
            """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,10))) AS DOUBLE) AS sum_charge,
              CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS avg_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS avg_price,
              CAST(SUM(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS avg_disc,
              COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            """
        )
        assert norm(sql) == norm(tpch_q1_pricing_summary(spark, SF_SMALL))

    def test_window_sql_matches_dataframe(self, spark):
        from cassandra_pmem_spark.queries.cql_queries import cql_per_partition_limit

        sql = spark.sql(
            """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3
            """
        )
        assert norm(sql) == norm(cql_per_partition_limit(spark, SF_SMALL))
