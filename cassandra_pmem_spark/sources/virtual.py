"""Virtual tables — programmatic in-memory datasets computed on read
(db/virtual/AbstractVirtualTable.java:43,76,89; SimpleDataSet.java;
registered system views under db/virtual/SystemViewsKeyspace.java).

Spark analog: build a DataFrame from driver-side rows and register it as a
temp view. Virtual tables are tiny by construction (system state), so
driver-side construction is correct here — this is the one deliberate
exception to the no-driver-materialization rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cassandra_pmem_spark.catalog import TABLES


def simple_dataset(
    spark: SparkSession, rows: list[tuple], schema: T.StructType, view_name: str | None = None
) -> DataFrame:
    """SimpleDataSet analog: rows + declared schema → DataFrame (+ view)."""
    df = spark.createDataFrame(rows, schema)
    if view_name:
        df.createOrReplaceTempView(view_name)
    return df


_SYSTEM_TABLES_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("n_columns", T.IntegerType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("clustering", T.StringType()),
    ]
)


def system_tables_rows() -> list[tuple]:
    """Deterministic metadata rows for the `system_schema.tables`-style view
    (schema/TableMetadata.java; virtual SystemViewsKeyspace)."""
    rows = []
    for name in sorted(TABLES):
        m = TABLES[name]
        ck = ",".join(
            f"{c.name}:{'ASC' if c.ascending else 'DESC'}" for c in m.clustering
        )
        rows.append((name, len(m.schema.fields), ",".join(m.partition_key), ck))
    return rows


def system_tables(spark: SparkSession) -> DataFrame:
    """The engine's `system_schema.tables` virtual table."""
    return simple_dataset(spark, system_tables_rows(), _SYSTEM_TABLES_SCHEMA, "system_tables")


def system_tables_oracle_sql() -> str:
    """Literal-VALUES oracle for the virtual table (both sides derive from
    the same catalog, so the check verifies the Spark construction path)."""
    vals = ", ".join(
        f"('{n}', {c}, '{pk}', '{ck}')" for n, c, pk, ck in system_tables_rows()
    )
    return (
        f"SELECT * FROM (VALUES {vals}) "
        "AS t(table_name, n_columns, partition_key, clustering)"
    )
