from cassandra_pmem_spark.cql.table import CqlTable, cql_table
from cassandra_pmem_spark.cql.validator import (
    InvalidRequest,
    Restriction,
    validate_group_by,
    validate_order_by,
    validate_restrictions,
)

__all__ = [
    "CqlTable",
    "cql_table",
    "InvalidRequest",
    "Restriction",
    "validate_group_by",
    "validate_order_by",
    "validate_restrictions",
]
