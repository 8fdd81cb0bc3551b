from cassandra_pmem_spark.operators.upsert import (
    upsert_lww_rows,
    upsert_lww_cells,
    apply_row_tombstones,
    apply_range_tombstones,
    filter_expired,
)
from cassandra_pmem_spark.operators.counters import fold_counters
from cassandra_pmem_spark.operators.aggregates import cql_avg, cql_sum

__all__ = [
    "upsert_lww_rows",
    "upsert_lww_cells",
    "apply_row_tombstones",
    "apply_range_tombstones",
    "filter_expired",
    "fold_counters",
    "cql_avg",
    "cql_sum",
]
