from cassandra_pmem_spark.streaming import windows, mv

__all__ = ["windows", "mv"]
