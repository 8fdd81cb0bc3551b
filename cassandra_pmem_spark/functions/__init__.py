from cassandra_pmem_spark.functions.token import token_column
from cassandra_pmem_spark.functions import timefcts, casts, json_fcts, blob

__all__ = ["token_column", "timefcts", "casts", "json_fcts", "blob"]
