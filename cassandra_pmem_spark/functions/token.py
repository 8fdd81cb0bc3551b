"""token() — partitioner token of a partition key.

Reference: cql3/functions/TokenFct.java:61 over dht/Murmur3Partitioner.java:41
(Murmur3 128-bit, first 64 bits, of the composite-serialized key). Semantics
that matter to queries: a *deterministic, uniformly-distributed total order*
over partition keys, enabling token-range scans and token-ordered paging.

Hash selection:

- single-column **bigint** keys → the bit-exact Cassandra Murmur3 token
  (functions/murmur3.py, fixed-8-byte vectorized Arrow kernel);
- any other key whose column types are all long/int/text — single OR
  composite — → the general-length Murmur3 kernel over the reference
  serialization (single column: the type's raw bytes; composite:
  CompositeType.java's length-prefixed layout). Also bit-exact.
- keys containing an unsupported type (double, array, …) → xxhash64
  (JVM builtin): same query semantics (stable hash order), different
  values. Documented deviation per SURVEY §2.8 — now reached only by
  key types the reference itself would not use as partition keys here.

Pass the table schema to get the murmur3 paths; without it the caller
gets the xxhash64 analog (type-blind, always safe).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MURMUR_TYPES = (T.LongType, T.IntegerType, T.StringType)


def token_column(
    partition_key: Sequence[str] | str, schema: T.StructType | None = None
) -> Column:
    cols = [partition_key] if isinstance(partition_key, str) else list(partition_key)
    if schema is not None:
        by_name = {f.name: f.dataType for f in schema.fields}
        dtypes = [by_name.get(c) for c in cols]
        if len(cols) == 1 and isinstance(dtypes[0], T.LongType):
            from cassandra_pmem_spark.functions.murmur3 import murmur3_token_column

            return murmur3_token_column(cols[0])
        if all(isinstance(dt, _MURMUR_TYPES) for dt in dtypes):
            from cassandra_pmem_spark.functions.murmur3 import (
                murmur3_token_key_columns,
            )

            return murmur3_token_key_columns(cols, dtypes)
    return F.xxhash64(*[F.col(c) for c in cols])


def with_token(df, partition_key: Sequence[str] | str, name: str = "token"):
    return df.withColumn(name, token_column(partition_key, df.schema))
