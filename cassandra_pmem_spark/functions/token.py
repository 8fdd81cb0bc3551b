"""token() — partitioner token of a partition key.

Reference: cql3/functions/TokenFct.java:61 over dht/Murmur3Partitioner.java:41
(Murmur3 128-bit, first 64 bits, of the composite-serialized key). Semantics
that matter to queries: a *deterministic, uniformly-distributed total order*
over partition keys, enabling token-range scans and token-ordered paging.

Hash selection:

- single-column **bigint** keys → the bit-exact Cassandra Murmur3 token
  (functions/murmur3.py, vectorized Arrow kernel), so token literals from
  a real cluster carry over and the DuckDB oracle reproduces values;
- composite or non-bigint keys → xxhash64 (JVM builtin): same query
  semantics (stable hash order), different values — the composite-key
  serialization (CompositeType.java length-prefixed layout) is not
  reproduced. Documented deviation per SURVEY §2.8.

Pass the table schema to get the murmur3 path; without it the caller gets
the xxhash64 analog (type-blind, always safe).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def token_column(
    partition_key: Sequence[str] | str, schema: T.StructType | None = None
) -> Column:
    cols = [partition_key] if isinstance(partition_key, str) else list(partition_key)
    if schema is not None and len(cols) == 1:
        dtype = {f.name: f.dataType for f in schema.fields}.get(cols[0])
        if isinstance(dtype, T.LongType):
            from cassandra_pmem_spark.functions.murmur3 import murmur3_token_column

            return murmur3_token_column(cols[0])
    return F.xxhash64(*[F.col(c) for c in cols])


def with_token(df, partition_key: Sequence[str] | str, name: str = "token"):
    return df.withColumn(name, token_column(partition_key, df.schema))
