"""token() — partitioner token of a partition key.

Reference: cql3/functions/TokenFct.java:61 over dht/Murmur3Partitioner.java:41
(Murmur3 128-bit, first 64 bits, of the composite-serialized key). Semantics
that matter to queries: a *deterministic, uniformly-distributed total order*
over partition keys, enabling token-range scans and token-ordered paging.

We use xxhash64 (JVM-side, codegen-friendly, available as a Spark builtin)
rather than bit-identical Murmur3: same query semantics (stable hash order),
zero Python in the hot path. Documented deviation per SURVEY §2.8.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_column(partition_key: Sequence[str] | str) -> Column:
    cols = [partition_key] if isinstance(partition_key, str) else list(partition_key)
    return F.xxhash64(*[F.col(c) for c in cols])


def with_token(df, partition_key: Sequence[str] | str, name: str = "token"):
    return df.withColumn(name, token_column(partition_key))
