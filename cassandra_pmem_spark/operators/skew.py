"""Skew mitigation: salting for hot keys (the wide-partition problem).

The reference's analog pathology is the wide partition — one partition key
holding millions of rows makes its replica the hotspot (guardrails at
config/Config.java; compaction/TWCS mitigate on the write side). In Spark
the same key skews a shuffle: one reducer gets the giant group.

Two mitigations, composable with AQE's runtime skew-join splitting
(spark.sql.adaptive.skewJoin — on in session.py):

- salted_aggregate: two-phase aggregation via a salt column. Phase 1
  aggregates (key, salt) — the hot key fans out over `salt_buckets`
  reducers; phase 2 merges the partials. Works for any algebraic aggregate
  (give both the partial and the merge expression).
- salted_join: replicate the small side `salt_buckets`× and salt the big
  side, so a hot join key spreads over many tasks. Prefer broadcast when
  the small side fits; salting is for when it doesn't.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: Sequence[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs run per (key, salt); merge_aggs combine the partials per
    key. E.g. count: partial F.count('*').alias('c'), merge
    F.sum('c').alias('c'). Deterministic salt (hash of all columns mod
    buckets) keeps the plan reproducible."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets).alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*key, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    big gains __salt = hash(row) % n; small is exploded n× with every salt
    value; the join key becomes (on..., __salt) so a hot key's rows spread
    across n tasks instead of one."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % salt_buckets)
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_s, list(on) + ["__salt"], how)
    return out.drop("__salt")
