"""Bucketed-table layout — the co-located-join / shuffle-elision path.

The reference co-locates data by partition key via consistent hashing
(dht/Murmur3Partitioner.java) so single-partition reads touch one replica.
The Spark analog for *joins and aggregations* is bucketing: write both
fact tables bucketed by the join key and Spark's scan reports the hash
partitioning, so sort-merge joins and groupBys on that key skip the
Exchange entirely.

At 100 TB this is the difference between re-shuffling 100 TB per
lineitem⋈orders join and never shuffling it again: pay one write-time
shuffle, amortize it over every downstream query. The docstrings on the
TPC-H queries assume this layout for the scale plan; `bucketize` +
`co_located_join` make it concrete and the plan test asserts the Exchange
really disappears.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write df as a bucketed (and optionally sorted) managed table.

    sort_cols inside buckets ≈ clustering order inside a partition
    (ClusteringComparator analog): sorted buckets also elide the Sort
    before sort-merge joins."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the join key — planned without Exchange
    when bucket counts match (verified by test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
