"""Counter columns (db/CounterMutation.java:49, db/marshal/CounterColumnType.java).

Cassandra counters are commutative increment-only cells; the materialized
value is the sum of all increments. As a batch transform over an increments
log this is one partial+final hash aggregate — the ideal Spark shape."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_counters(
    increments: DataFrame, key: Sequence[str], delta_col: str = "delta"
) -> DataFrame:
    """Materialize counter values: groupBy(key).agg(sum(delta))."""
    return increments.groupBy(*key).agg(F.sum(delta_col).cast("long").alias(delta_col))
