"""Materialized-view maintenance (db/view/View.java,
ViewUpdateGenerator.java:45, TableViews.java).

Cassandra MVs are auto-maintained denormalized copies keyed differently
from the base table. Analytics analog: a derived table kept current by a
Structured Streaming foreachBatch upsert — each micro-batch merges new base
rows into the view store with last-write-wins on the view PK, reusing the
batch upsert operator (operators/upsert.py) so batch and streaming share
one LWW implementation.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from cassandra_pmem_spark.operators.upsert import upsert_lww_rows


def refresh_view_batch(
    base: DataFrame, view_key: Sequence[str], writetime_col: str = "writetime"
) -> DataFrame:
    """Full re-derivation of an MV from the base table (batch path):
    re-key and LWW-collapse on the view primary key."""
    return upsert_lww_rows(base, key=view_key, writetime_col=writetime_col)


def maintain_view_stream(
    stream: DataFrame,
    view_path: str,
    view_key: Sequence[str],
    checkpoint: str,
    writetime_col: str = "writetime",
):
    """Incremental MV maintenance: foreachBatch upsert into a parquet view
    store. Merge = union(current, delta) → LWW on view key → overwrite.

    (With a table format that supports MERGE — Delta/Iceberg — the rewrite
    becomes a keyed merge; parquet overwrite keeps this container-stdlib.)"""

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch.sparkSession
        if os.path.exists(view_path):
            current = spark.read.parquet(view_path)
            merged = upsert_lww_rows(
                current.unionByName(batch.select(*current.columns)),
                key=view_key,
                writetime_col=writetime_col,
            )
        else:
            merged = upsert_lww_rows(batch, key=view_key, writetime_col=writetime_col)
        merged.write.mode("overwrite").parquet(view_path)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
