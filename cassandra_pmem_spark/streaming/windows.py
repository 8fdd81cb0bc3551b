"""Event-time windowed analytics (SURVEY §2.10).

The reference has no streaming query surface; its time-series machinery is
TWCS time-bucketing (db/compaction/TimeWindowCompactionStrategy.java), TTL
(db/LivenessInfo.java) and the CDC commit-log stream
(db/commitlog/CommitLogSegmentManagerCDC.java:42). The Structured Streaming
analogs here work identically over a batch DataFrame or a readStream
DataFrame — same functions, so correctness is oracle-checkable in batch and
the streaming path is exercised in tests with a file/memory source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (TWCS-bucket analog).

    Batch: plain hash aggregate. Streaming: pass watermark to bound state —
    late rows beyond it are dropped, which is the state-eviction behavior
    TTL provides in the reference."""
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    gb = [F.window(F.col(ts_col), duration).alias("win")] + [F.col(k) for k in (keys or [])]
    # decimal-accumulated sum → double: order-independent, so the answer is
    # bit-identical at any partition count (and matches the DuckDB oracle).
    return events.groupBy(*gb).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("win.start").alias("bucket"),
        *[F.col(k) for k in (keys or [])],
        "n_events",
        "sum_value",
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = None,
) -> DataFrame:
    if watermark and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), duration, slide).alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal accumulation: order-independent, oracle-matching
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("bucket"), "n_events", "sum_value")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based). Streaming uses session_window state;
    batch uses the same function — Spark supports it in both modes."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_with_watermark(
    events: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """At-least-once redelivery dedup — the hinted-handoff/batchlog-replay
    analog (hints/, batchlog/BatchlogManager.java): exactly-once downstream
    by dropping duplicate keys within the watermark horizon."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return events.dropDuplicates(key_cols)


def read_cdc_stream(spark, path: str, schema) -> DataFrame:
    """CDC source analog (CommitLogSegmentManagerCDC.java:42): an append-only
    directory of files consumed as a stream."""
    return spark.readStream.schema(schema).parquet(path)
