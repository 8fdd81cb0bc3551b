"""Structured Streaming tests (SURVEY §2.10 analogs): the same window/session
functions run under a real readStream with watermarks, plus foreachBatch MV
maintenance and at-least-once dedup. Streaming results are compared against
the batch twin on identical input — one implementation, two modes.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_pmem_spark.catalog import TABLES, load_table
from cassandra_pmem_spark.streaming.mv import maintain_view_stream, refresh_view_batch
from cassandra_pmem_spark.streaming.windows import (
    dedup_with_watermark,
    session_windows,
    tumbling_agg,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def stream_dir(spark):
    """Events written as parquet micro-files — the CDC-directory analog
    (CommitLogSegmentManagerCDC.java:42)."""
    d = tempfile.mkdtemp(prefix="cps_stream_")
    ev = load_table(spark, "events", SF_SMALL)
    ev.repartition(4).write.mode("overwrite").parquet(f"{d}/input")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_stream(spark, stream_dir):
    schema = load_table(spark, "events", SF_SMALL).schema
    return spark.readStream.schema(schema).parquet(f"{stream_dir}/input")


def _run_to_memory(df, name, checkpoint, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _norm(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


class TestStreamingWindows:
    def test_tumbling_stream_matches_batch_below_watermark(self, spark, stream_dir):
        """Append-mode streaming emits exactly the batch result for every
        window that closed before the final watermark; windows still open at
        end-of-stream are withheld — that withholding IS the
        watermark/late-data contract (TTL-like state eviction, SURVEY §2.10)."""
        stream = _read_stream(spark, stream_dir)
        out = tumbling_agg(stream, ts_col="ts", duration="1 hour", keys=["event_type"],
                           watermark="2 hours")
        _run_to_memory(out, "tumbling_t", f"{stream_dir}/ckpt_tumb")
        got = spark.sql("SELECT * FROM tumbling_t").collect()

        batch = load_table(spark, "events", SF_SMALL)
        want = tumbling_agg(batch, ts_col="ts", duration="1 hour", keys=["event_type"]).collect()

        gset, wset = set(_norm(got)), set(_norm(want))
        assert gset <= wset  # streaming never invents rows
        assert len(got) > 0
        # every withheld window lies within the final-watermark horizon
        max_ts = batch.agg(F.max("ts")).collect()[0][0]
        import datetime

        horizon = max_ts - datetime.timedelta(hours=3)  # 2h watermark + 1h window
        missing_buckets = {r[0] for r in (wset - gset)}
        assert all(b >= str(horizon) for b in missing_buckets), (
            f"windows before horizon {horizon} missing: {sorted(missing_buckets)[:3]}"
        )

    def test_session_stream_matches_batch_below_watermark(self, spark, stream_dir):
        stream = _read_stream(spark, stream_dir)
        out = session_windows(stream, ts_col="ts", gap="30 minutes", key="user_id",
                              watermark="1 hour")
        _run_to_memory(out, "session_t", f"{stream_dir}/ckpt_sess")
        got = spark.sql("SELECT * FROM session_t").collect()

        batch = load_table(spark, "events", SF_SMALL)
        want = session_windows(batch, ts_col="ts", gap="30 minutes", key="user_id").collect()
        gset, wset = set(_norm(got)), set(_norm(want))
        assert gset <= wset
        assert len(got) > 0.9 * len(want)  # only tail sessions withheld


class TestLateData:
    def test_late_rows_beyond_watermark_are_dropped(self, spark, stream_dir):
        """True late-data drop: batch 1 carries hours of recent events and
        advances the watermark; batch 2 replays two-day-old events. Had the
        late rows been accepted, their (long-closed) window would be emitted;
        the watermark must filter them instead. File arrival order is pinned
        via mtimes (FileStreamSource processes oldest-first)."""
        import datetime
        import glob
        import os
        import shutil
        import time

        stage = f"{stream_dir}/late_stage"
        d = f"{stream_dir}/late_input"
        os.makedirs(d, exist_ok=True)
        base = datetime.datetime(2024, 6, 1, 12, 0, 0)
        on_time = [
            (i, base + datetime.timedelta(minutes=10 * i), 1.0) for i in range(20)
        ]  # spans 12:00 → 15:10
        late = [(100 + i, base - datetime.timedelta(days=2), 1.0) for i in range(5)]
        schema = "event_id LONG, ts TIMESTAMP, value DOUBLE"

        now = time.time()
        for sub, rows, mtime in (("a", on_time, now - 100), ("b", late, now)):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
                f"{stage}/{sub}"
            )
            (src,) = glob.glob(f"{stage}/{sub}/part-*.parquet")
            dst = f"{d}/{sub}.parquet"
            shutil.copy(src, dst)
            os.utime(dst, (mtime, mtime))

        stream = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = tumbling_agg(stream, ts_col="ts", duration="1 hour", watermark="1 hour")
        q = (
            out.writeStream.format("memory")
            .queryName("late_t")
            .outputMode("append")
            .option("checkpointLocation", f"{stream_dir}/ckpt_late")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.lastProgress["batchId"] + 1 >= 2  # really two micro-batches
        rows = spark.sql("SELECT bucket FROM late_t").collect()
        buckets = [str(r["bucket"]) for r in rows]
        # early on-time windows finalized below the 14:10 final watermark
        assert "2024-06-01 12:00:00" in buckets and "2024-06-01 13:00:00" in buckets
        # windows still open at the final watermark are withheld
        assert "2024-06-01 15:00:00" not in buckets
        # Spark's watermark contract is one-directional: on-time data is
        # never dropped; data later than the watermark MAY still aggregate
        # (observed: the 2024-05-30 window emits — legal, final). The hard
        # guarantee append mode gives is each window finalizes exactly once:
        assert len(buckets) == len(set(buckets)), buckets


class TestStreamingDedup:
    def test_duplicate_events_dropped(self, spark, stream_dir):
        # duplicate the input: same event_ids twice → dedup keeps one each
        stream = _read_stream(spark, stream_dir)
        doubled = stream.union(stream)
        out = dedup_with_watermark(doubled, key_cols=["event_id"], ts_col="ts",
                                   watermark="1 hour")
        _run_to_memory(out, "dedup_t", f"{stream_dir}/ckpt_dedup")
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_t").collect()[0]
        n_src = load_table(spark, "events", SF_SMALL).count()
        assert got["n"] == got["d"] == n_src


class TestStatefulCounters:
    def test_running_counters_across_microbatches(self, spark, stream_dir):
        """applyInPandasWithState counter fold: state accumulates across
        micro-batches (maxFilesPerTrigger=1 forces multiple), and the final
        per-key totals equal the batch counter fold."""
        from cassandra_pmem_spark.streaming.stateful import running_counters

        schema = load_table(spark, "events", SF_SMALL).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/input")
            .withColumn("delta", F.floor(F.col("value") * 100).cast("long"))
            .select("user_id", "delta")
        )
        out = running_counters(stream, key_col="user_id", delta_col="delta")
        q = (
            out.writeStream.format("memory")
            .queryName("counters_t")
            .outputMode("update")
            .option("checkpointLocation", f"{stream_dir}/ckpt_counters")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.lastProgress["batchId"] >= 1  # really ran multiple batches

        # update-mode memory sink: last emission per key is the final state
        got = {
            r["user_id"]: r["total"]
            for r in spark.sql(
                "SELECT user_id, total FROM ("
                "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_updates DESC) rn"
                "  FROM counters_t) WHERE rn = 1"
            ).collect()
        }
        want = {
            r["user_id"]: r["total"]
            for r in load_table(spark, "events", SF_SMALL)
            .groupBy("user_id")
            .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("total"))
            .collect()
        }
        assert got == want


class TestMaterializedView:
    def test_foreachbatch_mv_matches_batch_refresh(self, spark, stream_dir):
        """MV maintenance (ViewUpdateGenerator.java:45 analog): streaming
        foreachBatch upsert == batch re-derivation on the same input."""
        base_cols = ["user_id", "event_type", "value", "event_id"]
        stream = _read_stream(spark, stream_dir).select(*base_cols)
        view_path = f"{stream_dir}/mv_store"
        q = maintain_view_stream(
            stream, view_path, view_key=["user_id"], checkpoint=f"{stream_dir}/ckpt_mv",
            writetime_col="event_id",
        ).start()
        q.awaitTermination(120)

        got = spark.read.parquet(view_path)
        want = refresh_view_batch(
            load_table(spark, "events", SF_SMALL).select(*base_cols),
            view_key=["user_id"],
            writetime_col="event_id",
        )
        assert _norm(got.collect()) == _norm(want.collect())
        assert got.count() > 0


class TestExactlyOnceSnapshotSink:
    def test_redelivered_batch_id_is_a_noop(self, spark, tmp_path):
        import pandas as pd

        from cassandra_pmem_spark.sources.snapshots import SnapshotTable
        from cassandra_pmem_spark.streaming.snapshot_sink import (
            applied_batch_ids,
            exactly_once_appender,
        )

        t = SnapshotTable(str(tmp_path / "sink"))
        t.create(spark.createDataFrame(pd.DataFrame({"k": [0], "v": [0]})))
        apply = exactly_once_appender(t)
        b1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1, 2]}))
        b2 = spark.createDataFrame(pd.DataFrame({"k": [3], "v": [3]}))
        apply(b1, 0)
        apply(b2, 1)
        n = t.read(spark).count()
        # crash-replay: the SAME (batch, id) pair arrives again
        apply(b1, 0)
        apply(b2, 1)
        assert t.read(spark).count() == n == 4
        assert applied_batch_ids(t) == {0, 1}

    def test_ledger_survives_vacuum(self, spark, tmp_path):
        """expire_versions() must not erase the exactly-once guarantee:
        the applied-batch ledger is carried forward into every manifest,
        so a batch redelivered after its original manifest was expired
        is still recognized and skipped."""
        import pandas as pd

        from cassandra_pmem_spark.sources.snapshots import SnapshotTable
        from cassandra_pmem_spark.streaming.snapshot_sink import (
            applied_batch_ids,
            exactly_once_appender,
        )

        t = SnapshotTable(str(tmp_path / "sink3"))
        t.create(spark.createDataFrame(pd.DataFrame({"k": [0], "v": [0]})))
        apply = exactly_once_appender(t)
        batches = [
            spark.createDataFrame(pd.DataFrame({"k": [i], "v": [i]}))
            for i in (1, 2, 3)
        ]
        for i, b in enumerate(batches):
            apply(b, i)
        n = t.read(spark).count()
        # vacuum past the manifests that stamped batches 0 and 1
        gone = t.expire_versions(keep_last=1)
        assert gone["expired_versions"]
        assert applied_batch_ids(t) == {0, 1, 2}
        # crash replay redelivers an already-vacuumed batch id
        apply(batches[0], 0)
        assert t.read(spark).count() == n
        assert t.current_version() == 4  # nothing new committed

    def test_full_stream_rerun_is_idempotent(self, spark, stream_dir, tmp_path):
        """A fresh checkpoint forces Structured Streaming to redeliver
        the whole source as batch 0 — the sink must recognize the id
        and commit nothing new."""
        import pandas as pd

        from cassandra_pmem_spark.sources.snapshots import SnapshotTable
        from cassandra_pmem_spark.streaming.snapshot_sink import (
            exactly_once_appender,
        )

        t = SnapshotTable(str(tmp_path / "sink2"))
        t.create(
            spark.createDataFrame([], "event_id BIGINT")
        )
        apply = exactly_once_appender(t)

        def run(cp):
            src = _read_stream(spark, stream_dir).select("event_id")
            q = (
                src.writeStream.foreachBatch(apply)
                .option("checkpointLocation", str(tmp_path / cp))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("cp1")
        n = t.read(spark).count()
        v = t.current_version()
        assert n > 0
        run("cp2")  # fresh checkpoint ⇒ full redelivery as batch 0
        assert t.read(spark).count() == n
        assert t.current_version() == v  # no new version committed
