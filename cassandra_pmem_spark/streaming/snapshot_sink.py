"""Idempotent streaming sink into the snapshot table layer —
end-to-end exactly-once from a replayable source to versioned storage.

Structured Streaming's contract is at-least-once into `foreachBatch`:
after a crash between sink write and checkpoint commit, the SAME
(batch_id, data) pair is delivered again. The classic fix (the
reference's analog is the batchlog replay being idempotent against
LWW-reconciled tables, `db/batchlog/BatchlogManager.java`) is a
transactional sink keyed by batch id: the sink records each applied
batch id durably IN THE SAME COMMIT as the data, and a redelivered id
becomes a no-op.

The snapshot layer gives that for free: a manifest commit is atomic
(staged rename), so stamping the batch id into the manifest `op`
field makes "data + applied-marker" one atomic unit. On redelivery
the sink scans the manifest chain for the id and skips — no side
channel, no two-phase dance, and the audit trail (which batch
produced which version) is the version history itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cassandra_pmem_spark.sources.snapshots import SnapshotTable


def applied_batch_ids(table: SnapshotTable) -> set[int]:
    """Batch ids already committed, read from the manifest chain."""
    out: set[int] = set()
    for v in table.versions():
        op = table.manifest(v).get("op", "")
        if op.startswith("stream-batch:"):
            out.add(int(op.split(":", 1)[1]))
    return out


def exactly_once_appender(table: SnapshotTable):
    """Build a foreachBatch function that appends each micro-batch to
    `table` exactly once: the batch id rides in the manifest `op`
    field of the SAME atomic commit as the data files, so a
    redelivered batch (crash replay, checkpoint rewind) is detected
    and skipped. Pass to `stream.writeStream.foreachBatch(...)`."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batch_ids(table):
            return  # redelivery — already atomically committed
        parent = table.current_version()
        m = table.manifest(parent)
        table._commit(
            m["files"] + table._write_files(batch),
            f"stream-batch:{batch_id}",
            parent,
            delete_files=m.get("delete_files"),
            key_cols=m.get("key_cols"),
            stats=m.get("stats"),
        )

    return apply
