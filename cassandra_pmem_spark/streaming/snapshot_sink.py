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
(link-fenced publish), so stamping the batch id into the manifest
makes "data + applied-marker" one atomic unit. Every manifest carries
the cumulative `stream_batches` ledger forward from its parent, so
the redelivery check reads ONLY the current manifest — it keeps
working after `expire_versions()` prunes the historical manifests
that first recorded the ids. The audit trail (which batch produced
which version) is the version history's `op` fields while they live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cassandra_pmem_spark.sources.snapshots import SnapshotTable


def applied_batch_ids(table: SnapshotTable) -> set[int]:
    """Batch ids already committed: the current manifest's cumulative
    ledger (vacuum-proof), plus an op-field scan of whatever manifests
    still exist (covers tables written before the ledger field)."""
    out: set[int] = set()
    vs = table.versions()
    if vs:
        out.update(table.manifest(vs[-1]).get("stream_batches", []))
    for v in vs:
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
            stream_batch=batch_id,
        )

    return apply
