"""Small-file compaction — the lake-maintenance pass every 100 TB
deployment runs (the Spark-side analog of the reference's SSTable
compaction, `db/compaction/CompactionManager.java`: fold many small
immutable segments into few well-sized ones without changing a single
row).

Streaming sinks, incremental upserts, and fine-grained partition
writes all leave thousands of KB-scale files; scans then pay one task
+ one footer read per file and the driver pays listing latency. The
compactor rewrites a parquet directory to size-targeted files:

- file count = ceil(total_bytes / target_bytes), computed from the
  ACTUAL on-disk footprint (no guessed constants);
- `repartitionByRange` on the sort columns (or a round-robin
  `repartition` when none are given) so the rewritten files carry
  narrow, non-overlapping min/max footer stats — compaction is the
  natural moment to ALSO fix clustering (pair with
  `sources/zorder.zorder_write` for multi-dim layouts);
- write-audit-publish: the rewrite lands in a staging directory,
  row-count-audited, and only then swapped over the original. The swap
  is two renames — POSIX cannot exchange directories in one — so every
  intermediate state is made recoverable instead: the audit stamps an
  `_AUDITED` marker into staging before the swap begins, and
  `recover_compaction` (run automatically on entry) rolls an
  interrupted swap forward (marker present ⇒ finish the publish) or
  back (no marker ⇒ restore the original, discard staging). A crash at
  any point leaves a state recovery maps to exactly one outcome.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _n_data_files(path: str) -> int:
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


_AUDIT_MARKER = "_AUDITED"


def recover_compaction(path: str) -> str:
    """Repair any state an interrupted compact_parquet_dir left behind.

    States and their single mapped outcome:
    - `path` present, stray staging/old dirs → discard them ("none"/"cleaned");
    - `path` missing, staging carries the `_AUDITED` marker → the swap had
      passed its audit: finish the publish ("rolled-forward");
    - `path` missing, no audited staging, `.compact-old` present → the swap
      never reached publish: restore the original ("rolled-back").
    """
    base = path.rstrip("/")
    staging, old = base + ".compact-staging", base + ".compact-old"
    if os.path.isdir(path):
        cleaned = False
        marker = os.path.join(path, _AUDIT_MARKER)
        if os.path.isfile(marker):  # crash between publish and marker removal
            os.remove(marker)
            cleaned = True
        for d in (staging, old):
            if os.path.isdir(d):
                shutil.rmtree(d, ignore_errors=True)
                cleaned = True
        return "cleaned" if cleaned else "none"
    if os.path.isdir(staging) and os.path.isfile(
        os.path.join(staging, _AUDIT_MARKER)
    ):
        os.remove(os.path.join(staging, _AUDIT_MARKER))
        os.rename(staging, path)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
        return "rolled-forward"
    if os.path.isdir(old):
        os.rename(old, path)
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
        return "rolled-back"
    raise FileNotFoundError(f"no compaction state to recover at {path}")


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite `path` into ceil(size/target) files, optionally
    range-clustered on `sort_cols`. Returns a stats dict
    {files_before, files_after, bytes, rows}. The audit re-counts rows
    from the staged rewrite before publishing; on mismatch the staging
    directory is removed and the source is left untouched. An
    interrupted previous run is repaired first (recover_compaction)."""
    if os.path.isdir(path) or os.path.isdir(path.rstrip("/") + ".compact-old"):
        recover_compaction(path)
    files_before = _n_data_files(path)
    total = _dir_bytes(path)
    n_files = max(1, math.ceil(total / target_bytes))

    df = spark.read.parquet(path)
    rows_before = df.count()
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)

    staging = path.rstrip("/") + ".compact-staging"
    out.write.mode("overwrite").parquet(staging)

    rows_after = spark.read.parquet(staging).count()
    if rows_after != rows_before:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            f"compaction audit failed: {rows_before} rows in, "
            f"{rows_after} rows staged — source left untouched"
        )
    # audit passed: stamp the marker BEFORE the swap so a crash between
    # the two renames rolls forward, not into a missing table
    with open(os.path.join(staging, _AUDIT_MARKER), "w") as fh:
        fh.write(f"{rows_after}\n")
    old = path.rstrip("/") + ".compact-old"
    os.rename(path, old)
    os.rename(staging, path)
    os.remove(os.path.join(path, _AUDIT_MARKER))
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": _n_data_files(path),
        "bytes": total,
        "rows": rows_before,
    }
