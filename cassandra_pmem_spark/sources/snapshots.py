"""Snapshot table layer: versioned, time-travelable parquet tables.

The reference gets snapshot isolation from SSTable immutability — a
read operates on the fixed set of segments alive when it started, and
`nodetool snapshot` is just a hardlink of that set
(`db/ColumnFamilyStore.java` snapshot paths). The lake-native
re-expression is a manifest layer over immutable parquet files, the
core idea of Iceberg/Delta reduced to its essentials:

- data files are immutable, written once under `data/` with unique
  names; a VERSION is a JSON manifest listing exactly the files that
  are members of that version;
- `append` writes new files and a manifest = parent's list + new
  files; `overwrite` writes a manifest listing only the new files —
  the OLD files stay on disk, so every prior version remains readable
  (time travel) and `rollback` is O(1): a new manifest that repeats an
  old file list, no data movement;
- commits are atomic: the manifest is staged and `os.rename`d into
  place, and the rename's fail-if-exists semantics (via `os.link`
  on POSIX would be the cluster-grade fence; locally rename into a
  fresh version path suffices) makes two racing writers produce two
  distinct version numbers or one clean failure — never a torn
  manifest;
- readers resolve a version ONCE and then hold an immutable file
  list; concurrent appends/overwrites/rollbacks cannot change what an
  in-flight reader sees.

Version numbers are dense integers (no wall-clock in the metadata —
determinism is a correctness feature here, see SCALE.md). Manifests
carry per-file min/max stats (footer-derived at commit time), so
`read_range` plans its file list from the manifest alone — the
Iceberg-manifest read path; `sources/zorder.py` + `compaction.py`
provide the layout half that makes those ranges narrow.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path.rstrip("/")
        self.data_dir = os.path.join(self.path, "data")
        self.snap_dir = os.path.join(self.path, _SNAPDIR)

    # -- metadata ---------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.snap_dir):
            return []
        out = []
        for f in os.listdir(self.snap_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def current_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError(f"not a snapshot table: {self.path}")
        return vs[-1]

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        p = os.path.join(self.snap_dir, f"v{v}.json")
        with open(p) as fh:
            return json.load(fh)

    # -- commits ----------------------------------------------------------

    def _write_files(
        self,
        df: DataFrame,
        cluster_by: list[str] | None = None,
        n_files: int = 8,
    ) -> list[str]:
        """Stage the frame as immutable uniquely-named parquet files and
        return their table-relative paths. `cluster_by` range-partitions
        and sorts the new files on those columns so their manifest
        min/max ranges come out narrow and non-overlapping — the layout
        half of manifest pruning (pair with a `sources/zorder.morton_code`
        column for multi-dimensional clustering)."""
        if cluster_by:
            df = df.repartitionByRange(
                n_files, *cluster_by
            ).sortWithinPartitions(*cluster_by)
        stage = os.path.join(self.data_dir, f"stage-{uuid.uuid4().hex}")
        df.write.mode("errorifexists").parquet(stage)
        names = []
        for f in sorted(os.listdir(stage)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                final = f"part-{uuid.uuid4().hex}.parquet"
                os.rename(
                    os.path.join(stage, f),
                    os.path.join(self.data_dir, final),
                )
                names.append(os.path.join("data", final))
        # remove the staging residue (_SUCCESS etc.)
        for f in os.listdir(stage):
            os.remove(os.path.join(stage, f))
        os.rmdir(stage)
        return names

    def _file_stats(self, rel_path: str) -> dict:
        """Per-file min/max for int/string columns, read once from the
        parquet footer at commit time — the Iceberg-manifest pruning
        stats. Values are stored JSON-safe (ints and strings only;
        other types are skipped, which only disables pruning on them)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(os.path.join(self.path, rel_path)).metadata
        lo: dict = {}
        hi: dict = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if not isinstance(mn, (int, str)) or isinstance(mn, bool):
                    continue
                name = col.path_in_schema
                lo[name] = mn if name not in lo else min(lo[name], mn)
                hi[name] = mx if name not in hi else max(hi[name], mx)
        return {c: [lo[c], hi[c]] for c in lo}

    def _commit(
        self,
        files: list[str],
        op: str,
        parent: int | None,
        delete_files: list[str] | None = None,
        key_cols: list[str] | None = None,
        stats: dict | None = None,
        stream_batch: int | None = None,
    ) -> int:
        version = 1 if parent is None else parent + 1
        all_stats = dict(stats or {})
        for f in list(files) + list(delete_files or []):
            if f not in all_stats:
                all_stats[f] = self._file_stats(f)
        all_stats = {f: all_stats[f] for f in sorted(all_stats)
                     if f in files or f in (delete_files or [])}
        # The applied-stream-batch ledger rides in EVERY manifest, carried
        # forward from the parent — so the exactly-once redelivery check
        # (streaming/snapshot_sink.py) survives expire_versions() pruning
        # the manifests that originally stamped the ids.
        ledger: list[int] = []
        if parent is not None:
            ledger = list(self.manifest(parent).get("stream_batches", []))
        if stream_batch is not None and stream_batch not in ledger:
            ledger.append(stream_batch)
        os.makedirs(self.snap_dir, exist_ok=True)
        tmp = os.path.join(
            self.snap_dir, f".tmp-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "parent": parent,
                    "op": op,
                    "files": sorted(files),
                    "delete_files": sorted(delete_files or []),
                    "key_cols": key_cols or [],
                    "stats": all_stats,
                    "stream_batches": ledger,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        final = os.path.join(self.snap_dir, f"v{version}.json")
        try:
            # atomic publish: link() fails with EEXIST if another writer
            # already claimed this version — no check-then-rename window
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit: version {version} already exists"
            ) from None
        finally:
            os.remove(tmp)
        return version

    def create(
        self, df: DataFrame, cluster_by: list[str] | None = None
    ) -> int:
        if self.versions():
            raise ValueError(f"table already exists: {self.path}")
        os.makedirs(self.data_dir, exist_ok=True)
        return self._commit(
            self._write_files(df, cluster_by), "create", None
        )

    def append(self, df: DataFrame) -> int:
        parent = self.current_version()
        m = self.manifest(parent)
        return self._commit(
            m["files"] + self._write_files(df),
            "append",
            parent,
            delete_files=m.get("delete_files"),
            key_cols=m.get("key_cols"),
            stats=m.get("stats"),
        )

    def overwrite(self, df: DataFrame) -> int:
        """New membership; pending deletes are irrelevant to it and are
        dropped from the new version (old versions keep theirs)."""
        parent = self.current_version()
        return self._commit(self._write_files(df), "overwrite", parent)

    def rollback(self, to_version: int) -> int:
        """O(1): commit a new version whose file list repeats an old
        one — no data moves, history stays intact."""
        parent = self.current_version()
        old = self.manifest(to_version)
        return self._commit(
            old["files"],
            f"rollback:{to_version}",
            parent,
            delete_files=old.get("delete_files"),
            key_cols=old.get("key_cols"),
            stats=old.get("stats"),
        )

    def delete_keys(self, keys: DataFrame, key_cols: list[str]) -> int:
        """Merge-on-read row deletes — the lake-native tombstone
        (`db/DeletionInfo.java` / Iceberg v2 equality-delete files):
        the commit writes only the KEY tuples as delete files; reads
        anti-join them. Nothing is rewritten at delete time — delete
        cost is O(|keys|), exactly like writing a tombstone cell."""
        parent = self.current_version()
        m = self.manifest(parent)
        if m.get("key_cols") and m["key_cols"] != key_cols:
            raise ValueError(
                f"delete key mismatch: table uses {m['key_cols']}"
            )
        new_dels = self._write_files(keys.select(*key_cols))
        return self._commit(
            m["files"],
            "delete",
            parent,
            delete_files=m.get("delete_files", []) + new_dels,
            key_cols=key_cols,
            stats=m.get("stats"),
        )

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        writetime_col: str = "writetime",
    ) -> int:
        """MERGE INTO: apply an upsert batch (full-row mutations carrying
        a writetime) to the current version with row-granular LWW — the
        CDC-apply path against versioned storage. Current rows and
        updates union into ONE max_by hash aggregate
        (operators/upsert.upsert_lww_rows: one shuffle on the key, no
        window sort), and the survivors commit as an overwrite, so the
        pre-merge version stays readable and a bad batch is one O(1)
        rollback away."""
        from cassandra_pmem_spark.operators.upsert import upsert_lww_rows

        current = self.read(spark)
        merged = upsert_lww_rows(
            current.unionByName(updates), key_cols, writetime_col
        )
        return self.overwrite(merged)

    def materialize_deletes(self, spark: SparkSession) -> int:
        """Major compaction for tombstones: rewrite the live rows (the
        anti-joined read) into fresh files and commit a version with no
        delete files — reads stop paying the anti-join, history keeps
        the merge-on-read versions."""
        parent = self.current_version()
        live = self.read(spark, parent)
        return self._commit(
            self._write_files(live), "materialize", parent
        )

    def expire_versions(self, keep_last: int = 2) -> dict:
        """Retention GC (Iceberg expireSnapshots / the reference's
        snapshot cleanup): drop all but the newest `keep_last` version
        manifests, then delete data/delete files referenced ONLY by
        expired versions. Files shared with any surviving version stay
        — immutability makes the liveness check a set union over the
        surviving manifests, no reference counting. Time travel to
        expired versions is gone by definition; surviving reads are
        untouched. Returns {expired_versions, deleted_files}."""
        vs = self.versions()
        keep = set(vs[-keep_last:]) if keep_last > 0 else set()
        expired = [v for v in vs if v not in keep]
        if not expired:
            return {"expired_versions": [], "deleted_files": 0}
        live: set[str] = set()
        for v in keep:
            m = self.manifest(v)
            live.update(m["files"])
            live.update(m.get("delete_files") or [])
        dead: set[str] = set()
        for v in expired:
            m = self.manifest(v)
            for f in list(m["files"]) + list(m.get("delete_files") or []):
                if f not in live:
                    dead.add(f)
        for f in sorted(dead):
            p = os.path.join(self.path, f)
            if os.path.exists(p):
                os.remove(p)
        for v in expired:
            os.remove(os.path.join(self.snap_dir, f"v{v}.json"))
        return {"expired_versions": expired, "deleted_files": len(dead)}

    # -- reads ------------------------------------------------------------

    def prune_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[str], int]:
        """Manifest-level file skipping (the Iceberg-manifest read
        path): keep only files whose stored [min, max] for `col`
        overlaps [lo, hi]. Files with no stats for the column are kept
        (pruning is an optimization, never a filter). Returns
        (kept_files, total_files) — planning happens entirely on the
        manifest, no footer reads, no Spark job."""
        m = self.manifest(version)
        stats = m.get("stats", {})
        kept = []
        for f in m["files"]:
            st = stats.get(f, {}).get(col)
            if st is None or not (st[1] < lo or st[0] > hi):
                kept.append(f)
        return kept, len(m["files"])

    def read_range(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Range read through manifest pruning: only overlapping files
        reach `spark.read` (the scan task count shrinks with the
        selectivity), and the exact [lo, hi] filter still applies —
        pruning can only skip files that cannot match."""
        from pyspark.sql import functions as F

        m = self.manifest(version)
        kept, _total = self.prune_files(col, lo, hi, version)
        if not kept:
            base = self.read(spark, version)
            return base.filter(F.lit(False))
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, f) for f in kept]
        )
        dels = m.get("delete_files") or []
        if dels:
            keys = spark.read.parquet(
                *[os.path.join(self.path, f) for f in dels]
            ).dropDuplicates()
            df = df.join(keys, on=m["key_cols"], how="left_anti")
        return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Resolve the version's immutable file list once; the returned
        frame is pinned to those files no matter what commits later.
        Pending delete files apply as a broadcast-eligible anti-join on
        the declared key columns (merge-on-read). Schema evolution:
        files written before a column was added simply lack it —
        `mergeSchema` unions the footer schemas and old rows read the
        added column as NULL, the same add-column semantics as the
        reference's ALTER TABLE ADD (no rewrite of existing data)."""
        m = self.manifest(version)
        files = [os.path.join(self.path, f) for f in m["files"]]
        if not files:
            raise ValueError("empty snapshot")
        df = spark.read.option("mergeSchema", "true").parquet(*files)
        dels = m.get("delete_files") or []
        if dels:
            keys = spark.read.parquet(
                *[os.path.join(self.path, f) for f in dels]
            ).dropDuplicates()
            df = df.join(keys, on=m["key_cols"], how="left_anti")
        return df
