"""Query registry: every SURVEY.md §2 operator exposed as a (spark_fn,
oracle_sql) pair for the driver's DuckDB correctness gate.

Each module defines QUERIES: dict[name, (callable(spark, sf_dir) ->
DataFrame, oracle_sql | None)]. None ⇒ non-portable semantics (e.g.
LSH bucketing) — driver records a rows-only check.

ORDERING CONTRACT (see COVERAGE.md): the driver's correctness gate
records only the FIRST 50 registry entries, in `all_queries()` order.
`_PRIORITY` below therefore front-loads exactly the entries that need
driver evidence this round — one representative per SURVEY §2 operator
class plus every LLM-pipeline operator — and leaves redundant variants
(already driver-green in a prior round) at the tail. When adding a new
query, add its name to `_PRIORITY` if it introduces a new operator
class; the assert below catches typos.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# First-50 window budget, rotated by STALENESS each round (COVERAGE.md
# rule: edited since last green driver evidence ⇒ re-enter the window;
# never-evidenced entries outrank everything).
# Round-12 layout: (1) the four NEW round-12 queries (never evidenced);
# (2) stale-by-edit — the seven queries whose machinery round 12
# touched (see inline notes); (3) the ENTIRE r7-evidence backlog —
# the 39 registry rows whose latest driver evidence is
# CORRECTNESS_r07 (analytics/temporal/snapshot/dedup tiers). After
# this window records, every registry row's latest driver evidence
# is r8 or newer. Exactly 50 names.
_PRIORITY: tuple[str, ...] = (
    # -- (1) new in round 12 (never driver-evidenced)
    "cql_token_scan_frozen_num",
    "source_sstable_version_interop",
    "source_sstable_counter_cells",
    "source_sstable_wide_slice",
    # -- (2) stale-by-edit: round 12 touched their machinery —
    # the pager's materialized token column + buffer-only persist
    # (cql_paging), the Arrow-backed statement log frame and the
    # no-limit LWT point read (trigger/LWT/batch/UDT writes), the
    # sstable codec fast paths + ma..nb version dispatch
    # (roundtrip/pointread), frozen-pk comparator sort (token
    # scans), and the SASI complex-target rejection (index targets)
    "cql_paging",
    "cql_trigger_audit",
    "cql_lwt_conditional",
    "source_sstable_roundtrip",
    "source_sstable_pointread",
    "cql_token_scan_frozen",
    "cql_index_targets",
    # -- (3) the ENTIRE r7-evidence backlog (39) — after this
    # window records, the oldest driver evidence is r8
    "analytics_cube",
    "analytics_funnel",
    "analytics_pivot",
    "analytics_salted_join",
    "analytics_scd2_intervals",
    "analytics_sessionization",
    "cql_blob_conv",
    "cql_collection_access",
    "cql_collection_writetime",
    "cql_tuple_relation",
    "cql_upsert_lww_rows",
    "dedup_components_star",
    "dedup_substring_spans",
    "graph_pagerank_exact",
    "multimodal_audio_dedup",
    "multimodal_image_dedup",
    "pipeline_chunk_documents",
    "pipeline_domain_mixture",
    "pipeline_epoch_shuffle",
    "sim_semantic_dedup",
    "source_arrow_ipc",
    "source_compaction_roundtrip",
    "source_orc_roundtrip",
    "source_snapshot_deletes",
    "source_snapshot_incremental",
    "source_snapshot_merge",
    "source_snapshot_pruned_scan",
    "source_snapshot_schema_evolution",
    "source_snapshot_timetravel",
    "source_zorder_layout",
    "streaming_sketch_merge",
    "streaming_stream_join",
    "temporal_asof_forward",
    "temporal_asof_join",
    "temporal_gapfill_locf",
    "temporal_overlap_join",
    "temporal_range_join",
    "temporal_rollup_cascade",
    "text_fuzzy_join",
)
# Deliberately outside the window this round: everything with r8+
# evidence and unchanged machinery (including cql_udt_field_writes
# and cql_batch_apply, whose r9 evidence + this session's five full
# local gates cover the shared _log_frame edit — cql_trigger_audit
# and cql_lwt_conditional represent that edit in the window). After this window records, every registry
# row's latest driver evidence is r8 or newer.


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from cassandra_pmem_spark.queries import (
        analytics,
        cql_queries,
        extras,
        pipeline_queries,
        tpch_more,
        write_queries,
    )

    merged: dict = {}
    for mod in (cql_queries, analytics, tpch_more, extras, pipeline_queries, write_queries):
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(mod.QUERIES)

    missing = [n for n in _PRIORITY if n not in merged]
    assert not missing, f"_PRIORITY names not in registry: {missing}"

    out: dict = {n: merged[n] for n in _PRIORITY}
    out.update({n: q for n, q in merged.items() if n not in out})
    return out
