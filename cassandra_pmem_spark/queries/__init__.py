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
# Round-13 layout: (1) the two NEW round-13 queries (never
# evidenced); (2) stale-by-edit — the sstable tier, the write-path
# tier, and the frozen-token queries whose machinery round 13 touched
# (see inline notes); (3) the ENTIRE r8-evidence backlog — the 29
# registry rows whose latest driver evidence is CORRECTNESS_r08;
# (4) one r9 fill. After this window records, every registry row's
# latest driver evidence is r9 or newer. Exactly 50 names.
_PRIORITY: tuple[str, ...] = (
    # -- (1) new in round 13 (never driver-evidenced): the
    # token-range-pruned distributed sstable scan, and the frozen
    # TIMESTAMP-element token lane (nested timestamps joined the
    # murmur3 covered set under the pinned-UTC session)
    "source_sstable_pruned_scan",
    "cql_token_scan_frozen_ts",
    # -- (2) stale-by-edit: round 13 touched their machinery — the
    # sstable wire codec fast paths (columnar reader, inlined cell
    # serializer, running-min stats, pyarrow LZ4 decode), the
    # WIDTH_BASE=64KiB promoted-index fix (wide_slice/pointread), the
    # nb write path (version_interop now writes nb+na+md+ma), the
    # prepare-time timestamp/date literal parsing + UTC-gated Arrow
    # log frame on the statement write path, and the frozen-token
    # resolver/_set_sort_key (timestamp elements)
    "cql_token_scan_frozen",
    "cql_token_scan_frozen_num",
    "source_sstable_roundtrip",
    "source_sstable_version_interop",
    "source_sstable_pointread",
    "source_sstable_wide_slice",
    "source_sstable_counter_cells",
    "cql_upsert_lww_rows",
    "cql_upsert_lww_cells",
    "cql_lwt_conditional",
    "cql_batch_apply",
    "cql_ttl_expiry",
    "cql_udt_field_writes",
    "cql_delete_tombstones",
    "cql_now_writes",
    "cql_counter_fold",
    "cql_trigger_audit",
    "cql_collection_writetime",
    # -- (3) the ENTIRE r8-evidence backlog (29) — after this window
    # records, the oldest driver evidence is r9
    "analytics_count_distinct",
    "analytics_explode_wordcount",
    "analytics_rollup",
    "analytics_salted_agg",
    "analytics_set_ops",
    "analytics_topk_orders",
    "cql_clustering_slice",
    "cql_distinct_partitions",
    "cql_duration_arithmetic",
    "cql_from_json",
    "cql_group_by_pk_prefix",
    "cql_group_limit",
    "cql_is_not_null",
    "cql_latest_events",
    "cql_multipoint_in",
    "cql_per_partition_limit",
    "cql_point_lookup",
    "cql_static_column",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "jsonl_roundtrip",
    "multimodal_video_dedup",
    "sim_ivf_topk",
    "streaming_exactly_once_sink",
    "streaming_session_batch",
    "streaming_sliding_batch",
    "streaming_tumbling_batch",
    "virtual_system_tables",
    # -- (4) next-oldest (r9) fill to exactly 50
    "csv_roundtrip",
)
# Deliberately outside the window this round: everything with r9+
# evidence and unchanged machinery. The statement-write edits
# (_parse_timestamp_text, the UTC gate on _log_frame, checked()'s
# timestamp/date branches) are represented by the eleven write-path
# queries in tier (2) plus this session's full local gates. After
# this window records, every registry row's latest driver evidence
# is r9 or newer.


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
