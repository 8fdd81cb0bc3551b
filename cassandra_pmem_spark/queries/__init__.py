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
# Round-6 layout — round 5 shipped this window with two names that had no
# implementation behind them, which broke all_queries() and zeroed
# CORRECTNESS_r05; both queries now exist (cql_queries.py), so the layout
# re-lands intact: (1) the 32 registry queries that have NEVER had a
# driver row — the round-4 temporal / snapshot-storage / batch-analytics
# / BPE / graph / ORC / Arrow tier that landed past the window; (2) the
# two queries NEW in round 6; (3) the oldest evidence rows (r1-era).
# That fills the window to exactly 50. tpch_q1 IS entry(), smoke-checked
# every round. Remaining r1-era rows (streaming_tumbling_batch,
# streaming_session_batch) plus the r2 set queue first for round 7.
_PRIORITY: tuple[str, ...] = (
    # -- (1) never driver-evidenced (landed past round 4's window)
    "source_orc_roundtrip",  # ORC write/read round trip
    "source_arrow_ipc",  # Arrow IPC interchange round trip
    "pipeline_epoch_shuffle",  # deterministic per-epoch shard shuffle
    "pipeline_chunk_documents",  # context-window chunking with overlap
    "graph_pagerank_exact",  # integer-exact iterative PageRank
    "sim_semantic_dedup",  # SemDeDup within-cluster embedding dedup
    "streaming_sketch_merge",  # foreachBatch HLL merge under redelivery
    "temporal_asof_join",  # as-of join vs DuckDB native ASOF oracle
    "temporal_asof_forward",  # forward as-of vs DuckDB ASOF <=
    "temporal_range_join",  # bucketized interval join
    "temporal_rollup_cascade",  # hypertable continuous-aggregate rollup
    "temporal_overlap_join",  # interval-interval overlap join
    "temporal_gapfill_locf",  # dense gap-filled series with LOCF
    "source_zorder_layout",  # Morton-interleave multi-dim layout
    "text_fuzzy_join",  # SymSpell edit-distance-1 join
    "analytics_sessionization",  # batch gaps-and-islands sessions
    "analytics_pivot",  # PIVOT into per-type columns
    "analytics_salted_join",  # skew-salted join == plain join
    "text_bpe_train",  # real BPE merge training, unrolled-CTE oracle
    "text_bpe_encode",  # BPE encode with the learned merge table
    "streaming_stream_join",  # real stream-stream watermarked join
    "analytics_cube",  # CUBE with grouping_id disambiguation
    "source_compaction_roundtrip",  # small-file compaction, rows exact
    "source_snapshot_timetravel",  # versioned manifests, time travel
    "source_snapshot_incremental",  # delta-file incremental refresh
    "source_snapshot_deletes",  # merge-on-read tombstones + compaction
    "source_snapshot_merge",  # MERGE INTO versioned storage (LWW)
    "source_snapshot_schema_evolution",  # add-column without rewrite
    "source_snapshot_pruned_scan",  # manifest min/max file skipping
    "analytics_scd2_intervals",  # SCD2 validity intervals from a change log
    "analytics_funnel",  # ordered funnel (conditional-min aggregates)
    "analytics_retention_cohorts",  # cohort retention triangle
    # -- (2) new or edited in round 6 (implemented, oracle-backed)
    "cql_token_scan_uuid",  # uuid/timeuuid/inet Murmur3 key tokens
    "cql_collection_writetime",  # per-cell collection writetime/TTL
    "cql_tuple_relation",  # now parsed-statement slices + tuple-IN form
    "multimodal_audio_flac",  # Rice/LPC hot paths vectorized (bit-exact)
    "dedup_components_star",  # large-star/small-star O(log n) components
    "pipeline_domain_mixture",  # temperature-scaled domain mixing
    "dedup_substring_spans",  # ExactSubstr span-level dedup
    "multimodal_image_dedup",  # dHash over real PNG + banded hamming join
    "multimodal_audio_dedup",  # FLAC block-energy fingerprint dedup
    "cql_map_cell_liveness",  # statement-form per-cell map writetime
    # -- (3) oldest evidence first (r1-era)
    "cql_blob_conv",
    "cql_collection_access",
    "cql_map_entry",
    "cql_like",
    "cql_time_fcts",
    "cql_cast_arithmetic",
    "cql_upsert_lww_rows",
    "cql_global_agg",
)
# Deliberately outside the window this round: everything with r3/r4
# driver evidence (the full round-4 window set, tpch q2–q22, token
# scans, sim_lsh, multimodal features, sketches, dedup tier) plus the
# r2-era set (cql_point_lookup — r2, not r1: it re-entered the round-2
# window — plus cql_multipoint_in, cql_clustering_slice, cql_contains,
# cql_upsert_lww_cells, cql_ttl_expiry, cql_select_json,
# cql_parsed_select, csv_roundtrip, virtual_system_tables, …), eight
# r1 rows that did not fit (cql_per_partition_limit,
# cql_distinct_partitions, analytics_topk_orders, analytics_set_ops,
# cql_latest_events, cql_from_json, streaming_tumbling_batch,
# streaming_session_batch), and three round-6 queries added after the
# window filled (multimodal_video_dedup, cql_collection_text_ops,
# streaming_exactly_once_sink) — those never-evidenced rows lead round
# 7's window, then the r1/r2 backlog.


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
