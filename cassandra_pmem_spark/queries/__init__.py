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
# Round-8 layout: (1) the three registry queries that have NEVER had a
# driver row; (2) the write-path set — cql/writes.py was edited in r6,
# r7 AND r8 (empty-collection complex deletion, one-element-IN
# normalization) so its r2/r4-era evidence is stale-by-edit; (3) the
# r1-era rows; (4) the r2-era backlog, oldest evidence first. tpch_q1
# IS entry(), smoke-checked every round, so it stays out. New round-8
# queries displace the tail of tier (4) as they land.
_PRIORITY: tuple[str, ...] = (
    # -- (1) never driver-evidenced
    "cql_collection_text_ops",  # list append/prepend/discard + set ops
    "multimodal_video_dedup",  # majority-vote frame-fingerprint dedup
    "streaming_exactly_once_sink",  # idempotent snapshot sink replay
    # -- (2) write-path machinery edited r6+r7+r8 (evidence stale-by-edit)
    "cql_batch_apply",  # BATCH prepare-then-apply atomicity
    "cql_lwt_conditional",  # IF EXISTS / IF col=… conditions
    "cql_delete_tombstones",  # row/range/column/element tombstones
    "cql_truncate_reload",  # TRUNCATE drops mutations + tombstones
    "cql_counter_fold",  # counter delta folding
    "cql_collection_mutations",  # +/- collection write ops
    "cql_ddl_roundtrip",  # KEYSPACE/TABLE/TYPE/ALTER statement DDL
    "cql_ttl_expiry",  # USING TTL + expiry at read clock
    "cql_upsert_lww_cells",  # cell-level LWW disjoint-column writes
    # -- (3) round-8 additions (each name added only once its
    #    implementation lands — the assert below fires on ghosts)
    "cql_create_mv_statement",  # CREATE MATERIALIZED VIEW statement form
    "cql_udf_statement",  # CREATE FUNCTION statement form (LANGUAGE sql)
    "cql_uda_statement",  # CREATE AGGREGATE statement form (HOF fold)
    "cql_list_cell_liveness",  # list/set element-granular writetime/TTL
    "cql_indexed_lookup",  # 2i-served EQ without ALLOW FILTERING
    "text_dsir_weights",  # DSIR hashed-ngram importance resampling
    "sim_ivf_topk",  # IVF ANN — re-windowed to earn an oracle-backed row
    # -- (4) r1-era evidence (oldest rows in the registry)
    "streaming_tumbling_batch",
    "streaming_session_batch",
    "cql_per_partition_limit",
    "cql_distinct_partitions",
    "cql_latest_events",
    "cql_from_json",
    "analytics_topk_orders",
    "analytics_set_ops",
    "analytics_count_distinct",
    # -- (5) r2-era backlog, as many as fit
    "cql_point_lookup",
    "cql_multipoint_in",
    "cql_clustering_slice",
    "cql_contains",
    "cql_is_not_null",
    "cql_group_by_pk_prefix",
    "cql_group_limit",
    "cql_static_column",
    "cql_select_json",
    "cql_parsed_select",
    "cql_duration_arithmetic",
    "cql_uda_weighted_avg",
    "csv_roundtrip",
    "jsonl_roundtrip",
    "virtual_system_tables",
    "streaming_sliding_batch",
    "analytics_explode_wordcount",
    "analytics_rollup",
    "analytics_salted_agg",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
)
# Deliberately outside the window this round: the full r7-green set
# (round-4 temporal/snapshot/BPE/graph tier + the round-6 tier — all
# re-evidenced in the r7 window), the r3/r4 sets (tpch q2–q22, token
# scans, sketches, dedup/multimodal tiers), and seven r2-era rows that
# did not fit (multimodal_meta, text_fingerprint, text_langid,
# text_quality, text_token_counts, cql_allow_filtering — r4 —
# cql_term_select — r3). Those queue first for round 9 along with
# whatever round 8 edits.


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
