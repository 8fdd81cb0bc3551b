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
# Round-10 layout (second session): (1) the four entries the r9 window
# overflowed; (2) the round-10 NEW queries — first session's
# roles/grants, now()-as-write-term and index targets, then the second
# session's trigger tier, QueryPager tier, and the SSTable big-format
# round trip (never-evidenced, so they outrank everything after the
# overflow set); (3) queries whose machinery round 10 edited
# (stale-by-edit; the trigger hook touched the shared DML routing, so
# the write-model exemplars re-enter); (4) the r3 TPC-H backlog (oldest
# evidence after q1, which IS entry()); (5) the r4 tier. Rows displaced
# past 50 queue for round 11.
_PRIORITY: tuple[str, ...] = (
    # -- (1) r9 window overflow (queued last round, evidence r3/r4)
    "streaming_session_real",
    "streaming_tumbling_real",
    "text_sasi_analyzer",
    "cql_allow_filtering",
    # -- (2) new round-10 queries
    "cql_now_writes",  # now()/uuid() folded from the coordinator clock
    "cql_roles_grants",  # DCL tier: roles, grants, LIST shapes
    "cql_index_targets",  # keys()/values()/entries()/full() index kinds
    "cql_trigger_audit",  # ITrigger tier: CREATE/DROP TRIGGER + augment
    "cql_paging",  # QueryPager tier: row/group/global pages, PagingState
    "source_sstable_roundtrip",  # big-format SSTable codec + splits
    "source_sstable_pointread",  # bloom -> summary -> index point reads
    # -- (3) stale-by-edit (round-10 edits to their machinery)
    "cql_fn_terms",
    "cql_token_rhs",
    "cql_agg_nested",
    "cql_create_mv_statement",
    "mv_refresh_batch",
    "cql_time_fcts",
    "analytics_retention_cohorts",
    "multimodal_audio_mp1_subband",
    "cql_collection_mutations",
    # -- (3b) edited by the second half of round 10: the LIKE gate and
    # pattern semantics, the kind-aware index selection, the extreme
    # bound fixups in LWT/DELETE, the avg/cast varint arithmetic, and
    # the map CONTAINS/entry compile paths
    "cql_like",
    "cql_indexed_lookup",
    "cql_lwt_conditional",
    "cql_delete_tombstones",
    "cql_cast_arithmetic",
    "cql_contains",
    "cql_map_entry",
    "cql_global_agg",
    # -- (4) r3 backlog: every TPC-H shape except q1 (= entry())
    "tpch_q2_min_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_customers",
    # -- (5) r4 backlog, oldest first
    "cql_token_scan_timestamp",
    "sketch_hll_registers",
    "sketch_bloom_words",
    "sketch_countmin_cells",
    "sketch_histogram_bins",
    "sketch_runtime_filtered_join",
    "dedup_minhash_jaccard",
    "dedup_lsh_pairs",
    "dedup_cascade_docs",
    "dedup_connected_components",
    "dedup_line_level",
    "bucketed_colocated_join",
    "streaming_cdc_dedup",
    "streaming_stateful_counters",
    "pipeline_stratified_sample",
    "pipeline_pack_sequences",
)
# Deliberately outside the window this round: the r9-evidenced set (50
# rows green in CORRECTNESS_r09, machinery untouched unless listed in
# tier 3) and the r7/r8-evidenced tiers. The remaining r4 rows
# (multimodal codec tier, text tier, source tier, sim_* quantizers)
# queue first for round 11 along with whatever round 10 edits.


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
