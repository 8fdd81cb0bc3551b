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
# rule: edited since last green driver evidence ⇒ re-enter the window).
# Round-3 groups: (1) never-green or new queries; (2) queries whose code
# changed this round (dedup cache removal, streaming state-partition
# sizing, DDL/write-parser rework, token routing); (3) TPC-H q2–q22 —
# q2–q16 carry only round-1 evidence and all dim joins were rerouted
# through maybe_broadcast in round 2, whose estimator was memoized this
# round; (4) analytics set (round-1 evidence only); (5) remaining slots
# re-verify round-1-only cql rows. Round-2-green, untouched queries
# (text_*, dedup exact/minhash/simhash/ngram, sim brute/neardup,
# multimodal_meta, extras, upsert/ttl/counter, …) rest outside.
_PRIORITY: tuple[str, ...] = (
    # -- (1) never-green in any round, or new this round
    "cql_collection_mutations",
    "multimodal_features",
    "sim_lsh_topk",
    "sim_ivf_rerank",
    "sim_ivf_topk",
    "cql_token_scan_text",
    "cql_token_scan_composite",
    # -- (2) code changed this round
    "dedup_lsh_pairs",
    "streaming_tumbling_real",
    "streaming_session_real",
    "cql_ddl_roundtrip",
    "cql_udt_access",
    "cql_token_scan",
    # -- (3) TPC-H q2–q22
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
    # -- (4) analytics set (round-1 evidence only; topk, count_distinct and
    # set_ops yield their slots to never-green round-3 queries — they stay
    # green in the local full-registry gate)
    "analytics_window_rank",
    "analytics_window_running",
    "analytics_events_hourly",
    # -- (1b) new this round: write-path text surface, MV, bucketed join, CDC
    "cql_delete_tombstones",
    "cql_lwt_conditional",
    "cql_batch_apply",
    "cql_truncate_reload",
    "cql_udf_select",
    "mv_refresh_batch",
    "bucketed_colocated_join",
    "streaming_cdc_dedup",
    "multimodal_features_jpeg",
    "streaming_stateful_counters",
    "text_sasi_analyzer",
    "multimodal_frame_plan",
    "cql_term_select",
)
# group (5) re-verification slots are gone this round: never-green names
# outrank re-verification under the staleness rule (COVERAGE.md); the
# round-1-green cql rows stay covered by the local full-registry gate
# deliberately past the window (redundant driver evidence):
# tpch_q1_pricing_summary IS entry() — the driver smoke-checks it every
# round; every round-2-green query left out above is unedited since its
# evidence was recorded


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
