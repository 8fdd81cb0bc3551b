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

# First-50 window budget. Order groups: (1) LLM-pipeline operators —
# 0 driver rows in round 1; (2) TPC-H q17–q22 — past the round-1
# window; (3) extras (static/UDA/virtual/CSV/JSONL/rollup/…) — same;
# (4) one representative per §2 class from the round-1-green set.
_PRIORITY: tuple[str, ...] = (
    # -- LLM data-pipeline operators (dedup / similarity / text / multimodal)
    "dedup_exact_docs",
    "dedup_minhash_jaccard",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cascade_docs",
    "dedup_lsh_pairs",
    "sim_bruteforce_topk",
    "sim_neardup_exact",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "text_token_counts",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "multimodal_meta",
    "multimodal_features",
    # -- TPC-H tail (q17–q22)
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_dormant_customers",
    # -- extras (each a distinct §2 row)
    "cql_static_column",
    "cql_collection_mutations",
    "cql_uda_weighted_avg",
    "virtual_system_tables",
    "csv_roundtrip",
    "cql_is_not_null",
    "cql_duration_arithmetic",
    "cql_group_limit",
    "streaming_sliding_batch",
    "jsonl_roundtrip",
    "analytics_explode_wordcount",
    "analytics_salted_agg",
    "analytics_rollup",
    "cql_ddl_roundtrip",
    "cql_udt_access",
    # -- token() scan (Murmur3 oracle upgrade)
    "cql_token_scan",
    # -- one representative per §2 class, round-1 green
    "cql_point_lookup",
    "cql_clustering_slice",
    "cql_contains",
    "cql_upsert_lww_cells",
    "cql_ttl_expiry",
    "cql_counter_fold",
    "cql_parsed_select",
    "cql_select_json",
    "cql_group_by_pk_prefix",
    "streaming_tumbling_real",
    "streaming_session_real",
)
# deliberately past the window (redundant driver evidence):
# tpch_q1_pricing_summary IS entry() — the driver smoke-checks it every
# round; cql_cast_arithmetic was round-1 green and carries broad unit
# coverage (test_fixture_semantics casts suite)


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from cassandra_pmem_spark.queries import (
        analytics,
        cql_queries,
        extras,
        pipeline_queries,
        tpch_more,
    )

    merged: dict = {}
    for mod in (cql_queries, analytics, tpch_more, extras, pipeline_queries):
        overlap = merged.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        merged.update(mod.QUERIES)

    missing = [n for n in _PRIORITY if n not in merged]
    assert not missing, f"_PRIORITY names not in registry: {missing}"

    out: dict = {n: merged[n] for n in _PRIORITY}
    out.update({n: q for n, q in merged.items() if n not in out})
    return out
