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
    # -- (1) never driver-evidenced (new round-9 operators)
    "cql_udt_field_writes",  # non-frozen UDT per-field cells (r9)
    "cql_alter_type",  # ALTER TYPE ADD/RENAME schema evolution (r9)
    "multimodal_audio_mp1_subband",  # ISO 11172-3 Layer I decode (r9)
    "cql_agg_nested",  # aggregates over nested selectables (r9)
    "cql_system_schema",  # SchemaKeyspace introspection tables (r9)
    "cql_fn_terms",  # constant function terms in write values (r9)
    "cql_describe_schema",  # DESCRIBE pasteable-DDL reconstruction (r9)
    "cql_token_rhs",  # token(<key literal>) as a relation RHS (r9)
    # -- (2) machinery edited in round 9 ⇒ evidence stale-by-edit
    #    writes.py (UDT decomposition, _validate_elem_ops, table() merge)
    "cql_batch_apply",
    "cql_lwt_conditional",
    "cql_delete_tombstones",
    "cql_truncate_reload",
    "cql_counter_fold",
    "cql_collection_mutations",
    "cql_ttl_expiry",
    "cql_upsert_lww_cells",
    "cql_collection_text_ops",
    "cql_list_cell_liveness",
    "cql_map_cell_liveness",
    #    ddl.py / parser.py (UDA key binding, null-fold semantics, nested
    #    generics, ALTER TYPE, writetime(u.f) selectors)
    "cql_ddl_roundtrip",
    "cql_create_mv_statement",
    "cql_udf_statement",
    "cql_uda_statement",
    "cql_uda_weighted_avg",
    "cql_udf_select",
    "cql_parsed_select",
    "cql_udt_access",
    "cql_select_json",
    #    table.py (index selectivity ranking)
    "cql_indexed_lookup",
    #    bpe.py (train_cap md5 sample — now the proven path)
    "text_bpe_train",
    "text_bpe_encode",
    #    csv_copy.py (QUOTE/ESCAPE/multiline options, late r9)
    "csv_roundtrip",
    # -- (3) displaced r2-era rows (oldest evidence in the registry)
    "multimodal_meta",
    "sim_bruteforce_topk",
    "sim_neardup_exact",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_counts",
    # -- (4) r3-era backlog, oldest first
    "cql_term_select",
    "cql_token_scan",
    "cql_token_scan_composite",
    "cql_token_scan_text",
    "analytics_events_hourly",
    "analytics_window_rank",
    "analytics_window_running",
    "multimodal_features",
    "multimodal_frame_plan",
    "mv_refresh_batch",
    "sim_lsh_topk",
    "streaming_session_real",
    "streaming_tumbling_real",
    "text_sasi_analyzer",
    "cql_allow_filtering",
)
# Deliberately outside the window this round: the full r8-green set
# (write-path r6/r7/r8 tier re-evidenced in the r8 window, the round-8
# statement forms, r1-era rows, and the r2-era tier-5 backlog — all
# green in CORRECTNESS_r08), and the r4 sets (token-scan variants,
# sketches, dedup/multimodal tiers, tpch q10-q22 whose evidence is r3/r4
# but which bench.py re-runs every round). Remaining r3/r4 rows queue
# first for round 10 along with whatever round 9 edits.


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
