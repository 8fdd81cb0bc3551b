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
# Round-11 layout: (1) the NEW round-11 queries (never evidenced);
# (2) stale-by-edit — the general-length murmur3 DuckDB twin was
# regenerated as a flat WITH chain this round, so every token-scan
# oracle it generates re-enters, plus the queries whose machinery
# round 11 touches (SASI LIKE modes, sstable COMPACTION/Summary
# components, the paging fixture, the FLAC encoder); (3) the entire
# r4-evidence backlog — the 38 registry rows whose latest driver
# evidence is CORRECTNESS_r04 (sketch/source/text/multimodal/sim
# tiers) — plus tpch_q1 (r1; it is also entry(), but window evidence
# beats entry smoke). Exactly 50 names.
_PRIORITY: tuple[str, ...] = (
    # -- (1) new in round 11
    "cql_token_scan_frozen",  # frozen collection/UDT pk murmur3 tokens
    # -- (2) stale-by-edit (round-11 edits to their machinery).
    # cql_token_scan itself is NOT here: its fixed-8 kernel and nested
    # DuckDB twin were untouched this round (only the general-length
    # twin regenerated); text_dsir_weights re-enters instead (its gram
    # pass gained the scan-parallelism guard).
    "text_dsir_weights",
    "cql_token_scan_text",
    "cql_token_scan_composite",
    "cql_token_scan_uuid",
    "cql_index_targets",  # SASI IndexMode LIKE matrix lands here
    "cql_like",
    "source_sstable_roundtrip",  # COMPACTION component + Summary levels
    "source_sstable_pointread",
    "cql_paging",  # fixture writes batched so the bench times the pager
    "multimodal_audio_flac",  # encoder hot-loop vectorization
    # -- (3) oldest driver evidence: r1/r4 backlog
    "tpch_q1_pricing_summary",
    "dedup_minhash_jaccard",
    "dedup_cascade_docs",
    "dedup_lsh_pairs",
    "dedup_connected_components",
    "dedup_line_level",
    "sim_ivf_rerank",
    "sim_sq8_topk",
    "sim_pq_adc_topk",
    "bucketed_colocated_join",
    "streaming_cdc_dedup",
    "streaming_stateful_counters",
    "multimodal_features_jpeg",
    "multimodal_features_jpeg_color",
    "multimodal_features_jpeg_progressive",
    "multimodal_audio_mp3_meta",
    "multimodal_audio_g711_adpcm",
    "multimodal_video_gif_frames",
    "multimodal_video_mp4_samples",
    "multimodal_video_y4m_frames",
    "multimodal_video_mjpeg_avi",
    "source_warc_ingest",
    "source_url_normalize",
    "source_compressed_chunks",
    "source_tar_webdataset",
    "text_html_extract",
    "text_repetition_signals",
    "text_bm25_scores",
    "text_pii_redact",
    "text_decontaminate",
    "text_ngram_lm_ppl",
    "text_c4_filters",
    "sketch_hll_registers",
    "sketch_bloom_words",
    "sketch_countmin_cells",
    "sketch_histogram_bins",
    "sketch_runtime_filtered_join",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
)
# Deliberately outside the window this round: everything with r7+
# evidence and unchanged machinery. After this window records, every
# registry row's latest driver evidence is r7 or newer.


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
