"""Benchmark decontamination for training corpora.

Before training, pipelines strip documents that overlap evaluation
sets: a training doc is CONTAMINATED when it shares at least one
n-word gram (n = 8 here — the GPT-3 appendix-C / PaLM convention is
8–13) with any benchmark item. The scale shape matters more than the
rule: the benchmark side is tiny (eval sets are megabytes), so its
distinct gram set is broadcast and the corpus side never shuffles
for the probe — `explode` is narrow, the semi-join is map-side, and
the only exchange is the per-doc hit count aggregation. At 100 TB
the corpus is read once, filtered at scan speed.

Gram construction reuses `dedup.word_shingles` (normalized text,
max(len−n+1, 1) windows) so the DuckDB oracle can rebuild identical
grams with list SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_pmem_spark.pipeline.dedup import word_shingles


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram probe set of the benchmark side (column `g`)."""
    return (
        bench.select(
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g")
        )
        .distinct()
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination verdict against a benchmark set.

    Returns (id_col, n_hits, contaminated): n_hits = how many DISTINCT
    benchmark grams the doc contains, contaminated = n_hits > 0. The
    benchmark gram set is broadcast — corpus rows are probed where they
    already live; one aggregation shuffle on (doc_id) for the counts."""
    probe = benchmark_grams(bench, text_col, n)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"),
    )
    hits = (
        doc_grams.join(F.broadcast(probe), "g")
        .groupBy(id_col)
        .agg(F.count("g").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
