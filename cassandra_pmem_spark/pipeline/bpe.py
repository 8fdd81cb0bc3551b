"""Corpus-wide BPE (byte-pair-encoding) tokenizer training and
encoding — the real merge-learning loop (Sennrich et al. 2016, the
public algorithm behind GPT-2/RoBERTa vocabularies), not a regex
approximation: each round counts every adjacent symbol pair across the
WHOLE corpus, merges the most frequent pair into a fresh symbol, and
repeats. This is the canonical "needs a distributed engine" step of a
training-data pipeline — pair counting is a full-corpus aggregation
per round.

Model: a symbol is one character; each merge mints a fresh
single-character symbol from the Unicode private-use area
(chr(0xE000 + round)), so intermediate corpora stay plain strings and
`replace` (leftmost non-overlapping, identical semantics in Spark,
DuckDB, and Python) IS the merge application. Pair frequencies count
every adjacent position ('aaa' contributes ('a','a') twice), matching
the reference BPE formulation; ties break lexicographically so
training is deterministic at any parallelism.

Scale shape: each round is ONE map-side-combined aggregation over
exploded 2-char pairs (the shuffle carries (pair, partial-count) rows,
never documents), ONE bounded single-row argmax collect (the same
bounded-driver-materialization contract as the IVF quantizer), and a
narrow `replace` projection. The corpus is cached per round and the
previous round unpersisted, so lineage stays flat — at 100 TB you
train on a stratified sample (pipeline/packing.stratified_sample) and
encode the full corpus with the learned table, exactly like every
production tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PUA_BASE = 0xE000  # first private-use codepoint used for merge symbols


def _adjacent_pairs(text_col: str) -> Column:
    """Every adjacent 2-symbol window of the string, one array element
    per position (overlaps counted — the BPE pair-frequency model)."""
    return F.expr(
        f"CASE WHEN length({text_col}) < 2 THEN array() "
        f"ELSE transform(sequence(1, length({text_col}) - 1), "
        f"i -> substring({text_col}, i, 2)) END"
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    train_cap: int | None = None,
) -> list[tuple[int, str, int]]:
    """Learn `n_merges` BPE merges over the corpus. Returns
    [(round, pair, freq)] with round starting at 1; merge symbol for
    round r is chr(PUA_BASE + r - 1). Stops early if no pair occurs
    twice.

    `train_cap` bounds the TRAINING corpus (the quantizer-sample pattern,
    similarity.py ivf_topk): a deterministic hash-ordered sample of at
    most `train_cap` documents is cached once, and every merge round
    aggregates only the sample — so a 32k-merge vocabulary costs 32k
    tiny cached-sample jobs instead of 32k full-corpus passes. At 100 TB
    this is the only sane shape (production tokenizers train on ~1e6-doc
    samples); `apply_bpe` still encodes the FULL corpus with the learned
    table. None = train on everything. The sample key is md5(text) —
    uniform pseudo-random, deterministic at any parallelism, and
    computable bit-identically by other engines (DuckDB md5() yields the
    same hex), so a capped run stays exactly oracle-reproducible."""
    corpus = df.select(F.col(text_col).alias("__t"))
    merges: list[tuple[int, str, int]] = []
    if train_cap is not None:
        # hash-ordered limit: deterministic at any parallelism, and the
        # sample (not the corpus) is what every merge round re-reads
        corpus = corpus.orderBy(
            F.md5(F.col("__t").cast("binary")).asc(), F.col("__t").asc()
        ).limit(train_cap)
    # ONE Spark job per merge round: the argmax aggregation below is the
    # first action over each round's cached corpus, so it materializes
    # the cache as a side effect — no separate count() job. The previous
    # round's cache stays pinned until the round that READS it has run
    # (unpersisting earlier would force a lineage replay), then drops.
    # Only the capped sample is cached up front; an uncapped corpus
    # (full-scale training) is read from source once and cached from the
    # first merged round on, as before.
    if train_cap is not None:
        corpus = corpus.cache()
    prev = None
    try:
        for r in range(1, n_merges + 1):
            top = (
                corpus.select(
                    F.explode(_adjacent_pairs("__t")).alias("pair")
                )
                .groupBy("pair")
                .agg(F.count("*").alias("freq"))
                .orderBy(F.col("freq").desc(), F.col("pair"))
                .limit(1)
                .collect()
            )
            # corpus is materialized now; its parent cache is releasable
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["freq"] < 2:
                break
            pair, freq = top[0]["pair"], int(top[0]["freq"])
            merges.append((r, pair, freq))
            nxt = corpus.select(
                F.replace(
                    F.col("__t"), F.lit(pair), F.lit(chr(PUA_BASE + r - 1))
                ).alias("__t")
            ).cache()
            prev, corpus = corpus, nxt
    finally:
        corpus.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Encode: apply the learned merges in training order (a chain of
    narrow `replace` projections — zero shuffles) and append
    `n_tokens` = symbol count after merging (every symbol is one
    character by construction)."""
    out = df
    col = F.col(text_col)
    for r, pair, _ in merges:
        col = F.replace(col, F.lit(pair), F.lit(chr(PUA_BASE + r - 1)))
    return out.withColumn("__enc", col).withColumn(
        "n_tokens", F.length("__enc").cast("long")
    ).drop("__enc")
