"""Training-data assembly operators: sequence packing and deterministic
stratified sampling.

These are the two steps between a cleaned corpus and a training run:

* **Sequence packing** — concatenate documents in a stable order and chunk
  the token stream into fixed-capacity bins (the standard "concat + chunk"
  layout GPT-style pretraining uses). The operator is pure window
  arithmetic: an exclusive running token sum per shard gives every
  document its global offset, and integer division by the bin capacity
  gives its bin and whether it straddles a boundary. No UDF, no state —
  one shuffle (by shard) at any corpus size, and each shard packs
  independently, so 1000 executors pack 1000 shards concurrently.

* **Stratified sampling** — per-stratum Bernoulli sampling keyed on the
  bit-exact Cassandra Murmur3 token of the document id
  (functions/murmur3.py; reference
  src/java/org/apache/cassandra/dht/Murmur3Partitioner.java:214-246).
  Hash-thresholding instead of `rand()` makes the sample REPRODUCIBLE:
  the same document set is kept at any partition count, any cluster
  size, any retry — the determinism contract SCALE.md documents for the
  whole engine. Rates are per-stratum (e.g. downsample English, keep all
  low-resource languages), the lever used to rebalance a 100 TB corpus.

Both are oracle-backed: the packing math is plain SQL window functions,
and the sampling threshold re-derives in DuckDB through the same
nested-subquery Murmur3 the token-scan oracles use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_pmem_spark.functions.murmur3 import murmur3_token_column_once
from cassandra_pmem_spark.pipeline.text import token_count


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a (shard, bin, offset) in the packed token
    stream.

    Documents are sharded by ``id % n_shards`` (deterministic; a hash
    shard works identically) and concatenated in id order within each
    shard. With ``start`` the exclusive running token sum:

        bin_id    = start // capacity
        end_bin   = (start + tokens - 1) // capacity
        is_split  = bin_id != end_bin   (document straddles a boundary)

    Columns out: id, shard, n_tokens, start_offset, bin_id, is_split.
    One shuffle (hash by shard for the window); scales linearly — shards
    pack independently and the window state is a single running sum."""
    toks = token_count(text_col).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        toks.alias("n_tokens"),
    ).withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    cap = F.lit(int(capacity)).cast("long")
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / cap).alias("bin_id"),
        (
            F.floor(F.col("start_offset") / cap)
            != F.floor(
                (F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / cap
            )
        ).alias("is_split"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    A document is kept iff ``pmod(murmur3_token(id), buckets) <
    rate(stratum) * buckets``. The Murmur3 token is the bit-exact
    Cassandra partitioner hash, so the decision is a pure function of the
    id — re-running at any parallelism, or on any engine that implements
    the same hash (the DuckDB oracle does), keeps EXACTLY the same rows.
    Adds ``sample_bucket`` so downstream audits can verify the rule."""
    bucket = F.pmod(murmur3_token_column_once(F.col(id_col)), F.lit(buckets))
    expr = F.lit(int(round(default_rate * buckets))).cast("long")
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(rate * buckets)))
        ).otherwise(expr)
    return (
        docs.withColumn("sample_bucket", bucket.cast("long"))
        .withColumn("keep_below", expr)
        .where(F.col("sample_bucket") < F.col("keep_below"))
    )


def domain_mixture_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    target_total: float = 1000.0,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-scaled domain mixture sampling — the multilingual-
    pretraining mixing rule (exponentiated domain weights, as in the
    mBERT/XLM-R recipes): domain d is sampled with probability

        r_d = min(1, target_total · p_d / n_d),   p_d = n_d^α / Σ n^α

    so α < 1 flattens the mixture: tail domains keep a larger fraction
    of their documents than head domains, while expected output size
    stays ≈ target_total. The keep decision reuses stratified_sample's
    deterministic Murmur3-bucket rule (threshold = floor(r_d·buckets +
    0.5)), so the sample is a pure function of (id, domain counts) —
    bit-reproducible at any parallelism, and recomputable by the DuckDB
    oracle.

    Shape: one tiny count aggregate per domain, a broadcast 1-row total,
    and a broadcast rates join back onto the scan — the document side
    never shuffles."""
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("__n"))
    w = counts.withColumn(
        "__w", F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    tot = w.agg(F.sum("__w").alias("__tw"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        domain_col,
        F.least(
            F.lit(buckets).cast("long"),
            F.floor(
                F.lit(float(target_total))
                * F.col("__w")
                / F.col("__tw")
                / F.col("__n")
                * F.lit(buckets)
                + F.lit(0.5)
            ).cast("long"),
        ).alias("keep_below"),
        F.col("__n").alias("domain_total"),
    )
    bucket = F.pmod(murmur3_token_column_once(F.col(id_col)), F.lit(buckets))
    return (
        docs.join(F.broadcast(rates), domain_col)
        .withColumn("sample_bucket", bucket.cast("long"))
        .where(F.col("sample_bucket") < F.col("keep_below"))
        .select(id_col, domain_col, "sample_bucket", "keep_below", "domain_total")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic training-epoch shuffle: every epoch deals the
    corpus into `n_shards` shards in a pseudo-random order that is a
    pure function of (id, epoch) — rerun it anywhere, any parallelism,
    and every document lands in the same shard at the same position.
    Trainers stream shard files sequentially; a NEW epoch permutes both
    the shard assignment and the intra-shard order without any state.

    key   = murmur3_token(id·1000003 + epoch)   (bit-exact kernel — the
                                                 oracle recomputes it)
    shard = pmod(key, n_shards)
    pos   = row_number over (shard ORDER BY key, id)

    The window partitions BY SHARD — no global ordering, so the rank
    parallelizes across shards (each is one partition's sort, the same
    per-shard shape `pack_sequences` uses). One shuffle."""
    key = murmur3_token_column_once(
        F.col(id_col) * F.lit(1000003) + F.lit(epoch)
    )
    staged = df.select(
        F.col(id_col),
        key.alias("__key"),
    ).select(
        id_col,
        F.pmod(F.col("__key"), F.lit(n_shards)).cast("int").alias("shard"),
        F.col("__key"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__key"), F.col(id_col))
    return staged.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Context-window chunking: split each document's whitespace tokens
    into `window`-token chunks starting every `window − overlap` tokens
    (the overlap keeps context across boundaries — the standard prep
    for fixed-context training and embedding indexes). Pure array
    expressions: sequence of starts → slice per start → posexplode;
    narrow (no shuffle), and chunks stay on the scanning executor.

    Returns (id_col, chunk_idx, n_tokens, chunk_text)."""
    if overlap >= window:
        raise ValueError("overlap must be smaller than window")
    step = window - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(words, s, window))
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "toks")
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_join("toks", " ").alias("chunk_text"),
    )
