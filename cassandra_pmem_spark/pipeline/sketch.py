"""Deterministic HyperLogLog — a distinct-count sketch whose registers
are bit-exact reproducible across engines.

Spark's builtin `approx_count_distinct` (HLL++) and DuckDB's
`approx_count_distinct` use different hash functions and register
layouts, so their sketches can't be compared, merged across systems, or
oracle-checked. This operator rebuilds the classic Flajolet HLL on the
repo's bit-exact Cassandra Murmur3 token (functions/murmur3.py — the
same kernel the token-scan oracles recompute in SQL), making the sketch
a pure deterministic function of the key set:

    u      = pmod(token, 2^52)        (non-negative, exact in doubles —
                                       so the SQL twin needs no int64
                                       bit tricks)
    bucket = u mod 2^p                (register index, p=8 → 256)
    w      = u div 2^p                (a 44-bit window)
    rank   = 44 - floor(log2(w))      (position of the leading 1-bit;
                                       45 when w = 0)
    register[bucket] = max(rank)

Same registers on Spark, DuckDB, or any engine with integer arithmetic —
which is what lets sketches built by different systems over shards of a
100 TB corpus be MERGED (register-wise max) and audited. The estimate is
the standard bias-corrected harmonic mean with the small-range
(linear-counting) correction; it's a trivial driver-side fold over the
256-row register frame.

Scale posture: one shuffle (the groupBy over at most 2^p registers, with
map-side partial max), Arrow-batched hashing, register frame is O(2^p)
regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_pmem_spark.functions.murmur3 import murmur3_token_column_once

_WINDOW_BITS = 44  # 52 usable bits minus p=8 for the bucket index
_U_MOD = 1 << 52


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """(bucket, register) frame — the deterministic HLL sketch of the
    distinct values of ``key_col`` (bigint). Buckets with no keys are
    absent (their register is implicitly 0); `hll_estimate` accounts
    for them."""
    m = 1 << p
    token = murmur3_token_column_once(F.col(key_col))
    u = F.pmod(token, F.lit(_U_MOD))
    bucket = F.pmod(u, F.lit(m)).cast("long")
    w = F.floor(u / F.lit(m)).cast("long")
    window = _WINDOW_BITS + 8 - p  # bits left above the bucket index
    rank = (
        F.when(w == 0, F.lit(window + 1))
        .otherwise(F.lit(window) - F.floor(F.log2(w)))
        .cast("long")
    )
    return (
        df.select(bucket.alias("bucket"), rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_estimate(registers: dict[int, int], p: int = 8) -> float:
    """Standard HLL estimate from a {bucket: register} dict (absent
    buckets are zero): alpha_m * m^2 / sum(2^-reg), with the linear-
    counting small-range correction."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Deterministic Bloom filter over ``key_col`` (bigint) → a
    (word, bits) frame of 32-bit words packed into BIGINTs.

    The reference engine keeps a Bloom filter per SSTable to skip reads
    (`utils/BloomFilter.java`); the Spark-era analog is the RUNTIME
    FILTER — build the filter over a dimension's join keys, broadcast
    it, and prune fact rows before the shuffle. Positions come from
    Kirsch-Mitzenmacher double hashing (public) on the bit-exact
    Murmur3 token, so — like the HLL above — the words are a pure
    function of the key set and rebuild identically in the DuckDB
    oracle. 32-bit words (not 64) keep every value positive in signed
    int64, dodging cross-engine sign pitfalls. One shuffle over at most
    m_bits/32 words with map-side partial bit_or."""
    m = int(m_bits)
    token = murmur3_token_column_once(F.col(key_col))
    u = F.pmod(token, F.lit(_U_MOD))
    h1 = F.pmod(u, F.lit(m))
    h2 = F.pmod(F.floor(u / F.lit(m)), F.lit(m))
    pos = F.explode(
        F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])
    ).alias("pos")
    staged = df.select(pos).select(
        F.floor(F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 32 AS INT))").alias("bit"),
    )
    return staged.groupBy("word").agg(F.bit_or("bit").alias("bits"))


def bloom_positions(key: int, m_bits: int = 4096, k: int = 4) -> list[int]:
    """Driver-side twin of the hashing above (for membership checks)."""
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_py

    u = murmur3_token_py(int(key)) % _U_MOD
    h1 = u % m_bits
    h2 = (u // m_bits) % m_bits
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_might_contain(words: dict[int, int], key: int, m_bits: int = 4096, k: int = 4) -> bool:
    """Membership test against a {word: bits} dict from `bloom_build`."""
    for pos in bloom_positions(key, m_bits, k):
        if not (words.get(pos // 32, 0) >> (pos % 32)) & 1:
            return False
    return True


def runtime_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 16384,
    k: int = 4,
):
    """Bloom-pruned join: build the filter over the dimension's keys
    (bounded — the words frame is at most m_bits/32 rows), inline the
    packed words as plan LITERALS, and drop fact rows that cannot join
    BEFORE the shuffle. Result is identical to the plain join (false
    positives survive the pre-filter but die in the join); the win is
    shuffle volume — at a 1% dim selectivity, ~99% of fact rows never
    leave their scan task. This is the manual form of dynamic runtime
    filtering, and the Spark-era use of the reference's per-SSTable
    Bloom filters (utils/BloomFilter.java)."""
    rows = bloom_build(dim, dim_key, m_bits, k).collect()
    words = [0] * (m_bits // 32)
    for r in rows:
        words[int(r["word"])] = int(r["bits"])
    arr = F.array(*[F.lit(w) for w in words])

    # materialize the token ONCE: the nondeterministic pin keeps Catalyst
    # from inlining the Arrow kernel into every downstream reference
    staged = fact.withColumn("_tok", murmur3_token_column_once(F.col(fact_key)))
    u = F.pmod(F.col("_tok"), F.lit(_U_MOD))
    staged = (
        staged.withColumn("_h1", F.pmod(u, F.lit(m_bits)))
        .withColumn("_h2", F.pmod(F.floor(u / F.lit(m_bits)), F.lit(m_bits)))
        .drop("_tok")
    )
    cond = F.lit(True)
    for i in range(k):
        pos = F.pmod(F.col("_h1") + F.lit(i) * F.col("_h2"), F.lit(m_bits))
        word = F.element_at(arr, (F.floor(pos / 32) + 1).cast("int"))
        bit = F.expr(f"shiftleft(1L, CAST(pmod(_h1 + {i} * _h2, {m_bits}) % 32 AS INT))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    pruned = staged.where(cond).drop("_h1", "_h2")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge sketches built independently (e.g. per shard, per engine):
    register-wise max — the property that makes the sketch distributive."""
    out = register_frames[0]
    for other in register_frames[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))


def countmin_build(
    df: DataFrame, key_col: str, width: int = 512, depth: int = 4
) -> DataFrame:
    """Deterministic Count-Min sketch over ``key_col`` (bigint) → a
    (row, pos, cnt) cell frame.

    The frequency-estimation sibling of the HLL/Bloom sketches above —
    the structure a planner consults for JOIN-SKEW detection (estimate
    any key's frequency in O(depth) lookups, without a groupBy over
    every key) and the one that merges across shards by cell-wise ADD.
    Positions come from the same Kirsch-Mitzenmacher double hashing on
    the bit-exact Murmur3 token as `bloom_build`, so the cells are a
    pure function of the key multiset and rebuild identically in the
    DuckDB oracle. Estimates are one-sided: est(key) ≥ true(key), with
    overshoot ≤ e·N/width at probability 1−e^-depth.

    One shuffle over at most width·depth cells with map-side partial
    counts — sketch size is fixed regardless of input."""
    w = int(width)
    token = murmur3_token_column_once(F.col(key_col))
    u = F.pmod(token, F.lit(_U_MOD))
    h1 = F.pmod(u, F.lit(w))
    h2 = F.pmod(F.floor(u / F.lit(w)), F.lit(w))
    staged = df.select(
        F.posexplode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(w)) for i in range(depth)])
        ).alias("row", "pos")
    )
    return staged.groupBy("row", "pos").agg(F.count("*").alias("cnt"))


def countmin_estimate(
    cells: dict[tuple[int, int], int],
    key: int,
    width: int = 512,
    depth: int = 4,
) -> int:
    """Point frequency estimate from a {(row, pos): cnt} dict."""
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_py

    u = murmur3_token_py(int(key)) % _U_MOD
    h1 = u % width
    h2 = (u // width) % width
    return min(
        cells.get((i, (h1 + i * h2) % width), 0) for i in range(depth)
    )


def histogram_bins(
    df: DataFrame, value_col: str, bins: int = 64
) -> DataFrame:
    """Deterministic equi-width histogram over ``value_col`` → a
    (bin, cnt) frame plus the global [lo, hi] carried on every row.

    The quantile sibling of the sketches above: Spark's
    `approx_percentile` and DuckDB's quantile sketches use different
    internal summaries and cannot be compared or merged across engines,
    but an equi-width histogram with data-derived bounds is a pure
    function of the value multiset — same cells everywhere, mergeable
    by cell-wise add when bounds agree, and `histogram_quantile`
    interpolates any percentile from it with bounded error (hi−lo)/bins.

    Both engines compute bin = floor((x−lo)/(hi−lo)·bins) with the same
    IEEE double operations in the same order, so even edge-of-bin
    values land identically. Plan: one tiny min/max aggregate broadcast
    back, then one shuffle over ≤ bins cells with map-side partial
    counts."""
    b = int(bins)
    bounds = F.broadcast(
        df.agg(
            F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
        )
    )
    x = F.col(value_col)
    raw = F.floor((x - F.col("__lo")) / (F.col("__hi") - F.col("__lo")) * b)
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(b - 1)).cast("long")
    return (
        df.crossJoin(bounds)
        .select(bin_.alias("bin"), "__lo", "__hi")
        .groupBy("bin", "__lo", "__hi")
        .agg(F.count("*").alias("cnt"))
        .select("bin", "cnt", F.col("__lo").alias("lo"), F.col("__hi").alias("hi"))
    )


def histogram_quantile(
    cells: list[tuple[int, int]], lo: float, hi: float, q: float, bins: int = 64
) -> float:
    """Linear-interpolated quantile from (bin, cnt) cells; error is
    bounded by one bin width."""
    counts = dict(cells)
    total = sum(counts.values())
    target = q * total
    run = 0.0
    width = (hi - lo) / bins
    for b in range(bins):
        c = counts.get(b, 0)
        if run + c >= target and c > 0:
            frac = (target - run) / c
            return lo + (b + frac) * width
        run += c
    return hi
