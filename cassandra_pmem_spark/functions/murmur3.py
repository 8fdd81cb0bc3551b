"""Bit-exact Cassandra Murmur3 partitioner token for bigint partition keys.

Reference: dht/Murmur3Partitioner.java:214-246 (token = normalize(h1) of
MurmurHash.hash3_x64_128(serialized key, seed 0)); the hash body is
utils/MurmurHash.java:174-252. Two reference quirks are preserved:

- the tail mixes *sign-extended* bytes (``(long) key.get(i) << s`` — the
  "sign bug" the reference documents at MurmurHash.java:29 and cannot fix
  without repartitioning every cluster);
- ``normalize`` maps Long.MIN_VALUE to Long.MAX_VALUE
  (Murmur3Partitioner.java:244).

A bigint partition key serializes as 8 big-endian two's-complement bytes
(db/marshal/LongType.java), so ``length == 8``: no 16-byte blocks, the
tail consumes all 8 bytes, and the whole hash unrolls to ~6 multiplies +
4 adds — small enough for pure expressions.

Backend choice (measured, not guessed): Java longs wrap on overflow;
Spark under ANSI mode (the 4.x default) raises instead, so a pure
expression form has to emulate each wrapping multiply/add through
unsigned decimal(38,0) with when/otherwise sign shuttling. That form is
*correct* (it passed value tests) but plan-hostile: each step references
its input 2–3×, and Catalyst's project-collapse / filter-pushdown
substitute the whole chain at every reference — the ~25-step hash tree
re-expands exponentially and a simple ``filter(token > 0)`` OOMs the
driver during optimization. So the Spark backend is a vectorized Arrow
kernel instead: numpy uint64 arithmetic wraps natively, one batched
matmul-style pass, no per-row Python. The DuckDB oracle twin
(``murmur3_token_subquery``) emulates the same steps in HUGEINT SQL (DuckDB
plans it linearly). Both are pinned against ``murmur3_token_py``, a
direct port of the reference algorithm, in tests/test_murmur3.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F
F1 = 0xFF51AFD7ED558CCD
F2 = 0xC4CEB9FE1A85EC53
TWO64 = 1 << 64
TWO63 = 1 << 63
LONG_MIN = -(1 << 63)
LONG_MAX = (1 << 63) - 1


# --- Spark backend: vectorized Arrow kernel ----------------------------------

def _murmur3_tokens_np(v: np.ndarray) -> np.ndarray:
    """hash3_x64_128 h1 (normalized) of 8-byte big-endian keys, vectorized.

    All arithmetic in numpy uint64 (wraps like Java longs); the tail's
    sign-extension quirk is the ``b | 0xFF..00`` widen for bytes > 127."""
    u = v.astype(np.uint64)
    k1 = np.zeros_like(u)
    for j in range(8):
        b = (u >> np.uint64(56 - 8 * j)) & np.uint64(0xFF)
        sx = np.where(b > np.uint64(127), b | np.uint64(0xFFFFFFFFFFFFFF00), b)
        k1 ^= sx << np.uint64(8 * j)

    def rotl(a: np.ndarray, n: int) -> np.ndarray:
        return (a << np.uint64(n)) | (a >> np.uint64(64 - n))

    def fmix(h: np.ndarray) -> np.ndarray:
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(F1)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(F2)
        return h ^ (h >> np.uint64(33))

    k1 = k1 * np.uint64(C1)
    k1 = rotl(k1, 31)
    k1 = k1 * np.uint64(C2)
    h1 = (k1 ^ np.uint64(8)) + np.uint64(8)          # h1 = (0^k1)^len; h1 += h2(=len)
    h2 = np.uint64(8) + h1                            # h2 += h1
    h1 = fmix(h1) + fmix(h2)                          # h1 += h2 after fmix
    s = h1.astype(np.int64)
    return np.where(s == np.int64(LONG_MIN), np.int64(LONG_MAX), s)


def _murmur3_token_fn(keys: pd.Series) -> pd.Series:
    with np.errstate(over="ignore"):
        out = _murmur3_tokens_np(keys.to_numpy(dtype=np.int64))
    return pd.Series(out)


# LongType() instance, not the "long" DDL string: the string form is parsed
# through the active SparkContext, which would make this module unimportable
# before a session exists
_murmur3_token_udf = pandas_udf(_murmur3_token_fn, LongType())


def murmur3_token_column(col):
    """Column expression form: Cassandra Murmur3 token of a bigint column
    (non-null, as partition keys are). Usable in filters and projections —
    a UDF call node stays O(1) in the plan."""
    c = F.col(col) if isinstance(col, str) else col
    return _murmur3_token_udf(c.cast("long"))


def with_murmur3_token(df: DataFrame, key_col: str, name: str = "token") -> DataFrame:
    """Append the Cassandra Murmur3 token of a bigint partition key."""
    return df.withColumn(name, murmur3_token_column(key_col))


# --- DuckDB SQL backend (oracle twin) ----------------------------------------
#
# All arithmetic runs unsigned mod 2^64 in HUGEINT (xor() accepts HUGEINT).
# NOTE: DuckDB's binder substitutes lateral column aliases the way Catalyst
# collapses projects — computing the whole hash in ONE select re-expands
# the step chain exponentially (measured ~54 s to plan a single token).
# murmur3_token_subquery therefore nests one subquery per step, so every
# step reference is a real column and the plan stays linear.

def _m3_items(k1_0: str, alias: str) -> list[tuple[str, str]]:
    """(name, expr) per step; each expr references only *previous step
    names* (plain columns once nested), never re-expanding the chain."""

    def mul(e: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        p = f"(({e} * {lo}::HUGEINT) % {TWO64}::HUGEINT)"
        if hi:
            p = f"({p} + (({e} * {hi}::HUGEINT) % {1 << 32}::HUGEINT) * {1 << 32}::HUGEINT)"
        return f"({p} % {TWO64}::HUGEINT)"

    def rotl(e: str, n: int) -> str:
        return (
            f"((({e} * {1 << n}::HUGEINT) % {TWO64}::HUGEINT) + ({e} // {1 << (64 - n)}::HUGEINT))"
        )

    def shr33_xor(e: str) -> str:
        return f"xor({e}, {e} // {1 << 33}::HUGEINT)"

    return [
        ("m3_a", k1_0),
        ("m3_b", mul("m3_a", C1)),
        ("m3_c", f"({rotl('m3_b', 31)} % {TWO64}::HUGEINT)"),
        ("m3_d", mul("m3_c", C2)),
        ("m3_h1a", "xor(m3_d, 8::HUGEINT)"),                      # h1 = k1 ^ len
        ("m3_h1b", f"((m3_h1a + 8::HUGEINT) % {TWO64}::HUGEINT)"),  # h1 += h2(=8)
        ("m3_h2a", f"((8::HUGEINT + m3_h1b) % {TWO64}::HUGEINT)"),  # h2 += h1
        # fmix(h1)
        ("m3_h1c", shr33_xor("m3_h1b")),
        ("m3_h1d", mul("m3_h1c", F1)),
        ("m3_h1e", shr33_xor("m3_h1d")),
        ("m3_h1f", mul("m3_h1e", F2)),
        ("m3_h1g", shr33_xor("m3_h1f")),
        # fmix(h2)
        ("m3_h2b", shr33_xor("m3_h2a")),
        ("m3_h2c", mul("m3_h2b", F1)),
        ("m3_h2d", shr33_xor("m3_h2c")),
        ("m3_h2e", mul("m3_h2d", F2)),
        ("m3_h2f", shr33_xor("m3_h2e")),
        ("m3_u", f"((m3_h1g + m3_h2f) % {TWO64}::HUGEINT)"),
        (
            "m3_s",
            f"(CASE WHEN m3_u >= {TWO63}::HUGEINT THEN m3_u - {TWO64}::HUGEINT "
            f"ELSE m3_u END)::BIGINT",
        ),
        (alias, f"(CASE WHEN m3_s = {LONG_MIN} THEN {LONG_MAX} ELSE m3_s END)"),
    ]


def murmur3_token_subquery(
    source_sql: str, key_expr: str, carry: "list[str]", alias: str = "token"
) -> str:
    """A DuckDB subquery computing the token as column ``alias`` alongside
    the ``carry`` columns, one nested SELECT per hash step (linear plan —
    see the section note on why one flat select is not usable)."""

    def u(e: str) -> str:
        return (
            f"(CASE WHEN ({e}) >= 0 THEN ({e})::HUGEINT "
            f"ELSE ({e})::HUGEINT + {TWO64}::HUGEINT END)"
        )

    byte_terms = []
    for j in range(8):
        x = f"(({u(key_expr)} // {1 << (56 - 8 * j)}::HUGEINT) % 256::HUGEINT)"
        sx = f"(CASE WHEN {x} > 127 THEN {x} + {TWO64 - 256}::HUGEINT ELSE {x} END)"
        byte_terms.append(f"(({sx} * {1 << (8 * j)}::HUGEINT) % {TWO64}::HUGEINT)")
    k1_0 = byte_terms[0]
    for t in byte_terms[1:]:
        k1_0 = f"xor({k1_0}, {t})"

    sql = f"SELECT * FROM {source_sql}"
    for name, expr in _m3_items(k1_0, alias):
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    cols = ", ".join(carry)
    return f"(SELECT {cols}, {alias} FROM ({sql}))"


# --- pure-Python ground truth (tests only) -----------------------------------

def murmur3_token_py(v: int) -> int:
    """Direct port of the reference algorithm for an 8-byte bigint key —
    the unit tests' ground truth for both engine backends."""
    mask = TWO64 - 1

    def sx(b: int) -> int:  # unsigned byte -> sign-extended 64-bit pattern
        return b | (mask ^ 0xFF) if b > 127 else b

    vb = (v & mask).to_bytes(8, "big")
    k1 = 0
    for j in range(8):
        k1 ^= (sx(vb[j]) << (8 * j)) & mask

    def mul(a: int, c: int) -> int:
        return (a * c) & mask

    def rotl(a: int, n: int) -> int:
        return ((a << n) | (a >> (64 - n))) & mask

    def fmix(h: int) -> int:
        h ^= h >> 33
        h = mul(h, F1)
        h ^= h >> 33
        h = mul(h, F2)
        return h ^ (h >> 33)

    k1 = mul(k1, C1)
    k1 = rotl(k1, 31)
    k1 = mul(k1, C2)
    h1 = k1 ^ 8
    h2 = 8
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    signed = h1 - TWO64 if h1 >= TWO63 else h1
    return LONG_MAX if signed == LONG_MIN else signed
