"""Z-order (Morton) data layout for multi-dimensional file skipping.

The reference clusters a table by ONE key ordering (partition token,
then clustering columns — `db/ClusteringComparator.java`), so scans
filtered on a non-clustering dimension read everything. At 100 TB the
Spark-native answer is write-time Z-ordering: interleave the bits of
two (or more) scan dimensions into one Morton code, range-partition
files by that code, and every written file then covers a NARROW
rectangle in all interleaved dimensions at once — parquet min/max
footer stats prune files for filters on ANY of them, not just the
first sort key. This is the layout trick Delta/Iceberg `OPTIMIZE
ZORDER BY` applies; here it is expressed as pure Spark SQL bit
arithmetic (whole-stage codegen, no UDF) + `repartitionByRange`.

Bit spreading uses the classic parallel-prefix magic numbers (public
"Bit Twiddling Hacks" / Morton-code folklore), 4 mask-shift steps per
dimension instead of a 16-term bit loop, so the DuckDB oracle can
replay the exact expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit value so its bits occupy the
# even positions of a 32-bit lane.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_code(a: Column, b: Column) -> Column:
    """32-bit Morton interleave of two 16-bit non-negative ints:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    integer expressions — stays inside whole-stage codegen."""
    a16 = a.cast("long").bitwiseAND(F.lit(0xFFFF))
    b16 = b.cast("long").bitwiseAND(F.lit(0xFFFF))
    return _spread16(a16).bitwiseOR(F.shiftleft(_spread16(b16), 1))


def morton_sql(a_expr: str, b_expr: str) -> str:
    """The identical Morton expression as ANSI SQL text (DuckDB oracle
    twin of `morton_code` — same masks, same step order)."""

    def spread(e: str) -> str:
        out = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD_STEPS:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    return f"({spread(a_expr)} | ({spread(b_expr)} << 1))"


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    n_files: int,
) -> None:
    """Write `df` as parquet laid out in Morton order over
    (`col_a`, `col_b`): range-partition on the code so each output
    file covers a contiguous Z-range — a narrow rectangle in BOTH
    dimensions — then drop the helper column. Range partitioning
    samples boundaries, so files are size-balanced even when the two
    dimensions are skewed."""
    coded = df.withColumn(
        "__z", morton_code(F.col(col_a), F.col(col_b))
    )
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
