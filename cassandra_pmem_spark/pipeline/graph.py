"""Iterative graph analytics with integer-exact arithmetic.

PageRank is the second classic iterative-join algorithm a data engine
is judged on (connected components being the first — see
`dedup.connected_components`). The float formulation is hostile to
cross-engine verification: partial-sum order differs per partitioning,
so no two runs agree bit-for-bit. This implementation keeps every rank
in integer MICRO-UNITS (a 10^12 budget split across vertices) and
every update in floor arithmetic:

    teleport   = (15 · r0) // 100                 (constant per vertex)
    contrib(u) = (85 · r(u)) // (100 · deg(u))    (per out-edge)
    r'(v)      = teleport + Σ contrib(u→v)

Integer sums are order-free, so the result is bit-identical at any
parallelism AND reproducible by a SQL oracle that unrolls the same
iterations. Mass is not exactly conserved (floors shave it) — that is
a deterministic property of the formulation, not noise.

Scale shape per iteration: one join (ranks ⋈ edges on src — at real
scale, pre-partition both by src so the join is co-located) and one
aggregation by dst. Ranks are localCheckpoint-ed per round like the
connected-components loop, keeping plan depth flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_exact(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iters: int = 5,
    scale_total: int = 10**12,
) -> DataFrame:
    """(id_col, rank) after `iters` integer-exact damped iterations.

    `vertices` holds one row per node; `edges` has (src, dst). Dangling
    mass (nodes without out-edges) is dropped by the floor formulation
    — deterministic, and matched by the oracle."""
    n = vertices.count()  # one scalar to size the budget — bounded
    r0 = scale_total // n
    teleport = (15 * r0) // 100

    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(deg, "src").localCheckpoint(eager=True)

    ranks = vertices.select(
        F.col(id_col).alias("id"), F.lit(r0).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                # true integer division (`div`), NOT double `/` + cast:
                # a double quotient that rounds up across an integer
                # boundary would break floor semantics
                F.expr("(85 * r) div (100 * deg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.select("id")
            .join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0))
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("id").alias(id_col), F.col("r").alias("rank"))
