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
aggregation by dst. Each round references the previous ranks exactly
once (the all-vertices leg comes from a fixed checkpointed id frame),
so the plan grows linearly and iterations chain inside one Spark job;
a lineage-truncating localCheckpoint lands every 8 rounds instead of
every round.
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
    — deterministic, and matched by the oracle.

    Contract: every edge endpoint must appear in `vertices` (the shape
    every caller and the SQL oracle's left-join formulation assume).
    Since the zero-contribution-union rewrite, a dst id absent from
    `vertices` would emit an output rank row of its own instead of
    being dropped — callers with untrusted edge lists must semi-join
    edges against vertices first (one bounded pre-pass, not the
    per-round join the union rewrite removed)."""
    n = vertices.count()  # one scalar to size the budget — bounded
    r0 = scale_total // n
    teleport = (15 * r0) // 100

    from cassandra_pmem_spark.plans.hints import materialize

    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = materialize(edges.join(deg, "src"))
    ids = materialize(vertices.select(F.col(id_col).alias("id")))

    # Each round references the previous ranks frame exactly ONCE: the
    # all-vertices row set comes from the FIXED `ids` checkpoint (a
    # zero-contribution union leg replacing the old ranks.select("id")
    # left join — same rows, same integer sums, one aggregate instead of
    # agg + join). With single-reference rounds the plan grows linearly,
    # so iterations can chain inside ONE Spark job — every `e` join
    # shuffles the same checkpointed frame and is deduped by exchange
    # reuse — with a lineage-truncating checkpoint only every 8 rounds
    # (the old per-round eager checkpoint was one barrier job per
    # iteration; 5 bench iterations ran 6 jobs where 1 suffices).
    ranks = ids.select("id", F.lit(r0).cast("long").alias("r"))
    for k in range(1, iters + 1):
        contribs = e.join(ranks, e["src"] == ranks["id"]).select(
            F.col("dst").alias("id"),
            # true integer division (`div`), NOT double `/` + cast:
            # a double quotient that rounds up across an integer
            # boundary would break floor semantics
            F.expr("(85 * r) div (100 * deg)").alias("c"),
        )
        zero = ids.select("id", F.lit(0).cast("long").alias("c"))
        ranks = (
            contribs.unionByName(zero)
            .groupBy("id")
            .agg(
                (F.lit(teleport) + F.sum("c")).cast("long").alias("r")
            )
        )
        if k % 8 == 0 and k < iters:
            ranks = materialize(ranks)
    return ranks.select(F.col("id").alias(id_col), F.col("r").alias("rank"))
