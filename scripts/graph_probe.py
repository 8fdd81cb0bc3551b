#!/usr/bin/env python
"""Iterative-operator scaling probe: connected components and PageRank
on synthetic graphs 100-1000x the fixture size, so SCALE.md's claims
about per-iteration cost carry measured evidence.

Graph: n nodes, 3 out-edges per node (deterministic arithmetic), plus
chained near-dup-style components for CC. Run:
    python scripts/graph_probe.py [n_nodes]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from cassandra_pmem_spark.pipeline.dedup import connected_components
    from cassandra_pmem_spark.pipeline.graph import pagerank_exact
    from cassandra_pmem_spark.session import get_spark

    spark = get_spark("graph-probe")
    spark.sparkContext.setLogLevel("ERROR")

    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    pr_edges = (
        verts.select(d.alias("src"), ((d * 7 + 1) % n).alias("dst"))
        .union(verts.select(d.alias("src"), ((d * 13 + 2) % n).alias("dst")))
        .union(verts.select(d.alias("src"), ((d * 31 + 5) % n).alias("dst")))
    )
    t0 = time.time()
    pr = pagerank_exact(verts, pr_edges, iters=5)
    n_pr = pr.count()
    t_pr = time.time() - t0

    # CC graph: chains of length 4 (the near-dup generation shape) —
    # node i links i+1 within each 4-block
    cc_edges = verts.filter(d % 4 != 3).select(
        d.alias("a"), (d + 1).alias("b")
    )
    t0 = time.time()
    cc = connected_components(cc_edges, verts)
    comps = cc.select("comp").distinct().count()
    t_cc = time.time() - t0
    expected = (n + 3) // 4

    # star variant: same graph, PLUS one long chain (n/100 nodes) whose
    # diameter would force label propagation past its round budget —
    # large-star/small-star closes it in O(log n) rounds regardless
    from cassandra_pmem_spark.pipeline.dedup import connected_components_star

    chain_len = max(2, n // 100)
    chain = spark.range(chain_len - 1).select(
        (F.col("id") + n).alias("a"), (F.col("id") + n + 1).alias("b")
    )
    star_verts = spark.range(n + chain_len).select(F.col("id").alias("doc_id"))
    t0 = time.time()
    star = connected_components_star(cc_edges.union(chain), star_verts)
    star_comps = star.select("comp").distinct().count()
    t_star = time.time() - t0

    print(
        json.dumps(
            {
                "n_nodes": n,
                "pagerank_5_iters_sec": round(t_pr, 2),
                "pagerank_rows": n_pr,
                "cc_sec": round(t_cc, 2),
                "cc_components": comps,
                "cc_components_expected": expected,
                "star_sec": round(t_star, 2),
                "star_components": star_comps,
                "star_components_expected": expected + 1,
                "star_chain_diameter": chain_len - 1,
            }
        )
    )


if __name__ == "__main__":
    main()
