#!/usr/bin/env python
"""Scaling probe: measure the approximate operators against their exact
twins on corpora 25-250x larger than the driver test data, so SCALE.md's
claims carry measured evidence instead of asymptotic hand-waving.

Generates a deterministic 50k x 64 embedding corpus (seed 42) under
.scratch, then measures:
  - brute-force vs multi-table LSH vs IVF: wall time + recall@10
  - dedup cascade over the full sf0.1 documents table (5k docs)

Run: python scripts/scaling_probe.py [n_vectors] [n_queries]
Prints one JSON line (same spirit as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from cassandra_pmem_spark.session import get_spark
    from cassandra_pmem_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from cassandra_pmem_spark.pipeline.dedup import dedup_cascade

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # clustered corpus (500 centers + noise) — real embedding spaces
    # cluster; uniform-random vectors are ANN's degenerate worst case
    path = f"/root/repo/.scratch/probe_embeddings_c_{n}"
    if not os.path.exists(path):
        rng = np.random.default_rng(42)
        centers = rng.standard_normal((500, 64))
        vecs = (
            centers[np.arange(n) % 500] + 0.35 * rng.standard_normal((n, 64))
        ).astype(np.float32)
        import pandas as pd

        pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)

    emb = spark.read.parquet(path)
    emb.count()  # warm file metadata
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    out: dict = {"n_vectors": n, "n_queries": n_q}

    t0 = time.perf_counter()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    out["brute_force_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=10, bits=8, tables=8).collect()
    }
    out["lsh_sec"] = round(time.perf_counter() - t0, 2)
    out["lsh_recall"] = round(len(exact & lsh) / len(exact), 3)

    t0 = time.perf_counter()
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=10, n_centroids=64, n_probe=8, train_cap=8192
        ).collect()
    }
    out["ivf_sec"] = round(time.perf_counter() - t0, 2)
    out["ivf_recall"] = round(len(exact & ivf) / len(exact), 3)

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    t0 = time.perf_counter()
    survivors = dedup_cascade(docs, jaccard_threshold=0.7, num_hashes=32, bands=16).count()
    out["dedup_cascade_docs_in"] = docs.count()
    out["dedup_cascade_survivors"] = survivors
    out["dedup_cascade_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
