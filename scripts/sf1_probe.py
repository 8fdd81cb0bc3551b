#!/usr/bin/env python
"""sf1 scaling probe: run the bench suite once at sf0.1 and once at a
synthesized sf1 (10x rows) and record per-query scaling ratios, so
SCALE.md's 100 TB posture carries MEASURED growth exponents instead of
plan-shape argument alone.

The sf1 corpus is derived deterministically from the read-only
driver-provided sf0.1 tables (TESTDATA.md forbids regenerating them):
each fact table is replicated 10x with every key/foreign-key column
offset per copy, so join cardinalities and distinct counts scale the
way a real 10x scale factor would; region/nation stay fixed (TPC-H
dimension tables are SF-invariant); document text gets a per-copy
suffix so dedup operators see 10x distinct documents rather than 10
exact copies of each.

Run: python scripts/sf1_probe.py [--rebuild]
Prints a JSON line {query: {sf01, sf1, ratio}} and a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scratch/sf1"
COPIES = 10

# key columns offset per copy: cardinalities scale 10x and joins stay
# consistent WITHIN a copy (copy i's lineitem joins copy i's orders)
KEY_OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
FIXED_TABLES = ("region", "nation")


def build_sf1() -> None:
    import duckdb

    os.makedirs(SF1, exist_ok=True)
    for t in FIXED_TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF01}/{t}.parquet')) "
            f"TO '{SF1}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, offs in KEY_OFFSETS.items():
        parts = []
        for i in range(COPIES):
            repls = [
                f"CAST({c} + {i * step} AS BIGINT) AS {c}"
                for c, step in offs.items()
            ]
            if t == "documents":
                # distinct text per copy: dedup at sf1 sees 10x the
                # distinct corpus, not 10 exact clones of each doc
                repls.append(f"text || ' #c{i}' AS text")
            parts.append(
                f"SELECT * REPLACE ({', '.join(repls)}) "
                f"FROM read_parquet('{SF01}/{t}.parquet')"
            )
        union = " UNION ALL ".join(parts)
        duckdb.sql(
            f"COPY ({union}) TO '{SF1}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    if rebuild or not os.path.exists(f"{SF1}/lineitem.parquet"):
        t0 = time.time()
        build_sf1()
        print(f"built sf1 corpus in {time.time() - t0:.1f}s",
              file=sys.stderr)

    from bench import HEADLINE, TIER2
    from cassandra_pmem_spark.queries import all_queries
    from cassandra_pmem_spark.session import get_spark

    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    suite = HEADLINE + TIER2

    # warm each sf dir once (file metadata + JVM)
    registry["cql_point_lookup"][0](spark, SF01).collect()
    registry["cql_point_lookup"][0](spark, SF1).collect()
    registry["streaming_tumbling_real"][0](spark, SF01).count()

    results: dict = {}
    for name in suite:
        fn, _ = registry[name]
        row = {}
        for label, sf_dir in (("sf01", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            row[label] = round(time.perf_counter() - t0, 3)
            assert n >= 0
        row["ratio"] = round(row["sf1"] / max(row["sf01"], 1e-9), 2)
        results[name] = row
        print(f"{name}: sf0.1 {row['sf01']}s  sf1 {row['sf1']}s  "
              f"x{row['ratio']}", file=sys.stderr)

    print(json.dumps(results))
    print("\n| query | sf0.1 s | sf1 s | ratio |")
    print("| --- | --- | --- | --- |")
    for name, row in sorted(results.items(),
                            key=lambda kv: -kv[1]["ratio"]):
        print(f"| {name} | {row['sf01']} | {row['sf1']} "
              f"| {row['ratio']}x |")


if __name__ == "__main__":
    main()
