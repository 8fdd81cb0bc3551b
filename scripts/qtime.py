#!/usr/bin/env python
"""Targeted query timer for optimization A/B runs: N repeats of the named
registry queries via the noop sink (guide §1.4), printing min/median.

The box shows bursty virtualization-host contention (see bench.py
_cpu_probe_s), so before/after claims should come from back-to-back runs
of this script, each line carrying the host probe for sanity.

Run: python scripts/qtime.py <repeats> <name> [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    repeats = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cassandra_pmem_spark.queries import all_queries
    from cassandra_pmem_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    # warm JVM + parquet footer cache (uncounted), same as bench.py
    registry["cql_point_lookup"][0](spark, sf_dir).collect()
    print(f"host probe: {probe()}s", flush=True)
    for name in names:
        fn, _ = registry[name]
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(
            f"{name}: min={runs[0]:.3f} med={runs[len(runs) // 2]:.3f} "
            f"all={[round(r, 2) for r in runs]}",
            flush=True,
        )
    print(f"host probe: {probe()}s", flush=True)


if __name__ == "__main__":
    main()
