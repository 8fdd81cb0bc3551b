#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries into
plans/r13/<name>_<tag>.txt (tag = before/after), plus a wall-clock
timing via the noop sink (guide §1.4) printed per query.

Run: python scripts/capture_plans.py <tag> <name> [name ...]
     python scripts/capture_plans.py <tag> --bench   (headline + tier2)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cassandra_pmem_spark.queries import all_queries
    from cassandra_pmem_spark.session import get_spark

    if names == ["--bench"]:
        import bench

        names = bench.HEADLINE + bench.TIER2
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn, _ = registry[name]
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} [{tag}] sf={sf_dir} noop_wall={dt:.3f}s\n")
            f.write(buf.getvalue())
        print(f"{dt:7.3f}s  {name} -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
