#!/usr/bin/env python
"""Run ONE registry query against its oracle (gate-shaped comparison).

Run: python scripts/check_one.py <query_name> [sf_dir] [parts]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.driver_gate import TABLES, dtype_kind_mismatches, norm  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    parts = sys.argv[3] if len(sys.argv) > 3 else "8"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master(f"local[{parts}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    print(f"spark: {len(srows)} rows, cols={scols}")
    if name not in oracles:
        print("no oracle (rows-only)")
        return 0
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    print(f"oracle: {len(drows)} rows, cols={dcols}")
    hard, soft = dtype_kind_mismatches(
        sdf.toPandas(), con.execute(oracles[name]).df()
    )
    if hard:
        print("DTYPE HARD SKEW:", hard)
    if soft:
        print("dtype soft skew:", soft)
    sn, dn = norm(srows, scols), norm(drows, dcols)
    if sn == dn:
        print("VALUES MATCH")
        return 0 if not hard else 1
    print("VALUE MISMATCH")
    diff = 0
    for a, b in zip(sn, dn):
        if a != b:
            print(" spark :", a)
            print(" oracle:", b)
            diff += 1
            if diff >= 5:
                break
    if len(sn) != len(dn):
        print(f" row counts differ: {len(sn)} vs {len(dn)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
