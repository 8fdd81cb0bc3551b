#!/usr/bin/env python
"""Driver-correctness-gate mimic: run every registry query on Spark AND its
DuckDB oracle, compare column names (sorted), row counts, and values
(columns sorted by name, rows sorted, floats via repr) — the same
comparison shape the driver records in CORRECTNESS_r{N}.json.

Run: python scripts/driver_gate.py [sf_dir] [shuffle_partitions]
Exit code 1 on any failure or empty result. This is the check to run
before committing query changes (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(repr(r[i]) if isinstance(r[i], float) else str(r[i]) for i in order)
        for r in rows
    ]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    parts = sys.argv[2] if len(sys.argv) > 2 else "8"

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

    from pyspark.sql import types as T

    qs, oracles = e.queries(), e.oracle_sql()
    fails, empty, unsortable = [], [], []
    for name in sorted(qs):
        sdf = qs[name](spark, sf_dir)
        # The driver's pandas canonicalizer sort_values() crashes on
        # array/map/struct cells ("unhashable type: 'list'") — reject such
        # output schemas here so the mismatch can't ship again.
        bad = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            unsortable.append(f"{name}:{','.join(bad)}")
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if not srows:
            empty.append(name)
        if name not in oracles:
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and norm(srows, scols) == norm(drows, dcols)
        )
        if not ok:
            fails.append(name)
    print(f"total: {len(qs)} | oracle-backed: {len(oracles)}")
    print("FAILURES:", fails or "none")
    print("EMPTY:", empty or "none")
    print("UNSORTABLE (array/map/struct outputs):", unsortable or "none")
    df = e.entry(spark)
    print("entry rows:", len(df.collect()))
    return 1 if (fails or empty or unsortable) else 0


if __name__ == "__main__":
    sys.exit(main())
