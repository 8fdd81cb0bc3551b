"""cqlsh-analog CLI: run CQL statements against the engine.

    python -m cassandra_pmem_spark -e "SELECT ... ; INSERT ... ;"
    python -m cassandra_pmem_spark -f script.cql
    python -m cassandra_pmem_spark            # REPL on stdin

Statement routing mirrors the reference's QueryProcessor front door:
DDL/DML/USE/BATCH/TRUNCATE go to the write model (`cql/ddl.CqlDatabase`
— schema registry + per-table LWW sessions); a SELECT goes to the
database when its target table lives in the registry, otherwise to the
parquet read facade (`cql/parser.execute_cql`) over the `--sf-dir`
tables (`region nation customer supplier part orders lineitem events
documents embeddings`) — so the same prompt queries both the mounted
analytics lake and tables you just CREATEd.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_FROM_RE = re.compile(r"\bfrom\s+([A-Za-z_][\w]*(?:\.[\w]+)?)", re.IGNORECASE)


def split_statements(text: str) -> list[str]:
    """Split on ';' while keeping BEGIN ... BATCH ... APPLY BATCH whole."""
    parts = [p.strip() for p in text.split(";")]
    out: list[str] = []
    buf: list[str] = []
    for p in parts:
        if not p and not buf:
            continue
        if buf:
            buf.append(p)
            if re.search(r"\bapply\s+batch\s*$", p, re.IGNORECASE):
                out.append("; ".join(buf))
                buf = []
        elif re.match(r"\s*begin\b", p, re.IGNORECASE) and not re.search(
            r"\bapply\s+batch\s*$", p, re.IGNORECASE
        ):
            buf = [p]
        else:
            out.append(p)
    if buf:
        out.append("; ".join(buf))
    return [s for s in out if s]


def run_statement(db, spark, stmt: str, sf_dir: str, max_rows: int):
    """Route one statement; returns printable output or None."""
    from cassandra_pmem_spark.cql.parser import execute_cql

    head = stmt.split(None, 1)[0].lower()
    if head == "select":
        m = _FROM_RE.search(stmt)
        target = m.group(1) if m else ""
        in_db = False
        try:
            db._table_key(tuple(target.split(".", 1)) if "." in target else target)
            in_db = True
        except Exception:
            in_db = False
        df = db.execute(stmt) if in_db else execute_cql(spark, stmt, sf_dir)
        pdf = df.limit(max_rows).toPandas()
        return pdf.to_string(index=False) + f"\n({len(pdf)} rows shown)"
    result = db.execute(stmt)
    if result is None or result is True:
        return "OK"
    if result is False:
        return "[applied: false]"
    pdf = result.limit(max_rows).toPandas()
    return pdf.to_string(index=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cassandra_pmem_spark")
    ap.add_argument("-e", "--execute", help="semicolon-separated statements")
    ap.add_argument("-f", "--file", help="CQL script file")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="parquet table directory for the read facade",
    )
    ap.add_argument("--max-rows", type=int, default=50)
    args = ap.parse_args(argv)

    from cassandra_pmem_spark.cql.ddl import CqlDatabase
    from cassandra_pmem_spark.session import get_spark

    spark = get_spark("cassandra-pmem-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    db = CqlDatabase(spark)

    if args.execute:
        text = args.execute
    elif args.file:
        with open(args.file) as fh:
            text = fh.read()
    else:
        text = sys.stdin.read()

    rc = 0
    for stmt in split_statements(text):
        try:
            out = run_statement(db, spark, stmt, args.sf_dir, args.max_rows)
            if out:
                print(out)
        except Exception as ex:  # surface per-statement errors, keep going
            print(f"ERROR: {type(ex).__name__}: {ex}", file=sys.stderr)
            rc = 2
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
