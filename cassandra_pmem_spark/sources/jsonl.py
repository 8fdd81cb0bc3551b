"""JSON-lines source/sink — the training-data interchange format.

The reference's JSON surface is row-level (SELECT JSON / INSERT JSON —
cql3/Json.java); at corpus scale the same row-as-JSON idea becomes JSONL
files. Declared schemas only (no inference — SURVEY §1.1); FAILFAST
parsing mirrors cqlsh aborting on malformed input; PERMISSIVE mode with a
corrupt-record column is the quarantine pattern for dirty corpora.

Scale: one task per file split on read; `num_files` controls write
fan-out; compression via codec option (JSONL gzips ~10×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    out = df.repartition(num_files) if num_files else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    permissive: bool = False,
) -> DataFrame:
    """Declared-schema JSONL read. permissive=True keeps malformed lines in
    a `_corrupt_record` column instead of failing the job — the quarantine
    path for dirty web-scale corpora."""
    r = spark.read.schema(
        schema if not permissive else T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    )
    r = r.option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    if permissive:
        r = r.option("columnNameOfCorruptRecord", "_corrupt_record")
    return r.json(path)
