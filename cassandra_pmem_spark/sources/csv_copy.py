"""CSV import/export — the cqlsh COPY FROM / COPY TO analog
(pylib/cqlshlib/copyutil.py, multiprocess chunked pipeline from :92 ff.).

The reference parallelizes COPY by splitting the input into chunks across
worker processes; Spark's csv reader/writer does the same thing natively —
one task per file split on read, one file per partition on write — so the
whole ~2.8k-line copyutil machinery collapses into option mapping:

  COPY … TO   → df.write.csv (HEADER, DELIMITER, NULLVAL options)
  COPY … FROM → spark.read.csv with the *declared* schema (COPY never
                infers types; neither do we — SURVEY §1.1)

At 100 TB: a COPY TO of n output partitions writes n files concurrently;
repartition(n) controls fan-out. COPY FROM scales with input splits —
maxPartitionBytes gates per-task chunk size like copyutil's chunk_size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def copy_to(
    df: DataFrame,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    null_val: str = "",
    quote: str = '"',
    escape: str = "\\",
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """COPY table TO 'file.csv' (copyutil.py ExportTask; QUOTE/ESCAPE
    option mapping at copyutil.py:322-327 — when QUOTE equals ESCAPE,
    cqlsh drops the escapechar and csv doubles the quote instead; Spark's
    writer does the same when escape == quote). Timestamps are written
    ISO-8601 like cqlsh's default time_format."""
    out = df.repartition(num_files) if num_files else df
    (
        out.write.mode(mode)
        .option("delimiter", delimiter)
        .option("header", header)
        .option("nullValue", null_val)
        .option("quote", quote)
        .option("escape", escape)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def copy_from(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = ",",
    header: bool = True,
    null_val: str = "",
    quote: str = '"',
    escape: str = "\\",
    multiline: bool = False,
) -> DataFrame:
    """COPY table FROM 'file.csv' (copyutil.py ImportTask): declared schema,
    no inference; malformed rows fail the job (cqlsh aborts on parse errors
    unless MAXPARSEERRORS set — PERMISSIVE mode would be that analog).

    `multiline=True` parses quoted fields containing newlines (cqlsh's
    csv dialect always does). SCALE NOTE: Spark's multiLine mode reads
    each file whole instead of by split, so parallelism drops to
    one-task-per-file — export with enough `num_files` when round-tripping
    newline-bearing text at scale."""
    return (
        spark.read.schema(schema)
        .option("delimiter", delimiter)
        .option("header", header)
        .option("nullValue", null_val)
        .option("quote", quote)
        .option("escape", escape)
        .option("multiLine", multiline)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("mode", "FAILFAST")
        .csv(path)
    )
