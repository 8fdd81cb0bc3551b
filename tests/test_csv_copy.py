"""COPY TO/FROM option parity (pylib/cqlshlib/copyutil.py:322-327):
QUOTE and ESCAPE survive a round trip, including fields containing the
delimiter, the quote char itself, newlines, and the QUOTE==ESCAPE form
where csv doubles the quote instead of escaping."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cassandra_pmem_spark.sources.csv_copy import copy_from, copy_to

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("s", T.StringType()),
    ]
)

ROWS = [
    (1, 'plain'),
    (2, 'has,comma'),
    (3, 'has "quotes" inside'),
    (4, 'line\nbreak'),
    (5, None),
]


def _roundtrip(spark, tmp_path, **opts):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "csv")
    copy_to(df, path, **opts)
    # ROWS carries an embedded newline — quoted-newline fields need the
    # reader's whole-file mode (scale note in copy_from's docstring)
    back = copy_from(spark, path, SCHEMA, multiline=True, **opts)
    return sorted((r.k, r.s) for r in back.collect())


class TestCopyQuoteEscape:
    def test_default_quote_escape(self, spark, tmp_path):
        assert _roundtrip(spark, tmp_path) == sorted(ROWS)

    def test_custom_quote_char(self, spark, tmp_path):
        assert _roundtrip(spark, tmp_path, quote="'") == sorted(ROWS)

    def test_quote_equals_escape_doubles(self, spark, tmp_path):
        # copyutil.py:325-327: QUOTE == ESCAPE drops the escapechar and
        # the csv dialect doubles the quote instead
        assert _roundtrip(spark, tmp_path, quote='"', escape='"') == sorted(ROWS)

    def test_custom_delimiter_with_quoting(self, spark, tmp_path):
        rows = _roundtrip(spark, tmp_path, delimiter="|")
        assert rows == sorted(ROWS)

    def test_null_val_distinct_from_empty(self, spark, tmp_path):
        df = spark.createDataFrame([(1, None), (2, "")], SCHEMA)
        path = str(tmp_path / "nv")
        copy_to(df, path, null_val="NULL")
        back = copy_from(spark, path, SCHEMA, null_val="NULL")
        got = {r.k: r.s for r in back.collect()}
        assert got[1] is None and got[2] == ""
