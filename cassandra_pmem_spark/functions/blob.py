"""blobAsX / XAsBlob reinterpret casts (cql3/functions/BytesConversionFcts.java:36).

CQL registers a bytes↔type reinterpret pair for every native type. On Spark,
text↔binary is a straight cast; fixed-width numerics need explicit big-endian
byte encoding (Cassandra serializes numerics big-endian).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def text_as_blob(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.BinaryType())


def blob_as_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.StringType())


def bigint_as_blob(col: Column | str) -> Column:
    """8-byte big-endian, matching LongType serialization in the reference."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.lpad(F.hex(c.cast(T.LongType())), 16, "0"))


def blob_as_bigint(col: Column | str) -> Column:
    """Inverse of bigint_as_blob, incl. negatives: conv() reads the 8 bytes
    as an unsigned decimal, so two's-complement wraps back via 2^64."""
    c = F.col(col) if isinstance(col, str) else col
    unsigned = F.conv(F.hex(c), 16, 10).cast(T.DecimalType(20, 0))
    two63 = F.lit("9223372036854775808").cast(T.DecimalType(20, 0))
    two64 = F.lit("18446744073709551616").cast(T.DecimalType(21, 0))
    return (
        F.when(unsigned >= two63, (unsigned - two64)).otherwise(unsigned)
    ).cast(T.LongType())


def int_as_blob(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.lpad(F.hex(c.cast(T.IntegerType()).cast(T.LongType())), 8, "0"))
