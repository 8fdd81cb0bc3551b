"""Sources/sinks (SURVEY §2.1): CSV COPY, virtual tables, CDC stream.

Parquet is the primary format (the SSTable non-port); these cover the
reference's auxiliary IO surfaces.
"""
