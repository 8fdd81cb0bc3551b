"""CREATE FUNCTION analog — user-defined scalar functions
(cql3/functions/UDFunction.java:69,242; JavaBasedUDFunction.java).

CQL UDFs declare CALLED ON NULL INPUT or RETURNS NULL ON NULL INPUT
(UDFunction.java — `calledOnNullInput`); the latter short-circuits without
invoking the body. The reference sandboxes UDF bytecode
(UDFByteCodeVerifier.java) and runs them on a quota'd executor
(UDFExecutorService.java) — Spark's process-isolated Python workers are the
analog, with Arrow batching as the fast path.

Row-at-a-time Python UDFs are the slow path; register the pandas variant
whenever the body vectorizes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def create_function(
    spark: SparkSession,
    name: str,
    body: Callable,
    return_type: T.DataType | str,
    called_on_null_input: bool = True,
):
    """CREATE [OR REPLACE] FUNCTION (grammar Parser.g createFunction rule).

    RETURNS NULL ON NULL INPUT wraps the body to short-circuit nulls
    exactly like the reference skips invocation (UDFunction.java:382
    executeUserDefined path)."""
    fn = body
    if not called_on_null_input:
        def fn(*args, _body=body):  # noqa: ANN001
            if any(a is None for a in args):
                return None
            return _body(*args)

    return spark.udf.register(name, fn, return_type)


def create_pandas_function(
    spark: SparkSession,
    name: str,
    body: Callable,
    return_type: T.DataType | str,
):
    """Vectorized CREATE FUNCTION: Arrow-batched (the UDA/UDF fast path —
    the sandboxed-executor analog with batch amortization)."""
    from pyspark.sql.functions import pandas_udf

    return spark.udf.register(name, pandas_udf(body, return_type))
