"""User-defined aggregates — CREATE AGGREGATE analog
(cql3/functions/UDAggregate.java:44,51-53: SFUNC + STYPE + FINALFUNC +
INITCOND; grammar Parser.g createAggregate rule).

A CQL UDA folds a state function over every row of a group, then applies an
optional final function. Spark realization: `applyInPandas` — each group
arrives as one Arrow-backed pandas DataFrame, the fold runs vectorized (or
row-wise for genuinely sequential state), and the result is one row per
group. This is the sanctioned Python slow path (Arrow batches, not
row-at-a-time pickling) — the reference similarly sandboxes UDA execution
off the hot path (UDFExecutorService.java).

Scale: one shuffle on the group key, then embarrassingly parallel per-group
folds. Skewed groups are the hazard (one giant pandas frame) — mirror of
the reference's wide-partition problem; salt or pre-aggregate when a group
won't fit an executor.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def create_aggregate(
    grouped_key: Sequence[str],
    sfunc: Callable,  # (state, pandas.DataFrame) -> state  — vectorized fold
    finalfunc: Callable | None,  # state -> scalar-or-tuple
    initcond,
    result_schema: T.StructType,
):
    """Build a UDA runner: df.groupBy(key) → one row per group.

    sfunc sees the whole group as a pandas DataFrame (the vectorized analog
    of CQL's per-row SFUNC — semantically identical because CQL state folds
    are order-insensitive for the aggregates CQL allows); finalfunc maps
    final state to the output value(s) (UDAggregate.java:51-53 FINALFUNC,
    identity when None, like CQL)."""

    def run(df: DataFrame) -> DataFrame:
        key_cols = list(grouped_key)

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            state = sfunc(initcond, pdf)
            out = finalfunc(state) if finalfunc else state
            if not isinstance(out, tuple):
                out = (out,)
            keys = tuple(pdf[k].iloc[0] for k in key_cols)
            return pd.DataFrame([keys + out], columns=[f.name for f in result_schema.fields])

        return df.groupBy(*key_cols).applyInPandas(fold, schema=result_schema)

    return run


def weighted_avg_cents_uda(key: Sequence[str], price_col: str, weight_col: str):
    """Example UDA (UFTest.java-style): weighted average in integer cents.

    State = (Σ w·cents, Σ w) accumulated in Python ints (exact, associative,
    order-independent → deterministic at any parallelism, matching a DuckDB
    oracle in integer arithmetic)."""
    schema = T.StructType(
        [T.StructField(k, T.LongType()) for k in key]
        + [T.StructField("weighted_avg", T.DoubleType())]
    )

    def sfunc(state, pdf: pd.DataFrame):
        import numpy as np

        cents = np.floor(pdf[price_col].to_numpy() * 100).astype("int64")
        w = pdf[weight_col].to_numpy().astype("int64")
        return (state[0] + int((cents * w).sum()), state[1] + int(w.sum()))

    def finalfunc(state):
        num, den = state
        return float("nan") if den == 0 else num / (100.0 * den)

    return create_aggregate(key, sfunc, finalfunc, (0, 0), schema)
