"""Custom stateful streaming operators — applyInPandasWithState.

The reference's counter columns (db/CounterMutation.java:49,
db/marshal/CounterColumnType.java) are commutative running totals
maintained across writes. The streaming analog is a per-key state store
folding increments micro-batch by micro-batch — exactly what
applyInPandasWithState provides: Arrow-batched groups + a typed GroupState
that survives across triggers (checkpointed, so exactly-once on restart).

This is the pattern slot for ANY custom stateful operator Spark lacks
natively (CEP-ish sequences, custom sessionization, decaying counters):
swap the fold body, keep the state plumbing.

Scale: state lives partitioned by key in the state store (RocksDB provider
on real clusters); a key's state is touched only when the key appears in a
batch. Watermark + timeout (GroupStateTimeout) bound state growth — the
TTL-expiry analog.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def running_counters(
    stream: DataFrame,
    key_col: str = "user_id",
    delta_col: str = "delta",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running counter totals across micro-batches.

    Emits (key, total, n_updates) on every batch where the key appears —
    the continuously-materialized counter column. Counters are commutative
    (CounterColumnType), so Python-int accumulation is exact and
    order-independent."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("total", T.LongType()),
            T.StructField("n_updates", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("total", T.LongType()), T.StructField("n", T.LongType())]
    )

    def fold(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, n = state.get
        else:
            total, n = 0, 0
        for pdf in pdfs:
            total += int(pdf[delta_col].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame({key_col: [key[0]], "total": [total], "n_updates": [n]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
