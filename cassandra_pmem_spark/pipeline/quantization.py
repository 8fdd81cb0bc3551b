"""Embedding quantization for billion-vector similarity search.

At 100 TB an embedding column dominates storage and shuffle cost;
production ANN systems quantize vectors to int8 (or smaller) and rank
by INTEGER dot products, reranking the short list with full precision
only if needed. This module implements symmetric scalar quantization
(SQ8): one global scale = max |x| over the corpus — a single tiny
aggregate broadcast back — then code_i = round(x_i/scale·127) ∈
[-127, 127].

Everything stays in built-in expressions: transform for the per-dim
quantize, zip_with + aggregate for the integer dot product, one window
for the per-query rank. The scoring path moves only (query_id,
neighbor_id, int64) triples — int8 codes cut the scanned bytes 4× vs
float32, and the integer dot product is EXACT, so ranks are fully
deterministic and the DuckDB oracle reproduces every score bit for bit
(no float-summation-order hazard at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_scale(df: DataFrame, vec_col: str = "embedding"):
    """Global symmetric scale: max |x| over every vector component.
    One row out — broadcast it back wherever codes are built."""
    return df.agg(
        F.max(
            F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
        ).alias("__scale")
    )


def sq8_codes(
    df: DataFrame,
    scale_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): code_i = round(x_i/scale·127)."""
    return df.crossJoin(F.broadcast(scale_df)).select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x / F.col("__scale") * 127).cast("int"),
        ).alias("codes"),
    )


def int_dot(a, b):
    """Exact int64 dot product of two int-code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k by int8-quantized dot product (the SQ8 ANN scoring path).

    The scale trains on the CORPUS and quantizes both sides — queries
    must live in the corpus's coordinate system. Query codes broadcast;
    the corpus is scanned once; the only shuffle carries (query_id,
    neighbor_id, int64 score) for the final rank. Ties break on
    neighbor_id so output is total-ordered and engine-independent."""
    scale = corpus_scale(corpus, vec_col)
    c = sq8_codes(corpus, scale, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    q = F.broadcast(
        sq8_codes(queries, scale, query_id_col, vec_col).withColumnRenamed(
            "codes", "__qcodes"
        )
    )
    scored = c.crossJoin(q).select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        int_dot(F.col("codes"), F.col("__qcodes")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )


def pq_int_codes(
    int_codes: DataFrame,
    anchors_int,
    m: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode over int8 codes: split each vector
    into m subvectors and store, per subspace, the index of the nearest
    codebook centroid (squared-L2, ties to the lowest index). All
    arithmetic is integer, so the assignment is EXACT — no float
    argmin boundary to disagree about across engines. Vectorized
    numpy in mapInPandas: one (batch × centroids × subspaces) distance
    tensor per Arrow batch."""
    import numpy as np
    import pandas as pd

    A = np.asarray(anchors_int, dtype=np.int64)  # (k', d)
    kprime, d = A.shape
    dsub = d // m
    Asub = A.reshape(kprime, m, dsub)

    def run(batches):
        for pdf in batches:
            X = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, d)
            Xsub = X.reshape(len(X), m, dsub)
            # (n, k', m): squared L2 per subspace
            diff = Xsub[:, None, :, :] - Asub[None, :, :, :]
            dists = (diff * diff).sum(-1)
            codes = dists.argmin(axis=1)  # ties → lowest index (numpy)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pq": [c.astype("int32").tolist() for c in codes],
                }
            )

    return int_codes.mapInPandas(run, f"{id_col} BIGINT, pq ARRAY<INT>")


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    anchor_count: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ + ADC retrieval, integer-exact end to end.

    Pipeline: SQ8-quantize everything with ONE corpus-trained scale;
    codebook j's centroids are the j-th subvectors of the first
    `anchor_count` corpus vectors (the anchored-quantizer construction
    that keeps training SQL-reproducible — `sim_ivf_rerank`'s idiom);
    corpus rows store only m PQ codes; each query precomputes its
    (m × k') inner-product table driver-side (bounded: queries are a
    handful, the table is m·k' int64s) and scoring is m table lookups
    per candidate — the ADC fast path. Integer arithmetic throughout
    makes scores and ranks bit-reproducible.

    At scale: PQ codes are m bytes per vector (vs 4·d float32) — the
    memory layout that lets a billion-vector index live in RAM; the
    scan streams codes, the only shuffle is the final per-query rank."""
    scale = corpus_scale(corpus, vec_col)
    ints = sq8_codes(corpus, scale, id_col, vec_col)
    anchors = [
        r["codes"]
        for r in ints.filter(F.col(id_col) < anchor_count)
        .orderBy(id_col)
        .collect()
    ]  # bounded anchor collect, same contract as sim_ivf_rerank
    corpus_pq = pq_int_codes(ints, anchors, m, id_col).withColumnRenamed(
        id_col, "neighbor_id"
    )

    q_ints = sq8_codes(queries, scale, query_id_col, vec_col).collect()
    d = len(anchors[0])
    dsub = d // m
    kprime = len(anchors)
    tables = []
    for r in q_ints:
        qc = r["codes"]
        tab = []
        for j in range(m):
            for c in range(kprime):
                acc = 0
                for i in range(dsub):
                    acc += qc[j * dsub + i] * anchors[c][j * dsub + i]
                tab.append(acc)
        tables.append((r[query_id_col], tab))
    spark = corpus.sparkSession
    tdf = F.broadcast(
        spark.createDataFrame(
            tables, f"{query_id_col} BIGINT, __table ARRAY<BIGINT>"
        )
    )

    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(
            F.col("__table"),
            (j * kprime + F.element_at(F.col("pq"), j + 1) + 1).cast("int"),
        ),
    )
    scored = corpus_pq.crossJoin(tdf).select(
        F.col(query_id_col), F.col("neighbor_id"), score.alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "score")
    )
