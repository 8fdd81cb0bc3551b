"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk — exact cosine top-k: broadcast the (small) query set,
  one pass over the corpus, per-query heap via window rank. Baseline and
  verification oracle. Scales to any corpus size; cost linear in corpus ×
  |queries|.
- lsh_topk — random-hyperplane (SRP) bucketing: sign-bit signature, join on
  bucket, exact cosine only within buckets. Sub-linear candidate volume; the
  multi-probe `rotations` parameter trades recall for candidates. This is
  the 100 TB path: the corpus is hashed once and the join key is an int.

Dot products use F.aggregate over zipped arrays — JVM-side, no Python.
Hyperplanes are generated from a seeded NumPy RNG and inlined as literals,
so signatures are reproducible across runs/cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast — the plan
    is a single scan of the corpus with no shuffle until the final per-query
    rank (which shuffles only (query_id, id, sim) triples)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    # norms materialize once per row BEFORE the pair fan-out (identical
    # arithmetic to cosine(): dot/(na·nb), but norm isn't recomputed per pair)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    scored = c.crossJoin(q).select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        (dot(F.col("__cvec"), F.col("__qvec")) / (F.col("__cn") * F.col("__qn"))).alias(
            "cosine_sim"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _matmul_udf(mat: "np.ndarray", mode: str, n_probe: int = 0):
    """Arrow-batched matrix products against a broadcast-inlined constant
    matrix — the vectorized path for SRP signatures and IVF assignment.

    Per-row array expressions are the right call for tiny matrices (no
    Python worker involved), but signature/assignment work is matmul-shaped:
    at 50k vectors x 64 planes the expression path costs ~15-30s while one
    numpy matmul per Arrow batch costs milliseconds. mode:
      'srp'    -> int32 array of per-table bucket ids is built by the caller
                  from the sign bits; here returns packed sign bits as long
      'argmin' -> int32 nearest-row index (IVF list id)
      'probes' -> array<int> of the n_probe nearest row indices
    """
    from pyspark.sql.functions import pandas_udf

    M = mat.astype(np.float64)

    if mode == "argmin":

        @pandas_udf("int")
        def f(v: pd.Series) -> pd.Series:
            X = np.stack(v.to_numpy()).astype(np.float64)
            d = ((X * X).sum(1)[:, None] - 2.0 * (X @ M.T)
                 + (M * M).sum(1)[None, :])
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return f
    if mode == "probes":

        @pandas_udf("array<int>")
        def f(v: pd.Series) -> pd.Series:
            X = np.stack(v.to_numpy()).astype(np.float64)
            d = ((X * X).sum(1)[:, None] - 2.0 * (X @ M.T)
                 + (M * M).sum(1)[None, :])
            # stable sort: exact distance ties resolve to the lowest list id,
            # matching the SQL oracle's ORDER BY d, cid tie-break
            idx = np.argsort(d, axis=1, kind="stable")[:, :n_probe].astype("int32")
            return pd.Series(list(idx))

        return f

    @pandas_udf("array<boolean>")
    def f(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64)
        signs = (X @ M.T) > 0
        return pd.Series(list(signs))

    return f


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit i = sign(vec · plane_i).

    One transform over the literal plane matrix + one weighted fold — two
    small lambdas total, instead of `bits` separate dot-product lambdas
    (nested-lambda count is what inflates generated code; see the minhash
    note in dedup.py)."""
    plane_mat = F.array(*[F.array(*[F.lit(float(x)) for x in p]) for p in planes])
    dots = F.transform(
        plane_mat,
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    weights = F.array(*[F.lit(1 << i).cast("int") for i in range(len(planes))])
    return F.aggregate(
        F.zip_with(dots, weights, lambda d, w: F.when(d > 0, w).otherwise(F.lit(0))),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, join on bucket, exact cosine
    within buckets.

    OR-amplified with `tables` independent hash tables (candidate = bucket
    match in ANY table): single-table SRP recall decays fast when true
    neighbors sit near hyperplanes, and L tables lift recall ≈ 1−(1−p)^L at
    the cost of L× hashing + candidate dedup. Candidates per query ≈
    tables × corpus / 2^bits. Recall < 1 by construction — measured against
    brute_force_topk in tests."""
    # all tables' hyperplanes as ONE matrix: sign bits for every plane come
    # from a single Arrow-batched matmul per batch (signature work is
    # matmul-shaped — see _matmul_udf), then each table's bucket id folds
    # from its slice of the sign-bit vector with plain expressions
    all_planes = np.array(
        [p for t in range(tables) for p in _hyperplanes(dim, bits, seed + 1000 * t)]
    )
    sign_udf = _matmul_udf(all_planes, "srp")
    weights = F.array(
        *[F.lit(1 << (i % bits)).cast("int") for i in range(tables * bits)]
    )

    def with_buckets(df, idc, vec_alias):
        staged = df.select(
            idc,
            F.col(vec_col).alias(vec_alias),
            F.zip_with(
                sign_udf(F.col(vec_col).cast("array<double>")),
                weights,
                lambda sgn, w: F.when(sgn, w).otherwise(F.lit(0)),
            ).alias("__signed"),
        )
        buckets = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.aggregate(
                            F.slice("__signed", t * bits + 1, bits),
                            F.lit(0),
                            lambda acc, v: acc + v,
                        ).alias("bkt"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("tb")
        return staged.select(idc, vec_alias, buckets).select(
            idc, vec_alias, F.col("tb.tbl").alias("__tbl"), F.col("tb.bkt").alias("__bucket")
        )

    c = with_buckets(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), "neighbor_id", "__cvec")
    q = F.broadcast(
        with_buckets(queries.select(query_id_col, vec_col), query_id_col, "__qvec")
    )
    # score BEFORE deduplicating: a pair colliding in several tables has
    # the same cosine, and deduping scalar (qid, nid, sim) triples shuffles
    # ~20 bytes/row instead of two 64-float vectors per row
    scored = (
        c.join(q, on=["__tbl", "__bucket"])
        .select(
            F.col(query_id_col),
            F.col("neighbor_id"),
            cosine(F.col("__cvec"), F.col("__qvec")).alias("cosine_sim"),
        )
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.first("cosine_sim").alias("cosine_sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_dup_pairs_exact(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-dup pairs — the O(n²) verification tier used to
    measure LSH recall and as the oracle-checkable twin of
    embedding_near_dup_pairs. Use only on samples/buckets at scale."""
    v = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm(F.col(vec_col)).alias("n")
    )
    l, r = v.alias("l"), v.alias("r")
    return (
        l.join(r, F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            (dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs in embedding space: SRP-bucket self-join + exact
    cosine ≥ threshold. The dedup.py cascade's semantic tier."""
    planes = _hyperplanes(dim, bits, seed)
    sig = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        srp_signature(F.col(vec_col), planes).alias("b"),
    )
    l, r = sig.alias("l"), sig.alias("r")
    return (
        l.join(r, (F.col("l.b") == F.col("r.b")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            (dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


_QUANTIZER_CACHE: dict = {}  # trained coarse quantizers, keyed by caller-provided corpus key


def _kmeans_quantizer(sample: "np.ndarray", k: int, seed: int, iters: int) -> "np.ndarray":
    """Driver-side Lloyd k-means with seeded k-means++ init on a bounded
    sample (faiss-style: the coarse quantizer trains on a sample driver-side;
    only *assignment* is distributed). Deterministic given (sample, seed)."""
    rng = np.random.default_rng(seed)
    X = np.asarray(sample, dtype=np.float64)
    n = len(X)
    x2 = (X * X).sum(axis=1)
    # k-means++ seeding with an incrementally-maintained min-distance vector
    # (recomputing distances to every center each round is O(k²·n·d))
    centers = [X[rng.integers(n)]]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        c = X[rng.choice(n, p=probs)]
        centers.append(c)
        d2 = np.minimum(d2, ((X - c) ** 2).sum(axis=1))
    C = np.array(centers)
    for _ in range(iters):
        # ||x−c||² = ||x||² − 2x·c + ||c||² via one matmul — no n×k×d temp
        d = x2[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    return C



def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_cap: int = 4096,
    max_iter: int = 10,
    quantizer_cache_key: str | None = None,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the k-means-quantizer scale
    path complementing SRP-LSH.

    Train: seeded k-means++ on a `train_cap`-row sample, driver-side NumPy
    (quantizer quality needs a sample, not the corpus; at 100 TB you'd
    sample ~1e6 rows the same way — the train step is O(sample), never
    O(corpus)).
    Index: centroids are inlined as literals; every corpus vector computes
    its nearest-centroid id in one codegen'd expression — no ML pipeline,
    no extra shuffle; the list id becomes the equi-join key exactly like
    the LSH bucket.
    Search: each query probes its n_probe nearest centroids; exact cosine
    only within probed lists. Recall/cost dial = n_probe/n_centroids.
    """
    if centroids is not None:
        # caller-provided coarse quantizer (e.g. anchor vectors, or centroids
        # trained offline) — skips the k-means step entirely
        C = np.asarray(centroids, dtype=np.float64)
        n_centroids = len(C)
        cache_key = None
    else:
        cache_key = (
            (quantizer_cache_key, n_centroids, seed, train_cap, max_iter)
            if quantizer_cache_key
            else None
        )
        C = _QUANTIZER_CACHE.get(cache_key) if cache_key else None
    if C is None:
        sample = np.array(
            [r[0] for r in corpus.select(F.col(vec_col).cast("array<double>")).limit(train_cap).collect()]
        )
        C = _kmeans_quantizer(sample, n_centroids, seed, max_iter)
        if cache_key:
            _QUANTIZER_CACHE[cache_key] = C

    # assignment and probes are matmul-shaped: one Arrow-batched numpy
    # matmul per batch (see _matmul_udf) — the per-row expression variant
    # costs ~30s at 50k×64 corpus while the matmul costs milliseconds
    assign_udf = _matmul_udf(C, "argmin")
    probe_udf = _matmul_udf(C, "probes", n_probe=n_probe)

    # coalesce makes the join key provably non-null, so the join does
    # NOT inject an isnotnull filter — which would be pushed below this
    # projection and evaluate the assignment UDF twice per corpus row
    # (guide §4.4's duplicated-ArrowEvalPython pattern, observed in the
    # sim_ivf_topk plan). argmin never actually returns null, so the -1
    # never fires; unlike asNondeterministic (measured +0.25 s fixed
    # cost here) this keeps the optimizer's other freedoms.
    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.coalesce(
            assign_udf(F.col(vec_col).cast("array<double>")), F.lit(-1)
        ).alias("__list"),
    )

    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe_udf(F.col(vec_col).cast("array<double>"))).alias("__list"),
    )

    scored = c_assigned.join(F.broadcast(probes), on="__list").select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        cosine(F.col("__cvec"), F.col("__qvec")).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    corpus: DataFrame,
    centroids: "np.ndarray",
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space with a coarse quantizer, then drop the larger-id
    member of every within-cluster pair whose cosine exceeds the
    threshold — textual dedup can't see paraphrases; this tier can.

    The pairwise stage is confined WITHIN clusters (the property that
    makes SemDeDup run at corpus scale: k clusters cut candidate pairs
    by ~k), and assignment is the same Arrow-batched argmin matmul the
    IVF index uses — centroids inline as literals, no extra shuffle.
    Returns the surviving rows of `corpus`."""
    C = np.asarray(centroids, dtype=np.float64)
    assign_udf = _matmul_udf(C, "argmin")
    a = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign_udf(F.col(vec_col).cast("array<double>")).alias("__list"),
    )
    l, r = a.alias("l"), a.alias("r")
    pairs = l.join(
        r,
        (F.col("l.__list") == F.col("r.__list"))
        & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("keep_id"),
        F.col("r.id").alias("drop_id"),
        cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
    )
    drop = (
        pairs.filter(F.col("cos") >= threshold)
        .select(F.col("drop_id").alias(id_col))
        .distinct()
    )
    return corpus.join(drop, id_col, "left_anti")
