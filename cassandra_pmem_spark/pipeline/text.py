"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Reference relative: the SASI index analyzers (index/sasi/analyzer/
StandardAnalyzer.java, NonTokenizingAnalyzer.java) are the reference's only
text processing — tokenize/normalize/stem. We reproduce tokenize+normalize
and extend with the pipeline-grade operators. Everything is built-in
expressions (regexp / arrays) so the scoring runs inside codegen at full
scan speed; no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets: enough signal for an n-gram/stopword
# heuristic language ID. Ordered dict → deterministic tie-breaking.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"],
    "de": ["der", "die", "und", "das", "ein", "eine", "ist", "nicht", "mit", "den"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "una", "es", "en"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "中"],
}


def tokenize(col: Column | str) -> Column:
    """StandardAnalyzer-style tokenization: lowercase + split on non-word."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"[^\p{L}\p{N}]+")
    return F.filter(toks, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap estimator used for doc budgeting)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored estimator: counts word pieces + digits + punctuation runs
    (a GPT-2-style pre-tokenizer regex, simplified to portable character
    classes). Upper bound proxy for tokenizer cost without shipping a vocab."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    punctuation & digit & stopword ratios, uniqueness of vocabulary."""
    c = F.col(text_col)
    words = F.split(F.trim(c), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(c)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        (n_chars / n_words).cast("double").alias("q_mean_word_len"),
        (
            F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0)) / n_chars
        ).cast("double").alias("q_punct_ratio"),
        (
            F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0)) / n_chars
        ).cast("double").alias("q_digit_ratio"),
        (
            F.size(F.filter(words, lambda w: F.array_contains(en_stop, F.lower(w)))) / n_words
        ).cast("double").alias("q_stopword_ratio"),
        (F.size(F.array_distinct(words)) / n_words).cast("double").alias("q_unique_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: heuristic blend — penalize extreme
    lengths, low stopword incidence, high punctuation/digit density."""
    feat = quality_features(df, text_col)
    len_ok = F.when((F.col("q_words") >= 5) & (F.col("q_words") <= 100000), 1.0).otherwise(0.3)
    stop_ok = F.least(F.col("q_stopword_ratio") * 5, F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), 1 - F.col("q_punct_ratio") * 5)
    digit_ok = F.greatest(F.lit(0.0), 1 - F.col("q_digit_ratio") * 3)
    return feat.withColumn(
        "quality",
        ((len_ok + stop_ok + punct_ok + digit_ok) / 4).cast("double"),
    )


def lang_scores(col: Column | str) -> list[Column]:
    """Stopword-hit count per language over the token multiset."""
    toks = tokenize(col)
    out = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(f"score_{lang}")
        )
    return out


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits, 'und' when
    nothing matches. Deterministic tie-break by language order."""
    scored = df.select("*", *lang_scores(text_col))
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties (reversed fold)
        pred = F.when(F.col(f"score_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.withColumn(out_col, pred).drop(*[f"score_{l}" for l in langs])


def md5_fingerprint(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the normalized text (portable —
    identical in any engine, used by the exact-dedup oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def rolling_fingerprint(col: Column | str, gram: int = 8, window: int = 4) -> Column:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken): hash every
    character `gram`-gram, keep the minimum of each sliding `window` of
    hashes, dedupe. A local edit perturbs only the fingerprints whose
    windows cover it — most of the set survives (md5 flips entirely) —
    while any edit is guaranteed to be visible in SOME window.
    Returns a sorted array<bigint>."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(gram - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.xxhash64(F.substring(c, i, gram))
    )
    n_win = F.greatest(F.size(hashes) - F.lit(window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_win), lambda j: F.array_min(F.slice(hashes, j, window))
    )
    return F.array_sort(F.array_distinct(mins))


def html_to_text(col: Column | str) -> Column:
    """HTML → plain text extraction (the WET-conversion step of a crawl
    pipeline), pure JVM-side expressions: drop <script>/<style> blocks
    (non-greedy dotall — NO backreferences, so the same pattern runs on
    RE2-based engines like the DuckDB oracle), strip remaining tags,
    decode the common entities (&amp; LAST to avoid double-decoding),
    collapse whitespace. Zero shuffles, codegen-friendly — this is the
    cleaning op that runs over every crawled page at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, r"(?is)<script\b.*?</script\s*>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b.*?</style\s*>", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals — the corpus-cleaning statistics
    large-scale pretraining pipelines filter on (duplicate-word mass,
    most-common word/bigram coverage). Per-document counting is
    embarrassingly parallel, so it runs as ONE Arrow-batched pandas
    stage (a Counter per document; no shuffle, no cross-document state).
    Outputs are integer numerators/denominators, not fractions — exact,
    hash-stable, and the thresholding division is a trivial downstream
    expression. Tokenization is whitespace-split on space-trimmed
    lowered text, mirroring the ws-token oracle convention."""
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_distinct_words", T.LongType()),
            T.StructField("top_word_count", T.LongType()),
            T.StructField("top_bigram_count", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        ws = re.compile(r"\s+")
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split(str(text or "").strip(" ").lower()) if t]
                wc = Counter(toks)
                bc = Counter(
                    a + " " + b for a, b in zip(toks, toks[1:])
                )
                rows.append(
                    (
                        int(doc_id),
                        len(toks),
                        len(wc),
                        max(wc.values()) if wc else 0,
                        max(bc.values()) if bc else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_words",
                    "n_distinct_words",
                    "top_word_count",
                    "top_bigram_count",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def bm25_term_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance per (document, query term) — the retrieval /
    quality-scoring primitive (Robertson-Spärck Jones, public). Plan
    shape: ONE pass computes per-doc term frequencies as pure array
    expressions (no explode-shuffle), ONE single-row global aggregate
    (corpus size, total length, per-term document frequencies)
    broadcasts back, and a generator explode emits the (doc, term) rows.
    Zero data shuffles at any corpus size — the only exchange carries
    one row of corpus statistics. Per-row scores are emitted (not
    summed), so every value is a fixed-order float expression both
    engines compute identically (rounded 6 dp)."""
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    def _tf(term: str):
        # NB: a 2-arg lambda would be read as (element, index) by
        # F.filter — close over the term explicitly
        return F.size(F.filter(words, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(words).alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    per_term = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.col(f"tf_{i}").cast("long").alias("tf"),
                F.col(f"df_{i}").cast("long").alias("df"),
            )
            for i, t in enumerate(terms)
        ]
    )
    x = joined.select(
        id_col, "dl", "n_docs", "sum_dl", F.explode(per_term).alias("s")
    )
    tf = F.col("s.tf")
    dfq = F.col("s.df")
    idf = F.log((F.col("n_docs") - dfq + 0.5) / (dfq + 0.5) + 1.0)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = idf * (tf * F.lit(k1 + 1)) / (
        tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return x.select(
        id_col,
        F.col("s.term").alias("term"),
        tf.alias("tf"),
        dfq.alias("df"),
        F.col("dl").cast("long").alias("dl"),
        F.round(score, 6).alias("bm25"),
    )


# -- SASI analyzer equivalents (index/sasi/analyzer/) -------------------------

def standard_analyzer(
    col: Column | str, stopwords: list[str] | None = None
) -> Column:
    """StandardAnalyzer analog (index/sasi/analyzer/StandardAnalyzer.java):
    lowercase, tokenize on non-letter/digit, drop stopwords and empties —
    the token stream SASI indexes for LIKE/CONTAINS matching. Returns
    array<string>."""
    toks = tokenize(col)
    stops = stopwords if stopwords is not None else STOPWORDS["en"]
    stop_arr = F.array(*[F.lit(s) for s in stops])
    return F.filter(toks, lambda t: ~F.array_contains(stop_arr, t))


def non_tokenizing_analyzer(
    col: Column | str, case_sensitive: bool = False, normalized: bool = True
) -> Column:
    """NonTokenizingAnalyzer analog (NonTokenizingAnalyzer.java): treat the
    whole value as one term, optionally case-folded/trimmed — the mode SASI
    uses for exact/prefix matching on un-analyzed columns."""
    c = F.col(col) if isinstance(col, str) else col
    out = c if case_sensitive else F.lower(c)
    return F.trim(out) if normalized else out


def analyzed_match(df: DataFrame, text_col: str, term: str) -> DataFrame:
    """SASI CONTAINS-mode search: rows whose analyzed token stream contains
    the analyzed term (Expression.Op.CONTAINS over StandardAnalyzer output)."""
    return df.filter(F.array_contains(standard_analyzer(text_col), term.lower()))


def char_trigrams(col: Column | str, normalize: bool = True) -> Column:
    """Character trigrams of the normalized text (array<string>).
    Pure expressions: substring over a position sequence — no UDF, no
    explode until the caller wants one.

    Pass `normalize=False` when the column is ALREADY normalized: the
    transform lambda evaluates its input expression per position, so an
    embedded regexp chain runs once per trigram — O(len²) regex work
    per document. Callers on the hot path should normalize in a prior
    projection and hand in the plain column."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")) if normalize else c
    n = F.length(s)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: F.substring(s, i, 3)
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-trigram language-model scoring — the CCNet/KenLM-style
    perplexity quality signal: train P(c₃|c₁c₂) = n(c₁c₂c₃)/n(c₁c₂) on
    the corpus itself, then score every document by its mean trigram
    log-probability.

    The 100 TB shape: the MODEL is tiny (char-trigram vocabulary is
    bounded ≈ charset³) so both count tables aggregate down to a few
    MB and broadcast back — the corpus is read in one pass for counts
    and one pass for scoring, and no document-sized data ever shuffles
    (only (doc_id, ±micro-log) pairs into the final per-doc sum).

    Cross-engine exactness: each trigram's log₂-probability is rounded
    to MICRO-LOG INTEGERS (×1e6) BEFORE aggregation, so the per-doc sum
    is exact integer arithmetic — immune to float summation order,
    which differs between Spark partitions and the DuckDB oracle. The
    perplexity double is then derived from those exact integers with
    one pow() per doc.

    Returns (id_col, n_trigrams, sum_micro_log, ppl)."""
    # Materialize the normalized string in its own projection FIRST:
    # char_trigrams' transform lambda evaluates its input expression per
    # position, so handing it the raw normalize chain re-runs the
    # regexp per trigram — O(len²) regex work per document (measured
    # 34.8 s → 1.9 s at sf0.1 for this one change). A plain column
    # reference makes each element a single substring call.
    from cassandra_pmem_spark.plans.hints import ensure_scan_parallelism

    # both corpus passes fan out from this projection; a one-split scan
    # would run the whole explode+count on one core (see the helper)
    normed = ensure_scan_parallelism(
        df.select(
            F.col(id_col),
            F.trim(
                F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
            ).alias("__s"),
        )
    )
    tris = normed.select(
        F.col(id_col),
        F.explode(char_trigrams(F.col("__s"), normalize=False)).alias("tri"),
    )
    # ONE corpus pass: fold the explode to (doc, tri, cnt) triples and
    # materialize them (plans.hints.materialize — localCheckpoint by
    # default, env-gated reliable checkpoint on clusters). Both
    # the model fit and the scoring read the triples; previously the
    # scan + normalize + trigram explode ran twice ("counts + scoring").
    # The triples are the per-doc distinct trigrams — far fewer rows
    # than raw trigram occurrences, and integer counts keep every
    # downstream sum exact: n_trigrams = Σcnt, sum_micro_log = Σcnt·ml,
    # n3 = Σ_doc cnt — identical values to the per-occurrence sums.
    from cassandra_pmem_spark.plans.hints import materialize

    feat = materialize(
        tris.groupBy(id_col, "tri").agg(F.count("*").alias("cnt"))
    )
    c3 = feat.groupBy("tri").agg(F.sum("cnt").alias("n3"))
    # bigram (prefix) counts fold out of the ALREADY-AGGREGATED trigram
    # table — every trigram occurrence contributes its prefix exactly
    # once
    c2 = (
        c3.groupBy(F.substring("tri", 1, 2).alias("bg"))
        .agg(F.sum("n3").alias("n2"))
    )
    micro = F.round(
        F.log2(F.col("n3").cast("double") / F.col("n2")) * 1e6
    ).cast("long")
    model = (
        c3.withColumn("bg", F.substring("tri", 1, 2))
        .join(c2, "bg")
        .select("tri", micro.alias("ml"))
    )
    scored = feat.join(F.broadcast(model), "tri").select(
        F.col(id_col), "cnt", "ml"
    )
    n = F.sum("cnt")
    total = F.sum(F.col("cnt") * F.col("ml"))
    return scored.groupBy(id_col).agg(
        n.alias("n_trigrams"),
        total.alias("sum_micro_log"),
        F.round(
            F.pow(F.lit(2.0), -total.cast("double") / (n * 1e6)), 4
        ).alias("ppl"),
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_sentences: int = 2,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2) as one codegen
    pass: keep only lines that end in terminal punctuation, have at
    least `min_words_per_line` words, and don't mention javascript;
    then drop whole documents that contain "lorem ipsum" or curly
    braces, or whose surviving text has fewer than `min_sentences`
    sentences. Pure array/regexp expressions — the whole rule set runs
    at scan speed with zero shuffles, and every pattern is
    RE2-compatible so the oracle applies the identical rules.

    Returns (id_col, clean_text, n_kept_lines, n_sentences, kept)."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    kept_lines = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept_lines, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{") | c.contains("}")
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(kept_lines).cast("long").alias("n_kept_lines"),
        n_sent.cast("long").alias("n_sentences"),
        (
            ~has_lorem & ~has_brace & (n_sent >= min_sentences)
        ).alias("kept"),
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023 — the public hashed
    n-gram recipe): fit bag-of-hashed-ngram multinomials on a small
    TARGET corpus (the distribution you want more of) and on the RAW
    corpus, then weight every raw document by
    log p_target(x) − log p_raw(x); resampling keeps the top weights.

    Features are unigrams + bigrams of the whitespace-normalized text,
    hashed into `n_buckets` buckets with the portable md5 hash
    (dedup.md5_hash32 — reproducible in any engine, so the DuckDB
    oracle applies the identical bucketing). Add-one smoothing over the
    bucket space.

    The 100 TB shape: both models aggregate to ≤ n_buckets rows, the
    log-ratio table broadcasts back, and the corpus is read in two
    passes (counts + scoring) with only (doc, bucket, count) triples
    ever shuffling — no document text moves after the scan.

    Cross-engine exactness: each bucket's log-ratio is rounded to
    MICRO-LOG INTEGERS (×1e6, the ngram_lm_scores idiom) BEFORE the
    per-doc sum, so document weights are exact integer arithmetic —
    immune to float summation order across partitions.

    Returns (id_col, n_grams, w_micro): w_micro = Σ_b cnt_b · λ_b with
    λ_b = round(1e6 · (log2((t_b+1)/(T+B)) − log2((r_b+1)/(R+B))))."""
    from cassandra_pmem_spark.pipeline.dedup import md5_hash32, normalize_text

    def feats(df: DataFrame) -> DataFrame:
        from cassandra_pmem_spark.plans.hints import ensure_scan_parallelism

        words = F.split(normalize_text(text_col), " ")
        # the gram explode + md5 bucketing is the CPU-heavy pass; guard
        # against a one-split scan serializing it (no-op at scale)
        d = ensure_scan_parallelism(
            df.select(F.col(id_col), words.alias("__w"))
        )
        grams = F.concat(
            F.col("__w"),
            F.when(
                F.size("__w") < 2, F.array().cast("array<string>")
            ).otherwise(
                F.expr(
                    "transform(sequence(1, size(__w) - 1), "
                    "i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
                )
            ),
        )
        return (
            d.select(F.col(id_col), F.explode(grams).alias("__g"))
            .select(
                F.col(id_col),
                (md5_hash32(F.col("__g")) % n_buckets).alias("bucket"),
            )
            .groupBy(id_col, "bucket")
            .agg(F.count("*").alias("cnt"))
        )

    # ONE pass over the raw corpus: the featurized (doc, bucket, cnt)
    # triples are materialized once (plans.hints.materialize) and
    # feed BOTH the model fit and the
    # scoring join below. Previously the scan + gram explode + md5
    # bucketing — the CPU-heavy part — ran twice (model fit pass +
    # scoring pass); the triples are a tiny fraction of corpus bytes
    # (≤ n_buckets rows per doc, three ints), so materializing them
    # costs far less than re-reading and re-hashing the corpus.
    from cassandra_pmem_spark.plans.hints import materialize

    rf = materialize(feats(raw))
    # the two model frames are ≤ n_buckets rows; cache them so the
    # corpus-total aggregates below reuse them instead of replaying the
    # lineage
    tf = feats(target).groupBy("bucket").agg(F.sum("cnt").alias("t")).cache()
    rb = rf.groupBy("bucket").agg(F.sum("cnt").alias("r")).cache()
    # corpus totals as 1-row frames cross-joined in (the scalar-broadcast
    # pattern) — no driver collect
    t_tot = tf.agg(F.sum("t").alias("t_total"))
    r_tot = rb.agg(F.sum("r").alias("r_total"))
    lam = (
        rb.join(tf, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log2(
                        (F.coalesce(F.col("t"), F.lit(0)) + 1).cast("double")
                        / (F.col("t_total") + n_buckets)
                    )
                    - F.log2(
                        (F.col("r") + 1).cast("double") / (F.col("r_total") + n_buckets)
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lam"),
        )
    )
    # materialize the (≤ n_buckets-row) log-ratio table and release the
    # model caches — repeated calls must not leak cached frames into the
    # shared context (the scoring join below reads the checkpoint, not
    # the tf/rb lineage)
    lam = materialize(lam)
    tf.unpersist()
    rb.unpersist()
    return (
        rf.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam")).alias("w_micro"),
        )
    )
