"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal — the 100 TB training-data operators (BASELINE.json north star).

Oracles: the md5-based portable variants (minhash/simhash) are mirrored in
DuckDB SQL exactly; xxhash64/LSH variants are rows-only (engine-specific
hash order) — the exact twins above them are what the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_pmem_spark.catalog import load_table
from cassandra_pmem_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs_md5,
    minhash_signature_md5,
    ngram_jaccard_pairs,
    simhash32_md5,
    word_shingles,
)
from cassandra_pmem_spark.pipeline.multimodal import attach_media, extract_image_features
from cassandra_pmem_spark.pipeline.similarity import (
    brute_force_topk,
    lsh_topk,
    near_dup_pairs_exact,
)
from cassandra_pmem_spark.pipeline.text import (
    bpe_ish_token_count,
    lang_id,
    md5_fingerprint,
    quality_score,
    token_count,
)

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_MINHASH_K = 16


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: smallest doc_id survives per normalized-text group."""
    docs = load_table(spark, "documents", sf_dir)
    return exact_dedup(docs, "text", "doc_id").select("doc_id", "lang", "source")


def dedup_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard estimation (portable md5 signature, K=16) over all
    pairs of a doc sample — signature agreement fraction ≈ Jaccard."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 40)
    sigs = docs.select(
        F.col("doc_id"),
        minhash_signature_md5(word_shingles("text", 3), _MINHASH_K).alias("sig"),
    )
    l = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    r = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return (
        l.join(r, F.col("a") < F.col("b"))
        .select("a", "b", (agree / F.lit(float(_MINHASH_K))).alias("jaccard_est"))
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprints (portable 32-bit md5 variant; the
    64-bit xxhash64 production variant is dedup.simhash64)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", simhash32_md5("text").alias("simhash"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard over all pairs of a sample —
    the verification tier of the dedup cascade."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 30)
    ids = docs.select(F.col("doc_id"))
    pairs = (
        ids.select(F.col("doc_id").alias("a"))
        .join(ids.select(F.col("doc_id").alias("b")), F.col("a") < F.col("b"))
    )
    return ngram_jaccard_pairs(docs, pairs, "doc_id", "text", shingle=3)


def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs — the sub-quadratic scale path
    itself (band-key self-join, no all-pairs stage), run on documents plus
    planted duplicates so band collisions exist. md5-portable variant; the
    xxhash64 production path (minhash_lsh_pairs) shares the identical plan
    shape."""
    base = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300).select(
        "doc_id", "text"
    )
    planted = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = base.union(planted)
    return minhash_lsh_pairs_md5(corpus, num_hashes=16, bands=4, shingle=3).select(
        "a", "b", "band_hits"
    )


def dedup_cascade_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup cascade (exact → MinHash-LSH → exact-Jaccard verify →
    keep-min) over documents plus planted exact duplicates. The oracle is
    the exhaustive O(n²) Jaccard — equality shows the sub-quadratic cascade
    loses nothing (LSH miss prob ≈ 2e-5 at J=0.7 with 16 bands of r=2)."""
    from cassandra_pmem_spark.pipeline.dedup import dedup_cascade

    base = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    planted = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = base.union(planted)
    return dedup_cascade(
        corpus, jaccard_threshold=0.7, num_hashes=32, bands=16
    ).select("doc_id")


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id<5 over the whole corpus."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine_sim"
    )


def sim_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ 0.4) — the O(n²)
    verification tier, bounded to a vec_id<500 sample exactly as it would
    be used at scale (SCALE.md: exhaustive verifiers run on samples/buckets;
    the production path is embedding_near_dup_pairs / sim_lsh_topk)."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 500)
    return near_dup_pairs_exact(emb, threshold=0.4)


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k. Oracle-backed: the hyperplanes are
    deterministic seeded literals, so the DuckDB twin reproduces the exact
    bucket assignment (_lsh_topk_oracle). Recall vs brute force is
    additionally asserted in tests."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return lsh_topk(emb, queries, k=10, bits=4, tables=8).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine_sim"
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list approximate top-k with a deterministic STRIDED
    coarse quantizer (centroids = the ≤16 embeddings with vec_id ≡ 3
    mod 37, id-ordered — spread across the id space, unlike
    sim_ivf_rerank's contiguous vec_id<16 anchors), so assignment,
    probing, and the exact-cosine tier are all reproducible in static
    SQL and the driver row is hash-matched. The iterative k-means
    trainer stays available in ivf_topk(train_cap=…) and keeps its
    recall-vs-brute-force unit tests; this row pins the DATA PATH —
    codegen'd nearest-centroid assignment, n_probe list pruning,
    in-list exact rerank — which is identical whichever quantizer
    produced the centroids. The ≤16-row anchor collect is bounded by
    construction."""
    import numpy as np

    from cassandra_pmem_spark.pipeline.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    anchors = np.array(
        [
            r[0]
            for r in emb.filter((F.col("vec_id") % 37) == 3)
            .orderBy("vec_id")
            .limit(16)
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivf_topk(emb, queries, k=10, n_probe=6, centroids=anchors).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine_sim"
    )


def sim_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with an anchored (data-chosen but deterministic) coarse quantizer:
    centroids are the embeddings of vec_id<16, so list assignment, probing,
    and the exact-cosine re-rank tier are all reproducible in static SQL —
    this is the oracle-backed twin of sim_ivf_topk, isolating everything
    except the (unit-tested, iterative) k-means training step. The 16-row
    anchor collect is bounded by construction."""
    import numpy as np

    from cassandra_pmem_spark.pipeline.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    anchors = np.array(
        [
            r[0]
            for r in emb.filter(F.col("vec_id") < 16)
            .orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivf_topk(emb, queries, k=10, n_probe=6, centroids=anchors).select(
        "query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cosine_sim"
    )


def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("ws_tokens"),
        bpe_ish_token_count("text").cast("long").alias("bpe_tokens"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return quality_score(docs, "text").select(
        "doc_id",
        F.col("q_chars").cast("long").alias("q_chars"),
        F.col("q_words").cast("long").alias("q_words"),
        "q_mean_word_len",
        "q_punct_ratio",
        "q_digit_ratio",
        "q_stopword_ratio",
        "q_unique_ratio",
        "quality",
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return lang_id(docs, "text").select("doc_id", "lang", "lang_pred")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", md5_fingerprint("text").alias("fp"))


def text_sasi_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SASI analyzer chain, oracle-verified (index/sasi/analyzer/
    StandardAnalyzer.java, NonTokenizingAnalyzer.java): lowercase +
    non-letter/digit tokenization + stopword drop, the CONTAINS-mode term
    match over the analyzed stream, and the non-tokenizing case-fold/trim
    mode — DuckDB mirrors the whole chain with regexp_split + list_filter
    on the same unicode classes. Scalar projections only (first term,
    term count, match flag) so the driver canonicalizer sorts cleanly."""
    from cassandra_pmem_spark.pipeline.text import (
        non_tokenizing_analyzer,
        standard_analyzer,
    )

    docs = load_table(spark, "documents", sf_dir)
    terms = standard_analyzer("text")
    return docs.select(
        "doc_id",
        F.size(terms).alias("n_terms"),
        F.element_at(terms, 1).alias("first_term"),
        non_tokenizing_analyzer("source").alias("norm_source"),
        F.array_contains(terms, "data").alias("has_data"),
    )


_SASI_STOPS = "['the','and','of','to','a','in','is','that','it','for']"
_SASI_ORACLE = f"""
WITH a AS (
  SELECT doc_id,
    list_filter(
      regexp_split_to_array(lower(trim(text)), '[^\\p{{L}}\\p{{N}}]+'),
      t -> t <> '' AND NOT list_contains({_SASI_STOPS}, t)) AS terms,
    trim(lower(source)) AS norm_source
  FROM documents
)
SELECT doc_id, len(terms) AS n_terms, terms[1] AS first_term, norm_source,
       list_contains(terms, 'data') AS has_data
FROM a
"""


def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan, oracle-verified (multimodal.py
    frame_sample_plan): each media item expands to (item_id, frame_ts_ms)
    rows from METADATA only — the explode runs JVM-side and the expensive
    decode stage would see exactly the sampled frames. duration_ms is the
    payload byte length here, so DuckDB regenerates the same series."""
    from cassandra_pmem_spark.pipeline.multimodal import frame_sample_plan

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "video", "video/x-fake", "doc_id")
    return frame_sample_plan(media, every_ms=500)


_FRAME_PLAN_ORACLE = """
SELECT doc_id AS item_id,
       unnest(range(0, octet_length(encode(text)) + 1, 500)) AS frame_ts_ms
FROM documents
"""


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media (data, meta) layout over utf8 bytes of documents.text —
    metadata predicates never touch the binary column."""
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "image", "application/octet-stream", "doc_id")
    return media.select(
        "item_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.mime").alias("mime"),
        F.octet_length("data").cast("long").alias("n_bytes"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction with REAL image decode: each
    document's utf8 bytes become a deterministic grayscale PNG
    (png_encode_stage, pure-stdlib encoder) and the feature stage decodes
    them back through the actual PNG codec (codecs.py) — no fake path.

    Oracle-backed: the decoded pixels are exactly the utf8 text bytes
    zero-padded to a 32-multiple, so DuckDB can recompute the byte
    histogram features. A hash match therefore PROVES the PNG
    encode→decode round-trip is lossless (a fake decode over the
    compressed PNG bytes would produce different statistics). Entropy is
    rounded to 6 dp on both sides (summation order differs between
    engines); features pass through float32 on both sides, which absorbs
    double-summation-order noise."""
    from cassandra_pmem_spark.pipeline.multimodal import png_encode_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "image", "image/png", "doc_id")
    feats = extract_image_features(png_encode_stage(media), dim=8, fake_decode=False)
    # Driver-facing output must be scalar (the driver's pandas canonicalizer
    # can't sort array cells): flatten the 8-dim feature vector to f0..f7.
    # The library API (extract_image_features) keeps the array form.
    return feats.select(
        "item_id",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


def multimodal_features_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-format pipeline, oracle-checked: each document's utf8
    bytes (forced even, one byte per uniform 8×8 block) become a baseline
    JPEG through the pure-stdlib encoder, and the feature stage decodes
    them back through the actual Huffman+IDCT decoder (pipeline/jpeg.py) —
    no fake path. Block-uniform even values round-trip BIT-EXACTLY through
    the Annex K tables (jpeg.py docstring derives why), so DuckDB can
    recompute the decoded-pixel histogram from the text: each evenized
    byte appears 64× in the decoded image, which cancels in the histogram
    proportions. A hash match proves the full JPEG encode→entropy-decode→
    IDCT chain reproduced every block."""
    from cassandra_pmem_spark.pipeline.multimodal import jpeg_encode_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "image", "image/jpeg", "doc_id")
    feats = extract_image_features(jpeg_encode_stage(media), dim=8, fake_decode=False)
    return feats.select(
        "item_id",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


def multimodal_features_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color-JPEG pipeline, oracle-checked: evenized utf8 bytes
    become achromatic RGB uniform blocks encoded as 4:2:0 YCbCr baseline
    JPEG (pipeline/jpeg.py encode_jpeg_color — interleaved MCUs, chroma
    tables K.2/K.4/K.6) and decoded back through the multi-component
    Huffman+IDCT+upsample+YCbCr→RGB decoder. Achromatic even blocks
    round-trip bit-exactly (jpeg_encode_color_stage docstring derives
    why), and each byte contributes three identical channel samples, so
    the decoded histogram PROPORTIONS equal the grayscale variant's —
    the same DuckDB oracle covers both. A hash match proves the whole
    color chain (RGB→YCbCr→subsample→quant→Huffman→decode→upsample→RGB)
    reproduced every pixel."""
    from cassandra_pmem_spark.pipeline.multimodal import jpeg_encode_color_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "image", "image/jpeg", "doc_id")
    feats = extract_image_features(jpeg_encode_color_stage(media), dim=8, fake_decode=False)
    return feats.select(
        "item_id",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


def multimodal_features_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG pipeline, oracle-checked: the SOF2 multi-scan
    encoder (DC first + refinement, per-component AC first + refinement
    with EOB runs — pipeline/jpeg.py encode_jpeg_progressive) feeds the
    multi-scan successive-approximation decoder. Evenized uniform blocks
    round-trip bit-exactly through the progressive path too, so the SAME
    DuckDB oracle as the sequential variant verifies the whole T.81 G
    machinery end-to-end."""
    from cassandra_pmem_spark.pipeline.multimodal import jpeg_encode_progressive_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "image", "image/jpeg", "doc_id")
    feats = extract_image_features(
        jpeg_encode_progressive_stage(media), dim=8, fake_decode=False
    )
    return feats.select(
        "item_id",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        *[F.col("feature")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


def multimodal_audio_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata extraction (header walk only — ISO 11172-3 §2.4.1.3):
    each document deterministically becomes a valid MPEG-1 Layer III
    frame sequence (frame count = byte-length mod 7 + 2), and the REAL
    frame-header walker recovers frames / sample rate / duration /
    bitrate from sync words and the bitrate/sample-rate tables. The
    oracle recomputes all four from the length formula — a hash match
    proves the frame-length arithmetic walked every header."""
    from cassandra_pmem_spark.pipeline.multimodal import mp3_meta_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "audio", "audio/mpeg", "doc_id")
    return mp3_meta_stage(media)


def multimodal_video_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-video decode, oracle-checked: each document
    deterministically becomes an animated GIF (pipeline/gif.py — a full
    GIF89a codec: LZW both directions, graphic-control extensions,
    disposal compositing) and the REAL decoder walks it back into timed
    frames — one row per frame with the frame's delay and its exact
    uniform pixel value (min_px == max_px). The oracle recomputes frame
    count, delays, and pixel values from the construction arithmetic — a
    hash match proves the LZW bit-stream, the palette mapping, and the
    GCE delay walk reproduced every frame of every item. This is the
    repo's video modality: the same headers+frames shape MP4/ISO-BMFF
    walkers feed, but with the sample decode REAL."""
    from cassandra_pmem_spark.pipeline.multimodal import gif_frames_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "video", "image/gif", "doc_id")
    return gif_frames_stage(media)


_GIF_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS L,
         unnest(range(0, octet_length(encode(text)) % 5 + 2)) AS i
  FROM documents
)
SELECT doc_id AS item_id,
  CAST(L % 5 + 2 AS BIGINT) AS n_frames,
  CAST(i AS BIGINT) AS frame_idx,
  CAST((i % 4 + 1) * 5 AS INT) AS delay_cs,
  CAST(16 AS INT) AS width,
  CAST(16 AS INT) AS height,
  CAST((L * 7 + i * 13) % 256 AS BIGINT) AS min_px,
  CAST((L * 7 + i * 13) % 256 AS BIGINT) AS max_px
FROM f
"""


def multimodal_video_mjpeg_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video decode, oracle-checked: each document
    deterministically becomes an MJPEG AVI (pipeline/avi.py — RIFF/AVI
    container per the public spec with avih/strh/strf headers and an
    idx1 index the decoder cross-checks; every frame a real baseline
    JPEG through pipeline/jpeg.py's Huffman+IDCT), and the decoder
    walks it back into timed frames. Uniform even frames round-trip the
    lossy codec bit-exactly, so the oracle recomputes frame counts,
    fps, timestamps, and exact pixel values from the construction — a
    hash match proves the container walk AND the per-frame entropy
    decode. Alongside GIF (palette video) and Y4M (raw video), this is
    the DCT-compressed video modality."""
    from cassandra_pmem_spark.pipeline.multimodal import avi_frames_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "video", "video/x-msvideo", "doc_id")
    return avi_frames_stage(media)


_AVI_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS L,
         unnest(range(0, octet_length(encode(text)) % 5 + 2)) AS i
  FROM documents
)
SELECT doc_id AS item_id,
  CAST(L % 5 + 2 AS BIGINT) AS n_frames,
  CAST(i AS BIGINT) AS frame_idx,
  CAST(i * 1000 // (CASE L % 3 WHEN 0 THEN 5 WHEN 1 THEN 8 ELSE 10 END)
       AS BIGINT) AS t_ms,
  CAST(CASE L % 3 WHEN 0 THEN 5 WHEN 1 THEN 8 ELSE 10 END AS INT) AS fps_rate,
  CAST(16 AS INT) AS width,
  CAST(16 AS INT) AS height,
  CAST(((L * 5 + i * 7) % 128) * 2 AS BIGINT) AS min_px,
  CAST(((L * 5 + i * 7) % 128) * 2 AS BIGINT) AS max_px
FROM f
"""


def multimodal_audio_g711_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode, oracle-checked: deterministic G.711
    mu-law, G.711 A-law, and IMA ADPCM WAV files per document, decoded by
    the REAL decoders (codecs.decode_wav_any — manual RIFF walk, the
    canonical G.711 expansion tables, the IMA nibble loop). The oracle
    embeds the SAME public G.711 tables as SQL literals (the
    literal-plane trick sim_lsh_topk established) and recomputes the
    int16 sample sums — a hash match proves byte-for-byte agreement of
    both 256-entry companding tables, the RIFF/fmt parse, and the ADPCM
    block walk."""
    from cassandra_pmem_spark.pipeline.multimodal import g711_audio_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "audio", "audio/wav", "doc_id")
    return g711_audio_stage(media)


def _g711_oracle() -> str:
    from cassandra_pmem_spark.pipeline.codecs import _ALAW_TABLE, _ULAW_TABLE

    ulaw = ",".join(str(int(v)) for v in _ULAW_TABLE)
    alaw = ",".join(str(int(v)) for v in _ALAW_TABLE)
    return f"""
WITH g AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
), s AS (
  SELECT doc_id, L, unnest(range(0, L % 50 + 10)) AS i FROM g
)
SELECT doc_id AS item_id,
  CAST(L % 50 + 10 AS BIGINT) AS n_samples,
  CAST(SUM(list_extract([{ulaw}], CAST((L + i * 17) % 256 AS INT) + 1))
       AS BIGINT) AS sum_ulaw,
  CAST(SUM(list_extract([{alaw}], CAST((L + i * 17) % 256 AS INT) + 1))
       AS BIGINT) AS sum_alaw,
  CAST(9 * (((L * 31) % 4096) - 2048 + ((L * 31 + 997) % 4096) - 2048)
       AS BIGINT) AS sum_adpcm
FROM s GROUP BY doc_id, L
"""


def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training (pipeline/packing.py pack_sequences):
    shard by id, concatenate in id order, chunk the token stream into
    512-token bins — pure window arithmetic (exclusive running sum +
    integer division), no UDF, one shuffle. The oracle is the same window
    SQL in DuckDB; a hash match proves offsets, bin assignment, and
    boundary-straddle flags agree document-by-document."""
    from cassandra_pmem_spark.pipeline.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    return pack_sequences(docs, capacity=512, n_shards=4)


_PACK_ORACLE = """
WITH t AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  -- window SUM(BIGINT) promotes to HUGEINT (pandas float64): outer CAST
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, shard, n_tokens, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS bin_id,
  (start_offset // 512) <>
    ((start_offset + greatest(n_tokens - 1, 0)) // 512) AS is_split
FROM s
"""


def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (pipeline/packing.py
    stratified_sample): keep a document iff pmod(murmur3_token(doc_id),
    10000) clears its language's rate threshold — English downsampled to
    35%, Spanish 60%, German 80%, everything else kept. Hash-thresholding
    (not rand()) makes the sample bit-reproducible at any parallelism;
    the oracle re-derives the SAME Murmur3 token through the nested-
    subquery SQL kernel, so a hash match proves both the partitioner hash
    and the per-stratum thresholds."""
    from cassandra_pmem_spark.pipeline.packing import stratified_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return stratified_sample(
        docs, rates={"en": 0.35, "es": 0.60, "de": 0.80}, default_rate=1.0
    )


def _stratified_oracle() -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("documents", "doc_id", ["doc_id", "lang"])
    return f"""
SELECT doc_id, lang,
  CAST(((token % 10000) + 10000) % 10000 AS BIGINT) AS sample_bucket,
  CAST(CASE lang WHEN 'en' THEN 3500 WHEN 'es' THEN 6000
                 WHEN 'de' THEN 8000 ELSE 10000 END AS BIGINT) AS keep_below
FROM {sub}
WHERE ((token % 10000) + 10000) % 10000 <
      CASE lang WHEN 'en' THEN 3500 WHEN 'es' THEN 6000
                WHEN 'de' THEN 8000 ELSE 10000 END
"""


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level (span) dedup — pipeline/dedup.substring_dedup, the
    ExactSubstr policy of Lee et al. ACL'22 at token granularity: every
    8-token window occurring elsewhere in the corpus is removed from all
    but its first (doc id, position) occurrence. The corpus plants
    SPLICED documents (first 12 words of a base doc + a unique tail), so
    doc-level dedup sees nothing while span-level removal must strip the
    duplicated prefix and keep the tail. The oracle recomputes windows,
    first-occurrence ownership, token coverage, and reassembly in SQL."""
    from cassandra_pmem_spark.pipeline.dedup import substring_dedup

    base = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    spliced = base.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 12), " "),
            F.lit(" spliced tail marker "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return substring_dedup(base.union(spliced), k=8)


_SUBSTRING_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 500000,
         array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ')
           || ' spliced tail marker ' || doc_id::VARCHAR
  FROM documents WHERE doc_id < 8
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM corpus
), wins AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(list_slice(w, u.i, u.i + 7), ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(n - 7, 0) + 1)) AS u(i)
), ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM wins
), covered AS (
  SELECT DISTINCT doc_id, pos + o.j AS tidx
  FROM ranked, UNNEST(range(0, 8)) AS o(j)
  WHERE rn > 1
), tokens AS (
  SELECT doc_id, n, u.i AS tidx, w[u.i] AS word
  FROM toks, UNNEST(range(1, n + 1)) AS u(i)
), kept AS (
  SELECT t.doc_id, t.n, t.tidx, t.word
  FROM tokens t ANTI JOIN covered c USING (doc_id, tidx)
), survivors AS (
  SELECT doc_id,
         string_agg(word, ' ' ORDER BY tidx) AS clean,
         count(*) AS kept_n
  FROM kept
  GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(s.clean, '') AS clean_text,
       CAST(t.n AS BIGINT) AS n_tokens,
       CAST(t.n - COALESCE(s.kept_n, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN survivors s USING (doc_id)
"""


def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over a REAL lossless codec path: every doc
    gets a deterministic 9×8 grayscale image (one shared base per group
    of 8 ids, one pixel perturbed per member), encoded as PNG
    (pipeline/codecs.py), decoded back through the real PNG decoder,
    dHash-signed on the row gradient (multimodal.image_dhash_stage), and
    near-dup pairs come from the banded hamming join
    (dedup.hamming_pairs — 4×16-bit chunks, pigeonhole-complete for
    hamming ≤ 3). PNG is lossless, so the oracle recomputes the dHash
    bits straight from the construction arithmetic and replays the
    chunk join in SQL — a hash match proves codec round-trip, signature,
    banding, and verification together."""
    from cassandra_pmem_spark.pipeline.dedup import hamming_pairs
    from cassandra_pmem_spark.pipeline.multimodal import image_dhash_stage

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from cassandra_pmem_spark.pipeline.codecs import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d // 8
                xs = np.arange(9)
                ys = np.arange(8)
                base = g * 31 + xs[None, :] * 7 + ys[:, None] * 13
                img = ((base * base) % 251).astype(np.uint8)
                img[0, 0] = ((g * 31) ** 2 + (d % 3) * 2) % 251
                ids.append(d)
                blobs.append(encode_png(img))
            yield pd.DataFrame({"item_id": ids, "data": blobs})

    media = docs.mapInPandas(synth, "item_id long, data binary")
    hashes = image_dhash_stage(media)
    pairs = hamming_pairs(hashes, id_col="item_id", hash_col="dhash", max_hamming=2)
    return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


def _image_dedup_oracle() -> str:
    g = "(doc_id // 8)"

    def pix(x: int, y: int) -> str:
        if x == 0 and y == 0:
            return f"((({g} * 31) * ({g} * 31) + (doc_id % 3) * 2) % 251)"
        b = f"({g} * 31 + {x * 7 + y * 13})"
        return f"(({b} * {b}) % 251)"

    terms = []
    for y in range(8):
        for x in range(8):
            i = y * 8 + x
            terms.append(
                f"(CASE WHEN {pix(x, y)} > {pix(x + 1, y)} "
                f"THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
            )
    dh_u = " + ".join(terms)
    return f"""
WITH hashes AS (
  SELECT doc_id AS id, ({dh_u}) AS dhu FROM documents WHERE doc_id < 200
), signed AS (
  SELECT id, dhu,
         (CASE WHEN dhu >= {1 << 63}::HUGEINT
               THEN (dhu - {1 << 64}::HUGEINT)::BIGINT
               ELSE dhu::BIGINT END) AS dh
  FROM hashes
), chunks AS (
  SELECT id, dh, v.i, (dhu // v.d) % 65536 AS ch
  FROM signed, (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
                       (2, 4294967296::HUGEINT),
                       (3, 281474976710656::HUGEINT)) v(i, d)
), cand AS (
  SELECT DISTINCT l.id AS a, r.id AS b,
         CAST(bit_count(xor(l.dh, r.dh)) AS INTEGER) AS hamming
  FROM chunks l JOIN chunks r ON l.i = r.i AND l.ch = r.ch AND l.id < r.id
)
SELECT a, b, hamming FROM cand WHERE hamming <= 2
"""


def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup detection over the REAL lossless audio path:
    every doc gets a deterministic piecewise-constant mono signal (one
    shared base per group of 8 ids, block 0 perturbed per member),
    encoded as FLAC (pipeline/flac.py), decoded back bit-exactly,
    fingerprinted on the block-energy gradient
    (multimodal.audio_fingerprint_stage), and paired by the same banded
    hamming join as image dHash (dedup.hamming_pairs). FLAC is lossless
    and the blocks are constant, so the oracle recomputes every block
    value — and therefore the signature bits and the chunk join — in
    closed-form SQL."""
    from cassandra_pmem_spark.pipeline.dedup import hamming_pairs
    from cassandra_pmem_spark.pipeline.multimodal import audio_fingerprint_stage

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from cassandra_pmem_spark.pipeline.flac import encode_flac

        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d // 8
                b = np.arange(65)
                base = g * 53 + b * 17
                vals = (base * base) % 1201 - 600
                vals[0] = (g * 53) ** 2 % 1201 - 600 + (d % 3) * 2
                sig = np.repeat(vals, 64).astype(np.int16)
                ids.append(d)
                blobs.append(encode_flac(sig, rate=8000, block_size=1024))
            yield pd.DataFrame({"item_id": ids, "data": blobs})

    media = docs.mapInPandas(synth, "item_id long, data binary")
    fp = audio_fingerprint_stage(media)
    pairs = hamming_pairs(fp, id_col="item_id", hash_col="afp", max_hamming=2)
    return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


def _audio_dedup_oracle() -> str:
    g = "(doc_id // 8)"

    def val(b: int) -> str:
        if b == 0:
            return (
                f"((({g} * 53) * ({g} * 53)) % 1201 - 600 + (doc_id % 3) * 2)"
            )
        e = f"({g} * 53 + {b * 17})"
        return f"(({e} * {e}) % 1201 - 600)"

    terms = []
    for i in range(64):
        terms.append(
            f"(CASE WHEN {val(i)} > {val(i + 1)} "
            f"THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
        )
    fp_u = " + ".join(terms)
    return f"""
WITH hashes AS (
  SELECT doc_id AS id, ({fp_u}) AS fpu FROM documents WHERE doc_id < 200
), signed AS (
  SELECT id, fpu,
         (CASE WHEN fpu >= {1 << 63}::HUGEINT
               THEN (fpu - {1 << 64}::HUGEINT)::BIGINT
               ELSE fpu::BIGINT END) AS fp
  FROM hashes
), chunks AS (
  SELECT id, fp, v.i, (fpu // v.d) % 65536 AS ch
  FROM signed, (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
                       (2, 4294967296::HUGEINT),
                       (3, 281474976710656::HUGEINT)) v(i, d)
), cand AS (
  SELECT DISTINCT l.id AS a, r.id AS b,
         CAST(bit_count(xor(l.fp, r.fp)) AS INTEGER) AS hamming
  FROM chunks l JOIN chunks r ON l.i = r.i AND l.ch = r.ch AND l.id < r.id
)
SELECT a, b, hamming FROM cand WHERE hamming <= 2
"""


def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal video near-dup detection over the REAL animated-GIF
    path: every doc gets a deterministic 5-frame 9×8 animation (one
    shared base per group of 8 ids, one pixel of one frame perturbed per
    member), encoded as GIF89a and decoded through the real LZW decoder,
    fingerprinted by per-bit MAJORITY over the frames' dHashes
    (multimodal.video_fingerprint_stage) — frame-level edits are
    absorbed unless most frames change — and paired by the shared banded
    hamming join. GIF is lossless for palette frames, so the oracle
    recomputes every frame bit, the majority vote, and the chunk join in
    closed-form SQL."""
    from cassandra_pmem_spark.pipeline.dedup import hamming_pairs
    from cassandra_pmem_spark.pipeline.multimodal import video_fingerprint_stage

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from cassandra_pmem_spark.pipeline.gif import encode_gif, grayscale_palette

        pal = grayscale_palette()
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d // 8
                xs = np.arange(9)
                ys = np.arange(8)
                frames = []
                for f in range(5):
                    base = g * 31 + xs[None, :] * 7 + ys[:, None] * 13 + f * 29
                    img = ((base * base) % 251).astype(np.uint8)
                    if f == d % 5:
                        img[0, 0] = ((g * 31 + f * 29) ** 2 + (d % 3) * 2) % 251
                    frames.append(img)
                ids.append(d)
                blobs.append(encode_gif(frames, palette=pal))
            yield pd.DataFrame({"item_id": ids, "data": blobs})

    media = docs.mapInPandas(synth, "item_id long, data binary")
    fp = video_fingerprint_stage(media)
    pairs = hamming_pairs(fp, id_col="item_id", hash_col="vfp", max_hamming=2)
    return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


def _video_dedup_oracle() -> str:
    g = "(doc_id // 8)"

    def pix(x: int, y: int) -> str:
        b = f"({g} * 31 + {x * 7 + y * 13} + u.f * 29)"
        base = f"(({b} * {b}) % 251)"
        if x == 0 and y == 0:
            pert = (
                f"((({g} * 31 + u.f * 29) * ({g} * 31 + u.f * 29) "
                f"+ (doc_id % 3) * 2) % 251)"
            )
            return f"(CASE WHEN u.f = doc_id % 5 THEN {pert} ELSE {base} END)"
        return base

    bit_cols = []
    for y in range(8):
        for x in range(8):
            i = y * 8 + x
            bit_cols.append(
                f"(CASE WHEN {pix(x, y)} > {pix(x + 1, y)} THEN 1 ELSE 0 END) AS b{i}"
            )
    maj_terms = [
        f"(CASE WHEN 2 * sum(b{i}) > 5 THEN {1 << i}::HUGEINT ELSE 0::HUGEINT END)"
        for i in range(64)
    ]
    return f"""
WITH fb AS (
  SELECT doc_id, {', '.join(bit_cols)}
  FROM documents, UNNEST(range(0, 5)) u(f)
  WHERE doc_id < 200
), maj AS (
  SELECT doc_id AS id, ({' + '.join(maj_terms)}) AS fpu
  FROM fb GROUP BY doc_id
), signed AS (
  SELECT id, fpu,
         (CASE WHEN fpu >= {1 << 63}::HUGEINT
               THEN (fpu - {1 << 64}::HUGEINT)::BIGINT
               ELSE fpu::BIGINT END) AS fp
  FROM maj
), chunks AS (
  SELECT id, fp, v.i, (fpu // v.d) % 65536 AS ch
  FROM signed, (VALUES (0, 1::HUGEINT), (1, 65536::HUGEINT),
                       (2, 4294967296::HUGEINT),
                       (3, 281474976710656::HUGEINT)) v(i, d)
), cand AS (
  SELECT DISTINCT l.id AS a, r.id AS b,
         CAST(bit_count(xor(l.fp, r.fp)) AS INTEGER) AS hamming
  FROM chunks l JOIN chunks r ON l.i = r.i AND l.ch = r.ch AND l.id < r.id
)
SELECT a, b, hamming FROM cand WHERE hamming <= 2
"""


def pipeline_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture sampling
    (pipeline/packing.domain_mixture_sample — the multilingual
    pretraining mixing rule p_d ∝ n_d^α): α=0.5 flattens the language
    mixture toward the tail, per-language keep thresholds derive from
    the corpus counts, and the keep decision is the deterministic
    Murmur3-bucket rule. The oracle recomputes counts, exponentiated
    weights, thresholds, AND the bit-exact token buckets — a hash match
    proves the whole mixing rule end to end."""
    from cassandra_pmem_spark.pipeline.packing import domain_mixture_sample

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    return domain_mixture_sample(docs, alpha=0.5, target_total=300.0)


def _domain_mixture_oracle() -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("documents", "doc_id", ["doc_id", "lang"])
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
 w AS (SELECT lang, n, pow(n::DOUBLE, 0.5) AS wt FROM counts),
 tot AS (SELECT sum(wt) AS tw FROM w),
 rates AS (
   SELECT lang, n AS domain_total,
          least(10000::BIGINT,
                floor(300.0 * wt / tw / n * 10000 + 0.5)::BIGINT) AS keep_below
   FROM w, tot)
SELECT t.doc_id, t.lang,
       CAST(((token % 10000) + 10000) % 10000 AS BIGINT) AS sample_bucket,
       r.keep_below, r.domain_total
FROM {sub} t JOIN rates r USING (lang)
WHERE ((token % 10000) + 10000) % 10000 < r.keep_below
"""


def multimodal_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-audio pipeline, oracle-checked: deterministic stereo
    signals per document, encoded as mid-side FLAC (Levinson-Durbin LPC +
    fixed predictors, Rice residuals, CRC-8/16 — pipeline/flac.py, from
    the public xiph.org spec) and decoded back BIT-EXACTLY. Because FLAC
    is lossless, the oracle recomputes the decoded-sample sums directly
    from the construction arithmetic — a hash match proves prediction,
    Rice coding, mid-side decorrelation, and both CRCs reproduced every
    sample of every item."""
    from cassandra_pmem_spark.pipeline.multimodal import flac_audio_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "audio", "audio/flac", "doc_id")
    return flac_audio_stage(media)


_FLAC_ORACLE = """
WITH g AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
), s AS (
  SELECT doc_id, L, unnest(range(0, L % 400 + 50)) AS i FROM g
), v AS (
  SELECT doc_id, L, i,
         (L * 13 + i * i * 7) % 4001 - 2000 AS lft,
         (L * 29 + i * 11) % 4001 - 2000 AS rgt
  FROM s
)
SELECT doc_id AS item_id,
  CAST(L % 400 + 50 AS BIGINT) AS n_samples,
  CAST(SUM(lft) AS BIGINT) AS sum_left,
  CAST(SUM(rgt) AS BIGINT) AS sum_right,
  CAST(MIN(lft) AS BIGINT) AS min_left,
  CAST(MAX(rgt) AS BIGINT) AS max_right,
  TRUE AS compressed
FROM v GROUP BY doc_id, L
"""


def source_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL web-archive ingestion, oracle-checked: each document becomes a
    WARC file (sources/warc.py — ISO 28500 record layout with PER-RECORD
    gzip members, the Common Crawl distribution shape) holding L%4+1
    conversion records whose payloads are the document text plus a
    per-record suffix, and the REAL parser (multi-member gzip inflate +
    header parse + Content-Length slicing) reads every record back. The
    oracle recomputes URIs, lengths, and payload MD5s from the
    construction — a hash match proves the container round trip is
    byte-exact through gzip."""
    from cassandra_pmem_spark.sources.warc import warc_ingest_stage
    from cassandra_pmem_spark.pipeline.multimodal import attach_media

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "text", "application/warc", "doc_id")

    import pandas as pd
    from typing import Iterator
    from pyspark.sql import types as T

    fixture_schema = T.StructType(
        [T.StructField("item_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cassandra_pmem_spark.sources.warc import build_warc

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                k = len(raw) % 4 + 1
                recs = [
                    {
                        "type": "conversion",
                        "uri": f"http://crawl.test/{int(item_id)}/{j}",
                        "payload": raw + b"#" * j,
                        "id": f"{int(item_id)}-{j}",
                    }
                    for j in range(k)
                ]
                rows.append((int(item_id), build_warc(recs, per_record_gzip=True)))
            yield pd.DataFrame(rows, columns=["item_id", "data"])

    fixtures = media.select("item_id", "data").mapInPandas(build, fixture_schema)
    return warc_ingest_stage(fixtures)


_WARC_ORACLE = """
WITH g AS (
  SELECT doc_id, text, octet_length(encode(text)) AS L FROM documents
), s AS (
  SELECT doc_id, text, L, unnest(range(0, L % 4 + 1)) AS j FROM g
)
SELECT doc_id AS item_id,
  CAST(j AS BIGINT) AS rec_idx,
  'conversion' AS warc_type,
  'http://crawl.test/' || doc_id || '/' || j AS target_uri,
  CAST(L + j AS BIGINT) AS content_length,
  md5(text || repeat('#', CAST(j AS INT))) AS payload_md5
FROM s
"""


def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → plain-text extraction (pipeline/text.html_to_text — the
    WET-conversion cleaning step): each document is wrapped in a
    deterministic HTML page with script/style blocks, entities, and
    markup, and the pure-expression extractor strips it back out. The
    oracle runs the SAME regex chain in DuckDB (patterns are
    RE2-compatible by construction: non-greedy dotall, no
    backreferences) — a hash match proves both engines clean every page
    identically."""
    from cassandra_pmem_spark.pipeline.text import html_to_text

    docs = load_table(spark, "documents", sf_dir)
    html = F.concat(
        F.lit(
            '<html><head><title>Doc</title><script type="text/javascript">'
            "var x = 1 < 2; // &amp; tricky</script><style>p { color: red; }"
            "</style></head><body><h1>Heading &amp; more</h1><p>"
        ),
        F.col("text"),
        F.lit('</p><br/><div class="x">tail &lt;y&gt; &#39;q&#39;</div></body></html>'),
    )
    return docs.select("doc_id", html_to_text(html).alias("clean"))


_HTML_ORACLE = r"""
WITH h AS (
  SELECT doc_id,
    '<html><head><title>Doc</title><script type="text/javascript">var x = 1 < 2; // &amp; tricky</script><style>p { color: red; }</style></head><body><h1>Heading &amp; more</h1><p>'
    || text ||
    '</p><br/><div class="x">tail &lt;y&gt; &#39;q&#39;</div></body></html>' AS page
  FROM documents
), c AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(page, '(?is)<script\b.*?</script\s*>', ' ', 'g'),
        '(?is)<style\b.*?</style\s*>', ' ', 'g'),
      '(?s)<[^>]*>', ' ', 'g') AS t
  FROM h
)
SELECT doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(t,
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      '&nbsp;', ' '), '&amp;', '&'),
    '\s+', ' ', 'g')) AS clean
FROM c
"""


def multimodal_video_mp4_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF sample-table composition, oracle-checked
    (pipeline/codecs.py build_mp4_with_samples + mp4_sample_table):
    deterministic MP4 files with real stts/stsz/stsc/stco tables over an
    mdat, parsed back into a per-sample index that RETRIEVES each
    payload by absolute offset. The oracle recomputes dts (exclusive
    duration prefix-sum), sizes, relative offsets (exclusive size
    prefix-sum), and payload MD5s from the construction — a hash match
    proves the chunk-run walk located every sample byte-exactly."""
    from cassandra_pmem_spark.pipeline.multimodal import mp4_samples_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "video", "video/mp4", "doc_id")
    return mp4_samples_stage(media)


_MP4_SAMPLES_ORACLE = """
WITH g AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
), s AS (
  SELECT doc_id, L, unnest(range(0, L % 20 + 5)) AS i FROM g
), v AS (
  SELECT doc_id, L, i,
         (i % 3 + 1) * 100 AS dur,
         (L + 7 * i) % 50 + 1 AS sz,
         (L + i) % 94 + 33 AS code
  FROM s
)
SELECT doc_id AS item_id,
  CAST(i AS BIGINT) AS sample_idx,
  CAST(SUM(dur) OVER w - dur AS BIGINT) AS dts,
  CAST(dur AS INT) AS duration,
  CAST(sz AS INT) AS size,
  CAST(SUM(sz) OVER w - sz AS BIGINT) AS offset_rel,
  md5(repeat(chr(CAST(code AS INT)), CAST(sz AS INT))) AS payload_md5
FROM v
WINDOW w AS (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition statistics (pipeline/text.py
    repetition_signals): word count, distinct-word count, most-common
    word and bigram multiplicities per document — the duplicate-mass
    signals pretraining corpus filters threshold on. The oracle
    recomputes all four with DuckDB list/window SQL over the identical
    tokenization; integer outputs keep the comparison exact."""
    from cassandra_pmem_spark.pipeline.text import repetition_signals

    docs = load_table(spark, "documents", sf_dir)
    return repetition_signals(docs)


_REPETITION_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')
      AS words
  FROM documents
), e AS (
  SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w
), t AS (
  SELECT doc_id, len(words) AS n, words[i] AS word,
         CASE WHEN i < len(words) THEN words[i] || ' ' || words[i + 1] END AS bg
  FROM e
), wc AS (
  SELECT doc_id, n, word, COUNT(*) AS c FROM t GROUP BY doc_id, n, word
), bc AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM t WHERE bg IS NOT NULL GROUP BY doc_id, bg
)
SELECT wc.doc_id,
  CAST(MAX(wc.n) AS BIGINT) AS n_words,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
  CAST(MAX(wc.c) AS BIGINT) AS top_word_count,
  CAST(COALESCE((SELECT MAX(c) FROM bc WHERE bc.doc_id = wc.doc_id), 0) AS BIGINT)
    AS top_bigram_count
FROM wc GROUP BY wc.doc_id
"""


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog registers over orders.o_orderkey
    (pipeline/sketch.py): the sketch is a pure function of the bit-exact
    Murmur3 token, so the DuckDB oracle rebuilds the IDENTICAL 256
    registers through the nested-subquery SQL hash kernel — the property
    that lets sketches from different engines over different shards be
    merged and audited. (Spark's HLL++ and DuckDB's approx sketches
    can't do this — their hashes differ.)"""
    from cassandra_pmem_spark.pipeline.sketch import hll_registers

    orders = load_table(spark, "orders", sf_dir)
    return hll_registers(orders, "o_orderkey", p=8)


def _hll_oracle() -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("orders", "o_orderkey", ["o_orderkey"])
    u = f"(((token % {1 << 52}) + {1 << 52}) % {1 << 52})"
    return f"""
WITH t AS (
  SELECT {u} % 256 AS bucket, {u} // 256 AS w FROM {sub}
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(MAX(CASE WHEN w = 0 THEN 45
                ELSE 44 - CAST(floor(log2(w)) AS BIGINT) END) AS BIGINT)
    AS register
FROM t GROUP BY bucket
"""


def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle (pipeline/packing.
    epoch_shuffle): the corpus deals into 8 shards in a (doc, epoch)-
    keyed pseudo-random order through the bit-exact Murmur3 kernel —
    same shard and position at any parallelism, new permutation per
    epoch, no state. The oracle re-derives the key via the SQL hash
    kernel and replays the per-shard ranking."""
    from cassandra_pmem_spark.pipeline.packing import epoch_shuffle

    docs = load_table(spark, "documents", sf_dir)
    return epoch_shuffle(docs, epoch=2, n_shards=8)


def _epoch_shuffle_oracle(epoch: int = 2, n_shards: int = 8) -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery(
        "documents", f"doc_id * 1000003 + {epoch}", ["doc_id"]
    )
    shard = f"((token % {n_shards}) + {n_shards}) % {n_shards}"
    return f"""
SELECT doc_id, CAST({shard} AS INT) AS shard,
  CAST(row_number() OVER (PARTITION BY {shard} ORDER BY token, doc_id)
       AS BIGINT) AS pos
FROM {sub}
"""


def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (pipeline/packing.chunk_documents):
    64-token windows every 48 tokens (16-token overlap) — the standard
    prep for fixed-context training and embedding indexes; pure array
    expressions, no shuffle. The oracle recomputes every chunk with
    DuckDB range/slice arithmetic."""
    from cassandra_pmem_spark.pipeline.packing import chunk_documents

    docs = load_table(spark, "documents", sf_dir)
    return chunk_documents(docs, window=64, overlap=16)


_CHUNK_ORACLE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
  FROM documents
), c AS (
  SELECT doc_id, words,
         unnest(range(1, greatest(len(words), 1) + 1, 48)) AS s
  FROM w
)
SELECT doc_id,
  CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
  CAST(len(words[s:s+63]) AS BIGINT) AS n_tokens,
  array_to_string(words[s:s+63], ' ') AS chunk_text
FROM c
"""


def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (pipeline/similarity.semantic_dedup — SemDeDup):
    embeddings plus planted exact copies cluster under the anchored
    quantizer (vec_id<16 — the sim_ivf_rerank construction, so the
    oracle can replay assignment in SQL), and within-cluster pairs
    with cosine ≥ 0.99 lose their larger id. The copies land in their
    source's cluster at cosine 1.0 and must all drop; the oracle
    recomputes assignment, pairs, and the survivor set exactly."""
    import numpy as np

    from cassandra_pmem_spark.pipeline.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir)
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.union(planted)
    anchors = np.array(
        [
            r[0]
            for r in emb.filter(F.col("vec_id") < 16)
            .orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>"))
            .collect()
        ]
    )
    return semantic_dedup(corpus, anchors, threshold=0.99).select("vec_id")


_SEMANTIC_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 20
), a AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 16
), cdist AS (
  SELECT c.vec_id, a.cid,
    list_dot_product(c.v, c.v) - 2 * list_dot_product(c.v, a.av)
      + list_dot_product(a.av, a.av) AS d
  FROM corpus c, a
), assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM cdist) WHERE rn = 1
), drops AS (
  SELECT DISTINCT r.vec_id AS drop_id
  FROM corpus l
  JOIN assign la ON la.vec_id = l.vec_id
  JOIN assign ra ON ra.list_id = la.list_id
  JOIN corpus r ON r.vec_id = ra.vec_id AND l.vec_id < r.vec_id
  WHERE list_dot_product(l.v, r.v)
    / (sqrt(list_dot_product(l.v, l.v)) * sqrt(list_dot_product(r.v, r.v)))
    >= 0.99
)
SELECT vec_id FROM corpus WHERE vec_id NOT IN (SELECT drop_id FROM drops)
"""


def graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact damped PageRank (pipeline/graph.pagerank_exact —
    the second iterative-join algorithm next to connected components):
    a deterministic 3-out-degree citation graph over documents, five
    iterations in integer micro-units with floor arithmetic, so the
    result is bit-identical at any parallelism and the oracle replays
    the SAME five iterations as unrolled SQL CTEs."""
    from cassandra_pmem_spark.pipeline.graph import pagerank_exact

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    n = docs.count()
    d = F.col("doc_id")
    edges = (
        docs.select(d.alias("src"), ((d * 7 + 1) % n).alias("dst"))
        .union(docs.select(d.alias("src"), ((d * 13 + 2) % n).alias("dst")))
        .union(docs.select(d.alias("src"), ((d * 31 + 5) % n).alias("dst")))
    )
    return pagerank_exact(docs, edges, iters=5)


def _pagerank_oracle(iters: int = 5, scale_total: int = 10**12) -> str:
    nsub = "(SELECT c FROM n)"
    r0 = f"({scale_total} // {nsub})"
    teleport = f"((15 * {r0}) // 100)"
    ctes = [
        "n AS (SELECT count(*) AS c FROM documents)",
        f"""edges AS (
  SELECT doc_id AS src, (doc_id * 7 + 1) % {nsub} AS dst FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 13 + 2) % {nsub} FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 31 + 5) % {nsub} FROM documents
)""",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)",
        "e AS (SELECT edges.src, edges.dst, deg.deg FROM edges JOIN deg USING (src))",
        f"pr0 AS (SELECT doc_id AS id, CAST({r0} AS BIGINT) AS r FROM documents)",
    ]
    for k in range(iters):
        ctes.append(
            f"""pr{k + 1} AS (
  SELECT p.id, CAST({teleport} + COALESCE(i.inflow, 0) AS BIGINT) AS r
  FROM pr{k} p LEFT JOIN (
    SELECT e.dst AS id, SUM((85 * p2.r) // (100 * e.deg)) AS inflow
    FROM e JOIN pr{k} p2 ON e.src = p2.id GROUP BY 1
  ) i ON p.id = i.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, r AS rank FROM pr{iters}"
    )


def streaming_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming sketch maintenance with an exact oracle: the
    events table is staged TWICE (an at-least-once redelivery), each
    file arrives as its own micro-batch (maxFilesPerTrigger=1), and
    foreachBatch merges per-batch HLL registers into an accumulator by
    register-wise max. Because the deterministic HLL is a pure function
    of the key SET, redelivered data changes nothing — the merged
    registers must equal one batch pass over the table, which is
    exactly what the oracle computes via the SQL hash kernel. This is
    the sketch-idempotence property that makes streaming cardinality
    exact under retries, with NO dedup state at all."""
    import os
    import shutil
    import tempfile
    import uuid

    from cassandra_pmem_spark.catalog import TABLES
    from cassandra_pmem_spark.pipeline.sketch import hll_registers

    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    d = f"/root/repo/.scratch/stream_sketch_{sf_tag}"
    os.makedirs(d, exist_ok=True)
    src = f"{sf_dir}/events.parquet"
    for copy in ("a", "b"):  # the same data twice = redelivery
        dst = os.path.join(d, f"events_{copy}.parquet")
        s = os.stat(src)
        if (
            not os.path.exists(dst)
            or os.path.getsize(dst) != s.st_size
            or os.path.getmtime(dst) < s.st_mtime
        ):
            shutil.copy2(src, dst)

    stream = (
        spark.readStream.schema(TABLES["events"].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    acc: dict[int, int] = {}
    batches = []

    def merge(batch_df, batch_id):
        rows = hll_registers(batch_df, "user_id", p=8).collect()  # ≤256
        batches.append(len(rows))
        for r in rows:
            acc[r["bucket"]] = max(acc.get(r["bucket"], 0), r["register"])

    ck = tempfile.mkdtemp(prefix="cps_sketch_ck_")
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    assert len(batches) >= 2, "redelivery staging must yield ≥2 micro-batches"
    return spark.createDataFrame(
        sorted(acc.items()), "bucket BIGINT, register BIGINT"
    )


def _streaming_hll_oracle() -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("events", "user_id", ["user_id"])
    u = f"(((token % {1 << 52}) + {1 << 52}) % {1 << 52})"
    return f"""
WITH t AS (
  SELECT {u} % 256 AS bucket, {u} // 256 AS w FROM {sub}
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(MAX(CASE WHEN w = 0 THEN 45
                ELSE 44 - CAST(floor(log2(w)) AS BIGINT) END) AS BIGINT)
    AS register
FROM t GROUP BY bucket
"""


def sketch_countmin_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Count-Min sketch over orders.o_custkey
    (pipeline/sketch.countmin_build — the frequency/heavy-hitter
    sibling of the HLL and Bloom sketches, the structure join-skew
    detection consults): cells are a pure function of the key multiset
    through the bit-exact Murmur3 token + Kirsch-Mitzenmacher double
    hashing, so the DuckDB oracle rebuilds the IDENTICAL (row, pos,
    cnt) cells — cross-engine mergeable by cell-wise add."""
    from cassandra_pmem_spark.pipeline.sketch import countmin_build

    orders = load_table(spark, "orders", sf_dir)
    return countmin_build(orders, "o_custkey", width=512, depth=4)


def _countmin_oracle(width: int = 512, depth: int = 4) -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("orders", "o_custkey", ["o_custkey"])
    u = f"(((token % {1 << 52}) + {1 << 52}) % {1 << 52})"
    return f"""
WITH h AS (
  SELECT {u} % {width} AS h1, ({u} // {width}) % {width} AS h2 FROM {sub}
), cells AS (
  SELECT CAST(r.range AS INT) AS row,
         CAST((h1 + r.range * h2) % {width} AS BIGINT) AS pos
  FROM h, range(0, {depth}) r
)
SELECT row, pos, count(*) AS cnt FROM cells GROUP BY 1, 2
"""


def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rule set (pipeline/text.c4_filters): line rules
    (terminal punctuation, ≥3 words, no 'javascript') + document rules
    (no lorem ipsum, no braces, ≥2 surviving sentences), exercised by a
    deterministic five-line page per doc that trips each rule on a
    different doc_id residue. The oracle applies the identical
    RE2-compatible conditions with DuckDB list_filter."""
    from cassandra_pmem_spark.pipeline.text import c4_filters

    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    built = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(
                F.col("text"),
                F.when(d % 13 == 0, F.lit(" {x}.")).otherwise(F.lit(".")),
            ),
            F.lit("short one."),
            F.lit("please enable javascript to continue."),
            F.lit("this line has no terminal punctuation"),
            F.when(d % 11 == 0, F.lit("lorem ipsum dolor sit amet."))
            .otherwise(F.lit("a fine closing sentence appears here.")),
        ).alias("text"),
    )
    return c4_filters(built)


_C4_LINE_COND = (
    "regexp_matches(l, '[.!?\"]$') "
    "AND len(string_split_regex(trim(l), '\\s+')) >= 3 "
    "AND NOT contains(lower(l), 'javascript')"
)

_C4_ORACLE = f"""
WITH built AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 13 = 0 THEN ' {{x}}.' ELSE '.' END || chr(10)
    || 'short one.' || chr(10)
    || 'please enable javascript to continue.' || chr(10)
    || 'this line has no terminal punctuation' || chr(10)
    || CASE WHEN doc_id % 11 = 0 THEN 'lorem ipsum dolor sit amet.'
            ELSE 'a fine closing sentence appears here.' END AS text
  FROM documents
), f AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), l -> {_C4_LINE_COND}) AS kl
  FROM built
), c AS (
  SELECT doc_id, text, kl, array_to_string(kl, chr(10)) AS clean FROM f
)
SELECT doc_id, clean AS clean_text,
  CAST(len(kl) AS BIGINT) AS n_kept_lines,
  CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT) AS n_sentences,
  (NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{{') AND NOT contains(text, '}}')
   AND len(regexp_extract_all(clean, '[.!?]')) >= 2) AS kept
FROM c
"""


def dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line deduplication (pipeline/dedup.line_dedup — the
    CCNet boilerplate pre-pass): each doc becomes four lines — a header
    every doc shares, the body, a footer shared by doc_id%7, a banner
    shared per source — and lines appearing in ≥2 documents are
    dropped corpus-wide while survivors reassemble in order. The
    oracle recomputes the same drop set grouping by the normalized
    line itself (the hash-vs-string grouping equivalence the exact-
    dedup oracle already relies on)."""
    from cassandra_pmem_spark.pipeline.dedup import line_dedup

    docs = load_table(spark, "documents", sf_dir)
    built = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("COMMON HEADER"),
            F.col("text"),
            F.concat(F.lit("FOOTER "), (F.col("doc_id") % 7).cast("string")),
            F.concat(F.lit("BANNER "), F.col("source")),
        ).alias("text"),
    )
    return line_dedup(built)


_LINE_DEDUP_ORACLE = """
WITH built AS (
  SELECT doc_id,
    'COMMON HEADER' || chr(10) || text || chr(10)
    || 'FOOTER ' || CAST(doc_id % 7 AS VARCHAR) || chr(10)
    || 'BANNER ' || source AS text
  FROM documents
), w AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM built
), l AS (
  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS idx, ls FROM w
), lines AS (
  SELECT doc_id, CAST(idx AS INT) AS idx, ls[idx] AS line,
         trim(lower(ls[idx])) AS norm
  FROM l
), counts AS (
  SELECT norm, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY 1
), tagged AS (
  SELECT lines.*, counts.n_docs < 2 AS keep FROM lines JOIN counts USING (norm)
)
SELECT doc_id,
  COALESCE(string_agg(line, chr(10) ORDER BY idx) FILTER (WHERE keep), '')
    AS clean_text,
  count(*) AS n_lines,
  CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM tagged GROUP BY doc_id
"""


def sketch_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic equi-width histogram over events.value
    (pipeline/sketch.histogram_bins — the quantile sibling of the
    HLL/Bloom/Count-Min sketches; engine-native approx-percentile
    summaries can't be compared or merged cross-engine, this one can):
    both engines compute bin = floor((x−lo)/(hi−lo)·64) with identical
    IEEE double ops, so the DuckDB oracle rebuilds identical cells."""
    from cassandra_pmem_spark.pipeline.sketch import histogram_bins

    events = load_table(spark, "events", sf_dir)
    return histogram_bins(events, "value", bins=64)


_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
), cells AS (
  SELECT least(greatest(CAST(floor((value - lo) / (hi - lo) * 64) AS BIGINT),
                        0), 63) AS bin, lo, hi
  FROM events, b
)
SELECT bin, count(*) AS cnt, lo, hi FROM cells GROUP BY 1, 3, 4
"""


def multimodal_video_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL uncompressed-video frame walk, oracle-checked
    (pipeline/codecs.py encode_y4m/decode_y4m — YUV4MPEG2): timed frames
    with timestamps derived from the container's fps metadata. The
    oracle recomputes frame counts, fps, timestamps, and pixel values
    from the construction arithmetic."""
    from cassandra_pmem_spark.pipeline.multimodal import y4m_frames_stage

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "video", "video/x-yuv4mpeg", "doc_id")
    return y4m_frames_stage(media)


_Y4M_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS L,
         unnest(range(0, octet_length(encode(text)) % 6 + 2)) AS i
  FROM documents
)
SELECT doc_id AS item_id,
  CAST(L % 6 + 2 AS BIGINT) AS n_frames,
  CAST(i AS BIGINT) AS frame_idx,
  CAST(L % 30 + 1 AS INT) AS fps_num,
  CAST((i * 1000) // (L % 30 + 1) AS BIGINT) AS frame_ts_ms,
  CAST((L * 5 + i * 11) % 256 AS BIGINT) AS min_px,
  CAST((L * 5 + i * 11) % 256 AS BIGINT) AS max_px
FROM f
"""


def sketch_bloom_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom filter words over customer.c_custkey
    (pipeline/sketch.py bloom_build) — the runtime-filter analog of the
    reference's per-SSTable Bloom filters (utils/BloomFilter.java). The
    oracle rebuilds the IDENTICAL packed words through the SQL Murmur3
    kernel + Kirsch-Mitzenmacher double hashing, proving the filter a
    second engine builds would prune exactly the same keys."""
    from cassandra_pmem_spark.pipeline.sketch import bloom_build

    customer = load_table(spark, "customer", sf_dir)
    return bloom_build(customer, "c_custkey", m_bits=16384, k=4)


def _bloom_oracle(m_bits: int = 16384, k: int = 4) -> str:
    from cassandra_pmem_spark.functions.murmur3 import murmur3_token_subquery

    sub = murmur3_token_subquery("customer", "c_custkey", ["c_custkey"])
    u = f"(((token % {1 << 52}) + {1 << 52}) % {1 << 52})"
    ks = ", ".join(str(i) for i in range(k))
    return f"""
WITH h AS (
  SELECT {u} % {m_bits} AS h1, ({u} // {m_bits}) % {m_bits} AS h2 FROM {sub}
), p AS (
  SELECT (h1 + i * h2) % {m_bits} AS pos FROM h, unnest([{ks}]) AS t(i)
)
SELECT CAST(pos // 32 AS BIGINT) AS word,
       CAST(bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS BIGINT) AS bits
FROM p GROUP BY pos // 32
"""


def sketch_runtime_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact⋈dim join (pipeline/sketch.runtime_filtered_join):
    the filter built over BUILDING customers' keys is inlined as plan
    literals and drops non-joining orders BEFORE the shuffle — the manual
    dynamic-runtime-filter, and the Spark-era use of the reference's
    per-SSTable Bloom filters. The oracle is the PLAIN join (the Bloom
    pre-filter is semantically transparent; false positives die in the
    join) — a hash match proves the pruning dropped nothing it
    shouldn't."""
    from cassandra_pmem_spark.pipeline.sketch import runtime_filtered_join

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    j = runtime_filtered_join(orders, cust, "o_custkey", "c_custkey")
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )


_RTF_JOIN_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1
"""


_BM25_TERMS = ["join", "hash", "vector", "data"]


def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance per (document, query term) — pipeline/text.py
    bm25_term_scores. One single-row corpus-stats aggregate broadcasts
    back over the doc frame; per-row scores are fixed-order float
    expressions the DuckDB oracle computes from the same formula text,
    so the comparison is exact at 6 dp."""
    from cassandra_pmem_spark.pipeline.text import bm25_term_scores

    docs = load_table(spark, "documents", sf_dir)
    return bm25_term_scores(docs, _BM25_TERMS)


def _bm25_oracle(k1: float = 1.2, b: float = 0.75) -> str:
    tf_cols = ",\n    ".join(
        f"len(list_filter(words, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n    ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    arms = "\nUNION ALL\n".join(
        f"""SELECT doc_id, '{t}' AS term, CAST(tf{i} AS BIGINT) AS tf,
  CAST(df{i} AS BIGINT) AS df, CAST(dl AS BIGINT) AS dl,
  round(ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)
        * (tf{i} * {k1 + 1})
        / (tf{i} + {k1} * ({1 - b} + {b} * dl
             / (CAST(sum_dl AS DOUBLE) / n_docs))), 6) AS bm25
FROM x"""
        for i, t in enumerate(_BM25_TERMS)
    )
    return f"""
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')
      AS words
  FROM documents
), d AS (
  SELECT doc_id, len(words) AS dl,
    {tf_cols}
  FROM w
), g AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
    {df_cols}
  FROM d
), x AS (
  SELECT d.*, g.* FROM d, g
)
{arms}
"""


_MP3_META_ORACLE = """
SELECT doc_id AS item_id,
  CAST(octet_length(encode(text)) % 7 + 2 AS BIGINT) AS frames,
  CAST(44100 AS INT) AS sample_rate,
  CAST(round((octet_length(encode(text)) % 7 + 2) * 1152.0 * 1000.0 / 44100.0)
       AS BIGINT) AS duration_ms,
  CAST(128 AS INT) AS bitrate_kbps
FROM documents
"""


def _multimodal_features_jpeg_oracle(dim: int = 8, width: int = 16) -> str:
    """Mirror of the JPEG encode→decode→histogram pipeline: decoded pixels
    are the EVENIZED utf8 bytes (v & ~1) zero-padded to a `width`-multiple,
    each repeated 64× — the repetition cancels in the proportions, so the
    oracle aggregates the evenized byte multiset directly."""
    span = 256 // dim
    feat_cols = ", ".join(
        f"CAST(CAST(COALESCE(SUM(a.c / t.n) FILTER (WHERE a.v // {span} = {i}), 0)"
        f" AS FLOAT) AS DOUBLE) AS f{i}"
        for i in range(dim)
    )
    return f"""
WITH b AS (
  SELECT doc_id, encode(text) AS blob, octet_length(encode(text)) AS len0
  FROM documents
), dims AS (
  SELECT doc_id, blob, len0,
         ((greatest(len0, 1) + {width - 1}) // {width}) * {width} AS padded
  FROM b
), pos AS (
  SELECT doc_id, hex(blob) AS h, unnest(range(len0)) AS i FROM dims
), raw_bytes AS (
  SELECT doc_id,
         (('0x' || substr(h, CAST(2 * i + 1 AS INT), 2))::INT // 2) * 2 AS v
  FROM pos
  UNION ALL
  SELECT doc_id, 0 AS v
  FROM (SELECT doc_id, unnest(range(padded - len0)) FROM dims)
), agg AS (
  SELECT doc_id, v, CAST(count(*) AS DOUBLE) AS c
  FROM raw_bytes GROUP BY doc_id, v
), tot AS (
  SELECT doc_id, SUM(c) AS n FROM agg GROUP BY doc_id
)
SELECT a.doc_id AS item_id,
  round(-SUM((a.c / t.n) * log2(a.c / t.n)), 6) AS byte_entropy,
  {feat_cols}
FROM agg a JOIN tot t USING (doc_id)
GROUP BY a.doc_id
"""


def _minhash_oracle() -> str:
    sig_exprs = ", ".join(
        f"list_min(list_transform(shingles, s -> md5(concat(s, '#', {i}))))"
        for i in range(_MINHASH_K)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM documents WHERE doc_id < 40
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS words FROM docs
), sh AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                   i -> array_to_string(words[i:i+2], ' ')) AS shingles
  FROM w
), sig AS (
  SELECT doc_id, [{sig_exprs}] AS sig FROM sh
)
SELECT a.doc_id AS a, b.doc_id AS b,
  CAST(list_sum(list_transform(range(1, {_MINHASH_K + 1}),
       i -> CASE WHEN a.sig[i] = b.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / {_MINHASH_K}.0
    AS jaccard_est
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
"""


def _lsh_pairs_oracle(num_hashes: int = 16, bands: int = 4) -> str:
    r = num_hashes // bands
    sig_exprs = ", ".join(
        f"list_min(list_transform(shingles, s -> md5(concat(s, '#', {i}))))"
        for i in range(num_hashes)
    )
    band_slice = ", ".join(f"sig[band * {r} + {i + 1}]" for i in range(r))
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 10
), docs AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM corpus
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS words FROM docs
), sh AS (
  SELECT doc_id,
    list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                   i -> array_to_string(words[i:i+2], ' ')) AS shingles
  FROM w
), sig AS (
  SELECT doc_id, [{sig_exprs}] AS sig FROM sh
), banded AS (
  SELECT doc_id, band, md5(concat_ws('|', {band_slice})) AS bh
  FROM sig, range({bands}) t(band)
)
SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS band_hits
FROM banded l JOIN banded r
  ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
GROUP BY 1, 2
"""


_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
), hashed AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM toks
), lanes AS (
  SELECT doc_id, i,
    SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS lane
  FROM hashed, range(32) t(i) GROUP BY doc_id, i
)
SELECT doc_id,
  CAST(SUM(CASE WHEN lane > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
FROM lanes GROUP BY doc_id
"""

_NGRAM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM documents WHERE doc_id < 30
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS words FROM docs
), sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                  i -> array_to_string(words[i:i+2], ' '))) AS shingles
  FROM w
), ds AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT sa.doc_id AS a, sb.doc_id AS b,
  CAST(coalesce(i.i, 0) AS DOUBLE) / (sa.n + sb.n - coalesce(i.i, 0)) AS jaccard
FROM sizes sa JOIN sizes sb ON sa.doc_id < sb.doc_id
LEFT JOIN inter i ON i.a = sa.doc_id AND i.b = sb.doc_id
"""

_COSINE = (
    "list_dot_product({a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product({a}.embedding::DOUBLE[], {a}.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product({b}.embedding::DOUBLE[], {b}.embedding::DOUBLE[])))"
)

_TOPK_ORACLE = f"""
SELECT query_id, neighbor_id, rank, cosine_sim FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    {_COSINE.format(a='c', b='q')} AS cosine_sim,
    CAST(row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY {_COSINE.format(a='c', b='q')} DESC, c.vec_id) AS INT) AS rank
  FROM embeddings c, embeddings q WHERE q.vec_id < 5
) WHERE rank <= 10
"""

_NEARDUP_ORACLE = f"""
SELECT l.vec_id AS a, r.vec_id AS b, {_COSINE.format(a='l', b='r')} AS cosine_sim
FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
WHERE l.vec_id < 500 AND r.vec_id < 500
  AND {_COSINE.format(a='l', b='r')} >= 0.4
"""

_STOP_EN = "['the','and','of','to','a','in','is','that','it','for']"
_TOKS = "list_filter(string_split_regex(lower(trim(text)), '[^\\p{L}\\p{N}]+'), t -> t <> '')"


def _lang_sql() -> str:
    from cassandra_pmem_spark.pipeline.text import STOPWORDS

    scores = []
    for lang, words in STOPWORDS.items():
        arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
        scores.append(f"len(list_filter({_TOKS}, t -> list_contains({arr}, t))) AS s_{lang}")
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH scored AS (SELECT doc_id, lang, {", ".join(scores)} FROM documents)
SELECT doc_id, lang, {case} AS lang_pred FROM scored
"""


_QUALITY_ORACLE = """
WITH feat AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS q_chars,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS q_words,
    CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS q_mean_word_len,
    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) / length(text) AS q_punct_ratio,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text) AS q_digit_ratio,
    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         w -> list_contains(['the','and','of','to','a','in','is','that','it','for'], lower(w))))
         AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS q_stopword_ratio,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
         / len(string_split_regex(trim(text), '\\s+')) AS q_unique_ratio
  FROM documents
)
SELECT *, CAST((
    (CASE WHEN q_words >= 5 AND q_words <= 100000 THEN 1.0 ELSE 0.3 END)
  + least(q_stopword_ratio * 5, 1.0)
  + greatest(0.0, 1 - q_punct_ratio * 5)
  + greatest(0.0, 1 - q_digit_ratio * 3)
) / 4 AS DOUBLE) AS quality
FROM feat
"""

def _lsh_topk_oracle(k: int = 10, bits: int = 4, tables: int = 8, dim: int = 64) -> str:
    """DuckDB twin of lsh_topk: the SRP hyperplanes are deterministic seeded
    literals (similarity._hyperplanes, seed 42 + 1000*t), so the exact same
    plane matrix is inlined here. Bucket id per table = sum of sign bits of
    vec·plane; candidates = bucket match in ANY table; exact cosine re-rank
    with (cosine DESC, neighbor_id) tie-break. Sign bits only disagree
    between engines if a dot product sits within float-noise of 0 —
    probability ~1e-14 per (vector, plane)."""
    from cassandra_pmem_spark.pipeline.similarity import _hyperplanes

    def bucket_expr(col: str, t: int) -> str:
        planes = _hyperplanes(dim, bits, 42 + 1000 * t)
        terms = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({col}, {lit}) > 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        return " + ".join(terms)

    cb = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl, {bucket_expr('v', t)} AS bkt FROM c"
        for t in range(tables)
    )
    qb = "\n  UNION ALL\n".join(
        f"  SELECT query_id, {t} AS tbl, {bucket_expr('qv', t)} AS bkt FROM q"
        for t in range(tables)
    )
    return f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < 5
), cb AS (
{cb}
), qb AS (
{qb}
), cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id AS neighbor_id
  FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bkt = qb.bkt
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    list_dot_product(c.v, q.qv)
      / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)))
      AS cosine_sim
  FROM cand
  JOIN c ON c.vec_id = cand.neighbor_id
  JOIN q ON q.query_id = cand.query_id
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


_IVF_TOPK_ORACLE = """
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), a AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS av FROM embeddings
  WHERE vec_id % 37 = 3 ORDER BY vec_id LIMIT 16
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), cdist AS (
  SELECT c.vec_id, a.cid,
    list_dot_product(c.v, c.v) - 2 * list_dot_product(c.v, a.av)
      + list_dot_product(a.av, a.av) AS d
  FROM c, a
), assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM cdist) WHERE rn = 1
), qdist AS (
  SELECT q.query_id, a.cid,
    list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, a.av)
      + list_dot_product(a.av, a.av) AS d
  FROM q, a
), probes AS (
  SELECT query_id, cid AS list_id FROM (
    SELECT query_id, cid,
      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS rn
    FROM qdist) WHERE rn <= 6
), scored AS (
  SELECT p.query_id, s.vec_id AS neighbor_id,
    list_dot_product(c.v, q.qv)
      / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)))
      AS cosine_sim
  FROM probes p
  JOIN assign s ON s.list_id = p.list_id
  JOIN c ON c.vec_id = s.vec_id
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""


_IVF_RERANK_ORACLE = f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), a AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 16
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
), cdist AS (
  SELECT c.vec_id, a.cid,
    list_dot_product(c.v, c.v) - 2 * list_dot_product(c.v, a.av)
      + list_dot_product(a.av, a.av) AS d
  FROM c, a
), assign AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM cdist) WHERE rn = 1
), qdist AS (
  SELECT q.query_id, a.cid,
    list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, a.av)
      + list_dot_product(a.av, a.av) AS d
  FROM q, a
), probes AS (
  SELECT query_id, cid AS list_id FROM (
    SELECT query_id, cid,
      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS rn
    FROM qdist) WHERE rn <= 6
), scored AS (
  SELECT p.query_id, s.vec_id AS neighbor_id,
    list_dot_product(c.v, q.qv)
      / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv)))
      AS cosine_sim
  FROM probes p
  JOIN assign s ON s.list_id = p.list_id
  JOIN c ON c.vec_id = s.vec_id
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""


def _multimodal_features_oracle(dim: int = 8, width: int = 32) -> str:
    """Mirror of the PNG encode→decode→histogram pipeline: decoded pixels
    are the utf8 text bytes zero-padded to a `width`-multiple (empty text
    becomes one zero byte, then padded). Features go through a FLOAT cast
    exactly like the numpy float32 path."""
    span = 256 // dim
    feat_cols = ", ".join(
        f"CAST(CAST(COALESCE(SUM(a.c / t.n) FILTER (WHERE a.v // {span} = {i}), 0)"
        f" AS FLOAT) AS DOUBLE) AS f{i}"
        for i in range(dim)
    )
    return f"""
WITH b AS (
  SELECT doc_id, encode(text) AS blob, octet_length(encode(text)) AS len0
  FROM documents
), dims AS (
  SELECT doc_id, blob, len0,
         ((greatest(len0, 1) + {width - 1}) // {width}) * {width} AS padded
  FROM b
), pos AS (
  SELECT doc_id, hex(blob) AS h, unnest(range(len0)) AS i FROM dims
), raw_bytes AS (
  SELECT doc_id, ('0x' || substr(h, CAST(2 * i + 1 AS INT), 2))::INT AS v
  FROM pos
  UNION ALL
  SELECT doc_id, 0 AS v
  FROM (SELECT doc_id, unnest(range(padded - len0)) FROM dims)
), agg AS (
  SELECT doc_id, v, CAST(count(*) AS DOUBLE) AS c
  FROM raw_bytes GROUP BY doc_id, v
), tot AS (
  SELECT doc_id, SUM(c) AS n FROM agg GROUP BY doc_id
)
SELECT a.doc_id AS item_id,
  round(-SUM((a.c / t.n) * log2(a.c / t.n)), 6) AS byte_entropy,
  {feat_cols}
FROM agg a JOIN tot t USING (doc_id)
GROUP BY a.doc_id
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (pipeline/pii.py): each document gets a
    deterministic doc_id-derived contact block — an email always, an
    IPv4 on every 3rd doc, an SSN-shaped id on every 5th, a card-shaped
    number on every 7th, a phone on every 2nd — then the pure-expression
    detector chain counts hits per kind and rewrites them to typed
    tokens. The oracle builds the IDENTICAL text and runs the IDENTICAL
    RE2-compatible patterns in DuckDB; the md5 of the redacted text
    proves both engines scrub every byte the same way."""
    from cassandra_pmem_spark.pipeline.pii import pii_counts, redact_pii

    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    payload = F.concat(
        F.col("text"),
        F.lit(" contact user"), s(d), F.lit("@example.com"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" from 10."), s(d % 256), F.lit("."),
                s((d * 7) % 256), F.lit("."), s((d * 13) % 256),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" ssn 123-45-"), F.lpad(s(d % 10000), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" card 4111 1111 1111 "), F.lpad(s(d % 10000), 4, "0")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit(" call (555) "), F.lpad(s(d % 1000), 3, "0"),
                F.lit("-"), F.lpad(s((d * 3) % 10000), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    out = pii_counts(
        docs.select("doc_id", payload.alias("text")), "text"
    )
    # DuckDB's len(regexp_extract_all()) is BIGINT; match the dtype kind
    return out.select(
        "doc_id",
        *[
            F.col(n).cast("long").alias(n)
            for n in ("n_email", "n_ssn", "n_card", "n_ipv4", "n_phone")
        ],
        F.md5(redact_pii("text")).alias("redacted_md5"),
    )


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure dedup clustering (pipeline/dedup.py
    near_dup_components): exact dedup → banded-LSH candidates →
    exact-Jaccard edges → iterative min-label propagation. The corpus
    plants two GENERATIONS of near-duplicates (base + ' alpha beta',
    base + ' gamma delta') so clusters form triangles/chains that only
    transitive closure groups correctly. The oracle recomputes the SAME
    edge set exhaustively and closes it with a recursive CTE — DuckDB's
    fixpoint engine checking Spark's distributed label-propagation
    loop round for round."""
    from cassandra_pmem_spark.pipeline.dedup import near_dup_components

    base = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    gen1 = base.filter(F.col("doc_id") < 12).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" alpha beta")).alias("text"),
    )
    gen2 = base.filter(F.col("doc_id") < 6).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" gamma delta")).alias("text"),
    )
    corpus = base.union(gen1).union(gen2)
    return near_dup_components(corpus, jaccard_threshold=0.7)


def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same transitive-closure clustering contract as
    dedup_connected_components, computed with the alternating
    large-star/small-star rounds (Kiveris et al., MRC'14 —
    pipeline/dedup.connected_components_star): O(log n) rounds
    regardless of graph diameter, vs rounds = diameter for label
    propagation. Same corpus, same edges, same oracle — the recursive
    CTE fixpoint must agree with the star contraction exactly."""
    from cassandra_pmem_spark.pipeline.dedup import near_dup_components

    base = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    gen1 = base.filter(F.col("doc_id") < 12).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" alpha beta")).alias("text"),
    )
    gen2 = base.filter(F.col("doc_id") < 6).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" gamma delta")).alias("text"),
    )
    corpus = base.union(gen1).union(gen2)
    return near_dup_components(corpus, jaccard_threshold=0.7, algorithm="star")


_CC_ORACLE = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT doc_id + 100000, text || ' alpha beta' FROM documents WHERE doc_id < 12
  UNION ALL
  SELECT doc_id + 200000, text || ' gamma delta' FROM documents WHERE doc_id < 6
), normed AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM corpus
), s1 AS (
  SELECT min(doc_id) AS doc_id, norm FROM normed GROUP BY norm
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS words FROM s1
), sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                  i -> array_to_string(words[i:i+2], ' '))) AS shingles
  FROM w
), ds AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
  SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b, a FROM pairs
), reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM s1
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(lbl) AS comp FROM reach GROUP BY id
"""


def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized ANN (pipeline/quantization.py): one global
    max-abs scale trains on the corpus, both sides quantize to
    [-127,127], and ranking is by EXACT int64 dot products — fully
    deterministic, so the oracle reproduces every score bit for bit
    with DuckDB list arithmetic (not a float-tolerance check). Queries
    are the first 8 corpus vectors; k=10."""
    from cassandra_pmem_spark.pipeline.quantization import sq8_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sq8_topk(emb, queries, k=10)


_SQ8_ORACLE = """
WITH s AS (
  SELECT max(list_max(list_transform(embedding, x -> abs(x)))) AS scale
  FROM embeddings
), c AS (
  SELECT vec_id,
    list_transform(embedding,
                   x -> CAST(round(x / scale * 127) AS INT)) AS codes
  FROM embeddings, s
), q AS (
  SELECT vec_id AS query_id, codes AS qcodes FROM c WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(1, len(c.codes) + 1),
         i -> CAST(c.codes[i] AS BIGINT) * q.qcodes[i])) AS BIGINT) AS score
  FROM c, q
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= 10
"""


def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization + ADC retrieval, integer-exact
    (pipeline/quantization.pq_adc_topk): SQ8-quantize with one
    corpus-trained scale, build 8 codebooks from the subvectors of the
    first 16 corpus vectors (the anchored-quantizer construction), store
    m=8 PQ codes per vector, and score queries by table lookups — every
    number an int64, so the oracle recomputes assignment, tables, and
    ranks exactly with nested DuckDB list lambdas. Queries are the
    first 5 corpus vectors; k=10."""
    from cassandra_pmem_spark.pipeline.quantization import pq_adc_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(emb, queries, k=10)


_PQ_DIST = (
    "list_transform(range(0, 16), c -> "
    "list_sum(list_transform(range(1, 9), i -> "
    "(xi[j*8 + i] - A[c + 1][j*8 + i]) * (xi[j*8 + i] - A[c + 1][j*8 + i]))))"
)

_PQ_ADC_ORACLE = f"""
WITH s AS (
  SELECT max(list_max(list_transform(embedding, x -> abs(x)))) AS scale
  FROM embeddings
), ic AS (
  SELECT vec_id,
    list_transform(embedding,
                   x -> CAST(round(x / scale * 127) AS BIGINT)) AS xi
  FROM embeddings, s
), anch AS (
  SELECT list(xi ORDER BY vec_id) AS A FROM ic WHERE vec_id < 16
), codes AS (
  SELECT vec_id,
    list_transform(range(0, 8), j ->
      list_indexof({_PQ_DIST}, list_min({_PQ_DIST})) - 1) AS pq
  FROM ic, anch
), q AS (
  SELECT vec_id AS query_id, xi AS qi FROM ic WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, codes.vec_id AS neighbor_id,
    CAST(list_sum(list_transform(range(0, 8), j ->
      list_sum(list_transform(range(1, 9), i ->
        q.qi[j*8 + i] * A[pq[j + 1] + 1][j*8 + i])))) AS BIGINT) AS score
  FROM codes, q, anch
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= 10
"""


def source_tar_webdataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar-shard round trip, oracle-checked (sources/tar.py
    — the POSIX ustar layout written and walked from the raw spec with
    header checksums verified; stdlib tarfile cross-validates the
    writer in unit tests): each Arrow batch becomes one shard with
    three members per document, parsed back and regrouped by sample
    key. The oracle recomputes keys, member counts, byte lengths, and
    the md5 of the .txt member — a hash match proves the archive
    round trip byte-exact. This is THE container multimodal training
    corpora ship in (shard-sequential reads, no central index)."""
    from cassandra_pmem_spark.sources.tar import webdataset_stage

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return webdataset_stage(docs)


_WEBDATASET_ORACLE = """
SELECT doc_id,
  lpad(CAST(doc_id AS VARCHAR), 12, '0') AS sample_key,
  CAST(3 AS BIGINT) AS n_members,
  CAST(octet_length(encode(text)) AS BIGINT) AS txt_bytes,
  md5(text) AS txt_md5,
  doc_id % 10 AS cls_val
FROM documents
"""


def text_ngram_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM perplexity scoring (pipeline/text.ngram_lm_scores
    — the CCNet-style quality filter): the model trains on the corpus
    itself, both count tables broadcast back, and per-doc scores
    aggregate exact micro-log integers so float summation order cannot
    skew either engine. The oracle rebuilds the identical model and
    scores in DuckDB SQL."""
    from cassandra_pmem_spark.pipeline.text import ngram_lm_scores

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return ngram_lm_scores(docs)


_NGRAM_LM_ORACLE = f"""
WITH normed AS (
  SELECT doc_id, {_NORM_SQL} AS s FROM documents
), t AS (
  SELECT doc_id,
    unnest(list_transform(range(1, greatest(length(s) - 2, 0) + 1),
                          i -> substring(s, CAST(i AS INT), 3))) AS tri
  FROM normed
), c3 AS (
  SELECT tri, count(*) AS n3 FROM t GROUP BY 1
), c2 AS (
  SELECT substring(tri, 1, 2) AS bg, count(*) AS n2 FROM t GROUP BY 1
), s AS (
  SELECT doc_id,
    CAST(round(log2(CAST(n3 AS DOUBLE) / n2) * 1000000) AS BIGINT) AS ml
  FROM t JOIN c3 USING (tri) JOIN c2 ON substring(t.tri, 1, 2) = c2.bg
)
SELECT doc_id,
  count(*) AS n_trigrams,
  CAST(sum(ml) AS BIGINT) AS sum_micro_log,
  round(pow(2, -CAST(sum(ml) AS DOUBLE) / (count(*) * 1000000.0)), 4) AS ppl
FROM s GROUP BY 1
"""


def source_compressed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL chunked block compression, oracle-checked
    (pipeline/compression.py — the reference's SSTable compression
    layout: independent fixed-size chunks + per-chunk CRC32,
    CompressedSequentialWriter.java:186-275, with the LZ4 block format
    and Snappy raw format implemented from their public specs and
    Deflate/bzip2/LZMA via stdlib): each doc's payload (text repeated doc_id%100+1
    times) is compressed with the codec doc_id%5 selects at 4 KiB
    chunks, the container parsed back, every CRC verified, and the
    DECODED bytes fingerprinted. The oracle recomputes length, chunk
    count and md5 from the construction — a hash match proves
    decompress(compress(x)) == x across all three codecs."""
    from cassandra_pmem_spark.pipeline.compression import (
        compressed_roundtrip_stage,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    d = F.col("doc_id")
    built = docs.select(
        "doc_id",
        F.expr("repeat(text, CAST(doc_id % 100 + 1 AS INT))").alias("payload"),
        F.when(d % 5 == 0, F.lit("lz4"))
        .when(d % 5 == 1, F.lit("snappy"))
        .when(d % 5 == 2, F.lit("deflate"))
        .when(d % 5 == 3, F.lit("bz2"))
        .otherwise(F.lit("lzma"))
        .alias("algo"),
    )
    return compressed_roundtrip_stage(built, chunk_length=4096)


_COMPRESSED_ORACLE = """
WITH built AS (
  SELECT doc_id,
    repeat(text, CAST(doc_id % 100 + 1 AS INT)) AS payload,
    CASE WHEN doc_id % 5 = 0 THEN 'lz4'
         WHEN doc_id % 5 = 1 THEN 'snappy'
         WHEN doc_id % 5 = 2 THEN 'deflate'
         WHEN doc_id % 5 = 3 THEN 'bz2' ELSE 'lzma' END AS algo
  FROM documents
)
SELECT doc_id, algo,
  CAST((octet_length(encode(payload)) + 4095) // 4096 AS BIGINT) AS n_chunks,
  CAST(octet_length(encode(payload)) AS BIGINT) AS orig_len,
  md5(payload) AS payload_md5
FROM built
"""


def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (pipeline/text.dsir_importance_weights
    — Xie et al., NeurIPS 2023): target = the doc_id<50 slice standing
    in for a high-quality corpus, raw = every document; each raw doc
    gets the hashed-ngram log-ratio weight log p_target − log p_raw in
    exact micro-log integers (unigram+bigram md5 buckets, add-one
    smoothing). The oracle replays the identical bucketing, model fit,
    and integer rounding in SQL — bucket hashing is the portable md5
    hash, so both engines build byte-identical models."""
    from cassandra_pmem_spark.pipeline.text import dsir_importance_weights

    docs = load_table(spark, "documents", sf_dir)
    target = docs.filter(F.col("doc_id") < 50)
    return dsir_importance_weights(docs, target, n_buckets=512)


_DSIR_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM documents
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS ws FROM docs
), grams AS (
  SELECT doc_id, unnest(
    ws || list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
  ) AS g FROM w
), feat AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) % 512 AS bucket,
    count(*) AS cnt
  FROM grams GROUP BY 1, 2
), tf AS (
  SELECT bucket, SUM(cnt) AS t FROM feat WHERE doc_id < 50 GROUP BY bucket
), rb AS (
  SELECT bucket, SUM(cnt) AS r FROM feat GROUP BY bucket
), lam AS (
  SELECT rb.bucket,
    CAST(round((
      log2(CAST(COALESCE(tf.t, 0) + 1 AS DOUBLE)
           / ((SELECT SUM(t) FROM tf) + 512))
      - log2(CAST(rb.r + 1 AS DOUBLE) / ((SELECT SUM(r) FROM rb) + 512))
    ) * 1e6) AS BIGINT) AS lam
  FROM rb LEFT JOIN tf ON rb.bucket = tf.bucket
)
SELECT feat.doc_id,
  CAST(SUM(cnt) AS BIGINT) AS n_grams,
  CAST(SUM(cnt * lam) AS BIGINT) AS w_micro
FROM feat JOIN lam ON feat.bucket = lam.bucket
GROUP BY feat.doc_id
"""


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pipeline/decontaminate.py): the
    benchmark set is 12-word snippets cut from every 50th document, and
    each training doc is flagged when it shares any 8-word gram with
    the benchmark — the GPT-3/PaLM n-gram-overlap rule with the
    broadcast-probe plan shape. The oracle rebuilds identical grams
    with DuckDB list SQL and recomputes hit counts exhaustively."""
    from cassandra_pmem_spark.pipeline.decontaminate import contamination
    from cassandra_pmem_spark.pipeline.dedup import normalize_text

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    words = F.split(normalize_text("text"), " ")
    bench = docs.filter(F.col("doc_id") % 50 == 7).select(
        F.array_join(F.slice(words, 3, 12), " ").alias("text")
    )
    return contamination(docs, bench)


_DECONTAM_GRAMS = (
    "list_distinct(list_transform(range(1, greatest(len(words) - 7, 1) + 1), "
    "i -> array_to_string(words[i:i+7], ' ')))"
)

_DECONTAM_ORACLE = f"""
WITH normed AS (
  SELECT doc_id, {_NORM_SQL} AS norm FROM documents
), w AS (
  SELECT doc_id, string_split(norm, ' ') AS words FROM normed
), bsnip AS (
  SELECT array_to_string(words[3:14], ' ') AS snip FROM w WHERE doc_id % 50 = 7
), bgrams AS (
  SELECT DISTINCT unnest({_DECONTAM_GRAMS}) AS g
  FROM (SELECT string_split(snip, ' ') AS words FROM bsnip)
), dgrams AS (
  SELECT doc_id, unnest({_DECONTAM_GRAMS}) AS g FROM w
), hits AS (
  SELECT doc_id, count(*) AS n_hits FROM dgrams JOIN bgrams USING (g) GROUP BY 1
)
SELECT n.doc_id,
  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
  COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM normed n LEFT JOIN hits h ON n.doc_id = h.doc_id
"""


def source_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (pipeline/urls.py — the key-building step a
    crawl pipeline runs before URL-level dedup): deterministic messy
    URLs (mixed-case scheme/host, default and explicit ports, empty
    paths, unsorted query params, fragments) are normalized, and host +
    registered domain extracted. The oracle builds the IDENTICAL URLs
    and applies the IDENTICAL RE2-compatible rule chain in DuckDB."""
    from cassandra_pmem_spark.pipeline.urls import (
        normalize_url,
        registered_domain,
        url_host,
    )

    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    s = lambda e: e.cast("string")  # noqa: E731
    suffix = (
        F.when(d % 4 == 0, F.lit(".Example.CO.UK"))
        .when(d % 4 == 1, F.lit(".example.com"))
        .when(d % 4 == 2, F.lit(".test.org"))
        .otherwise(F.lit(".demo.net"))
    )
    port = (
        F.when((d % 5 == 0) & (d % 2 == 0), F.lit(":443"))
        .when((d % 5 == 0) & (d % 2 == 1), F.lit(":80"))
        .when(d % 5 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("Http")),
        F.lit("://WWW.Host"), s(d % 20), suffix, port,
        F.when(d % 3 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p/"), s(d % 50))
        ),
        F.when(
            d % 4 != 0,
            F.concat(F.lit("?zz="), s(d % 9), F.lit("&aa="), s(d % 7)),
        ).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.concat(F.lit("#Sec"), s(d % 4))).otherwise(
            F.lit("")
        ),
    )
    built = docs.select("doc_id", url.alias("url"))
    host = url_host("url")
    return built.select(
        "doc_id",
        normalize_url("url").alias("url_norm"),
        host.alias("host"),
        registered_domain(host).alias("domain"),
    )


def _url_normalize_oracle() -> str:
    from cassandra_pmem_spark.pipeline.urls import (
        domain_sql,
        host_sql,
        normalize_sql,
    )

    build = (
        "CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'Http' END"
        " || '://WWW.Host' || CAST(doc_id % 20 AS VARCHAR)"
        " || CASE WHEN doc_id % 4 = 0 THEN '.Example.CO.UK'"
        " WHEN doc_id % 4 = 1 THEN '.example.com'"
        " WHEN doc_id % 4 = 2 THEN '.test.org' ELSE '.demo.net' END"
        " || CASE WHEN doc_id % 5 = 0 AND doc_id % 2 = 0 THEN ':443'"
        " WHEN doc_id % 5 = 0 AND doc_id % 2 = 1 THEN ':80'"
        " WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN ''"
        " ELSE '/p/' || CAST(doc_id % 50 AS VARCHAR) END"
        " || CASE WHEN doc_id % 4 <> 0 THEN '?zz='"
        " || CAST(doc_id % 9 AS VARCHAR) || '&aa='"
        " || CAST(doc_id % 7 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN '#Sec'"
        " || CAST(doc_id % 4 AS VARCHAR) ELSE '' END"
    )
    return f"""
WITH built AS (
  SELECT doc_id, {build} AS url FROM documents
)
SELECT doc_id,
  {normalize_sql("url")} AS url_norm,
  {host_sql("url")} AS host,
  {domain_sql(host_sql("url"))} AS domain
FROM built
"""


def _pii_oracle() -> str:
    from cassandra_pmem_spark.pipeline.pii import counts_sql, redaction_sql

    build = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || CASE WHEN doc_id % 3 = 0 THEN ' from 10.'"
        " || CAST(doc_id % 256 AS VARCHAR) || '.'"
        " || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'"
        " || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' card 4111 1111 1111 '"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN ' call (555) '"
        " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
        " || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    counts = ",\n  ".join(counts_sql("text"))
    return f"""
WITH built AS (
  SELECT doc_id, {build} AS text FROM documents
)
SELECT doc_id,
  {counts},
  md5({redaction_sql("text")}) AS redacted_md5
FROM built
"""


def text_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 word pairs over the corpus vocabulary
    (pipeline/dedup.edit_distance_join — SymSpell deletion-
    neighborhood blocking): the top-2000 words by frequency
    (deterministic (count DESC, word) order) self-join through their
    single-deletion key sets, then the exact levenshtein() predicate
    decides. The synthetic vocabulary has no natural distance-1
    neighbors, so the query plants them: every ≥5-char word also
    contributes its first-char-beheaded form (a deletion ⇒ distance
    exactly 1), the same planted-fixture idiom as dedup_line_level.
    The oracle is the plain quadratic self-join with DuckDB's native
    levenshtein — equality proves the deletion-neighborhood candidate
    set COMPLETE, the property that lets the distributed form replace
    the |V|² comparison at corpus scale."""
    from cassandra_pmem_spark.pipeline.dedup import edit_distance_join

    docs = load_table(spark, "documents", sf_dir)
    top = (
        docs.select(
            F.explode(F.split("text", " ")).alias("raw")
        )
        .select(F.lower("raw").alias("w"))
        .filter(F.col("w").rlike("^[a-z]{4,12}$"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w"))
        .limit(2000)
        .select("w")
    )
    typos = top.filter(F.length("w") >= 5).select(
        F.expr("substring(w, 2)").alias("w")
    )
    return edit_distance_join(top.union(typos).distinct())


_FUZZY_JOIN_ORACLE = """
WITH top AS (
  SELECT w FROM (
    SELECT lower(w) AS w, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE regexp_matches(lower(w), '^[a-z]{4,12}$')
    GROUP BY 1
  ) ORDER BY cnt DESC, w LIMIT 2000
), vocab AS (
  SELECT DISTINCT w FROM (
    SELECT w FROM top
    UNION ALL
    SELECT substr(w, 2) AS w FROM top WHERE length(w) >= 5
  )
)
SELECT a.w AS w1, b.w AS w2, levenshtein(a.w, b.w) AS dist
FROM vocab a JOIN vocab b
  ON a.w < b.w
 AND abs(length(a.w) - length(b.w)) <= 1
 AND levenshtein(a.w, b.w) <= 1
"""


_BPE_MERGES = 6
# training-corpus cap for the registry exemplars: 200 of the 500 docs at
# gate scale, so the TRUNCATING scale path (hash-ordered sample + cache,
# bpe.py train_cap) is the hash-proven one. The sample key is md5(text) —
# bit-identical in DuckDB — so the oracle reproduces the exact sample.
_BPE_CAP = 200


def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE vocabulary training over the corpus (pipeline/bpe.py —
    Sennrich et al.'s merge loop, not a regex stand-in): six rounds of
    full-corpus adjacent-pair counting, deterministic argmax
    (freq DESC, pair), and leftmost-non-overlapping merge application.
    The oracle replays ALL six rounds as unrolled chained CTEs (the
    PageRank idiom) over the SAME md5-ordered 200-doc training sample —
    pair counts, tie-breaks, and private-use merge symbols identical —
    so hash equality proves the distributed trainer exact, round by
    round, WITH the 100 TB-scale train_cap path engaged (every merge
    round aggregates the cached sample, never the full corpus)."""
    from cassandra_pmem_spark.pipeline.bpe import train_bpe

    docs = load_table(spark, "documents", sf_dir)
    merges = train_bpe(docs, n_merges=_BPE_MERGES, train_cap=_BPE_CAP)
    return spark.createDataFrame(
        [(int(r), p, int(f)) for r, p, f in merges],
        "round BIGINT, pair STRING, freq BIGINT",
    )


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode with the learned BPE table (pipeline/bpe.apply_bpe — a
    chain of narrow replace projections, zero shuffles) and aggregate
    token counts per source; training runs on the capped md5-ordered
    sample (the scale path), while ENCODING covers the full corpus —
    the oracle re-derives the merge table from the same sample and
    measures the same full-corpus post-merge lengths."""
    from cassandra_pmem_spark.pipeline.bpe import apply_bpe, train_bpe

    docs = load_table(spark, "documents", sf_dir)
    merges = train_bpe(docs, n_merges=_BPE_MERGES, train_cap=_BPE_CAP)
    enc = apply_bpe(docs, merges)
    return enc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _bpe_rounds_cte(n: int, carry_source: bool) -> str:
    from cassandra_pmem_spark.pipeline.bpe import PUA_BASE

    src = ", source" if carry_source else ""
    parts = [
        f"s0 AS (SELECT text FROM documents ORDER BY md5(text), text "
        f"LIMIT {_BPE_CAP})"
    ]
    if carry_source:
        parts.append("r0 AS (SELECT text, source FROM documents)")
    for r in range(1, n + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"p{r} AS (SELECT substr(text, i, 2) AS pair, "
            f"count(*) AS freq FROM (SELECT text, "
            f"unnest(range(1, length(text))) AS i FROM {prev}) "
            f"GROUP BY 1)"
        )
        parts.append(
            f"m{r} AS (SELECT pair, freq FROM p{r} "
            f"ORDER BY freq DESC, pair LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT replace(text, (SELECT pair FROM m{r}), "
            f"chr({PUA_BASE + r - 1})) AS text FROM {prev})"
        )
        if carry_source:
            parts.append(
                f"r{r} AS (SELECT replace(text, (SELECT pair FROM m{r}), "
                f"chr({PUA_BASE + r - 1})) AS text{src} FROM r{r - 1})"
            )
    return "WITH " + ",\n".join(parts)


def _bpe_train_oracle() -> str:
    body = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, pair, freq FROM m{r}"
        for r in range(1, _BPE_MERGES + 1)
    )
    return f"{_bpe_rounds_cte(_BPE_MERGES, carry_source=False)}\n{body}"


def _bpe_encode_oracle() -> str:
    return (
        f"{_bpe_rounds_cte(_BPE_MERGES, carry_source=True)}\n"
        f"SELECT source, count(*) AS n_docs, "
        f"CAST(SUM(length(text)) AS BIGINT) AS total_tokens "
        f"FROM r{_BPE_MERGES} GROUP BY 1"
    )




def multimodal_audio_mp1_subband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer I audio decode, oracle-checked: each document
    deterministically becomes a Layer I stream (pipeline/mpeg_audio.py —
    bit-level encoder AND decoder from the public ISO 11172-3 spec:
    96 kbit/s @ 32 kHz framing, 4-bit allocations, 6-bit scalefactor
    indices, MSB-first coded samples) and the REAL decoder walks the
    frames back through the §2.4.3.1 requantization. Requantized values
    scaled by (2^nb-1)*2^(nb-1) are INTEGERS — 2^nb*(c - 2^(nb-1) + 1) —
    and power-of-two scalefactors keep the scaled sum integer too, so
    the oracle recomputes every decoded sample from the construction
    arithmetic; a hash match proves sync walk, allocation parse,
    scalefactor parse, and dequantization bit-exact. Synthesis stops at
    the subband domain by design (the polyphase window is printed-table
    data; COVERAGE.md §6)."""
    from cassandra_pmem_spark.pipeline.multimodal import (
        attach_media,
        mp1_subband_stage,
    )

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "blob", F.col("text").cast("binary")
    )
    media = attach_media(docs, "blob", "audio", "audio/mpeg", "doc_id")
    return mp1_subband_stage(media)


_MP1_SUBBAND_ORACLE = """
WITH g AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
), sb AS (
  SELECT doc_id, L, unnest([0, 1, 2]) AS subband FROM g
), t AS (
  SELECT doc_id, L, subband,
         unnest(range(0, (L % 5 + 2) * 12)) AS i
  FROM sb
), v AS (
  SELECT doc_id, L, subband,
         subband + 2 AS nb,
         (L * 7 + i * 5 + subband * 3) % ((1 << (subband + 2)) - 1) AS c
  FROM t
)
SELECT doc_id AS item_id,
  CAST(subband AS INT) AS subband,
  CAST(nb AS INT) AS nb,
  CAST(3 * ((L + subband) % 5) AS INT) AS sf_idx,
  CAST(count(*) AS BIGINT) AS n_samples,
  CAST(SUM((1 << nb) * (c - (1 << (nb - 1)) + 1)) AS BIGINT) AS sum_num,
  CAST(SUM((1 << nb) * (c - (1 << (nb - 1)) + 1))
       * (1 << (5 - (L + subband) % 5)) AS BIGINT) AS scaled_sum
FROM v GROUP BY doc_id, L, subband, nb
"""


QUERIES = {
    "dedup_exact_docs": (
        dedup_exact_docs,
        f"SELECT doc_id, lang, source FROM documents WHERE doc_id IN ("
        f"SELECT min(doc_id) FROM documents GROUP BY {_NORM_SQL})",
    ),
    "dedup_minhash_jaccard": (dedup_minhash_jaccard, _minhash_oracle()),
    "dedup_simhash": (dedup_simhash, _SIMHASH_ORACLE),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, _NGRAM_ORACLE),
    "dedup_lsh_pairs": (dedup_lsh_pairs, _lsh_pairs_oracle()),
    "dedup_cascade_docs": (
        dedup_cascade_docs,
        f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 10
        ), normed AS (
          SELECT doc_id, {_NORM_SQL} AS norm FROM corpus
        ), s1 AS (
          SELECT min(doc_id) AS doc_id, norm FROM normed GROUP BY norm
        ), w AS (
          SELECT doc_id, string_split(norm, ' ') AS words FROM s1
        ), sh AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
          FROM w
        ), ds AS (
          SELECT doc_id, unnest(shingles) AS s FROM sh
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id
        ), inter AS (
          SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ), dups AS (
          SELECT DISTINCT b FROM inter
          JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7
        )
        SELECT doc_id FROM s1 WHERE doc_id NOT IN (SELECT b FROM dups)
        """,
    ),
    "sim_bruteforce_topk": (sim_bruteforce_topk, _TOPK_ORACLE),
    "sim_neardup_exact": (sim_neardup_exact, _NEARDUP_ORACLE),
    "sim_lsh_topk": (sim_lsh_topk, _lsh_topk_oracle()),
    "sim_ivf_topk": (sim_ivf_topk, _IVF_TOPK_ORACLE),
    "sim_ivf_rerank": (sim_ivf_rerank, _IVF_RERANK_ORACLE),
    "text_token_counts": (
        text_token_counts,
        "SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens "
        "FROM documents",
    ),
    "text_quality": (text_quality, _QUALITY_ORACLE),
    "text_langid": (text_langid, _lang_sql()),
    "text_fingerprint": (
        text_fingerprint,
        f"SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents",
    ),
    "multimodal_meta": (
        multimodal_meta,
        "SELECT doc_id AS item_id, 'image' AS modality, "
        "'application/octet-stream' AS mime, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents",
    ),
    "multimodal_features": (multimodal_features, _multimodal_features_oracle()),
    "multimodal_features_jpeg": (
        multimodal_features_jpeg,
        _multimodal_features_jpeg_oracle(),
    ),
    # same oracle as the gray variant: achromatic pixels triple every
    # histogram count, which cancels in the proportions
    "multimodal_features_jpeg_color": (
        multimodal_features_jpeg_color,
        _multimodal_features_jpeg_oracle(),
    ),
    # and again for the SOF2 multi-scan path: identical decoded pixels
    "multimodal_features_jpeg_progressive": (
        multimodal_features_jpeg_progressive,
        _multimodal_features_jpeg_oracle(),
    ),
    "multimodal_audio_mp3_meta": (multimodal_audio_mp3_meta, _MP3_META_ORACLE),
    "multimodal_audio_mp1_subband": (multimodal_audio_mp1_subband, _MP1_SUBBAND_ORACLE),
    "multimodal_video_gif_frames": (multimodal_video_gif_frames, _GIF_FRAMES_ORACLE),
    "multimodal_video_mjpeg_avi": (multimodal_video_mjpeg_avi, _AVI_FRAMES_ORACLE),
    "multimodal_video_mp4_samples": (multimodal_video_mp4_samples, _MP4_SAMPLES_ORACLE),
    "multimodal_audio_g711_adpcm": (multimodal_audio_g711_adpcm, _g711_oracle()),
    "multimodal_audio_flac": (multimodal_audio_flac, _FLAC_ORACLE),
    "source_warc_ingest": (source_warc_ingest, _WARC_ORACLE),
    "text_html_extract": (text_html_extract, _HTML_ORACLE),
    "text_repetition_signals": (text_repetition_signals, _REPETITION_ORACLE),
    "sketch_hll_registers": (sketch_hll_registers, _hll_oracle()),
    "sketch_countmin_cells": (sketch_countmin_cells, _countmin_oracle()),
    "sketch_histogram_bins": (sketch_histogram_bins, _HISTOGRAM_ORACLE),
    "dedup_line_level": (dedup_line_level, _LINE_DEDUP_ORACLE),
    "text_fuzzy_join": (text_fuzzy_join, _FUZZY_JOIN_ORACLE),
    "text_bpe_train": (text_bpe_train, _bpe_train_oracle()),
    "text_bpe_encode": (text_bpe_encode, _bpe_encode_oracle()),
    "text_c4_filters": (text_c4_filters, _C4_ORACLE),
    "text_bm25_scores": (text_bm25_scores, _bm25_oracle()),
    "sketch_bloom_words": (sketch_bloom_words, _bloom_oracle()),
    "multimodal_video_y4m_frames": (multimodal_video_y4m_frames, _Y4M_FRAMES_ORACLE),
    "sketch_runtime_filtered_join": (sketch_runtime_filtered_join, _RTF_JOIN_ORACLE),
    "pipeline_pack_sequences": (pipeline_pack_sequences, _PACK_ORACLE),
    "pipeline_stratified_sample": (pipeline_stratified_sample, _stratified_oracle()),
    "pipeline_domain_mixture": (pipeline_domain_mixture, _domain_mixture_oracle()),
    "pipeline_epoch_shuffle": (pipeline_epoch_shuffle, _epoch_shuffle_oracle()),
    "pipeline_chunk_documents": (pipeline_chunk_documents, _CHUNK_ORACLE),
    "graph_pagerank_exact": (graph_pagerank_exact, _pagerank_oracle()),
    "sim_semantic_dedup": (sim_semantic_dedup, _SEMANTIC_DEDUP_ORACLE),
    "streaming_sketch_merge": (streaming_sketch_merge, _streaming_hll_oracle()),
    "text_pii_redact": (text_pii_redact, _pii_oracle()),
    "source_url_normalize": (source_url_normalize, _url_normalize_oracle()),
    "dedup_connected_components": (dedup_connected_components, _CC_ORACLE),
    "dedup_components_star": (dedup_components_star, _CC_ORACLE),
    "dedup_substring_spans": (dedup_substring_spans, _SUBSTRING_DEDUP_ORACLE),
    "multimodal_image_dedup": (multimodal_image_dedup, _image_dedup_oracle()),
    "multimodal_audio_dedup": (multimodal_audio_dedup, _audio_dedup_oracle()),
    "multimodal_video_dedup": (multimodal_video_dedup, _video_dedup_oracle()),
    "text_decontaminate": (text_decontaminate, _DECONTAM_ORACLE),
    "text_dsir_weights": (text_dsir_weights, _DSIR_ORACLE),
    "source_compressed_chunks": (source_compressed_chunks, _COMPRESSED_ORACLE),
    "text_ngram_lm_ppl": (text_ngram_lm_ppl, _NGRAM_LM_ORACLE),
    "source_tar_webdataset": (source_tar_webdataset, _WEBDATASET_ORACLE),
    "sim_sq8_topk": (sim_sq8_topk, _SQ8_ORACLE),
    "sim_pq_adc_topk": (sim_pq_adc_topk, _PQ_ADC_ORACLE),
    "text_sasi_analyzer": (text_sasi_analyzer, _SASI_ORACLE),
    "multimodal_frame_plan": (multimodal_frame_plan, _FRAME_PLAN_ORACLE),
}
