"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model (SURVEY: multimodal extension): a media item is
    struct<data: binary, meta: struct<modality string, mime string,
           width int, height int, sample_rate int, duration_ms long>>
stored as two flat columns (`data` binary, `meta` struct) so Parquet keeps
the binary column page-compressed and the metadata min/max-indexed —
predicate pushdown on metadata never touches the bytes.

Decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages: the Spark-side plumbing (schemas, batch iteration,
partition sizing) is real and tested; the codec calls themselves are STUBS
(this container has no image/audio libs) — clearly marked, with a
deterministic fake used by tests. At scale, each batch is one Arrow
RecordBatch; set spark.sql.execution.arrow.maxRecordsPerBatch to bound
decoded-frame memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media(
    df: DataFrame, binary_col: str, modality: str, mime: str, id_col: str
) -> DataFrame:
    """Wrap a raw binary column into the (data, meta) media layout."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.col(binary_col).alias("data"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.octet_length(F.col(binary_col)).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image(data: bytes) -> "object":
    """STUB: real deployments plug Pillow/libvips here. Deterministic fake:
    interpret bytes as a pseudo-image of len(data) pixels."""
    raise NotImplementedError(
        "image decode requires Pillow/libvips — not present in this container; "
        "tests use extract_image_features(fake_decode=True)"
    )


def extract_image_features(
    media: DataFrame, dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over media items.

    Real pipeline: decode → resize → CNN/CLIP features. Here the decode is
    stubbed (deterministic byte-statistics fake when fake_decode=True), but
    the distributed shape — mapInPandas over (item_id, data), bounded Arrow
    batches, typed output schema — is the production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                buf = np.frombuffer(bytes(data or b""), dtype=np.uint8)
                if not fake_decode:
                    _decode_image(bytes(data or b""))  # raises: codec stub
                n = int(buf.size)
                if n:
                    counts = np.bincount(buf, minlength=256).astype(np.float64) / n
                    nz = counts[counts > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    # deterministic "feature": bucketed byte histogram
                    feat = counts.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
                else:
                    entropy, feat = 0.0, np.zeros(dim, dtype=np.float32)
                rows.append((int(item_id), n, entropy, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_bytes", "byte_entropy", "feature"]
            )

    return media.select("item_id", "data").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each item into (item_id, frame_ts)
    rows using metadata only — pure built-ins, no decode. The decode of the
    sampled frames is the stubbed mapInPandas stage above. This split
    (metadata explode JVM-side, byte work in Arrow batches) is the scale
    pattern: the expensive stage sees exactly the sampled frames."""
    return media.select(
        "item_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )


def _resize_image(data: bytes, width: int, height: int) -> bytes:
    """STUB: real deployments plug Pillow `Image.resize` here."""
    raise NotImplementedError(
        "image resize requires Pillow — not present in this container; "
        "resize_images(fake_resize=True) exercises the distributed plumbing"
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake_resize: bool = True
) -> DataFrame:
    """Resize stage: mapInPandas over (item_id, data) with a typed output
    schema. Codec stubbed (deterministic truncate/pad fake — w*h bytes) —
    batch shape, schema, and partition behavior are the production parts."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                if not fake_resize:
                    raw = _resize_image(raw, width, height)  # raises: stub
                else:
                    raw = (raw + b"\x00" * target)[:target]
                rows.append((int(item_id), raw, width, height))
            yield pd.DataFrame(rows, columns=["item_id", "data", "width", "height"])

    return media.select("item_id", "data").mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Audio feature stage: interpret the binary payload as int16 PCM
    (deterministic fake decode — a real deployment plugs soundfile/ffmpeg),
    emit RMS + zero-crossing counts per item. Same mapInPandas shape as the
    image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                if not fake_decode:
                    raise NotImplementedError("audio decode requires soundfile/ffmpeg")
                buf = np.frombuffer(raw[: len(raw) - (len(raw) % 2)], dtype="<i2")
                n = int(buf.size)
                if n:
                    x = buf.astype(np.float64) / 32768.0
                    rms = float(np.sqrt((x * x).mean()))
                    zc = int(((x[:-1] * x[1:]) < 0).sum())
                else:
                    rms, zc = 0.0, 0
                rows.append((int(item_id), n, rms, zc))
            yield pd.DataFrame(rows, columns=["item_id", "n_samples", "rms", "zero_crossings"])

    return media.select("item_id", "data").mapInPandas(run, AUDIO_FEATURES_SCHEMA)
