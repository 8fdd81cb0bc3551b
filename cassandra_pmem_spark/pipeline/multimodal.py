"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Model (SURVEY: multimodal extension): a media item is
    struct<data: binary, meta: struct<modality string, mime string,
           width int, height int, sample_rate int, duration_ms long>>
stored as two flat columns (`data` binary, `meta` struct) so Parquet keeps
the binary column page-compressed and the metadata min/max-indexed —
predicate pushdown on metadata never touches the bytes.

Decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages: the Spark-side plumbing (schemas, batch iteration,
partition sizing) is real and tested. Codecs: PNG, 8/16/24-bit-PCM WAV,
baseline JPEG — grayscale AND 4:2:0/4:4:4 YCbCr color — AND animated
GIF (LZW, interlace, disposal compositing) decode/encode are REAL and
library-free (pipeline/codecs.py — stdlib zlib/struct/wave + numpy;
pipeline/jpeg.py — T.81 baseline Huffman+DCT, interleaved MCUs,
progressive SOF2; pipeline/gif.py — GIF89a). Animated GIF is the real
VIDEO path: timed frames decode and frame-sample through the same
mapInPandas shape. Formats that require codec libraries the container
lacks (MP3 audio decode, MP4 sample decode) raise a clearly-marked
NotImplementedError, and a deterministic
byte-statistics fake remains available (fake_decode=True) for
format-agnostic plumbing tests. At
scale, each batch is one Arrow RecordBatch; set
spark.sql.execution.arrow.maxRecordsPerBatch to bound decoded-frame
memory.
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
    """Wrap a raw binary column into the (data, meta) media layout.

    The downstream codec stages are CPU-bound mapInPandas chains whose
    parallelism equals the SCAN parallelism. At warehouse scale the
    input's many file splits provide that for free (and this stays
    zero-Exchange); a small table read as ONE split would serialize the
    whole codec chain onto one core, so when the scan yields fewer
    partitions than the cluster's parallelism the media frame is
    repartitioned up front — a tiny shuffle of raw blobs that buys
    core-count speedup on every stage after it. Row-wise stages are
    order-independent, so results are identical either way."""
    out = df.select(
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
    from cassandra_pmem_spark.plans.hints import ensure_scan_parallelism

    return ensure_scan_parallelism(out)


def _decode_image(data: bytes) -> "object":
    """Real decode for PNG, baseline JPEG — grayscale AND 4:2:0/4:4:4
    YCbCr color — and GIF (first frame of an animation; achromatic
    palettes collapse to a 2-D gray array). Pure stdlib+numpy
    (pipeline/codecs.py, pipeline/jpeg.py, pipeline/gif.py); other image
    formats need codec libraries this container lacks and raise."""
    from cassandra_pmem_spark.pipeline.codecs import decode_png, is_png
    from cassandra_pmem_spark.pipeline.gif import decode_gif, is_gif
    from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, is_jpeg

    if is_png(data):
        return decode_png(data)
    if is_jpeg(data):
        return decode_jpeg(data)  # (h, w) gray or (h, w, 3) RGB
    if is_gif(data):
        frame = decode_gif(data)[0][0]  # (h, w, 3) composited first frame
        if (frame[..., 0] == frame[..., 1]).all() and (
            frame[..., 0] == frame[..., 2]
        ).all():
            return frame[..., 0]
        return frame
    raise NotImplementedError(
        "only PNG, baseline JPEG (gray + YCbCr color), and GIF decode "
        "without codec libraries (WebP/AVIF/... need Pillow/libvips — "
        "not present in this container); or use "
        "extract_image_features(fake_decode=True) for format-agnostic "
        "plumbing"
    )


def extract_image_features(
    media: DataFrame, dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over media items.

    Real pipeline: decode → resize → CNN/CLIP features. With
    fake_decode=False, PNG payloads REALLY decode (codecs.py) and the
    statistics run over decoded pixels; fake_decode=True computes the same
    statistics over raw bytes (format-agnostic, deterministic). Either
    way the distributed shape — mapInPandas over (item_id, data), bounded
    Arrow batches, typed output schema — is the production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                if fake_decode:
                    buf = np.frombuffer(raw, dtype=np.uint8)
                else:
                    buf = _decode_image(raw).ravel()  # decoded pixels
                n = int(buf.size)
                if n:
                    counts = np.bincount(buf, minlength=256).astype(np.float64) / n
                    nz = counts[counts > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    # deterministic "feature": bucketed byte histogram
                    feat = counts.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
                else:
                    entropy, feat = 0.0, np.zeros(dim, dtype=np.float32)
                rows.append((int(item_id), len(raw), entropy, feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["item_id", "n_bytes", "byte_entropy", "feature"]
            )

    return media.select("item_id", "data").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


PNG_STAGE_SCHEMA = T.StructType(
    [T.StructField("item_id", T.LongType()), T.StructField("data", T.BinaryType())]
)


def png_encode_stage(media: DataFrame, width: int = 32) -> DataFrame:
    """Encode each item's payload bytes as a deterministic grayscale PNG
    (pure-stdlib encoder, codecs.py): bytes pad to a width-multiple and
    reshape to (h, width) pixels. This is the fixture-generation stage in
    front of the REAL decode path — emits the same (item_id, data) shape
    every media stage consumes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.codecs import encode_png

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"\x00") or b"\x00"
                h = (len(raw) + width - 1) // width
                buf = np.frombuffer(raw.ljust(h * width, b"\x00"), np.uint8).reshape(h, width)
                rows.append((int(item_id), encode_png(buf)))
            yield pd.DataFrame(rows, columns=["item_id", "data"])

    return media.select("item_id", "data").mapInPandas(run, PNG_STAGE_SCHEMA)


def image_dhash_stage(
    media: DataFrame, width: int = 9, height: int = 8
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded images: each
    item's PNG/JPEG/GIF payload decodes through the stdlib codecs, is
    nearest-neighbor resampled to (height × width) luma, and hashed on
    the row-wise gradient — bit i = p[y, x] > p[y, x+1], i = y·(width-1)+x.
    Small pixel perturbations flip only the bits whose comparisons they
    touch, so near-duplicate images land within a small hamming radius —
    feed the output to dedup.hamming_pairs for the banded join. Color
    images collapse by channel mean. Arrow-batched mapInPandas, zero
    shuffle; returns (item_id, dhash) with dhash a signed 64-bit long."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                img = _decode_image(bytes(data))
                arr = np.asarray(img)
                if arr.ndim == 3:
                    arr = arr.mean(axis=2)
                h, w = arr.shape
                ys = np.arange(height) * h // height
                xs = np.arange(width) * w // width
                g = arr[np.ix_(ys, xs)].astype(np.int64)
                bits = (g[:, :-1] > g[:, 1:]).ravel()
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(item_id)
                hashes.append(val)
            yield pd.DataFrame(
                {"item_id": ids, "dhash": pd.array(hashes, dtype="int64")}
            )

    return media.mapInPandas(run, "item_id long, dhash long")


def audio_fingerprint_stage(
    media: DataFrame, block: int = 64, nblocks: int = 65
) -> DataFrame:
    """Acoustic fingerprint over REAL decoded audio (the chromaprint
    idea reduced to its gradient core): each item's FLAC payload decodes
    bit-exactly (pipeline/flac.py), the first channel folds to
    `nblocks` per-block integer means, and the signature is the
    block-energy gradient — bit i = mean[i] > mean[i+1], a 64-bit hash
    (nblocks = 65) where a local edit flips only the bits whose
    comparisons it touches. Feed to dedup.hamming_pairs exactly like
    image dHash. Arrow-batched mapInPandas, zero shuffle; returns
    (item_id, afp long, n_samples long)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.flac import decode_flac

        for pdf in batches:
            ids, fps, lens = [], [], []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                samples, _rate = decode_flac(bytes(data))
                ch = samples[:, 0].astype(np.int64)
                n = (len(ch) // block) * block
                means = ch[:n].reshape(-1, block).sum(axis=1) // block
                means = means[:nblocks]
                bits = means[:-1] > means[1:]
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(item_id)
                fps.append(val)
                lens.append(len(ch))
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "afp": pd.array(fps, dtype="int64"),
                    "n_samples": pd.array(lens, dtype="int64"),
                }
            )

    return media.mapInPandas(run, "item_id long, afp long, n_samples long")


def video_fingerprint_stage(
    media: DataFrame, width: int = 9, height: int = 8
) -> DataFrame:
    """Temporal video fingerprint over REAL decoded animations: each
    composited frame gets the image dHash (row-gradient bits over a
    resampled luma grid), and the video-level signature takes every bit
    by MAJORITY across frames — a single re-encoded, watermarked, or
    glitched frame cannot flip a bit most frames agree on. Pairs come
    from the same banded hamming join as image/audio dedup
    (dedup.hamming_pairs). Arrow-batched mapInPandas, zero shuffle;
    returns (item_id, vfp long, n_frames int)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.gif import decode_gif

        for pdf in batches:
            ids, fps, nframes = [], [], []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                frames, _delays = decode_gif(bytes(data))
                counts = np.zeros((height - 0) * (width - 1), np.int64)
                for fr in frames:
                    arr = np.asarray(fr)
                    if arr.ndim == 3:
                        arr = arr.mean(axis=2)
                    h, w = arr.shape
                    ys = np.arange(height) * h // height
                    xs = np.arange(width) * w // width
                    g = arr[np.ix_(ys, xs)].astype(np.int64)
                    counts += (g[:, :-1] > g[:, 1:]).ravel().astype(np.int64)
                bits = counts * 2 > len(frames)
                val = 0
                for i, b in enumerate(bits):
                    if b:
                        val |= 1 << i
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(item_id)
                fps.append(val)
                nframes.append(len(frames))
            yield pd.DataFrame(
                {
                    "item_id": ids,
                    "vfp": pd.array(fps, dtype="int64"),
                    "n_frames": pd.array(nframes, dtype="int32"),
                }
            )

    return media.mapInPandas(run, "item_id long, vfp long, n_frames int")


def jpeg_encode_stage(media: DataFrame, width: int = 16) -> DataFrame:
    """Encode each item's payload bytes as a deterministic baseline JPEG
    (pure-stdlib encoder, pipeline/jpeg.py): bytes are forced even
    (v & ~1), padded to a width-multiple, and each byte becomes a uniform
    8×8 block. Block-uniform even values round-trip bit-exactly through
    the Annex K tables (jpeg.py module docstring derives why), so the
    decoded-pixel histogram is recomputable from the source text — that is
    what makes the REAL lossy-format pipeline oracle-checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_gray

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"\x00") or b"\x00"
                h = (len(raw) + width - 1) // width
                grid = (
                    np.frombuffer(raw.ljust(h * width, b"\x00"), np.uint8).reshape(h, width)
                    & 0xFE
                )
                img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                rows.append((int(item_id), encode_jpeg_gray(img)))
            yield pd.DataFrame(rows, columns=["item_id", "data"])

    return media.select("item_id", "data").mapInPandas(run, PNG_STAGE_SCHEMA)


def jpeg_encode_color_stage(media: DataFrame, width: int = 16) -> DataFrame:
    """Encode each item's payload bytes as a deterministic 4:2:0 COLOR
    baseline JPEG: evenized bytes become achromatic RGB (R=G=B=v) uniform
    8×8 blocks. Achromatic even-valued blocks round-trip bit-exactly
    through the full color chain — Y = v exactly (the BT.601 luma weights
    sum to 1), Cb = Cr = 128 exactly (the chroma weights cancel), so every
    chroma coefficient quantizes to 0 and the luma path reduces to the
    grayscale exactness argument (jpeg.py docstring). The decoded RGB
    histogram therefore has the same PROPORTIONS as the gray variant
    (each byte contributes 3 identical channel samples), making the color
    pipeline oracle-checkable with the same SQL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_color

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"\x00") or b"\x00"
                h = (len(raw) + width - 1) // width
                grid = (
                    np.frombuffer(raw.ljust(h * width, b"\x00"), np.uint8).reshape(h, width)
                    & 0xFE
                )
                gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                rgb = np.stack([gray, gray, gray], axis=-1)
                rows.append((int(item_id), encode_jpeg_color(rgb)))
            yield pd.DataFrame(rows, columns=["item_id", "data"])

    return media.select("item_id", "data").mapInPandas(run, PNG_STAGE_SCHEMA)


def jpeg_encode_progressive_stage(media: DataFrame, width: int = 16) -> DataFrame:
    """Encode each item's payload bytes as a deterministic PROGRESSIVE
    (SOF2) grayscale JPEG — same evenized uniform-block construction as
    jpeg_encode_stage, so the multi-scan DC/AC successive-approximation
    path round-trips bit-exactly too (a uniform even block has only a DC
    coefficient; the DC first+refine scans reconstruct it losslessly and
    every AC scan is pure EOB runs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_progressive

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"\x00") or b"\x00"
                h = (len(raw) + width - 1) // width
                grid = (
                    np.frombuffer(raw.ljust(h * width, b"\x00"), np.uint8).reshape(h, width)
                    & 0xFE
                )
                img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
                rows.append((int(item_id), encode_jpeg_progressive(img)))
            yield pd.DataFrame(rows, columns=["item_id", "data"])

    return media.select("item_id", "data").mapInPandas(run, PNG_STAGE_SCHEMA)


MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("frames", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
    ]
)


def mp3_meta_stage(media: DataFrame, mod_frames: int = 7) -> DataFrame:
    """MP3 metadata WITHOUT audio decode: build a valid Layer III frame
    sequence per item (frame count derived from the payload length —
    deterministic, so an oracle can recompute it), then walk the REAL
    frame headers (codecs.mp3_stream_info — sync, bitrate/sample-rate
    tables, frame-length arithmetic) to recover frames/duration/bitrate.
    This is the production shape for audio metadata at 100 TB: headers
    only, payload bytes never parsed beyond frame boundaries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp3_frames,
            mp3_stream_info,
        )

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                n = len(raw) % mod_frames + 2
                info = mp3_stream_info(build_mp3_frames(n))
                rows.append(
                    (
                        int(item_id),
                        info["frames"],
                        info["sample_rate"],
                        info["duration_ms"],
                        info["bitrate_kbps"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["item_id", "frames", "sample_rate", "duration_ms", "bitrate_kbps"],
            )

    return media.select("item_id", "data").mapInPandas(run, MP3_META_SCHEMA)


MP1_SUBBAND_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("subband", T.IntegerType()),
        T.StructField("nb", T.IntegerType()),
        T.StructField("sf_idx", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_num", T.LongType()),
        T.StructField("scaled_sum", T.LongType()),
    ]
)


def mp1_subband_stage(media: DataFrame, mod_frames: int = 5) -> DataFrame:
    """REAL MPEG-1 Layer I audio decode to requantized subband samples
    (pipeline/mpeg_audio.py — ISO 11172-3 frame walk, bit allocation,
    scalefactor indices, §2.4.3.1 requantization, all bit-level): each
    item deterministically becomes a Layer I stream (frames = byte-length
    mod `mod_frames` + 2; subbands 0..2 active with nb = sb+2 bits,
    scalefactor index 3*((L+sb)%5) — a power-of-two scalefactor, so
    scaled output is INTEGER-exact) and the REAL decoder walks it back.
    sum_num is the exact integer numerator sum (s''' scaled by
    (2^nb-1)*2^(nb-1)); scaled_sum additionally applies the scalefactor
    (shift by 5-(L+sb)%5). PCM windowing intentionally stops at the
    subband domain — the polyphase window is printed-table data (module
    docstring). Zero-shuffle mapInPandas, like every codec stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cassandra_pmem_spark.pipeline.mpeg_audio import (
            build_mp1_frame,
            decode_mp1,
        )

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                L = len(raw)
                n_frames = L % mod_frames + 2
                stream = b"".join(
                    build_mp1_frame(
                        {
                            sb: (
                                sb + 2,
                                3 * ((L + sb) % 5),
                                [
                                    (L * 7 + (f * 12 + g) * 5 + sb * 3)
                                    % ((1 << (sb + 2)) - 1)
                                    for g in range(12)
                                ],
                            )
                            for sb in range(3)
                        }
                    )
                    for f in range(n_frames)
                )
                decoded = decode_mp1(stream)
                agg: dict[int, list] = {}
                for rec in decoded:
                    a = agg.setdefault(
                        rec["subband"], [rec["nb"], rec["sf_idx"], 0, 0]
                    )
                    a[2] += len(rec["samples"])
                    a[3] += sum(rec["samples"])
                for sb in sorted(agg):
                    nb, sf_idx, n, s = agg[sb]
                    shift = 5 - sf_idx // 3
                    rows.append(
                        (int(item_id), sb, nb, sf_idx, n, s, s * (1 << shift))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id", "subband", "nb", "sf_idx",
                    "n_samples", "sum_num", "scaled_sum",
                ],
            )

    return media.select("item_id", "data").mapInPandas(run, MP1_SUBBAND_SCHEMA)


GIF_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("delay_cs", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("min_px", T.LongType()),
        T.StructField("max_px", T.LongType()),
    ]
)


def gif_frames_stage(
    media: DataFrame, size: int = 16, mod_frames: int = 5
) -> DataFrame:
    """REAL video decode + frame walk: each item deterministically becomes
    an animated GIF (frame count = byte-length mod `mod_frames` + 2; frame
    i is a uniform `size`×`size` canvas with palette index
    (L*7 + i*13) % 256 and GCE delay (i%4 + 1)*5 cs), and the REAL GIF89a
    decoder (pipeline/gif.py — LZW, graphic-control extensions, disposal
    compositing) walks the animation back into timed frames. Emitted
    min_px == max_px proves every pixel of every frame survived the
    LZW encode→decode round trip and the palette mapping; delay_cs proves
    the GCE walk. One output row per frame — the exploded shape
    frame-sampling composes with (join on item_id, filter on cumulative
    delay). At 100 TB this is a zero-shuffle mapInPandas chain: frames
    never leave the executor that scanned the blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % mod_frames + 2
                frames = [
                    np.full((size, size), (length * 7 + i * 13) % 256, np.uint8)
                    for i in range(n)
                ]
                delays = [(i % 4 + 1) * 5 for i in range(n)]
                blob = encode_gif(frames, delays_cs=delays)
                decoded, out_delays = decode_gif(blob)
                for i, (frame, d) in enumerate(zip(decoded, out_delays)):
                    rows.append(
                        (
                            int(item_id),
                            len(decoded),
                            i,
                            int(d),
                            int(frame.shape[1]),
                            int(frame.shape[0]),
                            int(frame.min()),
                            int(frame.max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in GIF_FRAMES_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, GIF_FRAMES_SCHEMA)


G711_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_ulaw", T.LongType()),
        T.StructField("sum_alaw", T.LongType()),
        T.StructField("sum_adpcm", T.LongType()),
    ]
)


def g711_audio_stage(media: DataFrame) -> DataFrame:
    """REAL compressed-audio decode: each item deterministically becomes
    three WAV files — G.711 mu-law (format tag 7), G.711 A-law (tag 6),
    and mono IMA ADPCM (tag 0x11) — and the REAL decoders
    (codecs.decode_wav_any: RIFF walk + the canonical G.711 expansion
    tables + the IMA nibble loop) recover linear PCM. The G.711 payload
    is n = L%50+10 code bytes (L + i*17) % 256; the ADPCM payload is two
    all-zero-nibble blocks whose predictors are (L*31 + j*997) % 4096 -
    2048 (an all-zero nibble at step index 0 has diff = 7>>3 = 0, so each
    9-sample block decodes to its predictor exactly — the closed form the
    oracle recomputes; the ADAPTIVE path is covered by round-trip SNR
    unit tests). Emitted integer sums over the decoded int16 samples let
    DuckDB re-derive every value from embedded copies of the public
    G.711 tables."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.codecs import (
            decode_wav_any,
            encode_wav_g711,
        )

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % 50 + 10
                codes = ((length + np.arange(n) * 17) % 256).astype(np.uint8)
                sums = []
                for law in ("ulaw", "alaw"):
                    pcm, rate, tag = decode_wav_any(
                        encode_wav_g711(codes, 8000, law)
                    )
                    assert rate == 8000 and tag == (7 if law == "ulaw" else 6)
                    sums.append(int(pcm.astype(np.int64).sum()))
                import struct as _s

                body = b"".join(
                    _s.pack("<hBB", (length * 31 + j * 997) % 4096 - 2048, 0, 0)
                    + b"\x00" * 4
                    for j in range(2)
                )
                adpcm = _wav_adpcm_container(body)
                pcm, _, tag = decode_wav_any(adpcm)
                assert tag == 0x11
                rows.append(
                    (int(item_id), n, sums[0], sums[1], int(pcm.astype(np.int64).sum()))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in G711_AUDIO_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, G711_AUDIO_SCHEMA)


def _wav_adpcm_container(body: bytes) -> bytes:
    from cassandra_pmem_spark.pipeline.codecs import _wav_container
    import struct as _s

    return _wav_container(0x11, 1, 8000, 4, 8, body, _s.pack("<HH", 2, 9))


FLAC_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_left", T.LongType()),
        T.StructField("sum_right", T.LongType()),
        T.StructField("min_left", T.LongType()),
        T.StructField("max_right", T.LongType()),
        T.StructField("compressed", T.BooleanType()),
    ]
)


def flac_audio_stage(media: DataFrame) -> DataFrame:
    """REAL lossless-codec audio pipeline: each item deterministically
    becomes a stereo int16 signal (n = L%400+50 samples; left_i =
    (L*13 + i*i*7) % 4001 - 2000, right_i = (L*29 + i*11) % 4001 - 2000 —
    the quadratic left channel defeats low-order predictors so Rice
    coding carries real residuals), encoded as mid-side FLAC
    (pipeline/flac.py: Levinson-Durbin LPC / fixed predictors, Rice
    residuals, CRC-8/16) and decoded back bit-exactly. The emitted
    integer sums/extrema over the DECODED samples are recomputable from
    the construction arithmetic alone — a hash match proves the entire
    lossless chain (prediction, Rice, mid-side decorrelation, CRCs)
    reproduced every sample. `compressed` additionally asserts the
    encoder actually compressed (blob < raw PCM bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % 400 + 50
                i = np.arange(n, dtype=np.int64)
                left = (length * 13 + i * i * 7) % 4001 - 2000
                right = (length * 29 + i * 11) % 4001 - 2000
                st = np.stack([left, right], axis=1).astype(np.int16)
                blob = encode_flac(st, 16000, stereo_mode="mid-side")
                dec, rate = decode_flac(blob)
                assert rate == 16000
                rows.append(
                    (
                        int(item_id),
                        int(dec.shape[0]),
                        int(dec[:, 0].sum()),
                        int(dec[:, 1].sum()),
                        int(dec[:, 0].min()),
                        int(dec[:, 1].max()),
                        len(blob) < 4 * n,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FLAC_AUDIO_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, FLAC_AUDIO_SCHEMA)


MP4_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("sample_idx", T.LongType()),
        T.StructField("dts", T.LongType()),
        T.StructField("duration", T.IntegerType()),
        T.StructField("size", T.IntegerType()),
        T.StructField("offset_rel", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def mp4_samples_stage(media: DataFrame) -> DataFrame:
    """REAL MP4 sample-table walk (ISO/IEC 14496-12 §8.5-8.7): each item
    deterministically becomes an ISO-BMFF file whose mdat holds n =
    L%20+5 timed samples indexed by real stts/stsz/stsc/stco tables
    (4-sample chunks, short last chunk), and the REAL parser composes the
    per-sample index and RETRIEVES each payload by its absolute file
    offset. payload_md5 is computed from the SLICED bytes, so a hash
    match proves the chunk-run composition found every sample byte-
    exactly — the mechanism a video pipeline uses to fetch frame N from
    100 TB of media without decoding anything."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp4_with_samples,
            mp4_sample_table,
        )

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % 20 + 5
                payloads = [
                    bytes([(length + i) % 94 + 33]) * ((length + 7 * i) % 50 + 1)
                    for i in range(n)
                ]
                durs = [(i % 3 + 1) * 100 for i in range(n)]
                blob = build_mp4_with_samples(payloads, durs, samples_per_chunk=4)
                table = mp4_sample_table(blob)
                base = table[0]["offset"]
                for row in table:
                    sliced = blob[row["offset"] : row["offset"] + row["size"]]
                    rows.append(
                        (
                            int(item_id),
                            row["idx"],
                            row["dts"],
                            row["duration"],
                            row["size"],
                            row["offset"] - base,
                            hashlib.md5(sliced).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MP4_SAMPLES_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, MP4_SAMPLES_SCHEMA)


Y4M_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("min_px", T.LongType()),
        T.StructField("max_px", T.LongType()),
    ]
)


def y4m_frames_stage(media: DataFrame, size: int = 8, mod_frames: int = 6) -> DataFrame:
    """REAL uncompressed-video walk (YUV4MPEG2 — the raw interchange
    format video tools pipe between each other): each item becomes a
    mono Y4M stream (n = L%6+2 frames of uniform Y value (L*5+i*11)%256
    at L%30+1 fps) and the REAL parser walks header + FRAME markers back
    into timed frames; frame_ts_ms derives from the container's
    fps metadata. min_px == max_px proves every Y plane byte survived."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.codecs import decode_y4m, encode_y4m

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % mod_frames + 2
                fps = (length % 30 + 1, 1)
                frames = [
                    np.full((size, size), (length * 5 + i * 11) % 256, np.uint8)
                    for i in range(n)
                ]
                decoded, out_fps, chroma = decode_y4m(
                    encode_y4m(frames, fps=fps, chroma="mono")
                )
                assert chroma == "mono"
                for i, frame in enumerate(decoded):
                    rows.append(
                        (
                            int(item_id),
                            len(decoded),
                            i,
                            out_fps[0],
                            # integer floor division: Python round() is
                            # half-even, SQL round() half-away — floor is
                            # the cross-engine-safe timestamp grid
                            i * 1000 * out_fps[1] // out_fps[0],
                            int(frame.min()),
                            int(frame.max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in Y4M_FRAMES_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, Y4M_FRAMES_SCHEMA)


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
    """Real resize for PNG and baseline grayscale JPEG: decode →
    nearest-neighbor → re-encode in the same format. Other formats raise —
    they need codec libs."""
    from cassandra_pmem_spark.pipeline.codecs import (
        decode_png,
        encode_png,
        is_png,
        resize_nearest,
    )
    from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray, is_jpeg

    if is_png(data):
        return encode_png(resize_nearest(decode_png(data), width, height))
    if is_jpeg(data):
        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_color

        px = resize_nearest(decode_jpeg(data), width, height)
        return encode_jpeg_color(px) if px.ndim == 3 else encode_jpeg_gray(px)
    from cassandra_pmem_spark.pipeline.gif import (
        decode_gif,
        encode_gif,
        is_gif,
        rgb_to_indexed,
    )

    if is_gif(data):
        frame = resize_nearest(decode_gif(data)[0][0], width, height)
        idx, pal = rgb_to_indexed(frame)
        return encode_gif([idx], palette=pal)
    raise NotImplementedError(
        "only PNG, baseline JPEG (gray + color), and GIF resize without "
        "codec libraries; use resize_images(fake_resize=True) for "
        "format-agnostic plumbing"
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
    """Audio feature stage: RMS + zero-crossing counts per item, same
    mapInPandas shape as the image path. fake_decode=False REALLY decodes
    WAV — linear PCM 8/16/24-bit, G.711 mu-law/A-law, and mono IMA ADPCM
    (codecs.decode_wav_any; MP3 audio decode still needs ffmpeg and
    raises); fake_decode=True interprets the raw payload as headerless
    int16 PCM (format-agnostic, deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                raw = bytes(data or b"")
                if fake_decode:
                    x = (
                        np.frombuffer(raw[: len(raw) - (len(raw) % 2)], dtype="<i2")
                        .astype(np.float64)
                        / 32768.0
                    )
                else:
                    from cassandra_pmem_spark.pipeline.codecs import (
                        decode_wav_any,
                        is_wav,
                    )
                    from cassandra_pmem_spark.pipeline.flac import (
                        decode_flac,
                        is_flac,
                    )

                    if is_wav(raw):
                        pcm = decode_wav_any(raw)[0]
                    elif is_flac(raw):
                        pcm = decode_flac(raw)[0]
                    else:
                        raise NotImplementedError(
                            "only WAV (PCM / G.711 / IMA ADPCM) and FLAC "
                            "decode without codec libraries"
                        )
                    x = pcm.ravel().astype(np.float64) / 32768.0
                n = int(x.size)
                if n:
                    rms = float(np.sqrt((x * x).mean()))
                    zc = int(((x[:-1] * x[1:]) < 0).sum())
                else:
                    rms, zc = 0.0, 0
                rows.append((int(item_id), n, rms, zc))
            yield pd.DataFrame(rows, columns=["item_id", "n_samples", "rms", "zero_crossings"])

    return media.select("item_id", "data").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


AVI_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("fps_rate", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("min_px", T.LongType()),
        T.StructField("max_px", T.LongType()),
    ]
)


def avi_frames_stage(media: DataFrame, size: int = 16) -> DataFrame:
    """REAL compressed-video decode: each item deterministically becomes
    an MJPEG AVI (pipeline/avi.py — RIFF walk + per-frame baseline JPEG
    through pipeline/jpeg.py, idx1 cross-checked): n = L%5+2 frames of
    the uniform even value ((L*5 + i*7) % 128)*2 at rate ∈ {5, 8, 10}
    fps (L%3), and the decoder walks the container and entropy-decodes
    every frame. Uniform even blocks round-trip the lossy codec
    BIT-EXACTLY (jpeg.py docstring), so min_px == max_px == the
    construction value and the oracle can recompute every row; t_ms is
    the frame timestamp scale*1000*i/rate (integral for these rates).
    Zero-shuffle mapInPandas — frames never leave the scanning
    executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                length = len(bytes(data or b""))
                n = length % 5 + 2
                rate = (5, 8, 10)[length % 3]
                frames = [
                    np.full(
                        (size, size), ((length * 5 + i * 7) % 128) * 2, np.uint8
                    )
                    for i in range(n)
                ]
                blob = encode_avi_mjpeg(frames, rate=rate)
                dec, (out_rate, out_scale), (w, h) = decode_avi_mjpeg(blob)
                for i, frame in enumerate(dec):
                    rows.append(
                        (
                            int(item_id),
                            len(dec),
                            i,
                            i * 1000 * out_scale // out_rate,
                            int(out_rate),
                            int(w),
                            int(h),
                            int(frame.min()),
                            int(frame.max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AVI_FRAMES_SCHEMA])

    return media.select("item_id", "data").mapInPandas(run, AVI_FRAMES_SCHEMA)
