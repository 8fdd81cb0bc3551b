"""Pure-stdlib PNG/WAV codec tests + the real decode paths through the
Arrow-batched multimodal stages (no Pillow/soundfile anywhere)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cassandra_pmem_spark.pipeline.codecs import (
    PNG_SIGNATURE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    is_png,
    is_wav,
    resize_nearest,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png_with_filter(img: np.ndarray, filt: int) -> bytes:
    """Build a PNG whose every row uses the given filter type — exercises
    the unfilter paths the plain encoder (filter 0) never emits."""
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        if filt == 0:
            enc = cur
        elif filt == 1:  # sub
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) % 256
        elif filt == 2:  # up
            enc = (cur - prev) % 256
        elif filt == 3:  # average
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) % 256
        elif filt == 4:  # paeth
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        raw += bytes([filt]) + enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


class TestPng:
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_roundtrip(self, ch):
        img = _rng().integers(0, 256, (13, 9, ch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (13, 9, ch)
        assert np.array_equal(out, img)

    def test_roundtrip_2d_gray(self):
        img = _rng(1).integers(0, 256, (5, 7), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img))[..., 0], img)

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [1, 3])
    def test_all_spec_filters_unfilter_correctly(self, filt, ch):
        img = _rng(filt * 10 + ch).integers(0, 256, (6, 5, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(_png_with_filter(img, filt)), img)

    def test_palette_png(self):
        palette = _rng(3).integers(0, 256, (4, 3), dtype=np.uint8)
        idx = _rng(4).integers(0, 4, (5, 6, 1), dtype=np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
        ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0)
        data = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        out = decode_png(data)
        assert np.array_equal(out, palette[idx[..., 0]])

    def test_rejects_non_png(self):
        assert not is_png(b"JFIF....")
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"not a png at all")

    def test_rejects_16_bit(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        data = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="8-bit"):
            decode_png(data)

    def test_resize_nearest_known_mapping(self):
        img = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
        up = resize_nearest(img, 4, 4)
        assert up.shape == (4, 4, 1)
        assert np.array_equal(up[..., 0], np.array([
            [0, 0, 1, 1],
            [0, 0, 1, 1],
            [2, 2, 3, 3],
            [2, 2, 3, 3],
        ], dtype=np.uint8))


class TestWav:
    def test_roundtrip_mono(self):
        x = np.sin(np.linspace(0, 20, 800))
        out, rate = decode_wav(encode_wav(x, 16000))
        assert rate == 16000 and out.shape == (800, 1)
        assert np.abs(out[:, 0] - x).max() < 1 / 32768 + 1e-9

    def test_roundtrip_stereo(self):
        x = np.stack([np.sin(np.linspace(0, 5, 100)), np.cos(np.linspace(0, 5, 100))], 1)
        out, rate = decode_wav(encode_wav(x, 8000))
        assert rate == 8000 and out.shape == (100, 2)
        assert np.abs(out - x).max() < 1 / 32768 + 1e-9

    def test_is_wav(self):
        assert is_wav(encode_wav(np.zeros(4), 8000))
        assert not is_wav(b"RIFFxxxxAVI ")


class TestRealDecodeStages:
    def test_image_features_real_png_decode(self, spark):
        from cassandra_pmem_spark.pipeline.multimodal import (
            attach_media,
            extract_image_features,
            png_encode_stage,
        )

        df = spark.createDataFrame(
            [(1, b"hello pixels" * 10), (2, b"\x00\x01\x02\x03" * 64)],
            "item_id long, blob binary",
        )
        media = attach_media(df, "blob", "image", "image/png", "item_id")
        out = extract_image_features(png_encode_stage(media, width=16), dim=8,
                                     fake_decode=False).collect()
        got = {r.item_id: r for r in out}
        assert set(got) == {1, 2}
        # item 2 pixels: 4 distinct values equally likely (padded to 16-mult,
        # 256 bytes = exact) -> entropy == 2 bits
        assert got[2].byte_entropy == pytest.approx(2.0)
        assert len(got[2].feature) == 8

    def test_resize_images_real_png(self, spark):
        from cassandra_pmem_spark.pipeline.codecs import decode_png
        from cassandra_pmem_spark.pipeline.multimodal import resize_images

        png = encode_png(_rng(9).integers(0, 256, (20, 10, 3), dtype=np.uint8))
        df = spark.createDataFrame([(7, png)], "item_id long, data binary")
        rows = resize_images(df, width=5, height=4, fake_resize=False).collect()
        assert len(rows) == 1
        out = decode_png(bytes(rows[0].data))
        assert out.shape == (4, 5, 3)

    def test_audio_features_real_wav_decode(self, spark):
        from cassandra_pmem_spark.pipeline.multimodal import extract_audio_features

        # constant-amplitude alternating signal: rms = 0.5, one zero
        # crossing per sample pair
        x = np.tile([0.5, -0.5], 50)
        df = spark.createDataFrame([(3, encode_wav(x, 16000))], "item_id long, data binary")
        r = extract_audio_features(df, fake_decode=False).collect()[0]
        assert r.n_samples == 100
        assert r.rms == pytest.approx(0.5, abs=1e-4)
        assert r.zero_crossings == 99


class TestJpeg:
    """Baseline grayscale JPEG (pipeline/jpeg.py — T.81 subset,
    Annex K tables)."""

    def test_is_jpeg(self):
        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_gray, is_jpeg

        enc = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
        assert is_jpeg(enc)
        assert not is_jpeg(b"\x89PNG")
        assert enc.startswith(b"\xff\xd8") and enc.endswith(b"\xff\xd9")

    def test_block_uniform_even_roundtrip_exact(self):
        # the oracle-exactness property: uniform 8x8 blocks of even values
        # survive DCT->quant->huffman->decode bit-exactly (DC step 16
        # divides 8*(v-128) when v is even; AC quantizes to 0)
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        grid = (_rng(3).integers(0, 256, (7, 16), dtype=np.uint8)) & 0xFE
        img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        assert np.array_equal(decode_jpeg(encode_jpeg_gray(img)), img)

    def test_large_dc_jumps_exact(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        grid = np.array([[0, 254, 2, 250, 4, 128]], dtype=np.uint8)
        img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        assert np.array_equal(decode_jpeg(encode_jpeg_gray(img)), img)

    def test_lossy_general_image_close(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        x = np.linspace(0, 255, 64)
        img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8

    def test_non_multiple_of_8_dims(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        img = (_rng(5).integers(0, 256, (13, 21), dtype=np.uint8)) & 0xFE
        assert decode_jpeg(encode_jpeg_gray(img)).shape == (13, 21)

    def test_rejects_non_jpeg_and_bad_streams(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")

    def test_entropy_data_has_no_bare_ff(self):
        # byte stuffing: every 0xFF inside entropy data must be 0xFF00
        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_gray

        img = np.full((8, 8), 254, np.uint8)  # DC=1008/16=63 -> many 1-bits
        enc = encode_jpeg_gray(img)
        body = enc[2:-2]
        i = body.find(b"\xff\xda")
        scan = body[i + 2 + struct.unpack(">H", body[i + 2 : i + 4])[0] :]
        j = 0
        while j < len(scan) - 1:
            if scan[j] == 0xFF:
                assert scan[j + 1] == 0x00
                j += 2
            else:
                j += 1

    def test_image_features_real_jpeg_decode(self, spark):
        from cassandra_pmem_spark.pipeline.multimodal import (
            extract_image_features,
            jpeg_encode_stage,
        )

        # 256 bytes over 4 distinct even values, equally likely -> decoded
        # histogram entropy exactly 2 bits (each byte repeated 64x cancels)
        payload = bytes([0, 64, 128, 192] * 64)
        df = spark.createDataFrame([(2, payload)], "item_id long, data binary")
        out = extract_image_features(
            jpeg_encode_stage(df), dim=8, fake_decode=False
        ).collect()
        assert len(out) == 1
        assert out[0].byte_entropy == pytest.approx(2.0)
        assert len(out[0].feature) == 8

    def test_resize_images_real_jpeg(self, spark):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray
        from cassandra_pmem_spark.pipeline.multimodal import resize_images

        jpg = encode_jpeg_gray((_rng(9).integers(0, 256, (24, 16), dtype=np.uint8)))
        df = spark.createDataFrame([(7, jpg)], "item_id long, data binary")
        rows = resize_images(df, width=8, height=6, fake_resize=False).collect()
        assert decode_jpeg(bytes(rows[0].data)).shape == (6, 8)


class TestJpegColor:
    """Multi-component baseline JPEG (4:2:0 / 4:4:4 YCbCr — T.81
    interleaved MCUs, Annex K chroma tables K.2/K.4/K.6)."""

    def test_achromatic_even_420_roundtrip_exact(self):
        # the color oracle-exactness property: achromatic (R=G=B) uniform
        # even blocks give Y=v exactly and Cb=Cr=128 exactly, so every
        # chroma coefficient quantizes to 0 and luma follows the gray
        # exactness argument — bit-exact through the full 4:2:0 chain
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color

        grid = (_rng(11).integers(0, 256, (5, 16), dtype=np.uint8)) & 0xFE
        gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        rgb = np.stack([gray, gray, gray], axis=-1)
        out = decode_jpeg(encode_jpeg_color(rgb))
        assert out.shape == rgb.shape
        assert np.array_equal(out, rgb)

    def test_achromatic_even_444_roundtrip_exact(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color

        grid = (_rng(12).integers(0, 256, (3, 8), dtype=np.uint8)) & 0xFE
        gray = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        rgb = np.stack([gray, gray, gray], axis=-1)
        assert np.array_equal(decode_jpeg(encode_jpeg_color(rgb, subsample=False)), rgb)

    def test_lossy_smooth_color_close(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color

        h, w = 48, 64
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 // (w - 1)).astype(np.uint8),
                (yy * 255 // (h - 1)).astype(np.uint8),
                ((xx + yy) * 255 // (h + w - 2)).astype(np.uint8),
            ],
            axis=-1,
        )
        for sub in (True, False):
            dec = decode_jpeg(encode_jpeg_color(img, subsample=sub))
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.mean() < 4.0, f"subsample={sub}: mean err {err.mean()}"

    def test_non_mcu_multiple_dims(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color

        img = _rng(13).integers(0, 256, (19, 27, 3), dtype=np.uint8)
        assert decode_jpeg(encode_jpeg_color(img)).shape == (19, 27, 3)
        assert decode_jpeg(encode_jpeg_color(img, subsample=False)).shape == (19, 27, 3)

    def test_ycbcr_conversion_inverts(self):
        from cassandra_pmem_spark.pipeline.jpeg import rgb_to_ycbcr, ycbcr_to_rgb

        rgb = _rng(14).integers(0, 256, (9, 9, 3), dtype=np.uint8)
        y, cb, cr = rgb_to_ycbcr(rgb)
        back = ycbcr_to_rgb(y, cb, cr)
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1

    def test_gray_decoder_still_gray_shape(self):
        # 1-component streams keep returning 2-D arrays
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        img = (_rng(15).integers(0, 256, (16, 16), dtype=np.uint8)) & 0xFE
        assert decode_jpeg(encode_jpeg_gray(img)).ndim == 2

    def test_color_stage_histogram_matches_gray_proportions(self, spark):
        from cassandra_pmem_spark.pipeline.multimodal import (
            extract_image_features,
            jpeg_encode_color_stage,
        )

        payload = bytes([0, 64, 128, 192] * 64)
        df = spark.createDataFrame([(3, payload)], "item_id long, data binary")
        out = extract_image_features(
            jpeg_encode_color_stage(df), dim=8, fake_decode=False
        ).collect()
        # 4 equally-likely decoded values -> entropy exactly 2 bits, same
        # as the gray stage (3 identical channel samples cancel)
        assert out[0].byte_entropy == pytest.approx(2.0)

    def test_resize_color_jpeg_reencodes_color(self, spark):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color
        from cassandra_pmem_spark.pipeline.multimodal import resize_images

        jpg = encode_jpeg_color(_rng(16).integers(0, 256, (32, 24, 3), dtype=np.uint8))
        df = spark.createDataFrame([(8, jpg)], "item_id long, data binary")
        rows = resize_images(df, width=12, height=10, fake_resize=False).collect()
        assert decode_jpeg(bytes(rows[0].data)).shape == (10, 12, 3)


class TestJpegRestartIntervals:
    """DRI/RSTm support (T.81 E.1.4/E.2.4): byte-aligned restart markers
    with DC-predictor reset, on both encode and decode."""

    def test_gray_exact_roundtrip_with_restarts(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray

        grid = (_rng(31).integers(0, 256, (6, 9), dtype=np.uint8)) & 0xFE
        img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        for ri in (1, 3, 7, 53):
            enc = encode_jpeg_gray(img, restart_interval=ri)
            assert b"\xff\xdd" in enc  # DRI segment present
            assert np.array_equal(decode_jpeg(enc), img), f"ri={ri}"

    def test_color_restart_decode_matches_restart_free(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_color

        img = _rng(32).integers(0, 256, (40, 56, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_color(img))
        for ri in (1, 2, 5):
            got = decode_jpeg(encode_jpeg_color(img, restart_interval=ri))
            assert np.array_equal(got, base), f"ri={ri}"

    def test_restart_markers_cycle_mod_8(self):
        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_gray

        # 10 blocks, ri=1 -> 9 restarts: markers must cycle D0..D7,D0
        img = np.repeat(np.repeat(np.arange(10, dtype=np.uint8).reshape(1, 10) * 8, 8, 0), 8, 1)
        enc = encode_jpeg_gray(img, restart_interval=1)
        ms = []
        i = enc.find(b"\xff\xda")
        j = i + 2
        while j < len(enc) - 1:
            if enc[j] == 0xFF and 0xD0 <= enc[j + 1] <= 0xD7:
                ms.append(enc[j + 1] - 0xD0)
                j += 2
            else:
                j += 1
        assert ms == [0, 1, 2, 3, 4, 5, 6, 7, 0]


class TestJpegProgressive:
    """Progressive (SOF2) multi-scan codec — T.81 G: DC first/refine,
    AC first/refine with EOB runs and successive approximation. The
    anchor property: the progressive and sequential encoders quantize to
    IDENTICAL coefficients, so their decodes must agree pixel-for-pixel
    (an independent cross-check, not a self-roundtrip)."""

    def test_gray_progressive_matches_sequential(self):
        from cassandra_pmem_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg_gray,
            encode_jpeg_progressive,
        )

        for shape in [(8, 8), (16, 24), (13, 21), (64, 64)]:
            img = _rng(41).integers(0, 256, shape, dtype=np.uint8)
            seq = decode_jpeg(encode_jpeg_gray(img))
            pro = decode_jpeg(encode_jpeg_progressive(img))
            assert np.array_equal(seq, pro), shape

    def test_color_progressive_matches_sequential(self):
        from cassandra_pmem_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg_color,
            encode_jpeg_progressive,
        )

        # includes non-MCU-aligned dims: the AC scans cover only the true
        # component grid while DC scans cover the padded MCU grid
        for shape in [(32, 48, 3), (19, 27, 3), (40, 56, 3), (17, 23, 3)]:
            img = _rng(43).integers(0, 256, shape, dtype=np.uint8)
            for sub in (True, False):
                seq = decode_jpeg(encode_jpeg_color(img, subsample=sub))
                pro = decode_jpeg(encode_jpeg_progressive(img, subsample=sub))
                assert np.array_equal(seq, pro), (shape, sub)

    def test_sof2_marker_and_multiscan_layout(self):
        from cassandra_pmem_spark.pipeline.jpeg import encode_jpeg_progressive

        enc = encode_jpeg_progressive(_rng(44).integers(0, 256, (16, 16), np.uint8))
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
        assert enc.count(b"\xff\xda") == 4  # DC first + refine, AC first + refine

    def test_exactness_constructions_survive_progressive(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_progressive

        grid = (_rng(45).integers(0, 128, (3, 16), dtype=np.uint8) * 2)
        gray = np.repeat(np.repeat(grid, 8, 0), 8, 1)
        assert np.array_equal(decode_jpeg(encode_jpeg_progressive(gray)), gray)
        rgb = np.stack([gray, gray, gray], axis=-1)
        assert np.array_equal(decode_jpeg(encode_jpeg_progressive(rgb)), rgb)


class TestMp3Mp4Metadata:
    """MP3 frame-header walk (ISO 11172-3 §2.4.1.3) and MP4/ISO-BMFF box
    walk (ISO 14496-12) — metadata only, no audio/video decode."""

    def test_mp3_frame_walk_counts_and_duration(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp3_frames,
            is_mp3,
            mp3_stream_info,
        )

        s = build_mp3_frames(9, kbps=128, rate=44100)
        assert is_mp3(s)
        info = mp3_stream_info(s)
        assert info["frames"] == 9
        assert info["sample_rate"] == 44100
        assert info["bitrate_kbps"] == 128 and info["vbr"] is False
        assert info["duration_ms"] == round(9 * 1152 * 1000 / 44100)

    def test_mp3_vbr_detected_across_mixed_frames(self):
        from cassandra_pmem_spark.pipeline.codecs import build_mp3_frames, mp3_stream_info

        s = build_mp3_frames(3, kbps=128) + build_mp3_frames(2, kbps=192)
        info = mp3_stream_info(s)
        assert info["frames"] == 5 and info["vbr"] is True
        assert info["bitrate_kbps"] == (3 * 128 + 2 * 192) // 5

    def test_mp3_id3v2_tag_skipped(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp3_frames,
            is_mp3,
            mp3_stream_info,
        )

        tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        s = tag + build_mp3_frames(4)
        assert is_mp3(s)
        assert mp3_stream_info(s)["frames"] == 4

    def test_mp3_bad_sync_rejected(self):
        from cassandra_pmem_spark.pipeline.codecs import build_mp3_frames, mp3_stream_info

        s = bytearray(build_mp3_frames(3))
        s[0] = 0x00  # break the first sync word
        with pytest.raises(ValueError, match="sync"):
            mp3_stream_info(bytes(s))

    def test_mp4_box_walk(self):
        from cassandra_pmem_spark.pipeline.codecs import build_mp4_stub, is_mp4, mp4_info

        m = build_mp4_stub(7250, n_tracks=3)
        assert is_mp4(m)
        info = mp4_info(m)
        assert info["duration_ms"] == 7250
        assert info["track_count"] == 3
        assert info["major_brand"] == "isom"
        assert info["top_boxes"] == ["ftyp", "moov"]

    def test_mp4_not_mp4_rejected(self):
        from cassandra_pmem_spark.pipeline.codecs import mp4_info

        with pytest.raises(ValueError):
            mp4_info(b"\x00\x00\x00\x08free")


class TestPngAdam7:
    """Adam7 interlaced PNG (spec §8.2): seven per-pass scanline groups
    scattered onto the sample grid, each pass filtered independently."""

    def test_roundtrip_shapes_and_channels(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_png, encode_png

        for shape in [(8, 8), (13, 21), (1, 1), (2, 3), (7, 1), (1, 9), (33, 47)]:
            for ch in (None, 3, 4):
                s = shape if ch is None else (*shape, ch)
                img = _rng(52).integers(0, 256, s, dtype=np.uint8)
                want = img[:, :, None] if ch is None else img
                dec = decode_png(encode_png(img, interlace=True))
                assert np.array_equal(dec, want), s

    def test_interlace_flag_in_ihdr(self):
        from cassandra_pmem_spark.pipeline.codecs import encode_png

        img = _rng(53).integers(0, 256, (9, 9), dtype=np.uint8)
        plain = encode_png(img)
        inter = encode_png(img, interlace=True)
        # IHDR interlace byte is the 13th payload byte (offset 8+8+12)
        assert plain[8 + 8 + 12] == 0 and inter[8 + 8 + 12] == 1
        assert plain != inter

    def test_interlaced_matches_plain_decode(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_png, encode_png

        img = _rng(54).integers(0, 256, (24, 17, 3), dtype=np.uint8)
        a = decode_png(encode_png(img))
        b = decode_png(encode_png(img, interlace=True))
        assert np.array_equal(a, b)


class TestWavWidths:
    """8/16/24-bit PCM decode (RIFF linear PCM widths)."""

    def _wav(self, width, frames):
        import io as _io
        import wave as _wave

        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(width)
            f.setframerate(8000)
            f.writeframes(frames)
        return buf.getvalue()

    def test_8bit_unsigned_offset(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_wav

        s, rate = decode_wav(self._wav(1, bytes([0, 128, 255])))
        assert rate == 8000
        assert s[:, 0].tolist() == [-1.0, 0.0, 127 / 128]

    def test_24bit_signed(self):
        import struct as _s

        from cassandra_pmem_spark.pipeline.codecs import decode_wav

        vals = [0, 1, -1, 8388607, -8388608]
        frames = b"".join(_s.pack("<i", v)[:3] for v in vals)
        s, _ = decode_wav(self._wav(3, frames))
        assert s[:, 0].tolist() == [v / 8388608.0 for v in vals]

    def test_16bit_unchanged(self):
        import struct as _s

        from cassandra_pmem_spark.pipeline.codecs import decode_wav

        s, _ = decode_wav(self._wav(2, _s.pack("<3h", 0, 16384, -32768)))
        assert s[:, 0].tolist() == [0.0, 0.5, -1.0]


class TestGif:
    """GIF89a codec (pipeline/gif.py): real LZW both directions, animation
    timing, interlace, sub-rectangle compositing, transparency, disposal."""

    def test_single_frame_roundtrip_exact(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif, is_gif

        img = _rng(60).integers(0, 256, (57, 83), dtype=np.uint8)
        blob = encode_gif([img])
        assert is_gif(blob) and blob[:6] == b"GIF89a"
        frames, delays = decode_gif(blob)
        assert len(frames) == 1 and delays == [0]
        for c in range(3):  # achromatic palette: every channel = indices
            assert np.array_equal(frames[0][:, :, c], img)

    def test_lzw_table_growth_and_reset(self):
        # 300x300 random bytes force the code table through every width
        # up to 12 bits and past the 4096-entry CLEAR/reset at least once
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        img = _rng(61).integers(0, 256, (300, 300), dtype=np.uint8)
        frames, _ = decode_gif(encode_gif([img]))
        assert np.array_equal(frames[0][:, :, 0], img)

    def test_lzw_compresses_runs(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        img = np.repeat(np.arange(50, dtype=np.uint8), 2000).reshape(250, 400)
        blob = encode_gif([img])
        assert len(blob) < img.size // 10  # long runs actually compress
        assert np.array_equal(decode_gif(blob)[0][0][:, :, 0], img)

    def test_animation_frames_and_delays(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif, gif_info

        rng = _rng(62)
        imgs = [rng.integers(0, 256, (21, 34), dtype=np.uint8) for _ in range(6)]
        blob = encode_gif(imgs, delays_cs=[5, 10, 15, 20, 25, 30])
        frames, delays = decode_gif(blob)
        assert delays == [5, 10, 15, 20, 25, 30]
        for got, want in zip(frames, imgs):
            assert np.array_equal(got[:, :, 0], want)
        info = gif_info(blob)
        assert info["n_frames"] == 6 and info["duration_cs"] == 105
        assert (info["width"], info["height"]) == (34, 21)

    def test_interlaced_roundtrip(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        for h in (1, 2, 4, 5, 8, 9, 61):
            img = _rng(63).integers(0, 256, (h, 13), dtype=np.uint8)
            frames, _ = decode_gif(encode_gif([img], interlace=True))
            assert np.array_equal(frames[0][:, :, 0], img), h

    def test_subrect_compositing(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        base = np.full((20, 30), 7, np.uint8)
        patch = np.full((5, 6), 200, np.uint8)
        blob = encode_gif([base, patch], offsets=[(0, 0), (10, 8)], screen=(30, 20))
        frames, _ = decode_gif(blob)
        want = base.copy()
        want[8:13, 10:16] = 200
        assert np.array_equal(frames[1][:, :, 0], want)

    def test_transparency_preserves_canvas(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        base = np.full((6, 6), 7, np.uint8)
        over = np.full((6, 6), 99, np.uint8)
        over[2, :] = 42  # the transparent index
        frames, _ = decode_gif(encode_gif([base, over], transparent_index=42))
        want = np.full((6, 6), 99, np.uint8)
        want[2, :] = 7  # transparent row shows the prior canvas
        assert np.array_equal(frames[1][:, :, 0], want)

    def test_disposal_restore_background_and_previous(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        base = np.full((8, 8), 5, np.uint8)
        patch = np.full((3, 3), 200, np.uint8)
        tail = np.full((1, 1), 9, np.uint8)
        # disposal 2: patch rect restores to background (index 0) after frame 2
        frames, _ = decode_gif(
            encode_gif(
                [base, patch, tail],
                offsets=[(0, 0), (2, 2), (7, 7)],
                screen=(8, 8),
                disposals=[0, 2, 0],
            )
        )
        assert frames[1][3, 3, 0] == 200
        assert frames[2][3, 3, 0] == 0  # restored to background color
        # disposal 3: patch rect restores to the PREVIOUS canvas
        frames, _ = decode_gif(
            encode_gif(
                [base, patch, tail],
                offsets=[(0, 0), (2, 2), (7, 7)],
                screen=(8, 8),
                disposals=[0, 3, 0],
            )
        )
        assert frames[1][3, 3, 0] == 200
        assert frames[2][3, 3, 0] == 5  # restored to frame-1 pixel

    def test_custom_palette_maps_rgb(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
        idx = _rng(64).integers(0, 4, (16, 16), dtype=np.uint8)
        frames, _ = decode_gif(encode_gif([idx], palette=pal))
        assert np.array_equal(frames[0], pal[idx])

    def test_rgb_to_indexed_roundtrip_and_limit(self):
        from cassandra_pmem_spark.pipeline.gif import rgb_to_indexed

        pal = np.array([[1, 2, 3], [9, 9, 9]], np.uint8)
        img = pal[_rng(65).integers(0, 2, (10, 10))]
        idx, pal2 = rgb_to_indexed(img)
        assert np.array_equal(pal2[idx], img)
        rng = _rng(66)
        big = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="256-color limit"):
            rgb_to_indexed(big)

    def test_decode_image_dispatch_and_resize(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif
        from cassandra_pmem_spark.pipeline.multimodal import (
            _decode_image,
            _resize_image,
        )

        img = _rng(67).integers(0, 256, (24, 18), dtype=np.uint8)
        blob = encode_gif([img])
        dec = _decode_image(blob)
        assert dec.ndim == 2 and np.array_equal(dec, img)  # achromatic → gray
        out = _resize_image(blob, 9, 12)
        frames, _ = decode_gif(out)
        assert np.array_equal(frames[0][:, :, 0], resize_nearest(img, 9, 12))

    def test_gif_frames_stage(self, spark):
        import pandas as pd

        from cassandra_pmem_spark.pipeline.multimodal import (
            attach_media,
            gif_frames_stage,
        )

        pdf = pd.DataFrame({"doc_id": [1, 2], "blob": [b"abcd", b"hello world"]})
        df = spark.createDataFrame(pdf)
        media = attach_media(df, "blob", "video", "image/gif", "doc_id")
        rows = gif_frames_stage(media, size=4).toPandas()
        # doc 1: L=4 → 4%5+2 = 6 frames; doc 2: L=11 → 11%5+2 = 3 frames
        got = rows.groupby("item_id")["frame_idx"].count().to_dict()
        assert got == {1: 6, 2: 3}
        r = rows[(rows.item_id == 2) & (rows.frame_idx == 1)].iloc[0]
        assert r.min_px == r.max_px == (11 * 7 + 13) % 256
        assert r.delay_cs == 10 and r.width == 4 and r.height == 4


class TestG711Adpcm:
    """G.711 mu-law/A-law companding and IMA ADPCM (codecs.py): canonical
    table anchors, code idempotence, round-trip error bounds, and the
    RIFF walk behind decode_wav_any."""

    def test_g711_table_anchors(self):
        from cassandra_pmem_spark.pipeline.codecs import _ALAW_TABLE, _ULAW_TABLE

        assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124
        assert _ULAW_TABLE[0xFF] == 0
        assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
        assert _ALAW_TABLE.max() == 32256 and _ALAW_TABLE.min() == -32256

    def test_g711_code_idempotence(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            _ALAW_TABLE,
            _ULAW_TABLE,
            _linear_to_alaw,
            _linear_to_ulaw,
        )

        codes = np.arange(256, dtype=np.uint8)
        assert (_linear_to_alaw(_ALAW_TABLE[codes]) == codes).all()
        ru = _linear_to_ulaw(_ULAW_TABLE[codes])
        bad = codes[ru != codes]
        # 0x7F is the canonical negative-zero alias of 0xFF
        assert bad.tolist() == [0x7F]

    def test_g711_roundtrip_error_bound(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            _ALAW_TABLE,
            _ULAW_TABLE,
            _linear_to_alaw,
            _linear_to_ulaw,
        )

        x = _rng(70).integers(-32000, 32000, 5000).astype(np.int16)
        for table, enc in ((_ULAW_TABLE, _linear_to_ulaw), (_ALAW_TABLE, _linear_to_alaw)):
            d = table[enc(x)].astype(np.int64)
            rel = np.abs(d - x) / np.maximum(np.abs(x.astype(np.int64)), 256)
            assert rel.max() < 0.05  # logarithmic quantization bound

    def test_decode_wav_any_g711(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            _ALAW_TABLE,
            _ULAW_TABLE,
            decode_wav_any,
            encode_wav_g711,
        )

        codes = (np.arange(300) % 256).astype(np.uint8)
        for law, tag, table in (("ulaw", 7, _ULAW_TABLE), ("alaw", 6, _ALAW_TABLE)):
            pcm, rate, got = decode_wav_any(encode_wav_g711(codes, 8000, law))
            assert (got, rate, pcm.shape) == (tag, 8000, (300, 1))
            assert np.array_equal(pcm.ravel(), table[codes])

    def test_decode_wav_any_pcm_passthrough(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_wav_any, encode_wav

        pcm, rate, tag = decode_wav_any(encode_wav(np.linspace(-0.5, 0.5, 64), 16000))
        assert tag == 1 and rate == 16000 and pcm.shape == (64, 1)
        assert pcm.dtype == np.int16

    def test_adpcm_zero_nibbles_hold_predictor(self):
        import struct as _s

        from cassandra_pmem_spark.pipeline.codecs import _ima_decode_block

        blk = _s.pack("<hBB", 1234, 0, 0) + b"\x00" * 4
        assert _ima_decode_block(blk).tolist() == [1234] * 9

    def test_adpcm_roundtrip_snr(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_wav_any, encode_wav_adpcm

        t = np.arange(4000)
        sig = (8000 * np.sin(t / 30) + 2000 * np.sin(t / 7)).astype(np.int16)
        dec, rate, tag = decode_wav_any(encode_wav_adpcm(sig, 8000, block_align=256))
        assert tag == 0x11 and rate == 8000
        d = dec.ravel().astype(np.float64)
        s = sig[: len(d)].astype(np.float64)
        snr = 10 * np.log10((s**2).sum() / ((s - d) ** 2).sum())
        assert snr > 25  # 4-bit ADPCM keeps smooth signals within ~26+ dB

    def test_adpcm_index_clamps(self):
        import struct as _s

        from cassandra_pmem_spark.pipeline.codecs import _ima_decode_block

        # nibble 7 (max positive) repeatedly drives the step index to 88
        # without overflow; predictor saturates at int16 max
        blk = _s.pack("<hBB", 30000, 80, 0) + b"\x77" * 16
        out = _ima_decode_block(blk)
        assert out.max() == 32767 and len(out) == 33

    def test_audio_features_real_decode_g711(self, spark):
        import pandas as pd

        from cassandra_pmem_spark.pipeline.codecs import _ULAW_TABLE, encode_wav_g711
        from cassandra_pmem_spark.pipeline.multimodal import (
            attach_media,
            extract_audio_features,
        )

        codes = (np.arange(200) % 256).astype(np.uint8)
        wav = encode_wav_g711(codes, 8000, "ulaw")
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [wav]}))
        media = attach_media(df, "blob", "audio", "audio/wav", "doc_id")
        row = extract_audio_features(media, fake_decode=False).toPandas().iloc[0]
        want = _ULAW_TABLE[codes].astype(np.float64) / 32768.0
        assert row.n_samples == 200
        assert abs(row.rms - float(np.sqrt((want**2).mean()))) < 1e-12


class TestFlac:
    """FLAC codec (pipeline/flac.py — public xiph.org spec): lossless
    round trips across every subframe type, Rice parameters, stereo
    decorrelation modes, CRCs, and the STREAMINFO walk."""

    def test_mono_roundtrip_and_compression(self):
        from cassandra_pmem_spark.pipeline.flac import (
            decode_flac,
            encode_flac,
            is_flac,
        )

        t = np.arange(10000)
        sig = (6000 * np.sin(t / 50) + 1500 * np.sin(t / 11)).astype(np.int16)
        blob = encode_flac(sig, 44100)
        assert is_flac(blob)
        dec, rate = decode_flac(blob)
        assert rate == 44100
        assert np.array_equal(dec.ravel(), sig.astype(np.int64))
        assert len(blob) < len(sig)  # < 50% of the 2-byte PCM

    def test_noise_falls_back_losslessly(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        x = _rng(80).integers(-32768, 32768, 5000).astype(np.int16)
        dec, _ = decode_flac(encode_flac(x, 8000))
        assert np.array_equal(dec.ravel(), x.astype(np.int64))

    def test_constant_subframe(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        x = np.full(3000, -123, np.int16)
        blob = encode_flac(x, 8000)
        assert len(blob) < 200  # constant blocks are a handful of bytes
        dec, _ = decode_flac(blob)
        assert np.array_equal(dec.ravel(), x.astype(np.int64))

    def test_lpc_engages_and_wins(self):
        import cassandra_pmem_spark.pipeline.flac as fl

        rng = _rng(81)
        t = np.arange(20000)
        sig = (
            9000 * np.sin(t / 80) + 3000 * np.sin(t / 13) + rng.normal(0, 50, len(t))
        ).astype(np.int16)
        blob = fl.encode_flac(sig, 44100)
        dec, _ = fl.decode_flac(blob)
        assert np.array_equal(dec.ravel(), sig.astype(np.int64))
        orig = fl._lpc_quantized
        fl._lpc_quantized = lambda *a, **k: None
        try:
            blob_fixed = fl.encode_flac(sig, 44100)
        finally:
            fl._lpc_quantized = orig
        assert len(blob) < len(blob_fixed)  # the LPC tier actually helps

    def test_stereo_modes_roundtrip(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        rng = _rng(82)
        for n in (17, 192, 500, 4096, 9001):
            x = (3000 * np.sin(np.arange(n) / 9) + rng.normal(0, 20, n)).astype(
                np.int16
            )
            st = np.stack([x, (x // 3 + 7).astype(np.int16)], axis=1)
            for mode in ("independent", "mid-side"):
                dec, _ = decode_flac(
                    encode_flac(st, 8000, block_size=192, stereo_mode=mode)
                )
                assert np.array_equal(dec, st.astype(np.int64)), (n, mode)

    def test_partial_blocks_and_tiny_inputs(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        rng = _rng(83)
        for n in (1, 2, 191, 192, 193, 4097):
            x = rng.integers(-1000, 1000, n).astype(np.int16)
            dec, _ = decode_flac(encode_flac(x, 8000, block_size=192))
            assert np.array_equal(dec.ravel(), x.astype(np.int64)), n

    def test_streaminfo_walk(self):
        from cassandra_pmem_spark.pipeline.flac import encode_flac, flac_info

        sig = _rng(84).integers(-100, 100, 7777).astype(np.int16)
        info = flac_info(encode_flac(sig, 22050, block_size=1024))
        assert info["total_samples"] == 7777
        assert info["sample_rate"] == 22050
        assert info["channels"] == 1 and info["bits_per_sample"] == 16
        assert info["min_block"] == info["max_block"] == 1024

    def test_crc_detects_corruption(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        sig = (1000 * np.sin(np.arange(3000) / 20)).astype(np.int16)
        blob = bytearray(encode_flac(sig, 8000))
        blob[-20] ^= 0x40  # flip a bit in the last frame body
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(blob))

    def test_audio_features_real_decode_flac(self, spark):
        import pandas as pd

        from cassandra_pmem_spark.pipeline.flac import encode_flac
        from cassandra_pmem_spark.pipeline.multimodal import (
            attach_media,
            extract_audio_features,
        )

        sig = (2000 * np.sin(np.arange(500) / 15)).astype(np.int16)
        blob = encode_flac(sig, 16000)
        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [blob]}))
        media = attach_media(df, "blob", "audio", "audio/flac", "doc_id")
        row = extract_audio_features(media, fake_decode=False).toPandas().iloc[0]
        want = sig.astype(np.float64) / 32768.0
        assert row.n_samples == 500
        assert abs(row.rms - float(np.sqrt((want**2).mean()))) < 1e-12


class TestMp4SampleTables:
    """ISO-BMFF sample tables (ISO/IEC 14496-12 §8.5-8.7): the
    stts/stsz/stsc/stco composition that locates sample N by file offset."""

    def test_index_retrieves_every_payload(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp4_with_samples,
            mp4_sample_table,
        )

        payloads = [bytes([33 + i % 94]) * ((i * 7) % 50 + 1) for i in range(17)]
        durs = [(i % 3 + 1) * 100 for i in range(17)]
        blob = build_mp4_with_samples(payloads, durs, samples_per_chunk=4)
        table = mp4_sample_table(blob)
        assert len(table) == 17
        dts = 0
        for i, row in enumerate(table):
            assert (row["idx"], row["dts"], row["duration"]) == (i, dts, durs[i])
            assert blob[row["offset"] : row["offset"] + row["size"]] == payloads[i]
            dts += durs[i]

    def test_short_last_chunk_and_single_chunk(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp4_with_samples,
            mp4_sample_table,
        )

        # 6 samples, chunk size 50 → one chunk holds everything
        blob = build_mp4_with_samples([b"zz"] * 6, [10] * 6, samples_per_chunk=50)
        table = mp4_sample_table(blob)
        assert [r["size"] for r in table] == [2] * 6
        assert len({r["offset"] for r in table}) == 6  # distinct back-to-back
        # single sample
        assert len(mp4_sample_table(build_mp4_with_samples([b"a"], [5]))) == 1

    def test_mvhd_duration_agrees_with_stts(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            build_mp4_with_samples,
            mp4_info,
        )

        blob = build_mp4_with_samples([b"x"] * 10, [100] * 10, timescale=1000)
        assert mp4_info(blob)["duration_ms"] == 1000

    def test_missing_tables_raise(self):
        from cassandra_pmem_spark.pipeline.codecs import build_mp4_stub, mp4_sample_table

        with pytest.raises(ValueError, match="sample tables"):
            mp4_sample_table(build_mp4_stub(1000))


class TestCodecProperties:
    """Hypothesis round-trip properties: ANY input must survive the
    lossless codecs bit-exactly — shapes, values, and frame counts the
    example-based tests didn't think of."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _img(draw, st, max_side=40):
        h = draw(st.integers(1, max_side))
        w = draw(st.integers(1, max_side))
        seed = draw(st.integers(0, 2**32 - 1))
        return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def test_gif_any_frame_roundtrips(self, data):
        from hypothesis import strategies as st

        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        img = self._img(data.draw, st)
        interlace = data.draw(st.booleans())
        frames, _ = decode_gif(encode_gif([img], interlace=interlace))
        assert np.array_equal(frames[0][:, :, 0], img)

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def test_gif_any_animation_roundtrips(self, data):
        from hypothesis import strategies as st

        from cassandra_pmem_spark.pipeline.gif import decode_gif, encode_gif

        n = data.draw(st.integers(1, 6))
        seed = data.draw(st.integers(0, 2**32 - 1))
        rng = np.random.default_rng(seed)
        h, w = int(rng.integers(1, 25)), int(rng.integers(1, 25))
        imgs = [rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)]
        delays = [int(d) for d in rng.integers(0, 600, n)]
        frames, out_delays = decode_gif(encode_gif(imgs, delays_cs=delays))
        assert out_delays == delays
        for got, want in zip(frames, imgs):
            assert np.array_equal(got[:, :, 0], want)

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def test_flac_any_signal_roundtrips(self, data):
        from hypothesis import strategies as st

        from cassandra_pmem_spark.pipeline.flac import decode_flac, encode_flac

        seed = data.draw(st.integers(0, 2**32 - 1))
        n = data.draw(st.integers(1, 3000))
        stereo = data.draw(st.booleans())
        mode = data.draw(st.sampled_from(["independent", "mid-side"]))
        block = data.draw(st.sampled_from([192, 256, 1024, 4096]))
        rng = np.random.default_rng(seed)
        kind = data.draw(st.sampled_from(["noise", "smooth", "const", "extreme"]))
        if kind == "noise":
            x = rng.integers(-32768, 32768, n).astype(np.int16)
        elif kind == "smooth":
            x = (8000 * np.sin(np.arange(n) / 23)).astype(np.int16)
        elif kind == "const":
            x = np.full(n, int(rng.integers(-32768, 32768)), np.int16)
        else:
            x = rng.choice(
                np.array([-32768, -32767, -1, 0, 1, 32766, 32767], np.int16), n
            )
        sig = np.stack([x, x[::-1]], axis=1) if stereo else x
        dec, _ = decode_flac(encode_flac(sig, 8000, block_size=block, stereo_mode=mode))
        want = sig.astype(np.int64) if stereo else sig.astype(np.int64)[:, None]
        assert np.array_equal(dec, want)

    @settings(max_examples=20, deadline=None)
    @given(st.data())
    def test_g711_tables_inverse_on_code_points(self, data):
        from hypothesis import strategies as st

        from cassandra_pmem_spark.pipeline.codecs import (
            _ALAW_TABLE,
            _ULAW_TABLE,
            _linear_to_alaw,
            _linear_to_ulaw,
        )

        code = data.draw(st.integers(0, 255))
        assert int(_linear_to_alaw(_ALAW_TABLE[np.array([code])])[0]) == code
        if code != 0x7F:  # negative-zero alias
            assert int(_linear_to_ulaw(_ULAW_TABLE[np.array([code])])[0]) == code


class TestGifDeferredClear:
    """Real-world GIFs keep emitting 12-bit codes with a FULL code table
    instead of sending CLEAR ("deferred clear", permitted by the spec).
    The decoder must stop adding table entries at 4096 or the KwKwK
    bookkeeping drifts and output corrupts silently."""

    @staticmethod
    def _encode_deferred(data: bytes, mcs: int) -> bytes:
        clear = 1 << mcs
        eoi = clear + 1
        out = bytearray()
        acc = 0
        nbits = 0

        def emit(code, width):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        width = mcs + 1
        emit(clear, width)
        w = b""
        for ch in data:
            wk = w + bytes([ch])
            if wk in table:
                w = wk
                continue
            emit(table[w], width)
            if next_code < 4096:  # table full → emit without adding
                table[wk] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            w = bytes([ch])
        if w:
            emit(table[w], width)
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def test_deferred_clear_stream_decodes(self):
        from cassandra_pmem_spark.pipeline.gif import _lzw_decode

        data = _rng(90).integers(0, 256, 60000, dtype=np.uint8).tobytes()
        dec = _lzw_decode(self._encode_deferred(data, 8), 8, len(data))
        assert dec.tobytes() == data


class TestY4m:
    """YUV4MPEG2 uncompressed video (codecs.py): header parse, FRAME
    walk, planar layouts (mono / 444 / 420jpeg)."""

    def test_mono_roundtrip(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            decode_y4m,
            encode_y4m,
            is_y4m,
        )

        fs = [_rng(95).integers(0, 256, (12, 16), dtype=np.uint8) for _ in range(4)]
        blob = encode_y4m(fs, fps=(30, 1), chroma="mono")
        assert is_y4m(blob)
        out, fps, chroma = decode_y4m(blob)
        assert fps == (30, 1) and chroma == "mono" and len(out) == 4
        for a, b in zip(out, fs):
            assert np.array_equal(a, b)

    def test_444_lossless(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_y4m, encode_y4m

        fs = [_rng(96).integers(0, 256, (8, 10, 3), dtype=np.uint8) for _ in range(3)]
        out, _, _ = decode_y4m(encode_y4m(fs, chroma="444"))
        for a, b in zip(out, fs):
            assert np.array_equal(a, b)

    def test_420_y_lossless_uniform_chroma_exact(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_y4m, encode_y4m

        f = np.zeros((8, 8, 3), np.uint8)
        f[:, :, 0] = _rng(97).integers(0, 256, (8, 8))
        f[:, :, 1] = 77
        f[:, :, 2] = 200
        out, _, _ = decode_y4m(encode_y4m([f], chroma="420jpeg"))
        assert np.array_equal(out[0][:, :, 0], f[:, :, 0])
        assert (out[0][:, :, 1] == 77).all() and (out[0][:, :, 2] == 200).all()

    def test_truncated_frame_raises(self):
        from cassandra_pmem_spark.pipeline.codecs import decode_y4m, encode_y4m

        blob = encode_y4m([np.zeros((4, 4), np.uint8)], chroma="mono")
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(blob[:-3])


class TestDecoderRobustness:
    """Corpus-ingest decoders must TERMINATE and raise ValueError (or
    NotImplementedError) on arbitrary garbage — never hang, never
    allocate unboundedly from hostile headers, never leak low-level
    struct/index errors."""

    def _fuzz(self, fn, magic, trials=120, seed=0):
        rng = _rng(seed)
        for _ in range(trials):
            n = int(rng.integers(1, 300))
            payload = magic + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                fn(payload)
            except (ValueError, NotImplementedError, EOFError):
                pass  # the contract

    def test_gif_fuzz_and_bomb_guard(self):
        from cassandra_pmem_spark.pipeline.gif import decode_gif, gif_info

        self._fuzz(decode_gif, b"GIF89a", seed=1)
        self._fuzz(gif_info, b"GIF89a", seed=2)
        # a 6-byte header claiming a 65535x65535 canvas must NOT allocate
        import struct as _s

        bomb = b"GIF89a" + _s.pack("<HH", 65535, 65535) + b"\x00\x00\x00\x3b"
        with pytest.raises(ValueError, match="pixel .*budget|budget"):
            decode_gif(bomb)

    def test_flac_fuzz(self):
        from cassandra_pmem_spark.pipeline.flac import decode_flac, flac_info

        self._fuzz(decode_flac, b"fLaC", seed=3)
        self._fuzz(flac_info, b"fLaC", seed=4)

    def test_container_fuzz(self):
        from cassandra_pmem_spark.pipeline.codecs import (
            decode_wav_any,
            decode_y4m,
            mp3_stream_info,
            mp4_sample_table,
        )
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg
        from cassandra_pmem_spark.sources.warc import parse_warc

        self._fuzz(decode_y4m, b"YUV4MPEG2 ", seed=5)
        self._fuzz(decode_wav_any, b"RIFF", seed=6)
        self._fuzz(mp4_sample_table, b"\x00\x00\x00\x18ftyp", seed=7)
        self._fuzz(decode_jpeg, b"\xff\xd8\xff", seed=8)
        self._fuzz(mp3_stream_info, b"\xff\xfb", seed=9)
        # WARC garbage may legitimately KeyError on a missing
        # Content-Length header — tolerate that one extra type
        rng = _rng(10)
        for _ in range(120):
            n = int(rng.integers(1, 300))
            payload = b"WARC/1.0\r\n" + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                parse_warc(payload)
            except (ValueError, KeyError):
                pass


class TestBlockCompression:
    """LZ4 block / Snappy raw / Deflate + the chunked-CRC32 container
    (the reference's CompressedSequentialWriter layout)."""

    CASES = [
        b"",
        b"a",
        b"abcd",
        b"hello world " * 1000,
        b"abcabcabcabc" * 50,
        b"a" * 37,  # overlapping match (offset < length)
        bytes(range(256)) * 4,  # no matches
    ]

    def test_lz4_round_trip(self):
        from cassandra_pmem_spark.pipeline.compression import (
            lz4_block_compress,
            lz4_block_compress_py,
            lz4_block_decompress,
        )

        for c in self.CASES:
            assert lz4_block_decompress(lz4_block_compress(c), len(c)) == c
            assert lz4_block_decompress(lz4_block_compress_py(c), len(c)) == c

    def test_lz4_arrow_and_py_cross_decode(self):
        # the dispatcher's fast path (pyarrow "lz4_raw") and the Python
        # reference matcher must decode each other's output — both are
        # the same public LZ4 block format
        import pyarrow as pa

        from cassandra_pmem_spark.pipeline.compression import (
            lz4_block_compress_py,
            lz4_block_decompress,
        )

        codec = pa.Codec("lz4_raw")
        for c in self.CASES:
            assert codec.decompress(
                lz4_block_compress_py(c), len(c), asbytes=True
            ) == c
            assert lz4_block_decompress(
                codec.compress(c, asbytes=True), len(c)
            ) == c

    def test_snappy_round_trip(self):
        from cassandra_pmem_spark.pipeline.compression import (
            snappy_compress,
            snappy_decompress,
        )

        for c in self.CASES:
            assert snappy_decompress(snappy_compress(c)) == c

    def test_lz4_end_of_block_rules(self):
        """T.81-style conformance: final sequence is literals-only and
        the last 5 bytes are never produced by a match — decode any
        compressed output byte-for-byte and confirm the tail bytes
        arrive as literals."""
        from cassandra_pmem_spark.pipeline.compression import (
            lz4_block_compress,
        )

        from cassandra_pmem_spark.pipeline.compression import (
            lz4_block_compress_py,
        )

        src = b"ababababababababababababababab"  # highly matchable
        comp = lz4_block_compress_py(src)

        def read_ext(i):  # linear-extension byte run
            v = 0
            while comp[i] == 255:
                v += 255
                i += 1
            return v + comp[i], i + 1

        # walk to the final sequence: its token must have match nibble 0
        i = 0
        last_token = None
        while i < len(comp):
            token = comp[i]
            last_token = token
            i += 1
            ll = token >> 4
            if ll == 15:
                ext, i = read_ext(i)
                ll += ext
            i += ll
            if i >= len(comp):
                break  # literals-only final sequence
            i += 2  # offset
            if token & 15 == 15:
                _, i = read_ext(i)
        assert last_token & 0x0F == 0, "final sequence has a match"

    def test_hypothesis_round_trips(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from cassandra_pmem_spark.pipeline.compression import (
            compress_blob,
            decompress_blob,
        )

        @settings(max_examples=60, deadline=None)
        @given(
            st.binary(max_size=3000),
            st.sampled_from(["lz4", "snappy", "deflate", "bz2", "lzma"]),
        )
        def check(data, algo):
            assert decompress_blob(compress_blob(data, algo, 512)) == data

        check()

    def test_container_multi_chunk_and_info(self):
        from cassandra_pmem_spark.pipeline.compression import (
            blob_info,
            compress_blob,
            decompress_blob,
        )

        data = b"the quick brown fox jumps " * 800  # ~20 KB
        blob = compress_blob(data, "lz4", 4096)
        algo, cl, total, nch = blob_info(blob)
        assert (algo, cl, total, nch) == ("lz4", 4096, len(data), 6)
        assert decompress_blob(blob) == data
        assert len(blob) < len(data) / 3  # repetitive text must shrink

    def test_crc_corruption_detected(self):
        from cassandra_pmem_spark.pipeline.compression import (
            CorruptChunk,
            compress_blob,
            decompress_blob,
        )

        blob = bytearray(compress_blob(b"x" * 5000, "deflate", 1024))
        blob[25] ^= 0x40  # flip a bit inside a compressed chunk
        with pytest.raises(CorruptChunk):
            decompress_blob(bytes(blob))

    def test_snappy_decodes_copy1_and_copy4(self):
        """Decoder must accept element kinds our encoder never emits."""
        from cassandra_pmem_spark.pipeline.compression import (
            snappy_decompress,
        )

        # literal 'abcd', then copy-1: len 4, offset 4
        raw = bytes([8, (3 << 2) | 0]) + b"abcd" + bytes([((4 - 4) << 2) | 1 | 0, 4])
        assert snappy_decompress(raw) == b"abcdabcd"
        # literal 'ab', copy-4: len 2, offset 2 (4-byte LE)
        raw4 = (
            bytes([4, (1 << 2) | 0])
            + b"ab"
            + bytes([((2 - 1) << 2) | 3])
            + (2).to_bytes(4, "little")
        )
        assert snappy_decompress(raw4) == b"abab"


class TestAviMjpeg:
    """RIFF/AVI container + MJPEG frames through the real JPEG codec."""

    def test_uniform_even_frames_bit_exact(self):
        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        frames = [
            np.full((16, 16), ((37 * 5 + i * 7) % 128) * 2, np.uint8)
            for i in range(4)
        ]
        dec, (rate, scale), (w, h) = decode_avi_mjpeg(
            encode_avi_mjpeg(frames, rate=8)
        )
        assert (rate, scale, w, h, len(dec)) == (8, 1, 16, 16, 4)
        for a, b in zip(frames, dec):
            assert (a == b).all()

    def test_lossy_frames_decode_to_right_shape(self):
        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        rng = _rng(3)
        frames = [
            rng.integers(0, 256, (24, 32), dtype=np.uint8) for _ in range(3)
        ]
        dec, _, (w, h) = decode_avi_mjpeg(encode_avi_mjpeg(frames, rate=5))
        assert (w, h) == (32, 24)
        assert [f.shape for f in dec] == [(24, 32)] * 3
        # lossy but close: uniform-ish error bound on random noise is
        # loose; just require the codec didn't collapse the signal
        for a, b in zip(frames, dec):
            assert abs(float(a.mean()) - float(b.mean())) < 16

    def test_idx1_mismatch_rejected(self):
        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        avi = bytearray(
            encode_avi_mjpeg([np.full((8, 8), 100, np.uint8)] * 2, rate=10)
        )
        pos = bytes(avi).rfind(b"idx1")
        avi[pos + 16] ^= 1  # first entry's offset field
        with pytest.raises(ValueError, match="idx1"):
            decode_avi_mjpeg(bytes(avi))

    def test_frame_count_cross_checked_against_avih(self):
        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        avi = bytearray(
            encode_avi_mjpeg([np.full((8, 8), 100, np.uint8)] * 3, rate=10)
        )
        pos = bytes(avi).find(b"avih")
        # dwTotalFrames sits 16 bytes into the avih payload
        avi[pos + 8 + 16] = 9
        with pytest.raises(ValueError, match="declares"):
            decode_avi_mjpeg(bytes(avi))

    def test_not_avi_rejected(self):
        from cassandra_pmem_spark.pipeline.avi import decode_avi_mjpeg

        with pytest.raises(ValueError, match="RIFF"):
            decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


class TestNewDecoderRobustness:
    """AVI and compression-container decoders: same termination/budget
    contract as TestDecoderRobustness."""

    def _fuzz(self, fn, magic, trials=120, seed=0):
        rng = _rng(seed)
        for _ in range(trials):
            n = int(rng.integers(1, 300))
            payload = magic + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                fn(payload)
            except (ValueError, NotImplementedError, EOFError):
                pass

    def test_avi_fuzz(self):
        from cassandra_pmem_spark.pipeline.avi import decode_avi_mjpeg

        self._fuzz(decode_avi_mjpeg, b"RIFF\xff\xff\x00\x00AVI ", seed=11)

    def test_blob_fuzz(self):
        from cassandra_pmem_spark.pipeline.compression import (
            decompress_blob,
            lz4_block_decompress,
            snappy_decompress,
        )

        self._fuzz(decompress_blob, b"CPMC", seed=12)
        self._fuzz(lambda d: lz4_block_decompress(d, 4096), b"", seed=13)
        self._fuzz(snappy_decompress, b"", seed=14)

    def test_blob_declared_size_bomb_guard(self):
        import struct as _s

        from cassandra_pmem_spark.pipeline.compression import (
            CorruptChunk,
            decompress_blob,
        )

        bomb = b"CPMC" + _s.pack("<BIQ", 1, 16384, 1 << 62)
        with pytest.raises(CorruptChunk, match="budget"):
            decompress_blob(bomb)
        zero_chunk = b"CPMC" + _s.pack("<BIQ", 1, 0, 100)
        with pytest.raises(CorruptChunk, match="zero chunk"):
            decompress_blob(zero_chunk)

    def test_jpeg_sof_bomb_guard(self):
        from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg

        # SOI + SOF0 claiming 65535x65535 grayscale
        sof = (
            b"\xff\xd8"
            + b"\xff\xc0\x00\x0b\x08\xff\xff\xff\xff\x01\x01\x11\x00"
        )
        with pytest.raises(ValueError, match="budget"):
            decode_jpeg(sof)

    def test_avi_shared_frame_budget(self):
        import numpy as np

        from cassandra_pmem_spark.pipeline.avi import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        avi = encode_avi_mjpeg(
            [np.full((64, 64), 100, np.uint8)] * 4, rate=10
        )
        with pytest.raises(ValueError, match="budget"):
            decode_avi_mjpeg(avi, max_pixels=3 * 64 * 64)
        assert len(decode_avi_mjpeg(avi, max_pixels=4 * 64 * 64)[0]) == 4


class TestTarWebdataset:
    def test_writer_is_stdlib_readable(self):
        """Spec-validity proof: Python's tarfile must read our shards."""
        import io
        import tarfile

        from cassandra_pmem_spark.sources.tar import build_tar

        t = build_tar([("a.txt", b"hello"), ("b.bin", b"\x00\xff" * 400)])
        tf = tarfile.open(fileobj=io.BytesIO(t))
        assert {m.name for m in tf.getmembers()} == {"a.txt", "b.bin"}
        assert tf.extractfile("b.bin").read() == b"\x00\xff" * 400

    def test_reader_reads_stdlib_output(self):
        """And the converse: our walker must read tarfile's output."""
        import io
        import tarfile

        from cassandra_pmem_spark.sources.tar import parse_tar

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for name, data in [("x.txt", b"abc"), ("y.json", b"{}")]:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        got = dict(parse_tar(buf.getvalue()))
        assert got == {"x.txt": b"abc", "y.json": b"{}"}

    def test_round_trip_and_grouping(self):
        from cassandra_pmem_spark.sources.tar import (
            build_tar,
            group_samples,
            parse_tar,
        )

        members = [
            ("000001.txt", b"t1"),
            ("000001.json", b"{}"),
            ("000002.txt", b"t2"),
            ("dir/000002.cls", b"7"),
        ]
        g = group_samples(parse_tar(build_tar(members)))
        assert g["000001"] == {"txt": b"t1", "json": b"{}"}
        assert g["000002"] == {"txt": b"t2", "cls": b"7"}

    def test_checksum_mismatch_rejected(self):
        from cassandra_pmem_spark.sources.tar import build_tar, parse_tar

        t = bytearray(build_tar([("a.txt", b"hello")]))
        t[0] ^= 1  # damage the name; checksum now wrong
        with pytest.raises(ValueError, match="checksum"):
            parse_tar(bytes(t))

    def test_truncation_and_budget(self):
        from cassandra_pmem_spark.sources.tar import build_tar, parse_tar

        t = build_tar([("a.txt", b"x" * 5000)])
        with pytest.raises(ValueError, match="truncated|terminator"):
            parse_tar(t[: 512 + 100])
        with pytest.raises(ValueError, match="budget"):
            parse_tar(t, max_output=1000)


class TestMpegAudioLayer1:
    """ISO 11172-3 Layer I bit-level round trips (pipeline/mpeg_audio.py)."""

    def test_roundtrip_exact(self):
        from cassandra_pmem_spark.pipeline.mpeg_audio import (
            build_mp1_frame,
            decode_mp1,
        )

        codes = {
            0: (2, 0, [0, 1, 2] * 4),
            3: (4, 6, [(i * 5) % 15 for i in range(12)]),
            17: (15, 12, [(i * 999) % 32766 for i in range(12)]),
        }
        stream = build_mp1_frame(codes) + build_mp1_frame({1: (3, 3, [5] * 12)})
        recs = decode_mp1(stream)
        assert [(r["frame"], r["subband"], r["nb"], r["sf_idx"]) for r in recs] == [
            (0, 0, 2, 0), (0, 3, 4, 6), (0, 17, 15, 12), (1, 1, 3, 3),
        ]
        # numerator = 2^nb * (c - 2^(nb-1) + 1), per coded value
        r0 = recs[0]
        assert r0["samples"] == [4 * (c - 2 + 1) for c in codes[0][2]]
        r17 = recs[2]
        assert r17["samples"] == [
            (1 << 15) * (c - (1 << 14) + 1) for c in codes[17][2]
        ]

    def test_frame_length_formula(self):
        from cassandra_pmem_spark.pipeline.mpeg_audio import build_mp1_frame

        # 96 kbit/s @ 32 kHz -> 12*96000/32000 = 36 slots * 4 = 144 bytes
        assert len(build_mp1_frame({0: (2, 0, [0] * 12)})) == 144
        # 128 kbit/s @ 48 kHz -> 12*128000/48000 = 32 slots = 128 bytes
        assert len(
            build_mp1_frame({0: (2, 0, [0] * 12)}, bitrate_idx=4, sr_idx=1)
        ) == 128

    def test_lost_sync_raises(self):
        from cassandra_pmem_spark.pipeline.mpeg_audio import decode_mp1

        with pytest.raises(ValueError, match="lost sync"):
            decode_mp1(b"\x00\x00\x00\x00")

    def test_layer2_frames_rejected(self):
        from cassandra_pmem_spark.pipeline.mpeg_audio import decode_mp1

        # header with layer bits = 10 (Layer II)
        h = (0xFFF << 20) | (1 << 19) | (0b10 << 17) | (1 << 16) | (3 << 12) | (2 << 10)
        with pytest.raises(NotImplementedError, match="Layer I"):
            decode_mp1(h.to_bytes(4, "big") + b"\x00" * 140)

    def test_matrixing_formula(self):
        import math

        from cassandra_pmem_spark.pipeline.mpeg_audio import synthesis_matrix

        assert synthesis_matrix(16, 0) == pytest.approx(math.cos(math.pi / 2))
        assert synthesis_matrix(0, 0) == pytest.approx(math.cos(16 * math.pi / 64))


class TestCrc16Vectorized:
    """The frame CRC-16 was half of encode_flac's wall time; the
    tree-reduction form must stay byte-exact vs the per-byte table loop
    (FLAC frame CRC, poly 0x8005, zero init)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=5000))
    def test_matches_scalar_property(self, data):
        from cassandra_pmem_spark.pipeline.flac import _crc16, _crc16_scalar

        assert _crc16(data) == _crc16_scalar(data)

    def test_boundary_lengths(self):
        from cassandra_pmem_spark.pipeline.flac import _crc16, _crc16_scalar

        import os as _os

        for n in (0, 1, 63, 64, 65, 127, 128, 255, 256, 4095, 4096, 4097):
            d = _os.urandom(n)
            assert _crc16(d) == _crc16_scalar(d), n

    def test_known_vector(self):
        # CRC-16/BUYPASS ('123456789' -> 0xFEE8): poly 0x8005, init 0,
        # no reflection — the FLAC frame CRC parameters
        from cassandra_pmem_spark.pipeline.flac import _crc16_scalar

        assert _crc16_scalar(b"123456789") == 0xFEE8
