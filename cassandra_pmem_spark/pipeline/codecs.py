"""Pure-stdlib media codecs: PNG and WAV, no external libraries.

The container has no Pillow/soundfile/ffmpeg and installs are off-limits,
but two canonical formats are fully decodable with the standard library:

- PNG (8-bit gray/RGB/RGBA/palette, non-interlaced): zlib inflate +
  per-row unfilter (spec filters 0-4) — the whole format is stdlib zlib
  plus struct arithmetic;
- WAV (16-bit PCM): the stdlib ``wave`` module.

These back the REAL decode path in multimodal.py, together with the
baseline JPEG codec in pipeline/jpeg.py (T.81 Huffman+DCT, grayscale
and 4:2:0/4:4:4 YCbCr color, also library-free); formats that genuinely
require codec libraries (MP3, H.264, …) remain
clearly-marked NotImplementedError stubs. Encoders exist so tests and
fixtures round-trip without any external tool.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py), one image per row; the unfilter loop for filters 1/3/4
is per-pixel Python — adequate for fixture-sized images and tests. The
production swap-in is a vectorized decoder behind the same function
signatures; the batch plumbing does not change.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


def _corrupt_guard(fmt):
    """Normalize low-level slicing/unpack errors on corrupt input to
    ValueError — callers (Arrow ingest stages) branch on ValueError."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (struct.error, IndexError) as e:
                raise ValueError(f"corrupt {fmt} stream: {e}") from e

        return inner

    return deco

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter(raw: bytes, p: int, rows: int, stride: int, ch: int) -> tuple[np.ndarray, int]:
    """Reverse the per-row PNG filters (spec filters 0-4) for one scanline
    group; returns ((rows, stride) uint16 array, new offset)."""
    out = np.empty((rows, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(rows):
        f = raw[p]
        p += 1
        line = np.frombuffer(raw[p : p + stride], np.uint8).astype(np.uint16)
        p += stride
        if f == 0:
            cur = line
        elif f == 2:  # up
            cur = (line + prev) & 0xFF
        elif f == 1:  # sub
            cur = line
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif f == 3:  # average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    return out, p


@_corrupt_guard("PNG")
def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (h, w, channels). Supports bit depth 8,
    color types 0/2/3/4/6, both non-interlaced and Adam7-interlaced
    streams (each of the seven passes is its own filtered scanline group
    scattered onto the sample grid — spec §8.2); everything else raises."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, idat, palette = 8, [], None
    w = h = bit = color = interlace = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + crc
        if typ == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (got bit depth {bit})")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    ch = _COLOR_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))

    if interlace == 0:
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        out, _ = _unfilter(raw, 0, h, stride, ch)
        img = out.astype(np.uint8).reshape(h, w, ch)
    else:
        img = np.zeros((h, w, ch), np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no scanlines
            rows, p = _unfilter(raw, p, ph, pw * ch, ch)
            pass_img = rows.astype(np.uint8).reshape(ph, pw, ch)
            img[y0::dy, x0::dx] = pass_img
        if p != len(raw):
            raise ValueError("PNG data length mismatch")

    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[..., 0]]
    return img


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w[, channels]) → PNG bytes (filter 0 rows). With
    interlace=True, emit the seven Adam7 passes (spec §8.2) — each pass
    its own scanline group over the subsampled grid."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts += [b"\x00" + np.ascontiguousarray(sub[y]).tobytes() for y in range(sub.shape[0])]
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, library-free)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV → (samples float64 in [-1, 1) shaped (n, channels), rate).
    8-bit (unsigned, offset-128), 16-bit, and 24-bit PCM — the widths
    the RIFF/PCM spec defines for linear integer samples."""
    with wave.open(io.BytesIO(data), "rb") as f:
        width = f.getsampwidth()
        nch, rate, n = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        # 8-bit PCM is UNSIGNED with the zero level at 128
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 3:
        # 24-bit little-endian: widen to int32 via a zero pad byte, then
        # arithmetic-shift the sign into place
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((b.shape[0], 4), np.uint8)
        padded[:, 1:] = b
        pcm = (padded.view("<i4").ravel() >> 8).astype(np.float64) / 8388608.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM WAV not supported")
    return pcm.reshape(-1, nch), rate


# -- compressed WAV: G.711 mu-law / A-law and IMA ADPCM ----------------------
#
# ITU-T G.711 (1972/1988, public): 8-bit logarithmic companding, the
# telephony formats RIFF registers as wFormatTag 7 (mu-law) and 6 (A-law).
# IMA/DVI ADPCM (IMA Digital Audio Focus Group, 1992, public): 4-bit
# adaptive differential PCM, RIFF wFormatTag 0x11, block-structured with a
# (predictor, step index) header per channel per block. Python's stdlib
# `wave` module refuses non-PCM data, so these paths parse RIFF directly.


def _riff_chunks(data: bytes) -> dict[bytes, bytes]:
    """RIFF/WAVE container walk → {chunk id: payload} (first occurrence)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = np.frombuffer(data[pos + 4 : pos + 8], "<u4")
        body = data[pos + 8 : pos + 8 + int(size)]
        out.setdefault(cid, body)
        pos += 8 + int(size) + (int(size) & 1)  # chunks are word-aligned
    return out


def _ulaw_decode_table() -> np.ndarray:
    """G.711 mu-law byte → linear int16 (the canonical +-32124 table)."""
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 (the canonical +-32256 table:
    even bits inverted by XOR 0x55; segment 0 adds 8, segment 1 adds
    0x108, higher segments shift — sign bit SET means positive)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a >> 4) & 7
    mant = (a & 0x0F) << 4
    mag = np.where(seg == 0, mant + 8, (mant + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()


def _linear_to_ulaw(pcm: np.ndarray) -> np.ndarray:
    """int16 → G.711 mu-law bytes (vectorized segment search)."""
    x = np.asarray(pcm, np.int64)
    sign = x < 0
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int64) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    code = ~((exp << 4) | mant) & 0xFF
    return np.where(sign, code & 0x7F, code | 0x80).astype(np.uint8)


def _linear_to_alaw(pcm: np.ndarray) -> np.ndarray:
    """int16 → G.711 A-law bytes (13-bit segment search, per the
    canonical public-domain companding algorithm)."""
    x = np.asarray(pcm, np.int64) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    bounds = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.searchsorted(bounds, x, side="left")
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 1, seg_c)
    code = (seg_c << 4) | ((x >> shift) & 0x0F)
    code = np.where(seg >= 8, 0x7F, code)
    return (code ^ mask).astype(np.uint8)


_IMA_STEPS = np.array(
    # the 89-entry IMA step-size table (IMA ADPCM reference, public)
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64,
)
_IMA_INDEX_DELTA = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_block(block: bytes) -> np.ndarray:
    """One mono IMA ADPCM block → int16 samples (header sample + nibbles)."""
    pred = int(np.frombuffer(block[:2], "<i2")[0])
    index = min(max(block[2], 0), 88)
    out = [pred]
    nibbles = np.frombuffer(block[4:], np.uint8)
    for byte in nibbles:
        for nib in (byte & 0x0F, byte >> 4):
            step = int(_IMA_STEPS[index])
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = min(max(index + int(_IMA_INDEX_DELTA[nib & 7]), 0), 88)
            out.append(pred)
    return np.asarray(out, np.int16)


def _ima_encode_block(pcm: np.ndarray, index: int = 0) -> bytes:
    """int16 samples → one mono IMA ADPCM block (first sample verbatim)."""
    pred = int(pcm[0])
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibbles = []
    for s in np.asarray(pcm[1:], np.int64):
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        diff = step >> 3
        if delta >= step:
            nib |= 4
            delta -= step
            diff += step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
            diff += step >> 1
        if delta >= step >> 2:
            nib |= 1
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = min(max(index + int(_IMA_INDEX_DELTA[nib & 7]), 0), 88)
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


@_corrupt_guard("WAV")
def decode_wav_any(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV of ANY supported format → (int16 PCM (n, ch), rate, format tag).

    Formats: 1 (linear PCM 8/16/24-bit, via decode_wav), 6 (G.711 A-law),
    7 (G.711 mu-law), 0x11 (IMA ADPCM, mono). Compressed paths parse the
    RIFF container directly — stdlib `wave` rejects them."""
    chunks = _riff_chunks(data)
    fmt = chunks.get(b"fmt ")
    if fmt is None or b"data" not in chunks:
        raise ValueError("WAV missing fmt/data chunk")
    tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    body = chunks[b"data"]
    if tag == 1:
        pcm, rate2 = decode_wav(data)
        return (np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16), rate2, tag)
    if tag in (6, 7):
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        pcm = table[np.frombuffer(body, np.uint8)]
        return pcm.reshape(-1, nch), rate, tag
    if tag == 0x11:
        if nch != 1:
            raise NotImplementedError("IMA ADPCM decode is mono-only here")
        block_align = struct.unpack_from("<H", fmt, 12)[0]
        blocks = [
            _ima_decode_block(body[i : i + block_align])
            for i in range(0, len(body) - block_align + 1, block_align)
        ]
        pcm = np.concatenate(blocks) if blocks else np.zeros(0, np.int16)
        return pcm.reshape(-1, 1), rate, tag
    raise NotImplementedError(f"WAV format tag {tag} not supported")


def _wav_container(tag: int, nch: int, rate: int, bits: int, block_align: int,
                   body: bytes, extra: bytes = b"") -> bytes:
    fmt = struct.pack(
        "<HHIIHH", tag, nch, rate, rate * block_align // max(block_align, 1),
        block_align, bits,
    ) + extra
    out = bytearray(b"RIFF\x00\x00\x00\x00WAVEfmt ")
    out.extend(struct.pack("<I", len(fmt)))
    out.extend(fmt)
    out.extend(b"data" + struct.pack("<I", len(body)))
    out.extend(body)
    if len(body) & 1:
        out.append(0)
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def encode_wav_g711(codes: np.ndarray, rate: int, law: str = "ulaw") -> bytes:
    """Raw G.711 code bytes → mono WAV (format tag 7 mu-law / 6 A-law)."""
    body = np.asarray(codes, np.uint8).tobytes()
    tag = 7 if law == "ulaw" else 6
    return _wav_container(tag, 1, rate, 8, 1, body)


def encode_wav_adpcm(pcm: np.ndarray, rate: int, block_align: int = 8) -> bytes:
    """int16 mono samples → IMA ADPCM WAV (format tag 0x11).

    Each block holds 1 + (block_align - 4) * 2 samples; the trailing
    partial block is dropped (standard encoder behavior)."""
    per_block = 1 + (block_align - 4) * 2
    x = np.asarray(pcm, np.int16).ravel()
    body = bytearray()
    for i in range(0, len(x) - per_block + 1, per_block):
        body.extend(_ima_encode_block(x[i : i + per_block]))
    extra = struct.pack("<HH", 2, per_block)  # cbSize, samples per block
    return _wav_container(0x11, 1, rate, 4, block_align, bytes(body), extra)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float in [-1, 1) shaped (n[, channels]) → 16-bit PCM WAV bytes."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# -- MP3 frame-header walk (metadata only, no audio decode) -------------------
#
# ISO/IEC 11172-3 §2.4.1.3 (MPEG-1) / 13818-3 (MPEG-2, 2.5 extension):
# a Layer III stream is a sequence of frames, each starting with a 4-byte
# header (11-bit sync, version, layer, bitrate index, sample-rate index,
# padding bit). Frame byte length and samples-per-frame follow from the
# header alone, so duration/bitrate are computable WITHOUT decoding —
# the metadata path a 100 TB pipeline actually runs. The audio decode
# itself (Huffman + IMDCT + synthesis filterbank) remains a documented
# stub (needs no external lib in principle, but is out of scope).

_MP3_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
# version field (2 bits): 0 = MPEG-2.5, 2 = MPEG-2, 3 = MPEG-1
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_skip_id3(data: bytes) -> int:
    """Offset past an ID3v2 tag (syncsafe 28-bit size at bytes 6..9)."""
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            ((data[6] & 0x7F) << 21)
            | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7)
            | (data[9] & 0x7F)
        )
        return 10 + size
    return 0


def is_mp3(data: bytes) -> bool:
    p = _mp3_skip_id3(data)
    return (
        len(data) >= p + 4
        and data[p] == 0xFF
        and (data[p + 1] & 0xE0) == 0xE0
        and (data[p + 1] >> 1) & 0x3 == 0x1  # layer III
    )


@_corrupt_guard("MP3")
def mp3_stream_info(data: bytes) -> dict:
    """Walk every frame header: returns {frames, sample_rate, duration_ms,
    bitrate_kbps (mean), vbr}. Raises on a malformed stream."""
    pos = _mp3_skip_id3(data)
    frames = 0
    total_ms = 0.0
    bitrates: set[int] = set()
    bitrate_sum = 0
    rate = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        version = (data[pos + 1] >> 3) & 0x3
        layer = (data[pos + 1] >> 1) & 0x3
        if version == 1 or layer != 0x1:
            raise ValueError("not a Layer III frame header")
        bidx = data[pos + 2] >> 4
        ridx = (data[pos + 2] >> 2) & 0x3
        pad = (data[pos + 2] >> 1) & 0x1
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free-format/invalid bitrate or bad sample-rate index")
        v1 = version == 3
        kbps = (_MP3_BITRATES_V1_L3 if v1 else _MP3_BITRATES_V2_L3)[bidx]
        rate = _MP3_RATES[version][ridx]
        spf = 1152 if v1 else 576  # samples per Layer III frame
        flen = (spf // 8) * kbps * 1000 // rate + pad
        frames += 1
        total_ms += spf * 1000.0 / rate
        bitrates.add(kbps)
        bitrate_sum += kbps
        pos += flen
    if frames == 0:
        raise ValueError("no MP3 frames")
    return {
        "frames": frames,
        "sample_rate": rate,
        "duration_ms": int(round(total_ms)),
        "bitrate_kbps": bitrate_sum // frames,
        "vbr": len(bitrates) > 1,
    }


def build_mp3_frames(
    n_frames: int, kbps: int = 128, rate: int = 44100, fill: int = 0x55
) -> bytes:
    """Deterministic fixture builder: n valid MPEG-1 Layer III frame
    headers with constant-fill payloads (valid STRUCTURE, silent garbage
    audio — this is a header-walk fixture, not an encoder)."""
    bidx = _MP3_BITRATES_V1_L3.index(kbps)
    ridx = (44100, 48000, 32000).index(rate)
    hdr = bytes([0xFF, 0xFB, (bidx << 4) | (ridx << 2), 0x00])
    flen = 144 * kbps * 1000 // rate
    return (hdr + bytes([fill]) * (flen - 4)) * n_frames


# -- MP4 / ISO BMFF box walk (metadata only) ----------------------------------
#
# ISO/IEC 14496-12: an MP4 file is a tree of length-prefixed boxes.
# Duration and track count live in moov/mvhd and moov/trak — a pure
# structural walk, no codec anywhere. Frame/sample DECODE (H.264 etc.)
# remains a documented stub.


def is_mp4(data: bytes) -> bool:
    return len(data) >= 8 and data[4:8] == b"ftyp"


def _mp4_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing scope
        if size < hdr or pos + size > end:
            raise ValueError(f"bad MP4 box size at {pos}")
        yield typ, pos + hdr, pos + size
        pos += size


@_corrupt_guard("MP4")
def mp4_info(data: bytes) -> dict:
    """{major_brand, timescale, duration_ms, track_count, top_boxes}."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (missing ftyp)")
    major = None
    timescale = duration = None
    tracks = 0
    top = []
    for typ, body, bend in _mp4_boxes(data, 0, len(data)):
        top.append(typ.decode("latin1"))
        if typ == b"ftyp":
            major = data[body : body + 4].decode("latin1")
        elif typ == b"moov":
            for btyp, b2, e2 in _mp4_boxes(data, body, bend):
                if btyp == b"mvhd":
                    ver = data[b2]
                    if ver == 1:
                        timescale = struct.unpack(">I", data[b2 + 20 : b2 + 24])[0]
                        duration = struct.unpack(">Q", data[b2 + 24 : b2 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", data[b2 + 12 : b2 + 16])[0]
                        duration = struct.unpack(">I", data[b2 + 16 : b2 + 20])[0]
                elif btyp == b"trak":
                    tracks += 1
    if timescale is None:
        raise ValueError("MP4 missing moov/mvhd")
    return {
        "major_brand": major,
        "timescale": timescale,
        "duration_ms": int(round(duration * 1000.0 / timescale)),
        "track_count": tracks,
        "top_boxes": top,
    }


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def build_mp4_with_samples(
    payloads: list[bytes],
    durations: list[int],
    timescale: int = 1000,
    samples_per_chunk: int = 4,
) -> bytes:
    """Deterministic ISO-BMFF fixture with REAL sample tables: per-sample
    payloads land in an mdat box, and the stbl machinery — stts (run-
    length time-to-sample), stsz (sizes), stsc (sample-to-chunk runs),
    stco (absolute chunk offsets) — indexes them exactly as a camera/mux
    writes them. The last chunk may be short (the spec's implicit rule:
    chunk count comes from stco, trailing samples fill the final chunk)."""
    n = len(payloads)
    sizes = [len(p) for p in payloads]

    # stts: run-length encode the duration sequence
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _mp4_box(
        b"stts",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsz = _mp4_box(
        b"stsz",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, n)  # sample_size 0 → per-sample table
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = _mp4_box(
        b"stsc",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 1)
        + struct.pack(">III", 1, samples_per_chunk, 1),
    )
    n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk

    # chunk offsets are absolute file offsets — computed once the sizes
    # of everything before mdat's payload are known, so assemble moov
    # with a placeholder stco first to learn its length
    def assemble(chunk_offsets: list[int]) -> bytes:
        stco = _mp4_box(
            b"stco",
            b"\x00\x00\x00\x00"
            + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl = _mp4_box(b"stbl", stts + stsz + stsc + stco)
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, sum(durations))
            + struct.pack(">HH", 0x55C4, 0),
        )
        mdia = _mp4_box(b"mdia", mdhd + _mp4_box(b"minf", stbl))
        dur = sum(durations)
        mvhd = _mp4_box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + b"\x00" * 80,
        )
        moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", mdia))
        return moov

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov_len = len(assemble([0] * n_chunks))
    mdat_payload_start = len(ftyp) + moov_len + 8  # mdat header is 8 bytes
    offsets = []
    pos = mdat_payload_start
    for k in range(n_chunks):
        offsets.append(pos)
        for s in sizes[k * samples_per_chunk : (k + 1) * samples_per_chunk]:
            pos += s
    moov = assemble(offsets)
    assert len(moov) == moov_len
    return ftyp + moov + _mp4_box(b"mdat", b"".join(payloads))


@_corrupt_guard("MP4")
def mp4_sample_table(data: bytes) -> list[dict]:
    """Walk the first track's stbl and compose the REAL per-sample index:
    [{idx, dts, duration, size, offset}] with absolute file offsets —
    the stts/stsz/stsc/stco composition every video pipeline runs to
    fetch sample N without decoding anything (ISO/IEC 14496-12 §8.5-8.7).
    Chunk k's samples sit back-to-back from its stco offset; the stsc
    run table maps chunks to samples-per-chunk with the final chunk
    absorbing the remainder."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (missing ftyp)")
    stts = stsz = stsc = stco = None

    def walk(start: int, end: int, path: tuple = ()) -> None:
        nonlocal stts, stsz, stsc, stco
        for typ, body, bend in _mp4_boxes(data, start, end):
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                if not (typ == b"trak" and stco is not None):  # first track only
                    walk(body, bend, path + (typ,))
            elif typ == b"stts" and stts is None:
                (cnt,) = struct.unpack(">I", data[body + 4 : body + 8])
                stts = [
                    struct.unpack(">II", data[body + 8 + 8 * i : body + 16 + 8 * i])
                    for i in range(cnt)
                ]
            elif typ == b"stsz" and stsz is None:
                fixed, cnt = struct.unpack(">II", data[body + 4 : body + 12])
                if fixed:
                    stsz = [fixed] * cnt
                else:
                    stsz = [
                        struct.unpack(">I", data[body + 12 + 4 * i : body + 16 + 4 * i])[0]
                        for i in range(cnt)
                    ]
            elif typ == b"stsc" and stsc is None:
                (cnt,) = struct.unpack(">I", data[body + 4 : body + 8])
                stsc = [
                    struct.unpack(">III", data[body + 8 + 12 * i : body + 20 + 12 * i])
                    for i in range(cnt)
                ]
            elif typ in (b"stco", b"co64") and stco is None:
                (cnt,) = struct.unpack(">I", data[body + 4 : body + 8])
                w, fmt = (4, ">I") if typ == b"stco" else (8, ">Q")
                stco = [
                    struct.unpack(fmt, data[body + 8 + w * i : body + 8 + w * (i + 1)])[0]
                    for i in range(cnt)
                ]

    walk(0, len(data))
    if None in (stts, stsz, stsc, stco):
        raise ValueError("MP4 missing sample tables (stts/stsz/stsc/stco)")

    durations: list[int] = []
    for cnt, delta in stts:
        durations.extend([delta] * cnt)
    n = len(stsz)
    if len(durations) != n:
        raise ValueError("stts/stsz sample count mismatch")

    # chunk k (1-based) uses the stsc run with the largest first_chunk <= k
    out = []
    dts = 0
    sample = 0
    for k, chunk_off in enumerate(stco, start=1):
        spc = None
        for first, per, _desc in stsc:
            if first <= k:
                spc = per
            else:
                break
        off = chunk_off
        for _ in range(min(spc, n - sample)):
            out.append(
                {
                    "idx": sample,
                    "dts": dts,
                    "duration": durations[sample],
                    "size": stsz[sample],
                    "offset": off,
                }
            )
            dts += durations[sample]
            off += stsz[sample]
            sample += 1
    if sample != n:
        raise ValueError("stco chunks do not cover all samples")
    return out


# -- Y4M (YUV4MPEG2) uncompressed video ---------------------------------------
#
# The interchange format video tools exchange raw frames in (public,
# documented with the mjpegtools distribution): an ASCII stream header
# "YUV4MPEG2 W.. H.. F<num>:<den> ... C<space>" then per frame a "FRAME\n"
# marker followed by planar YUV bytes. Supported here: Cmono (Y only),
# C444 (3 full planes), C420jpeg (2x2-subsampled chroma).


def is_y4m(data: bytes) -> bool:
    return data.startswith(b"YUV4MPEG2 ")


def encode_y4m(
    frames: "list[np.ndarray]", fps: tuple[int, int] = (25, 1), chroma: str = "mono"
) -> bytes:
    """Y frames (h, w) [mono] or YUV frames (h, w, 3) [444/420] → Y4M."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A0:0 C{chroma}\n".encode()
    )
    for f in frames:
        f = np.asarray(f, np.uint8)
        out.extend(b"FRAME\n")
        if chroma == "mono":
            out.extend(np.ascontiguousarray(f[:, :, 0] if f.ndim == 3 else f).tobytes())
        elif chroma == "444":
            for c in range(3):
                out.extend(np.ascontiguousarray(f[:, :, c]).tobytes())
        elif chroma == "420jpeg":
            out.extend(np.ascontiguousarray(f[:, :, 0]).tobytes())
            for c in (1, 2):
                sub = f[:, :, c].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
                out.extend(np.round(sub).astype(np.uint8).tobytes())
        else:
            raise ValueError(f"unsupported chroma mode {chroma}")
    return bytes(out)


@_corrupt_guard("Y4M")
def decode_y4m(data: bytes) -> tuple["list[np.ndarray]", tuple[int, int], str]:
    """Y4M → (frames, (fps_num, fps_den), chroma). Mono frames are (h, w);
    444/420 frames are (h, w, 3) with chroma upsampled (nearest)."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream")
    nl = data.index(b"\n")
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"
    for tok in data[10:nl].decode().split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            a, b = tok[1:].split(":")
            fps = (int(a), int(b))
        elif tok[0] == "C":
            chroma = tok[1:]
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma == "mono":
        fsize, planes = w * h, 1
    elif chroma == "444":
        fsize, planes = 3 * w * h, 3
    elif chroma.startswith("420"):
        fsize, planes = w * h + 2 * (w // 2) * (h // 2), 3
    else:
        raise NotImplementedError(f"chroma mode {chroma}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("missing FRAME marker")
        body = data[fnl + 1 : fnl + 1 + fsize]
        if len(body) != fsize:
            raise ValueError("truncated Y4M frame")
        y = np.frombuffer(body[: w * h], np.uint8).reshape(h, w)
        if planes == 1:
            frames.append(y)
        elif chroma == "444":
            u = np.frombuffer(body[w * h : 2 * w * h], np.uint8).reshape(h, w)
            v = np.frombuffer(body[2 * w * h :], np.uint8).reshape(h, w)
            frames.append(np.stack([y, u, v], axis=-1))
        else:
            cw, ch = w // 2, h // 2
            u = np.frombuffer(body[w * h : w * h + cw * ch], np.uint8).reshape(ch, cw)
            v = np.frombuffer(body[w * h + cw * ch :], np.uint8).reshape(ch, cw)
            up = lambda p: np.repeat(np.repeat(p, 2, axis=0), 2, axis=1)
            frames.append(np.stack([y, up(u), up(v)], axis=-1))
        pos = fnl + 1 + fsize
    return frames, fps, chroma


def build_mp4_stub(duration_ms: int, n_tracks: int = 1, timescale: int = 1000) -> bytes:
    """Deterministic fixture builder: minimal ftyp+moov(mvhd+trak...)
    structure with a valid box tree and mvhd timing (no media data)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,  # rate/volume/matrix/next-track (zeroed)
    )
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks)
