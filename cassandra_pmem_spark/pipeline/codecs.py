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

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array of shape (h, w, channels). Supports bit depth 8,
    color types 0/2/3/4/6, no Adam7 interlacing (the overwhelmingly common
    subset; everything else raises)."""
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
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if color not in _COLOR_CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = np.empty((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    p = 0
    for y in range(h):
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

    img = out.astype(np.uint8).reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[..., 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (h, w[, channels]) → PNG bytes (filter 0 rows)."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
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
    16-bit PCM only (what ``wave`` reads without codecs)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        nch, rate, n = f.getnchannels(), f.getframerate(), f.getnframes()
        pcm = np.frombuffer(f.readframes(n), dtype="<i2").reshape(-1, nch)
    return pcm.astype(np.float64) / 32768.0, rate


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
