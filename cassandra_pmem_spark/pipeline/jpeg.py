"""Pure-stdlib baseline JPEG codec (grayscale + YCbCr color), no external
libraries.

Implements the ITU-T T.81 baseline sequential DCT process for 8-bit
images using the Annex K example tables: luminance/chrominance
quantization (Tables K.1/K.2) and DC/AC Huffman tables (K.3-K.6). Both
directions are real:

- ``encode_jpeg_gray``: level shift → 8×8 forward DCT (vectorized einsum)
  → quantize → zigzag → DC-differential + run-length Huffman coding with
  0xFF byte stuffing → SOI/DQT/SOF0/DHT/SOS/EOI stream;
- ``encode_jpeg_color``: RGB → BT.601 YCbCr (JFIF full-range), optional
  4:2:0 chroma subsampling (2×2 mean), interleaved MCU entropy coding
  with per-component DC predictors — SOF0 with sampling factors 2,2/1,1
  and separate luma/chroma quant + Huffman tables;
- ``encode_jpeg_progressive``: SOF2 multi-scan encoder (gray or color) —
  interleaved DC first pass + DC refinement, then per-component AC first
  (spectral band 1..63 at Al=1, cross-block EOB runs) and AC refinement
  (correction bits), exercising every progressive decode path;
- ``decode_jpeg``: marker parse (APPn/COM skipped), canonical Huffman
  reconstruction from the DHT bits/values lists, multi-scan entropy
  decode with unstuffing — sequential interleaved MCUs AND the four
  progressive passes (T.81 G.2: DC first/refine, AC first/refine with
  EOB runs and successive approximation) — dequantize → dezigzag → IDCT
  (vectorized) → chroma upsample (sample replication) → YCbCr→RGB.
  Returns (h, w) uint8 for 1-component streams, (h, w, 3) RGB for
  3-component.

Supported subset (everything else raises NotImplementedError with the
reason): sequential SOF0 and progressive SOF2, 8-bit precision, 1 or 3
components with integer subsampling ratios, restart intervals (DRI +
RSTm re-sync with DC-predictor reset, both directions). Arithmetic
coding, 12-bit, hierarchical, and 4-component CMYK streams remain out
of scope — the decoder REALLY decodes conforming grayscale and YCbCr
JPEGs, not just this encoder's output. The tests pin progressive
against sequential: both encoders quantize to the SAME coefficients, so
their decodes must agree pixel-for-pixel.

Exactness note for oracle-backed tests (multimodal_features_jpeg): JPEG is
lossy in general, but an image whose every 8×8 block is a uniform EVEN
value round-trips bit-exactly through these tables: a uniform block has
only a DC coefficient (AC ≈ 1e-13 float noise, quantized to 0), DC =
8·(v−128) is divisible by the DC quant step 16 exactly when v is even,
and the IDCT of a DC-only block is the constant v again. Fixture stages
exploit this (multimodal.jpeg_encode_stage) so DuckDB can recompute the
decoded-pixel histogram from the source text without a DCT.

Scale note: encode/decode run one image per row inside Arrow-batched
``mapInPandas`` workers (multimodal.py); DCT/IDCT are vectorized numpy
over all blocks at once, the entropy coder is a per-block Python loop —
adequate for fixture-sized images, and the production swap-in keeps the
same function signatures.
"""

from __future__ import annotations

import struct

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

# -- Annex K tables ----------------------------------------------------------

# Table K.1 — luminance quantization, natural (row-major) order
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Table K.2 — chrominance quantization, natural (row-major) order
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Table K.3 — luminance DC: BITS (#codes of length 1..16) and HUFFVAL
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

# Table K.4 — chrominance DC
DC_BITS_CHROMA = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_VALS_CHROMA = tuple(range(12))

# Table K.5 — luminance AC
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# Table K.6 — chrominance AC
AC_BITS_CHROMA = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_VALS_CHROMA = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

# zig-zag scan order: ZIGZAG[k] = natural index of the k-th zigzag element
_z = np.arange(64).reshape(8, 8)
_order = sorted(
    ((x, y) for x in range(8) for y in range(8)),
    key=lambda p: (p[0] + p[1], (p[1], p[0]) if (p[0] + p[1]) % 2 else (p[0], p[1])),
)
ZIGZAG = np.array([_z[x, y] for x, y in _order], dtype=np.int64)
del _z, _order

# orthonormal DCT-II basis: DCT = C @ block @ C.T (T.81 A.3.3 scaling)
_k = np.arange(8)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_DCT_C[0, :] /= np.sqrt(2.0)
del _k


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


def _build_codes(bits, vals) -> dict:
    """Canonical Huffman assignment (T.81 C.2 Generate_size/code_table):
    symbol → (code, length), codes increasing within and across lengths."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, low-order bits) for a DC diff / AC value (T.81 F.1.2.1):
    negatives are stored one's-complemented within the category width."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        # final-byte padding must be ALL 1-bits (T.81 F.1.2.3); the pad
        # width is exactly what remains to the byte boundary
        pad = (8 - self.n % 8) % 8
        if pad:
            self.put((1 << pad) - 1, pad)
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Byte-align (1-bit padding, stuffing applies) and emit RSTm
        (T.81 F.1.2.3 / E.1.4) — the decoder re-aligns and resets DC."""
        pad = (8 - self.n % 8) % 8
        if pad:
            self.put((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-code one zigzag block (T.81 F.1.2); returns the new DC
    predictor for the block's component."""
    t, bits = _magnitude(int(blk[0]) - pred)
    pred = int(blk[0])
    c, ln = dc_codes[t]
    bw.put(c, ln)
    if t:
        bw.put(bits, t)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        t, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.put(c, ln)
        bw.put(bits, t)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return pred


def _plane_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(ph, pw) float plane (level-shifted) → (#blocks, 64) quantized
    zigzag rows, blocks in row-major block order."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeffs = np.einsum("ij,njk,lk->nil", _DCT_C, blocks, _DCT_C)
    quant = np.round(coeffs / qtab).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """uint8 (h, w) grayscale → baseline JPEG bytes (Annex K tables,
    edge-replicated padding to 8-multiples). restart_interval > 0 emits a
    DRI segment and an RSTm marker every that-many MCUs (one MCU = one
    block in a non-interleaved single-component scan) — the wild-JPEG
    error-resilience layout."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray takes a 2-D grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    zz = _plane_zigzag(padded.astype(np.float64) - 128.0, QUANT_LUMA)

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    pred = 0
    rst = 0
    for i, blk in enumerate(zz):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart(rst)
            rst = (rst + 1) & 7
            pred = 0
        pred = _encode_block(bw, blk, pred, dc_codes, ac_codes)

    dqt = _seg(0xFFDB, b"\x00" + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8)))
    sof = _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + _seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bw.flush() + b"\xff\xd9"


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB → float64 Y, Cb, Cr planes (JFIF full-range
    BT.601, T-871 §7)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """float Y/Cb/Cr planes → (h, w, 3) uint8 RGB (inverse of the above)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg_color(
    img: np.ndarray, subsample: bool = True, restart_interval: int = 0
) -> bytes:
    """uint8 (h, w, 3) RGB → baseline YCbCr JPEG bytes. 4:2:0 chroma
    subsampling (2×2 mean) by default, 4:4:4 with subsample=False.
    Interleaved single scan, per-component DC predictors, luma tables
    K.1/K.3/K.5 for Y and chroma tables K.2/K.4/K.6 for Cb/Cr — the
    header layout every baseline color JPEG in the wild uses.
    restart_interval > 0 emits DRI + RSTm every that-many MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_color takes an (h, w, 3) RGB array")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    mcu = 16 if subsample else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y, cb, cr = rgb_to_ycbcr(padded)
    if subsample:
        # 2×2 mean (the common decimation filter); chroma plane is
        # (ph/2, pw/2), itself a multiple of 8 because ph,pw are 16-mults
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    zz_y = _plane_zigzag(y - 128.0, QUANT_LUMA)
    zz_cb = _plane_zigzag(cb - 128.0, QUANT_CHROMA)
    zz_cr = _plane_zigzag(cr - 128.0, QUANT_CHROMA)

    dc_l = _build_codes(DC_BITS, DC_VALS)
    ac_l = _build_codes(AC_BITS, AC_VALS)
    dc_c = _build_codes(DC_BITS_CHROMA, DC_VALS_CHROMA)
    ac_c = _build_codes(AC_BITS_CHROMA, AC_VALS_CHROMA)

    bw = _BitWriter()
    hsamp = 2 if subsample else 1
    ybw = pw // 8  # Y blocks per row
    cbw = (pw // (2 * 8)) if subsample else ybw  # chroma blocks per row
    mcux, mcuy = pw // mcu, ph // mcu
    preds = [0, 0, 0]
    mcu_idx = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            mcu_idx += 1
            for by in range(hsamp):
                for bx in range(hsamp):
                    idx = (my * hsamp + by) * ybw + (mx * hsamp + bx)
                    preds[0] = _encode_block(bw, zz_y[idx], preds[0], dc_l, ac_l)
            cidx = my * cbw + mx
            preds[1] = _encode_block(bw, zz_cb[cidx], preds[1], dc_c, ac_c)
            preds[2] = _encode_block(bw, zz_cr[cidx], preds[2], dc_c, ac_c)

    sampling = 0x22 if subsample else 0x11
    dqt = _seg(
        0xFFDB, b"\x00" + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8))
    ) + _seg(0xFFDB, b"\x01" + bytes(QUANT_CHROMA.ravel()[ZIGZAG].astype(np.uint8)))
    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, sampling, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dht = (
        _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xFFC4, b"\x01" + bytes(DC_BITS_CHROMA) + bytes(DC_VALS_CHROMA))
        + _seg(0xFFC4, b"\x11" + bytes(AC_BITS_CHROMA) + bytes(AC_VALS_CHROMA))
    )
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bw.flush() + b"\xff\xd9"


# near-flat Huffman table carrying every RS symbol — progressive AC
# scans need EOBn symbols (r<<4, r=1..14) that the Annex K sequential AC
# tables do not define. A DHT length bucket holds at most 255 codes, so
# the 256 symbols split 255@len9 + 1@len10; canonical assignment keeps
# it prefix-free and never produces an all-ones code.
_FLAT_AC_BITS = tuple(255 if i == 8 else (1 if i == 9 else 0) for i in range(16))
_FLAT_AC_VALS = tuple(range(256))


def _enc_ac_first(bw, blocks, ac_codes, Ss, Se, Al) -> None:
    """Progressive AC first pass for one component (T.81 G.1.2.2):
    band coefficients truncated toward zero by 2^Al, runlength-coded with
    cross-block EOB runs."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1  # floor(log2), <= 14 by the cap
            c, ln = ac_codes[r << 4]
            bw.put(c, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        vals = [
            (abs(int(blk[k])) >> Al) * (1 if blk[k] > 0 else -1)
            for k in range(Ss, Se + 1)
        ]
        nz = [i for i, v in enumerate(vals) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x3FFF:  # keep r <= 14 lengths codable
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.put(c, ln)
                r -= 16
            s, bits = _magnitude(v)
            c, ln = ac_codes[(r << 4) | s]
            bw.put(c, ln)
            bw.put(bits, s)
            r = 0
        if nz[-1] < Se - Ss:
            eobrun += 1
    flush_eob()


def _enc_ac_refine(bw, blocks, ac_codes, Ss, Se, Al) -> None:
    """Progressive AC refinement pass (T.81 G.1.2.3): newly-significant
    coefficients coded as (run, 1)+sign; already-significant ones emit one
    correction bit each, buffered behind the next coded symbol."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next EOBn flush

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.put(c, ln)
            if r:
                bw.put(eobrun - (1 << r), r)
            for b in pending:
                bw.put(b, 1)
            pending.clear()
            eobrun = 0

    for blk in blocks:
        absv = [abs(int(blk[k])) >> Al for k in range(Ss, Se + 1)]
        newly = [i + Ss for i, t in enumerate(absv) if t == 1]
        eob_pos = newly[-1] if newly else None  # last newly-significant k
        r = 0
        corr: list[int] = []  # this block's bits since the last symbol
        for i in range(Ss, Se + 1):
            t = absv[i - Ss]
            if t == 0:
                r += 1
                continue
            # the decoder reads positionally, so pending ZRLs must flush at
            # EVERY nonzero coefficient inside the EOB span — a history
            # coefficient past 16 zero-history positions belongs to the
            # NEXT symbol's advance, not this ZRL's
            while r > 15 and eob_pos is not None and i <= eob_pos:
                flush_eob()
                c, ln = ac_codes[0xF0]
                bw.put(c, ln)
                r -= 16
                for b in corr:
                    bw.put(b, 1)
                corr.clear()
            if t > 1:
                corr.append((abs(int(blk[i])) >> Al) & 1)
                continue
            # newly significant (t == 1)
            flush_eob()
            c, ln = ac_codes[(r << 4) | 1]
            bw.put(c, ln)
            bw.put(1 if blk[i] > 0 else 0, 1)
            for b in corr:
                bw.put(b, 1)
            corr.clear()
            r = 0
        if r > 0 or corr:
            eobrun += 1
            pending.extend(corr)
            if eobrun == 0x3FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(img: np.ndarray, subsample: bool = True) -> bytes:
    """Progressive (SOF2) JPEG encoder — gray (h, w) or RGB (h, w, 3).
    Fixed four-pass scan script exercising every progressive decode path:
    interleaved DC first (Al=1), DC refinement, then per component AC
    first (Ss=1..63, Al=1, EOB-run coded) and AC refinement (correction
    bits). Coefficients match the sequential encoder exactly (same quant
    tables), so decode(progressive) == decode(sequential) pixel-for-pixel
    — the cross-check the tests pin."""
    img = np.asarray(img, dtype=np.uint8)
    color = img.ndim == 3
    if color:
        h, w = img.shape[:2]
        mcu = 16 if subsample else 8
        ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
        padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        y, cb, cr = rgb_to_ycbcr(padded)
        if subsample:
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        planes = [
            (_plane_zigzag(y - 128.0, QUANT_LUMA), 2 if subsample else 1),
            (_plane_zigzag(cb - 128.0, QUANT_CHROMA), 1),
            (_plane_zigzag(cr - 128.0, QUANT_CHROMA), 1),
        ]
    else:
        h, w = img.shape
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
        planes = [(_plane_zigzag(padded.astype(np.float64) - 128.0, QUANT_LUMA), 1)]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    hsamp = planes[0][1]
    mcux = (pw // (8 * hsamp)) if color else pw // 8
    mcuy = (ph // (8 * hsamp)) if color else ph // 8
    ybw = pw // 8

    dc_l = _build_codes(DC_BITS, DC_VALS)
    dc_c = _build_codes(DC_BITS_CHROMA, DC_VALS_CHROMA)
    flat_ac = _build_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    dc_codes = [dc_l] + [dc_c] * (len(planes) - 1)

    def dc_first_scan() -> bytes:
        """Interleaved DC pass at Al=1 (arithmetic shift per G.1.2.1)."""
        bw = _BitWriter()
        preds = [0] * len(planes)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (zzc, samp) in enumerate(planes):
                    for by in range(samp):
                        for bx in range(hsamp if ci == 0 and color else 1):
                            if ci == 0 and color and hsamp == 2:
                                idx = (my * 2 + by) * ybw + (mx * 2 + bx)
                            else:
                                idx = (my * samp + by) * (
                                    ybw if ci == 0 else mcux
                                ) + mx * samp + bx
                            v = int(zzc[idx][0]) >> 1  # Al = 1
                            s, bits = _magnitude(v - preds[ci])
                            preds[ci] = v
                            c, ln = dc_codes[ci][s]
                            bw.put(c, ln)
                            if s:
                                bw.put(bits, s)
        return bw.flush()

    def dc_refine_scan() -> bytes:
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (zzc, samp) in enumerate(planes):
                    for by in range(samp):
                        for bx in range(hsamp if ci == 0 and color else 1):
                            if ci == 0 and color and hsamp == 2:
                                idx = (my * 2 + by) * ybw + (mx * 2 + bx)
                            else:
                                idx = (my * samp + by) * (
                                    ybw if ci == 0 else mcux
                                ) + mx * samp + bx
                            bw.put(int(zzc[idx][0]) & 1, 1)
        return bw.flush()

    def seg_sos(comp_specs: list, Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xFFDA, body + bytes([Ss, Se, (Ah << 4) | Al]))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, b"\x00" + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8)))
    if color:
        out += _seg(
            0xFFDB, b"\x01" + bytes(QUANT_CHROMA.ravel()[ZIGZAG].astype(np.uint8))
        )
        sampling = 0x22 if subsample else 0x11
        sof_comps = bytes([1, sampling, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
    else:
        out += _seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    if color:
        out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_CHROMA) + bytes(DC_VALS_CHROMA))
    out += _seg(
        0xFFC4, b"\x10" + bytes(_FLAT_AC_BITS) + bytes(_FLAT_AC_VALS)
    )

    ids = [1, 2, 3] if color else [1]
    dc_specs = [(ids[i], 0 if i == 0 else 1, 0) for i in range(len(planes))]
    out += seg_sos(dc_specs, 0, 0, 0, 1) + dc_first_scan()
    out += seg_sos(dc_specs, 0, 0, 1, 0) + dc_refine_scan()
    for ci, (zzc, samp) in enumerate(planes):
        # non-interleaved AC scans cover only the component's TRUE block
        # grid (T.81 A.2.2) — MCU-padding blocks are not coded, so select
        # the real (by, bx) rows out of the padded plane
        if ci == 0:
            cw, chh, bpr = w, h, ybw
        else:
            cw = -(-w // 2) if subsample else w
            chh = -(-h // 2) if subsample else h
            bpr = (pw // 16) if subsample else ybw
        tbw, tbh = -(-cw // 8), -(-chh // 8)
        true_blocks = [zzc[by * bpr + bx] for by in range(tbh) for bx in range(tbw)]
        bw_ = _BitWriter()
        _enc_ac_first(bw_, true_blocks, flat_ac, 1, 63, 1)
        out += seg_sos([(ids[ci], 0, 0)], 1, 63, 0, 1) + bw_.flush()
        bw_ = _BitWriter()
        _enc_ac_refine(bw_, true_blocks, flat_ac, 1, 63, 0)
        out += seg_sos([(ids[ci], 0, 0)], 1, 63, 1, 0) + bw_.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "restart marker inside an MCU (corrupt stream or wrong DRI)"
                )
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def sync_restart(self) -> int:
        """Byte-align and consume the next RSTm marker (T.81 E.2.4);
        returns m. Skips the stuffed 0xFF00 a 1-bit pad byte can leave."""
        self.acc = 0
        self.n = 0  # drop padding bits of the current byte
        while True:
            b = self.data[self.pos]
            if b != 0xFF:
                self.pos += 1  # residual pad byte
                continue
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed pad byte 0xFF
                continue
            if 0xD0 <= nxt <= 0xD7:
                self.pos += 2
                return nxt & 7
            raise ValueError(f"expected restart marker, got 0xFF{nxt:02X}")

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_scan(
    data: bytes,
    start: int,
    comps: list,
    scan_comps: list,
    zz: list,
    cbw: list,
    cbh: list,
    true_dims: list,
    mcux: int,
    mcuy: int,
    htabs: dict,
    band: tuple,
    restart_interval: int,
    progressive: bool,
) -> int:
    """Decode one entropy-coded scan into the per-component coefficient
    stores. Handles sequential full-block scans, and the four progressive
    passes (T.81 G.2): DC first (diff<<Al), DC refinement (one raw bit),
    AC first (band decode with EOB runs), AC refinement (correction bits).
    Returns the stream position of the next marker."""
    Ss, Se, Ah, Al = band
    br = _BitReader(data, start)

    def read_sym(tab: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def read_block_full(blk, dc_tab, ac_tab, pred: int) -> int:
        t = read_sym(dc_tab)
        pred += _extend(br.bits(t), t) if t else 0
        blk[0] = pred
        k = 1
        while k < 64:
            rs = read_sym(ac_tab)
            r, t = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("AC run past end of block")
            blk[k] = _extend(br.bits(t), t)
            k += 1
        return pred

    def read_dc_first(blk, dc_tab, pred: int) -> int:
        t = read_sym(dc_tab)
        pred += _extend(br.bits(t), t) if t else 0
        blk[0] = pred << Al
        return pred

    def read_dc_refine(blk) -> None:
        if br.bit():
            blk[0] = int(blk[0]) | (1 << Al)

    state = {"eobrun": 0}

    def read_ac_first(blk, ac_tab) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = Ss
        while k <= Se:
            rs = read_sym(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) + (br.bits(r) if r else 0) - 1
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > Se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(br.bits(s), s) << Al
            k += 1

    def _refine_one(blk, k) -> None:
        if br.bit():
            v = int(blk[k])
            if (abs(v) & (1 << Al)) == 0:
                blk[k] = v + ((1 << Al) if v > 0 else -(1 << Al))

    def read_ac_refine(blk, ac_tab) -> None:
        p1 = 1 << Al
        k = Ss
        if state["eobrun"] == 0:
            while k <= Se:
                rs = read_sym(ac_tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) + (br.bits(r) if r else 0)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement symbol with s > 1")
                    val = p1 if br.bit() else -p1
                # advance: refine nonzero-history coeffs, count r zero-history
                while k <= Se:
                    if blk[k] != 0:
                        _refine_one(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= Se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= Se:
                if blk[k] != 0:
                    _refine_one(blk, k)
                k += 1
            state["eobrun"] -= 1

    def handle(ci: int, row: int, td: int, ta: int, preds: list) -> None:
        blk = zz[ci][row]
        if not progressive:
            preds[ci] = read_block_full(blk, htabs[(0, td)], htabs[(1, ta)], preds[ci])
        elif Ss == 0:
            if Ah == 0:
                preds[ci] = read_dc_first(blk, htabs[(0, td)], preds[ci])
            else:
                read_dc_refine(blk)
        else:
            if Ah == 0:
                read_ac_first(blk, htabs[(1, ta)])
            else:
                read_ac_refine(blk, htabs[(1, ta)])

    preds = [0] * len(comps)
    if len(scan_comps) > 1:
        # interleaved: MCU order over the padded grid
        mcu_idx = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                    br.sync_restart()
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                mcu_idx += 1
                for ci, td, ta in scan_comps:
                    _, hi, vi, _tq = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            row = (my * vi + by) * cbw[ci] + (mx * hi + bx)
                            handle(ci, row, td, ta, preds)
    else:
        # non-interleaved: the component's TRUE block grid (T.81 A.2.2 —
        # MCU-padding blocks are not coded in a single-component scan)
        ci, td, ta = scan_comps[0]
        bwi, bhi = true_dims[ci]
        unit = 0
        for by in range(bhi):
            for bx in range(bwi):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.sync_restart()
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                unit += 1
                handle(ci, by * cbw[ci] + bx, td, ta, preds)

    # advance to the next marker: drop padding bits, skip pad bytes and
    # stuffed 0xFF00 pairs
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    return p


@_corrupt_guard("JPEG")
def decode_jpeg(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """JPEG → uint8 (h, w) for 1-component streams, (h, w, 3) RGB for
    3-component YCbCr (any integer sampling ratio — 4:4:4, 4:2:2, 4:2:0).
    Baseline sequential (SOF0) AND progressive (SOF2: spectral selection +
    successive approximation, multi-scan), 8-bit, restart intervals
    honored (arithmetic coding / hierarchical / CMYK raise
    NotImplementedError). max_pixels caps h×w×components BEFORE any
    plane allocation — a hostile SOF claiming 65535×65535 must not
    size a ~4 GB buffer (decompression-bomb budget, same contract as
    decode_gif)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    restart_interval = 0
    progressive = False
    comps: list[list[int]] = []  # per component: [id, hi, vi, tq]
    hmax = vmax = mcux = mcuy = 0
    cbw: list[int] = []
    cbh: list[int] = []
    true_dims: list[tuple[int, int]] = []
    zz: list[np.ndarray] = []
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos : pos + 2])[0]
        payload = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tab = np.zeros(64, np.int32)
                tab[ZIGZAG] = np.frombuffer(payload[p + 1 : p + 65], np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = tuple(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = tuple(payload[p + 17 : p + 17 + nv])
                # invert the canonical assignment: (length, code) → symbol
                htabs[(tc, th)] = {
                    (length, code): sym
                    for sym, (code, length) in _build_codes(bits, vals).items()
                }
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (1=gray, 3=YCbCr)"
                )
            if h * w * ncomp > max_pixels:
                raise ValueError(
                    f"JPEG {w}x{h}x{ncomp} exceeds the "
                    f"{max_pixels}-pixel decode budget"
                )
            comps = [
                [payload[6 + 3 * i], payload[7 + 3 * i] >> 4,
                 payload[7 + 3 * i] & 0xF, payload[8 + 3 * i]]
                for i in range(ncomp)
            ]
            # a single-component image is effectively non-interleaved:
            # sampling factors don't shape its scans (T.81 A.2.2)
            if ncomp == 1:
                comps[0][1] = comps[0][2] = 1
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _, hi, vi, _tq in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"non-integer subsampling ratio {hi}x{vi} vs {hmax}x{vmax}"
                    )
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            cbw = [mcux * c[1] for c in comps]
            cbh = [mcuy * c[2] for c in comps]
            # TRUE component block dims (T.81 A.1.1 / A.2.2): component
            # size = ceil(dim * sampling / max_sampling), blocks = ceil/8
            def _ceil_div(a: int, b: int) -> int:
                return (a + b - 1) // b

            true_dims = [
                (
                    _ceil_div(_ceil_div(w * c[1], hmax), 8),
                    _ceil_div(_ceil_div(h * c[2], vmax), 8),
                )
                for c in comps
            ]
            zz = [np.zeros((cbh[i] * cbw[i], 64), np.int32) for i in range(ncomp)]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"unsupported SOF 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI — MCUs between restart markers
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS — one entropy-coded scan
            if not comps:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            by_id = {c[0]: i for i, c in enumerate(comps)}
            scan_comps = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_comps.append((by_id[cs], tdta >> 4, tdta & 0xF))
            band = (
                payload[1 + 2 * ns],
                payload[2 + 2 * ns],
                payload[3 + 2 * ns] >> 4,
                payload[3 + 2 * ns] & 0xF,
            )
            if not progressive:
                if ns != len(comps):
                    raise NotImplementedError(
                        "multi-scan (non-interleaved) sequential JPEG not supported"
                    )
                band = (0, 63, 0, 0)
            pos = _decode_scan(
                data, pos + ln, comps, scan_comps, zz, cbw, cbh, true_dims,
                mcux, mcuy, htabs, band, restart_interval, progressive,
            )
            continue
        pos += ln
    if h is None or not comps:
        raise ValueError("JPEG missing SOF")

    planes = []
    for i, (_cid, hi, vi, tq) in enumerate(comps):
        q = qtabs[tq]
        coeffs = np.zeros((cbh[i] * cbw[i], 64), np.float64)
        coeffs[:, ZIGZAG] = zz[i] * q.ravel()[ZIGZAG]
        coeffs = coeffs.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT_C, coeffs, _DCT_C) + 128.0
        plane = (
            pix.reshape(cbh[i], cbw[i], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(cbh[i] * 8, cbw[i] * 8)
        )
        # upsample by sample replication to the full sampling grid
        if hi != hmax or vi != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])
