"""Pure-stdlib baseline JPEG codec (grayscale subset), no external libraries.

Implements the ITU-T T.81 baseline sequential DCT process for 8-bit
single-component (grayscale) images, using the Annex K example tables:
luminance quantization (Table K.1) and luminance DC/AC Huffman tables
(Tables K.3/K.5). Both directions are real:

- ``encode_jpeg_gray``: level shift → 8×8 forward DCT (vectorized einsum)
  → quantize → zigzag → DC-differential + run-length Huffman coding with
  0xFF byte stuffing → SOI/DQT/SOF0/DHT/SOS/EOI stream;
- ``decode_jpeg``: marker parse (APPn/COM skipped), canonical Huffman
  reconstruction from the DHT bits/values lists, entropy decode with
  unstuffing, dequantize → dezigzag → IDCT (vectorized) → clip.

Supported subset (everything else raises NotImplementedError with the
reason): baseline SOF0, 8-bit precision, exactly one component, no
restart intervals. Progressive (SOF2), arithmetic coding, 12-bit, and
multi-component chroma-subsampled streams need nothing conceptually new
but are out of scope for fixture-sized use — the decoder REALLY decodes
any conforming grayscale baseline JPEG, not just this encoder's output.

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

# Table K.3 — luminance DC: BITS (#codes of length 1..16) and HUFFVAL
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

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


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale → baseline JPEG bytes (Annex K tables,
    edge-replicated padding to 8-multiples)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_jpeg_gray takes a 2-D grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ij,njk,lk->nil", _DCT_C, blocks, _DCT_C)
    quant = np.round(coeffs / QUANT_LUMA).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    pred = 0
    for blk in zz:
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

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + bw.flush() + b"\xff\xd9"


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
                raise NotImplementedError("restart markers (DRI) not supported")
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline grayscale JPEG → uint8 (h, w). Supports SOF0, 8-bit, one
    component, no restart intervals (progressive / multi-component /
    arithmetic streams raise NotImplementedError)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q = comp_dc = comp_ac = 0
    while pos + 4 <= len(data):
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if ncomp != 1:
                raise NotImplementedError(
                    "only single-component (grayscale) baseline JPEG supported"
                )
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"non-baseline SOF 0xFF{marker:02X} not supported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            comp_dc, comp_ac = payload[2] >> 4, payload[2] & 0xF
            pos += ln
            break
        pos += ln
    if h is None:
        raise ValueError("JPEG missing SOF0")

    dc_tab, ac_tab = htabs[(0, comp_dc)], htabs[(1, comp_ac)]
    q = qtabs[comp_q]
    bh, bw_ = -(-h // 8), -(-w // 8)
    br = _BitReader(data, pos)

    def read_sym(tab: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    zz = np.zeros((bh * bw_, 64), np.int32)
    pred = 0
    for b in range(bh * bw_):
        t = read_sym(dc_tab)
        diff = _extend(br.bits(t), t) if t else 0
        pred += diff
        zz[b, 0] = pred
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
            zz[b, k] = _extend(br.bits(t), t)
            k += 1

    coeffs = np.zeros((bh * bw_, 64), np.float64)
    coeffs[:, ZIGZAG] = zz * q.ravel()[ZIGZAG]
    coeffs = coeffs.reshape(-1, 8, 8)
    pix = np.einsum("ji,njk,kl->nil", _DCT_C, coeffs, _DCT_C) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    out = (
        pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]
