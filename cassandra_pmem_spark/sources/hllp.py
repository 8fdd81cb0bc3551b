"""stream-lib HyperLogLogPlus blob codec — the COMPACTION metadata
component's cardinality estimator (io/sstable/metadata/CompactionMetadata
.java:74-92 serializes ``cardinalityEstimator.getBytes()`` int-length-
prefixed; MetadataCollector.java:117 constructs ``new HyperLogLogPlus(13,
25)`` and :139-144 offers ``MurmurHash.hash2_64(key, 0)`` per partition
key).

The byte format is the PUBLIC clearspring/stream-lib project's
HyperLogLogPlus serialization (Apache-2.0; the jar Cassandra bundles),
re-implemented here from its published format:

  int32  -VERSION            (version 2 -> writes -2, big-endian)
  uvarint p                  (normal precision, 13)
  uvarint sp                 (sparse precision, 25)
  uvarint format ordinal     (NORMAL=0, SPARSE=1)
  NORMAL: uvarint byte-length of the register words (size*4), then each
          32-bit register word big-endian. RegisterSet packs 6 five-bit
          registers per word, low bits first; word count =
          count/6 (+1 unless that is a multiple of 32 — the stream-lib
          RegisterSet.getSizeForCount quirk, preserved).
  SPARSE: uvarint entry count, then delta-encoded uvarints of the sorted
          sparse set.

This writer always serializes the NORMAL representation: any stream-lib
reader (``HyperLogLogPlus.Builder.build``) dispatches on the format
ordinal, so the blob is readable regardless; the reference's in-memory
estimator stays SPARSE below its conversion threshold (~0.75*2^p ≈ 6k
distinct partitions), so byte-for-byte parity with a reference-written
sstable holds above that threshold and semantic parity below it.
Reading accepts both formats (sparse entries decode via the published
encodeHash layout: ``(idx << 7) | (rho << 1) | 1`` when the p..sp index
bits are zero, ``(idx << 1)`` otherwise).

The cardinality() estimate here is the classic HLL estimator with
linear-counting small-range correction — stream-lib additionally applies
an empirical bias-correction table; the serialized REGISTERS (the format
contract) are exact, the estimate is within normal HLL error either way.
"""

from __future__ import annotations

import math
import struct

M64 = 0xC6A4A7935BD1E995
MASK = (1 << 64) - 1


def murmur2_64(data: bytes, seed: int = 0) -> int:
    """utils/MurmurHash.hash2_64 (MurmurHash.java:93-147): 64-bit
    Murmur2, unsigned little-endian blocks, SIGN-EXTENDED tail bytes
    (``(long) key.get(..)`` without & 0xff — the tail quirk). Returns
    the signed 64-bit value."""
    length = len(data)
    h = (seed & 0xFFFFFFFF) ^ ((M64 * length) & MASK)
    nblocks = length >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[i * 8:i * 8 + 8], "little")
        k = (k * M64) & MASK
        k ^= k >> 47
        k = (k * M64) & MASK
        h ^= k
        h = (h * M64) & MASK
    rem = length & 7
    if rem:
        t = length - rem

        def sx(b: int) -> int:  # sign-extended byte as 64-bit pattern
            return b | (MASK ^ 0xFF) if b > 127 else b

        for i in range(rem - 1, 0, -1):
            h ^= (sx(data[t + i]) << (8 * i)) & MASK
        h ^= sx(data[t])
        h = (h * M64) & MASK
    h ^= h >> 47
    h = (h * M64) & MASK
    h ^= h >> 47
    return h - (1 << 64) if h >= (1 << 63) else h


def _write_uvarint(out: bytearray, v: int) -> None:
    """stream-lib Varint.writeUnsignedVarInt: 7-bit groups, low first,
    high bit = continuation."""
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_uvarint(blob: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = blob[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _register_words(count: int) -> int:
    """RegisterSet.getSizeForCount (quirk preserved): words = count/6;
    +1 unless that is a non-zero multiple of 32."""
    bits = count // 6
    if bits == 0:
        return 1
    if bits % 32 == 0:
        return bits
    return bits + 1


class HyperLogLogPlus:
    """Register-level HLL++ (p, sp) sufficient for the COMPACTION
    component: offer_hashed / serialize (NORMAL) / deserialize (both
    formats) / cardinality."""

    def __init__(self, p: int = 13, sp: int = 25):
        self.p = p
        self.sp = sp
        self.m = 1 << p
        self.registers = [0] * self.m

    def offer_hashed(self, h: int) -> None:
        """HyperLogLogPlus.offerHashed(long) NORMAL path: idx = top p
        bits; rho = leading zeros of the remaining bits + 1, capped by
        the ``| (1 << (p - 1))`` guard (max 64 - p + 1... the guard bit
        lands at position p-1 of the ORIGINAL width, i.e. after << p it
        caps the count at 64 - p + 1 the way Java's int promotion does)."""
        u = h & MASK
        idx = u >> (64 - self.p)
        sub = ((u << self.p) & MASK) | (1 << (self.p - 1))
        # Long.numberOfLeadingZeros(sub) + 1
        rho = 64 - sub.bit_length() + 1
        if rho > self.registers[idx]:
            self.registers[idx] = rho

    def offer_key(self, key: bytes) -> None:
        """MetadataCollector.addKey: hash2_64(serialized pk, seed 0)."""
        self.offer_hashed(murmur2_64(key))

    # -- serialization --------------------------------------------------

    def serialize(self) -> bytes:
        out = bytearray()
        out += struct.pack(">i", -2)  # -VERSION
        _write_uvarint(out, self.p)
        _write_uvarint(out, self.sp)
        _write_uvarint(out, 0)  # Format.NORMAL
        words = _register_words(self.m)
        _write_uvarint(out, words * 4)
        packed = [0] * words
        for i, r in enumerate(self.registers):
            w = i // 6
            shift = 5 * (i - w * 6)
            packed[w] |= (r & 0x1F) << shift
        for w in packed:
            out += struct.pack(">i", w - (1 << 32) if w >= (1 << 31) else w)
        return bytes(out)

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLogPlus":
        (version,) = struct.unpack(">i", blob[:4])
        if version != -2:
            raise ValueError(f"unsupported HyperLogLogPlus version {-version}")
        pos = 4
        p, pos = _read_uvarint(blob, pos)
        sp, pos = _read_uvarint(blob, pos)
        fmt, pos = _read_uvarint(blob, pos)
        hll = cls(p, sp)
        if fmt == 0:  # NORMAL
            nbytes, pos = _read_uvarint(blob, pos)
            words = nbytes // 4
            for w in range(words):
                (word,) = struct.unpack(">i", blob[pos:pos + 4])
                pos += 4
                uw = word & 0xFFFFFFFF
                for j in range(6):
                    i = w * 6 + j
                    if i >= hll.m:
                        break
                    hll.registers[i] = (uw >> (5 * j)) & 0x1F
            return hll
        if fmt == 1:  # SPARSE: delta uvarints of the sorted sparse set
            n, pos = _read_uvarint(blob, pos)
            prev = 0
            for _ in range(n):
                delta, pos = _read_uvarint(blob, pos)
                k = prev + delta
                prev = k
                # encodeHash: (idx<<7 | rho<<1 | 1) when the p..sp index
                # bits are zero, else (idx<<1 | 0) with rho recoverable
                # from those bits
                if k & 1:
                    sp_idx = k >> 7
                    rho_sp = (k >> 1) & 0x3F
                    rho = rho_sp + (sp - p)
                else:
                    sp_idx = k >> 1
                    between = sp_idx & ((1 << (sp - p)) - 1)
                    rho = (sp - p) - between.bit_length() + 1
                idx = sp_idx >> (sp - p)
                if rho > hll.registers[idx]:
                    hll.registers[idx] = rho
            return hll
        raise ValueError(f"unknown HyperLogLogPlus format ordinal {fmt}")

    # -- estimate --------------------------------------------------------

    def cardinality(self) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = sum(2.0 ** -r for r in self.registers)
        e = alpha * m * m / s
        zeros = self.registers.count(0)
        if e <= 5 * m and zeros:
            e = m * math.log(m / zeros)
        return int(round(e))
