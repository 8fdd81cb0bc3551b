"""MPEG-1 Audio Layer I bitstream codec (ISO/IEC 11172-3) — pure stdlib.

Reference parity target: the reference stores opaque audio blobs; this
module supplies the decode stage a training-data pipeline needs for
`audio/mpeg` payloads (SURVEY §6 multimodal tier; the Layer III header
walker lives in codecs.mp3_stream_info). Everything here follows the
public ISO 11172-3 spec:

- frame layout (§2.4.1.3): 32-bit header, [16-bit CRC], 32 x 4-bit bit
  allocations, 6-bit scalefactor per allocated subband, then 12 granules
  x 1 coded sample per allocated subband, MSB first;
- frame length (§2.4.2.3): slots = 12 * bitrate / sampling_frequency,
  one Layer I slot = 4 bytes;
- requantization (§2.4.3.1): a coded value c of nb bits maps to the
  fraction s'' = c / 2^(nb-1) - 1 (MSB-inverted two's complement), then
  s''' = (2^nb / (2^nb - 1)) * (s'' + 2^(1-nb));
- scalefactors (§2.4.2.4, Table B.1): scalefactor[idx] = 2 * 2^(-idx/3)
  — the printed table IS this geometric sequence, so indices divisible
  by 3 are exact powers of two.

The decode implemented here is bit-exact through REQUANTIZED SUBBAND
SAMPLES: s''' * (2^nb - 1) * 2^(nb-1) = 2^nb * (c - 2^(nb-1) + 1) is an
INTEGER, so decoded output is integer-exact and cross-engine checkable.
The final polyphase synthesis window (matrixing is the formula
N[i][k] = cos((16+i)(2k+1)*pi/64), but the 512-coefficient window D is
PURE PRINTED TABLE DATA — ISO 11172-3 Annex B Table B.3) cannot be
reproduced from first principles in this library-free sandbox, so PCM
windowing stops there by design; subband-domain samples are the decode
product. Documented in COVERAGE.md as the boundary.
"""

from __future__ import annotations

# Layer I bitrate table, kbit/s (ISO 11172-3 Table B.2a column Layer I);
# index 0 is the free format, 15 is forbidden
LAYER1_BITRATES = [
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
]
SAMPLE_RATES = [44100, 48000, 32000]  # header sampling_frequency index


class _BitWriter:
    """MSB-first bit accumulator over one arbitrary-precision integer —
    one shift-or per FIELD instead of per bit (the per-bit list version
    dominated the decode stage's profile at sf0.1)."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n

    def bytes(self, pad_to: int | None = None) -> bytes:
        total = self.nbits if pad_to is None else pad_to * 8
        assert total % 8 == 0 and total >= self.nbits
        return (self.acc << (total - self.nbits)).to_bytes(total // 8, "big")


class _BitReader:
    """MSB-first field reader: the buffer becomes one big integer once,
    then each read is a shift+mask."""

    def __init__(self, data: bytes) -> None:
        self._big = int.from_bytes(data, "big")
        self._total = len(data) * 8
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        shift = self._total - self.pos - n
        if shift < 0:
            raise IndexError("bit read past end of buffer")
        self.pos += n
        return (self._big >> shift) & ((1 << n) - 1)


def build_mp1_frame(
    codes: dict[int, tuple[int, int, list[int]]],
    bitrate_idx: int = 3,
    sr_idx: int = 2,
) -> bytes:
    """One Layer I frame. `codes` maps subband -> (nb, sf_idx,
    [12 coded samples of nb bits]); unlisted subbands get allocation 0.
    Default header: 96 kbit/s at 32 kHz -> 12*96000/32000 = 36 slots =
    144 bytes (no padding), mono, no CRC."""
    w = _BitWriter()
    w.write(0xFFF, 12)          # syncword
    w.write(1, 1)               # ID = MPEG-1
    w.write(0b11, 2)            # layer I
    w.write(1, 1)               # protection_bit = 1 (no CRC)
    w.write(bitrate_idx, 4)
    w.write(sr_idx, 2)
    w.write(0, 1)               # padding
    w.write(0, 1)               # private
    w.write(0b11, 2)            # mode = single_channel
    w.write(0, 2)               # mode_extension
    w.write(0, 1)               # copyright
    w.write(0, 1)               # original
    w.write(0, 2)               # emphasis
    for sb, (nb, _sf, samples) in codes.items():
        # valid Layer I allocations are 2..15 bits (ISO 11172-3 Table
        # B.1 layer I: alloc 1..14 <-> nb-1). An entry with nb < 2 would
        # write allocation 0 yet still emit its scalefactor + 12 samples
        # below — the decoder (which skips unallocated subbands) would
        # lose bit sync on such a frame. Reject instead of desyncing.
        if not 2 <= nb <= 15:
            raise ValueError(
                f"subband {sb}: Layer I allocation needs 2..15 bits, got {nb}"
            )
        if len(samples) != 12:
            raise ValueError(f"subband {sb}: need 12 samples, got {len(samples)}")
    for sb in range(32):        # bit allocation: nb bits <-> alloc nb-1
        nb = codes.get(sb, (0, 0, []))[0]
        w.write(nb - 1 if nb else 0, 4)
    for sb in sorted(codes):    # 6-bit scalefactor index per allocated sb
        w.write(codes[sb][1], 6)
    for g in range(12):         # 12 granules x 1 sample per allocated sb
        for sb in sorted(codes):
            nb, _sf, samples = codes[sb]
            w.write(samples[g], nb)
    slots = 12 * LAYER1_BITRATES[bitrate_idx] * 1000 // SAMPLE_RATES[sr_idx]
    return w.bytes(pad_to=slots * 4)


def decode_mp1(data: bytes) -> list[dict]:
    """Walk every Layer I frame and decode its subband samples exactly.

    Returns one dict per (frame, allocated subband):
      {frame, subband, nb, sf_idx, samples: [int numerators]}
    where each numerator is s''' * (2^nb - 1) * 2^(nb-1) — the exact
    integer form of the §2.4.3.1 requantization; the true sample value
    is numerator / ((2^nb - 1) * 2^(nb-1)) * 2^(1 - sf_idx/3).
    """
    out: list[dict] = []
    pos = 0
    frame_no = 0
    while pos + 4 <= len(data):
        h = int.from_bytes(data[pos:pos + 4], "big")
        if (h >> 20) & 0xFFF != 0xFFF:
            raise ValueError(f"lost sync at byte {pos}")
        if (h >> 19) & 1 != 1 or (h >> 17) & 0b11 != 0b11:
            raise NotImplementedError("only MPEG-1 Layer I frames decode")
        bitrate_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0b11
        padding = (h >> 9) & 1
        if bitrate_idx in (0, 15) or sr_idx == 3:
            raise ValueError("bad bitrate/sample-rate index")
        nbytes = (
            12 * LAYER1_BITRATES[bitrate_idx] * 1000 // SAMPLE_RATES[sr_idx]
            + padding
        ) * 4
        r = _BitReader(data[pos:pos + nbytes])
        r.pos = 32
        if (h >> 16) & 1 == 0:
            r.read(16)  # CRC
        alloc = [r.read(4) for _ in range(32)]
        if any(a == 15 for a in alloc):
            raise ValueError("forbidden allocation 15")
        sf_idx = {sb: r.read(6) for sb, a in enumerate(alloc) if a}
        samples: dict[int, list[int]] = {sb: [] for sb in sf_idx}
        for _g in range(12):
            for sb, a in enumerate(alloc):
                if not a:
                    continue
                nb = a + 1
                c = r.read(nb)
                # s''' * (2^nb - 1) * 2^(nb-1)  =  2^nb * (c - 2^(nb-1) + 1)
                samples[sb].append((1 << nb) * (c - (1 << (nb - 1)) + 1))
        for sb in sorted(sf_idx):
            out.append(
                {
                    "frame": frame_no,
                    "subband": sb,
                    "nb": alloc[sb] + 1,
                    "sf_idx": sf_idx[sb],
                    "samples": samples[sb],
                }
            )
        pos += nbytes
        frame_no += 1
    return out


def synthesis_matrix(i: int, k: int) -> float:
    """The §2.4.3.2 matrixing coefficient N[i][k] = cos((16+i)(2k+1)π/64)
    — formula-defined, provided for completeness/testing. Full PCM
    reconstruction additionally needs the 512-entry window D (Table B.3,
    printed data — see module docstring)."""
    import math

    return math.cos((16 + i) * (2 * k + 1) * math.pi / 64)
