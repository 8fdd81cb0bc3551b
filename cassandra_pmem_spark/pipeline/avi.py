"""AVI (RIFF) container with Motion-JPEG video — a REAL compressed
video path built from parts this repo already proves correct.

MJPEG is the simplest real-world video codec: every frame is an
independent baseline JPEG, so the container walk (this module) plus
the existing T.81 codec (`pipeline/jpeg.py`) give full decode of a
format actual capture hardware emits — no inter-frame prediction, and
exactly the intra-only shape a 100 TB frame-sampling pipeline wants
(any frame is decodable without its neighbors, so frames parallelize
across executors freely).

Layout per the public AVI/RIFF spec (msdn AVIMAINHEADER /
AVISTREAMHEADER / BITMAPINFOHEADER, OpenDML AVI file format):

    RIFF('AVI '
      LIST('hdrl'
        avih(MainAVIHeader)            # us/frame, total frames, w, h
        LIST('strl' strh(vids/MJPG) strf(BITMAPINFOHEADER)))
      LIST('movi' '00dc'(jpeg) ...)    # word-aligned chunks
      idx1(entries))                   # offsets relative to 'movi'+4

The decoder validates the idx1 index against the chunks it walked —
the integrity check a seeking reader relies on.
"""

from __future__ import annotations

import struct

import numpy as np

from cassandra_pmem_spark.pipeline.jpeg import decode_jpeg, encode_jpeg_gray


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], rate: int = 10, scale: int = 1
) -> bytes:
    """Pack grayscale frames as MJPEG in a minimal, spec-conforming AVI.

    fps = rate/scale (the strh convention). Each frame goes through the
    real baseline JPEG encoder."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_gray(np.asarray(f, np.uint8)) for f in frames]
    n = len(jpegs)

    us_per_frame = (1_000_000 * scale) // rate
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, scale, rate, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    index = []
    for j in jpegs:
        # idx1 offset convention: relative to the 'movi' fourcc, so the
        # first chunk sits at offset 4
        index.append((len(movi_payload) + 4, len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
            for off, size in index
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes, max_pixels: int = 1 << 26):
    """Walk the RIFF tree, decode every video chunk through the real
    JPEG decoder, and cross-check the idx1 index.

    max_pixels caps TOTAL decoded output across frames — hostile
    headers must not size allocations (same decompression-bomb budget
    as decode_gif). Low-level struct/index errors on truncated input
    surface as ValueError, the Arrow-stage contract.

    Returns (frames, (rate, scale), (width, height))."""
    try:
        return _decode_avi_mjpeg(data, max_pixels)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI stream: {e}") from e


def _decode_avi_mjpeg(data: bytes, max_pixels: int):
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI file")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF")

    rate = scale = None
    width = height = None
    total_frames = None
    movi_start = None  # position of the 'movi' fourcc
    chunks: list[tuple[int, bytes]] = []  # (offset rel to movi fourcc, jpeg)
    idx_entries: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal rate, scale, width, height, total_frames, movi_start
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(f"chunk {fourcc!r} overruns parent")
            if fourcc == b"LIST":
                listtype = data[body_start : body_start + 4]
                if listtype == b"movi":
                    movi_start = body_start
                    walk_movi(body_start + 4, body_end)
                else:
                    walk(body_start + 4, body_end)
            elif fourcc == b"avih":
                total_frames, _streams, w, h = struct.unpack_from(
                    "<16xI4xI4xII", data, body_start
                )
                width, height = w, h
            elif fourcc == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", data, body_start + 20
                    )
            elif fourcc == b"idx1":
                for off in range(body_start, body_end, 16):
                    ckid = data[off : off + 4]
                    _, coff, csize = struct.unpack_from("<III", data, off + 4)
                    if ckid.endswith(b"dc") or ckid.endswith(b"db"):
                        idx_entries.append((coff, csize))
            pos = body_end + (size & 1)

    def walk_movi(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            if fourcc.endswith(b"dc") or fourcc.endswith(b"db"):
                chunks.append(
                    (pos - movi_start, data[pos + 8 : pos + 8 + size])
                )
            pos += 8 + size + (size & 1)

    walk(12, 8 + riff_len)
    if rate is None or not chunks:
        raise ValueError("no MJPEG video stream found")
    if idx_entries:
        got = [(off, len(j)) for off, j in chunks]
        if got != idx_entries:
            raise ValueError("idx1 index disagrees with movi chunks")
    frames = []
    budget = max_pixels
    for _, j in chunks:
        if budget <= 0:
            raise ValueError(
                f"decoded frames exceed the {max_pixels}-pixel budget"
            )
        # each frame draws on the SHARED remaining budget, so neither a
        # single giant frame nor many small ones can overrun it
        frame = decode_jpeg(j, max_pixels=budget)
        budget -= frame.shape[0] * frame.shape[1] * (
            frame.shape[2] if frame.ndim == 3 else 1
        )
        frames.append(frame)
    if total_frames is not None and total_frames != len(frames):
        raise ValueError(
            f"avih declares {total_frames} frames, movi holds {len(frames)}"
        )
    return frames, (rate, scale), (width, height)
