"""WARC/WET web-archive ingestion — the container format of crawl corpora.

WARC (ISO 28500, public; the Common Crawl distribution format) is a
concatenation of records, each a header block
(``WARC/1.0`` version line + ``Name: value`` fields) terminated by a blank
line, followed by ``Content-Length`` payload bytes and a ``\\r\\n\\r\\n``
separator. Crawl archives gzip EACH RECORD as its own gzip member so
readers can split files without decompressing everything; WET files are
the same container with ``WARC-Type: conversion`` plain-text payloads.

This module implements both directions library-free (stdlib zlib):

  * ``build_warc(records, per_record_gzip=True)`` — writer/sink.
  * ``parse_warc(data)`` — reader: multi-member gzip inflate, header
    parse, Content-Length-driven payload slicing.
  * ``warc_ingest_stage`` (pipeline/multimodal.py style) — Arrow-batched
    mapInPandas: one output row per record with its type, target URI,
    payload length and payload MD5, so a 100 TB crawl ingests
    scan-parallel with ZERO shuffles — records never leave the executor
    that scanned the blob.

Reference parity note: the reference engine ingests via bulk loaders over
opaque blobs (`io/sstable` loaders); a crawl-format reader is surplus the
LLM-pipeline extension needs (SURVEY extensions, BASELINE.json north
star).
"""

from __future__ import annotations

import zlib


def _gzip_member(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(payload) + co.flush()


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the crawl-archive layout)."""
    out = bytearray()
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.extend(d.decompress(data))
        out.extend(d.flush())
        if not d.unused_data:
            break
        data = d.unused_data
    return bytes(out)


def build_warc(records: list[dict], per_record_gzip: bool = True) -> bytes:
    """records: [{"type": "response"|"conversion"|..., "uri": str,
    "payload": bytes, ...extra header fields}] → WARC bytes.

    Each record is its own gzip member when per_record_gzip (the Common
    Crawl layout); plain concatenation otherwise."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        head = [
            "WARC/1.0",
            f"WARC-Type: {rec.get('type', 'response')}",
            f"WARC-Record-ID: <urn:uuid:{rec.get('id', i)}>",
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}",
        ]
        if rec.get("uri"):
            head.append(f"WARC-Target-URI: {rec['uri']}")
        head.append(f"Content-Length: {len(payload)}")
        block = ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"
        out.extend(_gzip_member(block) if per_record_gzip else block)
    return bytes(out)


def is_warc(data: bytes) -> bool:
    if data[:2] == b"\x1f\x8b":  # gzip magic: peek into the first member
        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            head = d.decompress(data[:4096], 16)
        except zlib.error:
            return False
        return head.startswith(b"WARC/")
    return data.startswith(b"WARC/")


def parse_warc(data: bytes) -> list[dict]:
    """WARC bytes (plain or per-record-gzip) → list of
    {"type", "uri", "headers", "payload"} dicts, in file order."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC version line at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        records.append(
            {
                "type": headers.get("WARC-Type", ""),
                "uri": headers.get("WARC-Target-URI", ""),
                "headers": headers,
                "payload": payload,
            }
        )
        pos = body_start + length
    return records


def warc_ingest_stage(media):
    """Arrow-batched WARC reader stage: (item_id, data) → one row per
    record with (rec_idx, warc_type, target_uri, content_length,
    payload_md5). Zero shuffles — the ingest shape for a 100 TB crawl."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("rec_idx", T.LongType()),
            T.StructField("warc_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("content_length", T.LongType()),
            T.StructField("payload_md5", T.StringType()),
        ]
    )

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import hashlib

        for pdf in batches:
            rows = []
            for item_id, data in zip(pdf["item_id"], pdf["data"]):
                for j, rec in enumerate(parse_warc(bytes(data or b""))):
                    rows.append(
                        (
                            int(item_id),
                            j,
                            rec["type"],
                            rec["uri"],
                            len(rec["payload"]),
                            hashlib.md5(rec["payload"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "item_id",
                    "rec_idx",
                    "warc_type",
                    "target_uri",
                    "content_length",
                    "payload_md5",
                ],
            )

    return media.select("item_id", "data").mapInPandas(run, schema)
