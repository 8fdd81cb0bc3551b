"""POSIX tar (ustar) shards — the WebDataset training-data container.

Large multimodal training corpora ship as tar shards whose members are
grouped by sample key: `000123.jpg` + `000123.txt` + `000123.json` is
ONE sample, and a reader streams shard-sequentially (the property that
makes tar the standard over random-access formats at 100 TB — pure
sequential I/O, no central index to fetch). This module implements the
ustar layout from the POSIX.1-1988 spec — 512-byte headers, octal
size fields, header checksum (sum over the header with the chksum
field as spaces), NUL-block terminator — both directions in pure
stdlib, plus the sample-grouping walk a WebDataset reader performs.

Python's `tarfile` could parse these; writing the walker against the
raw spec keeps the error surface explicit (checksum verification,
truncation) and matches the repo's codec discipline: every byte
accounted for, hostile input bounded, ValueError on corruption.
"""

from __future__ import annotations

BLOCK = 512


def _octal(v: int, width: int) -> bytes:
    return f"{v:0{width - 1}o}".encode() + b"\x00"


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """ustar archive of (name, payload) members + two NUL blocks."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError(f"member name too long: {name!r}")
        hdr = bytearray(BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _octal(0o644, 8)  # mode
        hdr[108:116] = _octal(0, 8)  # uid
        hdr[116:124] = _octal(0, 8)  # gid
        hdr[124:136] = _octal(len(payload), 12)  # size
        hdr[136:148] = _octal(0, 12)  # mtime (deterministic)
        hdr[148:156] = b" " * 8  # chksum placeholder
        hdr[156] = ord("0")  # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chksum = sum(hdr)
        hdr[148:156] = f"{chksum:06o}".encode() + b"\x00 "
        out += hdr
        out += payload
        pad = -len(payload) % BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * BLOCK)
    return bytes(out)


def parse_tar(data: bytes, max_output: int = 1 << 28) -> list[tuple[str, bytes]]:
    """Walk a ustar archive, verifying every header checksum.

    max_output bounds the summed declared member sizes before slicing —
    the same decompression-bomb budget contract as the codec layer."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    budget = max_output
    while pos + BLOCK <= len(data):
        hdr = data[pos : pos + BLOCK]
        if hdr == b"\x00" * BLOCK:  # terminator
            break
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "strict")
        try:
            size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
            declared = int(hdr[148:156].split(b"\x00")[0].strip(), 8)
        except ValueError as e:
            raise ValueError(f"bad octal field in tar header: {e}") from e
        actual = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if actual != declared:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos}: "
                f"{actual:o} != {declared:o}"
            )
        budget -= size
        if budget < 0:
            raise ValueError(
                f"tar members exceed the {max_output}-byte budget"
            )
        payload = data[pos + BLOCK : pos + BLOCK + size]
        if len(payload) != size:
            raise ValueError(f"truncated tar member {name!r}")
        if hdr[156] in (0, ord("0")):  # regular file
            members.append((name, payload))
        pos += BLOCK + size + (-size % BLOCK)
    else:
        raise ValueError("tar archive missing terminator")
    return members


def group_samples(
    members: list[tuple[str, bytes]]
) -> dict[str, dict[str, bytes]]:
    """WebDataset grouping: `key.ext` members collate into one sample
    per key, {key: {ext: payload}}. Keys keep archive order."""
    out: dict[str, dict[str, bytes]] = {}
    for name, payload in members:
        base = name.rsplit("/", 1)[-1]
        if "." in base:
            key, ext = base.split(".", 1)
        else:
            key, ext = base, ""
        out.setdefault(key, {})[ext] = payload
    return out


WEBDATASET_SCHEMA = (
    "doc_id BIGINT, sample_key STRING, n_members BIGINT, "
    "txt_bytes BIGINT, txt_md5 STRING, cls_val BIGINT"
)


def webdataset_stage(df, id_col="doc_id", text_col="text"):
    """WebDataset shard round trip: each Arrow batch becomes ONE tar
    shard holding three members per document (`key.txt` = the text,
    `key.json` = metadata, `key.cls` = a label), the shard is parsed
    back through the spec walker (checksums verified), samples regroup
    by key, and each sample is fingerprinted. Shard-per-batch is the
    production shape: a 100 TB corpus is millions of independent
    shards, each read sequentially by exactly one task — mapInPandas,
    zero shuffles. Emitting md5(txt member) lets the oracle prove the
    archive round trip byte-exact."""
    import hashlib
    import json

    import pandas as pd

    def run(batches):
        for pdf in batches:
            members = []
            ids = {}
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                key = f"{int(rid):012d}"
                ids[key] = int(rid)
                data = (text or "").encode("utf-8")
                members.append((f"{key}.txt", data))
                members.append(
                    (f"{key}.json", json.dumps({"id": int(rid)}).encode())
                )
                members.append((f"{key}.cls", str(int(rid) % 10).encode()))
            shard = build_tar(members)
            samples = group_samples(parse_tar(shard))
            out = {k: [] for k in (
                "doc_id", "sample_key", "n_members", "txt_bytes",
                "txt_md5", "cls_val",
            )}
            for key, parts in samples.items():
                out["doc_id"].append(ids[key])
                out["sample_key"].append(key)
                out["n_members"].append(len(parts))
                out["txt_bytes"].append(len(parts["txt"]))
                out["txt_md5"].append(hashlib.md5(parts["txt"]).hexdigest())
                out["cls_val"].append(int(parts["cls"].decode()))
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, WEBDATASET_SCHEMA)
