"""Compressed text-shard ingestion: gzip members as an opaque binary
column, decompressed by an Arrow-batched `mapInPandas` kernel.

The dominant wire format for web-scale LLM corpora (Common-Crawl
WET/WARC, most JSONL dumps) is gzip. This module implements the REAL
ingestion path with no external dependency: a full RFC 1952 member
parser — magic/CM/FLG walk incl. the optional FEXTRA / FNAME /
FCOMMENT / FHCRC header fields, raw-DEFLATE inflate via stdlib zlib,
CRC32 + ISIZE trailer verification, and multi-member concatenation
(wild .gz shards are routinely several members catenated; RFC 1952
§2.2 requires readers to accept that) — plus a deterministic encoder
for fixtures, and the Spark kernel `gzip_ingest_stats`.

Reference parity: realtime0523 has no compressed-shard path (its
sources are Kafka/JDBC); this implements the training-data-pipeline
ingestion surface the task brief specifies, against the public
RFC 1952 spec only.

Scale: mapInPandas streams Arrow batches through Python workers —
per-partition decompression, no driver involvement, payloads never
shuffle; at 100 TB this is the classic embarrassingly-parallel scan
stage and the per-file gzip members bound memory to one shard each.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def encode_gzip_member(
    raw: bytes,
    fname: bytes | None = None,
    fextra: bytes | None = None,
    fcomment: bytes | None = None,
    fhcrc: bool = False,
    level: int = 6,
) -> bytes:
    """One deterministic RFC 1952 member (MTIME=0, XFL=0, OS=255 so
    identical input bytes always produce identical member bytes —
    unlike the gzip module's default timestamping). The optional
    header fields exist so fixtures can exercise every branch of the
    decoder's header walk."""
    flg = 0
    header_tail = b""
    if fextra is not None:
        flg |= _FEXTRA
        header_tail += struct.pack("<H", len(fextra)) + fextra
    if fname is not None:
        flg |= _FNAME
        header_tail += fname + b"\x00"
    if fcomment is not None:
        flg |= _FCOMMENT
        header_tail += fcomment + b"\x00"
    if fhcrc:
        flg |= _FHCRC
    header = b"\x1f\x8b\x08" + bytes([flg]) + b"\x00\x00\x00\x00\x00\xff"
    header += header_tail
    if fhcrc:
        header += struct.pack("<H", zlib.crc32(header) & 0xFFFF)
    comp = zlib.compressobj(level, zlib.DEFLATED, -15)
    deflated = comp.compress(raw) + comp.flush()
    trailer = struct.pack(
        "<II", zlib.crc32(raw) & 0xFFFFFFFF, len(raw) & 0xFFFFFFFF
    )
    return header + deflated + trailer


def decode_gzip(payload: bytes) -> bytes:
    """Decompress a gzip payload of ONE OR MORE catenated RFC 1952
    members, verifying each member's CRC32 and ISIZE trailer. Raises
    ValueError naming the defect on any framing/checksum violation —
    a corrupt shard must fail loudly, not feed garbage downstream."""
    raw = bytes(payload)
    out = bytearray()
    pos = 0
    if not raw:
        raise ValueError("gzip: empty payload (not even one member)")
    while pos < len(raw):
        if raw[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(
                f"gzip: bad magic {raw[pos:pos + 2]!r} at offset {pos}"
            )
        if raw[pos + 2] != 8:
            raise ValueError(
                f"gzip: compression method {raw[pos + 2]} != 8 (deflate)"
            )
        flg = raw[pos + 3]
        if flg & 0xE0:
            raise ValueError(f"gzip: reserved FLG bits set ({flg:#x})")
        hdr_start = pos
        pos += 10  # magic, CM, FLG, MTIME(4), XFL, OS
        if flg & _FEXTRA:
            if pos + 2 > len(raw):
                raise ValueError("gzip: FEXTRA length field truncated")
            (xlen,) = struct.unpack("<H", raw[pos : pos + 2])
            pos += 2 + xlen
        for bit, field in ((_FNAME, "FNAME"), (_FCOMMENT, "FCOMMENT")):
            if flg & bit:
                nul = raw.find(b"\x00", pos)
                if nul < 0:
                    raise ValueError(
                        f"gzip: unterminated {field} header field"
                    )
                pos = nul + 1
        if flg & _FHCRC:
            (want,) = struct.unpack("<H", raw[pos : pos + 2])
            got = zlib.crc32(raw[hdr_start:pos]) & 0xFFFF
            if got != want:
                raise ValueError(
                    f"gzip: header CRC16 mismatch ({got:#x} != {want:#x})"
                )
            pos += 2
        if pos > len(raw):
            raise ValueError("gzip: header overruns the payload")
        inflater = zlib.decompressobj(-15)
        member = inflater.decompress(raw[pos:])
        if not inflater.eof:
            raise ValueError("gzip: truncated deflate stream")
        tail = inflater.unused_data
        if len(tail) < 8:
            raise ValueError("gzip: missing CRC32/ISIZE trailer")
        crc, isize = struct.unpack("<II", tail[:8])
        if zlib.crc32(member) & 0xFFFFFFFF != crc:
            raise ValueError("gzip: CRC32 mismatch (corrupt member)")
        if len(member) & 0xFFFFFFFF != isize:
            raise ValueError(
                f"gzip: ISIZE {isize} != decompressed length {len(member)}"
            )
        out += member
        pos = len(raw) - len(tail) + 8
    return bytes(out)


def attach_gzip_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
) -> DataFrame:
    """Testdata adapter: compress each row's UTF-8 text into a gzip
    payload the SQL oracle can replay from hex(encode(text)). To
    exercise the whole decoder, the header variant cycles by
    doc_id % 5 (plain / FNAME / FEXTRA / FCOMMENT / FHCRC) and texts
    past 64 bytes are split into TWO catenated members — the
    multi-member shape of real concatenated .gz shards."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                variant = int(doc_id) % 5
                kw = [
                    {},
                    {"fname": b"shard.txt"},
                    {"fextra": b"\x01\x02meta"},
                    {"fcomment": b"fixture"},
                    {"fhcrc": True},
                ][variant]
                if len(raw) > 64:
                    mid = len(raw) // 2
                    payload = encode_gzip_member(
                        raw[:mid], **kw
                    ) + encode_gzip_member(raw[mid:])
                else:
                    payload = encode_gzip_member(raw, **kw)
                payloads.append(payload)
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


GZIP_STATS_SCHEMA = "doc_id long, n_bytes bigint, byte_sum bigint"


def gzip_ingest_stats(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Decompress each shard and emit exact integer evidence of the
    recovered bytes (length + byte-value sum) — what an ingestion
    stage's checksum/accounting step records per shard. The match
    against an oracle replaying the raw text proves header walk,
    inflate, trailer verification and member concatenation byte for
    byte. Map-only: one row out per shard, payloads never shuffle."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_bytes, sums = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                raw = decode_gzip(payload)
                arr = np.frombuffer(raw, dtype=np.uint8)
                ids.append(int(doc_id))
                n_bytes.append(len(raw))
                sums.append(int(arr.sum(dtype=np.int64)) if len(raw) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        _stats, schema=GZIP_STATS_SCHEMA
    )
