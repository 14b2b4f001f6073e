"""Pure-Python LZ4 Frame codec — the remaining shard-compression seam
after round-13's zstd (llm/zstd.py): .lz4 is the fast-tier wire format
for intermediate corpus artifacts (spill files, shuffle-ahead shard
caches, some HF dataset mirrors).

Implements the public LZ4 Frame Format and LZ4 Block Format specs with
no external dependency, in the same house style as the gzip/zstd
codecs: a strict DECODER covering

- frame descriptor walk (magic, FLG/BD bytes, version check, content
  size, dictionary-ID refusal, the xxh32-derived header checksum
  byte), skippable frames (the 0x184D2A5x family LZ4 shares with
  zstd), and multi-frame concatenation;
- stored (highest-bit) and compressed blocks under the declared block
  maximum, with optional per-block xxh32 checksums;
- token-based block decode: 4-bit literal/match lengths with 255-byte
  extensions, 2-byte little-endian offsets, the 4-byte minimum match,
  overlapping-match semantics, and block-DEPENDENT streams (matches
  reaching into previous blocks' output);
- optional whole-content xxh32 verification (xxhash32 implemented
  here — nothing in the container ships it).

Every framing violation raises ValueError naming the defect (the
decode_gzip/decode_zstd contract). The legacy frame format
(magic 0x184C2102, obsolete since 2015) raises NotImplementedError by
name. Plus a deterministic fixture-grade ENCODER (greedy hash matcher
honoring the spec's end-of-block rules: last 5 bytes literal, no match
starting within the last 12) so tests and the registered
`docs_lz4_ingest` query verify round-trips byte for byte.

Reference parity: realtime0523 has no compressed-shard path; this
completes the training-data ingestion surface (gzip / zstd / bz2 / xz
/ lz4) the task brief's 100 TB pipeline needs. Scale: used from the
same map-only `mapInPandas` kernels as the other codecs — per-shard
decompression, embarrassingly parallel, payloads never shuffle.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MAGIC_LEGACY = 0x184C2102
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
_BLOCK_MAX = {4: 64 * 1024, 5: 256 * 1024, 6: 1024 * 1024, 7: 4 * 1024 * 1024}

_M32 = (1 << 32) - 1
_Q1 = 2654435761
_Q2 = 2246822519
_Q3 = 3266489917
_Q4 = 668265263
_Q5 = 374761393


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 — the checksum the LZ4 frame format mandates (header
    byte, block checksums, content checksum)."""
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _Q1 + _Q2) & _M32
        a2 = (seed + _Q2) & _M32
        a3 = seed & _M32
        a4 = (seed - _Q1) & _M32
        lanes = struct.unpack_from(f"<{(n // 16) * 4}I", data)
        for i in range(0, len(lanes), 4):
            a1 = (_rotl32((a1 + lanes[i] * _Q2) & _M32, 13) * _Q1) & _M32
            a2 = (_rotl32((a2 + lanes[i + 1] * _Q2) & _M32, 13) * _Q1) & _M32
            a3 = (_rotl32((a3 + lanes[i + 2] * _Q2) & _M32, 13) * _Q1) & _M32
            a4 = (_rotl32((a4 + lanes[i + 3] * _Q2) & _M32, 13) * _Q1) & _M32
        acc = (
            _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)
        ) & _M32
        pos = (n // 16) * 16
    else:
        acc = (seed + _Q5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _Q3) & _M32, 17) * _Q4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _Q5) & _M32, 11) * _Q1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _Q2) & _M32
    acc ^= acc >> 13
    acc = (acc * _Q3) & _M32
    acc ^= acc >> 16
    return acc


# ---------------------------------------------------------------------------
# Block format.
# ---------------------------------------------------------------------------


def _decode_block(data: bytes, out: bytearray, window_base: int) -> None:
    """Decode one LZ4 compressed block, appending to `out` (the
    frame's regenerated content). `window_base` is the lowest offset
    into `out` matches may legally reach (0 for block-dependent
    streams, the block's own start for independent ones)."""
    pos = 0
    end = len(data)
    while True:
        if pos >= end:
            raise ValueError("lz4: block ends without a final literal run")
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= end:
                    raise ValueError("lz4: literal length extension truncated")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > end:
            raise ValueError("lz4: literal run overruns the block")
        out += data[pos : pos + lit]
        pos += lit
        if pos == end:
            return  # the last sequence is literals-only
        if pos + 2 > end:
            raise ValueError("lz4: match offset truncated")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: match offset 0 is invalid")
        if offset > len(out) - window_base:
            raise ValueError(
                f"lz4: match offset {offset} reaches before the window "
                f"start"
            )
        ml = token & 0x0F
        if ml == 15:
            while True:
                if pos >= end:
                    raise ValueError("lz4: match length extension truncated")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4  # minmatch
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy: byte-at-a-time semantics
            for _ in range(ml):
                out.append(out[-offset])


def _encode_block(seg: bytes) -> bytes:
    """Greedy hash-table block encoder honoring the spec's end rules:
    the last 5 bytes are always literals and no match starts within
    the last 12 bytes."""
    n = len(seg)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0

    def emit(lit_run: bytes, match: tuple[int, int] | None) -> None:
        lit = len(lit_run)
        ml_code = 0 if match is None else match[1] - 4
        token_lit = 15 if lit >= 15 else lit
        token_ml = 15 if ml_code >= 15 else ml_code
        out.append((token_lit << 4) | (token_ml if match else 0))
        rest = lit - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(lit_run)
        if match is None:
            return
        out.extend(struct.pack("<H", match[0]))
        rest = ml_code - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255

    limit = n - 12  # no match may START in the last 12 bytes
    while i < limit and i + 4 <= n:
        key = seg[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535 and seg[cand : cand + 4] == key:
            ml = 4
            cap = n - 5 - i  # the last 5 bytes stay literal
            while ml < cap and seg[cand + ml] == seg[i + ml]:
                ml += 1
            if ml >= 4:
                emit(seg[anchor:i], (i - cand, ml))
                i += ml
                anchor = i
                continue
        i += 1
    emit(seg[anchor:], None)
    return bytes(out)


# ---------------------------------------------------------------------------
# Frame format.
# ---------------------------------------------------------------------------


def decode_lz4(payload: bytes) -> bytes:
    """Decompress an LZ4 Frame payload of one or more catenated frames
    (skippable frames ignored). Raises ValueError naming the defect on
    any framing/checksum violation."""
    raw = bytes(payload)
    if not raw:
        raise ValueError("lz4: empty payload (not even one frame)")
    out_all = bytearray()
    pos = 0
    saw_frame = False
    while pos < len(raw):
        if pos + 4 > len(raw):
            raise ValueError(f"lz4: trailing garbage at offset {pos}")
        (magic,) = struct.unpack_from("<I", raw, pos)
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if pos + 8 > len(raw):
                raise ValueError("lz4: skippable frame header truncated")
            (size,) = struct.unpack_from("<I", raw, pos + 4)
            if pos + 8 + size > len(raw):
                raise ValueError("lz4: skippable frame content truncated")
            pos += 8 + size
            continue
        if magic == _MAGIC_LEGACY:
            raise NotImplementedError(
                "lz4: legacy frame format (magic 0x184C2102) is not "
                "implemented — obsolete since lz4 r126; re-compress with "
                "the modern frame format"
            )
        if magic != _MAGIC:
            raise ValueError(
                f"lz4: bad magic {raw[pos:pos + 4]!r} at offset {pos}"
            )
        desc_start = pos + 4
        pos += 4
        if pos + 2 > len(raw):
            raise ValueError("lz4: frame descriptor truncated")
        flg, bd = raw[pos], raw[pos + 1]
        pos += 2
        if (flg >> 6) != 0b01:
            raise ValueError(f"lz4: unsupported frame version {flg >> 6}")
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        block_indep = bool(flg & 0x20)
        block_checksum = bool(flg & 0x10)
        has_content_size = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        has_dict_id = bool(flg & 0x01)
        if bd & 0x8F:
            raise ValueError("lz4: reserved BD bits set")
        bmax_code = (bd >> 4) & 7
        if bmax_code not in _BLOCK_MAX:
            raise ValueError(f"lz4: invalid block-maximum code {bmax_code}")
        bmax = _BLOCK_MAX[bmax_code]
        content_size = None
        if has_content_size:
            if pos + 8 > len(raw):
                raise ValueError("lz4: content size field truncated")
            (content_size,) = struct.unpack_from("<Q", raw, pos)
            pos += 8
        if has_dict_id:
            if pos + 4 > len(raw):
                raise ValueError("lz4: dictionary ID truncated")
            (did,) = struct.unpack_from("<I", raw, pos)
            raise NotImplementedError(
                f"lz4: frame requires dictionary {did}; dictionary "
                f"decompression is not implemented (corpus shards are "
                f"self-contained)"
            )
        if pos >= len(raw):
            raise ValueError("lz4: header checksum byte missing")
        want_hc = raw[pos]
        got_hc = (xxh32(raw[desc_start:pos]) >> 8) & 0xFF
        pos += 1
        if want_hc != got_hc:
            raise ValueError(
                f"lz4: header checksum mismatch ({got_hc:#04x} != "
                f"{want_hc:#04x})"
            )
        out = bytearray()
        while True:
            if pos + 4 > len(raw):
                raise ValueError("lz4: block size field truncated")
            (bsize,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if bsize > bmax:
                raise ValueError(
                    f"lz4: block size {bsize} exceeds the declared "
                    f"maximum {bmax}"
                )
            if pos + bsize > len(raw):
                raise ValueError("lz4: block data truncated")
            block = raw[pos : pos + bsize]
            pos += bsize
            if block_checksum:
                if pos + 4 > len(raw):
                    raise ValueError("lz4: block checksum truncated")
                (want,) = struct.unpack_from("<I", raw, pos)
                pos += 4
                if xxh32(block) != want:
                    raise ValueError("lz4: block checksum mismatch")
            if stored:
                out += block
            else:
                window_base = len(out) if block_indep else 0
                before = len(out)
                _decode_block(block, out, window_base)
                if len(out) - before > bmax:
                    raise ValueError(
                        "lz4: block regenerated more than the declared "
                        "maximum"
                    )
        if content_size is not None and len(out) != content_size:
            raise ValueError(
                f"lz4: content size {content_size} != regenerated "
                f"{len(out)}"
            )
        if content_checksum:
            if pos + 4 > len(raw):
                raise ValueError("lz4: content checksum truncated")
            (want,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            if xxh32(bytes(out)) != want:
                raise ValueError(
                    "lz4: content checksum mismatch — corrupt frame"
                )
        out_all += out
        saw_frame = True
    if not saw_frame:
        raise ValueError("lz4: payload holds only skippable frames")
    return bytes(out_all)


def encode_lz4_frame(
    raw: bytes,
    *,
    stored: bool = False,
    block_max_code: int = 4,
    block_checksum: bool = False,
    content_checksum: bool = True,
    content_size: bool = True,
    block_indep: bool = True,
) -> bytes:
    """One deterministic LZ4 frame. `stored=True` forces stored
    (uncompressed) blocks; otherwise each block takes the greedy
    encoder's output unless it fails to shrink the segment. Dependent
    blocks (`block_indep=False`) are emitted with per-block windows
    anyway (legal: independence only RELAXES what matches may do), so
    the decoder's cross-block window path is exercised by flag."""
    if block_max_code not in _BLOCK_MAX:
        raise ValueError(f"lz4 encoder: invalid block-maximum code")
    bmax = _BLOCK_MAX[block_max_code]
    flg = 0b01 << 6  # version bits
    if block_indep:
        flg |= 0x20
    if block_checksum:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    bd = block_max_code << 4
    desc = bytes([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(raw))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for i in range(0, max(len(raw), 1), bmax):
        seg = raw[i : i + bmax]
        if not seg:
            break
        comp = None if stored else _encode_block(seg)
        if comp is not None and len(comp) < len(seg):
            out += struct.pack("<I", len(comp))
            block = comp
        else:
            out += struct.pack("<I", 0x80000000 | len(seg))
            block = seg
        out += block
        if block_checksum:
            out += struct.pack("<I", xxh32(block))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(raw))
    return bytes(out)
