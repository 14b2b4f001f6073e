"""Multimodal column conventions: image/audio/video as opaque binary
columns with a typed metadata struct, processed by Arrow-batched
`mapInPandas` pipelines.

The DECODE/RESIZE/FRAME steps are REAL: `decode_image` (binary P6 PPM
— Netpbm interchange format, whitespace/comment-tolerant header then
h·w·3 raw bytes — AND 8-bit PNG via stdlib zlib: chunk/CRC parse,
inflate, per-scanline Sub/Up/Average/Paeth defiltering in NumPy,
round-11), `resize_image` (floor-map nearest-neighbor), `decode_y4m`
(YUV4MPEG2 C444 video, frame-stride sampling), `decode_wav`
(RIFF/WAVE 16-bit PCM container parse), and `decode_jpeg` (sequential
baseline T.81: Huffman entropy decode, dequant, vectorized IDCT,
YCbCr→RGB — round-11, see the JPEG section banner for the lossless
oracle contract) run end-to-end with no external codec and are
oracle-checkable byte for byte (`media_decode`, `media_decode_png`,
`media_decode_jpeg`, `media_decode_jpeg_progressive`,
`media_decode_jpeg_lossless`, `media_resize_decode`,
`media_video_frames`, `media_audio_decode`). The formats still out of
reach without a codec
library (arithmetic/differential JPEG, H.264/…) raise
NotImplementedError naming the production seam (PIL/cv2/ffmpeg) —
this container ships no codecs, and a fake decode would be dishonest.
Only the opaque-payload plumbing (`resize_media`, `sample_frames`)
keeps clearly-marked deterministic fakes, for the same reason.

Scale: mapInPandas streams Arrow batches through Python workers —
per-partition, no driver involvement; binary payloads never shuffle
unless the user asks for it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata convention for a media column `media: binary` + `media_meta`:
MEDIA_META_SCHEMA = "mime string, width int, height int, duration_ms int"

FEATURE_SCHEMA = "doc_id long, n_bytes int, head_byte int, sha256 string"


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize an opaque binary column (UTF-8
    bytes of the text — a deterministic stand-in for image bytes) plus
    the metadata struct every real media table carries. duration_ms is
    a deterministic synthetic (10 ms per source char) so the
    frame-sampling plumbing has a real value to stride over."""
    return docs.withColumn("media", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length(F.col(text_col)) * 10).cast("int").alias("duration_ms"),
        ),
    )


def encode_ppm(arr: "np.ndarray") -> bytes:
    """Binary P6 PPM bytes for an (h, w, 3) uint8 array — the fixture
    encoder for the decode path (and a valid interchange file any
    Netpbm tool reads)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _ppm_header_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read `n` whitespace-separated integer tokens after the magic,
    skipping `#` comments (the Netpbm header grammar). Returns
    (tokens, offset of the first raster byte)."""
    toks: list[int] = []
    i = 2  # past the magic
    cur = b""
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("PPM: truncated header")
        c = payload[i : i + 1]
        if c == b"#":
            # a comment acts as whitespace in the Netpbm grammar, so a
            # token abutting it ("255# c\n") must flush here — without
            # this the raster bytes after the comment's newline would
            # be appended to the pending token (round-10 review)
            if cur:
                toks.append(int(cur))
                cur = b""
                if len(toks) == n:
                    # the comment's newline is the raster delimiter
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                    return toks, i + 1
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            cur += c
        i += 1
    return toks, i


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, truecolor, truecolor+alpha


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_predict(
    f: int, cur: "np.ndarray", prev: "np.ndarray", w: int, ch: int
) -> "np.ndarray":
    """Reconstruct one defiltered scanline (PNG spec §9 filters):
    `cur` is the filtered int32 row (len w·ch), `prev` the RECON of
    the prior row. None/Up/Sub are vectorized (Sub is a per-channel
    cumulative sum); Average/Paeth depend on the just-reconstructed
    left pixel, so they loop over the w pixels with the ch channels
    vectorized per step."""
    if f == 0:
        return cur
    if f == 2:
        return (cur + prev) % 256
    if f == 1:
        return (cur.reshape(w, ch).cumsum(axis=0) % 256).reshape(w * ch)
    if f in (3, 4):
        cur2 = cur.reshape(w, ch)
        prev2 = prev.reshape(w, ch)
        rec2 = np.zeros((w, ch), dtype=np.int64)
        left = np.zeros(ch, dtype=np.int64)
        upleft = np.zeros(ch, dtype=np.int64)
        for x in range(w):
            up = prev2[x]
            if f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, upleft),
                )
            rec2[x] = (cur2[x] + pred) % 256
            left = rec2[x]
            upleft = up
        return rec2.reshape(w * ch)
    raise ValueError(f"PNG: unknown filter type {f}")


def encode_png(
    arr: "np.ndarray", filter_types: tuple[int, ...] = (0,)
) -> bytes:
    """REAL PNG encoder (fixture side of the round-11 decode path):
    8-bit grayscale/RGB/RGBA, zlib-deflated scanlines, each row
    filtered with `filter_types[row % len]` — cycling through 1-4
    exercises every defilter branch of `decode_png` end-to-end. Pure
    stdlib (struct + zlib) + NumPy; the output is a spec-valid PNG any
    viewer opens."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"encode_png: unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = a.reshape(h, w * ch).astype(np.int64)
    out: list[bytes] = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = filter_types[y % len(filter_types)]
        cur = rows[y]
        if f == 0:
            filt = cur
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 1:
            # Sub's predictor is the RAW left pixel (no reconstructed
            # feedback on the encode side) — one vectorized diff
            cur2 = cur.reshape(w, ch)
            filt = np.empty_like(cur2)
            filt[0] = cur2[0]
            filt[1:] = (cur2[1:] - cur2[:-1]) % 256
            filt = filt.reshape(w * ch)
        elif f in (3, 4):
            cur2 = cur.reshape(w, ch)
            prev2 = prev.reshape(w, ch)
            filt2 = np.zeros((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                up = prev2[x]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - up),
                        np.abs(p - upleft),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, upleft),
                    )
                filt2[x] = (cur2[x] - pred) % 256
                left = cur2[x]
                upleft = up
            filt = filt2.reshape(w * ch)
        else:
            raise ValueError(f"encode_png: unknown filter type {f}")
        out.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(out))
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """REAL PNG decoder via stdlib zlib (round-11 — closes the
    compressed-codec seam for PNG): chunk walk with CRC verification,
    IDAT concatenation + inflate, then per-scanline defiltering
    (None/Sub/Up/Average/Paeth, PNG spec §9) in NumPy. Supports 8-bit
    depth, color types 0 (gray), 2 (RGB), 6 (RGBA), no interlace —
    the overwhelmingly common subset; anything else raises naming the
    limit. Returns (h, w, channels) uint8."""
    import struct
    import zlib

    raw = bytes(payload)
    if raw[:8] != PNG_SIGNATURE:
        raise ValueError("PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        if pos + 12 + length > len(raw):
            raise ValueError(
                f"PNG: truncated chunk at offset {pos} — declared "
                f"length {length} overruns the {len(raw)}-byte payload"
            )
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", raw[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"PNG: only 8-bit gray/RGB/RGBA non-interlaced supported "
            f"(depth={depth}, color_type={color}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color]
    decomp = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(decomp) != h * (stride + 1):
        raise ValueError(
            f"PNG: inflated size {len(decomp)} != expected "
            f"{h * (stride + 1)} (h·(w·ch + 1))"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = decomp[y * (stride + 1) : (y + 1) * (stride + 1)]
        cur = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        rec = _png_predict(row[0], cur, prev, w, ch)
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, ch)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an (h, w, 3) uint8 array.

    REAL pure-NumPy paths for binary P6 PPM (header parse + frombuffer
    reshape), 8-bit truecolor PNG (stdlib-zlib inflate + defilter,
    `decode_png`), and baseline + PROGRESSIVE + LOSSLESS JPEG
    (hand-written Huffman/dequant/IDCT incl. chroma subsampling,
    restart markers, spectral selection and successive approximation,
    Annex-H lossless prediction, `decode_jpeg`). Any other magic
    raises NotImplementedError naming the production seam
    (arithmetic/differential JPEG and the exotic formats) — a
    deterministic fake here would silently masquerade as a decoder."""
    raw = bytes(payload)
    if raw[:2] == b"P6":
        (w, h, maxval), off = _ppm_header_tokens(raw, 3)
        if maxval != 255:
            raise ValueError(f"PPM: only maxval 255 supported, got {maxval}")
        need = w * h * 3
        raster = raw[off : off + need]
        if len(raster) < need:
            raise ValueError(
                f"PPM: raster truncated — header promises {need} bytes, "
                f"payload carries {len(raster)}"
            )
        return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    if raw[:8] == PNG_SIGNATURE:
        img = decode_png(raw)
        if img.shape[2] != 3:
            raise ValueError(
                f"decode_image: PNG color type with {img.shape[2]} "
                f"channel(s) — the (h, w, 3) contract needs truecolor "
                f"RGB (use decode_png directly for gray/RGBA)"
            )
        return img
    if raw[:2] == b"\xff\xd8":
        img = decode_jpeg(raw)
        if img.ndim != 3:
            raise ValueError(
                "decode_image: grayscale JPEG — the (h, w, 3) contract "
                "needs 3-component YCbCr (use decode_jpeg directly)"
            )
        return img
    raise NotImplementedError(
        f"image decode for magic {raw[:2]!r} requires an imaging library "
        f"(PIL/cv2) not present in this environment; P6 PPM, 8-bit PNG "
        f"and baseline+progressive+lossless JPEG (incl. subsampling/"
        f"restarts) decode natively — arithmetic/differential JPEG and the exotic "
        f"formats are the remaining seam"
    )


def media_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Arrow-batched feature extraction over the binary column:
    byte length, first byte, sha256 hex. Deterministic → oracle-checkable;
    the real decode/resize/frame-sample kernels drop into `_extract`
    unchanged (same batch shape)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media binary, "
    "media_meta struct<mime: string, width: int, height: int, duration_ms: int>"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms int, frame binary"


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize plumbing: stream (id, payload) Arrow batches through a
    per-partition kernel and emit the resized payload plus updated
    metadata. The KERNEL BODY IS A DETERMINISTIC FAKE (truncate to
    width*height bytes) because this container ships no image codecs —
    a real deployment replaces the two marked lines with
    decode→resize→encode (PIL/cv2); schema, batch shape, and
    partitioning are the real contract and are oracle-tested.

    Scale: map-only (mapInPandas) — payloads never shuffle; output
    size is bounded by width*height per row regardless of input."""
    cap = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # FAKE-RESIZE (replace with real decode→resize→encode).
            # Slices in the DECODED domain (characters of the utf-8
            # stand-in), not raw bytes: that is where a real resize
            # operates, and it keeps the SQL oracle (character
            # substring) exact for non-ASCII payloads too.
            resized = pdf[media_col].map(
                lambda b: bytes(b).decode("utf-8")[:cap].encode("utf-8")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media": resized,
                    "media_meta": [
                        {
                            "mime": "application/octet-stream",
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    frame_len: int = 16,
    id_col: str = "doc_id",
    media_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame —
    frame i at timestamp i*every_ms for i in [0, duration_ms/every_ms).
    The FRAME EXTRACTION IS A DETERMINISTIC FAKE (the i-th
    `frame_len`-character slice of the decoded payload; short/empty at
    the tail — decoded-domain slicing, like a real keyframe grab, and
    oracle-exact for non-ASCII) standing in for a video decoder; the
    row-expansion contract — one input row fans out to a variable
    number of frame rows inside the Arrow kernel — is the real
    plumbing.

    Scale: map-only fan-out; output rows = Σ duration/stride, emitted
    streaming per batch, never materialized per partition."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload, meta in zip(
                pdf[id_col], pdf[media_col], pdf[meta_col]
            ):
                duration = meta["duration_ms"] or 0
                decoded = bytes(payload).decode("utf-8")
                for i in range(duration // every_ms):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    # FAKE-DECODE (replace with real frame grab):
                    frames.append(
                        decoded[i * frame_len : (i + 1) * frame_len].encode("utf-8")
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, media_col, meta_col).mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


AUDIO_FRAME_SAMPLES = 256
AUDIO_SCHEMA = "doc_id long, frame_idx int, n_samples int, energy long"


def audio_frame_energy(
    df: DataFrame,
    frame_samples: int = AUDIO_FRAME_SAMPLES,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Windowed audio energy — the voice-activity-detection precursor
    every speech-data pipeline runs first: interpret the payload as
    16-bit little-endian PCM (a trailing odd byte is dropped), frame
    into `frame_samples` windows, and emit each frame's EXACT integer
    energy Σ sample² (int64-safe: 256·32768² < 2^38). On the test
    fixture the "PCM" is the deterministic text-bytes stand-in like
    the rest of the media family — the real content here is the
    plumbing: vectorized numpy frombuffer + square-and-segment-sum
    inside an Arrow batch, a variable fan-out of frame rows per input
    row, and integer-exact output the SQL oracle replays byte by
    byte from the hex expansion.

    Scale: map-only (payloads never shuffle); downstream VAD is a
    filter on energy/n_samples, and per-speaker rollups are ordinary
    partial-agg'd groupBys over the frame rows."""

    def _raw_pcm(payload: bytes) -> "np.ndarray":
        raw = bytes(payload)
        if len(raw) % 2:
            raw = raw[:-1]
        return np.frombuffer(raw, dtype="<i2").astype(np.int64)

    return _frame_energy_map(df, _raw_pcm, frame_samples, id_col, media_col)


def _frame_energy_map(
    df: DataFrame,
    samples_fn,
    frame_samples: int,
    id_col: str,
    media_col: str,
) -> DataFrame:
    """The ONE frame-energy kernel (round-11 review: previously copied
    between the raw-PCM and WAV paths, voiding the 'identical kernel'
    equality claim the decode oracle relies on): `samples_fn` turns a
    payload into an int64 sample array; the windowed exact Σ sample²
    is shared code."""

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                samples = samples_fn(payload)
                for i in range(0, len(samples), frame_samples):
                    w = samples[i : i + frame_samples]
                    ids.append(doc_id)
                    idxs.append(i // frame_samples)
                    ns.append(len(w))
                    es.append(int((w * w).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(_energy, schema=AUDIO_SCHEMA)


def encode_wav(
    samples: "np.ndarray", sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """REAL RIFF/WAVE encoder (fixture side of the round-11 audio
    container path): canonical 44-byte header (RIFF size, fmt chunk
    with PCM format tag 1, 16-bit depth, byte rate/block align) +
    little-endian int16 data chunk — a spec-valid WAV any player
    opens."""
    import struct

    a = np.asarray(samples, dtype="<i2")
    data = a.tobytes()
    block = channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate, sample_rate * block, block, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple["np.ndarray", int, int]:
    """REAL RIFF/WAVE container parse (round-11 — the audio column's
    end-to-end realism now matches the image/video columns): walk the
    RIFF chunks (tolerant of extras like LIST; word-aligned per spec),
    validate PCM format tag 1 at 16-bit depth, and return (samples as
    int64 1-D array in channel-interleaved order, sample_rate,
    channels). Compressed codecs (MP3/AAC/…) raise naming the
    production seam."""
    import struct

    raw = bytes(payload)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise NotImplementedError(
            f"audio decode for magic {raw[:4]!r} requires an audio "
            f"library (ffmpeg/soundfile) not present in this "
            f"environment; RIFF/WAVE 16-bit PCM decodes natively — "
            f"MP3/AAC are the remaining named seams"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        ctype = raw[pos : pos + 4]
        (length,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError(
                f"WAV: truncated {ctype!r} chunk — declared length "
                f"{length}, payload carries {len(body)}"
            )
        if ctype == b"fmt ":
            if len(body) < 16:
                raise ValueError(
                    f"WAV: fmt chunk too short ({len(body)} < 16 bytes)"
                )
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"WAV: only 16-bit PCM (format tag 1) supported, got "
            f"format={audio_format} bits={bits}"
        )
    if len(data) % 2:
        data = data[:-1]
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return samples, sample_rate, channels


def attach_wav_media(
    df: DataFrame,
    sample_rate: int = 16_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
) -> DataFrame:
    """Testdata adapter for the REAL audio decode path: wrap each
    row's UTF-8 text bytes (truncated to an even length — int16
    alignment) in a spec-valid RIFF/WAVE 16-bit PCM container, so the
    SQL oracle can replay every sample from hex(encode(text)) while
    the engine exercises the genuine container parse."""

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                if len(raw) % 2:
                    raw = raw[:-1]
                payloads.append(
                    encode_wav(
                        np.frombuffer(raw, dtype="<i2"), sample_rate
                    )
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


def wav_frame_energy(
    df: DataFrame,
    frame_samples: int = AUDIO_FRAME_SAMPLES,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """`audio_frame_energy` with the REAL container in front: parse
    the RIFF/WAVE payload (`decode_wav`), then the IDENTICAL
    frame-windowed exact integer Σ sample² (`_frame_energy_map` —
    literally shared code, so the decode step is oracle-proven byte
    for byte against the raw-PCM arithmetic). Map-only; payloads
    never shuffle."""
    return _frame_energy_map(
        df,
        lambda payload: decode_wav(payload)[0],
        frame_samples,
        id_col,
        media_col,
    )


CHANNEL_STATS_SCHEMA = "doc_id long, channel int, px_sum long, n_px long"


def attach_ppm_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
) -> DataFrame:
    """Testdata adapter for the REAL decode path: materialize a valid
    binary P6 PPM per row whose raster is the row's UTF-8 text bytes
    cycled to width·height·3 (zero bytes for empty text) — a
    deterministic image the SQL oracle can replay byte for byte from
    hex(encode(text))."""
    cap = width * height * 3

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"P6\n%d %d\n255\n" % (width, height)
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                if raw:
                    raster = (raw * (cap // len(raw) + 1))[:cap]
                else:
                    raster = bytes(cap)
                payloads.append(header + raster)
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


def attach_png_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
    filter_types: tuple[int, ...] = (4, 3, 2, 1, 0),
) -> DataFrame:
    """Testdata adapter for the COMPRESSED decode path (round-11):
    materialize a spec-valid 8-bit RGB PNG per row whose raster is the
    row's UTF-8 text bytes cycled to width·height·3 — the same raster
    contract as `attach_ppm_media`, so the same SQL oracle replays it
    byte for byte, but the engine must now run zlib inflate + real
    Sub/Up/Average/Paeth defiltering to recover it. The default
    filter cycle starts at Paeth so a 4-row fixture still exercises
    all four non-trivial filters."""
    cap = width * height * 3

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                if raw:
                    raster = (raw * (cap // len(raw) + 1))[:cap]
                else:
                    raster = bytes(cap)
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(
                    height, width, 3
                )
                payloads.append(encode_png(arr, filter_types=filter_types))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


def decode_channel_stats(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Decode → per-channel statistics, the first real kernel of any
    image-quality pipeline (channel means feed brightness/colorcast
    screens): run the REAL `decode_image` inside an Arrow batch and
    emit each channel's EXACT integer pixel sum + count (means stay
    oracle-exact as px_sum/n_px — no float in the contract).

    Scale: map-only (payloads never shuffle); output is 3 rows per
    image whatever the resolution."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chans, sums, counts = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                arr = decode_image(payload)
                per_channel = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = int(arr.shape[0] * arr.shape[1])
                for c in range(3):
                    ids.append(doc_id)
                    chans.append(c)
                    sums.append(int(per_channel[c]))
                    counts.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "channel": pd.Series(chans, dtype="int32"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "n_px": pd.Series(counts, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        _stats, schema=CHANNEL_STATS_SCHEMA
    )


def resize_image(arr: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """REAL nearest-neighbor resize of a decoded (h, w, 3) array:
    source index = floor(out_index · in_size / out_size) per axis (the
    standard floor NN map — pure integer arithmetic, so the SQL oracle
    replays every output pixel's source byte position exactly)."""
    h, w, _ = arr.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ys, xs)]


def resize_decode_stats(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """decode → REAL nearest-neighbor resize → per-channel exact
    integer pixel sums, in one Arrow kernel (the thumbnail-stats pass
    of an image pipeline). Unlike `resize_media` (whose kernel body is
    a marked fake for opaque payloads), this path is the real thing
    end-to-end for decodable (P6 PPM) payloads.

    Scale: map-only — payloads never shuffle; 3 rows out per image."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chans, sums, counts = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                small = resize_image(decode_image(payload), out_w, out_h)
                per_channel = small.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                for c in range(3):
                    ids.append(doc_id)
                    chans.append(c)
                    sums.append(int(per_channel[c]))
                    counts.append(out_w * out_h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "channel": pd.Series(chans, dtype="int32"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "n_px": pd.Series(counts, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        _stats, schema=CHANNEL_STATS_SCHEMA
    )


def encode_y4m(frames: "np.ndarray") -> bytes:
    """YUV4MPEG2 (Y4M) bytes for an (n, 3, h, w) uint8 planar-frame
    array — the standard UNCOMPRESSED video interchange container
    (mjpegtools/ffmpeg `-f yuv4mpeg`), C444 = three full-resolution
    planes per frame. The fixture encoder for the video decode path;
    any ffmpeg reads the output."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[1] != 3:
        raise ValueError(f"expected (n, 3, h, w) planar frames, got {a.shape}")
    n, _, h, w = a.shape
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(a[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> "np.ndarray":
    """REAL pure-NumPy Y4M decode: parse the stream header (W/H/C
    tags), then split FRAME sections into (n, 3, h, w) uint8 planar
    arrays. Only the uncompressed C444 layout is supported — like
    `decode_image`, anything else raises naming the production seam
    (ffmpeg/PyAV) rather than faking a codec."""
    raw = bytes(payload)
    if not raw.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            f"video decode for magic {raw[:9]!r} requires a codec library "
            f"(ffmpeg/PyAV) not present in this environment; uncompressed "
            f"YUV4MPEG2 decodes natively"
        )
    nl = raw.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M: truncated header (no newline)")
    tags = raw[:nl].split(b" ")[1:]
    w = h = None
    colorspace = b"C420jpeg"  # the Y4M default when no C tag is present
    for t in tags:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"C":
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M: header missing W/H tags")
    if colorspace != b"C444":
        raise NotImplementedError(
            f"Y4M colorspace {colorspace!r}: only C444 (full-resolution "
            f"planes) is supported; subsampled layouts need a real "
            f"swscale path"
        )
    frame_bytes = 3 * w * h
    frames = []
    i = nl + 1
    while i < len(raw):
        if raw[i : i + 5] != b"FRAME":
            raise ValueError(f"Y4M: expected FRAME marker at offset {i}")
        fnl = raw.find(b"\n", i)
        if fnl < 0:
            raise ValueError(f"Y4M: truncated FRAME header at offset {i}")
        i = fnl + 1
        plane = raw[i : i + frame_bytes]
        if len(plane) < frame_bytes:
            raise ValueError(
                f"Y4M: frame truncated — need {frame_bytes} bytes, "
                f"payload carries {len(plane)}"
            )
        frames.append(
            np.frombuffer(plane, dtype=np.uint8).reshape(3, h, w)
        )
        i += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, 3, h, w), np.uint8)


def attach_y4m_media(
    df: DataFrame,
    width: int,
    height: int,
    n_frames: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
) -> DataFrame:
    """Testdata adapter for the REAL video path: a valid C444 Y4M per
    row whose concatenated frame planes are the row's UTF-8 text bytes
    cycled to n_frames·3·width·height (zero bytes for empty text) —
    deterministic, so the SQL oracle replays every plane byte from
    hex(encode(text))."""
    cap = n_frames * 3 * width * height

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (width, height)
        fb = 3 * width * height
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                raster = (
                    (raw * (cap // len(raw) + 1))[:cap] if raw else bytes(cap)
                )
                parts = [header]
                for f in range(n_frames):
                    parts.append(b"FRAME\n")
                    parts.append(raster[f * fb : (f + 1) * fb])
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx int, channel int, px_sum long, n_px long"
)


def video_frame_stats(
    df: DataFrame,
    every: int = 1,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """REAL video decode → frame sampling → per-plane statistics in one
    Arrow kernel: decode the Y4M, keep every `every`-th frame (the
    keyframe-sampling stride every video pipeline runs), and emit each
    sampled frame's per-plane EXACT integer pixel sum — the
    brightness/scene-change screen. Replaces this family's last
    deterministic fake with a real uncompressed-container path
    (`sample_frames` keeps its marked fake for opaque payloads).

    Scale: map-only — payloads never shuffle; output rows =
    3 · ceil(frames/every) per video whatever the resolution."""
    if every < 1:
        raise ValueError(f"video_frame_stats: every must be >= 1, got {every}")

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, chans, sums, counts = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                frames = decode_y4m(payload)
                n_px = int(frames.shape[2] * frames.shape[3])
                for f in range(0, frames.shape[0], every):
                    per_plane = frames[f].reshape(3, -1).sum(
                        axis=1, dtype=np.int64
                    )
                    for c in range(3):
                        ids.append(doc_id)
                        fidx.append(f)
                        chans.append(c)
                        sums.append(int(per_plane[c]))
                        counts.append(n_px)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "channel": pd.Series(chans, dtype="int32"),
                    "px_sum": pd.Series(sums, dtype="int64"),
                    "n_px": pd.Series(counts, dtype="int64"),
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        _stats, schema=FRAME_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81) — round-11: the last named codec seam.
#
# A REAL JPEG codec in pure NumPy + stdlib: segment walk
# (SOI/APPn/DQT/SOF0/SOF1/SOF2/SOF3/DHT/SOS/EOI), canonical Huffman entropy
# decode with 0xFF00 byte-unstuffing, DC prediction, run-length AC,
# dequantization, inverse zigzag, vectorized 8x8 IDCT (orthonormal
# DCT-III via one einsum over all blocks), edge-padding crop, and
# BT.601 YCbCr->RGB. Supports 8-bit precision, 1- or 3-component
# scans with full sampling-factor interleave (4:4:4 / 4:2:2 / 4:2:0
# and any integer-ratio factors), DRI/RSTn restart intervals, AND
# (round 12) PROGRESSIVE (SOF2) frames — spectral selection,
# successive approximation, EOBn runs, per-scan table redefinition —
# AND (round 13) LOSSLESS (SOF3) frames — Annex H prediction
# (selectors 1-7), point transform, row-aligned restart segments;
# differential (SOF5-7) and arithmetic coding raise a named limit.
# Reference parity: realtime0523 has no media
# path at all —
# this implements the multimodal column contract the task brief
# specifies, against the public T.81 spec (Annex F decode procedure,
# Annex K tables).
#
# EXACTNESS CONTRACT for the oracle-backed fixture: JPEG is lossy in
# general, but an image made of CONSTANT 8x8 blocks with neutral
# chroma round-trips EXACTLY when the luma DC quantization step
# divides the DC coefficient: a constant block's DCT is pure DC
# (F00 = 8*(v-128); every AC is 0 up to float eps, quantized to 0),
# so with DC step 8 the quantized DC is v-128 exactly, the IDCT of a
# pure-DC block is the constant F00/8, and Cb=Cr=128 makes the color
# transform the identity on all three channels. `attach_jpeg_media`
# builds exactly such images, which is what lets a SQL oracle replay
# the decoded pixels; the general lossy path is exercised separately
# in unit tests (random images, bounded error; exact Huffman/zigzag
# round-trip on random coefficient blocks).
# ---------------------------------------------------------------------------

# Zigzag scan order: ZIGZAG[k] = row-major index of the k-th zigzag
# coefficient (T.81 Figure 5).
JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 quantization tables (row-major).
JPEG_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
JPEG_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3-K.6 typical Huffman tables as (BITS[1..16], HUFFVAL).
_JPEG_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_JPEG_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct8_matrix() -> "np.ndarray":
    """Orthonormal 8-point DCT-II matrix M (M @ f @ M.T is exactly the
    T.81 FDCT including its 1/4*C(u)C(v) scaling)."""
    x = np.arange(8, dtype=np.float64)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= np.sqrt(2.0 / 8.0)
    m[0] = np.sqrt(1.0 / 8.0)
    return m


_DCT8 = _dct8_matrix()


# Canonical-table cache keyed by the (BITS, HUFFVAL) spec: the Annex-K
# tables recur in every payload of a fixture corpus, and rebuilding the
# 162-entry AC map per image is the dominant non-entropy cost of the
# per-row decode. Size-capped: wild corpora carry per-image optimized
# tables (libjpeg -optimize), so an unbounded dict would leak in a
# long-lived worker — on overflow the cache resets, costing a rebuild,
# never memory.
_HUFF_CACHE: dict[tuple, dict] = {}
_HUFF_CACHE_MAX = 64


def _huff_canonical(bits: list[int], huffval: list[int]):
    """(code, size) per symbol from a DHT (BITS, HUFFVAL) spec — the
    canonical assignment of T.81 Annex C."""
    key = (tuple(bits), tuple(huffval))
    cached = _HUFF_CACHE.get(key)
    if cached is not None:
        return cached
    if sum(bits) != len(huffval):
        raise ValueError(
            f"JPEG: DHT declares {sum(bits)} codes, carries {len(huffval)}"
        )
    enc, code, i = {}, 0, 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            if code >= (1 << size):
                raise ValueError("JPEG: DHT over-subscribed Huffman tree")
            enc[huffval[i]] = (code, size)
            code += 1
            i += 1
        code <<= 1
    if len(_HUFF_CACHE) >= _HUFF_CACHE_MAX:
        _HUFF_CACHE.clear()
    _HUFF_CACHE[key] = enc
    return enc


def _huff_decode_map(bits: list[int], huffval: list[int]) -> dict:
    """(size, code) -> symbol map for the decoder, cached like the
    encode direction."""
    key = ("dec", tuple(bits), tuple(huffval))
    cached = _HUFF_CACHE.get(key)
    if cached is None:
        cached = {
            (size, code): sym
            for sym, (code, size) in _huff_canonical(bits, huffval).items()
        }
        if len(_HUFF_CACHE) >= _HUFF_CACHE_MAX:
            _HUFF_CACHE.clear()
        _HUFF_CACHE[key] = cached
    return cached


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF -> 0xFF
    0x00) and 1-padding of the final byte."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align_marker(self, marker: int) -> None:
        """1-pad to a byte boundary and emit a bare marker (RSTn):
        marker bytes are written verbatim — never byte-stuffed."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)
        self._out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)
        return bytes(self._out)


class _JpegBitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self._pos >= len(self._data):
                raise ValueError("JPEG: entropy stream exhausted mid-block")
            self._acc = self._data[self._pos]
            self._pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, decode_map: dict) -> int:
        code, size = 0, 0
        while size < 16:
            code = (code << 1) | self.read_bit()
            size += 1
            sym = decode_map.get((size, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code (no match in 16 bits)")


def _jpeg_category(v: int) -> int:
    """SSSS magnitude category: smallest n with |v| < 2^n."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_value_bits(v: int, cat: int) -> int:
    """T.81 F.1.2.1 value encoding: v>=0 verbatim, v<0 as v+2^cat-1."""
    return v if v >= 0 else v + (1 << cat) - 1


def _jpeg_extend(bits: int, cat: int) -> int:
    """Inverse of `_jpeg_value_bits` (T.81 F.2.2.1 EXTEND)."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _entropy_encode_block(
    w: "_JpegBitWriter", zz: "np.ndarray", pred: int, dc_enc: dict, ac_enc: dict
) -> int:
    diff = int(zz[0]) - pred
    cat = _jpeg_category(diff)
    w.write(dc_enc[cat][0], dc_enc[cat][1])
    if cat:
        w.write(_jpeg_value_bits(diff, cat), cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.write(ac_enc[0xF0][0], ac_enc[0xF0][1])  # ZRL
            run -= 16
        cat = _jpeg_category(v)
        sym = (run << 4) | cat
        if sym not in ac_enc:
            raise ValueError(
                f"JPEG encode: AC symbol {sym:#x} missing from the "
                f"Huffman table (coefficient {v} at zigzag {k})"
            )
        w.write(ac_enc[sym][0], ac_enc[sym][1])
        w.write(_jpeg_value_bits(v, cat), cat)
        run = 0
    if run:
        w.write(ac_enc[0x00][0], ac_enc[0x00][1])  # EOB
    return int(zz[0])


def _entropy_decode_block(
    r: "_JpegBitReader", pred: int, dc_dec: dict, ac_dec: dict
) -> tuple["np.ndarray", int]:
    zz = np.zeros(64, dtype=np.int64)
    cat = r.read_symbol(dc_dec)
    if cat > 11:
        raise ValueError(f"JPEG: DC category {cat} > 11")
    dc = pred + _jpeg_extend(r.read_bits(cat), cat)
    zz[0] = dc
    k = 1
    while k < 64:
        sym = r.read_symbol(ac_dec)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            # k == 64 is legal: 16 zeros filling the block exactly to
            # the end (libjpeg accepts such streams from third-party
            # encoders; the while condition ends the block) — only a
            # run PAST the block is a stream defect (round-11 advice)
            if k > 64:
                raise ValueError("JPEG: ZRL overflows the 8x8 block")
            continue
        run, cat = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("JPEG: AC run overflows the 8x8 block")
        zz[k] = _jpeg_extend(r.read_bits(cat), cat)
        k += 1
    return zz, dc


def _rgb_to_ycbcr(rgb: "np.ndarray") -> "np.ndarray":
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: "np.ndarray") -> "np.ndarray":
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _plane_to_blocks(
    plane: "np.ndarray", bh: int | None = None, bw: int | None = None
) -> tuple["np.ndarray", int, int]:
    """Edge-replicate a (h, w) float plane to the (bh, bw) block grid
    (defaults: the smallest 8-multiples) and return (n_blocks, 8, 8)
    in row-major block order."""
    h, w = plane.shape
    bh = -(-h // 8) if bh is None else bh
    bw = -(-w // 8) if bw is None else bw
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(bh * bw, 8, 8), bh, bw


def _downsample_mean(
    plane: "np.ndarray", fy: int, fx: int
) -> "np.ndarray":
    """fy x fx block-mean chroma downsampling (what real encoders do
    for 4:2:0/4:2:2), edge-padding ragged borders first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ch, cw = -(-h // fy), -(-w // fx)
    padded = np.pad(
        plane, ((0, ch * fy - h), (0, cw * fx - w)), mode="edge"
    )
    return padded.reshape(ch, fy, cw, fx).mean(axis=(1, 3))


_JPEG_SAMPLING = {
    "4:4:4": ((1, 1), (1, 1), (1, 1)),
    "4:2:2": ((2, 1), (1, 1), (1, 1)),
    "4:2:0": ((2, 2), (1, 1), (1, 1)),
}


def _blocks_to_plane(
    blocks: "np.ndarray", bh: int, bw: int, h: int, w: int
) -> "np.ndarray":
    full = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
    return full.reshape(bh * 8, bw * 8)[:h, :w]


def _jpeg_plan(img, quant_luma, quant_chroma, sampling):
    """Shared encoder prep (baseline AND progressive): color
    transform, chroma downsample, FDCT, quantize, zigzag — returns
    (gray, h, w, factors, zz_planes, grids, ql, qc, enc_tabs)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = (quant_luma if quant_luma is not None else JPEG_QUANT_LUMA).astype(
        np.int64
    )
    qc = (
        quant_chroma if quant_chroma is not None else JPEG_QUANT_CHROMA
    ).astype(np.int64)
    if sampling not in _JPEG_SAMPLING:
        raise ValueError(
            f"JPEG encode: sampling {sampling!r} not one of "
            f"{sorted(_JPEG_SAMPLING)}"
        )
    if gray:
        factors = ((1, 1),)
        planes = [img.astype(np.float64)]
        qtab_l = [ql]
    else:
        factors = _JPEG_SAMPLING[sampling]
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qtab_l = [ql, qc, qc]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # Per-component downsample + FDCT + quantize + zigzag, block grids
    # sized to full MCU coverage so the interleave below never rags.
    zz_planes, grids = [], []
    for plane, qt, (hi, vi) in zip(planes, qtab_l, factors):
        ds = _downsample_mean(plane, vmax // vi, hmax // hi)
        blocks, bhi, bwi = _plane_to_blocks(
            ds - 128.0, mcuy * vi, mcux * hi
        )
        coef = np.einsum("ux,nxy,vy->nuv", _DCT8, blocks, _DCT8)
        quant = np.round(coef.reshape(-1, 64) / qt.reshape(64))
        zz_planes.append(quant[:, JPEG_ZIGZAG].astype(np.int64))
        grids.append((bhi, bwi))

    dc_l = _huff_canonical(*_JPEG_DC_LUMA)
    ac_l = _huff_canonical(*_JPEG_AC_LUMA)
    dc_c = _huff_canonical(*_JPEG_DC_CHROMA)
    ac_c = _huff_canonical(*_JPEG_AC_CHROMA)
    enc_tabs = [(dc_l, ac_l)] + ([] if gray else [(dc_c, ac_c)] * 2)
    return gray, h, w, factors, zz_planes, grids, ql, qc, enc_tabs


def _jpeg_header(gray, h, w, factors, ql, qc, sof_marker, restart_interval):
    """SOI..DHT header segments shared by both encoders; `sof_marker`
    is 0xFFC0 (baseline) or 0xFFC2 (progressive)."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(ql.reshape(64)[JPEG_ZIGZAG].astype(np.uint8))
    if not gray:
        dqt += bytes([1]) + bytes(qc.reshape(64)[JPEG_ZIGZAG].astype(np.uint8))
    out += seg(0xFFDB, dqt)
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(sof_marker, sof)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    dht = b""
    for tc_th, (bits, vals) in (
        ((0x00, _JPEG_DC_LUMA), (0x10, _JPEG_AC_LUMA))
        + (((0x01, _JPEG_DC_CHROMA), (0x11, _JPEG_AC_CHROMA)) if not gray else ())
    ):
        dht += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += seg(0xFFC4, dht)
    return out, seg


def encode_jpeg(
    img: "np.ndarray",
    quant_luma: "np.ndarray | None" = None,
    quant_chroma: "np.ndarray | None" = None,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Sequential-baseline JFIF bytes for a (h, w, 3) RGB or (h, w)
    grayscale uint8 array: Annex K typical Huffman tables, Annex
    K.1/K.2 quantization unless overridden (the oracle fixture
    overrides the luma DC step to 8 — see the module banner's
    exactness contract), 4:4:4 / 4:2:2 / 4:2:0 chroma sampling
    (block-mean downsample), optional DRI/RSTn restart intervals.
    Encoder exists for fixtures and round-trip tests; the engine-side
    kernel is `decode_jpeg`."""
    gray, h, w, factors, zz_planes, grids, ql, qc, enc_tabs = _jpeg_plan(
        img, quant_luma, quant_chroma, sampling
    )
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    writer = _JpegBitWriter()
    preds = [0] * len(zz_planes)
    rst = 0
    for n in range(mcuy * mcux):
        if restart_interval and n and n % restart_interval == 0:
            writer.align_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            preds = [0] * len(zz_planes)
        my, mx = divmod(n, mcux)
        for ci, zz in enumerate(zz_planes):
            hi, vi = factors[ci]
            bwi = grids[ci][1]
            for by in range(vi):
                for bx in range(hi):
                    bidx = (my * vi + by) * bwi + (mx * hi + bx)
                    preds[ci] = _entropy_encode_block(
                        writer, zz[bidx], preds[ci], *enc_tabs[ci]
                    )
    scan = writer.flush()

    out, seg = _jpeg_header(
        gray, h, w, factors, ql, qc, 0xFFC0, restart_interval
    )
    nf = 1 if gray else 3
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _true_block_extent(h, w, hi, vi, hmax, vmax):
    """Non-interleaved block walk extent (T.81 G.1/A.2): a
    single-component scan covers ceil(comp_dim/8) blocks of the
    component's TRUE dims — never the MCU-padded grid."""
    cw = -(-w * hi // hmax)
    ch = -(-h * vi // vmax)
    return -(-ch // 8), -(-cw // 8)


def _restart_boundaries(w: "_JpegBitWriter", n_blocks: int, ri: int):
    """Yield (block_index, at_restart) pairs; the caller flushes its
    run state before each restart, then this emits the aligned cyclic
    RSTn marker (restart segments are independently byte-aligned and
    EOB runs cannot cross them — T.81 F.2.1.3.1 applies per scan)."""
    rst = 0
    for n in range(n_blocks):
        if ri and n and n % ri == 0:
            yield n, True
            w.align_marker(0xD0 + rst)
            rst = (rst + 1) & 7
        yield n, False


def _encode_ac_first_scan(
    w: "_JpegBitWriter", blocks, ss: int, se: int, al: int, ac_enc: dict,
    restart_interval: int = 0,
) -> None:
    """Progressive AC first pass for one band (T.81 G.1.2.2 /
    libjpeg encode_mcu_AC_first): run-length symbols over the
    point-transformed magnitudes with EOBn run accumulation."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            w.write(*ac_enc[r << 4])
            if r:
                w.write(eobrun - (1 << r), r)
            eobrun = 0

    for n, at_restart in _restart_boundaries(
        w, len(blocks), restart_interval
    ):
        if at_restart:
            flush_eob()
            continue
        blk = blocks[n]
        r = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = (-v if v < 0 else v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                w.write(*ac_enc[0xF0])
                r -= 16
            s = t.bit_length()
            sv = t if v >= 0 else -t
            w.write(*ac_enc[(r << 4) | s])
            w.write(_jpeg_value_bits(sv, s), s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:  # EOBn caps at n=14 (T.81 G.1.2.2)
                flush_eob()
    flush_eob()


def _encode_ac_refine_scan(
    w: "_JpegBitWriter", blocks, ss: int, se: int, al: int, ac_enc: dict,
    restart_interval: int = 0,
) -> None:
    """Progressive AC refinement (T.81 G.1.2.3 / libjpeg
    encode_mcu_AC_refine): newly-significant coefficients as
    (run, 1) symbols + sign, already-significant ones as buffered
    correction bits flushed after the next emitted symbol, trailing
    end-of-band blocks folded into EOBn runs."""
    eobrun = 0
    pending: list[int] = []  # correction bits awaiting the next symbol

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            w.write(*ac_enc[r << 4])
            if r:
                w.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            w.write(b, 1)
        pending.clear()

    for n, at_restart in _restart_boundaries(
        w, len(blocks), restart_interval
    ):
        if at_restart:
            flush_eob()
            continue
        blk = blocks[n]
        absv = [
            ((-int(blk[k]) if int(blk[k]) < 0 else int(blk[k])) >> al)
            for k in range(ss, se + 1)
        ]
        eob = -1  # band-relative index of the LAST newly-significant
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        block_bits: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eob()
                w.write(*ac_enc[0xF0])
                r -= 16
                for b in block_bits:
                    w.write(b, 1)
                block_bits = []
            if t > 1:
                # already significant: its bit at Al is a correction
                # bit, buffered until the next emitted symbol
                block_bits.append(t & 1)
                continue
            flush_eob()
            w.write(*ac_enc[(r << 4) | 1])
            w.write(0 if int(blk[ss + i]) < 0 else 1, 1)
            for b in block_bits:
                w.write(b, 1)
            block_bits = []
            r = 0
        if r > 0 or block_bits:
            eobrun += 1
            pending.extend(block_bits)
            if eobrun == 0x7FFF or len(pending) > 900:
                flush_eob()
    flush_eob()


# Progressive AC scans need EOBn symbols (0x10..0xE0) the Annex-K
# baseline AC tables don't define — real progressive encoders emit
# custom Huffman tables (libjpeg generates per-scan optimal ones).
# This fixture table assigns every symbol a progressive AC scan can
# emit — (run, size) for size 1..10, ZRL, EOB0..EOB14 — a flat 8-bit
# code each (176/256 Kraft, no all-ones code, T.81 C.2-valid).
_JPEG_AC_PROG_SYMS = sorted(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [r << 4 for r in range(15)]
)
_JPEG_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, len(_JPEG_AC_PROG_SYMS), 0, 0, 0, 0, 0, 0, 0, 0],
    _JPEG_AC_PROG_SYMS,
)


def encode_jpeg_progressive(
    img: "np.ndarray",
    quant_luma: "np.ndarray | None" = None,
    quant_chroma: "np.ndarray | None" = None,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """PROGRESSIVE (SOF2) JFIF bytes for the same inputs as
    `encode_jpeg`, with a libjpeg-style scan script exercising every
    progressive mode the decoder supports: interleaved DC first pass
    at Al=1, DC refinement to Al=0 (successive approximation of the
    two's-complement DC), then per component spectral-selection AC
    first passes at Al=1 (luma split into the 1-5 and 6-63 bands the
    way cjpeg's default script does) and AC refinements to Al=0
    (newly-significant (run,1)+sign symbols, buffered correction
    bits, EOBn runs). Quantized coefficients are IDENTICAL to the
    baseline encoder's for the same inputs, so the decoded pixels of
    the progressive and baseline encodings match exactly — the
    round-trip contract the tests pin. `restart_interval` emits
    DRI + cyclic RSTn segments in EVERY scan (DC predictions and EOB
    runs reset per segment, per T.81 F.2.1.3.1)."""
    gray, h, w, factors, zz_planes, grids, ql, qc, enc_tabs = _jpeg_plan(
        img, quant_luma, quant_chroma, sampling
    )
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    nf = len(zz_planes)
    ri = restart_interval

    out, seg = _jpeg_header(gray, h, w, factors, ql, qc, 0xFFC2, ri)

    def sos(comp_specs, ss, se, ah, al, scan_bytes):
        hdr = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            hdr += bytes([cid, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, hdr) + scan_bytes

    # -- scan 1: DC first pass, interleaved, Al=1 --------------------
    wtr = _JpegBitWriter()
    preds = [0] * nf
    for n, at_restart in _restart_boundaries(wtr, mcuy * mcux, ri):
        if at_restart:
            preds = [0] * nf
            continue
        my, mx = divmod(n, mcux)
        for ci, zz in enumerate(zz_planes):
            hi, vi = factors[ci]
            bwi = grids[ci][1]
            dc_enc = enc_tabs[ci][0]
            for by in range(vi):
                for bx in range(hi):
                    bidx = (my * vi + by) * bwi + (mx * hi + bx)
                    v = int(zz[bidx][0]) >> 1  # point transform Al=1
                    diff = v - preds[ci]
                    preds[ci] = v
                    cat = _jpeg_category(diff)
                    wtr.write(*dc_enc[cat])
                    if cat:
                        wtr.write(_jpeg_value_bits(diff, cat), cat)
    specs = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nf)]
    out += sos(specs, 0, 0, 0, 1, wtr.flush())

    # -- scan 2: DC refinement to Al=0, interleaved ------------------
    wtr = _JpegBitWriter()
    for n, at_restart in _restart_boundaries(wtr, mcuy * mcux, ri):
        if at_restart:
            continue
        my, mx = divmod(n, mcux)
        for ci, zz in enumerate(zz_planes):
            hi, vi = factors[ci]
            bwi = grids[ci][1]
            for by in range(vi):
                for bx in range(hi):
                    bidx = (my * vi + by) * bwi + (mx * hi + bx)
                    wtr.write(int(zz[bidx][0]) & 1, 1)
    out += sos(specs, 0, 0, 1, 0, wtr.flush())

    # -- AC scans: per component, non-interleaved true-extent blocks.
    # The Annex-K AC tables carry no EOBn symbols, so REDEFINE AC0/AC1
    # mid-stream with the progressive table first — real progressive
    # files do exactly this (per-scan DHT), and the decoder must bind
    # each scan to the tables in effect at ITS SOS, not the header's.
    prog_dht = b""
    for th in range(2 if nf > 1 else 1):
        prog_dht += (
            bytes([0x10 | th])
            + bytes(_JPEG_AC_PROG[0])
            + bytes(_JPEG_AC_PROG[1])
        )
    out += seg(0xFFC4, prog_dht)
    ac_enc = _huff_canonical(*_JPEG_AC_PROG)

    def comp_blocks(ci):
        hi, vi = factors[ci]
        cbh, cbw = _true_block_extent(h, w, hi, vi, hmax, vmax)
        bwi = grids[ci][1]
        return [
            zz_planes[ci][r * bwi + c]
            for r in range(cbh)
            for c in range(cbw)
        ]

    def bands(ci):
        return [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]

    for ci in range(nf):
        blocks = comp_blocks(ci)
        td, ta = (0, 0) if ci == 0 else (1, 1)
        for ss, se in bands(ci):
            wtr = _JpegBitWriter()
            _encode_ac_first_scan(wtr, blocks, ss, se, 1, ac_enc, ri)
            out += sos([(ci + 1, td, ta)], ss, se, 0, 1, wtr.flush())
    for ci in range(nf):
        blocks = comp_blocks(ci)
        td, ta = (0, 0) if ci == 0 else (1, 1)
        for ss, se in bands(ci):
            wtr = _JpegBitWriter()
            _encode_ac_refine_scan(wtr, blocks, ss, se, 0, ac_enc, ri)
            out += sos([(ci + 1, td, ta)], ss, se, 1, 0, wtr.flush())

    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _lossless_predict(
    rec: "np.ndarray",
    x: int,
    y: int,
    first_row: int,
    predictor: int,
    default: int,
) -> int:
    """T.81 H.1.2.1 prediction for sample (x, y) of one component
    plane. `rec` holds already-decoded samples (identical to the
    source on the encode side — lossless), `first_row` is the first
    line of the current restart segment (restart intervals are
    processed as independent scans — H.2.1.3 — so samples above the
    segment are unavailable), `default` = 2^(P - Pt - 1)."""
    if y == first_row:
        # scan/segment start: the leading sample takes the default
        # prediction, the rest of the first line predictor 1 (left)
        return default if x == 0 else int(rec[y, x - 1])
    if x == 0:
        return int(rec[y - 1, x])  # line starts use predictor 2 (above)
    a = int(rec[y, x - 1])
    b = int(rec[y - 1, x])
    c = int(rec[y - 1, x - 1])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # predictor 7


def encode_jpeg_lossless(
    img: "np.ndarray",
    predictor: int = 1,
    point_transform: int = 0,
    restart_rows: int = 0,
) -> bytes:
    """LOSSLESS (SOF3) JPEG bytes for an (h, w, 3) RGB or (h, w)
    grayscale uint8 array — T.81 Annex H: per-sample prediction
    (selector 1-7 in Ss), difference categories Huffman-coded with
    the Annex K DC tables (SSSS + magnitude bits, the DC-coefficient
    procedure of H.1.2.2), one interleaved scan with Hi=Vi=1
    components coded directly (lossless mandates no color transform),
    optional point transform Pt (samples coded as sample >> Pt), and
    optional restart intervals aligned to row boundaries
    (DRI = restart_rows·w MCUs; each segment restarts prediction as
    an independent scan per H.2.1.3). Encoder exists for fixtures and
    round-trip tests; the engine-side kernel is `decode_jpeg`'s SOF3
    path (`_decode_jpeg_lossless`)."""
    import struct

    if not (1 <= predictor <= 7):
        raise ValueError(
            f"JPEG lossless: predictor selector {predictor} outside 1..7"
        )
    if not (0 <= point_transform <= 7):
        raise ValueError(
            f"JPEG lossless: point transform {point_transform} outside 0..7"
        )
    arr = np.asarray(img, dtype=np.uint8)
    gray = arr.ndim == 2
    planes = [arr] if gray else [arr[:, :, i] for i in range(arr.shape[2])]
    h, w = planes[0].shape
    nf = len(planes)
    pt = point_transform
    default = 1 << (8 - pt - 1)
    ri = restart_rows * w if restart_rows else 0

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        # Tq is meaningless in lossless frames (no quantization): 0
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xFFC3, sof)
    dht = bytes([0x00]) + bytes(_JPEG_DC_LUMA[0]) + bytes(_JPEG_DC_LUMA[1])
    if nf > 1:
        dht += (
            bytes([0x01])
            + bytes(_JPEG_DC_CHROMA[0])
            + bytes(_JPEG_DC_CHROMA[1])
        )
    out += seg(0xFFC4, dht)
    if ri:
        out += seg(0xFFDD, struct.pack(">H", ri))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, (0 if ci == 0 else 1) << 4])
    # lossless SOS trailer: Ss = predictor selector, Se = 0, Ah = 0,
    # Al = point transform (T.81 Table H.2)
    sos += bytes([predictor, 0, pt])
    out += seg(0xFFDA, sos)

    shifted = [p.astype(np.int64) >> pt for p in planes]
    enc_tabs = [
        _huff_canonical(*(_JPEG_DC_LUMA if ci == 0 else _JPEG_DC_CHROMA))
        for ci in range(nf)
    ]
    writer = _JpegBitWriter()
    rst = 0
    first_row = 0
    for n in range(h * w):
        y, x = divmod(n, w)
        if ri and n and n % ri == 0:
            writer.align_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            first_row = y  # row-aligned DRI: n % ri == 0 implies x == 0
        for ci in range(nf):
            px = _lossless_predict(
                shifted[ci], x, y, first_row, predictor, default
            )
            # 8-bit samples with unclamped predictors keep the plain
            # difference within ±510 (SSSS <= 9), inside the Annex K
            # DC tables' 0..11 symbol range — no mod-2^16 wrap needed
            # on the encode side (the decoder still reduces mod 2^16
            # per H.2.2)
            diff = int(shifted[ci][y, x]) - px
            cat = _jpeg_category(diff)
            code, size = enc_tabs[ci][cat]
            writer.write(code, size)
            if cat:
                writer.write(_jpeg_value_bits(diff, cat), cat)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """REAL sequential-baseline JPEG decoder (round-11 — closes the
    last named codec seam): segment walk, DQT/DHT table load,
    SOF0/SOF1 frame parse (extended sequential at 8-bit precision is
    decode-identical to baseline), entropy scan with 0xFF00
    unstuffing, per-MCU Huffman
    DC/AC decode with full sampling-factor interleave (4:4:4 / 4:2:2
    / 4:2:0 and any integer-ratio factors 1..4), DRI/RSTn restart
    intervals (per-segment byte alignment, DC prediction reset,
    cyclic marker validation), dequantize + inverse zigzag, one
    vectorized einsum IDCT over every block of each component,
    nearest-neighbor chroma upsample, crop, and BT.601 YCbCr->RGB
    for 3-component frames. 1 or 3 components, 8-bit precision;
    PROGRESSIVE (SOF2) multi-scan frames decode natively since round
    12 — spectral-selection bands, successive-approximation DC/AC
    refinement with EOBn runs, per-scan DHT/DRI rebinding
    (`_decode_jpeg_progressive`) — and LOSSLESS (SOF3) frames since
    round 13 — Annex H prediction selectors 1-7, point transform,
    row-aligned restart segments (`_decode_jpeg_lossless`);
    differential (SOF5-7) and arithmetic coding raise a named limit.
    Returns (h, w, 3) uint8 for color, (h, w) for grayscale."""
    import struct

    raw = bytes(payload)
    if raw[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad SOI signature")
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(cid, tq, hi, vi)])
    progressive = False
    lossless = False
    # every SOS in the file: (comps, ss, se, ah, al, data, ri, tables)
    scans: list[tuple] = []
    restart_interval = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {pos}")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte padding before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM/RSTn are standalone (no length field); outside a
            # scan they carry nothing — skip, don't misread a length
            pos += 2
            continue
        if marker in (0xC5, 0xC6, 0xC7):
            raise NotImplementedError(
                "JPEG: only sequential (SOF0/SOF1), progressive "
                f"(SOF2) and lossless (SOF3) Huffman frames are "
                f"supported — SOF{marker - 0xC0} (differential) needs "
                "a full codec library (PIL/cv2), the named seam"
            )
        if 0xC8 <= marker <= 0xCB or 0xCD <= marker <= 0xCF:
            raise NotImplementedError(
                "JPEG: arithmetic-coded frames are not supported "
                "(named seam — baseline Huffman only)"
            )
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        body = raw[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError(f"JPEG: truncated segment {marker:#x}")
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: only 8-bit DQT supported")
                zz = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                tab = np.zeros(64, dtype=np.int64)
                tab[JPEG_ZIGZAG] = zz
                qtabs[tq] = tab
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htabs[(tc, th)] = _huff_decode_map(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0 baseline / SOF1 extended sequential (at the
            # supported 8-bit precision its decode procedure is
            # byte-identical to baseline — the extension is 12-bit
            # samples, which the precision check below names, and up
            # to 4 Huffman tables, which the table registry already
            # carries) / SOF2 progressive / SOF3 lossless
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"JPEG: {nf}-component frames unsupported (1=gray "
                    "and 3=YCbCr — incl. 4:2:0/4:2:2 subsampling — are "
                    "the implemented subset; CMYK needs the PIL seam)"
                )
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"JPEG: sampling factors {hi}x{vi} outside "
                        "the spec range 1..4"
                    )
                comps.append((cid, tq, hi, vi))
            frame = (h, w, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tdta = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            # Entropy data runs to the next non-RSTn marker (FF
            # followed by a byte that is neither 00 stuffing nor
            # D0-D7 — restart markers live inside the scan).
            start = pos + 2 + length
            end = start
            while end + 1 < len(raw):
                nxt = raw[end + 1]
                if raw[end] == 0xFF and nxt != 0x00 and not (
                    0xD0 <= nxt <= 0xD7
                ):
                    break
                end += 1
            if end + 1 >= len(raw):
                # the scan ran off the file with no terminating marker
                # — a truncated payload must surface as a NAMED
                # truncation error, not a misleading mid-decode
                # 'entropy stream exhausted' (round-11 advice; the old
                # loop also silently dropped the final byte here)
                raise ValueError(
                    f"JPEG: scan truncated before EOI — no terminating "
                    f"marker after the SOS entropy data at offset "
                    f"{start} ({len(raw) - start} bytes remain)"
                )
            # stuffed; split on RSTn later. DHT/DRI may be redefined
            # BETWEEN progressive scans, so each scan snapshots the
            # tables/interval in effect at its SOS.
            scans.append(
                (
                    scan_comps,
                    ss,
                    se,
                    ahal >> 4,
                    ahal & 0x0F,
                    raw[start:end],
                    restart_interval,
                    dict(htabs),
                )
            )
            pos = end
            continue
        pos += 2 + length
    if frame is None or not scans:
        raise ValueError("JPEG: missing SOF/SOS")
    h, w, comps = frame
    if lossless:
        return _decode_jpeg_lossless(h, w, comps, scans)
    if progressive:
        return _decode_jpeg_progressive(h, w, comps, scans, qtabs)
    scan_comps, s_ss, s_se, s_ah, s_al, scan_data, restart_interval, _ = (
        scans[0]
    )
    if len(scans) != 1 or len(scan_comps) != len(comps):
        raise NotImplementedError(
            "JPEG: multi-scan (non-interleaved) BASELINE files "
            "unsupported (progressive multi-scan is the SOF2 path)"
        )
    if (s_ss, s_se, s_ah, s_al) != (0, 63, 0, 0):
        raise ValueError(
            f"JPEG: baseline scan must cover the full band with no "
            f"point transform — got Ss={s_ss} Se={s_se} Ah={s_ah} "
            f"Al={s_al}"
        )

    comps = _jpeg_normalize_comps(comps)
    hmax, vmax, mcux, mcuy = _jpeg_geometry(h, w, comps)
    n_mcu = mcux * mcuy
    readers = _split_restart_segments(scan_data, restart_interval, n_mcu)

    grids = [(mcuy * vi, mcux * hi) for _, _, hi, vi in comps]
    zz_by_comp = [
        np.zeros((bhi * bwi, 64), dtype=np.int64) for bhi, bwi in grids
    ]
    decs = []
    for (cid, tq, hi, vi), (cs, td, ta) in zip(comps, scan_comps):
        if cs != cid:
            raise ValueError("JPEG: SOS component order != SOF order")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError(f"JPEG: missing Huffman table DC{td}/AC{ta}")
        decs.append((htabs[(0, td)], htabs[(1, ta)]))
    preds = [0] * len(comps)
    reader = readers[0]
    for n in range(n_mcu):
        if restart_interval and n and n % restart_interval == 0:
            reader = readers[n // restart_interval]
            preds = [0] * len(comps)
        my, mx = divmod(n, mcux)
        for ci, (cid, tq, hi, vi) in enumerate(comps):
            bwi = grids[ci][1]
            for by in range(vi):
                for bx in range(hi):
                    zz, preds[ci] = _entropy_decode_block(
                        reader, preds[ci], decs[ci][0], decs[ci][1]
                    )
                    zz_by_comp[ci][(my * vi + by) * bwi + mx * hi + bx] = zz

    return _jpeg_reconstruct(h, w, comps, grids, zz_by_comp, qtabs, hmax, vmax)


def _jpeg_normalize_comps(comps: list) -> list:
    """T.81 A.2: a single-component frame's scans are NON-interleaved
    — one data unit per MCU, the component at full resolution, blocks
    in plain row-major order. Declared sampling factors only matter
    relative to the (absent) other components, so normalize them away
    instead of misapplying MCU interleave (real encoders do emit
    grayscale SOFs with 2x2 factors)."""
    if len(comps) == 1:
        cid0, tq0, _, _ = comps[0]
        return [(cid0, tq0, 1, 1)]
    return comps


def _jpeg_geometry(h: int, w: int, comps: list) -> tuple[int, int, int, int]:
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for cid, tq, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError(
                f"JPEG: non-integer upsampling ({hi}x{vi} against "
                f"max {hmax}x{vmax}) unsupported — the exotic-ratio "
                "seam (PIL/cv2)"
            )
    return hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax))


def _split_restart_segments(
    scan_data: bytes, restart_interval: int, n_units: int
) -> list["_JpegBitReader"]:
    """Split a stuffed entropy scan on RSTn markers into independently
    byte-aligned segments (T.81 F.2.1.3.1) and return their bit
    readers. Marker order must cycle D0..D7; segment count must match
    the unit count at the DRI interval (one trailing empty segment
    after a final RSTn is tolerated, as libjpeg does)."""
    import re as _re

    parts = _re.split(b"(\xff[\xd0-\xd7])", scan_data)
    segments = [parts[i] for i in range(0, len(parts), 2)]
    markers = [parts[i][1] - 0xD0 for i in range(1, len(parts), 2)]
    if markers and not restart_interval:
        raise ValueError("JPEG: RSTn in scan but no DRI interval set")
    for i, m in enumerate(markers):
        if m != i & 7:
            raise ValueError(
                f"JPEG: restart marker out of sequence (RST{m} where "
                f"RST{i & 7} expected)"
            )
    if restart_interval:
        want = -(-n_units // restart_interval)
        if len(segments) == want + 1 and not segments[-1]:
            segments.pop()
        if len(segments) != want:
            raise ValueError(
                f"JPEG: {len(segments)} restart segments for {n_units} "
                f"MCUs at interval {restart_interval} (expected {want})"
            )
    return [
        _JpegBitReader(s.replace(b"\xff\x00", b"\xff")) for s in segments
    ]


def _jpeg_reconstruct(
    h: int,
    w: int,
    comps: list,
    grids: list,
    zz_by_comp: list,
    qtabs: dict,
    hmax: int,
    vmax: int,
) -> "np.ndarray":
    """Shared decode tail (baseline AND progressive): dequantize,
    inverse zigzag, vectorized IDCT, plane assembly, chroma upsample,
    color transform."""
    planes = []
    for (cid, tq, hi, vi), (bhi, bwi), zz in zip(comps, grids, zz_by_comp):
        if tq not in qtabs:
            raise ValueError(f"JPEG: missing quantization table {tq}")
        coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
        # zz is in zigzag scan order; the stored table is natural
        # order — permute the steps to match before multiplying
        # (caught by the asymmetric-table round-trip test: a
        # natural-order multiply reconstructs coefficient k with
        # Q[k] instead of Q[zigzag[k]])
        coef[:, JPEG_ZIGZAG] = zz * qtabs[tq][JPEG_ZIGZAG]
        blocks = np.einsum(
            "xu,nuv,yv->nxy", _DCT8.T, coef.reshape(-1, 8, 8), _DCT8.T
        )
        # assemble the component plane at its own resolution, crop to
        # the component's true dims, then nearest-upsample to (h, w)
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = _blocks_to_plane(blocks + 128.0, bhi, bwi, ch, cw)
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))


def _decode_ac_first_block(
    r: "_JpegBitReader", blk, ss: int, se: int, al: int, ac_dec: dict,
    eobrun: int,
) -> int:
    """Progressive AC first pass for one block (T.81 G.2 / libjpeg
    decode_mcu_AC_first): run-length + EOBn runs, coefficients stored
    at the point transform (<< Al). Returns the remaining EOBRUN."""
    if eobrun > 0:
        return eobrun - 1  # block lies entirely inside an EOB run
    k = ss
    while k <= se:
        sym = r.read_symbol(ac_dec)
        run, s = sym >> 4, sym & 0x0F
        if s == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << run
            if run:
                eobrun += r.read_bits(run)
            return eobrun - 1
        k += run
        if k > se:
            raise ValueError(
                f"JPEG: progressive AC run overflows the {ss}..{se} band"
            )
        blk[k] = _jpeg_extend(r.read_bits(s), s) << al
        k += 1
    return 0


def _decode_ac_refine_block(
    r: "_JpegBitReader", blk, ss: int, se: int, al: int, ac_dec: dict,
    eobrun: int,
) -> int:
    """Progressive AC refinement for one block (T.81 G.2 / libjpeg
    decode_mcu_AC_refine): newly-significant coefficients arrive as
    (run, 1) symbols + sign, already-significant ones take one
    correction bit each — including through ZRL skips and the
    end-of-band region. Returns the remaining EOBRUN."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = r.read_symbol(ac_dec)
            run, s = sym >> 4, sym & 0x0F
            if s == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break  # rest of the band is the EOB region below
                newval = 0  # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "JPEG: AC refinement can only create magnitude-1 "
                        f"coefficients (got s={s})"
                    )
                newval = p1 if r.read_bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if r.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval:
                if k > se:
                    # mirror _decode_ac_first_block's loud overflow:
                    # a newly-significant coefficient whose zero-run
                    # walks past the band end means a corrupt stream,
                    # and silently dropping it desyncs the bit reader
                    # for the rest of the scan (round-12 ADVICE).
                    raise ValueError(
                        f"JPEG: progressive AC refinement run overflows "
                        f"the {ss}..{se} band"
                    )
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if r.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_jpeg_progressive(
    h: int, w: int, comps: list, scans: list, qtabs: dict
) -> "np.ndarray":
    """SOF2 progressive decode (T.81 Annex G, Huffman): coefficients
    accumulate across the file's scans — DC first/refinement
    (two's-complement successive approximation), per-component AC
    spectral-selection first passes and magnitude refinements with
    EOBn runs — then the shared dequantize + IDCT tail runs once.
    Restart intervals reset DC predictions AND the EOB run per
    segment. The scan walk is a one-time per-payload Python pass, the
    same cost shape as the baseline decoder."""
    comps = _jpeg_normalize_comps(comps)
    hmax, vmax, mcux, mcuy = _jpeg_geometry(h, w, comps)
    n_mcu = mcux * mcuy
    grids = [(mcuy * vi, mcux * hi) for _, _, hi, vi in comps]
    zz_by_comp = [
        np.zeros((bhi * bwi, 64), dtype=np.int64) for bhi, bwi in grids
    ]
    by_cid = {cid: ci for ci, (cid, _, _, _) in enumerate(comps)}
    dc_done: set[int] = set()  # components with a completed DC first pass

    for scomps, ss, se, ah, al, data, ri, tabs in scans:
        if ah and al != ah - 1:
            raise ValueError(
                f"JPEG: successive-approximation order violated "
                f"(Ah={ah} requires Al={ah - 1}, got {al})"
            )
        if ss == 0:
            # ---- DC scan (interleaved over all comps, or single) ----
            if se != 0:
                raise ValueError(
                    f"JPEG: progressive DC scan must have Se=0 (got {se})"
                )
            cis = []
            for cs, td, ta in scomps:
                if cs not in by_cid:
                    raise ValueError(f"JPEG: SOS names unknown component {cs}")
                if ah == 0 and (0, td) not in tabs:
                    raise ValueError(f"JPEG: missing Huffman table DC{td}")
                cis.append((by_cid[cs], tabs.get((0, td))))
            interleaved = len(scomps) > 1
            if interleaved and len(scomps) != len(comps):
                raise NotImplementedError(
                    "JPEG: progressive DC scan over a strict component "
                    "subset is unsupported (all components or one)"
                )
            if interleaved:
                n_units = n_mcu
            else:
                ci0 = cis[0][0]
                cbh, cbw = _true_block_extent(
                    h, w, comps[ci0][2], comps[ci0][3], hmax, vmax
                )
                n_units = cbh * cbw
            readers = _split_restart_segments(data, ri, n_units)
            reader = readers[0]
            preds = [0] * len(comps)
            for n in range(n_units):
                if ri and n and n % ri == 0:
                    reader = readers[n // ri]
                    preds = [0] * len(comps)
                if interleaved:
                    my, mx = divmod(n, mcux)
                    for ci, dc_dec in cis:
                        _, _, hi, vi = comps[ci]
                        bwi = grids[ci][1]
                        for by in range(vi):
                            for bx in range(hi):
                                bidx = (my * vi + by) * bwi + mx * hi + bx
                                blk = zz_by_comp[ci][bidx]
                                if ah == 0:
                                    cat = reader.read_symbol(dc_dec)
                                    diff = _jpeg_extend(
                                        reader.read_bits(cat), cat
                                    )
                                    preds[ci] += diff
                                    blk[0] = preds[ci] << al
                                else:
                                    blk[0] = int(blk[0]) | (
                                        reader.read_bit() << al
                                    )
                else:
                    ci, dc_dec = cis[0]
                    bwi = grids[ci][1]
                    bidx = (n // cbw) * bwi + (n % cbw)
                    blk = zz_by_comp[ci][bidx]
                    if ah == 0:
                        cat = reader.read_symbol(dc_dec)
                        diff = _jpeg_extend(reader.read_bits(cat), cat)
                        preds[ci] += diff
                        blk[0] = preds[ci] << al
                    else:
                        blk[0] = int(blk[0]) | (reader.read_bit() << al)
            if ah == 0:
                dc_done.update(ci for ci, _ in cis)
        else:
            # ---- AC scan: always single-component (G.1.1.1.1) ------
            if len(scomps) != 1:
                raise ValueError(
                    "JPEG: progressive AC scan must be single-component"
                )
            if not (ss <= se <= 63):
                raise ValueError(f"JPEG: bad spectral band {ss}..{se}")
            cs, td, ta = scomps[0]
            if cs not in by_cid:
                raise ValueError(f"JPEG: SOS names unknown component {cs}")
            ci = by_cid[cs]
            if ci not in dc_done:
                raise ValueError(
                    f"JPEG: AC scan for component {cs} precedes its DC "
                    f"first pass (progressive scan order violated)"
                )
            if (1, ta) not in tabs:
                raise ValueError(f"JPEG: missing Huffman table AC{ta}")
            ac_dec = tabs[(1, ta)]
            _, _, hi, vi = comps[ci]
            cbh, cbw = _true_block_extent(h, w, hi, vi, hmax, vmax)
            bwi = grids[ci][1]
            readers = _split_restart_segments(data, ri, cbh * cbw)
            reader = readers[0]
            eobrun = 0
            step = (
                _decode_ac_first_block if ah == 0 else _decode_ac_refine_block
            )
            for n in range(cbh * cbw):
                if ri and n and n % ri == 0:
                    reader = readers[n // ri]
                    eobrun = 0
                blk = zz_by_comp[ci][(n // cbw) * bwi + (n % cbw)]
                eobrun = step(reader, blk, ss, se, al, ac_dec, eobrun)

    return _jpeg_reconstruct(h, w, comps, grids, zz_by_comp, qtabs, hmax, vmax)


def _decode_jpeg_lossless(
    h: int, w: int, comps: list, scans: list, precision: int = 8
) -> "np.ndarray":
    """LOSSLESS (SOF3) decode path — T.81 Annex H (round-13: the
    lossless seam is closed). One interleaved scan: per MCU (= one
    sample per component at Hi=Vi=1), Huffman-decode the difference
    category with the scan's DC table (SSSS symbol + magnitude bits,
    EXTEND of F.2.2.1; SSSS=16 means +32768 with no bits), add the
    Annex-H prediction (selector from Ss; segment-start and
    line-start special cases in `_lossless_predict`), reduce mod 2^16
    (H.2.2), and finally shift left by the point transform Al.
    Restart intervals are processed as independent scans (H.2.1.3):
    prediction restarts and each segment is byte-aligned — this
    decoder supports row-aligned intervals (DRI a multiple of the
    line width), the shape every segment-independence semantic agrees
    on; unaligned DRI raises a named limit. Subsampled lossless
    components and non-interleaved multi-scan SOF3 raise named
    limits. 3-component frames return the coded planes directly as
    (h, w, 3) — lossless mandates no color transform — and
    1-component frames return (h, w), matching `decode_jpeg`'s
    grayscale contract."""
    if len(scans) != 1:
        raise NotImplementedError(
            "JPEG lossless: multi-scan (non-interleaved) SOF3 files "
            "unsupported — single interleaved scan only"
        )
    scan_comps, ss, se, ah, al, scan_data, ri, tables = scans[0]
    if len(scan_comps) != len(comps):
        raise NotImplementedError(
            "JPEG lossless: scan covers "
            f"{len(scan_comps)}/{len(comps)} components — single "
            "interleaved scan only"
        )
    predictor, pt = ss, al
    if not (1 <= predictor <= 7):
        raise ValueError(
            f"JPEG lossless: predictor selector {predictor} outside "
            "1..7 (0 is the hierarchical-differential mode)"
        )
    if se != 0 or ah != 0:
        raise ValueError(
            f"JPEG lossless: Se/Ah must be 0 in SOF3 scans — got "
            f"Se={se} Ah={ah}"
        )
    if pt >= precision:
        raise ValueError(
            f"JPEG lossless: point transform {pt} >= precision "
            f"{precision}"
        )
    for cid, _tq, hi, vi in comps:
        if (hi, vi) != (1, 1):
            raise NotImplementedError(
                f"JPEG lossless: component {cid} has sampling "
                f"{hi}x{vi} — only 1x1 (unsubsampled) lossless frames "
                "are supported"
            )
    if ri and ri % w != 0:
        raise NotImplementedError(
            f"JPEG lossless: restart interval {ri} does not align to "
            f"row boundaries (width {w}) — row-aligned DRI only"
        )
    decs = []
    for (cid, _tq, _hi, _vi), (cs, td, _ta) in zip(comps, scan_comps):
        if cs != cid:
            raise ValueError("JPEG: SOS component order != SOF order")
        if (0, td) not in tables:
            raise ValueError(f"JPEG: missing Huffman table DC{td}")
        decs.append(tables[(0, td)])
    n_mcu = h * w
    readers = _split_restart_segments(scan_data, ri, n_mcu)
    default = 1 << (precision - pt - 1)
    rec = [np.zeros((h, w), dtype=np.int64) for _ in comps]
    reader = readers[0]
    first_row = 0
    for n in range(n_mcu):
        if ri and n and n % ri == 0:
            reader = readers[n // ri]
            first_row = n // w
        y, x = divmod(n, w)
        for ci in range(len(comps)):
            cat = reader.read_symbol(decs[ci])
            if cat > 16:
                raise ValueError(
                    f"JPEG lossless: difference category {cat} > 16"
                )
            if cat == 16:
                diff = 32768  # H.1.2.2: SSSS=16 carries no extra bits
            else:
                diff = _jpeg_extend(reader.read_bits(cat), cat)
            rec[ci][y, x] = (
                _lossless_predict(
                    rec[ci], x, y, first_row, predictor, default
                )
                + diff
            ) & 0xFFFF
    limit = 1 << (precision - pt)
    planes = []
    for r in rec:
        if (r >= limit).any():
            raise ValueError(
                "JPEG lossless: reconstructed sample exceeds the "
                f"{precision - pt}-bit range (corrupt stream)"
            )
        planes.append((r << pt).astype(np.uint8))
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


def attach_jpeg_lossless_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
) -> DataFrame:
    """Testdata adapter for the LOSSLESS (SOF3) decode path
    (round-13): materialize a spec-valid lossless JPEG per row whose
    RGB raster is the row's UTF-8 text bytes cycled to
    width·height·3 — the same raster contract as `attach_ppm_media` /
    `attach_png_media`, so the same SQL oracle replays every pixel
    byte for byte, but the engine must now run the full Annex-H
    prediction + Huffman-difference decode to recover them (lossless
    JPEG is exact BY SPEC — no constant-block construction needed).
    The corpus exercises every predictor (selector = 1 + doc_id mod
    7) and every third document carries row-aligned restart
    intervals."""
    cap = width * height * 3

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                if raw:
                    raster = (raw * (cap // len(raw) + 1))[:cap]
                else:
                    raster = bytes(cap)
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(
                    height, width, 3
                )
                payloads.append(
                    encode_jpeg_lossless(
                        arr,
                        predictor=1 + int(doc_id) % 7,
                        restart_rows=2 if int(doc_id) % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )


def attach_jpeg_media(
    df: DataFrame,
    blocks_w: int,
    blocks_h: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_col: str = "media",
    progressive: bool = False,
) -> DataFrame:
    """Testdata adapter for the LOSSY-codec decode path (round-11):
    materialize a spec-valid baseline 4:4:4 color JPEG per row whose
    luma plane is a blocks_h x blocks_w grid of CONSTANT 8x8 blocks —
    block b's value is raster byte (b mod len) of the row's UTF-8
    text (0 for empty text) — with neutral chroma (gray pixels). Per
    the exactness contract in the JPEG section banner (luma DC
    quantization step 8, pure-DC blocks, identity color transform on
    neutral chroma) the decode is EXACTLY lossless, so the SQL oracle
    can replay every decoded pixel from hex(encode(text)): channel
    px_sum = 64 * sum(block bytes). The engine still runs the fully
    general entropy-decode + IDCT path to recover them.
    `progressive=True` (round-12) emits the SAME quantized
    coefficients as SOF2 multi-scan files — identical decoded pixels,
    so the same oracle holds while the engine exercises the
    progressive scan-accumulation path."""
    ql = JPEG_QUANT_LUMA.copy()
    ql[0] = 8  # DC step 8 divides 8*(v-128) for every v in 0..255
    n_blocks = blocks_w * blocks_h
    enc = encode_jpeg_progressive if progressive else encode_jpeg

    def _build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                raw = (text or "").encode("utf-8")
                if raw:
                    vals = np.frombuffer(
                        (raw * (n_blocks // len(raw) + 1))[:n_blocks],
                        dtype=np.uint8,
                    )
                else:
                    vals = np.zeros(n_blocks, dtype=np.uint8)
                y = np.kron(
                    vals.reshape(blocks_h, blocks_w),
                    np.ones((8, 8), dtype=np.uint8),
                )
                rgb = np.stack([y, y, y], axis=-1)
                payloads.append(enc(rgb, quant_luma=ql))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), media_col: payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        _build, schema=f"{id_col} long, {media_col} binary"
    )
