"""Multimodal column conventions: image/audio/video as opaque binary
columns with a typed metadata struct, processed by Arrow-batched
`mapInPandas` pipelines.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (`decode_image_stub` raises NotImplementedError;
`media_features` computes real deterministic byte-level features).
The Spark-side plumbing — schema, batch iteration, partitioning —
is real and tested; swapping the stub for PIL/torchaudio is a
function-body change only.

Scale: mapInPandas streams Arrow batches through Python workers —
per-partition, no driver involvement; binary payloads never shuffle
unless the user asks for it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_image_stub(payload: bytes) -> "object":
    """STUB: decode an image payload to an array. The test container
    ships no codecs (no PIL/cv2); a real deployment replaces this body
    with e.g. PIL.Image.open(io.BytesIO(payload))."""
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library not present in "
            "this environment; media_features covers the byte-level path"
        ) from exc
    raise NotImplementedError("wire PIL decode here when available")


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
    import numpy as np

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(payload)
                if len(raw) % 2:
                    raw = raw[:-1]
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
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
