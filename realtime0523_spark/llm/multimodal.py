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
    the metadata struct every real media table carries."""
    return docs.withColumn("media", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
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
