"""Streaming corpus ingest: the training-data pipeline's front door as
a Structured Streaming pipeline — documents arrive as a stream, pass
stateless quality + repetition gates, are exact-deduplicated across
batches by content fingerprint (keyed state: keep the minimum doc_id
ever seen per fingerprint), and leave with their train/val/test split
assigned.

This composes the LLM operators with the streaming spine: the gates
are single per-row expressions (llm.text quality_features /
repetition_pass_rowwise — no shuffle, no watermark coupling), the
dedup is the same `applyInPandasWithState` minimal-state pattern as
streaming/first_seen.py (reference parity: the cumulative "ever seen"
set of scala/…/dwd/Ods_to_DWD_order_info.scala:83-104, keyed here by
content hash instead of user id), and the split is the deterministic
hash bucket of llm.pipeline.train_split.

Scale: state is one long per DISTINCT content fingerprint — the
minimum possible exact-dedup state; gates run before the state shuffle
so rejected docs never touch the state store. At 100 TB the state
partitions by fingerprint hash; a TTL (watermark on arrival time)
bounds it if the corpus is unbounded.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from realtime0523_spark.llm.pipeline import train_split
from realtime0523_spark.llm.text import (
    doc_fingerprint,
    quality_features,
    repetition_pass_rowwise,
)


def _keep_min_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per fingerprint: the minimum doc_id ever seen, folded through
    the state store; emit the current winner each batch (update)."""
    mins = [int(pdf["doc_id"].min()) for pdf in pdfs if len(pdf)]
    if mins and (not state.exists or min(mins) < state.get[0]):
        state.update((min(mins),))
    if state.exists:
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [state.get[0]]})


def streaming_docs_ingest(
    docs_stream: DataFrame,
    min_quality: float,
    fractions: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """docs stream → quality gate → repetition gate → cross-batch
    exact dedup (min doc_id per content fingerprint) → split
    assignment. Returns (fingerprint, doc_id, split) in UPDATE mode:
    the fingerprint is the upsert key — each batch re-emits the
    current winner for every fingerprint that received data, and a
    keyed sink (idempotent_batch_writer-style upsert, or a compaction
    `groupBy(fingerprint).min(doc_id)`) converges to the final answer.
    The winner only ever decreases, so min-per-key == latest-per-key.

    Drained and compacted this equals the batch contract: of the
    gate-passing docs, one representative (min doc_id) per distinct
    normalized content, each assigned its deterministic split — the
    oracle-checkable statement.
    """
    gated = docs_stream.select(
        "doc_id",
        doc_fingerprint("text").alias("fingerprint"),
        quality_features("text")["quality_score"].alias("quality_score"),
        repetition_pass_rowwise("text").alias("pass_rep"),
    ).filter((F.col("quality_score") >= min_quality) & F.col("pass_rep"))

    kept = gated.groupBy("fingerprint").applyInPandasWithState(
        _keep_min_fn,
        outputStructType="fingerprint string, doc_id long",
        stateStructType="doc_id long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return train_split(kept, fractions, salt=salt).select(
        "fingerprint", "doc_id", "split"
    )
