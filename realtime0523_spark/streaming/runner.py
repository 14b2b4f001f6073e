"""Synchronous drivers for streaming queries (test/bench harness).

`processAllAvailable()` drains every pending micro-batch — the
file-source equivalent of the reference's `ssc.start();
awaitTermination()` loop, but bounded, so correctness queries can be
compared against batch oracles.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def run_to_memory(
    df: DataFrame,
    output_mode: str = "append",
    name: str | None = None,
    trigger_seconds: float | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to a memory sink, drain it, stop, and
    return the materialized result as a batch DataFrame."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    spark = df.sparkSession
    return spark.table(name)


def run_foreach_batch(
    df: DataFrame,
    fn,
    checkpoint_dir: str | None = None,
    output_mode: str = "update",
) -> None:
    """Run a streaming DataFrame through `foreachBatch(fn)` to
    completion (fn: (batch_df, batch_id) -> None)."""
    writer = df.writeStream.foreachBatch(fn).outputMode(output_mode)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
