"""Event-time session windows — the streaming form of sessionization.

The reference groups per-user activity only within one 5 s micro-batch
(A3, reference scala/…/dwd/Ods_to_DWD_order_info.scala:106) — sessions
spanning batches are invisible to it. `session_window` is the native
Structured Streaming operator for gap-based sessions: state merges
adjacent events per key until a `gap` of silence closes the window,
and the watermark bounds how long an open session can wait for late
events (bounded state at 100 TB; sessions close and evict as the
watermark passes).

Batch execution of the same plan (withWatermark is a no-op there)
computes identical sessions, which is how the oracle check runs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2


def streaming_session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Per-(user, session) event counts and 2-dp value sums, where a
    session closes after `gap` without activity. A new event at exactly
    start+gap opens a new session (window end is exclusive)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum(value_col)).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
