"""Streaming DAU — SURVEY §2.7 D1 + §2.5 A5.

Reference: scala/…/app/Dau.scala:104-123 — Redis `SADD <dt>dau mid`
with a 24 h TTL; first insertion wins; downstream counts the set.

Ours: event-time watermark + `dropDuplicatesWithinWatermark` on
(dt, mid). The watermark IS the TTL (T4): a key's dedup state is
evicted once the watermark passes its event time + the TTL, bounding
state exactly like the Redis `expire` — but driven by event time, not
wall clock, so replays are correct. (Plain `dropDuplicates` on a
subset WITHOUT the event-time column never evicts — Spark only applies
watermark eviction to dedup state when the time column is among the
keys — so the TTL claim would be false and state would grow one entry
per (day, device) forever; the round-10 review caught this.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dau(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    state_ttl: str = "24 hours",
) -> DataFrame:
    """Per-day distinct-user counts over a stream. Output mode:
    complete (per-dt counts updated as batches arrive)."""
    deduped = (
        events.withWatermark(ts_col, state_ttl)
        .select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("dt"),
            F.col(user_col).alias("mid"),
            F.col(ts_col),
        )
        .dropDuplicatesWithinWatermark(["dt", "mid"])
    )
    return deduped.groupBy("dt").agg(F.count(F.lit(1)).alias("dau"))
