"""Streaming cross-batch dedup — SURVEY §2.7 D2 (and the general form
behind D1).

Reference: scala/…/dws/OrderWiderApp.scala:129-147 — Redis
`SADD order_join:<order_id> <order_detail_id>` with a 100 s TTL; only
the first sighting of a (order_id, detail_id) pair survives, and the
TTL bounds the dedup memory.

Ours: event-time watermark + `dropDuplicates` on the key columns. The
watermark horizon IS the TTL (T4): a key's state is evicted once the
watermark passes its event time, exactly the Redis `expire` — but
driven by event time, so replays and out-of-order arrival within the
horizon are handled correctly, and a duplicate arriving after its
key's state expired re-emits (same behavior as the expired Redis set).
State is (keys → first event time): bounded by distinct keys per
horizon regardless of input volume — the 100 TB contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    ttl: str = "100 seconds",
) -> DataFrame:
    """First-sighting-wins dedup of a stream on `keys`, with per-key
    state held for `ttl` of event time (the reference's Redis-set TTL,
    D2/T4). Append output: each surviving first sighting emits once.

    `dropDuplicatesWithinWatermark`, not `dropDuplicates`: plain
    dropDuplicates only evicts state when the event-time column is one
    of the dedup keys — on a pure key-pair dedup its state grows
    forever. The WithinWatermark variant keys state on exactly the
    dedup columns and expires each key once the watermark passes its
    sighting + ttl — the Redis `expire` contract."""
    return df.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(keys)
