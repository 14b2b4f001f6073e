"""Streaming OrderWide — SURVEY §2.4 J1/J2, §2.10 F1 (DWS layer).

Reference: scala/…/dws/OrderWiderApp.scala:117-199 — both streams
keyed by order_id, `window(Seconds(50), Seconds(5))` + join (the
overlap re-emits pairs), Redis-set dedup, then per-order amount
allocation with Redis running sums.

Ours: a native stream-stream equi-join. With event-time columns that
carry real arrival skew, add watermarks + a time-range condition
(`detail.ts BETWEEN order.ts - tolerance AND order.ts + tolerance`) —
the engine then bounds join state and emits each pair exactly once
(no J2 dedup pass needed). In the reference's CDC feed, header and
detail rows for one order share a `create_time`, which is exactly why
its 50 s window join is complete; the driver's TPC-H-shaped testdata
has no such shared column (o_orderdate vs l_shipdate gap spans ±2400
days), so `cdc_commit_time` reconstructs that data contract — a
deterministic per-order commit time derived from the join key — and
the inventory entry runs the watermarked, bounded-state branch.
Unbounded inner equi-join remains available but is NOT what the
correctness gate exercises (it is the 100×-scale state killer).

Allocation on a stream: F1 needs all of an order's details. Within
the reference's design the join window guarantees co-arrival; we
compute it per micro-batch in `foreachBatch` (see tests), keeping the
window-function formulation identical to batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_commit_time(key, modulus: int = 86400) -> Column:
    """Deterministic per-key event time — the CDC `create_time` both
    sides of a header/detail pair share in the reference's feed
    (scala/…/dws/OrderWiderApp.scala:117-128 relies on co-timed
    arrival for its 50 s window join). Matching keys get identical
    timestamps, so a time-range join with ANY tolerance keeps every
    pair while the watermark still bounds state to the tolerance
    horizon.

    Times are offset one modulus period past the epoch: Structured
    Streaming's initial watermark is epoch-0, and the range-join late
    filter drops rows whose event time sits AT the watermark minus the
    range bound — key 0 would land exactly there and silently vanish
    (measured: numRowsDroppedByWatermark=3 on the sf0.001 fixture
    without the offset)."""
    return F.timestamp_seconds(F.col(key) % F.lit(modulus) + F.lit(modulus))


def streaming_order_wide(
    orders: DataFrame,
    details: DataFrame,
    order_key: str = "o_orderkey",
    detail_key: str = "l_orderkey",
    order_ts: str | None = None,
    detail_ts: str | None = None,
    tolerance: str = "50 seconds",
    how: str = "inner",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Stream-stream equi-join of order headers × details.

    With `order_ts`/`detail_ts` set, applies watermarks of `tolerance`
    on both sides and a symmetric time-range condition — the J1
    window/slide semantics, state evicted by the engine (T4/T5).

    `how` extends to the outer family ("left_outer", "right_outer",
    "full_outer") — the reference's commented J3 design
    (scala/…/dws/OrderWiderApp.scala:63-115: fullOuterJoin with Redis
    caches for unmatched sides). Outer streaming joins REQUIRE the
    watermark/time-range form: the engine emits an unmatched row with
    nulls only once the watermark proves no partner can arrive —
    exactly the TTL-expiry behavior the reference hand-rolled.

    `salt_buckets` applies the operators.joins.salted_join rewrite to
    the micro-batch shuffle — AQE's skew-join never sees streaming
    batches (operators/joins.py note), so a hot order key (one order
    with a million detail rows) melts a single join task with no
    runtime rescue. Salted: each DETAIL row (the skewed fact side)
    carries a content-hash salt in [0, buckets); each ORDER row (one
    per key by contract) is replicated once per bucket; the join key
    becomes (order key, salt), spreading the hot key over `buckets`
    tasks and `buckets` state-store partitions. Inner-join only —
    outer emission semantics do not survive replication (an unmatched
    order would emit `buckets` null rows; the same restriction
    salted_join enforces). Results are identical to the unsalted
    stream (test-asserted), order-side state inflates ×buckets.
    """
    if salt_buckets is not None:
        if how != "inner":
            raise ValueError(
                f"salted streaming join supports how='inner' only: an "
                f"unmatched side would emit {salt_buckets} replicated "
                f"rows under outer semantics (see operators.joins."
                f"salted_join)."
            )
        details = details.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in details.columns]),
                F.lit(salt_buckets),
            ),
        )
        orders = orders.withColumn(
            "__salt",
            F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
        ).withColumn("__salt", F.col("__salt").cast("bigint"))
    if order_ts and detail_ts:
        o = orders.withWatermark(order_ts, tolerance)
        d = details.withWatermark(detail_ts, tolerance)
        cond = (
            (o[order_key] == d[detail_key])
            & (d[detail_ts] >= o[order_ts] - F.expr(f"INTERVAL {tolerance}"))
            & (d[detail_ts] <= o[order_ts] + F.expr(f"INTERVAL {tolerance}"))
        )
        if salt_buckets is not None:
            cond = cond & (o["__salt"] == d["__salt"])
        out = o.join(d, cond, how)
        return out.drop("__salt") if salt_buckets is not None else out
    if how != "inner":
        raise ValueError("outer stream-stream joins need order_ts/detail_ts watermarks")
    cond = orders[order_key] == details[detail_key]
    if salt_buckets is not None:
        cond = cond & (orders["__salt"] == details["__salt"])
    out = orders.join(details, cond, "inner")
    return out.drop("__salt") if salt_buckets is not None else out
