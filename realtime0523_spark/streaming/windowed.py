"""Watermarked tumbling-window aggregation — SURVEY §2.8 T2/T5.

The reference's only windowing is the 50 s/5 s sliding window that
feeds its stream-stream join (reference
scala/…/dws/OrderWiderApp.scala:119-120), and it has NO event-time
watermarks — late data silently drops out of join scope (T5). This
module is the general form our engine exposes: event-time tumbling
windows with an explicit watermark, so (a) late data within the
horizon is aggregated correctly, (b) window state is evicted once the
watermark passes (bounded state at 100 TB), and (c) results are
replay-deterministic and batch-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime0523_spark.functions.scalar import round2


def streaming_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str = "value",
    slide: str | None = None,
) -> DataFrame:
    """Per-(window, key) event counts and 2-dp value sums.

    `slide=None` → tumbling. A slide shorter than `window_size` gives
    the reference's overlapping form — `window(Seconds(50), Seconds(5))`
    (scala/…/dws/OrderWiderApp.scala:119-120) is
    `window_size="50 seconds", slide="5 seconds"`: each event lands in
    size/slide windows. State scales by the same factor — watermark
    eviction still bounds it.

    Works on a stream (watermarked state, append/update output) and on
    a batch DataFrame (withWatermark is a no-op there) — the same plan
    text both ways, which is how the oracle check runs it.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size, slide or window_size), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum(value_col)).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def topk_per_window(counts: DataFrame, k: int) -> DataFrame:
    """Trending top-k per finalized window (O3 on streams): rank the
    drained windowed counts by (n_events desc, key asc) within each
    window and keep k.

    Rank functions cannot run INSIDE a streaming plan (a row's rank is
    unstable until its window finalizes), so the correct streaming
    formulation is exactly this split: the stream maintains the
    watermarked per-(window, key) counts — bounded state, incremental —
    and the rank is a batch post-pass over finalized windows. At 100 TB
    the post-pass input is |windows| × |keys| aggregate rows, not
    events; on a live pipeline it runs per trigger in foreachBatch over
    the update stream's finalized windows."""
    from realtime0523_spark.operators.windows import topk_per_group

    key = [c for c in counts.columns if c not in ("window_start", "n_events", "sum_value")]
    return topk_per_group(
        counts,
        "window_start",
        [F.desc("n_events"), *[F.col(c) for c in key]],
        k,
        rank_col="rk",
    )
