"""Stream-stream attribution join: the streaming twin of the batch range
join (operators/temporal.range_join).

Two unbounded streams (purchases, clicks) joined on user + a time-range
predicate.  Structured Streaming buffers each side in join state and the
WATERMARKS bound that state: a click older than (watermark - window) can
never match a future purchase, so its state evicts — without the
watermarks the buffers grow forever.  This is the standard streaming
attribution shape (impression ⋈ conversion within a window).

At scale the join shuffles both streams on user_id once per micro-batch
and state is hash-partitioned with them; the range predicate bounds state
retention, not the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    window_hours: int = 4,
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """All (purchase, click) pairs of the same user with the click inside
    the purchase's ``window_hours`` look-back window — continuously, over
    two live streams.

    Both inputs must carry (event_id, ts, user_id).  Output columns match
    the batch ``events_range_pairs`` query shape: (user_id, p_event_id,
    click_event_id, p_ts, click_ts, gap_us)."""
    p = (
        purchases.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(user_col).alias("user_id"),
            F.col("event_id").alias("p_event_id"),
            F.col(ts_col).alias("p_ts"),
        )
    )
    c = (
        clicks.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(user_col).alias("c_user_id"),
            F.col("event_id").alias("click_event_id"),
            F.col(ts_col).alias("click_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("p_ts"))
        & (
            F.col("click_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {window_hours} HOURS")
        ),
        "inner",
    )
    return joined.select(
        "user_id",
        "p_event_id",
        "click_event_id",
        "p_ts",
        "click_ts",
        (F.unix_micros("p_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
