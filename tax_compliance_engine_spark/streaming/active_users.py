"""Streaming daily-active-users monitor: watermarked streaming DISTINCT
chained into a windowed count — exact per-day unique users over an
unbounded event stream.

Streaming aggregations cannot take COUNT(DISTINCT) directly; the
standard (and scale-correct) formulation is TWO chained stateful
operators, both watermark-bounded:

1. ``dropDuplicates`` on (day-window, user_id) — streaming dedup whose
   state is one row per distinct (day, user), evicted when the
   watermark passes the day (the dedup key carries the event-time
   window, so eviction is exact, not heuristic);
2. a windowed count over the deduped stream — plain append-mode
   aggregation that emits each day's exact DAU once the watermark
   closes it.

Chained stateful operators in append mode require Spark 3.5+ (this
repo targets 4.x).  The reference has no streaming surface at all —
this extends the §2.9 family (sessionization, exact/near dedup,
trending top-k, CDC, quality screen) with the engagement monitor every
ingest dashboard carries.

Scale shape (100 TB/day): dedup state is O(distinct (day, user) pairs
inside the watermark horizon) hash-partitioned on the dedup key — the
same bound the batch bitmap fold (queries.events_active_users) has,
spread over executors; the day-count state is one row per open day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _daily_distinct(source: DataFrame, ts_col: str, user_col: str) -> DataFrame:
    """Shared (day-window, user) distinct → per-day count pipeline; the
    streaming and batch forms differ ONLY in watermark + dedup operator
    flavor, so drained ≡ batch holds by construction."""
    per_user = source.select(
        F.window(F.col(ts_col), "1 day").alias("_w"),
        F.col(user_col).alias("_user"),
    ).dropDuplicates(["_w", "_user"])
    return (
        per_user.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("dau"))
        .select(
            F.col("_w.start").alias("day_start"),
            F.col("_w.end").alias("day_end"),
            "dau",
        )
    )


def streaming_dau(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Append stream of (day_start, day_end, dau) rows, one per closed
    day, dau = EXACT distinct users that day."""
    return _daily_distinct(
        stream.withWatermark(ts_col, watermark_delay), ts_col, user_col
    )


def batch_dau(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Batch twin of ``streaming_dau`` (same pipeline, no watermark) —
    the equivalence target a drained stream must reproduce."""
    return _daily_distinct(events, ts_col, user_col)
