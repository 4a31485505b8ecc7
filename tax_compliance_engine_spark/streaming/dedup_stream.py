"""Streaming deduplication: exact-dup filtering over an unbounded document
stream (training-data ingest shape).

``streaming_exact_dedup`` keys the state store by content digest so each
distinct payload passes exactly once across micro-batches — the streaming
twin of ``operators/dedup.exact_dedup``.  Two state policies:

- unbounded (``watermark_delay=None``): digests are remembered forever —
  exact global dedup; state grows with |distinct docs| (one 128-bit digest
  + key overhead per doc, ~10s of GB per 1e9 docs spread over the cluster's
  state stores: viable, but plan compaction).
- watermarked (``dropDuplicatesWithinWatermark``): duplicates are only
  suppressed within the watermark horizon and state evicts as event time
  advances — the bounded-memory mode for endless ingest where dups arrive
  close together (retries, crawler re-fetches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Pass each distinct document (by md5 digest) exactly once.

    With ``watermark_delay`` (requires ``event_time_col``), state evicts
    after the horizon; otherwise dedup state is global and unbounded."""
    out = stream.withColumn("digest", F.md5(F.col(text_col)))
    if watermark_delay is not None:
        if event_time_col is None:
            raise ValueError("watermark_delay requires event_time_col")
        return out.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["digest"])
    return out.dropDuplicates(["digest"])
