"""Streaming trending-token monitor: watermarked windowed token counts
over an unbounded document stream.

The streaming twin of a batch ``groupBy(window(ts), token).count()``:
each document explodes into tokens carrying its event time, a windowed
aggregation counts per (window, token) with watermark-bounded state, and
append mode emits a window's counts once the watermark passes its end —
the standard "what's trending per hour" ingest monitor, built entirely
from native streaming aggregates (no custom state).

Scale shape: per-window state is bounded by the distinct-token count of
that window (vocabulary-bounded, Zipfian — AQE-equivalent skew pressure
is absorbed by the shuffle's hash partitioning on (window, token)), and
the watermark evicts closed windows, so state is O(|vocab| ×
open-windows) regardless of stream length.  ``min_count`` prunes the
emitted stream to the heavy tail AFTER the aggregation, so low-frequency
state still evicts on time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.textops import tokens_col


def _windowed_counts(
    source: DataFrame, ts_col: str, text_col: str, window: str, min_count: int
) -> DataFrame:
    """The shared explode → window-groupBy → count → threshold pipeline;
    the streaming and batch forms differ ONLY in the watermark on the
    source, so the drained-≡-batch equivalence holds by construction."""
    toks = source.select(
        F.col(ts_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    return (
        toks.groupBy(F.window(ts_col, window), "token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "token",
            "n",
        )
    )


def trending_tokens(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark_delay: str = "10 minutes",
    min_count: int = 2,
) -> DataFrame:
    """Append stream of (window_start, window_end, token, n) rows for
    closed windows, counting every token OCCURRENCE (not distinct doc)
    whose document event time falls in the window; rows below
    ``min_count`` are suppressed after aggregation."""
    return _windowed_counts(
        stream.withWatermark(ts_col, watermark_delay),
        ts_col,
        text_col,
        window,
        min_count,
    )


def trending_tokens_batch(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    min_count: int = 2,
) -> DataFrame:
    """Batch twin of ``trending_tokens`` (same pipeline, no watermark) —
    the equivalence target a drained stream must reproduce."""
    return _windowed_counts(docs, ts_col, text_col, window, min_count)


def rank_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k over (window_start, window_end, token, n) rows:
    row_number ordered by (n desc, token) — the deterministic tiebreak
    keeps drained ≡ batch exact.  Batch transform, shared verbatim by the
    streaming sink and the batch twin."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.col("token")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("window_start", "window_end", "token", "n", "rank")
    )


def trending_topk_writer(
    stream: DataFrame,
    out_path: str,
    k: int = 3,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark_delay: str = "10 minutes",
    min_count: int = 1,
):
    """Watermarked per-window TOP-K tokens — the monitor a real ingest
    pipeline dashboards (the streaming face of ``corpus_vocab_top``,
    restricted per time window).

    Ranking needs every token of a window at once, which append mode
    guarantees per micro-batch: a window's counts all emit together in
    the one batch where the watermark passes its end.  So the sink is a
    ``foreachBatch`` that applies the SAME ``rank_topk`` transform the
    batch twin uses to each emitted batch and appends only the top-k
    rows to ``out_path`` — rank-on-emit, no second stateful operator,
    state stays the windowed counts' (vocab × open-windows) bound.

    Each batch lands under ``out_path/batch=<id>`` with OVERWRITE (the
    same idempotence discipline as the dedup/quality sinks): a
    micro-batch re-delivered after a crash between parquet commit and
    checkpoint advance rewrites its own directory instead of appending
    duplicate top-k rows.  Readers see ``batch`` as a partition column.

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""
    counts = trending_tokens(
        stream, ts_col, text_col, window, watermark_delay, min_count
    )

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        rank_topk(bdf, k).write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return counts.writeStream.foreachBatch(write_batch)


def trending_topk_batch(
    docs: DataFrame,
    k: int = 3,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    min_count: int = 1,
) -> DataFrame:
    """Batch twin of the streaming top-k (same counts pipeline, same
    ``rank_topk``) — the equivalence target a drained stream must
    reproduce."""
    return rank_topk(
        _windowed_counts(docs, ts_col, text_col, window, min_count), k
    )
