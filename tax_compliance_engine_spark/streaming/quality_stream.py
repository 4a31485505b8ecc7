"""Streaming model-based quality filtering at ingest time.

The batch operator (``operators/textops.quality_model_scores``) scores a
document from its OWN tokens and a FIXED broadcast weight table — no
corpus-wide statistics — so a document's keep/drop verdict never depends
on other stream documents.  Micro-batch-local scoring therefore IS the
global semantics (the same argument as the streaming decontamination
screen), and the stream version needs no state store and no watermark:
memory stays bounded forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_quality_filter_writer(
    stream: DataFrame,
    out_path: str,
    text_col: str = "text",
    threshold: float = 0.0,
    weights: DataFrame | None = None,
):
    """Append to ``out_path`` only arriving documents whose hashed-
    feature linear-classifier logit clears ``threshold`` — the
    fastText-style quality screen applied at ingest instead of as a
    batch sweep (streaming twin of ``textops.quality_model_scores``,
    drained ≡ batch; the kept rows carry their score columns).

    ``weights`` (bucket, weight) is resolved ONCE against the batch
    session (defaulting to the deterministic stand-in table) and reused
    across micro-batches.  Output lands under ``out_path/batch=<id>``
    with per-batch OVERWRITE so micro-batch re-delivery rewrites the
    same directory instead of duplicating kept docs — idempotent like
    the repo's other streaming sinks.  Read the result with
    ``spark.read.parquet(out_path)``.

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""
    from ..operators.textops import quality_model_scores

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        scored = quality_model_scores(
            bdf, text_col=text_col, weights=weights
        )
        kept = (
            bdf.join(scored, "doc_id")
            .filter(F.col("logit") > F.lit(threshold))
        )
        kept.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)


def streaming_bigram_lm_writer(
    stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    alpha: int = 1,
):
    """Streaming GRADED LM quality screen: score every arriving
    document's mean smoothed bigram probability under a bigram model
    trained ONCE on the standing corpus — the streaming twin of
    ``textops.bigram_lm_score_against`` (drained ≡ batch, float
    bit-equal: the pinned per-doc fold never sees other documents), the
    probability-graded companion to the hashed-classifier screen above.

    The stream IS the held-out set by construction (the model trains on
    the full standing corpus, never on arrivals), so no per-batch
    held-in split is needed.  The three model tables are cached and
    materialized up front; each micro-batch pays only its own bigram
    extraction + count-table probes + per-doc fold.  Output lands under
    ``out_path/batch=<id>`` with per-batch OVERWRITE (idempotent under
    re-delivery).  Returns the configured DataStreamWriter; the caller
    sets trigger / checkpoint and calls ``.start()``."""
    from ..operators.textops import bigram_lm_model, bigram_lm_score_against

    c12, c1, v = bigram_lm_model(corpus_docs, text_col)
    model = (c12.cache(), c1.cache(), v.cache())
    for df in model:
        df.count()  # materialize the frozen model before the first batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bigram_lm_score_against(
            bdf, model, text_col=text_col, alpha=alpha
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)


def streaming_trigram_lm_writer(
    stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    alpha: float | None = None,
):
    """Streaming stupid-backoff trigram LM screen: score every arriving
    document under the (c123, c12, c1, N) tables trained ONCE on the
    standing corpus — the streaming twin of
    ``textops.trigram_lm_score_against`` (drained ≡ batch, float
    bit-equal: each trigram's backoff score probes only the frozen
    model, and the per-doc pinned fold never sees other documents).

    Same shape as ``streaming_bigram_lm_writer``: the stream IS the
    held-out set (the model never trains on arrivals), the four model
    tables are cached and materialized up front, each micro-batch pays
    only its own window pass + count-table probes + per-doc fold.
    Output lands under ``out_path/batch=<id>`` with per-batch OVERWRITE
    (idempotent under re-delivery).  Returns the configured
    DataStreamWriter; the caller sets trigger / checkpoint and calls
    ``.start()``."""
    from ..operators.textops import (
        _SB_ALPHA,
        trigram_lm_model,
        trigram_lm_score_against,
    )

    if alpha is None:
        alpha = _SB_ALPHA
    model = tuple(df.cache() for df in trigram_lm_model(corpus_docs, text_col))
    for df in model:
        df.count()  # materialize the frozen model before the first batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        trigram_lm_score_against(
            bdf, model, text_col=text_col, alpha=alpha
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)
