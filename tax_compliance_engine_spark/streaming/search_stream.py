"""Streaming BM25 query serving over a standing corpus index.

``streaming_bm25_writer`` is the streaming twin of
``operators/corpus.bm25_search`` (drained ≡ batch): the corpus's index
artifacts — full postings, document lengths, the one-row N/avgdl stats —
are built ONCE (``corpus.bm25_index``, cached and materialized up
front; at 100 TB these are the persisted inverted-index parquet
artifacts an ingest pipeline refreshes with the corpus), and every
arriving micro-batch of queries pays only its own broadcast-filtered
probe of the postings plus the per-query top-k.

A query's ranked result is a pure function of the query's tokens and
the FIXED index — never of other queries on the stream — so
micro-batch-local scoring IS the global semantics (the
``streaming_decontaminate_writer`` property): no state store, no
watermark, bounded memory forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_bm25_writer(
    query_stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    n_shards: int = 16,
    id_col: str = "query_id",
    terms_col: str = "terms",
):
    """Serve BM25 top-``k`` results for a stream of (query_id,
    terms array<string>) rows against the static corpus — bit-identical
    scores to ``corpus.bm25_search`` on the same queries (same
    surrogate-idf float-op sequence; per-token tf/df are unchanged by
    whether the postings were pre-filtered per query set or served from
    the full prepared index).

    Query hygiene matches the batch contract as closely as a stream
    allows: per-query duplicate and empty terms are dropped; a query
    with NO usable terms is screened out (the batch API raises — a
    stream can't, so the row is skipped; results for it would be empty
    either way).

    Output lands under ``out_path/batch=<id>`` with per-batch OVERWRITE
    (idempotent under micro-batch re-delivery, like the repo's other
    streaming sinks).  Returns the configured DataStreamWriter; the
    caller sets trigger / checkpoint and calls ``.start()``."""
    from ..operators.corpus import bm25_index, bm25_score_queries

    postings, sized, stats = bm25_index(corpus_docs, text_col)
    postings = postings.cache()
    sized = sized.cache()
    stats = stats.cache()
    postings.count()  # materialize the index before the first batch
    sized.count()
    stats.count()

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        qtoks = (
            bdf.select(
                F.col(id_col).alias("query_id"),
                F.explode(terms_col).alias("token"),
            )
            .filter(F.col("token") != "")
            .distinct()
        )
        bm25_score_queries(
            postings,
            sized,
            stats,
            qtoks,
            k1=k1,
            b=b,
            k=k,
            n_shards=n_shards,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return query_stream.writeStream.foreachBatch(write_batch)
