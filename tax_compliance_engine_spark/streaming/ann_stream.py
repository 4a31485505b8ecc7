"""Streaming ANN query serving over a persisted IVFPQ index.

``streaming_ivfpq_knn_writer`` completes the "build once, serve
forever" story the BM25 stream proves for text retrieval: the four
index artifacts (coarse centroids, inverted-file assignments, residual
codebooks, nibble codes) are built ONCE per corpus snapshot — locally
via ``similarity.ivfpq_index`` or loaded from the parquet artifacts
``similarity.save_ann_index`` persists — and every arriving micro-batch
of query vectors pays only its own probe + ADC + shortlist re-rank.

A query's ranked neighbors are a pure function of the query vector and
the FROZEN index — never of other queries on the stream — so
micro-batch-local scoring IS the global semantics (the
``streaming_bm25_writer`` property): no state store, no watermark,
bounded memory forever.  Drained output over replayed corpus-query ids
is bit-identical to the batch ``ivfpq_knn`` on the same predicate
(pinned-order folds and exactly-rounded IEEE ops end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_ivfpq_knn_writer(
    query_stream: DataFrame,
    corpus_emb: DataFrame,
    index: dict[str, DataFrame],
    out_path: str,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    id_col: str = "query_id",
    vec_col: str = "embedding",
):
    """Serve IVFPQ top-``k`` neighbors for a stream of (query_id,
    embedding) rows against the frozen index — bit-identical distances
    to batch ``similarity.ivfpq_knn`` on the same query vectors.

    ``index`` is the component map {centroids, assignments, codebooks,
    codes} — typically ``similarity.load_ann_index`` over the artifacts
    a build pipeline persisted; all four are cached and materialized
    up front so no micro-batch re-reads the artifacts.  ``corpus_emb``
    supplies the true vectors the shortlist re-rank fetches (the
    standard IVFPQ deployment: codes in memory, full vectors in the
    store, touched for shortlist rows only).

    Contract: one row per query_id per batch (duplicate ids are
    exact-row redeliveries and are deduplicated; two DIFFERENT vectors
    under one id are a caller error).  Output lands under
    ``out_path/batch=<id>`` with per-batch OVERWRITE (idempotent under
    micro-batch re-delivery, like the repo's other streaming sinks).
    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""
    from ..operators import similarity

    components = {name: df.cache() for name, df in index.items()}
    for df in components.values():
        df.count()  # materialize the frozen index before the first batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        queries = bdf.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col)
        ).dropDuplicates(["query_id"])
        similarity.ivfpq_knn(
            corpus_emb,
            query_pred=None,
            centroids=components["centroids"],
            assignments=components["assignments"],
            codebooks=components["codebooks"],
            codes=components["codes"],
            k=k,
            nprobe=nprobe,
            shortlist=shortlist,
            vec_col=vec_col,
            queries_df=queries,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return query_stream.writeStream.foreachBatch(write_batch)


def streaming_semdedup_screen_writer(
    stream: DataFrame,
    index: tuple[DataFrame, DataFrame],
    out_path: str,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Streaming SEMANTIC-dup ingest screen over a frozen SemDeDup index
    (``similarity.semdedup_index``): every arriving embedding is
    assigned to its nearest trained centroid and scored against that
    cell's kept representatives — match witness, best cosine, keep
    verdict — the semantic companion to the winnowed-fingerprint and
    near-dup ingest screens.

    A verdict is a pure function of (vector, frozen index), never of
    other arrivals, so micro-batch-local scoring IS the global
    semantics (drained ≡ batch ``semdedup_screen``, float bit-equal):
    no state store, no watermark.  The two index frames are cached and
    materialized up front; each micro-batch pays its own broadcast
    assignment + one cell-keyed rep join.  Output lands under
    ``out_path/batch=<id>`` with per-batch OVERWRITE (idempotent under
    re-delivery).  Returns the configured DataStreamWriter; the caller
    sets trigger / checkpoint and calls ``.start()``."""
    from ..operators.similarity import semdedup_screen

    cents, reps = index
    index = (cents.cache(), reps.cache())
    for df in index:
        df.count()  # materialize the frozen index before the first batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        semdedup_screen(
            bdf, index, threshold=threshold, vec_col=vec_col, id_col=id_col
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)
