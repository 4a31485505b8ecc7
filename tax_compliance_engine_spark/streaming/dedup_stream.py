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


def streaming_decontaminate_writer(
    stream: DataFrame,
    benchmark: DataFrame,
    out_path: str,
    n: int = 5,
    text_col: str = "text",
):
    """Streaming benchmark-decontamination filter: append to ``out_path``
    only the arriving documents that share NO token ``n``-gram with the
    static benchmark set — the hygiene screen applied at ingest time
    instead of as a batch sweep (streaming twin of
    ``operators/corpus.decontaminate``, drained ≡ batch).

    A doc's verdict depends only on the doc itself and the FIXED
    benchmark — never on other stream docs — so micro-batch-local
    filtering IS the global semantics, and the sink is a
    ``foreachBatch`` that applies the SAME three-regime batch operator
    to each micro-batch (same broadcast/bloom/shuffle plan selection,
    same anti-join, bit-identical keep decisions).  No state store, no
    watermark: memory stays bounded forever.  (A pure stream-side
    formulation would need the drop expressed as stream⟕stream —
    the contaminated-id set derives from the stream — which Structured
    Streaming rejects for left-anti; judging per micro-batch against
    the static side avoids that without changing the result.)

    Output lands under ``out_path/batch=<id>`` with per-batch OVERWRITE,
    so micro-batch RE-delivery (a crash between the parquet commit and
    the checkpoint) rewrites the same directory instead of appending the
    same kept docs twice — idempotent like the repo's other streaming
    sinks.  Read the result with ``spark.read.parquet(out_path)`` (the
    batch id surfaces as a partition column; drop it if unwanted).

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""
    from ..operators.corpus import decontaminate_plan

    # static side prepared ONCE (gram set cached+counted, regime chosen);
    # each micro-batch only pays the anti-join
    keep = decontaminate_plan(benchmark, n=n, text_col=text_col)

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        keep(bdf).write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return stream.writeStream.foreachBatch(write_batch)


def streaming_span_screen_writer(
    stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    max_coverage_pct: int = 50,
):
    """Streaming SPAN-duplication screen: score every arriving document's
    n-gram coverage against a standing corpus's duplicated-gram set —
    the streaming twin of ``operators/dedup.span_screen`` (drained ≡
    batch), closing the span-dedup family's streaming gap the way
    ``streaming_incremental_dedup`` closed MinHash's.

    A document's (covered_tokens, dup_coverage, keep) verdict is a pure
    function of the doc itself and the FIXED corpus gram set — never of
    other stream documents — so micro-batch-local scoring IS the global
    semantics and no state store, watermark, or eviction policy exists:
    memory stays bounded forever.  The gram set is prepared ONCE
    (cached + materialized here; at 100 TB it is the persisted artifact
    ``corpus_dup_grams`` documents, refreshed with the corpus), so each
    micro-batch pays only the equi-join membership test and its own
    row-linear gram explode.

    Output lands under ``out_path/batch=<id>`` with per-batch
    OVERWRITE — micro-batch re-delivery rewrites the same directory
    instead of double-appending (idempotent, like the repo's other
    streaming sinks).  Read back with ``spark.read.parquet(out_path)``.

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""
    from ..operators.dedup import corpus_dup_grams, span_screen

    dup_grams = corpus_dup_grams(corpus_docs, text_col, n, min_docs).cache()
    dup_grams.count()  # materialize once, before the first micro-batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        span_screen(
            bdf,
            text_col=text_col,
            n=n,
            min_docs=min_docs,
            max_coverage_pct=max_coverage_pct,
            dup_grams=dup_grams,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)


def streaming_incremental_dedup(
    stream: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming ingest screen against a STANDING corpus: for every doc
    arriving on the stream, emit its near-dup matches in the static
    corpus — the streaming twin of
    ``operators/dedup.incremental_minhash_pairs`` (drained ≡ batch).

    Plan shape: row-local MinHash components on the stream
    (``minhash_components_inline`` — no shuffle aggregation, legal on an
    unbounded stream), band explode, then a STREAM-STATIC equi-join on
    (band, band_sig) with first-shared-band in-join dedup.  Stream-
    static joins are STATELESS in Structured Streaming — each
    micro-batch probes the static side and nothing is retained — so
    this runs forever in bounded memory with no watermark, no state
    store, and no eviction policy; the only growing thing is the output.
    (Contrast ``streaming_near_dedup``, which must keep bucket-residency
    state because it also pairs stream docs with EARLIER stream docs.)

    At 100 TB the static side is the corpus's persisted banded signature
    table (bucketed by (band, band_sig)); here it derives in-plan from
    ``corpus_docs``.  Empty stream docs (no tokens → NULL components)
    are screened out, matching the batch operator's aggregation-side
    omission."""
    from ..operators import dedup as d

    stream_per_doc = stream.select(
        F.col(id_col).alias("doc_id"),
        *d.minhash_components_inline(F.col(text_col)),
    ).filter(F.col("_mh0").isNotNull())
    return d.asymmetric_banded_est_pairs(
        stream_per_doc,
        d._minhash_per_doc(corpus_docs, text_col),
        threshold,
        broadcast_new=False,  # an unbounded stream can't be a broadcast build
    )


NEAR_DEDUP_OUT_SCHEMA = "doc1 long, doc2 long, est_jaccard double"
_NEAR_STATE_SCHEMA = (
    "doc_ids array<long>, sigs array<array<long>>, comps array<array<long>>"
)


def streaming_near_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Streaming NEAR-dup detection: an append stream of
    (doc1, doc2, est_jaccard) MinHash-LSH candidate pairs — the streaming
    twin of ``operators/dedup.minhash_est_pairs``, drained-stream ≡ batch
    (same signatures, same first-shared-band dedup, same ≥ threshold
    estimate filter; pinned by pytest).

    Plan shape, mirroring the batch bucket-local layout:

    1. signatures are computed ROW-LOCALLY per document
       (``dedup.minhash_components_inline`` — bit-identical to the batch
       groupBy form, but shuffle-free, so it runs as a stream
       projection);
    2. the banded explode is a row-local flatMap (``dedup._banded`` is
       select+explode, streaming-safe);
    3. the band-bucket self-join becomes per-bucket STATE: one
       ``applyInPandasWithState`` keyed by (band, band_sig) holding the
       bucket's (doc_id, all band sigs, 16 components) — each arriving
       doc pairs against its bucket's residents, scores the estimated
       Jaccard from stored components, and joins the residency list.

    Pair-level dedup needs NO cross-bucket coordination: a pair sharing
    several bands is emitted only by the bucket of the FIRST shared band
    (both docs' full 4-band signature vectors are in state, so the first
    shared band is computable bucket-locally) — the same rule the batch
    in-join dedup applies.  Re-delivered doc_ids are idempotently
    skipped.

    State is the bucket residency lists: O(Σ bucket sizes) = BANDS ×
    |docs| rows of 21 longs across the cluster's state stores —
    the same asymptotics as the batch layout's banded shuffle, spread
    over time.  By default this is global (no eviction) like
    ``streaming_exact_dedup``'s unbounded mode, and a hot bucket's
    arrival loop is O(bucket size) — for endless ingest, set
    ``max_bucket_size``: each bucket keeps only its most recent
    ``max_bucket_size`` residents (FIFO eviction), bounding both state
    and per-arrival work.  The trade mirrors the watermark mode's
    contract: near-dups are only caught against residents still in the
    window (and an evicted doc_id re-delivered later is treated as new),
    so drained ≡ batch holds only in the default unbounded mode."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators import dedup
    from ..functions import hashing

    n_perms = len(hashing.MINHASH_PERMS)
    per_doc = stream.select(
        F.col(id_col).alias("doc_id"),
        *dedup.minhash_components_inline(F.col(text_col)),
    ).filter(F.col("_mh0").isNotNull())
    banded = dedup._banded(
        per_doc,
        with_all_sigs=True,
        sig="long",
        extra=tuple(f"_mh{i}" for i in range(n_perms)),
    ).select(
        "band",
        "band_sig",
        "doc_id",
        F.col("all_sigs").alias("sigs"),
        F.array(*[f"_mh{i}" for i in range(n_perms)]).alias("comps"),
    )

    def func(key, pdfs, state: "GroupState"):
        band = int(key[0])
        if state.exists:
            doc_ids, sigs, comps = state.get
            doc_ids = list(doc_ids)
            sigs = [list(s) for s in sigs]
            comps = [list(c) for c in comps]
        else:
            doc_ids, sigs, comps = [], [], []
        arrivals: list[tuple[int, list[int], list[int]]] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                arrivals.append(
                    (int(r.doc_id), [int(s) for s in r.sigs], [int(c) for c in r.comps])
                )
        arrivals.sort()
        known = set(doc_ids)
        out: list[tuple[int, int, float]] = []
        for doc_id, asigs, acomps in arrivals:
            if doc_id in known:  # idempotent re-delivery
                continue
            for other_id, osigs, ocomps in zip(doc_ids, sigs, comps):
                first_shared = next(
                    (j for j in range(len(asigs)) if asigs[j] == osigs[j]),
                    None,
                )
                if first_shared != band:
                    continue  # another bucket owns this pair
                est = sum(
                    1 for x, y in zip(acomps, ocomps) if x == y
                ) / float(n_perms)
                if est >= threshold:
                    lo, hi = sorted((doc_id, other_id))
                    out.append((lo, hi, est))
            doc_ids.append(doc_id)
            sigs.append(asigs)
            comps.append(acomps)
            known.add(doc_id)
        if max_bucket_size is not None and len(doc_ids) > max_bucket_size:
            doc_ids = doc_ids[-max_bucket_size:]
            sigs = sigs[-max_bucket_size:]
            comps = comps[-max_bucket_size:]
        state.update((doc_ids, sigs, comps))
        if out:
            yield pd.DataFrame(out, columns=["doc1", "doc2", "est_jaccard"])

    return banded.groupBy("band", "band_sig").applyInPandasWithState(
        func,
        NEAR_DEDUP_OUT_SCHEMA,
        _NEAR_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_winnow_screen_writer(
    stream: DataFrame,
    corpus_docs: DataFrame,
    out_path: str,
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    df_cap: int = 50,
):
    """Streaming winnowed-fingerprint copy screen: score every arriving
    document's fingerprint overlap against a standing corpus's
    fingerprint set — the streaming twin of ``operators/dedup
    .winnow_screen`` (drained ≡ batch), closing the winnowing family's
    streaming gap the way ``streaming_span_screen_writer`` closed span
    dedup's.

    A document's (n_fps, n_matched, keep) verdict is a pure function of
    the doc itself and the FIXED corpus fingerprint set — never of
    other stream documents — so micro-batch-local scoring IS the global
    semantics: no state store, no watermark, bounded memory forever.
    The corpus side is prepared ONCE (``winnow_corpus_fps``, cached +
    materialized here; at 100 TB the parquet-persisted artifact a
    refresh pipeline maintains).

    Output lands under ``out_path/batch=<id>`` with per-batch OVERWRITE
    (idempotent under re-delivery).  Returns the configured
    DataStreamWriter; the caller sets trigger / checkpoint and calls
    ``.start()``."""
    from ..operators.dedup import winnow_corpus_fps, winnow_screen

    corpus_fps = winnow_corpus_fps(
        corpus_docs, k=k, w=w, df_cap=df_cap, text_col=text_col
    ).cache()
    corpus_fps.count()  # materialize once, before the first micro-batch

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        winnow_screen(
            bdf,
            corpus_fps,
            min_shared=min_shared,
            k=k,
            w=w,
            text_col=text_col,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return stream.writeStream.foreachBatch(write_batch)


def streaming_winnow_index_writer(
    stream: DataFrame,
    index_path: str,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
):
    """INCREMENTAL maintenance of the persisted winnow corpus index: each
    micro-batch of new documents merges its fingerprint counts into the
    (fp_hash, df) parquet at ``index_path`` — the refresh path the
    frozen-index screen (``streaming_winnow_screen_writer``, which
    serves ``winnow_corpus_fps``' capped projection of these counts)
    was missing.  The standing corpus is NEVER re-fingerprinted: cost
    per batch is the batch's own fingerprints plus one |index|-row
    merge join (``dedup.winnow_merge_fp_counts``).

    Crash-safety is the ``streaming_cdc_rollup_writer`` discipline,
    verbatim: write the merged counts to ``<index>.staging.<pid>``
    (reaping stale staging dirs from ANY pid first), stamp the batch-id
    marker inside, swap via ``<index>.old``, adopt a publish parked
    mid-swap on restart, and SKIP batches at or below the marker — so
    micro-batch re-delivery is idempotent even though the count merge
    itself is not.  The first batch bootstraps an empty index.

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``.  Read the counts with
    ``spark.read.parquet(index_path)``; serve the screen set as
    ``counts.filter(df <= cap).select("fp_hash")``."""
    import glob
    import os
    import shutil

    from ..operators.dedup import winnow_fp_counts, winnow_merge_fp_counts
    from .rollup_stream import _MARKER, _last_applied

    old = f"{index_path}.old"

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        # adopt a publish parked mid-swap by a crashed writer
        if not os.path.isdir(index_path) and os.path.isdir(old):
            os.rename(old, index_path)
        if batch_id <= _last_applied(index_path):
            return  # re-delivery: already merged, skip (idempotence)
        if os.path.isdir(index_path):
            merged = winnow_merge_fp_counts(
                spark.read.parquet(index_path),
                bdf,
                k=k,
                w=w,
                text_col=text_col,
            )
        else:
            merged = winnow_fp_counts(bdf, k=k, w=w, text_col=text_col)
        staging = f"{index_path}.staging.{os.getpid()}"
        for stale in glob.glob(f"{index_path}.staging.*"):
            shutil.rmtree(stale, ignore_errors=True)
        merged.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, _MARKER), "w") as fh:
            fh.write(str(batch_id))
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(index_path):
            os.rename(index_path, old)
        os.rename(staging, index_path)
        shutil.rmtree(old, ignore_errors=True)

    return stream.writeStream.foreachBatch(write_batch)
