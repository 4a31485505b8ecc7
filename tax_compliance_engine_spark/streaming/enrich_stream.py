"""Streaming point-in-time enrichment: arriving facts join the
dimension AS OF their own event position, not as of processing time.

The classic warehouse-streaming correctness trap is enriching a late
fact with the dimension's CURRENT version — a fact generated under
seq 1 must see the seq-1 dimension payload even if it arrives after
seq 2 rewrote the row.  ``cdc.pit_lookup`` already answers that for a
batch of probes; a fact's enrichment depends only on its own
(key, as_of seq) and the FIXED dimension history, so micro-batch-local
lookup IS the global semantics (the same argument as the streaming
decontamination and quality screens): no state store, no watermark,
bounded memory forever.

Output lands under ``out_path/batch=<id>`` with per-batch OVERWRITE so
re-delivery rewrites the same directory instead of duplicating rows —
the repo's idempotent append-sink convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cdc import pit_lookup


def streaming_pit_enrich_writer(
    facts_stream: DataFrame,
    dim_changes: DataFrame,
    out_path: str,
    payload_cols: list[str],
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    as_of_col: str = "as_of_seq",
):
    """Configure a ``foreachBatch`` writer that point-in-time-enriches
    each micro-batch of facts against the static ``dim_changes``
    CDC/SCD2 history (resolved per batch by ``pit_lookup`` — facts for
    never-written or then-deleted keys carry ``is_live = false`` and
    NULL payload, they are not dropped: the consumer decides).

    ``dim_changes`` is resolved ONCE against the batch session and
    reused across micro-batches.  Returns the configured
    DataStreamWriter; the caller sets trigger / checkpoint and calls
    ``.start()``.  Read the result with
    ``spark.read.parquet(out_path)``."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        enriched = pit_lookup(
            bdf,
            dim_changes,
            payload_cols=payload_cols,
            key_col=key_col,
            seq_col=seq_col,
            op_col=op_col,
            as_of_col=as_of_col,
        )
        enriched.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return facts_stream.writeStream.foreachBatch(write_batch)
