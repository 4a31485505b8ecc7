"""Streaming CDC apply: a change-feed stream maintains the bucketed
on-disk snapshot incrementally, one partition-pruned merge per
micro-batch.

This is the live half of `operators/cdc.py` — the batch family defines
the merge semantics (latest seq wins, equal-seq delete outranks upsert,
version-guarded staleness); here a ``foreachBatch`` sink applies the
SAME operator per micro-batch via ``incremental_merge_write``, so the
drained stream and one batch ``apply_changes`` over the union of all
feeds agree row-for-row (pinned by pytest).

Idempotence under re-delivery comes from the VERSION GUARD, not from a
batch-id directory: re-running a committed micro-batch finds every
change's seq ≤ the snapshot's stored version and discards it, and a
re-delivered delete of an absent key is a no-op — so the sink mutates
in place safely (the repo's other streaming sinks are append-shaped
and use per-batch overwrite directories instead; a MERGE sink can't,
its output is the snapshot itself).  Known ordering limit documented on
``apply_changes``: deletes leave no tombstone, so the transport must
not reorder a key's upserts around its delete (key-partitioned logs
guarantee this); re-delivery of the SAME prefix is always safe.

State: none (no state store, no watermark — each merge touches only
affected buckets); memory stays bounded forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.cdc import incremental_merge_write


def streaming_cdc_writer(
    changes_stream: DataFrame,
    snapshot_path: str,
    n_buckets: int = 64,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    base_version_col: str | None = "version",
):
    """Configure a ``foreachBatch`` writer that merges each micro-batch
    of changes into the bucketed snapshot at ``snapshot_path`` (written
    by ``cdc.write_bucketed_snapshot``; give the initial load a
    ``version`` column — ``F.lit(None).cast("long")`` — so the guard
    has somewhere to live).

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        incremental_merge_write(
            bdf.sparkSession,
            snapshot_path,
            bdf,
            n_buckets=n_buckets,
            key_col=key_col,
            seq_col=seq_col,
            op_col=op_col,
            base_version_col=base_version_col,
        )

    return changes_stream.writeStream.foreachBatch(write_batch)
