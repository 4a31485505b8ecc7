"""Streaming CDC with materialized-view maintenance: one change-feed
stream keeps BOTH the bucketed corpus snapshot and its rollup current.

Per micro-batch: the rollup is updated FIRST from the delta alone
(``cdc.incremental_rollup`` against the still-pre-change snapshot) and
published atomically WITH a batch-id marker inside the new directory;
the version-guarded snapshot merge runs second.  That ordering plus the
marker closes every crash window for the two stores:

- crash before the agg publish → replay finds the old marker, recomputes
  against the untouched snapshot — correct;
- crash between the agg publish and the merge → replay finds its own
  batch id in the marker, SKIPS the agg update, and (re)runs the merge —
  correct (the guarded merge is idempotent per bucket);
- re-delivery after full success → marker skip + guard no-op.

Assumes what ``streaming_cdc_writer`` already assumes: micro-batches
arrive sequentially (Structured Streaming's contract — batch N+1 is
delivered only after batch N's sink returned) over a per-key-ordered
transport, and the snapshot carries the version-guard column.

State: the rollup parquet (≤ |groups| rows) and the snapshot itself —
no state store, no watermark; memory stays bounded forever.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import incremental_merge_write, incremental_rollup

_MARKER = "_applied_batch"  # leading underscore: invisible to parquet scans


def _last_applied(agg_path: str) -> int:
    try:
        with open(os.path.join(agg_path, _MARKER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, NotADirectoryError, ValueError):
        return -1


def _rollup_of(
    base: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str,
) -> DataFrame:
    """The exact aggregate shape ``incremental_rollup`` maintains —
    defined once so bootstrap and maintenance can never drift."""
    return base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.coalesce(F.sum(F.col(src).cast("long")), F.lit(0)).alias(out)
            for out, src in sum_cols.items()
        ],
    )


def streaming_cdc_rollup_writer(
    changes_stream: DataFrame,
    snapshot_path: str,
    agg_path: str,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    n_buckets: int = 64,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    base_version_col: str | None = "version",
):
    """``streaming_cdc_writer`` plus materialized-view maintenance: each
    micro-batch updates the rollup at ``agg_path`` from the delta alone
    (O(|delta|) — the snapshot is never re-aggregated after bootstrap),
    then merges the snapshot in place.  The first batch bootstraps the
    rollup from the current snapshot if ``agg_path`` doesn't exist yet.

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``.  Read the view with
    ``spark.read.parquet(agg_path)``."""

    old = f"{agg_path}.old"

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        # adopt a publish parked mid-swap by a crashed writer
        if not os.path.isdir(agg_path) and os.path.isdir(old):
            os.rename(old, agg_path)
        if batch_id > _last_applied(agg_path):
            base = spark.read.parquet(snapshot_path)
            agg = (
                spark.read.parquet(agg_path)
                if os.path.isdir(agg_path)
                else _rollup_of(base, group_cols, sum_cols, count_col)
            )
            new_agg = incremental_rollup(
                base,
                agg,
                bdf,
                group_cols,
                sum_cols,
                count_col=count_col,
                key_col=key_col,
                seq_col=seq_col,
                op_col=op_col,
            )
            # reap staging dirs from ANY pid: a writer that crashed
            # pre-rename leaves <agg>.staging.<oldpid> behind and the
            # restarted process (new pid) would never clean it
            staging = f"{agg_path}.staging.{os.getpid()}"
            for stale in glob.glob(f"{agg_path}.staging.*"):
                shutil.rmtree(stale, ignore_errors=True)
            new_agg.write.mode("overwrite").parquet(staging)
            with open(os.path.join(staging, _MARKER), "w") as fh:
                fh.write(str(batch_id))
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(agg_path):
                os.rename(agg_path, old)
            os.rename(staging, agg_path)
            shutil.rmtree(old, ignore_errors=True)
        # the guarded merge runs on EVERY delivery (idempotent), so a
        # crash after the agg publish is healed by the replay
        incremental_merge_write(
            spark,
            snapshot_path,
            bdf,
            n_buckets=n_buckets,
            key_col=key_col,
            seq_col=seq_col,
            op_col=op_col,
            base_version_col=base_version_col,
        )

    return changes_stream.writeStream.foreachBatch(write_batch)
