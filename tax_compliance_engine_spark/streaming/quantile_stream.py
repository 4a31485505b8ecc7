"""Streaming quantile monitoring with bounded per-group state.

The batch sketch (``operators/topk.grouped_quantile_sketch``) is built
on an associative, idempotent min-k-by-hash fold: the k rows per group
with the smallest deterministic LCG hash of the id.  Merging a
micro-batch's rows into the stored sample and re-cutting to k yields
EXACTLY the min-k of all rows ever seen — so the drained state
reproduces the batch sketch bit-for-bit regardless of how the stream
was chopped into micro-batches, and a re-delivered micro-batch is
absorbed by the id-dedupe before the cut (same rows → same sample).

State is one parquet directory holding ≤ k rows per group — O(k·groups)
forever, no watermark, no state store timeouts; the hash is recomputed
from the id on every merge, so state carries only real columns.  This
is the streaming twin the exact percentile can never have: an exact
per-type percentile over an unbounded stream needs unbounded state,
while the sketch's error stays the fixed ~1/√k rank bound.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import min_k_by_hash


def streaming_value_sketch_writer(
    stream: DataFrame,
    state_dir: str,
    group_cols: list[str],
    id_col: str,
    k: int = 512,
):
    """foreachBatch sink maintaining the per-group min-k-by-hash sample
    under ``state_dir`` (all stream columns are kept in the state, so
    any value column can be aggregated from it later).

    Each micro-batch: cut the batch to its own min-k, union with the
    stored sample, drop duplicate ids within a group (idempotent under
    re-delivery), re-cut to k, and atomically publish the new state
    (write to a staging dir, then swap — a reader never sees a
    half-written directory; single-writer per state_dir assumed, which
    is what one streaming query is).

    Returns the configured DataStreamWriter; the caller sets trigger /
    checkpoint and calls ``.start()``.  Read the current estimate with
    ``sketch_from_state``."""

    old = f"{state_dir}.old"

    def merge_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        # crash recovery: a writer that died between the two renames
        # below leaves the previous state parked at `old` — adopt it
        # rather than silently restarting from an empty sample (the
        # re-delivered micro-batch then merges on top, same fixed point)
        if not os.path.isdir(state_dir) and os.path.isdir(old):
            os.rename(old, state_dir)
        # in-batch id dedupe first: repeated ids (retries, or genuinely
        # repeating entity ids when the sample is keyed by e.g. user_id
        # for the reach sketch) must occupy ONE sample slot
        batch_cut = min_k_by_hash(
            bdf.dropDuplicates([*group_cols, id_col]), group_cols, id_col, k
        )
        if os.path.isdir(state_dir):
            prev = spark.read.parquet(state_dir).select(*batch_cut.columns)
            merged = prev.unionByName(batch_cut)
        else:
            merged = batch_cut
        new_state = min_k_by_hash(
            merged.dropDuplicates([*group_cols, id_col]),
            group_cols,
            id_col,
            k,
        )
        # reap staging dirs from ANY pid, not just our own: a writer
        # that crashed after writing staging but before the rename
        # leaves <state>.staging.<oldpid> behind, and the restarted
        # process (new pid) would otherwise never clean it
        # (single-writer per state_dir is already assumed)
        staging = f"{state_dir}.staging.{os.getpid()}"
        for stale in glob.glob(f"{state_dir}.staging.*"):
            shutil.rmtree(stale, ignore_errors=True)
        new_state.write.mode("overwrite").parquet(staging)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(state_dir):
            os.rename(state_dir, old)
        os.rename(staging, state_dir)
        shutil.rmtree(old, ignore_errors=True)

    return stream.writeStream.foreachBatch(merge_batch)


def sketch_from_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    value_col: str,
    quantiles: dict[str, float],
) -> DataFrame:
    """Current quantile estimate from the persisted sample state — the
    same aggregate ``grouped_quantile_sketch`` runs on its in-plan
    sample, so after draining a stream this equals the batch sketch of
    the full input bit-for-bit (parquet round-trips the sample rows
    exactly; the quantile interpolation sees identical values)."""
    state = spark.read.parquet(state_dir)
    aggs = [F.count(F.lit(1)).alias("sample_n")]
    for name, q in quantiles.items():
        aggs.append(
            F.expr(f"percentile(`{value_col}`, {q!r})").alias(name)
        )
    return state.groupBy(*group_cols).agg(*aggs)


def reach_from_state(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Current distinct-ID cardinality estimate from the SAME persisted
    min-k sample state (the hash is a pure function of the id, so the
    KMV order statistic is recomputable from the stored rows): exact
    count below k, (k−1)·M / h_k at k — bit-identical to
    ``topk.grouped_reach_sketch`` over the drained input.  ``k`` must
    be the writer's k: the state holds min-k rows, and the estimator
    needs to know whether the cut bound.

    Implementation: the sketch operator run ON the state — min-k of a
    min-k sample is itself (idempotent fold), so this is literally the
    batch estimator with its dedupe and cut as no-ops, one code path."""
    from ..operators.topk import grouped_reach_sketch

    return grouped_reach_sketch(
        spark.read.parquet(state_dir), group_cols, id_col, k
    )
