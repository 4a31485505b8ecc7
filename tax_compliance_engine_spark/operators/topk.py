"""Skew-immune grouped top-k.

Spark lowers GLOBAL top-k to ``TakeOrderedAndProject`` (no full sort),
but per-GROUP top-k has no such operator — the standard window
``row_number() <= k`` sorts every row of a group inside one task, so one
hot group (a head domain, a viral token) serializes onto a single core
and spills alone.  ``top_k_per_group`` shards each group first: per-shard
top-k bounds what reaches the group-level window to ``k * n_shards``
rows per group, so the hot group's sort spreads across ``n_shards``
tasks and the final window touches a bounded set.

The result is IDENTICAL to the single-level window for any shard
assignment: a global top-k row can only be beaten within its shard by
rows that also beat it globally, so per-shard top-ks are always a
superset of the group top-k.  (Same two-level discipline as
``corpus.pack_sequences`` offsets and ``graph.pagerank`` folds.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    shard_by: Column | None = None,
    n_shards: int = 16,
    rank_col: str | None = None,
) -> DataFrame:
    """Top ``k`` rows per group under ``order_by`` (which must totally
    order rows within a group — append a unique column as the last sort
    key, or ranks among ties are nondeterministic), computed with a
    sharded two-level window.

    ``shard_by`` is any expression spreading a group's rows across
    shards (hashed mod ``n_shards``); the default hashes EVERY input
    column — content-derived, so a task retry recomputes the same
    assignment (a nondeterministic shard expression could land a row in
    two different shards across a partial stage recompute, and both
    copies would survive the two rank filters).  Output columns =
    input columns; pass ``rank_col`` to ALSO keep the final per-group
    rank (already computed for the filter — callers that re-rank the
    top-k output would otherwise pay a redundant window)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if shard_by is None:
        shard_by = F.struct(*[F.col(c) for c in df.columns])
    cols = df.columns
    shard = F.pmod(F.xxhash64(shard_by), F.lit(n_shards))
    w1 = Window.partitionBy(*group_cols, "_shard").orderBy(*order_by)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = (
        df.withColumn("_shard", shard)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
    )
    if rank_col is not None:
        return out.select(*cols, F.col("_r2").alias(rank_col))
    return out.select(*cols)


def sharded_global_rank(
    df: DataFrame,
    key: str,
    tiebreak: Column,
    shard_len: int = 2,
    out: str = "_r",
) -> DataFrame:
    """GLOBAL dense row rank over (``key`` ASC, ``tiebreak``) with NO
    single-partition sort — the two-level pattern ``dedup.snm_candidates``
    and ``queries.customer_value_deciles`` share (extracted so the
    rank-contiguity subtleties live in one audited place):

    ``key`` must be a STRING column whose first ``shard_len`` characters
    shard the sort order CONTIGUOUSLY (prefixes of a lexicographic key
    are contiguous ranges by construction — e.g. a normalized-text
    prefix, or a zero-padded decimal rendering of an integer).  Each
    shard ranks independently under one row_number window; shard
    offsets come from a broadcast non-equi self-join of the tiny
    per-shard count table (≤ |alphabet|^shard_len rows), and
    shard-local rank + offset IS the global rank.  Lengthen
    ``shard_len`` to hold per-shard sorts bounded as data grows.

    Output: all input columns plus the global rank as ``out``
    (1-based, long).  ``tiebreak`` together with ``key`` must totally
    order rows or ranks among ties are nondeterministic."""
    keyed = df.withColumn("_sgr_shard", F.substring(F.col(key), 1, shard_len))
    lw = Window.partitionBy("_sgr_shard").orderBy(F.asc(key), tiebreak)
    local = keyed.withColumn("_sgr_lr", F.row_number().over(lw))
    counts = keyed.groupBy("_sgr_shard").agg(F.count(F.lit(1)).alias("_sgr_cnt"))
    c2 = counts.select(
        F.col("_sgr_shard").alias("_sgr_s2"), F.col("_sgr_cnt").alias("_sgr_c2")
    )
    offsets = (
        counts.join(
            F.broadcast(c2), F.col("_sgr_s2") < F.col("_sgr_shard"), "left"
        )
        .groupBy("_sgr_shard")
        .agg(F.coalesce(F.sum("_sgr_c2"), F.lit(0)).alias("_sgr_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_sgr_shard")
        .withColumn(out, (F.col("_sgr_off") + F.col("_sgr_lr")).cast("long"))
        .drop("_sgr_shard", "_sgr_lr", "_sgr_off")
    )
