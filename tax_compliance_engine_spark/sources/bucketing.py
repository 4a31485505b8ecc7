"""Bucketed-table layout: the shuffle-elimination primitive for repeated
big-big joins and aggregations at 100 TB.

A fact table bucketed by its join key is Spark's answer to co-located
joins: both sides pre-hash-partitioned into the same number of buckets on
the same key lets Catalyst plan a SortMergeJoin with NO Exchange on either
side — the one-time ETL shuffle replaces a per-query shuffle of the full
fact table.  Same for aggregations keyed by the bucket column: the partial
aggregation feeds straight into the final one without a redistribution.

This module wraps the saveAsTable bucketing API (bucketBy only exists for
managed/metastore tables — a plain ``.parquet(path)`` write silently drops
the bucket spec) and asserts the planner actually honored the layout,
because a bucketed join that silently degrades to shuffle-both-sides is
the kind of regression that only shows up at the 100 TB bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its per-task sort on
    read — the scan is already in join order.  ``n_buckets`` is the unit of
    read parallelism for bucket-aware scans: at production scale pick
    buckets ≈ cluster cores × small constant, and keep it IDENTICAL on
    every table that joins on this key (bucket counts must match for the
    exchange to be elided)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> bool:
    """True iff joining the two bucketed tables on ``key`` plans as a
    SortMergeJoin with no Exchange on either side (the layout actually
    co-locates the join).

    The probe pins the planner into the shape bucketing is supposed to
    win: broadcast joins are disabled (a BroadcastExchange plan proves
    nothing about the bucket layout — small test tables would always pass)
    and AQE is off (its re-planning can rewrite the plan string mid-probe).
    A positive answer therefore requires the literal SortMergeJoin-over-
    bucketed-scans plan, and a negative one means the bucket specs drifted
    (different counts, wrong column, or a writer dropped the spec) — every
    downstream join would pay a full-table shuffle it shouldn't."""
    pinned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in pinned}
    try:
        for k, v in pinned.items():
            spark.conf.set(k, v)
        joined = spark.table(left_table).join(spark.table(right_table), key)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return (
        "SortMergeJoin" in plan
        and "Exchange hashpartitioning" not in plan
        and "BroadcastExchange" not in plan
    )
