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
    """True iff joining the two bucketed tables on ``key`` plans with no
    Exchange on either side (the layout actually co-locates the join).

    Use as an ETL-time guard: a False here means the bucket specs drifted
    (different counts, wrong column, or a writer dropped the spec) and
    every downstream join is paying a full-table shuffle it shouldn't."""
    joined = spark.table(left_table).join(spark.table(right_table), key)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
