"""Grouped top-k (operators/topk.py): equivalence with the plain window
form (the semantics), shard-count invariance (the correctness argument —
any shard assignment yields the same rows), and the validation
contract.  The swept `events_top_users` query pins bit-exact values vs
DuckDB; these tests pin the operator over adversarial shapes the sweep
doesn't cover (a hot group, k larger than the group, duplicate order
keys broken by the tie-break column)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import topk


def _window_reference(df, group_cols, order_by, k):
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def skewed(spark):
    # group "hot": 400 rows (scores collide on purpose — id breaks
    # ties); groups "a"/"b": small; group "solo": fewer rows than k
    rows = (
        [Row(g="hot", id=i, score=i % 40) for i in range(400)]
        + [Row(g="a", id=i, score=100 - i) for i in range(20)]
        + [Row(g="b", id=i, score=7) for i in range(10)]
        + [Row(g="solo", id=1, score=1), Row(g="solo", id=2, score=2)]
    )
    return spark.createDataFrame(rows)


def test_matches_window_reference_and_shard_invariance(spark, skewed):
    order = [F.col("score").desc(), F.col("id").asc()]
    want = _rows(_window_reference(skewed, ["g"], order, 5))
    for n_shards in (1, 3, 16):
        got = _rows(
            topk.top_k_per_group(
                skewed,
                ["g"],
                order,
                k=5,
                shard_by=F.col("id"),
                n_shards=n_shards,
            )
        )
        assert got == want, f"n_shards={n_shards}"
    # default all-columns content hash: same rows (assignment-independent)
    assert (
        _rows(topk.top_k_per_group(skewed, ["g"], order, k=5)) == want
    )


def test_small_groups_keep_everything(spark, skewed):
    got = topk.top_k_per_group(
        skewed.filter(F.col("g") == "solo"),
        ["g"],
        [F.col("score").desc(), F.col("id").asc()],
        k=5,
        shard_by=F.col("id"),
    )
    assert got.count() == 2


def test_validation(spark, skewed):
    with pytest.raises(ValueError, match="k must be positive"):
        topk.top_k_per_group(skewed, ["g"], [F.col("id")], k=0)
    with pytest.raises(ValueError, match="n_shards must be positive"):
        topk.top_k_per_group(skewed, ["g"], [F.col("id")], k=1, n_shards=0)
