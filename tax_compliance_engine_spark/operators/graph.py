"""Iterative graph analytics over edge DataFrames.

Connected components live in ``dedup.dup_clusters`` (alternating
large-star/small-star); this module adds fixed-iteration PageRank — the
canonical "importance over a similarity/link graph" score, used in data
curation to pick central cluster representatives and to weight
documents by graph centrality.

Bit-portability is the interesting part of an ITERATIVE float
algorithm: every per-node contribution sum is a src-ordered sequential
fold, and every scalar step ((1−d)/N, d·Σ, rank/deg) is a single
exactly-rounded IEEE op mirrored verbatim in the DuckDB twin — so even
after k chained iterations the ranks hash bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node_id",
) -> DataFrame:
    """Fixed-iteration PageRank: rank_{k+1}(v) = (1−d)/N +
    d · Σ_{u→v} rank_k(u)/outdeg(u), run for exactly ``iterations``
    rounds from the uniform start (no convergence test — fixed plans
    stay deterministic and oracle-checkable).

    Dangling mass is NOT redistributed (nodes without out-edges simply
    leak their share — the common simplification; symmetrized
    similarity graphs have no dangling nodes anyway).  Isolated nodes
    hold the base rank (1−d)/N.

    Plan shape per iteration: one broadcast-joinable outdeg table, one
    shuffle of (dst, contribution) pairs with the src-ordered fold in
    the dst aggregation, one left join back onto the node set — k
    iterations = k keyed shuffles, never a collect.  Each (src, dst)
    edge must be unique (sort by src is the fold's total order).

    ``edges``/``nodes`` are cached here: the final DAG references the
    edge plan once per iteration plus the degree pass, so an expensive
    caller-supplied edge pipeline (e.g. LSH near-dup pairs) would
    otherwise re-execute ~k+1 times.  An empty node set returns an
    empty result rather than dividing by zero."""
    edges = edges.cache()
    nodes = nodes.cache()
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col), F.lit(0.0).alias("rank")
        )  # empty: no ranks to compute
    base = (1.0 - damping) / float(n)
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("_deg"))
    ranks = nodes.select(
        F.col(id_col).alias("_node"), F.lit(1.0 / float(n)).alias("rank")
    )
    ordered_sum = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_src", "_c"))),
            lambda s: s["_c"],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    for _ in range(iterations):
        contribs = (
            edges.select(
                F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
            )
            .join(ranks, F.col("_src") == F.col("_node"))
            .join(outdeg, F.col(src_col) == F.col("_src"))
            .select(
                "_src",
                "_dst",
                (F.col("rank") / F.col("_deg").cast("double")).alias("_c"),
            )
            .groupBy("_dst")
            .agg(ordered_sum.alias("_s"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("_node"))
            .join(contribs, F.col("_node") == F.col("_dst"), "left")
            .select(
                "_node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_s", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("_node").alias(id_col), "rank")
