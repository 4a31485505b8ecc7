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


def _ordered_fold(key_col: str, val_col: str):
    """Left fold 0.0 + v₁ + v₂ + … of ``val_col`` in ``key_col`` order —
    the portability contract shared with the DuckDB twins (identical
    operand order → identical double)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key_col, val_col))),
            lambda s: s[val_col],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node_id",
    shard_count: int = 256,
) -> DataFrame:
    """Fixed-iteration PageRank: rank_{k+1}(v) = (1−d)/N +
    d · Σ_{u→v} rank_k(u)/outdeg(u), run for exactly ``iterations``
    rounds from the uniform start (no convergence test — fixed plans
    stay deterministic and oracle-checkable).

    Dangling mass is NOT redistributed (nodes without out-edges simply
    leak their share — the common simplification; symmetrized
    similarity graphs have no dangling nodes anyway).  Isolated nodes
    hold the base rank (1−d)/N.

    The per-node contribution sum is a TWO-LEVEL ordered fold (the
    ``pack_bins`` two-level-offsets pattern): in-edges are sharded by
    src RANGE (``shard_count`` equal-width src intervals, integer
    arithmetic — exact and engine-portable), each (dst, shard) folds
    its contributions in src order, then each dst folds the shard
    partials in shard order.  A power-law hub with 10M in-edges
    therefore builds ~shard_count bounded aggregation buffers instead
    of ONE 10M-struct array in a single task — the single-row-OOM
    hazard of the one-level fold.  Both fold levels are pinned-order
    left folds mirrored verbatim in the DuckDB twin, so the result is
    still bit-exact (note: the two-level sum is a DIFFERENT — equally
    valid — double than a flat fold would give; the twin computes the
    same two-level shape).

    Plan shape per iteration: one broadcast-joinable outdeg table, a
    (dst, shard) partial aggregation, a narrow (dst, shard_partial)
    re-aggregation, one left join back onto the node set — k
    iterations = k+1 keyed shuffles, never a collect.  Each (src, dst)
    edge must be unique (sort by src is the fold's total order).

    ``edges``/``nodes`` are cached here and the cache lifecycle is
    session-owned (caller-owned unpersist, like the repo's other
    cached plan builders): the returned DataFrame still references the
    cached plans lazily, so this function cannot unpersist them
    itself.  Long-lived sessions issuing many pagerank calls should
    ``spark.catalog.clearCache()`` between batches.  An empty node set
    returns an empty result rather than dividing by zero."""
    edges = edges.cache()
    nodes = nodes.cache()
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col), F.lit(0.0).alias("rank")
        )  # empty: no ranks to compute
    base = (1.0 - damping) / float(n)
    outdeg = edges.groupBy(src_col).agg(F.count("*").alias("_deg"))
    src_type = dict(edges.dtypes).get(src_col, "")
    if src_type in ("tinyint", "smallint", "int", "bigint"):
        # equal-width src-range shards: integer div, monotone in src, so
        # shard order == src order across shards (fold order is preserved)
        bounds = edges.agg(
            F.min(src_col).alias("_mn"),
            (
                (F.max(src_col) - F.min(src_col))
                .cast("long")
                .alias("_range")
            ),
        ).select(
            "_mn",
            (F.expr(f"_range div {int(shard_count)}") + F.lit(1)).alias("_w"),
        )
        sharded = (
            edges.select(
                F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
            )
            .crossJoin(F.broadcast(bounds))
            .withColumn("_shard", F.expr("(_src - _mn) div _w"))
            .select("_src", "_dst", "_shard")
        )
    else:
        # non-integral ids (e.g. string doc ids) have no cheap
        # order-preserving range split: degrade to ONE shard — the fold
        # through the two-level plan is then bit-identical to the flat
        # fold (0.0 + p = p), correctness intact, but the hub-buffer
        # bound does NOT apply; map ids to integers upstream to get it
        sharded = edges.select(
            F.col(src_col).alias("_src"),
            F.col(dst_col).alias("_dst"),
            F.lit(0).cast("long").alias("_shard"),
        )
    ranks = nodes.select(
        F.col(id_col).alias("_node"), F.lit(1.0 / float(n)).alias("rank")
    )
    for _ in range(iterations):
        partials = (
            sharded.join(ranks, F.col("_src") == F.col("_node"))
            .join(outdeg, F.col(src_col) == F.col("_src"))
            .select(
                "_src",
                "_dst",
                "_shard",
                (F.col("rank") / F.col("_deg").cast("double")).alias("_c"),
            )
            .groupBy("_dst", "_shard")
            .agg(_ordered_fold("_src", "_c").alias("_p"))
        )
        contribs = partials.groupBy("_dst").agg(
            _ordered_fold("_shard", "_p").alias("_s")
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


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    given as CANONICAL edges (src < dst, unique) — the local clustering
    signal data curation uses to tell tight duplicate cliques from
    chain-like false-positive paths (a transitive dup cluster that is
    really a chain has no triangles; a true near-dup clique is all
    triangles).

    Enumeration: with canonical edges, every triangle a<b<c appears
    exactly once as the wedge (a,b)+(b,c) closed by (a,c) — one
    self-join on the middle node + one semi-join against the edge list,
    never an all-pairs pass.  At production graph scale the classic
    refinement is to orient edges by DEGREE instead of id (caps wedge
    fan-out at the hub nodes); id-orientation keeps the plan
    deterministic here and the join SHAPE — join, semi-join, explode,
    count — is identical under either orientation.

    Output: (node, n_triangles) for every node in ≥1 triangle."""
    e = edges.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    )
    wedges = e.alias("ab").join(
        e.select(
            F.col("_a").alias("_b2"), F.col("_b").alias("_c")
        ).alias("bc"),
        F.col("ab._b") == F.col("bc._b2"),
    ).select(F.col("ab._a").alias("_a"), F.col("ab._b").alias("_b"), "_c")
    tris = wedges.join(
        e.select(F.col("_a").alias("_ta"), F.col("_b").alias("_tc")),
        (F.col("_a") == F.col("_ta")) & (F.col("_c") == F.col("_tc")),
        "leftsemi",
    )
    return (
        tris.select(
            F.explode(F.array("_a", "_b", "_c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
