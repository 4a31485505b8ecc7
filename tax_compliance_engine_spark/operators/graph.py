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

    Enumeration is DEGREE-ORIENTED (the Latapy / "compact-forward"
    refinement, the production algorithm for dense or skewed graphs):
    every undirected edge {u,v} is oriented from the endpoint with the
    smaller (degree, id) key to the larger, wedges are built only
    between a node's OUT-neighbors, and a wedge (b,c) with key_b <
    key_c closes iff the oriented edge b→c exists (one semi-join).
    Each triangle is enumerated exactly once, and the wedge count is
    Σ C(outdeg, 2) with outdeg ≤ O(√m) — so a dense similarity graph
    (or a hub node) costs O(m^1.5) wedges instead of the Σ deg²
    blow-up an id-orientation suffers (measured on the 10× scale-up:
    the id-oriented wedge join grew 36× in wall clock; see
    BASELINE.md).  The result is a pure integer function of the graph,
    identical under ANY orientation — the oracle twin keeps the
    simpler id-oriented SQL.

    Output: (node, n_triangles) for every node in ≥1 triangle.

    The canonical edge list and the oriented edge list are CACHED
    (both narrow id tables): ``e`` is referenced three times (degree
    union ×2, the keyed join) and ``oriented`` three times (wedge
    build ×2, the closure semi-join) — uncached, each reference
    re-evaluates the caller's whole pair-generation lineage (for the
    embedding graph: the LSH self-join + cosine verify, measured as
    the repeated SortMergeJoin pyramids in the triangles plan; guide
    §2.4/§5, the ``pagerank`` cache discipline)."""
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).cache()
    deg = (
        e.select(F.col("_u").alias("node"))
        .unionAll(e.select(F.col("_v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_d"))
    )
    keyed = e.join(
        deg.select(F.col("node").alias("_u"), F.col("_d").alias("_du")),
        "_u",
    ).join(
        deg.select(F.col("node").alias("_v"), F.col("_d").alias("_dv")),
        "_v",
    )
    fwd = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v"))
    )
    oriented = keyed.select(
        F.when(fwd, F.col("_u")).otherwise(F.col("_v")).alias("_a"),
        F.when(fwd, F.col("_v")).otherwise(F.col("_u")).alias("_b"),
        F.when(fwd, F.col("_dv")).otherwise(F.col("_du")).alias("_db"),
    ).cache()
    ab = oriented.select("_a", "_b", "_db")
    ac = oriented.select(
        F.col("_a").alias("_a2"),
        F.col("_b").alias("_c"),
        F.col("_db").alias("_dc"),
    )
    wedges = ab.join(
        ac,
        (F.col("_a") == F.col("_a2"))
        & (
            (F.col("_db") < F.col("_dc"))
            | ((F.col("_db") == F.col("_dc")) & (F.col("_b") < F.col("_c")))
        ),
    ).select("_a", "_b", "_c")
    tris = wedges.join(
        oriented.select(
            F.col("_a").alias("_tb"), F.col("_b").alias("_tc")
        ),
        (F.col("_b") == F.col("_tb")) & (F.col("_c") == F.col("_tc")),
        "leftsemi",
    )
    return (
        tris.select(
            F.explode(F.array("_a", "_b", "_c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )


def lpa_communities(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over a
    (src, dst) edge list — the near-linear-time community primitive
    (Raghavan et al. 2007), here with every source of nondeterminism
    pinned so the result is EXACTLY reproducible across engines:

    - labels initialize to the node's own id;
    - one iteration: every node adopts the label most frequent among
      its in-neighbors' current labels (pass pre-symmetrized edges for
      the standard undirected semantics), ties broken on the SMALLEST
      label — classic LPA breaks ties randomly, which is why it is
      usually reported as unstable; the min-label tie-break plus fully
      synchronous updates makes it a pure integer function of the graph;
    - ``n_iter`` is a plan-build loop (one lazy plan, like
      ``pagerank``), not a driver loop over collected data.

    Per iteration the plan is one (node, label) vote count — map-side
    partial counts, keys bounded by the edge list — and one per-node
    integer argmax via ``max(struct(count, −label))`` (a second NARROW
    groupBy on node, no window, so a hub node folds partial maxima
    instead of sorting its whole vote list in one task).  Nothing
    float anywhere: the whole algorithm is integer-exact.

    Output: (node, community) for every node with at least one edge —
    in EITHER direction: labels initialize from the union of src and
    dst endpoints, and a node that receives no votes in an iteration
    (possible only on non-symmetrized input, where an out-degree-only
    node has no in-neighbors) KEEPS its current label instead of
    vanishing from the result.  On symmetrized input every node votes
    and is voted for, so the retention join never fires a coalesce and
    the result is identical to the src-only formulation.
    """
    # sym + per-round labels cached: labels is referenced twice per
    # round (the vote join and the retention join), so the uncached
    # unroll re-evaluates earlier rounds exponentially in n_iter, and
    # sym re-enters every round (same rationale as bfs_distance)
    sym = edges.select("src", "dst").cache()
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("label")).cache()
    for _ in range(n_iter):
        votes = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("v_node"), "label")
            .groupBy("v_node", "label")
            .agg(F.count("*").alias("_c"))
        )
        voted = (
            votes.groupBy("v_node")
            .agg(F.max(F.struct(F.col("_c"), (-F.col("label")).alias("_nl"))).alias("_m"))
            .select(
                F.col("v_node").alias("node"),
                (-F.col("_m._nl")).alias("_new"),
            )
        )
        labels = (
            labels.select("node", F.col("label").alias("_prev"))
            .join(voted, "node", "left")
            .select(
                "node", F.coalesce("_new", "_prev").alias("label")
            )
            .cache()
        )
    return labels.select("node", F.col("label").alias("community")).orderBy(
        "node"
    )


def bfs_distance(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """Multi-source BFS hop distance: for every node reachable from the
    seed set within ``max_hops`` undirected hops, the exact minimum hop
    count (seeds are 0; unreachable nodes are absent).  The graph-
    traversal primitive behind contamination spread ("everything within
    k hops of a known-bad document") and seed-expansion labeling.

    Pure integer function of the graph — bit-exact by construction.

    Plan shape: ``max_hops`` is a plan-build unroll (one lazy plan,
    like ``lpa_communities``); each round expands the CURRENT distance
    table across the edge list (one equi-join hash-shuffled on src) and
    collapses with a groupBy-min on node, so the plan grows LINEARLY in
    hops and dominated rows never survive a round.  Expanding from the
    full table rather than the frontier trades ≤ hops× extra join rows
    for a plan with no anti-join against an ever-growing union — the
    right trade for a bounded unroll (classic frontier BFS wins only
    with an iterative-checkpoint driver loop, which breaks the
    one-lazy-plan / resumable-oracle property every operator here
    keeps).  Hub nodes fold through partial min aggregation, never a
    per-node sort.

    ``seeds``: one ``node`` column; ``edges``: (src, dst), pass both
    directions for undirected semantics.

    The edge list and each round's distance table are CACHED (narrow
    id tables): ``sym`` re-enters the plan every round, and ``dist``
    is referenced TWICE per round (the hop join and the union), so the
    uncached unroll re-evaluates the caller's pair-generation lineage
    a number of times EXPONENTIAL in ``max_hops`` (each round doubles
    the references to the previous round's frame; guide §2.4/§5, the
    ``pagerank`` cache discipline).  Cached, each round is exactly one
    join + one groupBy-min over materialized rows."""
    sym = edges.select("src", "dst").cache()
    dist = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).cast("int").alias("dist"))
        .cache()
    )
    for i in range(int(max_hops)):
        # per-round aliases: the edge list re-enters the plan every
        # round, so unqualified refs would be ambiguous self-joins
        e, d = sym.alias(f"_e{i}"), dist.alias(f"_d{i}")
        hop = d.join(
            e, F.col(f"_d{i}.node") == F.col(f"_e{i}.src")
        ).select(
            F.col(f"_e{i}.dst").alias("node"),
            (F.col(f"_d{i}.dist") + 1).alias("dist"),
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .cache()
        )
    return dist.orderBy("node")


def kcore_nodes(
    edges: DataFrame, k: int, n_iter: int = 4, materialize: bool = False
) -> DataFrame:
    """k-core peeling over a SYMMETRIC (src, dst) edge list, ``n_iter``
    synchronous rounds: each round drops every node whose current
    degree is below ``k`` and restricts the edge list to survivors on
    BOTH endpoints — the graph-degeneracy screen that separates densely
    inter-duplicated cores (template farms, mirror clusters) from
    incidental near-dup pairs, the next structural lens after
    components (too coarse) and triangles (too local).

    Synchronous peeling is confluent — the k-core is the unique maximal
    subgraph of min-degree ≥ k, and each round removes only nodes that
    can never re-qualify — so once the peel converges, extra rounds are
    no-ops; two engines unrolling the SAME round count agree exactly
    even mid-convergence (pure integer degrees).  Callers pick
    ``n_iter`` for their graph; convergence on a given corpus is
    asserted where it matters (pytest fixes a chain-plus-clique graph).

    Per round: one combinable degree aggregate + two semi-join-shaped
    inner joins against the ≤|nodes| keep set — no windows, no
    all-pairs anything.  ``materialize=True`` localCheckpoints each
    round's edge list (the iterative-algorithm lineage-truncation
    pattern ``corpus.bpe_merges`` uses — the lazy chain re-derives the
    full prefix per round, O(n²) work) and EXITS EARLY once a round
    removes no edges: peeling is monotone (the edge set only shrinks),
    so an unchanged round count proves the fixed point and every later
    round is a no-op — the result is identical to running all
    ``n_iter`` rounds, just without paying job overhead for the no-ops
    (the checkpoint materializes each round anyway, so the count is a
    cheap cached scan).  Results are identical in both modes.
    Output: (node, degree) in the final subgraph."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    e = edges
    n_edges: int | None = None
    for _ in range(n_iter):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") >= k)
            .select("src")
        )
        e = e.join(keep, "src").join(
            keep.select(F.col("src").alias("dst")), "dst"
        )
        if materialize:
            # lazy checkpoint + one materializing count (the count scans
            # every partition, persisting them) — the eager form paid a
            # separate checkpoint job per round for the same truncation
            e = e.localCheckpoint(eager=False)
            n_now = e.count()
            if n_now == n_edges:
                break  # fixed point: remaining rounds are no-ops
            n_edges = n_now
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
