"""Incremental corpus maintenance (CDC merge): upsert/delete change
feeds applied onto a standing corpus snapshot, with deterministic
conflict resolution, an SCD2-style change history, and a
partition-pruned bucket rewrite for the on-disk layout.

This is the op family a 100 TB pre-training corpus actually needs
between crawls: each refresh arrives as a change feed (new docs, fixed
docs, takedowns) that must merge into the standing snapshot WITHOUT
rewriting 100 TB.  Beyond the reference's scope (the reference,
`/root/reference/`, is a batch tax engine with no mutable state); part
of the SURVEY §7 phase-5 extension surface, alongside the incremental
MinHash ingest screen in `operators/dedup.py`.

Scale design:
- change RESOLUTION (latest op per key) is one hash aggregation with a
  struct-max — map-side combinable, so a feed with many versions of one
  hot key collapses before the shuffle (a window row_number() would
  instead sort every version of every key);
- the MERGE join is anti/union shaped: the standing corpus never
  shuffles — resolved changes are the small side (a daily delta vs the
  full corpus) and broadcast under ``broadcast_changes=True``;
- the on-disk path (`incremental_merge_write`) stores the snapshot
  partitioned by a key-hash bucket; a refresh reads ONLY the buckets
  containing changed keys (partition pruning against a collected
  ≤ n_buckets list) and overwrites ONLY those directories (dynamic
  partition overwrite) — per-refresh I/O is O(delta · corpus/n_buckets),
  not O(corpus).

Everything in the query path is built-in Column expressions
(deterministic, no UDFs), replicated bit-for-bit by the DuckDB oracle
SQL in plans/oracle_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

OP_UPSERT = "upsert"
OP_DELETE = "delete"


def _op_rank(op: Column) -> Column:
    """Total order over change ops for equal-seq conflict resolution:
    delete(1) outranks upsert(0) — a takedown and a fix landing with the
    same sequence number resolve to the takedown (the conservative
    answer for compliance-driven removals).  Any other op value raises
    at execution time; the branch is used (not prunable) because the
    rank feeds the resolution struct."""
    return (
        F.when(op == OP_DELETE, F.lit(1))
        .when(op == OP_UPSERT, F.lit(0))
        .otherwise(F.raise_error(F.concat(F.lit("unknown CDC op: "), op)))
    )


def resolve_changes(
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Latest change per key: one groupBy(key) with a lexicographic
    struct-max over (seq, op_rank, payload...) — highest seq wins; on
    equal seq, delete outranks upsert (see ``_op_rank``); among exact
    (seq, op) duplicates the max payload by struct order wins (a
    deterministic but arbitrary tie-break — feeds should carry unique
    (key, seq) pairs).

    Output: one row per key with the winning change's columns, same
    names/order as the input.  The struct-max is map-side combinable,
    so hot keys with deep version chains collapse per-partition before
    the shuffle — the reason this is not a window row_number()."""
    payload = [c for c in changes.columns if c not in (key_col, seq_col, op_col)]
    w = F.max(
        F.struct(
            F.col(seq_col).alias("_seq"),
            _op_rank(F.col(op_col)).alias("_rank"),
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_p_{c}") for c in payload],
        )
    ).alias("_w")
    resolved = changes.groupBy(key_col).agg(w)
    return resolved.select(
        F.col(key_col),
        F.col("_w._op").alias(op_col),
        F.col("_w._seq").alias(seq_col),
        *[F.col(f"_w._p_{c}").alias(c) for c in payload],
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    broadcast_changes: bool | None = None,
    version_col: str | None = None,
    base_version_col: str | None = None,
    changes_resolved: bool = False,
) -> DataFrame:
    """CDC merge: apply an upsert/delete change feed onto a standing
    snapshot.  Per key, the latest change wins (``resolve_changes``);
    a winning upsert replaces (or inserts) the row, a winning delete
    removes it, untouched base rows pass through unchanged.

    ``changes_resolved=True`` declares the feed ALREADY one-row-per-key
    (the caller ran — and typically cached — ``resolve_changes``);
    resolution is skipped, so a caller that materialized the resolved
    delta once doesn't re-pay the aggregation in each of this plan's
    branches (guard pass, anti join, upsert select).

    ``changes`` must carry every ``base`` column (payload) plus
    ``op_col``/``seq_col``; delete payloads may be NULL.  With
    ``version_col`` set, the output gains that column holding the
    winning change's seq (NULL for untouched base rows).

    ``base_version_col`` names a version column the SNAPSHOT carries
    (upserted rows hold the seq that produced them; NULL = original
    load).  With it set, the merge is guarded: a winning change whose
    seq is ≤ the key's current version is STALE and discarded — which
    makes applying feeds out of order safe for live keys, and applying
    the same feed twice a no-op (the idempotence a retrying/streaming
    writer needs).  Known limit, documented not hidden: a DELETE leaves
    no tombstone behind, so a stale upsert REPLAYED AFTER the delete
    was applied would resurrect the row — feeds must not reorder
    around deletes of the same key (per-key-ordered transports, e.g. a
    key-partitioned log, guarantee this).  Upserted rows' version
    updates to their seq; untouched rows keep theirs.

    ``broadcast_changes=True`` pins every join against the resolved
    feed as broadcast — the standing corpus never shuffles (the guard
    pass and the anti join both stream over base), which is the only
    viable shape when base is 100 TB and the delta is a day's crawl.
    ``None`` leaves the strategy to Catalyst/AQE (fine when both sides
    are comparable)."""
    if version_col and base_version_col:
        raise ValueError(
            "version_col adds a NEW version column; base_version_col "
            "updates an existing one — set one, not both"
        )
    if base_version_col and base_version_col not in base.columns:
        raise ValueError(
            f"base has no column {base_version_col!r}: {base.columns}"
        )
    if version_col and version_col in base.columns:
        raise ValueError(
            f"base already has a column {version_col!r} — use "
            "base_version_col to UPDATE an existing version column"
        )
    payload_required = [
        c
        for c in base.columns
        if c != base_version_col and c not in changes.columns
    ]
    if payload_required:
        raise ValueError(
            f"changes feed missing base columns: {payload_required}"
        )
    resolved = (
        changes
        if changes_resolved
        else resolve_changes(changes, key_col, seq_col, op_col)
    )

    def bcast(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_changes else df

    if base_version_col:
        # guard pass: stream base's slim (key, version) projection past
        # the broadcast feed; a change losing to the current version is
        # stale.  Inserts (keys absent from base) are never stale.
        present = base.select(key_col, base_version_col).join(
            bcast(resolved.select(key_col, seq_col)),
            on=key_col,
            how="inner",
        )
        # NULL version = original load, loses to any change (the
        # comparison is NULL → not stale); non-null version guards
        stale_keys = present.filter(
            F.col(seq_col) <= F.col(base_version_col)
        ).select(key_col)
        resolved = resolved.join(
            bcast(stale_keys), on=key_col, how="left_anti"
        )
    untouched = base.join(
        bcast(resolved.select(key_col)), on=key_col, how="left_anti"
    )
    version_out = (
        [F.col(seq_col).cast("long").alias(version_col)]
        if version_col
        else []
    )
    upserts = resolved.filter(F.col(op_col) == OP_UPSERT).select(
        *[
            F.col(seq_col)
            .cast(base.schema[c].dataType)
            .alias(c)
            if c == base_version_col
            else F.col(c).cast(base.schema[c].dataType).alias(c)
            for c in base.columns
        ],
        *version_out,
    )
    if version_col:
        untouched = untouched.withColumn(
            version_col, F.lit(None).cast("long")
        )
    return untouched.unionByName(upserts)


def change_history(
    changes: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """SCD2-style validity intervals over a change feed: per key, each
    change is valid from its own seq until the next change's seq
    (NULL = still current).  ``is_current`` marks the chain head —
    exactly the row ``resolve_changes`` elects when (key, seq) pairs
    are unique (on equal seq the interval order uses the same
    delete-outranks-upsert rank, so the chain is deterministic).

    One window per key (no global sort — partitionBy(key) keeps full
    parallelism); per-key version chains are short by construction, so
    the window buffer is bounded.

    Output: (key, seq, op, valid_to_seq, is_current)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col), _op_rank(F.col(op_col))
    )
    nxt = F.lead(F.col(seq_col)).over(w)
    return changes.select(
        F.col(key_col),
        F.col(seq_col),
        F.col(op_col),
        nxt.alias("valid_to_seq"),
        nxt.isNull().alias("is_current"),
    )


def bucket_col(key: Column, n_buckets: int) -> Column:
    """Deterministic storage bucket for a key: pmod(xxhash64, n).
    xxhash64 is seed-stable across sessions and Spark versions, so the
    on-disk layout written by one job is prunable by every later job."""
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def write_bucketed_snapshot(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    key_col: str = "doc_id",
) -> None:
    """Write a snapshot in the bucket-partitioned layout
    ``incremental_merge_write`` maintains: parquet directories
    ``bucket=<i>`` keyed by ``bucket_col``.  n_buckets sizes the rewrite
    granularity — at 100 TB with 4096 buckets a refresh touching 1% of
    buckets rewrites ~25 GB per touched bucket, not the corpus."""
    (
        df.withColumn("bucket", bucket_col(F.col(key_col), n_buckets))
        .repartition("bucket")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )


def incremental_merge_write(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    n_buckets: int = 64,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    base_version_col: str | None = None,
) -> list[int]:
    """Apply a change feed to an on-disk bucketed snapshot IN PLACE,
    rewriting only the buckets that contain changed keys.

    1. resolve the feed, tag each change with its storage bucket;
    2. collect the distinct affected bucket ids (≤ n_buckets values —
       a driver-sized list by construction, this is the one collect);
    3. read ONLY those buckets back (partition pruning on the bucket
       directory column), CDC-merge the resolved changes in
       (broadcast — the delta is small vs the standing corpus), and
       materialize the merged buckets via an eager localCheckpoint —
       O(delta · corpus/n_buckets) executor storage, never the corpus —
       severing the plan's lineage from ``path`` so the overwrite below
       is not a read-your-own-input hazard;
    4. overwrite ONLY those bucket directories (dynamic partition
       overwrite); a bucket whose rows were ALL deleted produces no
       output partition, so its now-stale directory is cleared
       explicitly (Hadoop FS delete — works on any scheme Spark writes).

    Returns the sorted affected bucket ids.  The merge itself is
    ``apply_changes`` with the same resolution semantics, so an on-disk
    refresh and an in-memory merge of the same feed agree row-for-row
    (pinned by pytest)."""
    resolved = resolve_changes(changes, key_col, seq_col, op_col).withColumn(
        "bucket", bucket_col(F.col(key_col), n_buckets)
    )
    resolved = resolved.cache()
    try:
        affected = sorted(
            r.bucket for r in resolved.select("bucket").distinct().collect()
        )
        if not affected:
            return []
        snap = spark.read.parquet(path)
        base = snap.filter(F.col("bucket").isin(affected))
        payload_cols = [c for c in snap.columns if c != "bucket"]
        merged = (
            apply_changes(
                base.select(*payload_cols),
                resolved.drop("bucket"),
                key_col,
                seq_col,
                op_col,
                broadcast_changes=True,
                base_version_col=base_version_col,
                changes_resolved=True,  # resolved + cached above
            )
            .withColumn("bucket", bucket_col(F.col(key_col), n_buckets))
            .repartition("bucket")
            .localCheckpoint(eager=True)
        )
        surviving = {
            r.bucket for r in merged.select("bucket").distinct().collect()
        }
        if surviving:
            (
                # per-WRITE dynamic overwrite (not the session conf: a
                # session-level toggle races with concurrent writers —
                # another overwrite landing while 'static' is restored
                # would wipe every untouched bucket directory)
                merged.write.option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .mode("overwrite")
                .parquet(path)
            )
        # dynamic overwrite only replaces partitions PRESENT in the
        # output; a fully-deleted bucket must be cleared by hand
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for b in affected:
            if b not in surviving:
                p = jvm.org.apache.hadoop.fs.Path(f"{path}/bucket={b}")
                fs = p.getFileSystem(hconf)
                fs.delete(p, True)
        return affected
    finally:
        resolved.unpersist()


def incremental_rollup(
    base: DataFrame,
    agg: DataFrame,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Materialized-view maintenance: update a count + additive-sums
    rollup under a CDC feed WITHOUT rescanning the base — the operator
    that keeps a 100 TB corpus's per-source statistics current at
    O(|delta|) cost per refresh instead of a full recompute.

    ``agg`` must be exactly the current rollup of ``base``:
    ``base.groupBy(group_cols).agg(count(*) AS count_col,
    sum(src) AS out for each (out, src) in sum_cols)``.  The update:

    1. resolve the feed to one winner per key (``resolve_changes``);
    2. fetch the affected keys' OLD rows with ONE key join against
       base (broadcast delta — base never shuffles; against a bucketed
       snapshot this is additionally partition-prunable) and emit their
       contributions NEGATED;
    3. emit winning upserts' NEW contributions positively (group
       membership comes from the new payload, so a row migrating
       between groups naturally decrements one and increments the
       other);
    4. merge the summed deltas into ``agg`` with one outer join over
       ≤ |groups| rows; groups whose support reaches zero drop out,
       brand-new groups appear.

    Counts and sums are the additive aggregates this works for by
    construction (min/max are NOT incrementally maintainable under
    deletes — recompute those per touched group instead).  NULL sum
    sources contribute 0 on both sides.  Same unguarded contract as
    plain ``apply_changes``: ``changes`` is the NEW feed against the
    pre-change ``base`` snapshot."""
    for out in [count_col, *sum_cols]:
        if out not in agg.columns:
            raise ValueError(f"agg is missing output column {out!r}")
    resolved = resolve_changes(changes, key_col, seq_col, op_col)
    touched = resolved.select(key_col)
    if broadcast_changes:
        touched = F.broadcast(touched)

    def contributions(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *group_cols,
            F.lit(sign).cast("long").alias(f"_d_{count_col}"),
            *[
                (F.lit(sign) * F.coalesce(F.col(src).cast("long"), F.lit(0)))
                .alias(f"_d_{out}")
                for out, src in sum_cols.items()
            ],
        )

    minus = contributions(base.join(touched, key_col), -1)
    plus = contributions(resolved.filter(F.col(op_col) == "upsert"), 1)
    deltas = (
        minus.unionByName(plus)
        .groupBy(*group_cols)
        .agg(
            *[
                F.sum(f"_d_{out}").alias(f"_d_{out}")
                for out in [count_col, *sum_cols]
            ]
        )
    )
    # NULL-SAFE outer merge: a NULL group key must fold into ONE
    # maintained group (matching the groupBy above, which treats NULL
    # as its own group) — a plain full_outer equijoin never matches
    # NULLs and would leave a stale agg row plus a delta-only row.
    # The delta side's keys are RENAMED first: agg and deltas usually
    # share lineage (both derive from base), so an unaliased
    # agg[c]/deltas[c] condition resolves to a trivially-true
    # same-attribute compare.
    deltas = deltas.select(
        *[F.col(c).alias(f"_dg_{c}") for c in group_cols],
        *[F.col(f"_d_{out}") for out in [count_col, *sum_cols]],
    )
    cond = None
    for c in group_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_dg_{c}"))
        cond = clause if cond is None else cond & clause
    merged = agg.join(deltas, cond, "full_outer")
    group_out = [
        F.coalesce(F.col(c), F.col(f"_dg_{c}")).alias(c)
        for c in group_cols
    ]
    updated = [
        (
            F.coalesce(F.col(out), F.lit(0))
            + F.coalesce(F.col(f"_d_{out}"), F.lit(0))
        ).alias(out)
        for out in [count_col, *sum_cols]
    ]
    return merged.select(*group_out, *updated).filter(
        F.col(count_col) > 0
    )


def pit_lookup(
    probes: DataFrame,
    changes: DataFrame,
    payload_cols: list[str],
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    as_of_col: str = "as_of_seq",
    shard_width: int | None = None,
) -> DataFrame:
    """Point-in-time lookup over a CDC/SCD2 change feed: for each probe
    (key, as_of seq), the payload of the version valid AT that seq —
    the latest change with seq ≤ as_of, with the family's equal-seq
    delete-outranks-upsert rank as the tiebreak.  ``is_live`` is false
    (and the payload NULL) when the key was never written by then or
    its winning change is a delete — the dimension-correctness join a
    warehouse runs to ask "what did this row look like when the fact
    happened".

    One ``temporal.asof_join`` (union-marker window — one shuffle, no
    per-probe subquery); the delete-outranks rank doubles as the as-of
    tiebreak, so resolution and lookup can never disagree.
    ``shard_width`` passes through to the as-of hot-key sharding.

    Input contract (same as ``resolve_changes``): at most ONE change
    per (key, seq, op) — the op rank is the tiebreak within an equal
    seq, so duplicate upserts sharing (key, seq) would leave the picked
    payload nondeterministic across runs.  Feeds that can repeat (raw
    at-least-once logs) must be deduplicated on (key, seq, op)
    upstream; a CDC feed keyed by a monotonic per-key sequence
    satisfies this by construction."""
    from .temporal import asof_join

    ranked = changes.select(
        key_col,
        F.col(seq_col).cast("long").alias("_pit_seq"),
        _op_rank(F.col(op_col)).alias("_pit_rank"),
        F.col(op_col).alias("_pit_op"),
        *payload_cols,
    )
    joined = asof_join(
        probes.withColumn("_pit_seq", F.col(as_of_col).cast("long")),
        ranked,
        on="_pit_seq",
        by=key_col,
        tiebreak="_pit_rank",
        right_cols=["_pit_op", "_pit_rank", *payload_cols],
        direction="backward",
        suffix="_pit",
        shard_width=shard_width,
    )
    live = F.col("_pit_op_pit") == "upsert"
    return joined.select(
        *probes.columns,
        F.coalesce(live, F.lit(False)).alias("is_live"),
        *[
            F.when(live, F.col(f"{c}_pit")).alias(c)
            for c in payload_cols
        ],
    )
