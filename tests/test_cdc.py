"""CDC merge operators (operators/cdc.py): resolution semantics, the
in-memory merge, SCD2 history, and the partition-pruned on-disk rewrite.

The swept queries (`corpus_apply_changes`, `corpus_change_history`) pin
the bit-exact values against DuckDB; these tests pin the CONTRACTS the
sweep can't see — tie-break direction, validation errors, version
column, and the incremental write's pruning behavior (untouched bucket
files not rewritten, emptied buckets cleared, round-trip ≡ in-memory
merge)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import cdc

BASE = [
    Row(doc_id=1, text="one", n=10),
    Row(doc_id=2, text="two", n=20),
    Row(doc_id=3, text="three", n=30),
    Row(doc_id=4, text="four", n=40),
]


def _changes(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=k, op=o, seq=s, text=t, n=n) for k, o, s, t, n in rows],
        "doc_id bigint, op string, seq int, text string, n bigint",
    )


def test_resolve_latest_seq_wins_and_delete_outranks_on_tie(spark):
    ch = _changes(
        spark,
        [
            (1, "upsert", 1, "v1", 11),
            (1, "upsert", 3, "v3", 13),
            (1, "delete", 2, None, None),
            # equal-seq conflict: delete must outrank the upsert
            (2, "upsert", 5, "v5", 25),
            (2, "delete", 5, None, None),
        ],
    )
    got = {r.doc_id: (r.op, r.seq) for r in cdc.resolve_changes(ch).collect()}
    assert got == {1: ("upsert", 3), 2: ("delete", 5)}


def test_resolve_rejects_unknown_op(spark):
    ch = _changes(spark, [(1, "patch", 1, "x", 1)])
    with pytest.raises(Exception, match="unknown CDC op"):
        cdc.resolve_changes(ch).collect()


def test_apply_changes_merge_and_version_col(spark):
    base = spark.createDataFrame(BASE)
    ch = _changes(
        spark,
        [
            (2, "upsert", 1, "two-fixed", 21),
            (3, "delete", 1, None, None),
            (9, "upsert", 1, "nine", 90),  # pure insert
        ],
    )
    out = {
        r.doc_id: r
        for r in cdc.apply_changes(
            base, ch, broadcast_changes=True, version_col="version"
        ).collect()
    }
    assert set(out) == {1, 2, 4, 9}  # 3 deleted, 9 inserted
    assert out[1].text == "one" and out[1].version is None
    assert out[2].text == "two-fixed" and out[2].version == 1
    assert out[9].n == 90


def test_apply_changes_requires_base_columns(spark):
    base = spark.createDataFrame(BASE)
    ch = spark.createDataFrame(
        [Row(doc_id=1, op="upsert", seq=1, text="x")]  # missing `n`
    )
    with pytest.raises(ValueError, match="missing base columns"):
        cdc.apply_changes(base, ch)


def test_change_history_intervals(spark):
    ch = _changes(
        spark,
        [
            (1, "upsert", 1, "v1", 11),
            (1, "delete", 2, None, None),
            (1, "upsert", 4, "v4", 14),
            (2, "upsert", 7, "w", 27),
        ],
    )
    rows = {
        (r.doc_id, r.seq): (r.valid_to_seq, r.is_current)
        for r in cdc.change_history(ch).collect()
    }
    assert rows == {
        (1, 1): (2, False),
        (1, 2): (4, False),
        (1, 4): (None, True),
        (2, 7): (None, True),
    }


def _snapshot_files(path: str) -> dict[str, tuple[int, float]]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime)
    return out


def test_incremental_merge_write_prunes_and_matches_in_memory(
    spark, tmp_path
):
    n_buckets = 8
    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}", n=i * 10) for i in range(40)]
    )
    path = str(tmp_path / "snap")
    cdc.write_bucketed_snapshot(base, path, n_buckets=n_buckets)
    before = _snapshot_files(path)

    ch = _changes(
        spark,
        [
            (3, "upsert", 1, "three-fixed", 31),
            (7, "delete", 1, None, None),
            (100, "upsert", 1, "hundred", 1000),
        ],
    )
    affected = cdc.incremental_merge_write(
        spark, path, ch, n_buckets=n_buckets
    )
    expected_buckets = sorted(
        r.b
        for r in ch.select(
            cdc.bucket_col(F.col("doc_id"), n_buckets).alias("b")
        )
        .distinct()
        .collect()
    )
    assert affected == expected_buckets
    assert 0 < len(affected) < n_buckets  # the test must actually prune

    # untouched buckets: byte-identical files, not rewritten
    after = _snapshot_files(path)
    untouched_before = {
        p: v
        for p, v in before.items()
        if not any(f"bucket={b}{os.sep}" in p + os.sep for b in affected)
    }
    for p, v in untouched_before.items():
        assert after.get(p) == v, f"untouched file rewritten: {p}"

    # round-trip ≡ in-memory merge of the same feed
    got = {
        (r.doc_id, r.text, r.n)
        for r in spark.read.parquet(path).select("doc_id", "text", "n").collect()
    }
    want = {
        (r.doc_id, r.text, r.n)
        for r in cdc.apply_changes(base, ch).collect()
    }
    assert got == want
    assert (100, "hundred", 1000) in got and not any(
        k == 7 for k, _, _ in got
    )


def test_incremental_merge_write_clears_emptied_bucket(spark, tmp_path):
    n_buckets = 4
    # one doc alone in its bucket, then delete it: the bucket directory
    # must not serve the stale row afterwards
    base = spark.createDataFrame([Row(doc_id=i, text=f"d{i}") for i in range(12)])
    path = str(tmp_path / "snap2")
    cdc.write_bucketed_snapshot(base, path, n_buckets=n_buckets)
    victim_bucket = spark.createDataFrame([Row(doc_id=5)]).select(
        cdc.bucket_col(F.col("doc_id"), n_buckets).alias("b")
    ).collect()[0].b
    victims = [
        r.doc_id
        for r in base.select(
            "doc_id", cdc.bucket_col(F.col("doc_id"), n_buckets).alias("b")
        ).collect()
        if r.b == victim_bucket
    ]
    ch = _changes(spark, [(k, "delete", 1, None, None) for k in victims])
    cdc.incremental_merge_write(spark, path, ch, n_buckets=n_buckets)
    left = {r.doc_id for r in spark.read.parquet(path).collect()}
    assert left == {i for i in range(12)} - set(victims)
    assert not os.path.exists(os.path.join(path, f"bucket={victim_bucket}"))


def test_incremental_merge_write_empty_feed_noop(spark, tmp_path):
    base = spark.createDataFrame([Row(doc_id=1, text="a")])
    path = str(tmp_path / "snap3")
    cdc.write_bucketed_snapshot(base, path, n_buckets=2)
    before = _snapshot_files(path)
    empty = spark.createDataFrame(
        [], "doc_id bigint, op string, seq int, text string"
    )
    assert cdc.incremental_merge_write(spark, path, empty, n_buckets=2) == []
    assert _snapshot_files(path) == before


def test_version_guard_discards_stale_and_is_idempotent(spark):
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text="one", n=10, version=None),
            Row(doc_id=2, text="two-v5", n=20, version=5),
            Row(doc_id=3, text="three-v4", n=30, version=4),
        ],
        "doc_id bigint, text string, n bigint, version long",
    )
    ch = _changes(
        spark,
        [
            (1, "upsert", 1, "one-v1", 11),  # NULL version loses to any seq
            (2, "upsert", 5, "stale", 0),  # seq == version: stale
            (2, "delete", 4, None, None),  # stale delete too
            (3, "upsert", 9, "three-v9", 39),  # fresh
        ],
    )
    out = {
        r.doc_id: (r.text, r.version)
        for r in cdc.apply_changes(
            base, ch, base_version_col="version"
        ).collect()
    }
    assert out == {
        1: ("one-v1", 1),
        2: ("two-v5", 5),  # untouched, stale change discarded
        3: ("three-v9", 9),
    }

    # idempotence: re-applying the same feed onto the merged snapshot
    # changes nothing (every surviving change's seq <= stored version)
    merged = cdc.apply_changes(base, ch, base_version_col="version")
    again = {
        r.doc_id: (r.text, r.version)
        for r in cdc.apply_changes(
            merged, ch, base_version_col="version"
        ).collect()
    }
    assert again == out


def test_version_guard_param_validation(spark):
    base = spark.createDataFrame(BASE)
    ch = _changes(spark, [(1, "upsert", 1, "x", 1)])
    with pytest.raises(ValueError, match="set one, not both"):
        cdc.apply_changes(
            base.withColumn("version", F.lit(1).cast("long")),
            ch,
            version_col="v2",
            base_version_col="version",
        )
    with pytest.raises(ValueError, match="base has no column"):
        cdc.apply_changes(base, ch, base_version_col="version")


def test_streaming_cdc_maintains_snapshot(spark, tmp_path):
    """Drained change-feed stream ≡ one batch apply_changes over the
    union of all feeds — including a cross-batch version chain (seq 1
    then seq 2 on the same key in different micro-batches) and a
    re-delivered prefix (same feed directory drained twice = no-op,
    the version guard absorbs it)."""
    from tax_compliance_engine_spark.streaming.cdc_stream import (
        streaming_cdc_writer,
    )

    n_buckets = 4
    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}", n=i) for i in range(10)]
    ).withColumn("version", F.lit(None).cast("long"))
    snap = str(tmp_path / "snap")
    cdc.write_bucketed_snapshot(base, snap, n_buckets=n_buckets)

    schema = "doc_id bigint, op string, seq int, text string, n bigint"
    src = tmp_path / "feed"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_cdc_writer(stream, snap, n_buckets=n_buckets)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    first = [
        (1, "upsert", 1, "one-v1", 11),
        (4, "delete", 1, None, None),
    ]
    second = [
        (1, "upsert", 2, "one-v2", 12),  # cross-batch version chain
        (11, "upsert", 1, "eleven", 110),  # insert
    ]
    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    drain()
    drain()  # full re-drain from a fresh checkpoint would re-deliver;
    # here: no new files, a no-op — then force a true re-delivery:
    import shutil

    shutil.rmtree(tmp_path / "ckpt")
    drain()  # fresh checkpoint re-delivers EVERY feed file; the
    # version guard must absorb all of it

    got = {
        r.doc_id: (r.text, r.n, r.version)
        for r in spark.read.parquet(snap)
        .select("doc_id", "text", "n", "version")
        .collect()
    }
    feed = spark.createDataFrame(first + second, schema)
    want = {
        r.doc_id: (r.text, r.n, r.version)
        for r in cdc.apply_changes(
            base, feed, base_version_col="version"
        ).collect()
    }
    assert got == want
    assert got[1] == ("one-v2", 12, 2)
    assert 4 not in got and got[11] == ("eleven", 110, 1)


def test_incremental_rollup_equals_recompute(spark):
    """incremental_rollup over a crafted feed ≡ re-aggregating the
    post-change corpus: group migration, a brand-new group appearing, a
    group dropping to zero support, a delete of an absent key (no-op),
    and an upsert of a brand-new key."""
    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.operators import cdc

    base = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 20),
            (3, "b", 30),  # the only 'b' row — deleted below
            (4, "c", None),  # NULL sum source contributes 0
        ],
        "doc_id long, source string, n_chars long",
    )
    changes = spark.createDataFrame(
        [
            (1, "upsert", 1, "d", 15),  # migrates a → d (new group)
            (3, "delete", 1, None, None),  # b drops to zero support
            (9, "delete", 1, None, None),  # absent key: no-op
            (5, "upsert", 1, "a", 7),  # brand-new key into a
            (5, "upsert", 2, "a", 8),  # later seq wins
        ],
        "doc_id long, op string, seq long, source string, n_chars long",
    )
    agg0 = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("chars"),
    )
    got = sorted(
        cdc.incremental_rollup(
            base, agg0, changes, ["source"], {"chars": "n_chars"}
        ).collect()
    )
    post = cdc.apply_changes(base, changes)
    want = sorted(
        post.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("chars"),
        )
        .collect()
    )
    assert got == want
    by_src = {r.source: r for r in got}
    assert "b" not in by_src  # zero-support group removed
    assert by_src["d"].n_rows == 1 and by_src["d"].chars == 15  # new group
    assert by_src["a"].n_rows == 2 and by_src["a"].chars == 28  # 20 + 8


def _rollup_writer_drain(spark, src, snap, agg, ckpt):
    from tax_compliance_engine_spark.streaming.rollup_stream import (
        streaming_cdc_rollup_writer,
    )

    schema = "doc_id bigint, op string, seq int, text string, n bigint, grp string"
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_cdc_rollup_writer(
            stream,
            str(snap),
            str(agg),
            ["grp"],
            {"total_n": "n"},
            count_col="n_rows",
            n_buckets=4,
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_cdc_rollup_maintains_view(spark, tmp_path):
    """Drained stream keeps snapshot AND rollup consistent: the view
    equals re-aggregating the final snapshot, across a cross-batch
    version chain, group migration, deletes, and a full checkpoint-wipe
    re-delivery (version guard + batch marker absorb it)."""
    import shutil

    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}", n=i, grp=("a" if i % 2 else "b"))
         for i in range(10)]
    ).withColumn("version", F.lit(None).cast("long"))
    snap, agg = tmp_path / "snap", tmp_path / "agg"
    cdc.write_bucketed_snapshot(base, str(snap), n_buckets=4)

    schema = "doc_id bigint, op string, seq int, text string, n bigint, grp string"
    src, ckpt = tmp_path / "feed", tmp_path / "ckpt"
    first = [
        (1, "upsert", 1, "one-v1", 100, "b"),  # migrates a -> b
        (4, "delete", 1, None, None, None),
    ]
    second = [
        (1, "upsert", 2, "one-v2", 200, "a"),  # back to a, new value
        (11, "upsert", 1, "eleven", 110, "c"),  # brand-new group
    ]
    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    _rollup_writer_drain(spark, src, snap, agg, ckpt)
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    _rollup_writer_drain(spark, src, snap, agg, ckpt)

    def view():
        return sorted(
            (r.grp, r.n_rows, r.total_n)
            for r in spark.read.parquet(str(agg)).collect()
        )

    def recompute():
        return sorted(
            (r.grp, r["count(1)"], r["sum"])
            for r in spark.read.parquet(str(snap))
            .groupBy("grp")
            .agg(F.count(F.lit(1)), F.coalesce(F.sum("n"), F.lit(0)).alias("sum"))
            .collect()
        )

    assert view() == recompute()
    # checkpoint-wipe full re-delivery: guard + marker absorb everything
    before = view()
    shutil.rmtree(ckpt)
    _rollup_writer_drain(spark, src, snap, agg, ckpt)
    assert view() == before == recompute()


def test_streaming_cdc_rollup_crash_between_stores(spark, tmp_path, monkeypatch):
    """Crash AFTER the agg publish but BEFORE the snapshot merge: the
    failed micro-batch is re-delivered with the same batch id, the
    marker skips the (already-published) agg update, and the replayed
    guarded merge completes the snapshot — both stores end consistent."""
    import pytest as _pytest

    from tax_compliance_engine_spark.streaming import rollup_stream

    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}", n=i, grp="a") for i in range(6)]
    ).withColumn("version", F.lit(None).cast("long"))
    snap, agg = tmp_path / "snap", tmp_path / "agg"
    cdc.write_bucketed_snapshot(base, str(snap), n_buckets=4)

    schema = "doc_id bigint, op string, seq int, text string, n bigint, grp string"
    src, ckpt = tmp_path / "feed", tmp_path / "ckpt"
    feed = [(1, "upsert", 1, "one-v1", 100, "a"), (2, "delete", 1, None, None, None)]
    spark.createDataFrame(feed, schema).write.mode("append").parquet(str(src))

    real_merge = rollup_stream.incremental_merge_write

    def dying_merge(*a, **kw):
        raise RuntimeError("simulated crash between agg publish and merge")

    monkeypatch.setattr(rollup_stream, "incremental_merge_write", dying_merge)
    with _pytest.raises(Exception):
        _rollup_writer_drain(spark, src, snap, agg, ckpt)
    # agg was published (marker present), snapshot untouched
    assert rollup_stream._last_applied(str(agg)) >= 0
    assert {r.doc_id for r in spark.read.parquet(str(snap)).collect()} == set(range(6))

    monkeypatch.setattr(rollup_stream, "incremental_merge_write", real_merge)
    _rollup_writer_drain(spark, src, snap, agg, ckpt)  # replay heals
    got = sorted(
        (r.grp, r.n_rows, r.total_n)
        for r in spark.read.parquet(str(agg)).collect()
    )
    want = sorted(
        (r.grp, r["count(1)"], r["s"])
        for r in spark.read.parquet(str(snap))
        .groupBy("grp")
        .agg(F.count(F.lit(1)), F.sum("n").alias("s"))
        .collect()
    )
    assert got == want
    assert {r.doc_id for r in spark.read.parquet(str(snap)).collect()} == {0, 1, 3, 4, 5}


def test_streaming_pit_enrich_drained_equals_batch(spark, tmp_path):
    """Drained streaming PIT enrichment ≡ one batch pit_lookup over all
    facts: a late fact (arriving in drain 2 with as_of_seq 1) still
    sees the seq-1 dimension payload, and re-delivery rewrites the same
    batch dirs instead of duplicating."""
    from tax_compliance_engine_spark.operators.cdc import pit_lookup
    from tax_compliance_engine_spark.streaming.enrich_stream import (
        streaming_pit_enrich_writer,
    )

    dim_schema = "doc_id bigint, op string, seq bigint, name string"
    dim = spark.createDataFrame(
        [
            (1, "upsert", 1, "one-v1"),
            (1, "upsert", 2, "one-v2"),
            (2, "upsert", 1, "two-v1"),
            (2, "delete", 2, None),
        ],
        dim_schema,
    )
    fact_schema = "fact_id bigint, doc_id bigint, as_of_seq bigint"
    first = [(100, 1, 2), (101, 2, 1)]
    # late fact: arrives second, refers to seq 1; plus a then-deleted ref
    second = [(102, 1, 1), (103, 2, 2), (104, 9, 2)]
    src, out = tmp_path / "facts", tmp_path / "enriched"

    def drain():
        stream = spark.readStream.schema(fact_schema).parquet(str(src))
        q = (
            streaming_pit_enrich_writer(
                stream, dim, str(out), payload_cols=["name"]
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(first, fact_schema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, fact_schema).write.mode("append").parquet(
        str(src)
    )
    drain()

    got = sorted(
        (r.fact_id, r.is_live, r.name)
        for r in spark.read.parquet(str(out))
        .select("fact_id", "is_live", "name")
        .collect()
    )
    facts = spark.createDataFrame(first + second, fact_schema)
    want = sorted(
        (r.fact_id, r.is_live, r.name)
        for r in pit_lookup(facts, dim, payload_cols=["name"]).collect()
    )
    assert got == want
    by_id = dict((f, (l, n)) for f, l, n in got)
    assert by_id[102] == (True, "one-v1")  # late fact sees the OLD version
    assert by_id[100] == (True, "one-v2")
    assert by_id[103] == (False, None)  # deleted as of seq 2
    assert by_id[104] == (False, None)  # never-written key kept, flagged


def test_incremental_rollup_null_group_key(spark):
    """A NULL group key folds into ONE maintained group (null-safe
    outer merge) — a plain full_outer equijoin would leave a stale agg
    row plus an unmerged delta-only row for the NULL group."""
    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30)],
        "doc_id long, source string, n_chars long",
    )
    changes = spark.createDataFrame(
        [
            (4, "upsert", 1, None, 5),  # new key into the NULL group
            (1, "delete", 1, None, None),  # NULL-group member removed
        ],
        "doc_id long, op string, seq long, source string, n_chars long",
    )
    agg0 = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("chars"),
    )
    got = cdc.incremental_rollup(
        base, agg0, changes, ["source"], {"chars": "n_chars"}
    ).collect()
    rows = {r.source: (r.n_rows, r.chars) for r in got}
    assert len(got) == 2  # exactly one NULL-group row, one 'a' row
    assert rows[None] == (2, 25)  # {2:20, 4:5}
    assert rows["a"] == (1, 30)
