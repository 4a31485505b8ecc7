"""IVF approximate-nearest-neighbor + streaming dedup tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import similarity
from tax_compliance_engine_spark.streaming.dedup_stream import (
    streaming_exact_dedup,
)


def clustered_emb(spark):
    """3 well-separated clusters along different axes; label = cluster."""
    rows = []
    vid = 0
    for cluster, axis in enumerate([0, 1, 2]):
        for j in range(6):
            v = [0.0] * 64
            v[axis] = 10.0
            v[(axis + 10 + j) % 64] = 1.0 + 0.1 * j  # slight spread
            rows.append((vid, v, cluster))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_ivf_matches_bruteforce_on_clustered_data(spark):
    emb = clustered_emb(spark)
    pred = F.col("vec_id") == 0  # a cluster-0 query
    exact = similarity.knn_bruteforce(emb, pred, k=3).collect()
    approx = similarity.ivf_knn(emb, pred, k=3, nprobe=1).collect()
    # nprobe=1 probes the query's own cluster; the true top-3 live there
    assert [(r.neighbor_id, r.rank) for r in approx] == [
        (r.neighbor_id, r.rank) for r in exact
    ]
    for a, e in zip(approx, exact):
        assert a.cosine == pytest.approx(e.cosine)


def test_ivf_probe_limits_candidates(spark):
    emb = clustered_emb(spark)
    pred = F.col("vec_id") == 0
    got = similarity.ivf_knn(emb, pred, k=10, nprobe=1).collect()
    # cluster 0 has 6 vectors; minus self → only 5 candidates reachable
    assert len(got) == 5
    assert all(r.neighbor_id < 6 for r in got)


def _lcg_vectors(n, dim=64, seed=12345):
    """Deterministic pseudo-random vectors in [-1, 1) — plain LCG, no RNG."""
    x = seed
    out = []
    for _ in range(n):
        v = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append((x >> 11) / float(1 << 53) * 2.0 - 1.0)
        out.append(v)
    return out


def banded_dup_emb(spark, n_background=200):
    """n_background unrelated pseudo-random vectors plus 10 constructed
    true near-dup pairs (positive-scaled copies → cosine exactly 1.0,
    identical sign signature at ANY band width)."""
    vecs = _lcg_vectors(n_background)
    rows = [(i, v, 0) for i, v in enumerate(vecs)]
    dup_pairs = []
    for j in range(10):
        orig_id = j * 7  # spread through the corpus
        copy_id = 10_000 + j
        rows.append((copy_id, [x * 1.5 for x in vecs[orig_id]], 0))
        dup_pairs.append((orig_id, copy_id))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    return df, dup_pairs


def test_lsh_band_width_recall_pinned_both_geometries(spark):
    # True near-dups (scaled copies) must be found at the 4-bit default
    # AND the 8-bit corpus-scale geometry: identical sign signatures
    # collide in every band regardless of width, so recall is exactly 1.
    emb, dup_pairs = banded_dup_emb(spark)
    for bits in (4, 8):
        got = {
            (r.id1, r.id2)
            for r in similarity.embedding_dup_pairs(
                emb, threshold=0.99, n_bands=4, bits_per_band=bits
            ).collect()
        }
        assert set(dup_pairs) <= got, f"missed true dups at {bits}-bit bands"


def test_lsh_wider_bands_suppress_random_candidates(spark):
    # Among unrelated vectors, band collisions are the candidate driver:
    # 8-bit bands collide at ~1/256 per band vs the default's ~1/16, so
    # the candidate count must drop by well over 4x on the same corpus.
    emb, _ = banded_dup_emb(spark)

    def n_candidates(bits):
        b = similarity.lsh_bucket_assignments(
            emb, n_bands=4, bits_per_band=bits
        )
        a1, a2 = b.alias("a"), b.alias("b")
        return (
            a1.join(
                a2,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select("a.vec_id", "b.vec_id")
            .distinct()
            .count()
        )

    narrow, wide = n_candidates(4), n_candidates(8)
    assert wide < narrow / 4
    assert narrow > 100  # the 4-bit geometry actually generates noise here


def test_lsh_default_geometry_is_planner_sized(spark):
    # The default-arg path must equal the EXPLICIT planner geometry for
    # this corpus (no caller can silently inherit a fixed quadratic
    # default), and the legacy HYPERPLANES constant stays the 16-plane
    # prefix of the widened matrix.
    emb, _ = banded_dup_emb(spark)
    g = similarity.planned_geometry(emb)
    d = similarity.embedding_dup_pairs(emb, threshold=0.99)
    e = similarity.embedding_dup_pairs(
        emb,
        threshold=0.99,
        n_bands=g["n_bands"],
        bits_per_band=g["bits_per_band"],
    )
    assert d.exceptAll(e).count() == 0 and e.exceptAll(d).count() == 0
    assert similarity.hyperplanes(32)[:16] == similarity.HYPERPLANES
    # the planner answer must itself hold the candidate budget
    assert g["expected_candidates_per_doc"] <= 4.0
    # half a geometry is ambiguous — refuse it
    import pytest

    with pytest.raises(ValueError, match="BOTH"):
        similarity.embedding_dup_pairs(emb, threshold=0.99, n_bands=4)


def test_ann_index_parquet_round_trip_bit_exact(spark, tmp_path):
    """save_ann_index → load_ann_index → search must reproduce the
    inline-built search BIT-exactly (parquet doubles round-trip
    exactly) — the gate behind the *_prebuilt driver queries."""
    emb, _ = banded_dup_emb(spark)
    cents = similarity.label_centroids(emb).select(
        F.col("label").alias("cell"), "centroid"
    )
    assign = similarity.nearest_cell_assignments(
        emb, cents.select(F.col("cell").alias("label"), "centroid")
    )
    cb, codes = similarity.ivfpq_index(emb, cents, assign)
    path = str(tmp_path / "idx")
    similarity.save_ann_index(
        path,
        {
            "centroids": cents,
            "assignments": assign,
            "codebooks": cb,
            "codes": codes,
        },
    )
    idx = similarity.load_ann_index(spark, path)
    assert set(idx) == {"centroids", "assignments", "codebooks", "codes"}
    pred = F.col("vec_id") % 7 == 0
    inline = similarity.ivfpq_knn(
        emb, pred, cents, assign, k=3, nprobe=2, shortlist=10
    )
    loaded = similarity.ivfpq_knn(
        emb,
        pred,
        idx["centroids"],
        idx["assignments"],
        k=3,
        nprobe=2,
        shortlist=10,
        codebooks=idx["codebooks"],
        codes=idx["codes"],
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, loaded.collect())
    )
    # loading a missing index is the caller's rebuild signal
    import pytest

    with pytest.raises(FileNotFoundError):
        similarity.load_ann_index(spark, str(tmp_path / "nope"))
    # in-memory frames have no file lineage → no safe cross-session key
    assert similarity.ann_index_key(emb, "ivfpq") is None


def test_cluster_balanced_sample_flattens_head_cluster(spark):
    """Two geometric clusters with 40 vs 8 members and budget 12: a
    proportional draw would take ~10/2; equal per-cell quotas take 6/6
    — the diversity-sampling contract — and quotas sum to the budget."""
    def head(i):
        return [10.0 + (i % 5) * 0.01] + [0.0] * 63

    def tail(i):
        return [0.0, 10.0 + (i % 3) * 0.01] + [0.0] * 62

    # vec_ids 0 and 1 seed the k=2 training (smallest ids), so they
    # must straddle the two geometric clusters
    rows = [(0, head(0), 0), (1, tail(0), 1)]
    rows += [(2 + i, head(i), 0) for i in range(39)]
    rows += [(41 + i, tail(i), 1) for i in range(7)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = similarity.cluster_balanced_sample(emb, budget=12, k=2, n_iter=1)
    per = {}
    for r in out.collect():
        per[r.cell] = per.get(r.cell, 0) + 1
        assert r.cell_quota == 6
    assert sorted(per.values()) == [6, 6]
    import pytest

    with pytest.raises(ValueError, match="budget"):
        similarity.cluster_balanced_sample(emb, budget=0)


def test_ivfpq_index_append_consistent_with_build(spark):
    """Appending an exact copy of existing vectors (fresh ids) against
    the frozen index must reproduce the originals' cells AND codes —
    encode-against-artifacts is the same function the build applied."""
    emb, _ = banded_dup_emb(spark)
    cents = similarity.label_centroids(emb).select(
        F.col("label").alias("cell"), "centroid"
    )
    assign = similarity.nearest_cell_assignments(
        emb, cents, cell_col="cell"
    )
    cb, codes = similarity.ivfpq_index(emb, cents, assign)
    want = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in assign.join(codes, "vec_id").collect()
    }
    batch = emb.select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    got = {
        r.vec_id - 10_000: (r.cell, tuple(r.codes))
        for r in similarity.ivfpq_index_append(batch, cents, cb).collect()
    }
    assert got == want and len(got) > 0


def misaligned_emb(spark):
    """Two true geometric clusters (axis 0 vs axis 1) whose LABELS are
    mixed 70/30 — the seed centroids are cluster mixtures, so label-seeded
    IVF probes the wrong cell for many queries."""
    rows = []
    vid = 0
    for i in range(20):  # cluster A
        v = [0.0] * 16
        v[0] = 10.0
        v[2 + (i % 5)] = 1.0 + 0.05 * i
        rows.append((vid, v, 0 if i < 14 else 1))
        vid += 1
    for i in range(20):  # cluster B
        v = [0.0] * 16
        v[1] = 10.0
        v[8 + (i % 5)] = 1.0 + 0.05 * i
        rows.append((vid, v, 1 if i < 14 else 0))
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def _recall(approx_rows, exact_rows):
    ex: dict = {}
    ap: dict = {}
    for r in exact_rows:
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx_rows:
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(ids & ap.get(q, set())) for q, ids in ex.items())
    return hits / sum(len(ids) for ids in ex.values())


def test_lloyd_refinement_beats_label_seeded_on_misaligned_labels(spark):
    # One E+M iteration from the label seeds must recover the true
    # clusters: recall@5 (nprobe=1) ≥ the label-seeded baseline, and
    # near-perfect, because the refined inverted file re-partitions each
    # vector into its geometrically correct cell.
    emb = misaligned_emb(spark)
    pred = F.col("vec_id").isin(0, 5, 20, 25)
    exact = similarity.knn_bruteforce(emb, pred, k=5).collect()

    cents0 = similarity.label_centroids(emb)
    seeded = similarity.ivf_knn(
        emb, pred, k=5, nprobe=1, centroids=cents0
    ).collect()

    assign = similarity.nearest_cell_assignments(emb, cents0)
    emb2 = (
        emb.drop("label")
        .join(assign, "vec_id")
        .withColumnRenamed("cell", "label")
    )
    cents1 = similarity.label_centroids(emb2)
    refined = similarity.ivf_knn(
        emb,
        pred,
        k=5,
        nprobe=1,
        centroids=cents1,
        assignments=assign,
    ).collect()

    r_seeded, r_refined = _recall(seeded, exact), _recall(refined, exact)
    assert r_refined >= r_seeded
    assert r_refined > 0.9
    assert r_seeded < 1.0  # the misalignment actually bites the baseline


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    ).write.mode("append").parquet(str(src))

    out = tmp_path / "deduped"

    def drain():
        # parquet sink: append mode + checkpoint recovery across drains
        # (memory sink cannot resume from a checkpoint)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(str(src))
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out))

    first = drain().collect()
    assert sorted(r.text for r in first) == ["alpha", "beta"]

    # second batch: one repeat (state suppresses), one new
    spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], "doc_id long, text string"
    ).write.mode("append").parquet(str(src))
    texts = sorted(r.text for r in drain().collect())
    assert texts == ["alpha", "beta", "gamma"]  # state persisted, no repeats


def test_streaming_dedup_watermark_requires_event_time(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        streaming_exact_dedup(df, watermark_delay="1 hour")


def test_minhash_inline_components_match_aggregated(spark):
    """The row-local signature projection must be bit-identical to the
    batch groupBy aggregation — the property that lets the streaming
    near-dedup compute signatures without a shuffle."""
    from tax_compliance_engine_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    agg = [
        tuple(r)
        for r in dedup._minhash_per_doc(docs, "text").orderBy("doc_id").collect()
    ]
    inline = [
        tuple(r)
        for r in docs.select(
            "doc_id", *dedup.minhash_components_inline(F.col("text"))
        )
        .filter(F.col("_mh0").isNotNull())
        .orderBy("doc_id")
        .collect()
    ]
    assert agg == inline


def _near_dup_docs():
    """Docs 0/1 and 2/3 are near-identical (one token edited), 10/11 are
    cross-batch near-dups, the rest unrelated."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    first = [
        (0, base),
        (1, base.replace("lazy", "sleepy")),
        (2, "pack my box with five dozen liquor jugs right now please ok"),
        (3, "pack my box with five dozen liquor jugs right now please yes"),
        (4, "completely different text with no overlap whatsoever here"),
        (10, "a stitch in time saves nine but only if you sew it early"),
    ]
    second = [
        (11, "a stitch in time saves nine but only if you sew it late"),
        (12, "other unrelated filler content that matches none of the above"),
    ]
    return first, second


def test_streaming_near_dedup_matches_batch(spark, tmp_path):
    """Drained near-dup pair stream ≡ batch minhash_est_pairs over the
    same docs — including a pair whose two members arrive in DIFFERENT
    micro-batch drains (state carries the first doc's signatures)."""
    from tax_compliance_engine_spark.operators import dedup
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_near_dedup,
    )

    first, second = _near_dup_docs()
    schema = "doc_id long, text string"
    src, out = tmp_path / "docs", tmp_path / "pairs"
    threshold = 0.4

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_near_dedup(stream, threshold=threshold)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc1 long, doc2 long, est_jaccard double"
        ).parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    got = sorted(
        (r.doc1, r.doc2, r.est_jaccard) for r in drain().collect()
    )

    batch_docs = spark.createDataFrame(first + second, schema)
    want = sorted(
        (r.doc1, r.doc2, r.est_jaccard)
        for r in dedup.minhash_est_pairs(
            batch_docs, threshold=threshold
        ).collect()
    )
    assert got == want
    assert any(d1 == 10 and d2 == 11 for d1, d2, _ in got), (
        "expected the cross-drain pair (10, 11)"
    )


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    """Drained decontamination filter ≡ batch corpus.decontaminate over
    the same docs: contaminated arrivals are dropped in whichever drain
    they arrive, clean ones pass through with all columns intact."""
    from tax_compliance_engine_spark.operators import corpus as corpus_ops
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_decontaminate_writer,
    )

    schema = "doc_id long, text string"
    bench = spark.createDataFrame(
        [(900, "the quick brown fox jumps over dogs")], schema
    )
    first = [
        (0, "look the quick brown fox jumps over dogs today"),  # dirty
        (1, "completely unrelated text with many words"),
        (2, "tiny"),  # < n tokens: no shingles, always clean
    ]
    second = [
        (3, "again the quick brown fox jumps over dogs appears"),  # dirty
        (4, "other harmless filler that matches none of the benchmark"),
    ]
    src, out = tmp_path / "docs", tmp_path / "kept"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_decontaminate_writer(stream, bench, str(out), n=5)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # batch=<id> surfaces as a partition column; drop it for compare
        return spark.read.parquet(str(out)).select("doc_id", "text")

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    got = sorted((r.doc_id, r.text) for r in drain().collect())

    batch = spark.createDataFrame(first + second, schema)
    want = sorted(
        (r.doc_id, r.text)
        for r in corpus_ops.decontaminate(batch, bench, n=5).collect()
    )
    assert got == want
    assert [d for d, _ in got] == [1, 2, 4]


def test_streaming_span_screen_matches_batch(spark, tmp_path):
    """Drained span-duplication screen ≡ batch dedup.span_screen over the
    same arrivals: coverage/keep verdicts are identical no matter which
    drain a document arrives in (the gram set is corpus-only, so the
    foreachBatch-local scoring is globally correct), and re-drains stay
    idempotent (batch=<id> overwrite)."""
    from tax_compliance_engine_spark.operators import dedup as dedup_ops
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_span_screen_writer,
    )

    schema = "doc_id long, text string"
    boiler = "shared boilerplate run of eight exact tokens here"  # 8 toks
    corpus = spark.createDataFrame(
        [
            (900, f"alpha {boiler} one"),
            (901, f"beta {boiler} two"),  # => boiler 8-gram is duplicated
            (902, "unique corpus text that repeats in no other document"),
        ],
        schema,
    )
    first = [
        (0, f"prefix {boiler} suffix words"),  # partially covered
        (1, "totally fresh arrival with nothing shared at all"),
        (2, "tiny"),  # < n tokens: zero grams, zero coverage
    ]
    second = [
        (3, boiler),  # fully covered -> keep = False at 50%
        (4, f"{boiler} trailing unique tail padding tokens making it long"),
    ]
    src, out = tmp_path / "docs", tmp_path / "screened"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_span_screen_writer(stream, corpus, str(out), n=8)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out)).select(
            "doc_id", "n_tokens", "covered_tokens", "dup_coverage", "keep"
        )

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    got = sorted(map(tuple, drain().collect()))
    # a third drain with no new input must not duplicate anything
    assert sorted(map(tuple, drain().collect())) == got

    batch = spark.createDataFrame(first + second, schema)
    want = sorted(
        map(tuple, dedup_ops.span_screen(batch, corpus, n=8).collect())
    )
    assert got == want
    verdicts = {r[0]: r[4] for r in got}
    assert verdicts[1] and verdicts[2]  # untouched docs keep
    assert not verdicts[3]  # fully-boilerplate arrival dropped
    cov = {r[0]: r[2] for r in got}
    assert cov[0] > 0 and cov[3] == 8 and cov[1] == 0 and cov[2] == 0


def test_streaming_bm25_matches_batch(spark, tmp_path):
    """Drained BM25 query serving ≡ batch corpus.bm25_search over the
    same query set: identical ranked (query_id, rank, doc_id, score)
    rows — bit-equal scores — no matter which drain a query arrives in,
    and an empty re-drain stays idempotent."""
    from tax_compliance_engine_spark.operators import corpus as corpus_ops
    from tax_compliance_engine_spark.streaming.search_stream import (
        streaming_bm25_writer,
    )

    corpus = spark.createDataFrame(
        [
            (0, "apple banana cherry apple"),
            (1, "banana banana date"),
            (2, "cherry date elderberry fig"),
            (3, "apple fig fig fig banana"),
            (4, "grape melon kiwi"),
        ],
        "doc_id long, text string",
    )
    qschema = "query_id long, terms array<string>"
    first = [(100, ["apple", "banana"]), (101, ["date"])]
    second = [(102, ["fig", "fig", "", "cherry"])]  # dups/empties dropped
    src, out = tmp_path / "queries", tmp_path / "results"

    def drain():
        stream = spark.readStream.schema(qschema).parquet(str(src))
        q = (
            streaming_bm25_writer(stream, corpus, str(out), k=3)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out)).select(
            "query_id", "rank", "doc_id", "score"
        )

    spark.createDataFrame(first, qschema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, qschema).write.mode("append").parquet(
        str(src)
    )
    got = sorted(map(tuple, drain().collect()))
    assert sorted(map(tuple, drain().collect())) == got  # idempotent

    want = sorted(
        map(
            tuple,
            corpus_ops.bm25_search(
                corpus,
                [
                    (100, ["apple", "banana"]),
                    (101, ["date"]),
                    (102, ["fig", "fig", "", "cherry"]),
                ],
                k=3,
            ).collect(),
        )
    )
    assert got == want
    assert {q for q, *_ in got} == {100, 101, 102}


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    """Drained quality screen ≡ batch quality_model_scores filtering:
    each arrival's verdict depends only on its own tokens and the fixed
    weight table, in whichever drain it arrives."""
    from tax_compliance_engine_spark.operators.textops import (
        quality_model_scores,
    )
    from tax_compliance_engine_spark.streaming.quality_stream import (
        streaming_quality_filter_writer,
    )

    schema = "doc_id long, text string"
    first = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "lorem ipsum dolor sit amet consectetur"),
        (2, ""),  # empty: logit 0.0, never kept at threshold 0
    ]
    second = [
        (3, "spark streams micro batches through foreachBatch sinks"),
        (4, "zzz qqq xxx vvv kkk jjj"),
    ]
    src, out = tmp_path / "docs", tmp_path / "kept"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_quality_filter_writer(stream, str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    got = sorted(
        (r.doc_id, r.text, r.logit) for r in drain().collect()
    )

    batch = spark.createDataFrame(first + second, schema)
    scored = batch.join(quality_model_scores(batch), "doc_id")
    want = sorted(
        (r.doc_id, r.text, r.logit)
        for r in scored.filter("logit > 0.0").collect()
    )
    assert got == want
    assert 0 < len(got) < 5, "screen should drop some docs and keep some"
    assert 2 not in {d for d, _, _ in got}


def test_streaming_incremental_dedup_matches_batch(spark, tmp_path):
    """Drained stream-static screen ≡ batch incremental_minhash_pairs:
    stream docs match only the STANDING corpus (never each other), the
    join is stateless, and two separate drains see the same corpus."""
    from tax_compliance_engine_spark.operators import dedup
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_incremental_dedup,
    )

    first, second = _near_dup_docs()
    schema = "doc_id long, text string"
    # the standing corpus: near-copies of doc 0 and doc 10, one decoy
    corpus_rows = [
        (100, first[0][1]),
        (101, second[0][1].replace("late", "early")),
        (102, "standing corpus decoy that matches nothing arriving here"),
    ]
    corpus_df = spark.createDataFrame(corpus_rows, schema)
    src, out = tmp_path / "docs", tmp_path / "matches"
    threshold = 0.4

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_incremental_dedup(stream, corpus_df, threshold=threshold)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "new_id long, corpus_id long, est_jaccard double"
        ).parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(str(src))
    got = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard) for r in drain().collect()
    )

    batch_docs = spark.createDataFrame(first + second, schema)
    want = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in dedup.incremental_minhash_pairs(
            batch_docs, corpus_df, threshold=threshold
        ).collect()
    )
    assert got == want
    assert any(n == 0 and c == 100 for n, c, _ in got)
    assert any(n == 11 and c == 101 for n, c, _ in got), (
        "second-drain doc must still match the standing corpus"
    )
    # near-dup stream docs 0/1 must NOT pair with each other here
    assert all(c >= 100 for _, c, _ in got)


def test_streaming_near_dedup_idempotent_redelivery(spark, tmp_path):
    """Re-delivering the same doc_id must not re-emit its pairs."""
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_near_dedup,
    )

    first, _ = _near_dup_docs()
    schema = "doc_id long, text string"
    src, out = tmp_path / "docs", tmp_path / "pairs"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_near_dedup(stream, threshold=0.4)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc1 long, doc2 long, est_jaccard double"
        ).parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    n1 = drain().count()
    # identical rows appended again: state must swallow them
    spark.createDataFrame(first, schema).write.mode("append").parquet(str(src))
    n2 = drain().count()
    assert n1 > 0 and n2 == n1


def test_streaming_near_dedup_bucket_cap_evicts_fifo(spark, tmp_path):
    """With max_bucket_size, a bucket keeps only its most recent residents:
    a later duplicate pairs against the retained window, not the full
    history (bounded state for endless ingest)."""
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_near_dedup,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    schema = "doc_id long, text string"
    src, out = tmp_path / "docs", tmp_path / "pairs"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_near_dedup(stream, threshold=0.4, max_bucket_size=2)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc1 long, doc2 long, est_jaccard double"
        ).parquet(str(out))

    spark.createDataFrame(
        [(0, text), (1, text), (2, text)], schema
    ).write.mode("append").parquet(str(src))
    got1 = {(r.doc1, r.doc2) for r in drain().collect()}
    # within one drain all three pair (eviction applies at state write)
    assert got1 == {(0, 1), (0, 2), (1, 2)}

    # doc 0 was evicted (cap 2 keeps [1, 2]); doc 3 pairs only against them
    spark.createDataFrame([(3, text)], schema).write.mode("append").parquet(
        str(src)
    )
    got2 = {(r.doc1, r.doc2) for r in drain().collect()}
    assert got2 - got1 == {(1, 3), (2, 3)}


def test_pq_codes_shape_and_determinism(spark):
    """Every vector compresses to exactly one code per subspace, codes are
    within the codebook range, and the encoding is deterministic."""
    from tax_compliance_engine_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = similarity.pq_codebooks(emb).cache()
    rows = cb.collect()
    assert {r.subspace for r in rows} == set(range(similarity.PQ_M))
    assert all(0 <= r.code < similarity.PQ_K for r in rows)
    assert all(
        len(r.centroid) == similarity.DIM // similarity.PQ_M for r in rows
    )
    codes = similarity.pq_codes(emb, cb)
    got = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert len(got) == emb.count()
    assert all(len(c) == similarity.PQ_M for c in got.values())
    again = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_codes(emb, cb).collect()
    }
    assert got == again


def test_pq_rerank_recall_on_clustered_data(spark):
    """On data with real cluster structure the ADC shortlist + exact
    re-rank recovers the exact-L2 top-k: re-ranked results must match
    brute-force L2 exactly when the shortlist covers the cluster."""
    from pyspark.sql.window import Window

    from tax_compliance_engine_spark.operators import similarity
    from tax_compliance_engine_spark.operators.similarity import _dot, _vec_d

    emb = clustered_emb(spark)
    # PQ needs DIM-d vectors; clustered_emb is already 64-d
    cb = similarity.pq_codebooks(emb, k=8).cache()
    codes = similarity.pq_codes(emb, cb).cache()
    pred = F.col("vec_id") == 0
    got = similarity.pq_knn_rerank(
        emb, pred, cb, codes, k=3, shortlist=10
    ).collect()

    base = emb.select("vec_id", _vec_d(F.col("embedding")).alias("v"))
    q = base.filter(pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = (
        _dot(F.col("qv"), F.col("qv"))
        - F.lit(2.0) * _dot(F.col("qv"), F.col("v"))
    ) + _dot(F.col("v"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact = (
        q.crossJoin(base)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .orderBy("r")
        .collect()
    )
    assert [(r.neighbor_id, r.rank) for r in got] == [
        (r.vec_id, r.r) for r in exact
    ]
    for a, e in zip(got, exact):
        assert a.d2 == pytest.approx(e.d2)


def test_pq_adc_ranks_a_duplicate_of_the_query_first(spark):
    """ADC distance to a DUPLICATE of the query is the per-subspace
    minimum by construction (the query's own code is the argmin centroid
    for each of its subvectors), so the duplicate must share the query's
    codes exactly and take ADC rank 1 with the smallest distance."""
    from tax_compliance_engine_spark.operators import similarity

    base = clustered_emb(spark)
    dup = base.filter(F.col("vec_id") == 0).select(
        F.lit(100).cast("long").alias("vec_id"), "embedding", "label"
    )
    emb = base.unionByName(dup)
    cb = similarity.pq_codebooks(emb, k=8).cache()
    codes = similarity.pq_codes(emb, cb).cache()
    by_id = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert by_id[0] == by_id[100]
    got = sorted(
        similarity.pq_knn(emb, F.col("vec_id") == 0, cb, codes, k=18).collect(),
        key=lambda r: r.rank,
    )
    dup_d2 = next(r.adc2 for r in got if r.neighbor_id == 100)
    # ties possible (other vectors may share the query's codes on a tiny
    # corpus) but nothing can beat the duplicate's distance
    assert all(dup_d2 <= r.adc2 for r in got)
    assert dup_d2 == got[0].adc2


def _cells_for(spark, emb):
    from tax_compliance_engine_spark.operators import similarity

    cents = similarity.label_centroids(emb).select(
        F.col("label").alias("cell"), "centroid"
    )
    assign = similarity.nearest_cell_assignments(
        emb, cents.select(F.col("cell").alias("label"), "centroid")
    ).cache()
    return cents, assign


def test_residual_vectors_reconstruct(spark):
    """residual + centroid must reproduce the original vector exactly
    (a - b) + b == a is NOT an FP identity in general, so compare with a
    tolerance, and check the cell assignment rides along."""
    import math

    from tax_compliance_engine_spark.operators import similarity

    emb = clustered_emb(spark)
    cents, assign = _cells_for(spark, emb)
    res = similarity.residual_vectors(emb, cents, assign)
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    cvecs = {r.cell: r.centroid for r in cents.collect()}
    for r in res.collect():
        rebuilt = [a + b for a, b in zip(r.res, cvecs[r.cell])]
        assert all(
            math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)
            for x, y in zip(rebuilt, orig[r.vec_id])
        )


def test_ivfpq_full_probe_full_shortlist_equals_bruteforce(spark):
    """With every cell probed and the shortlist covering the whole
    corpus, the exact re-rank must return exactly the brute-force L2
    top-k — the ADC stage can then only order the shortlist, never drop
    a true neighbor."""
    from pyspark.sql.window import Window

    from tax_compliance_engine_spark.operators import similarity
    from tax_compliance_engine_spark.operators.similarity import _dot, _vec_d

    emb = clustered_emb(spark)
    cents, assign = _cells_for(spark, emb)
    pred = F.col("vec_id") % 6 == 0
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.ivfpq_knn(
            emb, pred, cents, assign, k=3, nprobe=3, shortlist=100, k_codes=8
        ).collect()
    )

    base = emb.select("vec_id", _vec_d(F.col("embedding")).alias("v"))
    q = base.filter(pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = (
        _dot(F.col("qv"), F.col("qv"))
        - F.lit(2.0) * _dot(F.col("qv"), F.col("v"))
    ) + _dot(F.col("v"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    want = sorted(
        (r.query_id, r.r, r.vec_id)
        for r in q.crossJoin(base)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .collect()
    )
    assert got == want


def test_ivfpq_single_probe_stays_in_cluster(spark):
    """nprobe=1 on well-separated clusters: every returned neighbor
    comes from the query's own (geometric) cluster."""
    from tax_compliance_engine_spark.operators import similarity

    emb = clustered_emb(spark)
    cents, assign = _cells_for(spark, emb)
    got = similarity.ivfpq_knn(
        emb,
        F.col("vec_id") == 0,
        cents,
        assign,
        k=5,
        nprobe=1,
        shortlist=10,
        k_codes=8,
    ).collect()
    assert len(got) == 5
    assert all(r.neighbor_id < 6 for r in got)  # cluster 0 = ids 0..5


def test_pq_supports_non_default_dims(spark):
    """The PQ family must work on vectors of any dimension via the dim
    parameter (16-d here), not just the corpus default — full-shortlist
    re-rank equals brute-force L2 exactly."""
    from pyspark.sql.window import Window

    from tax_compliance_engine_spark.operators import similarity
    from tax_compliance_engine_spark.operators.similarity import _dot, _vec_d

    emb = misaligned_emb(spark)  # 16-d vectors
    cb = similarity.pq_codebooks(emb, m=4, k=8, dim=16).cache()
    codes = similarity.pq_codes(emb, cb, m=4, dim=16).cache()
    pred = F.col("vec_id") == 0
    got = sorted(
        (r.rank, r.neighbor_id)
        for r in similarity.pq_knn_rerank(
            emb, pred, cb, codes, k=3, shortlist=40, m=4, dim=16
        ).collect()
    )
    base = emb.select("vec_id", _vec_d(F.col("embedding")).alias("v"))
    q = base.filter(pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = (
        _dot(F.col("qv"), F.col("qv"))
        - F.lit(2.0) * _dot(F.col("qv"), F.col("v"))
    ) + _dot(F.col("v"), F.col("v"))
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    want = sorted(
        (r.r, r.vec_id)
        for r in q.crossJoin(base)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .collect()
    )
    assert got == want


def test_streaming_near_dedup_matches_batch_on_real_corpus(spark, tmp_path):
    """Drained ≡ batch on the real synthetic documents table (500 docs,
    real near-dup structure), split across two micro-batch drains."""
    from tax_compliance_engine_spark.operators import dedup
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_near_dedup,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    schema = "doc_id long, text string"
    src, out = tmp_path / "docs", tmp_path / "pairs"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_near_dedup(stream, threshold=0.5)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc1 long, doc2 long, est_jaccard double"
        ).parquet(str(out))

    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(str(src))
    drain()
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(str(src))
    got = sorted(
        (r.doc1, r.doc2, r.est_jaccard) for r in drain().collect()
    )
    want = sorted(
        (r.doc1, r.doc2, r.est_jaccard)
        for r in dedup.minhash_est_pairs(docs, threshold=0.5).collect()
    )
    assert got == want and len(want) > 0


def test_streaming_ivfpq_knn_matches_prebuilt(spark, tmp_path, monkeypatch):
    """Drained streaming ANN serving over the PERSISTED IVFPQ index ≡
    the batch prebuilt query on the same query vectors — bit-equal
    exact-re-rank distances, no matter which drain a query arrives in,
    and an empty re-drain stays idempotent.  The stream loads the SAME
    parquet artifacts the batch query persisted (build once, serve
    forever), exercising external queries_df serving end to end."""
    import os

    from tax_compliance_engine_spark.operators import similarity
    from tax_compliance_engine_spark.plans import queries_dataops as qd
    from tax_compliance_engine_spark.streaming.ann_stream import (
        streaming_ivfpq_knn_writer,
    )

    sf_dir = "/root/testdata/sf0.001"
    monkeypatch.setenv("TCE_ANN_INDEX_DIR", str(tmp_path / "idx"))
    # batch reference — also builds + persists the index artifacts
    want = sorted(
        map(tuple, qd.ivfpq_knn_prebuilt(spark, sf_dir).collect())
    )
    emb = qd._emb(spark, sf_dir)
    key = similarity.ann_index_key(emb, "ivfpq", qd._IVFPQ_PARAMS)
    index = similarity.load_ann_index(
        spark, os.path.join(str(tmp_path / "idx"), key)
    )

    # replay the batch predicate's query vectors as a 2-drain stream
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qschema = queries.schema
    rows = queries.collect()
    assert len(rows) >= 4
    first, second = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    src, out = tmp_path / "queries", tmp_path / "results"

    def drain():
        stream = spark.readStream.schema(qschema).parquet(str(src))
        q = (
            streaming_ivfpq_knn_writer(
                stream, emb, index, str(out), k=5, nprobe=2, shortlist=50
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out)).select(
            "query_id", "neighbor_id", "d2", "rank"
        )

    spark.createDataFrame(first, qschema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, qschema).write.mode("append").parquet(
        str(src)
    )
    got = sorted(map(tuple, drain().collect()))
    assert sorted(map(tuple, drain().collect())) == got  # idempotent
    assert got == want  # bit-equal d2, same ranks
    assert {q for q, *_ in got} == {r.query_id for r in rows}


def test_streaming_winnow_screen_matches_batch(spark, tmp_path):
    """Drained streaming winnow screen ≡ the batch winnow_screen over
    the same arrivals (real sf0.001 corpus split): identical
    (doc_id, n_fps, n_matched, keep) rows regardless of which drain a
    doc arrives in, and an empty re-drain stays idempotent."""
    from tax_compliance_engine_spark.operators import dedup as dd
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_winnow_screen_writer,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 13 != 0)
    batch_all = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id", "text"
    )
    rows = batch_all.collect()
    first, second = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    src, out = tmp_path / "arrivals", tmp_path / "screened"
    schema = batch_all.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        qy = (
            streaming_winnow_screen_writer(stream, corpus, str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
        return spark.read.parquet(str(out)).select(
            "doc_id", "n_fps", "n_matched", "keep"
        )

    spark.createDataFrame(first, schema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(
        str(src)
    )
    got = sorted(map(tuple, drain().collect()))
    assert sorted(map(tuple, drain().collect())) == got  # idempotent
    want = sorted(
        map(
            tuple,
            dd.winnow_screen(
                batch_all, dd.winnow_corpus_fps(corpus)
            ).collect(),
        )
    )
    assert got == want
    assert len(got) == len(rows)
    assert any(not k for *_, k in got) or any(k for *_, k in got)


def test_streaming_winnow_index_refresh_matches_rebuild(spark, tmp_path):
    """Incremental winnow-index maintenance: draining two document
    batches through streaming_winnow_index_writer yields (fp_hash, df)
    counts BIT-EXACT equal to a full rebuild over all drained docs, the
    capped served set matches winnow_corpus_fps of the union, an empty
    re-drain (and a simulated re-delivery of an old batch id) changes
    nothing, and stale staging dirs from a "crashed" writer are reaped."""
    import os

    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.operators.dedup import (
        winnow_corpus_fps,
        winnow_fp_counts,
        winnow_merge_fp_counts,
    )
    from tax_compliance_engine_spark.streaming.dedup_stream import (
        streaming_winnow_index_writer,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    rows = docs.collect()
    first, second = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    src, idx = tmp_path / "arrivals", str(tmp_path / "winnow_index")
    schema = docs.schema

    # a stale staging dir left by a "crashed" writer (different pid)
    stale = f"{idx}.staging.99999"
    os.makedirs(stale)
    (tmp_path / "winnow_index.staging.99999" / "junk").write_text("x")

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        qy = (
            streaming_winnow_index_writer(stream, idx)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
        return sorted(
            map(tuple, spark.read.parquet(idx).collect())
        )

    spark.createDataFrame(first, schema).write.mode("append").parquet(
        str(src)
    )
    drain()
    assert not os.path.isdir(stale)  # reaped from ANY pid
    spark.createDataFrame(second, schema).write.mode("append").parquet(
        str(src)
    )
    got = drain()
    assert drain() == got  # empty re-drain: nothing changes

    # refreshed index == full rebuild over everything drained, bit-exact
    want = sorted(map(tuple, winnow_fp_counts(docs).collect()))
    assert got == want
    # and the served (capped) set matches the batch operator's
    served = {
        r.fp_hash
        for r in spark.read.parquet(idx)
        .filter(F.col("df") <= 50)
        .select("fp_hash")
        .collect()
    }
    assert served == {
        r.fp_hash for r in winnow_corpus_fps(docs, df_cap=50).collect()
    }
    # the merge operator alone is also rebuild-exact on a disjoint split
    d1 = docs.filter(F.col("doc_id") % 2 == 0)
    d2 = docs.filter(F.col("doc_id") % 2 == 1)
    merged = sorted(
        map(
            tuple,
            winnow_merge_fp_counts(winnow_fp_counts(d1), d2).collect(),
        )
    )
    assert merged == want


def test_streaming_semdedup_screen_matches_batch(spark, tmp_path):
    """Drained streaming semantic-dup screen ≡ batch semdedup_screen
    over the same arrivals against the same frozen index (real sf0.001
    embeddings split), float bit-equal match cosines, idempotent empty
    re-drain — the frozen-index argument."""
    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.operators import similarity
    from tax_compliance_engine_spark.streaming.ann_stream import (
        streaming_semdedup_screen_writer,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 13 != 0)
    arrivals = emb.filter(F.col("vec_id") % 13 == 0).select(
        "vec_id", "embedding"
    )
    idx = similarity.semdedup_index(corpus, k=8, threshold=0.4)
    rows = arrivals.collect()
    first, second = rows[: len(rows) // 2], rows[len(rows) // 2 :]
    src, out = tmp_path / "arrivals", tmp_path / "screened"
    schema = arrivals.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_semdedup_screen_writer(stream, idx, str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out)).select(
            "vec_id", "cell", "match_id", "match_cos", "keep"
        )

    spark.createDataFrame(first, schema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(
        str(src)
    )
    got = sorted(map(tuple, drain().collect()))
    assert sorted(map(tuple, drain().collect())) == got  # idempotent
    want = sorted(
        map(
            tuple,
            similarity.semdedup_screen(arrivals, idx, threshold=0.4).collect(),
        )
    )
    assert got == want  # exact, incl. bit-equal cosines
    assert len(got) == len(rows)
    # both verdicts occur on the real fixture
    assert {r[4] for r in got} == {True, False}
