"""Pins for the r9 ANN-index / planner-memo hardening (ADVICE round 8):
stale-knob invalidation via key salting, untrusted-root refusal, and
memo-count physical-bound validation — the behaviors that keep persisted
artifacts from being served as query results when they shouldn't be."""

from __future__ import annotations

import os
import stat

from tax_compliance_engine_spark.plans.queries_dataops import _ann_index_root


def test_ann_index_root_default_is_private(tmp_path, monkeypatch):
    monkeypatch.delenv("TCE_ANN_INDEX_DIR", raising=False)
    monkeypatch.setattr(
        "tempfile.gettempdir", lambda: str(tmp_path)
    )
    root = _ann_index_root()
    assert root is not None and str(tmp_path) in root
    assert f"tce_ann_index_{os.getuid()}" in root
    mode = os.stat(root).st_mode
    assert not (mode & (stat.S_IWGRP | stat.S_IWOTH))
    assert mode & stat.S_IRWXU == stat.S_IRWXU


def test_ann_index_root_refuses_other_writable(tmp_path, monkeypatch):
    shared = tmp_path / "shared"
    shared.mkdir()
    os.chmod(shared, 0o777)
    monkeypatch.setenv("TCE_ANN_INDEX_DIR", str(shared))
    assert _ann_index_root() is None  # group/other-writable: no cache


def test_ann_index_root_accepts_private_env_dir(tmp_path, monkeypatch):
    mine = tmp_path / "mine"
    mine.mkdir()
    os.chmod(mine, 0o700)
    monkeypatch.setenv("TCE_ANN_INDEX_DIR", str(mine))
    assert _ann_index_root() == str(mine)


def test_ann_index_key_salts_params_and_version(spark, tmp_path):
    """Same corpus, different build knobs (or a format-version bump) ⇒
    different cache keys, so stale artifacts MISS instead of serving."""
    from tax_compliance_engine_spark.operators import similarity

    pq = tmp_path / "emb.parquet"
    spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3, 0.4])], "vec_id long, embedding array<double>"
    ).write.parquet(str(pq))
    emb = spark.read.parquet(str(pq))

    k_a = similarity.ann_index_key(emb, "pq", {"m": 4, "k": 16})
    k_b = similarity.ann_index_key(emb, "pq", {"m": 8, "k": 16})
    k_c = similarity.ann_index_key(emb, "pq", {"m": 4, "k": 16})
    assert k_a is not None and k_a != k_b and k_a == k_c
    assert similarity.ann_index_key(emb, "ivf", {"m": 4, "k": 16}) != k_a

    monkey_version = similarity.ANN_INDEX_FORMAT_VERSION
    try:
        similarity.ANN_INDEX_FORMAT_VERSION = monkey_version + 1
        assert similarity.ann_index_key(emb, "pq", {"m": 4, "k": 16}) != k_a
    finally:
        similarity.ANN_INDEX_FORMAT_VERSION = monkey_version


def test_memo_count_physical_bounds(spark, tmp_path):
    """A memo-recalled corpus count outside [n_files, bytes/8] is
    rejected (re-counted) — the defense-in-depth behind the uid-private
    ownership-checked sidecar."""
    from tax_compliance_engine_spark.operators import similarity

    pq = tmp_path / "emb2.parquet"
    spark.createDataFrame(
        [(i, [float(i), 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(str(pq))
    emb = spark.read.parquet(str(pq))
    total = sum(
        os.stat(os.path.join(str(pq), f)).st_size
        for f in os.listdir(str(pq))
        if not f.startswith(("_", "."))
    )
    assert similarity._count_in_physical_bounds(emb, 50)
    assert not similarity._count_in_physical_bounds(emb, 0)
    assert not similarity._count_in_physical_bounds(emb, total)  # absurd
    # in-memory frames (no file lineage) are never trusted
    mem = spark.createDataFrame([(1, [0.1])], "vec_id long, embedding array<double>")
    assert not similarity._count_in_physical_bounds(mem, 1)


def test_bpe_tokenizer_artifact_roundtrip(spark, tmp_path, monkeypatch):
    """Persisted-tokenizer path: the first call trains and publishes a
    keyed merge-rule artifact, the second call LOADS it (the key dir
    already exists), and both — plus the inline train-compose form —
    produce identical per-doc counts."""
    import os

    from tax_compliance_engine_spark.operators import corpus
    from tax_compliance_engine_spark.plans.queries_dataops import (
        _prebuilt_index,
    )

    root = tmp_path / "artifacts"
    root.mkdir()
    os.chmod(root, 0o700)
    monkeypatch.setenv("TCE_ANN_INDEX_DIR", str(root))

    pq = tmp_path / "docs.parquet"
    rows = [(i, f"aba bab abab {'ab' * (i % 4)}") for i in range(40)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(pq)
    )
    docs = spark.read.parquet(str(pq))

    def run():
        idx = _prebuilt_index(
            spark,
            docs,
            "bpe",
            lambda: {
                "merges": corpus.bpe_merges(docs, n_merges=4, materialize=True)
            },
            params={"n_merges": 4},
        )
        return sorted(
            corpus.bpe_token_counts_from_rules(
                docs, idx["merges"], n_merges=4
            ).collect()
        )

    first = run()
    published = [d for d in os.listdir(root) if d.startswith("bpe-")]
    assert len(published) == 1  # keyed artifact landed
    second = run()  # loads — same key dir, no new publish
    assert [d for d in os.listdir(root) if d.startswith("bpe-")] == published
    inline = sorted(
        corpus.bpe_token_counts(docs, n_merges=4, materialize=True).collect()
    )
    assert first == second == inline
