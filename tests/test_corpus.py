"""Unit tests for the corpus-level training-data operators (vocabulary,
TF-IDF, deterministic/stratified sampling, sequence packing,
decontamination) on tiny hand-built DataFrames.

Extensions beyond the reference's surface (SURVEY §7 phase 5); also
oracle-checked at sf0.01 by scripts/check_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import corpus


def docs_df(spark, rows):
    """rows: (doc_id, text, source)"""
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_vocabulary_counts(spark):
    df = docs_df(
        spark,
        [(0, "a b a", "s0"), (1, "a c", "s0"), (2, "c c c", "s1")],
    )
    vocab = {r.token: (r.term_count, r.doc_freq) for r in corpus.vocabulary(df).collect()}
    assert vocab == {"a": (3, 2), "b": (1, 1), "c": (4, 2)}


def test_top_vocabulary_order_and_tiebreak(spark):
    df = docs_df(spark, [(0, "b b a a c", "s0")])
    rows = corpus.top_vocabulary(df, k=2).collect()
    # a and b tie at 2 — tiebreak on token ascending
    assert [(r.token, r.term_count) for r in rows] == [("a", 2), ("b", 2)]


def test_tfidf_ranks(spark):
    df = docs_df(
        spark,
        [(0, "rare common common", "s0"), (1, "common common", "s0")],
    )
    rows = corpus.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r.rank)
    # "rare" (df=1) outranks "common" (df=2, idf=0) for doc 0
    assert d0[0].token == "rare" and d0[0].rank == 1
    assert d0[0].tfidf == 1.0 * math.log(2 / 1)
    # "common" appears in every doc → idf 0 → tfidf 0
    assert d0[1].token == "common" and d0[1].tfidf == 0.0


def test_deterministic_sample_is_stable_and_exact(spark):
    df = docs_df(spark, [(i, "x", "s0") for i in range(200)])
    kept1 = sorted(r.doc_id for r in corpus.deterministic_sample(df, 0.3).collect())
    kept2 = sorted(r.doc_id for r in corpus.deterministic_sample(df, 0.3).collect())
    assert kept1 == kept2  # no RNG: identical across runs
    # matches the driver-side recomputation of the same LCG
    expected = [
        i
        for i in range(200)
        if (i * corpus.SAMPLE_MULT + corpus.SAMPLE_INC) % corpus.SAMPLE_MOD
        < int(0.3 * corpus.SAMPLE_MOD)
    ]
    assert kept1 == expected


def test_stratified_sample_quota(spark):
    rows = [(i, "x", f"s{i % 3}") for i in range(30)]
    out = corpus.stratified_sample(docs_df(spark, rows), per_stratum=4).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
    assert per == {"s0": 4, "s1": 4, "s2": 4}


def test_shuffle_shards_deterministic_round_robin(spark):
    """Shuffle ranks are a permutation in LCG-hash order (identical
    across runs), shards interleave round-robin, and sparse/shuffled
    ids spanning many rank shards still rank globally correctly."""
    ids = [7, 1000, 3, 512, 64, 2, 999, 123, 500, 88, 4096, 9]
    docs = docs_df(spark, [(i, "x", "s0") for i in ids])
    out1 = sorted(
        (r.doc_id, r.shuffle_rank, r.train_shard)
        for r in corpus.shuffle_shards(docs, n_shards=3).collect()
    )
    out2 = sorted(
        (r.doc_id, r.shuffle_rank, r.train_shard)
        for r in corpus.shuffle_shards(docs, n_shards=3).collect()
    )
    assert out1 == out2  # no RNG state anywhere
    want_order = sorted(
        ids,
        key=lambda i: (
            (i * corpus.SAMPLE_MULT + corpus.SAMPLE_INC) % corpus.SAMPLE_MOD,
            i,
        ),
    )
    by_doc = {d: (r, s) for d, r, s in out1}
    assert [d for d, _, _ in sorted(out1, key=lambda t: t[1])] == want_order
    assert sorted(r for _, r, _ in out1) == list(range(1, len(ids) + 1))
    for d, r, s in out1:
        assert s == (r - 1) % 3


def test_budget_allocated_sample_largest_remainder(spark):
    """Exact largest-remainder allocation: strata 50/30/20 docs with
    budget 7 → exact quotas 3.5/2.1/1.4 → bases 3/2/1 (sum 6), the one
    leftover seat goes to the largest remainder (s0's .5) → 4/2/1; the
    fill is the deterministic hash order; quotas sum to the budget."""
    import pytest

    rows = (
        [(i, "x", "s0") for i in range(50)]
        + [(100 + i, "x", "s1") for i in range(30)]
        + [(200 + i, "x", "s2") for i in range(20)]
    )
    out = corpus.budget_allocated_sample(docs_df(spark, rows), budget=7).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
        assert r.stratum_quota == {"s0": 4, "s1": 2, "s2": 1}[r.source]
    assert per == {"s0": 4, "s1": 2, "s2": 1}
    assert sum(per.values()) == 7
    # budget >= corpus: every doc is kept, never more
    all_out = corpus.budget_allocated_sample(
        docs_df(spark, rows), budget=1000
    ).collect()
    assert len(all_out) == 100
    with pytest.raises(ValueError, match="budget"):
        corpus.budget_allocated_sample(docs_df(spark, rows), budget=0)


def test_temperature_allocated_sample_flattens(spark):
    """α-sampling pins: √n weights re-derived exactly in Python (same
    IEEE sqrt/division/floor), quotas sum to the budget, α=0.5 shifts
    seats from the big stratum to the small ones vs proportional, α=1
    reproduces budget_allocated_sample's counts, a stratum smaller than
    its quota under-fills without reallocation, and the α guard
    raises."""
    import math

    import pytest

    rows = (
        [(i, "x", "s0") for i in range(64)]
        + [(100 + i, "x", "s1") for i in range(16)]
        + [(200 + i, "x", "s2") for i in range(4)]
    )
    df = docs_df(spark, rows)
    budget = 21
    out = corpus.temperature_allocated_sample(df, budget=budget, alpha=0.5)
    per: dict[str, int] = {}
    quota: dict[str, int] = {}
    for r in out.collect():
        per[r.source] = per.get(r.source, 0) + 1
        quota[r.source] = r.stratum_quota
    # exact re-derivation: w = sqrt(n) = 8/4/2, W folded in name order
    w = {"s0": math.sqrt(64.0), "s1": math.sqrt(16.0), "s2": math.sqrt(4.0)}
    acc = 0.0
    for s in sorted(w):
        acc += w[s]
    shares = {s: budget * w[s] / acc for s in w}
    bases = {s: int(math.floor(shares[s])) for s in w}
    left = budget - sum(bases.values())
    order = sorted(w, key=lambda s: (-(shares[s] - bases[s]), s))
    want = dict(bases)
    for s in order[:left]:
        want[s] += 1
    assert quota == want and per == want
    assert sum(per.values()) == budget
    # flattening: small strata get MORE than proportional allocation
    prop = {
        r.source: r.stratum_quota
        for r in corpus.budget_allocated_sample(df, budget=budget).collect()
    }
    assert quota["s2"] > prop["s2"] and quota["s0"] < prop["s0"]
    # α=1 ≡ proportional allocation
    a1 = {
        r.source: r.stratum_quota
        for r in corpus.temperature_allocated_sample(
            df, budget=budget, alpha=1.0
        ).collect()
    }
    assert a1 == prop
    # under-fill: s2 (4 docs) can't fill a big flattened quota
    big = corpus.temperature_allocated_sample(
        df, budget=70, alpha=0.25
    ).collect()
    s2_rows = [r for r in big if r.source == "s2"]
    assert len(s2_rows) == 4 and s2_rows[0].stratum_quota > 4
    with pytest.raises(ValueError, match="alpha"):
        corpus.temperature_allocated_sample(df, budget=7, alpha=0.3)


def test_bpe_fertility_sums_and_divisions(spark):
    """Per-lang fertility re-derived from the per-doc counts: the lang
    rollup's integer sums equal a Python regroup of bpe_token_counts'
    output joined to the docs, and fertility/compression are exactly
    sum ratios."""
    from tax_compliance_engine_spark.plans import queries_dataops as qd

    sf = "/root/testdata/sf0.001"
    got = {r.lang: r for r in qd.corpus_bpe_fertility(spark, sf).collect()}
    docs = {
        r.doc_id: (r.lang, r.n_chars)
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .collect()
    }
    counts = corpus.bpe_token_counts(
        spark.read.parquet(f"{sf}/documents.parquet"), n_merges=6
    ).collect()
    agg: dict[str, list[int]] = {}
    for r in counts:
        lang, n_chars = docs[r.doc_id]
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += r.n_words
        a[1] += r.n_subwords
        a[2] += n_chars
    assert set(got) == set(agg)
    for lang, (w, s, c) in agg.items():
        g = got[lang]
        assert (g.total_words, g.total_subwords, g.total_chars) == (w, s, c)
        assert g.fertility == s / w
        assert g.chars_per_subword == c / s
        assert g.fertility > 1.0  # subwords never fewer than words


def test_quality_tiered_sample_tiers_and_rates(spark):
    """Tier arithmetic and keep rule re-derived exactly: 8 docs with
    known scores cut into 4 equal tiers (worst tier = lowest scores,
    NULL coalesces to 0.0 and ranks worst), each kept iff its LCG key
    clears its tier's rate; tier_rate column echoes the rates tuple."""
    rows = [
        (0, 0.9), (1, 0.8), (2, 0.7), (3, 0.6),
        (4, 0.3), (5, 0.2), (6, 0.1), (7, None),
    ]
    scored = spark.createDataFrame(rows, "doc_id long, mean_prob double")
    rates = (0.0, 0.5, 1.0, 1.0)
    got = {
        r.doc_id: (r.tier, r.tier_rate)
        for r in corpus.quality_tiered_sample(scored, rates=rates).collect()
    }
    # rank order (score asc, null->0.0 worst): 7,6,5,4,3,2,1,0
    want_tier = {7: 0, 6: 0, 5: 1, 4: 1, 3: 2, 2: 2, 1: 3, 0: 3}
    key = lambda i: ((i % corpus.SAMPLE_MOD) * (corpus.SAMPLE_MULT % corpus.SAMPLE_MOD) + corpus.SAMPLE_INC) % corpus.SAMPLE_MOD  # noqa: E731
    for doc_id, tier in want_tier.items():
        rate = rates[tier]
        kept = float(key(doc_id)) < rate * float(corpus.SAMPLE_MOD)
        if kept:
            assert got[doc_id] == (tier, rate)
        else:
            assert doc_id not in got
    # tier 0 (rate 0.0) keeps nothing; tiers 2-3 (rate 1.0) keep all
    assert all(got[d][0] >= 2 for d in (0, 1, 2, 3) if d in got)
    assert 7 not in got and 6 not in got
    import pytest

    with pytest.raises(ValueError, match="rates"):
        corpus.quality_tiered_sample(scored, rates=(1.5,))
    # score-domain contract: the rank key is order-correct only on
    # [0, 10) — out-of-domain scores RAISE at execution (both engines
    # carry the guard), never silently mis-rank
    for bad in (-0.5, 10.0, 123.4):
        out_of_domain = spark.createDataFrame(
            [(0, 0.5), (1, bad)], "doc_id long, mean_prob double"
        )
        with pytest.raises(Exception, match="ordering domain"):
            corpus.quality_tiered_sample(out_of_domain).collect()


def test_pack_sequences_bins(spark):
    # docs of 3 tokens each, budget 4: prefix starts 0,3,6,9 → bins 0,0,1,2
    df = docs_df(spark, [(i, "a b c", "s0") for i in range(4)])
    rows = sorted(corpus.pack_sequences(df, 4).collect(), key=lambda r: r.doc_id)
    assert [r.bin_id for r in rows] == [0, 0, 1, 2]
    assert all(r.n_tokens == 3 for r in rows)


def test_pack_sequences_matches_global_prefix_sum(spark):
    # Irregular doc lengths and sparse, shuffled ids across many shards:
    # the two-level-offset packing must equal the global running sum exactly.
    ids = [7, 1000, 3, 512, 64, 2, 999, 123, 500, 88, 4096, 9]
    rows = [(i, " ".join(["w"] * ((i * 7) % 11 + 1)), "s0") for i in ids]
    out = {
        r.doc_id: (r.n_tokens, r.bin_id)
        for r in corpus.pack_sequences(docs_df(spark, rows), 16, n_shards=5).collect()
    }
    acc = 0
    for i in sorted(ids):
        n = (i * 7) % 11 + 1
        assert out[i] == (n, acc // 16)
        acc += n


def test_pack_sequences_plan_has_no_single_partition_exchange(spark):
    # The scale guarantee: the cumsum window partitions by shard — no stage
    # of the returned plan may funnel the corpus through one task.
    import contextlib
    import io

    df = docs_df(spark, [(i, "a b c", "s0") for i in range(50)])
    packed = corpus.pack_sequences(df, 8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packed.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_decontaminate_drops_overlapping(spark):
    bench = docs_df(spark, [(100, "the quick brown fox jumps", "b")])
    docs = docs_df(
        spark,
        [
            (0, "look the quick brown fox jumps here", "s0"),  # contaminated
            (1, "completely unrelated text with many words", "s0"),
            (2, "tiny", "s0"),  # shorter than n: no shingles, always kept
        ],
    )
    kept = sorted(r.doc_id for r in corpus.decontaminate(docs, bench, n=5).collect())
    assert kept == [1, 2]


def test_pack_sequences_count_col_override(spark):
    """count_col packs by a precomputed per-doc length instead of the
    whitespace token count — same bin arithmetic, different weights."""
    docs = docs_df(
        spark,
        [(0, "a b", "s0"), (1, "c d", "s0"), (2, "e f", "s0")],
    ).withColumn("w", (F.col("doc_id") + 1) * 3)  # weights 3, 6, 9
    rows = {
        r.doc_id: (r.n_tokens, r.bin_id)
        for r in corpus.pack_sequences(
            docs, token_budget=8, count_col="w"
        ).collect()
    }
    # prefix starts: 0, 3, 9 → bins 0, 0, 1
    assert rows == {0: (3, 0), 1: (6, 0), 2: (9, 1)}


def test_phrase_search_overlaps_and_edges(spark):
    docs = docs_df(
        spark,
        [
            (0, "a a a b", "s0"),  # 'a a' overlaps: starts 1,2
            (1, "x a a y a a", "s0"),  # two separate matches
            (2, "a b a b", "s0"),  # no 'a a'
            (3, "a", "s1"),  # shorter than phrase
            (4, "", "s1"),
        ],
    )
    got = {
        r.doc_id: r.n_matches
        for r in corpus.phrase_search(docs, "a a").collect()
    }
    assert got == {0: 2, 1: 2}
    one = {
        r.doc_id: r.n_matches
        for r in corpus.phrase_search(docs, "a").collect()
    }
    assert one == {0: 3, 1: 4, 2: 2, 3: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.phrase_search(docs, "  ")


def test_bm25_search_matches_python_reference(spark):
    """The log-free BM25 surrogate must reproduce a plain-Python
    recomputation exactly (token-ordered fold), and exhibit the three
    BM25 behaviors: tf saturation helps the doc with more hits, rare
    terms outweigh common ones, and shorter docs win at equal tf."""
    texts = {
        0: "apple banana apple cherry",
        1: "apple " + " ".join(f"pad{i}" for i in range(20)),
        2: "apple banana",
        3: "banana banana cherry date",
        4: "date elder fig grape",
    }
    docs = docs_df(spark, [(i, t, "s") for i, t in texts.items()])
    queries = [(0, ["apple", "banana"]), (1, ["cherry"])]
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in corpus.bm25_search(docs, queries, k=10).collect()
    }

    k1, b = 1.2, 0.75
    toks = {i: [t for t in s.split(" ") if t] for i, s in texts.items()}
    n = len(toks)
    avgdl = float(sum(len(v) for v in toks.values())) / float(n)
    want = {}
    for qid, terms in queries:
        for d, tl in toks.items():
            score, any_hit = 0.0, False
            for term in sorted(set(terms)):
                tf = tl.count(term)
                if tf == 0:
                    continue
                any_hit = True
                df = sum(1 for v in toks.values() if term in v)
                idf = (float(n - df) + 0.5) / (float(df) + 0.5)
                norm = (1.0 - b) + b * (float(len(tl)) / avgdl)
                tfp = (float(tf) * (k1 + 1.0)) / (float(tf) + k1 * norm)
                score = score + idf * tfp
            if any_hit:
                want[(qid, d)] = score
    assert {k: v[1] for k, v in got.items()} == want
    # ranks are dense per query, score-desc with doc_id ties ascending
    for qid in (0, 1):
        ranked = sorted(
            ((v[0], d) for (q, d), v in got.items() if q == qid)
        )
        ordered = [
            d
            for d, _ in sorted(
                ((d, want[(qid, d)]) for (q, d) in want if q == qid),
                key=lambda x: (-x[1], x[0]),
            )
        ]
        assert [d for _, d in ranked] == ordered
    # at equal length, more matching mass wins: doc0 (apple x2 + banana,
    # dl 4) beats doc3 (banana x2 only, dl 4) for query 0
    assert got[(0, 0)][1] > got[(0, 3)][1]
    # length normalization: doc2 (apple+banana, dl 2) beats doc1
    # (one apple in 21 tokens)
    assert got[(0, 2)][1] > got[(0, 1)][1]
    # equal (tf, dl) docs tie EXACTLY and rank by doc_id: cherry tf 1 in
    # both doc0 and doc3 (dl 4 each)
    assert got[(1, 0)][1] == got[(1, 3)][1]
    assert (got[(1, 0)][0], got[(1, 3)][0]) == (1, 2)


def test_bm25_search_validation_and_topk(spark):
    docs = docs_df(spark, [(i, "x common", "s") for i in range(30)])
    top = corpus.bm25_search(docs, [(0, ["common"])], k=5).collect()
    assert len(top) == 5  # k caps the 30 equal-score matches
    assert [r.doc_id for r in sorted(top, key=lambda r: r.rank)] == [
        0,
        1,
        2,
        3,
        4,
    ]  # ties break on doc_id
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.bm25_search(docs, [(0, [])])
    with _pytest.raises(ValueError):
        corpus.bm25_search(docs, [(0, ["x"])], k=0)


def test_bm25_postings_cache_is_opt_in(spark):
    """r14: bm25_score_queries caches the query-filtered postings ONLY
    when asked.  Default OFF — for a literal query set the df/score
    references share one exchange (ReusedExchange) and a cache is a
    pure materialization tax (measured +0.5 s on bm25/hybrid search at
    sf0.1); retrieval_self_mrr opts in because its probe-derived qtoks
    lineage defeats exchange reuse (measured −1.4 s).  Pin BOTH plan
    shapes so a future refactor can't silently flip either path, and
    pin value-equality of the two modes."""
    docs = docs_df(
        spark,
        [(i, f"w{i % 3} common filler", "s") for i in range(12)],
    )
    plain = corpus.bm25_search(docs, [(0, ["common", "w1"])], k=5)
    assert "InMemoryRelation" not in plain._jdf.queryExecution().toString()

    mrr = corpus.retrieval_self_mrr(docs, probe_mod=4, n_terms=1, k=3)
    assert "InMemoryRelation" in mrr._jdf.queryExecution().toString()

    # cache on/off is value-neutral: same rows either way
    postings, sized, stats = corpus.bm25_index(docs)
    qtoks = spark.createDataFrame(
        [(0, "common"), (0, "w1")], "query_id long, token string"
    )
    off = corpus.bm25_score_queries(postings, sized, stats, qtoks, k=5)
    on = corpus.bm25_score_queries(
        postings, sized, stats, qtoks, k=5, cache_postings=True
    )
    assert sorted(map(tuple, off.collect())) == sorted(
        map(tuple, on.collect())
    )


def test_hybrid_search_rrf_fusion(spark):
    """RRF fusion must equal the hand-computed 1/(60+r) sums: docs hit
    by both retrievers outrank single-list docs at comparable ranks,
    missing lists contribute exactly 0, and the query doc is excluded
    from its own dense list but reachable via keywords."""
    from pyspark.sql import functions as F

    docs = docs_df(
        spark,
        [
            (0, "apple pie recipe", "s"),  # the query doc itself
            (1, "apple orchard notes", "s"),
            (2, "banana bread", "s"),
            (3, "apple apple apple", "s"),
        ],
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [0.9, 0.1, 0.0, 0.0], 0),  # dense-nearest to doc 0
            (2, [0.0, 1.0, 0.0, 0.0], 0),
            (3, [0.5, 0.5, 0.0, 0.0], 0),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    got = corpus.hybrid_search(
        docs, emb, [(9, ["apple"], 0)], k=4, pool=4
    ).collect()
    rows = {r.doc_id: r for r in got}
    # keyword list ranks (BM25 over 'apple'): docs 0,1,3 match
    kw = {
        r.doc_id: r.rank
        for r in corpus.bm25_search(docs, [(9, ["apple"])], k=4).collect()
    }
    # dense list ranks vs vec 0 (self excluded): 1, 3, 2 by cosine
    vec = {1: 1, 3: 2, 2: 3}
    for d, r in rows.items():
        exp = 0.0
        if d in kw:
            exp += 1.0 / float(60 + kw[d])
        if d in vec:
            exp += 1.0 / float(60 + vec[d])
        assert r.rrf_score == exp
        assert (r.kw_rank is None) == (d not in kw)
        assert (r.vec_rank is None) == (d not in vec)
    # doc 1 is in BOTH lists; doc 2 is dense-only; doc 0 keyword-only
    assert rows[1].kw_rank is not None and rows[1].vec_rank is not None
    assert rows[2].kw_rank is None and rows[2].vec_rank == 3
    assert rows[0].vec_rank is None and rows[0].kw_rank is not None
    # ranks follow fused score desc with doc_id tie-break
    ordered = sorted(got, key=lambda r: r.rank)
    scores = [r.rrf_score for r in ordered]
    assert scores == sorted(scores, reverse=True)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.hybrid_search(
            docs, emb, [(9, ["a"], 0), (9, ["b"], 1)]
        )


def test_inverted_index_shards_and_df(spark):
    docs = docs_df(
        spark,
        [
            (0, "a b a", "s0"),
            (1, "a c", "s0"),
            (2, "c c", "s1"),
            (5, "a", "s1"),
        ],
    )
    rows = corpus.inverted_index(docs, n_shards=2).collect()
    by = {}
    for r in rows:
        by[(r.token, r.shard)] = r
    # token 'a': docs 0 (shard 0), 1 and 5 (shard 1); global df = 3
    a0, a1 = by[("a", 0)], by[("a", 1)]
    assert a0.df == 3 and a1.df == 3
    assert a0.shard_df == 1 and a1.shard_df == 2
    assert [(p.doc_id, p.pos) for p in a0.postings] == [(0, 0), (0, 2)]
    assert [(p.doc_id, p.pos) for p in a1.postings] == [
        (1, 0),
        (5, 0),
    ]
    # token 'c': doc 1 (shard 1), doc 2 (shard 0) — two positions in 2
    assert [(p.doc_id, p.pos) for p in by[("c", 0)].postings] == [
        (2, 0),
        (2, 1),
    ]
    assert by[("c", 0)].shard_df == 1 and by[("c", 0)].df == 2


def test_oov_rates_against_topk_vocab(spark):
    """OOV counts token OCCURRENCES outside the top-k corpus vocabulary;
    ties in the vocabulary cut break on token; empty docs rate 0.0."""
    docs = docs_df(
        spark,
        [
            (0, "a a a b b c", "s0"),  # a:3 b:2 c:1 corpus-wide with doc1
            (1, "a b c zz zz", "s0"),
            (2, "", "s1"),
        ],
    )
    # corpus counts: a=4, b=3, zz=2, c=2 → top-2 = {a, b}
    rows = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in corpus.oov_rates(docs, k=2).collect()
    }
    assert rows[0] == (6, 1, 1 / 6)  # only 'c' is OOV
    assert rows[1] == (5, 3, 0.6)  # c, zz, zz
    assert rows[2] == (0, 0, 0.0)
    # k=3: the tie between zz(2) and c(2) breaks lexicographically → c
    rows3 = {
        r.doc_id: r.n_oov for r in corpus.oov_rates(docs, k=3).collect()
    }
    assert rows3[0] == 0 and rows3[1] == 2  # zz zz still OOV


def test_split_assign_stable_and_covering(spark):
    """Every doc gets exactly one label; labels are a pure function of
    doc_id (adding documents never relabels existing ones); fractions
    land near their targets; bad fractions raise."""
    import pytest as _pytest

    small = docs_df(spark, [(i, "x", "s0") for i in range(200)])
    big = docs_df(spark, [(i, "x", "s0") for i in range(1000)])
    lab_small = {
        r.doc_id: r.split for r in corpus.split_assign(small).collect()
    }
    lab_big = {r.doc_id: r.split for r in corpus.split_assign(big).collect()}
    assert len(lab_small) == 200 and len(lab_big) == 1000
    for i in range(200):  # growth never relabels
        assert lab_small[i] == lab_big[i]
    from collections import Counter

    shares = Counter(lab_big.values())
    assert set(shares) <= {"train", "val", "test"}
    assert shares["train"] > 800  # 90% ± sampling noise at n=1000
    assert 10 <= shares["val"] + shares["test"] <= 200
    with _pytest.raises(ValueError):
        corpus.split_assign(small, fractions=[("a", 0.9), ("b", 0.3)])
    with _pytest.raises(ValueError):
        corpus.split_assign(small, fractions=[("a", -0.1)])
    with _pytest.raises(ValueError):  # shortfall must not inflate 'b'
        corpus.split_assign(small, fractions=[("a", 0.7), ("b", 0.1)])
    # a single full-width label is fine (and matches the SQL twin)
    only = {r.split for r in corpus.split_assign(small, [("all", 1.0)]).collect()}
    assert only == {"all"}


def test_chunk_dedup_reassembly(spark):
    """First occurrence wins globally AND within a doc; tail chunks
    shorter than chunk_tokens still dedup; empty docs come back as empty
    rows, not missing ones."""
    docs = docs_df(
        spark,
        [
            (0, "a b c d e f", "s0"),
            (1, "a b c x y z", "s0"),  # first chunk copies doc 0's
            (2, "p q r p q r p q", "s0"),  # within-doc repeat + short tail
            (3, "", "s1"),
            (4, "a b c", "s1"),  # whole doc is a duplicate chunk
        ],
    )
    rows = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_deduped)
        for r in corpus.chunk_dedup(docs, chunk_tokens=3).collect()
    }
    assert rows[0] == (2, 2, "a b c d e f")
    assert rows[1] == (2, 1, "x y z")
    assert rows[2] == (3, 2, "p q r p q")
    assert rows[3] == (0, 0, "")
    assert rows[4] == (1, 0, "")


def test_contamination_scores_graded_overlap(spark):
    """Overlap fractions and the percent-threshold flag on constructed
    docs: a full copy scores 1.0, a partial overlap scores its exact
    shingle fraction, clean and too-short docs score 0.0 and stay
    unflagged (the 0/0 case must NOT satisfy 0 >= 0)."""
    bench = docs_df(spark, [(100, "the quick brown fox jumps over dogs", "b")])
    docs = docs_df(
        spark,
        [
            # exact copy: every 5-gram hits → overlap 1.0
            (0, "the quick brown fox jumps over dogs", "s0"),
            # 8 tokens → 4 shingles, exactly 1 shared → 0.25
            (1, "say the quick brown fox jumps here now", "s0"),
            (2, "completely unrelated text with many words", "s0"),
            (3, "tiny", "s0"),  # < n tokens: no shingles, clean
        ],
    )
    rows = {
        r.doc_id: r
        for r in corpus.contamination_scores(
            docs, bench, n=5, threshold_pct=20
        ).collect()
    }
    assert rows[0].overlap == 1.0 and rows[0].is_contaminated
    assert rows[1].n_grams == 4 and rows[1].n_hit == 1
    assert rows[1].overlap == 0.25 and rows[1].is_contaminated
    assert rows[2].overlap == 0.0 and not rows[2].is_contaminated
    assert rows[3].n_grams == 0 and rows[3].overlap == 0.0
    assert not rows[3].is_contaminated
    # at a 30% threshold the partial-overlap doc flips to clean
    at30 = {
        r.doc_id: r.is_contaminated
        for r in corpus.contamination_scores(
            docs, bench, n=5, threshold_pct=30
        ).collect()
    }
    assert at30[0] and not at30[1]


def test_decontaminate_shuffle_fallback_matches_broadcast(spark):
    """The broadcast-size guard's shuffle semi-join fallback (forced via
    max_broadcast_grams=0) must keep exactly the same documents as the
    broadcast path."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s0"),
        (1, "one two three four five six seven", "s0"),
        (2, "alpha beta gamma delta epsilon eta", "s0"),  # shares a 5-gram w/ 0
        (3, "totally unrelated words in this document here", "s1"),
    ]
    docs = docs_df(spark, rows)
    bench = docs.filter(F.col("doc_id") == 0)
    rest = docs.filter(F.col("doc_id") != 0)
    kept_bcast = sorted(
        r.doc_id for r in corpus.decontaminate(rest, bench, n=5).collect()
    )
    kept_shuffle = sorted(
        r.doc_id
        for r in corpus.decontaminate(
            rest, bench, n=5, max_broadcast_grams=0
        ).collect()
    )
    assert kept_bcast == kept_shuffle == [1, 3]


def test_vocab_min_doc_freq(spark):
    df = docs_df(spark, [(0, "a b", "s0"), (1, "a c", "s0")])
    rows = corpus.vocabulary(df, min_doc_freq=2).collect()
    assert [r.token for r in rows] == ["a"]


def test_mixture_rates_and_default(spark):
    rows = [(i, "x", f"s{i % 2}") for i in range(100)]
    out = corpus.mixture(
        docs_df(spark, rows), weights={"s0": 1.0}, default_rate=0.0
    ).collect()
    # s0 fully kept, s1 (default 0) fully dropped
    assert sorted(r.doc_id for r in out) == [i for i in range(100) if i % 2 == 0]
    # fractional rate keeps the hash-selected subset, reproducibly
    half = corpus.mixture(docs_df(spark, rows), weights={"s0": 0.5, "s1": 0.5})
    kept1 = sorted(r.doc_id for r in half.collect())
    kept2 = sorted(r.doc_id for r in half.collect())
    assert kept1 == kept2
    assert all(
        (i * corpus.SAMPLE_MULT + corpus.SAMPLE_INC) % corpus.SAMPLE_MOD
        < 0.5 * corpus.SAMPLE_MOD
        for i in kept1
    )


def test_full_training_pipeline_composes(spark):
    """End-to-end composition of the training-data pipeline over the real
    documents table: PII scrub → repetition/quality filter → MinHash
    near-dedup keep → benchmark decontamination → sequence packing.
    Each stage consumes the previous stage's DataFrame unchanged — the
    operators must compose without materialization barriers — and the
    final packed corpus must be a subset of the input with sane bins."""
    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.operators import corpus, dedup, textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    # 1. scrub PII (rewrites text; synthetic corpus is clean so texts
    #    survive unchanged — asserted via had_pii)
    scrubbed = textops.scrub_pii(docs).withColumnRenamed("text_scrubbed", "text")
    assert scrubbed.filter("had_pii").count() == 0

    # 2. drop repetitive docs
    rep = textops.repetition_stats(docs)
    keep_ids = rep.filter(~F.col("is_repetitive")).select("doc_id")
    clean = docs.join(keep_ids, "doc_id")
    n_clean = clean.count()
    assert 0 < n_clean <= n0

    # 3. near-dedup (MinHash keep-list)
    pairs = dedup.minhash_dup_pairs(clean, threshold=0.9)
    deduped = dedup.near_dedup_filter(clean, pairs)
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_clean

    # 4. decontaminate against a benchmark slice (doc_id % 97 == 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    decon = corpus.decontaminate(deduped, bench)
    n_decon = decon.count()
    assert 0 < n_decon <= n_dedup

    # 5. pack into 512-token bins
    packed = corpus.pack_sequences(decon, token_budget=512)
    assert packed.count() == n_decon
    stats = packed.agg(
        F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi")
    ).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] > 0
    # bin ids are dense: every bin below the max is non-empty
    n_bins = packed.select("bin_id").distinct().count()
    assert n_bins == stats["hi"] + 1


def test_distinct_sketch_exact_below_k_and_estimates_above(spark):
    """Groups with < k distinct tokens report the EXACT count; a group
    far above k estimates within KMV's error envelope (std ~ 1/sqrt(k-2)
    ~ 13% at k=64; 4 sigma bound asserted), and n_kept saturates at k."""
    small = [(i, f"tok{i % 7} shared", "small") for i in range(30)]
    big = [(100 + i, " ".join(f"w{i}_{j}" for j in range(40)), "big")
           for i in range(50)]  # 2000 unique tokens
    df = docs_df(spark, small + big)
    rows = {r.source: r for r in corpus.distinct_sketch(df, k=64).collect()}

    assert rows["small"].n_kept == 8  # 7 tok* + 'shared' — exact
    assert rows["small"].est_distinct == 8.0

    r = rows["big"]
    assert r.n_kept == 64
    true = 2000
    assert abs(r.est_distinct - true) / true < 0.52  # 4 sigma at k=64

    # mergeability: the union's sketch equals re-sketching the union
    from pyspark.sql import functions as F

    merged = corpus.distinct_sketch(
        df.withColumn("source", F.lit("all")), k=64
    ).collect()
    assert len(merged) == 1 and merged[0].n_kept == 64


def test_decontaminate_bloom_prefilter_matches_broadcast(spark):
    """The bloom-prefilter regime (forced via max_broadcast_grams=0) and
    the saturated-bitmap plain-shuffle regime (forced via a bitmap too
    small to help) must both keep exactly the same documents as the
    broadcast path — bloom false positives die in the exact verify join
    and false negatives are impossible."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s0"),
        (1, "one two three four five six seven", "s0"),
        (2, "alpha beta gamma delta epsilon eta", "s0"),  # shares a 5-gram w/ 0
        (3, "totally unrelated words in this document here", "s1"),
    ]
    docs = docs_df(spark, rows)
    bench = docs.filter(F.col("doc_id") == 0)
    rest = docs.filter(F.col("doc_id") != 0)
    kept_bcast = sorted(
        r.doc_id for r in corpus.decontaminate(rest, bench, n=5).collect()
    )
    # bloom path: m = max(1024, 16*n) with plenty of headroom
    kept_bloom = sorted(
        r.doc_id
        for r in corpus.decontaminate(
            rest, bench, n=5, max_broadcast_grams=0
        ).collect()
    )
    # tiny forced bitmap: expected fp > 0.5 -> falls back to plain shuffle
    kept_saturated = sorted(
        r.doc_id
        for r in corpus.decontaminate(
            rest, bench, n=5, max_broadcast_grams=0, max_bloom_bits=1
        ).collect()
    )
    assert kept_bcast == kept_bloom == kept_saturated == [1, 3]


def test_bloom_prefilter_has_no_false_negatives(spark):
    """Every benchmark gram must survive a probe against its own bitmap —
    the property that makes the prefilter safe to put in front of the
    exact join.  Checked at a deliberately tiny bitmap (heavy collisions)
    so bit-packing bugs can't hide behind sparsity."""
    from tax_compliance_engine_spark.operators.corpus import (
        _bloom_bitmap,
        _bloom_prefilter,
    )
    from tax_compliance_engine_spark.operators.dedup import _doc_ngrams

    docs = docs_df(
        spark,
        [(i, f"w{i} x{i} y{i} z{i} q{i} r{i} s{i}", "s0") for i in range(40)],
    )
    grams = _doc_ngrams(docs, "text", 3).cache()
    n_grams = grams.count()
    for m_bits in (1024, 64):  # sparse and heavily-colliding bitmaps
        bitmap = _bloom_bitmap(grams.select("gram").distinct(), m_bits)
        survivors = _bloom_prefilter(grams, bitmap, m_bits)
        assert survivors.count() == n_grams, f"false negatives at m={m_bits}"


def test_bloom_prefilter_probes_via_broadcast_joins(spark):
    """The bitmap probe must stay a broadcast join (the corpus side never
    shuffles in the prefilter) — the property that makes the bloom regime
    cheaper than the plain shuffle semi-join it replaces."""
    import contextlib
    import io

    from tax_compliance_engine_spark.operators.corpus import (
        _bloom_bitmap,
        _bloom_prefilter,
    )
    from tax_compliance_engine_spark.operators.dedup import _doc_ngrams

    docs = docs_df(spark, [(i, f"a{i} b{i} c{i} d{i}", "s0") for i in range(8)])
    grams = _doc_ngrams(docs, "text", 3)
    bitmap = _bloom_bitmap(grams.select("gram").distinct(), 4096)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _bloom_prefilter(grams, bitmap, 4096).explain("formatted")
    plan = buf.getvalue()
    # formatted output names each node twice (tree + details): 2 joins
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_token_budget_mixture_rates_and_edges(spark):
    """Per-source keep rate = min(1, budget/total): a capped source keeps
    ~budget tokens in expectation, an over-budgeted source and an
    unbudgeted source keep everything, and an all-empty source keeps
    everything instead of dividing by zero."""
    rows = (
        [(i, "tok " * 10, "big") for i in range(200)]  # 2000 tokens
        + [(200 + i, "a b c", "small") for i in range(5)]  # 15 tokens
        + [(300 + i, "x y", "free") for i in range(5)]  # unbudgeted
        + [(400 + i, "", "empty") for i in range(3)]  # 0 tokens
        + [(500 + i, "n o p", None) for i in range(4)]  # NULL source
    )
    docs = docs_df(spark, rows)
    kept = corpus.token_budget_mixture(
        docs, budgets={"big": 500.0, "small": 100.0, "empty": 1.0}
    )
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # big: rate 500/2000 = 0.25 -> expected 50 of 200 docs kept; the LCG
    # is deterministic so the realized count is a fixed number near that
    assert 30 <= by_src["big"] <= 70
    assert by_src["small"] == 5  # budget 100 > 15 tokens -> keep all
    assert by_src["free"] == 5  # no budget -> keep all
    assert by_src["empty"] == 3  # 0 tokens -> keep all, no div-by-zero
    assert by_src[None] == 4  # NULL source -> unbudgeted, keep all
    # deterministic: same inputs, same kept set
    again = corpus.token_budget_mixture(
        docs, budgets={"big": 500.0, "small": 100.0, "empty": 1.0}
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_heavy_hitters_exact_and_no_false_negatives(spark):
    """The count-min prefilter + exact verify must return exactly the
    plain-aggregation answer, including at a deliberately tiny sketch
    width (heavy collisions → many false candidates, which the exact
    verify must kill; false negatives are impossible because count-min
    only overcounts)."""
    rows = (
        [(i, "hot common filler", "s0") for i in range(50)]
        + [(100 + i, "warm other words here", "s0") for i in range(10)]
        + [(200 + i, f"rare{i} unique{i}", "s0") for i in range(30)]
    )
    docs = docs_df(spark, rows)
    want = {("hot", 50), ("common", 50), ("filler", 50)}
    got = {
        (r.token, r.term_count)
        for r in corpus.heavy_hitters(docs, min_count=40).collect()
    }
    assert got == want
    # tiny width: every token collides into 8 buckets, candidates balloon,
    # result must not change
    got_tiny = {
        (r.token, r.term_count)
        for r in corpus.heavy_hitters(docs, min_count=40, width=8).collect()
    }
    assert got_tiny == want
    # threshold just above the warm band: exact boundary behavior
    got_warm = {
        (r.token, r.term_count)
        for r in corpus.heavy_hitters(docs, min_count=10).collect()
    }
    assert ("warm", 10) in got_warm and ("rare0", 1) not in {
        (t, c) for t, c in got_warm
    }


def test_decontaminate_saturated_fallback_actually_engages(spark):
    """A max_bloom_bits cap below the useful range must force the plain
    shuffle fallback (regime 3), not silently build a 1024-bit bloom —
    asserted on the plan: no bloom probe joins, and results unchanged."""
    import contextlib
    import io

    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "s0"),
        (1, "one two three four five six seven", "s0"),
        (2, "alpha beta gamma delta epsilon eta", "s0"),
        (3, "totally unrelated words in this document here", "s1"),
    ]
    docs = docs_df(spark, rows)
    bench = docs.filter(F.col("doc_id") == 0)
    rest = docs.filter(F.col("doc_id") != 0)
    out = corpus.decontaminate(
        rest, bench, n=5, max_broadcast_grams=0, max_bloom_bits=1
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    # the bloom probe's bitmap bit-test would appear as shiftright(...)
    assert "shiftright" not in buf.getvalue()
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_token_budget_mixture_keeps_all_null_text_source(spark):
    """A budgeted source whose every text is NULL must keep all its docs
    (total 0 → keep-everything guard), not silently drop them via a NULL
    rate."""
    docs = spark.createDataFrame(
        [(1, None, "nulls"), (2, None, "nulls"), (3, "a b c", "real")],
        "doc_id long, text string, source string",
    )
    kept = sorted(
        r.doc_id
        for r in corpus.token_budget_mixture(
            docs, budgets={"nulls": 100.0}
        ).collect()
    )
    assert kept == [1, 2, 3]


def test_bloom_accelerated_join_semi_and_anti_exact(spark):
    """The generic bloom-accelerated joins must equal the plain
    semi/anti joins exactly, in the bloom regime AND at a deliberately
    tiny bitmap (heavy collisions — false positives killed by the exact
    phase) AND in the saturated fallback."""
    from tax_compliance_engine_spark.functions.bloom import (
        bloom_accelerated_join,
    )

    big = spark.createDataFrame(
        [(i, f"k{i % 40}") for i in range(400)], "row_id long, key string"
    )
    small = spark.createDataFrame(
        [(f"k{j}",) for j in range(0, 40, 3)] * 2, "key string"  # dup keys
    )
    want_semi = sorted(
        r.row_id
        for r in big.join(small.distinct(), "key", "left_semi").collect()
    )
    want_anti = sorted(
        r.row_id
        for r in big.join(small.distinct(), "key", "left_anti").collect()
    )
    for cap in (1 << 28, 128, 1):  # bloom / colliding bloom / saturated
        got_semi = sorted(
            r.row_id
            for r in bloom_accelerated_join(
                big, small, "key", how="semi", max_bloom_bits=cap
            ).collect()
        )
        got_anti = sorted(
            r.row_id
            for r in bloom_accelerated_join(
                big, small, "key", how="anti", max_bloom_bits=cap
            ).collect()
        )
        assert got_semi == want_semi, f"semi mismatch at cap={cap}"
        assert got_anti == want_anti, f"anti mismatch at cap={cap}"
    # semi + anti partition the big side
    assert sorted(want_semi + want_anti) == list(range(400))


def test_bloom_split_has_no_false_negatives_on_keys(spark):
    """Every small-side key row lands on the maybe side of bloom_split,
    even at a tiny colliding bitmap."""
    from tax_compliance_engine_spark.functions.bloom import (
        bloom_bitmap,
        bloom_split,
    )

    keys = spark.createDataFrame(
        [(f"key{i}",) for i in range(100)], "key string"
    )
    for m_bits in (4096, 64):
        bm = bloom_bitmap(keys, "key", m_bits)
        maybe, definite_out = bloom_split(keys, bm, "key", m_bits)
        assert maybe.count() == 100, f"false negatives at m={m_bits}"
        assert definite_out.count() == 0


# ── BPE merge training ───────────────────────────────────────────────


def _bpe_reference(texts, n_merges):
    """Plain-Python classic BPE: word histogram, greedy most-frequent
    adjacent pair per step (ties: lexicographic), greedy left-to-right
    merge scan — the ground truth the Spark trainer must reproduce."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[tuple(w)] += 1
    rules = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        rules.append((step, a, b, a + b, cnt))
        merged = Counter()
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] += c
        words = merged
    return rules


def _texts_df(spark, texts):
    return docs_df(
        spark, [(i, t, "s0") for i, t in enumerate(texts)]
    )


def test_bpe_merges_matches_reference(spark):
    """The distributed trainer reproduces classic greedy BPE exactly —
    rule sequence, merge order, and counts — including merges of
    already-merged symbols (multi-char pairs) and tie-breaks."""
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest low newer",
        "abab ababab ab",
    ]
    want = _bpe_reference(texts, 10)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in corpus.bpe_merges(_texts_df(spark, texts), n_merges=10)
        .orderBy("step")
        .collect()
    ]
    assert got == want
    # sanity: later steps DO merge multi-char symbols (real BPE behavior)
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _, _ in want)


def test_bpe_merges_materialized_identical(spark):
    texts = ["aa ab aa ab ba", "aaa bbb aab aa"]
    lazy = corpus.bpe_merges(_texts_df(spark, texts), n_merges=5)
    chk = corpus.bpe_merges(_texts_df(spark, texts), n_merges=5, materialize=True)
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, chk.collect()))


def test_bpe_token_counts_degenerate_corpus(spark):
    """A corpus that runs out of pairs before n_merges must NOT erase
    the documents: later (empty) rules are identity merges, on the Spark
    side (1-row NULL aggregate, not crossJoin-with-empty) and in the
    DuckDB twin (MAX() subquery) alike — pinned against plain Python."""
    import duckdb

    from tax_compliance_engine_spark.plans import oracle_corpus

    texts = ["ab ab ab", "ab a", ""]
    # only ONE learnable rule: after merging (a,b), every word is a
    # single symbol and the pair table is empty for steps 2..6
    rules = _bpe_reference(texts, 6)
    assert len(rules) == 1

    got = {
        (r.doc_id, r.n_words, r.n_subwords)
        for r in corpus.bpe_token_counts(
            _texts_df(spark, texts), n_merges=6
        ).collect()
    }
    assert got == {(0, 3, 3), (1, 2, 2), (2, 0, 0)}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            oracle_corpus.doc_bpe_token_counts_sql(6)
        ).fetchall()
    }
    assert got == want


def test_bpe_apply_fold_equals_greedy_scan(spark):
    """Property pin for the merge-fold primitive: on adversarial repeats
    (overlapping same-symbol chains), the array fold equals the classic
    greedy left-to-right skip scan."""
    from pyspark.sql import functions as F

    cases = [
        ("ababababab", ("a", "b")),
        ("aaaa", ("a", "a")),
        ("aabab", ("a", "b")),
        ("bbbbb", ("b", "b")),
        ("abba", ("a", "b")),
        ("aaab", ("a", "a")),
    ]
    rows = []
    for word, (a, b) in cases:
        syms = list(word)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        rows.append((word, a, b, out))
    df = spark.createDataFrame(
        [(w, a, b) for w, a, b, _ in rows], "w string, a string, b string"
    )
    applied = df.select(
        "w",
        corpus._bpe_apply_one(
            corpus._char_syms(F.col("w")), F.col("a"), F.col("b")
        ).alias("syms"),
    ).collect()
    got = {r.w: list(r.syms) for r in applied}
    for w, _, _, want in rows:
        assert got[w] == want, (w, got[w], want)


def test_bpe_segment_col_applies_rules_in_order(spark):
    from pyspark.sql import functions as F

    docs = _texts_df(spark, ["low lower ab abab"])
    merges = [("l", "o"), ("lo", "w"), ("a", "b")]
    r = docs.select(
        corpus.bpe_segment_col(F.col("text"), merges).alias("toks")
    ).collect()[0]
    assert list(r.toks) == ["low", "low", "e", "r", "ab", "ab", "ab"]


def test_sliding_windows_shapes(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),  # 5 tokens
            Row(doc_id=2, text=""),  # empty: no rows
            Row(doc_id=3, text="x y z w"),  # exact tiling at size=2
        ]
    )
    got = {
        (r.doc_id, r.win_idx): (r.start_tok, r.n_win_tokens, r.text_win)
        for r in corpus.sliding_windows(docs, size=4, stride=2).collect()
    }
    assert got == {
        (1, 0): (0, 4, "a b c d"),
        (1, 1): (2, 3, "c d e"),  # final partial window kept
        (1, 2): (4, 1, "e"),
        (3, 0): (0, 4, "x y z w"),
        (3, 1): (2, 2, "z w"),
    }
    # stride == size tiles with no overlap
    tiled = corpus.sliding_windows(docs, size=2, stride=2)
    assert [
        (r.win_idx, r.text_win)
        for r in tiled.filter(F.col("doc_id") == 3)
        .orderBy("win_idx")
        .collect()
    ] == [(0, "x y"), (1, "z w")]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="size must be positive"):
        corpus.sliding_windows(docs, size=0)
    with _pytest.raises(ValueError, match="stride must be positive"):
        corpus.sliding_windows(docs, stride=0)


def test_weighted_sample_exact_proportion_and_edges(spark):
    from pyspark.sql import Row

    n = 2000
    docs = spark.createDataFrame([Row(doc_id=i, w=1) for i in range(n)])

    def py_keep(i, num, den):
        h = (i * corpus.SAMPLE_MULT + corpus.SAMPLE_INC) % corpus.SAMPLE_MOD
        return h * den < num * corpus.SAMPLE_MOD

    for num, den in [(1, 4), (3, 4), (499, 1000)]:
        got = {
            r.doc_id
            for r in corpus.weighted_sample(
                docs, F.lit(num), F.lit(den)
            ).collect()
        }
        want = {i for i in range(n) if py_keep(i, num, den)}
        assert got == want, (num, den)
        # the LCG key is uniform: kept fraction tracks the ratio
        assert abs(len(got) / n - num / den) < 0.05

    # per-ROW ratios: rows with num=0 never kept, num=den always kept
    mixed = spark.createDataFrame(
        [Row(doc_id=i, num=(0 if i % 2 else 7), den=7) for i in range(100)]
    )
    kept = {
        r.doc_id
        for r in corpus.weighted_sample(
            mixed, F.col("num"), F.col("den")
        ).collect()
    }
    assert kept == {i for i in range(100) if i % 2 == 0}

    import pytest as _pytest

    bad = spark.createDataFrame([Row(doc_id=1, num=5, den=4)])
    with _pytest.raises(Exception, match="0 <= num <= den"):
        corpus.weighted_sample(bad, F.col("num"), F.col("den")).collect()


def test_profile_table_stats_and_validation(spark):
    from pyspark.sql import Row

    from tax_compliance_engine_spark.operators import profiling

    df = spark.createDataFrame(
        [
            Row(id=1, s="b", v=None),
            Row(id=2, s=None, v=10),
            Row(id=3, s="a", v=10),
        ],
        "id long, s string, v long",
    )
    got = {
        r.column: (r.n_rows, r.n_nonnull, r.n_distinct, r.min_val, r.max_val)
        for r in profiling.profile_table(df).collect()
    }
    assert got == {
        "id": (3, 3, 3, "1", "3"),
        "s": (3, 2, 2, "a", "b"),
        "v": (3, 2, 1, "10", "10"),
    }
    # min/max in NATIVE order, cast after: 9 < 10 numerically
    wide = spark.createDataFrame([Row(v=9), Row(v=10)])
    row = profiling.profile_table(wide).collect()[0]
    assert (row.min_val, row.max_val) == ("9", "10")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no such columns"):
        profiling.profile_table(df, ["nope"])
    with _pytest.raises(ValueError, match="at least one column"):
        profiling.profile_table(df, [])


def test_cooccurrence_counts_and_lift(spark):
    """Pair counts over distinct per-doc tokens, vocabulary restriction
    honored, lift = n*c_ab/(c_a*c_b) exactly."""
    docs = docs_df(
        spark,
        [
            (0, "apple banana", "s"),
            (1, "apple banana cherry", "s"),
            (2, "apple cherry", "s"),
            (3, "banana banana", "s"),  # distinct: counts once
            (4, "rare1 rare2", "s"),
        ],
    )
    got = {
        (r.token1, r.token2): r
        for r in corpus.cooccurrence(
            docs, vocab_k=3, min_pair_count=1
        ).collect()
    }
    # top-3 vocab: apple(3), banana(3), cherry(2) — rare1/rare2 excluded
    assert set(got) == {
        ("apple", "banana"),
        ("apple", "cherry"),
        ("banana", "cherry"),
    }
    ab = got[("apple", "banana")]
    assert (ab.pair_count, ab.count1, ab.count2) == (2, 3, 3)
    assert ab.lift == (5 * 2) / (3 * 3)
    ac = got[("apple", "cherry")]
    assert (ac.pair_count, ac.count1, ac.count2) == (2, 3, 2)
    assert ac.lift == (5 * 2) / (3 * 2)  # > 1: positively associated


def test_leakage_safe_split_moves_clusters_whole(spark):
    """The leakage guarantee: every member of a near-dup cluster lands
    in the SAME split (no pair straddles an eval boundary), singletons
    are their own cluster, and labels re-derive from the LCG key of the
    cluster id exactly."""
    from tax_compliance_engine_spark.operators import corpus as corpus_mod

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # clusters: {0..4} chained, {10,11}, everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
        "doc1 long, doc2 long",
    )
    got = corpus_mod.leakage_safe_split(docs, pairs).collect()
    by_doc = {r.doc_id: r for r in got}
    assert len(got) == 200
    # cluster members share cluster id AND split
    assert {by_doc[i].cluster_id for i in range(5)} == {0}
    assert len({by_doc[i].split for i in range(5)}) == 1
    assert by_doc[10].split == by_doc[11].split
    assert by_doc[10].cluster_id == 10 and by_doc[11].cluster_id == 10
    # label = split_assign of the cluster id, member-wise
    want = {
        r.doc_id: r.split
        for r in corpus_mod.split_assign(
            spark.createDataFrame(
                [(by_doc[i].cluster_id,) for i in range(200)],
                "doc_id long",
            )
        ).collect()
    }
    # (split_assign keyed by cluster id values; compare per cluster id)
    for i in range(200):
        assert by_doc[i].split == want[by_doc[i].cluster_id]
    # all three labels appear over 200 mostly-singleton clusters
    assert {r.split for r in got} == {"train", "val", "test"}


def test_leakage_safe_split_clusters_passthrough(spark):
    """Pipelines that already ran dup_clusters pass the frame in via
    ``clusters=`` and must get the IDENTICAL split table (no second
    contraction); passing both or neither of pairs/clusters raises."""
    import pytest

    from tax_compliance_engine_spark.operators import corpus as corpus_mod
    from tax_compliance_engine_spark.operators import dedup

    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 8)], "doc1 long, doc2 long"
    )
    clusters = dedup.dup_clusters(docs, pairs)
    via_pairs = sorted(
        map(tuple, corpus_mod.leakage_safe_split(docs, pairs).collect())
    )
    via_clusters = sorted(
        map(
            tuple,
            corpus_mod.leakage_safe_split(docs, clusters=clusters).collect(),
        )
    )
    assert via_pairs == via_clusters
    with pytest.raises(ValueError):
        corpus_mod.leakage_safe_split(docs, pairs, clusters=clusters)
    with pytest.raises(ValueError):
        corpus_mod.leakage_safe_split(docs)
