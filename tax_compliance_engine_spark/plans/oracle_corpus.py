"""DuckDB oracle SQL for the corpus-level training-data operators
(operators/corpus.py).

Portability notes:
- sampling keys are pure integer arithmetic (fixed LCG) — bit-exact;
- TF-IDF ranking computes tf·ln(N/df) in both engines, but the emitted
  columns are INTEGERS only (tf, df, rank): JVM Math.log and C libm may
  disagree by 1 ULP, which can never reorder distinct (tf, df) scores but
  could fail a bit-exact float hash;
- packing / vocabulary / decontamination are integer/string-only.
"""

from __future__ import annotations

from ..operators import corpus
from .oracle_dataops import TOKENS

# operands pre-reduced mod SAMPLE_MOD (same values, no int64 overflow
# at large doc_id — mirrors operators/corpus.sample_hash_col)
_HASH = (
    f"((doc_id % {corpus.SAMPLE_MOD}) * {corpus.SAMPLE_MULT % corpus.SAMPLE_MOD}"
    f" + {corpus.SAMPLE_INC}) % {corpus.SAMPLE_MOD}"
)


def corpus_vocab_top_sql(k: int = 100) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, unnest({TOKENS}) AS token FROM documents),
per_doc AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token)
SELECT token, CAST(SUM(tf) AS BIGINT) AS term_count, COUNT(*) AS doc_freq
FROM per_doc GROUP BY token
ORDER BY term_count DESC, token LIMIT {k}"""


def corpus_inverted_index_sql(n_shards: int = 4) -> str:
    """Twin of corpus.inverted_index: same (token, doc_id%n_shards)
    grouping, ordered struct postings, broadcast-shaped global df —
    integers and strings only, struct field names/widths matched to the
    Spark side so the canonicalized cells compare byte-equal."""
    return f"""WITH toks AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, t[u.i] AS token
  FROM (SELECT doc_id, {TOKENS} AS t FROM documents),
       unnest(range(1, len(t) + 1)) AS u(i)),
per_shard AS (
  SELECT token, CAST(doc_id % {n_shards} AS INTEGER) AS shard,
         list({{'doc_id': doc_id, 'pos': pos}}
              ORDER BY doc_id, pos) AS postings,
         COUNT(DISTINCT doc_id) AS shard_df
  FROM toks GROUP BY token, doc_id % {n_shards}),
gdf AS (
  SELECT token, CAST(SUM(shard_df) AS BIGINT) AS df
  FROM per_shard GROUP BY token)
SELECT p.token, p.shard, p.postings,
       CAST(p.shard_df AS BIGINT) AS shard_df, g.df
FROM per_shard p JOIN gdf g ON g.token = p.token"""


def corpus_phrase_search_sql(phrase: str = "spark window") -> str:
    """Twin of corpus.phrase_search: the same row-local windowed
    all-terms conjunction over the token list."""
    terms = [t.replace("'", "''") for t in phrase.split(" ") if t]
    k = len(terms)
    conj = " AND ".join(
        f"t[i + {j}] = '{term}'" for j, term in enumerate(terms)
    )
    # range() is end-EXCLUSIVE: starts 1 .. len-k+1 need range(1, len-k+2)
    return f"""SELECT doc_id,
  CAST(len(list_filter(range(1, len(t) - {k} + 2),
                       i -> {conj})) AS INTEGER) AS n_matches
FROM (SELECT doc_id, {TOKENS} AS t FROM documents)
WHERE len(t) >= {k}
  AND len(list_filter(range(1, len(t) - {k} + 2), i -> {conj})) > 0"""


def doc_oov_rates_sql(k: int = 100) -> str:
    """Twin of corpus.oov_rates: identical top-k vocabulary (term count
    DESC, token tie-break), left-join marker, one per-doc aggregation,
    exactly-rounded division."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest({TOKENS}) AS token FROM documents),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS tc FROM toks GROUP BY token
    ORDER BY tc DESC, token LIMIT {k})),
counts AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(c.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN COALESCE(c.n_tokens, 0) > 0
            THEN CAST(c.n_oov AS DOUBLE) / CAST(c.n_tokens AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS oov_rate
FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id"""


def doc_tfidf_top_terms_sql(k: int = 3) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, unnest({TOKENS}) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n),
ranked AS (
  SELECT doc_id, token, tf, df,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, token) AS INTEGER) AS rank
  FROM scored)
SELECT doc_id, token, tf, df, rank FROM ranked WHERE rank <= {k}"""


def corpus_sample_sql(rate: float = 0.25) -> str:
    threshold = int(rate * corpus.SAMPLE_MOD)
    return f"""SELECT doc_id, source, lang FROM documents
WHERE {_HASH} < {threshold}"""


def corpus_stratified_sample_sql(per_stratum: int = 10) -> str:
    return f"""WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_HASH}, doc_id) AS rn
  FROM documents)
SELECT doc_id, source FROM ranked WHERE rn <= {per_stratum}"""


def corpus_shuffle_shards_sql(n_shards: int = 8) -> str:
    """Twin of queries_dataops.corpus_shuffle_shards: one global
    row_number over (LCG hash, doc_id) — DuckDB sorts globally; the
    Spark side's two-level sharded rank equals it by construction —
    and the same round-robin shard arithmetic."""
    return f"""SELECT doc_id,
  CAST(row_number() OVER (ORDER BY {_HASH}, doc_id) AS BIGINT)
    AS shuffle_rank,
  CAST((row_number() OVER (ORDER BY {_HASH}, doc_id) - 1) % {n_shards}
       AS INTEGER) AS train_shard
FROM documents"""


def corpus_budget_sample_sql(budget: int = 137) -> str:
    """Twin of queries_dataops.corpus_budget_sample: the same exact
    integer largest-remainder allocation (base = (B·n) // N, leftover
    seats to the largest (rem, source ASC) remainders via a non-equi
    self-join rank) and the same LCG-hash per-stratum fill order."""
    return f"""WITH c AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
q AS (
  -- tot, not "N": SQL identifiers are case-insensitive, so N would
  -- shadow/collide with the per-stratum n
  SELECT source, n,
         (CAST({budget} AS BIGINT) * n) // tot AS base,
         (CAST({budget} AS BIGINT) * n) % tot AS rem
  FROM c CROSS JOIN t),
l AS (SELECT CAST({budget} AS BIGINT) - SUM(base) AS leftover FROM q),
r AS (
  SELECT a.source, a.base, count(b.source) AS ahead
  FROM q a LEFT JOIN q b
    ON (b.rem > a.rem) OR (b.rem = a.rem AND b.source < a.source)
  GROUP BY a.source, a.base),
quota AS (
  SELECT r.source,
         base + CASE WHEN ahead < l.leftover THEN 1 ELSE 0 END
           AS stratum_quota
  FROM r CROSS JOIN l),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_HASH}, doc_id) AS rn
  FROM documents)
SELECT ranked.doc_id, ranked.source, quota.stratum_quota
FROM ranked JOIN quota USING (source)
WHERE rn <= stratum_quota"""


def corpus_samples_sql(rate: float = 0.25, per_stratum: int = 10) -> str:
    """Twin of queries_dataops.corpus_samples: plain LCG rate sample and
    per-stratum quota sample, marker-tagged (both arms carry lang)."""
    threshold = int(rate * corpus.SAMPLE_MOD)
    return f"""SELECT 'plain' AS method, doc_id, source, lang FROM documents
WHERE {_HASH} < {threshold}
UNION ALL
SELECT 'stratified' AS method, doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_HASH}, doc_id) AS rn
  FROM documents)
WHERE rn <= {per_stratum}"""


def corpus_mixture_sql(
    weights: dict[str, float] | None = None, default_rate: float = 0.25
) -> str:
    weights = weights or {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    arms = " ".join(
        f"WHEN source = '{s}' THEN {float(r)}"
        for s, r in sorted(weights.items())
    )
    return f"""SELECT doc_id, source, lang FROM documents
WHERE CAST({_HASH} AS DOUBLE) <
      (CASE {arms} ELSE {float(default_rate)} END) * {float(corpus.SAMPLE_MOD)}"""


def corpus_clean_pipeline_sql(
    min_quality: float = 0.73,
    budgets: dict[str, float] | None = None,
    token_budget: int = 512,
) -> str:
    """Twin of queries_dataops.corpus_clean_pipeline: the four stages
    (quality ≥ τ → exact-dedup canonical keep → token-budget mixture →
    pack) chained over the same intermediate sets, each stage reading
    the previous CTE.  Reuses doc_quality_sql() verbatim for the score
    so the filter can never drift from the standalone quality gate."""
    from .oracle_dataops import doc_quality_sql

    budgets = budgets or {"src0": 500.0, "src2": 200.0}
    arms = " ".join(
        f"WHEN source = '{s}' THEN {float(b)}"
        for s, b in sorted(budgets.items())
    )
    return f"""WITH q AS ({doc_quality_sql()}),
kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id)
  WHERE q.quality_score >= {min_quality}),
canon AS (
  SELECT * FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS _canonical
    FROM kept) t
  WHERE doc_id = _canonical),
totals AS (
  SELECT source, SUM(COALESCE(len({TOKENS}), 0)) AS total_toks FROM canon GROUP BY source),
rates AS (
  SELECT source,
    CASE WHEN (CASE {arms} ELSE NULL END) IS NULL OR total_toks = 0
         THEN 1.0
         ELSE LEAST(1.0, (CASE {arms} END) / CAST(total_toks AS DOUBLE))
    END AS rate
  FROM totals),
mixed AS (
  SELECT c.* FROM canon c LEFT JOIN rates r USING (source)
  WHERE CAST({_HASH} AS DOUBLE)
        < COALESCE(r.rate, 1.0) * {float(corpus.SAMPLE_MOD)}),
sized AS (
  SELECT doc_id, len({TOKENS}) AS n_tokens FROM mixed),
summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS end_offset
  FROM sized)
SELECT doc_id, n_tokens,
       CAST((end_offset - n_tokens) // {token_budget} AS BIGINT) AS bin_id
FROM summed"""


def corpus_heavy_hitters_sql(min_count: int = 100) -> str:
    """Twin of corpus.heavy_hitters: the two-phase count-min + exact
    verify result is exact by construction, so the oracle is the plain
    threshold aggregation — sketch parameters never affect the rows."""
    return f"""WITH toks AS (
  SELECT unnest({TOKENS}) AS token FROM documents)
SELECT token, count(*) AS term_count
FROM toks GROUP BY token HAVING count(*) >= {min_count}"""


def corpus_token_mixture_sql(budgets: dict[str, float] | None = None) -> str:
    """Twin of corpus.token_budget_mixture: per-source keep rate
    min(1, budget / total_tokens) derived from the same token totals,
    same LCG keep rule.  The single double division is exactly rounded
    in both engines, so the rate (and thus the kept set) is bit-exact."""
    budgets = budgets or {"src0": 500.0, "src1": 5000.0, "src2": 200.0}
    arms = " ".join(
        f"WHEN source = '{s}' THEN {float(b)}"
        for s, b in sorted(budgets.items())
    )
    return f"""WITH totals AS (
  SELECT source, SUM(COALESCE(len({TOKENS}), 0)) AS total_toks
  FROM documents GROUP BY source),
rates AS (
  SELECT source,
    CASE WHEN (CASE {arms} ELSE NULL END) IS NULL OR total_toks = 0
         THEN 1.0
         ELSE LEAST(1.0,
                    (CASE {arms} END) / CAST(total_toks AS DOUBLE))
    END AS rate
  FROM totals)
SELECT d.doc_id, d.source, d.lang
FROM documents d LEFT JOIN rates r USING (source)
WHERE CAST({_HASH} AS DOUBLE)
      < COALESCE(r.rate, 1.0) * {float(corpus.SAMPLE_MOD)}"""


def corpus_pack_bins_sql(token_budget: int = 2048) -> str:
    return f"""WITH sized AS (
  SELECT doc_id, len({TOKENS}) AS n_tokens FROM documents),
summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS end_offset
  FROM sized)
SELECT doc_id, n_tokens,
       CAST((end_offset - n_tokens) // {token_budget} AS BIGINT) AS bin_id
FROM summed"""


def corpus_pack_bpe_sql(
    token_budget: int = 2048, n_merges: int = 6
) -> str:
    """Twin of queries_dataops.corpus_pack_bpe: the train+segment
    composition (``doc_bpe_token_counts_sql`` as a nested CTE) feeding
    the same global-window packing form, over n_subwords."""
    return f"""WITH counts AS (
{doc_bpe_token_counts_sql(n_merges)}
),
sized AS (
  SELECT doc_id, CAST(n_subwords AS BIGINT) AS n_tokens FROM counts),
summed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS end_offset
  FROM sized)
SELECT doc_id, n_tokens,
       CAST((end_offset - n_tokens) // {token_budget} AS BIGINT) AS bin_id
FROM summed"""


def corpus_decontaminate_sql(n: int = 5, bench_mod: int = 97) -> str:
    return f"""WITH toks AS (
  SELECT doc_id, {TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(0, len(t) - {n} + 1),
                   i -> array_to_string(list_slice(t, i + 1, i + {n}), ' '))
  )) AS gram
  FROM toks WHERE len(t) >= {n}),
bench_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {bench_mod} = 0),
contaminated AS (
  SELECT DISTINCT g.doc_id FROM grams g
  JOIN bench_grams b USING (gram)
  WHERE g.doc_id % {bench_mod} <> 0)
SELECT doc_id FROM documents
WHERE doc_id % {bench_mod} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)"""


def corpus_split_assign_sql(
    fractions: list[tuple[str, float]] | None = None,
) -> str:
    """Twin of corpus.split_assign: the identical LCG key and integer
    cumulative thresholds as a literal CASE chain."""
    if fractions is None:
        fractions = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    cuts, cum = [], 0.0
    for label, frac in fractions:
        cum += frac
        cuts.append((label.replace("'", "''"), int(cum * corpus.SAMPLE_MOD)))
    if len(cuts) == 1:  # CASE with zero WHENs is a parse error
        return f"SELECT doc_id, '{cuts[0][0]}' AS split FROM documents"
    whens = "\n       ".join(
        f"WHEN {_HASH} < {cut} THEN '{label}'" for label, cut in cuts[:-1]
    )
    return f"""SELECT doc_id,
  CASE {whens}
       ELSE '{cuts[-1][0]}' END AS split
FROM documents"""


def corpus_chunk_dedup_sql(chunk_tokens: int = 10) -> str:
    """Twin of corpus.chunk_dedup: consecutive ``chunk_tokens``-token
    chunks, global first-occurrence election by (doc_id, chunk_idx)
    window rank, ordered string_agg reassembly — strings and integers
    only, bit-exact."""
    c = int(chunk_tokens)
    return f"""WITH toks AS (
  SELECT doc_id, {TOKENS} AS t FROM documents),
chunks AS (
  SELECT doc_id, u.i - 1 AS chunk_idx,
         array_to_string(
           list_slice(t, (u.i - 1) * {c} + 1, (u.i - 1) * {c} + {c}), ' '
         ) AS chunk
  FROM toks, unnest(range(1, (len(t) + {c} - 1) // {c} + 1)) AS u(i)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks),
kept AS (SELECT doc_id, chunk_idx, chunk FROM ranked WHERE rn = 1),
agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_deduped
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(tot.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(agg.text_deduped, '') AS text_deduped
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN agg ON agg.doc_id = d.doc_id"""


def corpus_contamination_scores_sql(
    n: int = 5, threshold_pct: int = 20, bench_mod: int = 97
) -> str:
    """Twin of corpus.contamination_scores over the doc_id%97 split:
    distinct per-doc shingles marked against the benchmark gram set,
    one (total, hit) aggregation, exact-integer flag arithmetic and a
    single int÷int double division — bit-exact on both engines."""
    return f"""WITH toks AS (
  SELECT doc_id, {TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(0, len(t) - {n} + 1),
                   i -> array_to_string(list_slice(t, i + 1, i + {n}), ' '))
  )) AS gram
  FROM toks WHERE len(t) >= {n}),
bench_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {bench_mod} = 0),
counts AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM grams g LEFT JOIN bench_grams b ON g.gram = b.gram
  WHERE g.doc_id % {bench_mod} <> 0
  GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(c.n_hit, 0) AS BIGINT) AS n_hit,
       CASE WHEN COALESCE(c.n_grams, 0) > 0
            THEN CAST(c.n_hit AS DOUBLE) / CAST(c.n_grams AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS overlap,
       (COALESCE(c.n_grams, 0) > 0
        AND COALESCE(c.n_hit, 0) * 100 >= {threshold_pct} * c.n_grams)
       AS is_contaminated
FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id
WHERE d.doc_id % {bench_mod} <> 0"""


def corpus_distinct_sketch_sql(k: int = 64) -> str:
    """Twin of corpus.distinct_sketch: identical k-minimum-values over the
    same portable token hash — DISTINCT (source, hash), rank, keep k,
    then the (k−1)·M/h_k estimator.  (k−1)·M is exactly representable in
    a double and the division is a single exactly-rounded op, so the
    estimate hash-compares bit-for-bit."""
    from ..functions import hashing
    from .oracle_dataops import TOK_HASH

    th = TOK_HASH.format(t="tok")
    scramble = (
        f"(({th}) * {corpus.KMV_SCRAMBLE_A} + {corpus.KMV_SCRAMBLE_B})"
        f" % {hashing.HASH_MOD}"
    )
    return f"""WITH doc_toks AS (
  SELECT source, unnest({TOKENS}) AS tok FROM documents),
hashes AS (
  SELECT DISTINCT source, {scramble} AS h FROM doc_toks),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM hashes),
topk AS (SELECT source, h FROM ranked WHERE rn <= {k})
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
  MAX(h) AS kth_hash,
  CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
       ELSE CAST({(k - 1) * hashing.HASH_MOD} AS DOUBLE)
            / CAST(MAX(h) AS DOUBLE) END AS est_distinct
FROM topk GROUP BY source"""


def _bpe_train_ctes(n_merges: int) -> str:
    """The shared BPE-training CTE chain (w0 … w{n}, b1 … b{n}): pair
    counts weighted by word frequency, top-1 rule per step under the
    (count DESC, left, right) tie-break, and the greedy left-to-right
    merge scan as gaps-and-islands windows — within each maximal run of
    consecutive matching positions alternate positions merge (exactly
    the skip-scan), positions whose predecessor merged are consumed, and
    the word's symbol list is rebuilt in position order."""
    its = []
    prev = "w0"
    for k in range(1, n_merges + 1):
        its.append(f"""p{k} AS (
  SELECT l, r, CAST(SUM(wcount) AS BIGINT) AS cnt FROM (
    SELECT syms[i] AS l, syms[i + 1] AS r, wcount
    FROM {prev}, unnest(range(1, len(syms))) AS u(i))
  GROUP BY l, r),
b{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
pos{k} AS (
  SELECT t.w, t.wcount, u.i, t.syms[u.i] AS s, b.l AS bl, b.r AS br,
         CASE WHEN u.i < len(t.syms) AND t.syms[u.i] = b.l
                   AND t.syms[u.i + 1] = b.r
              THEN 1 ELSE 0 END AS m
  FROM {prev} t CROSS JOIN b{k} b, unnest(range(1, len(t.syms) + 1)) AS u(i)),
isl{k} AS (
  SELECT *, CASE WHEN m = 1
    THEN i - ROW_NUMBER() OVER (PARTITION BY w, m ORDER BY i) END AS isl
  FROM pos{k}),
mrk{k} AS (
  SELECT *, CASE WHEN m = 1
    AND (i - MIN(i) OVER (PARTITION BY w, isl)) % 2 = 0
    THEN 1 ELSE 0 END AS mg
  FROM isl{k}),
emit{k} AS (
  SELECT *, LAG(mg, 1, 0) OVER (PARTITION BY w ORDER BY i) AS prev_mg
  FROM mrk{k}),
w{k} AS (
  SELECT w, wcount,
         list(CASE WHEN mg = 1 THEN bl || br ELSE s END ORDER BY i) AS syms
  FROM emit{k} WHERE prev_mg = 0
  GROUP BY w, wcount)""")
        prev = f"w{k}"
    its_sql = ",\n".join(its)
    return f"""toks AS (
  SELECT unnest({TOKENS}) AS tok FROM documents),
w0 AS (
  SELECT tok AS w,
         list_transform(range(1, length(tok) + 1),
                        i -> substr(tok, i, 1)) AS syms,
         COUNT(*) AS wcount
  FROM toks GROUP BY tok),
{its_sql}"""


def corpus_bpe_merges_sql(n_merges: int = 6) -> str:
    """Twin of corpus.bpe_merges: the same greedy BPE training unrolled
    (see ``_bpe_train_ctes``).  Integer counts and string symbols only,
    so the rule table hash-compares bit-for-bit."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, l, r, cnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"""WITH {_bpe_train_ctes(n_merges)}
SELECT CAST(step AS INTEGER) AS step, l AS left_sym, r AS right_sym,
       l || r AS merged, cnt AS pair_count
FROM ({unions})"""


def doc_bpe_token_counts_sql(n_merges: int = 6) -> str:
    """Twin of queries_dataops.doc_bpe_token_counts: the END-TO-END
    tokenizer pipeline — train the merge rules on the corpus
    (``_bpe_train_ctes``), then SEGMENT every document's words with the
    learned rules, applied in step order through the same
    gaps-and-islands greedy scan at (doc, word-index) granularity.
    Output: per-doc whitespace word count and post-merge subword count —
    integers, so train+apply composition sits under one hash gate."""
    its = []
    prev = "dw0"
    for k in range(1, n_merges + 1):
        its.append(f"""dpos{k} AS (
  SELECT t.doc_id, t.widx, u.i, t.syms[u.i] AS s, b.l AS bl, b.r AS br,
         CASE WHEN u.i < len(t.syms) AND t.syms[u.i] = b.l
                   AND t.syms[u.i + 1] = b.r
              THEN 1 ELSE 0 END AS m
  FROM {prev} t
  -- MAX() subquery, not a bare CROSS JOIN: an empty b{{k}} (degenerate
  -- corpus out of pairs) must be an identity merge over every doc, not
  -- erase the doc rows — mirrors the Spark side's 1-row NULL aggregate
  CROSS JOIN (SELECT MAX(l) AS l, MAX(r) AS r FROM b{k}) b,
       unnest(range(1, len(t.syms) + 1)) AS u(i)),
disl{k} AS (
  SELECT *, CASE WHEN m = 1
    THEN i - ROW_NUMBER() OVER (PARTITION BY doc_id, widx, m ORDER BY i) END AS isl
  FROM dpos{k}),
dmrk{k} AS (
  SELECT *, CASE WHEN m = 1
    AND (i - MIN(i) OVER (PARTITION BY doc_id, widx, isl)) % 2 = 0
    THEN 1 ELSE 0 END AS mg
  FROM disl{k}),
demit{k} AS (
  SELECT *, LAG(mg, 1, 0) OVER (PARTITION BY doc_id, widx ORDER BY i) AS prev_mg
  FROM dmrk{k}),
dw{k} AS (
  SELECT doc_id, widx,
         list(CASE WHEN mg = 1 THEN bl || br ELSE s END ORDER BY i) AS syms
  FROM demit{k} WHERE prev_mg = 0
  GROUP BY doc_id, widx)""")
        prev = f"dw{k}"
    its_sql = ",\n".join(its)
    return f"""WITH {_bpe_train_ctes(n_merges)},
dwords AS (
  SELECT doc_id, u.i AS widx, tks[u.i] AS tok
  FROM (SELECT doc_id, {TOKENS} AS tks FROM documents),
       unnest(range(1, len(tks) + 1)) AS u(i)),
dw0 AS (
  SELECT doc_id, widx,
         list_transform(range(1, length(tok) + 1),
                        i -> substr(tok, i, 1)) AS syms
  FROM dwords),
{its_sql},
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_words,
         CAST(SUM(len(syms)) AS INTEGER) AS n_subwords
  FROM {prev} GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_words, 0) AS n_words,
       COALESCE(a.n_subwords, 0) AS n_subwords
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"""


# Twin of queries_dataops._cdc_changes: the derived upsert/delete feed
# (generation 1 upserts %5, generation 2 deletes %10 and upserts %15 —
# %30 keys carry the equal-seq delete/upsert conflict).
_CDC_CHANGES = """changes AS (
  SELECT doc_id, 'upsert' AS op, 1 AS seq,
         'v1 ' || text AS text, lang, 'cdc-update' AS source,
         CAST(length('v1 ' || text) AS BIGINT) AS n_chars
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 'delete', 2, NULL, NULL, NULL, NULL
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, 'upsert', 2, 'v2 ' || text, lang, 'cdc-update',
         CAST(length('v2 ' || text) AS BIGINT)
  FROM documents WHERE doc_id % 15 = 0)"""


def corpus_apply_changes_sql() -> str:
    """Twin of cdc.apply_changes over the derived feed: resolution is a
    per-key row_number over (seq DESC, delete-outranks-upsert DESC) —
    the window form of the Spark side's map-side-combinable struct-max
    (identical election because (key, seq, op) triples are unique in
    the feed); merge = anti-join survivors UNION winning upserts."""
    return f"""WITH {_CDC_CHANGES},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY seq DESC,
             CASE op WHEN 'delete' THEN 1 ELSE 0 END DESC) AS rn
  FROM changes),
resolved AS (SELECT * FROM ranked WHERE rn = 1)
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM resolved)
UNION ALL
SELECT doc_id, text, lang, source, n_chars
FROM resolved WHERE op = 'upsert'"""


def corpus_incremental_rollup_sql() -> str:
    """Twin of cdc.incremental_rollup over the derived feed: the FULL
    RECOMPUTE — rollup of the post-change corpus — which the Spark
    side must reproduce from the delta alone (that equivalence is the
    operator's whole claim)."""
    return f"""WITH {_CDC_CHANGES},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id
    ORDER BY seq DESC,
             CASE op WHEN 'delete' THEN 1 ELSE 0 END DESC) AS rn
  FROM changes),
resolved AS (SELECT * FROM ranked WHERE rn = 1),
post AS (
  SELECT d.source, d.n_chars
  FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM resolved)
  UNION ALL
  SELECT source, n_chars FROM resolved WHERE op = 'upsert')
SELECT source, count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM post
GROUP BY source
ORDER BY source"""


def corpus_k_anonymity_sql(k: int = 10) -> str:
    """Twin of profiling.k_anonymity_audit + suppress_small_groups over
    the (lang, source, exact length decile) QI key: group counts, the
    ≥k flag, and the survivor count (= group_size where compliant, 0
    where suppressed)."""
    return f"""WITH qi AS (
  SELECT lang, source,
         LEAST(CAST(n_chars AS BIGINT) // 100, CAST(9 AS BIGINT))
           AS len_bucket
  FROM documents)
SELECT lang, source, len_bucket,
       count(*) AS group_size,
       count(*) >= {k} AS is_k_anonymous,
       CASE WHEN count(*) >= {k} THEN count(*)
            ELSE CAST(0 AS BIGINT) END AS n_kept
FROM qi
GROUP BY lang, source, len_bucket
ORDER BY lang, source, len_bucket"""


def corpus_pit_versions_sql() -> str:
    """Twin of cdc.pit_lookup: ordered-LATERAL best-version-at-seq per
    probe (the asof-twin convention), same delete-outranks-upsert
    tiebreak; no-match and delete probes report is_live = false."""
    return f"""WITH {_CDC_CHANGES},
probes AS (
  SELECT doc_id, a.as_of_seq
  FROM documents, (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) a(as_of_seq)
  WHERE doc_id % 3 = 0)
SELECT p.doc_id, p.as_of_seq,
       COALESCE(best.op = 'upsert', FALSE) AS is_live,
       CASE WHEN best.op = 'upsert' THEN best.text END AS text
FROM probes p
LEFT JOIN LATERAL (
  SELECT c.op, c.text
  FROM changes c
  WHERE c.doc_id = p.doc_id AND c.seq <= p.as_of_seq
  ORDER BY c.seq DESC,
           CASE c.op WHEN 'delete' THEN 1 ELSE 0 END DESC
  LIMIT 1) best ON TRUE
ORDER BY doc_id, as_of_seq"""


def corpus_change_history_sql() -> str:
    """Twin of cdc.change_history: LEAD(seq) per key over the same
    (seq, op-rank) order; NULL lead = still-current chain head."""
    return f"""WITH {_CDC_CHANGES}
SELECT doc_id, seq, op,
       LEAD(seq) OVER w AS valid_to_seq,
       LEAD(seq) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY doc_id
             ORDER BY seq, CASE op WHEN 'delete' THEN 1 ELSE 0 END)"""


def events_zorder_keys_sql() -> str:
    """Twin of queries_dataops.events_zorder_keys: the identical 5-step
    binary-magic-number bit spread (masks imported from
    functions/zorder.py so the two sides cannot drift), interleaved
    x-even / y-odd."""
    from ..functions import zorder

    ctes = ["""xy AS (
  SELECT event_id, CAST(user_id AS BIGINT) AS x,
         CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
              AS BIGINT) AS y
  FROM events)"""]
    prev = "xy"
    for i, (shift, mask) in enumerate(zorder._SPREAD_STEPS):
        ctes.append(
            f"""s{i} AS (
  SELECT event_id,
         (x | (x << {shift})) & {mask} AS x,
         (y | (y << {shift})) & {mask} AS y
  FROM {prev})"""
        )
        prev = f"s{i}"
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT event_id, x | (y << 1) AS z FROM {prev}"""


def events_top_users_sql() -> str:
    """Twin of queries_dataops.events_top_users: the single-level window
    rank (the two-level shard decomposition is provably
    value-identical)."""
    return """WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS n_events
  FROM events GROUP BY event_type, user_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type
    ORDER BY n_events DESC, user_id) AS rn
  FROM counts)
SELECT event_type, user_id, n_events FROM ranked WHERE rn <= 3"""


def corpus_sliding_windows_sql(size: int = 32, stride: int = 16) -> str:
    """Twin of corpus.sliding_windows: lateral range(0, len, stride)
    starts, 1-based list_slice windows, win_idx = start/stride (starts
    are exact multiples)."""
    return f"""WITH toks AS (
  SELECT doc_id, {TOKENS} AS t FROM documents),
wins AS (
  SELECT doc_id,
         CAST(u.s / {stride} AS INTEGER) AS win_idx,
         CAST(u.s AS INTEGER) AS start_tok,
         list_slice(t, u.s + 1, u.s + {size}) AS w
  FROM toks, unnest(range(0, len(t), {stride})) AS u(s))
SELECT doc_id, win_idx, start_tok,
       CAST(len(w) AS INTEGER) AS n_win_tokens,
       array_to_string(w, ' ') AS text_win
FROM wins"""


def corpus_weighted_sample_sql() -> str:
    """Twin of queries_dataops.corpus_weighted_sample: the identical
    integer cross-multiplication keep rule on the shared LCG key."""
    return f"""SELECT doc_id FROM documents
WHERE ({_HASH}) * 1000 < LEAST(n_chars, 500) * {corpus.SAMPLE_MOD}"""


def corpus_profile_sql(cols: list[str] | None = None) -> str:
    """Twin of queries_dataops.corpus_profile: per-column UNION ALL of
    the same exact aggregates (min/max in native order, cast after)."""
    cols = cols or ["doc_id", "lang", "source", "n_chars"]
    parts = [
        f"""SELECT '{c}' AS column,
       COUNT(*) AS n_rows,
       COUNT({c}) AS n_nonnull,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM documents"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def multimodal_phash_pairs_sql() -> str:
    """Twin of queries_dataops.multimodal_phash_pairs: the same synthetic
    62-bit hashes, an 8-band equi-join restricted to the lowest shared
    band, and the exact hamming filter via bit_count(xor) — an
    independent SQL implementation of the banding machinery."""
    bands = 8
    width = 64 // bands
    shared_lower = " AND ".join(
        f"(a.band <= {j} OR (a.phash >> {j * width}) & 255 "
        f"<> (b.phash >> {j * width}) & 255)"
        for j in range(bands - 1)
    )
    return f"""WITH keyed AS (
  -- key and mix constants pre-reduced mod 2^31 (506952113 = 2654435761
  -- mod 2^31, 435 = 1099511628211 mod 2^31): same values, but products
  -- stay < 2^62 at any doc_id < 2^31 instead of overflowing BIGINT
  SELECT doc_id,
         (CASE WHEN doc_id % 10 = 0 THEN doc_id + 1 ELSE doc_id END)
           % 2147483648 AS key
  FROM documents),
hashed AS (
  SELECT doc_id,
         ((key * 506952113 + 104729) % 2147483648)
         + ((key * 435 + 12345) % 2147483648) * 2147483648 AS phash
  FROM keyed),
bands AS (
  SELECT doc_id, phash, u.band,
         (phash >> (u.band * {width})) & 255 AS band_val
  FROM hashed, unnest(range(0, {bands})) AS u(band))
SELECT a.doc_id AS id1, b.doc_id AS id2,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
 AND {shared_lower}
WHERE bit_count(xor(a.phash, b.phash)) <= 7"""


def _bm25_ranked_ctes(
    queries: list[tuple[int, list[str]]] | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    qtoks_cte: str | None = None,
) -> str:
    """CTE chain ending in ``bm25_ranked`` (query_id, rank, doc_id,
    score) — the log-free BM25 surrogate shared by the keyword-search
    twin, the hybrid-fusion twin, and the self-retrieval eval twin.
    Either ``queries`` (a static list rendered as VALUES) or
    ``qtoks_cte`` (SQL for one or more CTEs, the last of which must be
    ``qtoks(query_id, token)`` — data-DERIVED query sets) supplies the
    query tokens; the scoring chain is identical either way."""
    if (queries is None) == (qtoks_cte is None):
        raise ValueError("pass exactly one of queries / qtoks_cte")
    if qtoks_cte is None:
        qvals = ",\n    ".join(
            f"({qid}, '{t}')"
            for qid, terms in queries
            for t in dict.fromkeys(terms)
        )
        qtoks_cte = f"""qtoks(query_id, token) AS (VALUES
    {qvals})"""
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    return f"""{qtoks_cte},
toks AS (SELECT doc_id, unnest({TOKENS}) AS token FROM documents),
sized AS (SELECT doc_id, len({TOKENS}) AS dl FROM documents),
stats AS (
  SELECT count(*) AS n,
         CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM sized),
qtf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN (SELECT DISTINCT token FROM qtoks)
  GROUP BY doc_id, token),
dfs AS (SELECT token, count(*) AS df FROM qtf GROUP BY token),
term_scores AS (
  SELECT q.query_id, t.doc_id, t.token,
    ((CAST(cs.n - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
    * ((CAST(t.tf AS DOUBLE) * CAST({k1p1!r} AS DOUBLE))
       / (CAST(t.tf AS DOUBLE) + CAST({k1!r} AS DOUBLE)
          * (CAST({one_minus_b!r} AS DOUBLE) + CAST({b!r} AS DOUBLE)
             * (CAST(z.dl AS DOUBLE) / cs.avgdl)))) AS ts
  FROM qtf t
  JOIN dfs d USING (token)
  JOIN qtoks q USING (token)
  JOIN sized z ON z.doc_id = t.doc_id, stats cs),
scores AS (
  SELECT query_id, doc_id,
    list_reduce(list_prepend(0.0, list(ts ORDER BY token)),
                (acc, x) -> acc + x) AS score
  FROM term_scores GROUP BY query_id, doc_id),
bm25_ranked AS (
  SELECT query_id,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS INTEGER)
      AS rank,
    doc_id, score
  FROM scores)"""


def corpus_bm25_search_sql(
    k1: float = 1.2, b: float = 0.75, k: int = 10
) -> str:
    """Twin of queries_dataops.corpus_bm25_search: the log-free BM25
    surrogate with every float op mirrored in the Spark side's order
    (constants interpolated via Python repr so both engines parse the
    identical double), per-doc scores folded in token order, plain
    per-query rank windows (the Spark side's sharded two-level top-k is
    result-identical by construction)."""
    from .queries_dataops import BM25_QUERIES

    return f"""WITH {_bm25_ranked_ctes(BM25_QUERIES, k1, b)}
SELECT query_id, rank, doc_id, score FROM bm25_ranked
WHERE rank <= {k}"""


def corpus_retrieval_mrr_sql(
    probe_mod: int = 149,
    n_terms: int = 2,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Twin of corpus.retrieval_self_mrr: the SAME derived query set
    (per-probe top-n_terms tokens, count DESC / token tie-break), the
    shared BM25 chain, then the self-rank hits and the pinned-order
    reciprocal-rank fold (one rounded division per hit, misses 0.0,
    the zero-probes case an explicit 0.0)."""
    qtoks_cte = f"""ptoks AS (
  SELECT doc_id, unnest({TOKENS}) AS token FROM documents
  WHERE doc_id % {probe_mod} = 0),
pcnt AS (
  SELECT doc_id, token, count(*) AS c FROM ptoks GROUP BY doc_id, token),
qtoks(query_id, token) AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, token,
      row_number() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, token) AS r
    FROM pcnt) t
  WHERE r <= {n_terms})"""
    chain = _bm25_ranked_ctes(k1=k1, b=b, qtoks_cte=qtoks_cte)
    return f"""WITH {chain},
hits AS (
  SELECT query_id, rank FROM bm25_ranked
  WHERE doc_id = query_id AND rank <= {k}),
per AS (
  SELECT q.query_id, h.rank,
         COALESCE(1.0 / CAST(h.rank AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rr
  FROM (SELECT DISTINCT query_id FROM qtoks) q
  LEFT JOIN hits h USING (query_id))
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS hits_at_1,
       CAST(SUM(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS hits_at_k,
       CASE WHEN count(*) > 0 THEN
         list_reduce(list_prepend(0.0, list(rr ORDER BY query_id)),
                     (acc, x) -> acc + x)
           / CAST(count(*) AS DOUBLE)
       ELSE CAST(0.0 AS DOUBLE) END AS mrr_at_k
FROM per"""


def corpus_hybrid_search_sql(
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    pool: int = 20,
    rrf_k: int = 60,
) -> str:
    """Twin of queries_dataops.corpus_hybrid_search: the shared BM25
    CTE chain + an exact-cosine dense ranking against each query doc's
    embedding, fused by reciprocal-rank fusion (two exactly-rounded
    divisions + one add, mirrored in the Spark side's term order)."""
    from ..operators import similarity
    from .oracle_dataops import DOT_FOLD, _emb_cte
    from .queries_dataops import HYBRID_QUERIES

    bm25 = _bm25_ranked_ctes(
        [(qid, terms) for qid, terms, _ in HYBRID_QUERIES], k1, b
    )
    qmap = ", ".join(f"({qid}, {qv})" for qid, _, qv in HYBRID_QUERIES)
    dot_qc = DOT_FOLD.format(n=similarity.DIM, a="q.v", b="c.v")
    return f"""WITH {bm25},
{_emb_cte()},
qmap(query_id, qvec_id) AS (VALUES
    {qmap}),
vec_ranked AS (
  SELECT m.query_id, c.vec_id AS doc_id,
    CAST(row_number() OVER (PARTITION BY m.query_id
         ORDER BY {dot_qc} / (q.nrm * c.nrm) DESC, c.vec_id) AS INTEGER)
      AS vec_rank
  FROM qmap m
  JOIN emb_n q ON q.vec_id = m.qvec_id
  CROSS JOIN emb_n c
  WHERE c.vec_id <> m.qvec_id),
kw_top AS (
  SELECT query_id, doc_id, rank AS kw_rank FROM bm25_ranked
  WHERE rank <= {pool}),
vec_top AS (
  SELECT query_id, doc_id, vec_rank FROM vec_ranked
  WHERE vec_rank <= {pool}),
fused AS (
  SELECT COALESCE(kw.query_id, v.query_id) AS query_id,
         COALESCE(kw.doc_id, v.doc_id) AS doc_id,
         kw.kw_rank, v.vec_rank,
         COALESCE(1.0 / CAST({rrf_k} + kw.kw_rank AS DOUBLE), 0.0)
       + COALESCE(1.0 / CAST({rrf_k} + v.vec_rank AS DOUBLE), 0.0)
           AS rrf_score
  FROM kw_top kw FULL OUTER JOIN vec_top v
    ON kw.query_id = v.query_id AND kw.doc_id = v.doc_id)
SELECT query_id, rank, doc_id, rrf_score, kw_rank, vec_rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rank
  FROM fused) r
WHERE rank <= {k}"""


def corpus_cooccurrence_sql(
    vocab_k: int = 50, min_pair_count: int = 2
) -> str:
    """Twin of queries_dataops.corpus_cooccurrence: identical top-k
    vocabulary (doc-frequency DESC, token tie-break), per-doc distinct
    token pairs restricted to it, integer counts, one exactly-rounded
    lift division."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest(list_distinct({TOKENS})) AS token FROM documents),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS c FROM toks GROUP BY token
    ORDER BY c DESC, token LIMIT {vocab_k})),
marked AS (
  SELECT t.doc_id, t.token FROM toks t JOIN vocab v USING (token)),
n AS (SELECT count(*) AS n_docs FROM documents),
counts AS (SELECT token, count(*) AS cnt FROM marked GROUP BY token),
pairs AS (
  SELECT a.token AS token1, b.token AS token2, count(*) AS pair_count
  FROM marked a JOIN marked b
    ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
  HAVING count(*) >= {min_pair_count})
SELECT p.token1, p.token2,
  CAST(p.pair_count AS BIGINT) AS pair_count,
  CAST(c1.cnt AS BIGINT) AS count1,
  CAST(c2.cnt AS BIGINT) AS count2,
  CAST(n.n_docs * p.pair_count AS DOUBLE)
    / CAST(c1.cnt * c2.cnt AS DOUBLE) AS lift
FROM pairs p
JOIN counts c1 ON c1.token = p.token1
JOIN counts c2 ON c2.token = p.token2, n"""


def doc_bigram_lm_sql(alpha: int = 1) -> str:
    """Twin of queries_dataops.doc_bigram_lm: the same train-slice
    bigram/context/vocab counts, the same exactly-rounded smoothed
    divisions, and the same position-ordered left fold for the mean
    (list_reduce over list(prob ORDER BY p) — bit-identical to Spark's
    sorted-struct aggregate)."""
    return f"""WITH toks AS (
  SELECT doc_id, {{TOKENS}} AS t FROM documents),
bigrams AS (
  SELECT doc_id, u.i - 1 AS p, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)),
train AS (SELECT * FROM bigrams WHERE doc_id % 10 < 8),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM train GROUP BY 1),
v AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(t) AS w FROM toks WHERE doc_id % 10 < 8)),
probs AS (
  SELECT b.doc_id, b.p,
    CASE WHEN COALESCE(c12.c12, 0) = 0 THEN 1 ELSE 0 END AS hapax,
    CAST(COALESCE(c12.c12, 0) + {alpha} AS DOUBLE)
      / CAST(COALESCE(c1.c1, 0) + {alpha} * v.v AS DOUBLE) AS prob
  FROM bigrams b
  LEFT JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN v),
per_doc AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_bigrams,
    CAST(SUM(hapax) AS BIGINT) AS n_hapax,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(prob ORDER BY p)),
                (a, x) -> a + x) / count(*) AS mean_prob
  FROM probs GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(per_doc.n_bigrams, 0) AS n_bigrams,
  COALESCE(per_doc.n_hapax, 0) AS n_hapax,
  per_doc.mean_prob
FROM documents d
LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
ORDER BY d.doc_id""".replace("{TOKENS}", TOKENS)


def doc_trigram_lm_sql(alpha: float = 0.4) -> str:
    """Twin of queries_dataops.doc_trigram_lm: the same train-slice
    trigram/bigram/unigram/N counts off the token lists, the same
    nested stupid-backoff CASE (each branch one exactly-rounded
    division, one α multiply per backoff level, α nested innermost-
    last exactly like the Spark expression), and the same
    position-ordered left fold for the per-doc mean."""
    return f"""WITH toks AS (
  SELECT doc_id, {{TOKENS}} AS t FROM documents),
uni AS (
  SELECT doc_id, u.i - 1 AS p, t[u.i] AS w1
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
bi AS (
  SELECT doc_id, u.i - 1 AS p, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)),
tri AS (
  SELECT doc_id, u.i - 1 AS p, t[u.i] AS w1, t[u.i + 1] AS w2,
         t[u.i + 2] AS w3
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
c123 AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM tri
  WHERE doc_id % 10 < 8 GROUP BY 1, 2, 3),
c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM bi
  WHERE doc_id % 10 < 8 GROUP BY 1, 2),
c1 AS (
  SELECT w1, count(*) AS c1 FROM uni
  WHERE doc_id % 10 < 8 GROUP BY 1),
n AS (SELECT count(*) AS n FROM uni WHERE doc_id % 10 < 8),
probs AS (
  SELECT t.doc_id, t.p,
    CASE WHEN COALESCE(g.c123, 0) = 0 AND COALESCE(bo.c12, 0) > 0
         THEN 1 ELSE 0 END AS bo_bi,
    CASE WHEN COALESCE(g.c123, 0) = 0 AND COALESCE(bo.c12, 0) = 0
         THEN 1 ELSE 0 END AS bo_uni,
    CASE
      WHEN COALESCE(g.c123, 0) > 0
        THEN CAST(g.c123 AS DOUBLE) / CAST(ctx.c12 AS DOUBLE)
      WHEN COALESCE(bo.c12, 0) > 0
        THEN {alpha} * (CAST(bo.c12 AS DOUBLE) / CAST(ctx2.c1 AS DOUBLE))
      ELSE {alpha} * ({alpha} * (CAST(COALESCE(u3.c1, 0) AS DOUBLE)
                                   / CAST(n.n AS DOUBLE)))
    END AS score
  FROM tri t
  LEFT JOIN c123 g ON g.w1 = t.w1 AND g.w2 = t.w2 AND g.w3 = t.w3
  LEFT JOIN c12 ctx ON ctx.w1 = t.w1 AND ctx.w2 = t.w2
  LEFT JOIN c12 bo ON bo.w1 = t.w2 AND bo.w2 = t.w3
  LEFT JOIN c1 ctx2 ON ctx2.w1 = t.w2
  LEFT JOIN c1 u3 ON u3.w1 = t.w3
  CROSS JOIN n),
per_doc AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_trigrams,
    CAST(SUM(bo_bi) AS BIGINT) AS n_backoff_bi,
    CAST(SUM(bo_uni) AS BIGINT) AS n_backoff_uni,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                             list(score ORDER BY p)),
                (a, x) -> a + x) / count(*) AS mean_score
  FROM probs GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(per_doc.n_trigrams, 0) AS n_trigrams,
  COALESCE(per_doc.n_backoff_bi, 0) AS n_backoff_bi,
  COALESCE(per_doc.n_backoff_uni, 0) AS n_backoff_uni,
  per_doc.mean_score
FROM documents d
LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
ORDER BY d.doc_id""".replace("{TOKENS}", TOKENS)


def corpus_temperature_sample_sql(
    budget: int = 137, alpha: float = 0.5
) -> str:
    """Twin of queries_dataops.corpus_temperature_sample: n^α weights
    via the same exactly-rounded sqrt chain, the weight total as the
    same stratum-name-ordered fold, base = floor(B·w/W) on identical
    doubles, leftover seats to the largest fractional remainders via
    the non-equi self-join rank, and the shared LCG fill order."""
    w_expr = {
        1.0: "CAST(n AS DOUBLE)",
        0.5: "sqrt(CAST(n AS DOUBLE))",
        0.25: "sqrt(sqrt(CAST(n AS DOUBLE)))",
    }[alpha]
    return f"""WITH c AS (
  SELECT source, count(*) AS n, {w_expr} AS w
  FROM documents GROUP BY source),
t AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(w ORDER BY source)),
                     (a, x) -> a + x) AS wtot
  FROM c),
q AS (
  SELECT source, n,
         CAST({budget} AS DOUBLE) * w / wtot AS share,
         CAST(floor(CAST({budget} AS DOUBLE) * w / wtot) AS BIGINT) AS base
  FROM c CROSS JOIN t),
q2 AS (
  SELECT source, base, share - CAST(base AS DOUBLE) AS frac FROM q),
l AS (SELECT CAST({budget} AS BIGINT) - SUM(base) AS leftover FROM q2),
r AS (
  SELECT a.source, a.base, count(b.source) AS ahead
  FROM q2 a LEFT JOIN q2 b
    ON (b.frac > a.frac) OR (b.frac = a.frac AND b.source < a.source)
  GROUP BY a.source, a.base),
quota AS (
  SELECT r.source,
         base + CASE WHEN ahead < l.leftover THEN 1 ELSE 0 END
           AS stratum_quota
  FROM r CROSS JOIN l),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_HASH}, doc_id) AS rn
  FROM documents)
SELECT ranked.doc_id, ranked.source, quota.stratum_quota
FROM ranked JOIN quota USING (source)
WHERE rn <= stratum_quota
ORDER BY ranked.doc_id"""


def corpus_bpe_fertility_sql(n_merges: int = 6) -> str:
    """Twin of queries_dataops.corpus_bpe_fertility: the end-to-end BPE
    train+apply twin as a CTE, joined to (lang, n_chars), per-lang
    integer sums, and the same two exactly-rounded divisions."""
    counts_sql = doc_bpe_token_counts_sql(n_merges)
    return f"""WITH counts AS (
{counts_sql}
)
SELECT d.lang,
       CAST(SUM(c.n_words) AS BIGINT) AS total_words,
       CAST(SUM(c.n_subwords) AS BIGINT) AS total_subwords,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(c.n_subwords) AS DOUBLE) / CAST(SUM(c.n_words) AS DOUBLE)
         AS fertility,
       CAST(SUM(d.n_chars) AS DOUBLE) / CAST(SUM(c.n_subwords) AS DOUBLE)
         AS chars_per_subword
FROM counts c JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY d.lang"""


def corpus_quality_mixture_sql(
    rates: tuple[float, ...] = (0.1, 0.4, 0.7, 1.0),
    alpha: int = 1,
    scored_sql: str | None = None,
) -> str:
    """Twin of queries_dataops.corpus_quality_mixture: the bigram-LM
    score CTE, the identical floor(score·10¹⁵) zero-padded rank key
    (NULLs → 0.0, ties → doc_id), integer tier arithmetic, the same
    per-tier rate CASE, and the shared LCG keep comparison.
    ``scored_sql`` swaps in another (doc_id, mean_prob) score source —
    the rule-screen curriculum twin reuses the whole tier pipeline."""
    if scored_sql is None:
        scored_sql = doc_bigram_lm_sql(alpha)
    n_tiers = len(rates)
    rate_case = " ".join(
        f"WHEN {i} THEN CAST({float(r)} AS DOUBLE)"
        for i, r in enumerate(rates)
    )
    return f"""WITH scored AS (
{scored_sql}
),
keyed AS (
  SELECT doc_id, COALESCE(mean_prob, 0.0) AS s,
         CASE WHEN COALESCE(mean_prob, 0.0) < 0.0
                   OR COALESCE(mean_prob, 0.0) >= 10.0
              THEN error('score outside [0, 10) ordering domain')
              ELSE lpad(CAST(CAST(floor(COALESCE(mean_prob, 0.0) * 1e15)
                                  AS BIGINT) AS VARCHAR), 16, '0')
         END AS qkey
  FROM scored),
ranked AS (
  SELECT doc_id, s,
         row_number() OVER (ORDER BY qkey, doc_id) AS r,
         count(*) OVER () AS n
  FROM keyed),
tiered AS (
  SELECT doc_id, s,
         CAST(((r - 1) * {n_tiers}) // n AS INTEGER) AS tier
  FROM ranked)
SELECT doc_id, tier,
       CASE tier {rate_case} END AS tier_rate,
       s AS score
FROM tiered
WHERE CAST({_HASH} AS DOUBLE)
      < (CASE tier {rate_case} END) * 1000000007.0
ORDER BY doc_id"""


def corpus_rule_tiered_sample_sql(
    rates: tuple[float, ...] = (0.1, 0.4, 0.7, 1.0),
) -> str:
    """Twin of queries_dataops.corpus_rule_tiered_sample: the Gopher
    rule screen's passed-rule count (cast to double — 0..7, inside the
    tier key's [0, 10) ordering domain by construction) fed through the
    IDENTICAL tier pipeline as the LM-score curriculum twin."""
    from . import oracle_dataops

    scored = f"""SELECT doc_id,
       CAST(rules_passed AS DOUBLE) AS mean_prob
FROM ({oracle_dataops.doc_rule_quality_sql()})"""
    return corpus_quality_mixture_sql(rates=rates, scored_sql=scored)


def corpus_l_diversity_sql(l_threshold: int = 3) -> str:
    """Twin of queries_dataops.corpus_l_diversity: per-(QI, sensitive)
    partials then the group rollup — NULL sensitive values count as one
    distinct value via the GROUP BY itself, same as Spark's."""
    return f"""WITH per_val AS (
  SELECT lang,
         least(CAST(n_chars AS BIGINT) // 100, 9) AS len_bucket,
         source AS s, count(*) AS n
  FROM documents
  GROUP BY 1, 2, 3)
SELECT lang, len_bucket,
       CAST(SUM(n) AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS n_sensitive_distinct,
       count(*) >= {l_threshold} AS is_l_diverse
FROM per_val
GROUP BY lang, len_bucket
ORDER BY lang, len_bucket"""
