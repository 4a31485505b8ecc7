"""DuckDB oracle SQL for the data-pipeline operators (dedup, similarity,
text analysis, multimodal metadata).

Portability contract with the Spark implementations:
- token split: split on single space, drop empties;
- token hash: left fold (h*31 + ascii(char)) % 1e9+7 starting from 0
  (list_reduce with a prepended 0 — identical to Spark's F.aggregate);
- all dot products / float sums: sequential left fold over the array (no
  list_dot_product — its summation order is unspecified);
- regexp_replace always passes the 'g' flag (Spark replaces globally by
  default, DuckDB does not).
"""

from __future__ import annotations

from ..functions import hashing
from ..operators import dedup, similarity, textops
from . import oracle

# the registrable-domain fixture table (mirrors queries_dataops.
# PSL_FIXTURE_RULES); defined up top because several twin generators
# take it as a default argument
_PSL_FIXTURE = (
    "com",
    "example.com",
    "*.src1.example.com",
    "!files.src1.example.com",
)

def _q(s: str) -> str:
    """Escape a caller-provided string for embedding in a single-quoted
    SQL literal — a rule/pattern containing ``'`` must generate valid
    twin SQL (the Spark side takes the same strings as Column literals,
    so both engines must share one accepted input space)."""
    return s.replace("'", "''")


TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"
TOK_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length({t})+1), i -> CAST(ascii(substr({t}, i, 1)) AS BIGINT))), "
    f"(h, a) -> (h*31 + a) % {hashing.HASH_MOD})"
)


def doc_text_stats_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in textops.STOPWORDS)
    return f"""WITH base AS (
  SELECT doc_id, text,
    {TOKENS} AS toks,
    length(text) AS n_chars,
    length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
    length(regexp_replace(text, '[^ ]', '', 'g')) AS n_space
  FROM documents),
stats AS (
  SELECT doc_id, n_chars,
    len(toks) AS n_tokens,
    len(list_distinct(toks)) AS n_distinct_tokens,
    n_chars - n_alpha - n_digit - n_space AS n_punct,
    n_digit, n_space,
    len(list_filter(toks, t -> t IN ({stop_list}))) AS stop_hits
  FROM base)
SELECT doc_id, n_chars, n_tokens, n_distinct_tokens,
  CASE WHEN n_tokens > 0 THEN CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS type_token_ratio,
  CASE WHEN n_tokens > 0 THEN CAST(n_chars - n_space AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
  CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
  CASE WHEN n_chars > 0 THEN CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
  CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio
FROM stats"""


def doc_quality_sql() -> str:
    return f"""WITH stats AS ({doc_text_stats_sql()})
SELECT *,
  0.5 * type_token_ratio
  + 0.3 * (CASE WHEN avg_token_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
  + 0.2 * (1.0 - punct_ratio - digit_ratio) AS quality_score
FROM stats"""


def doc_rule_quality_sql(source: str = "documents") -> str:
    """Twin of queries_dataops.doc_rule_quality: the identical Gopher
    rule arithmetic — shared whitespace words, chr(10) line split with
    trailing empties, non-overlapping replace-based '#'/'...' counts,
    distinct-stop-word membership sum, every ratio the same guarded
    double division, rule booleans and verdict in the same order.
    ``source``: any relation exposing (doc_id, text) — the admission
    pipeline feeds the boilerplate-cleaned text through the same
    chain."""
    stop_sum = " + ".join(
        "(CASE WHEN list_contains(list_transform(words, w -> lower(w)),"
        f" '{s}') THEN 1 ELSE 0 END)"
        for s in textops.GOPHER_STOPWORDS
    )
    return f"""WITH base AS (
  SELECT doc_id, text,
    {TOKENS.replace("t ->", "w ->").replace("t <>", "w <>")} AS words,
    string_split(text, chr(10)) AS lines
  FROM {source}),
m AS (
  SELECT doc_id,
    len(words) AS n_words,
    len(lines) AS n_lines,
    list_reduce(list_prepend(0, list_transform(words, w -> length(w))),
                (a, x) -> a + x) AS sum_word_len,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    (length(text) - length(replace(text, '...', ''))) / 3 AS n_ellipsis,
    len(list_filter(lines, l -> starts_with(l, '•')
                              OR starts_with(l, '- ')
                              OR starts_with(l, '* '))) AS bullet_lines,
    len(list_filter(lines, l -> ends_with(l, '...')
                              OR ends_with(l, '…'))) AS ellipsis_lines,
    len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
      AS alpha_words,
    {stop_sum} AS stop_hits
  FROM base),
sig AS (
  SELECT doc_id, n_words,
    CASE WHEN n_words > 0
         THEN CAST(sum_word_len AS DOUBLE) / CAST(n_words AS DOUBLE)
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_words > 0
         THEN CAST(n_hash + n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE)
         ELSE 0.0 END AS symbol_word_ratio,
    CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
      AS bullet_line_frac,
    CAST(ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
      AS ellipsis_line_frac,
    CASE WHEN n_words > 0
         THEN CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)
         ELSE 0.0 END AS alpha_word_frac,
    CAST(stop_hits AS INTEGER) AS n_stop_hits
  FROM m),
ruled AS (
  SELECT *,
    (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
    (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
    (symbol_word_ratio <= 0.1) AS rule_symbol_ratio,
    (bullet_line_frac <= 0.9) AS rule_bullet_lines,
    (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
    (alpha_word_frac >= 0.8) AS rule_alpha_words,
    (n_stop_hits >= 2) AS rule_stopwords
  FROM sig)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
       rule_word_count, rule_mean_word_len, rule_symbol_ratio,
       rule_bullet_lines, rule_ellipsis_lines, rule_alpha_words,
       rule_stopwords,
       CAST((CASE WHEN rule_word_count THEN 1 ELSE 0 END)
          + (CASE WHEN rule_mean_word_len THEN 1 ELSE 0 END)
          + (CASE WHEN rule_symbol_ratio THEN 1 ELSE 0 END)
          + (CASE WHEN rule_bullet_lines THEN 1 ELSE 0 END)
          + (CASE WHEN rule_ellipsis_lines THEN 1 ELSE 0 END)
          + (CASE WHEN rule_alpha_words THEN 1 ELSE 0 END)
          + (CASE WHEN rule_stopwords THEN 1 ELSE 0 END) AS INTEGER)
         AS rules_passed,
       (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
        AND rule_bullet_lines AND rule_ellipsis_lines
        AND rule_alpha_words AND rule_stopwords) AS pass_gopher
FROM ruled ORDER BY doc_id"""


def doc_lang_id_sql() -> str:
    score_exprs = []
    for lang, markers in sorted(textops.LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        score_exprs.append(
            f"CAST(len(list_filter(toks, t -> t IN ({lst}))) AS DOUBLE) AS s_{lang}"
        )
    langs = sorted(textops.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    # argmax with code-order tiebreak: first lang matching best wins
    pred = "CASE "
    for la in langs:
        pred += f"WHEN s_{la} = best THEN '{la}' "
    pred += "END"
    return f"""WITH base AS (
  SELECT doc_id, {TOKENS} AS toks FROM documents),
scored AS (
  SELECT doc_id, len(toks) AS n_tokens, {", ".join(score_exprs)} FROM base),
withbest AS (
  SELECT *, {best} AS best FROM scored)
SELECT doc_id,
  CASE WHEN best > 0 THEN {pred} ELSE 'und' END AS predicted_lang,
  CASE WHEN n_tokens > 0 THEN best / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS lang_confidence
FROM withbest"""


def doc_token_counts_sql() -> str:
    from ..operators.textops import BPE_ISH_PATTERN

    return f"""SELECT doc_id,
  len({TOKENS}) AS n_ws_tokens,
  len(regexp_extract_all(text, '{BPE_ISH_PATTERN.replace("'", "''")}', 0)) AS n_bpe_tokens,
  length(text) AS n_chars
FROM documents"""


def doc_fingerprints_sql() -> str:
    return f"""SELECT doc_id,
  md5(text) AS fp_exact,
  md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp_normalized,
  md5(array_to_string(list_sort(list_distinct({TOKENS})), ' ')) AS fp_bow
FROM documents"""


def doc_repetition_sql() -> str:
    """Twin of textops.repetition_stats: Gopher-style token-level repetition
    signals.  Integer/double divisions and window framing mirror the Spark
    side exactly (max(cnt)/sum(cnt) as BIGINT->DOUBLE division; run ids via
    lag + running sum over position order)."""
    return f"""WITH toks AS (
  SELECT doc_id, {TOKENS} AS toks FROM documents),
pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok
  FROM toks),
uni AS (
  SELECT doc_id,
    CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_token_frac,
    CAST(sum(cnt) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, tok, count(*) AS cnt FROM pos GROUP BY 1, 2)
  GROUP BY doc_id),
big AS (
  SELECT doc_id,
    CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_bigram_frac
  FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id,
        unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1])) AS gram
      FROM toks)
    GROUP BY 1, 2)
  GROUP BY doc_id),
tri AS (
  SELECT doc_id,
    CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_trigram_frac
  FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id,
        unnest(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
      FROM toks)
    GROUP BY 1, 2)
  GROUP BY doc_id),
chg AS (
  SELECT doc_id, pos, tok,
    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
           OR lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) <> tok
         THEN 1 ELSE 0 END AS chg
  FROM pos),
runid AS (
  SELECT doc_id,
    SUM(chg) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS run_id
  FROM chg),
runs AS (
  SELECT doc_id, max(run_len) AS max_token_run FROM (
    SELECT doc_id, run_id, count(*) AS run_len FROM runid GROUP BY 1, 2)
  GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(u.n_tokens, 0) AS n_tokens,
  COALESCE(u.top_token_frac, 0.0) AS top_token_frac,
  COALESCE(b.top_bigram_frac, 0.0) AS top_bigram_frac,
  COALESCE(t.top_trigram_frac, 0.0) AS top_trigram_frac,
  COALESCE(r.max_token_run, 0) AS max_token_run,
  (COALESCE(u.top_token_frac, 0.0) > 0.30
   OR COALESCE(b.top_bigram_frac, 0.0) > 0.18
   OR COALESCE(t.top_trigram_frac, 0.0) > 0.16
   OR COALESCE(r.max_token_run, 0) >= 4) AS is_repetitive
FROM documents d
LEFT JOIN uni u USING (doc_id)
LEFT JOIN big b USING (doc_id)
LEFT JOIN tri t USING (doc_id)
LEFT JOIN runs r USING (doc_id)"""


def doc_scrub_pii_sql() -> str:
    """Twin of textops.scrub_pii, generated from the SAME SCRUB_PATTERNS
    constant so the two engines can never drift.  Patterns are restricted
    to the Java-regex/RE2 common subset; DuckDB needs the explicit 'g'
    flag Spark applies by default.  Counts are progressive (pattern i
    counted on the text after replacements 1..i-1), matching the Spark
    side's replacements-actually-performed semantics."""
    from ..operators.textops import SCRUB_PATTERNS

    cur = "text"
    count_exprs = []
    for name, pat, repl in SCRUB_PATTERNS:
        count_exprs.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    scrubbed = f"trim(regexp_replace({cur}, ' +', ' ', 'g'))"
    counts = ",\n  ".join(count_exprs)
    total = " + ".join(f"n_{name}" for name, _, _ in SCRUB_PATTERNS)
    return f"""WITH counted AS (
  SELECT doc_id,
    {scrubbed} AS text_scrubbed,
    {counts}
  FROM documents)
SELECT *, ({total}) > 0 AS had_pii FROM counted"""


def doc_profile_sql() -> str:
    """Twin of queries_dataops.doc_profile: quality (incl. text_stats) ⋈
    lang_id ⋈ token_counts on doc_id — each arm reuses its own twin SQL."""
    return f"""WITH q AS (
{doc_quality_sql()}
),
l AS (
{doc_lang_id_sql()}
),
t AS (
{doc_token_counts_sql()}
)
SELECT q.*, l.predicted_lang, l.lang_confidence, t.n_ws_tokens, t.n_bpe_tokens
FROM q JOIN l USING (doc_id) JOIN t USING (doc_id)"""


def doc_signals_sql() -> str:
    """Twin of queries_dataops.doc_signals: fingerprints ⋈ repetition."""
    return f"""WITH f AS (
{doc_fingerprints_sql()}
),
r AS (
{doc_repetition_sql()}
)
SELECT f.*, r.n_tokens, r.top_token_frac, r.top_bigram_frac,
       r.top_trigram_frac, r.max_token_run, r.is_repetitive
FROM f JOIN r USING (doc_id)"""


def corpus_length_profile_sql() -> str:
    # quantile_cont == Spark's exact `percentile` (same (n-1)*p linear
    # interpolation, bit-identical); sum needs the HUGEINT->BIGINT cast
    return """SELECT source,
  count(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  AVG(n_chars) AS avg_chars,
  quantile_cont(n_chars, 0.5) AS median_chars,
  quantile_cont(n_chars, 0.9) AS p90_chars,
  MAX(n_chars) AS max_chars
FROM documents
GROUP BY source"""


def doc_lm_coverage_sql(min_count: int = 5, train_mod: int = 10, held_in: int = 8) -> str:
    """Twin of queries_dataops.doc_lm_coverage: identical trigram
    extraction, train-slice counting, threshold, probe, and the one
    exactly-rounded coverage division."""
    return f"""WITH tri AS (
  SELECT doc_id, unnest(CASE WHEN length(text) >= 3
    THEN list_transform(range(1, length(text) - 1),
                        i -> substr(text, CAST(i AS INTEGER), 3))
    ELSE [] END) AS tri
  FROM documents),
vocab AS (
  SELECT tri FROM (
    SELECT tri, count(*) AS c FROM tri
    WHERE doc_id % {train_mod} < {held_in} GROUP BY tri) t
  WHERE c >= {min_count}),
scored AS (
  SELECT t.doc_id, count(*) AS n_trigrams,
    CAST(SUM(CASE WHEN v.tri IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_covered
  FROM tri t LEFT JOIN vocab v USING (tri) GROUP BY t.doc_id)
SELECT d.doc_id,
  COALESCE(s.n_trigrams, 0) AS n_trigrams,
  COALESCE(s.n_covered, 0) AS n_covered,
  CASE WHEN COALESCE(s.n_trigrams, 0) > 0
       THEN CAST(s.n_covered AS DOUBLE) / CAST(s.n_trigrams AS DOUBLE)
       ELSE 0.0 END AS coverage
FROM documents d LEFT JOIN scored s USING (doc_id)"""


def doc_normalized_sql() -> str:
    """Twin of queries_dataops.doc_normalized: identical RE2-compatible
    normalization chain (control chars → space, space-run collapse,
    trim, lower) — canonical text compares byte-identical."""
    norm = (
        "lower(trim(regexp_replace(regexp_replace(text, "
        "'[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g')))"
    )
    return f"""SELECT doc_id,
  {norm} AS text_norm,
  CAST(length(text) AS INTEGER) AS n_chars_raw,
  CAST(length({norm}) AS INTEGER) AS n_chars_norm,
  COALESCE({norm} <> text, FALSE) AS changed
FROM documents"""


def corpus_snapshot_diff_sql() -> str:
    """Twin of queries_dataops.corpus_snapshot_diff: the same mutated
    successor snapshot (mod-7 removals, mod-5 edits, mod-11 additions)
    and the digest-compare full-outer diff."""
    return """WITH old_snap AS (
  SELECT doc_id, md5(text) AS old_digest FROM documents),
new_snap AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
           AS new_digest
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 100000, md5(text) FROM documents WHERE doc_id % 11 = 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.old_digest <> n.new_digest THEN 'changed'
  END AS status,
  o.old_digest, n.new_digest
FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
WHERE CASE WHEN o.doc_id IS NULL THEN 'added'
           WHEN n.doc_id IS NULL THEN 'removed'
           WHEN o.old_digest <> n.new_digest THEN 'changed'
      END IS NOT NULL"""


def doc_quality_model_sql() -> str:
    """Twin of queries_dataops.doc_quality_model: same token explode,
    portable 30-bit hash → bucket, LCG weight regeneration, int64
    tf·weight accumulation, and the one exactly-rounded logit division."""
    from ..operators import textops

    nb = textops.QM_BUCKETS
    scale = textops.QM_WEIGHT_SCALE
    th = TOK_HASH.format(t="tok")
    return f"""WITH toks AS (
  SELECT doc_id, unnest({TOKENS}) AS tok FROM documents),
tf AS (
  SELECT doc_id, {th} % {nb} AS bucket, count(*) AS tf
  FROM toks GROUP BY doc_id, bucket),
w AS (
  SELECT range AS bucket,
         (range * 2654435761 + 40503) % 1001 - {scale} AS weight
  FROM range({nb})),
scored AS (
  SELECT doc_id,
         CAST(SUM(tf * weight) AS BIGINT) AS sum_w,
         CAST(SUM(tf) AS BIGINT) AS n_tokens
  FROM tf JOIN w USING (bucket) GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(s.n_tokens, 0) AS n_tokens,
  CASE WHEN COALESCE(s.n_tokens, 0) > 0
       THEN CAST(s.sum_w AS DOUBLE) / CAST({scale} * s.n_tokens AS DOUBLE)
       ELSE 0.0 END AS logit,
  CASE WHEN COALESCE(s.n_tokens, 0) > 0
       THEN CAST(s.sum_w AS DOUBLE) / CAST({scale} * s.n_tokens AS DOUBLE)
            > 0.0
       ELSE FALSE END AS keep
FROM documents d LEFT JOIN scored s USING (doc_id)"""


def dedup_exact_sql() -> str:
    return """SELECT doc_id, md5(text) AS digest,
  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents"""


def _ngrams_cte(n: int) -> str:
    return f"""doc_grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(0, len(toks) - {n} + 1),
                   i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))
  )) AS gram
  FROM (SELECT doc_id, {TOKENS} AS toks FROM documents)
  WHERE len(toks) >= {n}
)"""


def dedup_ngram_pairs_sql(
    n: int = 3, threshold: float = 0.2, max_doc_freq: int | None = 1000
) -> str:
    """Twin of ngram_jaccard_pairs incl. its default document-frequency cap:
    shingles with df > max_doc_freq leave the universe before sizes and the
    candidate join (None replicates the uncapped textbook form)."""
    cap_cte = (
        f""",
doc_grams_capped AS (
  SELECT doc_id, gram FROM doc_grams
  WHERE gram NOT IN (SELECT gram FROM doc_grams
                     GROUP BY gram HAVING count(*) > {max_doc_freq}))"""
        if max_doc_freq is not None
        else ""
    )
    src = "doc_grams_capped" if max_doc_freq is not None else "doc_grams"
    return f"""WITH {_ngrams_cte(n)}{cap_cte},
sizes AS (SELECT doc_id, count(*) AS n_grams FROM {src} GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_shared
  FROM {src} a JOIN {src} b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc1, doc2, n_shared,
  CAST(n_shared AS DOUBLE) / CAST(s1.n_grams + s2.n_grams - n_shared AS DOUBLE) AS jaccard
FROM shared
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE CAST(n_shared AS DOUBLE) / CAST(s1.n_grams + s2.n_grams - n_shared AS DOUBLE) >= {threshold}"""


def dedup_containment_pairs_sql(
    n: int = 3, threshold: float = 0.5, max_doc_freq: int | None = 1000
) -> str:
    """Twin of dedup.containment_pairs: same capped shingle universe and
    candidate join as the Jaccard twin, but scoring each direction
    against its OWN size (n_shared/n1, n_shared/n2) and keeping pairs
    where the max clears the threshold."""
    cap_cte = (
        f""",
doc_grams_capped AS (
  SELECT doc_id, gram FROM doc_grams
  WHERE gram NOT IN (SELECT gram FROM doc_grams
                     GROUP BY gram HAVING count(*) > {max_doc_freq}))"""
        if max_doc_freq is not None
        else ""
    )
    src = "doc_grams_capped" if max_doc_freq is not None else "doc_grams"
    return f"""WITH {_ngrams_cte(n)}{cap_cte},
sizes AS (SELECT doc_id, count(*) AS n_grams FROM {src} GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_shared
  FROM {src} a JOIN {src} b
    ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc1, doc2, n_shared,
  CAST(n_shared AS DOUBLE) / CAST(s1.n_grams AS DOUBLE) AS containment1,
  CAST(n_shared AS DOUBLE) / CAST(s2.n_grams AS DOUBLE) AS containment2,
  greatest(CAST(n_shared AS DOUBLE) / CAST(s1.n_grams AS DOUBLE),
           CAST(n_shared AS DOUBLE) / CAST(s2.n_grams AS DOUBLE)) AS containment
FROM shared
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE greatest(CAST(n_shared AS DOUBLE) / CAST(s1.n_grams AS DOUBLE),
               CAST(n_shared AS DOUBLE) / CAST(s2.n_grams AS DOUBLE))
      >= {threshold}"""


def _minhash_sig_ctes(source: str = "documents") -> str:
    perms = oracle._values(
        [(i, a, b) for i, (a, b) in enumerate(hashing.MINHASH_PERMS)]
    )
    rows_per_band = len(hashing.MINHASH_PERMS) // hashing.MINHASH_BANDS
    th = TOK_HASH.format(t="tok")
    return f"""doc_toks AS (
  SELECT doc_id, unnest(list_distinct({TOKENS})) AS tok FROM {source}),
tok_hashes AS (
  SELECT doc_id, {th} AS tok_hash FROM doc_toks),
perms(i, a, b) AS (VALUES
    {perms}),
minhashes AS (
  SELECT doc_id, i,
         MIN((a * tok_hash + b) % {hashing.HASH_MOD}) AS mh
  FROM tok_hashes CROSS JOIN perms
  GROUP BY doc_id, i),
band_sigs AS (
  SELECT doc_id, CAST(i // {rows_per_band} AS INTEGER) AS band,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS band_sig,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list(mh ORDER BY i)),
                     (s, m) -> (s * 31 + m) & {dedup._BAND_SIG_MASK}
                    ) AS band_sig_long
  FROM minhashes GROUP BY doc_id, i // {rows_per_band})"""


def dedup_minhash_sigs_sql() -> str:
    return f"""WITH {_minhash_sig_ctes()}
SELECT doc_id, band, band_sig FROM band_sigs"""


def dedup_sigs_sql() -> str:
    """Twin of queries_dataops.dedup_sigs: banded MinHash signatures
    unioned with the SimHash (as a decimal string), marker-tagged."""
    return f"""WITH {_minhash_sig_ctes()},
{_simhash_cte().lstrip()}
SELECT 'minhash' AS algo, doc_id, band, band_sig AS sig FROM band_sigs
UNION ALL
SELECT 'simhash' AS algo, doc_id, CAST(0 AS INTEGER) AS band,
       CAST(simhash AS VARCHAR) AS sig
FROM simhashes"""


def dedup_minhash_pairs_sql(
    threshold: float = 0.5, source: str = "documents"
) -> str:
    """Twin of minhash_dup_pairs: same banded candidates, and the exact
    verify intersects per-doc DISTINCT TOKEN-HASH sets (the portable
    30-bit hashes the signatures use) — the hashed-token Jaccard the Spark
    side computes, bit-for-bit."""
    return f"""WITH {_minhash_sig_ctes(source)},
candidates AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM band_sigs a JOIN band_sigs b
    ON a.band = b.band AND a.band_sig_long = b.band_sig_long
   AND a.doc_id < b.doc_id),
tok_arrays AS (
  SELECT doc_id, list(DISTINCT tok_hash) AS toks
  FROM tok_hashes GROUP BY doc_id),
verified AS (
  SELECT c.doc1, c.doc2,
    len(list_intersect(t1.toks, t2.toks)) AS n_shared,
    len(t1.toks) AS n1, len(t2.toks) AS n2
  FROM candidates c
  JOIN tok_arrays t1 ON t1.doc_id = c.doc1
  JOIN tok_arrays t2 ON t2.doc_id = c.doc2)
SELECT doc1, doc2,
  CAST(n_shared AS DOUBLE) / CAST(n1 + n2 - n_shared AS DOUBLE) AS jaccard
FROM verified
WHERE CAST(n_shared AS DOUBLE) / CAST(n1 + n2 - n_shared AS DOUBLE) >= {threshold}"""


def dedup_minhash_est_pairs_sql(
    threshold: float = 0.5, source: str = "documents"
) -> str:
    n = len(hashing.MINHASH_PERMS)
    est = (
        f"CAST(len(list_filter(range(1, {n}+1), i -> s1.sig[i] = s2.sig[i])) "
        f"AS DOUBLE) / {float(n)}"
    )
    return f"""WITH {_minhash_sig_ctes(source)},
sig_arrays AS (
  SELECT doc_id, list(mh ORDER BY i) AS sig FROM minhashes GROUP BY doc_id),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM band_sigs a JOIN band_sigs b
    ON a.band = b.band AND a.band_sig_long = b.band_sig_long
   AND a.doc_id < b.doc_id)
SELECT c.doc1, c.doc2, {est} AS est_jaccard
FROM candidates c
JOIN sig_arrays s1 ON s1.doc_id = c.doc1
JOIN sig_arrays s2 ON s2.doc_id = c.doc2
WHERE {est} >= {threshold}"""


def dedup_source_overlap_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_source_overlap: the est-pairs CTE
    aggregated to least/greatest-ordered source cells; estimate sums
    are exact dyadics (multiples of 1/16), portable at any order."""
    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    return f"""WITH pairs AS (
{pairs_sql}
)
SELECT least(d1.source, d2.source) AS source1,
       greatest(d1.source, d2.source) AS source2,
       count(*) AS n_pairs,
       SUM(p.est_jaccard) AS sum_est_jaccard
FROM pairs p
JOIN documents d1 ON d1.doc_id = p.doc1
JOIN documents d2 ON d2.doc_id = p.doc2
GROUP BY 1, 2
ORDER BY 1, 2"""


def dedup_incremental_pairs_sql(
    threshold: float = 0.5, batch_mod: int = 13
) -> str:
    """Twin of queries_dataops.dedup_incremental_pairs: the asymmetric
    banded join (doc_id%batch_mod slice vs the rest) scored by the same
    16-component signature estimate — estimates are multiples of 1/16,
    exact in binary floating point on both engines."""
    n = len(hashing.MINHASH_PERMS)
    est = (
        f"CAST(len(list_filter(range(1, {n}+1), i -> s1.sig[i] = s2.sig[i])) "
        f"AS DOUBLE) / {float(n)}"
    )
    return f"""WITH {_minhash_sig_ctes()},
sig_arrays AS (
  SELECT doc_id, list(mh ORDER BY i) AS sig FROM minhashes GROUP BY doc_id),
candidates AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM band_sigs a JOIN band_sigs b
    ON a.band = b.band AND a.band_sig_long = b.band_sig_long
  WHERE a.doc_id % {batch_mod} = 0 AND b.doc_id % {batch_mod} <> 0)
SELECT c.new_id, c.corpus_id, {est} AS est_jaccard
FROM candidates c
JOIN sig_arrays s1 ON s1.doc_id = c.new_id
JOIN sig_arrays s2 ON s2.doc_id = c.corpus_id
WHERE {est} >= {threshold}"""


def dedup_minhash_keep_sql(threshold: float = 0.5) -> str:
    pairs_sql = dedup_minhash_pairs_sql(threshold)
    return f"""WITH pairs AS (
{pairs_sql}
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc2 FROM pairs)"""


def dedup_minhash_clusters_sql(threshold: float = 0.5) -> str:
    """Min-reachable-id connected components as a recursive CTE: the
    reachability closure over the undirected pair graph, then MIN per node
    — identical to Spark's converged min-label propagation."""
    pairs_sql = dedup_minhash_pairs_sql(threshold)
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node"""


def dedup_est_keep_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_est_keep: the est-pairs CTE, then
    the one-pass not-a-loser filter."""
    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    return f"""WITH pairs AS (
{pairs_sql}
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc2 FROM pairs)"""


def dedup_est_clusters_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_est_clusters: the recursive-CTE
    reachability closure over the EST pair graph, MIN label per node."""
    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node"""


def dedup_cluster_reps_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_cluster_reps: the recursive-CTE
    cluster closure over the SCALE-PATH est pair graph (the r9
    recomposition — the Spark query moved off exact-verify pairs), then
    the same (tokens DESC, doc_id ASC) argmax per cluster with member
    counts — pure integers."""
    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
),
cl AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node),
tk AS (SELECT doc_id, len({TOKENS}) AS nt FROM documents),
r AS (
  SELECT cl.cluster_id, cl.doc_id, tk.nt,
         row_number() OVER (PARTITION BY cl.cluster_id
                            ORDER BY tk.nt DESC, cl.doc_id) AS rn,
         count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
  FROM cl JOIN tk USING (doc_id))
SELECT cluster_id, doc_id AS rep_doc_id,
       CAST(nt AS INTEGER) AS rep_tokens,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1"""


def dedup_minhash_resolution_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_minhash_resolution: the recursive-CTE
    cluster id plus the one-pass keep flag (not a loser doc2) per doc."""
    pairs_sql = dedup_minhash_pairs_sql(threshold)
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
)
SELECT node AS doc_id, MIN(lab) AS cluster_id,
       node NOT IN (SELECT doc2 FROM pairs) AS kept
FROM reach GROUP BY node"""


def _simhash_cte() -> str:
    th = TOK_HASH.format(t="t")
    bits = hashing.SIMHASH_BITS
    return f"""doc_tok_hashes AS (
  SELECT doc_id,
         list_transform(list_distinct({TOKENS}), t -> {th}) AS hashes
  FROM documents),
simhashes AS (
  SELECT doc_id,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(0, {bits}), b ->
        CASE WHEN list_reduce(list_prepend(0,
               list_transform(hashes, h ->
                 CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)),
             (acc, v) -> acc + v) > 0
        THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)),
      (acc, v) -> acc + v) AS simhash
  FROM doc_tok_hashes)"""


def dedup_simhash_sigs_sql() -> str:
    return f"""WITH {_simhash_cte()}
SELECT doc_id, simhash FROM simhashes"""


def dedup_simhash_pairs_sql() -> str:
    bits = hashing.SIMHASH_BITS
    band_bits = hashing.SIMHASH_BAND_BITS
    n_bands = (bits + band_bits - 1) // band_bits
    return f"""WITH {_simhash_cte()},
banded AS (
  SELECT doc_id, simhash, CAST(b AS INTEGER) AS band,
         (simhash >> (b * {band_bits})) & 255 AS band_val
  FROM simhashes, unnest(range(0, {n_bands})) AS u(b)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
         a.simhash AS sim1, b.simhash AS sim2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
SELECT doc1, doc2, bit_count(xor(sim1, sim2)) AS hamming
FROM pairs
WHERE bit_count(xor(sim1, sim2)) <= {hashing.SIMHASH_MAX_HAMMING}"""


# ── Embedding similarity ─────────────────────────────────────────────

DOT_FOLD = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {n}+1), "
    "i -> {a}[i] * {b}[i])), (acc, v) -> acc + v)"
)


def _emb_cte() -> str:
    dot_self = DOT_FOLD.format(n=similarity.DIM, a="v", b="v")
    return f"""emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
emb_n AS (
  SELECT vec_id, v, sqrt({dot_self}) AS nrm FROM emb)"""


def knn_bruteforce_sql(k: int = 5, modulus: int = 50) -> str:
    dot_qc = DOT_FOLD.format(n=similarity.DIM, a="q.v", b="c.v")
    return f"""WITH {_emb_cte()},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {dot_qc} / (q.nrm * c.nrm) AS cosine
  FROM emb_n q CROSS JOIN emb_n c
  WHERE q.vec_id % {modulus} = 0 AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


# The embedding count of the CORRECTNESS corpora (sf0.001 AND sf0.01
# both carry 500 embeddings — TESTDATA.md).  The Spark side's default
# geometry is planner-sized from a runtime count probe
# (similarity.planned_geometry); these static twins must bake the SAME
# geometry in, so they evaluate the planner at the sweep corpus size.
# Every planner-geometry twin takes n_docs (defaulting to this fixture
# count) and is listed in GEOMETRY_PARAMETRIC_SQL at the bottom of this
# module — scripts/check_oracle.py regenerates those entries at the
# target dir's actual embedding count, so the bit-exact gate sweeps at
# ANY scale factor (verified green at sf0.1's 2000 embeddings).
ORACLE_EMB_COUNT = 500


def _oracle_geometry(n_docs: int | None = None) -> tuple[int, int]:
    g = similarity.lsh_geometry_for_corpus(n_docs or ORACLE_EMB_COUNT)
    return g["n_bands"], g["bits_per_band"]


def _lsh_cte(n_planes: int = similarity.N_PLANES) -> str:
    rows = []
    for p, plane in enumerate(similarity.hyperplanes(n_planes)):
        arr = "[" + ", ".join(f"{float(w)}" for w in plane) + "]"
        rows.append(f"({p}, {arr}::DOUBLE[])")
    proj = DOT_FOLD.format(n=similarity.DIM, a="e.v", b="h.plane")
    return f"""{_emb_cte()},
planes(p, plane) AS (VALUES
    {", ".join(rows)}),
projections AS (
  SELECT e.vec_id, h.p, {proj} AS proj
  FROM emb_n e CROSS JOIN planes h),
lsh_sigs AS (
  SELECT vec_id,
         SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS lsh_sig
  FROM projections GROUP BY vec_id)"""


def embedding_lsh_buckets_sql(
    n_bands: int | None = None,
    bits_per_band: int | None = None,
    n_docs: int | None = None,
) -> str:
    if n_bands is None or bits_per_band is None:
        n_bands, bits_per_band = _oracle_geometry(n_docs)
    mask = (1 << bits_per_band) - 1
    return f"""WITH {_lsh_cte(n_bands * bits_per_band)}
SELECT vec_id, CAST(lsh_sig AS BIGINT) AS lsh_sig, CAST(b AS INTEGER) AS band,
       CAST((lsh_sig >> (b * {bits_per_band})) & {mask} AS INTEGER) AS band_val
FROM lsh_sigs, unnest(range(0, {n_bands})) AS u(b)"""


def embedding_dup_pairs_sql(
    threshold: float = 0.35,
    n_bands: int | None = None,
    bits_per_band: int | None = None,
    n_docs: int | None = None,
) -> str:
    if n_bands is None or bits_per_band is None:
        n_bands, bits_per_band = _oracle_geometry(n_docs)
    dot_12 = DOT_FOLD.format(n=similarity.DIM, a="e1.v", b="e2.v")
    mask = (1 << bits_per_band) - 1
    return f"""WITH {_lsh_cte(n_bands * bits_per_band)},
buckets AS (
  SELECT vec_id, CAST(b AS INTEGER) AS band,
         (lsh_sig >> (b * {bits_per_band})) & {mask} AS band_val
  FROM lsh_sigs, unnest(range(0, {n_bands})) AS u(b)),
candidates AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
SELECT c.id1, c.id2, {dot_12} / (e1.nrm * e2.nrm) AS cosine
FROM candidates c
JOIN emb_n e1 ON e1.vec_id = c.id1
JOIN emb_n e2 ON e2.vec_id = c.id2
WHERE {dot_12} / (e1.nrm * e2.nrm) >= {threshold}"""


def embedding_dup_pairs_multitable_sql(
    threshold: float = 0.35,
    n_tables: int = 2,
    n_bands: int = similarity.LSH_BANDS,
    bits_per_band: int = similarity.LSH_BITS_PER_BAND,
) -> str:
    """Twin of queries_dataops.embedding_dup_pairs_multitable: the same
    hyperplane-stream slices (table t = rows [t·planes, (t+1)·planes)
    of the one xorshift stream), per-table signatures, global band
    index, DISTINCT candidates (set-identical to the Spark side's
    in-join lowest-shared-band dedup), exact-cosine verify."""
    n_planes = n_bands * bits_per_band
    rows = []
    for q, plane in enumerate(similarity.hyperplanes(n_planes * n_tables)):
        arr = "[" + ", ".join(f"{float(w)}" for w in plane) + "]"
        rows.append(f"({q // n_planes}, {q % n_planes}, {arr}::DOUBLE[])")
    proj = DOT_FOLD.format(n=similarity.DIM, a="e.v", b="h.plane")
    dot_12 = DOT_FOLD.format(n=similarity.DIM, a="e1.v", b="e2.v")
    mask = (1 << bits_per_band) - 1
    return f"""WITH {_emb_cte()},
planes(tbl, p, plane) AS (VALUES
    {", ".join(rows)}),
projections AS (
  SELECT e.vec_id, h.tbl, h.p, {proj} AS proj
  FROM emb_n e CROSS JOIN planes h),
sigs AS (
  SELECT vec_id, tbl,
         SUM(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
           AS sig
  FROM projections GROUP BY vec_id, tbl),
buckets AS (
  SELECT vec_id, tbl * {n_bands} + b AS g,
         (sig >> (b * {bits_per_band})) & {mask} AS band_val
  FROM sigs, unnest(range(0, {n_bands})) AS u(b)),
candidates AS (
  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
  FROM buckets a JOIN buckets b
    ON a.g = b.g AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
SELECT c.id1, c.id2, {dot_12} / (e1.nrm * e2.nrm) AS cosine
FROM candidates c
JOIN emb_n e1 ON e1.vec_id = c.id1
JOIN emb_n e2 ON e2.vec_id = c.id2
WHERE {dot_12} / (e1.nrm * e2.nrm) >= {threshold}"""


def embedding_dup_pairs_amplified_sql(
    threshold: float = 0.35, n_docs: int | None = None
) -> str:
    """Twin of queries_dataops.embedding_dup_pairs_amplified: the
    multitable twin evaluated at the planner's full answer for the
    sweep corpus — geometry AND table count."""
    g = similarity.lsh_geometry_for_corpus(n_docs or ORACLE_EMB_COUNT)
    return embedding_dup_pairs_multitable_sql(
        threshold=threshold,
        n_tables=min(int(g["tables_for_90pct_recall"]), 8),
        n_bands=g["n_bands"],
        bits_per_band=g["bits_per_band"],
    )


def embedding_dup_pairs_wide_sql(threshold: float = 0.35) -> str:
    """Twin of queries_dataops.embedding_dup_pairs_wide: the 32-plane
    4×8-bit geometry — the corpus-scale setting whose per-band collision
    rate (1/256 vs the default's 1/16) suppresses the measured
    corpus²-candidate growth."""
    return embedding_dup_pairs_sql(threshold, n_bands=4, bits_per_band=8)


def embedding_dup_clusters_sql(
    threshold: float = 0.35, n_docs: int | None = None
) -> str:
    """Min-reachable-id connected components over the embedding pair graph
    (recursive-CTE closure — same construction as the MinHash twin)."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT id1 AS node, id2 AS nbr FROM pairs
  UNION ALL
  SELECT id2 AS node, id1 AS nbr FROM pairs
),
reach AS (
  SELECT vec_id AS node, vec_id AS lab FROM embeddings
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
)
SELECT node AS vec_id, MIN(lab) AS cluster_id FROM reach GROUP BY node"""


def embedding_projection_sql(k: int | None = None) -> str:
    """Twin of queries_dataops.embedding_projection: the same fixed ±1
    matrix (similarity.jl_signs — shared constant, like the LSH
    hyperplanes), each component an identical left-assoc add chain
    scaled by 1/sqrt(k)."""
    k = k or similarity.JL_K
    signs = similarity.jl_signs(k, similarity.DIM)
    comps = []
    for row in signs:
        terms = "".join(
            f" {'+' if s == 1 else '-'} v[{i + 1}]"
            for i, s in enumerate(row)
        )
        comps.append(
            f"(0.0{terms}) * (1.0 / sqrt(CAST({k} AS DOUBLE)))"
        )
    arr = ",\n   ".join(comps)
    return f"""SELECT vec_id,
  [{arr}] AS proj
FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""


def embedding_triangles_sql(
    threshold: float = 0.2, n_docs: int | None = None
) -> str:
    """Twin of queries_dataops.embedding_triangles: the same canonical
    (id1 < id2) edge list, wedge join on the middle node, edge-closure
    semi-join, per-node explode + count."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    return f"""WITH pairs AS (
{pairs_sql}
),
e AS (SELECT id1 AS a, id2 AS b FROM pairs),
wedges AS (
  SELECT ab.a, ab.b, bc.b AS c
  FROM e ab JOIN e bc ON ab.b = bc.a),
tris AS (
  SELECT w.a, w.b, w.c FROM wedges w
  WHERE EXISTS (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.c)),
nodes AS (
  SELECT a AS node FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY node"""


def embedding_pagerank_sql(
    threshold: float = 0.35,
    damping: float = 0.85,
    iterations: int = 5,
    shard_count: int = 256,
    n_docs: int | None = None,
) -> str:
    """Twin of queries_dataops.embedding_pagerank: the pairs CTE is the
    verbatim embedding_dup_pairs SQL, symmetrized; each unrolled
    iteration mirrors the Spark plan's exact float-op sequence —
    rank/deg per edge, the TWO-LEVEL ordered fold (src-ordered partial
    per (dst, src-range shard), then shard-ordered fold of partials per
    dst — graph.pagerank's bounded-buffer hub fix), base + d·(fold or
    exact 0.0) — so five chained iterations of doubles still hash
    bit-exact.  Shard assignment is pure integer arithmetic (equal-width
    src intervals), identical in both engines."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    its = []
    prev = "r0"
    for k in range(1, iterations + 1):
        # (1 − d) must be interpolated as the PYTHON double: DuckDB
        # evaluates `1.0 - 0.85` in exact DECIMAL (→ 0.15, a different
        # double than the IEEE subtraction Spark performs)
        one_minus_d = repr(1.0 - damping)
        its.append(
            f"""p{k} AS (
  SELECT a.dst, a.shard,
    list_reduce(list_prepend(0.0,
        list(r.rank / CAST(o.deg AS DOUBLE) ORDER BY a.src)),
      (acc, x) -> acc + x) AS p
  FROM adj a
  JOIN {prev} r ON r.node = a.src
  JOIN outdeg o ON o.src = a.src
  GROUP BY a.dst, a.shard),
c{k} AS (
  SELECT dst,
    list_reduce(list_prepend(0.0, list(p ORDER BY shard)),
      (acc, x) -> acc + x) AS s
  FROM p{k} GROUP BY dst),
it{k} AS (
  SELECT nd.node,
    (CAST({one_minus_d} AS DOUBLE) / CAST(nn.n AS DOUBLE))
      + CAST({damping!r} AS DOUBLE) * COALESCE(c.s, 0.0) AS rank
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN c{k} c ON c.dst = nd.node)"""
        )
        prev = f"it{k}"
    its_sql = ",\n".join(its)
    return f"""WITH pairs AS (
{pairs_sql}
),
adj0 AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL
  SELECT id2 AS src, id1 AS dst FROM pairs),
bounds AS (
  SELECT min(src) AS mn,
         ((max(src) - min(src)) // {int(shard_count)}) + 1 AS w
  FROM adj0),
adj AS (
  SELECT a.src, a.dst, (a.src - b.mn) // b.w AS shard
  FROM adj0 a CROSS JOIN bounds b),
outdeg AS (SELECT src, count(*) AS deg FROM adj0 GROUP BY src),
nodes AS (SELECT vec_id AS node FROM embeddings),
nn AS (SELECT count(*) AS n FROM embeddings),
r0 AS (
  SELECT node, 1.0 / CAST(nn.n AS DOUBLE) AS rank
  FROM nodes CROSS JOIN nn),
{its_sql}
SELECT node AS vec_id, rank FROM {prev}"""


def label_centroid_components_sql() -> str:
    """Sequential-fold centroid components (the ordered-sum portability
    contract: Spark folds collect_list sorted by vec_id, DuckDB folds
    list(val ORDER BY vec_id) — identical operand order, identical double)."""
    dim = similarity.DIM
    return f"""WITH emb AS (
  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
exploded AS (
  SELECT label, vec_id, CAST(i - 1 AS INTEGER) AS pos, v[i] AS val
  FROM emb, unnest(range(1, {dim} + 1)) AS u(i))
SELECT label, pos,
  list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (acc, x) -> acc + x)
    / count(*) AS mean_val,
  count(*) AS n_vectors
FROM exploded GROUP BY label, pos"""


def embedding_quantize_sql() -> str:
    dim = similarity.DIM
    return f"""WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scaled AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM emb)
SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
  CASE WHEN scale > 0 THEN CAST(floor(v[i] / scale + 0.5) AS INTEGER)
       ELSE 0 END AS qval,
  scale
FROM scaled, unnest(range(1, {dim} + 1)) AS u(i)"""


def _kmeans_ctes(
    k: int, n_iter: int, shard_count: int, source: str = "embeddings"
) -> list[str]:
    """The unrolled Lloyd CTE chain shared by embedding_kmeans_sql and
    embedding_silhouette_sql (final components live in comp{n_iter},
    final assembled centroids in cents{n_iter}).  ``source`` rebases
    the whole chain onto another relation (the semdedup screen trains
    on a corpus slice)."""
    dim = similarity.DIM
    dot_vv = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_cc = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    ctes = [
        f"""embV AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {source}),
embVn AS (
  SELECT vec_id, v, sqrt({dot_vv}) AS nrm FROM embV),
bounds AS (
  SELECT min(vec_id) AS mn,
         (max(vec_id) - min(vec_id)) // {shard_count} + 1 AS w
  FROM embV),
exploded AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos, v[i] AS val
  FROM embV, unnest(range(1, {dim} + 1)) AS u(i)),
cents0 AS (
  SELECT vec_id AS cell, v AS cvec FROM embV ORDER BY vec_id LIMIT {k})"""
    ]
    for it in range(1, n_iter + 1):
        prev = f"cents{it - 1}"
        ctes.append(
            f"""{prev}_n AS (
  SELECT cell, cvec, sqrt({dot_cc}) AS cnrm FROM {prev}),
assign{it} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.cell)
        AS r
    FROM embVn e CROSS JOIN {prev}_n c) t
  WHERE r = 1),
part{it} AS (
  SELECT cell, pos, (x.vec_id - b.mn) // b.w AS shard,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
                (acc, x) -> acc + x) AS p,
    count(*) AS c
  FROM exploded x JOIN assign{it} a USING (vec_id), bounds b
  GROUP BY cell, pos, shard),
comp{it} AS (
  SELECT cell, pos,
    list_reduce(list_prepend(0.0, list(p ORDER BY shard)),
                (acc, x) -> acc + x) / CAST(SUM(c) AS DOUBLE) AS mean_val,
    SUM(c) AS n_vectors
  FROM part{it}
  GROUP BY cell, pos),
cents{it} AS (
  SELECT cell, list(mean_val ORDER BY pos) AS cvec
  FROM comp{it} GROUP BY cell)"""
        )
    return ctes


def embedding_kmeans_sql(
    k: int = 8, n_iter: int = 2, shard_count: int = 256
) -> str:
    """Twin of queries_dataops.embedding_kmeans: id-seeded Lloyd
    iterations, generated as one unrolled CTE chain per iteration —
    E-step nearest-centroid by identical IEEE cosine folds (ties →
    smaller cell), M-step means as the same TWO-LEVEL ordered fold the
    Spark side computes (equal-width id-range shards, per-shard
    vec_id-ordered folds, shard partials folded in shard order), empty
    cells dropping out via the GROUP BY."""
    ctes = _kmeans_ctes(k, n_iter, shard_count)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT cell, pos, mean_val, CAST(n_vectors AS BIGINT) AS n_vectors
FROM comp{n_iter}"""
    )


def embedding_balanced_sample_sql(
    budget: int = 100, k: int = 8, n_iter: int = 2, shard_count: int = 256
) -> str:
    """Twin of queries_dataops.embedding_balanced_sample: the shared
    Lloyd CTE chain + the silhouette twin's final E-step (cosine
    argmax, ties → smaller cell), then equal-share quotas (B div
    |cells|, the B mod |cells| leftovers to the smallest cell ids) and
    the LCG-hash per-cell fill — pure integers after the assignment."""
    from ..operators import corpus

    dim = similarity.DIM
    dot_cc = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    lcg = (
        f"((a.vec_id % {corpus.SAMPLE_MOD}) "
        f"* {corpus.SAMPLE_MULT % corpus.SAMPLE_MOD} "
        f"+ {corpus.SAMPLE_INC}) % {corpus.SAMPLE_MOD}"
    )
    ctes = _kmeans_ctes(k, n_iter, shard_count)
    fin = f"cents{n_iter}"
    ctes.append(
        f"""centsF AS (
  SELECT cell, cvec, sqrt({dot_cc}) AS cnrm FROM {fin}),
assignF AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.cell)
        AS r
    FROM embVn e CROSS JOIN centsF c) t
  WHERE r = 1),
cellcounts AS (SELECT cell, count(*) AS n FROM assignF GROUP BY cell),
quota AS (
  SELECT cell,
    CAST({budget} AS BIGINT) // (SELECT count(*) FROM cellcounts)
    + CASE WHEN row_number() OVER (ORDER BY cell)
             <= {budget} % (SELECT count(*) FROM cellcounts)
           THEN 1 ELSE 0 END AS cell_quota
  FROM cellcounts),
rankedv AS (
  SELECT a.vec_id, a.cell,
    row_number() OVER (PARTITION BY a.cell
                       ORDER BY {lcg}, a.vec_id) AS rn
  FROM assignF a)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT r.vec_id, r.cell, q.cell_quota
FROM rankedv r JOIN quota q USING (cell)
WHERE rn <= cell_quota"""
    )


def embedding_silhouette_sql(
    k: int = 8, n_iter: int = 2, shard_count: int = 256
) -> str:
    """Twin of queries_dataops.embedding_silhouette: the same unrolled
    Lloyd chain, one extra deterministic E-step against the FINAL
    centroids (identical cosine argmax, ties → smaller cell), then the
    simplified silhouette — a(i)/b(i) from pos-ordered (x−c)² folds
    under one correctly-rounded sqrt, b(i) an order-independent min,
    s(i) = (b−a)/greatest(a,b) guarded exactly like the Spark side
    (single surviving cell or a=b=0 ⇒ 0.0) — and per-cell means via
    the same TWO-LEVEL id-range ordered fold."""
    dim = similarity.DIM
    dot_cc = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    sqd = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, "
        f"{dim}+1), i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), "
        "(acc, x) -> acc + x)"
    )
    ctes = _kmeans_ctes(k, n_iter, shard_count)
    fin = f"cents{n_iter}"
    ctes.append(
        f"""centsF AS (
  SELECT cell, cvec, sqrt({dot_cc}) AS cnrm FROM {fin}),
assignF AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.cell)
        AS r
    FROM embVn e CROSS JOIN centsF c) t
  WHERE r = 1),
dists AS (
  SELECT e.vec_id, c.cell AS ocell, sqrt({sqd}) AS dist
  FROM embVn e CROSS JOIN centsF c),
svals AS (
  SELECT d.vec_id, a.cell,
    CASE WHEN b_dist IS NULL OR greatest(a_dist, b_dist) = 0.0 THEN 0.0
         ELSE (b_dist - a_dist) / greatest(a_dist, b_dist) END AS val
  FROM (
    SELECT d.vec_id,
      max(CASE WHEN d.ocell = a.cell THEN d.dist END) AS a_dist,
      min(CASE WHEN d.ocell <> a.cell THEN d.dist END) AS b_dist
    FROM dists d JOIN assignF a USING (vec_id)
    GROUP BY d.vec_id) d
  JOIN assignF a USING (vec_id)),
spart AS (
  SELECT cell, (s.vec_id - b.mn) // b.w AS shard,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
                (acc, x) -> acc + x) AS p,
    count(*) AS c
  FROM svals s, bounds b
  GROUP BY cell, shard)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT cell, CAST(SUM(c) AS BIGINT) AS n_vectors,
  list_reduce(list_prepend(0.0, list(p ORDER BY shard)),
              (acc, x) -> acc + x) / CAST(SUM(c) AS DOUBLE)
    AS mean_silhouette
FROM spart
GROUP BY cell
ORDER BY cell"""
    )


def _semdedup_ctes(
    k: int,
    n_iter: int,
    threshold: float,
    shard_count: int,
    source: str = "embeddings",
) -> list[str]:
    """The semdedup CTE chain through ``rankedk`` (vec_id, cell,
    group_id, cent_cos, rn; keep ⇔ rn = 1), rebased onto ``source`` —
    shared by the dedup twin and the frozen-index screen twin."""
    dim = similarity.DIM
    dot_cc = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_ab = DOT_FOLD.format(n=dim, a="a.v", b="b.v")
    ctes = _kmeans_ctes(k, n_iter, shard_count, source=source)
    fin = f"cents{n_iter}"
    ctes.append(
        f"""centsF AS (
  SELECT cell, cvec, sqrt({dot_cc}) AS cnrm FROM {fin}),
assignF AS (
  SELECT vec_id, cell, cos AS cent_cos FROM (
    SELECT e.vec_id, c.cell,
      {dot_ec} / (e.nrm * c.cnrm) AS cos,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.cell)
        AS r
    FROM embVn e CROSS JOIN centsF c) t
  WHERE r = 1),
vn AS (
  SELECT a.vec_id, a.cell, e.v, e.nrm
  FROM assignF a JOIN embVn e USING (vec_id)),
spairs AS (
  SELECT id1, id2 FROM (
    SELECT a.vec_id AS id1, b.vec_id AS id2,
      {dot_ab} / (a.nrm * b.nrm) AS cosine
    FROM vn a JOIN vn b ON a.cell = b.cell AND a.vec_id < b.vec_id) t
  WHERE cosine >= {threshold}),
adj AS (
  SELECT id1 AS node, id2 AS nbr FROM spairs
  UNION ALL
  SELECT id2 AS node, id1 AS nbr FROM spairs),
reach AS (
  SELECT vec_id AS node, vec_id AS lab FROM {source}
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
),
grp AS (SELECT node AS vec_id, MIN(lab) AS group_id FROM reach GROUP BY node),
rankedk AS (
  SELECT g.vec_id, a.cell, g.group_id, a.cent_cos,
         row_number() OVER (PARTITION BY g.group_id
                            ORDER BY a.cent_cos, g.vec_id) AS rn
  FROM grp g JOIN assignF a USING (vec_id))"""
    )
    return ctes


def embedding_semdedup_sql(
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.4,
    shard_count: int = 256,
) -> str:
    """Twin of queries_dataops.embedding_semdedup: the shared unrolled
    Lloyd chain, a final E-step that KEEPS the winning cosine (the
    typicality signal), cell-local pairwise cosine thresholding,
    recursive-CTE connected components over the ε-graph (nodes = every
    vector, so singletons are their own group), then the
    keep-the-atypical rank — lowest cent_cos first, ties to the
    smallest vec_id — all with the same IEEE fold shapes the Spark
    side computes."""
    ctes = _semdedup_ctes(k, n_iter, threshold, shard_count)
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + """
SELECT vec_id, cell, group_id, cent_cos, rn = 1 AS keep
FROM rankedk
ORDER BY vec_id"""
    )


def ivf_knn_portable_sql(k: int = 5, nprobe: int = 2, modulus: int = 50) -> str:
    """Twin of queries_dataops.ivf_knn_portable incl. the one Lloyd
    iteration: label-seeded ordered-fold centroids → nearest-centroid
    re-assignment (E-step; identical IEEE dot folds → identical argmax) →
    vec_id-ordered fold re-means (M-step) → probe + exact scoring over the
    re-assigned inverted file."""
    dim = similarity.DIM
    dot_vv = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_cc = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_qc = DOT_FOLD.format(n=dim, a="q.v", b="c.cvec")
    dot_qn = DOT_FOLD.format(n=dim, a="p.v", b="nb.v")
    return f"""WITH embL AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
embLn AS (
  SELECT vec_id, label, v, sqrt({dot_vv}) AS nrm FROM embL),
exploded AS (
  SELECT label, vec_id, CAST(i - 1 AS INTEGER) AS pos, v[i] AS val
  FROM embL, unnest(range(1, {dim} + 1)) AS u(i)),
cent_comp AS (
  SELECT label, pos,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (acc, x) -> acc + x)
      / count(*) AS mean_val
  FROM exploded GROUP BY label, pos),
cents AS (
  SELECT label, list(mean_val ORDER BY pos) AS cvec FROM cent_comp GROUP BY label),
cents_n AS (
  SELECT label, cvec, sqrt({dot_cc}) AS cnrm FROM cents),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.label AS cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.label) AS r
    FROM embLn e CROSS JOIN cents_n c) t
  WHERE r = 1),
exploded2 AS (
  SELECT a.cell, x.vec_id, x.pos, x.val
  FROM exploded x JOIN assign a USING (vec_id)),
cent2_comp AS (
  SELECT cell, pos,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (acc, x) -> acc + x)
      / count(*) AS mean_val
  FROM exploded2 GROUP BY cell, pos),
cents2 AS (
  SELECT cell, list(mean_val ORDER BY pos) AS cvec FROM cent2_comp GROUP BY cell),
cents2_n AS (
  SELECT cell, cvec, sqrt({dot_cc}) AS cnrm FROM cents2),
queries AS (
  SELECT vec_id, v, nrm FROM embLn WHERE vec_id % {modulus} = 0),
probes AS (
  SELECT q.vec_id AS query_id, c.cell, q.v, q.nrm,
    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {dot_qc} / (q.nrm * c.cnrm) DESC, c.cell) AS pr
  FROM queries q CROSS JOIN cents2_n c),
scored AS (
  SELECT p.query_id, nb.vec_id AS neighbor_id,
    {dot_qn} / (p.nrm * nb.nrm) AS cosine
  FROM (SELECT query_id, cell, v, nrm FROM probes WHERE pr <= {nprobe}) p
  JOIN assign an ON an.cell = p.cell
  JOIN embLn nb ON nb.vec_id = an.vec_id
  WHERE nb.vec_id <> p.query_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}"""


def _ivfpq_train_ctes(m: int = 8, k_codes: int = 16) -> str:
    """The IVFPQ TRAINING CTE chain (shared by the search twin and the
    incremental-append twin): label-seeded ordered-fold coarse
    centroids, one Lloyd E+M refinement (cents2 = refined means over
    the stage-1 cosine assignment), residuals, PQ codebook training on
    the residuals (seed from the k smallest vec_ids + one Lloyd step).
    Ends at ``cb_d`` (codebooks + self-dots); callers append their own
    encode/search CTEs."""
    dim = similarity.DIM
    subdim = dim // m
    dot_vv = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_cc_full = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_ss = DOT_FOLD.format(n=subdim, a="sv", b="sv")
    dot_cb = DOT_FOLD.format(n=subdim, a="cbvec", b="cbvec")
    dot_dcb = DOT_FOLD.format(n=subdim, a="d.sv", b="c.cbvec")
    return f"""embL AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
embLn AS (
  SELECT vec_id, label, v, sqrt({dot_vv}) AS nrm FROM embL),
exploded AS (
  SELECT label, vec_id, CAST(i - 1 AS INTEGER) AS pos, v[i] AS val
  FROM embL, unnest(range(1, {dim} + 1)) AS u(i)),
cent_comp AS (
  SELECT label, pos,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (acc, x) -> acc + x)
      / count(*) AS mean_val
  FROM exploded GROUP BY label, pos),
cents AS (
  SELECT label, list(mean_val ORDER BY pos) AS cvec FROM cent_comp GROUP BY label),
cents_n AS (
  SELECT label, cvec, sqrt({dot_cc_full}) AS cnrm FROM cents),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.label AS cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC, c.label) AS r
    FROM embLn e CROSS JOIN cents_n c) t
  WHERE r = 1),
exploded2 AS (
  SELECT a.cell, x.vec_id, x.pos, x.val
  FROM exploded x JOIN assign a USING (vec_id)),
cent2_comp AS (
  SELECT cell, pos,
    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)), (acc, x) -> acc + x)
      / count(*) AS mean_val
  FROM exploded2 GROUP BY cell, pos),
cents2 AS (
  SELECT cell, list(mean_val ORDER BY pos) AS cvec FROM cent2_comp GROUP BY cell),
res AS (
  SELECT e.vec_id, a.cell,
    list_transform(range(1, {dim} + 1), i -> e.v[i] - c.cvec[i]) AS rv
  FROM embL e JOIN assign a USING (vec_id)
  JOIN cents2 c ON c.cell = a.cell),
rsubs AS (
  SELECT vec_id, CAST(s AS INTEGER) AS subspace,
         rv[(s*{subdim}+1):(s*{subdim}+{subdim})] AS sv
  FROM res, unnest(range(0, {m})) AS u(s)),
rsubs_d AS (SELECT vec_id, subspace, sv, {dot_ss} AS vv FROM rsubs),
pq_seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS code
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k_codes})),
seed_cb AS (
  SELECT s.subspace, sd.code, s.sv AS cbvec
  FROM rsubs s JOIN pq_seeds sd USING (vec_id)),
seed_cb_d AS (SELECT subspace, code, cbvec, {dot_cb} AS cbcc FROM seed_cb),
pq_assign AS (
  SELECT vec_id, subspace, code FROM (
    SELECT d.vec_id, d.subspace, c.code,
      row_number() OVER (PARTITION BY d.vec_id, d.subspace
        ORDER BY (d.vv - 2 * {dot_dcb}) + c.cbcc, c.code) AS r
    FROM rsubs_d d JOIN seed_cb_d c USING (subspace)) t
  WHERE r = 1),
rdims AS (
  SELECT vec_id, subspace, CAST(i - 1 AS INTEGER) AS pos, sv[i] AS val
  FROM rsubs, unnest(range(1, {subdim} + 1)) AS u(i)),
cb_comp AS (
  SELECT a.subspace, a.code, d.pos,
    list_reduce(list_prepend(0.0, list(d.val ORDER BY d.vec_id)),
                (acc, x) -> acc + x) / count(*) AS mean_val
  FROM rdims d JOIN pq_assign a USING (vec_id, subspace)
  GROUP BY a.subspace, a.code, d.pos),
cb AS (
  SELECT subspace, code, list(mean_val ORDER BY pos) AS cbvec
  FROM cb_comp GROUP BY subspace, code),
cb_d AS (SELECT subspace, code, cbvec, {dot_cb} AS cbcc FROM cb),"""


def ivfpq_knn_portable_sql(
    m: int = 8,
    k_codes: int = 16,
    topk: int = 5,
    nprobe: int = 2,
    shortlist: int = 50,
    modulus: int = 50,
) -> str:
    """Twin of queries_dataops.ivfpq_knn_portable: the IVF twin's coarse
    quantizer CTEs (label-seeded ordered-fold centroids, one Lloyd E+M),
    then residuals (v − cell centroid), PQ codebook training on the
    residuals (seed from k smallest vec_ids + one Lloyd step), nibble
    encoding, L2²-ranked cell probes, per-(query, cell) ADC distance
    tables over the QUERY residual, subspace-ordered ADC folds,
    shortlist, exact re-rank.  Same IEEE folds → same index, same
    ranks."""
    dim = similarity.DIM
    subdim = dim // m
    dot_vv = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_cc_full = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_qc_full = DOT_FOLD.format(n=dim, a="q.v", b="c.cvec")
    dot_ss = DOT_FOLD.format(n=subdim, a="sv", b="sv")
    dot_cb = DOT_FOLD.format(n=subdim, a="cbvec", b="cbvec")
    dot_dcb = DOT_FOLD.format(n=subdim, a="d.sv", b="c.cbvec")
    dot_qcb = DOT_FOLD.format(n=subdim, a="qs.sv", b="c.cbvec")
    dot_qq = DOT_FOLD.format(n=dim, a="qe.v", b="qe.v")
    dot_qn = DOT_FOLD.format(n=dim, a="qe.v", b="ne.v")
    dot_nn = DOT_FOLD.format(n=dim, a="ne.v", b="ne.v")
    return f"""WITH {_ivfpq_train_ctes(m, k_codes)}
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT d.vec_id, d.subspace, c.code,
      row_number() OVER (PARTITION BY d.vec_id, d.subspace
        ORDER BY (d.vv - 2 * {dot_dcb}) + c.cbcc, c.code) AS r
    FROM rsubs_d d JOIN cb_d c USING (subspace)) t
  WHERE r = 1),
queries AS (
  SELECT vec_id AS query_id, v, {dot_vv} AS qq
  FROM embL WHERE vec_id % {modulus} = 0),
probes AS (
  SELECT query_id, cell, qres FROM (
    SELECT q.query_id, c.cell,
      list_transform(range(1, {dim} + 1), i -> q.v[i] - c.cvec[i]) AS qres,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY (q.qq - 2 * {dot_qc_full}) + {dot_cc_full}, c.cell) AS pr
    FROM queries q CROSS JOIN cents2 c) t
  WHERE pr <= {nprobe}),
qsubs AS (
  SELECT query_id, cell, CAST(s AS INTEGER) AS subspace,
         qres[(s*{subdim}+1):(s*{subdim}+{subdim})] AS sv
  FROM probes, unnest(range(0, {m})) AS u(s)),
qsubs_d AS (SELECT query_id, cell, subspace, sv, {dot_ss} AS vv FROM qsubs),
dist AS (
  SELECT qs.query_id, qs.cell, qs.subspace, c.code,
         (qs.vv - 2 * {dot_qcb}) + c.cbcc AS d2
  FROM qsubs_d qs JOIN cb_d c USING (subspace)),
adc AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id,
    list_reduce(list_prepend(0.0, list(t.d2 ORDER BY t.subspace)),
                (acc, x) -> acc + x) AS adc2
  FROM codes cd
  JOIN assign an USING (vec_id)
  JOIN dist t ON t.cell = an.cell AND t.subspace = cd.subspace
             AND t.code = cd.code
  WHERE cd.vec_id <> t.query_id
  GROUP BY t.query_id, cd.vec_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc2, neighbor_id) AS r
    FROM adc) t WHERE r <= {shortlist}),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
    ({dot_qq} - 2 * {dot_qn}) + {dot_nn} AS d2
  FROM short s
  JOIN embL qe ON qe.vec_id = s.query_id
  JOIN embL ne ON ne.vec_id = s.neighbor_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY d2, neighbor_id) AS INTEGER) AS rank
  FROM rerank)
SELECT query_id, neighbor_id, d2, rank FROM ranked WHERE rank <= {topk}"""


def ivfpq_index_append_sql(m: int = 8, k_codes: int = 16) -> str:
    """Twin of queries_dataops.ivfpq_index_append: the shared training
    CTE chain builds the SAME frozen index (refined cents2 + residual
    codebooks), then the synthetic batch (vec_id%17 vectors × 1.5 under
    fresh ids) is assigned to its nearest refined centroid by cosine
    (desc, cell tie-break) and residual-encoded against the existing
    codebooks — the incremental-ingest path, no retraining CTEs."""
    dim = similarity.DIM
    subdim = dim // m
    dot_vv = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_cc_full = DOT_FOLD.format(n=dim, a="cvec", b="cvec")
    dot_ec = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_ss = DOT_FOLD.format(n=subdim, a="sv", b="sv")
    dot_dcb = DOT_FOLD.format(n=subdim, a="d.sv", b="c.cbvec")
    return f"""WITH {_ivfpq_train_ctes(m, k_codes)}
cents2_n AS (
  SELECT cell, cvec, sqrt({dot_cc_full}) AS cnrm FROM cents2),
newb AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(v, x -> x * 1.5) AS v
  FROM embL WHERE vec_id % 17 = 0),
newb_n AS (SELECT vec_id, v, sqrt({dot_vv}) AS nrm FROM newb),
nassign AS (
  SELECT vec_id, cell, v FROM (
    SELECT e.vec_id, c.cell, e.v,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_ec} / (e.nrm * c.cnrm) DESC,
                                  c.cell) AS r
    FROM newb_n e CROSS JOIN cents2_n c) t
  WHERE r = 1),
nres AS (
  SELECT n.vec_id, n.cell,
         list_transform(range(1, {dim} + 1), i -> n.v[i] - c.cvec[i]) AS rv
  FROM nassign n JOIN cents2 c ON c.cell = n.cell),
nsubs AS (
  SELECT vec_id, cell, CAST(s AS INTEGER) AS subspace,
         rv[(s*{subdim}+1):(s*{subdim}+{subdim})] AS sv
  FROM nres, unnest(range(0, {m})) AS u(s)),
nsubs_d AS (SELECT vec_id, cell, subspace, sv, {dot_ss} AS vv FROM nsubs),
ncode AS (
  SELECT vec_id, cell, subspace, code FROM (
    SELECT d.vec_id, d.cell, d.subspace, c.code,
      row_number() OVER (PARTITION BY d.vec_id, d.subspace
        ORDER BY (d.vv - 2 * {dot_dcb}) + c.cbcc, c.code) AS r
    FROM nsubs_d d JOIN cb_d c USING (subspace)) t
  WHERE r = 1)
SELECT vec_id, cell, list(code ORDER BY subspace) AS codes
FROM ncode GROUP BY vec_id, cell"""


def pq_knn_portable_sql(
    m: int = 8,
    k_codes: int = 16,
    topk: int = 5,
    shortlist: int = 50,
    modulus: int = 50,
) -> str:
    """Twin of queries_dataops.pq_knn_portable: seed codebooks from the
    k smallest vec_ids (code = rank), one Lloyd E+M per subspace over
    vec_id-ordered folds, nearest-code encoding, per-query ADC distance
    tables, subspace-ordered ADC folds, shortlist by (adc2, neighbor_id),
    exact re-rank by (q·q − 2·q·n) + n·n.  Identical IEEE folds on both
    engines → identical shortlists and ranks."""
    subdim = similarity.DIM // m
    dot_ss = DOT_FOLD.format(n=subdim, a="sv", b="sv")
    dot_cc = DOT_FOLD.format(n=subdim, a="cvec", b="cvec")
    dot_dc = DOT_FOLD.format(n=subdim, a="d.sv", b="c.cvec")
    dot_qc = DOT_FOLD.format(n=subdim, a="q.sv", b="c.cvec")
    dot_qq = DOT_FOLD.format(n=similarity.DIM, a="qe.v", b="qe.v")
    dot_qn = DOT_FOLD.format(n=similarity.DIM, a="qe.v", b="ne.v")
    dot_nn = DOT_FOLD.format(n=similarity.DIM, a="ne.v", b="ne.v")
    return f"""WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT vec_id, CAST(s AS INTEGER) AS subspace,
         v[(s*{subdim}+1):(s*{subdim}+{subdim})] AS sv
  FROM emb, unnest(range(0, {m})) AS u(s)),
subs_d AS (SELECT vec_id, subspace, sv, {dot_ss} AS vv FROM subs),
seeds AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS code
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k_codes})),
seed_cb AS (
  SELECT s.subspace, sd.code, s.sv AS cvec
  FROM subs s JOIN seeds sd USING (vec_id)),
seed_cb_d AS (SELECT subspace, code, cvec, {dot_cc} AS cc FROM seed_cb),
assign AS (
  SELECT vec_id, subspace, code FROM (
    SELECT d.vec_id, d.subspace, c.code,
      row_number() OVER (PARTITION BY d.vec_id, d.subspace
        ORDER BY (d.vv - 2 * {dot_dc}) + c.cc, c.code) AS r
    FROM subs_d d JOIN seed_cb_d c USING (subspace)) t
  WHERE r = 1),
dims AS (
  SELECT vec_id, subspace, CAST(i - 1 AS INTEGER) AS pos, sv[i] AS val
  FROM subs, unnest(range(1, {subdim} + 1)) AS u(i)),
cb_comp AS (
  SELECT a.subspace, a.code, d.pos,
    list_reduce(list_prepend(0.0, list(d.val ORDER BY d.vec_id)),
                (acc, x) -> acc + x) / count(*) AS mean_val
  FROM dims d JOIN assign a USING (vec_id, subspace)
  GROUP BY a.subspace, a.code, d.pos),
cb AS (
  SELECT subspace, code, list(mean_val ORDER BY pos) AS cvec
  FROM cb_comp GROUP BY subspace, code),
cb_d AS (SELECT subspace, code, cvec, {dot_cc} AS cc FROM cb),
codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT d.vec_id, d.subspace, c.code,
      row_number() OVER (PARTITION BY d.vec_id, d.subspace
        ORDER BY (d.vv - 2 * {dot_dc}) + c.cc, c.code) AS r
    FROM subs_d d JOIN cb_d c USING (subspace)) t
  WHERE r = 1),
queries AS (
  SELECT vec_id AS query_id, subspace, sv, vv
  FROM subs_d WHERE vec_id % {modulus} = 0),
dist AS (
  SELECT q.query_id, q.subspace, c.code,
         (q.vv - 2 * {dot_qc}) + c.cc AS d2
  FROM queries q JOIN cb_d c USING (subspace)),
adc AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id,
    list_reduce(list_prepend(0.0, list(t.d2 ORDER BY t.subspace)),
                (acc, x) -> acc + x) AS adc2
  FROM codes cd
  JOIN dist t ON t.subspace = cd.subspace AND t.code = cd.code
  WHERE cd.vec_id <> t.query_id
  GROUP BY t.query_id, cd.vec_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc2, neighbor_id) AS r
    FROM adc) t WHERE r <= {shortlist}),
rerank AS (
  SELECT s.query_id, s.neighbor_id,
    ({dot_qq} - 2 * {dot_qn}) + {dot_nn} AS d2
  FROM short s
  JOIN emb qe ON qe.vec_id = s.query_id
  JOIN emb ne ON ne.vec_id = s.neighbor_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY d2, neighbor_id) AS INTEGER) AS rank
  FROM rerank)
SELECT query_id, neighbor_id, d2, rank FROM ranked WHERE rank <= {topk}"""


def multimodal_metadata_sql() -> str:
    return """SELECT doc_id, 'text' AS media_type,
  CAST(octet_length(encode(text)) AS INTEGER) AS payload_size,
  'txt' AS format
FROM documents"""


def multimodal_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_profile: the metadata projection
    joined with the ANALYTIC form of the PPM decode stats.  The synthetic
    P6 payload for doc d is (4 + d%5) × (3 + d%4) with row y a constant
    color ((d+y)%256, (2d+3y)%256, (5d+7y)%256), so the per-channel pixel
    sums are w × Σ_y of those row values — what the Spark side's REAL
    numpy decode must reproduce from the actual bytes."""
    return """WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
row_sums AS (
  SELECT doc_id, w, h,
    CAST(SUM((doc_id + y) % 256) * w AS BIGINT) AS sum_r,
    CAST(SUM((2 * doc_id + 3 * y) % 256) * w AS BIGINT) AS sum_g,
    CAST(SUM((5 * doc_id + 7 * y) % 256) * w AS BIGINT) AS sum_b
  FROM dims, unnest(range(0, h)) AS u(y)
  GROUP BY doc_id, w, h)
SELECT d.doc_id, 'text' AS media_type,
  CAST(octet_length(encode(d.text)) AS INTEGER) AS payload_size,
  'txt' AS format,
  CAST(s.w AS INTEGER) AS img_w, CAST(s.h AS INTEGER) AS img_h,
  CAST(s.w * s.h AS BIGINT) AS n_pixels,
  s.sum_r, s.sum_g, s.sum_b
FROM documents d JOIN row_sums s USING (doc_id)"""


def multimodal_png_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_png_profile: the analytic form
    of the PNG decode stats.  synth_png pixels share synth_ppm's closed
    form (w = 4 + d%5, h = 3 + d%4, row y a constant color), so the
    per-channel sums are the same row_sums CTE — what the Spark side's
    REAL zlib-inflate + filter-reconstruction decode must reproduce from
    the actual compressed bytes."""
    return """WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
row_sums AS (
  SELECT doc_id, w, h,
    CAST(SUM((doc_id + y) % 256) * w AS BIGINT) AS sum_r,
    CAST(SUM((2 * doc_id + 3 * y) % 256) * w AS BIGINT) AS sum_g,
    CAST(SUM((5 * doc_id + 7 * y) % 256) * w AS BIGINT) AS sum_b
  FROM dims, unnest(range(0, h)) AS u(y)
  GROUP BY doc_id, w, h)
SELECT doc_id,
  CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
  CAST(w * h AS BIGINT) AS n_pixels,
  sum_r, sum_g, sum_b
FROM row_sums"""


def multimodal_jpeg_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_jpeg_profile: the analytic form
    of the LOSSY baseline-JPEG round trip on synth_jpeg's constant 8×8
    blocks.  A constant block quantizes to a DC-only spectrum, so the
    decoded color is a closed float-op chain replicated here TERM FOR
    TERM from the codec (multimodal._encode_jpeg/_decode_jpeg):
    RGB→YCbCr with the encoder's literal coefficients and floor(x+0.5)
    rounding; the pinned-order DCT folds (8-term left fold of
    ash·B₀₀, then of B₀₀·t); DC quantization floor(S/Q + 0.5) with
    Q₀₀ = 16 (luma) / 17 (chroma, Annex K); dequant; the pinned IDCT
    product (B₀₀·R)·B₀₀; floor(x + 128.5) clamp; and YCbCr→RGB with the
    decoder's literal coefficients.  Any wrong byte in the Huffman/DPCM/
    stuffing layers changes the DC that reaches the IDCT and breaks the
    hash."""
    from ..operators import multimodal

    ac = repr(multimodal.jpeg_dc_basis())
    qlum = multimodal._JPEG_QLUM[0][0]
    qchrom = multimodal._JPEG_QCHROM[0][0]

    def d(x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    def fold8(p: str) -> str:
        e = "0.0"
        for _ in range(8):
            e = f"({e} + {p})"
        return e

    def clamp_floor(x: str) -> str:
        return f"CAST(LEAST(GREATEST(floor({x}), 0.0), 255.0) AS BIGINT)"

    def dc_roundtrip(ch: str, q: int) -> str:
        """decoded channel value from the integer YCbCr input column."""
        p = f"({d(f'{ch} - 128')} * {ac})"
        t0 = fold8(p)
        qq = f"({ac} * {t0})"
        s00 = fold8(qq)
        sq = f"CAST(floor(({s00} / {d(str(q))}) + 0.5) AS BIGINT)"
        rr = f"({sq} * {q})"
        out = f"(({ac} * {d(rr)}) * {ac})"
        return clamp_floor(f"({out} + 128.5)")

    return f"""WITH ids AS (SELECT doc_id AS i FROM documents),
blocks AS (
  SELECT i, bxx.bx AS bx, byy.by AS by,
    (i + 5 * bxx.bx + 11 * byy.by) % 256 AS r0,
    (2 * i + 7 * bxx.bx + 3 * byy.by) % 256 AS g0,
    (5 * i + bxx.bx + 13 * byy.by) % 256 AS b0
  FROM ids,
    unnest(range(0, 1 + i % 3)) AS bxx(bx),
    unnest(range(0, 1 + i % 2)) AS byy(by)),
ycc AS (
  SELECT i, bx, by,
    {clamp_floor(f"((({d('0.299')} * {d('r0')}) + ({d('0.587')} * {d('g0')})) + ({d('0.114')} * {d('b0')})) + 0.5")} AS y_i,
    {clamp_floor(f"((({d('128')} - ({d('0.168736')} * {d('r0')})) - ({d('0.331264')} * {d('g0')})) + ({d('0.5')} * {d('b0')})) + 0.5")} AS cb_i,
    {clamp_floor(f"((({d('128')} + ({d('0.5')} * {d('r0')})) - ({d('0.418688')} * {d('g0')})) - ({d('0.081312')} * {d('b0')})) + 0.5")} AS cr_i
  FROM blocks),
dec AS (
  SELECT i, bx, by,
    {dc_roundtrip('y_i', qlum)} AS dy,
    {dc_roundtrip('cb_i', qchrom)} AS dcb,
    {dc_roundtrip('cr_i', qchrom)} AS dcr
  FROM ycc),
rgb AS (
  SELECT i,
    {clamp_floor(f"(({d('dy')} + ({d('1.402')} * ({d('dcr')} - 128.0))) + 0.5)")} AS dr,
    {clamp_floor(f"((({d('dy')} - ({d('0.344136')} * ({d('dcb')} - 128.0))) - ({d('0.714136')} * ({d('dcr')} - 128.0))) + 0.5)")} AS dg,
    {clamp_floor(f"(({d('dy')} + ({d('1.772')} * ({d('dcb')} - 128.0))) + 0.5)")} AS db
  FROM dec)
SELECT i AS doc_id,
  CAST(8 * (1 + i % 3) AS INTEGER) AS img_w,
  CAST(8 * (1 + i % 2) AS INTEGER) AS img_h,
  CAST(64 * (1 + i % 3) * (1 + i % 2) AS BIGINT) AS n_pixels,
  CAST(SUM(64 * dr) AS BIGINT) AS sum_r,
  CAST(SUM(64 * dg) AS BIGINT) AS sum_g,
  CAST(SUM(64 * db) AS BIGINT) AS sum_b
FROM rgb GROUP BY i"""


def multimodal_gif_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_gif_profile — synth_gif pixels
    share synth_ppm's closed form, so the analytic stats are the same
    row_sums CTE the PPM/PNG twins use; the Spark side must reproduce
    them from real LZW-compressed bytes."""
    return """WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
row_sums AS (
  SELECT doc_id, w, h,
    CAST(SUM((doc_id + y) % 256) * w AS BIGINT) AS sum_r,
    CAST(SUM((2 * doc_id + 3 * y) % 256) * w AS BIGINT) AS sum_g,
    CAST(SUM((5 * doc_id + 7 * y) % 256) * w AS BIGINT) AS sum_b
  FROM dims, unnest(range(0, h)) AS u(y)
  GROUP BY doc_id, w, h)
SELECT doc_id,
  CAST(w AS INTEGER) AS img_w, CAST(h AS INTEGER) AS img_h,
  CAST(w * h AS BIGINT) AS n_pixels,
  sum_r, sum_g, sum_b
FROM row_sums"""


def multimodal_audio_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_audio_profile: the analytic
    form of the WAV decode stats.  The synthetic PCM stream for doc d is
    n = 20 + d%13 mono samples, sample t = ((7d + 31t) mod 2048) − 1024,
    so peak / sum|s| / Σs² reduce to closed-form aggregates — what the
    Spark side's REAL numpy chunk-walk decode must reproduce from the
    actual RIFF bytes."""
    return """WITH dims AS (
  SELECT doc_id, 20 + doc_id % 13 AS n FROM documents),
samples AS (
  SELECT doc_id, n, ((7 * doc_id + 31 * t) % 2048) - 1024 AS s
  FROM dims, unnest(range(0, n)) AS u(t))
SELECT doc_id,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(1 AS INTEGER) AS n_channels,
  CAST(n AS BIGINT) AS n_samples,
  CAST(MAX(abs(s)) AS INTEGER) AS peak,
  CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
  CAST(SUM(s * s) AS BIGINT) AS sum_sq
FROM samples GROUP BY doc_id, n"""


def multimodal_mp3_sideinfo_sql() -> str:
    """Twin of queries_dataops.multimodal_mp3_sideinfo: synth_mp3's
    frame fill is fill[j] = (7·id + 13·f + j) mod 256, so the first 7
    side-info bytes — and therefore the fixed-offset bitfields the
    Spark side must recover from the REAL bytes — are analytic: pack
    the 56-bit window as Σ fill[j]·256^(6−j), then shift/mask."""
    byte_terms = " + ".join(
        f"((7 * doc_id + 13 * f.frame_idx + {j}) % 256) "
        f"* CAST({1 << (8 * (6 - j))} AS BIGINT)"
        for j in range(7)
    )
    return f"""WITH f AS (
  SELECT doc_id, CAST(u.fi AS BIGINT) AS frame_idx
  FROM documents, unnest(range(0, 3 + doc_id % 4)) AS u(fi)),
b AS (
  SELECT doc_id, frame_idx, {byte_terms} AS bits FROM f)
SELECT doc_id, frame_idx,
  (bits >> 47) & 511 AS main_data_begin,
  (bits >> 36) & 255 AS scfsi,
  (bits >> 24) & 4095 AS part2_3_length,
  (bits >> 15) & 511 AS big_values,
  (bits >> 7) & 255 AS global_gain
FROM b"""


def multimodal_mp3_decode_sql() -> str:
    """Twin of queries_dataops.multimodal_mp3_decode: synth_mp3_coded's
    decoded spectral values are pure functions of (id, frame, pair) —
    x = (3i+5f+7k) % M, y = (2i+3f+11k) % M, negated when (i+f+k)%2 —
    with M, the Huffman table id, the linbits width and the slen
    scalefactor bit count all analytic, so every aggregate the Spark
    side must recover by actually WALKING the coded bits (prefix
    lengths, escapes, sign bits, part2_3_length) reduces to exact
    integer SQL."""
    linbits_tab = "[1,2,3,4,6,8,10,13]"
    s1_tab = "[0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]"
    s2_tab = "[0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]"
    return f"""WITH f AS (
  SELECT doc_id, CAST(u.fi AS BIGINT) AS frame_idx
  FROM documents, unnest(range(0, 1 + doc_id % 2)) AS u(fi)),
geom AS (
  SELECT doc_id, frame_idx,
    CASE WHEN (doc_id + frame_idx) % 3 = 0 THEN 1
         ELSE 16 + (doc_id + frame_idx) % 8 END AS huff_table,
    CASE WHEN (doc_id + frame_idx) % 3 = 0 THEN 0
         ELSE {linbits_tab}[(doc_id + frame_idx) % 8 + 1] END AS linbits,
    6 + (doc_id + frame_idx) % 5 AS n_pairs,
    {s1_tab}[(doc_id + frame_idx) % 16 + 1] AS s1,
    {s2_tab}[(doc_id + frame_idx) % 16 + 1] AS s2
  FROM f),
geom2 AS (
  SELECT *, CASE WHEN linbits = 0 THEN 2
                 ELSE 16 + least((1 << linbits) - 1, 14) END AS m
  FROM geom),
pairs AS (
  SELECT g.*, CAST(u.k AS BIGINT) AS k,
    (3 * doc_id + 5 * frame_idx + 7 * u.k) % m AS x,
    (2 * doc_id + 3 * frame_idx + 11 * u.k) % m AS y,
    (doc_id + frame_idx + u.k) % 2 = 1 AS neg
  FROM geom2 g, unnest(range(0, n_pairs)) AS u(k)),
scored AS (
  SELECT doc_id, frame_idx, huff_table, linbits, n_pairs, s1, s2,
    (CASE WHEN neg AND x <> 0 THEN -x ELSE x END)
      + (CASE WHEN neg AND y <> 0 THEN -y ELSE y END) AS sv,
    x + y AS sa,
    greatest(x, y) AS mx,
    (CASE WHEN linbits > 0 AND x >= 15 THEN 1 ELSE 0 END)
      + (CASE WHEN linbits > 0 AND y >= 15 THEN 1 ELSE 0 END) AS esc,
    (CASE WHEN huff_table = 1
          THEN CASE x * 2 + y WHEN 0 THEN 1 WHEN 1 THEN 3
                              WHEN 2 THEN 2 ELSE 3 END
          ELSE 8 END)
      + linbits * ((CASE WHEN linbits > 0 AND x >= 15 THEN 1 ELSE 0 END)
                   + (CASE WHEN linbits > 0 AND y >= 15 THEN 1 ELSE 0 END))
      + (CASE WHEN x <> 0 THEN 1 ELSE 0 END)
      + (CASE WHEN y <> 0 THEN 1 ELSE 0 END) AS bits
  FROM pairs),
c1bits AS (
  SELECT g.doc_id, g.frame_idx, CAST(u.q AS BIGINT) AS q,
         CAST(u2.p AS BIGINT) AS p,
    CASE u2.p WHEN 0 THEN (g.doc_id + g.frame_idx + u.q) % 2
              WHEN 1 THEN (g.doc_id + 2 * g.frame_idx + 3 * u.q) % 2
              WHEN 2 THEN (2 * g.doc_id + g.frame_idx + 5 * u.q) % 2
              ELSE (g.doc_id + 3 * g.frame_idx + 7 * u.q) % 2 END AS bit,
    (g.doc_id + g.frame_idx + u.q + u2.p) % 2 = 1 AS neg
  FROM geom g,
       unnest(range(0, 2 + (g.doc_id + g.frame_idx) % 3)) AS u(q),
       unnest(range(0, 4)) AS u2(p)),
c1 AS (
  SELECT doc_id, frame_idx,
    CAST(2 + (doc_id + frame_idx) % 3 AS INTEGER) AS n_count1,
    CAST(SUM(CASE WHEN bit = 0 THEN 0
                  WHEN neg THEN -1 ELSE 1 END) AS BIGINT) AS sum_count1,
    CAST(4 * (2 + (doc_id + frame_idx) % 3) + SUM(bit) AS INTEGER)
      AS c1_bits
  FROM c1bits GROUP BY doc_id, frame_idx)
SELECT s.doc_id, s.frame_idx,
  CAST(huff_table AS INTEGER) AS huff_table,
  CAST(2 * n_pairs AS INTEGER) AS n_values,
  CAST(SUM(sv) AS BIGINT) AS sum_values,
  CAST(SUM(sa) AS BIGINT) AS sum_abs,
  CAST(MAX(mx) AS BIGINT) AS max_abs,
  CAST(SUM(esc) AS INTEGER) AS n_escapes,
  CAST(11 * s1 + 10 * s2 + SUM(bits) + ANY_VALUE(c1.c1_bits) AS INTEGER)
    AS bits_read,
  ANY_VALUE(c1.n_count1) AS n_count1,
  ANY_VALUE(c1.sum_count1) AS sum_count1
FROM scored s
JOIN c1 ON c1.doc_id = s.doc_id AND c1.frame_idx = s.frame_idx
GROUP BY s.doc_id, s.frame_idx, huff_table, n_pairs, s1, s2"""


def multimodal_mkv_probe_sql() -> str:
    """Twin of queries_dataops.multimodal_mkv_probe: synth_mkv geometry
    is analytic — 2 + id%3 PPM frames of 11 header + 192 pixel bytes
    (8×8×3), packed 2 SimpleBlocks per Cluster — so every probe field
    the REAL EBML walk recovers from the bytes is a pure integer
    function of the id."""
    return """SELECT doc_id,
  CAST(((2 + doc_id % 3) + 1) // 2 AS BIGINT) AS n_clusters,
  CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
  CAST(203 * (2 + doc_id % 3) AS BIGINT) AS total_frame_bytes,
  CAST(203 AS BIGINT) AS first_frame_size
FROM documents"""


def multimodal_mp3_probe_sql() -> str:
    """Twin of queries_dataops.multimodal_mp3_probe: the synth_mp3
    stream geometry derived analytically — frame count 3 + id%4, CBR
    (index 1 + id%14) for ids divisible by 3 else per-frame VBR indices
    1 + (id+f)%14, MPEG-1 Layer III frame length (144·bitrate)//44100
    plus the (id+f)%2 padding bit — what the Spark side's REAL header
    walk must recover from the actual bytes."""
    table = "[0,32,40,48,56,64,80,96,112,128,160,192,224,256,320]"
    return f"""WITH dims AS (
  SELECT doc_id, 3 + doc_id % 4 AS n FROM documents),
frames AS (
  SELECT doc_id, n,
    (144 * ({table}[
       CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 14
            ELSE 1 + (doc_id + f) % 14 END + 1] * 1000)) // 44100
      + (doc_id + f) % 2 AS flen
  FROM dims, unnest(range(0, n)) AS u(f))
SELECT doc_id,
  CAST(n AS INTEGER) AS n_frames,
  CAST(44100 AS INTEGER) AS samplerate,
  CAST(n * 1152 AS BIGINT) AS n_samples,
  CAST(SUM(flen) AS BIGINT) AS total_frame_bytes,
  doc_id % 3 <> 0 AS is_vbr,
  doc_id % 2 = 1 AS has_id3
FROM frames GROUP BY doc_id, n"""


def multimodal_g711_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_g711_profile: the analytic
    µ-law expansion of the synthetic companded stream.  Byte t of doc d
    is (3d + 7t) mod 256; G.711 µ-law expansion is pure integer
    arithmetic (complement, biased mantissa shifted by segment, sign),
    so the decoded-stream stats reduce to exact SQL aggregates — what
    the Spark side's REAL table-driven RIFF decode must reproduce."""
    return """WITH dims AS (
  SELECT doc_id, 16 + doc_id % 11 AS n FROM documents),
bytes AS (
  SELECT doc_id, n, 255 - ((3 * doc_id + 7 * t) % 256) AS u
  FROM dims, unnest(range(0, n)) AS v(t)),
expanded AS (
  SELECT doc_id, n,
    CASE WHEN u >= 128
         THEN 132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
         ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
    END AS s
  FROM bytes)
SELECT doc_id,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(1 AS INTEGER) AS n_channels,
  CAST(n AS BIGINT) AS n_samples,
  CAST(MAX(abs(s)) AS INTEGER) AS peak,
  CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
  CAST(SUM(s * s) AS BIGINT) AS sum_sq
FROM expanded GROUP BY doc_id, n"""


def multimodal_features_sql() -> str:
    """Twin of queries_dataops.multimodal_features: the REAL-decode
    feature vector [w, h, mean_r, mean_g, mean_b] derived analytically.
    Means are the numpy integer floor divisions sum_c // (w·h); the P6
    payload size is the 11-byte header ('P6\\n{w} {h}\\n255\\n' — w, h are
    single digits by construction) plus 3·w·h pixel bytes."""
    return """WITH dims AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
sums AS (
  SELECT doc_id, w, h,
    SUM((doc_id + y) % 256) * w AS sum_r,
    SUM((2 * doc_id + 3 * y) % 256) * w AS sum_g,
    SUM((5 * doc_id + 7 * y) % 256) * w AS sum_b
  FROM dims, unnest(range(0, h)) AS u(y)
  GROUP BY doc_id, w, h)
SELECT doc_id, 'image' AS media_type,
  CAST(11 + 3 * w * h AS INTEGER) AS payload_size,
  [CAST(w AS INTEGER), CAST(h AS INTEGER),
   CAST(sum_r // (w * h) AS INTEGER),
   CAST(sum_g // (w * h) AS INTEGER),
   CAST(sum_b // (w * h) AS INTEGER)] AS feature,
  'ppm-numpy' AS decoder
FROM sums"""


def dedup_span_coverage_sql(
    n: int = 8, min_docs: int = 2, max_coverage_pct: int = 50
) -> str:
    """Twin of queries_dataops.dedup_span_coverage: identical positioned
    n-gram construction (1-based list_slice vs Spark's slice), the same
    distinct-doc gram threshold, position-set union via DISTINCT, and
    the same integer-exact keep comparison; the one double is the same
    exactly-rounded covered/n_tokens division."""
    return f"""
WITH sized AS (
  SELECT doc_id, {TOKENS} AS t FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS gram
  FROM sized, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
dupg AS (
  SELECT gram FROM g GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
cov AS (
  SELECT DISTINCT g.doc_id, cp
  FROM g JOIN dupg USING (gram), unnest(range(g.pos, g.pos + {n})) AS c(cp)
),
cnt AS (SELECT doc_id, count(*) AS covered_tokens FROM cov GROUP BY doc_id)
SELECT b.doc_id, len(b.t) AS n_tokens,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CASE WHEN len(b.t) = 0 THEN 0.0
            ELSE CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE)
                 / CAST(len(b.t) AS DOUBLE) END AS dup_coverage,
       (COALESCE(c.covered_tokens, 0) * 100
          <= len(b.t) * {max_coverage_pct}) AS keep
FROM sized b LEFT JOIN cnt c USING (doc_id)
ORDER BY doc_id
"""


def dedup_span_screen_sql(
    n: int = 8,
    min_docs: int = 2,
    max_coverage_pct: int = 50,
    batch_mod: int = 13,
) -> str:
    """Twin of queries_dataops.dedup_span_screen: dup grams from the
    CORPUS slice only (doc_id%mod <> 0), coverage scored for the batch
    slice — otherwise identical construction to the symmetric
    dedup_span_coverage twin."""
    return f"""
WITH sized AS (
  SELECT doc_id, {TOKENS} AS t FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS gram
  FROM sized, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
dupg AS (
  SELECT gram FROM g WHERE doc_id % {batch_mod} <> 0 GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
cov AS (
  SELECT DISTINCT g.doc_id, cp
  FROM g JOIN dupg USING (gram), unnest(range(g.pos, g.pos + {n})) AS c(cp)
  WHERE g.doc_id % {batch_mod} = 0
),
cnt AS (SELECT doc_id, count(*) AS covered_tokens FROM cov GROUP BY doc_id)
SELECT b.doc_id, len(b.t) AS n_tokens,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CASE WHEN len(b.t) = 0 THEN 0.0
            ELSE CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE)
                 / CAST(len(b.t) AS DOUBLE) END AS dup_coverage,
       (COALESCE(c.covered_tokens, 0) * 100
          <= len(b.t) * {max_coverage_pct}) AS keep
FROM sized b LEFT JOIN cnt c USING (doc_id)
WHERE b.doc_id % {batch_mod} = 0
ORDER BY b.doc_id
"""


def embedding_communities_sql(
    threshold: float = 0.35, n_iter: int = 3, n_docs: int | None = None
) -> str:
    """Twin of queries_dataops.embedding_communities: verbatim
    embedding_dup_pairs CTE symmetrized, then one unrolled CTE pair per
    synchronous LPA iteration — vote counts, then the per-node argmax
    (count DESC, label ASC) via row_number; Spark computes the same
    argmax as max(struct(count, −label)), an identical integer
    function, so the twin needs no float care at all."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    ctes = [
        f"""pairs AS (
{pairs_sql}
),
e AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
lab0 AS (
  SELECT DISTINCT src AS node, src AS label FROM e)"""
    ]
    for k in range(1, n_iter + 1):
        ctes.append(
            f"""v{k} AS (
  SELECT e.dst AS node, l.label, count(*) AS c
  FROM e JOIN lab{k - 1} l ON l.node = e.src
  GROUP BY e.dst, l.label),
lab{k} AS (
  SELECT node, label FROM (
    SELECT node, label,
      row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS r
    FROM v{k}) t
  WHERE r = 1)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS vec_id, label AS community FROM lab{n_iter} ORDER BY node"""
    )


def embedding_kcore_sql(
    threshold: float = 0.15,
    k: int = 2,
    n_iter: int = 8,
    n_docs: int | None = None,
) -> str:
    """Twin of queries_dataops.embedding_kcore: verbatim
    embedding_dup_pairs CTE symmetrized, then one unrolled CTE pair per
    synchronous peel round (combinable degree count, ≥k keep set, edge
    restriction on both endpoints) — pure integer degrees, no float
    care needed."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    # every e{r} is referenced TWICE by round r+1 (degree count + edge
    # restriction) and keep{r} twice by its own round — without AS
    # MATERIALIZED DuckDB inlines CTEs per reference, so the chain
    # re-evaluates e0 (and the whole pairs CTE) 2^n_iter times and dies
    # on file handles before it dies on time
    ctes = [
        f"""pairs AS MATERIALIZED (
{pairs_sql}
),
e0 AS MATERIALIZED (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs)"""
    ]
    for r in range(1, n_iter + 1):
        ctes.append(
            f"""keep{r} AS MATERIALIZED (
  SELECT src FROM e{r - 1} GROUP BY src HAVING count(*) >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r - 1} e
  JOIN keep{r} ks ON e.src = ks.src
  JOIN keep{r} kd ON e.dst = kd.src)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT src AS vec_id, count(*) AS degree
FROM e{n_iter}
GROUP BY src
ORDER BY vec_id"""
    )


def multimodal_bmp_profile_sql() -> str:
    """Twin of queries_dataops.multimodal_bmp_profile: synth_bmp pixels
    share synth_ppm's closed form, so the analytic per-channel sums are
    the same row_sums CTE the PNG/GIF twins use — what the REAL
    header/stride/row-flip/BGR decode must reproduce from the actual
    file bytes."""
    return multimodal_png_profile_sql()


def dedup_span_strip_sql(n: int = 8, min_docs: int = 2) -> str:
    """Twin of queries_dataops.dedup_span_strip: the span_coverage CTE
    chain up to the covered-position set, then a NOT EXISTS anti-join
    of positioned tokens against it and an ORDER BY pos string_agg —
    Spark's array_sort(collect_list(struct(pos,tok))) fold is the same
    ordered reassembly.  Pure integer/string — no float anywhere."""
    return f"""
WITH sized AS (
  SELECT doc_id, {TOKENS} AS t FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS gram
  FROM sized, unnest(range(1, len(t) - {n} + 2)) AS u(i)
  WHERE len(t) >= {n}
),
dupg AS (
  SELECT gram FROM g GROUP BY gram
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
cov AS (
  SELECT DISTINCT g.doc_id, cp AS pos
  FROM g JOIN dupg USING (gram), unnest(range(g.pos, g.pos + {n})) AS c(cp)
),
tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM sized, unnest(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS stripped_text
  FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM cov WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
  GROUP BY doc_id
)
SELECT b.doc_id, len(b.t) AS n_tokens,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.stripped_text, '') AS stripped_text
FROM sized b LEFT JOIN kept k USING (doc_id)
ORDER BY doc_id
"""


def knn_recall_eval_sql(k: int = 5, nprobe: int = 2, modulus: int = 50) -> str:
    """Twin of queries_dataops.knn_recall_eval: the two already-verified
    knn twins verbatim as nested CTEs, one (query_id, neighbor_id)
    overlap join, and the single exactly-rounded n_hits/n_exact
    division."""
    return f"""
WITH exact AS (
{knn_bruteforce_sql(k, modulus)}
),
approx AS (
{ivf_knn_portable_sql(k, nprobe, modulus)}
),
hits AS (
  SELECT e.query_id, count(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
base AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
SELECT b.query_id, b.n_exact, COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
         / CAST(b.n_exact AS DOUBLE) AS recall
FROM base b LEFT JOIN hits h USING (query_id)
ORDER BY query_id
"""


def dedup_snm_pairs_sql(
    key_len: int = 24, window: int = 8, threshold: float = 0.5
) -> str:
    """Twin of queries_dataops.dedup_snm_pairs: one global row_number
    over the same (key, doc_id) order the Spark side assembles from
    shard-local ranks + shard offsets (prefix shards are contiguous in
    key order, so the two are the same integer), a rank-band self-join,
    and the identical filter-count Jaccard over distinct token lists —
    integer counts under one exactly-rounded division."""
    return f"""
WITH keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                1, {key_len}) AS key,
         list_distinct({TOKENS}) AS t
  FROM documents),
ranked AS (
  SELECT doc_id, t,
         row_number() OVER (ORDER BY key, doc_id) AS r
  FROM keyed),
scored AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, b.r - a.r AS rank_gap,
         len(list_filter(a.t, x -> list_contains(b.t, x))) AS inter,
         len(a.t) + len(b.t) AS tot
  FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND {window})
SELECT doc1, doc2, rank_gap,
       CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE) AS jaccard
FROM scored
WHERE tot - inter > 0
  AND CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE)
        >= CAST({threshold!r} AS DOUBLE)
ORDER BY doc1, doc2"""


def dedup_editdist_pairs_sql(
    key_len: int = 24,
    window: int = 8,
    prefix_len: int = 256,
    threshold: float = 0.8,
) -> str:
    """Twin of queries_dataops.dedup_editdist_pairs: the same global
    (key, doc_id) rank the Spark side assembles from shard-local ranks
    + offsets, the rank-band self-join, and byte-Levenshtein over the
    ASCII-normalized prefix (== Spark's codepoint Levenshtein on pure
    ASCII input) under one exactly-rounded division."""
    return f"""
WITH keyed AS (
  SELECT doc_id,
         regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
  FROM documents),
ranked AS (
  SELECT doc_id, substr(norm, 1, {prefix_len}) AS n,
         row_number() OVER (
           ORDER BY substr(norm, 1, {key_len}), doc_id) AS r
  FROM keyed),
scored AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, b.r - a.r AS rank_gap,
         levenshtein(a.n, b.n) AS edit_dist,
         greatest(len(a.n), len(b.n)) AS m
  FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND {window})
SELECT doc1, doc2, rank_gap, CAST(edit_dist AS INTEGER) AS edit_dist,
       CAST(1 AS DOUBLE) - CAST(edit_dist AS DOUBLE) / CAST(m AS DOUBLE)
         AS edit_sim
FROM scored
WHERE m > 0
  AND CAST(1 AS DOUBLE) - CAST(edit_dist AS DOUBLE) / CAST(m AS DOUBLE)
        >= CAST({threshold!r} AS DOUBLE)
ORDER BY doc1, doc2"""


def embedding_bfs_dist_sql(
    threshold: float = 0.35, max_hops: int = 3, n_docs: int | None = None
) -> str:
    """Twin of queries_dataops.embedding_bfs_dist: the verbatim
    embedding_dup_pairs CTE symmetrized, then a RECURSIVE CTE whose
    UNION dedups (node, dist) pairs per level (terminating at the hop
    cap) with the final min(dist) per node — exactly the groupBy-min
    the Spark unroll converges to.  Pure integers throughout; same
    planner-sized default geometry as the Spark side."""
    pairs_sql = embedding_dup_pairs_sql(threshold, n_docs=n_docs)
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
e AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2, id1 FROM pairs),
reach(node, dist) AS (
  SELECT vec_id, 0 FROM embeddings WHERE label = 0
  UNION
  SELECT e.dst, r.dist + 1
  FROM reach r JOIN e ON e.src = r.node
  WHERE r.dist < {max_hops})
SELECT node AS vec_id, CAST(min(dist) AS INTEGER) AS dist
FROM reach GROUP BY node ORDER BY node"""


def corpus_weighted_median_sql() -> str:
    """Twin of queries_dataops.corpus_weighted_median: the identical
    cumulative-weight window over (n_chars, doc_id) and the same
    2·cumw ≥ W suffix rule, taking the first qualifying row per source
    — pure integers throughout."""
    return f"""
WITH toks AS (
  SELECT source, doc_id, n_chars,
         CAST(len({TOKENS}) AS BIGINT) AS w
  FROM documents),
cum AS (
  SELECT source, doc_id, n_chars, w,
         SUM(w) OVER (PARTITION BY source ORDER BY n_chars, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumw,
         SUM(w) OVER (PARTITION BY source) AS total
  FROM toks),
med AS (
  SELECT source, min(n_chars ORDER BY n_chars, doc_id) AS w_median_chars
  FROM cum WHERE 2 * cumw >= total GROUP BY source),
stats AS (
  SELECT source, count(*) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS total_tokens
  FROM toks GROUP BY source)
SELECT s.source, s.n_docs, s.total_tokens, m.w_median_chars
FROM stats s JOIN med m ON m.source = s.source
ORDER BY s.source"""


def knn_label_vote_sql(k: int = 5, modulus: int = 50) -> str:
    """Twin of queries_dataops.knn_label_vote: the verbatim
    knn_bruteforce twin as a CTE, the same (votes DESC, label ASC)
    argmax via row_number, and the truth join — integer-exact on top
    of the bit-exact neighbor set."""
    return f"""
WITH nn AS (
{knn_bruteforce_sql(k=k, modulus=modulus)}
),
v AS (
  SELECT n.query_id, e.label, count(*) AS c
  FROM nn n JOIN embeddings e ON e.vec_id = n.neighbor_id
  GROUP BY 1, 2),
pred AS (
  SELECT query_id, label AS predicted_label, c AS n_votes
  FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY c DESC, label) AS r FROM v) t
  WHERE r = 1)
SELECT p.query_id, p.predicted_label, p.n_votes,
       e.label AS true_label,
       p.predicted_label = e.label AS correct
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
ORDER BY p.query_id"""


def corpus_distinctive_terms_sql(min_df: int = 3, k: int = 10) -> str:
    """Twin of queries_dataops.corpus_distinctive_terms: identical
    distinct-(source, doc, token) frequencies, the same integer
    cross-product lift under one exactly-rounded division, plain
    window top-k per source (== the sharded two-level rank)."""
    return f"""
WITH per_doc AS (
  SELECT DISTINCT source, doc_id, t.tok
  FROM documents, unnest({TOKENS}) AS t(tok)),
di AS (SELECT source, tok, count(*) AS df_in FROM per_doc GROUP BY 1, 2),
da AS (SELECT tok, count(*) AS df_all FROM per_doc GROUP BY 1),
ns AS (SELECT source, count(*) AS n_source FROM documents GROUP BY 1),
nt AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT di.source, di.tok, di.df_in, da.df_all, ns.n_source, nt.n_docs,
         CAST(di.df_in * nt.n_docs AS DOUBLE)
           / CAST(ns.n_source * da.df_all AS DOUBLE) AS lift
  FROM di
  JOIN da USING (tok) JOIN ns USING (source), nt
  WHERE di.df_in >= {min_df}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY lift DESC, tok) AS r
  FROM scored)
SELECT source, tok, df_in, df_all, n_source, n_docs, lift
FROM ranked WHERE r <= {k}
ORDER BY source, lift DESC, tok"""


def dedup_er_pipeline_sql(threshold: float = 0.8) -> str:
    """Twin of queries_dataops.dedup_er_pipeline: the verbatim
    editdist-pairs twin as the edge CTE, min-reachable-id closure via
    the same recursive-CTE construction as the other cluster twins
    (the fixed point is algorithm-independent), singletons included."""
    pairs_sql = dedup_editdist_pairs_sql(threshold=threshold)
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr)
SELECT node AS doc_id, MIN(lab) AS canonical_id,
       node = MIN(lab) AS keep
FROM reach GROUP BY node ORDER BY node"""


def doc_mad_outliers_sql() -> str:
    """Twin of queries_dataops.doc_mad_outliers: the identical lower
    medians (rank (n+1)//2 in (value, doc_id) order) and the same
    integer 3-MAD comparison."""
    return """
WITH base AS (SELECT source, doc_id, n_chars FROM documents),
med AS (
  SELECT source, n_chars AS median_chars FROM (
    SELECT source, n_chars, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS n
    FROM base) t
  WHERE r = (n + 1) // 2),
dev AS (
  SELECT b.source, b.doc_id, abs(b.n_chars - m.median_chars) AS d,
         m.median_chars
  FROM base b JOIN med m ON m.source = b.source),
mad AS (
  SELECT source, d AS mad_chars FROM (
    SELECT source, d, doc_id,
           row_number() OVER (PARTITION BY source ORDER BY d, doc_id) AS r,
           count(*) OVER (PARTITION BY source) AS n
    FROM dev) t
  WHERE r = (n + 1) // 2)
SELECT dev.source, count(*) AS n_docs,
       dev.median_chars, mad.mad_chars,
       CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON mad.source = dev.source
GROUP BY dev.source, dev.median_chars, mad.mad_chars
ORDER BY dev.source"""


def corpus_rare_token_docs_sql() -> str:
    """Twin of queries_dataops.corpus_rare_token_docs: identical
    distinct-token explode, df-1 counts, one exactly-rounded division,
    integer 2·hapax > n flag."""
    return f"""
WITH per_doc AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, unnest({TOKENS}) AS t(tok)),
dfreq AS (SELECT tok, count(*) AS df FROM per_doc GROUP BY 1)
SELECT p.doc_id,
       count(*) AS n_distinct_tokens,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS hapax_ratio,
       2 * SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) > count(*)
         AS is_noisy
FROM per_doc p JOIN dfreq d ON d.tok = p.tok
GROUP BY p.doc_id ORDER BY p.doc_id"""


def corpus_expectations_sql() -> str:
    """Twin of queries_dataops.corpus_expectations: the same five rules
    as UNION'd scalar aggregates with min-id examples.  NULL-guarded
    like the Spark side: NULL inputs COUNT as violations."""
    langs = "('en', 'de', 'fr', 'es', 'ja')"
    rules = [
        ("text_present", "text IS NULL OR length(text) = 0"),
        ("lang_known", f"lang IS NULL OR lang NOT IN {langs}"),
        (
            "n_chars_consistent",
            "COALESCE(n_chars <> length(text), TRUE)",
        ),
        (
            "n_chars_in_range",
            "n_chars IS NULL OR n_chars < 1 OR n_chars > 100000",
        ),
    ]
    arms = [
        f"""SELECT '{name}' AS rule, count(*) AS n_checked,
       CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       MIN(CASE WHEN {cond} THEN doc_id END) AS example_id
FROM documents"""
        for name, cond in rules
    ]
    arms.append(
        """SELECT 'doc_id_unique' AS rule, count(*) AS n_checked,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       MIN(CASE WHEN c > 1 THEN doc_id END) AS example_id
FROM (SELECT doc_id, count(*) AS c FROM documents GROUP BY 1) t"""
    )
    return "\nUNION ALL\n".join(arms) + "\nORDER BY rule"


# ---------------------------------------------------------------------------
# Planner-geometry parametric twins (r9).  The Spark side of these queries
# sizes its LSH geometry from a runtime corpus-count probe
# (similarity.planned_geometry); the static oracle_sql() strings bake the
# planner's answer for ORACLE_EMB_COUNT (the 500-embedding sf0.001/sf0.01
# fixtures).  Sweeping them at ANY OTHER scale factor just needs the twin
# regenerated with that corpus's count — scripts/check_oracle.py counts the
# target dir's embeddings and rebuilds these entries through this registry,
# so the bit-exact gate travels with scale instead of being pinned to the
# 500-embedding fixtures.
GEOMETRY_PARAMETRIC_SQL = {
    "embedding_lsh_buckets": lambda n: embedding_lsh_buckets_sql(n_docs=n),
    "embedding_dup_pairs": lambda n: embedding_dup_pairs_sql(n_docs=n),
    "embedding_dup_pairs_amplified": (
        lambda n: embedding_dup_pairs_amplified_sql(n_docs=n)
    ),
    "embedding_dup_clusters": lambda n: embedding_dup_clusters_sql(n_docs=n),
    "embedding_triangles": lambda n: embedding_triangles_sql(n_docs=n),
    "embedding_pagerank": lambda n: embedding_pagerank_sql(n_docs=n),
    "embedding_bfs_dist": lambda n: embedding_bfs_dist_sql(n_docs=n),
    "embedding_communities": lambda n: embedding_communities_sql(n_docs=n),
    "embedding_kcore": lambda n: embedding_kcore_sql(n_docs=n),
    # semdedup's knob is the CLUSTER COUNT, not band geometry: the twin
    # regenerates with the same pure k-planning rule the Spark side runs
    "embedding_semdedup": lambda n: embedding_semdedup_sql(
        k=similarity.semdedup_k_for_corpus(n)
    ),
    "embedding_threshold_curve": lambda n: embedding_threshold_curve_sql(
        n_docs=n
    ),
    # the full stack embeds semdedup — its k travels with corpus count
    "dedup_full_stack": lambda n: dedup_full_stack_sql(
        k=similarity.semdedup_k_for_corpus(n)
    ),
    "embedding_semdedup_screen": lambda n: embedding_semdedup_screen_sql(
        k=similarity.semdedup_k_for_corpus(n)
    ),
    "embedding_semdedup_screen_prebuilt": (
        lambda n: embedding_semdedup_screen_sql(
            k=similarity.semdedup_k_for_corpus(n)
        )
    ),
    # est_pair_quality's knob is the SAMPLING GATE: full form below the
    # planner threshold, LCG doc sample above it (the scale-safe default)
    "dedup_est_quality": lambda n: dedup_est_quality_sql(
        sample_mod=dedup.est_quality_sample_mod_for_corpus(n)
    ),
}


def _winnow_fp_cte(
    k: int, w: int, prefix: str = "", doc_where: str = ""
) -> str:
    """Shared winnowing CTE chain: per-doc gram-hash keys with the
    arithmetic rightmost-min encoding (hash·2²⁰ + (2²⁰−1−pos)), then the
    distinct per-window minima — the DuckDB twin of
    dedup.winnow_fingerprints' selection, including the same two-level
    hash (per-token char fold once, then a k-element (h·31 + x) mod P
    fold per gram).  ``prefix`` namespaces the CTEs so one query can
    fingerprint two document slices (the screen twin); ``doc_where``
    filters the source rows."""
    tok_hash = TOK_HASH.format(t="tok")
    gram_hash = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_slice(th, p + 1, p + {k})), "
        f"(h, x) -> (h*31 + x) % {hashing.HASH_MOD})"
    )
    t, g, fp = f"{prefix}toks", f"{prefix}g", f"{prefix}fp"
    return f"""{t} AS (
  SELECT doc_id,
         list_transform({TOKENS}, tok -> {tok_hash}) AS th
  FROM documents {doc_where}),
{g} AS (
  -- least(..., 1048576): the position-space guard — only the first 2^20
  -- gram positions are fingerprinted (same deterministic truncation as
  -- the Spark operator; beyond it the tie-break term would go negative)
  SELECT doc_id, least(len(th) - {k} + 1, 1048576) AS ng,
    list_transform(range(0, least(len(th) - {k} + 1, 1048576)),
      p -> {gram_hash} * 1048576 + (1048575 - p)) AS keys
  FROM {t} WHERE len(th) >= {k}),
{fp} AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(0, greatest(ng - {w}, 0) + 1),
      j -> list_aggregate(list_slice(keys, j + 1, j + {w}), 'min'))
  )) AS key
  FROM {g})"""


def dedup_winnow_fingerprints_sql(k: int = 5, w: int = 4) -> str:
    """Twin of queries_dataops.dedup_winnow_fingerprints: the same
    polynomial gram hashes, the same arithmetic tie encoding, decoded
    with exact integer division — bit-exact, strings and ints only."""
    return f"""WITH {_winnow_fp_cte(k, w)}
SELECT doc_id,
       CAST(1048575 - (key % 1048576) AS INTEGER) AS pos,
       key // 1048576 AS fp_hash
FROM fp
ORDER BY doc_id, pos, fp_hash"""


def dedup_winnow_pairs_sql(
    k: int = 5, w: int = 4, min_shared: int = 2, df_cap: int = 50
) -> str:
    """Twin of queries_dataops.dedup_winnow_pairs: distinct per-doc
    fingerprints, the 2-to-df_cap document-frequency band, and the
    shared-count self-join on the fingerprint value."""
    return f"""WITH {_winnow_fp_cte(k, w)},
fpd AS (SELECT DISTINCT doc_id, key // 1048576 AS fp_hash FROM fp),
rare AS (
  SELECT fp_hash FROM fpd
  GROUP BY fp_hash HAVING count(*) BETWEEN 2 AND {df_cap})
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fpd a
JOIN rare USING (fp_hash)
JOIN fpd b USING (fp_hash)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
ORDER BY doc1, doc2"""


def dedup_winnow_screen_sql(
    k: int = 5, w: int = 4, min_shared: int = 2, df_cap: int = 50
) -> str:
    """Twin of queries_dataops.dedup_winnow_screen: the corpus slice's
    df-capped distinct fingerprint set, the batch slice's distinct
    fingerprints, one membership probe, and the keep verdict."""
    corpus_cte = _winnow_fp_cte(
        k, w, prefix="c", doc_where="WHERE doc_id % 13 <> 0"
    )
    batch_cte = _winnow_fp_cte(
        k, w, prefix="b", doc_where="WHERE doc_id % 13 = 0"
    )
    return f"""WITH {corpus_cte},
cfpd AS (SELECT DISTINCT doc_id, key // 1048576 AS fp_hash FROM cfp),
cset AS (
  SELECT fp_hash FROM cfpd GROUP BY fp_hash HAVING count(*) <= {df_cap}),
{batch_cte},
bfpd AS (SELECT DISTINCT doc_id, key // 1048576 AS fp_hash FROM bfp),
scored AS (
  SELECT b.doc_id, count(*) AS n_fps,
         SUM(CASE WHEN c.fp_hash IS NOT NULL THEN 1 ELSE 0 END)
           AS n_matched
  FROM bfpd b LEFT JOIN cset c ON c.fp_hash = b.fp_hash
  GROUP BY b.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(s.n_fps, 0) AS BIGINT) AS n_fps,
  CAST(COALESCE(s.n_matched, 0) AS BIGINT) AS n_matched,
  COALESCE(s.n_matched, 0) < {min_shared} AS keep
FROM documents d
LEFT JOIN scored s ON s.doc_id = d.doc_id
WHERE d.doc_id % 13 = 0
ORDER BY d.doc_id"""


def corpus_leakage_safe_split_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.corpus_leakage_safe_split: the recursive
    reachability closure over the est pair graph (cluster = reachable
    minimum), then split_assign's LCG CASE applied to the CLUSTER id —
    default 0.9/0.05/0.05 thresholds."""
    from ..operators import corpus as corpus_mod

    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    mod = corpus_mod.SAMPLE_MOD
    mult = corpus_mod.SAMPLE_MULT % corpus_mod.SAMPLE_MOD
    inc = corpus_mod.SAMPLE_INC
    h = f"((cluster_id % {mod}) * {mult} + {inc}) % {mod}"
    cuts, cum = [], 0.0
    for label, frac in [("train", 0.9), ("val", 0.05), ("test", 0.05)]:
        cum += frac
        cuts.append((label, int(cum * mod)))
    whens = "\n       ".join(
        f"WHEN {h} < {cut} THEN '{label}'" for label, cut in cuts[:-1]
    )
    return f"""WITH RECURSIVE pairs AS (
{pairs_sql}
),
adj AS (
  SELECT doc1 AS node, doc2 AS nbr FROM pairs
  UNION ALL
  SELECT doc2 AS node, doc1 AS nbr FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT a.node, r.lab FROM adj a JOIN reach r ON r.node = a.nbr
),
clusters AS (
  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
  CASE {whens}
       ELSE '{cuts[-1][0]}' END AS split
FROM clusters
ORDER BY doc_id"""


_SYNTH_URL_CASE = """CASE CAST(doc_id % 8 AS INTEGER)
    WHEN 0 THEN 'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
    WHEN 1 THEN 'HTTPS://WWW.' || upper(source) || '.Example.COM:443/docs/' || CAST(doc_id AS VARCHAR) || '#frag'
    WHEN 2 THEN 'http://' || source || '.example.com:80/a/b?b=2&a=1'
    WHEN 3 THEN 'http://' || source || '.example.com'
    WHEN 4 THEN 'https://user@' || source || '.example.com:8443/x?z=1&&y=2&'
    WHEN 5 THEN 'https://' || source || '.example.com/path/' || lang || '?q=' || CAST(n_chars AS VARCHAR)
    WHEN 6 THEN 'ftp://files.' || source || '.example.com/f' || CAST(doc_id AS VARCHAR)
    ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END"""


_PUNY_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def _puny_cnt(lo: str, hi: str, lim: str) -> str:
    """|{q in [lo, hi) : cps[q] < lim}| over the staged ``cps`` column
    (0-based half-open → DuckDB's 1-based inclusive slice)."""
    return (
        f"CAST(len(list_filter(cps[CAST(({lo}) + 1 AS INTEGER):"
        f"CAST(({hi}) AS INTEGER)], x -> x < ({lim}))) AS BIGINT)"
    )


def _puny_digits_sql(delta: str, bias: str) -> str:
    """RFC 3492 §6.3 digit emission as a bounded fold over range(1, 15)
    — mirrors webops._puny_digits.  Element field ``q`` carries the
    step index; ``b`` threads the bias through the state (DuckDB
    lambdas can't close over the outer lambda's variables).

    DuckDB 1.0 list_reduce hazard (empirically pinned): struct fields
    are evaluated IN DECLARATION ORDER with later fields seeing earlier
    fields' NEW values — so reader fields must come before the fields
    they read are overwritten.  Here ``out`` (reads q) precedes ``q``,
    and the boolean done-flag is folded into a ``q = -1`` sentinel so
    no field pair reads each other."""
    t = (
        "(CASE WHEN s.q * 36 <= a.b THEN CAST(1 AS BIGINT) "
        "WHEN s.q * 36 >= a.b + 26 THEN CAST(26 AS BIGINT) "
        "ELSE s.q * 36 - a.b END)"
    )
    return f"""list_reduce(
      list_prepend({{'out': '', 'q': CAST({delta} AS BIGINT),
                     'b': CAST({bias} AS BIGINT)}},
        list_transform(range(1, 15),
          i -> {{'out': '', 'q': CAST(i AS BIGINT),
                 'b': CAST(0 AS BIGINT)}})),
      (a, s) -> {{
        'out': CASE WHEN a.q < 0 THEN a.out
                    ELSE a.out || substr('{_PUNY_ALPHA}',
                      CAST((CASE WHEN a.q < {t} THEN a.q
                            ELSE {t} + (a.q - {t}) % (36 - {t}) END) + 1
                        AS INTEGER), 1) END,
        'q': CASE WHEN a.q < 0 THEN a.q
                  WHEN a.q < {t} THEN CAST(-1 AS BIGINT)
                  ELSE (a.q - {t}) // (36 - {t}) END,
        'b': a.b}}).out"""


def _puny_adapt_sql(delta: str, numpoints: str, first: str) -> str:
    """RFC 3492 §6.1 bias adaptation as a bounded fold over
    range(1, 13) — mirrors webops._puny_adapt.  Field order ``k`` (reads
    d) before ``d`` (overwrites d), per the list_reduce hazard note on
    _puny_digits_sql."""
    d1 = f"(({delta}) // (CASE WHEN {first} THEN 700 ELSE 2 END))"
    d2 = f"({d1} + {d1} // ({numpoints}))"
    fold = f"""list_reduce(
      list_prepend({{'k': CAST(0 AS BIGINT), 'd': CAST({d2} AS BIGINT)}},
        list_transform(range(1, 13),
          i -> {{'k': CAST(0 AS BIGINT), 'd': CAST(0 AS BIGINT)}})),
      (m, n) -> {{'k': CASE WHEN m.d > 455 THEN m.k + 36 ELSE m.k END,
                  'd': CASE WHEN m.d > 455 THEN m.d // 35 ELSE m.d END}})"""
    return f"({fold}.k + (36 * {fold}.d) // ({fold}.d + 38))"


def _puny_label_sql() -> str:
    """The per-label punycode-encode expression over the staged columns
    ``lab`` / ``chars`` / ``cps`` / ``nb`` — the RFC 3492 event fold
    mirroring webops._punycode_label bit for bit (same closed-form
    inter-emit deltas, same bounded inner folds).  Passthrough guard:
    ASCII labels unchanged; astral codepoints unchanged on BOTH engines
    (Spark sees UTF-16 surrogates 0xD800-0xDFFF, DuckDB sees the real
    codepoint ≥ 0x10000 — both conditions are in the guard so the two
    engines agree)."""
    delta = (
        "(CASE WHEN acc.prevp < 0 THEN (ev.c - 128) * (acc.h + 1) + "
        + _puny_cnt("0", "ev.p", "ev.c")
        + " WHEN ev.c = acc.m THEN "
        + _puny_cnt("acc.prevp + 1", "ev.p", "ev.c")
        + " ELSE "
        + _puny_cnt("acc.prevp + 1", "len(cps)", "acc.m")
        + " + 1 + (ev.c - acc.m - 1) * (acc.h + 1) + "
        + _puny_cnt("0", "ev.p", "ev.c")
        + " END)"
    )
    # field order per the list_reduce hazard note on _puny_digits_sql:
    # readers first — out (reads bias/prevp/m/h via delta), then bias
    # (reads prevp/m/h), then the plain overwrites h/m/prevp/c/p.
    events = """list_transform(
      list_sort(list_filter(
        list_transform(range(1, len(cps) + 1),
          i -> {'c': cps[CAST(i AS INTEGER)], 'p': CAST(i - 1 AS BIGINT)}),
        e -> e.c >= 128)),
      e -> {'out': '', 'bias': CAST(0 AS BIGINT), 'h': CAST(0 AS BIGINT),
            'm': CAST(0 AS BIGINT), 'prevp': CAST(0 AS BIGINT),
            'c': e.c, 'p': e.p})"""
    init = """{'out': '', 'bias': CAST(72 AS BIGINT), 'h': nb,
      'm': CAST(128 AS BIGINT), 'prevp': CAST(-1 AS BIGINT),
      'c': CAST(0 AS BIGINT), 'p': CAST(0 AS BIGINT)}"""
    step = f"""{{
      'out': acc.out || {_puny_digits_sql(delta, "acc.bias")},
      'bias': {_puny_adapt_sql(delta, "acc.h + 1", "acc.prevp < 0")},
      'h': acc.h + 1, 'm': ev.c, 'prevp': ev.p,
      'c': ev.c, 'p': ev.p}}"""
    wire = f"""'xn--'
      || coalesce(array_to_string(
           list_filter(chars, c -> unicode(c) < 128), ''), '')
      || CASE WHEN nb > 0 THEN '-' ELSE '' END
      || list_reduce(list_prepend({init}, {events}),
                     (acc, ev) -> {step}).out"""
    return f"""CASE WHEN len(list_filter(cps, x -> x >= 128)) = 0
        OR len(list_filter(cps,
             x -> (x >= 55296 AND x <= 57343) OR x >= 65536)) > 0
      THEN lab ELSE {wire} END"""


def _idn_ctes() -> str:
    """The IDN stage appended to the canon chain: non-ASCII hosts split
    into labels (ASCII hosts never leave ``pre_idn`` — the same regex
    fast path as webops.idn_host_ascii), each label punycode-encoded,
    re-joined in label order, and ``url_canon`` rebuilt around the new
    host (scheme + userinfo prefix kept, port/path/query tail kept)."""
    prefix = (
        "regexp_extract(p.url_canon, '^([a-z0-9+.-]+://([^/]*@)?)', 1)"
    )
    return f"""idn_split AS (
  SELECT doc_id, generate_subscripts(ls, 1) AS li, unnest(ls) AS lab
  FROM (SELECT doc_id, string_split(host, '.') AS ls FROM pre_idn
        WHERE host IS NOT NULL
          AND NOT regexp_matches(host, '^[\\x00-\\x7f]*$'))),
idn_cols AS (
  SELECT doc_id, li, lab, string_split(lab, '') AS chars,
         list_transform(string_split(lab, ''),
                        c -> CAST(unicode(c) AS BIGINT)) AS cps,
         CAST(len(list_filter(list_transform(string_split(lab, ''),
                c -> CAST(unicode(c) AS BIGINT)), x -> x < 128))
           AS BIGINT) AS nb
  FROM idn_split),
idn_lab AS (SELECT doc_id, li, {_puny_label_sql()} AS plab FROM idn_cols),
idn_host AS (SELECT doc_id, array_to_string(list(plab ORDER BY li), '.')
                      AS hostp
             FROM idn_lab GROUP BY doc_id),
canon AS (
  SELECT p.doc_id, p.url,
    CASE WHEN r.hostp IS NULL OR r.hostp = p.host THEN p.url_canon
         ELSE {prefix} || r.hostp
              || substr(p.url_canon,
                        length({prefix}) + length(p.host) + 1) END
      AS url_canon,
    coalesce(r.hostp, p.host) AS host
  FROM pre_idn p LEFT JOIN idn_host r USING (doc_id))"""


# twin of queries_dataops._synth_idn_url — IDENTICAL strings per doc_id%4
_SYNTH_IDN_URL_CASE = (
    "CASE CAST(doc_id % 4 AS INTEGER) "
    "WHEN 0 THEN 'https://BÜCHER.' || source || '.example.com/docs/' "
    "|| CAST(doc_id AS VARCHAR) "
    "WHEN 1 THEN 'http://www.münchen-' || source || '.de:80/a?b=2&a=1' "
    "WHEN 2 THEN 'https://xn--bcher-kva.' || source "
    "|| '.example.com/docs/' || CAST(doc_id AS VARCHAR) "
    "ELSE 'https://点看' || CAST(doc_id AS VARCHAR) || '.example.com/p' END"
)


def web_idn_canonical_sql() -> str:
    """Twin of queries_dataops.web_idn_canonical: the full canon chain
    (pct + parse + IDN stage) over the unicode-host fixture."""
    return f"""WITH {_url_canon_cte(_SYNTH_IDN_URL_CASE)}
SELECT doc_id, url, url_canon, host FROM canon ORDER BY doc_id"""


def _url_canon_cte(
    url_case: str | None = None,
    source: str = "documents",
    prefix: str = "",
) -> str:
    """Shared URL-canonicalization CTE chain: the synthetic doc_id%8 URL
    (same CASE arms as queries_dataops._synth_url; ``url_case``/
    ``source`` swap in any (doc_id, url expression) relation, and
    ``prefix`` renames every CTE in the chain — word-boundary-safe, no
    column name collides — so ONE query can run TWO canonicalization
    chains, e.g. the frontier twin canonicalizing sitemap locs next to
    the corpus canon) parsed and normalized
    with the IDENTICAL RE2-safe regexes and operation order as
    webops._canon_cols — percent-encoding normalized first (unreserved
    %XX decoded, retained hex uppercased, lone '%' literal), fragment
    cut before the query is located, userinfo split on the last '@',
    authorities that are not host[:digits] fail the parse, default
    ports stripped, query params de-emptied then byte-order sorted.
    Ends in ``canon(doc_id, url, url_canon, host)`` with NULLs for
    unparseable rows."""
    hx = "strpos('0123456789abcdef', substr(lower(substr(p, 1, 2)), {}, 1))"
    v = f"(({hx.format(1)} - 1) * 16 + ({hx.format(2)} - 1))"
    piece = f"""CASE
        WHEN regexp_matches(lower(substr(p, 1, 2)), '^[0-9a-f]{{2}}$') THEN
          CASE WHEN ({v} BETWEEN 48 AND 57) OR ({v} BETWEEN 65 AND 90)
                    OR ({v} BETWEEN 97 AND 122) OR {v} IN (45, 46, 95, 126)
               THEN chr(CAST({v} AS INTEGER)) || substr(p, 3)
               ELSE '%' || upper(substr(p, 1, 2)) || substr(p, 3) END
        ELSE '%' || p END"""
    sql = f"""urls AS (
  SELECT doc_id, {url_case or _SYNTH_URL_CASE} AS url FROM {source}),
pct AS (
  SELECT doc_id, url,
         CASE WHEN strpos(url, '%') = 0 THEN url
              ELSE parts[1] || coalesce(array_to_string(
                     list_transform(parts[2:], p -> {piece}), ''), '')
         END AS urln
  FROM (SELECT doc_id, url, string_split(url, '%') AS parts FROM urls)),
up0 AS (
  SELECT doc_id, url,
    lower(regexp_extract(urln, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    regexp_extract(urln, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$', 1) AS rest
  FROM pct),
up1 AS (SELECT *, regexp_extract(rest, '^([^/?#]*)', 1) AS authority FROM up0),
up2 AS (SELECT *, substr(rest, length(authority) + 1) AS after_auth FROM up1),
up3 AS (
  SELECT *,
    regexp_extract(after_auth, '^([^#]*)', 1) AS pre_frag,
    regexp_extract(authority, '^(.*)@', 1) AS userinfo,
    regexp_extract(authority, '([^@]*)$', 1) AS host_port
  FROM up2),
up4 AS (
  SELECT *,
    lower(regexp_extract(host_port, '^([^:]*)', 1)) AS host0,
    regexp_extract(host_port, ':([0-9]+)$', 1) AS port,
    regexp_extract(pre_frag, '^([^?]*)', 1) AS raw_path,
    regexp_extract(pre_frag, '\\?(.*)$', 1) AS query
  FROM up3),
up5 AS (
  SELECT *,
    CASE WHEN raw_path = '' THEN '/' ELSE raw_path END AS path,
    coalesce(array_to_string(list_sort(list_filter(
      string_split(query, '&'), x -> x <> '')), '&'), '') AS query_canon,
    (port <> '' AND NOT (scheme = 'http' AND port = '80')
               AND NOT (scheme = 'https' AND port = '443')) AS keep_port,
    regexp_matches(host_port, '^[^:\\[\\]]*(:[0-9]+)?$') AS auth_ok
  FROM up4),
pre_idn AS (
  SELECT doc_id, url,
    CASE WHEN scheme <> '' AND auth_ok THEN
      scheme || '://'
        || CASE WHEN userinfo <> '' THEN userinfo || '@' ELSE '' END
        || host0
        || CASE WHEN keep_port THEN ':' || port ELSE '' END
        || path
        || CASE WHEN query_canon <> '' THEN '?' || query_canon ELSE '' END
    END AS url_canon,
    CASE WHEN scheme <> '' AND auth_ok THEN host0 END AS host
  FROM up5),
{_idn_ctes()}"""
    if prefix:
        import re as _re

        for name in (
            "urls", "pct", "up0", "up1", "up2", "up3", "up4", "up5",
            "pre_idn", "idn_split", "idn_cols", "idn_lab", "idn_host",
            "canon",
        ):
            sql = _re.sub(rf"\b{name}\b", f"{prefix}{name}", sql)
    return sql


def web_url_canonical_sql() -> str:
    """Twin of queries_dataops.web_url_canonical."""
    return f"""WITH {_url_canon_cte()}
SELECT doc_id, url, url_canon, host FROM canon ORDER BY doc_id"""


def web_host_profile_sql() -> str:
    """Twin of queries_dataops.web_host_profile: per-(host, canon)
    partials, host rollup, one-row total joined back for the share."""
    return f"""WITH {_url_canon_cte()},
per_canon AS (
  SELECT host, url_canon, count(*) AS n
  FROM canon WHERE host IS NOT NULL
  GROUP BY host, url_canon),
per_host AS (
  SELECT host, CAST(SUM(n) AS BIGINT) AS n_urls,
         CAST(count(*) AS BIGINT) AS n_canon_distinct
  FROM per_canon GROUP BY host)
SELECT host, n_urls, n_canon_distinct,
       CAST(n_urls AS DOUBLE)
         / CAST((SELECT SUM(n_urls) FROM per_host) AS DOUBLE) AS share
FROM per_host ORDER BY host"""


# twin of queries_dataops._synth_html — IDENTICAL strings per doc_id%4
_SYNTH_HTML_CASE = (
    "CASE doc_id % 4 "
    "WHEN 0 THEN '<html><head><style>p {color: red}</style><title>T' "
    "|| CAST(doc_id AS VARCHAR) || '</title></head><body><h1>Doc ' "
    "|| CAST(doc_id AS VARCHAR) || '</h1><p>' || text "
    "|| '</p><!-- crawl: skip --></body></html>' "
    "WHEN 1 THEN '<div class=\"a\">' || text "
    "|| '</div><script type=\"text/javascript\">var x = 1 < 2;</script>' "
    "WHEN 2 THEN '<p>a &amp; b &lt;tag&gt; &quot;q&quot; "
    "&#39;s&#39;&nbsp;&amp;lt;</p><p>' || text || '</p>' "
    "ELSE '<ul><li>one</li><li>two</li></ul>' || text "
    "|| '<br>tail ' || CAST(doc_id AS VARCHAR) END"
)


def web_extract_text_sql() -> str:
    """Twin of queries_dataops.web_extract_text: the IDENTICAL RE2
    patterns in the identical order (DuckDB regexp_replace needs the
    explicit 'g' option — Spark's is global by default), entity
    replaces with &amp; last, chr(10) as the newline replacement (no
    escape-string processing), and the \\s-based edge strip instead of
    the space-only trim()."""
    ctes, last = _extract_text_ctes()
    return (
        "WITH "
        + ctes
        + f"\nSELECT doc_id, s AS clean_text FROM {last} ORDER BY doc_id"
    )


def _extract_text_ctes(source: str = "documents") -> tuple[str, str]:
    """The markup→text CTE chain over the synthetic-HTML fixture built
    from ``source`` (any relation exposing doc_id/text), shared by
    web_extract_text_sql, the boilerplate twin and the admission
    pipeline.  Returns (cte_text, final_cte_name); the final CTE
    exposes (doc_id, s)."""
    steps = [
        ("regexp_replace(s, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g')"),
        ("regexp_replace(s, '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"),
        ("regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g')"),
        (
            "regexp_replace(s, "
            "'(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|pre)\\b[^>]*>', "
            "chr(10), 'g')"
        ),
        ("regexp_replace(s, '(?s)<[^>]*>', ' ', 'g')"),
        ("replace(s, '&nbsp;', ' ')"),
        ("replace(s, '&lt;', '<')"),
        ("replace(s, '&gt;', '>')"),
        ("replace(s, '&quot;', '\"')"),
        ("replace(s, '&#39;', '''')"),
        ("replace(s, '&apos;', '''')"),
        ("replace(s, '&amp;', '&')"),
        ("regexp_replace(s, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"),
        ("regexp_replace(s, ' ?\\n ?', chr(10), 'g')"),
        ("regexp_replace(s, '\\n{2,}', chr(10), 'g')"),
        ("regexp_replace(s, '^\\s+|\\s+$', '', 'g')"),
    ]
    ctes = [f"h0 AS (SELECT doc_id, {_SYNTH_HTML_CASE} AS s FROM {source})"]
    for i, expr in enumerate(steps):
        ctes.append(f"h{i + 1} AS (SELECT doc_id, {expr} AS s FROM h{i})")
    return ",\n".join(ctes), f"h{len(steps)}"


def web_boilerplate_strip_sql() -> str:
    """Twin of queries_dataops.web_boilerplate_strip: the shared
    extraction chain, the same injected nav/cookie/footer noise lines,
    then the line screen — explode with ordinals, per-line word count /
    stop-word density / terminal punctuation / blacklist containment
    (same constants as webops.BOILER_*), kept lines re-joined in line
    order (coalesced to '' — DuckDB's empty-list array_to_string is
    NULL)."""
    ctes, last = _extract_text_ctes()
    return f"""WITH {ctes},
noisy AS (
  SELECT doc_id,
         'Home | About | Contact' || chr(10)
           || 'Accept all cookies to continue' || chr(10) || s || chr(10)
           || '© 2024 Example Corp All rights reserved' || chr(10)
           || 'Powered by JavaScript widgets' AS page_text
  FROM {last}),
{_boiler_ctes("noisy", "page_text")}
SELECT doc_id, clean_text, n_lines, n_lines_kept
FROM bp ORDER BY doc_id"""


def _boiler_ctes(src: str, text_col: str) -> str:
    """The line-screen CTE chain over ``src``'s ``text_col`` — explode
    with ordinals, per-line word count / stop-word density / terminal
    punctuation / blacklist containment (same constants as
    webops.BOILER_*), the r14 near-good NEIGHBOR RESCUE (lag/lead over
    (doc, line ordinal) — the window form of Spark's in-array
    neighborhood read), kept lines re-joined in line order.  Ends in
    ``bp(doc_id, clean_text, n_lines, n_lines_kept)`` (clean_text
    coalesced to '' — DuckDB's empty-list array_to_string is NULL)."""
    from ..operators import webops

    stops = ", ".join(f"'{w}'" for w in textops.STOPWORDS)
    black = " OR ".join(
        f"contains(lower(l), '{_q(t)}')" for t in webops.BOILER_BLACKLIST
    )
    quality = (
        "(regexp_matches(l, '[.!?\"]$')"
        " OR (nw > 0 AND CAST(sh AS DOUBLE) / CAST(nw AS DOUBLE)"
        f" >= {webops.BOILER_STOP_LOW}))"
    )
    return f"""lined AS (SELECT doc_id, string_split({text_col}, chr(10)) AS ls
          FROM {src}),
lx AS (SELECT doc_id, generate_subscripts(ls, 1) AS i, unnest(ls) AS l
       FROM lined),
sig_b AS (
  SELECT doc_id, i, l,
         len(list_filter(string_split(l, ' '), t -> t <> '')) AS nw,
         len(list_filter(string_split(l, ' '),
                         t -> t <> '' AND lower(t) IN ({stops}))) AS sh
  FROM lx),
flagged_b AS (
  SELECT doc_id, i, l,
         (nw >= {webops.BOILER_MIN_WORDS} AND {quality}
          AND NOT ({black})) AS k,
         (nw >= 1 AND nw < {webops.BOILER_MIN_WORDS} AND {quality}
          AND NOT ({black})) AS g
  FROM sig_b),
finb AS (
  SELECT doc_id, i, l,
         (k OR (g AND coalesce(lag(k) OVER w, false)
                  AND coalesce(lead(k) OVER w, false))) AS kf
  FROM flagged_b
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
keptl AS (SELECT doc_id, i, l FROM finb WHERE kf),
agg_b AS (SELECT doc_id, list(l ORDER BY i) AS kl
          FROM keptl GROUP BY doc_id),
bp AS (
  -- NULL source text propagates NULL outputs (Spark's split/size/
  -- array_join NULL semantics); the ''-coalesce only applies to rows
  -- that HAVE text but kept no lines (r14, ADVICE divergence fix)
  SELECT s.doc_id,
         CASE WHEN s.{text_col} IS NOT NULL
              THEN coalesce(array_to_string(a.kl, chr(10)), '')
         END AS clean_text,
         CAST(len(string_split(s.{text_col}, chr(10))) AS INTEGER)
           AS n_lines,
         CASE WHEN s.{text_col} IS NOT NULL
              THEN CAST(coalesce(len(a.kl), 0) AS INTEGER)
         END AS n_lines_kept
  FROM {src} s LEFT JOIN agg_b a USING (doc_id))"""


def web_robots_screen_sql(
    rules: tuple[tuple[str, str], ...] | None = None,
) -> str:
    """Twin of queries_dataops.web_robots_screen: per-rule
    2·len+is_allow scores (coalesced to -1 — DuckDB greatest must never
    see NULL where Spark's null-skipping greatest is relied on),
    longest-match winner, first-caller-order label via a CASE chain,
    allowed = unmatched or odd score, NULL verdicts for unparseable."""
    from ..operators.webops import _robots_pattern_to_re

    if rules is None:
        from .queries_dataops import ROBOTS_FIXTURE_RULES

        rules = ROBOTS_FIXTURE_RULES
    parsed = [
        (d.lower() == "allow", p, _robots_pattern_to_re(p))
        for d, p in rules
    ]
    score_exprs = [
        f"coalesce(CASE WHEN regexp_matches(path_q, '{_q(rx)}') "
        f"THEN {2 * len(p) + int(allow)} END, -1)"
        for allow, p, rx in parsed
    ]
    best = "greatest(" + ", ".join(score_exprs + ["-1"]) + ")"
    label_arms = " ".join(
        f"WHEN regexp_matches(path_q, '{_q(rx)}') "
        f"AND {2 * len(p) + int(allow)} = best "
        f"THEN '{'allow' if allow else 'disallow'}:{_q(p)}'"
        for allow, p, rx in parsed
    )
    return f"""WITH {_url_canon_cte()},
tails AS (
  SELECT doc_id, host,
         substr(t, strpos(t, '/')) AS path_q
  FROM (SELECT doc_id, host,
               substr(url_canon, strpos(url_canon, '://') + 3) AS t
        FROM canon)),
scored AS (SELECT doc_id, host, path_q, {best} AS best FROM tails)
SELECT doc_id,
       CASE WHEN host IS NOT NULL
            THEN CASE {label_arms} END END AS robots_rule,
       CASE WHEN host IS NOT NULL
            THEN (best = -1 OR best % 2 = 1) END AS robots_allowed
FROM scored ORDER BY doc_id"""


def _robots_resolve_ctes(token: str) -> str:
    """The RFC 9309 §2.2.1 group-resolution CTE chain over the fixture
    robots bodies (identical strings to queries_dataops.ROBOTS_BODY_*):
    CR-stripped LF line split with 1-based ordinals, comment strip,
    field/value extraction with the same regexes as
    webops.robots_resolve, lag-based group starts + running-sum group
    ids, per-group max prefix-match specificity ('*' = 0), per-host
    best, tied winners concatenated, rules filtered to valid '/'/'*'
    patterns.  Ends in ``rrules(host, line_no, directive,
    path_pattern)``; expects a ``canon`` CTE upstream."""
    from .queries_dataops import (
        ROBOTS_BODY_APEX,
        ROBOTS_BODY_FILES,
        ROBOTS_BODY_WWW,
    )

    tok = token.strip().lower()
    return f"""{_robots_lines_ctes()},
rec AS (SELECT * FROM parsedl
        WHERE field IN ('user-agent', 'allow', 'disallow') AND value <> ''),
flagged_l AS (
  SELECT *,
         CASE WHEN field = 'user-agent'
                   AND coalesce(lag(field) OVER (
                         PARTITION BY host ORDER BY line_no), '')
                       <> 'user-agent'
              THEN 1 ELSE 0 END AS ng
  FROM rec),
grp AS (SELECT *, SUM(ng) OVER (PARTITION BY host ORDER BY line_no)
                    AS group_id
        FROM flagged_l),
specs AS (
  SELECT host, group_id,
         MAX(CASE WHEN value = '*' THEN 0
                  WHEN starts_with('{_q(tok)}', lower(value))
                  THEN length(value) END) AS spec
  FROM grp WHERE field = 'user-agent' GROUP BY host, group_id),
bestspec AS (SELECT host, MAX(spec) AS best_spec FROM specs GROUP BY host),
winners AS (SELECT s.host, s.group_id
            FROM specs s JOIN bestspec b USING (host)
            WHERE s.spec = b.best_spec),
rrules AS (
  SELECT g.host, g.line_no, g.field AS directive, g.value AS path_pattern
  FROM grp g JOIN winners w USING (host, group_id)
  WHERE g.field <> 'user-agent' AND g.group_id > 0
    AND regexp_matches(g.value, '^[/*]'))"""


def _robots_lines_ctes() -> str:
    """The shared robots.txt LINE-PARSE CTEs over the fixture bodies
    (identical strings to queries_dataops.ROBOTS_BODY_*): CR-stripped
    LF split with 1-based ordinals, comment strip, field/value
    extraction — ends in ``parsedl(host, line_no, field, value)``;
    expects a ``canon`` CTE upstream."""
    from .queries_dataops import (
        ROBOTS_BODY_APEX,
        ROBOTS_BODY_FILES,
        ROBOTS_BODY_WWW,
    )

    return f"""hosts AS (SELECT DISTINCT host FROM canon WHERE host IS NOT NULL),
bodies AS (
  SELECT host,
         CASE WHEN starts_with(host, 'www.') THEN '{_q(ROBOTS_BODY_WWW)}'
              WHEN starts_with(host, 'files.') THEN '{_q(ROBOTS_BODY_FILES)}'
              ELSE '{_q(ROBOTS_BODY_APEX)}' END AS body
  FROM hosts),
rawlines AS (
  SELECT host, generate_subscripts(lines, 1) AS line_no, unnest(lines) AS line
  FROM (SELECT host, string_split(replace(body, chr(13), ''), chr(10)) AS lines
        FROM bodies)),
parsedl AS (
  SELECT host, line_no,
         lower(regexp_extract(regexp_extract(line, '^([^#]*)', 1),
                              '^[ \t]*([A-Za-z][A-Za-z-]*)[ \t]*:', 1)) AS field,
         regexp_extract(regexp_extract(line, '^([^#]*)', 1),
                        '^[ \t]*[A-Za-z][A-Za-z-]*[ \t]*:[ \t]*([^ \t]*)', 1)
           AS value
  FROM rawlines)"""


def web_robots_sitemaps_sql() -> str:
    """Twin of queries_dataops.web_robots_sitemaps: the shared line
    parse, filtered to syntactically valid group-independent Sitemap
    records in file order."""
    return f"""WITH {_url_canon_cte()},
{_robots_lines_ctes()}
SELECT host, CAST(line_no AS INTEGER) AS line_no, value AS sitemap_url
FROM parsedl
WHERE field = 'sitemap'
  AND regexp_matches(value, '^([A-Za-z][A-Za-z0-9+.-]*)://')
ORDER BY host, line_no"""


def web_robots_crawl_delay_sql() -> str:
    """Twin of queries_dataops.web_robots_crawl_delay: the shared line
    parse, valid decimal Crawl-delay records, first per host by line
    number."""
    return f"""WITH {_url_canon_cte()},
{_robots_lines_ctes()}
SELECT host, CAST(line_no AS INTEGER) AS line_no,
       CAST(value AS DOUBLE) AS crawl_delay
FROM (SELECT host, line_no, value,
             row_number() OVER (PARTITION BY host ORDER BY line_no) AS rn
      FROM parsedl
      WHERE field = 'crawl-delay'
        AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$'))
WHERE rn = 1 ORDER BY host"""


def _sitemap_ctes() -> str:
    """The sitemap parse CTE chain over the shared fixture bodies —
    ends in ``smloc(host, sitemap_url, kind, ord, loc, lastmod)`` (the
    quarantine-filtered rows); expects a ``canon`` CTE upstream.
    Extracted r14 so the frontier twin composes the identical parse."""
    from .queries_dataops import (
        SITEMAP_BODY_INDEX,
        SITEMAP_BODY_JUNK,
        SITEMAP_BODY_URLSET,
    )

    return f"""hosts AS (SELECT DISTINCT host FROM canon WHERE host IS NOT NULL),
smaps AS (
  SELECT host, 'https://' || host || '/sitemap.xml' AS sitemap_url,
         CASE WHEN starts_with(host, 'www.') THEN '{_q(SITEMAP_BODY_URLSET)}'
              WHEN starts_with(host, 'files.') THEN '{_q(SITEMAP_BODY_INDEX)}'
              ELSE '{_q(SITEMAP_BODY_JUNK)}' END AS body
  FROM hosts),
kinds AS (
  SELECT *, CASE WHEN regexp_matches(body, '(?is)<sitemapindex\\b')
                 THEN 'index'
                 WHEN regexp_matches(body, '(?is)<urlset\\b')
                 THEN 'urlset' END AS kind
  FROM smaps),
blocks AS (
  SELECT host, sitemap_url, kind,
         CASE WHEN kind = 'index'
              THEN regexp_extract_all(body,
                     '(?is)<sitemap\\b[^>]*>(.*?)</sitemap\\s*>', 1)
              WHEN kind = 'urlset'
              THEN regexp_extract_all(body,
                     '(?is)<url\\b[^>]*>(.*?)</url\\s*>', 1) END AS blks
  FROM kinds),
ex AS (
  SELECT host, sitemap_url, kind,
         generate_subscripts(blks, 1) AS ord, unnest(blks) AS blk
  FROM blocks),
fields AS (
  SELECT host, sitemap_url, kind, ord,
         regexp_replace(regexp_extract(blk,
             '(?is)<loc[^>]*>(.*?)</loc\\s*>', 1),
             '^\\s+|\\s+$', '', 'g') AS raw_loc,
         regexp_replace(regexp_extract(blk,
             '(?is)<lastmod[^>]*>(.*?)</lastmod\\s*>', 1),
             '^\\s+|\\s+$', '', 'g') AS raw_lm
  FROM ex),
locs AS (
  SELECT host, sitemap_url, kind, ord,
         CASE WHEN regexp_matches(raw_loc, '(?s)^<!\\[CDATA\\[.*\\]\\]>$')
              THEN regexp_replace(regexp_extract(raw_loc,
                     '(?s)^<!\\[CDATA\\[(.*)\\]\\]>$', 1),
                     '^\\s+|\\s+$', '', 'g')
              ELSE replace(replace(replace(replace(replace(replace(raw_loc,
                     '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                     '&#39;', ''''), '&apos;', ''''), '&amp;', '&')
         END AS loc,
         CASE WHEN regexp_matches(raw_lm, '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}')
              THEN try_cast(substr(raw_lm, 1, 10) AS DATE) END AS lastmod
  FROM fields),
smloc AS (
  SELECT host, sitemap_url, kind, CAST(ord AS INTEGER) AS ord, loc, lastmod
  FROM locs
  WHERE regexp_matches(loc, '^([A-Za-z][A-Za-z0-9+.-]*)://'))"""


def web_sitemap_urls_sql() -> str:
    """Twin of queries_dataops.web_sitemap_urls: identical fixture
    bodies (shared constants), identical RE2-compatible regexes — kind
    gate, per-kind block extraction with 1-based ordinals, loc
    trim/CDATA-unwrap/entity-decode, absolute-URL quarantine, lastmod
    date part via try_cast."""
    return f"""WITH {_url_canon_cte()},
{_sitemap_ctes()}
SELECT host, sitemap_url, kind, ord, loc, lastmod
FROM smloc
ORDER BY host, ord"""


def web_frontier_urls_sql() -> str:
    """Twin of queries_dataops.web_frontier_urls: the corpus canon
    chain, the shared sitemap parse, a SECOND (prefixed ``f_``)
    canonicalization chain over the urlset locs, provenance collapse
    per canonical URL (first (sitemap_url, ord) in order, max lastmod),
    and the NOT EXISTS anti-join against the corpus's distinct
    canonical URLs."""
    loc_src = (
        "(SELECT CAST(ord AS BIGINT) AS doc_id, loc"
        " FROM smloc WHERE kind = 'urlset') lsrc"
    )
    return f"""WITH {_url_canon_cte()},
{_sitemap_ctes()},
{_url_canon_cte(url_case="loc", source=loc_src, prefix="f_")},
f_map AS (
  SELECT DISTINCT url, url_canon, host
  FROM f_canon WHERE host IS NOT NULL),
joinedf AS (
  SELECT m.url_canon, m.host, s.sitemap_url, s.ord, s.lastmod
  FROM smloc s JOIN f_map m ON s.loc = m.url
  WHERE s.kind = 'urlset'),
winf AS (
  SELECT url_canon, host, sitemap_url, ord,
         row_number() OVER (PARTITION BY url_canon
                            ORDER BY sitemap_url, ord) AS rn,
         MAX(lastmod) OVER (PARTITION BY url_canon) AS lastmod
  FROM joinedf),
collapsedf AS (
  SELECT url_canon, host, sitemap_url, ord, lastmod
  FROM winf WHERE rn = 1),
corpusd AS (
  SELECT DISTINCT url_canon FROM canon WHERE url_canon IS NOT NULL)
SELECT c.url_canon, c.host, c.sitemap_url, c.ord, c.lastmod
FROM collapsedf c
WHERE NOT EXISTS (SELECT 1 FROM corpusd k WHERE k.url_canon = c.url_canon)
ORDER BY c.url_canon"""


def web_recrawl_budget_sql(
    window_sec: float = 3600.0,
    default_delay: float = 1.0,
    min_delay: float = 0.1,
    tier_shares: tuple[float, ...] = (1.0, 0.5, 0.25, 0.1),
) -> str:
    """Twin of queries_dataops.web_recrawl_budget: the shared scorecard
    CTE chain, the shared robots line parse's first-valid Crawl-delay,
    the identical [0,10)-guarded rank key (descending rank via
    row_number inversion against the window count, ties host ASC),
    equal-population tier arithmetic and floor allocations."""
    n_tiers = len(tier_shares)
    share_case = " ".join(
        f"WHEN {i} THEN CAST({float(r)} AS DOUBLE)"
        for i, r in enumerate(tier_shares)
    )
    cap = (
        f"CAST(floor(CAST({float(window_sec)} AS DOUBLE)"
        " / effective_delay) AS BIGINT)"
    )
    return f"""WITH {_url_canon_cte()},
{_host_scorecard_ctes()},
{_robots_lines_ctes()},
delays AS (
  SELECT host, crawl_delay FROM (
    SELECT host, CAST(value AS DOUBLE) AS crawl_delay,
           row_number() OVER (PARTITION BY host ORDER BY line_no) AS rn
    FROM parsedl
    WHERE field = 'crawl-delay'
      AND regexp_matches(value, '^[0-9]+(\\.[0-9]+)?$'))
  WHERE rn = 1),
base AS (
  SELECT s.host, COALESCE(s.mean_score, 0.0) AS score, d.crawl_delay,
         CASE WHEN COALESCE(s.mean_score, 0.0) < 0.0
                   OR COALESCE(s.mean_score, 0.0) >= 10.0
              THEN error('score outside [0, 10) ordering domain')
              ELSE lpad(CAST(CAST(floor(COALESCE(s.mean_score, 0.0) * 1e15)
                                  AS BIGINT) AS VARCHAR), 16, '0')
         END AS qkey
  FROM sc s LEFT JOIN delays d USING (host)),
rankedb AS (
  SELECT *, row_number() OVER (ORDER BY qkey ASC, host DESC) AS ar,
         count(*) OVER () AS rn
  FROM base),
alloc AS (
  SELECT host, score,
         CAST(rn - ar + 1 AS BIGINT) AS "rank",
         CAST(((rn - ar) * {n_tiers}) // rn AS INTEGER) AS tier,
         crawl_delay,
         greatest(COALESCE(crawl_delay,
                           CAST({float(default_delay)} AS DOUBLE)),
                  CAST({float(min_delay)} AS DOUBLE)) AS effective_delay
  FROM rankedb)
SELECT host, score, "rank", tier,
       CASE tier {share_case} END AS share,
       crawl_delay, effective_delay,
       {cap} AS polite_cap,
       CAST(floor({cap} * (CASE tier {share_case} END)) AS BIGINT)
         AS allocated_fetches
FROM alloc
ORDER BY "rank\""""


def web_robots_resolve_sql(token: str | None = None) -> str:
    """Twin of queries_dataops.web_robots_resolve: the group-resolution
    CTE chain over the shared fixture bodies, winning rules in file
    order."""
    if token is None:
        from .queries_dataops import ROBOTS_TOKEN

        token = ROBOTS_TOKEN
    return f"""WITH {_url_canon_cte()},
{_robots_resolve_ctes(token)}
SELECT host, CAST(line_no AS INTEGER) AS line_no, directive, path_pattern
FROM rrules ORDER BY host, line_no"""


def web_robots_screen_resolved_sql(token: str | None = None) -> str:
    """Twin of queries_dataops.web_robots_screen_resolved: resolved
    rules → per-rule anchored regex (same escape class as the Spark
    Column form), host-keyed left join onto canonical path+query,
    2·len+is_allow scoring, best score per doc with smallest-line-number
    label on ties, unmatched/no-group → allowed, unparseable → NULL."""
    if token is None:
        from .queries_dataops import ROBOTS_TOKEN

        token = ROBOTS_TOKEN
    rx_expr = (
        "'^' || replace(regexp_replace("
        "CASE WHEN ends_with(path_pattern, '$') "
        "THEN substr(path_pattern, 1, length(path_pattern) - 1) "
        "ELSE path_pattern END, "
        r"'([.^$+?(){}\[\]|\\])', '\\\1', 'g'), "
        "'*', '.*') "
        "|| CASE WHEN ends_with(path_pattern, '$') THEN '$' ELSE '' END"
    )
    return f"""WITH {_url_canon_cte()},
{_robots_resolve_ctes(token)},
rx AS (
  SELECT host, line_no, (directive = 'allow') AS is_allow, path_pattern,
         {rx_expr} AS rxp
  FROM rrules),
tails AS (
  SELECT doc_id, host, substr(t, strpos(t, '/')) AS path_q
  FROM (SELECT doc_id, host,
               substr(url_canon, strpos(url_canon, '://') + 3) AS t
        FROM canon WHERE host IS NOT NULL)),
scoredr AS (
  SELECT t.doc_id, r.line_no, r.is_allow, r.path_pattern,
         CASE WHEN regexp_matches(t.path_q, r.rxp)
              THEN 2 * length(r.path_pattern)
                   + CASE WHEN r.is_allow THEN 1 ELSE 0 END END AS score
  FROM tails t LEFT JOIN rx r USING (host)),
rankedr AS (
  SELECT doc_id, score, is_allow, path_pattern,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, line_no ASC) AS rn
  FROM scoredr WHERE score IS NOT NULL),
topr AS (
  SELECT doc_id, score,
         (CASE WHEN is_allow THEN 'allow:' ELSE 'disallow:' END)
           || path_pattern AS lab
  FROM rankedr WHERE rn = 1)
SELECT c.doc_id,
       CASE WHEN c.host IS NOT NULL THEN t2.lab END AS robots_rule,
       CASE WHEN c.host IS NOT NULL
            THEN (t2.doc_id IS NULL OR t2.score % 2 = 1) END
         AS robots_allowed
FROM canon c LEFT JOIN topr t2 USING (doc_id)
ORDER BY c.doc_id"""


def web_admission_pipeline_sql() -> str:
    """Twin of queries_dataops.web_admission_pipeline: the crawl-side
    end-to-end composition — the shared canon chain (pct + parse +
    IDN), blocklist + robots verdicts on the canonical path, first-id
    URL dedup among admitted rows, the extraction chain over the
    sentence-terminated fixture, the boilerplate line screen, and the
    Gopher rule chain over the CLEANED text (doc_rule_quality_sql with
    the bp CTE as its source)."""
    from ..operators.webops import _robots_pattern_to_re
    from .queries_dataops import ROBOTS_FIXTURE_RULES

    parsed = [
        (d.lower() == "allow", p, _robots_pattern_to_re(p))
        for d, p in ROBOTS_FIXTURE_RULES
    ]
    score_exprs = [
        f"coalesce(CASE WHEN regexp_matches(path_q, '{_q(rx)}') "
        f"THEN {2 * len(p) + int(allow)} END, -1)"
        for allow, p, rx in parsed
    ]
    best = "greatest(" + ", ".join(score_exprs + ["-1"]) + ")"
    blocked = (
        "(host = 'src1.example.com' "
        "OR ends_with(host, '.src1.example.com') "
        "OR strpos(path_q, 'z=1') > 0)"
    )
    ctes_x, last_x = _extract_text_ctes("pipedocs")
    rq_source = "(SELECT doc_id, clean_text AS text FROM bp)"
    return f"""WITH pipedocs AS (
  SELECT doc_id, text || '.' AS text FROM documents),
{_url_canon_cte()},
tails_p AS (
  SELECT doc_id, host, url_canon, substr(t, strpos(t, '/')) AS path_q
  FROM (SELECT doc_id, host, url_canon,
               substr(url_canon, strpos(url_canon, '://') + 3) AS t
        FROM canon WHERE host IS NOT NULL)),
adm AS (
  SELECT doc_id, host, url_canon
  FROM (SELECT *, {best} AS best FROM tails_p)
  WHERE NOT {blocked} AND (best = -1 OR best % 2 = 1)),
mins_p AS (SELECT url_canon, MIN(doc_id) AS cid
           FROM adm GROUP BY url_canon),
kept AS (SELECT a.doc_id, a.host, a.url_canon
         FROM adm a JOIN mins_p m USING (url_canon)
         WHERE a.doc_id = m.cid),
{ctes_x},
bsrc AS (SELECT k.doc_id, h.s AS page_text
         FROM kept k JOIN {last_x} h USING (doc_id)),
{_boiler_ctes("bsrc", "page_text")},
rq AS (SELECT doc_id, rules_passed, pass_gopher FROM (
{doc_rule_quality_sql(source=rq_source)}
))
SELECT k.doc_id, k.host, k.url_canon, bp.n_lines_kept,
       rq.rules_passed, rq.pass_gopher
FROM kept k JOIN bp USING (doc_id) JOIN rq USING (doc_id)
ORDER BY k.doc_id"""


def web_domain_scorecard_sql(
    blocked_host_suffixes: tuple[str, ...] = ("src1.example.com",),
    blocked_path_terms: tuple[str, ...] = ("z=1",),
    suffix_rules: tuple[str, ...] = _PSL_FIXTURE,
) -> str:
    """Twin of queries_dataops.web_domain_scorecard: the host-scorecard
    twin with the aggregation key swapped to coalesce(registrable
    domain, raw host) — blocklist rules still match the RAW host (the
    Spark side screens before regrouping), the quality mean keeps the
    same two-level (group, doc_id%256) pinned fold."""
    from . import oracle_corpus

    arms = []
    for s in blocked_host_suffixes:
        arms.append(
            f"WHEN c.host = '{_q(s)}' OR ends_with(c.host, '.{_q(s)}')"
            " THEN 1"
        )
    for term in blocked_path_terms:
        arms.append(f"WHEN strpos(path_q, '{_q(term)}') > 0 THEN 1")
    blocked = "COALESCE(CASE " + " ".join(arms) + " END, 0)"
    scored_sql = oracle_corpus.doc_bigram_lm_sql()
    return f"""WITH {_url_canon_cte()},
lab AS (
  SELECT doc_id, host, string_split(host, '.') AS l,
         len(string_split(host, '.')) AS n
  FROM canon WHERE host IS NOT NULL),
gdom AS (
  SELECT doc_id,
         coalesce(CASE WHEN n > s
                       THEN array_to_string(l[n - s : n], '.') END,
                  host) AS ghost
  FROM (SELECT *, {_reg_domain_sql(suffix_rules)} AS s FROM lab)),
scored AS (
{scored_sql}
),
mins AS (
  SELECT url_canon, MIN(doc_id) AS canonical_id
  FROM canon WHERE url_canon IS NOT NULL
  GROUP BY url_canon),
flagged AS (
  SELECT c.doc_id, g.ghost AS host,
         CASE WHEN c.doc_id <> m.canonical_id THEN 1 ELSE 0 END AS is_dup,
         {blocked} AS blk,
         COALESCE(sc.mean_prob, 0.0) AS s0
  FROM canon c
  JOIN gdom g USING (doc_id)
  JOIN mins m USING (url_canon)
  LEFT JOIN scored sc USING (doc_id)
  CROSS JOIN LATERAL (
    SELECT substr(t, strpos(t, '/')) AS path_q
    FROM (SELECT substr(c.url_canon, strpos(c.url_canon, '://') + 3)
                   AS t)) pq
  WHERE c.host IS NOT NULL),
partials AS (
  SELECT host, doc_id % 256 AS shard,
         count(*) AS c, SUM(is_dup) AS d, SUM(blk) AS b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(s0 ORDER BY doc_id)),
                     (a, x) -> a + x) AS p
  FROM flagged GROUP BY host, doc_id % 256)
SELECT host,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(SUM(d) AS BIGINT) AS n_url_dups,
       CAST(SUM(b) AS BIGINT) AS n_blocked,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(p ORDER BY shard)),
                   (a, x) -> a + x) / CAST(SUM(c) AS DOUBLE) AS mean_score
FROM partials
GROUP BY host
ORDER BY host"""


def web_host_cap_sample_sql(cap: int = 20) -> str:
    """Twin of queries_dataops.web_host_cap_sample: the shared LCG key
    (reduce-before-multiply, same constants), row_number within host
    ordered (key, doc_id), ranks ≤ cap."""
    from ..operators import corpus

    lcg = (
        f"((doc_id % {corpus.SAMPLE_MOD}) "
        f"* {corpus.SAMPLE_MULT % corpus.SAMPLE_MOD} "
        f"+ {corpus.SAMPLE_INC}) % {corpus.SAMPLE_MOD}"
    )
    return f"""WITH {_url_canon_cte()},
ranked AS (
  SELECT doc_id, host, url_canon,
         row_number() OVER (PARTITION BY host ORDER BY {lcg}, doc_id)
           AS host_rank
  FROM canon WHERE host IS NOT NULL)
SELECT doc_id, host, url_canon, CAST(host_rank AS INTEGER) AS host_rank
FROM ranked WHERE host_rank <= {cap} ORDER BY doc_id"""


def _reg_domain_sql(
    suffix_rules: tuple[str, ...],
) -> str:
    """The public-suffix matching expression over ``l`` (host labels)
    and ``n`` (label count) — same unrolled greatest/coalesce shape as
    webops.registrable_domain_col: exception rules prevail (suffix one
    label shorter than the rule), else the longest matching rule, else
    the default rule '*' (suffix = last label).  Returns the SQL for
    the winning suffix LENGTH."""

    def match(labels: list[str]) -> str:
        k = len(labels)
        conds = [f"n >= {k}"]
        for i, lab in enumerate(labels):
            if lab != "*":
                conds.append(f"l[n - {k} + {1 + i}] = '{_q(lab)}'")
        return " AND ".join(conds)

    exc_arms, norm_arms = [], []
    for rule in suffix_rules:
        is_exc = rule.startswith("!")
        labels = (rule[1:] if is_exc else rule).lower().split(".")
        m = match(labels)
        if is_exc:
            exc_arms.append(f"CASE WHEN {m} THEN {len(labels) - 1} END")
        else:
            # coalesce-to-1: DuckDB greatest must never see NULL arms
            norm_arms.append(
                f"coalesce(CASE WHEN {m} THEN {len(labels)} END, 1)"
            )
    norm = "greatest(" + ", ".join(norm_arms + ["1"]) + ")"
    if exc_arms:
        return "coalesce(" + ", ".join(exc_arms + [norm]) + ")"
    return norm


def web_registrable_domain_sql(
    suffix_rules: tuple[str, ...] = _PSL_FIXTURE,
) -> str:
    """Twin of queries_dataops.web_registrable_domain: the canon CTE,
    host labels split on '.', the same exception-over-longest-match
    suffix-length expression, registrable domain = last suffix_len+1
    labels (NULL when the host IS a public suffix)."""
    return f"""WITH {_url_canon_cte()},
lab AS (
  SELECT doc_id, host, string_split(host, '.') AS l,
         len(string_split(host, '.')) AS n
  FROM canon),
sl AS (SELECT doc_id, host, l, n,
              {_reg_domain_sql(suffix_rules)} AS s
       FROM lab)
SELECT doc_id, host,
       CASE WHEN host IS NOT NULL AND n > s
            THEN array_to_string(l[n - s : n], '.') END AS reg_domain
FROM sl ORDER BY doc_id"""


def web_domain_cap_sample_sql(
    cap: int = 20, suffix_rules: tuple[str, ...] = _PSL_FIXTURE
) -> str:
    """Twin of queries_dataops.web_domain_cap_sample: the cap window
    partitions on coalesce(registrable domain, raw host) — one eTLD+1,
    one cap, subdomain spray collapsed."""
    from ..operators import corpus

    lcg = (
        f"((doc_id % {corpus.SAMPLE_MOD}) "
        f"* {corpus.SAMPLE_MULT % corpus.SAMPLE_MOD} "
        f"+ {corpus.SAMPLE_INC}) % {corpus.SAMPLE_MOD}"
    )
    return f"""WITH {_url_canon_cte()},
lab AS (
  SELECT doc_id, host, url_canon, string_split(host, '.') AS l,
         len(string_split(host, '.')) AS n
  FROM canon WHERE host IS NOT NULL),
sl AS (SELECT *, {_reg_domain_sql(suffix_rules)} AS s FROM lab),
grouped AS (
  SELECT doc_id, url_canon,
         coalesce(CASE WHEN n > s
                       THEN array_to_string(l[n - s : n], '.') END,
                  host) AS host
  FROM sl),
ranked AS (
  SELECT doc_id, host, url_canon,
         row_number() OVER (PARTITION BY host ORDER BY {lcg}, doc_id)
           AS host_rank
  FROM grouped)
SELECT doc_id, host, url_canon, CAST(host_rank AS INTEGER) AS host_rank
FROM ranked WHERE host_rank <= {cap} ORDER BY doc_id"""


def dedup_est_quality_sql(
    threshold: float = 0.5, sample_mod: int | None = None
) -> str:
    """Twin of queries_dataops.dedup_est_quality: the est and exact pair
    CTEs full-outer joined on the pair key, the same integer
    counts/divisions, and the same TWO-LEVEL pinned error fold
    (per-doc1%256-shard in (doc1, doc2) order, shard partials in shard
    order).  ``sample_mod`` mirrors the Spark planner gate (LCG sample
    hash ≡ 0 mod m applied to the documents BEFORE either pair
    lineage); the parametric registry regenerates it at the swept
    corpus's count via ``dedup.est_quality_sample_mod_for_corpus``."""
    from ..operators import corpus

    if sample_mod is None:
        source = "documents"
    else:
        lcg = (
            f"((doc_id % {corpus.SAMPLE_MOD}) "
            f"* {corpus.SAMPLE_MULT % corpus.SAMPLE_MOD} "
            f"+ {corpus.SAMPLE_INC}) % {corpus.SAMPLE_MOD}"
        )
        source = (
            f"(SELECT * FROM documents "
            f"WHERE ({lcg}) % {sample_mod} = 0)"
        )
    est_sql = dedup_minhash_est_pairs_sql(threshold, source=source)
    exact_sql = dedup_minhash_pairs_sql(threshold, source=source)
    return f"""WITH est AS (
{est_sql}
),
exact AS (
{exact_sql}
),
j AS (
  SELECT COALESCE(e.doc1, x.doc1) AS doc1,
         COALESCE(e.doc2, x.doc2) AS doc2,
         CASE WHEN e.doc1 IS NOT NULL THEN 1 ELSE 0 END AS in_est,
         CASE WHEN x.doc1 IS NOT NULL THEN 1 ELSE 0 END AS in_exact,
         CASE WHEN e.doc1 IS NOT NULL AND x.doc1 IS NOT NULL
              THEN abs(e.est_jaccard - x.jaccard)
              ELSE CAST(0.0 AS DOUBLE) END AS e0
  FROM est e FULL OUTER JOIN exact x
    ON e.doc1 = x.doc1 AND e.doc2 = x.doc2),
p AS (
  SELECT doc1 % 256 AS shard,
         SUM(in_est) AS pe, SUM(in_exact) AS px,
         SUM(in_est * in_exact) AS pb,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(e0 ORDER BY doc1, doc2)),
                     (a, x) -> a + x) AS perr
  FROM j GROUP BY doc1 % 256)
SELECT CAST(SUM(pe) AS BIGINT) AS n_est,
       CAST(SUM(px) AS BIGINT) AS n_exact,
       CAST(SUM(pb) AS BIGINT) AS n_both,
       CASE WHEN SUM(pe) > 0
            THEN CAST(SUM(pb) AS DOUBLE) / CAST(SUM(pe) AS DOUBLE) END
         AS precision,
       CASE WHEN SUM(px) > 0
            THEN CAST(SUM(pb) AS DOUBLE) / CAST(SUM(px) AS DOUBLE) END
         AS recall,
       CASE WHEN SUM(pb) > 0
            THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(perr ORDER BY shard)),
                             (a, x) -> a + x)
                   / CAST(SUM(pb) AS DOUBLE) END
         AS mean_abs_err
FROM p"""


def embedding_threshold_curve_sql(
    thresholds: tuple[float, ...] = similarity._CURVE_GRID,
    n_docs: int | None = None,
) -> str:
    """Twin of queries_dataops.embedding_threshold_curve: the dup-pairs
    CTE at the loosest grid threshold (same planner geometry via
    ``n_docs``), then a grid VALUES spine non-equi-left-joined onto the
    verified cosines — zero-pair grid points report 0."""
    grid = sorted(float(t) for t in thresholds)
    pairs_sql = embedding_dup_pairs_sql(threshold=grid[0], n_docs=n_docs)
    # DuckDB parses bare decimal literals in VALUES as DECIMAL — cast
    values = ", ".join(f"(CAST({t} AS DOUBLE))" for t in grid)
    return f"""WITH pairs AS (
{pairs_sql}
),
grid(threshold) AS (VALUES {values})
SELECT g.threshold,
       CAST(count(p.cosine) AS BIGINT) AS n_pairs
FROM grid g LEFT JOIN pairs p ON p.cosine >= g.threshold
GROUP BY g.threshold
ORDER BY g.threshold"""


def dedup_full_stack_sql(
    near_threshold: float = 0.5,
    sem_threshold: float = 0.4,
    k: int = 8,
    n_iter: int = 2,
) -> str:
    """Twin of queries_dataops.dedup_full_stack: the exact-dedup window,
    the est-pairs CTE chain REBASED onto the exact survivors (the
    ``source`` parameter of ``_minhash_sig_ctes``), the full semdedup
    query nested as a subquery CTE (its own WITH RECURSIVE is legal
    inside the parenthesized body), and the same verdict CASE
    precedence."""
    est_sql = dedup_minhash_est_pairs_sql(near_threshold, source="s1")
    # the est generator emits a complete WITH ...; splice its CTE list
    # into ours (strip the leading "WITH ")
    assert est_sql.startswith("WITH ")
    est_body = est_sql[len("WITH ") :]
    sem_sql = embedding_semdedup_sql(
        k=k, n_iter=n_iter, threshold=sem_threshold
    )
    return f"""WITH exact AS (
  SELECT doc_id,
         doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
           AS is_duplicate
  FROM documents),
s1 AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN exact USING (doc_id) WHERE NOT is_duplicate),
estp AS (
  WITH {est_body}
),
near_losers AS (SELECT DISTINCT doc2 AS doc_id FROM estp),
sem AS (
{sem_sql}
)
SELECT d.doc_id,
  CASE
    WHEN e.is_duplicate THEN 'exact_dup'
    WHEN nl.doc_id IS NOT NULL THEN 'near_dup'
    WHEN NOT COALESCE(sem.keep, TRUE) THEN 'semantic_dup'
    ELSE 'kept'
  END AS verdict
FROM documents d
JOIN exact e USING (doc_id)
LEFT JOIN near_losers nl USING (doc_id)
LEFT JOIN sem ON sem.vec_id = d.doc_id
ORDER BY d.doc_id"""


def dedup_drop_witness_sql(threshold: float = 0.5) -> str:
    """Twin of queries_dataops.dedup_drop_witness: the est-pairs CTE,
    then per doc2 the (doc1, score) struct-min (arg_min on doc1 — the
    struct min's first field dominates, doc1 values are unique per
    doc2 group so the carried score is the argmin pair's) and the hit
    count."""
    pairs_sql = dedup_minhash_est_pairs_sql(threshold)
    return f"""WITH pairs AS (
{pairs_sql}
)
SELECT doc2 AS doc_id,
       MIN(doc1) AS witness_id,
       arg_min(est_jaccard, doc1) AS witness_score,
       CAST(count(*) AS BIGINT) AS n_hits
FROM pairs
GROUP BY doc2
ORDER BY doc_id"""


def embedding_semdedup_screen_sql(
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.4,
    shard_count: int = 256,
    batch_mod: int = 13,
) -> str:
    """Twin of queries_dataops.embedding_semdedup_screen: the semdedup
    chain rebased onto the standing-corpus slice (``source`` param),
    the kept reps joined back to their vectors, then the batch slice
    assigned to the FROZEN centroids and scored against its cell's
    reps only — argmax cosine with ties to the smaller rep id, the
    same IEEE folds throughout."""
    dim = similarity.DIM
    dot_bb = DOT_FOLD.format(n=dim, a="v", b="v")
    dot_bc = DOT_FOLD.format(n=dim, a="e.v", b="c.cvec")
    dot_br = DOT_FOLD.format(n=dim, a="b.v", b="r.v")
    ctes = _semdedup_ctes(
        k, n_iter, threshold, shard_count, source="corpusE"
    )
    ctes.insert(
        0,
        f"""corpusE AS (
  SELECT * FROM embeddings WHERE vec_id % {batch_mod} <> 0)""",
    )
    ctes.append(
        f"""repsq AS (
  SELECT r.vec_id AS rep_id, r.cell, e.v, e.nrm
  FROM rankedk r JOIN embVn e USING (vec_id)
  WHERE r.rn = 1),
batchE AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % {batch_mod} = 0),
batchVn AS (SELECT vec_id, v, sqrt({dot_bb}) AS nrm FROM batchE),
bassign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {dot_bc} / (e.nrm * c.cnrm) DESC, c.cell)
        AS r
    FROM batchVn e CROSS JOIN centsF c) t
  WHERE r = 1),
best AS (
  SELECT vec_id, rep_id, cos FROM (
    SELECT b.vec_id, r.rep_id,
      {dot_br} / (b.nrm * r.nrm) AS cos,
      row_number() OVER (PARTITION BY b.vec_id
                         ORDER BY {dot_br} / (b.nrm * r.nrm) DESC, r.rep_id)
        AS rr
    FROM batchVn b JOIN bassign a USING (vec_id)
    JOIN repsq r ON r.cell = a.cell) t
  WHERE rr = 1)"""
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"""
SELECT a.vec_id, a.cell,
       CASE WHEN best.cos >= {threshold} THEN best.rep_id END AS match_id,
       CASE WHEN best.cos >= {threshold} THEN best.cos END AS match_cos,
       COALESCE(NOT (best.cos >= {threshold}), TRUE) AS keep
FROM bassign a LEFT JOIN best ON best.vec_id = a.vec_id
ORDER BY a.vec_id"""
    )


def web_url_dedup_sql() -> str:
    """Twin of queries_dataops.web_url_dedup: the shared canonicalization
    CTE, min-id per canonical URL, NULL canon rows keeping themselves."""
    return f"""WITH {_url_canon_cte()},
mins AS (
  SELECT url_canon, MIN(doc_id) AS canonical_id
  FROM canon WHERE url_canon IS NOT NULL
  GROUP BY url_canon)
SELECT c.doc_id, c.url_canon,
       COALESCE(m.canonical_id, c.doc_id) AS canonical_id,
       (c.url_canon IS NOT NULL
        AND c.doc_id <> COALESCE(m.canonical_id, c.doc_id))
         AS is_url_duplicate
FROM canon c LEFT JOIN mins m USING (url_canon)
ORDER BY c.doc_id"""


def web_blocklist_screen_sql(
    blocked_host_suffixes: tuple[str, ...] = ("src1.example.com",),
    blocked_path_terms: tuple[str, ...] = ("z=1",),
) -> str:
    """Twin of queries_dataops.web_blocklist_screen: the shared canon
    CTE, exact-label suffix matches (ends_with — never LIKE, whose _
    wildcard could fire inside a suffix), path/query term containment
    on the canonical tail, first-match-wins CASE in the same order."""
    arms = []
    for s in blocked_host_suffixes:
        arms.append(
            f"WHEN host = '{_q(s)}' OR ends_with(host, '.{_q(s)}') "
            f"THEN 'host:{_q(s)}'"
        )
    for term in blocked_path_terms:
        arms.append(
            f"WHEN strpos(path_q, '{_q(term)}') > 0 "
            f"THEN 'path:{_q(term)}'"
        )
    case = "CASE " + " ".join(arms) + " END"
    return f"""WITH {_url_canon_cte()},
tails AS (
  SELECT doc_id, host,
         substr(t, strpos(t, '/')) AS path_q
  FROM (SELECT doc_id, host,
               -- first-'://'-onward, NOT str_split[2]: a later '://'
               -- inside the query (?next=https://x) must stay in the
               -- tail, mirroring Spark's F.split(…, '://', 2) limit-2.
               substr(url_canon, strpos(url_canon, '://') + 3) AS t
        FROM canon))
SELECT doc_id, host,
       {case} AS block_reason,
       ({case}) IS NOT NULL AS blocked
FROM tails
ORDER BY doc_id"""


def _host_scorecard_ctes(
    blocked_host_suffixes: tuple[str, ...] = ("src1.example.com",),
    blocked_path_terms: tuple[str, ...] = ("z=1",),
) -> str:
    """The scorecard CTE chain (dup + blocklist flags, bigram LM score
    source, the two-level (host, doc_id%256) pinned fold) — ends in
    ``sc(host, n_rows, n_url_dups, n_blocked, mean_score)``; expects a
    ``canon`` CTE upstream.  Extracted r14 so the recrawl-budget twin
    composes the identical scorecard."""
    from . import oracle_corpus

    arms = []
    for s in blocked_host_suffixes:
        arms.append(
            f"WHEN host = '{_q(s)}' OR ends_with(host, '.{_q(s)}') THEN 1"
        )
    for term in blocked_path_terms:
        arms.append(f"WHEN strpos(path_q, '{_q(term)}') > 0 THEN 1")
    blocked = "COALESCE(CASE " + " ".join(arms) + " END, 0)"
    scored_sql = oracle_corpus.doc_bigram_lm_sql()
    return f"""scored AS (
{scored_sql}
),
mins AS (
  SELECT url_canon, MIN(doc_id) AS canonical_id
  FROM canon WHERE url_canon IS NOT NULL
  GROUP BY url_canon),
flagged AS (
  SELECT c.doc_id, c.host,
         CASE WHEN c.doc_id <> m.canonical_id THEN 1 ELSE 0 END AS is_dup,
         {blocked} AS blk,
         COALESCE(s.mean_prob, 0.0) AS s0
  FROM canon c
  JOIN mins m USING (url_canon)
  LEFT JOIN scored s USING (doc_id)
  CROSS JOIN LATERAL (
    SELECT substr(t, strpos(t, '/')) AS path_q
    FROM (SELECT substr(c.url_canon, strpos(c.url_canon, '://') + 3)
                   AS t)) pq
  WHERE c.host IS NOT NULL),
partials AS (
  SELECT host, doc_id % 256 AS shard,
         count(*) AS c, SUM(is_dup) AS d, SUM(blk) AS b,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(s0 ORDER BY doc_id)),
                     (a, x) -> a + x) AS p
  FROM flagged GROUP BY host, doc_id % 256),
sc AS (
  SELECT host,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(SUM(d) AS BIGINT) AS n_url_dups,
         CAST(SUM(b) AS BIGINT) AS n_blocked,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(p ORDER BY shard)),
                     (a, x) -> a + x) / CAST(SUM(c) AS DOUBLE)
           AS mean_score
  FROM partials
  GROUP BY host)"""


def web_host_scorecard_sql(
    blocked_host_suffixes: tuple[str, ...] = ("src1.example.com",),
    blocked_path_terms: tuple[str, ...] = ("z=1",),
) -> str:
    """Twin of queries_dataops.web_host_scorecard: the canon CTE, the
    dup and blocklist flags re-derived with the same rules, the bigram
    LM score CTE, then the identical two-level (host, doc_id%256)
    pinned fold for the mean."""
    return f"""WITH {_url_canon_cte()},
{_host_scorecard_ctes(blocked_host_suffixes, blocked_path_terms)}
SELECT host, n_rows, n_url_dups, n_blocked, mean_score
FROM sc
ORDER BY host"""
