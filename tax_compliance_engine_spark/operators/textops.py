"""Text-analysis operators over a documents table — the building blocks a
large-scale training-data pipeline needs (language ID, quality scoring,
token counting, fingerprinting).

All pure Column expressions (whole-stage codegen, zero Python on the
executors); every operator is oracle-checkable against DuckDB.  At 100 TB
these are embarrassingly parallel scans — no shuffle at all except where a
caller aggregates the outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the n-gram/stopword heuristic
# language ID.  Deterministic and SQL-expressible (no model weights).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokens with empties removed (portable: split on single
    space, filter '' — identical in DuckDB string_split)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics + a composite quality score.

    Measures: char/token counts, type-token ratio, average token length,
    punctuation/digit/whitespace ratios, stopword ratio.  The quality score
    is a fixed linear combination — a deterministic stand-in for the usual
    classifier-based scoring, with the same plumbing shape."""
    text = F.col(text_col)
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_alpha = F.length(F.regexp_replace(text, "[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_space = F.length(F.regexp_replace(text, "[^ ]", ""))
    n_punct = n_chars - n_alpha - n_digit - n_space
    nt_d = n_tokens.cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.when(n_tokens > 0, n_distinct.cast("double") / nt_d)
        .otherwise(F.lit(0.0))
        .alias("type_token_ratio"),
        F.when(
            n_tokens > 0,
            (n_chars - n_space).cast("double") / nt_d,
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
        F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
        F.when(n_chars > 0, n_digit.cast("double") / n_chars.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("digit_ratio"),
        F.when(n_tokens > 0, stop_hits.cast("double") / nt_d)
        .otherwise(F.lit(0.0))
        .alias("stopword_ratio"),
    )


# GPT-2-style pretokenizer shape, restricted to constructs with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): contractions, letter
# runs, digit runs, non-space-symbol runs — each with an optional leading
# space.  No lookahead (RE2 has none).
BPE_ISH_PATTERN = r"'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways (training-data budgeting): whitespace tokens
    and a BPE-ish regex pretokenization (subword-ish unit count)."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens_col(text)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length(text).alias("n_chars"),
    )


def quality_score(stats: DataFrame) -> DataFrame:
    """Composite quality score over text_stats output: rewards lexical
    diversity and sane token lengths, penalizes punctuation/digit noise."""
    score = (
        F.lit(0.5) * F.col("type_token_ratio")
        + F.lit(0.3)
        * F.when(
            F.col("avg_token_len").between(3.0, 10.0), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        + F.lit(0.2) * (F.lit(1.0) - F.col("punct_ratio") - F.col("digit_ratio"))
    )
    return stats.withColumn("quality_score", score)


# the Gopher rule set's stop-word list (Rae et al. 2021, Appendix A —
# "must contain at least 2 of": the, be, to, of, and, that, have, with)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def rule_quality_screen(
    docs: DataFrame,
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-style RULE-BASED quality screen (Rae et al. 2021 Appendix
    A; the same heuristic family RedPajama/C4 reuse) — the cheap
    pre-classifier pass every web-corpus build runs before any model
    scoring: per document the measured signals, one boolean per rule,
    the passed-rule count (a usable graded score for
    ``corpus.quality_tiered_sample``), and the all-rules verdict.

    Rules (the published thresholds):
      1. 50 ≤ word count ≤ 100,000
      2. mean word length in [3, 10]
      3. symbol-to-word ratio ≤ 0.1 ('#' and '...' occurrences)
      4. ≤ 90% of lines start with a bullet ('•', '- ', '* ')
      5. ≤ 30% of lines end with an ellipsis ('...' or '…')
      6. ≥ 80% of words contain ≥ 1 alphabetic character
      7. ≥ 2 distinct stop words present (case-insensitive:
         sentence-initial 'The'/'Be' count, per the published intent).
         ``stopwords`` swaps the English ``GOPHER_STOPWORDS`` default
         for a caller-provided list (multilingual corpora pass their
         language's list, the same caller-data pattern as
         ``suffix_rules``); values are lowercased, list must be
         non-empty

    Honesty boundary: rule 6's "alphabetic" is ASCII ``[a-zA-Z]`` only —
    non-Latin-script words count as non-alphabetic, so the screen is
    stricter than Rae et al. on non-English text (both engines agree;
    pair with ``lang_id`` upstream if the corpus is multilingual).

    Determinism/portability: words are the shared whitespace
    tokenization (``tokens_col``), lines split on '\\n' (identical
    both engines, trailing-separator empties included), '...' counts
    via non-overlapping replace (left-to-right, identical semantics),
    every ratio a single exactly-rounded double division with
    zero-denominator guards to 0.0.  Pure Column expressions — one
    embarrassingly parallel scan, zero UDFs, zero shuffles."""
    text = F.col(text_col)
    words = tokens_col(text)
    lines = F.split(text, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)
    nw_d = n_words.cast("double")
    nl_d = n_lines.cast("double")
    sum_word_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, sum_word_len.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / F.lit(3)
    symbol_word_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("•")
            | l.startswith("- ")
            | l.startswith("* "),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    bullet_line_frac = bullet_lines.cast("double") / nl_d
    ellipsis_line_frac = ellipsis_lines.cast("double") / nl_d
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_word_frac = F.when(
        n_words > 0, alpha_words.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    stops = [
        w.lower()
        for w in (GOPHER_STOPWORDS if stopwords is None else stopwords)
    ]
    if not stops:
        raise ValueError("stopwords must be non-empty")
    words_lc = F.transform(words, F.lower)
    n_stop_hits = sum(
        (F.array_contains(words_lc, s).cast("int") for s in stops),
        F.lit(0),
    )
    rules = {
        "rule_word_count": (n_words >= 50) & (n_words <= 100_000),
        "rule_mean_word_len": (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0),
        "rule_symbol_ratio": symbol_word_ratio <= 0.1,
        "rule_bullet_lines": bullet_line_frac <= 0.9,
        "rule_ellipsis_lines": ellipsis_line_frac <= 0.3,
        "rule_alpha_words": alpha_word_frac >= 0.8,
        "rule_stopwords": n_stop_hits >= 2,
    }
    rules_passed = sum(
        (c.cast("int") for c in rules.values()), F.lit(0)
    )
    verdict = None
    for c in rules.values():
        verdict = c if verdict is None else (verdict & c)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        alpha_word_frac.alias("alpha_word_frac"),
        n_stop_hits.cast("int").alias("n_stop_hits"),
        *[c.alias(name) for name, c in rules.items()],
        rules_passed.cast("int").alias("rules_passed"),
        verdict.alias("pass_gopher"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by marker-token hits /
    total tokens; argmax with 'und' (undetermined) when no marker hits.

    Ties break by language code order — deterministic across engines."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks).cast("double")
    def _hits(markers: list[str]) -> Column:
        # factory so the lambda stays unary (extra params would be treated as
        # lambda variables by PySpark's higher-order-function binding)
        return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("double")

    scores = [
        (lang, _hits(markers)) for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):
        pred = F.when(s == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("und"))
    conf = F.when(n_tokens > 0, best_score / n_tokens).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        pred.alias("predicted_lang"),
        conf.alias("lang_confidence"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5, normalized-text md5 (lowered,
    whitespace-collapsed), and a bag-of-words md5 (sorted distinct tokens) —
    the exact-dup, near-normalized-dup, and reordered-dup keys."""
    text = F.col(text_col)
    norm = F.regexp_replace(F.lower(F.trim(text)), " +", " ")
    bow = F.array_join(F.array_sort(F.array_distinct(tokens_col(text))), " ")
    return docs.select(
        "doc_id",
        F.md5(text).alias("fp_exact"),
        F.md5(norm).alias("fp_normalized"),
        F.md5(bow).alias("fp_bow"),
    )


def _ngram_join_col(toks: Column, n: int) -> Column:
    """All (non-distinct) token n-grams as joined strings; empty array for
    docs shorter than n tokens (guarded — sequence(0, negative) would emit a
    DESCENDING sequence, not an empty one)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: top-unigram /
    top-bigram / top-trigram mass fraction and the longest same-token run,
    plus a composite ``is_repetitive`` flag.  (Gopher's duplicate-LINE
    fractions degenerate on single-line documents, so the token-level
    family is the portable core; the thresholds follow the same shape as
    Rae et al. 2021 §A1.1.)

    Fully relational — every shuffle is keyed by doc_id (or doc_id +
    gram), so the operator is embarrassingly parallel over documents at
    100 TB; no per-row O(n²) array expressions.
    """
    toks = docs.select("doc_id", tokens_col(F.col(text_col)).alias("toks"))

    # ONE corpus pass for all three gram sizes: tag each gram with its size
    # and explode the concatenated arrays, then count/aggregate keyed by
    # (doc_id, kind[, gram]).  Separate per-size passes would scan the
    # corpus three times — the difference between one and three full reads
    # at production scale.
    def tagged(kind: int, grams: Column) -> Column:
        return F.transform(
            grams,
            lambda g: F.struct(
                F.lit(kind).alias("kind"), g.alias("gram")
            ),
        )

    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                tagged(1, F.col("toks")),
                tagged(2, _ngram_join_col(F.col("toks"), 2)),
                tagged(3, _ngram_join_col(F.col("toks"), 3)),
            )
        ).alias("kg"),
    ).select("doc_id", "kg.kind", "kg.gram")
    per_kind = (
        grams.groupBy("doc_id", "kind", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "kind")
        .agg(F.max("cnt").alias("top"), F.sum("cnt").alias("tot"))
    )

    def kind_col(kind: int, col: str) -> Column:
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    def frac(kind: int) -> Column:
        return (
            kind_col(kind, "top").cast("double")
            / kind_col(kind, "tot").cast("double")
        )

    profile = per_kind.groupBy("doc_id").agg(
        kind_col(1, "tot").alias("n_tokens"),
        frac(1).alias("top_token_frac"),
        frac(2).alias("top_bigram_frac"),
        frac(3).alias("top_trigram_frac"),
    )

    from pyspark.sql.window import Window

    pos = toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        pos.withColumn("prev", F.lag("tok").over(w))
        .withColumn(
            "chg",
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("tok")), 1
            ).otherwise(0),
        )
        .withColumn(
            "run_id",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("max_token_run"))
    )

    out = (
        docs.select("doc_id")
        .join(profile, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("top_token_frac", F.lit(0.0)).alias("top_token_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("top_trigram_frac", F.lit(0.0)).alias("top_trigram_frac"),
            F.coalesce("max_token_run", F.lit(0)).alias("max_token_run"),
        )
    )
    return out.withColumn(
        "is_repetitive",
        (F.col("top_token_frac") > 0.30)
        | (F.col("top_bigram_frac") > 0.18)
        | (F.col("top_trigram_frac") > 0.16)
        | (F.col("max_token_run") >= 4),
    )


# PII / noise scrub patterns — deliberately restricted to syntax that means
# the same thing in Java regex (Spark) and RE2 (DuckDB): no lookaround, no
# backreferences, ASCII word boundaries only.  (name, pattern, replacement)
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data hygiene: replace URLs / emails / IPv4s / phone numbers
    with typed placeholder tokens and count what was removed, then collapse
    the whitespace the removals may have disturbed.

    Each count is computed on the PROGRESSIVELY scrubbed text (pattern i
    counts matches in the text after replacements 1..i-1 ran), so
    ``n_<name>`` equals the number of replacements that pattern actually
    performed — an email inside a URL counts once as a URL, not twice.

    Pure chained ``regexp_replace`` / ``regexp_count`` Column expressions —
    embarrassingly parallel, whole-stage codegen, no shuffle; the count
    columns let a pipeline quarantine high-PII documents instead of just
    silently rewriting them."""
    counts = []
    scrubbed = F.col(text_col)
    for name, pat, repl in SCRUB_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    scrubbed = F.trim(F.regexp_replace(scrubbed, " +", " "))
    return docs.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        *counts,
        (sum(F.col(f"n_{name}") for name, _, _ in SCRUB_PATTERNS) > 0).alias(
            "had_pii"
        ),
    )


def _char_trigrams(text: Column) -> Column:
    """Array of all character trigrams of a string (positions 1..len−2);
    strings shorter than 3 chars yield an empty array."""
    return F.when(
        F.length(text) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - 2),
            lambda i: text.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lm_coverage(
    docs: DataFrame,
    text_col: str = "text",
    train_pred: Column | None = None,
    min_count: int = 5,
) -> DataFrame:
    """Model-based quality scoring, made integer-exact: a character-
    trigram "language model" is trained on a held-in slice of the corpus
    (trigrams with train count ≥ ``min_count``), and every document is
    scored by the fraction of ITS trigrams the model has seen —
    low-coverage documents are out-of-distribution (gibberish, binary
    spill, wrong language), the same signal CCNet-style perplexity
    filtering uses, but as an exact count ratio instead of a float
    log-prob (JVM/libm ``ln`` may differ by 1 ULP; counts and one
    exactly-rounded division are bit-portable).

    Scale shape: the trigram universe is bounded by the char alphabet
    cubed, so the trained model is ALWAYS broadcastable regardless of
    corpus size — train is one explode + count aggregation with map-side
    combine, scoring is a broadcast semi-probe + one narrow (doc_id)
    count aggregation.  Default train slice: doc_id % 10 < 8 (held-in
    80%), so scores over the held-out 20% are honest.

    Output: (doc_id, n_trigrams, n_covered, coverage)."""
    if train_pred is None:
        train_pred = F.col("doc_id") % 10 < 8
    tri = _char_trigrams(F.col(text_col))
    train_vocab = (
        docs.filter(train_pred)
        .select(F.explode(tri).alias("tri"))
        .groupBy("tri")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("tri")
    )
    scored = (
        docs.select("doc_id", F.explode(tri).alias("tri"))
        .join(
            F.broadcast(train_vocab.withColumn("_hit", F.lit(1))),
            "tri",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_covered"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
        F.when(
            F.coalesce("n_trigrams", F.lit(0)) > 0,
            F.coalesce("n_covered", F.lit(0)).cast("double")
            / F.coalesce("n_trigrams", F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage"),
    )


def _ngram_structs(text: Column, n: int) -> Column:
    """Per-row array of n-gram structs (w1..wn) formed ROW-LOCALLY from
    the token array — ``arrays_zip`` of n aligned slices, each of length
    size−(n−1).  Replaces the posexplode + ``lead()``-window formation:
    the window needed a doc_id Exchange + Sort per n-gram lineage (the
    LM model/score plans carried three to four of them), while this is
    a pure projection — the n-gram content and its 0-based position
    (``posexplode`` of this array = the leading token's position, the
    exact ``p`` the old path produced) are unchanged (guide §2.4:
    remove shuffles outright)."""
    toks = tokens_col(text)
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.arrays_zip(
        *[F.slice(toks, i + 1, width).alias(f"w{i + 1}") for i in range(n)]
    )


def bigram_lm_model(
    docs: DataFrame,
    text_col: str = "text",
    train_pred: Column | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The trained half of the bigram LM: (c12, c1, v) count tables over
    the ``train_pred`` slice (None = the whole frame) — bigram counts,
    context counts, and the one-row distinct-vocabulary size.  Built
    once and cached/persisted, these are the frozen model a scoring
    pass (batch or streaming) probes; all three are map-side-combinable
    aggregations.

    Shape (r14): bigrams form row-locally (``_ngram_structs`` — no
    doc-keyed window shuffle), and c1 derives ALGEBRAICALLY from c12
    (c1(w1) = Σ_w2 c12(w1,w2) — every bigram contributes exactly once
    to its context count), so the corpus is scanned once for c12 plus
    once for the vocabulary instead of three full explode lineages."""
    train_docs = docs if train_pred is None else docs.filter(train_pred)
    grams = train_docs.select(
        F.explode(_ngram_structs(F.col(text_col), 2)).alias("g")
    ).select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    c12 = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    v = (
        train_docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("w")
        )
        .agg(F.count_distinct("w").alias("_v"))
    )
    return c12, c1, v


def bigram_lm_score_against(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    alpha: int = 1,
) -> DataFrame:
    """Score ``docs`` under a FROZEN bigram LM (``bigram_lm_model``
    output): per doc the add-alpha-smoothed mean probability, bigram
    count, and train-unseen bigram count — a pure function of the doc
    and the fixed model, which is what makes the streaming screen's
    micro-batch-local scoring the global semantics.  Same pinned-order
    float discipline as ``bigram_lm_score`` (exactly-rounded divisions,
    token-position-ordered fold, one final division).  Bigrams form
    row-locally (``_ngram_structs`` — no doc-keyed window shuffle);
    ``p`` is the leading token's 0-based position, bit-identical to the
    old posexplode+lead path, so the position-ordered fold is
    unchanged."""
    c12, c1, v = model
    bigrams = docs.select(
        "doc_id",
        F.posexplode(_ngram_structs(F.col(text_col), 2)).alias("p", "g"),
    ).select(
        "doc_id",
        "p",
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
    )
    probs = (
        bigrams.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "p",
            (F.coalesce("_c12", F.lit(0)) == 0).cast("int").alias("_hapax"),
            (
                (F.coalesce("_c12", F.lit(0)) + F.lit(alpha)).cast("double")
                / (
                    F.coalesce("_c1", F.lit(0))
                    + F.lit(alpha) * F.col("_v")
                ).cast("double")
            ).alias("_prob"),
        )
    )
    per_doc = probs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_hapax").cast("long").alias("n_hapax"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("p", "_prob"))
                    ),
                    lambda s: s["_prob"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_prob"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_hapax", F.lit(0)).alias("n_hapax"),
        "mean_prob",
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    train_pred: Column | None = None,
    alpha: int = 1,
) -> DataFrame:
    """GRADED language-model quality score: every document's mean
    add-alpha-smoothed bigram probability under a word-bigram model
    trained on a held-in corpus slice — the CCNet-perplexity signal
    with actual probabilities, complementing ``lm_coverage``'s binary
    seen/unseen counting (coverage says "how much is in-distribution";
    this says "HOW in-distribution the rest is").

    Bit-portability without ``ln`` (JVM Math.log and C libm may differ
    by 1 ULP — the reason the repo's IDF/BM25 are log-free): each
    bigram probability P(w2|w1) = (c12 + alpha) / (c1 + alpha·V) is one
    exactly-rounded IEEE division of exact integers, and the per-doc
    mean folds those doubles in TOKEN-POSITION ORDER (array_sort on the
    position, then a left fold — the same pinned-order discipline as
    the silhouette op) followed by one final division, so every float
    on both engines is the identical bit pattern.

    Scale shape: bigrams come from one ``lead()`` window over the
    posexploded tokens (one doc_id-keyed shuffle); the model is two
    map-side-combinable count tables joined back on their own keys
    (AQE broadcasts when they fit); the per-doc fold carries one
    doc-length-bounded list per document.  Docs with < 2 tokens score
    NULL mean_prob with n_bigrams = 0.

    Train/score halves are exposed separately (``bigram_lm_model`` /
    ``bigram_lm_score_against``) so the model can be built once over a
    standing corpus and served — the streaming quality screen's shape.

    Output: (doc_id, n_bigrams, n_hapax, mean_prob) — n_hapax counts
    the doc's bigrams seen nowhere in the TRAIN slice (c12 = 0), the
    out-of-distribution tail coverage cannot grade."""
    if train_pred is None:
        train_pred = F.col("doc_id") % 10 < 8
    model = bigram_lm_model(docs, text_col, train_pred)
    return bigram_lm_score_against(docs, model, text_col, alpha)


_SB_ALPHA = 0.4  # Brants et al. 2007's backoff weight; exact literal in
# both engines (same parsed double), applied one exactly-rounded
# multiply per backoff level


def trigram_lm_model(
    docs: DataFrame,
    text_col: str = "text",
    train_pred: Column | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The trained half of the stupid-backoff trigram LM: (c123, c12,
    c1, n) count tables over the ``train_pred`` slice (None = the whole
    frame) — trigram counts, bigram counts (BOTH the trigram prefix
    denominator and the backoff numerator probe the same table),
    unigram counts, and the one-row total token count.  All four are
    map-side-combinable aggregations; built once and cached, they are
    the frozen model a scoring pass (batch or streaming) probes.

    Shape (r14): n-grams form row-locally (``_ngram_structs`` — no
    doc-keyed window shuffle anywhere in the model build), and the
    total token count N derives ALGEBRAICALLY from c1 (N = Σ c1), so
    only three corpus passes remain (c123, c12, c1), each a pure
    explode + map-side-combinable count."""
    train_docs = docs if train_pred is None else docs.filter(train_pred)

    def gram_cols(n: int) -> DataFrame:
        return train_docs.select(
            F.explode(_ngram_structs(F.col(text_col), n)).alias("g")
        ).select(*[F.col(f"g.w{i + 1}").alias(f"w{i + 1}") for i in range(n)])

    c123 = gram_cols(3).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("_c123")
    )
    c12 = gram_cols(2).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c12")
    )
    c1 = gram_cols(1).groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    n = c1.agg(F.sum("_c1").alias("_n"))
    return c123, c12, c1, n


def trigram_lm_score_against(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    alpha: float = _SB_ALPHA,
) -> DataFrame:
    """Score ``docs`` under a FROZEN stupid-backoff trigram LM (Brants
    et al. 2007, "Large Language Models in Machine Translation"):

        S(w3|w1,w2) = c123/c12              when the trigram is seen
                    = α·(c23/c2)            else, when the bigram is
                    = α·(α·(c3/N))          else (0 for unseen words)

    — the large-corpus score that skips normalization entirely, which
    is exactly what makes it bit-portable with NO ``ln`` and NO
    smoothing denominator: every branch is one exactly-rounded IEEE
    division of exact integers with at most two exactly-rounded
    multiplies by the α literal, nested in backoff order, and the
    per-doc mean folds the doubles in TOKEN-POSITION ORDER (the same
    pinned-fold discipline as ``bigram_lm_score_against``).

    A pure function of the doc and the fixed model — micro-batch-local
    scoring IS the global semantics, so the streaming screen
    (``streaming/quality_stream.streaming_trigram_lm_writer``) inherits
    it unchanged.  Docs with < 3 tokens score NULL mean_score with
    n_trigrams = 0.

    Output: (doc_id, n_trigrams, n_backoff_bi, n_backoff_uni,
    mean_score) — the backoff counters grade HOW the doc scored:
    n_backoff_bi trigrams fell back to the bigram branch,
    n_backoff_uni all the way to unigram (the out-of-distribution
    tail).  Trigrams form row-locally (``_ngram_structs`` — no
    doc-keyed window shuffle); ``p`` = the leading token's 0-based
    position, bit-identical to the old posexplode+lead path."""
    c123, c12, c1, n = model
    a = F.lit(float(alpha))
    tri = docs.select(
        "doc_id",
        F.posexplode(_ngram_structs(F.col(text_col), 3)).alias("p", "g"),
    ).select(
        "doc_id",
        "p",
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )
    ctx12 = c12.select("w1", "w2", F.col("_c12").alias("_ctx12"))
    c23 = c12.select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        F.col("_c12").alias("_c23"),
    )
    ctx2 = c1.select(F.col("w1").alias("w2"), F.col("_c1").alias("_ctx2"))
    c3u = c1.select(F.col("w1").alias("w3"), F.col("_c1").alias("_c3"))
    tri_seen = F.coalesce("_c123", F.lit(0)) > 0
    bi_seen = F.coalesce("_c23", F.lit(0)) > 0
    score = (
        F.when(
            tri_seen,
            F.col("_c123").cast("double") / F.col("_ctx12").cast("double"),
        )
        .when(
            bi_seen,
            a * (F.col("_c23").cast("double") / F.col("_ctx2").cast("double")),
        )
        .otherwise(
            a
            * (
                a
                * (
                    F.coalesce("_c3", F.lit(0)).cast("double")
                    / F.col("_n").cast("double")
                )
            )
        )
    )
    probs = (
        tri.join(c123, ["w1", "w2", "w3"], "left")
        .join(ctx12, ["w1", "w2"], "left")
        .join(c23, ["w2", "w3"], "left")
        .join(ctx2, ["w2"], "left")
        .join(c3u, ["w3"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "p",
            (~tri_seen & bi_seen).cast("int").alias("_bo_bi"),
            (~tri_seen & ~bi_seen).cast("int").alias("_bo_uni"),
            score.alias("_score"),
        )
    )
    per_doc = probs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("_bo_bi").cast("long").alias("n_backoff_bi"),
        F.sum("_bo_uni").cast("long").alias("n_backoff_uni"),
        (
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "_score"))),
                    lambda s: s["_score"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_score"),
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        F.coalesce("n_backoff_bi", F.lit(0)).alias("n_backoff_bi"),
        F.coalesce("n_backoff_uni", F.lit(0)).alias("n_backoff_uni"),
        "mean_score",
    )


def trigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    train_pred: Column | None = None,
    alpha: float = _SB_ALPHA,
) -> DataFrame:
    """Stupid-backoff trigram extension of the graded LM quality screen:
    train the (c123, c12, c1, N) tables on the held-in slice (default
    doc_id%10 < 8, matching ``bigram_lm_score``), score every document.
    See ``trigram_lm_score_against`` for the backoff math and the
    bit-portability argument."""
    if train_pred is None:
        train_pred = F.col("doc_id") % 10 < 8
    model = trigram_lm_model(docs, text_col, train_pred)
    return trigram_lm_score_against(docs, model, text_col, alpha)


# ── Hashed-feature linear classifier inference ───────────────────────────

QM_BUCKETS = 1 << 16  # feature-hashing space (2^16 buckets)
QM_WEIGHT_SCALE = 500  # weights are integers in [-500, 500]


def default_quality_weights(spark, n_buckets: int = QM_BUCKETS) -> DataFrame:
    """A deterministic stand-in weight table (bucket, weight) for
    ``quality_model_scores`` — integer weights in [-QM_WEIGHT_SCALE,
    QM_WEIGHT_SCALE] derived from the bucket id by a Knuth-style LCG, so
    both engines regenerate it exactly.  A real deployment replaces this
    with learned weights loaded from parquet; the inference plan is
    unchanged."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            (F.col("id") * F.lit(2654435761) + F.lit(40503)) % F.lit(1001)
            - F.lit(QM_WEIGHT_SCALE)
        ).alias("weight"),
    )


def quality_model_scores(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = QM_BUCKETS,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Linear text-classifier INFERENCE over hashed bag-of-words features —
    the fastText-style quality/toxicity filter pattern (score every
    document with a learned linear model; keep the positives) that
    production pretraining pipelines run over the full corpus, expressed
    as a pure DataFrame plan.

    Feature hashing: token → portable 30-bit polynomial hash →
    ``bucket = hash % n_buckets`` — no vocabulary table to build or ship,
    which is the point at 100 TB: the model is a fixed ``n_buckets``-row
    weight table, always broadcastable, and collisions are the standard
    hashing-trick trade.  Score = Σ_tokens tf·w[bucket] accumulated in
    int64 (weights are integers; exact regardless of partitioning/order),
    then normalized once: ``logit = sum_w / (QM_WEIGHT_SCALE·n_tokens)``
    — a single exactly-rounded int64→double division, bit-portable.
    ``keep`` = logit > 0.

    Shuffle shape: explode → map-side-combinable (doc_id, bucket) tf
    aggregation → broadcast weight join → narrow (doc_id) sum.  Empty
    docs survive with n_tokens = 0, logit 0.0, keep = false (left join,
    same discipline as ``lm_coverage``).

    Pass ``weights`` (bucket, weight int) to run a real trained model;
    defaults to ``default_quality_weights`` so the operator is
    self-contained and oracle-checkable."""
    from ..functions import hashing

    if weights is None:
        weights = default_quality_weights(docs.sparkSession, n_buckets)
    tf = (
        docs.select(
            "doc_id", F.explode(tokens_col(F.col(text_col))).alias("tok")
        )
        .select(
            "doc_id",
            (hashing.tok_hash_col(F.col("tok")) % F.lit(n_buckets)).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("weight")).alias("sum_w"),
            F.sum("tf").alias("n_tokens"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.col("sum_w").cast("double")
            / (F.lit(QM_WEIGHT_SCALE) * F.col("n_tokens")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("logit"),
    ).withColumn("keep", F.col("logit") > 0.0)


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Text canonicalization — the preprocessing stage dedup and
    fingerprinting assume has already run: control characters (C0 +
    DEL) become spaces, runs of spaces collapse to one, ends trim, and
    the result lowercases.  Entirely row-local JVM regexp/string ops
    (whole-stage codegen, no shuffle, pushes into the scan); the DuckDB
    twin applies the identical RE2-compatible patterns, so the
    canonical text is byte-identical across engines.

    Output: (doc_id, text_norm, n_chars_raw, n_chars_norm, changed).
    NULL text normalizes to NULL with changed = false (nothing to
    canonicalize, mirroring the scan's permissive contract)."""
    text = F.col(text_col)
    s = F.regexp_replace(text, "[\\x00-\\x1F\\x7F]", " ")
    s = F.regexp_replace(s, " +", " ")
    s = F.lower(F.trim(s))
    return docs.select(
        "doc_id",
        s.alias("text_norm"),
        F.length(text).alias("n_chars_raw"),
        F.length(s).alias("n_chars_norm"),
        F.coalesce(s != text, F.lit(False)).alias("changed"),
    )
