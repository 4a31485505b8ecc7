"""URL / host-level corpus hygiene — the CommonCrawl-pipeline operators a
web-scale corpus build runs BEFORE text dedup: URL canonicalization (so
`HTTP://Example.COM:80/a?b=2&a=1#f` and `http://example.com/a?a=1&b=2`
collapse to one key), per-host mix profiling (what share of the corpus
each host contributes), and deterministic per-host cap sampling (no host
dominates the training mix).

Everything is pure Spark string/regex Column expressions — no UDFs, fully
whole-stage-codegen'd, and every regex is RE2-compatible (no lookaround)
so the DuckDB oracle runs the IDENTICAL patterns.  At 100 TB each
operator is one narrow projection plus at most one host-keyed exchange.

Canonicalization contract (RFC 3986 §6 syntax-based normalization, the
subset that needs no network and no suffix list):

- scheme and host lowercase; userinfo preserved verbatim
- default ports stripped (http:80, https:443); other ports kept
- empty path → "/"
- query: parameters split on "&", empties dropped, byte-order sorted,
  re-joined ("?" dropped when nothing survives)
- fragment stripped
- rows that don't parse as `scheme://...` yield NULL url_canon/host
  (kept, not dropped — the caller decides; a hygiene pipeline typically
  quarantines them)

Deliberately OUT of scope (documented boundary, same honesty rule as the
multimodal codecs): percent-encoding re-normalization, IDN/punycode, and
public-suffix registrable-domain extraction (the PSL is a downloaded
artifact, not spec-derivable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import sample_hash_col

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$"


def _canon_cols(url: Column) -> dict[str, Column]:
    """The shared parse: every piece as a Column expression over ``url``.

    Order of operations matters and is mirrored in the oracle CTE:
    authority ends at the first ``/``, ``?`` or ``#``; the FRAGMENT is
    cut before the query is located (a ``?`` inside a fragment is not a
    query); userinfo splits on the LAST ``@`` (greedy ``^(.*)@``)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_extract(url, _REST_RE, 1)
    authority = F.regexp_extract(rest, "^([^/?#]*)", 1)
    after_auth = F.substring(rest, F.length(authority) + 1, F.lit(2**31 - 1))
    pre_frag = F.regexp_extract(after_auth, "^([^#]*)", 1)
    userinfo = F.regexp_extract(authority, "^(.*)@", 1)
    host_port = F.regexp_extract(authority, "([^@]*)$", 1)
    host = F.lower(F.regexp_extract(host_port, "^([^:]*)", 1))
    port = F.regexp_extract(host_port, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    raw_path = F.regexp_extract(pre_frag, "^([^?]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    query = F.regexp_extract(pre_frag, "\\?(.*)$", 1)
    query_canon = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    url_canon = F.concat(
        scheme,
        F.lit("://"),
        F.when(userinfo != "", F.concat(userinfo, F.lit("@"))).otherwise(
            F.lit("")
        ),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            query_canon != "", F.concat(F.lit("?"), query_canon)
        ).otherwise(F.lit("")),
    )
    parses = scheme != ""
    return {
        "url_canon": F.when(parses, url_canon),
        "host": F.when(parses, host),
    }


def url_canonicalize(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``url_canon`` and ``host`` (both NULL for rows that don't
    parse as ``scheme://...``) — one narrow projection, no shuffle, no
    UDF; the dedup/profile/cap operators below consume the output."""
    cols = _canon_cols(F.col(url_col))
    return df.withColumn("url_canon", cols["url_canon"]).withColumn(
        "host", cols["host"]
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup — the FIRST dedup pass a crawl pipeline runs,
    before any text is even fetched/compared: rows whose URLs
    canonicalize to the same string are one logical page, and the
    smallest id per canonical URL is the canonical fetch.  One row per
    input row with (id, url_canon, canonical_id, is_url_duplicate) —
    the same audit-friendly shape as ``exact_dedup``'s text digest.

    Unparseable rows (NULL url_canon) are never each other's
    duplicates (a NULL key is not a page identity): they keep
    themselves, flagged ``is_url_duplicate = false`` with
    canonical_id = their own id.  One hash aggregation on the
    canonical string + a broadcast-or-shuffle rejoin — no windows."""
    canon = url_canonicalize(df, url_col).select(
        F.col(id_col), "url_canon"
    )
    mins = (
        canon.filter(F.col("url_canon").isNotNull())
        .groupBy("url_canon")
        .agg(F.min(id_col).alias("_canonical_id"))
    )
    return canon.join(mins, "url_canon", "left").select(
        id_col,
        "url_canon",
        F.coalesce("_canonical_id", F.col(id_col)).alias("canonical_id"),
        (
            F.col("url_canon").isNotNull()
            & (F.col(id_col) != F.coalesce("_canonical_id", F.col(id_col)))
        ).alias("is_url_duplicate"),
    )


def url_blocklist_screen(
    df: DataFrame,
    blocked_host_suffixes: list[str],
    blocked_path_terms: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Blocklist screen — the UT1-style pattern pass a crawl pipeline
    runs right after canonicalization: a row is blocked when its
    canonical HOST equals (or is a subdomain of) any blocked suffix, or
    its canonical URL's path/query contains any blocked term.  Appends
    ``block_reason`` ('host:<suffix>' / 'path:<term>', first match in
    the caller's list order wins, host rules before path rules) and
    ``blocked``; unparseable rows are NOT blocked by patterns (no host
    to match) — quarantine them separately.

    Pure Column expressions: the pattern lists unroll into a when-chain
    (blocklists are config-sized; a million-entry list belongs in a
    broadcast join keyed on the host's suffix set — documented
    boundary, same planner honesty as the LSH geometry notes).  Suffix
    matching is exact-label: 'ads.com' blocks 'ads.com' and
    'x.ads.com', never 'roads.com'."""
    if not blocked_host_suffixes and not blocked_path_terms:
        raise ValueError("at least one blocklist must be non-empty")
    blocked_path_terms = blocked_path_terms or []
    canon = url_canonicalize(df, url_col)
    host = F.col("host")
    # path+query = the canonical URL from its first post-authority "/"
    # (the canonical form guarantees a path, so locate always hits)
    tail = F.element_at(F.split(F.col("url_canon"), "://", 2), 2)
    path_q = F.substring(tail, F.locate("/", tail), F.lit(2**31 - 1))
    chain: list = []
    for s in blocked_host_suffixes:
        chain.append(
            ((host == s) | host.endswith("." + s), F.lit(f"host:{s}"))
        )
    for term in blocked_path_terms:
        chain.append((F.locate(term, path_q) > 0, F.lit(f"path:{term}")))
    reason = F.lit(None).cast("string")
    for hit, label in reversed(chain):
        reason = F.when(hit, label).otherwise(reason)
    return canon.withColumn("block_reason", reason).withColumn(
        "blocked", reason.isNotNull()
    )


def host_profile(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host corpus mix: (host, n_urls, n_canon_distinct, share) —
    how many rows each host contributes, how many DISTINCT canonical
    URLs those collapse to (n_urls − n_canon_distinct = the host's
    URL-level duplication), and the host's share of all parseable rows.

    One host-keyed aggregation (distinct counted from per-(host, canon)
    partials, so no count_distinct shuffle of raw rows) plus a one-row
    total broadcast back for the share division.  Unparseable rows
    (NULL host) are excluded — they have no host to attribute."""
    canon = url_canonicalize(df, url_col).filter(F.col("host").isNotNull())
    per_canon = canon.groupBy("host", "url_canon").agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_host = per_canon.groupBy("host").agg(
        F.sum("_n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_canon_distinct"),
    )
    total = per_host.agg(F.sum("n_urls").alias("_total"))
    return per_host.crossJoin(F.broadcast(total)).select(
        "host",
        "n_urls",
        "n_canon_distinct",
        (F.col("n_urls").cast("double") / F.col("_total").cast("double")).alias(
            "share"
        ),
    )


def host_scorecard(
    df: DataFrame,
    doc_scores: DataFrame,
    blocked_host_suffixes: list[str],
    blocked_path_terms: list[str] | None = None,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str = "mean_prob",
) -> DataFrame:
    """Per-host CURATION scorecard — the table a crawl-curation pass
    ranks hosts by before deciding caps/blocks for the NEXT crawl: for
    every canonical host, its row count, URL-level duplicate count
    (same canonical URL, non-canonical fetch), blocklist hits, and the
    mean document quality score.

    The quality mean is bit-portable at any host size: a TWO-LEVEL
    pinned fold (per (host, id%256) shard in id order, shard partials
    in shard order — the kmeans M-step discipline, so a mega-host never
    builds one |host|-element array in a single task).  Docs absent
    from ``doc_scores`` (or NULL-scored) fold as 0.0 — unscorable docs
    drag a host down, which is the curation-correct direction.
    Unparseable-URL rows are excluded (no host).  Output: (host,
    n_rows, n_url_dups, n_blocked, mean_score), one row per host."""
    screened = url_blocklist_screen(
        df, blocked_host_suffixes, blocked_path_terms, url_col
    ).filter(F.col("host").isNotNull())
    dups = url_dedup(df, url_col, id_col).select(
        id_col, "is_url_duplicate"
    )
    scores = doc_scores.select(
        F.col(id_col), F.col(score_col).alias("_hs_score")
    )
    base = (
        screened.select(id_col, "host", "blocked")
        .join(dups, id_col)
        .join(scores, id_col, "left")
        .withColumn("_s0", F.coalesce("_hs_score", F.lit(0.0)))
    )

    def fold(key: str, val: str) -> F.Column:
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(key, val))),
                lambda s: s[val],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    partials = (
        base.withColumn("_shard", F.pmod(F.col(id_col), F.lit(256)))
        .groupBy("host", "_shard")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.col("is_url_duplicate").cast("int")).alias("_d"),
            F.sum(F.col("blocked").cast("int")).alias("_b"),
            fold(id_col, "_s0").alias("_p"),
        )
    )
    return partials.groupBy("host").agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum("_d").cast("long").alias("n_url_dups"),
        F.sum("_b").cast("long").alias("n_blocked"),
        (fold("_shard", "_p") / F.sum("_c").cast("double")).alias(
            "mean_score"
        ),
    )


def per_host_cap_sample(
    df: DataFrame,
    cap: int = 20,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per host, chosen DETERMINISTICALLY: rows
    rank within their host by the shared LCG sampling key of ``id_col``
    (ties → smaller id), and ranks ≤ cap survive — the anti-domination
    mix control every web-corpus build applies (a crawl where one host
    is 40% of pages must not be 40% of training data).

    Stability contract (inherited from ``sample_hash_col``): a kept row
    can only be displaced by a NEW row of the same host with a smaller
    key — never by re-running.  Unparseable rows (NULL host) are
    excluded (no host to cap by; quarantine them upstream).

    One host-keyed window over (id, key) pairs — the vectors/text never
    ride the exchange if the caller projects first.  Output: the kept
    rows' (``id_col``, host, url_canon, host_rank)."""
    if cap < 1:
        raise ValueError(f"cap must be ≥ 1: {cap}")
    from pyspark.sql.window import Window

    canon = url_canonicalize(df, url_col).filter(F.col("host").isNotNull())
    w = Window.partitionBy("host").orderBy("_key", id_col)
    return (
        canon.withColumn("_key", sample_hash_col(F.col(id_col)))
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= cap)
        .select(id_col, "host", "url_canon", "host_rank")
    )
