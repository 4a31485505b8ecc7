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

- percent-encoding normalized FIRST (RFC 3986 §6.2.2.2): %XX pairs that
  decode to an unreserved character (ALPHA / DIGIT / "-" "." "_" "~")
  are decoded; every RETAINED pair's hex is uppercased ("%2f" → "%2F");
  a "%" not followed by two hex digits stays literal.  Decoding
  unreserved bytes never introduces a delimiter, so it is safe on the
  whole string before parsing.
- scheme and host lowercase; userinfo preserved verbatim
- default ports stripped (http:80, https:443); other ports kept
- empty path → "/"
- query: parameters split on "&", empties dropped, byte-order sorted,
  re-joined ("?" dropped when nothing survives)
- fragment stripped
- rows that don't parse as `scheme://...`, or whose post-userinfo
  authority is not `host[:digits]` with a bracket/colon-free host
  (bracketed IPv6 literals, non-numeric ports), yield NULL
  url_canon/host (kept, not dropped — the caller decides; a hygiene
  pipeline typically quarantines them; silently mis-parsing "[::1]" or
  dropping ":8a" would collapse DISTINCT URLs into one dedup key)

Registrable-domain (eTLD+1) grouping: the PSL *file* is a downloaded
artifact and stays out of scope, but the matching *algorithm*
(longest-suffix with wildcard and exception rules) is public spec —
``registrable_domain_col`` takes a caller-provided suffix table and the
host-keyed operators accept ``suffix_rules=`` to group by eTLD+1 so a
subdomain-spraying host can't evade ``per_host_cap_sample``.

IDN normalization (since r13): Unicode host labels are punycode-encoded
to their RFC 3492 ``xn--`` wire form as the final canonicalization
stage (``idn_host_ascii``), so a Unicode host and its xn-- form are ONE
dedup/eTLD+1 key.  Scope: the bootstring algorithm on the lowercased
label, BMP only — no IDNA2008/UTS-46 mapping table (that's a downloaded
artifact, like the PSL file), and astral labels pass through unchanged.

Still deliberately OUT of scope (documented boundary, same honesty rule
as the multimodal codecs): non-UTF-8 percent-encoded octets ≥ 0x80
(decoding those needs charset guessing, not spec).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus import sample_hash_col

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$"
_HEX = "0123456789abcdef"
# post-userinfo authority must be host[:digits], host bracket/colon-free
_AUTH_RE = "^[^:\\[\\]]*(:[0-9]+)?$"


def _pct_normalize(url: Column) -> Column:
    """RFC 3986 §6.2.2.2 percent-encoding normalization as one pure
    Column expression: split on ``%``, decode each following hex pair
    when it is an UNRESERVED byte (ALPHA / DIGIT / ``-.~_``), uppercase
    the hex of every pair that stays encoded, keep a ``%`` without two
    hex digits literal.  Unreserved bytes are never delimiters, so the
    whole-string pass is parse-safe; the result is a fixed point of the
    pass itself (idempotent).  Non-ASCII octets (≥ 0x80) stay encoded —
    decoding them is charset interpretation, not normalization.

    FAST PATH: a URL containing no ``%`` at all — the overwhelming
    majority of a real crawl, and the case every downstream web
    operator pays on every row — short-circuits to the input; the
    split/transform fold only evaluates on rows that carry an escape
    (CASE arms are lazy per row on both engines).  Measured: the
    unguarded fold cost ~2.5× across the whole web family's bench rows;
    the guard restores the pre-pct profile for %-free corpora."""
    parts = F.split(url, "%")
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def piece(p: Column) -> Column:
        hp = F.substring(p, 1, 2)
        hl = F.lower(hp)
        is_hex = hl.rlike("^[0-9a-f]{2}$")
        v = (F.position(F.substring(hl, 1, 1), F.lit(_HEX)) - 1) * 16 + (
            F.position(F.substring(hl, 2, 1), F.lit(_HEX)) - 1
        )
        unreserved = (
            ((v >= 48) & (v <= 57))   # DIGIT
            | ((v >= 65) & (v <= 90))  # ALPHA upper
            | ((v >= 97) & (v <= 122))  # ALPHA lower
            | v.isin(45, 46, 95, 126)  # - . _ ~
        )
        rest_p = F.substring(p, 3, F.lit(2**31 - 1))
        return (
            F.when(is_hex & unreserved, F.concat(F.char(v), rest_p))
            .when(is_hex, F.concat(F.lit("%"), F.upper(hp), rest_p))
            .otherwise(F.concat(F.lit("%"), p))
        )

    return F.when(F.instr(url, "%") == 0, url).otherwise(
        F.concat(
            F.element_at(parts, 1),
            F.array_join(F.transform(tail, piece), ""),
        )
    )


def _canon_cols(url: Column) -> dict[str, Column]:
    """The shared parse: every piece as a Column expression over ``url``,
    which the caller must have ALREADY percent-normalized
    (``_pct_normalize``) — ``url_canonicalize`` stages that as its own
    projection: the pct fold is a higher-order function (CodegenFallback),
    and inlining it here would (a) copy its tree into every extracted
    piece — ~10 evaluations per row — and (b) drag the whole regex parse
    out of whole-stage codegen with it; as a separate alias referenced
    many times, CollapseProject keeps the projections apart, the fold
    runs once per row interpreted, and this parse stays codegen'd
    (measured 2.5× across the web family).

    Order of operations matters and is mirrored in the oracle CTE:
    percent-encoding is normalized FIRST (whole string — unreserved
    decoding can't create delimiters); authority ends at the first
    ``/``, ``?`` or ``#``; the FRAGMENT is cut before the query is
    located (a ``?`` inside a fragment is not a query); userinfo splits
    on the LAST ``@`` (greedy ``^(.*)@``); an authority that is not
    ``host[:digits]`` with a bracket/colon-free host fails the parse
    (NULL outputs — the quarantine contract)."""
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
    parses = (scheme != "") & host_port.rlike(_AUTH_RE)
    return {
        "url_canon": F.when(parses, url_canon),
        "host": F.when(parses, host),
    }


def url_canonicalize(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Append ``url_canon`` and ``host`` (both NULL for rows that don't
    parse as ``scheme://...``) — staged narrow projections (the pct
    fold apart from the codegen'd parse, see ``_canon_cols``; the IDN
    fold apart from both), no shuffle, no UDF; the dedup/profile/cap
    operators below consume the output.

    Since r13 the host additionally passes through IDN normalization
    (``idn_host_ascii``): Unicode labels become their RFC 3492 ``xn--``
    wire form, so ``https://bücher.example.com/`` and
    ``https://xn--bcher-kva.example.com/`` collapse to ONE canonical
    key — the same dup-miss class percent-encoding closed for paths.
    ASCII hosts take a regex fast path and never reach the fold; when
    the host changes, ``url_canon`` is rebuilt around it (scheme +
    userinfo prefix kept, port/path/query tail kept)."""
    return _idn_stage(_parse_canon(df, url_col))


def url_canonicalize_parsed(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """``url_canonicalize`` for consumers that DROP unparseable rows:
    the host-NULL filter runs BETWEEN the parse stage and the IDN stage.
    Filtering the full output instead would let predicate pushdown
    substitute the entire staged IDN fold into the Filter condition
    (measured: a 191-subtree Filter evaluating the fold per row, 4-5×
    on the dedup family) — here the pushed predicate only ever carries
    the cheap parse regexes."""
    return _idn_stage(
        _parse_canon(df, url_col).filter(F.col("host").isNotNull())
    )


@functools.lru_cache(maxsize=64)
def _pct_normalize_cached(col_name: str) -> Column:
    """Memoized ``_pct_normalize(F.col(col_name))`` — the fold's
    Column TREE costs ~70 ms of py4j construction per build; an
    unresolved Column is an immutable expression reusable across any
    number of plans, so build it once per input-column name.  (The
    cache lives as long as the process's py4j gateway, which outlives
    SparkSession restarts.)"""
    return _pct_normalize(F.col(col_name))


@functools.lru_cache(maxsize=8)
def _canon_cols_cached(col_name: str) -> dict[str, Column]:
    """Memoized ``_canon_cols`` (same rationale as
    ``_pct_normalize_cached``; ~80 ms per build)."""
    return _canon_cols(F.col(col_name))


@functools.lru_cache(maxsize=8)
def _idn_fenced_cached(col_name: str) -> Column:
    """Memoized nondeterminism-fenced IDN fold over ``col_name`` — at
    ~420 ms of py4j tree construction per build this was the bulk of
    the ~0.9 s PER-PLAN-CONSTRUCTION driver tax on every canon-bearing
    query (the r13 BASELINE watch item); one cached build amortizes it
    across all plans in the process."""
    return F.element_at(
        F.shuffle(F.array(idn_host_ascii(F.col(col_name)))), 1
    )


def _parse_canon(df: DataFrame, url_col: str) -> DataFrame:
    """pct-normalize + parse stages only (url_canon/host pre-IDN)."""
    normed = df.withColumn("_urln", _pct_normalize_cached(url_col))
    cols = _canon_cols_cached("_urln")
    return (
        normed.withColumn("url_canon", cols["url_canon"])
        .withColumn("host", cols["host"])
        .drop("_urln")
    )


def _idn_stage(raw: DataFrame) -> DataFrame:
    """Rewrite (url_canon, host) to their IDN-normalized forms — its own
    projection (the label fold is CodegenFallback, and _hostp is
    referenced twice below, so CollapseProject keeps it staged: the
    fold runs once per row and only on non-ASCII hosts).

    The fold is wrapped in a one-element shuffle() — a value-identity
    NONDETERMINISM FENCE.  Without it, InferFiltersFromConstraints adds
    ``isnotnull(url_canon)`` above every equi-join/aggregate consumer
    and PushDownPredicates substitutes the ENTIRE staged fold into that
    Filter condition (measured: a 762 KB Filter tree re-evaluating the
    fold per row — 4-8× on the whole url_dedup/scorecard family).
    Catalyst never pushes predicates through, or duplicates,
    nondeterministic projections, so the fold stays exactly one staged
    per-row evaluation; the expression's VALUE is deterministic (a
    1-element array permutation is the identity), so results, retries
    and recomputed partitions are unaffected."""
    idn = raw.withColumn("_hostp", _idn_fenced_cached("host"))
    prefix = F.regexp_extract(
        "url_canon", "^([a-z0-9+.-]+://([^/]*@)?)", 1
    )
    rebuilt = F.concat(
        prefix,
        F.col("_hostp"),
        F.substr(
            F.col("url_canon"),
            F.length(prefix) + F.length("host") + 1,
        ),
    )
    return (
        idn.withColumn(
            "url_canon",
            F.when(
                F.col("host").isNull()
                | (F.col("_hostp") == F.col("host")),
                F.col("url_canon"),
            ).otherwise(rebuilt),
        )
        .withColumn("host", F.col("_hostp"))
        .drop("_hostp")
    )


def _parse_suffix_rules(suffix_rules: list[str]) -> list[tuple[bool, list[str]]]:
    """Validate + lower a PSL-format rule list into (is_exception,
    labels) tuples.  Accepted grammar (the public-suffix algorithm's
    own): dot-separated labels, an optional leading ``!`` marking an
    exception rule, ``*`` only as a WHOLE label (the form every rule in
    the published list uses)."""
    if not suffix_rules:
        raise ValueError("suffix_rules must be non-empty")
    parsed = []
    for rule in suffix_rules:
        r = rule.strip().lower()
        is_exc = r.startswith("!")
        labels = (r[1:] if is_exc else r).split(".")
        if any(not lab for lab in labels):
            raise ValueError(f"empty label in suffix rule: {rule!r}")
        if any("*" in lab and lab != "*" for lab in labels):
            raise ValueError(
                f"'*' must be a whole label in suffix rule: {rule!r}"
            )
        if is_exc and len(labels) < 2:
            raise ValueError(f"exception rule needs ≥2 labels: {rule!r}")
        parsed.append((is_exc, labels))
    return parsed


def registrable_domain_col(
    host: Column, suffix_rules: list[str]
) -> Column:
    """Registrable domain (eTLD+1) of ``host`` under a CALLER-PROVIDED
    suffix table — the public-suffix *algorithm*
    (publicsuffix.org/list/: right-to-left label match, ``*`` matches
    exactly one label, exception ``!rule`` prevails over all others and
    names a suffix one label SHORTER than itself, otherwise the longest
    matching rule wins, default rule ``*`` when nothing matches) as one
    pure Column expression.  The PSL file itself is a downloaded
    artifact and deliberately NOT bundled (module-docstring boundary) —
    tests and the oracle twin pass fixture tables.

    NULL when the host IS a public suffix (no extra label) or is NULL.
    Rule lists are config-sized, so the match unrolls into a
    greatest/when chain — zero UDFs, zero shuffles, whole-stage
    codegen'd; a million-rule table would instead need a broadcast join
    on the host's label-suffix set (same documented boundary as the
    blocklist screen)."""
    parsed = _parse_suffix_rules(suffix_rules)
    labels = F.split(host, "\\.")
    n = F.size(labels)

    def match(rule_labels: list[str]) -> Column:
        k = len(rule_labels)
        cond = n >= k
        for i, lab in enumerate(rule_labels):
            if lab != "*":
                # greatest(…, 1): Column `&` does NOT short-circuit, so
                # a rule longer than the host would feed element_at an
                # index ≤ 0 (a runtime error) even though `n >= k`
                # already falsifies the conjunction; the clamp makes the
                # dead branch safe without changing any outcome.
                cond = cond & (
                    F.element_at(
                        labels, F.greatest(n - k + 1 + i, F.lit(1))
                    )
                    == lab
                )
        return cond

    exc_lens = [
        F.when(match(labels_), F.lit(len(labels_) - 1))
        for is_exc, labels_ in parsed
        if is_exc
    ]
    norm_lens = [
        F.when(match(labels_), F.lit(len(labels_)))
        for is_exc, labels_ in parsed
        if not is_exc
    ] + [F.lit(1)]  # the algorithm's default rule '*'
    norm_len = norm_lens[0] if len(norm_lens) == 1 else F.greatest(*norm_lens)
    suffix_len = (
        F.coalesce(*(exc_lens + [norm_len])) if exc_lens else norm_len
    )
    return F.when(
        host.isNotNull() & (n > suffix_len),
        F.array_join(
            F.slice(labels, n - suffix_len, suffix_len + 1), "."
        ),
    )


# ---------------------------------------------------------------------------
# RFC 3492 punycode (bootstring) ENCODING as pure Column expressions —
# the IDN half of canonicalization: a Unicode host label and its
# wire-form xn-- label must collapse to ONE dedup/eTLD+1 key, the same
# dup-miss class percent-encoding closed for paths.  Encoding (not
# decoding) is the canonical direction because the output stays ASCII —
# representable without a unicode chr(), which neither engine's
# expression language has.
#
# Spec constants: base 36, tmin 1, tmax 26, skew 38, damp 700,
# initial_bias 72, initial_n 128 (RFC 3492 §5).  The encoder's outer
# while-loop is re-expressed as ONE fold over the non-basic characters
# sorted by (codepoint, position) — exactly the order the spec's
# n-sweep emits them — with the inter-emit delta computed in closed
# form from slice counts (see _punycode_label).  The digit-emission and
# bias-adaptation loops are bounded (delta ≤ 0x10FFFF·len, digits
# shrink by ≥×10, adapt by ×35) and unroll to fixed depth.
_PUNY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def _idiv(a: Column, b) -> Column:
    """Non-negative integer division (operands stay ≤ ~2^40, exact in
    the double intermediate)."""
    return F.floor(a / b).cast("long")


def _puny_adapt(delta: Column, numpoints: Column, firsttime: Column) -> Column:
    """RFC 3492 §6.1 bias adaptation.  The while-loop runs as a bounded
    RUNTIME fold over sequence(1, 12) — delta shrinks ×35 per round, so
    12 rounds cover any 2^53-exact input; a compile-time unroll would
    square the expression tree per level (each level references the
    previous twice) and OOM the analyzer."""
    d0 = _idiv(delta, F.when(firsttime, F.lit(700)).otherwise(F.lit(2)))
    d1 = d0 + _idiv(d0, numpoints)
    st = F.aggregate(
        F.sequence(F.lit(1), F.lit(12)),
        F.struct(d1.alias("d"), F.lit(0).cast("long").alias("k")),
        lambda acc, _i: F.struct(
            F.when(acc["d"] > 455, _idiv(acc["d"], 35))
            .otherwise(acc["d"])
            .alias("d"),  # 455 = ((base - tmin) * tmax) / 2
            F.when(acc["d"] > 455, acc["k"] + 36)
            .otherwise(acc["k"])
            .alias("k"),
        ),
    )
    return st["k"] + _idiv(F.lit(36) * st["d"], st["d"] + 38)


def _puny_digits(q: Column, bias: Column) -> Column:
    """RFC 3492 §6.3 inner loop: the variable-length digit string for
    one delta under the current bias (threshold-clamped base-36, LEAST
    significant first), as a bounded runtime fold over sequence(1, 14)
    (radix ≥ 10, so 14 digits cover deltas to 10^14 — far past any real
    label; same analyzer-safety rationale as _puny_adapt)."""
    st = F.aggregate(
        F.sequence(F.lit(1), F.lit(14)),
        F.struct(
            q.cast("long").alias("q"),
            F.lit("").alias("out"),
            F.lit(False).alias("done"),
        ),
        lambda acc, i: _puny_digit_step(acc, i, bias),
    )
    return st["out"]


def _puny_digit_step(acc: Column, i: Column, bias: Column) -> Column:
    k = (i.cast("long")) * 36
    t = (
        F.when(k <= bias, F.lit(1).cast("long"))
        .when(k >= bias + 26, F.lit(26).cast("long"))
        .otherwise(k - bias)
    )
    is_last = acc["q"] < t
    digit = F.when(is_last, acc["q"]).otherwise(
        t + F.pmod(acc["q"] - t, 36 - t)
    )
    ch = F.substr(F.lit(_PUNY_ALPHABET), (digit + 1).cast("int"), F.lit(1))
    return F.struct(
        F.when(acc["done"] | is_last, acc["q"])
        .otherwise(_idiv(acc["q"] - t, 36 - t))
        .alias("q"),
        F.when(acc["done"], acc["out"])
        .otherwise(F.concat(acc["out"], ch))
        .alias("out"),
        (acc["done"] | is_last).alias("done"),
    )


def _let(binding: Column, body) -> Column:
    """Single-use LET-BINDING as a Column: bind ``binding`` (usually a
    struct of shared subexpressions) once and evaluate ``body`` against
    the lambda variable.  Column helpers otherwise INLINE a subtree at
    every reference — the punycode fold referenced its codepoint array
    ~20× and the resulting ~18 KB tree cost ~1 s of driver-side
    optimizer time PER ACTION; with lets it is one copy and leaf
    references."""
    return F.element_at(F.transform(F.array(binding), body), 1)


def _punycode_label(label: Column) -> Column:
    """One lowercase host label → its IDNA wire form: ASCII labels
    (including existing xn--) pass through; labels with non-ASCII
    characters become ``xn--`` + RFC 3492 encoding (basic chars, a
    ``-`` delimiter when any exist, then the delta digits).

    The spec's n-sweep visits non-basic characters in (codepoint,
    position) order; folding over exactly that event list, the delta
    accrued since the previous emit has a closed form from three slice
    counts over the codepoint array (positions 0-based, ranges
    half-open; cps = the label's codepoints):
    - first emit:   (m − 128)·(h+1) + |{q < p : cps[q] < m}|
    - same pass:    |{prev < q < p : cps[q] < m}|
    - new pass:     |{q > prev : cps[q] < m_prev}| + 1
                    + (m − m_prev − 1)·(h+1) + |{q < p : cps[q] < m}|
    (the tail of the previous scan, the spec's delta++/n++, the skipped
    whole passes, and the new scan's head).

    Documented boundary (same honesty rule as the codecs): BMP only —
    a label containing UTF-16 surrogates (astral codepoints, e.g.
    emoji domains) passes through UNCHANGED rather than mis-encoding;
    and no IDNA2008/UTS-46 mapping beyond the lowercase the
    canonicalizer already applied."""
    chars = F.split(label, "")
    env = F.struct(
        F.transform(chars, lambda c: F.ascii(c).cast("long")).alias("cps"),
        F.filter(chars, lambda c: F.ascii(c) < 128).alias("basic"),
    )
    return _let(env, lambda v: _puny_label_body(label, v))


def _puny_label_body(label: Column, v: Column) -> Column:
    cps = v["cps"]
    basic = v["basic"]
    total = F.size(cps).cast("long")
    b = F.size(basic).cast("long")
    events = F.array_sort(
        F.filter(
            F.transform(
                cps,
                lambda c, i: F.struct(
                    c.alias("c"), i.cast("long").alias("p")
                ),
            ),
            lambda e: e["c"] >= 128,
        )
    )

    def cnt(lo: Column, hi: Column, lim: Column) -> Column:
        """|{q in [lo, hi) : cps[q] < lim}| (0-based, half-open)."""
        return (
            F.size(
                F.filter(
                    F.slice(cps, (lo + 1).cast("int"), (hi - lo).cast("int")),
                    lambda x: x < lim,
                )
            ).cast("long")
        )

    init = F.struct(
        F.lit(128).cast("long").alias("m"),
        b.alias("h"),
        F.lit(72).cast("long").alias("bias"),
        F.lit(-1).cast("long").alias("prevp"),
        F.lit("").alias("out"),
    )

    def step(acc: Column, ev: Column) -> Column:
        m = ev["c"]
        p = ev["p"]
        first = acc["prevp"] < 0
        delta = (
            F.when(first, (m - 128) * (acc["h"] + 1) + cnt(F.lit(0), p, m))
            .when(m == acc["m"], cnt(acc["prevp"] + 1, p, m))
            .otherwise(
                cnt(acc["prevp"] + 1, total, acc["m"])
                + 1
                + (m - acc["m"] - 1) * (acc["h"] + 1)
                + cnt(F.lit(0), p, m)
            )
        )
        # let-bind delta: digits + adapt reference it ~5× combined
        return _let(
            F.struct(delta.alias("delta")),
            lambda d: F.struct(
                m.alias("m"),
                (acc["h"] + 1).alias("h"),
                _puny_adapt(d["delta"], acc["h"] + 1, first).alias("bias"),
                p.alias("prevp"),
                F.concat(
                    acc["out"], _puny_digits(d["delta"], acc["bias"])
                ).alias("out"),
            ),
        )

    encoded = F.aggregate(events, init, step, lambda acc: acc["out"])
    has_nonascii = F.exists(cps, lambda x: x >= 128)
    has_surrogate = F.exists(cps, lambda x: (x >= 0xD800) & (x <= 0xDFFF))
    wire = F.concat(
        F.lit("xn--"),
        F.array_join(basic, ""),
        F.when(b > 0, F.lit("-")).otherwise(F.lit("")),
        encoded,
    )
    return F.when(~has_nonascii | has_surrogate, label).otherwise(wire)


def idn_host_ascii(host: Column) -> Column:
    """Whole-host IDN normalization: every dot-separated label through
    ``_punycode_label``.  ASCII hosts (the overwhelming case) hit a
    regex fast path and never touch the fold."""
    puny = F.array_join(
        F.transform(F.split(host, "\\."), _punycode_label), "."
    )
    return F.when(
        host.isNull() | host.rlike("^[\\x00-\\x7f]*$"), host
    ).otherwise(puny)


def _host_group(suffix_rules: list[str] | None) -> Column:
    """The host-keyed operators' group key: the raw canonical host, or —
    when a suffix table is provided — the registrable domain with a
    raw-host fallback (a host that IS a public suffix still needs a
    capping identity of its own)."""
    host = F.col("host")
    if suffix_rules is None:
        return host
    return F.coalesce(registrable_domain_col(host, suffix_rules), host)


def html_extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Markup-to-text extraction — the step between fetch and every
    text operator in a crawl pipeline: drop non-content blocks
    (``<script>``, ``<style>``, comments), strip the remaining tags
    (block-level tags become newlines so line-based quality rules keep
    seeing line structure), decode the five XML-predefined entities +
    ``&nbsp;`` + numeric ``&#NN;`` for ASCII, and collapse runs of
    spaces/tabs.  A deliberately SYNTAX-LEVEL extractor (the documented
    boundary, same honesty rule as the codecs): no DOM, no boilerplate
    classifier, no charset sniffing — those need a parser/model, not
    regex; what this buys is the deterministic, oracle-twinnable 99%
    case for machine-generated pages.

    Every pattern is RE2-compatible ((?s) dotall + non-greedy, no
    lookaround) so the DuckDB twin runs the IDENTICAL regexes.  One
    row-local projection — zero UDFs, zero shuffles, linear scan at any
    scale."""
    s: Column = F.col(html_col)
    # non-content blocks first (non-greedy, case-insensitive, dotall)
    for blk in ("script", "style"):
        s = F.regexp_replace(
            s, f"(?is)<{blk}\\b[^>]*>.*?</{blk}\\s*>", " "
        )
    s = F.regexp_replace(s, "(?s)<!--.*?-->", " ")
    # block-level tags -> newline (keeps line structure for rule screens)
    s = F.regexp_replace(
        s,
        "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|pre)\\b[^>]*>",
        "\n",
    )
    # every remaining tag -> space
    s = F.regexp_replace(s, "(?s)<[^>]*>", " ")
    # entities: the five XML-predefined + nbsp; numeric for ASCII via
    # the same hex/position trick as percent-decoding would be overkill
    # here — decimal &#NN; covers the machine-generated common case
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),  # LAST: '&amp;lt;' must yield '&lt;' literal
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    # collapse horizontal whitespace; trim each line; drop blank lines;
    # strip leading/trailing whitespace of any kind (\s-based, not
    # trim() — both engines' trim() is space-only and would keep \n)
    s = F.regexp_replace(s, "[ \\t\\x0b\\f\\r]+", " ")
    s = F.regexp_replace(s, " ?\\n ?", "\n")
    s = F.regexp_replace(s, "\\n{2,}", "\n")
    s = F.regexp_replace(s, "^\\s+|\\s+$", "")
    return df.withColumn(out_col, s)


# Line-level boilerplate screen parameters (C4 / jusText family):
# a line survives when it has ≥ BOILER_MIN_WORDS words AND (ends in
# terminal punctuation OR its stop-word density ≥ BOILER_STOP_LOW) AND
# contains no blacklist term.  The density threshold is jusText's
# stopwords_low (Pomikálek 2011 §4.2 default 0.30); the terminal-
# punctuation and blacklist rules are C4's line filters (Raffel et al.
# 2020 §2.2: lines not ending in terminal punctuation dropped, pages
# with "javascript"/boilerplate markers screened).
BOILER_MIN_WORDS = 4
BOILER_STOP_LOW = 0.30
BOILER_BLACKLIST = (
    "javascript",
    "cookie",
    "©",
    "all rights reserved",
)


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    neighbor_rescue: bool = True,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Line-level BOILERPLATE screen over extracted text — the pass
    between ``html_extract_text`` (which turns block tags into
    newlines, so lines ≈ blocks) and every downstream text operator:
    nav bars, cookie banners, footers and button labels are short,
    punctuation-free, stop-word-poor lines, and real prose is not.
    C4's line filters plus a jusText-style stop-word-density rescue
    (constants above): a line is KEPT iff it has ≥ 4 words, AND ends
    in terminal punctuation (``. ! ? "``) or has ≥ 30% stop-word
    density, AND contains no blacklist term (case-insensitive).

    CONTEXT PASS (r14, jusText's near-good reclassification adapted to
    the line analog; Pomikálek 2011 §3.3): a NEAR-GOOD line — one that
    fails ONLY the word-count rule (1 ≤ words < 4, still terminal-
    punctuated or stop-dense, still blacklist-free) — is RESCUED when
    both its physical neighbors are locally-kept lines, so a short
    sentence between two kept paragraphs survives while the same line
    isolated in boilerplate still strips.  Single non-iterative pass
    (neighbors must be LOCALLY kept, rescued lines don't chain);
    the punctuation/stop-density and blacklist rules are never
    forgiven.  ``neighbor_rescue=False`` restores the pure line-local
    screen.

    Heuristic honesty: no link density (tags are already stripped);
    the published thresholds are tuned for English and the default stop
    list is ``textops.STOPWORDS`` — ``stopwords`` swaps it for a
    caller-provided list (multilingual corpora pass their language's
    list, the same caller-data pattern as ``suffix_rules``); values are
    lowercased, list must be non-empty.

    Appends ``out_col`` (kept lines re-joined with newlines, '' when
    nothing survives), ``n_lines`` and ``n_lines_kept``.  One row-local
    projection (split → per-line flag array → index-aware filter →
    rejoin), zero UDFs, zero SHUFFLES — the context pass is an
    in-array neighborhood read (``element_at`` on the staged flag
    array with clamped indexes; Spark's ``&`` doesn't short-circuit,
    so the bounds guards alone would not prevent an out-of-range
    element_at error).  The HOF is staged as its own aliased
    projection to keep neighbors codegen'd."""
    from .textops import STOPWORDS

    stops = [w.lower() for w in (STOPWORDS if stopwords is None else stopwords)]
    if not stops:
        raise ValueError("stopwords must be non-empty")

    def flags(line: Column) -> Column:
        toks = F.filter(F.split(line, " "), lambda t: t != "")
        n_words = F.size(toks)
        stop_hits = F.size(
            F.filter(toks, lambda t: F.lower(t).isin(*stops))
        )
        density = stop_hits.cast("double") / n_words.cast("double")
        terminal = line.rlike('[.!?"]$')
        black = None
        for term in BOILER_BLACKLIST:
            hit = F.contains(F.lower(line), F.lit(term))
            black = hit if black is None else (black | hit)
        quality = terminal | (density >= BOILER_STOP_LOW)
        return F.struct(
            ((n_words >= BOILER_MIN_WORDS) & quality & ~black).alias("k"),
            (
                (n_words >= 1)
                & (n_words < BOILER_MIN_WORDS)
                & quality
                & ~black
            ).alias("g"),
        )

    lines = F.split(F.col(text_col), "\n")
    staged = df.withColumn("_lines", lines).withColumn(
        "_flags", F.transform(F.col("_lines"), flags)
    )
    n = F.size("_flags")

    def final_keep(line: Column, i: Column) -> Column:
        cur = F.element_at(F.col("_flags"), i + 1)
        if not neighbor_rescue:
            return cur["k"]
        # clamped indexes: the bounds conjuncts falsify the rescue arm
        # on edge lines, the clamps keep element_at in range regardless
        prev = F.element_at(F.col("_flags"), F.greatest(i, F.lit(1)))
        nxt = F.element_at(F.col("_flags"), F.least(i + 2, n))
        return cur["k"] | (
            cur["g"] & (i >= 1) & (i <= n - 2) & prev["k"] & nxt["k"]
        )

    staged = staged.withColumn(
        "_kept", F.filter(F.col("_lines"), final_keep)
    )
    return staged.select(
        "*",
        F.array_join("_kept", "\n").alias(out_col),
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_lines_kept"),
    ).drop("_lines", "_flags", "_kept")


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    precanonicalized: bool = False,
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
    canonical string + a broadcast-or-shuffle rejoin — no windows.

    ``precanonicalized=True`` skips the parse and trusts an existing
    ``url_canon`` column (from ``url_canonicalize``) — compositions
    that already canonicalized (scorecards) avoid re-running the
    pct-normalize + regex chain per consumer."""
    canon = (
        df if precanonicalized else url_canonicalize(df, url_col)
    ).select(F.col(id_col), "url_canon")
    # no NULL-filter before the aggregate: NULL join keys never match
    # the equi-join below, so the semantics are identical, the null
    # group's min is map-side-combined, and — decisive — a filter here
    # would push down past the staged IDN/pct projections, substituting
    # the whole fold into the Filter condition (measured 4-5× on this
    # family).
    mins = canon.groupBy("url_canon").agg(
        F.min(id_col).alias("_canonical_id")
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
    precanonicalized: bool = False,
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
    canon = (
        df if precanonicalized else url_canonicalize(df, url_col)
    )
    reason = _blocklist_reason(
        F.col("host"),
        _path_query(F.col("url_canon")),
        blocked_host_suffixes,
        blocked_path_terms or [],
    )
    return canon.withColumn("block_reason", reason).withColumn(
        "blocked", reason.isNotNull()
    )


def _path_query(url_canon: Column) -> Column:
    """path+query = the canonical URL from its first post-authority '/'
    (the canonical form guarantees a path, so locate always hits)."""
    tail = F.element_at(F.split(url_canon, "://", 2), 2)
    return F.substring(tail, F.locate("/", tail), F.lit(2**31 - 1))


def _blocklist_reason(
    host: Column,
    path_q: Column,
    blocked_host_suffixes: list[str],
    blocked_path_terms: list[str],
) -> Column:
    """First-match-wins block_reason when-chain (host rules before path
    rules, caller list order) — shared between the standalone screen
    and the scorecard's single-canonicalization lineage."""
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
    return reason


def _robots_pattern_to_re(path_pattern: str) -> str:
    """RFC 9309 path pattern → anchored RE2 regex: ``*`` matches any
    octet sequence, a TRAILING ``$`` anchors the end, every other
    character is literal.  Identical escaping on both engines (the
    escaped-literal subset of RE2 and Java regex agree)."""
    import re as _re

    anchor_end = path_pattern.endswith("$")
    body = path_pattern[:-1] if anchor_end else path_pattern
    rx = "".join(
        ".*" if c == "*" else _re.escape(c) for c in body
    )
    return "^" + rx + ("$" if anchor_end else "")


def robots_screen(
    df: DataFrame,
    rules: list[tuple[str, str]],
    url_col: str = "url",
    precanonicalized: bool = False,
) -> DataFrame:
    """Robots-exclusion screen (RFC 9309 / the REP semantics every
    crawler implements) against a CALLER-PROVIDED rule group — the
    caller has already resolved which user-agent group applies;
    fetching/parsing robots.txt is I/O, the *matching algorithm* is
    spec: a rule matches when its path pattern prefix-matches the
    canonical path+query (``*`` any sequence, trailing ``$`` anchors),
    the LONGEST (octet-length) matching pattern wins, and on a
    length tie ALLOW wins (the least-restrictive rule); no matching
    rule means allowed.

    Scoring is one integer per rule (2·pattern_length + is_allow, so
    the spec's tie-break falls out of max()), unrolled over the
    config-sized rule list — pure Column expressions, zero UDFs, the
    million-rule boundary documented on the blocklist screen applies
    here too.  Unparseable rows get NULL verdicts (quarantine, never
    silently allowed).  Appends ``robots_rule`` (the winning
    "allow:<pattern>"/"disallow:<pattern>", NULL when nothing matched)
    and ``robots_allowed``."""
    if not rules:
        raise ValueError("rules must be non-empty")
    parsed = []
    for directive, pattern in rules:
        d = directive.strip().lower()
        if d not in ("allow", "disallow"):
            raise ValueError(f"directive must be allow|disallow: {directive!r}")
        if not pattern or pattern[0] not in "/*":
            raise ValueError(f"path pattern must start with / or *: {pattern!r}")
        parsed.append((d == "allow", pattern, _robots_pattern_to_re(pattern)))
    canon = df if precanonicalized else url_canonicalize(df, url_col)
    tail = F.element_at(F.split(F.col("url_canon"), "://", 2), 2)
    path_q = F.substring(tail, F.locate("/", tail), F.lit(2**31 - 1))
    scores = [
        F.when(path_q.rlike(rx), F.lit(2 * len(pat) + int(allow)))
        for allow, pat, rx in parsed
    ]
    best = F.greatest(*scores, F.lit(-1)) if len(scores) > 1 else F.coalesce(
        scores[0], F.lit(-1)
    )
    rule_label = F.lit(None).cast("string")
    # first rule (caller order) holding the best score wins the label;
    # build the chain in reverse so earlier rules override later ones
    for allow, pat, rx in reversed(parsed):
        d = "allow" if allow else "disallow"
        rule_label = F.when(
            path_q.rlike(rx)
            & (F.lit(2 * len(pat) + int(allow)) == best),
            F.lit(f"{d}:{pat}"),
        ).otherwise(rule_label)
    allowed = (best == -1) | (F.pmod(best, F.lit(2)) == 1)
    parses = F.col("host").isNotNull()
    return canon.withColumn(
        "robots_rule", F.when(parses, rule_label)
    ).withColumn("robots_allowed", F.when(parses, allowed))


def robots_resolve(
    robots: DataFrame,
    product_token: str,
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """RFC 9309 §2.2.1 GROUP RESOLUTION — the front half of
    ``robots_screen``: given raw robots.txt bodies (one per host), find
    the rule group that applies to ``product_token`` and emit its
    allow/disallow rules as rows.  This is the piece a real crawl
    pipeline holds data for (fetched robots bodies), where the batch
    screen required the caller to have already resolved the group.

    Parse (shared bit-for-bit with the DuckDB twin):
    - physical lines split on LF, CR stripped first (CRLF files);
    - comments stripped (first ``#`` to end of line);
    - a recognized line is ``field: value`` — field matched as
      ``[A-Za-z][A-Za-z-]*`` case-insensitively, surrounding blanks
      ignored, value = the first whitespace-free token (RFC tokens and
      path patterns contain no blanks); unrecognized and empty-value
      lines are IGNORED (they do not terminate a group, per RFC 9309 —
      an empty Disallow pattern matches nothing, so dropping it is
      semantics-preserving);
    - a group = a maximal run of consecutive ``user-agent`` lines plus
      the rules that follow it; rules before any user-agent line are
      ignored.

    Matching (§2.2.1): a user-agent value matches when it is ``*`` or a
    case-insensitive PREFIX of the crawler's product token ("googlebot"
    matches token "googlebot-news"); specificity = value length (``*``
    = 0); the group(s) with the highest specificity win and ties are
    CONCATENATED into one effective group (multiple ``user-agent: *``
    groups combine, per the RFC's merge rule).  A host whose file has
    no matching group emits NO rows — absence means no restrictions.

    Rules whose pattern does not start with ``/`` or ``*`` are dropped
    (the RFC path grammar; keeps the output valid ``robots_screen``
    input).  Output: (host, line_no, directive, path_pattern), one row
    per surviving rule, ``line_no`` 1-based for a stable file order.

    Scale: one explode (bounded — robots bodies cap at ~500 KiB per
    RFC §2.4), two host-keyed windows over the line rows, host-keyed
    aggregations and joins; nothing global."""
    tok = product_token.strip().lower()
    if not tok:
        raise ValueError("product_token must be non-empty")
    from pyspark.sql.window import Window

    parsed = _robots_lines(robots, body_col, host_col).filter(
        F.col("field").isin("user-agent", "allow", "disallow")
        & (F.col("value") != "")
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("field") == "user-agent"
    new_group = (
        is_ua & (F.coalesce(F.lag("field").over(w), F.lit("")) != "user-agent")
    ).cast("int")
    grouped = parsed.withColumn("group_id", F.sum(new_group).over(w))
    spec = F.when(F.col("value") == "*", F.lit(0)).when(
        F.lit(tok).startswith(F.lower(F.col("value"))),
        F.length("value"),
    )
    group_specs = (
        grouped.filter(is_ua)
        .groupBy("host", "group_id")
        .agg(F.max(spec).alias("_spec"))
    )
    best = group_specs.groupBy("host").agg(F.max("_spec").alias("_best"))
    winners = (
        group_specs.join(best, "host")
        .filter(F.col("_spec") == F.col("_best"))
        .select("host", "group_id")
    )
    return (
        grouped.filter(~is_ua & (F.col("group_id") > 0))
        .join(winners, ["host", "group_id"])
        .filter(F.col("value").rlike("^[/*]"))
        .select(
            "host",
            "line_no",
            F.col("field").alias("directive"),
            F.col("value").alias("path_pattern"),
        )
    )


def _robots_lines(
    robots: DataFrame, body_col: str, host_col: str
) -> DataFrame:
    """The shared robots.txt line parse: CR-stripped LF split with
    1-based ordinals, comments cut, case-insensitive ``field: value``
    recognition (value = first whitespace-free token).  Emits every
    physical line as (host, line_no, field, value) — callers filter to
    the record types they consume."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(
                F.replace(F.col(body_col), F.lit("\r"), F.lit("")), "\n"
            )
        ).alias("_pos", "_line"),
    ).withColumn("line_no", F.col("_pos") + 1)
    decommented = F.regexp_extract("_line", "^([^#]*)", 1)
    field = F.lower(
        F.regexp_extract(decommented, "^[ \t]*([A-Za-z][A-Za-z-]*)[ \t]*:", 1)
    )
    value = F.regexp_extract(
        decommented,
        "^[ \t]*[A-Za-z][A-Za-z-]*[ \t]*:[ \t]*([^ \t]*)",
        1,
    )
    return lines.select(
        "host", "line_no", field.alias("field"), value.alias("value")
    )


def robots_sitemaps(
    robots: DataFrame,
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """SITEMAP DISCOVERY from raw robots.txt bodies — the other record
    type a crawl pipeline reads from the same fetch: per RFC 9309
    §2.2.4 (other records) and the sitemaps.org protocol, ``Sitemap:``
    lines are GROUP-INDEPENDENT (they apply regardless of any
    user-agent group, so no resolution pass is involved) and their
    value is an absolute URL.  Emits (host, line_no, sitemap_url) in
    file order — one row per syntactically valid Sitemap line (the
    value must parse as ``scheme://…``; relative or junk values are
    dropped, the quarantine-not-guess stance).  Duplicate declarations
    are preserved (callers dedup downstream — file order is evidence).

    Same parse contract as ``robots_resolve`` (shared ``_robots_lines``)
    and the same scale shape: one bounded explode, a row-local filter,
    no shuffles at all."""
    return (
        _robots_lines(robots, body_col, host_col)
        .filter(
            (F.col("field") == "sitemap")
            & F.col("value").rlike(_SCHEME_RE)
        )
        .select("host", "line_no", F.col("value").alias("sitemap_url"))
    )


def robots_crawl_delay(
    robots: DataFrame,
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """CRAWL-DELAY extraction from raw robots.txt bodies — the third
    record type the same fetch carries (non-standard but universally
    emitted; Bing/Yandex honor it, Google ignores it).  HOST-LEVEL
    first-value semantics: the FIRST syntactically valid
    ``Crawl-delay:`` line per file wins regardless of user-agent
    grouping — the conservative defensive-pacing reading (group-scoped
    pacing would need the resolver's token + group machinery for a
    number that callers apply per host anyway; documenting the
    simplification, same honesty rule as the screens).  Value grammar:
    non-negative decimal seconds; junk values quarantined.

    Output: (host, line_no, crawl_delay double) — one row per host
    that declares a valid delay.  One bounded explode + one host-keyed
    min; no joins."""
    delays = _robots_lines(robots, body_col, host_col).filter(
        (F.col("field") == "crawl-delay")
        & F.col("value").rlike("^[0-9]+(\\.[0-9]+)?$")
    )
    first = delays.groupBy("host").agg(
        F.min(
            F.struct(
                F.col("line_no").alias("ln"),
                F.col("value").cast("double").alias("d"),
            )
        ).alias("_first")
    )
    return first.select(
        "host",
        F.col("_first.ln").alias("line_no"),
        F.col("_first.d").alias("crawl_delay"),
    )


def frontier_urls(
    sitemap_entries: DataFrame,
    corpus: DataFrame,
    url_col: str = "url",
    loc_col: str = "loc",
) -> DataFrame:
    """FRONTIER CONSTRUCTION — the step that closes the discovery loop:
    given parsed sitemap entries (``sitemap_urls`` output) and the
    already-crawled corpus, emit the canonical URLs declared in
    sitemaps that the corpus does NOT yet have — the next crawl's
    fetch candidates.

    Only ``kind = 'urlset'`` entries are page URLs (index entries name
    MORE sitemaps and feed the sitemap fetcher, not the page frontier).
    Candidate locs run through the full canonicalizer
    (``url_canonicalize_parsed`` — pct + parse + IDN, unparseable locs
    dropped; the output ``host`` is the loc's canonical TARGET host,
    the one the fetch and the ``recrawl_budget`` join schedule by — the
    DECLARING sitemap is the ``sitemap_url`` provenance column), then
    collapse to one row per canonical URL: provenance = the MIN
    (sitemap_url, ord) struct (first declaring sitemap in a
    deterministic order), freshness = the MAX declared lastmod (a URL
    listed in several sitemaps is as fresh as its newest claim).  The
    crawled side is the corpus's distinct canonical URLs; a LEFT ANTI
    join on ``url_canon`` leaves exactly the unseen ones.

    Scale shape: two keyed aggregations (candidate collapse, corpus
    distinct) and one anti equi-join, all on ``url_canon`` — no
    windows over data rows, no single-partition stages; at 100 TB the
    corpus side is the big input and stays a hash-partitioned
    distinct.  Output: (url_canon, host, sitemap_url, ord, lastmod),
    one row per NEW canonical URL."""
    cand = url_canonicalize_parsed(
        sitemap_entries.filter(F.col("kind") == "urlset"), loc_col
    )
    collapsed = (
        cand.groupBy("url_canon")
        .agg(
            # host is functionally dependent on url_canon (same string
            # parses to the same host) — min is just a deterministic
            # pick, not a choice
            F.min("host").alias("host"),
            F.min(
                F.struct(
                    F.col("sitemap_url").alias("s"),
                    F.col("ord").alias("o"),
                )
            ).alias("_prov"),
            F.max("lastmod").alias("lastmod"),
        )
        .select(
            "url_canon",
            "host",
            F.col("_prov.s").alias("sitemap_url"),
            F.col("_prov.o").alias("ord"),
            "lastmod",
        )
    )
    crawled = (
        url_canonicalize_parsed(corpus, url_col)
        .select("url_canon")
        .distinct()
    )
    return collapsed.join(crawled, "url_canon", "left_anti")


def recrawl_budget(
    scorecard: DataFrame,
    robots: DataFrame,
    window_sec: float = 3600.0,
    default_delay: float = 1.0,
    min_delay: float = 0.1,
    tier_shares: tuple[float, ...] = (1.0, 0.5, 0.25, 0.1),
    score_col: str = "mean_score",
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """PER-HOST FETCH-BUDGET ALLOCATION — the table a crawler's
    scheduler actually consumes, composing the two signals the crawl
    side already produces: ``host_scorecard``'s desirability ranking
    (which hosts deserve recrawl) and ``robots_crawl_delay``'s declared
    politeness (how fast each host may be fetched).

    Per host: ``effective_delay`` = the declared Crawl-delay when
    present, ``default_delay`` otherwise, floored at ``min_delay``
    (a declared 0 never means unbounded); ``polite_cap`` =
    floor(window_sec / effective_delay) — the politeness CEILING of
    fetches per scheduling window (0 when the delay exceeds the
    window: a slower-than-window host genuinely gets no fetch every
    window, honesty over convenience).  Hosts are then ranked by
    ``score_col`` DESCENDING (rank 1 = most desirable; ties by host
    ascending), cut into len(``tier_shares``) equal-population tiers,
    and allocated ``floor(polite_cap · share)`` fetches — shares must
    be NON-INCREASING, so the allocation is monotone in rank for any
    fixed delay: a better-ranked host never gets fewer fetches than a
    worse-ranked host with the same politeness cap.

    Score domain contract: ``score_col`` ∈ [0, 10) with NULL → 0.0
    (the ``quality_tiered_sample`` ordering contract — the rank key is
    the same floor(score·10¹⁵) zero-padded string, out-of-domain rows
    raise at execution).

    Scale shape: one host-keyed LEFT join (delays), the audited
    two-level ``sharded_global_rank`` (never a single-partition sort),
    one scalar count broadcast, then a projection.  Output: (host,
    score, rank, tier, share, crawl_delay — NULL when nothing valid
    declared, effective_delay, polite_cap, allocated_fetches)."""
    from .topk import sharded_global_rank

    if window_sec <= 0 or min_delay <= 0 or default_delay < 0:
        raise ValueError(
            "window_sec and min_delay must be > 0, default_delay >= 0"
        )
    if not tier_shares or any(not 0.0 <= r <= 1.0 for r in tier_shares):
        raise ValueError(
            f"tier_shares must be non-empty, each in [0,1]: {tier_shares}"
        )
    if any(
        tier_shares[i] < tier_shares[i + 1]
        for i in range(len(tier_shares) - 1)
    ):
        raise ValueError(
            f"tier_shares must be non-increasing (monotone-in-rank "
            f"allocation contract): {tier_shares}"
        )
    n_tiers = len(tier_shares)

    delays = robots_crawl_delay(robots, body_col, host_col).select(
        host_col, "crawl_delay"
    )
    s = F.coalesce(F.col(score_col), F.lit(0.0))
    qkey = F.when(
        (s < 0.0) | (s >= 10.0),
        F.raise_error(
            F.concat(
                F.lit(
                    "recrawl_budget: score outside the [0, 10) "
                    "ordering domain (see docstring): "
                ),
                s.cast("string"),
            )
        ),
    ).otherwise(
        F.lpad(
            F.floor(s * F.lit(1e15)).cast("long").cast("string"), 16, "0"
        )
    )
    # CACHED: everything downstream is per-HOST (small at any corpus
    # scale — hosts ≪ rows), but its lineage embeds the full scorecard
    # aggregation over the corpus.  Without the cache the plan
    # re-evaluates that lineage four times (the rank window side, the
    # shard-count side, the total-count scalar, each a full corpus
    # scan+LM pass — measured 36 parquet scans in one plan at sf0.1);
    # with it the corpus is read once and the rank machinery runs over
    # the materialized per-host rows (guide §2.4 / §5).
    joined = (
        scorecard.join(delays, host_col, "left")
        .select(
            F.col(host_col),
            s.alias("score"),
            qkey.alias("_qkey"),
            "crawl_delay",
        )
        .cache()
    )
    # ascending rank (worst first, ties host DESC) inverted against the
    # broadcast total => descending rank 1..N with ties host ASC
    ranked = sharded_global_rank(
        joined, "_qkey", F.col(host_col).desc(), out="_ar"
    )
    # rank preserves rows, so the total over the CACHED input is the
    # same count without re-running the window+offset machinery
    total = joined.agg(F.count(F.lit(1)).alias("_rn"))
    shares = F.array(*[F.lit(float(r)) for r in tier_shares])
    eff = F.greatest(
        F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
        F.lit(float(min_delay)),
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("rank", (F.col("_rn") - F.col("_ar") + 1).cast("long"))
        .withColumn(
            "tier",
            F.expr(f"CAST(((rank - 1) * {n_tiers}) DIV _rn AS INT)"),
        )
        .withColumn("share", F.element_at(shares, F.col("tier") + 1))
        .withColumn("effective_delay", eff)
        .withColumn(
            "polite_cap",
            F.floor(F.lit(float(window_sec)) / F.col("effective_delay")),
        )
        .withColumn(
            "allocated_fetches",
            F.floor(F.col("polite_cap") * F.col("share")),
        )
        .select(
            host_col,
            "score",
            "rank",
            "tier",
            "share",
            "crawl_delay",
            "effective_delay",
            "polite_cap",
            "allocated_fetches",
        )
    )


# XML-predefined entities for sitemap <loc> values (sitemaps.org
# requires locs entity-escaped).  '&amp;' LAST: '&amp;lt;' must yield
# the literal '&lt;', same ordering rule as html_extract_text.
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)
_CDATA_RE = "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$"
_TRIM_RE = "^\\s+|\\s+$"


def sitemap_urls(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    url_col: str = "sitemap_url",
    host_col: str = "host",
) -> DataFrame:
    """SITEMAP DOCUMENT PARSING — the frontier-building step between
    ``robots_sitemaps``' discovery and fetch: given fetched sitemap
    documents (sitemaps.org protocol), emit one row per declared URL.
    Handles BOTH document kinds: ``<urlset>`` (leaf sitemaps, ``<url>``
    entries) and ``<sitemapindex>`` (index-of-sitemaps, ``<sitemap>``
    entries — their locs are MORE sitemaps to fetch, not page URLs;
    ``kind`` tells the caller which frontier the row feeds).

    Per entry: ``loc`` = the ``<loc>`` value, whitespace-trimmed,
    CDATA-unwrapped (CDATA content is literal — no entity decoding
    inside, per XML), otherwise XML-entity-decoded (sitemaps.org
    REQUIRES locs entity-escaped, so ``&amp;`` in query strings is the
    common case); entries whose loc is not an absolute
    ``scheme://...`` URL are DROPPED (protocol requirement;
    quarantine-not-guess, same stance as ``robots_sitemaps``).
    ``lastmod`` = the W3C-datetime ``<lastmod>`` value's DATE part when
    the value starts ``YYYY-MM-DD`` and is a real calendar date, else
    NULL (junk quarantined, time-of-day out of scope — recrawl
    scheduling is day-granular).  ``ord`` is the entry's 1-based
    position among ALL the document's entries (dropped entries leave
    GAPS — file-order provenance survives the quarantine).

    A document that is neither kind emits NO rows — ``<url>`` blocks
    inside a junk/HTML body never reach the extractor (the kind gate
    comes first), so an HTML error page served as /sitemap.xml
    contributes nothing.

    A deliberately SYNTAX-LEVEL extractor like ``html_extract_text``
    (the documented boundary): regex tag-walk, no XML parser, no
    namespace resolution, no nested-CDATA pathologies.  Every pattern
    is RE2-compatible so the DuckDB twin runs the IDENTICAL regexes.
    One bounded explode (sitemap files cap at 50 MB / 50k entries per
    the protocol) over a row-local projection — zero UDFs, zero
    shuffles, linear at any corpus size.

    Output: (host, sitemap_url, kind, ord, loc, lastmod)."""
    body = F.col(xml_col)
    kind = F.when(body.rlike("(?is)<sitemapindex\\b"), F.lit("index")).when(
        body.rlike("(?is)<urlset\\b"), F.lit("urlset")
    )
    # '<sitemap\b' does NOT match the '<sitemapindex' open tag ('\b'
    # needs a non-word char after 'sitemap'), so index entries extract
    # cleanly without excluding the root element by hand.
    blocks = F.when(
        F.col("kind") == "index",
        F.regexp_extract_all(
            F.col("_b"),
            F.lit("(?is)<sitemap\\b[^>]*>(.*?)</sitemap\\s*>"),
            F.lit(1),
        ),
    ).when(
        F.col("kind") == "urlset",
        F.regexp_extract_all(
            F.col("_b"), F.lit("(?is)<url\\b[^>]*>(.*?)</url\\s*>"), F.lit(1)
        ),
    )
    ex = (
        df.select(host_col, url_col, kind.alias("kind"), body.alias("_b"))
        .withColumn("_blocks", blocks)
        .select(
            host_col,
            url_col,
            "kind",
            F.posexplode("_blocks").alias("_i", "_blk"),
        )
    )
    raw_loc = F.regexp_replace(
        F.regexp_extract("_blk", "(?is)<loc[^>]*>(.*?)</loc\\s*>", 1),
        _TRIM_RE,
        "",
    )
    unwrapped = F.when(
        raw_loc.rlike(_CDATA_RE),
        F.regexp_replace(
            F.regexp_extract(raw_loc, _CDATA_RE, 1), _TRIM_RE, ""
        ),
    )
    decoded = raw_loc
    for ent, rep in _XML_ENTITIES:
        decoded = F.replace(decoded, F.lit(ent), F.lit(rep))
    loc = F.coalesce(unwrapped, decoded)
    raw_lm = F.regexp_replace(
        F.regexp_extract("_blk", "(?is)<lastmod[^>]*>(.*?)</lastmod\\s*>", 1),
        _TRIM_RE,
        "",
    )
    lastmod = F.when(
        raw_lm.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"),
        F.try_to_date(F.substring(raw_lm, 1, 10)),
    )
    return (
        ex.select(
            host_col,
            url_col,
            "kind",
            (F.col("_i") + 1).alias("ord"),
            loc.alias("loc"),
            lastmod.alias("lastmod"),
        )
        .filter(F.col("loc").rlike(_SCHEME_RE))
    )


def _robots_pattern_rx_col(pattern: Column) -> Column:
    """Column form of ``_robots_pattern_to_re`` for DATA-driven patterns
    (resolved from robots bodies, not a config list): trailing ``$``
    anchors, ``*`` → ``.*``, everything else escaped literal.  The
    escape class covers every regex metacharacter except ``*`` (handled
    after) — identical output to the Python form for the shared
    ``[/*]``-prefixed input space."""
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    starred = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), starred, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def robots_screen_resolved(
    df: DataFrame,
    robots: DataFrame,
    product_token: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    body_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """The END-TO-END robots screen: resolve each host's applicable rule
    group from raw robots.txt bodies (``robots_resolve``), then apply
    RFC 9309 longest-match/allow-wins-ties to every document URL — the
    whole admission decision from (url, robots body) with no
    caller-side prep.  Same verdict semantics as ``robots_screen``:
    unmatched → allowed, a host with no applicable group (or no robots
    row at all) → allowed, unparseable URLs → NULL verdicts.

    The rule patterns are DATA here, so matching runs as a host-keyed
    join (docs × their host's ≤file-sized rule list) followed by a
    per-(doc, rule) regex and one id-keyed max — all keyed, no windows
    over data rows, scale-safe at any corpus size; per-row regex
    compilation is the honest price of data-driven patterns (config
    lists should keep using ``robots_screen``'s unrolled form).

    ONE canonicalization lineage feeds everything (r14 — previously a
    second ``url_canonicalize_parsed`` pass fed the rule join, doubling
    both the executor parse and the per-action optimizer cost of
    canon-bearing plans): the LEFT join keeps every doc row (NULL host
    keys never match, so unparseable rows just carry NULL rule
    columns), and the per-id max carries ``url_canon``/``host``
    through the aggregate instead of joining back — one lineage, one
    join, one shuffle.

    Appends ``robots_rule`` and ``robots_allowed`` to (id, url_canon,
    host).  Tie-break provenance: among rules with the winning score,
    the SMALLEST line number labels the row (file order — mirrors the
    batch screen's first-in-caller-order rule)."""
    rules = robots_resolve(robots, product_token, body_col, host_col)
    rules = rules.select(
        "host",
        "line_no",
        (F.col("directive") == "allow").alias("_is_allow"),
        "path_pattern",
        _robots_pattern_rx_col(F.col("path_pattern")).alias("_rx"),
    )
    canon = url_canonicalize(df, url_col).select(
        F.col(id_col), "url_canon", "host"
    )
    joined = canon.withColumn(
        "_path_q", _path_query(F.col("url_canon"))
    ).join(rules, "host", "left")
    score = F.when(
        F.col("path_pattern").isNotNull()
        & F.regexp_like("_path_q", F.col("_rx")),
        F.lit(2) * F.length("path_pattern") + F.col("_is_allow").cast("int"),
    )
    label = F.concat(
        F.when(F.col("_is_allow"), F.lit("allow:")).otherwise(
            F.lit("disallow:")
        ),
        F.col("path_pattern"),
    )
    agged = joined.groupBy(id_col).agg(
        F.max("url_canon").alias("url_canon"),
        F.max("host").alias("host"),
        F.max(
            F.when(
                score.isNotNull(),
                F.struct(
                    score.alias("s"),
                    (-F.col("line_no")).alias("_neg_ln"),
                    label.alias("lab"),
                ),
            )
        ).alias("_top"),
    )
    host_ok = F.col("host").isNotNull()
    return agged.select(
        id_col,
        "url_canon",
        "host",
        F.when(host_ok, F.col("_top.lab")).alias("robots_rule"),
        F.when(
            host_ok,
            F.col("_top.s").isNull()
            | (F.pmod(F.col("_top.s"), F.lit(2)) == 1),
        ).alias("robots_allowed"),
    )


def host_profile(
    df: DataFrame,
    url_col: str = "url",
    suffix_rules: list[str] | None = None,
) -> DataFrame:
    """Per-host corpus mix: (host, n_urls, n_canon_distinct, share) —
    how many rows each host contributes, how many DISTINCT canonical
    URLs those collapse to (n_urls − n_canon_distinct = the host's
    URL-level duplication), and the host's share of all parseable rows.

    ``suffix_rules`` switches the group key from the raw canonical host
    to the registrable domain (eTLD+1) under that table — collapsing a
    subdomain-spraying site into one profile row (the ``host`` output
    column then carries the registrable domain, raw host when none).

    One host-keyed aggregation (distinct counted from per-(host, canon)
    partials, so no count_distinct shuffle of raw rows) plus a one-row
    total broadcast back for the share division.  Unparseable rows
    (NULL host) are excluded — they have no host to attribute."""
    canon = url_canonicalize_parsed(df, url_col).withColumn(
        "host", _host_group(suffix_rules)
    )
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
    suffix_rules: list[str] | None = None,
) -> DataFrame:
    """Per-host CURATION scorecard — the table a crawl-curation pass
    ranks hosts by before deciding caps/blocks for the NEXT crawl: for
    every canonical host, its row count, URL-level duplicate count
    (same canonical URL, non-canonical fetch), blocklist hits, and the
    mean document quality score.  ``suffix_rules`` groups by
    registrable domain instead of raw host (``_host_group``) so one
    eTLD+1 spraying subdomains reads as one scorecard row.

    The quality mean is bit-portable at any host size: a TWO-LEVEL
    pinned fold (per (host, id%256) shard in id order, shard partials
    in shard order — the kmeans M-step discipline, so a mega-host never
    builds one |host|-element array in a single task).  Docs absent
    from ``doc_scores`` (or NULL-scored) fold as 0.0 — unscorable docs
    drag a host down, which is the curation-correct direction.
    Unparseable-URL rows are excluded (no host).  Output: (host,
    n_rows, n_url_dups, n_blocked, mean_score), one row per host.

    The URL parse is declared once (``url_canonicalize`` projected to
    (id, url_canon, host)) and shared by both embedded screens via
    their ``precanonicalized`` fast paths.  A restructure that also
    collapsed the two id-keyed joins into one url_canon-keyed min-join
    (2 lineage branches instead of 3) measured ~20% SLOWER at sf0.1
    under local[32] AQE-broadcast plans, so the id-keyed composition
    stays — the branches all broadcast, and the bigram-LM score lineage
    dominates the runtime."""
    # parsed variant: the host-NULL cut happens between the parse and
    # IDN stages (see url_canonicalize_parsed), so no filter sits above
    # the staged fold; the dedup's min-join ignores NULL keys anyway
    canon = url_canonicalize_parsed(df, url_col).select(
        F.col(id_col), "url_canon", "host"
    )
    screened = url_blocklist_screen(
        canon,
        blocked_host_suffixes,
        blocked_path_terms,
        precanonicalized=True,
    ).withColumn("host", _host_group(suffix_rules))
    dups = url_dedup(canon, url_col, id_col, precanonicalized=True).select(
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
    suffix_rules: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per host, chosen DETERMINISTICALLY: rows
    rank within their host by the shared LCG sampling key of ``id_col``
    (ties → smaller id), and ranks ≤ cap survive — the anti-domination
    mix control every web-corpus build applies (a crawl where one host
    is 40% of pages must not be 40% of training data).  ``suffix_rules``
    caps by registrable domain (eTLD+1) instead of raw host, closing the
    subdomain-spray evasion (``a1.evil.com`` … ``aN.evil.com`` share ONE
    cap); the ``host`` output column then carries the group key.

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

    canon = url_canonicalize_parsed(df, url_col).withColumn(
        "host", _host_group(suffix_rules)
    )
    w = Window.partitionBy("host").orderBy("_key", id_col)
    return (
        canon.withColumn("_key", sample_hash_col(F.col(id_col)))
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= cap)
        .select(id_col, "host", "url_canon", "host_rank")
    )
