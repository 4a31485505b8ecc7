"""webops: URL canonicalization goldens on adversarial forms, host-mix
profile counts, and the deterministic per-host cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import webops
from tax_compliance_engine_spark.operators.corpus import (
    SAMPLE_INC,
    SAMPLE_MOD,
    SAMPLE_MULT,
)


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {
        r.url: (r.url_canon, r.host)
        for r in webops.url_canonicalize(df).collect()
    }


def test_url_canonicalize_goldens(spark):
    cases = {
        # scheme+host lowercase, default port stripped, params sorted,
        # empties dropped, fragment stripped; path/userinfo case KEPT
        "HTTP://User:Pw@Example.COM:80/Path/A?b=2&a=1&&#frag": (
            "http://User:Pw@example.com/Path/A?a=1&b=2",
            "example.com",
        ),
        # empty path -> "/", https default port stripped
        "https://Example.com:443": ("https://example.com/", "example.com"),
        # non-default port kept, empty path with query
        "https://example.com:8443?x=1": (
            "https://example.com:8443/?x=1",
            "example.com",
        ),
        # only http/https defaults strip; ftp:21 is kept
        "ftp://example.com:21/f": ("ftp://example.com:21/f", "example.com"),
        # userinfo splits on the LAST '@'
        "http://a@b@c.com/": ("http://a@b@c.com/", "c.com"),
        # fragment cut BEFORE the query is located
        "https://EXAMPLE.com/p#f?notquery": (
            "https://example.com/p",
            "example.com",
        ),
        # trailing '?' with no surviving params drops
        "http://h/p?": ("http://h/p", "h"),
        # already canonical: fixed point
        "https://example.com/docs/7?a=1": (
            "https://example.com/docs/7?a=1",
            "example.com",
        ),
        # unparseable rows -> NULLs, kept
        "garbage": (None, None),
        "://nohost": (None, None),
        # --- percent-encoding normalization (RFC 3986 §6.2.2.2) ---
        # unreserved decodes: %7E -> ~, %41 -> A, %2e -> ., %5F -> _
        "http://Example.com/%7Euser/%41%2e%5F": (
            "http://example.com/~user/A._",
            "example.com",
        ),
        # reserved stays encoded but hex uppercases (%2f -> %2F);
        # '%' without two hex digits stays literal
        "http://h/a%2fb?x=%G1&y=100%": (
            "http://h/a%2Fb?x=%G1&y=100%",
            "h",
        ),
        # decoding applies to the host too (%61 -> a), before lowering
        "http://ex%61mple.com/": ("http://example.com/", "example.com"),
        # consecutive '%%41': first '%' literal, then %41 -> A
        "http://h/p%%41": ("http://h/p%A", "h"),
        # --- strict authority: quarantined, never mis-collapsed ---
        # bracketed IPv6 literal: out of scope -> NULL (never host '[')
        "http://[::1]:8080/x": (None, None),
        # non-numeric port: NULL (never silently dropped)
        "http://host:8a/x": (None, None),
        "http://host:80and/x": (None, None),
    }
    got = _canon(spark, list(cases))
    assert got == cases
    # idempotence: canonicalizing the canonical form is a no-op
    again = _canon(spark, [c for c, _ in cases.values() if c is not None])
    for c, h in cases.values():
        if c is not None:
            assert again[c] == (c, h)


def test_url_canonicalize_oracle_twin_adversarial(spark):
    """The DuckDB twin CTE must mirror the Spark canonicalizer on inputs
    the doc_id%8 gate fixture never produces: percent-encodings, bad
    authorities, and a query that EMBEDS a second '://' (the str_split
    limit-2 class the r11 advice flagged in the blocklist twins)."""
    import duckdb

    from tax_compliance_engine_spark.plans import oracle_dataops as od

    urls = [
        "http://Example.com/%7Euser/%41%2e%5F?next=https://x.com/y",
        "https://h:8443/a%2fb?x=%G1&y=100%",
        "http://ex%61mple.com:80/",
        "http://[::1]:8080/x",
        "http://host:8a/x",
        "HTTPS://User@WWW.Ex.COM:443/P?b=2&a=1&&#f",
        "junk",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    spark_rows = sorted(
        (r.doc_id, r.url_canon, r.host)
        for r in webops.url_canonicalize(df).collect()
    )
    # the twin CTE reads `documents` and synthesizes its URL; rebind the
    # urls CTE to this fixture by swapping the synth CASE for a VALUES join
    cte = od._url_canon_cte()
    vals = ", ".join(
        f"({i}, '{u}')" for i, u in enumerate(urls)
    )
    head, tail = cte.split(" AS url FROM documents)", 1)
    assert head.startswith("urls AS ")  # fixture swap still lines up
    cte2 = (
        f"urls AS (SELECT * FROM (VALUES {vals}) AS t(doc_id, url))" + tail
    )
    duck_rows = sorted(
        duckdb.connect()
        .execute(f"WITH {cte2} SELECT doc_id, url_canon, host FROM canon")
        .fetchall()
    )
    assert spark_rows == duck_rows
    # and the embedded-'://' URL kept its tail past the first '://'
    assert spark_rows[0][1].endswith("?next=https://x.com/y")


def test_host_profile_counts_and_share(spark):
    df = spark.createDataFrame(
        [
            (0, "http://A.com/x?b=2&a=1"),
            (1, "http://a.com:80/x?a=1&b=2"),  # same canonical as row 0
            (2, "http://a.com/y"),
            (3, "https://b.com/"),
            (4, "not a url"),  # no host: excluded
        ],
        "doc_id long, url string",
    )
    got = {r.host: r for r in webops.host_profile(df).collect()}
    assert set(got) == {"a.com", "b.com"}
    assert (got["a.com"].n_urls, got["a.com"].n_canon_distinct) == (3, 2)
    assert (got["b.com"].n_urls, got["b.com"].n_canon_distinct) == (1, 1)
    assert got["a.com"].share == 3 / 4 and got["b.com"].share == 1 / 4


def test_per_host_cap_deterministic(spark):
    n = 30
    df = spark.createDataFrame(
        [(i, f"http://only.com/{i}") for i in range(n)],
        "doc_id long, url string",
    )
    kept = webops.per_host_cap_sample(df, cap=5).collect()
    assert len(kept) == 5
    assert sorted(r.host_rank for r in kept) == [1, 2, 3, 4, 5]
    # the kept ids are exactly the 5 smallest LCG keys (ties -> id)
    key = lambda i: ((i % SAMPLE_MOD) * (SAMPLE_MULT % SAMPLE_MOD) + SAMPLE_INC) % SAMPLE_MOD  # noqa: E731
    want = sorted(range(n), key=lambda i: (key(i), i))[:5]
    assert sorted(r.doc_id for r in kept) == sorted(want)
    # stability: adding rows with larger keys never displaces kept rows
    extra = spark.createDataFrame(
        [(i, f"http://only.com/{i}") for i in range(n, n + 10)],
        "doc_id long, url string",
    )
    kept2 = {
        r.doc_id
        for r in webops.per_host_cap_sample(df.union(extra), cap=5).collect()
    }
    want2 = set(sorted(range(n + 10), key=lambda i: (key(i), i))[:5])
    assert kept2 == want2
    # unparseable rows are excluded, and cap<1 raises
    import pytest

    none_kept = webops.per_host_cap_sample(
        spark.createDataFrame([(1, "junk")], "doc_id long, url string"),
        cap=5,
    ).collect()
    assert none_kept == []
    with pytest.raises(ValueError):
        webops.per_host_cap_sample(df, cap=0)


def test_streaming_host_cap_admission_control(spark, tmp_path):
    """Streaming per-host cap: admits the first `cap` arrivals per host
    (id order within a drain), carries admission counts ACROSS drains in
    state, skips re-delivered ids, and drops unparseable rows — the
    drained result equals the pure-Python admission replay over the same
    batch boundaries."""
    from tax_compliance_engine_spark.streaming.web_stream import (
        streaming_host_cap,
    )

    schema = "doc_id long, url string"
    first = [(i, f"http://A.com/{i}") for i in range(4)] + [
        (100, "http://b.com/x"),
        (999, "garbage"),  # unparseable: dropped
    ]
    # batch 2: more a.com (host already at 3/4 -> only one seat left),
    # a re-delivered id 1, and a new host
    second = [(i, f"http://a.com:80/{i}") for i in range(4, 8)] + [
        (1, "http://A.com/1"),  # re-delivery: never re-emitted
        (200, "http://c.com/y"),
    ]
    src, out = tmp_path / "docs", tmp_path / "kept"
    cap = 5

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_host_cap(stream, cap=cap)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc_id long, host string, url_canon string, host_rank int"
        ).parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(
        str(src)
    )
    drain()
    spark.createDataFrame(second, schema).write.mode("append").parquet(
        str(src)
    )
    got = sorted(
        (r.doc_id, r.host, r.host_rank) for r in drain().collect()
    )
    # python replay of the admission rule over the same batch boundaries
    admitted: dict[str, list[int]] = {}
    want = []
    for batch in (first, second):
        rows = []
        for doc_id, url in sorted(batch):
            host = None
            if url.startswith("http://"):
                host = url[7:].split("/")[0].split(":")[0].lower()
            if host is None:
                continue
            a = admitted.setdefault(host, [])
            if doc_id in a or len(a) >= cap:
                continue
            a.append(doc_id)
            rows.append((doc_id, host, len(a)))
        want.extend(rows)
    assert got == sorted(want)
    # a.com admitted exactly cap rows despite 8 non-dup arrivals
    assert sum(1 for _, h, _ in got if h == "a.com") == cap
    # idempotent empty re-drain
    assert sorted(
        (r.doc_id, r.host, r.host_rank) for r in drain().collect()
    ) == got


def test_streaming_url_dedup_first_seen_admission(spark, tmp_path):
    """Streaming URL dedup: a single drain's admitted set equals the
    batch operator's non-duplicate set bit-for-bit (id-order processing
    makes the in-batch winner the min id); later drains reject
    already-seen canonical URLs and skip re-delivered winners;
    unparseable rows are each their own identity (never collapsed under
    a shared NULL key); an empty re-drain emits nothing."""
    from tax_compliance_engine_spark.streaming.web_stream import (
        streaming_url_dedup,
    )

    schema = "doc_id long, url string"
    first = [
        (3, "HTTP://A.com:80/x?b=2&a=1"),
        (1, "http://a.com/x?a=1&b=2"),    # same page as 3 -> 1 wins
        (7, "http://a.com/x?a=1&b=2#f"),  # same page -> rejected
        (2, "http://a.com/y"),
        (9, "junk"),                      # unparseable: admitted
        (10, "more junk"),                # unparseable: NOT 9's dup
    ]
    second = [
        (1, "http://a.com/x?a=1&b=2"),    # re-delivered winner: skip
        (0, "http://a.com/x?b=2&a=1"),    # smaller id, URL seen: reject
        (5, "http://b.com/new"),          # new page: admit
        (11, "junk again"),               # unparseable: admit
    ]
    src, out = tmp_path / "docs", tmp_path / "kept"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_url_dedup(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc_id long, host string, url_canon string"
        ).parquet(str(out))

    spark.createDataFrame(first, schema).write.mode("append").parquet(
        str(src)
    )
    got1 = sorted(
        (r.doc_id, r.host, r.url_canon) for r in drain().collect()
    )
    # single drain ≡ batch url_dedup's non-duplicate rows, bit-equal
    df1 = spark.createDataFrame(first, schema)
    batch = webops.url_dedup(df1).filter(~F.col("is_url_duplicate"))
    hosts = webops.url_canonicalize(df1).select("doc_id", "host")
    want1 = sorted(
        (r.doc_id, r.host, r.url_canon)
        for r in batch.join(hosts, "doc_id").collect()
    )
    assert got1 == want1
    assert {d for d, _, _ in got1} == {1, 2, 9, 10}
    # second drain: only the genuinely new identities are admitted
    spark.createDataFrame(second, schema).write.mode("append").parquet(
        str(src)
    )
    got2 = sorted(
        (r.doc_id, r.host, r.url_canon) for r in drain().collect()
    )
    assert {d for d, _, _ in got2} == {1, 2, 9, 10, 5, 11}
    # restart idempotence: an empty re-drain emits nothing new
    assert sorted(
        (r.doc_id, r.host, r.url_canon) for r in drain().collect()
    ) == got2


def test_url_dedup_canonical_collapse_and_nulls(spark):
    """URL dedup: rows differing only by default port / param order
    collapse to the smallest id; distinct pages never collapse;
    unparseable rows keep themselves (NULL canon is not an identity)."""
    df = spark.createDataFrame(
        [
            (3, "HTTP://A.com:80/x?b=2&a=1"),
            (1, "http://a.com/x?a=1&b=2"),   # same page as 3 -> canonical
            (7, "http://a.com/x?a=1&b=2#f"), # fragment stripped: same page
            (2, "http://a.com/y"),           # different page
            (9, "junk"),                     # unparseable
            (10, "more junk"),               # unparseable: NOT 9's dup
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r for r in webops.url_dedup(df).collect()}
    assert got[1].canonical_id == 1 and not got[1].is_url_duplicate
    assert got[3].canonical_id == 1 and got[3].is_url_duplicate
    assert got[7].canonical_id == 1 and got[7].is_url_duplicate
    assert got[2].canonical_id == 2 and not got[2].is_url_duplicate
    for i in (9, 10):
        assert got[i].canonical_id == i and not got[i].is_url_duplicate
        assert got[i].url_canon is None


def test_url_blocklist_screen_rules(spark):
    """Blocklist pins: exact-label suffix matching (subdomains blocked,
    'roads.com' NOT blocked by 'ads.com'), path/query term containment,
    host rules before path rules in reason priority, unparseable rows
    never pattern-blocked, empty blocklists rejected."""
    import pytest

    df = spark.createDataFrame(
        [
            (0, "http://ads.com/x"),            # host: exact
            (1, "http://x.ADS.com/y"),          # host: subdomain
            (2, "http://roads.com/z"),          # NOT a suffix label match
            (3, "http://ok.com/buy?track=1"),   # path term
            (4, "http://ads.com/buy?track=1"),  # both -> host reason wins
            (5, "http://ok.com/clean"),
            (6, "junk"),                        # unparseable: not blocked
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: (r.blocked, r.block_reason)
        for r in webops.url_blocklist_screen(
            df, ["ads.com"], ["track="]
        ).collect()
    }
    assert got[0] == (True, "host:ads.com")
    assert got[1] == (True, "host:ads.com")
    assert got[2] == (False, None)
    assert got[3] == (True, "path:track=")
    assert got[4] == (True, "host:ads.com")  # host rule wins
    assert got[5] == (False, None)
    assert got[6] == (False, None)
    with pytest.raises(ValueError, match="blocklist"):
        webops.url_blocklist_screen(df, [], [])


def test_registrable_domain_psl_algorithm(spark):
    """Public-suffix algorithm goldens (the canonical kobe.jp example
    from the PSL spec): longest match, wildcard consumes exactly one
    label, exception prevails and names a one-shorter suffix, default
    rule '*' when nothing matches, NULL when the host IS a suffix."""
    import pytest

    rules = ["com", "jp", "*.kobe.jp", "!city.kobe.jp"]
    cases = {
        "example.com": "example.com",
        "a.b.example.com": "example.com",   # longest rule = 'com'
        "kobe.jp": "kobe.jp",               # wildcard needs 3 labels
        "x.kobe.jp": None,                  # wildcard: x.kobe.jp IS a suffix
        "y.x.kobe.jp": "y.x.kobe.jp",       # registrable under x.kobe.jp
        "city.kobe.jp": "city.kobe.jp",     # exception beats wildcard
        "z.city.kobe.jp": "city.kobe.jp",
        "com": None,                        # a bare public suffix
        "unmatched.tld": "unmatched.tld",   # default rule '*'
        "tld": None,
    }
    df = spark.createDataFrame(
        [(h,) for h in cases], "host string"
    ).select(
        "host",
        webops.registrable_domain_col(F.col("host"), rules).alias("rd"),
    )
    assert {r.host: r.rd for r in df.collect()} == cases
    # rule-grammar validation
    for bad in ([], ["a..b"], ["x*.com"], ["!solo"]):
        with pytest.raises(ValueError):
            webops._parse_suffix_rules(bad)


def test_per_domain_cap_blocks_subdomain_spray(spark):
    """One eTLD+1 spraying unique subdomains cannot exceed the cap when
    capping by registrable domain — the evasion that defeats the
    raw-host cap (20 subdomains → 20 separate caps) collapses to ONE
    group of `cap` kept rows; an unrelated host is unaffected."""
    rows = [(i, f"http://sub{i}.evil.com/p") for i in range(20)] + [
        (100 + i, f"http://ok.org/{i}") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # raw-host cap: every sprayed subdomain is its own group -> all kept
    assert webops.per_host_cap_sample(df, cap=5).count() == 23
    # domain cap: evil.com is ONE group -> exactly cap survive
    kept = webops.per_host_cap_sample(
        df, cap=5, suffix_rules=["com", "org"]
    ).collect()
    by_dom: dict[str, int] = {}
    for r in kept:
        by_dom[r.host] = by_dom.get(r.host, 0) + 1
    assert by_dom == {"evil.com": 5, "ok.org": 3}
    assert sorted(r.host_rank for r in kept if r.host == "evil.com") == [
        1,
        2,
        3,
        4,
        5,
    ]


def test_html_extract_text_goldens(spark):
    """Extraction pins: script/style/comment blocks dropped whole
    (including a '<' inside script text), block tags become newlines,
    inline tags become spaces, entities decode with &amp; last
    ('&amp;lt;' yields literal '&lt;'), whitespace collapses, edges
    strip."""
    cases = {
        "<html><head><style>p {color:red}</style></head>"
        "<body><h1>Title</h1><p>hello <b>world</b></p>"
        "<!-- note --></body></html>": "Title\nhello world",
        '<div>a</div><script type="x">var y = 1 < 2;</script>': "a",
        "<p>a &amp; b &lt;t&gt; &quot;q&quot; &#39;s&#39;&nbsp;&amp;lt;</p>":
            "a & b <t> \"q\" 's' &lt;",
        "<ul><li>one</li><li>two</li></ul>tail": "one\ntwo\ntail",
        "plain text, no markup": "plain text, no markup",
        "  <p>  spaced   out  </p>  ": "spaced out",
    }
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(cases)], "doc_id long, html string"
    )
    got = {
        r.doc_id: r.text
        for r in webops.html_extract_text(df).collect()
    }
    for i, want in enumerate(cases.values()):
        assert got[i] == want, (i, got[i], want)


def test_robots_screen_rfc9309_semantics(spark):
    """RFC 9309 pins: longest match wins (deep allow overrides shallow
    disallow), allow wins a length tie, '*' wildcards, '$' anchors,
    unmatched paths allowed with NULL rule, unparseable rows NULL,
    bad rule grammar rejected."""
    import pytest

    rules = [
        ("disallow", "/docs/"),
        ("allow", "/docs/pub"),
        ("allow", "/tie"),
        ("disallow", "/tie"),
        ("disallow", "/*.pdf$"),
        ("allow", "/"),
    ]
    cases = {
        # longest match: /docs/pub (9) beats /docs/ (6)
        "http://h/docs/pub/x": (True, "allow:/docs/pub"),
        "http://h/docs/private": (False, "disallow:/docs/"),
        # tie: allow and disallow both len 4 -> allow wins
        "http://h/tie": (True, "allow:/tie"),
        # '$' anchor: .pdf at the END is disallowed...
        "http://h/a/file.pdf": (False, "disallow:/*.pdf$"),
        # ...but not mid-path ('/' rule is the longest match left)
        "http://h/a/file.pdf/ok": (True, "allow:/"),
        "http://h/open": (True, "allow:/"),
        "junk": (None, None),
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "doc_id long, url string"
    )
    got = {
        r.doc_id: (r.robots_allowed, r.robots_rule)
        for r in webops.robots_screen(df, rules).collect()
    }
    for i, want in enumerate(cases.values()):
        assert got[i] == want, (i, got[i], want)
    # unmatched -> allowed, NULL rule (empty rule group is an error)
    got2 = webops.robots_screen(
        spark.createDataFrame([(0, "http://h/zz")], "doc_id long, url string"),
        [("disallow", "/aa")],
    ).collect()[0]
    assert got2.robots_allowed is True and got2.robots_rule is None
    with pytest.raises(ValueError):
        webops.robots_screen(df, [])
    with pytest.raises(ValueError, match="directive"):
        webops.robots_screen(df, [("deny", "/x")])
    with pytest.raises(ValueError, match="path pattern"):
        webops.robots_screen(df, [("allow", "x")])


def test_host_scorecard_counts_and_pinned_mean(spark):
    """Scorecard pins: per-host rows/dups/blocked counts exact, the
    quality mean equals the two-level pinned Python fold with missing
    scores folding as 0.0, unparseable rows excluded."""
    docs = spark.createDataFrame(
        [
            (0, "http://a.com/x?b=2&a=1"),
            (1, "http://A.com:80/x?a=1&b=2"),  # dup of 0's page
            (2, "http://a.com/y"),
            (3, "http://bad.com/z"),           # blocked host
            (4, "junk"),                       # excluded
        ],
        "doc_id long, url string",
    )
    scores = spark.createDataFrame(
        [(0, 0.5), (1, 0.25), (3, 0.125)],  # doc 2 unscored -> 0.0
        "doc_id long, mean_prob double",
    )
    got = {
        r.host: r
        for r in webops.host_scorecard(
            docs, scores, blocked_host_suffixes=["bad.com"]
        ).collect()
    }
    assert set(got) == {"a.com", "bad.com"}
    a = got["a.com"]
    assert (a.n_rows, a.n_url_dups, a.n_blocked) == (3, 1, 0)
    acc = 0.0
    for s in [0.5, 0.25, 0.0]:  # doc_id order 0,1,2
        acc += s
    assert a.mean_score == acc / 3
    b = got["bad.com"]
    assert (b.n_rows, b.n_url_dups, b.n_blocked) == (1, 0, 1)
    assert b.mean_score == 0.125


def _robots_fixture(spark):
    body_a = "\n".join([
        "# comment-only line",
        "User-agent: tce-crawler-img",   # longer than token: no match
        "Disallow: /img/",
        "User-agent: tce-crawler",       # exact token
        "User-agent: otherbot",          # multi-UA stack, same group
        "Disallow: /docs/",
        "Allow: /docs/1",
        "User-agent: *",
        "Disallow: /",
    ])
    body_b = "\r\n".join([               # CRLF endings
        "Disallow: /orphan",             # rule before any group: ignored
        "User-agent: tce",               # prefix match, spec 3
        "Allow: /a/b",
        "User-agent: TCE-Crawler",       # case-insensitive, spec 11 wins
        "Disallow: /x",
        "user-agent: *",
        "Allow: /",
    ])
    body_c = "\n".join([
        "User-agent: megabot",           # no match
        "Disallow: /",
        "User-agent: *",                 # fallback group 1
        "Disallow: /f*",
        "Allow: /f1$",
        "Disallow:",                     # empty pattern: ignored
        "Crawl-delay: 10",               # unknown field: ignored
        "User-agent: *",                 # tied group 2: concatenated
        "Allow: /public/",
    ])
    return spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b), ("c.com", body_c)],
        "host string, robots_txt string",
    )


def test_robots_resolve_group_precedence(spark):
    """RFC 9309 §2.2.1: longest case-insensitive product-token prefix
    wins, '*' is the fallback, tied groups concatenate, multi-UA stacks
    share rules, orphan rules / comments / unknown fields / empty
    patterns are ignored, CRLF files parse."""
    got = [
        (r.host, r.line_no, r.directive, r.path_pattern)
        for r in webops.robots_resolve(_robots_fixture(spark), "tce-crawler")
        .orderBy("host", "line_no")
        .collect()
    ]
    assert got == [
        # a.com: the exact-token group (NOT tce-crawler-img, NOT *)
        ("a.com", 6, "disallow", "/docs/"),
        ("a.com", 7, "allow", "/docs/1"),
        # b.com: spec 11 'TCE-Crawler' beats spec 3 'tce' and '*'
        ("b.com", 5, "disallow", "/x"),
        # c.com: both '*' groups win (tie) and concatenate
        ("c.com", 4, "disallow", "/f*"),
        ("c.com", 5, "allow", "/f1$"),
        ("c.com", 9, "allow", "/public/"),
    ]
    # a token nothing matches but '*': the fallback group resolves
    star = [
        (r.host, r.path_pattern)
        for r in webops.robots_resolve(_robots_fixture(spark), "unrelatedbot")
        .orderBy("host", "line_no")
        .collect()
        if r.host == "a.com"
    ]
    assert star == [("a.com", "/")]


def test_robots_screen_resolved_end_to_end(spark):
    """Resolve + longest-match screen from raw bodies: anchors, mid-
    pattern wildcards, no-robots hosts allowed, unparseable NULL."""
    docs = spark.createDataFrame(
        [
            (1, "http://a.com/docs/2"),      # disallow:/docs/
            (2, "http://a.com/docs/1x"),     # allow:/docs/1 (longer) wins
            (3, "http://a.com/other"),       # unmatched -> allowed
            (4, "http://b.com/x1"),          # disallow:/x
            (5, "http://c.com/f99"),         # disallow:/f*
            (6, "http://c.com/f1"),          # allow:/f1$ anchor wins
            (7, "http://c.com/public/y"),    # concatenated group's rule
            (8, "http://nobots.com/q"),      # host with no robots row
            (9, "garbage"),                  # unparseable -> NULL
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: (r.robots_rule, r.robots_allowed)
        for r in webops.robots_screen_resolved(
            docs, _robots_fixture(spark), "tce-crawler"
        ).collect()
    }
    assert got == {
        1: ("disallow:/docs/", False),
        2: ("allow:/docs/1", True),
        3: (None, True),
        4: ("disallow:/x", False),
        5: ("disallow:/f*", False),
        6: ("allow:/f1$", True),
        7: ("allow:/public/", True),
        8: (None, True),
        9: (None, None),
    }


def test_boilerplate_strip_adversarial_lines(spark):
    """C4 line filters + jusText stop-word rescue: nav bar, cookie
    banner, bare menu labels, footer/copyright, javascript marker and
    short CTAs drop; terminal-punctuated prose and stop-word-dense
    unpunctuated prose survive."""
    text = "\n".join([
        "Home | About | Contact",                       # nav: 4 words but no punct/stops
        "Accept all cookies to continue",               # cookie banner: blacklist
        "The quick brown fox jumped over the lazy dog near the river.",  # prose
        "it is a truth universally acknowledged that a man wants a wife",  # stop-dense, no punct
        "Menu",                                          # < 4 words
        "Read more",                                     # < 4 words
        "© 2024 Example Corp",                           # blacklist ©
        "This site requires JavaScript to run properly.",  # blacklist
        "All rights reserved by the company.",           # blacklist phrase
        "Sign up today!",                                # < 4 words despite punct
    ])
    r = webops.boilerplate_strip(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    assert r.clean_text == (
        "The quick brown fox jumped over the lazy dog near the river.\n"
        "it is a truth universally acknowledged that a man wants a wife"
    )
    assert (r.n_lines, r.n_lines_kept) == (10, 2)
    # nothing survives -> '' (not NULL), counts still real
    r2 = webops.boilerplate_strip(
        spark.createDataFrame([(2, "Menu\nRead more")], "doc_id long, text string")
    ).collect()[0]
    assert r2.clean_text == "" and (r2.n_lines, r2.n_lines_kept) == (2, 0)


def test_punycode_label_rfc3492_goldens(spark):
    """RFC 3492 encoding goldens (values cross-checked against the
    published spec examples / reference encoder): ASCII and existing
    xn-- labels untouched, single and multi codepoint, all-Unicode
    labels (empty basic part), CJK."""
    cases = {
        "plain": "plain",
        "xn--bcher-kva": "xn--bcher-kva",   # already wire form
        "bücher": "xn--bcher-kva",
        "mañana": "xn--maana-pta",
        "münchen": "xn--mnchen-3ya",
        "bücher-größe": "xn--bcher-gre-n1a6wic",
        "ü": "xn--tda",                      # no basic chars, no '-'
        "点看": "xn--3pxu8k",                # CJK
        "": "",
    }
    df = spark.createDataFrame([(s,) for s in cases], "label string")
    got = {
        r.label: r.puny
        for r in df.select(
            "label", webops._punycode_label(F.col("label")).alias("puny")
        ).collect()
    }
    assert got == cases


def test_idn_canonicalization_collapse_and_idempotence(spark):
    """The dup-miss closes: a Unicode host, its MIXED-CASE form, and its
    pre-encoded xn-- form all canonicalize to ONE key; url_canon is
    rebuilt around the new host (userinfo/port/query preserved); ASCII
    hosts untouched; a second canonicalization pass is a fixpoint."""
    urls = [
        (0, "https://bücher.example.com/docs/1"),
        (1, "https://BÜCHER.Example.COM/docs/1"),
        (2, "https://xn--bcher-kva.example.com/docs/1"),
        (3, "http://user:pw@MÜNCHEN.de:80/a?b=2&a=1#f"),
        (4, "https://点看.example.com:8443/path"),
        (5, "http://plain.example.com/x"),
        (6, "junk"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r.doc_id: (r.url_canon, r.host)
        for r in webops.url_canonicalize(df).collect()
    }
    assert got[0] == got[1] == got[2] == (
        "https://xn--bcher-kva.example.com/docs/1",
        "xn--bcher-kva.example.com",
    )
    assert got[3] == (
        "http://user:pw@xn--mnchen-3ya.de/a?a=1&b=2",
        "xn--mnchen-3ya.de",
    )
    assert got[4] == (
        "https://xn--3pxu8k.example.com:8443/path",
        "xn--3pxu8k.example.com",
    )
    assert got[5] == ("http://plain.example.com/x", "plain.example.com")
    assert got[6] == (None, None)
    # idempotence: canonicalizing the canonical URLs changes nothing
    canon_urls = [
        (k, v[0]) for k, v in got.items() if v[0] is not None
    ]
    df2 = spark.createDataFrame(canon_urls, "doc_id long, url string")
    got2 = {
        r.doc_id: (r.url_canon, r.host)
        for r in webops.url_canonicalize(df2).collect()
    }
    assert got2 == {k: v for k, v in got.items() if v[0] is not None}


def test_streaming_admission_screen_batch_equal(spark, tmp_path):
    """Stateless blocklist+robots admission at ingest: the drained
    admitted set equals the batch composition (blocklist pass AND robots
    allow AND parseable) row-for-row; an empty re-drain emits nothing."""
    from tax_compliance_engine_spark.streaming.web_stream import (
        streaming_admission_screen,
    )

    schema = "doc_id long, url string"
    rows = [
        (1, "http://good.com/docs/1"),     # admitted
        (2, "http://ads.com/x"),           # blocklisted host
        (3, "http://sub.ads.com/x"),       # blocklisted subdomain
        (4, "http://good.com/a?track=1"),  # blocklisted path term
        (5, "http://good.com/private/1"),  # robots-disallowed
        (6, "http://good.com/private/ok"), # robots longest-match allow
        (7, "not a url"),                  # unparseable: quarantined
        (8, "http://other.org/y"),         # admitted
    ]
    robots = [
        ("disallow", "/private/"),
        ("allow", "/private/ok"),
    ]
    src, out = tmp_path / "docs", tmp_path / "kept"
    spark.createDataFrame(rows, schema).write.mode("append").parquet(str(src))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_admission_screen(
                stream,
                blocked_host_suffixes=["ads.com"],
                blocked_path_terms=["track="],
                robots_rules=robots,
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(
            "doc_id long, host string, url_canon string"
        ).parquet(str(out))

    got = sorted(
        (r.doc_id, r.host, r.url_canon) for r in drain().collect()
    )
    # batch twin: the same screens composed eagerly
    from tax_compliance_engine_spark.operators import webops

    df = spark.createDataFrame(rows, schema)
    batch = webops.robots_screen(
        webops.url_blocklist_screen(df, ["ads.com"], ["track="]),
        robots,
        precanonicalized=True,
    )
    want = sorted(
        (r.doc_id, r.host, r.url_canon)
        for r in batch.filter(
            F.col("host").isNotNull()
            & ~F.col("blocked")
            & F.col("robots_allowed")
        ).collect()
    )
    assert got == want
    assert [g[0] for g in got] == [1, 6, 8]
    # idempotent empty re-drain: nothing new appears
    assert sorted(
        (r.doc_id, r.host, r.url_canon) for r in drain().collect()
    ) == got


def test_robots_sitemaps_group_independent(spark):
    """Sitemap records: discovered regardless of user-agent groups and
    position, file order kept, case-insensitive field, relative URLs
    quarantined, URL case preserved verbatim."""
    body = "\n".join([
        "Sitemap: https://a.com/s1.xml",       # before any group
        "User-agent: somebot",
        "Disallow: /",
        "sitemap: HTTPS://a.com/S2.xml",       # inside a group, odd case
        "Sitemap: relative/s.xml",             # not absolute: dropped
        "User-agent: *",
        # '#' starts a comment ANYWHERE in robots.txt, so a literal
        # fragment is (correctly) cut with the rest of the line
        "Sitemap: https://cdn.example/s3.xml#frag",
    ])
    robots = spark.createDataFrame(
        [("a.com", body)], "host string, robots_txt string"
    )
    got = [
        (r.line_no, r.sitemap_url)
        for r in webops.robots_sitemaps(robots).orderBy("line_no").collect()
    ]
    assert got == [
        (1, "https://a.com/s1.xml"),
        (4, "HTTPS://a.com/S2.xml"),
        (7, "https://cdn.example/s3.xml"),
    ]


def test_robots_crawl_delay_first_valid_wins(spark):
    """Crawl-delay: decimal values parse, junk quarantines, the FIRST
    valid declaration per host wins, hosts without one emit no row."""
    robots = spark.createDataFrame(
        [
            ("a.com", "Crawl-delay: fast\nUser-agent: *\ncrawl-delay: 2.5\nCrawl-delay: 9"),
            ("b.com", "User-agent: *\nDisallow: /"),
            ("c.com", "CRAWL-DELAY: 10"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r.host: (r.line_no, r.crawl_delay)
        for r in webops.robots_crawl_delay(robots).collect()
    }
    assert got == {"a.com": (3, 2.5), "c.com": (1, 10.0)}


def test_sitemap_urls_goldens(spark):
    """Sitemap document parse: urlset vs sitemapindex kinds, entity
    decode, CDATA content literal (no entity decode inside), relative
    and loc-less entries dropped with ord GAPS, junk lastmod NULL,
    impossible calendar date NULL, uppercase scheme kept, HTML error
    page emits nothing (the <url> block inside it never leaks)."""
    urlset = "\n".join([
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
        "<url><loc>https://a.com/p?x=1&amp;y=2</loc>"
        "<lastmod>2024-05-07</lastmod></url>",
        "<url><loc> <![CDATA[https://a.com/cdata&amp;lit]]> </loc>"
        "<lastmod>2024-01-15T09:30:00+02:00</lastmod></url>",
        "<url><loc>/relative</loc></url>",
        "<url><lastmod>2024-06-02</lastmod></url>",
        "<url><loc>https://a.com/j</loc><lastmod>soon</lastmod></url>",
        "<url><loc>HTTPS://A.com/up</loc><lastmod>2024-02-30</lastmod></url>",
        "</urlset>",
    ])
    index = (
        "<sitemapindex><sitemap><loc>https://b.com/s1.xml</loc>"
        "<lastmod>2024-03-01</lastmod></sitemap>"
        "<sitemap><loc>rel.xml</loc></sitemap>"
        "<sitemap><loc>https://b.com/s2.xml</loc></sitemap></sitemapindex>"
    )
    junk = (
        "<html><body><url><loc>https://trap.com/</loc></url></body></html>"
    )
    df = spark.createDataFrame(
        [
            ("a.com", "https://a.com/sitemap.xml", urlset),
            ("b.com", "https://b.com/sitemap.xml", index),
            ("c.com", "https://c.com/sitemap.xml", junk),
        ],
        "host string, sitemap_url string, sitemap_xml string",
    )
    rows = [
        (r.host, r.kind, r.ord, r.loc, None if r.lastmod is None else str(r.lastmod))
        for r in webops.sitemap_urls(df).orderBy("host", "ord").collect()
    ]
    assert rows == [
        ("a.com", "urlset", 1, "https://a.com/p?x=1&y=2", "2024-05-07"),
        ("a.com", "urlset", 2, "https://a.com/cdata&amp;lit", "2024-01-15"),
        ("a.com", "urlset", 5, "https://a.com/j", None),
        ("a.com", "urlset", 6, "HTTPS://A.com/up", None),
        ("b.com", "index", 1, "https://b.com/s1.xml", "2024-03-01"),
        ("b.com", "index", 3, "https://b.com/s2.xml", None),
    ]


def test_boilerplate_strip_null_text_twin_parity(spark):
    """NULL source text must NULL-propagate IDENTICALLY in both engines
    (clean_text/n_lines/n_lines_kept all NULL) — the fixture space
    never produces NULL text, so the sweep can't see this divergence
    class; pinned here directly (r14 ADVICE fix)."""
    import duckdb

    from tax_compliance_engine_spark.plans import oracle_dataops as od

    rows = [
        (0, None),
        (1, "Menu\nThe quick brown fox jumped over the lazy dog."),
        (2, "Menu"),  # has text, keeps nothing -> '' not NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, page_text string")
    spark_rows = sorted(
        (r.doc_id, r.clean_text, r.n_lines, r.n_lines_kept)
        for r in webops.boilerplate_strip(df, text_col="page_text")
        .select("doc_id", "clean_text", "n_lines", "n_lines_kept")
        .collect()
    )
    vals = (
        "(CAST(0 AS BIGINT), CAST(NULL AS VARCHAR)), "
        "(1, 'Menu' || chr(10)"
        " || 'The quick brown fox jumped over the lazy dog.'), "
        "(2, 'Menu')"
    )
    duck_rows = sorted(
        duckdb.connect()
        .execute(
            f"WITH src AS (SELECT * FROM (VALUES {vals})"
            f" AS t(doc_id, page_text)),\n"
            + od._boiler_ctes("src", "page_text")
            + "\nSELECT doc_id, clean_text, n_lines, n_lines_kept FROM bp"
        )
        .fetchall()
    )
    assert spark_rows == duck_rows
    assert spark_rows[0] == (0, None, None, None)
    assert spark_rows[2][1] == ""


def test_recrawl_budget_goldens(spark):
    """Fetch-budget allocation: declared delay honored, junk delay ->
    default, absent robots -> default, delay > window -> 0 fetches,
    NULL score ranks worst, ties by host ascending, allocation monotone
    in rank for fixed politeness."""
    sc = spark.createDataFrame(
        [
            ("a.com", 0.9),
            ("b.com", 0.8),
            ("c.com", 0.8),
            ("d.com", 0.1),
            ("e.com", None),
        ],
        "host string, mean_score double",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2.0"),
            ("b.com", "User-agent: *\nCrawl-delay: fast"),
            ("d.com", "Crawl-delay: 7200"),
        ],
        "host string, robots_txt string",
    )
    rows = [
        (r.host, r.rank, r.tier, r.crawl_delay, r.effective_delay,
         r.polite_cap, r.allocated_fetches)
        for r in webops.recrawl_budget(
            sc, robots, window_sec=3600.0, tier_shares=(1.0, 0.5)
        ).orderBy("rank").collect()
    ]
    assert rows == [
        ("a.com", 1, 0, 2.0, 2.0, 1800, 1800),
        ("b.com", 2, 0, None, 1.0, 3600, 3600),
        ("c.com", 3, 0, None, 1.0, 3600, 3600),
        ("d.com", 4, 1, 7200.0, 7200.0, 0, 0),
        ("e.com", 5, 1, None, 1.0, 3600, 1800),
    ]
    # monotone in rank for any fixed cap: shares non-increasing by tier
    import pytest

    with pytest.raises(ValueError, match="non-increasing"):
        webops.recrawl_budget(sc, robots, tier_shares=(0.5, 1.0))
    with pytest.raises(ValueError, match="window_sec"):
        webops.recrawl_budget(sc, robots, window_sec=0.0)


def test_boilerplate_neighbor_rescue(spark):
    """jusText context pass: a short terminal-punctuated line between
    two locally-kept paragraphs survives; the same line isolated in
    boilerplate still strips; blacklist/punctuation failures are never
    forgiven; rescued lines do not chain; neighbor_rescue=False
    restores the pure line-local screen."""
    good = "The quick brown fox jumped over the lazy dog near the river."
    text_rescued = "\n".join([good, "It works.", good])
    text_isolated = "\n".join(["Menu", "It works.", "Buy now"])
    text_black = "\n".join([good, "Enable JavaScript now.", good])
    text_nopunct = "\n".join([good, "Click here maybe", good])
    text_chain = "\n".join([good, "It works.", "So short.", good])
    df = spark.createDataFrame(
        [
            (0, text_rescued),
            (1, text_isolated),
            (2, text_black),
            (3, text_nopunct),
            (4, text_chain),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_lines_kept)
        for r in webops.boilerplate_strip(df).collect()
    }
    assert got[0] == ("\n".join([good, "It works.", good]), 3)
    assert got[1] == ("", 0)
    assert got[2] == ("\n".join([good, good]), 2)
    assert got[3] == ("\n".join([good, good]), 2)
    # no chaining: neither short line has BOTH neighbors locally kept
    assert got[4] == ("\n".join([good, good]), 2)

    local = {
        r.doc_id: r.n_lines_kept
        for r in webops.boilerplate_strip(df, neighbor_rescue=False)
        .collect()
    }
    assert local[0] == 2


def test_boilerplate_strip_caller_stopwords(spark):
    """Non-English stop list as caller data: a German unpunctuated
    stop-dense line survives under a German list and strips under the
    English default; the default path is byte-identical to passing
    textops.STOPWORDS explicitly."""
    from tax_compliance_engine_spark.operators import textops

    german = ["der", "die", "das", "und", "ist", "ein", "zu", "mit"]
    text = "das ist ein Haus und die Katze sitzt mit dem Hund"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    de = webops.boilerplate_strip(df, stopwords=german).collect()[0]
    en = webops.boilerplate_strip(df).collect()[0]
    assert de.n_lines_kept == 1 and de.clean_text == text
    assert en.n_lines_kept == 0 and en.clean_text == ""
    explicit = webops.boilerplate_strip(
        df, stopwords=list(textops.STOPWORDS)
    ).collect()[0]
    assert (explicit.clean_text, explicit.n_lines_kept) == (
        en.clean_text,
        en.n_lines_kept,
    )
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        webops.boilerplate_strip(df, stopwords=[])


def test_robots_resolve_fuzz_vs_stdlib_robotparser(spark):
    """Cross-check the RFC 9309 resolver against urllib.robotparser on
    the SEMANTICS-OVERLAP space (the punycode-fuzz discipline applied
    to the parser): 300 seeded random robots bodies + probe paths where
    the stdlib's pre-RFC semantics coincide with RFC 9309, generated to
    avoid the documented divergence classes —

    - agent matching: stdlib is substring-on-first-token, RFC is
      prefix-specificity -> agents are '*' or EXACTLY the crawler token
      (plus never-matching distinct others), where both mean the same;
    - within-group: stdlib is FIRST-match in file order, RFC is
      longest-match -> rule patterns per file are prefix-free siblings
      (globally unique fixed-length words), so at most one rule matches
      any probe and first == longest;
    - group precedence: stdlib returns the first applying entry but
      parks '*' as a last-resort default entry -> with unique agents
      per file this equals RFC exact-beats-star specificity;
    - ties: stdlib has no tied-group merge -> no duplicate agents;
    - blank lines TERMINATE stdlib entries but not RFC groups -> blank
      lines only appear between groups (before a User-agent line);
    - empty Disallow: stdlib treats as allow-all rule, RFC drops it ->
      never generated.
    """
    import random
    from urllib import robotparser

    rng = random.Random(45067)
    token = "fuzzbot"
    agents_pool = ["otherbot", "thirdbot", "fourthbot"]

    cases = []  # (host, body, [probe paths])
    for case in range(300):
        nwords = 0

        def word():
            nonlocal nwords
            nwords += 1
            # fixed-length distinct words: prefix-free by construction
            return f"w{nwords:03d}{rng.choice('abcdef')}"

        groups = []
        agent_sets = []
        others = agents_pool[:]
        rng.shuffle(others)
        n_groups = rng.randint(1, 3)
        has_token_group = rng.random() < 0.7
        has_star_group = rng.random() < 0.6
        if has_token_group:
            ua = [token]
            if rng.random() < 0.3:
                ua.append(others.pop())
            agent_sets.append(ua)
        if has_star_group:
            agent_sets.append(["*"])
        while len(agent_sets) < n_groups and others:
            agent_sets.append([others.pop()])
        rng.shuffle(agent_sets)
        rules_by_pattern = {}
        lines = []
        if rng.random() < 0.3:
            lines.append("# a comment header")
        for gi, ua in enumerate(agent_sets):
            if gi > 0 and rng.random() < 0.5:
                lines.append("")  # blank only BETWEEN groups
            for a in ua:
                lines.append(f"User-agent: {a}")
            for _ in range(rng.randint(1, 4)):
                w = word()
                d = rng.choice(["Allow", "Disallow"])
                pat = f"/{w}/"
                lines.append(f"{d}: {pat}  # rule")
                rules_by_pattern[pat] = (ua, d)
            if rng.random() < 0.2:
                lines.append(f"Crawl-delay: {rng.randint(1, 9)}")
            if rng.random() < 0.2:
                lines.append("Sitemap: https://x.example.com/s.xml")
        body = "\n".join(lines)
        host = f"case{case}.example.com"
        probes = []
        pats = list(rules_by_pattern)
        rng.shuffle(pats)
        for pat in pats[:3]:
            probes.append(pat + rng.choice(["", "deep", "deep/er.html"]))
        probes.append("/zz-unmatched/")
        cases.append((host, body, probes))

    doc_rows = []
    doc_id = 0
    expected = {}
    for host, body, probes in cases:
        rfp = robotparser.RobotFileParser()
        rfp.parse(body.split("\n"))
        for path in probes:
            url = f"https://{host}{path}"
            doc_rows.append((doc_id, url))
            expected[doc_id] = rfp.can_fetch(token, url)
            doc_id += 1

    docs = spark.createDataFrame(doc_rows, "doc_id long, url string")
    robots = spark.createDataFrame(
        [(h, b) for h, b, _ in cases], "host string, robots_txt string"
    )
    got = {
        r.doc_id: r.robots_allowed
        for r in webops.robots_screen_resolved(docs, robots, token).collect()
    }
    mismatches = [
        (i, expected[i], got[i]) for i in expected if got[i] != expected[i]
    ]
    assert len(got) == doc_id
    assert mismatches == [], (
        f"{len(mismatches)} verdict mismatches vs urllib.robotparser "
        f"(first 5: {mismatches[:5]})"
    )


def test_frontier_urls_goldens(spark):
    """Frontier construction: urlset locs canonicalize and dedup (two
    spellings of one URL collapse, first declaring sitemap wins, max
    lastmod), index locs never enter the page frontier, locs already in
    the corpus are anti-joined away, unparseable locs drop."""
    import datetime

    entries = spark.createDataFrame(
        [
            # same page, two spellings, two sitemaps
            ("a.com", "https://a.com/s1.xml", "urlset", 1,
             "https://a.com/p?b=2&a=1", datetime.date(2024, 1, 1)),
            ("a.com", "https://a.com/s2.xml", "urlset", 1,
             "HTTPS://A.com/p?a=1&b=2", datetime.date(2024, 3, 1)),
            # already crawled
            ("a.com", "https://a.com/s1.xml", "urlset", 2,
             "https://a.com/old", None),
            # new page, no lastmod
            ("b.com", "https://b.com/s.xml", "urlset", 3,
             "https://b.com/new", None),
            # index entries are sitemaps, not pages
            ("c.com", "https://c.com/s.xml", "index", 1,
             "https://c.com/child.xml", None),
            # unparseable loc
            ("d.com", "https://d.com/s.xml", "urlset", 1,
             "not a url", None),
        ],
        "host string, sitemap_url string, kind string, ord int,"
        " loc string, lastmod date",
    )
    corpus = spark.createDataFrame(
        [(1, "https://a.com/old?")], "doc_id long, url string"
    )
    rows = [
        (r.url_canon, r.host, r.sitemap_url, r.ord, str(r.lastmod))
        for r in webops.frontier_urls(entries, corpus)
        .orderBy("url_canon")
        .collect()
    ]
    assert rows == [
        ("https://a.com/p?a=1&b=2", "a.com", "https://a.com/s1.xml", 1,
         "2024-03-01"),
        ("https://b.com/new", "b.com", "https://b.com/s.xml", 3, "None"),
    ]
