"""Property-based tests (SURVEY §5 item 4) with hypothesis: arithmetic
identities and invariants the reference guarantees implicitly, checked over
generated transaction batches run through the real Spark plans.

One Spark round-trip per property (hypothesis drives the row generator, a
single batch DataFrame goes through the plan) — keeps runtime sane."""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from tax_compliance_engine_spark.operators import corpus, refund, tax
from tax_compliance_engine_spark.schemas import TXN_SCHEMA

STATES = ["TX", "CA", "NY", "OR", "MT", "AL", "CO", "ZZ"]
CITIES = [None, "Houston", "Denver", "Nowhereville"]
CATS = [None, "grocery", "food", "electronics", "  Grocery "]
CUSTOMER_TYPES = ["retail", "wholesale", "exempt"]

txn_strategy = st.builds(
    dict,
    amount=st.decimals(
        min_value=Decimal("0.01"),
        max_value=Decimal("99999.99"),
        places=2,
        allow_nan=False,
        allow_infinity=False,
    ),
    state=st.sampled_from(STATES),
    city=st.sampled_from(CITIES),
    item_category=st.sampled_from(CATS),
    tax_paid=st.decimals(
        min_value=Decimal("0.00"),
        max_value=Decimal("9999.99"),
        places=2,
    ),
    customer_type=st.sampled_from(CUSTOMER_TYPES),
    days_back=st.integers(min_value=0, max_value=3000),
)

AS_OF = dt.date(2026, 8, 13)


def to_rows(spark, txn_dicts):
    rows = [
        Row(
            transaction_id=f"p{i}",
            transaction_date=AS_OF - dt.timedelta(days=d.pop("days_back")),
            amount=d["amount"],
            state=d["state"],
            city=d["city"],
            item_category=d["item_category"],
            tax_paid=d["tax_paid"],
            exemption_certificate=None,
            customer_type=d["customer_type"],
            pricing_model="exclusive",
        )
        for i, d in enumerate(txn_dicts)
    ]
    return tax.normalize_transactions(spark.createDataFrame(rows, TXN_SCHEMA))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(txn_strategy, min_size=1, max_size=30))
def test_tax_identities(spark, dims, batch):
    results = tax.calculate_tax(to_rows(spark, batch), dims).collect()
    for r in results:
        # tax_amount decomposes exactly into its separately-rounded parts
        assert r.tax_amount == r.state_tax + r.local_tax
        # each component is HALF_UP-rounded to cents
        for c in (r.state_tax, r.local_tax, r.tax_amount):
            assert c == c.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        # exempt or unknown-state rows owe nothing; taxed rows owe >= 0
        unknown_state = any(w.startswith("Unknown state code") for w in r.warnings)
        if r.is_exempt or unknown_state:
            assert r.tax_amount == Decimal("0.00")
        assert r.tax_amount >= 0
        # effective rate consistent with the money math (1 cent slack/component)
        if not r.is_exempt and not unknown_state:
            expected = (r.taxable_amount * Decimal(str(r.effective_rate)))
            assert abs(r.tax_amount - expected) <= Decimal("0.02")
        # exemption implies a reason; taxation implies none
        assert (r.exemption_reason != "") == r.is_exempt


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(txn_strategy, min_size=1, max_size=30))
def test_refund_record_iff_overpaid(spark, dims, batch):
    txns = to_rows(spark, batch)
    results = {r.transaction_id: r for r in tax.calculate_tax(txns, dims).collect()}
    records = {
        r.transaction_id: r
        for r in refund.analyze_overpayments(txns, dims, AS_OF).collect()
    }
    for tid, res in results.items():
        overpaid = res.tax_paid - res.tax_amount
        if overpaid > 0:
            rec = records[tid]
            assert rec.overpayment == overpaid.quantize(Decimal("0.01"))
            # SOL boundary: eligible iff date >= as_of minus sol_years
            cutoff = AS_OF.replace(year=AS_OF.year - rec.sol_years)
            assert rec.refund_eligible == (res.transaction_date >= cutoff)
        else:
            assert tid not in records


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=25,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"s{i % 3}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_corpus_invariants(spark, texts):
    docs = _docs(spark, texts)
    n = len(texts)

    # vocabulary: term_count >= doc_freq >= 1; totals match token count
    vocab = corpus.vocabulary(docs).collect()
    total_tokens = sum(len(t.split()) for t in texts)
    assert sum(r.term_count for r in vocab) == total_tokens
    assert all(r.term_count >= r.doc_freq >= 1 for r in vocab)

    # packing: every doc binned exactly once; bin ids start at 0 and are
    # monotone in doc order (an over-budget doc may skip a bin entirely);
    # per-bin token mass ≤ budget + longest doc (a doc may straddle the cut)
    budget = 10
    bins = corpus.pack_sequences(docs, budget).collect()
    assert sorted(r.doc_id for r in bins) == list(range(n))
    ordered = sorted(bins, key=lambda r: r.doc_id)
    assert ordered[0].bin_id == 0
    assert all(
        a.bin_id <= b.bin_id for a, b in zip(ordered, ordered[1:])
    )
    per_bin: dict[int, int] = {}
    for r in bins:
        per_bin[r.bin_id] = per_bin.get(r.bin_id, 0) + r.n_tokens
    longest = max(r.n_tokens for r in bins)
    assert all(v <= budget + longest for v in per_bin.values())

    # deterministic sampling: monotone in rate, and rate=1 keeps everything
    kept_half = {r.doc_id for r in corpus.deterministic_sample(docs, 0.5).collect()}
    kept_all = {r.doc_id for r in corpus.deterministic_sample(docs, 1.0).collect()}
    assert kept_half <= kept_all == set(range(n))

    # stratified: never more than quota per stratum, and exact when the
    # stratum has at least quota members
    quota = 3
    out = corpus.stratified_sample(docs, quota).collect()
    per_src: dict[str, int] = {}
    for r in out:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    sizes: dict[str, int] = {}
    for i in range(n):
        sizes[f"s{i % 3}"] = sizes.get(f"s{i % 3}", 0) + 1
    for src, size in sizes.items():
        assert per_src.get(src, 0) == min(quota, size)

    # decontamination is idempotent and never keeps a doc sharing a shingle
    bench = docs.limit(1)
    clean1 = corpus.decontaminate(docs, bench, n=3)
    clean2 = corpus.decontaminate(clean1, bench, n=3)
    ids1 = sorted(r.doc_id for r in clean1.collect())
    ids2 = sorted(r.doc_id for r in clean2.collect())
    assert ids1 == ids2


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_chunk_dedup_matches_python_reference(spark, texts):
    """chunk_dedup ≡ plain-Python global first-occurrence chunk dedup on
    random corpora (chunk boundaries, within-doc repeats, empty docs)."""
    c = 3
    docs = _docs(spark, texts)
    seen: set[tuple[str, ...]] = set()
    want: dict[int, tuple[int, int, str]] = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        chunks = [
            tuple(toks[j : j + c]) for j in range(0, len(toks), c)
        ]
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        want[i] = (
            len(chunks),
            len(kept),
            " ".join(w for ch in kept for w in ch),
        )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.text_deduped)
        for r in corpus.chunk_dedup(docs, chunk_tokens=c).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy, data=st.data())
def test_phrase_search_matches_python_reference(spark, texts, data):
    """phrase_search ≡ plain-Python sliding-window count for a phrase
    drawn from WITHIN one document (so ≥1 hit is actually guaranteed —
    a window over the concatenation of all docs could span a doc
    boundary and match nothing) on random corpora."""
    nonempty = [t.split(" ") for t in texts if t.split(" ") != [""]]
    nonempty = [t for t in nonempty if any(t)]
    if not nonempty:
        return
    src = data.draw(st.sampled_from(nonempty))
    src = [w for w in src if w]
    start = data.draw(st.integers(min_value=0, max_value=len(src) - 1))
    k = data.draw(
        st.integers(min_value=1, max_value=min(3, len(src) - start))
    )
    terms = src[start : start + k]
    phrase = " ".join(terms)
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        m = sum(
            1
            for j in range(len(toks) - len(terms) + 1)
            if toks[j : j + len(terms)] == terms
        )
        if m > 0:
            want[i] = m
    got = {
        r.doc_id: r.n_matches
        for r in corpus.phrase_search(
            _docs(spark, texts), phrase
        ).collect()
    }
    assert want, "phrase drawn from a doc must hit at least that doc"
    assert got == want


# ── binary media parser fuzzing ──────────────────────────────────────
# The PPM/WAV parsers run inside executors over untrusted payload bytes:
# any byte string must decode to a valid result or None — never raise.
# Driver-side (no Spark round-trip needed: the parsers are pure).


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_decode_ppm_never_raises_on_arbitrary_bytes(payload):
    from tax_compliance_engine_spark.operators.multimodal import (
        _decode_ppm,
        _split_ppm_frames,
    )

    arr = _decode_ppm(payload)
    assert arr is None or arr.ndim == 3
    frames = _split_ppm_frames(payload)
    for f in frames:
        assert _decode_ppm(f) is not None  # every split frame decodes


@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_decode_wav_never_raises_on_arbitrary_bytes(payload):
    from tax_compliance_engine_spark.operators.multimodal import _decode_wav

    out = _decode_wav(payload)
    if out is not None:
        rate, ch, samples = out
        assert rate >= 0 and ch >= 1 and samples.shape[1] == ch


@given(st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_decode_ppm_prefixed_garbage(noise):
    """A valid header followed by arbitrary bytes decodes iff enough
    pixel bytes follow — and never crashes mid-parse."""
    from tax_compliance_engine_spark.operators.multimodal import _decode_ppm

    payload = b"P6\n2 2\n255\n" + noise
    arr = _decode_ppm(payload)
    if len(noise) >= 12:
        assert arr is not None and arr.shape == (2, 2, 3)
    else:
        assert arr is None


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_jpeg_decoder_total_on_corrupted_payloads(data):
    """Robustness property (no Spark needed — the decoder is row-local):
    flipping arbitrary bytes of a valid baseline JPEG must never raise —
    the decoder returns None or a well-formed (h, w, 3) uint8 array.  A
    crash here would kill a whole executor task batch on one bad file."""
    import numpy as np

    from tax_compliance_engine_spark.operators import multimodal

    i = data.draw(st.integers(min_value=0, max_value=500))
    nbx, nby = 1 + i % 3, 1 + i % 2
    arr = np.empty((8 * nby, 8 * nbx, 3), dtype=np.uint8)
    for by in range(nby):
        for bx in range(nbx):
            arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                (i + 5 * bx + 11 * by) % 256,
                (2 * i + 7 * bx + 3 * by) % 256,
                (5 * i + bx + 13 * by) % 256,
            )
    payload = bytearray(multimodal._encode_jpeg(arr))
    n_flips = data.draw(st.integers(min_value=1, max_value=8))
    for _ in range(n_flips):
        # half the flips target the segment-header region, where the
        # length fields live (corrupting a length shrinks a body under
        # its fixed layout — the IndexError class a uniform flip rarely
        # hits)
        hi = min(len(payload) - 1, 120) if data.draw(st.booleans()) else len(payload) - 1
        pos = data.draw(st.integers(min_value=0, max_value=hi))
        payload[pos] = data.draw(st.integers(min_value=0, max_value=255))
    out = multimodal._decode_jpeg(bytes(payload))
    assert out is None or (
        out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
    )
    # truncation at any point is equally total
    cut = data.draw(st.integers(min_value=0, max_value=len(payload)))
    out2 = multimodal._decode_jpeg(bytes(payload[:cut]))
    assert out2 is None or (
        out2.ndim == 3 and out2.shape[2] == 3 and out2.dtype == np.uint8
    )
