"""Golden-value parity tests for refund analysis, ported from
/root/reference/tests/test_refund_analyzer.py."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

from pyspark.sql import Row

from tax_compliance_engine_spark.operators import refund, tax
from tax_compliance_engine_spark.schemas import TXN_SCHEMA

AS_OF = date(2024, 7, 1)


def make_df(spark, rows):
    data = [
        Row(
            transaction_id=tid,
            transaction_date=d,
            amount=Decimal(amt),
            state=st,
            city=city,
            item_category=cat,
            tax_paid=Decimal(paid),
            exemption_certificate=None,
            customer_type="retail",
            pricing_model="exclusive",
        )
        for (tid, d, amt, st, city, cat, paid) in rows
    ]
    return tax.normalize_transactions(spark.createDataFrame(data, TXN_SCHEMA))


def analyze(spark, dims, rows, as_of=AS_OF):
    return refund.analyze_overpayments(make_df(spark, rows), dims, as_of)


D = date(2024, 6, 15)


def test_overpayment_detected(spark, dims):
    recs = analyze(
        spark, dims, [("T1", D, "1000.00", "TX", "Houston", None, "100.00")]
    ).collect()
    assert len(recs) == 1
    assert recs[0].overpayment == Decimal("17.50")
    assert recs[0].tax_owed == Decimal("82.50")
    assert recs[0].reason.startswith("Rate mismatch: paid 10.0000%")
    assert "correct rate 8.2500%" in recs[0].reason


def test_exact_and_underpaid_yield_nothing(spark, dims):
    recs = analyze(
        spark,
        dims,
        [
            ("T1", D, "1000.00", "TX", "Houston", None, "82.50"),
            ("T2", D, "1000.00", "TX", "Houston", None, "50.00"),
        ],
    ).collect()
    assert recs == []


def test_exempt_transaction_taxed(spark, dims):
    recs = analyze(
        spark, dims, [("T1", D, "100.00", "TX", "Houston", "grocery", "8.25")]
    ).collect()
    assert len(recs) == 1
    assert recs[0].overpayment == Decimal("8.25")
    assert recs[0].reason == "Exempt transaction taxed: TX exempts grocery"


def test_no_tax_state_collection(spark, dims):
    recs = analyze(
        spark, dims, [("T1", D, "500.00", "OR", None, None, "35.00")]
    ).collect()
    assert len(recs) == 1
    assert recs[0].overpayment == Decimal("35.00")
    # OR path: is_exempt=True (no-sales-tax branch) → Exempt reason
    assert recs[0].reason == "Exempt transaction taxed: Oregon has no sales tax"


def test_sol_eligibility_and_date(spark, dims):
    recs = {
        r.transaction_id: r
        for r in analyze(
            spark,
            dims,
            [
                ("NEW", date(2024, 1, 1), "1000.00", "TX", "Houston", None, "100.00"),
                ("OLD", date(2018, 1, 1), "1000.00", "TX", "Houston", None, "100.00"),
            ],
        ).collect()
    }
    assert recs["NEW"].refund_eligible is True
    # TX SOL = 4 years → expiry 2028-01-01
    assert recs["NEW"].statute_of_limitations_date == date(2028, 1, 1)
    assert recs["OLD"].refund_eligible is False


def test_summary_and_breakdowns(spark, dims):
    records = analyze(
        spark,
        dims,
        [
            ("T1", D, "1000.00", "TX", "Houston", None, "100.00"),
            ("T2", D, "1000.00", "TX", "Houston", None, "82.50"),
            ("T3", D, "500.00", "OR", None, None, "25.00"),
            ("T4", date(2018, 1, 1), "1000.00", "TX", "Houston", None, "100.00"),
        ],
    )
    summary, state_bd, reason_bd, warnings = refund.refund_summary(
        records, total_transactions_reviewed=4
    )
    s = summary.collect()[0]
    assert s.overpayment_count == 3
    assert s.total_overpayment == Decimal("60.00")  # 17.50 + 25.00 + 17.50
    # eligible = 17.50 + 25.00 → recovery = round(42.50*0.85) = 36.13
    assert s.estimated_recovery == Decimal("36.13")
    assert s.oldest_eligible == D and s.newest_eligible == D

    bd = {r.state: r.amount for r in state_bd.collect()}
    assert bd == {"TX": Decimal("35.00"), "OR": Decimal("25.00")}

    rb = {r.reason: r.amount for r in reason_bd.collect()}
    assert rb["Rate mismatch"] == Decimal("35.00")
    assert rb["Exempt transaction taxed"] == Decimal("25.00")

    w = [r.warning for r in warnings.collect()]
    assert w == [
        "Transaction T4 in TX is past statute of limitations ($17.50)"
    ]


def test_claims_sorted_and_notes(spark, dims):
    records = analyze(
        spark,
        dims,
        [
            ("T1", D, "1000.00", "TX", "Houston", None, "100.00"),
            ("T2", D, "500.00", "CA", "Los Angeles", None, "60.00"),
        ],
    )
    claims = refund.refund_claims(records, include_records=True).collect()
    assert len(claims) == 2
    assert claims[0].total_refund_requested >= claims[1].total_refund_requested
    ca = next(c for c in claims if c.state_code == "CA")
    # CA/LA owed 19.50+29.00... actually owed = 36.25? compute: 500*0.0725=36.25
    # state 36.25? No: state 0.0725*500=36.25 → wait LA local 0.025*500=12.50
    assert ca.transaction_count == 1
    assert ca.supporting_reasons == ["Rate mismatch"]
    assert ca.filing_notes.startswith("Refund claim for 1 transactions. SOL: 3 years")
    tx = next(c for c in claims if c.state_code == "TX")
    assert tx.filing_notes.endswith("Total requested: $17.50")
    assert len(tx.records) == 1


def test_claims_two_level_salted_parity(spark, dims):
    # the skew-safe salted two-level aggregation must produce identical
    # claims to the one-level plan (records compared order-insensitively)
    records = analyze(
        spark,
        dims,
        [
            ("T1", D, "1000.00", "TX", "Houston", None, "100.00"),
            ("T2", D, "500.00", "TX", "Houston", None, "60.00"),
            ("T3", D, "250.00", "TX", None, "grocery", "20.00"),
            ("T4", D, "500.00", "CA", "Los Angeles", None, "60.00"),
        ],
    )
    def norm(rows):
        return sorted(
            (
                r.state_code,
                r.claim_period_start,
                r.claim_period_end,
                r.total_refund_requested,
                r.transaction_count,
                tuple(r.supporting_reasons),
                r.filing_notes,
                tuple(sorted(rec.transaction_id for rec in r.records)),
            )
            for r in rows
        )
    one = refund.refund_claims(records, include_records=True).collect()
    two = refund.refund_claims(
        records, include_records=True, salt_buckets=7
    ).collect()
    assert norm(one) == norm(two)


def test_claims_salted_parity_under_heavy_skew(spark, dims):
    # 100 TB regression pin for the salted path's reason to exist: one hot
    # state holding ~90% of all records.  The two-level aggregation must
    # still match the direct one-level plan on every claim field — sums,
    # period extents, counts, reason sets, and the formatted notes.
    rows = []
    for i in range(270):  # hot key
        rows.append(
            (
                f"C{i}",
                D,
                f"{100 + i}.00",
                "CA",
                "Los Angeles" if i % 2 else None,
                None,
                f"{50 + i}.00",
            )
        )
    for i in range(25):
        rows.append(
            (f"T{i}", D, f"{200 + i}.00", "TX", "Houston", None, f"{90 + i}.00")
        )
    for i, st in enumerate(["NY", "WA", "UT", "FL", "CO"]):
        rows.append((f"X{i}", D, "300.00", st, None, None, "80.00"))
    records = analyze(spark, dims, rows)

    def norm(claims):
        return sorted(
            (
                c.state_code,
                c.claim_period_start,
                c.claim_period_end,
                c.total_refund_requested,
                c.transaction_count,
                tuple(c.supporting_reasons),
                c.filing_notes,
            )
            for c in claims
        )

    base = refund.refund_claims(records).collect()
    salted = refund.refund_claims(records, salt_buckets=8).collect()
    assert norm(base) == norm(salted)
    hot = next(c for c in base if c.state_code == "CA")
    assert hot.transaction_count == 270


def test_quick_scan_threshold(spark, dims):
    df = make_df(
        spark,
        [
            ("T1", D, "1000.00", "TX", "Houston", None, "100.00"),
            ("T2", D, "1000.00", "TX", "Houston", None, "82.50"),
            ("T3", D, "1000.00", "TX", "Houston", None, "83.00"),
        ],
    )
    hits = refund.quick_scan(df, dims, AS_OF, minimum_overpayment="1.00").collect()
    assert [h.transaction_id for h in hits] == ["T1"]


def test_reason_prefix_matches_substring_of_reason(spark, dims):
    """The static reason_prefix column must equal substring_index(reason,
    ':', 1) on every record (the F11 invariant the fast path relies on)."""
    from pyspark.sql import functions as F

    from tax_compliance_engine_spark.plans import derived

    txns = derived.derive_transactions(spark, "/root/testdata/sf0.001")
    records = refund.analyze_overpayments(
        tax.normalize_transactions(txns), dims, derived.AS_OF
    )
    mismatches = records.filter(
        F.substring_index("reason", ":", 1) != F.col("reason_prefix")
    ).count()
    assert mismatches == 0
