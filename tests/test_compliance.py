"""Parity tests for nexus, filing calendar, and alerts, ported from
/root/reference/tests/test_compliance.py."""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from tax_compliance_engine_spark.operators import alerts, calendar as cal, nexus


def activity(spark, rows):
    return spark.createDataFrame(
        [(s, Decimal(r), int(t)) for s, r, t in rows],
        "state string, revenue decimal(18,2), txn_count long",
    )


def one_status(spark, dims, state, rev, txns, physical=None):
    df = activity(spark, [(state, rev, txns)])
    return nexus.check_nexus(df, dims, physical_states=physical).collect()[0]


def test_nexus_by_revenue(spark, dims):
    # test_compliance.py:25-29: TX $600k > $500k threshold
    s = one_status(spark, dims, "TX", "600000.00", 100)
    assert s.has_nexus is True
    assert "economic" in s.nexus_types


def test_nexus_by_transactions(spark, dims):
    # test_compliance.py:31-35: CT 250 txns > 200 threshold
    s = one_status(spark, dims, "CT", "50000.00", 250)
    assert s.has_nexus is True
    assert "economic" in s.nexus_types


def test_below_threshold(spark, dims):
    s = one_status(spark, dims, "TX", "100000.00", 50)
    assert s.has_nexus is False


def test_physical_presence(spark, dims):
    s = one_status(spark, dims, "TX", "1000.00", 5, physical={"TX"})
    assert s.has_nexus is True
    assert "physical" in s.nexus_types


def test_no_tax_states(spark, dims):
    for st in ("DE", "MT", "NH", "OR"):
        s = one_status(spark, dims, st, "1000000.00", 1000)
        assert s.has_nexus is False
        assert f"{st} has no sales tax" in s.details


def test_approaching_threshold(spark, dims):
    # test_compliance.py:58-62: TX $450k = 90% of $500k
    s = one_status(spark, dims, "TX", "450000.00", 50)
    assert s.has_nexus is False
    assert s.approaching_threshold is True


def test_percentages(spark, dims):
    s = one_status(spark, dims, "TX", "250000.00", 50)
    assert s.revenue_pct_of_threshold == pytest.approx(50.0, abs=0.1)
    s = one_status(spark, dims, "CT", "10000.00", 100)
    assert s.transaction_pct_of_threshold == pytest.approx(50.0, abs=0.1)


def test_details_format(spark, dims):
    s = one_status(spark, dims, "CT", "50000.00", 100)
    assert s.details == (
        "Revenue: $50,000.00 / $100,000.00 (50.0%); "
        "Transactions: 100 / 200 (50.0%); Period: rolling_12"
    )


def test_unknown_threshold_state(spark, dims):
    # a state absent from nexus_thresholds and not a no-nexus state would be
    # e.g. an unknown code — reference returns "No economic nexus data"
    s = one_status(spark, dims, "XX", "999999.00", 999)
    assert s.has_nexus is False
    assert s.details == "No economic nexus data available"
    assert s.revenue_threshold == Decimal("0.00")


def test_all_states_sorted(spark, dims):
    df = activity(spark, [("TX", "600000.00", 10), ("CA", "100000.00", 10)])
    res = nexus.check_nexus(df, dims).collect()
    assert len(res) == 2
    assert res[0].state_code == "TX"  # 120% > 20%


# ── Filing calendar ──────────────────────────────────────────────────

AS_OF = date(2024, 6, 15)


def deadlines(spark, dims, state="TX", year=2024, **kw):
    return cal.filing_deadlines(spark, dims, [state], year, AS_OF, **kw)


def test_monthly_generates_12(spark, dims):
    d = deadlines(spark, dims, frequency="monthly").collect()
    assert len(d) == 12


def test_quarterly_generates_4(spark, dims):
    d = deadlines(spark, dims, frequency="quarterly").collect()
    assert len(d) == 4
    ends = [r.period_end for r in sorted(d, key=lambda r: r.period_start)]
    assert ends == [
        date(2024, 3, 31),
        date(2024, 6, 30),
        date(2024, 9, 30),
        date(2024, 12, 31),
    ]


def test_annual_generates_1(spark, dims):
    d = deadlines(spark, dims, frequency="annual").collect()
    assert len(d) == 1
    assert d[0].period_start == date(2024, 1, 1)
    assert d[0].period_end == date(2024, 12, 31)


def test_auto_frequency_buckets(spark, dims):
    # compliance.py:186-200 via test_compliance.py:112-141
    assert len(deadlines(spark, dims, estimated_annual_liability="6000").collect()) == 12
    assert len(deadlines(spark, dims, estimated_annual_liability="2400").collect()) == 4
    assert len(deadlines(spark, dims, estimated_annual_liability="500").collect()) == 1


def test_due_dates_and_december_rollover(spark, dims):
    d = {
        r.period_start: r
        for r in deadlines(spark, dims, frequency="monthly").collect()
    }
    jan = d[date(2024, 1, 1)]
    assert jan.period_end == date(2024, 1, 31)
    assert jan.due_date == date(2024, 2, 20)
    dec = d[date(2024, 12, 1)]
    assert dec.period_end == date(2024, 12, 31)
    assert dec.due_date == date(2025, 1, 20)  # Dec→Jan rollover


def test_state_specific_due_day(spark, dims):
    d = deadlines(spark, dims, state="CA", frequency="monthly").collect()
    jan = min(d, key=lambda r: r.period_start)
    assert jan.due_date == date(2024, 2, 25)  # CA due day 25


def test_overdue_and_status(spark, dims):
    d = {
        r.period_start: r
        for r in deadlines(spark, dims, frequency="monthly").collect()
    }
    jan = d[date(2024, 1, 1)]  # due 2024-02-20 < as_of 2024-06-15
    assert jan.is_overdue is True and jan.status == "overdue"
    nov = d[date(2024, 11, 1)]
    assert nov.is_overdue is False and nov.status == "pending"
    assert nov.days_until_due == (date(2024, 12, 20) - AS_OF).days


def test_filed_period_not_overdue(spark, dims):
    filed = spark.createDataFrame(
        [("TX", date(2024, 1, 1), date(2024, 1, 31))],
        "state_code string, period_start date, period_end date",
    )
    d = {
        r.period_start: r
        for r in deadlines(
            spark, dims, frequency="monthly", filed_periods=filed
        ).collect()
    }
    jan = d[date(2024, 1, 1)]
    assert jan.is_overdue is False and jan.status == "filed"
    feb = d[date(2024, 2, 1)]
    assert feb.status == "overdue"


def test_overdue_filings_sorted(spark, dims):
    all_d = cal.filing_deadlines(
        spark, dims, ["TX", "CA"], 2024, AS_OF, frequency="monthly"
    )
    od = cal.overdue_filings(all_d).collect()
    assert all(r.is_overdue for r in od)
    due = [r.due_date for r in od]
    assert due == sorted(due)


# ── Alerts ───────────────────────────────────────────────────────────


def test_alerts_nexus_without_registration(spark, dims):
    df = activity(spark, [("TX", "600000.00", 10), ("CA", "450000.00", 10)])
    status = nexus.check_nexus(df, dims)
    out = alerts.generate_alerts(
        spark, dims, status, registered_states=[], as_of=AS_OF
    ).collect()
    crit = [a for a in out if a.severity == "critical"]
    warn = [a for a in out if a.severity == "warning"]
    assert any("TX" in a.message for a in crit)
    assert any("CA" in a.message and "90% of revenue limit" in a.message for a in warn)
    # severity sort: criticals first
    sevs = [a.severity for a in out]
    assert sevs == sorted(sevs, key=lambda s: {"critical": 0, "warning": 1}.get(s, 2))


def test_alerts_registered_state_suppressed(spark, dims):
    df = activity(spark, [("TX", "600000.00", 10)])
    status = nexus.check_nexus(df, dims)
    out = alerts.generate_alerts(
        spark, dims, status, registered_states=["tx"], as_of=AS_OF
    ).collect()
    assert not any(a.severity == "critical" for a in out)


def test_overdue_alerts_severity(spark, dims):
    d = cal.filing_deadlines(
        spark, dims, ["TX"], 2024, AS_OF, frequency="monthly"
    )
    out = alerts.overdue_alerts(d, AS_OF).collect()
    # Jan due 2/20 → 116 days late (critical); Apr due 5/20 → 26 days (warning)
    by_msg = {a.message: a for a in out}
    jan = next(a for m, a in by_msg.items() if "2024-01-01" in m)
    assert jan.severity == "critical" and "116 days past due" in jan.message
    apr = next(a for m, a in by_msg.items() if "2024-04-01" in m)
    assert apr.severity == "warning" and "26 days past due" in apr.message
