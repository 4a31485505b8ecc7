"""Compliance alert generation: union of nexus- and calendar-derived alerts.

Re-expresses /root/reference/tax_engine/compliance.py:499-593
(generate_alerts) as two DataFrame branches unioned (U1) and sorted by a
severity rank (O6).  The reference recomputes nexus per state inside
generate_alerts (compliance.py:521-525); here the status DataFrame is
computed once and both outputs derive from it (SURVEY §3 entry-point 2).

Faithful quirk: the overdue branch generates each registered state's calendar
for ``as_of.year`` with default (annual) frequency — exactly what the
reference does with its default arguments (compliance.py:560-563), which
means current-year annual returns are never overdue mid-year; callers that
want real overdue alerts pass an explicit ``deadlines`` DataFrame.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dims import Dims
from . import calendar as cal

ALERT_COLUMNS = ["severity", "state_code", "message", "action_required", "deadline"]


def severity_rank() -> F.Column:
    """critical=0 < warning=1 < info=2 (compliance.py:586-593)."""
    return (
        F.when(F.col("severity") == "critical", 0)
        .when(F.col("severity") == "warning", 1)
        .otherwise(2)
    )


def nexus_alerts(status: DataFrame, registered_states: list[str]) -> DataFrame:
    """Unregistered-nexus (critical) and approaching-threshold (warning)
    alerts from a nexus status DataFrame (compliance.py:521-557)."""
    registered = sorted({s.upper() for s in registered_states})
    is_registered = (
        F.col("state_code").isin(*registered) if registered else F.lit(False)
    )

    critical = (
        status.filter(F.col("has_nexus") & ~is_registered)
        .withColumn("severity", F.lit("critical"))
        .withColumn(
            "message",
            F.format_string(
                "Economic nexus established in %s but not registered for "
                "sales tax collection",
                F.col("state_code"),
            ),
        )
        .withColumn(
            "action_required",
            F.format_string(
                "Register for sales tax in %s immediately. Revenue: $%s",
                F.col("state_code"),
                F.format_number(F.col("revenue_in_state"), 2),
            ),
        )
        .withColumn("deadline", F.lit(None).cast("date"))
        .select(*ALERT_COLUMNS)
    )

    warning = (
        status.filter(~F.col("has_nexus") & F.col("approaching_threshold"))
        .withColumn("severity", F.lit("warning"))
        .withColumn(
            "message",
            # Python's {:.0f} rounds half-to-even; Java's %.0f rounds half-up.
            # bround first so exact .5 ties (e.g. 94.5%) match the reference.
            F.format_string(
                "Approaching economic nexus threshold in %s (%d%% of "
                "revenue limit)",
                F.col("state_code"),
                F.bround(F.col("revenue_pct_of_threshold"), 0).cast("long"),
            ),
        )
        .withColumn(
            "action_required",
            F.format_string(
                "Monitor %s activity. Prepare registration materials "
                "proactively.",
                F.col("state_code"),
            ),
        )
        .withColumn("deadline", F.lit(None).cast("date"))
        .select(*ALERT_COLUMNS)
    )
    return critical.unionByName(warning)


def overdue_alerts(deadlines: DataFrame, as_of: dt.date) -> DataFrame:
    """Overdue-filing alerts from a deadlines DataFrame
    (compliance.py:560-584): critical when > 30 days late."""
    days_late = F.datediff(F.lit(as_of), F.col("due_date"))
    return (
        deadlines.filter(F.col("is_overdue"))
        .withColumn(
            "severity",
            F.when(days_late > 30, "critical").otherwise("warning"),
        )
        .withColumn(
            "message",
            F.format_string(
                "%s return for %s to %s is %d days past due",
                F.col("state_code"),
                F.date_format("period_start", "yyyy-MM-dd"),
                F.date_format("period_end", "yyyy-MM-dd"),
                days_late,
            ),
        )
        .withColumn(
            "action_required",
            F.format_string(
                "File %s return immediately. Late penalties may apply.",
                F.col("state_code"),
            ),
        )
        .withColumn("deadline", F.col("due_date"))
        .select(*ALERT_COLUMNS)
    )


def generate_alerts(
    spark: SparkSession,
    dims: Dims,
    status: DataFrame,
    registered_states: list[str],
    as_of: dt.date,
    deadlines: DataFrame | None = None,
) -> DataFrame:
    """Full alert pipeline: nexus alerts ∪ overdue alerts, severity-sorted."""
    if deadlines is None and registered_states:
        deadlines = cal.filing_deadlines(
            spark, dims, registered_states, as_of.year, as_of
        )
    parts = nexus_alerts(status, registered_states)
    if deadlines is not None:
        parts = parts.unionByName(overdue_alerts(deadlines, as_of))
    return parts.orderBy(severity_rank(), "state_code", "message")
