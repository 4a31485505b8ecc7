"""Economic-nexus evaluation as a grouped-aggregate + broadcast-join plan.

Re-expresses /root/reference/tax_engine/compliance.py:244-369 (check_nexus /
check_nexus_all_states) as:

  transactions → groupBy(state).agg(revenue, txn_count)   [one shuffle, A3]
  → broadcast join nexus_thresholds (J4) + literal no-nexus set (J5)
  → status/percentage/details column expressions (F15/F16/F12)
  → sort by revenue_pct desc (O4)

At scale the single shuffle is on the 51-value state key — skew toward
CA/TX/NY is handled by partial (map-side) aggregation; the post-agg data is
≤ |states| rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dims import Dims
from ..schemas import MONEY, NO_NEXUS_STATES


def state_activity(txns: DataFrame) -> DataFrame:
    """Per-state revenue/transaction rollup (A3, reference cli.py:246-251)."""
    return txns.groupBy("state").agg(
        F.sum("amount").cast(MONEY).alias("revenue"),
        F.count("*").cast("long").alias("txn_count"),
    )


def _period_predicates(d: F.Column, as_of_lit: F.Column) -> dict:
    """The five measurement-period membership predicates over a date
    column ``d`` — shared by the transaction-level batch path
    (``periodized_activity``) and the month-granular streaming assembly
    (``periodized_from_monthly``), so the period semantics live in
    exactly one place."""
    return {
        "current_year": (d >= F.trunc(as_of_lit, "year")) & (d <= as_of_lit),
        "prior_year": F.year(d) == (F.year(as_of_lit) - 1),
        "rolling_12": (d > F.add_months(as_of_lit, -12)) & (d <= as_of_lit),
        "rolling_4q": (
            d >= F.add_months(F.trunc(as_of_lit, "quarter"), -12)
        )
        & (d <= as_of_lit),
        "all_time": d <= as_of_lit,
    }


def _simple_period_col(mp: F.Column, preds: dict) -> F.Column:
    """Membership under the state's own measurement_period for the four
    single-window semantics (current_or_prior is resolved post-agg as
    the max of the two component windows; no-threshold states measure
    all-time)."""
    return (
        F.when(mp == "current_year", preds["current_year"])
        .when(mp == "prior_year", preds["prior_year"])
        .when(mp == "rolling_12", preds["rolling_12"])
        .when(mp == "rolling_4q", preds["rolling_4q"])
        .otherwise(preds["all_time"])
    )


def periodized_activity(txns: DataFrame, dims: Dims, as_of) -> DataFrame:
    """Per-state activity measured over each state's ``measurement_period``.

    Extension beyond the reference (SURVEY §2.9): the reference stores the
    period on every threshold (compliance.py:46) but compares against
    all-time totals (compliance.py:305-310).  This operator honors it:

    - ``current_year``: Jan 1 of as_of's year .. as_of
    - ``prior_year``: the full previous calendar year
    - ``rolling_12``: the 12 months ending at as_of (exclusive start)
    - ``rolling_4q``: from the start of the quarter 12 months before as_of's
      quarter, through as_of (4 complete quarters + the current partial one)
    - ``current_or_prior``: the better of current_year and prior_year
      (a state qualifies if either period crosses, so measure the max)
    - states without a threshold row: all-time up to as_of

    One broadcast join + one state-keyed shuffle with conditional partial
    aggregation — the period logic costs nothing extra at scale."""
    nt = dims.nexus_thresholds.select(
        F.col("state_code").alias("_pa_state"),
        F.col("measurement_period").alias("_mp"),
    )
    df = txns.join(F.broadcast(nt), F.col("state") == F.col("_pa_state"), "left")

    preds = _period_predicates(F.col("transaction_date"), F.lit(as_of))
    in_cur, in_prior = preds["current_year"], preds["prior_year"]
    in_simple = _simple_period_col(F.col("_mp"), preds)

    def _sum_if(cond) -> F.Column:
        return F.coalesce(
            F.sum(F.when(cond, F.col("amount"))), F.lit(0)
        ).cast(MONEY)

    def _cnt_if(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = df.groupBy("state").agg(
        _sum_if(in_simple).alias("_rev_simple"),
        _cnt_if(in_simple).alias("_cnt_simple"),
        _sum_if(in_cur).alias("_rev_cur"),
        _cnt_if(in_cur).alias("_cnt_cur"),
        _sum_if(in_prior).alias("_rev_prior"),
        _cnt_if(in_prior).alias("_cnt_prior"),
        F.first("_mp").alias("_mp"),
    )
    is_cop = F.col("_mp") == "current_or_prior"
    return agg.select(
        "state",
        F.when(is_cop, F.greatest("_rev_cur", "_rev_prior"))
        .otherwise(F.col("_rev_simple"))
        .alias("revenue"),
        F.when(is_cop, F.greatest("_cnt_cur", "_cnt_prior"))
        .otherwise(F.col("_cnt_simple"))
        .alias("txn_count"),
    )


def periodized_from_monthly(months: DataFrame, dims: Dims, as_of) -> DataFrame:
    """Period-aware per-state activity assembled from MONTH-GRANULAR
    sub-aggregates — the batch half of the streaming nexus monitor:
    the stream maintains (month, state, revenue, txn_count) running
    state (``streaming.nexus_monitor.monthly_state_activity``, months ×
    ≤51 states — tiny), and each snapshot assembles the five
    measurement-period semantics from those buckets with the SAME
    predicates the transaction-level batch path uses
    (``_period_predicates``), applied to the bucket's month-start date.

    ``as_of`` must be a month-END date (the monitor's snapshot
    contract, asserted): every period boundary in ``_period_predicates``
    is then month-aligned, so bucket membership ≡ row membership and —
    Decimal/int sums being exact and order-free — the assembled totals
    equal ``periodized_activity`` over the same transactions
    bit-for-bit (pytest-pinned, multi-year replay).  A mid-month
    ``as_of`` would need the current month's day-level rows, which the
    monthly state no longer holds.

    ``months``: (month date/timestamp, state, revenue, txn_count)."""
    import datetime as _dt

    if isinstance(as_of, str):
        as_of = _dt.date.fromisoformat(as_of)
    nxt = as_of + _dt.timedelta(days=1)
    if nxt.day != 1:
        raise ValueError(
            f"periodized_from_monthly needs a month-end as_of, got {as_of}"
        )
    nt = dims.nexus_thresholds.select(
        F.col("state_code").alias("_pa_state"),
        F.col("measurement_period").alias("_mp"),
    )
    df = months.join(
        F.broadcast(nt), F.col("state") == F.col("_pa_state"), "left"
    )
    preds = _period_predicates(F.to_date("month"), F.lit(as_of))
    in_cur, in_prior = preds["current_year"], preds["prior_year"]
    in_simple = _simple_period_col(F.col("_mp"), preds)

    def _sum_if(cond) -> F.Column:
        return F.coalesce(
            F.sum(F.when(cond, F.col("revenue"))), F.lit(0)
        ).cast(MONEY)

    def _cnt_if(cond) -> F.Column:
        return F.coalesce(
            F.sum(F.when(cond, F.col("txn_count"))), F.lit(0)
        ).cast("long")

    agg = df.groupBy("state").agg(
        _sum_if(in_simple).alias("_rev_simple"),
        _cnt_if(in_simple).alias("_cnt_simple"),
        _sum_if(in_cur).alias("_rev_cur"),
        _cnt_if(in_cur).alias("_cnt_cur"),
        _sum_if(in_prior).alias("_rev_prior"),
        _cnt_if(in_prior).alias("_cnt_prior"),
        F.first("_mp").alias("_mp"),
    )
    is_cop = F.col("_mp") == "current_or_prior"
    return agg.select(
        "state",
        F.when(is_cop, F.greatest("_rev_cur", "_rev_prior"))
        .otherwise(F.col("_rev_simple"))
        .alias("revenue"),
        F.when(is_cop, F.greatest("_cnt_cur", "_cnt_prior"))
        .otherwise(F.col("_cnt_simple"))
        .alias("txn_count"),
    )


def check_nexus(
    activity: DataFrame,
    dims: Dims,
    physical_states: set[str] | None = None,
) -> DataFrame:
    """Nexus status per state from an activity rollup with columns
    (state, revenue, txn_count).

    Output mirrors NexusStatus (compliance.py:51-65): thresholds, percentage
    columns, nexus_types array, approaching flag, details string.
    """
    physical = sorted({s.upper() for s in (physical_states or set())})

    nt = dims.nexus_thresholds.select(
        F.col("state_code").alias("_nt_state"),
        "revenue_threshold",
        "transaction_threshold",
        "measurement_period",
    )
    df = (
        activity.join(F.broadcast(nt), F.col("state") == F.col("_nt_state"), "left")
        .drop("_nt_state")
        # Stash the miss flag NOW: later withColumns overwrite
        # revenue_threshold, and unresolved expressions would otherwise see
        # the overwritten column (lazy resolution).
        .withColumn("_no_threshold", F.col("revenue_threshold").isNull())
    )

    is_no_nexus_state = F.col("state").isin(*NO_NEXUS_STATES)
    no_threshold_data = F.col("_no_threshold")
    is_physical = (
        F.col("state").isin(*physical) if physical else F.lit(False)
    )

    rev_pct = F.when(
        F.col("revenue_threshold") > 0,
        (F.col("revenue").cast("double") / F.col("revenue_threshold").cast("double"))
        * 100,
    ).otherwise(F.lit(0.0))
    txn_pct = F.when(
        F.col("transaction_threshold").isNotNull(),
        F.col("txn_count").cast("double")
        / F.col("transaction_threshold").cast("double")
        * 100,
    )

    economic = (F.col("revenue") >= F.col("revenue_threshold")) | (
        F.col("transaction_threshold").isNotNull()
        & (F.col("txn_count") >= F.col("transaction_threshold"))
    )

    # Branch order follows check_nexus's early returns (compliance.py:258-287):
    # no-nexus state → missing threshold data → threshold evaluation.
    special = is_no_nexus_state | no_threshold_data

    has_nexus = (
        F.when(is_no_nexus_state, F.lit(False))
        .when(no_threshold_data, is_physical)
        .otherwise(is_physical | economic)
    )
    nexus_types = (
        F.when(is_no_nexus_state, F.array().cast("array<string>"))
        .when(
            no_threshold_data,
            F.when(is_physical, F.array(F.lit("physical"))).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .otherwise(
            F.filter(
                F.array(
                    F.when(is_physical, F.lit("physical")),
                    F.when(economic, F.lit("economic")),
                ),
                lambda x: x.isNotNull(),
            )
        )
    )

    # Details string (compliance.py:318-328); money with thousands commas.
    details = (
        F.when(
            is_no_nexus_state,
            F.concat(F.col("state"), F.lit(" has no sales tax")),
        )
        .when(no_threshold_data, F.lit("No economic nexus data available"))
        .otherwise(
            F.concat_ws(
                "; ",
                F.format_string(
                    "Revenue: $%s / $%s (%.1f%%)",
                    F.format_number(F.col("revenue"), 2),
                    F.format_number(F.col("revenue_threshold"), 2),
                    rev_pct,
                ),
                F.when(
                    F.col("transaction_threshold").isNotNull(),
                    F.format_string(
                        "Transactions: %d / %d (%.1f%%)",
                        F.col("txn_count"),
                        F.col("transaction_threshold"),
                        txn_pct,
                    ),
                ),
                F.concat(F.lit("Period: "), F.col("measurement_period")),
            )
        )
    )

    zero_money = F.lit(0).cast(MONEY)
    return (
        df.withColumn("has_nexus", has_nexus)
        .withColumn("nexus_types", nexus_types)
        .withColumn(
            "revenue_threshold",
            F.when(special, zero_money).otherwise(F.col("revenue_threshold")),
        )
        .withColumn(
            "transaction_threshold",
            F.when(special, F.lit(None).cast("int")).otherwise(
                F.col("transaction_threshold")
            ),
        )
        .withColumn(
            "revenue_pct_of_threshold",
            F.when(special, F.lit(0.0)).otherwise(rev_pct),
        )
        .withColumn(
            "transaction_pct_of_threshold",
            F.when(special, F.lit(None).cast("double")).otherwise(txn_pct),
        )
        .withColumn(
            "approaching_threshold",
            F.when(special, F.lit(False)).otherwise(
                ((rev_pct >= 80) | F.coalesce(txn_pct >= 80, F.lit(False)))
                & ~(is_physical | economic)
            ),
        )
        .withColumn("details", details)
        .select(
            F.col("state").alias("state_code"),
            "has_nexus",
            "nexus_types",
            F.col("revenue").alias("revenue_in_state"),
            F.col("txn_count").alias("transactions_in_state"),
            "revenue_threshold",
            "transaction_threshold",
            "revenue_pct_of_threshold",
            "transaction_pct_of_threshold",
            "approaching_threshold",
            "details",
        )
        .orderBy(F.desc("revenue_pct_of_threshold"), "state_code")
    )


def nexus_buckets(status: DataFrame) -> DataFrame:
    """P12/A9: bucket statuses into nexus / approaching / below + counts
    (report_generator.py:140-156)."""
    return status.withColumn(
        "bucket",
        F.when(F.col("has_nexus"), "nexus")
        .when(F.col("approaching_threshold"), "approaching")
        .otherwise("below"),
    )
