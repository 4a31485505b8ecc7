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
