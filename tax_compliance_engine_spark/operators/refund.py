"""Refund / overpayment analysis as a composition over the tax plan.

Re-expresses /root/reference/tax_engine/refund_analyzer.py (analyze_transaction
:134-189, analyze_batch :191-252, generate_refund_claims :254-297, quick_scan
:299-314) as DataFrame transformations layered on ``tax.calculate_tax``:

  tax plan → overpayment expr + reason CASE + SOL broadcast join → filter(>0)
  → aggregations (global / by state / by reason-prefix) and per-state claims.

SOL arithmetic uses ``add_months`` — the reference's ``date(y±n, m, d)``
*raises* on Feb 29 of a non-leap target year (refund_analyzer.py:129-130);
we adopt clamping (documented divergence, SURVEY §2.8 F8).

Scale note: every aggregation here is a single keyed shuffle off one cached
overpayments DataFrame; claims avoid the nested ``collect_list`` by default
(the one skew/memory hazard at 100 TB — enable ``include_records`` only for
report-sized outputs).
"""

from __future__ import annotations

import datetime as dt
import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dims import Dims
from ..schemas import DEFAULT_SOL_YEARS, MONEY, RECOVERY_RATE
from . import tax


@functools.lru_cache(maxsize=8)
def _overpay_cols(as_of: dt.date) -> dict[str, Column]:
    """Memoized Column trees of ``analyze_overpayments`` (keyed by the one
    parameter that enters them) — the ``tax._calc_cols`` rationale: pure
    name-based expressions, ~0.3 s of py4j round-trips per build."""
    overpayment = F.round(F.col("tax_paid") - F.col("tax_amount"), 2).cast(MONEY)

    # Reason derivation (refund_analyzer.py:155-170).  actual rate =
    # float(tax_paid / amount); guard amount=0 (the reference would raise
    # DivisionByZero there — we emit the generic reason instead).
    actual_rate_pct = (F.col("tax_paid") / F.col("amount")).cast("double") * 100
    expected_rate_pct = F.col("effective_rate") * 100
    is_rate_mismatch = (
        (F.col("tax_paid") > F.col("tax_amount"))
        & (F.col("tax_amount") > 0)
        & (F.col("amount") != 0)
    )
    is_no_tax_collected = (F.col("tax_paid") > F.col("tax_amount")) & (
        F.col("tax_amount") <= 0
    )
    reason = (
        F.when(
            F.col("is_exempt"),
            F.concat(F.lit("Exempt transaction taxed: "), F.col("exemption_reason")),
        )
        .when(
            is_rate_mismatch,
            F.format_string(
                "Rate mismatch: paid %.4f%%, correct rate %.4f%%",
                actual_rate_pct,
                expected_rate_pct,
            ),
        )
        .when(is_no_tax_collected, F.lit("Tax collected in no-tax jurisdiction"))
        .otherwise(F.lit("Overpayment detected"))
    )
    # Invariant (pinned by tests): reason_prefix == substring_index(reason,
    # ':', 1) — every arm's text before the first ':' is a constant.
    static_prefix = (
        F.when(F.col("is_exempt"), F.lit("Exempt transaction taxed"))
        .when(is_rate_mismatch, F.lit("Rate mismatch"))
        .when(is_no_tax_collected, F.lit("Tax collected in no-tax jurisdiction"))
        .otherwise(F.lit("Overpayment detected"))
    )

    cutoff = F.add_months(F.lit(as_of), -12 * F.col("sol_years"))
    sol_date = F.add_months(F.col("transaction_date"), 12 * F.col("sol_years"))
    return {
        "overpayment": overpayment,
        "reason": reason,
        "reason_prefix": static_prefix,
        "refund_eligible": F.col("transaction_date") >= cutoff,
        "statute_of_limitations_date": sol_date,
    }


def analyze_overpayments(
    txns: DataFrame, dims: Dims, as_of: dt.date, include_reason: bool = True
) -> DataFrame:
    """Per-transaction overpayment records (analyze_transaction,
    refund_analyzer.py:134-189).  Input must be normalized transactions with a
    ``tax_paid`` column; output keeps only rows with overpayment > 0 (P7).

    ``include_reason=False`` skips the fully-formatted ``reason`` string and
    emits only ``reason_prefix``.  The prefix (text before the first ':',
    F11) is statically determined by the branch conditions, so downstream
    aggregations don't pay for per-row percent formatting + wide decimal
    division (~4× on the record scan); reports that show the prose keep the
    default."""
    results = tax.calculate_tax(txns, dims)
    cols = _overpay_cols(as_of)

    # Statute of limitations (refund_analyzer.py:124-132) via broadcast J7 +
    # coalesce default.
    sol = dims.sol_years.select(
        F.col("state_code").alias("_sol_state"), F.col("years").alias("_sol_years")
    )
    enriched = (
        results.join(F.broadcast(sol), F.col("state") == F.col("_sol_state"), "left")
        .withColumn(
            "sol_years", F.coalesce("_sol_years", F.lit(DEFAULT_SOL_YEARS))
        )
        .drop("_sol_state", "_sol_years")
    )

    reason_cols = (["reason"] if include_reason else []) + ["reason_prefix"]
    out = (
        enriched.withColumn("overpayment", cols["overpayment"])
        .filter(F.col("overpayment") > 0)
        .withColumn("reason_prefix", cols["reason_prefix"])
        .withColumn("refund_eligible", cols["refund_eligible"])
        .withColumn(
            "statute_of_limitations_date",
            cols["statute_of_limitations_date"],
        )
    )
    if include_reason:
        out = out.withColumn("reason", cols["reason"])
    return out.select(
        "transaction_id",
        "transaction_date",
        "state",
        "city",
        F.col("amount").alias("sale_amount"),
        "tax_paid",
        F.col("tax_amount").alias("tax_owed"),
        "overpayment",
        *reason_cols,
        "refund_eligible",
        "statute_of_limitations_date",
        "sol_years",
    )


def reason_prefix() -> F.Column:
    """Breakdown key: text before the first ':' (refund_analyzer.py:219, 274),
    precomputed as a static column by analyze_overpayments."""
    return F.col("reason_prefix")


def refund_summary(records: DataFrame, total_transactions_reviewed: int | None = None):
    """Global refund rollup (analyze_batch, refund_analyzer.py:202-251).

    Returns (summary_df, state_breakdown_df, reason_breakdown_df, warnings_df).
    ``estimated_recovery`` = round(eligible_overpayment * 0.85, 2)
    (refund_analyzer.py:95, 248-250).
    """
    records = records.cache()
    summary = records.agg(
        F.count("*").cast("long").alias("overpayment_count"),
        F.sum("overpayment").cast(MONEY).alias("total_overpayment"),
        F.min(F.when(F.col("refund_eligible"), F.col("transaction_date"))).alias(
            "oldest_eligible"
        ),
        F.max(F.when(F.col("refund_eligible"), F.col("transaction_date"))).alias(
            "newest_eligible"
        ),
        F.round(
            F.sum(
                F.when(F.col("refund_eligible"), F.col("overpayment")).otherwise(
                    F.lit(0)
                )
            )
            * F.lit(RECOVERY_RATE).cast("decimal(3,2)"),
            2,
        )
        .cast(MONEY)
        .alias("estimated_recovery"),
    )
    if total_transactions_reviewed is not None:
        summary = summary.withColumn(
            "total_transactions_reviewed", F.lit(total_transactions_reviewed)
        )

    state_bd = (
        records.groupBy("state")
        .agg(F.sum("overpayment").cast(MONEY).alias("amount"))
        .orderBy(F.desc("amount"), "state")
    )
    reason_bd = (
        records.groupBy(reason_prefix().alias("reason"))
        .agg(F.sum("overpayment").cast(MONEY).alias("amount"))
        .orderBy(F.desc("amount"), "reason")
    )
    warnings = records.filter(~F.col("refund_eligible")).select(
        F.format_string(
            "Transaction %s in %s is past statute of limitations ($%.2f)",
            F.col("transaction_id"),
            F.col("state"),
            F.col("overpayment").cast("double"),
        ).alias("warning")
    )
    return summary, state_bd, reason_bd, warnings


_RECORD_COLS = (
    "transaction_id",
    "transaction_date",
    "sale_amount",
    "tax_paid",
    "tax_owed",
    "overpayment",
    "reason",
)


def refund_claims(
    records: DataFrame,
    include_records: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-state refund claims over eligible records (generate_refund_claims,
    refund_analyzer.py:254-297), sorted by total requested desc (O7).

    ``include_records`` nests the full record structs via collect_list — fine
    for report-sized output, deliberately off by default at scale (SURVEY §7
    hard-point 6).

    ``salt_buckets`` enables the skew-safe two-level aggregation: stage 1
    groups by (state, hash(transaction_id) % salt_buckets) so a hot state
    (CA/TX at 100 TB) fans out over `salt_buckets` reducers with map-side
    partial aggregation; stage 2 merges the ≤ 51 × salt_buckets partials on
    the state key alone.  Results are identical to the one-level plan: sums/
    counts/min/max merge associatively, reason sets union then sort, and
    collect_list order was never guaranteed to begin with."""
    eligible = records.filter(F.col("refund_eligible"))
    if salt_buckets is None:
        aggs = [
            F.min("transaction_date").alias("claim_period_start"),
            F.max("transaction_date").alias("claim_period_end"),
            F.sum("overpayment").cast(MONEY).alias("total_refund_requested"),
            F.count("*").cast("long").alias("transaction_count"),
            F.sort_array(F.collect_set(reason_prefix())).alias(
                "supporting_reasons"
            ),
            F.first("sol_years").alias("sol_years"),
        ]
        if include_records:
            aggs.append(
                F.collect_list(F.struct(*_RECORD_COLS)).alias("records")
            )
        claims = eligible.groupBy(F.col("state").alias("state_code")).agg(*aggs)
    else:
        salt = F.pmod(F.xxhash64("transaction_id"), F.lit(salt_buckets))
        partial_aggs = [
            F.min("transaction_date").alias("_start"),
            F.max("transaction_date").alias("_end"),
            F.sum("overpayment").cast(MONEY).alias("_total"),
            F.count("*").cast("long").alias("_n"),
            F.collect_set(reason_prefix()).alias("_reasons"),
            F.first("sol_years").alias("sol_years"),
        ]
        if include_records:
            partial_aggs.append(
                F.collect_list(F.struct(*_RECORD_COLS)).alias("_records")
            )
        partials = eligible.groupBy(
            F.col("state").alias("state_code"), salt.alias("_salt")
        ).agg(*partial_aggs)
        merge_aggs = [
            F.min("_start").alias("claim_period_start"),
            F.max("_end").alias("claim_period_end"),
            F.sum("_total").cast(MONEY).alias("total_refund_requested"),
            F.sum("_n").alias("transaction_count"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("_reasons")))
            ).alias("supporting_reasons"),
            F.first("sol_years").alias("sol_years"),
        ]
        if include_records:
            merge_aggs.append(
                F.flatten(F.collect_list("_records")).alias("records")
            )
        claims = partials.groupBy("state_code").agg(*merge_aggs)
    return claims.withColumn(
        "filing_notes",
        F.format_string(
            "Refund claim for %d transactions. SOL: %d years from transaction "
            "date. Total requested: $%s",
            F.col("transaction_count"),
            F.col("sol_years"),
            F.format_number(F.col("total_refund_requested"), 2),
        ),
    ).orderBy(F.desc("total_refund_requested"), "state_code")


def quick_scan(
    txns: DataFrame,
    dims: Dims,
    as_of: dt.date,
    minimum_overpayment: str = "1.00",
) -> DataFrame:
    """Threshold scan (refund_analyzer.py:299-314): despite the name it is the
    full per-row analysis plus a filter — in Spark literally the same plan."""
    return analyze_overpayments(txns, dims, as_of).filter(
        F.col("overpayment") >= F.lit(minimum_overpayment).cast(MONEY)
    )
