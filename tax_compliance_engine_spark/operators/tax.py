"""Tax calculation as one declarative Catalyst plan.

Re-expresses the reference's per-row decision procedure
(/root/reference/tax_engine/calculator.py:132-256) as:

  broadcast joins (state_rates ⋈, category_aliases ⋈, state_exemptions ⋈,
  local_rates ⋈)  →  a single chained CASE WHEN column tree

Branch order is semantics (calculator.py:164-209): unknown state → no-tax
state → exemption (customer type → certificate → category) → rate math.
Per-component HALF_UP rounding at 2dp (calculator.py:116-118, 236-238):
state_tax and local_tax are rounded *separately* then summed —
sum-of-rounded ≠ rounded-sum, and tests pin this.

Everything is built-in Column expressions: whole-stage codegen end-to-end,
no Python on the executor path.  At 100 TB the only wide exchange in this
plan is whatever aggregation the caller adds downstream — the four dim joins
are all broadcasts.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dims import Dims
from ..schemas import MONEY, RATE


def normalize_transactions(df: DataFrame) -> DataFrame:
    """Boundary normalization (reference cli.py:47-67).

    Upper-cases state, null-ifies empty optional strings, defaults tax_paid
    to 0, customer_type to 'retail', pricing_model to 'exclusive'.
    Missing optional columns are added as nulls so downstream plans can rely
    on the full TXN_SCHEMA surface.
    """
    for col_name in (
        "city",
        "item_category",
        "tax_paid",
        "exemption_certificate",
        "customer_type",
        "pricing_model",
    ):
        if col_name not in df.columns:
            df = df.withColumn(col_name, F.lit(None).cast("string"))
    # Reference boundary semantics (cli.py:47-67): state is trim+upper'd, but
    # optional strings only go through `or None` — empty string → NULL, inner
    # whitespace preserved (trimming happens at the category-alias lookup, not
    # here).  One withColumns call over the memoized trees (replacing an
    # existing column preserves its position, so the schema is identical to
    # the old per-column chain).
    return df.withColumns(_norm_cols())


@functools.lru_cache(maxsize=1)
def _norm_cols() -> dict[str, Column]:
    """Memoized normalization trees (see ``_calc_cols`` for the
    rationale)."""
    blank_to_null = lambda c: F.nullif(F.col(c), F.lit(""))  # noqa: E731
    return {
        "state": F.upper(F.trim("state")),
        "city": blank_to_null("city"),
        "item_category": blank_to_null("item_category"),
        "exemption_certificate": blank_to_null("exemption_certificate"),
        "tax_paid": F.coalesce(
            F.col("tax_paid").cast(MONEY), F.lit(0).cast(MONEY)
        ),
        "customer_type": F.coalesce("customer_type", F.lit("retail")),
        "pricing_model": F.coalesce("pricing_model", F.lit("exclusive")),
    }


# Memoized per-Dims projected+broadcast-hinted dim frames: the four
# select projections cost ~0.2 s of py4j round-trips per plan build and
# the Dims frames are session-cached, so project them once per Dims
# instance.  Keyed by id(state_rates); the VALUE pins the key's
# referent (first tuple slot), so the id can never be recycled onto a
# different DataFrame — a rebuilt Dims (new session, or a bench
# isolation reload) always gets fresh entries, and stale ones just
# linger as tiny plan objects.
_DIM_JOIN_FRAMES: dict[int, tuple] = {}


def _dim_join_frames(
    dims: Dims,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    key = id(dims.state_rates)
    cached = _DIM_JOIN_FRAMES.get(key)
    if cached is not None:
        return cached[1:]
    sr = F.broadcast(
        dims.state_rates.select(
            F.col("state_code").alias("_sr_state"),
            "state_name",
            "base_rate",
            "has_local_taxes",
            "avg_combined_rate",
        )
    )
    ca = F.broadcast(
        dims.category_aliases.select(
            F.col("alias").alias("_ca_alias"),
            F.col("category").alias("mapped_category"),
        )
    )
    ex = F.broadcast(
        dims.state_exemptions.select(
            F.col("state_code").alias("_ex_state"),
            F.col("category").alias("_ex_category"),
            F.lit(True).alias("category_exempt"),
        )
    )
    lr = F.broadcast(
        dims.local_rates.select(
            F.col("state_code").alias("_lr_state"),
            F.lower("jurisdiction").alias("_lr_city"),
            F.col("rate").alias("city_local_rate"),
        )
    )
    _DIM_JOIN_FRAMES[key] = (dims.state_rates, sr, ca, ex, lr)
    return sr, ca, ex, lr


@functools.lru_cache(maxsize=1)
def _join_conds() -> tuple[Column, Column, Column, Column]:
    """Memoized join conditions — name-based ``F.col`` references resolve
    identically to the old DataFrame-bound ones (every referenced name is
    unique on the joined side)."""
    return (
        F.col("state") == F.col("_sr_state"),
        F.lower(F.trim(F.col("item_category"))) == F.col("_ca_alias"),
        (F.col("state") == F.col("_ex_state"))
        & (F.col("mapped_category") == F.col("_ex_category")),
        (F.col("state") == F.col("_lr_state"))
        & (F.lower(F.col("city")) == F.col("_lr_city")),
    )


def _join_dims(txns: DataFrame, dims: Dims) -> DataFrame:
    """The four broadcast dim joins (SURVEY §2.3 J1/J2/P2/J3)."""
    sr, ca, ex, lr = _dim_join_frames(dims)
    c_sr, c_ca, c_ex, c_lr = _join_conds()
    return (
        txns.join(sr, c_sr, "left")
        .join(ca, c_ca, "left")
        .join(ex, c_ex, "left")
        .join(lr, c_lr, "left")
        .drop("_sr_state", "_ca_alias", "_ex_state", "_ex_category", "_lr_state", "_lr_city")
    )


def _round2(c: Column) -> Column:
    """HALF_UP to cents (calculator.py:116-118); Spark rounds decimals HALF_UP."""
    return F.round(c, 2).cast(MONEY)


@functools.lru_cache(maxsize=1)
def _calc_cols() -> dict[str, Column]:
    """Memoized result-column tree of ``calculate_tax`` — every
    expression below is a pure function of input column NAMES (no
    DataFrame-bound references), i.e. an immutable unresolved tree
    reusable across any number of plans.  Building it costs ~0.6 s of
    py4j round-trips (the same per-plan-construction driver tax the
    webops ``_idn_fenced_cached`` family closed in r14); one cached
    build amortizes it across every tax/refund/nexus/report plan in
    the process.  (The cache lives as long as the py4j gateway, which
    outlives SparkSession restarts.)"""
    unknown_state = F.col("state_name").isNull()
    zero = F.lit(0).cast(RATE)
    no_tax_state = (F.col("base_rate") == zero) & (~F.col("has_local_taxes"))

    exempt_customer = F.col("customer_type").isin("wholesale", "exempt")
    exempt_cert = F.col("exemption_certificate").isNotNull()
    exempt_category = F.coalesce(F.col("category_exempt"), F.lit(False))

    # Exemption reason follows _resolve_exemption's arm order
    # (calculator.py:141-153): customer type → certificate → category.
    resolve_reason = (
        F.when(exempt_customer, F.concat(F.lit("Customer type: "), "customer_type"))
        .when(exempt_cert, F.concat(F.lit("Exemption cert: "), "exemption_certificate"))
        .when(
            exempt_category,
            F.concat(F.col("state"), F.lit(" exempts "), "mapped_category"),
        )
    )
    resolved_exempt = exempt_customer | exempt_cert | exempt_category

    # Rate resolution ladder (calculator.py:211-224): exact city match →
    # average-local fallback (both for unknown city and NULL city, iff the
    # state has local taxes) → zero.
    avg_local = F.greatest(
        (F.col("avg_combined_rate") - F.col("base_rate")).cast(RATE), zero
    )
    local_rate = (
        F.when(F.col("city_local_rate").isNotNull(), F.col("city_local_rate"))
        .when(F.col("has_local_taxes"), avg_local)
        .otherwise(zero)
        .cast(RATE)
    )
    combined_rate = (F.col("base_rate") + local_rate).cast(RATE)

    # Tax-inclusive back-out (calculator.py:229-232); exclusive passes through.
    taxable_computed = F.when(
        F.col("pricing_model") == "inclusive",
        _round2(F.col("amount") / (F.lit(1) + combined_rate)),
    ).otherwise(F.col("amount"))

    # Master CASE tree — branch order is the reference's early-return order.
    exempt_like = no_tax_state | resolved_exempt  # after unknown_state arm

    money_zero = F.lit("0.00").cast(MONEY)
    state_tax = F.when(unknown_state | exempt_like, money_zero).otherwise(
        _round2(taxable_computed * F.col("base_rate"))
    )
    local_tax = F.when(unknown_state | exempt_like, money_zero).otherwise(
        _round2(taxable_computed * local_rate)
    )

    taxable_amount = F.when(unknown_state | exempt_like, F.col("amount")).otherwise(
        taxable_computed
    )

    is_exempt = F.when(unknown_state, F.lit(False)).otherwise(exempt_like)

    exemption_reason = (
        F.when(unknown_state, F.lit(""))
        .when(no_tax_state, F.concat(F.col("state_name"), F.lit(" has no sales tax")))
        .when(resolved_exempt, resolve_reason)
        .otherwise(F.lit(""))
    )

    effective_rate = (
        F.when(unknown_state | exempt_like, F.lit(0.0))
        .otherwise(combined_rate.cast("double"))
        .alias("effective_rate")
    )

    warnings = (
        F.when(
            unknown_state,
            F.array(F.concat(F.lit("Unknown state code: "), F.col("state"))),
        )
        .when(exempt_like, F.array().cast("array<string>"))
        .when(
            F.col("city").isNull() & F.col("has_local_taxes"),
            F.array(
                F.concat(
                    F.lit("No city specified for "),
                    F.col("state"),
                    F.lit("; used average local rate"),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
    )

    return {
        "taxable_amount": taxable_amount,
        "state_tax": state_tax,
        "local_tax": local_tax,
        "tax_amount": (state_tax + local_tax).cast(MONEY),
        "effective_rate": effective_rate,
        "is_exempt": is_exempt,
        "exemption_reason": exemption_reason,
        "warnings": warnings,
    }


def calculate_tax(txns: DataFrame, dims: Dims) -> DataFrame:
    """Per-transaction tax results (reference TaxCalculator.calculate,
    calculator.py:157-256) over an already-normalized transactions DataFrame.

    Adds: taxable_amount, state_tax, local_tax, tax_amount, effective_rate,
    is_exempt, exemption_reason, warnings — preserving all input columns.
    The result columns come from the memoized ``_calc_cols`` tree and are
    attached in ONE ``withColumns`` call (a chained ``withColumn`` per
    column wraps the plan — and pays an analyzer pass — eight times).
    """
    return (
        _join_dims(txns, dims)
        .withColumns(_calc_cols())
        .drop(
            "state_name",
            "base_rate",
            "has_local_taxes",
            "avg_combined_rate",
            "mapped_category",
            "category_exempt",
            "city_local_rate",
        )
    )


def batch_totals(results: DataFrame) -> DataFrame:
    """Global batch aggregation (calculate_batch, calculator.py:258-303).

    ``total_exempt`` sums the *taxable_amount* of exempt rows
    (calculator.py:281-283) — a reference quirk preserved on purpose.
    One-row result; map-side partial aggregation, no keyed shuffle.
    """
    return results.agg(
        F.count("*").alias("transaction_count"),
        F.sum("taxable_amount").cast(MONEY).alias("total_taxable"),
        F.sum("tax_amount").cast(MONEY).alias("total_tax"),
        F.sum(F.when(F.col("is_exempt"), F.col("taxable_amount")).otherwise(F.lit(0)))
        .cast(MONEY)
        .alias("total_exempt"),
        F.sum(F.when(F.col("is_exempt"), 1).otherwise(0))
        .cast("int")
        .alias("exempt_count"),
    )


def state_breakdown(results: DataFrame) -> DataFrame:
    """Per-state tax totals (calculator.py:285-288)."""
    return (
        results.groupBy("state")
        .agg(F.sum("tax_amount").cast(MONEY).alias("total_tax"))
        .orderBy("state")
    )


def state_summary(results: DataFrame) -> DataFrame:
    """Per-state liability summary (report_generator.py:83-108): counts,
    taxable/tax/exempt totals, effective rate with div-0 guard."""
    return (
        results.groupBy("state")
        .agg(
            F.count("*").alias("transaction_count"),
            F.sum("taxable_amount").cast(MONEY).alias("total_taxable"),
            F.sum("tax_amount").cast(MONEY).alias("total_tax"),
            F.sum(
                F.when(F.col("is_exempt"), F.col("taxable_amount")).otherwise(F.lit(0))
            )
            .cast(MONEY)
            .alias("exempt_amount"),
        )
        .withColumn(
            "effective_rate",
            F.when(
                F.col("total_taxable") > 0,
                (F.col("total_tax").cast("double") / F.col("total_taxable").cast("double")),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("state")
    )


def use_tax(
    txns: DataFrame,
    dims: Dims,
    tax_already_paid_col: str = "tax_paid",
) -> DataFrame:
    """Use-tax with credit clamp (calculator.py:305-345):
    credit = min(tax_already_paid, tax); net = round(tax - credit)."""
    results = calculate_tax(txns, dims)
    credit = F.least(F.col(tax_already_paid_col), F.col("tax_amount")).cast(MONEY)
    return (
        results.withColumn("credit_applied", credit)
        .withColumn("net_use_tax", _round2(F.col("tax_amount") - credit))
        .withColumn(
            "warnings",
            F.when(
                credit > 0,
                F.array(
                    F.concat(
                        F.lit("Credit applied for $"),
                        F.format_number(credit, 2),
                        F.lit(" tax already paid"),
                    )
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
