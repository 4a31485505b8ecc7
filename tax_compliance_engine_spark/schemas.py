"""Declared schemas for fact and dimension tables.

Money is DECIMAL(18,2); rates are DECIMAL(11,6) (wide enough to hold a
combined state+local rate with headroom).  Explicit schemas everywhere — the
semantics require knowing ``amount`` is decimal and ``transaction_date`` is a
date, so ``inferSchema`` is never used (reference CSV contract:
/root/reference/README.md:149-161, parsed at cli.py:32-67).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MONEY = DecimalType(18, 2)
RATE = DecimalType(11, 6)

# Fact: one sales transaction (reference Transaction, calculator.py:28-57 +
# tax_paid carried alongside per cli.py:32-67).
TXN_SCHEMA = StructType(
    [
        StructField("transaction_id", StringType(), False),
        StructField("transaction_date", DateType(), False),
        StructField("amount", MONEY, False),
        StructField("state", StringType(), False),
        StructField("city", StringType(), True),
        StructField("item_category", StringType(), True),
        StructField("tax_paid", MONEY, True),
        StructField("exemption_certificate", StringType(), True),
        StructField("customer_type", StringType(), True),
        StructField("pricing_model", StringType(), True),
    ]
)

# CSV wire schema (README.md:149-161): subset of TXN_SCHEMA columns, raw strings
# for permissive parsing; the source normalizes and casts.
TXN_CSV_SCHEMA = StructType(
    [
        StructField("transaction_id", StringType(), True),
        StructField("transaction_date", StringType(), True),
        StructField("amount", StringType(), True),
        StructField("state", StringType(), True),
        StructField("city", StringType(), True),
        StructField("item_category", StringType(), True),
        StructField("tax_paid", StringType(), True),
        StructField("_corrupt_record", StringType(), True),
    ]
)

STATE_RATES_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("state_name", StringType(), False),
        StructField("base_rate", RATE, False),
        StructField("has_local_taxes", BooleanType(), False),
        StructField("max_local_rate", RATE, False),
        StructField("avg_combined_rate", RATE, False),
        StructField("notes", StringType(), True),
    ]
)

LOCAL_RATES_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("jurisdiction", StringType(), False),
        StructField("county", StringType(), True),
        StructField("rate", RATE, False),
        StructField("jurisdiction_type", StringType(), True),
    ]
)

STATE_EXEMPTIONS_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("category", StringType(), False),
    ]
)

CATEGORY_ALIASES_SCHEMA = StructType(
    [
        StructField("alias", StringType(), False),
        StructField("category", StringType(), False),
    ]
)

NEXUS_THRESHOLDS_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("revenue_threshold", MONEY, False),
        StructField("transaction_threshold", IntegerType(), True),
        StructField("measurement_period", StringType(), False),
    ]
)

FILING_DUE_DAY_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("due_day", IntegerType(), False),
    ]
)

SOL_YEARS_SCHEMA = StructType(
    [
        StructField("state_code", StringType(), False),
        StructField("years", IntegerType(), False),
    ]
)

DEFAULT_DUE_DAY = 20  # compliance.py:152-168
DEFAULT_SOL_YEARS = 3  # refund_analyzer.py:71-101
RECOVERY_RATE = "0.85"  # refund_analyzer.py:95
NO_NEXUS_STATES = ("DE", "MT", "NH", "OR")  # compliance.py:149
