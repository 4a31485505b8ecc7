"""Semi-structured (JSON) column processing.

Event streams, API logs, and scraped corpora carry a free-form JSON
properties column next to the typed ones; at ingest scale the two
operations that matter are (a) FLATTENING the keys you know into typed
columns (``from_json`` with an explicit schema — never schema inference,
which is a second full scan and non-deterministic under drift), and
(b) PROFILING the keys you don't: per-key presence/type/range stats
whose drift is how a producer-side schema change is actually caught
(the JSON twin of ``profiling.profile_table``).

Everything here is row-local JVM expressions — JSON parsing inside
whole-stage codegen, no Python, no shuffle beyond the profile's final
≤ (groups × keys) aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_flatten(
    df: DataFrame, json_col: str, fields: dict[str, str]
) -> DataFrame:
    """Extract ``fields`` (name → Spark type string) from ``json_col``
    into typed top-level columns via ``from_json`` with the explicit
    schema — the production path for keys you know.  Unparseable rows
    and missing keys yield NULLs (permissive), matching the CSV
    source's quarantine-not-crash discipline."""
    schema = ", ".join(f"`{k}` {t}" for k, t in fields.items())
    parsed = F.from_json(F.col(json_col), schema)
    return df.withColumns(
        {name: parsed.getField(name) for name in fields}
    )


def _json_str(json_col: str) -> Column:
    """String value of the dynamic top-level key in the ``_key`` column
    (simple identifier keys — the '$.' path concat does not escape
    dots/quotes inside key names, documented limit of the dynamic-path
    profile)."""
    return F.expr(f"get_json_object(`{json_col}`, concat('$.', _key))")


def json_key_profile(
    df: DataFrame, json_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-(group, key) profile of a JSON column: row presence, non-null
    value count, exact distinct count of the string rendering, numeric
    min/max (NULL for non-numeric keys), and how many values parse as
    numbers — the drift report an ingest pipeline alerts on (a new key
    appears, a numeric key goes stringly, a range walks away).

    One explode over each row's OWN key set (``json_object_keys`` —
    row-local, no vocabulary pass), one aggregate over ≤ groups×keys
    cells; the exact distinct is the documented Expand cost, the same
    trade as profile_table.  Deterministic: counts, min/max of exact
    doubles, string keys."""
    exploded = df.select(
        *group_cols,
        F.explode(F.json_object_keys(F.col(json_col))).alias("_key"),
        F.col(json_col),
    ).select(
        *group_cols,
        "_key",
        _json_str(json_col).alias("_v"),
    )
    num = F.expr("try_cast(_v AS double)")
    return (
        exploded.groupBy(*group_cols, F.col("_key").alias("json_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("_v").alias("n_vals"),
            F.countDistinct("_v").alias("n_distinct"),
            F.count(num).alias("n_numeric"),
            F.min(num).alias("min_num"),
            F.max(num).alias("max_num"),
        )
    )
