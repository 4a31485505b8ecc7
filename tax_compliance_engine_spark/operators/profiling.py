"""Table profiling: per-column data-quality statistics in ONE pass.

The monitoring op every ingest pipeline runs between loads — null
fractions creeping up, distinct counts collapsing, min/max drifting out
of domain are how upstream breakage is actually caught.  Spark ships
`df.summary()` for floats-on-the-driver exploration; this operator is
the PLAN-level version: deterministic, engine-portable values (strings
and integers only) that the DuckDB twin reproduces bit-for-bit, shaped
one row per column so the profile can be stored, diffed, and alerted on
like any other table.

Scale shape: a single global aggregation computes every column's
count / distinct / min / max together (one pass over the data; the
multi-count_distinct lowers to one Expand — rows × |cols| intermediate,
the documented price of EXACT distincts).  The one-row result is
reshaped to per-column rows by an in-plan posexplode — never a driver
loop.  For 100 TB text columns where an exact distinct is not worth its
shuffle, profile the cheap columns here and pair the heavy ones with
`corpus.distinct_sketch` (deterministic KMV estimate, no exact
distinct)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nonnull, n_distinct,
    min_val, max_val) — min/max computed in the column's native order
    THEN cast to string (casting first would rank '10' < '9'); distinct
    counts are exact and ignore NULLs (count_distinct semantics on both
    engines)."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"_nn{i}"),
            F.count_distinct(F.col(c)).alias(f"_nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn{i}").alias("n_nonnull"),
                F.col(f"_nd{i}").alias("n_distinct"),
                F.col(f"_mn{i}").alias("min_val"),
                F.col(f"_mx{i}").alias("max_val"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: one row per QI
    combination with its group size and whether it meets the ``k``
    threshold — rows in sub-k groups are re-identifiable by joining the
    quasi-identifiers against outside data, the screen a training-data
    release runs next to PII scrubbing (scrubbing removes direct
    identifiers; this catches the indirect ones).

    One exact groupBy over the QI key (map-side combinable counts);
    NULL QI values form their own group, like any grouping."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) >= k).alias("is_k_anonymous"),
    )


def suppress_small_groups(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity ENFORCEMENT by suppression: drop every row whose QI
    combination has fewer than ``k`` members — the remaining dataset is
    k-anonymous w.r.t. ``qi_cols`` by construction.

    Scale shape: a map-side-combinable groupBy count + a LEFT SEMI join
    back on the compliant key set, NOT a window count — a window
    serializes each QI group through one task, so one dominant
    combination (the common failure mode of a skewed corpus) would
    bottleneck the whole pass; the join spreads it.  The semi join uses
    NULL-SAFE equality so null-QI groups suppress by the same rule they
    group by (a plain equijoin would silently drop every null-QI row
    regardless of group size)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keep = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_ka_n"))
        .filter(F.col("_ka_n") >= k)
        .select(*[F.col(c).alias(f"_ka_{c}") for c in qi_cols])
    )
    cond = None
    for c in qi_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_ka_{c}"))
        cond = clause if cond is None else cond & clause
    return df.join(keep, cond, "left_semi")


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_threshold: int,
) -> DataFrame:
    """ℓ-DIVERSITY audit (Machanavajjhala et al. 2007) — the screen
    k-anonymity alone misses: a group can be large (k-compliant) yet
    have every member sharing one sensitive value, so membership alone
    discloses it (the homogeneity attack).  Per QI combination: group
    size, the number of distinct sensitive values, and the ≥ℓ flag.

    NULL handling mirrors the k-anonymity report's discipline on both
    axes: NULL-valued QI groups are real groups (groupBy keeps them),
    and a NULL sensitive value counts as ONE distinct value (an absent
    diagnosis is itself disclosable — dropping it would overstate
    diversity exactly where the audit matters).

    Scale shape: distinct counted from per-(QI, sensitive) partials —
    one map-side-combinable aggregation then a ≤|groups|-row rollup,
    never a count_distinct shuffle of raw rows."""
    if l_threshold <= 0:
        raise ValueError(f"l must be positive, got {l_threshold}")
    per_val = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("_lv_s")
    ).agg(F.count(F.lit(1)).alias("_lv_n"))
    return (
        per_val.groupBy(*qi_cols)
        .agg(
            F.sum("_lv_n").cast("long").alias("group_size"),
            F.count(F.lit(1)).cast("long").alias("n_sensitive_distinct"),
        )
        .select(
            *qi_cols,
            "group_size",
            "n_sensitive_distinct",
            (F.col("n_sensitive_distinct") >= l_threshold).alias(
                "is_l_diverse"
            ),
        )
    )


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int
) -> DataFrame:
    """Audit + enforcement in one report: per QI combination, the group
    size, the ≥k flag, and ``n_kept`` — how many of the group's rows a
    ``suppress_small_groups`` release would retain (= group_size for
    compliant groups, 0 for suppressed ones).

    The survivor count is rejoined to the audit with NULL-SAFE equality
    on every QI column, mirroring the suppression rule itself: a
    NULL-valued QI group that survives must report its kept count — a
    plain equijoin never matches NULL keys and would report n_kept=0
    for exactly the groups whose null-handling the audit exists to
    certify."""
    audit = k_anonymity_audit(df, qi_cols, k)
    survivors = suppress_small_groups(df, qi_cols, k)
    kept = survivors.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    kept = kept.select(
        *[F.col(c).alias(f"_nk_{c}") for c in qi_cols], "n_kept"
    )
    cond = None
    for c in qi_cols:
        clause = audit[c].eqNullSafe(F.col(f"_nk_{c}"))
        cond = clause if cond is None else cond & clause
    return audit.join(kept, cond, "left").select(
        *[audit[c] for c in qi_cols],
        "group_size",
        "is_k_anonymous",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
