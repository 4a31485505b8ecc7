"""k-anonymity audit + suppression unit pins (the swept composite gates
the happy path; here: null QI values and audit/suppress consistency)."""

from __future__ import annotations

from tax_compliance_engine_spark.operators.profiling import (
    k_anonymity_audit,
    suppress_small_groups,
)

ROWS = [
    (1, "en", "a"),
    (2, "en", "a"),
    (3, "en", "a"),
    (4, "de", "b"),  # singleton -> suppressed
    (5, None, "c"),
    (6, None, "c"),
    (7, None, "c"),  # null-QI group of 3: kept at k=3, grouped as a value
    (8, None, "d"),  # null-lang singleton -> suppressed
]
SCHEMA = "doc_id long, lang string, src string"


def test_audit_counts_null_qi_as_group(spark):
    audit = {
        (r.lang, r.src): (r.group_size, r.is_k_anonymous)
        for r in k_anonymity_audit(
            spark.createDataFrame(ROWS, SCHEMA), ["lang", "src"], k=3
        ).collect()
    }
    assert audit[("en", "a")] == (3, True)
    assert audit[("de", "b")] == (1, False)
    assert audit[(None, "c")] == (3, True)
    assert audit[(None, "d")] == (1, False)


def test_suppress_keeps_null_qi_groups_by_size(spark):
    kept = sorted(
        r.doc_id
        for r in suppress_small_groups(
            spark.createDataFrame(ROWS, SCHEMA), ["lang", "src"], k=3
        ).collect()
    )
    # null-QI group of 3 survives; both singletons (incl. the null one) go
    assert kept == [1, 2, 3, 5, 6, 7]


def test_suppress_output_is_k_anonymous(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = suppress_small_groups(df, ["lang", "src"], k=3)
    audit = k_anonymity_audit(out, ["lang", "src"], k=3)
    assert audit.filter(~audit.is_k_anonymous).count() == 0


def test_report_null_qi_survivor_counts(spark):
    """k_anonymity_report rejoins survivor counts NULL-SAFELY: a
    NULL-QI group that survives suppression reports n_kept=group_size
    (a plain equijoin would report 0 for exactly those groups)."""
    from tax_compliance_engine_spark.operators.profiling import (
        k_anonymity_report,
    )

    rep = {
        (r.lang, r.src): (r.group_size, r.is_k_anonymous, r.n_kept)
        for r in k_anonymity_report(
            spark.createDataFrame(ROWS, SCHEMA), ["lang", "src"], k=3
        ).collect()
    }
    assert rep[(None, "c")] == (3, True, 3)  # null group kept, counted
    assert rep[(None, "d")] == (1, False, 0)  # null singleton suppressed
    assert rep[("en", "a")] == (3, True, 3)
    assert rep[("de", "b")] == (1, False, 0)


def test_l_diversity_homogeneity_and_nulls(spark):
    """ℓ-diversity pins: a large-but-homogeneous group fails (the
    attack k-anonymity misses), NULL sensitive values count as ONE
    distinct value, NULL QI groups are real groups, counts exact."""
    import pytest

    from tax_compliance_engine_spark.operators.profiling import (
        l_diversity_report,
    )

    rows = [
        # QI group ("en",): 4 rows, all sensitive "x" -> homogeneous
        (1, "en", "x"), (2, "en", "x"), (3, "en", "x"), (4, "en", "x"),
        # QI group ("de",): 3 rows, 2 distinct + NULL = 3 distinct
        (5, "de", "x"), (6, "de", "y"), (7, "de", None),
        # NULL-QI group: 2 rows, 2 distinct
        (8, None, "a"), (9, None, "b"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, s string")
    got = {
        r.lang: r
        for r in l_diversity_report(df, ["lang"], "s", l_threshold=2).collect()
    }
    assert (got["en"].group_size, got["en"].n_sensitive_distinct) == (4, 1)
    assert not got["en"].is_l_diverse  # big group, zero diversity
    assert (got["de"].group_size, got["de"].n_sensitive_distinct) == (3, 3)
    assert got["de"].is_l_diverse
    assert (got[None].group_size, got[None].n_sensitive_distinct) == (2, 2)
    assert got[None].is_l_diverse
    with pytest.raises(ValueError, match="l must be positive"):
        l_diversity_report(df, ["lang"], "s", l_threshold=0)
