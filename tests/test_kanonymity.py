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
