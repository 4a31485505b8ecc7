"""Machine-check of the driver-contract coverage ledger.

The 50-slot registry and its oracle-only sweep list are documented in
COVERAGE.md and in `__spark_entry__.py` comments; this suite derives the
real numbers from the code so the documentation can never silently drift
(the round-4 verdict caught exactly that class of drift by hand).
"""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# queries() entries with deliberately NO oracle twin (rows-only driver
# check).  Currently empty: every registered query is hash-gated.
ROWS_ONLY_OK: set[str] = set()


def test_registry_is_at_slot_cap():
    q = entry.queries()
    assert len(q) == 50, f"registry at {len(q)}/50"


def test_every_registered_query_has_an_oracle():
    missing = set(entry.queries()) - set(entry.oracle_sql()) - ROWS_ONLY_OK
    assert missing == set(), f"driver rows without a hash gate: {sorted(missing)}"


def test_every_oracle_only_name_resolves_for_the_sweep():
    """check_oracle.py and test_plan_audit.py resolve oracle-only names via
    the same-named function in plans.queries / plans.queries_dataops; an
    unresolvable name would silently fall out of both local gates."""
    from tax_compliance_engine_spark.plans import queries as q
    from tax_compliance_engine_spark.plans import queries_dataops as qd

    unresolved = [
        name
        for name in set(entry.oracle_sql()) - set(entry.queries())
        if getattr(q, name, None) is None and getattr(qd, name, None) is None
    ]
    assert unresolved == [], f"swept names with no function: {sorted(unresolved)}"


def test_coverage_md_ledger_line_matches_code():
    oracle_only = sorted(set(entry.oracle_sql()) - set(entry.queries()))
    expected = (
        f"Driver slots: {len(entry.queries())}/50; "
        f"oracle-only swept names ({len(oracle_only)}): "
        + ", ".join(oracle_only)
        + "."
    )
    text = Path(REPO / "COVERAGE.md").read_text()
    # normalize the doc's line wrapping before comparing
    flat = re.sub(r"\s+", " ", text)
    assert expected in flat, (
        "COVERAGE.md ledger line is stale; regenerate it as:\n" + expected
    )
