"""Pins of UNDOCUMENTED DuckDB behaviors the oracle twins rely on.

The punycode twin folds (`oracle_dataops._puny_digits_sql` /
`_puny_adapt_sql`) order struct fields readers-first because DuckDB
1.0's VECTORIZED `list_reduce` evaluates accumulator-struct fields in
declaration order IN PLACE — a later field reading a field already
assigned this step sees the NEW value.  The constant-folded path
(literal inputs, no table) behaves differently (snapshot semantics) —
the twins always run vectorized over table rows, so the in-place
behavior is the load-bearing one.  The defensive readers-first
ordering makes the folds correct under EITHER semantics, but a DuckDB
upgrade that flips the vectorized behavior would otherwise only
surface as a huge twin-query hash mismatch; these pins fail fast with
a pointed message instead (r14 ADVICE fix).
"""

from __future__ import annotations

import duckdb

_MSG = (
    "DuckDB list_reduce struct-state semantics changed from the "
    "empirically pinned DuckDB 1.0 behavior that "
    "oracle_dataops._puny_digits_sql/_puny_adapt_sql were written "
    "against. The folds order reader fields before writer fields, so "
    "they are correct under both snapshot and in-place semantics — "
    "re-verify web_idn_canonical against the sweep and update this pin."
)


def test_list_reduce_vectorized_is_in_place_declaration_order():
    """Over TABLE rows (the twins' execution shape), a later struct
    field reads the NEW value of an earlier field assigned in the same
    fold step: after two steps of {'a': acc.a + 10, 'b': acc.a}, 'b'
    equals the freshly-written 'a' (x+20), not the snapshot (x+10)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS x FROM range(5)")
    rows = con.execute(
        """
        SELECT x, list_reduce(
          list_prepend({'a': x, 'b': CAST(0 AS BIGINT)},
                       [{'a': CAST(0 AS BIGINT), 'b': CAST(0 AS BIGINT)},
                        {'a': CAST(0 AS BIGINT), 'b': CAST(0 AS BIGINT)}]),
          (acc, s) -> {'a': acc.a + 10, 'b': acc.a}
        ) AS st FROM t ORDER BY x
        """
    ).fetchall()
    for x, st in rows:
        assert st == {"a": x + 20, "b": x + 20}, _MSG


def test_list_reduce_constant_path_is_snapshot():
    """The constant-folded path (no table input) evaluates the same
    fold with SNAPSHOT semantics — 'b' sees the pre-step 'a'.  Pinned
    so an upgrade unifying the two paths is noticed (either direction
    of unification is fine for the twins; the pin is the alarm)."""
    st = duckdb.sql(
        """
        SELECT list_reduce(
          list_prepend({'a': CAST(1 AS BIGINT), 'b': CAST(0 AS BIGINT)},
                       [{'a': CAST(0 AS BIGINT), 'b': CAST(0 AS BIGINT)}]),
          (acc, s) -> {'a': acc.a + 10, 'b': acc.a}
        ) AS st
        """
    ).fetchone()[0]
    assert st == {"a": 11, "b": 1}, _MSG


def test_list_reduce_is_two_arg_only():
    """list_reduce has no initial-value parameter in DuckDB 1.0 — the
    twins prepend the init state into the element list.  If an upgrade
    adds a 3-arg form this pin still passes (the 2-arg form keeps
    working); it fails only if the 2-arg prepend idiom breaks."""
    v = duckdb.sql(
        "SELECT list_reduce(list_prepend(100, [1, 2, 3]),"
        " (a, x) -> a + x) AS v"
    ).fetchone()[0]
    assert v == 106, _MSG
