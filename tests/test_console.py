"""Unit tests for the rich-style console renderer (S11).

The reference renders CLI tables/panels with the ``rich`` library
(reference cli.py:86-119); :mod:`tax_compliance_engine_spark.console` is
the native stand-in.  These tests pin the visual structure: rounded
corners, column justification, per-row rules, title centering, and the
SIMPLE (borderless) style.
"""

from __future__ import annotations

import pytest

from tax_compliance_engine_spark.console import (
    ROUNDED,
    SIMPLE,
    SQUARE,
    Table,
    panel,
)


def _make_table(**kw) -> Table:
    t = Table(**kw)
    t.add_column("Name")
    t.add_column("Amount", justify="right")
    t.add_column("OK", justify="center")
    t.add_row("alpha", "$1,234.00", "Y")
    t.add_row("b", "$5.00", "")
    return t


def test_rounded_table_structure():
    out = _make_table(title="Results", box=ROUNDED).render().splitlines()
    # title, top, header, rule, 2 rows, bottom
    assert len(out) == 7
    assert out[0].strip() == "Results"
    assert out[1].startswith("╭") and out[1].endswith("╮")
    assert out[1].count("┬") == 2
    assert out[3].startswith("├") and out[3].count("┼") == 2
    assert out[-1].startswith("╰") and out[-1].endswith("╯")
    # all bordered lines are the same width; title is centered within it
    widths = {len(ln) for ln in out[1:]}
    assert len(widths) == 1
    # header cells present
    assert "Name" in out[2] and "Amount" in out[2] and "OK" in out[2]


def test_column_justification():
    out = _make_table(box=ROUNDED).render().splitlines()
    row_alpha = next(ln for ln in out if "alpha" in ln)
    row_b = next(ln for ln in out if "$5.00" in ln)
    cells_a = row_alpha.split("│")[1:-1]
    cells_b = row_b.split("│")[1:-1]
    # left column: text flush left
    assert cells_a[0].startswith(" alpha")
    # right column: numbers flush right, aligned across rows
    assert cells_a[1].endswith("$1,234.00 ")
    assert cells_b[1].endswith("$5.00 ")
    assert len(cells_a[1]) == len(cells_b[1])
    # center column
    assert cells_a[2].strip() == "Y"


def test_show_lines_rules_between_rows():
    plain = _make_table(box=ROUNDED).render().splitlines()
    lined = _make_table(box=ROUNDED, show_lines=True).render().splitlines()
    assert len(lined) == len(plain) + 1  # one extra rule between the 2 rows
    assert sum(1 for ln in lined if ln.startswith("├")) == 2


def test_simple_box_has_no_borders():
    out = _make_table(title="Local Rates", box=SIMPLE).render().splitlines()
    assert out[0].strip() == "Local Rates"
    assert not any("│" in ln or "╭" in ln for ln in out)
    assert any(set(ln.strip()) == {"─"} for ln in out)  # header rule


def test_square_box_corners():
    out = _make_table(box=SQUARE).render().splitlines()
    assert out[0].startswith("┌") and out[-1].startswith("└")


def test_row_arity_checked():
    t = Table()
    t.add_column("A")
    with pytest.raises(ValueError):
        t.add_row("x", "y")


def test_empty_table_renders_empty():
    assert Table().render() == ""


def test_panel_with_title():
    out = panel("Total Tax: $41.25\nExempt: No", title="Batch Summary")
    lines = out.splitlines()
    assert len(lines) == 4
    assert lines[0].startswith("╭") and " Batch Summary " in lines[0]
    assert lines[0].endswith("╮")
    assert lines[1] == "│ Total Tax: $41.25 │"
    assert lines[2] == "│ Exempt: No        │"
    assert lines[3] == "╰" + "─" * (len(lines[0]) - 2) + "╯"
    # content substrings survive verbatim (CLI tests rely on this)
    assert "Total Tax: $41.25" in out


def test_panel_title_wider_than_content():
    out = panel("hi", title="A Much Longer Title")
    lines = out.splitlines()
    assert " A Much Longer Title " in lines[0]
    assert len({len(ln) for ln in lines}) == 1
