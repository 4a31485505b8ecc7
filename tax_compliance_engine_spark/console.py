"""Rich-style console rendering (SURVEY §2 S11; reference cli.py:86-119).

The reference renders its CLI output with the ``rich`` library — rounded
box-drawing tables (``box.ROUNDED``), simple header-rule tables
(``box.SIMPLE``) and titled panels.  That library is not available in this
environment, so this module provides a small native renderer that produces
the same visual structure: Unicode box-drawing borders, centered titles,
per-column justification, and optional per-row rule lines
(``show_lines=True``).  Markup/color is intentionally out of scope — the
driver-side byte-parity tests compare *content*, and terminals without
ANSI support see exactly what tests see.

Everything here is driver-side formatting of already-collected,
report-sized rows (≤ tens of lines by design — see SURVEY §4.2); no Spark
interaction happens in this module.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BoxChars:
    """One box-drawing character set (subset of rich's ``box`` styles)."""

    top_left: str
    top_mid: str
    top_right: str
    mid_left: str
    mid_mid: str
    mid_right: str
    bottom_left: str
    bottom_mid: str
    bottom_right: str
    vertical: str
    horizontal: str


ROUNDED = BoxChars("╭", "┬", "╮", "├", "┼", "┤", "╰", "┴", "╯", "│", "─")
SQUARE = BoxChars("┌", "┬", "┐", "├", "┼", "┤", "└", "┴", "┘", "│", "─")
# rich's box.SIMPLE has no outer border — just a rule under the header.
SIMPLE = None


def _justify(text: str, width: int, how: str) -> str:
    if how == "right":
        return text.rjust(width)
    if how == "center":
        return text.center(width)
    return text.ljust(width)


@dataclass
class Table:
    """A titled table rendered with box-drawing borders.

    Mirrors the surface the reference uses from ``rich.table.Table``
    (reference cli.py:86-119, 193-230, 244-299, 341-390): a title, columns
    with left/right/center justification, and ``show_lines`` to rule
    between body rows.
    """

    title: str | None = None
    box: BoxChars | None = ROUNDED
    show_lines: bool = False
    _columns: list[tuple[str, str]] = field(default_factory=list)
    _rows: list[list[str]] = field(default_factory=list)

    def add_column(self, header: str, justify: str = "left") -> None:
        self._columns.append((header, justify))

    def add_row(self, *cells: str) -> None:
        if len(cells) != len(self._columns):
            raise ValueError(
                f"row has {len(cells)} cells, table has "
                f"{len(self._columns)} columns"
            )
        self._rows.append([str(c) for c in cells])

    # -- rendering -----------------------------------------------------

    def _widths(self) -> list[int]:
        widths = [len(h) for h, _ in self._columns]
        for row in self._rows:
            for i, cell in enumerate(row):
                widths[i] = max(widths[i], len(cell))
        return widths

    def _cells_line(self, cells: list[str], widths: list[int], sep: str) -> str:
        parts = [
            " " + _justify(c, w, j) + " "
            for c, w, (_, j) in zip(cells, widths, self._columns)
        ]
        return sep + sep.join(parts) + sep if sep else " " + " ".join(parts)

    def _rule(self, widths: list[int], left: str, mid: str, right: str) -> str:
        bar = self.box.horizontal if self.box else "─"
        return left + mid.join(bar * (w + 2) for w in widths) + right

    def render(self) -> str:
        if not self._columns:
            return ""
        widths = self._widths()
        headers = [h for h, _ in self._columns]
        out: list[str] = []

        if self.box is None:  # SIMPLE: header + rule, no borders
            total = sum(w + 2 for w in widths) + len(widths) - 1
            if self.title:
                out.append(self.title.center(total + 2).rstrip())
            out.append(self._cells_line(headers, widths, ""))
            out.append(" " + "─" * total + " ")
            for row in self._rows:
                out.append(self._cells_line(row, widths, ""))
            return "\n".join(line.rstrip() for line in out)

        b = self.box
        total = sum(w + 3 for w in widths) + 1  # borders included
        if self.title:
            out.append(self.title.center(total).rstrip())
        out.append(self._rule(widths, b.top_left, b.top_mid, b.top_right))
        out.append(self._cells_line(headers, widths, b.vertical))
        out.append(self._rule(widths, b.mid_left, b.mid_mid, b.mid_right))
        for i, row in enumerate(self._rows):
            if self.show_lines and i > 0:
                out.append(
                    self._rule(widths, b.mid_left, b.mid_mid, b.mid_right)
                )
            out.append(self._cells_line(row, widths, b.vertical))
        out.append(
            self._rule(widths, b.bottom_left, b.bottom_mid, b.bottom_right)
        )
        return "\n".join(out)


def panel(content: str, title: str | None = None, box: BoxChars = ROUNDED) -> str:
    """Render ``content`` in a titled border, like ``rich.panel.Panel``
    (reference cli.py:109-119, 143-157, 176-189, 305-316)."""
    lines = content.splitlines() or [""]
    inner = max(
        max(len(ln) for ln in lines),
        (len(title) + 2) if title else 0,
    )
    bar = box.horizontal
    if title:
        deco = f" {title} "
        pad = inner + 2 - len(deco)
        left = pad // 2
        top = box.top_left + bar * left + deco + bar * (pad - left) + box.top_right
    else:
        top = box.top_left + bar * (inner + 2) + box.top_right
    body = [f"{box.vertical} {ln.ljust(inner)} {box.vertical}" for ln in lines]
    bottom = box.bottom_left + bar * (inner + 2) + box.bottom_right
    return "\n".join([top, *body, bottom])
