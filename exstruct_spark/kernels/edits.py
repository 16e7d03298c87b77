"""Cell-level document edit operations (X8 residual, VERDICT r4 #4).

The reference ships a typed workbook-edit op family (edit/types.py:7-29
— ``set_value``, ``set_range_values``, ``set_fill_color``,
``merge_cells``, ... with ``applied``/``skipped`` statuses).  The web
twin's editable artifact is the HTML document itself, so the op family
here is a compiler from cell-addressed ops to a PATCHED HTML DOCUMENT —
pure text -> text functions that feed ``ExtractionJob.apply_patch``'s
bucket-scoped refresh (engine.py): the edit flows through the exact
extraction path every other document takes, and only the edited urls'
buckets re-extract.

Ops (each addresses the ``table``-th ``<table`` in document order,
0-based DOM row / cell indexes):
  * ``set_value``     — replace a cell's content (reference set_value);
  * ``set_link``      — wrap the cell's text in ``<a href>`` (the
                        links_map carrier);
  * ``set_fill_color``— set the cell's background via the style attr
                        (reference set_fill_color; colors_map carrier);
  * ``add_row``       — insert a ``<tr>`` of values at a row index
                        (reference set_range_values' grow case);
  * ``delete_row``    — remove a ``<tr>``.

Semantics follow the reference's patch contract: ops apply in order,
each yields status ``applied`` or ``skipped`` (bad address, malformed
region) — a skipped op never aborts the batch (edit/types.py
PatchStatus).  The scanner is positional (regex token walk with table
depth tracking) so untouched bytes of the document are preserved
byte-for-byte — which is what makes the bucket-refresh byte-identity
test meaningful.
"""

from __future__ import annotations

import re
from typing import Optional

_TAG_START_RE = re.compile(r"<(/?)(table|tr|td|th)\b", re.IGNORECASE)


def _scan_tag_end(html: str, pos: int, limit: int) -> int:
    """Index just past the ``>`` terminating the tag whose attribute
    region begins at ``pos``, or ``-1`` if none before ``limit``.

    Attribute-aware: a ``>`` inside a BALANCED quoted attribute value
    must not terminate the tag (title="a>b", inline JSON in data-*
    attrs).  Quoted runs may not span ``<`` and a lone quote is a
    literal, so an UNBALANCED quote degrades to truncate-at-first-'>'
    instead of dropping the tag (which would silently renumber cells)
    or spanning into later tags.  Hand-rolled linear scan — the regex
    form of this rule had overlapping quote alternatives and went
    exponential on unbalanced-quote input ('"a'*30 with no '>').

    Two phases, both one left-to-right pass:
      1. greedy: skip balanced runs, end at the first uncovered ``>``;
      2. if phase 1 hits ``<``/limit, degrade to all-quotes-literal and
         end at the first raw ``>`` (recorded during phase 1), even if
         a balanced run covered it.
    """
    i = pos
    first_raw_gt = -1
    while i < limit:
        c = html[i]
        if c == ">":
            return i + 1
        if c == "<":
            break
        if c == '"' or c == "'":
            close = html.find(c, i + 1, limit)
            if close != -1 and html.find("<", i + 1, close) == -1:
                if first_raw_gt == -1:
                    g = html.find(">", i + 1, close)
                    if g != -1:
                        first_raw_gt = g
                i = close + 1
                continue
        i += 1
    return first_raw_gt + 1 if first_raw_gt != -1 else -1


class _Tok:
    """Minimal re.Match stand-in for the token scanner (the span/group
    subset the walkers below use)."""

    __slots__ = ("_start", "_end", "_g1", "_g2")

    def __init__(self, start, end, g1, g2):
        self._start, self._end, self._g1, self._g2 = start, end, g1, g2

    def group(self, i):
        return self._g1 if i == 1 else self._g2

    def start(self):
        return self._start

    def end(self):
        return self._end


class _TokenScanner:
    """Linear-time drop-in for the old ``_TOKEN_RE.finditer`` walk."""

    @staticmethod
    def finditer(html: str, pos: int = 0, endpos: Optional[int] = None):
        limit = len(html) if endpos is None else endpos
        search = _TAG_START_RE.search
        while True:
            m = search(html, pos, limit)
            if m is None:
                return
            end = _scan_tag_end(html, m.end(), limit)
            if end == -1:
                # tag never terminates: not a token; resume just past
                # its '<' so a tag-start inside the region is still
                # seen (matches the regex engine's advance-by-one)
                pos = m.start() + 1
                continue
            yield _Tok(m.start(), end, m.group(1), m.group(2))
            pos = end


_TOKEN_RE = _TokenScanner()


def _escape(value) -> str:
    s = str(value)
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _table_span(html: str, index: int) -> Optional[tuple]:
    """(start, end) byte span of the ``index``-th ``<table`` element in
    document order (nested tables count — same order extraction sees),
    ``end`` pointing just past its ``</table>``."""
    n = -1
    for m in _TOKEN_RE.finditer(html):
        if m.group(2).lower() == "table" and not m.group(1):
            n += 1
            if n == index:
                depth = 1
                for m2 in _TOKEN_RE.finditer(html, m.end()):
                    if m2.group(2).lower() != "table":
                        continue
                    depth += -1 if m2.group(1) else 1
                    if depth == 0:
                        return m.start(), m2.end()
                return m.start(), len(html)  # unclosed: to end
    return None


def _row_spans(html: str, t0: int, t1: int) -> list:
    """[(row_start, row_end)] of the table's OWN ``<tr>`` elements
    (rows of nested tables are skipped via depth tracking).  A row ends
    at its ``</tr>``, the next sibling ``<tr``, or the table end."""
    rows = []
    depth = 0
    open_start = None
    for m in _TOKEN_RE.finditer(html, t0, t1):
        kind = m.group(2).lower()
        closing = bool(m.group(1))
        if kind == "table":
            depth += -1 if closing else 1
            continue
        if depth > 1 or kind != "tr":
            continue
        if not closing:
            if open_start is not None:
                rows.append((open_start, m.start()))
            open_start = m.start()
        else:
            if open_start is not None:
                rows.append((open_start, m.end()))
                open_start = None
    if open_start is not None:
        end = html.rfind("</table", open_start, t1)
        rows.append((open_start, end if end > open_start else t1))
    return rows


def _cell_spans(html: str, r0: int, r1: int) -> list:
    """[(cell_start, content_start, content_end, cell_end)] for the
    row's own td/th cells (nested-table cells skipped)."""
    cells = []
    depth = 0
    cur = None  # (cell_start, content_start)
    for m in _TOKEN_RE.finditer(html, r0, r1):
        kind = m.group(2).lower()
        closing = bool(m.group(1))
        if kind == "table":
            depth += -1 if closing else 1
            continue
        if depth > 0:
            continue
        if kind == "tr":
            # the row's own </tr> (or a stray <tr) terminates an
            # unclosed cell BEFORE the tag — splicing must never
            # swallow the row-closing markup
            if cur is not None:
                cells.append((cur[0], cur[1], m.start(), m.start()))
                cur = None
            continue
        if not closing:  # <td / <th
            if cur is not None:
                cells.append((cur[0], cur[1], m.start(), m.start()))
            cur = (m.start(), m.end())
        else:            # </td / </th
            if cur is not None:
                cells.append((cur[0], cur[1], m.start(), m.end()))
                cur = None
    if cur is not None:
        cells.append((cur[0], cur[1], r1, r1))
    return cells


def _locate_cell(html: str, table: int, row: int, col: int):
    span = _table_span(html, table)
    if span is None:
        return None
    rows = _row_spans(html, *span)
    if not 0 <= row < len(rows):
        return None
    cells = _cell_spans(html, *rows[row])
    if not 0 <= col < len(cells):
        return None
    return cells[col]


_TEXT_STRIP_RE = re.compile(r"<[^>]*>")


def op_set_value(html: str, table: int, row: int, col: int, value) -> str:
    cell = _locate_cell(html, table, row, col)
    if cell is None:
        raise ValueError("cell not found")
    _, c0, c1, _ = cell
    return html[:c0] + _escape(value) + html[c1:]


def op_set_link(html: str, table: int, row: int, col: int, href) -> str:
    """Wrap the cell's TEXT (tags stripped) in an anchor — the cell's
    link in links_map afterwards is exactly ``href``."""
    cell = _locate_cell(html, table, row, col)
    if cell is None:
        raise ValueError("cell not found")
    _, c0, c1, _ = cell
    text = _TEXT_STRIP_RE.sub("", html[c0:c1])
    quoted = _escape(href).replace('"', "&quot;")
    return (html[:c0] + f'<a href="{quoted}">' + text + "</a>" + html[c1:])


_STYLE_ATTR_RE = re.compile(r'(\bstyle\s*=\s*")([^"]*)(")', re.IGNORECASE)
_BG_DECL_RE = re.compile(r"background(?:-color)?\s*:\s*[^;]*;?",
                         re.IGNORECASE)


def op_set_fill_color(html: str, table: int, row: int, col: int,
                      color: str) -> str:
    """Set the cell's background (the colors_map carrier) by editing the
    open tag's style attribute — existing background declarations are
    replaced, other declarations kept."""
    cell = _locate_cell(html, table, row, col)
    if cell is None:
        raise ValueError("cell not found")
    cell_start, c0, _, _ = cell
    open_tag = html[cell_start:c0]
    decl = f"background:{color}"
    m = _STYLE_ATTR_RE.search(open_tag)
    if m:
        body = _BG_DECL_RE.sub("", m.group(2)).strip().rstrip(";")
        new_body = (body + ";" if body else "") + decl
        new_tag = (open_tag[:m.start()] + m.group(1) + new_body
                   + m.group(3) + open_tag[m.end():])
    else:
        # inject before the closing '>'
        gt = open_tag.rfind(">")
        if gt < 0:
            raise ValueError("malformed cell tag")
        new_tag = open_tag[:gt] + f' style="{decl}"' + open_tag[gt:]
    return html[:cell_start] + new_tag + html[c0:]


def op_add_row(html: str, table: int, row: int, values,
               header: bool = False) -> str:
    """Insert a ``<tr>`` of ``values`` so it becomes row ``row`` (0-based;
    ``row`` may equal the current row count to append)."""
    span = _table_span(html, table)
    if span is None:
        raise ValueError("table not found")
    rows = _row_spans(html, *span)
    if not 0 <= row <= len(rows):
        raise ValueError("row index out of range")
    tag = "th" if header else "td"
    tr = "<tr>" + "".join(
        f"<{tag}>{_escape(v)}</{tag}>" for v in values) + "</tr>"
    if row < len(rows):
        at = rows[row][0]
    elif rows:
        at = rows[-1][1]
    else:
        end = html.rfind("</table", span[0], span[1])
        at = end if end > span[0] else span[1]
    return html[:at] + tr + html[at:]


def op_delete_row(html: str, table: int, row: int) -> str:
    span = _table_span(html, table)
    if span is None:
        raise ValueError("table not found")
    rows = _row_spans(html, *span)
    if not 0 <= row < len(rows):
        raise ValueError("row index out of range")
    r0, r1 = rows[row]
    return html[:r0] + html[r1:]


_OPS = {
    "set_value": op_set_value,
    "set_link": op_set_link,
    "set_fill_color": op_set_fill_color,
    "add_row": op_add_row,
    "delete_row": op_delete_row,
}


def apply_ops(html: str, ops: list) -> tuple:
    """Apply an op list in order -> (patched_html, statuses).

    Each op is a dict: ``{"op": name, "table": i, ...}`` with the op's
    keyword arguments.  Statuses mirror the reference's PatchStatus:
    ``applied`` or ``skipped`` (unknown op, bad address, malformed
    region) — a skipped op never aborts the rest (edit/types.py
    parity; X3 fallback-not-fail)."""
    statuses = []
    for op in ops:
        # totality over arbitrary JSON shapes: a non-dict op entry or a
        # non-string op name is a skipped op, never an exception
        name = op.get("op") if isinstance(op, dict) else None
        fn = _OPS.get(name) if isinstance(name, str) else None
        if fn is None:
            statuses.append("skipped")
            continue
        kwargs = {k: v for k, v in op.items() if k != "op"}
        try:
            html = fn(html, **kwargs)
            statuses.append("applied")
        except (ValueError, TypeError):
            statuses.append("skipped")
    return html, statuses
