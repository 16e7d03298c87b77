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

Wave 2 (VERDICT r5 #4 — the remaining reference ops with clean HTML
analogues, edit/types.py:7-29):
  * ``set_bold`` / ``set_font_size`` / ``set_font_color`` /
    ``set_alignment`` — inline-style splices on the cell's open tag;
  * ``set_value_if`` — conditional write (mismatch -> skipped);
  * ``set_range_values`` — all-or-nothing 2-D block write;
  * ``merge_cells`` / ``unmerge_cells`` — rowspan/colspan splices in
    GRID coordinates (the reference addresses merges by A1 range, i.e.
    grid positions; the occupancy layout maps grid -> DOM);
  * ``draw_grid_border`` — border-style splice over a grid rectangle
    (the G1 border-signal carrier).

Wave 3 (VERDICT r6 #6 — closes the family: 16 of the reference's 21
typed ops implemented, 5 declared n/a below, plus the 3 web-native
extras ``set_link``/``add_row``/``delete_row`` = 19 ops in ``_OPS``):
  * ``set_style``       — the combined style op over a grid RANGE
    (bold/size/color/fill/alignment/wrap in one splice per cell);
  * ``set_dimensions``  — row ``height:px`` on ``<tr>`` tags, column
    ``width:px`` on unmerged cells of the listed grid columns;
  * ``apply_table_style`` — named style joins the table's class list
    (the indirection channel kernels/css.py resolves);
  * ``create_chart``    — injects a Chart.js config script bound to a
    grid data range; the F7 six-dialect parser reads it back, so
    ``extract(create_chart(doc))`` round-trips the series;
  * ``design_snapshot`` / ``restore_design_snapshot`` — capture every
    open tag (table/tr/cell) verbatim; restore splices them back iff
    the table shape is unchanged (structural edits -> skipped).

Not implemented, by design (no honest HTML analogue —
edit/types.py:7-29): ``set_formula`` / ``fill_formula`` /
``set_formula_if`` (HTML cells hold values, not a formula layer;
coercion parity for formula RESULTS lives in P2/kernels/coerce.py),
``add_sheet`` (a document IS one sheet; multi-sheet is the corpus
dimension), ``auto_fit_columns`` (layout is the browser's, not the
document's — no stored width to fit).  16 implemented + 5 n/a = all
21 reference ops accounted for.

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


# single- OR double-quoted style attribute (backreferenced delimiter;
# the body is anything up to the matching quote) — matching only "…"
# used to inject a DUPLICATE style attr on single-quoted markup, which
# browsers resolve to the FIRST attr, silently dropping the edit
_STYLE_ATTR_RE = re.compile(
    r"(\bstyle\s*=\s*([\"']))((?:(?!\2).)*)(\2)", re.IGNORECASE | re.S)
_BG_DECL_RE = re.compile(r"background(?:-color)?\s*:\s*[^;]*;?",
                         re.IGNORECASE)
# class attribute, same quote discipline as _STYLE_ATTR_RE
_CLASS_ATTR_RE = re.compile(
    r"(\bclass\s*=\s*([\"']))((?:(?!\2).)*)(\2)", re.IGNORECASE | re.S)


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
    decl = f"background:{_check_style_value(color)}"
    m = _STYLE_ATTR_RE.search(open_tag)
    if m:
        body = _BG_DECL_RE.sub("", m.group(3)).strip().rstrip(";")
        new_body = (body + ";" if body else "") + decl
        new_tag = (open_tag[:m.start()] + m.group(1) + new_body
                   + m.group(4) + open_tag[m.end():])
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


# -- wave 2 (VERDICT r5 #4): style splices, conditional set, range set,
# -- merge/unmerge via rowspan/colspan splice --------------------------------

_STYLE_VALUE_BAD = ('"', "'", "<", ">", ";")


def _check_style_value(value: str) -> str:
    """Style-splice values must not break out of the quoted attribute or
    smuggle extra declarations — reject, don't sanitize (a skipped op is
    honest; a silently altered value is not)."""
    s = str(value)
    if any(ch in s for ch in _STYLE_VALUE_BAD):
        raise ValueError("unsafe style value")
    return s


def _replace_style_decl(open_tag: str, prop: str, value: str) -> str:
    """Set ``prop: value`` in the open tag's style attribute — existing
    declarations of the SAME property are dropped (exact-name match, so
    ``color`` never eats ``background-color``), everything else kept."""
    decl = f"{prop}:{value}"
    m = _STYLE_ATTR_RE.search(open_tag)
    if m:
        kept = [
            d.strip() for d in m.group(3).split(";")
            if d.strip()
            and d.partition(":")[0].strip().lower() != prop
        ]
        body = ";".join(kept + [decl])
        return (open_tag[:m.start()] + m.group(1) + body + m.group(4)
                + open_tag[m.end():])
    gt = open_tag.rfind(">")
    if gt < 0:
        raise ValueError("malformed cell tag")
    return open_tag[:gt] + f' style="{decl}"' + open_tag[gt:]


def _set_cell_style(html: str, table: int, row: int, col: int,
                    prop: str, value: str) -> str:
    cell = _locate_cell(html, table, row, col)
    if cell is None:
        raise ValueError("cell not found")
    cell_start, c0, _, _ = cell
    new_tag = _replace_style_decl(html[cell_start:c0], prop, value)
    return html[:cell_start] + new_tag + html[c0:]


def op_set_bold(html: str, table: int, row: int, col: int,
                bold: bool = True) -> str:
    """Reference ``set_bold`` (edit/types.py) — font-weight splice."""
    return _set_cell_style(html, table, row, col, "font-weight",
                           "bold" if bold else "normal")


def op_set_font_size(html: str, table: int, row: int, col: int,
                     size) -> str:
    """Reference ``set_font_size`` — points, like Excel font sizes."""
    if isinstance(size, bool) or not isinstance(size, (int, float)) \
            or not 1 <= size <= 512:
        raise ValueError("font size must be a number in [1, 512]")
    sz = int(size) if float(size).is_integer() else float(size)
    return _set_cell_style(html, table, row, col, "font-size", f"{sz}pt")


def op_set_font_color(html: str, table: int, row: int, col: int,
                      color: str) -> str:
    """Reference ``set_font_color`` — CSS color splice."""
    return _set_cell_style(html, table, row, col, "color",
                           _check_style_value(color))


_H_ALIGN = {"general", "left", "center", "right", "fill", "justify",
            "centercontinuous", "distributed"}
_V_ALIGN = {"top", "center", "bottom", "justify", "distributed"}


def op_set_alignment(html: str, table: int, row: int, col: int,
                     horizontal=None, vertical=None) -> str:
    """Reference ``set_alignment`` — text-align / vertical-align splice;
    the alignment vocabularies are the reference's literal types
    (edit/types.py HorizontalAlignType/VerticalAlignType)."""
    if horizontal is None and vertical is None:
        raise ValueError("no alignment given")
    if horizontal is not None:
        h = str(horizontal).lower()
        if h not in _H_ALIGN:
            raise ValueError("bad horizontal alignment")
        html = _set_cell_style(
            html, table, row, col, "text-align",
            {"centercontinuous": "center", "fill": "left",
             "distributed": "justify", "general": "left"}.get(h, h))
    if vertical is not None:
        v = str(vertical).lower()
        if v not in _V_ALIGN:
            raise ValueError("bad vertical alignment")
        html = _set_cell_style(
            html, table, row, col, "vertical-align",
            "justify" if v == "distributed" else v)
    return html


def op_set_value_if(html: str, table: int, row: int, col: int,
                    expected, value) -> str:
    """Reference ``set_value_if`` — conditional write: the cell is set
    only when its current text equals ``expected``; a mismatch is a
    skipped op (the reference's PatchStatus contract), never a silent
    overwrite."""
    cell = _locate_cell(html, table, row, col)
    if cell is None:
        raise ValueError("cell not found")
    _, c0, c1, _ = cell
    from html import unescape

    # whitespace-collapsed comparison: extraction JSON reports collapsed
    # text (dom text_content), so a client echoing the extractor's value
    # must match a cell whose markup carries newlines/indentation
    current = " ".join(
        unescape(_TEXT_STRIP_RE.sub("", html[c0:c1])).split())
    if current != " ".join(str(expected).split()):
        raise ValueError("condition not met")
    return html[:c0] + _escape(value) + html[c1:]


def _splice_all(html: str, edits: list) -> str:
    """Apply ``[(start, end, replacement)]`` splices back-to-front so
    earlier byte offsets stay valid.  Shared by the multi-splice ops —
    note zero-width insertions at equal offsets rely on the reverse
    sort being applied to the full tuples (stable for distinct spans)."""
    for start, end, repl in sorted(edits, reverse=True):
        html = html[:start] + repl + html[end:]
    return html


def op_set_range_values(html: str, table: int, row: int, col: int,
                        values) -> str:
    """Reference ``set_range_values`` — a 2-D block write anchored at
    (row, col), DOM indexes like set_value.  All-or-nothing: every
    target address is validated BEFORE the first splice, so a partially
    out-of-range block is one skipped op, not a half-applied write."""
    if not isinstance(values, list) or not values or not all(
        isinstance(r, list) for r in values
    ):
        raise ValueError("values must be a non-empty list of rows")
    # ONE document walk: collect every target span up front, validate,
    # then splice back-to-front (per-cell op_set_value calls re-tokenize
    # the whole document per cell — O(block_cells x doc_size))
    span = _table_span(html, table)
    if span is None:
        raise ValueError("table not found")
    rows = _row_spans(html, *span)
    edits: list = []
    for dr, row_vals in enumerate(values):
        if not row_vals:
            continue  # an empty row has no target addresses (and may
            # legitimately trail past the table — second-review finding)
        r = row + dr
        if not 0 <= r < len(rows):
            raise ValueError("range exceeds table rows")
        cells = _cell_spans(html, *rows[r])
        for dc, v in enumerate(row_vals):
            c = col + dc
            if not 0 <= c < len(cells):
                raise ValueError("range exceeds table columns")
            _, c0, c1, _ = cells[c]
            edits.append((c0, c1, _escape(v)))
    return _splice_all(html, edits)


_ROWSPAN_RE = re.compile(r"\browspan\s*=\s*[\"']?(\d+)", re.IGNORECASE)
_COLSPAN_RE = re.compile(r"\bcolspan\s*=\s*[\"']?(\d+)", re.IGNORECASE)
_SPAN_ATTR_STRIP_RE = re.compile(
    r"\s*\b(?:rowspan|colspan)\s*=\s*(?:\"[^\"]*\"|'[^']*'|\S+)",
    re.IGNORECASE,
)


def _grid_layout(html: str, table: int):
    """(table_span, row_spans, layout) where ``layout[r]`` lists each
    DOM cell of row r as ``(span4, grid_col, rowspan, colspan)`` with
    GRID columns assigned under rowspan/colspan occupancy — the same
    expansion the extraction grid walk performs, so merge/unmerge
    address cells exactly like the reference's A1 ranges address the
    sheet.  Spans are capped (rowspan by the rows that exist, colspan
    at 1024) so adversarial span values cannot blow up the occupancy
    set."""
    tspan = _table_span(html, table)
    if tspan is None:
        raise ValueError("table not found")
    rows = _row_spans(html, *tspan)
    occupied: set = set()
    layout: list = []
    for r, (r0, r1) in enumerate(rows):
        row_cells: list = []
        c = 0
        for cs in _cell_spans(html, r0, r1):
            while (r, c) in occupied:
                c += 1
            open_tag = html[cs[0] : cs[1]]
            m = _ROWSPAN_RE.search(open_tag)
            rs = min(int(m.group(1)) if m else 1, len(rows) - r)
            m = _COLSPAN_RE.search(open_tag)
            cl = min(int(m.group(1)) if m else 1, 1024)
            rs, cl = max(rs, 1), max(cl, 1)
            for rr in range(r, r + rs):
                for cc in range(c, c + cl):
                    occupied.add((rr, cc))
            row_cells.append((cs, c, rs, cl))
            c += cl
        layout.append(row_cells)
    return tspan, rows, layout


def _strip_span_attrs(open_tag: str) -> str:
    return _SPAN_ATTR_STRIP_RE.sub("", open_tag)


def op_merge_cells(html: str, table: int, r1: int, c1: int,
                   r2: int, c2: int) -> str:
    """Reference ``merge_cells`` — GRID coordinates (0-based, inclusive),
    the HTML splice of an A1-range merge: the master cell at (r1, c1)
    gains rowspan/colspan, every other cell whose origin lies inside the
    rectangle is removed (its value is lost, exactly like an Excel
    merge).  A rectangle that crosses an existing span — from inside or
    outside — is a skipped op."""
    if not (r1 <= r2 and c1 <= c2) or r1 < 0 or c1 < 0:
        raise ValueError("bad merge rectangle")
    if r1 == r2 and c1 == c2:
        raise ValueError("degenerate merge")
    _tspan, rows, layout = _grid_layout(html, table)
    if r2 >= len(rows):
        raise ValueError("merge exceeds table rows")
    master = None
    doomed: list = []
    covered_area = 0
    for r, row_cells in enumerate(layout):
        for cs, gc, rs, cl in row_cells:
            inside = r1 <= r <= r2 and c1 <= gc <= c2
            extent_r, extent_c = r + rs - 1, gc + cl - 1
            overlaps = not (extent_r < r1 or r > r2
                            or extent_c < c1 or gc > c2)
            if inside:
                if extent_r > r2 or extent_c > c2 or rs > 1 or cl > 1:
                    raise ValueError("merge crosses an existing span")
                covered_area += rs * cl
                if (r, gc) == (r1, c1):
                    master = cs
                else:
                    doomed.append(cs)
            elif overlaps:
                raise ValueError("merge crosses an outside span")
    if master is None:
        raise ValueError("master cell not found")
    if covered_area != (r2 - r1 + 1) * (c2 - c1 + 1):
        # uncovered grid positions (ragged rows, or c2 past the table's
        # width): merging would fabricate a colspan wider than the grid
        # instead of addressing real cells — bad address, skipped op
        raise ValueError("merge rectangle not fully covered by cells")
    n_rows, n_cols = r2 - r1 + 1, c2 - c1 + 1
    open_tag = _strip_span_attrs(html[master[0] : master[1]])
    gt = open_tag.rfind(">")
    if gt < 0:
        raise ValueError("malformed cell tag")
    attrs = (f' rowspan="{n_rows}"' if n_rows > 1 else "") + (
        f' colspan="{n_cols}"' if n_cols > 1 else "")
    new_tag = open_tag[:gt] + attrs + open_tag[gt:]
    edits = [(s[0], s[3], "") for s in doomed]
    edits.append((master[0], master[1], new_tag))
    return _splice_all(html, edits)


def op_unmerge_cells(html: str, table: int, row: int, col: int) -> str:
    """Reference ``unmerge_cells`` — the master cell at GRID (row, col)
    loses its rowspan/colspan and the vacated grid positions become
    empty cells (blank, like Excel's unmerge), inserted at the correct
    DOM positions via the occupancy layout."""
    _tspan, rows, layout = _grid_layout(html, table)
    if not 0 <= row < len(layout):
        raise ValueError("row out of range")
    master = None
    for cs, gc, rs, cl in layout[row]:
        if gc == col:
            master = (cs, gc, rs, cl)
            break
    if master is None:
        raise ValueError("cell not found")
    cs, gc, rs, cl = master
    if rs == 1 and cl == 1:
        raise ValueError("cell is not merged")
    tag = "th" if html[cs[0] : cs[0] + 3].lower().startswith("<th") else "td"
    empty = f"<{tag}></{tag}>"
    edits: list = []
    new_tag = _strip_span_attrs(html[cs[0] : cs[1]])
    edits.append((cs[0], cs[1], new_tag))
    if cl > 1:  # master row: empties right after the master cell
        edits.append((cs[3], cs[3], empty * (cl - 1)))
    for rr in range(row + 1, row + rs):
        # insert before the first cell whose grid col is PAST the span;
        # else after the last cell before it; else just after <tr ...>
        at = None
        for cs2, gc2, _rs2, _cl2 in layout[rr]:
            if gc2 > gc:
                at = cs2[0]
                break
        if at is None:
            before = [cs2 for cs2, gc2, _r, _c in layout[rr] if gc2 < gc]
            if before:
                at = before[-1][3]
            else:
                m = _TAG_START_RE.match(html, rows[rr][0])
                at = _scan_tag_end(html, m.end(), rows[rr][1]) \
                    if m else rows[rr][0]
                if at == -1:
                    raise ValueError("malformed row tag")
        edits.append((at, at, empty * cl))
    return _splice_all(html, edits)


def op_draw_grid_border(html: str, table: int, r1: int, c1: int,
                        r2: int, c2: int, style: str = "1px solid #000",
                        ) -> str:
    """Reference ``draw_grid_border`` — GRID coordinates (0-based,
    inclusive): every cell whose origin lies inside the rectangle gains
    a ``border`` declaration (the G1 border-signal carrier), existing
    border declarations replaced, other styles kept.  Cells merged
    ACROSS the rectangle boundary make the address ambiguous: skipped."""
    if not (0 <= r1 <= r2 and 0 <= c1 <= c2):
        raise ValueError("bad border rectangle")
    _check_style_value(style)
    _tspan, rows, layout = _grid_layout(html, table)
    if r2 >= len(rows):
        raise ValueError("border rectangle exceeds table rows")
    # a rowspan reaching INTO the rectangle from an origin row above r1
    # also splits it (fourth-review finding: origin-row iteration alone
    # silently skipped top crossings)
    for r in range(r1):
        for _cs, gc, rs, cl in layout[r]:
            if (r + rs - 1 >= r1 and gc <= c2 and gc + cl - 1 >= c1):
                raise ValueError("border rectangle splits a merged cell")
    edits: list = []
    hit = False
    for r in range(r1, r2 + 1):
        for cs, gc, rs, cl in layout[r]:
            if gc > c2 or gc + cl - 1 < c1:
                continue
            if gc < c1 or gc + cl - 1 > c2 or r + rs - 1 > r2:
                raise ValueError("border rectangle splits a merged cell")
            hit = True
            new_tag = _replace_style_decl(html[cs[0] : cs[1]], "border",
                                          style)
            edits.append((cs[0], cs[1], new_tag))
    if not hit:
        raise ValueError("border rectangle covers no cells")
    return _splice_all(html, edits)


def op_set_style(html: str, table: int, r1: int, c1: int,
                 r2: int, c2: int, bold=None, font_size=None,
                 color=None, fill_color=None, horizontal=None,
                 vertical=None, wrap_text=None) -> str:
    """Reference ``set_style`` (edit/internal.py:1253) — the combined
    style op over a cell RANGE (grid coordinates, like
    ``draw_grid_border``): at least one style field required, each
    mapped to the same CSS declaration its single-cell op uses.  A
    range that splits a merged cell is a skipped op."""
    fields = (bold, font_size, color, fill_color, horizontal, vertical,
              wrap_text)
    if all(f is None for f in fields):
        raise ValueError("set_style requires at least one style field")
    if not (0 <= r1 <= r2 and 0 <= c1 <= c2):
        raise ValueError("bad style rectangle")
    decls: list = []
    if bold is not None:
        decls.append(("font-weight", "bold" if bold else "normal"))
    if font_size is not None:
        if isinstance(font_size, bool) or not isinstance(
                font_size, (int, float)) or not 1 <= font_size <= 512:
            raise ValueError("font size must be a number in [1, 512]")
        sz = (int(font_size) if float(font_size).is_integer()
              else float(font_size))
        decls.append(("font-size", f"{sz}pt"))
    if color is not None:
        decls.append(("color", _check_style_value(color)))
    if fill_color is not None:
        decls.append(("background-color", _check_style_value(fill_color)))
    if horizontal is not None:
        h = str(horizontal).lower()
        if h not in _H_ALIGN:
            raise ValueError("bad horizontal alignment")
        decls.append(("text-align",
                      {"centercontinuous": "center", "fill": "left",
                       "distributed": "justify",
                       "general": "left"}.get(h, h)))
    if vertical is not None:
        v = str(vertical).lower()
        if v not in _V_ALIGN:
            raise ValueError("bad vertical alignment")
        decls.append(("vertical-align",
                      "justify" if v == "distributed" else v))
    if wrap_text is not None:
        decls.append(("white-space", "normal" if wrap_text else "nowrap"))
    _tspan, rows, layout = _grid_layout(html, table)
    if r2 >= len(rows):
        raise ValueError("style rectangle exceeds table rows")
    # a rowspan reaching INTO the rectangle from an origin row above r1
    # also splits it — same top-crossing check as draw_grid_border
    # (r7 review finding: origin-row iteration alone silently left the
    # entered grid positions unstyled instead of rejecting the op)
    for r in range(r1):
        for _cs, gc, rs, cl in layout[r]:
            if (r + rs - 1 >= r1 and gc <= c2 and gc + cl - 1 >= c1):
                raise ValueError("style rectangle splits a merged cell")
    edits: list = []
    hit = False
    for r in range(r1, r2 + 1):
        for cs, gc, rs, cl in layout[r]:
            if gc > c2 or gc + cl - 1 < c1:
                continue
            if gc < c1 or gc + cl - 1 > c2 or r + rs - 1 > r2:
                raise ValueError("style rectangle splits a merged cell")
            hit = True
            tag = html[cs[0] : cs[1]]
            for prop, val in decls:
                tag = _replace_style_decl(tag, prop, val)
            edits.append((cs[0], cs[1], tag))
    if not hit:
        raise ValueError("style rectangle covers no cells")
    return _splice_all(html, edits)


def op_set_dimensions(html: str, table: int, rows=None, row_height=None,
                      columns=None, column_width=None) -> str:
    """Reference ``set_dimensions`` (edit/internal.py:1120) — row
    heights and/or column widths.  HTML carriers: ``height:<n>px`` on
    the ``<tr>`` open tags, ``width:<n>px`` on every unmerged cell
    whose grid column is listed (the per-cell width rule — HTML has no
    per-table column object without a ``<colgroup>``, and injecting one
    would reshape documents that never had it)."""
    has_rows = rows is not None
    has_cols = columns is not None
    if not has_rows and not has_cols:
        raise ValueError("set_dimensions requires rows and/or columns")
    for which, val in (("row_height", row_height),
                       ("column_width", column_width)):
        if val is not None and (isinstance(val, bool) or not isinstance(
                val, (int, float)) or val <= 0 or val > 10_000):
            raise ValueError(f"bad {which}")
    if has_rows and row_height is None:
        raise ValueError("rows given without row_height")
    if has_cols and column_width is None:
        raise ValueError("columns given without column_width")
    _tspan, row_spans, layout = _grid_layout(html, table)
    edits: list = []
    if has_rows:
        hv = (int(row_height) if float(row_height).is_integer()
              else float(row_height))
        for r in rows:
            if not isinstance(r, int) or not 0 <= r < len(row_spans):
                raise ValueError("row index out of range")
            r0, r1 = row_spans[r]
            m = _TAG_START_RE.match(html, r0)
            end = _scan_tag_end(html, m.end(), r1) if m else -1
            if end == -1:
                raise ValueError("malformed row tag")
            tag = _replace_style_decl(html[r0:end], "height", f"{hv}px")
            edits.append((r0, end, tag))
    if has_cols:
        wv = (int(column_width) if float(column_width).is_integer()
              else float(column_width))
        wanted = set()
        for c in columns:
            if not isinstance(c, int) or c < 0:
                raise ValueError("bad column index")
            wanted.add(c)
        hit = False
        for row_cells in layout:
            for cs, gc, _rs, cl in row_cells:
                if cl == 1 and gc in wanted:
                    hit = True
                    tag = _replace_style_decl(html[cs[0] : cs[1]],
                                              "width", f"{wv}px")
                    edits.append((cs[0], cs[1], tag))
        if not hit:
            raise ValueError("no unmerged cell in the listed columns")
    return _splice_all(html, edits)


_STYLE_TOKEN_RE = re.compile(r"^[A-Za-z][\w-]{0,63}$")


def op_apply_table_style(html: str, table: int, style: str,
                         table_name=None) -> str:
    """Reference ``apply_table_style`` (edit/internal.py:1285) — a NAMED
    table style.  HTML carrier: the style name joins the table's class
    list (the indirect-styling channel kernels/css.py resolves and A2's
    class_map indexes); ``table_name`` lands in ``data-table-name``.
    Names must be single identifier tokens — reject, don't sanitize."""
    if not isinstance(style, str) or not _STYLE_TOKEN_RE.match(style):
        raise ValueError("bad table style name")
    if table_name is not None and (
            not isinstance(table_name, str)
            or not _STYLE_TOKEN_RE.match(table_name)):
        raise ValueError("bad table name")
    tspan = _table_span(html, table)
    if tspan is None:
        raise ValueError("table not found")
    t0 = tspan[0]
    m = _TAG_START_RE.match(html, t0)
    end = _scan_tag_end(html, m.end(), tspan[1]) if m else -1
    if end == -1:
        raise ValueError("malformed table tag")
    tag = html[t0:end]
    cm = _CLASS_ATTR_RE.search(tag)
    if cm:
        classes = cm.group(3).split()
        if style not in classes:
            classes.append(style)
        tag = (tag[:cm.start()] + cm.group(1) + " ".join(classes)
               + cm.group(4) + tag[cm.end():])
    else:
        gt = tag.rfind(">")
        tag = tag[:gt] + f' class="{style}"' + tag[gt:]
    if table_name is not None and "data-table-name" not in tag.lower():
        gt = tag.rfind(">")
        tag = tag[:gt] + f' data-table-name="{table_name}"' + tag[gt:]
    return html[:t0] + tag + html[end:]


_CHART_TYPES = {"bar": "bar", "column": "bar", "line": "line",
                "pie": "pie", "scatter": "scatter", "area": "line",
                "doughnut": "doughnut"}


def op_create_chart(html: str, table: int, chart_type: str,
                    r1: int, c1: int, r2: int, c2: int,
                    title=None, titles_from_data: bool = True,
                    series_from_rows: bool = False,
                    anchor=None) -> str:
    """Reference ``create_chart`` (edit/internal.py:1346) — the HTML
    analogue injects a Chart.js config script bound to the table's data
    range (grid coordinates), which the F7 chart-config parser reads
    back: ``extract(create_chart(doc))`` round-trips the series.  With
    ``titles_from_data`` the range's first row (or first column when
    ``series_from_rows``) names the labels/series; non-numeric data
    cells become nulls (Chart.js's own missing-point value)."""
    import json as _json
    from html import unescape as _unescape

    ct = _CHART_TYPES.get(str(chart_type).lower())
    if ct is None:
        raise ValueError("unknown chart type")
    if not (0 <= r1 <= r2 and 0 <= c1 <= c2):
        raise ValueError("bad data range")
    tspan, rows, layout = _grid_layout(html, table)
    if r2 >= len(rows):
        raise ValueError("data range exceeds table rows")
    # grid -> matrix of collapsed cell texts (None where no cell origin)
    grid: dict = {}
    for r in range(r1, r2 + 1):
        for cs, gc, _rs, _cl in layout[r]:
            if c1 <= gc <= c2:
                text = " ".join(_unescape(
                    _TEXT_STRIP_RE.sub("", html[cs[1] : cs[2]])).split())
                grid[(r, gc)] = text
    matrix = [[grid.get((r, c)) for c in range(c1, c2 + 1)]
              for r in range(r1, r2 + 1)]
    if series_from_rows:
        matrix = [list(t) for t in zip(*matrix)]
    if len(matrix) < 2 or len(matrix[0]) < 2:
        raise ValueError("data range too small for a chart")

    def _num(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    if titles_from_data:
        header, body = matrix[0], matrix[1:]
        labels = [row[0] or "" for row in body]
        names = [h or f"series{i}" for i, h in enumerate(header[1:])]
        datasets = [
            {"label": names[j],
             "data": [_num(row[j + 1]) for row in body]}
            for j in range(len(names))
        ]
    else:
        labels = [str(i) for i in range(len(matrix))]
        datasets = [
            {"label": f"series{j}",
             "data": [_num(row[j]) for row in matrix]}
            for j in range(len(matrix[0]))
        ]
    if not any(any(v is not None for v in d["data"]) for d in datasets):
        raise ValueError("data range has no numeric series")
    cfg: dict = {"type": ct, "data": {"labels": labels,
                                      "datasets": datasets}}
    if title is not None:
        # raw title, not HTML-escaped: script content is raw text (never
        # entity-decoded), so escaping here broke the documented
        # extract(create_chart(doc)) round-trip for '&'/'<' titles
        # (r7 review finding) — script-safety is handled below by the
        # JSON-level "</" escape instead
        cfg["options"] = {"plugins": {"title": {
            "display": True, "text": str(title)}}}
    cid = f"chart-t{table}-{r1}-{c1}"
    anchor_attr = ""
    if anchor is not None:
        if not isinstance(anchor, str) or not _STYLE_TOKEN_RE.match(
                anchor.replace(":", "")):
            raise ValueError("bad anchor")
        anchor_attr = f' data-anchor="{anchor}"'
    # "</" -> "<\/" (a JSON no-op escape that parses back identical):
    # any cell text containing "</script>" would otherwise terminate
    # the script element early and corrupt the document (r7 review
    # finding — labels and dataset names are page-derived text)
    cfg_js = _json.dumps(cfg).replace("</", "<\\/")
    snippet = (
        f'<canvas id="{cid}"{anchor_attr}></canvas>'
        f'<script>new Chart(document.getElementById("{cid}"), '
        f"{cfg_js});</script>"
    )
    at = tspan[1]
    return html[:at] + snippet + html[at:]


def design_snapshot(html: str, table: int) -> dict:
    """Capture the table's DESIGN state for ``restore_design_snapshot``
    (the reference's DesignSnapshot, edit/models.py:108 — borders,
    fonts, fills, alignments, dimensions): the table's open tag plus
    every row and cell OPEN TAG verbatim.  Every design op in this
    module rewrites only open tags, so restoring them is an exact
    inverse; structural ops (merge, add_row) invalidate the snapshot
    and restore skips (shape check)."""
    tspan, row_spans, layout = _grid_layout(html, table)
    m = _TAG_START_RE.match(html, tspan[0])
    end = _scan_tag_end(html, m.end(), tspan[1]) if m else -1
    if end == -1:
        raise ValueError("malformed table tag")
    rows_out: list = []
    cells_out: list = []
    for r, (r0, r1) in enumerate(row_spans):
        rm = _TAG_START_RE.match(html, r0)
        rend = _scan_tag_end(html, rm.end(), r1) if rm else -1
        if rend == -1:
            raise ValueError("malformed row tag")
        rows_out.append(html[r0:rend])
        cells_out.append([html[cs[0] : cs[1]]
                          for cs, _gc, _rs, _cl in layout[r]])
    return {"table": table, "table_tag": html[tspan[0] : end],
            "rows": rows_out, "cells": cells_out}


def op_restore_design_snapshot(html: str, design_snapshot: dict) -> str:
    """Reference ``restore_design_snapshot`` — the inverse op: splice
    the captured open tags back.  The CURRENT table must have the same
    shape (row count, cells per row) as the snapshot; a structurally
    edited table is a skipped op, never a mis-addressed restore."""
    snap = design_snapshot
    if not isinstance(snap, dict):
        raise ValueError("bad snapshot")
    try:
        table = snap["table"]
        table_tag = snap["table_tag"]
        snap_rows = snap["rows"]
        snap_cells = snap["cells"]
    except (KeyError, TypeError):
        raise ValueError("bad snapshot") from None
    if (not isinstance(snap_rows, list) or not isinstance(
            snap_cells, list) or len(snap_rows) != len(snap_cells)
            or not all(isinstance(rc, list) for rc in snap_cells)):
        raise ValueError("bad snapshot")
    tspan, row_spans, layout = _grid_layout(html, table)
    if len(row_spans) != len(snap_rows) or any(
            len(layout[r]) != len(snap_cells[r])
            for r in range(len(row_spans))):
        raise ValueError("snapshot shape mismatch")
    m = _TAG_START_RE.match(html, tspan[0])
    end = _scan_tag_end(html, m.end(), tspan[1]) if m else -1
    if end == -1:
        raise ValueError("malformed table tag")
    edits: list = [(tspan[0], end, str(table_tag))]
    for r, (r0, r1) in enumerate(row_spans):
        rm = _TAG_START_RE.match(html, r0)
        rend = _scan_tag_end(html, rm.end(), r1) if rm else -1
        if rend == -1:
            raise ValueError("malformed row tag")
        edits.append((r0, rend, str(snap_rows[r])))
        for (cs, _gc, _rs, _cl), tag in zip(layout[r], snap_cells[r]):
            edits.append((cs[0], cs[1], str(tag)))
    return _splice_all(html, edits)


_OPS = {
    "set_value": op_set_value,
    "set_link": op_set_link,
    "set_fill_color": op_set_fill_color,
    "add_row": op_add_row,
    "delete_row": op_delete_row,
    "set_bold": op_set_bold,
    "set_font_size": op_set_font_size,
    "set_font_color": op_set_font_color,
    "set_alignment": op_set_alignment,
    "set_value_if": op_set_value_if,
    "set_range_values": op_set_range_values,
    "merge_cells": op_merge_cells,
    "unmerge_cells": op_unmerge_cells,
    "draw_grid_border": op_draw_grid_border,
    "set_style": op_set_style,
    "set_dimensions": op_set_dimensions,
    "apply_table_style": op_apply_table_style,
    "create_chart": op_create_chart,
    "restore_design_snapshot": op_restore_design_snapshot,
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
