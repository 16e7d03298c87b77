"""Extraction-JSON -> HTML document builder (the ``exstruct_make`` twin).

The reference's generative MCP tool creates a workbook and applies patch
ops to it (``exstruct_make``, reference mcp/server.py:622-693) — the one
tool family that RUNS the models backwards.  The web twin materializes
an extraction record back into markup, with the round-trip contract
``extract(make(J))`` reproducing J's table family exactly: rows (sparse
CellRow maps), merged_cells (r 1-based / c 0-based items, master value),
colors_map (background fills), per-cell links and the <caption> name.

Total by construction: malformed entries (non-integer coordinates,
non-dict tables) are skipped, never raised on, and grid extents are
capped (caps-not-crashes) so an adversarial merged item cannot demand a
billion-cell document.
"""

from __future__ import annotations

from typing import Optional

from exstruct_spark.kernels.edits import _escape

# caps-not-crashes: the largest grid one make call will materialize
MAX_MAKE_ROWS = 4096
MAX_MAKE_COLS = 1024


def _int(x) -> Optional[int]:
    try:
        if isinstance(x, bool):
            return None
        return int(x)
    except (TypeError, ValueError):
        return None


def _attr_escape(s: str) -> str:
    return _escape(s).replace('"', "&quot;")


def _table_html(t: dict) -> str:
    values: dict = {}
    links: dict = {}
    for row in t.get("rows") or []:
        if not isinstance(row, dict):
            continue
        r0 = _int(row.get("r"))
        if r0 is None or not 1 <= r0 <= MAX_MAKE_ROWS:
            continue
        r0 -= 1
        cmap = row.get("c")
        if isinstance(cmap, dict):
            for ck, v in cmap.items():
                c = _int(ck)
                if c is not None and 0 <= c < MAX_MAKE_COLS:
                    values[(r0, c)] = v
        lmap = row.get("links")
        if isinstance(lmap, dict):
            for ck, href in lmap.items():
                c = _int(ck)
                if c is not None and 0 <= c < MAX_MAKE_COLS:
                    links[(r0, c)] = str(href)
    color_at: dict = {}
    cm = t.get("colors_map")
    if isinstance(cm, dict):
        for hexkey, positions in cm.items():
            if not isinstance(positions, list):
                continue
            for pos in positions:
                if not (isinstance(pos, list) and len(pos) == 2):
                    continue
                r1b, c = _int(pos[0]), _int(pos[1])
                if (r1b is not None and c is not None
                        and 1 <= r1b <= MAX_MAKE_ROWS
                        and 0 <= c < MAX_MAKE_COLS):
                    color_at[(r1b - 1, c)] = str(hexkey)
    masters: dict = {}
    covered: set = set()
    mc = t.get("merged_cells")
    items = mc.get("items") if isinstance(mc, dict) else None
    for item in items or []:
        # [r1, c1, r2, c2, v] — r 1-based, c 0-based (the reference's
        # MergedCells coordinate convention)
        if not (isinstance(item, list) and len(item) == 5):
            continue
        r1, c1, r2, c2 = (_int(x) for x in item[:4])
        if None in (r1, c1, r2, c2):
            continue
        if not (1 <= r1 <= r2 <= MAX_MAKE_ROWS
                and 0 <= c1 <= c2 < MAX_MAKE_COLS):
            continue
        r1 -= 1
        r2 -= 1
        masters[(r1, c1)] = (r2 - r1 + 1, c2 - c1 + 1, item[4])
        for rr in range(r1, r2 + 1):
            for cc in range(c1, c2 + 1):
                covered.add((rr, cc))
        covered.discard((r1, c1))
    keys = set(values) | set(color_at) | set(masters) | covered
    parts = ["<table>"]
    name = t.get("name")
    if name:
        parts.append(f"<caption>{_escape(name)}</caption>")
    if keys:
        max_r = max(r for r, _ in keys)
        max_c = max(c for _, c in keys)
        for r in range(max_r + 1):
            parts.append("<tr>")
            last = -1
            for c in range(max_c + 1):
                if ((r, c) in values or (r, c) in color_at
                        or (r, c) in masters or (r, c) in covered):
                    last = c
            for c in range(last + 1):
                if (r, c) in covered:
                    continue  # inside a span: the master cell owns it
                attrs = ""
                m = masters.get((r, c))
                if m:
                    rs, cs, _mv = m
                    if rs > 1:
                        attrs += f' rowspan="{rs}"'
                    if cs > 1:
                        attrs += f' colspan="{cs}"'
                hexkey = color_at.get((r, c))
                if hexkey:
                    attrs += (' style="background-color:'
                              f'#{_attr_escape(hexkey)}"')
                v = values.get((r, c))
                if v is None and m is not None:
                    v = m[2]
                if v is None or (isinstance(v, str) and not v.strip()):
                    body = ""  # the " " merged-master sentinel included
                else:
                    body = _escape(v)
                    href = links.get((r, c))
                    if href:
                        body = f'<a href="{_attr_escape(href)}">{body}</a>'
                parts.append(f"<td{attrs}>{body}</td>")
            parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def make_document(extraction: dict) -> str:
    """Extraction record (the ``extraction_json`` shape) -> a standalone
    HTML document whose re-extraction reproduces the record's title and
    table family."""
    if not isinstance(extraction, dict):
        extraction = {}
    title = extraction.get("title")
    parts = ["<!DOCTYPE html><html><head><meta charset=\"utf-8\">"]
    if title:
        parts.append(f"<title>{_escape(title)}</title>")
    parts.append("</head><body>")
    if title:
        parts.append(f"<h1>{_escape(title)}</h1>")
    for t in extraction.get("tables") or []:
        if isinstance(t, dict):
            parts.append(_table_html(t))
    parts.append("</body></html>")
    return "".join(parts)
