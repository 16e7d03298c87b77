"""Region-scoped row slicing: the PrintAreaView analogue.

Parity (behaviour, not code) with the reference's print-area machinery:
  * ``filter_row_to_area``  ~ ``_filter_row_to_area`` (reference
    io/__init__.py:204-235): keep a row only if its 1-based ``r`` lies in
    the area's row band, keep only cells/links whose integer column key
    lies in the column band, optionally RE-BASE keys and row index to the
    area origin (``normalize``), drop rows that end up empty.  Non-integer
    column keys are skipped exactly like the reference's ``except:
    continue`` (alpha-keyed rows fall through to raw views).
  * ``area_views``          ~ PrintAreaView rows/table slicing (reference
    models/__init__.py:437-455): one view per declared A1 area per table,
    carrying the sliced rows.

Areas are plain A1 range strings (the user-declared print range), parsed
with the same helper the table artifacts use.
"""

from __future__ import annotations

from typing import Optional

from exstruct_spark.kernels.a1 import make_range, parse_range_zero_based


def auto_areas(tables: list) -> list:
    """Derive auto print-area A1 strings from document structure: each
    table's grid is split at empty-row gaps into contiguous row bands,
    one area per band spanning the table's full column range.

    The web analogue of the reference's COM-computed ``auto_print_areas``
    (page-break areas, models/__init__.py:199-206, core/pipeline.py:
    677-744): a page break splits the sheet into row bands; here a run of
    empty rows plays the page break.  A gapless table yields exactly its
    own range.  Deterministic: tables in id order, bands top-down;
    duplicate ranges (two tables sharing a band footprint) are emitted
    once, first-seen order."""
    seen: set = set()
    out: list = []
    for t in tables:
        rows = t.get("rows", [])
        if not rows:
            continue
        try:
            _r1, c1, _r2, c2 = parse_range_zero_based(t["range"])
        except Exception:
            continue
        occupied = {row["r"] for row in rows}  # 1-based row indices
        # the scan's content definition applies here too (review r3):
        # rows covered by a merged region, and rows carrying only
        # background colors, are NOT empty — a band boundary must never
        # cut through them (colors_map positions are (r 1-based, c))
        for item in t.get("merged_cells", {}).get("items", []):
            occupied.update(range(item[0], item[2] + 1))
        for positions in t.get("colors_map", {}).values():
            occupied.update(p[0] for p in positions)
        rs = sorted(occupied)
        bands = []
        start = prev = rs[0]
        for r in rs[1:]:
            if r > prev + 1:
                bands.append((start, prev))
                start = r
            prev = r
        bands.append((start, prev))
        for bs, be in bands:
            a1 = make_range(bs - 1, c1, be - 1, c2)
            if a1 not in seen:
                seen.add(a1)
                out.append(a1)
    return out


def filter_row_to_area(
    row: dict, area: tuple, normalize: bool = False
) -> Optional[dict]:
    """One sparse CellRow dict -> its slice inside ``area`` (or None).

    ``area`` is (r1, c1, r2, c2) 0-based inclusive; rows carry 1-based
    ``r`` and 0-based string column keys.  With ``normalize`` the slice is
    re-based to the area origin: column keys become ``str(col - c1)`` and
    the row index becomes ``row.r - r1`` (reference io/__init__.py:233).
    """
    r1, c1, r2, c2 = area
    r = row["r"]
    if not (r1 + 1 <= r <= r2 + 1):
        return None
    cells: dict = {}
    for key, value in row.get("c", {}).items():
        try:
            col = int(key)
        except (TypeError, ValueError):
            continue
        if c1 <= col <= c2:
            cells[str(col - c1) if normalize else key] = value
    links: dict = {}
    for key, href in row.get("links", {}).items():
        try:
            col = int(key)
        except (TypeError, ValueError):
            continue
        if c1 <= col <= c2:
            links[str(col - c1) if normalize else key] = href
    if not cells and not links:
        return None
    # reference re-basing: new r = row.r - area.r1 (1-based area origin),
    # so the area's first row normalizes to 0 (io/__init__.py:233)
    out: dict = {"r": r - (r1 + 1) if normalize else r, "c": cells}
    if links:
        out["links"] = links
    return out


def area_views(
    tables: list, areas: tuple, normalize: bool = False
) -> list:
    """Table artifacts x declared A1 areas -> PrintAreaView-shaped dicts.

    Each view records the area string, the tables intersecting it (by id)
    with their sliced rows, and the normalize flag when re-basing was
    applied.  Unparseable areas are skipped (fallback-not-fail).
    """
    views: list = []
    for area_str in areas:
        try:
            bounds = parse_range_zero_based(area_str)
        except Exception:
            continue
        view: dict = {"area": area_str}
        sliced_tables = []
        for t in tables:
            rows = [
                sliced
                for row in t.get("rows", [])
                if (sliced := filter_row_to_area(row, bounds, normalize))
                is not None
            ]
            if rows:
                sliced_tables.append({"table_id": t["id"], "rows": rows})
        if sliced_tables:
            view["tables"] = sliced_tables
        if normalize:
            view["normalized"] = True
        views.append(view)
    return views
