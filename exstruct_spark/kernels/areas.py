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

from exstruct_spark.kernels.a1 import parse_range_zero_based


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
