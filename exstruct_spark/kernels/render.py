"""S7 twin: render extracted table grids to PNG image files.

The reference's render sink drives Excel -> per-sheet PDF -> PNG pages
through COM + pdfium with sanitized, ordered filenames
(render/__init__.py:602-658, io/__init__.py:181-184).  Neither COM nor a
typographic rasterizer exists here, so the Spark-first twin renders the
STRUCTURAL content this engine actually extracts — the cell grid,
background fills (colors_map), merged ranges and per-cell ink density —
onto a numpy canvas and emits real PNG bytes through the repo's own
encoder (kernels/png.py).  Deliberate delta from the reference, stated
plainly: this is a structural visualization (gridlines / fills / ink
bars), not a font renderer; text glyphs are represented by an ink bar
proportional to the cell's text length.

Filename rule is reference-exact (io/__init__.py:181-184): the same
unsafe-character class replaced by '_', with the same non-empty
fallback semantics (our documents are pages, so the fallback word is
'doc' instead of 'sheet').

Coordinate conventions match the extraction JSON: sparse rows carry
r 1-based / c 0-based keys, colors_map positions are (row 1-based,
col 0-based), ``range``/``merged_ranges`` are A1 strings.
"""

from __future__ import annotations

import re

import numpy as np

from exstruct_spark.kernels.a1 import parse_range_zero_based
from exstruct_spark.kernels.png import encode_png

_UNSAFE_RE = re.compile(r"[\\/:*?\"<>|]")

GRID_RGB = (96, 96, 96)
INK_RGB = (32, 32, 32)
MERGE_RGB = (0, 64, 192)


def sanitize_filename(name: str) -> str:
    """Reference io/__init__.py:181-184 parity: unsafe characters -> '_',
    empty -> fallback."""
    safe = _UNSAFE_RE.sub("_", name or "")
    return safe or "doc"


def _hex_rgb(h: str):
    h = (h or "").strip().lstrip("#")
    if len(h) != 6:
        return None
    try:
        return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))
    except ValueError:
        return None


def render_table_png(
    table: dict, cell_w: int = 24, cell_h: int = 12, max_px: int = 1 << 22
) -> np.ndarray:
    """One extracted table dict -> (H, W, 3) uint8 raster.

    Layout: white canvas, 1-px gridlines on every cell boundary, cell
    backgrounds from ``colors_map``, a bottom-aligned ink bar whose
    width tracks the cell text length (capped at the cell), and a
    merged-range overlay outline.  ``max_px`` is the same
    caps-not-crashes bound the decoders use."""
    r1, c1, r2, c2 = parse_range_zero_based(table.get("range") or "")
    n_rows, n_cols = r2 - r1 + 1, c2 - c1 + 1
    h, w = n_rows * cell_h + 1, n_cols * cell_w + 1
    if h * w > max_px:
        raise ValueError(f"render {w}x{h} exceeds max_px cap")
    img = np.full((h, w, 3), 255, dtype=np.uint8)

    # cell backgrounds (colors_map: row 1-based, col 0-based, absolute)
    for hexcolor, positions in (table.get("colors_map") or {}).items():
        rgb = _hex_rgb(hexcolor)
        if rgb is None:
            continue
        for pos in positions:
            rr, cc = int(pos[0]) - 1 - r1, int(pos[1]) - c1
            if 0 <= rr < n_rows and 0 <= cc < n_cols:
                img[rr * cell_h + 1:(rr + 1) * cell_h,
                    cc * cell_w + 1:(cc + 1) * cell_w] = rgb

    # ink bars: text length -> bar width along the cell bottom
    for row in table.get("rows") or []:
        rr = int(row.get("r", 0)) - 1 - r1
        if not 0 <= rr < n_rows:
            continue
        for ckey, val in (row.get("c") or {}).items():
            try:
                cc = int(ckey) - c1
            except ValueError:
                continue  # alpha_keys mode: letters; render numeric only
            if not 0 <= cc < n_cols or val is None:
                continue
            frac = min(len(str(val)), 10) / 10.0
            bar = max(1, int((cell_w - 4) * frac))
            y = rr * cell_h + cell_h - 3
            x = cc * cell_w + 2
            img[y:y + 2, x:x + bar] = INK_RGB

    # gridlines
    img[::cell_h, :] = GRID_RGB
    img[:, ::cell_w] = GRID_RGB
    img[-1, :] = GRID_RGB
    img[:, -1] = GRID_RGB

    # merged-range outlines (A1 strings, absolute coordinates)
    for rng in table.get("merged_ranges") or []:
        try:
            mr1, mc1, mr2, mc2 = parse_range_zero_based(rng)
        except ValueError:
            continue
        y0 = max(0, (mr1 - r1) * cell_h)
        y1 = min(h - 1, (mr2 - r1 + 1) * cell_h)
        x0 = max(0, (mc1 - c1) * cell_w)
        x1 = min(w - 1, (mc2 - c1 + 1) * cell_w)
        if y0 >= y1 or x0 >= x1:
            continue
        img[y0, x0:x1 + 1] = MERGE_RGB
        img[y1, x0:x1 + 1] = MERGE_RGB
        img[y0:y1 + 1, x0] = MERGE_RGB
        img[y0:y1 + 1, x1] = MERGE_RGB
    return img


def render_doc_tables(url: str, extraction_json: str) -> list:
    """All tables of one document -> [(file_name, png_bytes, w, h)],
    ordered by table id with the reference's ordered-numbered naming
    shape (``{safe}_{index}_t{id}.png`` — render/__init__.py:640-658
    keeps outputs ordered and collision-free the same way)."""
    import json

    try:
        ex = json.loads(extraction_json) if extraction_json else {}
    except ValueError:
        return []
    from urllib.parse import urlparse

    parsed = urlparse(url or "")
    base = sanitize_filename(
        (parsed.netloc + parsed.path).strip("/").replace("/", "_")
    )
    out = []
    for i, table in enumerate(ex.get("tables") or []):
        try:
            img = render_table_png(table)
        except ValueError:
            continue  # fallback-not-fail: unrenderable table is skipped
        name = f"{base}_{i:03d}_t{table.get('id', i)}.png"
        out.append((name, encode_png(img), img.shape[1], img.shape[0]))
    return out
