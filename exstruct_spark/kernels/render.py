"""S7 twin: render extracted table grids to PNG image files.

The reference's render sink drives Excel -> per-sheet PDF -> PNG pages
through COM + pdfium with sanitized, ordered filenames
(render/__init__.py:602-658, io/__init__.py:181-184).  Neither COM nor a
typographic rasterizer exists here, so the Spark-first twin renders the
STRUCTURAL content this engine actually extracts — the cell grid,
background fills (colors_map), merged ranges and per-cell ink density —
onto a numpy canvas and emits real PNG bytes through the repo's own
encoder (kernels/png.py).  Since round 5 cell TEXT renders too, via a
stdlib 5x7 bitmap font (classic HD44780-style public patterns — digits,
A-Z with lowercase folded up, common punctuation; anything else draws a
hollow box), so the PNGs are legible, not just structural.  Remaining
delta from the reference, stated plainly: fixed-cell bitmap glyphs, not
typographic COM/pdfium rendering.  The ink bar under the glyph row is
kept (text-length at a glance, and it survives cells too short for
glyphs).  Per-image glyph budget is a cap-not-crash bound surfaced in
the render metrics.

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
TEXT_RGB = (16, 16, 16)

# 5x7 bitmap font, one int per row, bit 4 = leftmost column.  The
# patterns are the classic public-domain 5x7 character-LCD shapes.
_GLYPHS = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11100, 0b10010, 0b10001, 0b10001, 0b10001, 0b10010, 0b11100),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    ".": (0, 0, 0, 0, 0, 0b01100, 0b01100),
    ",": (0, 0, 0, 0, 0b01100, 0b00100, 0b01000),
    ":": (0, 0b01100, 0b01100, 0, 0b01100, 0b01100, 0),
    ";": (0, 0b01100, 0b01100, 0, 0b01100, 0b00100, 0b01000),
    "!": (0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0, 0b00100),
    "?": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0, 0b00100),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    "+": (0, 0b00100, 0b00100, 0b11111, 0b00100, 0b00100, 0),
    "*": (0, 0b10101, 0b01110, 0b11111, 0b01110, 0b10101, 0),
    "/": (0b00001, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b10000),
    "=": (0, 0, 0b11111, 0, 0b11111, 0, 0),
    "<": (0b00010, 0b00100, 0b01000, 0b10000, 0b01000, 0b00100, 0b00010),
    ">": (0b01000, 0b00100, 0b00010, 0b00001, 0b00010, 0b00100, 0b01000),
    "(": (0b00010, 0b00100, 0b01000, 0b01000, 0b01000, 0b00100, 0b00010),
    ")": (0b01000, 0b00100, 0b00010, 0b00010, 0b00010, 0b00100, 0b01000),
    "%": (0b11000, 0b11001, 0b00010, 0b00100, 0b01000, 0b10011, 0b00011),
    "#": (0b01010, 0b01010, 0b11111, 0b01010, 0b11111, 0b01010, 0b01010),
    "$": (0b00100, 0b01111, 0b10100, 0b01110, 0b00101, 0b11110, 0b00100),
    "'": (0b00100, 0b00100, 0b01000, 0, 0, 0, 0),
    '"': (0b01010, 0b01010, 0, 0, 0, 0, 0),
    "_": (0, 0, 0, 0, 0, 0, 0b11111),
    "&": (0b01100, 0b10010, 0b10100, 0b01000, 0b10101, 0b10010, 0b01101),
    "@": (0b01110, 0b10001, 0b00001, 0b01101, 0b10101, 0b10101, 0b01110),
    "[": (0b01110, 0b01000, 0b01000, 0b01000, 0b01000, 0b01000, 0b01110),
    "]": (0b01110, 0b00010, 0b00010, 0b00010, 0b00010, 0b00010, 0b01110),
}
# any character outside the table renders as a hollow box
_BOX_GLYPH = (0b11111, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11111)
GLYPH_W, GLYPH_H, GLYPH_ADVANCE = 5, 7, 6


def _glyph_bits(ch: str):
    g = _GLYPHS.get(ch)
    if g is None:
        g = _GLYPHS.get(ch.upper(), _BOX_GLYPH)
    return g


def draw_text(img: np.ndarray, y: int, x: int, text: str, rgb,
              x_limit: int, budget: int):
    """Draw ``text`` in the 5x7 font at (y, x), advancing 6 px per
    glyph, stopping at ``x_limit`` (right clip) or when the glyph
    ``budget`` runs out.  Returns (glyphs drawn, budget hit?) — a width
    clip is normal layout, a budget stop is a logged cap."""
    drawn = 0
    for ch in text:
        if x + GLYPH_W > x_limit:
            break
        if budget - drawn <= 0:
            return drawn, True
        if ch != " ":  # spaces advance but cost no budget and no count
            rows = _glyph_bits(ch)
            for ry, bits in enumerate(rows):
                if not bits:
                    continue
                for cx in range(GLYPH_W):
                    if bits & (1 << (GLYPH_W - 1 - cx)):
                        img[y + ry, x + cx] = rgb
            drawn += 1
        x += GLYPH_ADVANCE
    return drawn, False


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
    table: dict, cell_w: int = 24, cell_h: int = 12, max_px: int = 1 << 22,
    max_glyphs: int = 4096,
) -> np.ndarray:
    """One extracted table dict -> (H, W, 3) uint8 raster (see
    ``render_table_png_stats`` for the glyph accounting)."""
    return render_table_png_stats(table, cell_w, cell_h, max_px,
                                  max_glyphs)[0]


def render_table_png_stats(
    table: dict, cell_w: int = 24, cell_h: int = 12, max_px: int = 1 << 22,
    max_glyphs: int = 4096,
):
    """One extracted table dict -> ((H, W, 3) uint8 raster, glyphs
    drawn, glyph budget truncated?).

    Layout: white canvas, 1-px gridlines on every cell boundary, cell
    backgrounds from ``colors_map``, the cell text in the 5x7 bitmap
    font (clipped to the cell; skipped entirely when the cell is too
    short for a glyph row), a bottom-aligned ink bar whose width tracks
    the cell text length, and a merged-range overlay outline.
    ``max_px`` and ``max_glyphs`` are the same caps-not-crashes bounds
    the decoders use — when the glyph budget runs out remaining cells
    render bars only, and the truncation flag surfaces in the render
    metrics instead of failing the task."""
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

    # cell text (5x7 glyphs) + ink bars along the cell bottom
    glyphs_drawn = 0
    glyphs_truncated = False
    glyph_room = cell_h >= GLYPH_H + 4  # glyph row + padding + bar
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
            text = str(val)
            if glyph_room:
                budget = max_glyphs - glyphs_drawn
                if budget <= 0:
                    glyphs_truncated = True
                else:
                    n, hit = draw_text(
                        img, rr * cell_h + 2, cc * cell_w + 2, text,
                        TEXT_RGB, (cc + 1) * cell_w - 1, budget,
                    )
                    glyphs_drawn += n
                    glyphs_truncated = glyphs_truncated or hit
            frac = min(len(text), 10) / 10.0
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
    return img, glyphs_drawn, glyphs_truncated


def render_doc_tables(url: str, extraction_json: str) -> list:
    """All tables of one document -> [(file_name, png_bytes, w, h,
    n_glyphs, glyphs_truncated)], ordered by table id with the
    reference's ordered-numbered naming shape
    (``{safe}_{index}_t{id}.png`` — render/__init__.py:640-658 keeps
    outputs ordered and collision-free the same way).  The glyph count
    and cap flag are the render metrics (O3 discipline: caps are
    logged, never silent)."""
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
            img, n_glyphs, truncated = render_table_png_stats(table)
        except ValueError:
            continue  # fallback-not-fail: unrenderable table is skipped
        name = f"{base}_{i:03d}_t{table.get('id', i)}.png"
        out.append((name, encode_png(img), img.shape[1], img.shape[0],
                    n_glyphs, truncated))
    return out
