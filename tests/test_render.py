"""S7 render sink: extracted table grids -> real PNG files (structural
raster — gridlines / colors_map fills / ink bars / merged outlines — via
the repo's own encoder; the reference's COM->PDF->PNG pipeline analogue
with reference-exact filename sanitization, io/__init__.py:181-184)."""

import numpy as np
import pytest

from exstruct_spark.kernels.png import decode_png
from exstruct_spark.kernels.render import (
    GRID_RGB,
    INK_RGB,
    MERGE_RGB,
    render_doc_tables,
    render_table_png,
    sanitize_filename,
)


def test_sanitize_filename_reference_parity():
    """Same unsafe class + replacement as io/__init__.py:181-184."""
    assert sanitize_filename('a\\b/c:d*e?f"g<h>i|j') == "a_b_c_d_e_f_g_h_i_j"
    assert sanitize_filename("Sheet 1 (final)") == "Sheet 1 (final)"
    assert sanitize_filename("") == "doc"
    assert sanitize_filename(None) == "doc"


def test_render_table_known_pixels():
    """A hand-built 2x3 table renders deterministically: gridlines on
    every boundary, the colors_map fill in the right cell, an ink bar
    sized by text length, the merged-range outline in overlay blue."""
    table = {
        "id": 0,
        "range": "A1:C2",
        "rows": [
            {"r": 1, "c": {"0": "xxxxxxxxxx", "2": "y"}},
        ],
        "colors_map": {"FF0000": [[2, 1]]},     # row 2 (1-based), col 1
        "merged_ranges": ["B1:C1"],
    }
    img = render_table_png(table, cell_w=24, cell_h=12)
    assert img.shape == (2 * 12 + 1, 3 * 24 + 1, 3)
    # gridlines at every cell boundary
    assert (img[0, 5] == GRID_RGB).all()
    assert (img[12, 10] == GRID_RGB).all()
    assert (img[-1, -1] == GRID_RGB).all()
    # red fill inside cell (row idx 1, col 1), untouched white elsewhere
    assert (img[12 + 5, 24 + 5] == (255, 0, 0)).all()
    assert (img[12 + 5, 5] == (255, 255, 255)).all()
    # ink bar: 10-char cell fills the full bar width, 1-char cell is thin
    y = 12 - 3
    full_bar = (img[y, 2:2 + 20] == INK_RGB).all(axis=1).sum()
    thin_bar = (img[y, 2 * 24 + 2:2 * 24 + 22] == INK_RGB).all(axis=1).sum()
    assert full_bar == 20 and thin_bar == 2
    # merged outline rides ON TOP of the B1:C1 region border
    assert (img[0, 24 + 10] == MERGE_RGB).all()
    assert (img[12, 24 + 10] == MERGE_RGB).all()


def test_render_caps_and_fallbacks():
    with pytest.raises(ValueError, match="max_px"):
        render_table_png({"range": "A1:ZZ9999", "rows": []})
    with pytest.raises(ValueError):
        render_table_png({"range": "not-a-range", "rows": []})
    # a doc with one bad and one good table keeps the good one
    import json

    ejson = json.dumps({
        "tables": [
            {"id": 0, "range": "bogus", "rows": []},
            {"id": 1, "range": "A1:B2",
             "rows": [{"r": 1, "c": {"0": 1}}]},
        ]
    })
    outs = render_doc_tables("https://ex.com/a", ejson)
    assert len(outs) == 1
    name, png, w, h, n_glyphs, truncated = outs[0]
    assert name == "ex.com_a_001_t1.png"
    assert decode_png(png).shape == (h, w, 3)
    assert n_glyphs == 1 and truncated is False   # the single "1" cell


def test_render_stage_and_file_export(spark, tmp_path):
    """End-to-end through the engine: rich pages -> extraction ->
    render_tables_stage (mapInPandas) -> real multi-file PNG export with
    sanitized ordered names; every file decodes byte-consistently."""
    import glob

    from exstruct_spark.engine import extract_stage
    from exstruct_spark.media import export_rendered_pngs, render_tables_stage
    from exstruct_spark.pages import spark_rich_pages

    pages = spark_rich_pages(spark, 14, partitions=4)
    extracted = extract_stage(pages)
    rendered = render_tables_stage(extracted)
    pdf = rendered.toPandas()
    assert len(pdf) > 0
    assert pdf["file_name"].is_unique
    for _, row in pdf.head(5).iterrows():
        img = decode_png(bytes(row.png))
        assert img.shape == (row.height, row.width, 3)
        # every render carries the gridline frame
        assert (img[0, 0] == GRID_RGB).all()

    out_dir = str(tmp_path / "pngs")
    n = export_rendered_pngs(rendered, out_dir)
    files = glob.glob(out_dir + "/*.png")
    assert n == len(files) == len(pdf)
    sample = sorted(files)[0]
    with open(sample, "rb") as fh:
        img = decode_png(fh.read())
    assert img.ndim == 3


def test_render_text_glyphs_known_pixels():
    """The 5x7 bitmap font renders cell text deterministically: '7' has
    a full 5-px top bar then a right-leaning stroke; '1' is a centered
    stem.  Glyphs start at (+2, +2) inside the cell, advance 6 px, and
    coexist with the ink bar (glyph rows end above it)."""
    from exstruct_spark.kernels.render import TEXT_RGB

    img = render_table_png({
        "id": 0, "range": "A1:A1",
        "rows": [{"r": 1, "c": {"0": 71}}],
    }, cell_w=24, cell_h=12)
    # '7' top row: bits 11111 -> x 2..6 at y=2
    assert (img[2, 2:7] == TEXT_RGB).all()
    # '7' second row: 00001 -> only x=6
    assert (img[3, 6] == TEXT_RGB).all()
    assert (img[3, 2] == (255, 255, 255)).all()
    # '1' second glyph at x=8: top row 00100 -> x=10 only
    assert (img[2, 10] == TEXT_RGB).all()
    assert (img[2, 8] == (255, 255, 255)).all()
    # ink bar still present below the glyph rows
    assert (img[12 - 3, 2] == INK_RGB).all()


def test_render_glyph_budget_clipping_and_short_cells():
    from exstruct_spark.kernels.render import (
        TEXT_RGB,
        render_table_png_stats,
    )

    # width clip: 24-px cell fits 3 glyphs of a long value
    img, n, trunc = render_table_png_stats({
        "id": 0, "range": "A1:A1",
        "rows": [{"r": 1, "c": {"0": "ABCDEFGH"}}],
    }, cell_w=24, cell_h=12)
    assert (n, trunc) == (3, False)
    # glyph budget: cap at 1 glyph across the image -> truncated flag
    img, n, trunc = render_table_png_stats({
        "id": 0, "range": "A1:B1",
        "rows": [{"r": 1, "c": {"0": "AB", "1": "CD"}}],
    }, max_glyphs=1)
    assert n == 1 and trunc is True
    # unknown character renders the hollow-box glyph (corners inked)
    img, n, _ = render_table_png_stats({
        "id": 0, "range": "A1:A1",
        "rows": [{"r": 1, "c": {"0": "é"}}],
    })
    assert n == 1
    assert (img[2, 2] == TEXT_RGB).all() and (img[2, 6] == TEXT_RGB).all()
    assert (img[8, 2] == TEXT_RGB).all()
    # cells too short for a glyph row render bars only, never crash
    img, n, trunc = render_table_png_stats({
        "id": 0, "range": "A1:A1",
        "rows": [{"r": 1, "c": {"0": "AB"}}],
    }, cell_h=8)
    assert (n, trunc) == (0, False)
    assert (img[8 - 3, 2] == INK_RGB).all()


def test_glyph_budget_ignores_spaces():
    """Review finding: spaces advance the pen but must not consume the
    glyph budget or inflate the n_glyphs metric."""
    from exstruct_spark.kernels.render import render_table_png_stats

    img, n, trunc = render_table_png_stats({
        "id": 0, "range": "A1:A1",
        "rows": [{"r": 1, "c": {"0": "A B"}}],
    }, cell_w=40, cell_h=12)
    assert (n, trunc) == (2, False)
