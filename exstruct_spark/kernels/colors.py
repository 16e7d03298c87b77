"""CSS color normalization -> canonical 6-hex keys (F1 parity).

The web analogue of the reference's color-key normalization
(``core/cells.py:593-686`` ``_normalize_color_key`` / ``_normalize_rgb``):
every representable background color collapses to an UPPERCASE 6-char RGB
hex string so the per-table ``colors_map`` (color -> positions, reference
``core/cells.py:277-310``) groups visually identical cells under one key.

Handled inputs (HTML's color surface instead of Excel's ARGB/theme ints):
``#RGB`` / ``#RRGGBB`` / ``#RRGGBBAA`` (alpha dropped, like ARGB->RGB),
``rgb()/rgba()`` functional notation, and the CSS named colors that appear
in real markup.  Unknown/unparseable values return None (never raise).
"""

from __future__ import annotations

import re
from typing import Optional

# CSS Level 1/2 basic named colors + the handful of extended names common
# in crawled markup.  Values are canonical 6-hex (uppercase).
NAMED_COLORS = {
    "black": "000000", "silver": "C0C0C0", "gray": "808080", "grey": "808080",
    "white": "FFFFFF", "maroon": "800000", "red": "FF0000", "purple": "800080",
    "fuchsia": "FF00FF", "green": "008000", "lime": "00FF00", "olive": "808000",
    "yellow": "FFFF00", "navy": "000080", "blue": "0000FF", "teal": "008080",
    "aqua": "00FFFF", "orange": "FFA500", "pink": "FFC0CB", "gold": "FFD700",
    "beige": "F5F5DC", "brown": "A52A2A", "coral": "FF7F50", "crimson": "DC143C",
    "indigo": "4B0082", "ivory": "FFFFF0", "khaki": "F0E68C", "lavender": "E6E6FA",
    "magenta": "FF00FF", "cyan": "00FFFF", "salmon": "FA8072", "tan": "D2B48C",
    "transparent": None,  # explicit no-background
}

_HEX_RE = re.compile(r"^#?([0-9a-fA-F]{3}|[0-9a-fA-F]{6}|[0-9a-fA-F]{8})$")
_RGB_FN_RE = re.compile(
    r"^rgba?\(\s*(\d{1,3})\s*[, ]\s*(\d{1,3})\s*[, ]\s*(\d{1,3})", re.I
)
# background / background-color declarations inside a style attribute;
# first color-looking token of the value wins (shorthand-safe enough for
# crawled markup; a full CSS parser is out of scope)
_STYLE_BG_RE = re.compile(
    r"(?:^|;)\s*background(?:-color)?\s*:\s*([^;]+)", re.I
)
_COLOR_TOKEN_RE = re.compile(
    r"#[0-9a-fA-F]{3,8}|rgba?\([^)]*\)|[a-zA-Z]+"
)


def normalize_color(raw: Optional[str]) -> Optional[str]:
    """Raw CSS color -> canonical uppercase 6-hex key, or None.

    Parity: ``_normalize_color_key`` (reference core/cells.py:593-611) —
    strip, drop the alpha channel of 8-digit values, uppercase.
    """
    if not raw:
        return None
    s = raw.strip()
    if not s:
        return None
    m = _HEX_RE.match(s)
    if m:
        h = m.group(1).upper()
        if len(h) == 3:
            return "".join(ch * 2 for ch in h)
        if len(h) == 8:
            return h[:6]  # CSS #RRGGBBAA: drop trailing alpha
        return h
    m = _RGB_FN_RE.match(s)
    if m:
        r, g, b = (min(int(x), 255) for x in m.groups())
        return f"{r:02X}{g:02X}{b:02X}"
    return NAMED_COLORS.get(s.lower())


def cell_background(attrs: dict) -> Optional[str]:
    """Element attrs -> normalized background color key (or None).

    CSS cascade order: an inline ``style`` declaration WINS over the
    legacy ``bgcolor`` attribute (presentational hints are the lowest
    priority in every browser); ``bgcolor`` is the fallback.
    """
    style = attrs.get("style")
    if style:
        # last VALID declaration wins (CSS cascade within one style
        # attribute; invalid values are dropped at parse time)
        for m in reversed(list(_STYLE_BG_RE.finditer(style))):
            for tok in _COLOR_TOKEN_RE.findall(m.group(1)):
                key = normalize_color(tok)
                if key:
                    return key
    bg = attrs.get("bgcolor")
    if bg:
        return normalize_color(bg)
    return None
