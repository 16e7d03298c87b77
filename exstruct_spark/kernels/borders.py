"""CSS/attribute border signal for grid detection (G1 parity).

The reference treats per-cell border presence as the PRIMARY table
evidence: it builds boolean border maps and clusters them 4-connected
into candidate rectangles (``load_border_maps_xlsx`` /
``_detect_border_clusters_numpy``, reference core/cells.py:940-1078).
The web twin: a div-layout whose cells carry ``style="border:1px solid"``
or a ``border="1"`` attribute expresses its table-ness through borders,
not through uniform child structure — so the border mask must feed the
same cluster detector the structural signal does.

This module answers one question per element: does it declare a VISIBLE
border?  Heuristic CSS evaluation (not a CSS engine), deterministic:

  * ``border`` attribute: integer > 0 (the HTML presentational hint);
  * style declarations whose property is ``border``, ``border-top/right/
    bottom/left``, ``border-style`` or ``border-width``: visible unless
    the value contains ``none``/``hidden`` or every numeric token is 0.
"""

from __future__ import annotations

import re

_BORDER_PROP_RE = re.compile(
    r"^border(?:-(?:top|right|bottom|left))?(?:-(?:width|style))?$"
)
_NUM_TOK_RE = re.compile(r"^[\d.]+[a-z%]*$")
_ZERO_TOK_RE = re.compile(r"^0*\.?0*(?:px|pt|em|rem|%|in|cm|mm)?$")


def _value_visible(value: str) -> bool:
    toks = value.strip().lower().split()
    if not toks:
        return False
    if any(t in ("none", "hidden") for t in toks):
        return False
    nums = [t for t in toks if _NUM_TOK_RE.match(t)]
    if nums and all(_ZERO_TOK_RE.match(t) for t in nums):
        return False  # border: 0 / border-width: 0px
    return True


def has_visible_border(attrs: dict) -> bool:
    """True when the element's attributes declare a visible border."""
    if not attrs:
        return False
    b = attrs.get("border")
    if b is not None:
        try:
            if int(str(b).strip()) > 0:
                return True
        except ValueError:
            pass
    style = attrs.get("style")
    if not style:
        return False
    for decl in style.split(";"):
        prop, sep, val = decl.partition(":")
        if not sep:
            continue
        if _BORDER_PROP_RE.match(prop.strip().lower()) and _value_visible(val):
            return True
    return False
