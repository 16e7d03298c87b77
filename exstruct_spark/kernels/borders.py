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

  * style declarations resolve per-side LAST-WINS (ADVICE r6): each of
    the four sides tracks a width facet and a style facet; ``border``
    and ``border-top/right/bottom/left`` shorthands set both facets,
    ``border[-side]-width`` / ``border[-side]-style`` set one.  A side
    is visible when neither facet was last set invisible and at least
    one was last set visible — so a later ``border: none`` (inline or
    higher-priority rule, already ordered by kernels/css.py) really
    resets an earlier visible border;
  * a declaration's own visibility verdict: invisible when the value
    contains ``none``/``hidden`` or every numeric token is 0, else
    visible (``border-width: 1px`` alone stays visible — the
    deliberate heuristic, browsers' initial ``style: none`` is NOT
    modeled);
  * ``border`` attribute: integer > 0 (the HTML presentational hint) —
    consulted only when NO style declaration touched any border facet
    (CSS beats presentational hints in the real cascade).
"""

from __future__ import annotations

import re

_BORDER_PROP_RE = re.compile(
    r"^border(?:-(top|right|bottom|left))?(?:-(width|style))?$"
)
_NUM_TOK_RE = re.compile(r"^[\d.]+[a-z%]*$")
_ZERO_TOK_RE = re.compile(r"^0*\.?0*(?:px|pt|em|rem|%|in|cm|mm)?$")

_SIDES = ("top", "right", "bottom", "left")


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
    style = attrs.get("style")
    touched = False
    if style:
        # per-side (width, style) facets, last declaration wins; None =
        # unset.  The merged style string from kernels/css.py is already
        # in cascade order, so a plain in-order fold IS the cascade.
        w: dict = dict.fromkeys(_SIDES)
        s: dict = dict.fromkeys(_SIDES)
        for decl in style.split(";"):
            prop, sep, val = decl.partition(":")
            if not sep:
                continue
            m = _BORDER_PROP_RE.match(prop.strip().lower())
            if not m:
                continue
            touched = True
            side, facet = m.group(1), m.group(2)
            vis = _value_visible(val)
            sides = (side,) if side else _SIDES
            if facet is None and not vis and any(
                t in ("none", "hidden") for t in val.lower().split()
            ):
                # shorthand 'none'/'hidden': style -> none, width ->
                # initial (medium, i.e. unset) — a later per-side
                # border-X-style: solid must become visible again
                for sd in sides:
                    s[sd] = False
                    w[sd] = None
                continue
            for sd in sides:
                if facet != "style":
                    w[sd] = vis
                if facet != "width":
                    s[sd] = vis
        if touched:
            for sd in _SIDES:
                ws, ss = w[sd], s[sd]
                if ws is False or ss is False:
                    continue
                if ws or ss:
                    return True
    if not touched:
        b = attrs.get("border")
        if b is not None:
            try:
                if int(str(b).strip()) > 0:
                    return True
            except ValueError:
                pass
    return False
