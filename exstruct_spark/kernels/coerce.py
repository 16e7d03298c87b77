"""Numeric coercion of cell text.

Behavioural parity with the reference's ``_coerce_numeric_preserve_format``
(core/cells.py:1946-1969): integer-looking strings become ``int``,
decimal-looking strings become ``float`` via ``Decimal`` (so ``"1.50"`` ->
``1.5`` and ``"123"`` stays ``int`` 123, never ``123.0``); everything else
(dates, mixed text) stays ``str``.  Cell value domain is
``int | float | str`` only (reference models/__init__.py:122-124).

Implementation is original: thousands separators are accepted for both
forms, and scientific notation is deliberately NOT coerced (the reference
does not either).
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

_INT_RE = re.compile(r"^[+-]?(?:\d{1,3}(?:,\d{3})+|\d+)$")
_FLOAT_RE = re.compile(r"^[+-]?(?:\d{1,3}(?:,\d{3})+|\d*)\.\d+$")


_NUM_LEAD = frozenset("+-.0123456789")


def coerce_scalar(s: str):
    """Coerce one stripped cell string to int/float/str."""
    if not s:
        return s
    t = s.strip()
    # fast reject: neither numeric form can start with anything else,
    # and most cells are words (r8 — skips both regex probes for them)
    if not t or t[0] not in _NUM_LEAD:
        return s
    if _INT_RE.match(t):
        try:
            return int(t.replace(",", ""))
        except ValueError:  # pragma: no cover - regex guarantees
            return s
    if _FLOAT_RE.match(t):
        try:
            return float(Decimal(t.replace(",", "")))
        except (InvalidOperation, ValueError):  # pragma: no cover
            return s
    return s
