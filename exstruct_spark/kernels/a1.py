"""A1-notation helpers.

Parity targets: ``col_index_to_alpha`` (reference models/__init__.py:
569-600, bijective base-26 0-based index -> Excel letters) and
``parse_range_zero_based`` (core/ranges.py:25-48).  Range strings stay the
exchange format for table candidates (SURVEY.md §2.2 P8).
"""

from __future__ import annotations

import re

_RANGE_RE = re.compile(r"^(?:[^!]+!)?\$?([A-Z]+)\$?(\d+):\$?([A-Z]+)\$?(\d+)$")


def col_index_to_alpha(idx: int) -> str:
    """0-based column index -> Excel column letters (0->A, 25->Z, 26->AA)."""
    if idx < 0:
        raise ValueError(f"negative column index: {idx}")
    out = []
    n = idx + 1
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out.append(chr(ord("A") + rem))
    return "".join(reversed(out))


def alpha_to_col_index(alpha: str) -> int:
    """Excel letters -> 0-based column index."""
    n = 0
    for ch in alpha:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def make_range(r1: int, c1: int, r2: int, c2: int) -> str:
    """Zero-based bounds (inclusive) -> A1 range string like ``"B3:E9"``."""
    return f"{col_index_to_alpha(c1)}{r1 + 1}:{col_index_to_alpha(c2)}{r2 + 1}"


def parse_range_zero_based(rng: str):
    """A1 range (optionally ``Sheet!``-prefixed) -> (r1, c1, r2, c2) 0-based."""
    m = _RANGE_RE.match(rng.strip())
    if not m:
        raise ValueError(f"not an A1 range: {rng!r}")
    ca, ra, cb, rb = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
    return ra - 1, alpha_to_col_index(ca), rb - 1, alpha_to_col_index(cb)
