"""Nonempty-cell connected components + rectangle merging (G2/G3/O1).

Pure-Python parity with the reference's detection core:
  * ``nonempty_clusters``  ~ ``_nonempty_clusters`` (reference
    core/cells.py:1277-1320): bounding boxes of 4-neighbor connected
    components of nonempty cells.  The reference prefers a scipy labeling
    backend with this BFS as fallback (core/cells.py:1056-1157); scipy is
    absent in this environment, and per-document grids are tiny, so the
    BFS *is* the implementation (G3).  Operates on the sparse
    ``(r, c) -> value`` map the HTML grid pass already produces — no
    dense matrix materialization.
  * ``merge_rectangles``   ~ ``_merge_rectangles`` /
    ``_rectangles_overlap_for_merge`` (core/cells.py:1671-1717): merge
    overlapping rectangles while PRESERVING fully-contained regions
    (containment is not a merge — an inner table inside an outer layout
    region stays reported separately).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable


def nonempty_clusters(cells: Iterable) -> list:
    """Sparse (r, c) keys -> bounding boxes of 4-neighbor components.

    Returns [(r1, c1, r2, c2), ...] (inclusive, input coordinate space),
    in first-seen scan order of the component's seed cell (row-major over
    the sorted key set — deterministic).
    """
    occupied = set(cells)
    visited: set = set()
    boxes: list = []
    for seed in sorted(occupied):
        if seed in visited:
            continue
        q = deque([seed])
        visited.add(seed)
        r1, c1 = seed
        r2, c2 = seed
        while q:
            r, c = q.popleft()
            r1, r2 = min(r1, r), max(r2, r)
            c1, c2 = min(c1, c), max(c2, c)
            for nb in ((r + 1, c), (r - 1, c), (r, c + 1), (r, c - 1)):
                if nb in occupied and nb not in visited:
                    visited.add(nb)
                    q.append(nb)
        boxes.append((r1, c1, r2, c2))
    return boxes


def _overlap_for_merge(a: tuple, b: tuple) -> bool:
    """True when rectangles overlap and NEITHER fully contains the other
    (parity: _rectangles_overlap_for_merge, core/cells.py:1700-1717)."""
    contains = (
        a[0] <= b[0] and a[1] <= b[1] and a[2] >= b[2] and a[3] >= b[3]
    ) or (
        b[0] <= a[0] and b[1] <= a[1] and b[2] >= a[2] and b[3] >= a[3]
    )
    if contains:
        return False
    return not (a[1] > b[3] or a[3] < b[1] or a[0] > b[2] or a[2] < b[0])


def merge_rectangles(rects: Iterable) -> list:
    """Merge overlapping rectangles, preserving contained regions
    (parity: _merge_rectangles, core/cells.py:1671-1697 — same sorted
    order, same first-match union loop).  DELIBERATE deviation: the
    reference's single pass can leave a grown rectangle overlapping an
    earlier one (chained merges); we repeat the pass to a fixpoint so the
    result is actually merge-stable (hypothesis-verified)."""
    current = sorted(rects)
    for _ in range(len(current) + 1):  # each pass removes >=1 rect or stops
        merged: list = []
        changed = False
        for rect in current:
            did = False
            for i, existing in enumerate(merged):
                if _overlap_for_merge(rect, existing):
                    merged[i] = (
                        min(rect[0], existing[0]),
                        min(rect[1], existing[1]),
                        max(rect[2], existing[2]),
                        max(rect[3], existing[3]),
                    )
                    did = True
                    changed = True
                    break
            if not did:
                merged.append(rect)
        current = sorted(merged)
        if not changed:
            break
    return current
