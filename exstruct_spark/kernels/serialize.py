"""Canonical compact JSON serialization.

Behavioural parity with the reference's token-budget serializer:
recursive empty-value stripping (``io/__init__.py:92-128``
``dict_without_empty_values``) followed by compact
``json.dumps(ensure_ascii=False)`` (``io/serialize.py:70-73``).

Byte-identity contract: serialization happens INSIDE the extraction
kernel, before any Arrow round-trip, so int-vs-float distinctions and
unicode bytes survive untouched (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

_EMPTY = (None, "", [], {}, ())


def strip_empty(value: Any) -> Any:
    """Recursively drop ``None``/``""``/``[]``/``{}`` members.

    Parity: reference ``dict_without_empty_values`` (io/__init__.py:92-128)
    — dicts lose empty-valued keys, lists lose empty elements, recursion
    applies bottom-up so a dict that becomes empty is itself dropped by the
    caller one level up.  ``0``/``0.0``/``False`` are NOT empty.
    """
    # one flat helper call per child (exact-type fast path inside) instead
    # of recursion + a separate emptiness call — fewer Python calls on
    # real documents, byte-identical output (unit + hypothesis fixpoint
    # tests), with isinstance fallbacks preserving subclass semantics
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            v = _strip_child(v)
            if v is not _DROP:
                out[k] = v
        return out
    if isinstance(value, (list, tuple)):
        out_l = []
        for v in value:
            v = _strip_child(v)
            if v is not _DROP:
                out_l.append(v)
        return out_l
    return value


_DROP = object()  # sentinel: child stripped away entirely


def _strip_child(v: Any) -> Any:
    """One child: exact-type fast path for the dominant builtin cases,
    isinstance fallback so dict/list/str SUBCLASSES keep the original
    semantics (recursed / dropped-when-empty) instead of silently passing
    through."""
    tv = type(v)
    if tv is dict or tv is list or tv is tuple:
        v = strip_empty(v)
        return _DROP if len(v) == 0 else v
    if v is None or (tv is str and not v):
        return _DROP
    if isinstance(v, (dict, list, tuple)):
        v = strip_empty(v)
        return _DROP if len(v) == 0 else v
    if isinstance(v, str) and not v:
        return _DROP
    return v


def canonical_json(value: Any) -> str:
    """Compact, non-ASCII-preserving JSON with empty values stripped.

    ``separators=(",", ":")`` + ``ensure_ascii=False`` matches the
    reference's compact emitter (io/serialize.py:70-73).  Key order is
    insertion order (deterministic by construction in the kernels).
    """
    return json.dumps(strip_empty(value), ensure_ascii=False, separators=(",", ":"))


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
