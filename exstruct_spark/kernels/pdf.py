"""Naive PDF text harvesting (no codec/library dependencies).

The content-type routing analogue of the reference's backend dispatcher
(``detect_tables`` dispatcher, core/cells.py:1897-1943: pick the parser
per input kind, degrade when the rich backend is unavailable).  A real
deployment would plug pypdfium2/pdfminer here; this environment has no
PDF library, so this kernel extracts only what is recoverable WITHOUT
one, and marks the result as an approximation:

  * uncompressed text-showing operators: ``(string) Tj`` and
    ``[(s1) (s2)] TJ`` arrays, with PDF string escapes decoded;
  * document metadata from the /Info dictionary (Title, Author) when
    stored as plain literal strings;
  * page count from ``/Type /Page`` occurrences.

Compressed (FlateDecode) content streams yield no text -> the document
degrades to metadata-only with ``approximation_level`` marking it, never
failing the job (fallback-not-fail, reference core/pipeline.py:1097).
"""

from __future__ import annotations

import re

_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_IN_ARRAY_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TITLE_RE = re.compile(rb"/Title\s*\(((?:[^()\\]|\\.)*)\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        ch = raw[i : i + 1]
        if ch == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                try:
                    out.append(int(raw[i + 1 : j], 8) & 0xFF)
                except ValueError:
                    pass
                i = j
                continue
            i += 2
            continue
        out += ch
        i += 1
    return out.decode("latin-1", errors="replace")


def is_pdf(raw: bytes) -> bool:
    return raw[:5] == b"%PDF-"


def extract_pdf_document(raw: bytes) -> dict:
    """PDF bytes -> {text, title, n_pages, approximation_level}.

    approximation_level: 1 if any text operators were recovered, 2 if
    only structure/metadata (compressed streams).
    """
    texts: list = []
    for m in _TJ_RE.finditer(raw):
        s = _decode_pdf_string(m.group(1))
        if s.strip():
            texts.append(s)
    for m in _TJ_ARRAY_RE.finditer(raw):
        parts = [
            _decode_pdf_string(x.group(1))
            for x in _STR_IN_ARRAY_RE.finditer(m.group(1))
        ]
        joined = "".join(parts)
        if joined.strip():
            texts.append(joined)
    title_m = _TITLE_RE.search(raw)
    title = _decode_pdf_string(title_m.group(1)) if title_m else ""
    n_pages = len(_PAGE_RE.findall(raw))
    text = "\n".join(texts)
    return {
        "text": text,
        "title": title,
        "n_pages": n_pages,
        "approximation_level": 1 if text else 2,
    }
