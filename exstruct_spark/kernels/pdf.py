"""Naive PDF text harvesting (no codec/library dependencies).

The content-type routing analogue of the reference's backend dispatcher
(``detect_tables`` dispatcher, core/cells.py:1897-1943: pick the parser
per input kind, degrade when the rich backend is unavailable).  A real
deployment would plug pypdfium2/pdfminer here; this environment has no
PDF library, so this kernel extracts only what is recoverable WITHOUT
one, and marks the result as an approximation:

  * text-showing operators: ``(string) Tj``, the ``'`` / ``"``
    move-and-show variants, ``<hex> Tj`` hex strings and ``[(s1)
    <s2>] TJ`` arrays — PDF string escapes decoded, one level of
    balanced unescaped parens accepted, odd hex digits zero-padded,
    and a UTF-16BE BOM selecting UTF-16 (non-Latin titles/text) —
    assembled into READING-ORDER LINES: consecutive fragments join
    (real generators emit one Tj per fragment), Td/TD vertical moves
    / T* / Tm / BT / ET break lines, a pure horizontal Td inserts a
    space, and TJ kern adjustments beyond -180/1000 em insert word
    spaces (a pdftotext-style heuristic, not a layout engine);
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
  * page count from ``/Type /Page`` occurrences;
  * PDF 1.5 object streams (``/Type /ObjStm``): decoded containers'
    (objnum, offset) tables are parsed and each inner object is
    re-materialized as ``N 0 obj … endobj`` so the font join, /Title
    and page-count scans see objects that modern writers store ONLY
    inside compressed containers;
  * ``/ToUnicode`` CMaps (spec 9.10.3): font objects carrying a
    ``/ToUnicode N 0 R`` reference are joined to the CMap stream with
    that object number, the CMap's ``bfchar``/``bfrange`` sections are
    parsed (1- and 2-byte code units from the codespace declaration),
    page-resource ``/Font`` dictionaries bind resource names to fonts,
    and the text harvest tracks ``/Fname size Tf`` selections in
    document order so each show-string decodes through ITS font's
    mapping — the dominant real-PDF shape, where subset fonts emit
    glyph codes that are gibberish under any fixed charset.  Unmapped
    codes fall back to the charset approximation, corrupt CMaps are
    skipped, and entry/font counts are capped (no-silent-caps: the
    caps are counted in ``font_stats``).

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
# shorter match, never a crash.  (The show-operator scan itself lives
# in _CONTENT_OP_RE below — one interleaved pass with font selection
# and positioning.)
_LIT = rb"(?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*"
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TITLE_RE = re.compile(rb"/Title\s*(?:\((" + _LIT
                       + rb")\)|<([0-9A-Fa-f\s]*)>)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string_bytes(raw: bytes) -> bytes:
    """Literal-string body -> raw bytes (escapes resolved, no charset)."""
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
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    return _bytes_to_text(_decode_pdf_string_bytes(raw))


def _bytes_to_text(b: bytes) -> str:
    """PDF text-string bytes -> str: a UTF-16BE BOM selects UTF-16
    (the spec's encoding for non-Latin titles and Identity-encoded
    text); everything else is PDFDocEncoding-approximated as latin-1."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1", errors="replace")


def _hex_body_bytes(raw: bytes) -> bytes:
    """``<4865...>`` hex-string body -> raw bytes (whitespace ignored,
    odd trailing digit zero-padded per spec)."""
    compact = bytes(c for c in raw if not chr(c).isspace())
    if len(compact) % 2:
        compact += b"0"
    try:
        return bytes.fromhex(compact.decode("ascii"))
    except ValueError:
        return b""


def _decode_hex_string(raw: bytes) -> str:
    """``<48656C6C6F>`` hex-string body -> str (BOM-aware like
    literals)."""
    return _bytes_to_text(_hex_body_bytes(raw))


def is_pdf(raw: bytes) -> bool:
    return raw[:5] == b"%PDF-"


# ---------------------------------------------------------------- #
# /ToUnicode CMaps (spec 9.10.3) — subset-font glyph codes -> text  #
# ---------------------------------------------------------------- #

MAX_CMAP_ENTRIES = 8192   # bf entries kept per CMap (caps-not-crashes)
MAX_FONTS = 64            # font objects resolved per document

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.S)
# bf-section items: a hex token or a [ <dst> <dst> ... ] array
_CMAP_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
# object headers, numbered (the window after each is sliced, not
# regex-tempered — linear on adversarial input)
_NUM_OBJ_HDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_OBJ_WINDOW = 2048
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
# resource dict: /Font << /F1 5 0 R ... >> (one nesting level accepted)
_RES_FONT_RE = re.compile(
    rb"/Font\s*<<((?:[^<>]|<<[^<>]*>>)*)>>")
_FONT_NAME_REF_RE = re.compile(rb"/([A-Za-z0-9.#_-]+)\s+(\d+)\s+\d+\s+R")


def _utf16be_chars(dst: bytes) -> str:
    """bf destination hex bytes -> str (UTF-16BE per spec; a lone
    odd byte degrades to its latin-1 char rather than vanishing)."""
    if len(dst) % 2:
        return dst.decode("latin-1")
    return dst.decode("utf-16-be", errors="replace")


def parse_tounicode_cmap(data: bytes):
    """CMap stream bytes -> (code_width, {code:int -> str}) or None.

    Code width comes from the first ``codespacerange`` entry (1 or 2
    bytes; wider CJK codespaces are out of scope -> None), defaulting
    to the first bf source token's width.  ``bfchar`` pairs and
    ``bfrange`` triples (incrementing or array destination forms) fill
    the map up to MAX_CMAP_ENTRIES; a malformed section is skipped,
    never fatal.
    """
    width = None
    cs = _CODESPACE_RE.search(data)
    if cs:
        toks = _CMAP_TOK_RE.findall(cs.group(1))
        hexes = [t[0] for t in toks if t[0]]
        if hexes:
            width = (len(hexes[0]) + 1) // 2
    mapping: dict = {}

    def _entries(body: bytes):
        """Tokenize a bf section body into hex strings and arrays."""
        out = []
        arr = None
        for m in _CMAP_TOK_RE.finditer(body):
            if m.group(1) is not None:
                tok = m.group(1)
                if arr is not None:
                    arr.append(tok)
                else:
                    out.append(tok)
            elif m.group(2):
                arr = []
            elif arr is not None:
                out.append(arr)
                arr = None
        return out

    for sec in _BFCHAR_RE.finditer(data):
        toks = _entries(sec.group(1))
        for i in range(0, len(toks) - 1, 2):
            src, dst = toks[i], toks[i + 1]
            if isinstance(src, list) or isinstance(dst, list):
                continue
            if width is None:
                width = (len(src) + 1) // 2
            if len(mapping) >= MAX_CMAP_ENTRIES:
                break
            try:
                mapping[int(src, 16)] = _utf16be_chars(
                    _hex_body_bytes(dst))
            except ValueError:
                continue
    for sec in _BFRANGE_RE.finditer(data):
        toks = _entries(sec.group(1))
        for i in range(0, len(toks) - 2, 3):
            lo, hi, dst = toks[i], toks[i + 1], toks[i + 2]
            if isinstance(lo, list) or isinstance(hi, list):
                continue
            if width is None:
                width = (len(lo) + 1) // 2
            try:
                lo_i, hi_i = int(lo, 16), int(hi, 16)
            except ValueError:
                continue
            if hi_i < lo_i:
                continue
            hi_i = min(hi_i, lo_i + MAX_CMAP_ENTRIES)
            if isinstance(dst, list):
                for k, d in enumerate(dst):
                    if lo_i + k > hi_i or len(mapping) >= MAX_CMAP_ENTRIES:
                        break
                    mapping[lo_i + k] = _utf16be_chars(
                        _hex_body_bytes(d))
            else:
                try:
                    base = int(dst, 16)
                except ValueError:
                    continue
                dw = max(2, ((len(dst) + 1) // 2 // 2) * 2)
                for k in range(hi_i - lo_i + 1):
                    if len(mapping) >= MAX_CMAP_ENTRIES:
                        break
                    # incrementing form: the LAST code point increments
                    # (spec: "the last byte of the string is
                    # incremented"); single-char destinations are the
                    # overwhelmingly common case
                    try:
                        dst_b = (base + k).to_bytes(dw, "big")
                    except OverflowError:
                        break
                    mapping[lo_i + k] = _utf16be_chars(dst_b)
    if not mapping or width is None or width > 2:
        return None
    return width, mapping


def _apply_cmap(b: bytes, width: int, mapping: dict) -> str:
    """Show-string bytes -> text through a font's ToUnicode map.
    Unmapped code units fall back to the fixed-charset approximation
    of that unit (latin-1 / BMP code point) — a partial CMap degrades
    to the pre-CMap behavior, never to replacement noise."""
    out = []
    for i in range(0, len(b), width):
        unit = b[i : i + width]
        code = int.from_bytes(unit, "big")
        hit = mapping.get(code)
        if hit is not None:
            out.append(hit)
        elif width == 1:
            out.append(unit.decode("latin-1"))
        else:
            out.append(chr(code) if code else "")
    return "".join(out)


def _font_cmaps(raw: bytes, cmaps_by_obj: dict, stats: dict) -> dict:
    """Join resource names to ToUnicode maps: resource ``/Font`` dicts
    bind names to font object numbers; font objects bind to CMap
    stream object numbers.  First binding per name wins (real
    generators keep names consistent per document).  -> {name: (width,
    map)}; fills ``stats`` with fonts_mapped / fonts_over_cap."""
    if not cmaps_by_obj:
        return {}
    font_to_cmap: dict = {}
    for m in _NUM_OBJ_HDR_RE.finditer(raw):
        window = raw[m.end() : m.end() + _OBJ_WINDOW]
        endpos = window.find(b"endobj")
        if endpos != -1:
            window = window[:endpos]
        ref = _TOUNICODE_REF_RE.search(window)
        if ref is None:
            continue
        if len(font_to_cmap) >= MAX_FONTS:
            stats["fonts_over_cap"] = stats.get("fonts_over_cap", 0) + 1
            continue
        font_to_cmap.setdefault(int(m.group(1)), int(ref.group(1)))
    out: dict = {}
    for rm in _RES_FONT_RE.finditer(raw):
        for nm in _FONT_NAME_REF_RE.finditer(rm.group(1)):
            name = nm.group(1).decode("latin-1")
            obj = int(nm.group(2))
            cmap = cmaps_by_obj.get(font_to_cmap.get(obj))
            if cmap is not None and name not in out:
                out[name] = cmap
    if out:
        stats["fonts_mapped"] = len(out)
    return out


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
# object streams (PDF 1.5 compressed-object storage): non-stream
# objects — font dicts, resource dicts, page dicts — live INSIDE these
_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
MAX_OBJSTM_OBJECTS = 2048
_INT_RE = re.compile(rb"\d+")


def _objstm_objects(data: bytes, n: int, first: int) -> list:
    """Decoded /ObjStm bytes -> [(obj_num, body_bytes)].  The stream
    begins with N (objnum, offset) integer pairs; object bodies sit
    back-to-back from /First.  Malformed tables yield fewer objects,
    never an exception."""
    if first <= 0 or first > len(data):
        return []
    nums = _INT_RE.findall(data[:first])
    n = min(n, MAX_OBJSTM_OBJECTS, len(nums) // 2)
    pairs = []
    for i in range(n):
        try:
            pairs.append((int(nums[2 * i]), int(nums[2 * i + 1])))
        except ValueError:
            break
    body_len = len(data) - first
    out = []
    for k, (objnum, off) in enumerate(pairs):
        end = pairs[k + 1][1] if k + 1 < len(pairs) else body_len
        if not (0 <= off <= end <= body_len):
            continue
        out.append((objnum, data[first + off : first + end]))
    return out

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
    into ``stats["skipped_over_cap"]`` — the no-silent-caps rule.

    Yields ``(obj_num, payload, filters)``; UNFILTERED streams are
    yielded with ``filters == []`` (their bytes are already visible to
    the whole-file harvest — callers use them only for CMap lookup)
    under their own cap, so they cannot starve the decode cap."""
    n = plain = 0
    for m in _STREAM_RE.finditer(raw):
        head = raw[max(0, m.start() - _DICT_WINDOW) : m.start()]
        # scope the window to THIS stream's object: a previous object's
        # /Filter must not leak onto a filterless stream.  The boundary
        # is the full 'N G obj' header (a bare 'obj' substring could
        # sit inside a literal string and wrongly trim a real /Filter)
        ob = None
        for ob in _NUM_OBJ_HDR_RE.finditer(head):
            pass
        obj_num = None
        if ob is not None:
            head = head[ob.end():]
            obj_num = int(ob.group(1))
        fm = None
        for fm in _FILTER_RE.finditer(head):
            pass  # keep the last match in the window
        if fm is None:
            if plain >= MAX_STREAMS:
                continue
            plain += 1
            data_start = m.end()
            end = raw.find(b"endstream", data_start)
            if end == -1:
                end = len(raw)
            yield obj_num, raw[data_start:end].rstrip(b"\r\n"), [], None
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
        objstm = None
        if _OBJSTM_TYPE_RE.search(head):
            nm_ = _OBJSTM_N_RE.search(head)
            fm_ = _OBJSTM_FIRST_RE.search(head)
            if nm_ and fm_:
                objstm = (int(nm_.group(1)), int(fm_.group(1)))
        yield (obj_num, raw[data_start:end].rstrip(b"\r\n"), filters,
               objstm)


def _decode_text_streams(raw: bytes):
    """-> (chunks, stats dict) where chunks are ``(obj_num, bytes,
    was_filtered)``.  Corrupt streams are skipped and counted; over-cap
    output is truncated and counted — the no-silent-caps rule applied
    to decompression.  Unfiltered payloads ride along (capped slice,
    no budget charge) so CMap streams stored uncompressed still
    resolve; they are NOT re-harvested for text (the whole-file scan
    already sees their bytes)."""
    chunks: list = []
    stats = {"decoded": 0, "corrupt": 0, "truncated": 0}
    budget = MAX_INFLATED_TOTAL
    for obj_num, payload, filters, objstm in _iter_decodable_streams(
            raw, stats):
        if not filters:
            chunks.append(
                (obj_num, payload[:MAX_INFLATED_PER_STREAM], False,
                 objstm))
            continue
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
            chunks.append((obj_num, out, True, objstm))
            stats["decoded"] += 1
    return chunks, stats


# one pass, document order: font selection and text POSITIONING
# interleave with the show operators they scope (the pre-CMap
# per-family scan could not know which font a string was shown under,
# and emitted every fragment as its own line — real generators emit
# one Tj per fragment, so that output was vertical word soup)
_CONTENT_OP_RE = re.compile(
    rb"/([A-Za-z0-9.#_-]+)\s+[0-9.+-]+\s+Tf"         # 1: font select
    rb"|\((" + _LIT + rb")\)\s*(Tj|'|\")"            # 2: literal, 3: op
    rb"|<([0-9A-Fa-f\s]*)>\s*(Tj|'|\")"              # 4: hex, 5: op
    rb"|\[((?:[^\[\]\\]|\\.)*)\]\s*TJ"               # 6: TJ array
    rb"|([0-9.+-]+)\s+([0-9.+-]+)\s+T[dD]\b"         # 7: tx, 8: ty
    rb"|(?:[0-9.+-]+\s+){6}Tm\b"                     # text matrix reset
    rb"|T\*|\bBT\b|\bET\b"                           # line adv / text obj
)
# TJ numeric kerning below this (thousandths of em, negative = widen)
# is a WORD gap: generators emit word spacing as kern adjustments
# (-250..-300 typical); intra-word kerns sit in -10..-120
_TJ_WORD_KERN = -180.0
_TJ_ITEM_RE = re.compile(
    rb"\((" + _LIT + rb")\)|<([0-9A-Fa-f\s]*)>|(-?[0-9.]+)")


_ENCRYPT_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")


def extract_pdf_document(raw: bytes) -> dict:
    """PDF bytes -> {text, title, n_pages, approximation_level}.

    approximation_level: 1 if any text operators were recovered
    (directly or from decoded flate/lzw/a85/ahx streams), 2 if only
    structure/metadata.  ``stream_stats`` counts decoded/corrupt/
    truncated streams (present only when any stream was seen);
    ``font_stats`` appears when any /ToUnicode CMap resolved.

    Encrypted PDFs (a trailer ``/Encrypt N G R`` reference): strings
    and streams are RC4/AES ciphertext — harvesting them yields noise,
    not text, so the document honestly degrades to structure-only
    (``encrypted: true``, approximation_level 2).  Decryption needs a
    real PDF library (even the empty-user-password case).
    """
    if _ENCRYPT_RE.search(raw):
        return {
            "text": "",
            "title": "",
            "n_pages": len(_PAGE_RE.findall(raw)),
            "approximation_level": 2,
            "encrypted": True,
        }
    texts: list = []
    decoded_chunks, stream_stats = _decode_text_streams(raw)
    cmaps_by_obj: dict = {}
    # PDF 1.5 object streams: font dicts / resource dicts / page dicts
    # commonly live INSIDE compressed /ObjStm containers where the raw
    # scan cannot see them — re-materialize each as a numbered object
    # so the same scans work unchanged
    synth_parts: list = []
    for obj_num, data, _filtered, objstm in decoded_chunks:
        if objstm is not None:
            for inner_num, body in _objstm_objects(data, *objstm):
                synth_parts.append(
                    b"%d 0 obj " % inner_num + body + b" endobj\n")
        if obj_num is None or (b"beginbfchar" not in data
                               and b"beginbfrange" not in data):
            continue
        parsed = parse_tounicode_cmap(data)
        if parsed is not None:
            cmaps_by_obj[obj_num] = parsed
    synth = b"".join(synth_parts)
    scan_buf = raw + b"\n" + synth if synth else raw
    font_stats: dict = {}
    fonts = _font_cmaps(scan_buf, cmaps_by_obj, font_stats)

    def _shown(body_bytes: bytes, active) -> str:
        if active is not None:
            return _apply_cmap(body_bytes, active[0], active[1])
        return _bytes_to_text(body_bytes)

    def _harvest(buf: bytes) -> None:
        """LINE assembly: consecutive show fragments join (real
        generators emit one Tj per fragment); Td/TD with a vertical
        move, T*, Tm, BT/ET and the ' / \" move-and-show operators
        break lines; a pure horizontal Td inserts a space; TJ kern
        adjustments beyond the word threshold insert spaces.  Not a
        layout engine — a reading-order heuristic (pdftotext-style)."""
        active = None  # font state resets per content stream
        line: list = []

        def _flush() -> None:
            s = "".join(line)
            line.clear()
            if s.strip():
                texts.append(s)

        for m in _CONTENT_OP_RE.finditer(buf):
            if m.group(1) is not None:
                active = fonts.get(m.group(1).decode("latin-1"))
                continue
            if m.group(7) is not None:  # Td/TD text positioning
                try:
                    tx, ty = float(m.group(7)), float(m.group(8))
                except ValueError:
                    tx = ty = 0.0
                if ty != 0.0:
                    _flush()
                elif tx != 0.0 and line:
                    line.append(" ")
                continue
            if m.group(2) is not None or m.group(4) is not None:
                if m.group(2) is not None:
                    op = m.group(3)
                    s = _shown(_decode_pdf_string_bytes(m.group(2)),
                               active)
                else:
                    op = m.group(5)
                    s = _shown(_hex_body_bytes(m.group(4)), active)
                if op != b"Tj":  # ' and " move to the next line first
                    _flush()
                line.append(s)
                continue
            if m.group(6) is not None:  # TJ array with kerning
                for x in _TJ_ITEM_RE.finditer(m.group(6)):
                    if x.group(1) is not None:
                        line.append(_shown(
                            _decode_pdf_string_bytes(x.group(1)), active))
                    elif x.group(2) is not None:
                        line.append(_shown(
                            _hex_body_bytes(x.group(2)), active))
                    else:
                        try:
                            if float(x.group(3)) <= _TJ_WORD_KERN:
                                line.append(" ")
                        except ValueError:
                            pass
                continue
            _flush()  # T*, Tm, BT, ET
        _flush()

    _harvest(raw)
    for _obj, chunk, filtered, objstm in decoded_chunks:
        if filtered and objstm is None:
            # unfiltered bytes were already in the raw scan; ObjStm
            # containers hold no content streams (spec 7.5.7)
            _harvest(chunk)
    title_m = _TITLE_RE.search(raw) or (
        _TITLE_RE.search(synth) if synth else None)
    title = ""
    if title_m:
        title = (_decode_pdf_string(title_m.group(1))
                 if title_m.group(1) is not None
                 else _decode_hex_string(title_m.group(2)))
    n_pages = len(_PAGE_RE.findall(raw)) + (
        len(_PAGE_RE.findall(synth)) if synth else 0)
    text = "\n".join(texts)
    out = {
        "text": text,
        "title": title,
        "n_pages": n_pages,
        "approximation_level": 1 if text else 2,
    }
    if any(stream_stats.values()):
        out["stream_stats"] = stream_stats
    if font_stats:
        out["font_stats"] = font_stats
    return out
