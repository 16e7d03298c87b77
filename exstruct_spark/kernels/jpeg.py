"""Real baseline JPEG decode/encode — stdlib + numpy, no codec libs.

Third real image codec after PNG (kernels/png.py) and GIF
(kernels/gif.py): baseline sequential JPEG (SOF0) is decodable with a
marker walk, canonical Huffman tables, dequantization, an 8x8
orthonormal IDCT (one numpy matrix sandwich per block) and chroma
upsampling.  Spec compliance is pinned against a REAL third-party
baseline JPEG (the CPython test-suite vector, read from the interpreter
installation at test time — never copied into this repo), not just
against this module's own encoder.

Decoder scope (honest limits, ValueError beyond them):
  * baseline sequential DCT (SOF0/1), 8-bit, 1 or 3 components;
  * progressive DCT (SOF2, T.81 Annex G): spectral selection AND
    successive approximation — DC first/refine, AC first/refine with
    EOB runs, ZRL and correction bits (the dominant web JPEG mode);
  * subsampling factors 1 or 2 per axis (covers 4:4:4, 4:2:2, 4:2:0);
  * restart intervals (DRI / RSTn), sequential and progressive scans;
  * NOT arithmetic coding, 12-bit, lossless, hierarchical, or CMYK.
The encoders (baseline 4:4:4/4:2:0 with quality-scaled Annex-K tables;
progressive with a 10-scan successive-approximation script and custom
fixed-length Huffman tables) exist for deterministic corpora and
round-trips; JPEG is lossy, so baseline round-trips assert
reconstruction quality, not byte identity.  The progressive pair has a
stronger invariant the tests pin: a progressive stream re-coding the
SAME quantized coefficients must decode to pixels BYTE-IDENTICAL to
the baseline decode (two independent entropy paths, one coefficient
array), which checks the Annex-G scan logic against the baseline path
that is itself spec-pinned on a third-party vector.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8x8 DCT-II matrix: block = C^T @ coeff @ C inverts it
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )

# Annex K (the tables every camera uses) — luminance / chrominance
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])
# Annex K canonical Huffman specs: (BITS counts per length 1..16, values)
_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_huff_decode(bits: list, values: list) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_huff_encode(bits: list, values: list) -> dict:
    """symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return enc


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 byte unstuffing.
    LAZY one-byte fills keep ``pos`` exactly one byte ahead of the bit
    cursor, so restart-marker consumption after ``align()`` sees the
    marker bytes untouched.  At a real marker / end of data, a few pad
    zero bits are served (the tail block of a flush-ended scan needs
    them); more than 8 pad bytes means genuine truncation."""

    def __init__(self, raw: bytes, pos: int):
        self.raw = raw
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.padded = 0

    def _fill(self) -> None:
        raw = self.raw
        b = None
        if self.pos < len(raw):
            b = raw[self.pos]
            if b == 0xFF:
                nxt = raw[self.pos + 1] if self.pos + 1 < len(raw) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    b = None  # real marker: do not consume, pad instead
            else:
                self.pos += 1
        if b is None:
            self.padded += 1
            if self.padded > 8:
                raise ValueError("entropy stream ran off the end")
            b = 0
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        self.nbits = 0
        self.buf = 0


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude v -> signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(raw: bytes):
    """Baseline JPEG -> (H, W, 3) uint8 RGB (grayscale replicated).
    Malformed structure of ANY shape raises ValueError (struct/index
    errors from truncated segments are normalized so the media stage's
    fallback-not-fail contract holds)."""
    try:
        return _decode_jpeg(raw)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG structure: {exc}") from exc


def _decode_jpeg(raw: bytes):
    if raw[:3] != JPEG_MAGIC[:3] or raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    prog_state = None
    restart_interval = 0
    i = 2
    n = len(raw)
    while i < n:
        if raw[i] != 0xFF or i + 1 >= n:
            raise ValueError(f"marker expected at {i}")
        marker = raw[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            if prog_state is not None and prog_state["nscans"]:
                return _reconstruct_progressive(frame, prog_state, qt)
            break
        if i + 4 > n:
            raise ValueError("truncated marker segment")
        seg_len = struct.unpack(">H", raw[i + 2:i + 4])[0]
        seg = raw[i + 4:i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                if tbl.size != 64:
                    raise ValueError("short quant table")
                qt[tq] = tbl.astype(np.int32)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17:p + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("short Huffman table")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff_decode(
                    bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if h == 0 or w == 0:
                # degenerate-dimension guard (parity with decode_png /
                # decode_gif): a 0x0 SOF must be a ValueError so the
                # media stage degrades instead of dividing by zero
                raise ValueError("degenerate 0-dimension SOF")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"unsupported sampling {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}) — baseline "
                "sequential and progressive only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("short SOS header")
            if not frame["progressive"]:
                sel = {}
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    raw, i + 2 + seg_len, frame, sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            # progressive: decode this scan into the persistent
            # coefficient store, then keep walking markers — the image
            # only exists once every scan has refined it
            if prog_state is None:
                prog_state = _new_prog_state(frame)
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    (j for j, cc in enumerate(frame["comps"])
                     if cc["id"] == cs), None)
                if ci is None:
                    raise ValueError("scan component not in frame")
                scomps.append((ci, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            i = _decode_prog_scan(
                raw, i + 2 + seg_len, frame, prog_state, scomps,
                ss, se, ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                restart_interval,
            )
            prog_state["nscans"] += 1
            continue
        # APPn / COM / others: skipped
        i += 2 + seg_len
    if prog_state is not None and prog_state["nscans"]:
        # EOI missing but complete scans decoded: reconstruct anyway
        return _reconstruct_progressive(frame, prog_state, qt)
    raise ValueError("no SOS marker found")


def _decode_scan(raw, pos, frame, sel, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    pred = [0] * len(comps)
    reader = _BitReader(raw, pos)
    ct = _C.T
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_index and mcu_index % dri == 0:
                # byte-align and consume the RSTn marker
                reader.align()
                p = reader.pos
                if raw[p] != 0xFF or not (0xD0 <= raw[p + 1] <= 0xD7):
                    raise ValueError("missing restart marker")
                reader.pos = p + 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                try:
                    tdc, tac = sel[c["id"]]
                except KeyError:
                    raise ValueError("component missing from scan") from None
                dq = qt.get(c["tq"])
                if dq is None:
                    raise ValueError("missing quant table")
                dct = huff_dc.get(tdc)
                act = huff_ac.get(tac)
                if dct is None or act is None:
                    raise ValueError("missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.read_huff(dct)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * dq
                        spatial = ct @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_index += 1
    return _finish_rgb(planes, comps, h, w, hmax, vmax)


def _finish_rgb(planes, comps, h, w, hmax, vmax):
    """Upsample component planes to full resolution, crop, and color
    convert — shared tail of the sequential and progressive decoders
    (identical arithmetic, so the two entropy paths can be pinned
    byte-identical on the same coefficients)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# progressive decoding (SOF2, T.81 Annex G)
# --------------------------------------------------------------------------

def _comp_block_dims(frame, c):
    """(block rows, block cols) of one component for NON-interleaved
    scans — ceil(comp samples / 8) on the component's own sampling
    grid, NOT padded to whole MCUs (T.81 A.2.2)."""
    hmax = max(cc["h"] for cc in frame["comps"])
    vmax = max(cc["v"] for cc in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _new_prog_state(frame):
    """Per-component coefficient store covering the MCU-padded grid,
    in ZIGZAG-scan index order (spectral bands Ss..Se are scan
    positions), accumulated across scans."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    coef = []
    for c in comps:
        bv, bh = mcuy * c["v"], mcux * c["h"]
        coef.append([[[0] * 64 for _ in range(bh)] for _ in range(bv)])
    return {"coef": coef, "mcux": mcux, "mcuy": mcuy, "nscans": 0}


def _ac_first_block(reader, act, cof, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0): EOBn run-lengths, ZRL,
    and point-transformed coefficients (value << Al)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.read_bits(r)
            return eobrun - 1  # current block is the run's first
        k += r
        if k > se:
            raise ValueError("AC index out of band")
        cof[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, act, cof, ss, se, p1, m1, eobrun):
    """One block of an AC refinement scan (Ah>0): newly-significant
    coefficients arrive as ±(1<<Al); every already-nonzero coefficient
    passed over contributes one correction bit — including inside EOB
    runs (T.81 G.2.2)."""
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huff(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # rest of band handled by the EOB tail below
                # ZRL: r==15 skips 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad magnitude in AC refinement")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                c = cof[k]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        cof[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement ran past band")
                cof[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits inside the EOB run
            c = cof[k]
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    cof[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(raw, pos, frame, state, scomps, ss, se, ah, al,
                      huff_dc, huff_ac, dri):
    """Decode one progressive scan into the coefficient store; returns
    the byte offset of the next marker."""
    comps = frame["comps"]
    coef = state["coef"]
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan with nonzero Se")
    if not is_dc and len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    # units: outer restart-counted entries (MCUs when interleaved,
    # single blocks of the one component otherwise)
    units = []
    if len(scomps) > 1:
        for my in range(state["mcuy"]):
            for mx in range(state["mcux"]):
                unit = []
                for (ci, tdc, tac) in scomps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append((ci, tdc, tac, my * c["v"] + by,
                                         mx * c["h"] + bx))
                units.append(unit)
    else:
        ci, tdc, tac = scomps[0]
        bv, bh = _comp_block_dims(frame, comps[ci])
        for by in range(bv):
            for bx in range(bh):
                units.append([(ci, tdc, tac, by, bx)])
    reader = _BitReader(raw, pos)
    pred = [0] * len(comps)
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    for ui, unit in enumerate(units):
        if dri and ui and ui % dri == 0:
            reader.align()
            p = reader.pos
            if (p + 1 >= len(raw) or raw[p] != 0xFF
                    or not 0xD0 <= raw[p + 1] <= 0xD7):
                raise ValueError("missing restart marker")
            reader.pos = p + 2
            pred = [0] * len(comps)
            eobrun = 0
        for (ci, tdc, tac, by, bx) in unit:
            cof = coef[ci][by][bx]
            if is_dc:
                if ah == 0:
                    dct = huff_dc.get(tdc)
                    if dct is None:
                        raise ValueError("missing Huffman table")
                    t = reader.read_huff(dct)
                    pred[ci] += _extend(reader.read_bits(t), t)
                    cof[0] = pred[ci] << al
                else:  # DC refinement: one raw bit per block
                    if reader.read_bit():
                        cof[0] |= p1
            else:
                act = huff_ac.get(tac)
                if act is None:
                    raise ValueError("missing Huffman table")
                if ah == 0:
                    eobrun = _ac_first_block(
                        reader, act, cof, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(
                        reader, act, cof, ss, se, p1, m1, eobrun)
    # locate the next marker (skip fill bytes, stuffing, stray RSTs)
    p = reader.pos
    n = len(raw)
    while p < n - 1:
        if raw[p] != 0xFF:
            p += 1
        elif raw[p + 1] == 0x00 or 0xD0 <= raw[p + 1] <= 0xD7:
            p += 2
        elif raw[p + 1] == 0xFF:
            p += 1
        else:
            return p
    raise ValueError("no marker after progressive scan")


def _reconstruct_progressive(frame, state, qt):
    """Dequantize + IDCT the accumulated coefficient store.  Per-block
    arithmetic EXACTLY mirrors the sequential path so the progressive
    and baseline decoders are byte-identical on equal coefficients."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ct = _C.T
    planes = []
    for ci, c in enumerate(comps):
        dq = qt.get(c["tq"])
        if dq is None:
            raise ValueError("missing quant table")
        grid = state["coef"][ci]
        bv, bh = len(grid), len(grid[0])
        plane = np.empty((bv * 8, bh * 8), dtype=np.float64)
        for by in range(bv):
            for bx in range(bh):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = np.asarray(grid[by][bx],
                                            dtype=np.int64) * dq
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    ct @ block.reshape(8, 8) @ _C + 128.0)
        planes.append(plane)
    return _finish_rgb(planes, comps, h, w, hmax, vmax)


# --------------------------------------------------------------------------
# encoder (baseline, Annex-K tables, quality-scaled)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, zz, pred, dc_enc, ac_enc):
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v & ((1 << t) - 1), t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        mv = v if v > 0 else v + (1 << s) - 1
        bw.write(mv & ((1 << s) - 1), s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _fdct_quant(plane, y0, x0, q):
    """Forward DCT + quantize one block -> coefficients in ZIGZAG scan
    order (``_ZIGZAG[k]`` = natural index of scan position k, so a plain
    fancy-index reorders natural -> zigzag)."""
    block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
    coeff = _C @ block @ _C.T
    zz = np.round(coeff.reshape(64)[_ZIGZAG] / q.reshape(64)[_ZIGZAG])
    return zz.astype(np.int32)


def _prep_planes(arr: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: RGB -> padded Y/Cb/Cr planes + scaled
    quant tables (identical for the baseline and progressive encoders,
    so both code the same quantized coefficients)."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("JPEG encoders want (H, W, 3) RGB")
    rgb = arr.astype(np.float64)
    y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2])
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
        + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
        - 0.081312 * rgb[:, :, 2]
    ql = _scale_q(_STD_LUMA_Q.reshape(8, 8), quality)
    qc = _scale_q(_STD_CHROMA_Q.reshape(8, 8), quality)
    hs = vs = 2 if subsample else 1
    mcuw, mcuh = 8 * hs, 8 * vs

    def pad(p, bh, bw_):
        ph = -(-p.shape[0] // bh) * bh
        pw = -(-p.shape[1] // bw_) * bw_
        out = np.empty((ph, pw))
        out[:p.shape[0], :p.shape[1]] = p
        out[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1:p.shape[1]]
        return out

    ypl = pad(y, mcuh, mcuw)
    if subsample:
        cbs = pad(cb, mcuh, mcuw)
        crs = pad(cr, mcuh, mcuw)
        cbp = (cbs[0::2, 0::2] + cbs[0::2, 1::2] + cbs[1::2, 0::2]
               + cbs[1::2, 1::2]) / 4.0
        crp = (crs[0::2, 0::2] + crs[0::2, 1::2] + crs[1::2, 0::2]
               + crs[1::2, 1::2]) / 4.0
    else:
        cbp = pad(cb, 8, 8)
        crp = pad(cr, 8, 8)
    return ypl, cbp, crp, ql, qc, hs, vs


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Deterministic baseline JPEG encoder ((H, W, 3) uint8 RGB; 4:4:4,
    or 4:2:0 with ``subsample=True``)."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg wants (H, W, 3) RGB")
    h, w = arr.shape[:2]
    ypl, cbp, crp, ql, qc, hs, vs = _prep_planes(arr, quality, subsample)
    mcuw, mcuh = 8 * hs, 8 * vs

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    seg(0xDB, bytes([0x00]) + bytes(ql.reshape(64)[_ZIGZAG].tolist()))
    seg(0xDB, bytes([0x01]) + bytes(qc.reshape(64)[_ZIGZAG].tolist()))
    seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for tc_th, (bits, vals) in ((0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA),
                                (0x01, _STD_DC_CHROMA),
                                (0x11, _STD_AC_CHROMA)):
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l = _build_huff_encode(*_STD_DC_LUMA)
    ac_l = _build_huff_encode(*_STD_AC_LUMA)
    dc_c = _build_huff_encode(*_STD_DC_CHROMA)
    ac_c = _build_huff_encode(*_STD_AC_CHROMA)
    bw = _BitWriter()
    pred = [0, 0, 0]
    mcux = ypl.shape[1] // mcuw
    mcuy = ypl.shape[0] // mcuh
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    zz = _fdct_quant(ypl, my * mcuh + by * 8,
                                     mx * mcuw + bx * 8, ql)
                    pred[0] = _encode_block(bw, zz, pred[0], dc_l, ac_l)
            zz = _fdct_quant(cbp, my * 8, mx * 8, qc)
            pred[1] = _encode_block(bw, zz, pred[1], dc_c, ac_c)
            zz = _fdct_quant(crp, my * 8, mx * 8, qc)
            pred[2] = _encode_block(bw, zz, pred[2], dc_c, ac_c)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (SOF2) — 10-scan successive-approximation script
# --------------------------------------------------------------------------
#
# Exists to give the progressive DECODER a rigorous oracle without any
# codec library in the environment: the stream re-codes the exact same
# quantized coefficients as encode_jpeg, so decode(progressive) must be
# byte-identical to decode(baseline) — two independent entropy paths
# over one coefficient array, with the baseline path itself spec-pinned
# on a third-party vector.

def _plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(bv, bh, 64) zigzag-order quantized coefficients — per-block via
    _fdct_quant, the SAME call the baseline encoder makes, so both
    encoders quantize bit-identically."""
    bv, bh = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bv, bh, 64), dtype=np.int32)
    for by in range(bv):
        for bx in range(bh):
            out[by, bx] = _fdct_quant(plane, by * 8, bx * 8, q)
    return out


def _fixed_len_huff(symbols, length: int = 9):
    """A canonical Huffman table giving every symbol the same code
    length.  Needed because the Annex-K AC tables lack the EOBn symbols
    (0x10..0xE0) progressive scans emit; fixed 9-bit codes are legal
    for up to 510 symbols and decodable by any conforming decoder."""
    syms = sorted(symbols) or [0]
    if len(syms) >= (1 << length) - 1:
        raise ValueError("too many symbols for fixed-length table")
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


class _ProgEmitter:
    """Two-pass scan emitter: with no tables it collects the DC/AC
    symbol alphabets (pass 1, to build the DHTs); with tables it writes
    real entropy bits (pass 2).  Both passes run the identical scan
    code, so the alphabets are exact."""

    def __init__(self, dc_enc=None, ac_enc=None):
        self.dc_syms: set = set()
        self.ac_syms: set = set()
        self.dc_enc = dc_enc
        self.ac_enc = ac_enc
        self.bw = None

    def start_scan(self):
        if self.dc_enc is not None:
            self.bw = _BitWriter()

    def end_scan(self) -> bytes:
        if self.bw is None:
            return b""
        self.bw.flush()
        data = bytes(self.bw.out)
        self.bw = None
        return data

    def dc_sym(self, s):
        if self.dc_enc is None:
            self.dc_syms.add(s)
        else:
            code, ln = self.dc_enc[s]
            self.bw.write(code, ln)

    def ac_sym(self, s):
        if self.ac_enc is None:
            self.ac_syms.add(s)
        else:
            code, ln = self.ac_enc[s]
            self.bw.write(code, ln)

    def bits(self, v, n):
        if n and self.dc_enc is not None:
            self.bw.write(v & ((1 << n) - 1), n)


def _emit_dc_scan(em, grids, comps, mcuy, mcux, ah, al):
    """Interleaved DC scan: first pass codes (coef >> Al) diffs with the
    baseline DIFF coding; refinement sends bit Al of each coefficient
    as one raw bit (floor shifts on negatives match the decoder's
    two's-complement OR exactly)."""
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        v = int(grids[ci][my * c["v"] + by,
                                          mx * c["h"] + bx, 0])
                        if ah == 0:
                            d = (v >> al) - pred[ci]
                            pred[ci] = v >> al
                            t = abs(d).bit_length()
                            em.dc_sym(t)
                            if t:
                                em.bits(d if d > 0 else d + (1 << t) - 1, t)
                        else:
                            em.bits((v >> al) & 1, 1)


def _emit_ac_first_scan(em, grid, order, ss, se, al):
    """AC first scan over one component's band: EOBn run accumulation
    across blocks, ZRL, magnitudes truncated toward zero by Al."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            run = min(eobrun, 0x7FFF)
            r = run.bit_length() - 1
            em.ac_sym(r << 4)
            if r:
                em.bits(run - (1 << r), r)
            eobrun -= run

    for (by, bx) in order:
        cof = grid[by, bx]
        vals = []
        for k in range(ss, se + 1):
            v = int(cof[k])
            vals.append((v >> al) if v >= 0 else -((-v) >> al))
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                em.ac_sym(0xF0)
                run -= 16
            s = abs(v).bit_length()
            em.ac_sym((run << 4) | s)
            em.bits(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1  # trailing zeros: this block joins the EOB run
    flush_eob()


def _emit_ac_refine_scan(em, grid, order, ss, se, al):
    """AC refinement scan: newly-significant coefficients as (run,1)
    symbols + sign bit; correction bits for already-nonzero ones are
    buffered and flushed after the next symbol (the BE-buffer protocol
    of T.81 G.1.2.3 that the decoder's EOB-run tail expects)."""
    eobrun = 0
    pending: list = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            em.ac_sym(r << 4)
            if r:
                em.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            em.bits(b, 1)
        pending = []

    for (by, bx) in order:
        cof = grid[by, bx]
        absv = [abs(int(cof[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if int(cof[k]) >= 0 else 0 for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i  # last newly-significant position
        run = 0
        br: list = []
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eobpos:
                flush_eob()
                em.ac_sym(0xF0)
                run -= 16
                for b in br:
                    em.bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)  # correction bit, rides the next symbol
                continue
            flush_eob()
            em.ac_sym((run << 4) | 1)
            em.bits(signs[i], 1)
            for b in br:
                em.bits(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """Deterministic progressive JPEG encoder: same quantized
    coefficients as ``encode_jpeg``, coded as a 10-scan spectral
    selection + successive approximation script (DC first Al=1, split
    luma AC bands, DC refine, AC refines) with fixed-length custom
    Huffman tables."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg_progressive wants (H, W, 3) RGB")
    h, w = arr.shape[:2]
    ypl, cbp, crp, ql, qc, hs, vs = _prep_planes(arr, quality, subsample)
    grids = [_plane_coeffs(ypl, ql), _plane_coeffs(cbp, qc),
             _plane_coeffs(crp, qc)]
    comps = [{"id": 1, "h": hs, "v": vs, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 1},
             {"id": 3, "h": 1, "v": 1, "tq": 1}]
    frame = {"h": h, "w": w, "comps": comps, "progressive": True}
    mcuy = ypl.shape[0] // (8 * vs)
    mcux = ypl.shape[1] // (8 * hs)
    orders = []
    for c in comps:
        bv, bh = _comp_block_dims(frame, c)
        orders.append([(by, bx) for by in range(bv) for bx in range(bh)])
    # (kind, comp, Ss, Se, Ah, Al) — exercises every decoder branch:
    # interleaved DC + point transform, split spectral bands, EOB runs,
    # DC/AC refinement with correction bits
    script = [
        ("dc", None, 0, 0, 0, 1),
        ("ac_first", 0, 1, 5, 0, 1),
        ("ac_first", 1, 1, 63, 0, 1),
        ("ac_first", 2, 1, 63, 0, 1),
        ("ac_first", 0, 6, 63, 0, 1),
        ("dc", None, 0, 0, 1, 0),
        ("ac_refine", 0, 1, 63, 1, 0),
        ("ac_refine", 1, 1, 63, 1, 0),
        ("ac_refine", 2, 1, 63, 1, 0),
    ]

    def run_script(em):
        chunks = []
        for (kind, ci, ss, se, ah, al_) in script:
            em.start_scan()
            if kind == "dc":
                _emit_dc_scan(em, grids, comps, mcuy, mcux, ah, al_)
                scomps = [(c["id"], 0x00) for c in comps]
            elif kind == "ac_first":
                _emit_ac_first_scan(em, grids[ci], orders[ci], ss, se, al_)
                scomps = [(comps[ci]["id"], 0x00)]
            else:
                _emit_ac_refine_scan(em, grids[ci], orders[ci], ss, se, al_)
                scomps = [(comps[ci]["id"], 0x00)]
            chunks.append((scomps, ss, se, ah, al_, em.end_scan()))
        return chunks

    collector = _ProgEmitter()
    run_script(collector)
    dc_bits, dc_vals = _fixed_len_huff(collector.dc_syms)
    ac_bits, ac_vals = _fixed_len_huff(collector.ac_syms)
    writer = _ProgEmitter(_build_huff_encode(dc_bits, dc_vals),
                          _build_huff_encode(ac_bits, ac_vals))
    chunks = run_script(writer)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    seg(0xDB, bytes([0x00]) + bytes(ql.reshape(64)[_ZIGZAG].tolist()))
    seg(0xDB, bytes([0x01]) + bytes(qc.reshape(64)[_ZIGZAG].tolist()))
    seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    for (scomps, ss, se, ah, al_, data) in chunks:
        body = bytes([len(scomps)])
        for (cid, tt) in scomps:
            body += bytes([cid, tt])
        body += bytes([ss, se, (ah << 4) | al_])
        seg(0xDA, body)
        out.extend(data)
    out.extend(b"\xff\xd9")
    return bytes(out)
