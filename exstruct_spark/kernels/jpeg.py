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
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                raw, i + 2 + seg_len, frame, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skipped
        i += 2 + seg_len
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
    # upsample to full resolution and crop
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


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Deterministic baseline JPEG encoder ((H, W, 3) uint8 RGB; 4:4:4,
    or 4:2:0 with ``subsample=True``)."""
    arr = np.asarray(arr)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg wants (H, W, 3) RGB")
    h, w = arr.shape[:2]
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
