"""VP8 (lossy WebP) keyframe decoder — RFC 6386, stdlib + numpy only.

The web's image population is dominated by lossy WebP; the reference
decodes every drawing part it meets (core/ooxml_drawing.py:186-257), so
the media pipeline's real-decode tier must speak VP8 or fall back to
hash-stub features for the largest real-image class (VERDICT r5 #3).

Scope: keyframes only — WebP still images are always keyframes.  The
decoder reconstructs the YUV 4:2:0 planes bit-exactly per the spec
(boolean decoder, keyframe header, segment/filter/quantizer state,
intra mode decoding with the keyframe trees, token decoding with the
default probability tables, dequantization, 4x4 IDCT + WHT, all intra
predictors, and the normal + simple in-loop deblocking filters), then
converts to RGB with a twin of libwebp's fancy upsampler so the OUTPUT
bytes match ``WebPDecodeRGB`` exactly.  pytest pins both layers against
the system libwebp via ctypes (``WebPDecodeYUV`` for the codec,
``WebPDecodeRGB`` for the pixels) on libwebp-encoded vectors — the same
oracle discipline as the VP8L decoder (kernels/vp8l.py).

The constant tables (default coefficient probabilities, update flags,
keyframe B-mode probabilities, quantizer lookups) are the spec's
published defaults, vendored in kernels/vp8_tables.py and re-derived
from libwebp's read-only data at test time.

Caps-not-crashes: ``VP8_MAX_PIXELS`` bounds the interpreter-speed work
per blob (Vp8lCapExceeded tier, shared with VP8L).
"""

from __future__ import annotations

import numpy as np

from exstruct_spark.kernels.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)
from exstruct_spark.kernels.vp8l import Vp8lCapExceeded

# tighter than VP8L's 4M: token decode and per-subblock reconstruction
# are scalar Python (~0.16 MPix/s measured after the slab-filter
# rewrite), so 1 MP bounds a worst-case blob at ~6 s; larger stills
# degrade to the REAL header-metadata tier via Vp8lCapExceeded, same
# as oversized VP8L
VP8_MAX_PIXELS = 1_000_000

# -- small spec tables (RFC 6386; verified behaviorally vs libwebp) ----------

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# intra modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 submodes
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

KF_YMODE_PROBS = (145, 156, 163, 128)
KF_UVMODE_PROBS = (142, 114, 183)

# token extra-bit probabilities and bases (RFC 6386 13.2)
CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASES = (5, 7, 11, 19, 35, 67)


class BoolDecoder:
    """RFC 6386 section 7 boolean (arithmetic) decoder."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (
            (data[0] << 8 | data[1]) if len(data) >= 2
            else ((data[0] << 8) if data else 0)
        )
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # renormalize
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


# the vendored KF_BMODE_PROBS is stored in libwebp's B-mode numbering,
# which permutes RD/VR/LD relative to the RFC's symbol order (libwebp:
# RD=4, VR=5, LD=6; RFC: LD=4, RD=5, VR=6 — the TREE bitstrings map to
# the same predictors in both, only the context-index numbering moves).
# Re-order both context dimensions into RFC numbering once at import —
# a context involving LD/RD/VR otherwise reads the wrong probability
# row and silently forks the boolean-decoder state (found by
# differential decode against WebPDecodeYUV).
_RFC_TO_TABLE = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
KF_BMODE_PROBS_RFC = [
    KF_BMODE_PROBS[(_RFC_TO_TABLE[a] * 10 + _RFC_TO_TABLE[l]) * 9 + i]
    for a in range(10) for l in range(10) for i in range(9)
]

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else 127 if i > 127 else i


def _idct4x4(block):
    """RFC 6386 14.3 inverse DCT (exact integer), block: 4x4 int array."""
    c1 = 20091  # cospi8sqrt2minus1
    c2 = 35468  # sinpi8sqrt2
    tmp = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a1 = block[0][i] + block[2][i]
        b1 = block[0][i] - block[2][i]
        t1 = (block[1][i] * c2) >> 16
        t2 = block[3][i] + ((block[3][i] * c1) >> 16)
        c_ = t1 - t2
        t1 = block[1][i] + ((block[1][i] * c1) >> 16)
        t2 = (block[3][i] * c2) >> 16
        d_ = t1 + t2
        tmp[0][i] = a1 + d_
        tmp[3][i] = a1 - d_
        tmp[1][i] = b1 + c_
        tmp[2][i] = b1 - c_
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a1 = tmp[i][0] + tmp[i][2]
        b1 = tmp[i][0] - tmp[i][2]
        t1 = (tmp[i][1] * c2) >> 16
        t2 = tmp[i][3] + ((tmp[i][3] * c1) >> 16)
        c_ = t1 - t2
        t1 = tmp[i][1] + ((tmp[i][1] * c1) >> 16)
        t2 = (tmp[i][3] * c2) >> 16
        d_ = t1 + t2
        out[i][0] = (a1 + d_ + 4) >> 3
        out[i][3] = (a1 - d_ + 4) >> 3
        out[i][1] = (b1 + c_ + 4) >> 3
        out[i][2] = (b1 - c_ + 4) >> 3
    return out


def _iwht4x4(block):
    """RFC 6386 14.3 inverse Walsh-Hadamard for the Y2 block."""
    tmp = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a1 = block[0][i] + block[3][i]
        b1 = block[1][i] + block[2][i]
        c1 = block[1][i] - block[2][i]
        d1 = block[0][i] - block[3][i]
        tmp[0][i] = a1 + b1
        tmp[1][i] = c1 + d1
        tmp[2][i] = a1 - b1
        tmp[3][i] = d1 - c1
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        a1 = tmp[i][0] + tmp[i][3]
        b1 = tmp[i][1] + tmp[i][2]
        c1 = tmp[i][1] - tmp[i][2]
        d1 = tmp[i][0] - tmp[i][3]
        out[i][0] = (a1 + b1 + 3) >> 3
        out[i][1] = (c1 + d1 + 3) >> 3
        out[i][2] = (a1 - b1 + 3) >> 3
        out[i][3] = (d1 - c1 + 3) >> 3
    return out


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _predict_b(mode, A, L, P):
    """4x4 intra predictors (RFC 6386 12.3).  A: 8 above pixels (incl.
    above-right 4), L: 4 left, P: above-left.  Returns 4x4 list."""
    b = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        v = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                b[r][c] = v
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                b[r][c] = 0 if v < 0 else 255 if v > 255 else v
    elif mode == B_VE:
        row = (_avg3(P, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4]))
        for r in range(4):
            b[r] = list(row)
    elif mode == B_HE:
        col = (_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3]))
        for r in range(4):
            b[r] = [col[r]] * 4
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    b[r][c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    b[r][c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD:
        e = [
            _avg3(L[3], L[2], L[1]), _avg3(L[2], L[1], L[0]),
            _avg3(L[1], L[0], P), _avg3(L[0], P, A[0]),
            _avg3(P, A[0], A[1]), _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
        ]
        for r in range(4):
            for c in range(4):
                b[r][c] = e[c - r + 3]
    elif mode == B_VR:
        b[0][0] = b[2][1] = _avg2(P, A[0])
        b[0][1] = b[2][2] = _avg2(A[0], A[1])
        b[0][2] = b[2][3] = _avg2(A[1], A[2])
        b[0][3] = _avg2(A[2], A[3])
        b[1][0] = b[3][1] = _avg3(L[0], P, A[0])
        b[1][1] = b[3][2] = _avg3(P, A[0], A[1])
        b[1][2] = b[3][3] = _avg3(A[0], A[1], A[2])
        b[1][3] = _avg3(A[1], A[2], A[3])
        b[2][0] = _avg3(P, L[0], L[1])
        b[3][0] = _avg3(L[0], L[1], L[2])
    elif mode == B_VL:
        b[0][0] = _avg2(A[0], A[1])
        b[0][1] = b[2][0] = _avg2(A[1], A[2])
        b[0][2] = b[2][1] = _avg2(A[2], A[3])
        b[0][3] = b[2][2] = _avg2(A[3], A[4])
        b[1][0] = _avg3(A[0], A[1], A[2])
        b[1][1] = b[3][0] = _avg3(A[1], A[2], A[3])
        b[1][2] = b[3][1] = _avg3(A[2], A[3], A[4])
        b[1][3] = b[3][2] = _avg3(A[3], A[4], A[5])
        b[2][3] = _avg3(A[4], A[5], A[6])
        b[3][3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        b[3][0] = _avg2(L[3], L[2])
        b[3][1] = _avg3(L[3], L[2], L[1])
        b[2][0] = b[3][2] = _avg2(L[2], L[1])
        b[2][1] = b[3][3] = _avg3(L[2], L[1], L[0])
        b[1][0] = b[2][2] = _avg2(L[1], L[0])
        b[1][1] = b[2][3] = _avg3(L[1], L[0], P)
        b[0][0] = b[1][2] = _avg2(L[0], P)
        b[0][1] = b[1][3] = _avg3(L[0], P, A[0])
        b[0][2] = _avg3(P, A[0], A[1])
        b[0][3] = _avg3(A[0], A[1], A[2])
    elif mode == B_HU:
        b[0][0] = _avg2(L[0], L[1])
        b[0][1] = _avg3(L[0], L[1], L[2])
        b[0][2] = b[1][0] = _avg2(L[1], L[2])
        b[0][3] = b[1][1] = _avg3(L[1], L[2], L[3])
        b[1][2] = b[2][0] = _avg2(L[2], L[3])
        b[1][3] = b[2][1] = _avg3(L[2], L[3], L[3])
        b[2][2] = b[2][3] = L[3]
        for c in range(4):
            b[3][c] = L[3]
    return b


def _predict_whole(mode, plane, y0, x0, size, mb_y, mb_x):
    """16x16 luma / 8x8 chroma predictors over a bordered plane (border
    row above holds 127s for the top MB row, border column 129s)."""
    above = plane[y0 - 1, x0 : x0 + size].astype(np.int32)
    left = plane[y0 : y0 + size, x0 - 1].astype(np.int32)
    if mode == DC_PRED:
        have_a = mb_y > 0
        have_l = mb_x > 0
        if have_a and have_l:
            v = (int(above.sum()) + int(left.sum()) + size) >> {
                8: 4, 16: 5}[size]
        elif have_a:
            v = (int(above.sum()) + (size >> 1)) >> {8: 3, 16: 4}[size]
        elif have_l:
            v = (int(left.sum()) + (size >> 1)) >> {8: 3, 16: 4}[size]
        else:
            v = 128
        return np.full((size, size), v, dtype=np.int32)
    if mode == V_PRED:
        return np.repeat(above[None, :], size, axis=0)
    if mode == H_PRED:
        return np.repeat(left[:, None], size, axis=1)
    # TM
    p = int(plane[y0 - 1, x0 - 1])
    out = left[:, None] + above[None, :] - p
    return np.clip(out, 0, 255)


class _FrameHeader:
    pass


def _parse_header(bd: BoolDecoder, hdr: _FrameHeader):
    hdr.color_space = bd.literal(1)
    hdr.clamping = bd.literal(1)
    hdr.segmentation = bd.literal(1)
    hdr.seg_quant = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_abs = 0
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.update_map = 0
    if hdr.segmentation:
        hdr.update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            hdr.seg_abs = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    hdr.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.literal(1):
                    hdr.seg_lf[i] = bd.signed_literal(6)
        if hdr.update_map:
            for i in range(3):
                if bd.literal(1):
                    hdr.seg_tree_probs[i] = bd.literal(8)
    hdr.filter_simple = bd.literal(1)
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_delta_enabled = bd.literal(1)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.literal(1):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.literal(1):
                    hdr.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.literal(1):
                    hdr.mode_lf_deltas[i] = bd.signed_literal(6)
    hdr.n_partitions = 1 << bd.literal(2)
    hdr.y_ac_qi = bd.literal(7)
    hdr.y_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    hdr.y2_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    hdr.y2_ac_delta = bd.signed_literal(4) if bd.literal(1) else 0
    hdr.uv_dc_delta = bd.signed_literal(4) if bd.literal(1) else 0
    hdr.uv_ac_delta = bd.signed_literal(4) if bd.literal(1) else 0
    hdr.refresh_entropy = bd.literal(1)
    # token probability updates over the vendored defaults
    probs = [[[list(COEFF_PROBS[((i * 8 + j) * 3 + k) * 11:
                                ((i * 8 + j) * 3 + k) * 11 + 11])
               for k in range(3)] for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                base = ((i * 8 + j) * 3 + k) * 11
                for t in range(11):
                    if bd.bool(COEFF_UPDATE_PROBS[base + t]):
                        probs[i][j][k][t] = bd.literal(8)
    hdr.coeff_probs = probs
    hdr.no_skip = bd.literal(1)
    hdr.prob_skip_false = bd.literal(8) if hdr.no_skip else 0


def _quantizers(hdr):
    """Per-segment dequantization factors (RFC 6386 14.1)."""
    out = []
    for seg in range(4):
        if hdr.segmentation:
            q = (hdr.seg_quant[seg] if hdr.seg_abs
                 else hdr.y_ac_qi + hdr.seg_quant[seg])
        else:
            q = hdr.y_ac_qi
        q = _clamp_q(q)
        y1dc = DC_QLOOKUP[_clamp_q(q + hdr.y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + hdr.y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + hdr.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + hdr.uv_dc_delta)]
        if uvdc > 132:
            uvdc = 132
        uvac = AC_QLOOKUP[_clamp_q(q + hdr.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _decode_coeffs(bd, probs, ctx, first, qdc, qac):
    """One 4x4 block's tokens -> (coeffs 4x4 raster list, has_nonzero)."""
    coeffs = [[0] * 4 for _ in range(4)]
    n = first
    nz = False
    prev_zero = False
    while n < 16:
        pr = probs[COEFF_BANDS[n]][ctx]
        if not prev_zero:
            if not bd.bool(pr[0]):
                break  # EOB
        if not bd.bool(pr[1]):
            n += 1
            ctx = 0
            prev_zero = True
            continue
        prev_zero = False
        if not bd.bool(pr[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.bool(pr[3]):
                if not bd.bool(pr[4]):
                    val = 2
                else:
                    val = 4 if bd.bool(pr[5]) else 3
            else:
                if not bd.bool(pr[6]):
                    cat = 1 if bd.bool(pr[7]) else 0
                else:
                    if not bd.bool(pr[8]):
                        cat = 3 if bd.bool(pr[9]) else 2
                    else:
                        cat = 5 if bd.bool(pr[10]) else 4
                extra = 0
                for p in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.bool(p)
                val = CAT_BASES[cat] + extra
        if bd.bool(128):
            val = -val
        pos = ZIGZAG[n]
        coeffs[pos >> 2][pos & 3] = val * (qdc if n == 0 else qac)
        nz = True
        n += 1
    return coeffs, nz


def decode_vp8_frame(data: bytes, max_pixels: int = None):
    """VP8 keyframe bitstream -> (y, u, v) uint8 planes (cropped to the
    frame size) — the codec layer, byte-identical to libwebp's
    WebPDecodeYUV.  Raises ValueError on non-keyframes / corrupt data,
    Vp8lCapExceeded past the pixel budget (``max_pixels`` tightens the
    module cap per call — the corpus-mode decode budget; it can only
    LOWER the bound, never lift the interpreter-speed ceiling)."""
    if len(data) < 10:
        raise ValueError("VP8 bitstream too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe (only keyframes carry stills)")
    first_part_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    width = w_code & 0x3FFF
    height = h_code & 0x3FFF
    if not width or not height:
        raise ValueError("degenerate VP8 dimensions")
    cap = VP8_MAX_PIXELS if max_pixels is None else min(
        max_pixels, VP8_MAX_PIXELS)
    if width * height > cap:
        raise Vp8lCapExceeded("VP8 dimensions exceed max_pixels cap")
    if 10 + first_part_size > len(data):
        raise ValueError("VP8 first partition overruns data")
    bd = BoolDecoder(data[10 : 10 + first_part_size])
    hdr = _FrameHeader()
    _parse_header(bd, hdr)
    # token partitions
    rest = data[10 + first_part_size :]
    nparts = hdr.n_partitions
    sizes_len = 3 * (nparts - 1)
    if len(rest) < sizes_len:
        raise ValueError("VP8 partition table overruns data")
    offs = sizes_len
    parts = []
    for i in range(nparts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        if offs + sz > len(rest):
            raise ValueError("VP8 token partition overruns data")
        parts.append(BoolDecoder(rest[offs : offs + sz]))
        offs += sz
    parts.append(BoolDecoder(rest[offs:]))

    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    quant = _quantizers(hdr)

    # bordered planes: row 0 = above border (127), col 0 = left border
    # (129); extra right columns so the above-right reads stay in-bounds
    W = mb_w * 16
    H = mb_h * 16
    y_plane = np.empty((H + 1, W + 8), dtype=np.uint8)
    y_plane[0, :] = 127
    y_plane[:, 0] = 129
    y_plane[0, 0] = 127
    CW = mb_w * 8
    CH = mb_h * 8
    u_plane = np.empty((CH + 1, CW + 1), dtype=np.uint8)
    v_plane = np.empty((CH + 1, CW + 1), dtype=np.uint8)
    for p in (u_plane, v_plane):
        p[0, :] = 127
        p[:, 0] = 129
        p[0, 0] = 127

    # nonzero contexts
    above_y_nz = [[0] * 4 for _ in range(mb_w)]
    above_u_nz = [[0] * 2 for _ in range(mb_w)]
    above_v_nz = [[0] * 2 for _ in range(mb_w)]
    above_y2_nz = [0] * mb_w
    # submode context rows (for kf bmode trees)
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]

    # per-MB filter info for the deblocking pass
    filter_info = []  # (level, inner, is_bpred-ish)

    for mb_y in range(mb_h):
        tb = parts[mb_y % nparts]
        left_y_nz = [0] * 4
        left_u_nz = [0] * 2
        left_v_nz = [0] * 2
        left_y2_nz = 0
        left_sub = [B_DC] * 4
        for mb_x in range(mb_w):
            seg = 0
            if hdr.update_map:
                seg = bd.tree(SEGMENT_TREE, hdr.seg_tree_probs)
            skip_flag = bd.bool(hdr.prob_skip_false) if hdr.no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                sub = [[0] * 4 for _ in range(4)]
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mb_x][c] if r == 0 else sub[r - 1][c]
                        l = (left_sub[r] if c == 0 else sub[r][c - 1])
                        base = (a * 10 + l) * 9
                        pr = KF_BMODE_PROBS_RFC[base : base + 9]
                        sub[r][c] = bd.tree(BMODE_TREE, pr)
                above_sub[mb_x] = list(sub[3])
                left_sub = [sub[r][3] for r in range(4)]
            else:
                implied = {DC_PRED: B_DC, V_PRED: B_VE,
                           H_PRED: B_HE, TM_PRED: B_TM}[ymode]
                sub = None
                above_sub[mb_x] = [implied] * 4
                left_sub = [implied] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UVMODE_PROBS)

            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quant[seg]
            has_y2 = ymode != B_PRED
            y_blocks = None
            u_blocks = None
            v_blocks = None
            y2_out = None
            has_coeffs = False
            if skip_flag:
                left_y_nz = [0] * 4
                left_u_nz = [0] * 2
                left_v_nz = [0] * 2
                above_y_nz[mb_x] = [0] * 4
                above_u_nz[mb_x] = [0] * 2
                above_v_nz[mb_x] = [0] * 2
                if has_y2:
                    left_y2_nz = 0
                    above_y2_nz[mb_x] = 0
            else:
                if has_y2:
                    ctx = left_y2_nz + above_y2_nz[mb_x]
                    y2_coeffs, nz = _decode_coeffs(
                        tb, hdr.coeff_probs[1], ctx, 0, y2dc, y2ac)
                    left_y2_nz = above_y2_nz[mb_x] = 1 if nz else 0
                    has_coeffs |= nz
                    y2_out = _iwht4x4(y2_coeffs)
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                y_blocks = []
                local_nz = [[0] * 4 for _ in range(4)]
                for r in range(4):
                    for c in range(4):
                        a_nz = (above_y_nz[mb_x][c] if r == 0
                                else local_nz[r - 1][c])
                        l_nz = (left_y_nz[r] if c == 0
                                else local_nz[r][c - 1])
                        coeffs, nz = _decode_coeffs(
                            tb, hdr.coeff_probs[plane], a_nz + l_nz,
                            first, y1dc, y1ac)
                        local_nz[r][c] = 1 if nz else 0
                        has_coeffs |= nz
                        if y2_out is not None:
                            coeffs[0][0] = y2_out[r][c]
                        y_blocks.append(coeffs)
                above_y_nz[mb_x] = list(local_nz[3])
                left_y_nz = [local_nz[r][3] for r in range(4)]
                u_blocks = []
                v_blocks = []
                for blocks, a_arr, l_arr in (
                    (u_blocks, above_u_nz, left_u_nz),
                    (v_blocks, above_v_nz, left_v_nz),
                ):
                    local = [[0] * 2 for _ in range(2)]
                    for r in range(2):
                        for c in range(2):
                            a_nz = (a_arr[mb_x][c] if r == 0
                                    else local[r - 1][c])
                            l_nz = (l_arr[r] if c == 0 else local[r][c - 1])
                            coeffs, nz = _decode_coeffs(
                                tb, hdr.coeff_probs[2], a_nz + l_nz, 0,
                                uvdc, uvac)
                            local[r][c] = 1 if nz else 0
                            has_coeffs |= nz
                            blocks.append(coeffs)
                    a_arr[mb_x] = list(local[1])
                    if blocks is u_blocks:
                        left_u_nz = [local[r][1] for r in range(2)]
                    else:
                        left_v_nz = [local[r][1] for r in range(2)]

            # ---- reconstruction (unfiltered; intra prediction reads
            # ---- these planes, the loop filter runs afterwards)
            y0 = 1 + mb_y * 16
            x0 = 1 + mb_x * 16
            if ymode != B_PRED:
                pred = _predict_whole(ymode, y_plane, y0, x0, 16,
                                      mb_y, mb_x)
                if y_blocks is not None:
                    res = np.zeros((16, 16), dtype=np.int32)
                    for bi, coeffs in enumerate(y_blocks):
                        r, c = bi >> 2, bi & 3
                        res[r * 4:r * 4 + 4, c * 4:c * 4 + 4] = _idct4x4(
                            coeffs)
                    pred = pred + res
                y_plane[y0:y0 + 16, x0:x0 + 16] = np.clip(
                    pred, 0, 255).astype(np.uint8)
            else:
                # B_PRED: sequential subblock predict + add; the
                # above-right samples for the right column come from the
                # row above the MB (libwebp replicates them downward)
                if mb_y == 0:
                    tr4 = [127, 127, 127, 127]
                elif mb_x >= mb_w - 1:
                    v_ = int(y_plane[y0 - 1, x0 + 15])
                    tr4 = [v_, v_, v_, v_]
                else:
                    tr4 = [int(t) for t in
                           y_plane[y0 - 1, x0 + 16:x0 + 20]]
                for r in range(4):
                    for c in range(4):
                        by, bx = y0 + r * 4, x0 + c * 4
                        if c < 3:
                            A = [int(t) for t in
                                 y_plane[by - 1, bx:bx + 8]]
                        else:
                            A = [int(t) for t in
                                 y_plane[by - 1, bx:bx + 4]] + tr4
                        L = [int(t) for t in y_plane[by:by + 4, bx - 1]]
                        P = int(y_plane[by - 1, bx - 1])
                        pred = _predict_b(sub[r][c], A, L, P)
                        if y_blocks is not None:
                            res = _idct4x4(y_blocks[r * 4 + c])
                        else:
                            res = None
                        for rr in range(4):
                            prow = pred[rr]
                            if res is not None:
                                rrow = res[rr]
                                vals = [prow[i] + rrow[i] for i in range(4)]
                            else:
                                vals = prow
                            y_plane[by + rr, bx:bx + 4] = [
                                0 if v_ < 0 else 255 if v_ > 255 else v_
                                for v_ in vals]
            cy0 = 1 + mb_y * 8
            cx0 = 1 + mb_x * 8
            for plane_arr, blocks in ((u_plane, u_blocks),
                                      (v_plane, v_blocks)):
                pred = _predict_whole(uvmode, plane_arr, cy0, cx0, 8,
                                      mb_y, mb_x)
                if blocks is not None:
                    res = np.zeros((8, 8), dtype=np.int32)
                    for bi, coeffs in enumerate(blocks):
                        r, c = bi >> 1, bi & 1
                        res[r * 4:r * 4 + 4, c * 4:c * 4 + 4] = _idct4x4(
                            coeffs)
                    pred = pred + res
                plane_arr[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(
                    pred, 0, 255).astype(np.uint8)

            # ---- filter level for the deblocking pass
            if hdr.segmentation:
                lvl = (hdr.seg_lf[seg] if hdr.seg_abs
                       else hdr.filter_level + hdr.seg_lf[seg])
            else:
                lvl = hdr.filter_level
            if hdr.lf_delta_enabled:
                lvl += hdr.ref_lf_deltas[0]  # keyframe: always INTRA
                if ymode == B_PRED:
                    lvl += hdr.mode_lf_deltas[0]
            lvl = 0 if lvl < 0 else 63 if lvl > 63 else lvl
            filter_info.append((lvl, has_coeffs or ymode == B_PRED))

    if hdr.filter_level > 0 or hdr.segmentation or hdr.lf_delta_enabled:
        _loop_filter(y_plane, u_plane, v_plane, mb_w, mb_h, hdr,
                     filter_info)

    y = y_plane[1:1 + height, 1:1 + width].copy()
    u = u_plane[1:1 + ((height + 1) >> 1), 1:1 + ((width + 1) >> 1)].copy()
    v = v_plane[1:1 + ((height + 1) >> 1), 1:1 + ((width + 1) >> 1)].copy()
    return y, u, v


# -- deblocking (RFC 6386 section 15), vectorized across edge lanes ----------


def _c128(x):
    # np.minimum/np.maximum skip np.clip's dispatch layer — measurably
    # faster on the filter's small per-edge arrays
    return np.minimum(np.maximum(x, -128), 127)


def _filter_common(p1, p0, q0, q1, use_outer):
    """Returns (new_p0, new_q0, F) — RFC common_adjust on int32 lanes;
    ``use_outer`` is a boolean (or lane mask) gating the outer taps."""
    a = _c128(np.where(use_outer, _c128(p1 - q1), 0) + 3 * (q0 - p0))
    F = _c128(a + 4) >> 3
    E = _c128(a + 3) >> 3
    return _c128(p0 + E), _c128(q0 - F), F


def _normal_edge(plane, y0, x0, L, horiz, E, I, T, mb_edge):
    """Filter one edge on a contiguous slab: lanes are the L pixel
    lines crossing it, (y0, x0) the first lane's q0 position, horiz
    True = horizontal edge (filtering vertically).  ONE gather and ONE
    scatter per edge — the per-offset fancy indexing this replaced was
    85% of decode time in tiny-array numpy overhead.  Stored values are
    c128-clamped, so +128 lands in [0, 255] with no further clip."""
    if horiz:
        win = plane[y0 - 4 : y0 + 4, x0 : x0 + L].astype(np.int32) - 128
    else:
        win = (plane[y0 : y0 + L, x0 - 4 : x0 + 4].astype(np.int32)
               - 128).T
    P3, P2, P1, P0, Q0, Q1, Q2, Q3 = win
    mask = (
        (np.abs(P3 - P2) <= I) & (np.abs(P2 - P1) <= I)
        & (np.abs(P1 - P0) <= I) & (np.abs(Q1 - Q0) <= I)
        & (np.abs(Q2 - Q1) <= I) & (np.abs(Q3 - Q2) <= I)
        & (np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1) <= E)
    )
    if not mask.any():
        return
    hev = (np.abs(P1 - P0) > T) | (np.abs(Q1 - Q0) > T)
    if mb_edge:
        # hev lanes: common_adjust with outer taps; non-hev: 27/18/9 taps
        w = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
        a27 = _c128((27 * w + 63) >> 7)
        a18 = _c128((18 * w + 63) >> 7)
        a9 = _c128((9 * w + 63) >> 7)
        np0, nq0, _F = _filter_common(P1, P0, Q0, Q1, True)
        soft = mask & ~hev
        win[1] = np.where(soft, _c128(P2 + a9), P2)
        win[2] = np.where(soft, _c128(P1 + a18), P1)
        win[3] = np.where(mask, np.where(hev, np0, _c128(P0 + a27)), P0)
        win[4] = np.where(mask, np.where(hev, nq0, _c128(Q0 - a27)), Q0)
        win[5] = np.where(soft, _c128(Q1 - a18), Q1)
        win[6] = np.where(soft, _c128(Q2 - a9), Q2)
        out = (win[1:7] + 128).astype(np.uint8)
        if horiz:
            plane[y0 - 3 : y0 + 3, x0 : x0 + L] = out
        else:
            plane[y0 : y0 + L, x0 - 3 : x0 + 3] = out.T
    else:
        np0, nq0, F = _filter_common(P1, P0, Q0, Q1, hev)
        a = _c128(F + 1) >> 1
        soft = mask & ~hev
        win[2] = np.where(soft, _c128(P1 + a), P1)
        win[3] = np.where(mask, np0, P0)
        win[4] = np.where(mask, nq0, Q0)
        win[5] = np.where(soft, _c128(Q1 - a), Q1)
        out = (win[2:6] + 128).astype(np.uint8)
        if horiz:
            plane[y0 - 2 : y0 + 2, x0 : x0 + L] = out
        else:
            plane[y0 : y0 + L, x0 - 2 : x0 + 2] = out.T


def _simple_edge(plane, y0, x0, L, horiz, E):
    if horiz:
        win = plane[y0 - 2 : y0 + 2, x0 : x0 + L].astype(np.int32) - 128
    else:
        win = (plane[y0 : y0 + L, x0 - 2 : x0 + 2].astype(np.int32)
               - 128).T
    P1, P0, Q0, Q1 = win
    mask = np.abs(P0 - Q0) * 2 + (np.abs(P1 - Q1) >> 1) <= E
    if not mask.any():
        return
    np0, nq0, _F = _filter_common(P1, P0, Q0, Q1, True)
    win[1] = np.where(mask, np0, P0)
    win[2] = np.where(mask, nq0, Q0)
    out = (win[1:3] + 128).astype(np.uint8)
    if horiz:
        plane[y0 - 1 : y0 + 1, x0 : x0 + L] = out
    else:
        plane[y0 : y0 + L, x0 - 1 : x0 + 1] = out.T


def _loop_filter(y_plane, u_plane, v_plane, mb_w, mb_h, hdr, filter_info):
    simple = bool(hdr.filter_simple)
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            level, inner = filter_info[mb_y * mb_w + mb_x]
            if level == 0:
                continue
            interior = level
            if hdr.sharpness:
                interior >>= 2 if hdr.sharpness > 4 else 1
                cap = 9 - hdr.sharpness
                if interior > cap:
                    interior = cap
            if interior < 1:
                interior = 1
            mbE = ((level + 2) * 2) + interior
            subE = (level * 2) + interior
            T = 2 if level >= 40 else (1 if level >= 15 else 0)
            y0 = 1 + mb_y * 16
            x0 = 1 + mb_x * 16
            cy0 = 1 + mb_y * 8
            cx0 = 1 + mb_x * 8
            if simple:
                if mb_x > 0:
                    _simple_edge(y_plane, y0, x0, 16, False, mbE)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_edge(y_plane, y0, x0 + dx, 16, False,
                                     subE)
                if mb_y > 0:
                    _simple_edge(y_plane, y0, x0, 16, True, mbE)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_edge(y_plane, y0 + dy, x0, 16, True,
                                     subE)
                continue
            if mb_x > 0:
                _normal_edge(y_plane, y0, x0, 16, False,
                             mbE, interior, T, True)
                _normal_edge(u_plane, cy0, cx0, 8, False,
                             mbE, interior, T, True)
                _normal_edge(v_plane, cy0, cx0, 8, False,
                             mbE, interior, T, True)
            if inner:
                for dx in (4, 8, 12):
                    _normal_edge(y_plane, y0, x0 + dx, 16, False,
                                 subE, interior, T, False)
                _normal_edge(u_plane, cy0, cx0 + 4, 8, False,
                             subE, interior, T, False)
                _normal_edge(v_plane, cy0, cx0 + 4, 8, False,
                             subE, interior, T, False)
            if mb_y > 0:
                _normal_edge(y_plane, y0, x0, 16, True,
                             mbE, interior, T, True)
                _normal_edge(u_plane, cy0, cx0, 8, True,
                             mbE, interior, T, True)
                _normal_edge(v_plane, cy0, cx0, 8, True,
                             mbE, interior, T, True)
            if inner:
                for dy in (4, 8, 12):
                    _normal_edge(y_plane, y0 + dy, x0, 16, True,
                                 subE, interior, T, False)
                _normal_edge(u_plane, cy0 + 4, cx0, 8, True,
                             subE, interior, T, False)
                _normal_edge(v_plane, cy0 + 4, cx0, 8, True,
                             subE, interior, T, False)


# -- fancy upsampling + YUV -> RGB (libwebp twin) ----------------------------

# libwebp yuv.h fixed-point constants (YUV_FIX2 = 6 scale)
_K_YSCALE = 19077  # 1.164 * 2^14
_K_VTOR = 26149    # 1.596 * 2^14
_K_UTOG = 6419     # 0.391 * 2^14
_K_VTOG = 13320    # 0.813 * 2^14
_K_UTOB = 33050    # 2.018 * 2^14
_K_RCST = -14234   # offsets folded to the 6-bit scale
_K_GCST = 8708
_K_BCST = -17685


def _yuv_to_rgb_rows(yrow, urow, vrow):
    """One output row: int32 arrays -> (r, g, b) uint8 (libwebp yuv.h
    fixed point: each product truncated >>8 separately, constants at
    the 6-bit scale, final >>6 with saturation)."""
    yy = (yrow.astype(np.int64) * _K_YSCALE) >> 8
    u = urow.astype(np.int64)
    v = vrow.astype(np.int64)
    r = yy + ((_K_VTOR * v) >> 8) + _K_RCST
    g = yy - ((_K_UTOG * u) >> 8) - ((_K_VTOG * v) >> 8) + _K_GCST
    b = yy + ((_K_UTOB * u) >> 8) + _K_BCST
    out = []
    for ch in (r, g, b):
        out.append(np.clip(ch, 0, (256 << 6) - 1).astype(np.int32) >> 6)
    return (out[0].astype(np.uint8), out[1].astype(np.uint8),
            out[2].astype(np.uint8))


def _upsample_row(top_c, cur_c, w):
    """libwebp fancy upsampler, one chroma channel, one output row pair
    worth of horizontal interpolation: given the chroma row above the
    output row (weight 3) and the nearer row (weight 9... the caller
    passes rows so that ``cur`` is the nearer one), produce a length-w
    row.  Exact integer twin of UpsampleRgbLinePair's per-lane math."""
    cw = top_c.shape[0]
    tl = top_c.astype(np.int32)
    l_ = cur_c.astype(np.int32)
    out = np.empty(w, dtype=np.int32)
    # first pixel
    out[0] = (3 * l_[0] + tl[0] + 2) >> 2
    # pixel pairs
    if cw > 1:
        t_ = tl[1:]
        c_ = l_[1:]
        tl0 = tl[:-1]
        l0 = l_[:-1]
        avg = tl0 + t_ + l0 + c_ + 8
        diag12 = (avg + 2 * (t_ + l0)) >> 3
        diag03 = (avg + 2 * (tl0 + c_)) >> 3
        uv0 = (diag03 + l0) >> 1   # odd output (2x-1), nearer cur row
        uv1 = (diag12 + c_) >> 1   # even output (2x), nearer cur row
        n = cw - 1
        odd = out[1:1 + 2 * n:2]
        odd[:] = uv0[: odd.shape[0]]
        even = out[2:2 + 2 * n:2]
        even[:] = uv1[: even.shape[0]]
    if w & 1 == 0 and w >= 2:
        # last pixel of an even-width row
        out[w - 1] = (3 * l_[cw - 1] + tl[cw - 1] + 2) >> 2
    return out


def yuv420_to_rgb(y, u, v):
    """Fancy-upsampled YUV 4:2:0 -> RGB (H, W, 3), the byte-exact twin
    of libwebp's WebPDecodeRGB output for the same planes."""
    h, w = y.shape
    ch = u.shape[0]
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        cur = row >> 1
        if row == 0:
            top = 0
        elif row & 1:
            # odd rows: chroma rows cur (nearer) and cur+1 (farther)
            top = min(cur + 1, ch - 1)
        else:
            # even rows (>0): nearer cur, farther cur-1
            top = cur - 1
        urow = _upsample_row(u[top], u[cur], w)
        vrow = _upsample_row(v[top], v[cur], w)
        r, g, b = _yuv_to_rgb_rows(y[row].astype(np.int32), urow, vrow)
        rgb[row, :, 0] = r
        rgb[row, :, 1] = g
        rgb[row, :, 2] = b
    return rgb


def decode_vp8(data: bytes, max_pixels: int = None) -> np.ndarray:
    """VP8 keyframe bitstream -> (H, W, 3) uint8 RGB."""
    y, u, v = decode_vp8_frame(data, max_pixels=max_pixels)
    return yuv420_to_rgb(y, u, v)


def decode_webp_lossy(raw: bytes, max_pixels: int = None) -> np.ndarray:
    """Full WebP container (or bare VP8 chunk payload) -> (H, W, 3)
    uint8 RGB via the keyframe decoder + fancy upsampler.  Animated
    containers (ANIM/ANMF) raise — their frames need compositing, which
    stays at the honest metadata tier.  ValueError on malformed or
    lossless input (the VP8L decoder owns those)."""
    from exstruct_spark.kernels.vp8l import _iter_webp_chunks

    payload = None
    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
        for cid, body in _iter_webp_chunks(raw):
            if cid in (b"ANIM", b"ANMF"):
                raise ValueError("animated WebP — frame compositing "
                                 "stays at the metadata tier")
            if cid == b"VP8 ":
                payload = body
                break
            if cid == b"VP8L":
                raise ValueError("lossless VP8L — wrong decoder")
        if payload is None:
            raise ValueError("no VP8 chunk")
    elif len(raw) >= 6 and raw[3:6] == b"\x9d\x01\x2a":
        payload = raw
    else:
        raise ValueError("not a WebP container or VP8 bitstream")
    return decode_vp8(payload, max_pixels=max_pixels)


class BoolEncoder:
    """RFC 6386 section 8 boolean encoder — just enough to write the
    minimal corpus streams below (and to give pytest an encoder-side
    twin whose output both this decoder and libwebp must agree on)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1, 128)

    def flush(self) -> bytes:
        # drain the remaining significant bits (RFC flush, expressed as
        # 32 forced renormalization shifts)
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def encode_vp8_minimal(mb_w: int, mb_h: int, seed: int = 0,
                       q_index: int = 60) -> bytes:
    """Minimal but fully valid VP8 keyframe: every MB is DC_PRED with a
    single Y2 DC coefficient (token 1-4, signed), which the inverse WHT
    spreads as a uniform luma residual — a deterministic blocky
    grayscale whose content varies per MB via ``seed``.  No
    segmentation, no loop filtering, one token partition, default
    probabilities.  Wrapped as a RIFF/WEBP container.

    This is the corpus generator for the LOSSY media slice (the VP8L
    twin is encode_vp8l_lossless) — pytest additionally feeds these
    streams to libwebp, which must decode them to the same pixels as
    kernels/vp8.py."""
    hdr = BoolEncoder()
    hdr.literal(0, 1)   # color space
    hdr.literal(0, 1)   # clamping
    hdr.literal(0, 1)   # segmentation off
    hdr.literal(0, 1)   # filter type: normal
    hdr.literal(0, 6)   # filter level 0 (no filtering)
    hdr.literal(0, 3)   # sharpness
    hdr.literal(0, 1)   # lf deltas off
    hdr.literal(0, 2)   # one token partition
    hdr.literal(q_index, 7)
    for _ in range(5):  # no quantizer deltas
        hdr.literal(0, 1)
    hdr.literal(1, 1)   # refresh entropy
    for p in COEFF_UPDATE_PROBS:   # keep every default coeff prob
        hdr.put(0, p)
    hdr.literal(0, 1)   # mb_no_coeff_skip off: every MB carries tokens

    tok = BoolEncoder()

    def put_tree(enc, tree, probs, value):
        # walk to the leaf, emitting the branch bits
        path = []

        def walk(i):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == value:
                        path.append((i >> 1, b))
                        return True
                elif walk(t):
                    path.append((i >> 1, b))
                    return True
            return False

        walk(0)
        for pi, b in reversed(path):
            enc.put(b, probs[pi])

    state = (seed * 2654435761 + 12345) & 0xFFFFFFFF
    above_y2 = [0] * mb_w
    for mb_y in range(mb_h):
        left_y2 = 0
        for mb_x in range(mb_w):
            put_tree(hdr, KF_YMODE_TREE, KF_YMODE_PROBS, DC_PRED)
            put_tree(hdr, UV_MODE_TREE, KF_UVMODE_PROBS, DC_PRED)
            state = (state * 1103515245 + 12345) & 0xFFFFFFFF
            mag = 1 + ((state >> 16) & 3)     # token 1..4
            sign = (state >> 20) & 1
            # Y2 block (plane 1): one DC token + EOB at position 1
            probs = [COEFF_PROBS[((1 * 8 + j) * 3 + k) * 11:
                                 ((1 * 8 + j) * 3 + k) * 11 + 11]
                     for j in range(8) for k in range(3)]

            def pr(band, ctx):
                return probs[band * 3 + ctx]

            ctx = left_y2 + above_y2[mb_x]
            p0 = pr(COEFF_BANDS[0], ctx)
            tok.put(1, p0[0])                 # not EOB
            tok.put(1, p0[1])                 # not ZERO
            if mag == 1:
                tok.put(0, p0[2])
            else:
                tok.put(1, p0[2])
                tok.put(0, p0[3])
                if mag == 2:
                    tok.put(0, p0[4])
                else:
                    tok.put(1, p0[4])
                    tok.put(mag - 3, p0[5])
            tok.put(sign, 128)
            p1 = pr(COEFF_BANDS[1], 2 if mag > 1 else 1)
            tok.put(0, p1[0])                 # EOB
            left_y2 = above_y2[mb_x] = 1
            # 16 luma blocks (plane 0, first=1): all EOB, ctx stays 0
            lp = COEFF_PROBS[((0 * 8 + COEFF_BANDS[1]) * 3 + 0) * 11:
                             ((0 * 8 + COEFF_BANDS[1]) * 3 + 0) * 11 + 11]
            for _ in range(16):
                tok.put(0, lp[0])
            # 8 chroma blocks (plane 2, first=0): all EOB
            cp = COEFF_PROBS[((2 * 8 + 0) * 3 + 0) * 11:
                             ((2 * 8 + 0) * 3 + 0) * 11 + 11]
            for _ in range(8):
                tok.put(0, cp[0])

    first = hdr.flush()
    tokens = tok.flush()
    width, height = mb_w * 16, mb_h * 16
    tag = (len(first) << 5) | (1 << 4)  # keyframe, version 0, shown
    payload = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
               + struct_pack_le16(width) + struct_pack_le16(height)
               + first + tokens)
    riff = (b"VP8 " + len(payload).to_bytes(4, "little") + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return (b"RIFF" + (4 + len(riff)).to_bytes(4, "little") + b"WEBP"
            + riff)


def struct_pack_le16(v: int) -> bytes:
    return bytes((v & 0xFF, (v >> 8) & 0xFF))
